"""Document-corpus pipelines: per-doc text stats, language/quality scoring,
exact + near deduplication (MinHash-LSH, SimHash, n-gram Jaccard).

All heavy stages are actor pools (compiled state built once per actor) over
Arrow batches; shuffles are explicit groupbys on hash keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.dedup import MinHasher, simhash64
from ..functions.text import (
    char_ngrams,
    detect_language,
    jaccard,
    md5_fingerprint,
    quality_score,
)


def _read_docs(sf_dir: str, columns=("doc_id", "text")):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


class TextStats:
    """Actor: per-doc token counts, char counts, mean word length, md5."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.combine_chunks()
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        split = pc.split_pattern(text, pattern=" ")
        n_tok = pc.list_value_length(split).cast(pa.int64())
        wl = pc.utf8_length(split.values).cast(pa.int64()).to_numpy(zero_copy_only=False)
        offs = split.offsets.to_numpy(zero_copy_only=False)
        offs = (offs - offs[0]).astype(np.int64)
        sums = np.add.reduceat(wl, offs[:-1]) if len(wl) else np.zeros(0, np.int64)
        counts = np.maximum(offs[1:] - offs[:-1], 1)
        mean_wl = np.round(sums / counts, 6)
        fps = [md5_fingerprint(s) for s in text.to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.string()),
                "n_tok": n_tok,
                "n_chars": pc.utf8_length(text).cast(pa.int64()),
                "mean_word_len": pa.array(mean_wl, pa.float64()),
                "fingerprint": pa.array(fps, pa.string()),
            }
        )


def text_stats(sf_dir: str):
    return _read_docs(sf_dir).map_batches(
        TextStats, batch_format="pyarrow", concurrency=2
    )


class LangQuality:
    """Actor: heuristic language ID + quality score (stopword tables loaded
    once per actor)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch.combine_chunks()
        texts = t["text"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.string()),
                "lang_pred": pa.array([detect_language(s) for s in texts]),
                "quality": pa.array([quality_score(s) for s in texts], pa.float64()),
            }
        )


def lang_quality(sf_dir: str):
    return _read_docs(sf_dir).map_batches(
        LangQuality, batch_format="pyarrow", concurrency=2
    )


def lang_distribution(sf_dir: str):
    """Distribution of the table's own lang labels (groupby count)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"lang": t["lang"].to_pylist()})
        df["docs"] = 1
        df["chars"] = t["n_chars"].to_numpy(zero_copy_only=False)
        return df.groupby("lang", as_index=False).sum()

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(
            lambda g: pd.DataFrame(
                {
                    "lang": [g["lang"].iloc[0]],
                    "docs": [np.int64(g["docs"].sum())],
                    "chars": [np.int64(g["chars"].sum())],
                }
            ),
            batch_format="pandas",
        )
    )


LANG_DISTRIBUTION_SQL = """
SELECT lang, count(*)::BIGINT AS docs, sum(n_chars)::BIGINT AS chars
FROM documents GROUP BY lang
"""


def dedup_exact(sf_dir: str):
    """Exact dedup: content hash -> hash group -> representative (min doc_id)
    + duplicate count.  The hash-partition + per-group-first pattern."""
    ds = _read_docs(sf_dir)

    def hash_batch(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "text_hash": pa.array(
                    [md5_fingerprint(s) for s in t["text"].to_pylist()]
                ),
            }
        )

    hashed = ds.map_batches(hash_batch, batch_format="pyarrow")
    return hashed.groupby("text_hash").map_groups(
        lambda g: pa.table(
            {
                "text_hash": g["text_hash"][:1],
                "rep_doc_id": pa.array(
                    [min(g["doc_id"].to_pylist())], pa.int64()
                ),
                "copies": pa.array([g.num_rows], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_hash, min(doc_id)::BIGINT AS rep_doc_id,
       count(*)::BIGINT AS copies
FROM documents GROUP BY md5(text)
"""


class MinHashSig:
    """Actor: MinHash signatures + LSH band keys per doc (hash matrices
    built once per actor in __init__)."""

    def __init__(self, num_hashes: int = 64, bands: int = 16, ngram: int = 5):
        self.mh = MinHasher(num_hashes=num_hashes, ngram=ngram)
        self.bands = bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch.combine_chunks()
        rows = []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sig = self.mh.signature(text)
            for band_id, key in enumerate(
                self.mh.band_keys(sig, self.bands).view(np.int64)
            ):
                rows.append(
                    {
                        "doc_id": int(did),
                        "band_id": band_id,
                        "band_key": int(key),
                        "sig": sig.view(np.int64).tolist(),
                    }
                )
        return pa.Table.from_pylist(rows, schema=_SIG_SCHEMA)


_SIG_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("band_id", pa.int64()),
        ("band_key", pa.int64()),
        ("sig", pa.list_(pa.int64())),
    ]
)


def dedup_minhash_pairs(sf_dir: str, threshold: float = 0.6):
    """MinHash-LSH near-dup candidate pairs with signature-estimated Jaccard:
    shingle -> minhash -> band -> bucket groupby -> pairwise within bucket.
    Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b, est >= threshold."""
    sigs = _read_docs(sf_dir).map_batches(
        MinHashSig, batch_format="pyarrow", concurrency=4, batch_size=512
    )

    def bucket_pairs_partition(t: pa.Table) -> pa.Table:
        """Vectorized over a whole hash partition of (band_id, band_key)
        buckets: sort by bucket, enumerate pairs within each bucket run (runs
        are tiny -- LSH buckets), compare signatures as a matrix."""
        t = t.combine_chunks()
        if t.num_rows < 2:
            return pa.Table.from_pylist([], schema=_PAIR_SCHEMA)
        band = t["band_id"].to_numpy(zero_copy_only=False)
        key = t["band_key"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, band))
        b_s, k_s = band[order], key[order]
        starts = np.flatnonzero(
            np.concatenate(([True], (b_s[1:] != b_s[:-1]) | (k_s[1:] != k_s[:-1])))
        )
        ends = np.append(starts[1:], len(order))
        dids = t["doc_id"].to_numpy(zero_copy_only=False)[order]
        sig_flat, sig_offs = (
            t["sig"].combine_chunks().flatten().to_numpy(zero_copy_only=False),
            None,
        )
        k_sig = len(sig_flat) // t.num_rows
        sigs_m = sig_flat.reshape(t.num_rows, k_sig)[order]
        ia, ib = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            i, j = np.triu_indices(m, 1)
            ia.append(s + i)
            ib.append(s + j)
        if not ia:
            return pa.Table.from_pylist([], schema=_PAIR_SCHEMA)
        ia = np.concatenate(ia)
        ib = np.concatenate(ib)
        est = (sigs_m[ia] == sigs_m[ib]).mean(axis=1)
        da, db = dids[ia], dids[ib]
        keep = (est >= threshold) & (da != db)
        lo = np.minimum(da[keep], db[keep])
        hi = np.maximum(da[keep], db[keep])
        return pa.table(
            {
                "doc_a": pa.array(lo, pa.int64()),
                "doc_b": pa.array(hi, pa.int64()),
                "est_jaccard": pa.array(np.round(est[keep], 6), pa.float64()),
            }
        )

    def add_prt(t: pa.Table, P: int = 16) -> pa.Table:
        t = t.combine_chunks()
        b = t["band_id"].to_numpy(zero_copy_only=False)
        k = t["band_key"].to_numpy(zero_copy_only=False)
        prt = np.abs(b * np.int64(0x9E3779B1) ^ k) % P
        return t.append_column("prt", pa.array(prt, pa.int64()))

    keyed = sigs.map_batches(add_prt, batch_format="pyarrow")
    pairs = keyed.groupby("prt").map_groups(
        lambda g: bucket_pairs_partition(g.drop_columns(["prt"])),
        batch_format="pyarrow",
    )

    def dedup_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=_PAIR_SCHEMA)
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        first = np.concatenate(
            ([True], (a[order][1:] != a[order][:-1]) | (b[order][1:] != b[order][:-1]))
        )
        return t.take(pa.array(order[first]))

    def add_pair_prt(t: pa.Table, P: int = 16) -> pa.Table:
        t = t.combine_chunks()
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        prt = np.abs(a * np.int64(0x9E3779B1) ^ b) % P
        return t.append_column("prt", pa.array(prt, pa.int64()))

    # dedup pairs found by multiple bands: one keyed pass, vectorized
    return pairs.map_batches(add_pair_prt, batch_format="pyarrow").groupby(
        "prt"
    ).map_groups(
        lambda g: dedup_partition(g.drop_columns(["prt"])), batch_format="pyarrow"
    )


_PAIR_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("est_jaccard", pa.float64())]
)


class SimHash:
    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch.combine_chunks()
        fps = [int(simhash64(s)) for s in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "simhash": pa.array(np.array(fps, dtype=np.uint64).view(np.int64)),
            }
        )


def simhash_fingerprints(sf_dir: str):
    return _read_docs(sf_dir).map_batches(SimHash, batch_format="pyarrow", concurrency=2)


def dedup_jaccard_verified(sf_dir: str, candidate_threshold: float = 0.5,
                           verify_threshold: float = 0.5):
    """The full near-dup pipeline: MinHash-LSH candidates -> EXACT n-gram
    Jaccard verification.  Candidate texts are broadcast (the candidate set
    is LSH-blocked and small); verification is per-batch over pairs."""
    import ray

    import pyarrow.parquet as pq

    pairs = dedup_minhash_pairs(sf_dir, threshold=candidate_threshold)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts_ref = ray.put(dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist())))

    def verify(b: pa.Table) -> pa.Table:
        texts = ray.get(texts_ref)
        if b.num_rows == 0:
            return pa.Table.from_pylist([], schema=_VPAIR_SCHEMA)
        rows = []
        for r in b.to_pylist():
            ja = jaccard(
                char_ngrams(texts[r["doc_a"]]), char_ngrams(texts[r["doc_b"]])
            )
            if ja >= verify_threshold:
                rows.append(
                    {
                        "doc_a": r["doc_a"],
                        "doc_b": r["doc_b"],
                        "est_jaccard": r["est_jaccard"],
                        "jaccard": round(ja, 6),
                    }
                )
        return pa.Table.from_pylist(rows, schema=_VPAIR_SCHEMA)

    return pairs.map_batches(verify, batch_format="pyarrow")


_VPAIR_SCHEMA = pa.schema(
    [
        ("doc_a", pa.int64()),
        ("doc_b", pa.int64()),
        ("est_jaccard", pa.float64()),
        ("jaccard", pa.float64()),
    ]
)


def dedup_simhash_pairs(sf_dir: str, max_hamming: int = 10):
    """SimHash near-dup pairs: fingerprints broadcast once, each batch
    compares its fingerprints against the full table (vectorized XOR +
    popcount); pairs within ``max_hamming`` bits."""
    import ray

    from ..functions.dedup import hamming64

    fps_table = simhash_fingerprints(sf_dir).materialize()
    rows = fps_table.take_all()
    all_ids = np.array([r["doc_id"] for r in rows], dtype=np.int64)
    all_fps = np.array([r["simhash"] for r in rows], dtype=np.int64).view(np.uint64)
    ref = ray.put((all_ids, all_fps))

    def pairs(b: pa.Table) -> pa.Table:
        ids_all, fps_all = ray.get(ref)
        b = b.combine_chunks()
        out_a, out_b, out_d = [], [], []
        bids = b["doc_id"].to_numpy(zero_copy_only=False)
        bfps = b["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        for i in range(len(bids)):
            d = hamming64(fps_all, bfps[i])
            hit = (d <= max_hamming) & (ids_all > bids[i])
            for j in np.flatnonzero(hit):
                out_a.append(int(bids[i]))
                out_b.append(int(ids_all[j]))
                out_d.append(int(d[j]))
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "hamming": pa.array(out_d, pa.int64()),
            }
        )

    return fps_table.map_batches(pairs, batch_format="pyarrow")


def dedup_clusters(pairs_ds, max_rounds: int = 10):
    """Near-dup pair list -> connected components by iterative min-label
    propagation: each round, every doc adopts the smallest label among its
    neighbors + itself (two keyed groupbys per round over edge-sized data);
    converges in O(diameter) rounds.  Scale path for when the candidate set
    is too large for driver-side union-find.

    Returns a Dataset of (doc_id, cluster) with cluster = min doc_id of the
    component."""
    import ray.data as rd

    def edges_to_labels(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([a, b]), pa.int64()),
                "nbr": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    edges = pairs_ds.map_batches(edges_to_labels, batch_format="pyarrow").materialize()
    labels = edges.groupby("doc_id").map_groups(
        lambda g: pa.table(
            {
                "doc_id": g["doc_id"][:1],
                "cluster": pa.array(
                    [min(int(g["doc_id"][0].as_py()), min(g["nbr"].to_pylist()))],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(max_rounds):
        # join labels onto edges (broadcast: label table is edge-bounded and
        # shrinks to component count; for huge graphs use a keyed join)
        import ray

        lab = {
            r["doc_id"]: r["cluster"] for r in labels.take_all()
        }
        lab_ref = ray.put(lab)

        def propagate(t: pa.Table) -> pa.Table:
            m = ray.get(lab_ref)
            d = t["doc_id"].to_pylist()
            n = t["nbr"].to_pylist()
            return pa.table(
                {
                    "doc_id": pa.array(d, pa.int64()),
                    "cand": pa.array([m.get(x, x) for x in n], pa.int64()),
                }
            )

        cand = edges.map_batches(propagate, batch_format="pyarrow")
        new_labels = cand.groupby("doc_id").map_groups(
            lambda g: pa.table(
                {
                    "doc_id": g["doc_id"][:1],
                    "cluster": pa.array(
                        [
                            min(
                                min(g["cand"].to_pylist()),
                                lab_of := ray.get(lab_ref).get(
                                    int(g["doc_id"][0].as_py()),
                                    int(g["doc_id"][0].as_py()),
                                ),
                            )
                        ],
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        old = {r["doc_id"]: r["cluster"] for r in labels.take_all()}
        new = {r["doc_id"]: r["cluster"] for r in new_labels.take_all()}
        labels = new_labels
        if old == new:
            break
    return labels


def ngram_jaccard_verify(sf_dir: str, pairs: list[tuple[int, int]]) -> list[dict]:
    """Driver-side exact n-gram Jaccard for a (small) candidate pair list --
    the verification step after LSH blocking."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    out = []
    for a, b in pairs:
        ja = jaccard(char_ngrams(texts[a]), char_ngrams(texts[b]))
        out.append({"doc_a": a, "doc_b": b, "jaccard": round(ja, 6)})
    return out
