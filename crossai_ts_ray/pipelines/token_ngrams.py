"""Token-n-gram dedup + vocabulary-dynamics pipelines over the derived
token-sequence table -- the substring-granularity layer of training-data
dedup (Lee et al., "Deduplicating Training Data Makes Language Models
Better": duplicated fixed-length token windows, not whole documents) plus
per-retention-bucket distinct/novel-token rollups for corpus drift audits.

Scale shape: n-gram keys are packed int64s computed by a j-loop of
vectorized adds over the flat token buffer (no per-row Python); duplicated
keys ride ONE hash(key) exchange of batch-combined partials; the per-doc
duplication rate re-reads tokens and tests membership against either a
size-guarded broadcast sorted key array (ONE ray.put, zero exchanges) or a
partitioned union-mark exchange (the 100-TB path) -- bitwise-identical
outputs, parity-tested.  Reference parity: crossai-ts has no substring
dedup; this extends its windowing (caits/windowing.py sliding_window_df)
to the dedup use the survey's LLM-pipeline section requires.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..sources.readers import tokens_from_documents
from ..stages.joins import hash_prt
from ..util import dataset_to_table

_TOK_BITS = 7  # 7 bits/token: whitespace-token utf8 lengths; guard below
_TOK_BASE = 1 << _TOK_BITS

# past this many duplicated keys the sorted broadcast array stops being a
# "small side" (8 B/key; 16M keys = 128 MB -- about the sensible per-worker
# broadcast ceiling) and the partitioned union-mark path takes over
_DUP_BCAST_MAX_KEYS = 16_000_000


def _flat_tokens(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(flat int64 values, row offsets) of the batch's token lists."""
    col = t["tokens"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = col.values.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    return vals, offs


def _ngram_keys(vals: np.ndarray, offs: np.ndarray, n: int
                ) -> tuple[np.ndarray, np.ndarray]:
    """Packed n-gram keys for every length-n window of every row.

    Returns (keys, win_row): one entry per window, ``win_row`` the batch row
    the window came from.  key = sum_j tok[i+j] * 128^j -- exact (not a
    hash): token values are 7-bit-guarded so n<=9 windows pack injectively
    into a signed int64, and DuckDB mirrors the same arithmetic bit-for-bit.
    """
    if len(vals) and int(vals.max()) >= _TOK_BASE:
        raise ValueError(
            f"token value {int(vals.max())} overflows the {_TOK_BITS}-bit "
            "n-gram pack; widen _TOK_BITS or shorten n"
        )
    if n > 63 // _TOK_BITS:
        raise ValueError(f"n={n} overflows int64 at {_TOK_BITS} bits/token")
    lens = np.diff(offs)
    counts = np.maximum(lens - n + 1, 0)
    total = int(counts.sum())
    if total == 0 or len(vals) < n:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # window start positions in the flat buffer, ragged-arange per row
    starts = np.repeat(offs[:-1], counts)
    pos = starts + (np.arange(total, dtype=np.int64)
                    - np.repeat(np.cumsum(counts) - counts, counts))
    keys = np.zeros(total, dtype=np.int64)
    m = len(vals) - n + 1
    for j in range(n):  # n is tiny (8); each add is whole-batch vectorized
        keys += vals[j:j + m][pos] * (_TOK_BASE ** j)
    win_row = np.repeat(np.arange(len(lens), dtype=np.int64), counts)
    return keys, win_row


def dup_token_ngrams(sf_dir: str, n: int = 8, buckets: int = 32) -> rd.Dataset:
    """Every token n-gram that occurs >=2 times in the corpus, with its
    occurrence count and distinct-document count -- the candidate table a
    substring-level dedup pass consumes.

    Scale shape: each batch collapses its windows to (key, occ, docs)
    partials before the ONE hash(key) exchange; per-doc distinct counts are
    additive across batches because the token table has exactly one row per
    document, so a document never spans batches.  Output is bounded by the
    number of DUPLICATED n-grams, not by corpus size.
    """
    toks = tokens_from_documents(sf_dir)

    part_schema = pa.schema([
        ("ngram_key", pa.int64()), ("occ", pa.int64()),
        ("docs", pa.int64()), ("prt", pa.int64()),
    ])

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        vals, offs = _flat_tokens(t)
        keys, win_row = _ngram_keys(vals, offs, n)
        if not len(keys):
            return pa.Table.from_pylist([], schema=part_schema)
        order = np.lexsort((win_row, keys))
        k_s, r_s = keys[order], win_row[order]
        new_key = np.concatenate(([True], k_s[1:] != k_s[:-1]))
        starts = np.flatnonzero(new_key)
        occ = np.diff(np.append(starts, len(k_s)))
        # distinct docs per key: count (key, row) boundary changes per run
        new_pair = new_key | np.concatenate(([True], r_s[1:] != r_s[:-1]))
        docs = np.add.reduceat(new_pair.astype(np.int64), starts)
        uniq = k_s[starts]
        return pa.table({
            "ngram_key": pa.array(uniq, pa.int64()),
            "occ": pa.array(occ, pa.int64()),
            "docs": pa.array(docs, pa.int64()),
            "prt": pa.array(hash_prt(uniq, buckets), pa.int64()),
        }, schema=part_schema)

    out_schema = pa.schema([
        ("ngram_key", pa.int64()), ("n_occ", pa.int64()),
        ("n_docs", pa.int64()),
    ])

    def merge(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        if g.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        k = g["ngram_key"].to_numpy(zero_copy_only=False)
        occ = g["occ"].to_numpy(zero_copy_only=False)
        docs = g["docs"].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k_s = k[order]
        starts = np.flatnonzero(np.concatenate(([True], k_s[1:] != k_s[:-1])))
        occ_sum = np.add.reduceat(occ[order], starts)
        docs_sum = np.add.reduceat(docs[order], starts)
        dup = occ_sum >= 2
        return pa.table({
            "ngram_key": pa.array(k_s[starts][dup], pa.int64()),
            "n_occ": pa.array(occ_sum[dup], pa.int64()),
            "n_docs": pa.array(docs_sum[dup], pa.int64()),
        }, schema=out_schema)

    merged = (
        toks.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("prt")
        .map_groups(lambda g: merge(g.drop_columns(["prt"])),
                    batch_format="pyarrow")
    )
    return merged.sort("ngram_key")


def _dup_sql_key(n: int) -> str:
    return " + ".join(f"wl[i+{j}]*{_TOK_BASE ** j}" for j in range(n))


def dup_token_ngrams_sql(n: int = 8) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), w -> length(w)::BIGINT) AS wl,
         len(string_split(text, ' ')) AS n
  FROM documents
),
pos AS (
  SELECT doc_id, wl, unnest(generate_series(1, n - {n - 1})) AS i
  FROM tok WHERE n >= {n}
),
keys AS (SELECT doc_id, {_dup_sql_key(n)} AS ngram_key FROM pos)
SELECT ngram_key, count(*)::BIGINT AS n_occ,
       count(DISTINCT doc_id)::BIGINT AS n_docs
FROM keys GROUP BY ngram_key HAVING count(*) >= 2
ORDER BY ngram_key
"""


def doc_dup_ngram_rate(sf_dir: str, n: int = 8, buckets: int = 32,
                       broadcast: bool | None = None) -> rd.Dataset:
    """Per document (with >= n tokens): total n-gram windows, how many are
    duplicated anywhere in the corpus (global occurrence >= 2, including
    within the same doc), and the duplication rate -- the per-doc signal a
    substring-dedup cleaning policy thresholds on.

    Two bitwise-identical paths (parity-tested):

    * broadcast (auto when the duplicated-key count -- known EXACTLY from
      pass 1, not estimated -- is under 16M): sorted key array via ONE
      ray.put; pass 2 is a single zero-exchange map_batches with one
      searchsorted membership test per batch.
    * partitioned (the 100-TB path): windows and dup keys union into one
      hash(key) exchange; each partition marks membership locally and emits
      per-doc partial counts, which a doc-keyed groupby sums.
    """
    # materialized once into the (spillable) object store: pass 1 runs a
    # single time whichever path pass 2 takes; only the BROADCAST branch
    # ever pulls the keys to the driver, and only after the exact count
    # says they fit
    dup = dup_token_ngrams(sf_dir, n=n, buckets=buckets).materialize()
    if broadcast is None:
        broadcast = dup.count() <= _DUP_BCAST_MAX_KEYS

    toks = tokens_from_documents(sf_dir)
    out_schema = pa.schema([
        ("doc_id", pa.string()), ("n_windows", pa.int64()),
        ("n_dup", pa.int64()), ("dup_rate", pa.float64()),
    ])

    def _finalize(did: pa.Array, win: np.ndarray, dupc: np.ndarray) -> pa.Table:
        rate = np.round(dupc / win, 6)
        return pa.table({
            "doc_id": did, "n_windows": pa.array(win, pa.int64()),
            "n_dup": pa.array(dupc, pa.int64()),
            "dup_rate": pa.array(rate, pa.float64()),
        }, schema=out_schema)

    if broadcast:
        import ray as _ray

        dup_keys_tbl = dataset_to_table(
            dup.select_columns(["ngram_key"]),
            schema=pa.schema([("ngram_key", pa.int64())]),
        )
        keys_ref = _ray.put(np.sort(
            dup_keys_tbl["ngram_key"].to_numpy(zero_copy_only=False)
            .astype(np.int64)
        ))

        def mark(t: pa.Table) -> pa.Table:
            keep = _ray.get(keys_ref)
            t = t.combine_chunks()
            vals, offs = _flat_tokens(t)
            keys, win_row = _ngram_keys(vals, offs, n)
            counts = np.maximum(np.diff(offs) - n + 1, 0)
            rows = np.flatnonzero(counts)
            if not len(rows):
                return pa.Table.from_pylist([], schema=out_schema)
            if len(keep):
                pos = np.searchsorted(keep, keys)
                hit = (pos < len(keep)) & (
                    keep[np.minimum(pos, len(keep) - 1)] == keys)
            else:
                hit = np.zeros(len(keys), dtype=bool)
            dupc = np.bincount(win_row, weights=hit.astype(np.float64),
                               minlength=len(counts)).astype(np.int64)
            did = t["doc_id"]
            if isinstance(did, pa.ChunkedArray):
                did = did.combine_chunks()
            return _finalize(did.take(pa.array(rows)), counts[rows],
                             dupc[rows])

        return toks.map_batches(
            mark, batch_format="pyarrow", batch_size=65536
        ).sort("doc_id")

    # ---- partitioned union-mark path ----
    mark_schema = pa.schema([
        ("ngram_key", pa.int64()), ("did", pa.int64()),
        ("is_key", pa.int32()), ("prt", pa.int64()),
    ])

    def win_rows(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        vals, offs = _flat_tokens(t)
        keys, win_row = _ngram_keys(vals, offs, n)
        if not len(keys):
            return pa.Table.from_pylist([], schema=mark_schema)
        did_np = t["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "ngram_key": pa.array(keys, pa.int64()),
            "did": pa.array(did_np[win_row], pa.int64()),
            "is_key": pa.array(np.zeros(len(keys), np.int32), pa.int32()),
            "prt": pa.array(hash_prt(keys, buckets), pa.int64()),
        }, schema=mark_schema)

    def key_rows(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        k = t["ngram_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "ngram_key": pa.array(k, pa.int64()),
            "did": pa.array(np.full(len(k), -1, np.int64), pa.int64()),
            "is_key": pa.array(np.ones(len(k), np.int32), pa.int32()),
            "prt": pa.array(hash_prt(k, buckets), pa.int64()),
        }, schema=mark_schema)

    part_schema = pa.schema([
        ("did", pa.int64()), ("win", pa.int64()), ("dup", pa.int64()),
    ])

    def mark_partition(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        is_key = g["is_key"].to_numpy(zero_copy_only=False).astype(bool)
        keys = g["ngram_key"].to_numpy(zero_copy_only=False)
        did = g["did"].to_numpy(zero_copy_only=False)
        wmask = ~is_key
        if not wmask.any():
            return pa.Table.from_pylist([], schema=part_schema)
        keep = np.sort(keys[is_key])
        wk, wd = keys[wmask], did[wmask]
        if len(keep):
            pos = np.searchsorted(keep, wk)
            hit = (pos < len(keep)) & (keep[np.minimum(pos, len(keep) - 1)] == wk)
        else:
            hit = np.zeros(len(wk), dtype=bool)
        order = np.argsort(wd, kind="stable")
        d_s = wd[order]
        starts = np.flatnonzero(np.concatenate(([True], d_s[1:] != d_s[:-1])))
        win = np.diff(np.append(starts, len(d_s))).astype(np.int64)
        dupc = np.add.reduceat(hit[order].astype(np.int64), starts)
        return pa.table({
            "did": pa.array(d_s[starts], pa.int64()),
            "win": pa.array(win, pa.int64()),
            "dup": pa.array(dupc, pa.int64()),
        }, schema=part_schema)

    wins = toks.map_batches(win_rows, batch_format="pyarrow",
                            batch_size=65536)
    keys_ds = dup.select_columns(["ngram_key"]).map_batches(
        key_rows, batch_format="pyarrow")
    parts = (
        wins.union(keys_ds)
        .groupby("prt")
        .map_groups(lambda g: mark_partition(g.drop_columns(["prt"])),
                    batch_format="pyarrow")
    )

    def final(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        did = int(g["did"][0].as_py())
        win = int(g["win"].to_numpy(zero_copy_only=False).sum())
        dupc = int(g["dup"].to_numpy(zero_copy_only=False).sum())
        return _finalize(pa.array([str(did)], pa.string()),
                         np.array([win], np.int64),
                         np.array([dupc], np.int64))

    return parts.groupby("did").map_groups(
        final, batch_format="pyarrow").sort("doc_id")


def doc_dup_ngram_rate_sql(n: int = 8) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), w -> length(w)::BIGINT) AS wl,
         len(string_split(text, ' ')) AS n
  FROM documents
),
pos AS (
  SELECT doc_id, wl, unnest(generate_series(1, n - {n - 1})) AS i
  FROM tok WHERE n >= {n}
),
keys AS (SELECT doc_id, {_dup_sql_key(n)} AS ngram_key FROM pos),
dup AS (SELECT ngram_key FROM keys GROUP BY ngram_key HAVING count(*) >= 2)
SELECT CAST(k.doc_id AS VARCHAR) AS doc_id,
       count(*)::BIGINT AS n_windows,
       count(d.ngram_key)::BIGINT AS n_dup,
       round(count(d.ngram_key)::DOUBLE / count(*)::DOUBLE, 6) AS dup_rate
FROM keys k LEFT JOIN dup d USING (ngram_key)
GROUP BY k.doc_id ORDER BY CAST(k.doc_id AS VARCHAR)
"""


def clean_corpus_ngram(sf_dir: str, n: int = 8, max_rate: float = 0.5,
                       buckets: int = 32,
                       broadcast: bool | None = None) -> rd.Dataset:
    """The substring-dedup CLEANING step: keep documents whose n-gram
    duplication rate is <= ``max_rate``; documents too short to have any
    window (n_tok < n) are trivially kept with zero counts.

    Scale shape: a per-batch filter over the streaming rate table plus one
    zero-exchange scan for short docs -- no exchanges beyond what
    ``doc_dup_ngram_rate`` already pays.
    """
    rate = doc_dup_ngram_rate(sf_dir, n=n, buckets=buckets,
                              broadcast=broadcast)
    out_schema = pa.schema([
        ("doc_id", pa.string()), ("n_windows", pa.int64()),
        ("n_dup", pa.int64()), ("dup_rate", pa.float64()),
    ])

    def keep(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        r = t["dup_rate"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(r <= max_rate)).cast(out_schema)

    def shorts(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        ntk = t["n_tok"].to_numpy(zero_copy_only=False)
        rows = np.flatnonzero(ntk < n)
        did = t["doc_id"]
        if isinstance(did, pa.ChunkedArray):
            did = did.combine_chunks()
        z = np.zeros(len(rows), np.int64)
        return pa.table({
            "doc_id": did.take(pa.array(rows)),
            "n_windows": pa.array(z, pa.int64()),
            "n_dup": pa.array(z, pa.int64()),
            "dup_rate": pa.array(np.zeros(len(rows)), pa.float64()),
        }, schema=out_schema)

    short_ds = tokens_from_documents(sf_dir).map_batches(
        shorts, batch_format="pyarrow", batch_size=65536)
    return rate.map_batches(keep, batch_format="pyarrow").union(
        short_ds).sort("doc_id")


def clean_corpus_ngram_sql(n: int = 8, max_rate: float = 0.5) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), w -> length(w)::BIGINT) AS wl,
         len(string_split(text, ' ')) AS n
  FROM documents
),
pos AS (
  SELECT doc_id, wl, unnest(generate_series(1, n - {n - 1})) AS i
  FROM tok WHERE n >= {n}
),
keys AS (SELECT doc_id, {_dup_sql_key(n)} AS ngram_key FROM pos),
dup AS (SELECT ngram_key FROM keys GROUP BY ngram_key HAVING count(*) >= 2),
rated AS (
  SELECT CAST(k.doc_id AS VARCHAR) AS doc_id,
         count(*)::BIGINT AS n_windows,
         count(d.ngram_key)::BIGINT AS n_dup,
         round(count(d.ngram_key)::DOUBLE / count(*)::DOUBLE, 6) AS dup_rate
  FROM keys k LEFT JOIN dup d USING (ngram_key)
  GROUP BY k.doc_id
)
SELECT * FROM rated WHERE dup_rate <= {max_rate}
UNION ALL
SELECT CAST(doc_id AS VARCHAR) AS doc_id, 0::BIGINT, 0::BIGINT, 0.0
FROM tok WHERE n < {n}
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Vocabulary dynamics per retention bucket (source, seq // width)
# ---------------------------------------------------------------------------


def rollup_distinct_tokens(sf_dir: str, width: int = 4,
                           buckets: int = 32) -> rd.Dataset:
    """Exact distinct-token count per (source, seq-bucket) rollup cell --
    the vocabulary-size tier that rides next to the count/sum/percentile
    rollups (stages/rollup.py) in a corpus-drift dashboard.

    Scale shape: batches collapse to distinct (source, bucket, token)
    triples before the ONE hash(bucket, token) exchange; a triple lands in
    exactly one partition, so per-partition distinct counts are additive.
    The exchange is bounded by cells x vocabulary, never by corpus size.
    """
    toks = tokens_from_documents(sf_dir)

    triple_schema = pa.schema([
        ("source", pa.string()), ("bucket", pa.int64()),
        ("tokval", pa.int64()), ("prt", pa.int64()),
    ])

    def triples(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        vals, offs = _flat_tokens(t)
        if not len(vals):
            return pa.Table.from_pylist([], schema=triple_schema)
        lens = np.diff(offs)
        seq = t["seq"].to_numpy(zero_copy_only=False)
        bkt = np.repeat(seq // width, lens)
        src = t["source"].combine_chunks() if isinstance(
            t["source"], pa.ChunkedArray) else t["source"]
        d = src.dictionary_encode()
        codes = np.repeat(
            d.indices.to_numpy(zero_copy_only=False).astype(np.int64), lens)
        order = np.lexsort((vals, bkt, codes))
        c_s, b_s, v_s = codes[order], bkt[order], vals[order]
        keep = np.concatenate(([True], (c_s[1:] != c_s[:-1])
                               | (b_s[1:] != b_s[:-1])
                               | (v_s[1:] != v_s[:-1])))
        c_k, b_k, v_k = c_s[keep], b_s[keep], v_s[keep]
        prt = hash_prt(b_k * _TOK_BASE + v_k, buckets)
        return pa.table({
            "source": d.dictionary.take(pa.array(c_k)).cast(pa.string()),
            "bucket": pa.array(b_k, pa.int64()),
            "tokval": pa.array(v_k, pa.int64()),
            "prt": pa.array(prt, pa.int64()),
        }, schema=triple_schema)

    part_schema = pa.schema([
        ("source", pa.string()), ("bucket", pa.int64()),
        ("part_cnt", pa.int64()),
    ])

    def count_partition(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        if g.num_rows == 0:
            return pa.Table.from_pylist([], schema=part_schema)
        src = g["source"].combine_chunks() if isinstance(
            g["source"], pa.ChunkedArray) else g["source"]
        d = src.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = g["bucket"].to_numpy(zero_copy_only=False)
        vals = g["tokval"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, bkt, codes))
        c_s, b_s, v_s = codes[order], bkt[order], vals[order]
        new_cell = np.concatenate(([True], (c_s[1:] != c_s[:-1])
                                   | (b_s[1:] != b_s[:-1])))
        new_trip = new_cell | np.concatenate(([True], v_s[1:] != v_s[:-1]))
        starts = np.flatnonzero(new_cell)
        cnt = np.add.reduceat(new_trip.astype(np.int64), starts)
        sel = starts
        return pa.table({
            "source": d.dictionary.take(pa.array(c_s[sel])).cast(pa.string()),
            "bucket": pa.array(b_s[sel], pa.int64()),
            "part_cnt": pa.array(cnt, pa.int64()),
        }, schema=part_schema)

    parts = (
        toks.map_batches(triples, batch_format="pyarrow", batch_size=65536)
        .groupby("prt")
        .map_groups(lambda g: count_partition(g.drop_columns(["prt"])),
                    batch_format="pyarrow")
    )

    out_schema = pa.schema([
        ("source", pa.string()), ("bucket", pa.int64()),
        ("n_distinct_tok", pa.int64()),
    ])

    def final(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        return pa.table({
            "source": g["source"][:1].cast(pa.string()),
            "bucket": g["bucket"][:1],
            "n_distinct_tok": pa.array(
                [int(g["part_cnt"].to_numpy(zero_copy_only=False).sum())],
                pa.int64()),
        }, schema=out_schema)

    return parts.groupby(["source", "bucket"]).map_groups(
        final, batch_format="pyarrow").sort(["source", "bucket"])


def rollup_distinct_tokens_sql(width: int = 4) -> str:
    return f"""
WITH tok AS (
  SELECT source,
         (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1)
           // {width} AS bucket,
         string_split(text, ' ') AS words
  FROM documents
),
flat AS (SELECT source, bucket, length(unnest(words))::BIGINT AS tokval
         FROM tok)
SELECT source, bucket, count(DISTINCT tokval)::BIGINT AS n_distinct_tok
FROM flat GROUP BY source, bucket ORDER BY source, bucket
"""


def token_novelty_by_bucket(sf_dir: str, width: int = 4,
                            buckets: int = 32) -> rd.Dataset:
    """How many tokens make their FIRST per-source appearance in each
    seq-bucket -- the vocabulary-growth / novelty curve a streaming corpus
    audit watches for drift and contamination.

    Scale shape: batches collapse to (source, token, min_seq) partials; the
    ONE hash(token) exchange merges minima (a (source, token) pair lands in
    exactly one partition, so the partition min is the global min); the
    per-partition (source, first-bucket) counts are additive.
    """
    toks = tokens_from_documents(sf_dir)

    min_schema = pa.schema([
        ("source", pa.string()), ("tokval", pa.int64()),
        ("min_seq", pa.int64()), ("prt", pa.int64()),
    ])

    def partial_min(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        vals, offs = _flat_tokens(t)
        if not len(vals):
            return pa.Table.from_pylist([], schema=min_schema)
        lens = np.diff(offs)
        seq = np.repeat(t["seq"].to_numpy(zero_copy_only=False), lens)
        src = t["source"].combine_chunks() if isinstance(
            t["source"], pa.ChunkedArray) else t["source"]
        d = src.dictionary_encode()
        codes = np.repeat(
            d.indices.to_numpy(zero_copy_only=False).astype(np.int64), lens)
        order = np.lexsort((seq, vals, codes))
        c_s, v_s, s_s = codes[order], vals[order], seq[order]
        keep = np.concatenate(([True], (c_s[1:] != c_s[:-1])
                               | (v_s[1:] != v_s[:-1])))
        # first row of each (source, token) run carries the min seq
        c_k, v_k, s_k = c_s[keep], v_s[keep], s_s[keep]
        return pa.table({
            "source": d.dictionary.take(pa.array(c_k)).cast(pa.string()),
            "tokval": pa.array(v_k, pa.int64()),
            "min_seq": pa.array(s_k, pa.int64()),
            "prt": pa.array(hash_prt(v_k, buckets), pa.int64()),
        }, schema=min_schema)

    part_schema = pa.schema([
        ("source", pa.string()), ("bucket", pa.int64()),
        ("part_new", pa.int64()),
    ])

    def merge_partition(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        if g.num_rows == 0:
            return pa.Table.from_pylist([], schema=part_schema)
        src = g["source"].combine_chunks() if isinstance(
            g["source"], pa.ChunkedArray) else g["source"]
        d = src.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = g["tokval"].to_numpy(zero_copy_only=False)
        seq = g["min_seq"].to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, vals, codes))
        c_s, v_s, s_s = codes[order], vals[order], seq[order]
        keep = np.concatenate(([True], (c_s[1:] != c_s[:-1])
                               | (v_s[1:] != v_s[:-1])))
        c_k, s_k = c_s[keep], s_s[keep]
        bkt = s_k // width
        order2 = np.lexsort((bkt, c_k))
        c2, b2 = c_k[order2], bkt[order2]
        new_cell = np.concatenate(([True], (c2[1:] != c2[:-1])
                                   | (b2[1:] != b2[:-1])))
        starts = np.flatnonzero(new_cell)
        cnt = np.diff(np.append(starts, len(c2))).astype(np.int64)
        return pa.table({
            "source": d.dictionary.take(pa.array(c2[starts])).cast(pa.string()),
            "bucket": pa.array(b2[starts], pa.int64()),
            "part_new": pa.array(cnt, pa.int64()),
        }, schema=part_schema)

    parts = (
        toks.map_batches(partial_min, batch_format="pyarrow",
                         batch_size=65536)
        .groupby("prt")
        .map_groups(lambda g: merge_partition(g.drop_columns(["prt"])),
                    batch_format="pyarrow")
    )

    out_schema = pa.schema([
        ("source", pa.string()), ("bucket", pa.int64()),
        ("n_new_tokens", pa.int64()),
    ])

    def final(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        return pa.table({
            "source": g["source"][:1].cast(pa.string()),
            "bucket": g["bucket"][:1],
            "n_new_tokens": pa.array(
                [int(g["part_new"].to_numpy(zero_copy_only=False).sum())],
                pa.int64()),
        }, schema=out_schema)

    return parts.groupby(["source", "bucket"]).map_groups(
        final, batch_format="pyarrow").sort(["source", "bucket"])


def token_novelty_by_bucket_sql(width: int = 4) -> str:
    return f"""
WITH tok AS (
  SELECT source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS seq,
         string_split(text, ' ') AS words
  FROM documents
),
flat AS (SELECT source, seq, length(unnest(words))::BIGINT AS tokval
         FROM tok),
fs AS (SELECT source, tokval, min(seq) AS first_seq
       FROM flat GROUP BY source, tokval)
SELECT source, first_seq // {width} AS bucket,
       count(*)::BIGINT AS n_new_tokens
FROM fs GROUP BY source, bucket ORDER BY source, bucket
"""


# ---------------------------------------------------------------------------
# True ExactSubstr excision (Lee et al. 2022): keep the corpus-FIRST
# occurrence of every duplicated window, excise all others
# ---------------------------------------------------------------------------

_POS_BITS = 32  # (doc, pos) pack for winner selection


def dedup_ngram_spans(sf_dir: str, n: int = 8, buckets: int = 32,
                      broadcast: bool | None = None) -> rd.Dataset:
    """Per document: how many tokens an ExactSubstr dedup pass removes.
    Every duplicated n-gram keeps exactly its corpus-first occurrence
    (minimum packed (doc_id, position)); every other occurrence's token
    span [i, i+n) is excised; overlapping loser spans union.  Output
    (doc_id, n_tok, n_removed, keep_frac) for every document.

    Scale shape: pass 1 extends ``dup_token_ngrams``'s exchange with a
    per-key packed-position MIN (same single hash(key) exchange); pass 2
    re-scans tokens and marks loser windows either against a broadcast
    sorted (key -> winner) pair of arrays (size-guarded by the EXACT
    duplicated-key count) or through a partitioned union-mark exchange
    plus one doc-keyed merge (the 100-TB path) -- bitwise-identical,
    parity-tested.  Token spans never leave their batch; only window
    keys and packed positions cross exchanges.
    """
    toks = tokens_from_documents(sf_dir)

    win_schema = pa.schema([
        ("ngram_key", pa.int64()), ("occ", pa.int64()),
        ("min_pack", pa.int64()), ("prt", pa.int64()),
    ])

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        vals, offs = _flat_tokens(t)
        keys, win_row = _ngram_keys(vals, offs, n)
        if not len(keys):
            return pa.Table.from_pylist([], schema=win_schema)
        did = t["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if int(did.max()) >= (1 << (63 - _POS_BITS)):
            raise ValueError("doc_id overflows the (doc, pos) winner pack")
        starts = offs[:-1][win_row]
        pos_in_doc = (np.arange(len(keys), dtype=np.int64)
                      - np.searchsorted(win_row, win_row))
        # position of window within its doc = flat pos - doc start
        counts = np.maximum(np.diff(offs) - n + 1, 0)
        flat_pos = np.repeat(offs[:-1], counts) + pos_in_doc
        ipos = flat_pos - starts
        if len(ipos) and int(ipos.max()) >= (1 << _POS_BITS):
            raise ValueError("window position overflows the winner pack")
        pack = did[win_row] * (1 << _POS_BITS) + ipos
        order = np.lexsort((pack, keys))
        k_s, p_s = keys[order], pack[order]
        new_key = np.concatenate(([True], k_s[1:] != k_s[:-1]))
        starts_k = np.flatnonzero(new_key)
        occ = np.diff(np.append(starts_k, len(k_s)))
        return pa.table({
            "ngram_key": pa.array(k_s[starts_k], pa.int64()),
            "occ": pa.array(occ, pa.int64()),
            "min_pack": pa.array(p_s[starts_k], pa.int64()),
            "prt": pa.array(hash_prt(k_s[starts_k], buckets), pa.int64()),
        }, schema=win_schema)

    dup_schema = pa.schema([
        ("ngram_key", pa.int64()), ("min_pack", pa.int64()),
    ])

    def merge(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        if g.num_rows == 0:
            return pa.Table.from_pylist([], schema=dup_schema)
        k = g["ngram_key"].to_numpy(zero_copy_only=False)
        occ = g["occ"].to_numpy(zero_copy_only=False)
        mp = g["min_pack"].to_numpy(zero_copy_only=False)
        order = np.lexsort((mp, k))
        k_s, o_s, m_s = k[order], occ[order], mp[order]
        new_key = np.concatenate(([True], k_s[1:] != k_s[:-1]))
        starts = np.flatnonzero(new_key)
        occ_sum = np.add.reduceat(o_s, starts)
        dup = occ_sum >= 2
        return pa.table({
            "ngram_key": pa.array(k_s[starts][dup], pa.int64()),
            "min_pack": pa.array(m_s[starts][dup], pa.int64()),
        }, schema=dup_schema)

    winners = (
        toks.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("prt")
        .map_groups(lambda g: merge(g.drop_columns(["prt"])),
                    batch_format="pyarrow")
    ).materialize()
    if broadcast is None:
        broadcast = winners.count() <= _DUP_BCAST_MAX_KEYS

    out_schema = pa.schema([
        ("doc_id", pa.string()), ("n_tok", pa.int64()),
        ("n_removed", pa.int64()), ("keep_frac", pa.float64()),
    ])

    def _emit(did: pa.Array, ntk: np.ndarray, rem: np.ndarray) -> pa.Table:
        frac = np.round((ntk - rem) / np.maximum(ntk, 1), 6)
        return pa.table({
            "doc_id": did, "n_tok": pa.array(ntk, pa.int64()),
            "n_removed": pa.array(rem, pa.int64()),
            "keep_frac": pa.array(frac, pa.float64()),
        }, schema=out_schema)

    def _removed_per_row(vals, offs, keys, win_row, did, loser_mask):
        """Union loser spans [i, i+n) per row, vectorized by difference
        array over the batch's flat token positions."""
        lens = np.diff(offs)
        counts = np.maximum(lens - n + 1, 0)
        flat_starts = np.repeat(offs[:-1], counts)
        ipos = (np.arange(len(keys), dtype=np.int64)
                - np.repeat(np.cumsum(counts) - counts, counts))
        diff = np.zeros(len(vals) + 1, np.int64)
        lp = flat_starts[loser_mask] + ipos[loser_mask]
        np.add.at(diff, lp, 1)
        np.add.at(diff, np.minimum(lp + n, np.repeat(offs[1:], counts)[loser_mask]), -1)
        covered = np.cumsum(diff[:-1]) > 0
        # clip spans at row boundaries: spans never cross rows because a
        # window lives inside one row and i + n <= row end by construction
        seg = np.zeros(len(vals) + 1, np.int64)
        np.add.at(seg, offs[:-1], 1)
        row_of = np.cumsum(seg[:-1]) - 1
        rem = np.bincount(row_of[covered], minlength=len(lens)).astype(np.int64)
        return rem

    if broadcast:
        import ray as _ray

        wt = dataset_to_table(winners, schema=dup_schema)
        k_arr = wt["ngram_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        p_arr = wt["min_pack"].to_numpy(zero_copy_only=False).astype(np.int64)
        srt = np.argsort(k_arr)
        w_ref = _ray.put((k_arr[srt], p_arr[srt]))

        def mark(t: pa.Table) -> pa.Table:
            wk, wp = _ray.get(w_ref)
            t = t.combine_chunks()
            vals, offs = _flat_tokens(t)
            keys, win_row = _ngram_keys(vals, offs, n)
            did = t["doc_id"]
            if isinstance(did, pa.ChunkedArray):
                did = did.combine_chunks()
            ntk = np.diff(offs)
            if not len(keys):
                return _emit(did, ntk, np.zeros(len(ntk), np.int64))
            did_np = did.cast(pa.int64()).to_numpy(zero_copy_only=False)
            counts = np.maximum(ntk - n + 1, 0)
            ipos = (np.arange(len(keys), dtype=np.int64)
                    - np.repeat(np.cumsum(counts) - counts, counts))
            pack = did_np[win_row] * (1 << _POS_BITS) + ipos
            if len(wk):
                at = np.searchsorted(wk, keys)
                at_c = np.minimum(at, len(wk) - 1)
                is_dup = wk[at_c] == keys
                loser = is_dup & (wp[at_c] != pack)
            else:
                loser = np.zeros(len(keys), dtype=bool)
            rem = _removed_per_row(vals, offs, keys, win_row, did_np, loser)
            return _emit(did, ntk, rem)

        return toks.map_batches(
            mark, batch_format="pyarrow", batch_size=65536
        ).sort("doc_id")

    # ---- partitioned path: union-mark on hash(key), then doc-keyed merge
    mark_schema = pa.schema([
        ("ngram_key", pa.int64()), ("pack", pa.int64()),
        ("is_key", pa.int32()), ("prt", pa.int64()),
    ])

    def win_rows(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        vals, offs = _flat_tokens(t)
        keys, win_row = _ngram_keys(vals, offs, n)
        if not len(keys):
            return pa.Table.from_pylist([], schema=mark_schema)
        did_np = t["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        counts = np.maximum(np.diff(offs) - n + 1, 0)
        ipos = (np.arange(len(keys), dtype=np.int64)
                - np.repeat(np.cumsum(counts) - counts, counts))
        pack = did_np[win_row] * (1 << _POS_BITS) + ipos
        return pa.table({
            "ngram_key": pa.array(keys, pa.int64()),
            "pack": pa.array(pack, pa.int64()),
            "is_key": pa.array(np.zeros(len(keys), np.int32), pa.int32()),
            "prt": pa.array(hash_prt(keys, buckets), pa.int64()),
        }, schema=mark_schema)

    def key_rows(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        k = t["ngram_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        mp = t["min_pack"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "ngram_key": pa.array(k, pa.int64()),
            "pack": pa.array(mp, pa.int64()),
            "is_key": pa.array(np.ones(len(k), np.int32), pa.int32()),
            "prt": pa.array(hash_prt(k, buckets), pa.int64()),
        }, schema=mark_schema)

    # one shared schema for the doc-keyed merge: doc rows carry val=n_tok
    # with is_doc=1, loser rows carry val=ipos with is_doc=0
    doc_schema = pa.schema([
        ("did", pa.int64()), ("val", pa.int64()),
        ("is_doc", pa.int32()), ("dprt", pa.int64()),
    ])

    def mark_partition(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        is_key = g["is_key"].to_numpy(zero_copy_only=False).astype(bool)
        keys = g["ngram_key"].to_numpy(zero_copy_only=False)
        pack = g["pack"].to_numpy(zero_copy_only=False)
        kk = keys[is_key]
        kp = pack[is_key]
        srt = np.argsort(kk)
        kk, kp = kk[srt], kp[srt]
        wk, wp = keys[~is_key], pack[~is_key]
        if len(kk):
            at = np.searchsorted(kk, wk)
            at_c = np.minimum(at, len(kk) - 1)
            loser = (kk[at_c] == wk) & (kp[at_c] != wp)
        else:
            loser = np.zeros(len(wk), dtype=bool)
        lp = wp[loser]
        did = lp >> _POS_BITS
        ipos = lp & ((1 << _POS_BITS) - 1)
        return pa.table({
            "did": pa.array(did, pa.int64()),
            "val": pa.array(ipos, pa.int64()),
            "is_doc": pa.array(np.zeros(len(did), np.int32), pa.int32()),
            "dprt": pa.array(hash_prt(did, buckets), pa.int64()),
        }, schema=doc_schema)

    losers = (
        toks.map_batches(win_rows, batch_format="pyarrow", batch_size=65536)
        .union(winners.map_batches(key_rows, batch_format="pyarrow"))
        .groupby("prt")
        .map_groups(lambda g: mark_partition(g.drop_columns(["prt"])),
                    batch_format="pyarrow")
    )

    def doc_rows(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        did = t["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ntk = t["n_tok"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "did": pa.array(did, pa.int64()),
            "val": pa.array(ntk, pa.int64()),
            "is_doc": pa.array(np.ones(len(did), np.int32), pa.int32()),
            "dprt": pa.array(hash_prt(did, buckets), pa.int64()),
        }, schema=doc_schema)

    def merge_doc(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        did = g["did"].to_numpy(zero_copy_only=False)
        val = g["val"].to_numpy(zero_copy_only=False)
        is_doc = g["is_doc"].to_numpy(zero_copy_only=False).astype(bool)
        ntk = np.where(is_doc, val, -1)
        ipos = np.where(is_doc, -1, val)
        order = np.argsort(did[is_doc], kind="stable")
        d_doc = did[is_doc][order]
        n_doc = ntk[is_doc][order]
        out_rem = np.zeros(len(d_doc), np.int64)
        lmask = ~is_doc
        if lmask.any():
            ld, li = did[lmask], ipos[lmask]
            o2 = np.lexsort((li, ld))
            ld, li = ld[o2], li[o2]
            # union spans per doc via difference array over doc-local axes
            row = np.searchsorted(d_doc, ld)
            ntk_l = n_doc[row]
            # build a compact flat axis: per involved doc, n_tok slots
            uniq, first = np.unique(row, return_index=True)
            base = np.zeros(len(uniq), np.int64)
            base[1:] = np.cumsum(n_doc[uniq])[:-1]
            flat = base[np.searchsorted(uniq, row)] + li
            total = int(n_doc[uniq].sum())
            diff = np.zeros(total + 1, np.int64)
            np.add.at(diff, flat, 1)
            ends = np.minimum(li + n, ntk_l)
            np.add.at(diff, base[np.searchsorted(uniq, row)] + ends, -1)
            covered = np.cumsum(diff[:-1]) > 0
            seg_row = np.repeat(uniq, n_doc[uniq])
            rem = np.bincount(seg_row[covered], minlength=len(d_doc))
            out_rem = rem[: len(d_doc)].astype(np.int64)
        did_str = pa.array([str(x) for x in d_doc], pa.string())
        return _emit(did_str, n_doc, out_rem)

    docs = toks.map_batches(doc_rows, batch_format="pyarrow",
                            batch_size=65536)
    return (
        docs.union(losers)
        .groupby("dprt")
        .map_groups(lambda g: merge_doc(g.drop_columns(["dprt"])),
                    batch_format="pyarrow")
        .sort("doc_id")
    )


def dedup_ngram_spans_sql(n: int = 8) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), w -> length(w)::BIGINT) AS wl,
         len(string_split(text, ' ')) AS n
  FROM documents
),
pos AS (
  SELECT doc_id, wl, n, unnest(generate_series(1, n - {n - 1})) AS i
  FROM tok WHERE n >= {n}
),
keys AS (
  SELECT doc_id, n, i - 1 AS ipos, {_dup_sql_key(n)} AS ngram_key
  FROM pos
),
winners AS (
  SELECT ngram_key,
         min(doc_id * {1 << _POS_BITS} + ipos) AS min_pack,
         count(*) AS occ
  FROM keys GROUP BY ngram_key HAVING count(*) >= 2
),
losers AS (
  SELECT k.doc_id, k.ipos, k.n
  FROM keys k JOIN winners w USING (ngram_key)
  WHERE k.doc_id * {1 << _POS_BITS} + k.ipos <> w.min_pack
),
removed AS (
  SELECT doc_id, count(DISTINCT p) AS n_removed
  FROM (SELECT doc_id,
               unnest(generate_series(ipos, least(ipos + {n - 1}, n - 1))) AS p
        FROM losers)
  GROUP BY doc_id
)
SELECT CAST(t.doc_id AS VARCHAR) AS doc_id,
       t.n::BIGINT AS n_tok,
       coalesce(r.n_removed, 0)::BIGINT AS n_removed,
       round((t.n - coalesce(r.n_removed, 0))::DOUBLE
             / greatest(t.n, 1)::DOUBLE, 6) AS keep_frac
FROM tok t LEFT JOIN removed r ON t.doc_id = r.doc_id
ORDER BY CAST(t.doc_id AS VARCHAR)
"""


# ---------------------------------------------------------------------------
# Train/eval decontamination: flag training docs sharing token n-grams with
# a held-out eval split -- the benchmark-leakage check every LLM-training
# corpus runs before training (the eval side is tiny by construction)
# ---------------------------------------------------------------------------

def decontaminate_against_eval(
    sf_dir: str, n: int = 8, eval_mod: int = 10, buckets: int = 32
) -> rd.Dataset:
    """Per TRAINING document (``doc_id % eval_mod != 0``): total token
    n-gram windows, how many of them occur anywhere in the EVAL split
    (``doc_id % eval_mod == 0``), the contamination rate, and the
    contaminated flag.  Docs shorter than ``n`` tokens have no windows and
    are excluded, as the window definition implies.

    Scale shape: pass 1 distills the eval split to its DISTINCT packed
    n-gram keys -- per-batch unique, ONE hash(key) exchange, per-partition
    unique -- and broadcasts the sorted key array once (eval sets are
    benchmark-sized; the ``_DUP_BCAST_MAX_KEYS`` guard raises loudly if
    not, pointing at the union-mark exchange ``doc_dup_ngram_rate`` uses
    for raw-sized key sets).  Pass 2 is exchange-FREE: each batch scores
    its own training docs by one ``searchsorted`` membership test; a doc
    never spans batches, so per-doc sums complete locally.
    """
    import ray

    toks = tokens_from_documents(sf_dir)

    key_schema = pa.schema([("ngram_key", pa.int64()), ("prt", pa.int64())])

    def eval_keys(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        did = t["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(did % eval_mod == 0)
        if not len(sel):
            return pa.Table.from_pylist([], schema=key_schema)
        vals, offs = _flat_tokens(t.take(pa.array(sel)))
        keys, _ = _ngram_keys(vals, offs, n)
        uniq = np.unique(keys)
        return pa.table(
            {
                "ngram_key": pa.array(uniq, pa.int64()),
                "prt": pa.array(hash_prt(uniq, buckets), pa.int64()),
            },
            schema=key_schema,
        )

    def uniq_partition(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        u = np.unique(g["ngram_key"].to_numpy(zero_copy_only=False))
        return pa.table({"ngram_key": pa.array(u, pa.int64())})

    ek_tbl = dataset_to_table(
        toks.map_batches(eval_keys, batch_format="pyarrow")
        .groupby("prt")
        .map_groups(
            lambda g: uniq_partition(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )
    if ek_tbl.num_rows > _DUP_BCAST_MAX_KEYS:
        raise ValueError(
            f"decontaminate_against_eval: {ek_tbl.num_rows} eval n-gram "
            f"keys exceed the broadcast guard ({_DUP_BCAST_MAX_KEYS}); "
            "an eval split this large needs the partitioned union-mark "
            "path (doc_dup_ngram_rate broadcast=False shows the wiring)"
        )
    ek = np.sort(ek_tbl["ngram_key"].to_numpy(zero_copy_only=False))
    ref = ray.put(ek)

    out_schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("windows", pa.int64()),
            ("contaminated", pa.int64()),
            ("contamination_rate", pa.float64()),
            ("is_contaminated", pa.bool_()),
        ]
    )

    def score(t: pa.Table) -> pa.Table:
        ev = ray.get(ref)
        t = t.combine_chunks()
        did = t["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(did % eval_mod != 0)
        if not len(sel):
            return pa.Table.from_pylist([], schema=out_schema)
        sub = t.take(pa.array(sel))
        vals, offs = _flat_tokens(sub)
        keys, win_row = _ngram_keys(vals, offs, n)
        if not len(keys):
            return pa.Table.from_pylist([], schema=out_schema)
        if len(ev):
            pos = np.searchsorted(ev, keys)
            hit = (pos < len(ev)) & (
                ev[np.minimum(pos, len(ev) - 1)] == keys
            )
        else:
            hit = np.zeros(len(keys), dtype=bool)
        # windows are emitted row-major, so win_row is non-decreasing:
        # per-doc sums reduce over contiguous runs
        starts = np.flatnonzero(
            np.concatenate(([True], win_row[1:] != win_row[:-1]))
        )
        cont = np.add.reduceat(hit.astype(np.int64), starts)
        rows = win_row[starts]
        counts = np.maximum(np.diff(offs) - n + 1, 0)
        w = counts[rows]
        doc_col = sub["doc_id"]
        if isinstance(doc_col, pa.ChunkedArray):
            doc_col = doc_col.combine_chunks()
        return pa.table(
            {
                "doc_id": doc_col.take(pa.array(rows)),
                "windows": pa.array(w, pa.int64()),
                "contaminated": pa.array(cont, pa.int64()),
                "contamination_rate": pa.array(cont / w, pa.float64()),
                "is_contaminated": pa.array(cont > 0, pa.bool_()),
            },
            schema=out_schema,
        )

    return toks.map_batches(score, batch_format="pyarrow")


def decontaminate_against_eval_sql(n: int = 8, eval_mod: int = 10) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), w -> length(w)::BIGINT) AS wl,
         len(string_split(text, ' ')) AS n
  FROM documents
),
pos AS (
  SELECT doc_id, wl, unnest(generate_series(1, n - {n - 1})) AS i
  FROM tok WHERE n >= {n}
),
keys AS (SELECT doc_id, {_dup_sql_key(n)} AS ngram_key FROM pos),
ek AS (SELECT DISTINCT ngram_key FROM keys WHERE doc_id % {eval_mod} = 0),
tr AS (SELECT doc_id, ngram_key FROM keys WHERE doc_id % {eval_mod} <> 0)
SELECT CAST(tr.doc_id AS VARCHAR) AS doc_id,
       count(*)::BIGINT AS windows,
       count(ek.ngram_key)::BIGINT AS contaminated,
       count(ek.ngram_key)::DOUBLE / count(*) AS contamination_rate,
       (count(ek.ngram_key) > 0) AS is_contaminated
FROM tr LEFT JOIN ek ON tr.ngram_key = ek.ngram_key
GROUP BY tr.doc_id
"""


DECONTAMINATE_AGAINST_EVAL_SQL = decontaminate_against_eval_sql()


# ---------------------------------------------------------------------------
# Flagship curation composition: the end-to-end training-corpus gate
# (exact dedup -> eval-split removal + decontamination -> length quality)
# ---------------------------------------------------------------------------

def curate_corpus(
    sf_dir: str, n: int = 8, eval_mod: int = 10,
    min_chars: int = 100, max_chars: int = 500,
    buckets: int = 32,
) -> rd.Dataset:
    """The composed LLM-training-data curation pipeline in one query:
    exact dedup (first doc of each duplicate group survives), removal of
    the eval split itself plus every training doc it contaminates
    (``decontaminate_against_eval``), then the length quality gate
    (``min_chars <= n_chars <= max_chars``).  Returns the final corpus's
    (doc_id, lang, n_chars).

    Scale shape: each stage keeps its own exchange discipline -- dedup's
    hash(key) group pass, decontamination's bounded eval-key exchange +
    exchange-free scoring -- and the composition adds exactly ONE more
    hash(doc_id) exchange: the union-tag anti-join that subtracts the
    contaminated ids (corpus-scale, so NEVER broadcast or collected) from
    the deduped stream.  Eval-split and length predicates apply inside
    that same final kernel; no stage materializes raw data on the driver.
    """
    from ..pipelines.text_pipeline import clean_corpus_exact

    deduped = clean_corpus_exact(sf_dir, buckets=buckets)
    flagged = decontaminate_against_eval(
        sf_dir, n=n, eval_mod=eval_mod, buckets=buckets
    )

    union_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("side", pa.int8()),
            ("lang", pa.string()),
            ("n_chars", pa.int64()),
            ("prt", pa.int64()),
        ]
    )

    def tag_kept(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (
            (did % eval_mod != 0)
            & (nch >= min_chars)
            & (nch <= max_chars)
        )
        sub = t.take(pa.array(np.flatnonzero(keep)))
        did = did[keep]
        nrow = len(did)
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "side": pa.array(np.zeros(nrow, np.int8), pa.int8()),
                "lang": sub["lang"].cast(pa.string()),
                "n_chars": sub["n_chars"].cast(pa.int64()),
                "prt": pa.array(hash_prt(did, buckets), pa.int64()),
            },
            schema=union_schema,
        )

    def tag_contaminated(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        flag = t["is_contaminated"].to_numpy(zero_copy_only=False)
        did = (
            t["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        )[flag]
        nrow = len(did)
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "side": pa.array(np.ones(nrow, np.int8), pa.int8()),
                "lang": pa.nulls(nrow, pa.string()),
                "n_chars": pa.nulls(nrow, pa.int64()),
                "prt": pa.array(hash_prt(did, buckets), pa.int64()),
            },
            schema=union_schema,
        )

    kept = deduped.map_batches(tag_kept, batch_format="pyarrow")
    drops = flagged.map_batches(tag_contaminated, batch_format="pyarrow")

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("lang", pa.string()),
         ("n_chars", pa.int64())]
    )

    def anti_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        side = t["side"].to_numpy(zero_copy_only=False)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        drop = np.unique(did[side == 1])
        keep_idx = np.flatnonzero(side == 0)
        dk = did[keep_idx]
        if len(drop):
            pos = np.searchsorted(drop, dk)
            hit = (pos < len(drop)) & (
                drop[np.minimum(pos, len(drop) - 1)] == dk
            )
        else:
            hit = np.zeros(len(dk), dtype=bool)
        sub = t.take(pa.array(keep_idx[~hit]))
        return pa.table(
            {
                "doc_id": sub["doc_id"],
                "lang": sub["lang"],
                "n_chars": sub["n_chars"],
            },
            schema=out_schema,
        )

    return (
        kept.union(drops)
        .groupby("prt")
        .map_groups(
            lambda g: anti_bucket(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


def curate_corpus_sql(
    n: int = 8, eval_mod: int = 10,
    min_chars: int = 100, max_chars: int = 500,
) -> str:
    return f"""
WITH dedup AS (
  SELECT doc_id::BIGINT AS doc_id, lang, n_chars::BIGINT AS n_chars
  FROM documents
  QUALIFY row_number() OVER (PARTITION BY substr(text, 1, 40)
                             ORDER BY doc_id) = 1
),
tok AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), w -> length(w)::BIGINT) AS wl,
         len(string_split(text, ' ')) AS n
  FROM documents
),
pos AS (
  SELECT doc_id, wl, unnest(generate_series(1, n - {n - 1})) AS i
  FROM tok WHERE n >= {n}
),
keys AS (SELECT doc_id, {_dup_sql_key(n)} AS ngram_key FROM pos),
ek AS (SELECT DISTINCT ngram_key FROM keys WHERE doc_id % {eval_mod} = 0),
cont AS (
  SELECT DISTINCT k.doc_id FROM keys k JOIN ek ON k.ngram_key = ek.ngram_key
  WHERE k.doc_id % {eval_mod} <> 0
)
SELECT d.doc_id, d.lang, d.n_chars
FROM dedup d
WHERE d.doc_id % {eval_mod} <> 0
  AND d.n_chars BETWEEN {min_chars} AND {max_chars}
  AND d.doc_id NOT IN (SELECT doc_id FROM cont)
"""


CURATE_CORPUS_SQL = curate_corpus_sql()
