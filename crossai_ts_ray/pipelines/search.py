"""Ranked text retrieval: BM25 over a persisted length-aware inverted index.

The relevance-scoring sibling of ``text_pipeline.build_inverted_index``
(conjunctive boolean search): postings carry the document length so the
classic Okapi BM25 weight can be computed entirely from the pruned partition
reads — a query never touches the corpus text.

Scale shape (100 TB honest):
* the index is built ONCE and persisted as Parquet partitioned by
  ``pp = hash(term) % partitions``; each query term reads ONLY its hash
  partition (1/partitions of postings, column-pruned),
* corpus statistics (N, total token count) are a one-time two-scalar
  aggregate persisted beside the index,
* scoring is ONE hash exchange of the query terms' postings on ``doc_id``
  (bounded by the hottest query term's postings, never the corpus), a
  vectorized per-partition segment reduction, and a per-partition top-k
  prune so the final sort sees ``<= buckets x k`` candidate rows.

Float parity with the DuckDB oracle: per-(doc, term) contributions are
unique (one tf per pair), so the per-term partial columns sum exactly in
any order; the cross-term sum is done in FIXED term order on both sides,
and the final score is rounded to 6 decimals (house convention), which
absorbs any libm ULP difference in ``ln``.

Reference parity note: the reference has no retrieval code; this is an
engine-new family next to its feature-extraction pipelines
(``/root/reference/caits/fe/`` computes per-signal features; BM25 is the
text-corpus analogue of a per-instance scoring pass).
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..sources.readers import read_parquet_sized
from ..stages.joins import hash_prt

_BM25_INDEX_DIRS: dict = {}
_BM25_PARTS = 64


def _read_docs(sf_dir: str, columns=("doc_id", "text")):
    return read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=list(columns)
    )


def build_bm25_index(
    sf_dir: str, partitions: int = _BM25_PARTS
) -> tuple[str, int, int]:
    """Build (once per process) the BM25 inverted index: postings rows
    ``(word, doc_id, tf, dl, pp)`` persisted as Parquet partitioned by
    ``pp = hash(crc32(word)) % partitions``, plus the two corpus scalars
    (doc count N, total token count) persisted beside it.

    ``dl`` (the posting's document length in tokens) is denormalized onto
    every posting — one int64 per posting, the standard impact-ordered
    index trade — so scoring needs NO join back to a doc-length table.

    Returns ``(root, n_docs, total_len)``."""
    ck = (sf_dir, partitions)
    hit = _BM25_INDEX_DIRS.get(ck)
    if hit is not None and os.path.isdir(hit[0]):
        return hit
    root = tempfile.mkdtemp(prefix="crossai_bm25_idx_")

    def postings(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lists = pc.split_pattern(text, pattern=" ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.values
        offs = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        dl_per_doc = np.diff(offs)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(doc_ids, dl_per_doc)
        # ONE value_counts over "word\x1fdoc" strings does the whole batch's
        # (word, doc) term-frequency count in C++ (same trick as the
        # boolean index in text_pipeline.build_inverted_index)
        joined = pc.binary_join_element_wise(
            flat, pa.array(doc_of.astype("U"), pa.string()), "\x1f"
        )
        vc = pc.value_counts(joined)
        pairs = vc.field("values")
        tf = vc.field("counts").cast(pa.int64())
        parts = pc.split_pattern(pairs, pattern="\x1f")
        words = pc.list_element(parts, 0)
        docs = pc.cast(pc.list_element(parts, 1), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        # look the posting's document length up from this batch's rows
        # (doc_id is unique per batch: one document per row)
        order = np.argsort(doc_ids, kind="stable")
        pos = np.searchsorted(doc_ids[order], docs)
        dl = dl_per_doc[order][pos]
        h = np.array(
            [zlib.crc32(w.encode()) for w in words.to_pylist()],
            dtype=np.int64,
        )
        return pa.table(
            {
                "word": words,
                "doc_id": pa.array(docs, pa.int64()),
                "tf": tf,
                "dl": pa.array(dl, pa.int64()),
                "pp": pa.array(hash_prt(h, partitions), pa.int64()),
            }
        )

    def stat_partial(t: pa.Table) -> pa.Table:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lists = pc.split_pattern(text, pattern=" ")
        n_tok = pc.list_value_length(lists).cast(pa.int64())
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "tot": pa.array(
                    [pc.sum(n_tok).as_py() or 0], pa.int64()
                ),
            }
        )

    try:
        _read_docs(sf_dir).map_batches(
            postings, batch_format="pyarrow", batch_size=1_048_576
        ).write_parquet(os.path.join(root, "postings"),
                        partition_cols=["pp"])
        # corpus scalars: a second streaming pass collapsing to per-batch
        # (n_docs, total_len) partials -- two int64s per batch, summed by
        # the engine; one-time index-build cost, persisted beside the index
        stats_ds = _read_docs(sf_dir, columns=("text",)).map_batches(
            stat_partial, batch_format="pyarrow", batch_size=1_048_576
        )
        n_docs = 0
        total_len = 0
        for b in stats_ds.iter_batches(batch_format="pyarrow"):
            n_docs += int(pc.sum(b["n"]).as_py() or 0)
            total_len += int(pc.sum(b["tot"]).as_py() or 0)
        pa.parquet.write_table(
            pa.table(
                {
                    "n_docs": pa.array([n_docs], pa.int64()),
                    "total_len": pa.array([total_len], pa.int64()),
                }
            ),
            os.path.join(root, "stats.parquet"),
        )
    except BaseException:
        shutil.rmtree(root, ignore_errors=True)
        raise
    out = (root, n_docs, total_len)
    _BM25_INDEX_DIRS[ck] = out
    return out


def _term_postings(
    root: str, term: str, ti: int, partitions: int
) -> rd.Dataset:
    """Postings for one query term: reads ONLY the term's hash partition."""
    empty_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("tf", pa.int64()),
            ("dl", pa.int64()),
            ("ti", pa.int64()),
        ]
    )
    pp = int(
        hash_prt(
            np.array([zlib.crc32(term.encode())], np.int64), partitions
        )[0]
    )
    part_dir = os.path.join(root, "postings", f"pp={pp}")
    if not os.path.isdir(part_dir):
        return rd.from_arrow(pa.Table.from_pylist([], schema=empty_schema))
    ds = read_parquet_sized(part_dir, columns=["word", "doc_id", "tf", "dl"])

    def pick(t: pa.Table, _term=term, _ti=ti) -> pa.Table:
        t = t.filter(pc.equal(t["word"], _term))
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "tf": t["tf"].cast(pa.int64()),
                "dl": t["dl"].cast(pa.int64()),
                "ti": pa.array(np.full(t.num_rows, _ti, np.int64)),
            }
        )

    return ds.map_batches(pick, batch_format="pyarrow")


def bm25_search(
    sf_dir: str,
    terms: tuple[str, ...] = ("scan", "merge"),
    k: int = 15,
    k1: float = 1.5,
    b: float = 0.75,
    partitions: int = _BM25_PARTS,
    buckets: int = 16,
) -> rd.Dataset:
    """Okapi BM25 top-k ranked retrieval for a disjunctive term query.

    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1-b + b * dl/avgdl)),
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)); rounded to 6 decimals.

    Returns (doc_id, n_matched, score) for the top ``k`` docs by
    (score DESC, doc_id ASC).

    Scale shape: the query terms' postings (pruned partition reads) are
    materialized once — bounded by the hottest term's postings, never the
    corpus — to derive per-term document frequencies (a |terms|-row
    aggregate) without re-reading; scoring is one hash exchange on doc_id
    with a per-partition top-k prune, so the global sort sees at most
    ``buckets * k`` rows."""
    if len(terms) == 0:
        raise ValueError("need at least one term")
    root, n_docs, total_len = build_bm25_index(sf_dir, partitions)
    if n_docs == 0:
        raise ValueError("empty corpus")
    avgdl = float(total_len) / float(n_docs)
    n = float(n_docs)

    parts = [
        _term_postings(root, t, i, partitions) for i, t in enumerate(terms)
    ]
    union = parts[0]
    if len(parts) > 1:
        union = union.union(*parts[1:])
    # query-postings-sized materialize: reused for the df count AND the
    # scoring pass without re-executing the pruned reads
    union = union.materialize()

    df = np.zeros(len(terms), np.float64)
    for row in union.groupby("ti").count().take_all():
        df[int(row["ti"])] = float(row["count()"])
    idf = np.array(
        [
            math.log(1.0 + (n - d + 0.5) / (d + 0.5)) if d > 0 else 0.0
            for d in df
        ],
        np.float64,
    )
    nt = len(terms)
    one_minus_b = 1.0 - b
    k1p1 = k1 + 1.0

    def contrib(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        ti = t["ti"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = tf * k1p1 / (tf + k1 * (one_minus_b + b * (dl / avgdl)))
        c = idf[ti] * w
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "ti": pa.array(ti, pa.int64()),
                "c": pa.array(c, pa.float64()),
                "prt": pa.array(hash_prt(doc, buckets), pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_matched", pa.int64()),
            ("score", pa.float64()),
        ]
    )

    def topk_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        ti = t["ti"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        order = np.argsort(doc, kind="stable")
        ds_ = doc[order]
        starts = np.flatnonzero(
            np.concatenate(([True], ds_[1:] != ds_[:-1]))
        )
        gid = np.cumsum(np.concatenate(([0], (ds_[1:] != ds_[:-1]).astype(np.int64))))
        docs_u = ds_[starts]
        ng = len(docs_u)
        # one slot per (doc, term): each holds at most ONE contribution,
        # so the scatter-add is exact regardless of arrival order
        s = np.zeros((ng, nt), np.float64)
        m = np.zeros((ng, nt), np.int64)
        np.add.at(s, (gid, ti[order]), c[order])
        np.add.at(m, (gid, ti[order]), 1)
        # cross-term sum in FIXED term order (mirrors the SQL's
        # left-to-right CASE sum bit-for-bit)
        acc = s[:, 0].copy()
        for j in range(1, nt):
            acc = acc + s[:, j]
        score = np.round(acc, 6)
        n_matched = (m > 0).sum(axis=1).astype(np.int64)
        # per-partition top-k prune: global top-k is a subset of the
        # union of per-partition top-k under the same total order
        rank = np.lexsort((docs_u, -score))[: min(k, ng)]
        return pa.table(
            {
                "doc_id": pa.array(docs_u[rank], pa.int64()),
                "n_matched": pa.array(n_matched[rank], pa.int64()),
                "score": pa.array(score[rank], pa.float64()),
            },
            schema=out_schema,
        )

    return (
        union.map_batches(contrib, batch_format="pyarrow",
                          batch_size=1_048_576)
        .groupby("prt")
        .map_groups(
            lambda g: topk_partition(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )


def bm25_sql(
    terms: tuple[str, ...] = ("scan", "merge"),
    k: int = 15,
    k1: float = 1.5,
    b: float = 0.75,
) -> str:
    """DuckDB mirror of ``bm25_search`` with the SAME float op order:
    per-term CASE contributions summed left-to-right, rounded to 6."""
    tf_cols = ",\n         ".join(
        f"len(list_filter(words, w -> w = '{t}'))::DOUBLE AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)::DOUBLE AS df{i}"
        for i in range(len(terms))
    )
    omb = repr(1.0 - b)
    k1p1 = repr(k1 + 1.0)
    k1r = repr(k1)
    br = repr(b)
    contribs = "\n      + ".join(
        f"(CASE WHEN tf{i} > 0 THEN "
        f"ln(1 + (st.n - dfs.df{i} + 0.5) / (dfs.df{i} + 0.5)) * "
        f"(tf{i} * {k1p1} / (tf{i} + {k1r} * ({omb} + {br} * "
        f"(dl / (st.tot / st.n))))) ELSE 0.0 END)"
        for i in range(len(terms))
    )
    matched = " + ".join(
        f"CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END"
        for i in range(len(terms))
    )
    return f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
d AS (
  SELECT doc_id, len(words)::DOUBLE AS dl,
         {tf_cols}
  FROM tok
),
st AS (SELECT count(*)::DOUBLE AS n, sum(dl) AS tot FROM d),
dfs AS (SELECT {df_cols} FROM d),
sc AS (
  SELECT d.doc_id,
         ({matched})::BIGINT AS n_matched,
         round(
         {contribs}
         , 6) AS score
  FROM d, st, dfs
)
SELECT doc_id, n_matched, score FROM sc WHERE n_matched > 0
ORDER BY score DESC, doc_id LIMIT {k}
"""


BM25_SEARCH_SQL = bm25_sql()
