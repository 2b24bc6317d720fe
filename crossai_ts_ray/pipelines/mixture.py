"""Corpus composition operators: deterministic source-mixture resampling
and greedy sequence packing into fixed token budgets.

Engine-new (the reference has no corpus-composition stage; closest analogue
is its stratified train/test splitting, /root/reference/caits/experimental.py
-- here re-expressed as distributed, deterministic, oracle-checkable ops):

* ``resample_mixture`` -- downsample every source to the same expected token
  mass (the "domain mixing" step of LLM data pipelines: balance sources
  before training).  Selection is a pure function of document content
  (md5 prefix vs a per-source threshold), so the same rows are kept on
  every run, every cluster size, every partitioning -- no RNG state to
  coordinate across workers.

* ``pack_sequences`` -- greedy in-order packing of documents into bins of a
  fixed token capacity (the "sequence packing" step that turns a ragged
  document corpus into fixed-length training examples).  Packing is
  sequential by definition *within* a source; sources are the parallelism
  unit (the same partitioning assumption as the engine's other per-source
  ordered scans: EWMA, CUSUM, sessions).

Scale shape:
* resample_mixture: pass 1 is ONE groupby over (source) -- a #sources-sized
  exchange; the threshold map is broadcast via ray.put; pass 2 is an
  embarrassingly parallel filter (zero exchange).  Text never re-ships.
* pack_sequences: one hash exchange on source, then a per-group kernel whose
  only Python loop is over output BINS (cumsum + searchsorted finds each bin
  boundary in O(log n)); per-doc work is vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import md5_fingerprint
from ..sources.readers import read_parquet_sized

PACK_CAPACITY = 512  # tokens per packed training example


def _docs(sf_dir: str, columns):
    return read_parquet_sized(f"{sf_dir}/documents.parquet", columns=list(columns))


# ---------------------------------------------------------------------------
# Source-mixture resampling
# ---------------------------------------------------------------------------


def resample_mixture(sf_dir: str):
    """Deterministically downsample each source so its expected kept
    character mass equals the smallest source's total: per-source keep
    probability p_s = min_total / total_s, realized as
    ``md5(text)[:8] < hex(floor(p_s * 2^32))`` -- content-hash thresholding,
    the distributed-reproducible form of weighted sampling.

    The min source keeps every row (p_s == 1 short-circuits the hash test,
    so even its ``ffffffff``-prefixed rows survive).
    """
    import ray

    totals = (
        _docs(sf_dir, ("source", "n_chars"))
        .groupby("source")
        .sum("n_chars")
        .take_all()  # bounded: one row per source
    )
    tot = {r["source"]: int(r["sum(n_chars)"]) for r in totals}
    mn = min(tot.values())
    thr = {
        s: None if v <= mn else format(int(np.floor(np.float64(mn) / np.float64(v) * 4294967296.0)), "08x")
        for s, v in tot.items()
    }
    thr_ref = ray.put(thr)

    def keep(t: pa.Table) -> pa.Table:
        th = ray.get(thr_ref)
        t = t.combine_chunks()
        srcs = t["source"].to_pylist()
        texts = t["text"].to_pylist()
        mask = np.array(
            [
                th[s] is None or md5_fingerprint(x)[:8] < th[s]
                for s, x in zip(srcs, texts)
            ],
            dtype=bool,
        )
        t = t.filter(pa.array(mask))
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "source": t["source"],
                "n_chars": t["n_chars"].cast(pa.int64()),
            }
        )

    return _docs(sf_dir, ("doc_id", "text", "source", "n_chars")).map_batches(
        keep, batch_format="pyarrow"
    )


RESAMPLE_MIXTURE_SQL = """
WITH tot AS (
  SELECT source, sum(n_chars)::BIGINT AS tot FROM documents GROUP BY 1
),
thr AS (
  SELECT source, tot, (SELECT min(tot) FROM tot) AS mn,
         printf('%08x', CAST(floor((SELECT min(tot) FROM tot)::DOUBLE
                                    / tot::DOUBLE * 4294967296.0) AS BIGINT)) AS h
  FROM tot
)
SELECT d.doc_id::BIGINT AS doc_id, d.source, d.n_chars::BIGINT AS n_chars
FROM documents d JOIN thr USING (source)
WHERE thr.tot <= thr.mn OR substr(md5(d.text), 1, 8) < thr.h
"""


# ---------------------------------------------------------------------------
# Greedy sequence packing
# ---------------------------------------------------------------------------


def pack_sequences(sf_dir: str, capacity: int = PACK_CAPACITY):
    """Pack each source's documents, in doc_id order, into bins of at most
    ``capacity`` tokens (whitespace tokens here, mirroring
    ``len(string_split(text, ' '))``): a doc joins the current bin iff
    fill + n_tok <= capacity, else it starts a new bin; an oversized doc
    occupies a bin alone.  Emits one row per bin with its doc span and fill.

    Kernel: cumsum over the source's token counts, then each bin boundary is
    one ``searchsorted`` -- the Python loop runs once per OUTPUT bin, never
    per doc.  Partitioning assumption: a source's docs fit one group (the
    per-source sequential-scan contract shared with EWMA/sessions); for a
    single pathological source, pack per shard and stitch with a carry.
    """

    def pack(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        order = pc.sort_indices(g["doc_id"])
        did = g["doc_id"].to_numpy(zero_copy_only=False)[order.to_numpy()]
        texts = g["text"].take(order)
        # len(string_split(text, ' ')): split count, empties included
        n_tok = (
            pc.list_value_length(pc.split_pattern(texts, " "))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        cs = np.cumsum(n_tok)
        n = len(cs)
        bins = []  # (bin_id, start, end) -- loop is O(#bins)
        start, base, b = 0, 0, 0
        while start < n:
            nxt = int(np.searchsorted(cs, base + capacity, side="right"))
            if nxt == start:
                nxt = start + 1
            bins.append((b, start, nxt))
            base = int(cs[nxt - 1])
            start = nxt
            b += 1
        bid = np.array([x[0] for x in bins], dtype=np.int64)
        lo = np.array([x[1] for x in bins], dtype=np.int64)
        hi = np.array([x[2] for x in bins], dtype=np.int64)
        tok_sum = cs[hi - 1] - np.where(lo > 0, cs[lo - 1], 0)
        return pa.table(
            {
                "source": pa.array([g["source"][0].as_py()] * len(bins)),
                "bin_id": pa.array(bid),
                "n_docs": pa.array(hi - lo),
                "tok_sum": pa.array(tok_sum),
                "first_doc": pa.array(did[lo]),
                "last_doc": pa.array(did[hi - 1]),
                # capacity is a power of two, so the division is IEEE-exact
                # on both sides -- no rounding needed for oracle equality
                "fill_frac": pa.array(tok_sum.astype(np.float64) / float(capacity)),
            }
        )

    return (
        _docs(sf_dir, ("doc_id", "text", "source"))
        .groupby("source")
        .map_groups(pack, batch_format="pyarrow")
    )


PACK_SEQUENCES_SQL = f"""
WITH RECURSIVE d AS (
  SELECT source, doc_id, len(string_split(text, ' '))::BIGINT AS n_tok,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
),
r AS (
  SELECT source, rn, doc_id, n_tok, n_tok AS fill, 0::BIGINT AS bin
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.source, d.rn, d.doc_id, d.n_tok,
         CASE WHEN r.fill + d.n_tok <= {PACK_CAPACITY}
              THEN r.fill + d.n_tok ELSE d.n_tok END,
         CASE WHEN r.fill + d.n_tok <= {PACK_CAPACITY}
              THEN r.bin ELSE r.bin + 1 END
  FROM r JOIN d ON d.source = r.source AND d.rn = r.rn + 1
)
SELECT source, bin AS bin_id, count(*)::BIGINT AS n_docs,
       sum(n_tok)::BIGINT AS tok_sum,
       min(doc_id)::BIGINT AS first_doc, max(doc_id)::BIGINT AS last_doc,
       sum(n_tok)::DOUBLE / {PACK_CAPACITY} AS fill_frac
FROM r GROUP BY 1, 2
"""
