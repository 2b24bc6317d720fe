"""Alignment-aware rollup: the no-raw-shuffle fast path.

Contract: input files are written in per-source *seq ranges* whose boundaries
are multiples of CHUNK_ROWS (synth.py does this; a real ingest would write
time-partitioned files the same way).  Group ``k = width / gcd(width,
CHUNK_ROWS)`` consecutive files of a source and every finest-tier bucket is
wholly inside one group -- even with deleted rows (gaps), because boundaries
are on the seq axis.  Consequences:

* finest tier: complete groups inside one map task -> sort locally, finalize
  directly.  NO shuffle of raw tokens, no hist serialization.  This is the
  "pre-aggregate before the shuffle" principle taken to its limit: the
  partitioning key chosen at ingest (source, seq-range) is reused by the
  rollup.
* coarser tiers: per-(source, coarse-bucket) partial counters + DENSE value
  histograms (token domain is a bounded vocab => a dense int32 bincount is
  ~40x smaller than the raw multiset of a 1d bucket and merges by vector
  addition -- exact).  The shuffle moves ~200KB per (source, hourly bucket)
  instead of the raw token volume.

Bitwise-exactness: identical multisets reach every percentile computation;
``percentile_from_dense`` replicates np.percentile(method="linear") on the
expanded multiset (tests prove equality with oracle.rollup on all tiers).

Fallback: stages/rollup.py's generic hash-shuffle path handles unaligned /
unclustered input with the same exactness.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.numutil import group_boundaries
from ..schema import MAX_N_TOK, ROLLUP_SCHEMA, VOCAB_SIZE, Tier
from .rollup import Q_HIGH, Q_LOW, _list_arr, _list_col_to_numpy

NTOK_BINS = MAX_N_TOK + 1  # n_tok in [1, MAX_N_TOK]


def percentile_from_dense(counts: np.ndarray, q: float) -> float:
    """Exact linear-method percentile from a dense histogram (value = bin
    index); bitwise == np.percentile on the expanded multiset."""
    cum = np.cumsum(counts.astype(np.int64))
    n = int(cum[-1])
    if n == 0:
        return float("nan")
    h = (q / 100.0) * (n - 1)
    lo = int(np.floor(h))
    hi = int(np.ceil(h))
    a = float(np.searchsorted(cum, lo, side="right"))
    b = float(np.searchsorted(cum, hi, side="right"))
    t = h - lo
    diff = b - a
    return b - diff * (1 - t) if t >= 0.5 else a + diff * t


def _percentiles_dense_rows(hists: np.ndarray, q: float) -> np.ndarray:
    """Vectorized over rows of a (G, bins) dense hist matrix."""
    cum = np.cumsum(hists.astype(np.int64), axis=1)
    n = cum[:, -1]
    h = (q / 100.0) * (n - 1)
    lo = np.floor(h).astype(np.int64)
    hi = np.ceil(h).astype(np.int64)
    G = hists.shape[0]
    a = np.empty(G)
    b = np.empty(G)
    for i in range(G):  # searchsorted per row (rows are few: rollup groups)
        a[i] = np.searchsorted(cum[i], lo[i], side="right")
        b[i] = np.searchsorted(cum[i], hi[i], side="right")
    t = h - lo
    diff = b - a
    return np.where(t >= 0.5, b - diff * (1 - t), a + diff * t)


def plan_aligned_groups(shard_dirs: list[str], chunk_rows: int, width: int):
    """[(source_files...)] grouped so finest-tier buckets never span groups."""
    import glob as _glob
    import re

    k = width // math.gcd(width, chunk_rows)
    by_source: dict[str, list[str]] = {}
    for sd in shard_dirs:
        for f in sorted(_glob.glob(os.path.join(sd, "*.parquet"))):
            m = re.match(r"part-(.+)-(\d+)\.parquet", os.path.basename(f))
            by_source.setdefault(m.group(1), []).append(f)
    groups = []
    for src in sorted(by_source):
        files = by_source[src]
        for i in range(0, len(files), k):
            groups.append(files[i : i + k])
    return groups


def process_aligned_group(
    files: list[str], fine: Tier, coarse: Tier, chunk_rows: int | None = None
) -> pa.Table:
    """One map task: read a bucket-aligned file group of ONE source, emit
    union rows -- kind=0: finalized fine-tier rollups; kind=1: coarse-tier
    partials (counters + dense hists)."""
    t = pq.read_table(files, columns=["tokens", "n_tok", "source", "seq"])
    t = t.combine_chunks()
    n = t.num_rows
    seq = t["seq"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_tok = t["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
    src = t["source"][0].as_py()
    flat, row_offs = _list_col_to_numpy(t["tokens"])
    flat64 = flat.astype(np.int64)

    # rows are seq-sorted within a source's files by construction
    if not (np.diff(seq) > 0).all():
        raise ValueError("aligned path requires seq-sorted input")
    if chunk_rows is not None:
        # alignment contract: every file's seq values live in its own
        # chunk-sized seq range (a merely seq-SORTED but striped layout would
        # pass the sort check yet split buckets across groups -> silent
        # wrong results without this guard)
        import re

        cidx = [
            int(re.match(r"part-.+-(\d+)\.parquet", os.path.basename(f)).group(1))
            for f in files
        ]
        c0 = cidx[0]
        k = fine.width // math.gcd(fine.width, chunk_rows)
        # a missing leading chunk file shifts every group start: each group
        # still covers a contiguous seq range (passing the range check below)
        # yet finest-tier buckets span two groups -> duplicate finalized
        # (source, bucket) rows. Refuse unless groups start on a k boundary
        # and chunk indices are consecutive.
        if c0 % k != 0 or cidx != list(range(c0, c0 + len(files))):
            raise ValueError(
                f"unaligned file group (chunk indices {cidx}, group stride {k}): "
                "missing or out-of-order chunk files -- use the generic shuffle path"
            )
        lo, hi = c0 * chunk_rows, (c0 + len(files)) * chunk_rows
        if not (seq[0] >= lo and seq[-1] < hi):
            raise ValueError(
                f"unaligned input: seq range [{seq[0]}, {seq[-1]}] outside "
                f"file-group range [{lo}, {hi}) -- use the generic shuffle path"
            )

    out_tables = []
    for kind, tier in ((0, fine), (1, coarse)):
        bucket = seq // tier.width
        starts = group_boundaries(bucket)
        ends = np.append(starts[1:], n)
        G = len(starts)
        counts = (ends - starts).astype(np.int64)
        sum_n = np.add.reduceat(n_tok, starts)
        min_n = np.minimum.reduceat(n_tok, starts).astype(np.int32)
        max_n = np.maximum.reduceat(n_tok, starts).astype(np.int32)
        seg_starts = row_offs[starts]
        seg_ends = np.append(row_offs[starts[1:]], row_offs[-1])
        tok_count = (seg_ends - seg_starts).astype(np.int64)
        tok_sum = np.add.reduceat(flat64, seg_starts)
        tok_min = np.minimum.reduceat(flat, seg_starts).astype(np.int32)
        tok_max = np.maximum.reduceat(flat, seg_starts).astype(np.int32)

        base = {
            "kind": pa.array(np.full(G, kind, dtype=np.int8), pa.int8()),
            "source": pa.array([src] * G, pa.string()),
            "bucket": pa.array(bucket[starts], pa.int64()),
            "count": pa.array(counts, pa.int64()),
            "sum": pa.array(sum_n, pa.int64()),
            "min": pa.array(min_n, pa.int32()),
            "max": pa.array(max_n, pa.int32()),
            "tok_count": pa.array(tok_count, pa.int64()),
            "tok_sum": pa.array(tok_sum, pa.int64()),
            "tok_min": pa.array(tok_min, pa.int32()),
            "tok_max": pa.array(tok_max, pa.int32()),
        }
        if kind == 0:
            # finalize in-task: complete groups by the alignment contract
            mean = sum_n.astype(np.float64) / counts.astype(np.float64)
            tok_mean = tok_sum.astype(np.float64) / tok_count.astype(np.float64)
            p50 = np.empty(G)
            p99 = np.empty(G)
            tp50 = np.empty(G)
            tp99 = np.empty(G)
            from ..functions.numutil import percentile_from_sorted

            for i in range(G):
                nv = np.sort(n_tok[starts[i] : ends[i]])
                p50[i] = percentile_from_sorted(nv, Q_LOW)
                p99[i] = percentile_from_sorted(nv, Q_HIGH)
                tvv = np.sort(flat64[seg_starts[i] : seg_ends[i]])
                tp50[i] = percentile_from_sorted(tvv, Q_LOW)
                tp99[i] = percentile_from_sorted(tvv, Q_HIGH)
            fine_cols = dict(base)
            fine_cols.pop("kind")
            tbl = pa.table(
                {
                    "kind": base["kind"],
                    "source": base["source"],
                    "bucket": base["bucket"],
                    "count": base["count"],
                    "sum": base["sum"],
                    "mean": pa.array(mean, pa.float64()),
                    "min": base["min"],
                    "max": base["max"],
                    "p50": pa.array(p50, pa.float64()),
                    "p99": pa.array(p99, pa.float64()),
                    "tok_count": base["tok_count"],
                    "tok_sum": base["tok_sum"],
                    "tok_mean": pa.array(tok_mean, pa.float64()),
                    "tok_min": base["tok_min"],
                    "tok_max": base["tok_max"],
                    "tok_p50": pa.array(tp50, pa.float64()),
                    "tok_p99": pa.array(tp99, pa.float64()),
                    "ntok_hist": pa.array([None] * G, pa.list_(pa.int32())),
                    "tok_hist": pa.array([None] * G, pa.list_(pa.int32())),
                }
            )
        else:
            # dense partial hists per coarse group (merge = vector add)
            nh = np.zeros((G, NTOK_BINS), dtype=np.int32)
            th = np.zeros((G, VOCAB_SIZE), dtype=np.int32)
            gid_rows = np.repeat(np.arange(G, dtype=np.int64), ends - starts)
            np.add.at(nh, (gid_rows, n_tok), 1)
            gid_toks = np.repeat(
                np.arange(G, dtype=np.int64), seg_ends - seg_starts
            )
            np.add.at(th, (gid_toks, flat64), 1)
            nulls = [None] * G
            tbl = pa.table(
                {
                    "kind": base["kind"],
                    "source": base["source"],
                    "bucket": base["bucket"],
                    "count": base["count"],
                    "sum": base["sum"],
                    "mean": pa.array([None] * G, pa.float64()),
                    "min": base["min"],
                    "max": base["max"],
                    "p50": pa.array(nulls, pa.float64()),
                    "p99": pa.array(nulls, pa.float64()),
                    "tok_count": base["tok_count"],
                    "tok_sum": base["tok_sum"],
                    "tok_mean": pa.array(nulls, pa.float64()),
                    "tok_min": base["tok_min"],
                    "tok_max": base["tok_max"],
                    "tok_p50": pa.array(nulls, pa.float64()),
                    "tok_p99": pa.array(nulls, pa.float64()),
                    "ntok_hist": _list_arr(
                        np.arange(G + 1, dtype=np.int64) * NTOK_BINS, nh.ravel(), pa.int32()
                    ),
                    "tok_hist": _list_arr(
                        np.arange(G + 1, dtype=np.int64) * VOCAB_SIZE, th.ravel(), pa.int32()
                    ),
                }
            )
        out_tables.append(tbl)
    return pa.concat_tables(out_tables)


def merge_dense_partials(tbl: pa.Table) -> pa.Table:
    """Merge coarse partial rows of one hash partition into finalized ROLLUP
    rows: counters reduce, dense hists vector-add, percentiles from dense."""
    t = tbl.combine_chunks()
    if "prt" in t.schema.names:
        t = t.drop_columns(["prt"])
    n = t.num_rows
    if n == 0:
        return pa.Table.from_pylist([], schema=ROLLUP_SCHEMA)
    src = np.asarray(t["source"].to_pylist(), dtype=object)
    codes_map = {s: i for i, s in enumerate(sorted(set(src.tolist())))}
    codes = np.array([codes_map[s] for s in src.tolist()], dtype=np.int64)
    bucket = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((bucket, codes))
    c_s, b_s = codes[order], bucket[order]
    starts = group_boundaries(c_s, b_s)
    ends = np.append(starts[1:], n)
    G = len(starts)

    def seg(col, op):
        return op.reduceat(t[col].to_numpy(zero_copy_only=False)[order], starts)

    cnt = seg("count", np.add).astype(np.int64)
    s_ = seg("sum", np.add).astype(np.int64)
    tok_cnt = seg("tok_count", np.add).astype(np.int64)
    tok_sum = seg("tok_sum", np.add).astype(np.int64)

    nh_flat, _ = _list_col_to_numpy(t["ntok_hist"])
    th_flat, _ = _list_col_to_numpy(t["tok_hist"])
    nh = nh_flat.reshape(n, NTOK_BINS)[order].astype(np.int64)
    th = th_flat.reshape(n, VOCAB_SIZE)[order].astype(np.int64)
    nh_m = np.add.reduceat(nh, starts, axis=0)
    th_m = np.add.reduceat(th, starts, axis=0)

    inv_src = {v: k for k, v in codes_map.items()}
    return pa.table(
        {
            "source": pa.array([inv_src[c] for c in c_s[starts]], pa.string()),
            "bucket": pa.array(b_s[starts], pa.int64()),
            "count": pa.array(cnt, pa.int64()),
            "sum": pa.array(s_, pa.int64()),
            "mean": pa.array(s_.astype(np.float64) / cnt.astype(np.float64), pa.float64()),
            "min": pa.array(seg("min", np.minimum).astype(np.int32), pa.int32()),
            "max": pa.array(seg("max", np.maximum).astype(np.int32), pa.int32()),
            "p50": pa.array(_percentiles_dense_rows(nh_m, Q_LOW), pa.float64()),
            "p99": pa.array(_percentiles_dense_rows(nh_m, Q_HIGH), pa.float64()),
            "tok_count": pa.array(tok_cnt, pa.int64()),
            "tok_sum": pa.array(tok_sum, pa.int64()),
            "tok_mean": pa.array(
                tok_sum.astype(np.float64) / tok_cnt.astype(np.float64), pa.float64()
            ),
            "tok_min": pa.array(seg("tok_min", np.minimum).astype(np.int32), pa.int32()),
            "tok_max": pa.array(seg("tok_max", np.maximum).astype(np.int32), pa.int32()),
            "tok_p50": pa.array(_percentiles_dense_rows(th_m, Q_LOW), pa.float64()),
            "tok_p99": pa.array(_percentiles_dense_rows(th_m, Q_HIGH), pa.float64()),
        }
    )


def rekey_dense(batch: pa.Table, factor: int) -> pa.Table:
    if batch.num_rows == 0 or "bucket" not in batch.schema.names:
        return batch
    b = batch["bucket"].to_numpy(zero_copy_only=False) // factor
    return batch.set_column(
        batch.schema.get_field_index("bucket"), "bucket", pa.array(b, pa.int64())
    )


def aligned_rollup_cascade(
    shard_dirs: list[str],
    tiers,
    chunk_rows: int,
    merge_partitions: int = 16,
) -> dict:
    """The aligned plan: one map pass over bucket-aligned file groups emits
    finalized finest-tier rows + dense coarse partials; coarse tiers are
    small dense-hist merges.  Returns {tier_name: Dataset}."""
    import ray.data as rd

    from .rollup import with_partition_col

    # tiers must nest exactly (like rollup_cascade): rekey_dense re-buckets
    # with integer division, so a non-multiple width would silently emit a
    # tier labeled w_k that is actually bucketed at the previous width.
    for prev, cur_t in zip(tiers, tiers[1:]):
        if cur_t.width % prev.width != 0 or cur_t.width <= prev.width:
            raise ValueError(
                f"aligned cascade requires strictly-nesting tier widths; "
                f"{cur_t.width} is not a proper multiple of {prev.width}"
            )
    fine = tiers[0]
    coarse = tiers[1] if len(tiers) > 1 else tiers[0]
    groups = plan_aligned_groups(shard_dirs, chunk_rows, fine.width)
    gds = rd.from_items([{"files": g} for g in groups])

    def run_group(batch: pa.Table) -> pa.Table:
        tables = [
            process_aligned_group(list(files), fine, coarse, chunk_rows=chunk_rows)
            for files in batch["files"].to_pylist()
        ]
        return pa.concat_tables(tables)

    union = gds.map_batches(run_group, batch_size=1, batch_format="pyarrow").materialize()

    out = {}
    fine_rows = union.filter(expr="kind == 0").drop_columns(
        ["kind", "ntok_hist", "tok_hist"]
    )
    out[fine.name] = fine_rows
    if len(tiers) < 2:
        return out
    partials = union.filter(expr="kind == 1").drop_columns(
        ["mean", "p50", "p99", "tok_mean", "tok_p50", "tok_p99"]
    )

    # ONE exchange serves every coarse tier: partition by (source, COARSEST
    # bucket) -- nesting widths mean a partition holds complete groups for
    # all of them, so each tier is then a plain in-partition merge of the
    # same shuffled partials (vs one sort-shuffle per tier before).
    coarsest = tiers[-1]

    def add_prt_coarsest(t: pa.Table) -> pa.Table:
        rk = rekey_dense(t, coarsest.width // coarse.width)
        keyed = with_partition_col(rk, merge_partitions, False)
        return t.append_column("prt", keyed["prt"])

    def merge_all_tiers(g: pa.Table) -> pa.Table:
        tabs = []
        for i, tier in enumerate(tiers[1:]):
            m = merge_dense_partials(rekey_dense(g, tier.width // coarse.width))
            tabs.append(
                m.append_column(
                    "tier_id", pa.array(np.full(m.num_rows, i, np.int64), pa.int64())
                )
            )
        return pa.concat_tables(tabs)

    merged = (
        partials.map_batches(add_prt_coarsest, batch_format="pyarrow")
        # coalesce the (small) partials: without this the sort inherits one
        # block per input group and the merge pays per-task scheduling
        # latency on ~100 mostly-empty tasks
        .repartition(merge_partitions)
        .groupby("prt")
        .map_groups(merge_all_tiers, batch_format="pyarrow")
    ).materialize()  # rollup-sized: all coarse tiers, one pass
    for i, tier in enumerate(tiers[1:]):
        out[tier.name] = merged.filter(expr=f"tier_id == {i}").drop_columns(["tier_id"])
    return out
