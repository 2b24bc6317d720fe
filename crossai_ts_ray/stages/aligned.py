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
* SOURCE-COMPLETE fast path: when the planner sees a source whose files all
  fit in one group, EVERY tier finalizes inside that map task (coarse
  percentiles from dense bincounts -- bitwise-exact) and the source never
  touches the exchange.  Only over-sized sources emit partials.
* coarser tiers (over-sized sources): per-(source, coarse-bucket) partial
  counters + DENSE value histograms (token domain is a bounded vocab => a
  dense int32 bincount is ~40x smaller than the raw multiset of a 1d bucket
  and merges by vector addition -- exact).  ONE exchange keyed by the
  coarsest bucket serves every coarse tier (widths nest), moving ~200KB per
  (source, hourly bucket) instead of the raw token volume.

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


def plan_aligned_groups_ex(shard_dirs: list[str], chunk_rows: int, width: int):
    """[(source_files...)] grouped so finest-tier buckets never span groups,
    plus a per-group SOURCE-COMPLETE flag: a source whose files all fit in
    one group needs no coarse-tier exchange at all (every tier's buckets are
    complete inside the map task)."""
    import glob as _glob
    import re

    k = width // math.gcd(width, chunk_rows)
    by_source: dict[str, list[str]] = {}
    for sd in shard_dirs:
        for f in sorted(_glob.glob(os.path.join(sd, "*.parquet"))):
            m = re.match(r"part-(.+)-(\d+)\.parquet", os.path.basename(f))
            by_source.setdefault(m.group(1), []).append(f)
    groups, complete = [], []
    for src in sorted(by_source):
        files = by_source[src]
        one_group = len(files) <= k
        for i in range(0, len(files), k):
            groups.append(files[i : i + k])
            complete.append(one_group)
    return groups, complete


def plan_aligned_groups(shard_dirs: list[str], chunk_rows: int, width: int):
    """[(source_files...)] grouped so finest-tier buckets never span groups."""
    return plan_aligned_groups_ex(shard_dirs, chunk_rows, width)[0]


def process_aligned_group(
    files: list[str],
    fine: Tier,
    coarse: Tier,
    chunk_rows: int | None = None,
    tiers=None,
    source_complete: bool = False,
) -> pa.Table:
    """One map task: read a bucket-aligned file group of ONE source, emit
    union rows routed by ``tier_id``: finalized rollups carry their tier
    index; coarse partials (counters + dense hists) carry tier_id = -1.

    When ``source_complete`` (the whole source fits in this group -- planner
    fact), EVERY tier is finalized in-task and no partials are emitted: such
    sources never touch the coarse exchange.  Over-sized sources emit the
    finest tier finalized plus base-coarse partials as before."""
    # use_threads=False: a Ray map task owns ONE scheduled CPU; letting
    # pyarrow fan out onto its global pool (os.cpu_count() threads) makes
    # every task silently steal the whole machine -- wrong resource
    # accounting and dishonest scaling measurements.
    t = pq.read_table(
        files, columns=["tokens", "n_tok", "source", "seq"], use_threads=False
    )
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

    if source_complete and tiers is not None:
        # fine finalizes in the loop; coarse tiers finalize below from ONE
        # base-granularity hist pass (coarser tiers = hist reductions, the
        # exchange merge run in-task)
        specs = [(0, 0, fine)]
    else:
        specs = [(0, 0, fine), (1, -1, coarse)]
    out_tables = []
    for kind, tier_id, tier in specs:
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
            "tier_id": pa.array(np.full(G, tier_id, dtype=np.int8), pa.int8()),
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
            # small buckets: per-group sorts beat histogramming
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
            tbl = pa.table(
                {
                    "kind": base["kind"],
                    "tier_id": base["tier_id"],
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
            # dense partial hists per coarse group (merge = vector add);
            # bincount over fused (group, value) keys -- np.add.at's scatter
            # is ~10x slower and was 60% of the whole task
            gid_rows = np.repeat(np.arange(G, dtype=np.int64), ends - starts)
            nh = (
                np.bincount(gid_rows * NTOK_BINS + n_tok, minlength=G * NTOK_BINS)
                .reshape(G, NTOK_BINS)
                .astype(np.int32)
            )
            gid_toks = np.repeat(
                np.arange(G, dtype=np.int64), seg_ends - seg_starts
            )
            th = (
                np.bincount(gid_toks * VOCAB_SIZE + flat64, minlength=G * VOCAB_SIZE)
                .reshape(G, VOCAB_SIZE)
                .astype(np.int32)
            )
            nulls = [None] * G
            tbl = pa.table(
                {
                    "kind": base["kind"],
                    "tier_id": base["tier_id"],
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

    if source_complete and tiers is not None and len(tiers) > 1:
        # ONE base-granularity counting pass; every coarser tier is a hist
        # reduction of it (the exchange merge, run in-task) -- no re-scan of
        # the raw values per tier
        base_t = tiers[1]
        bucket = seq // base_t.width
        starts = group_boundaries(bucket)
        ends = np.append(starts[1:], n)
        G = len(starts)
        b_cnt = (ends - starts).astype(np.int64)
        b_sum = np.add.reduceat(n_tok, starts)
        b_min = np.minimum.reduceat(n_tok, starts)
        b_max = np.maximum.reduceat(n_tok, starts)
        seg_starts = row_offs[starts]
        seg_ends = np.append(row_offs[starts[1:]], row_offs[-1])
        b_tcnt = (seg_ends - seg_starts).astype(np.int64)
        b_tsum = np.add.reduceat(flat64, seg_starts)
        b_tmin = np.minimum.reduceat(flat, seg_starts).astype(np.int64)
        b_tmax = np.maximum.reduceat(flat, seg_starts).astype(np.int64)
        gid_rows = np.repeat(np.arange(G, dtype=np.int64), ends - starts)
        nh = np.bincount(
            gid_rows * NTOK_BINS + n_tok, minlength=G * NTOK_BINS
        ).reshape(G, NTOK_BINS)
        gid_toks = np.repeat(np.arange(G, dtype=np.int64), seg_ends - seg_starts)
        th = np.bincount(
            gid_toks * VOCAB_SIZE + flat64, minlength=G * VOCAB_SIZE
        ).reshape(G, VOCAB_SIZE)
        b_bkt = bucket[starts]
        for ti, tier in enumerate(tiers[1:], start=1):
            factor = tier.width // base_t.width
            nb = b_bkt // factor
            s2 = np.flatnonzero(np.concatenate(([True], nb[1:] != nb[:-1])))
            g2 = len(s2)
            cnt = np.add.reduceat(b_cnt, s2)
            sm = np.add.reduceat(b_sum, s2)
            mn = np.minimum.reduceat(b_min, s2)
            mx = np.maximum.reduceat(b_max, s2)
            tcnt = np.add.reduceat(b_tcnt, s2)
            tsum = np.add.reduceat(b_tsum, s2)
            tmn = np.minimum.reduceat(b_tmin, s2)
            tmx = np.maximum.reduceat(b_tmax, s2)
            nh2 = np.add.reduceat(nh, s2, axis=0)
            th2 = np.add.reduceat(th, s2, axis=0)
            out_tables.append(
                pa.table(
                    {
                        "kind": pa.array(np.zeros(g2, np.int8), pa.int8()),
                        "tier_id": pa.array(np.full(g2, ti, np.int8), pa.int8()),
                        "source": pa.array([src] * g2, pa.string()),
                        "bucket": pa.array(nb[s2], pa.int64()),
                        "count": pa.array(cnt, pa.int64()),
                        "sum": pa.array(sm, pa.int64()),
                        "mean": pa.array(sm / cnt.astype(np.float64), pa.float64()),
                        "min": pa.array(mn.astype(np.int32), pa.int32()),
                        "max": pa.array(mx.astype(np.int32), pa.int32()),
                        "p50": pa.array(_percentiles_dense_rows(nh2, Q_LOW), pa.float64()),
                        "p99": pa.array(_percentiles_dense_rows(nh2, Q_HIGH), pa.float64()),
                        "tok_count": pa.array(tcnt, pa.int64()),
                        "tok_sum": pa.array(tsum, pa.int64()),
                        "tok_mean": pa.array(
                            tsum / tcnt.astype(np.float64), pa.float64()
                        ),
                        "tok_min": pa.array(tmn.astype(np.int32), pa.int32()),
                        "tok_max": pa.array(tmx.astype(np.int32), pa.int32()),
                        "tok_p50": pa.array(_percentiles_dense_rows(th2, Q_LOW), pa.float64()),
                        "tok_p99": pa.array(_percentiles_dense_rows(th2, Q_HIGH), pa.float64()),
                        "ntok_hist": pa.array([None] * g2, pa.list_(pa.int32())),
                        "tok_hist": pa.array([None] * g2, pa.list_(pa.int32())),
                    }
                )
            )
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
    groups, complete = plan_aligned_groups_ex(shard_dirs, chunk_rows, fine.width)
    any_partial = not all(complete)
    gds = rd.from_items(
        [{"files": g, "complete": c} for g, c in zip(groups, complete)]
    )

    def run_group(batch: pa.Table) -> pa.Table:
        tables = [
            process_aligned_group(
                list(files),
                fine,
                coarse,
                chunk_rows=chunk_rows,
                tiers=tiers,
                source_complete=bool(c),
            )
            for files, c in zip(
                batch["files"].to_pylist(), batch["complete"].to_pylist()
            )
        ]
        return pa.concat_tables(tables)

    union = gds.map_batches(run_group, batch_size=1, batch_format="pyarrow").materialize()

    drop_final = ["kind", "tier_id", "ntok_hist", "tok_hist"]
    out = {}
    out[fine.name] = union.filter(expr="tier_id == 0").drop_columns(drop_final)
    if len(tiers) < 2:
        return out

    merged = None
    if any_partial:
        # ONE exchange serves every coarse tier: partition by (source,
        # COARSEST bucket) -- nesting widths mean a partition holds complete
        # groups for all of them, so each tier is a plain in-partition merge
        # of the same shuffled partials.  Only OVER-SIZED sources (several
        # aligned groups) reach this exchange; planner-complete sources were
        # finalized inside their map task.
        partials = union.filter(expr="tier_id == -1").drop_columns(
            ["kind", "mean", "p50", "p99", "tok_mean", "tok_p50", "tok_p99"]
        )
        coarsest = tiers[-1]

        def add_prt_coarsest(t: pa.Table) -> pa.Table:
            rk = rekey_dense(t, coarsest.width // coarse.width)
            keyed = with_partition_col(rk, merge_partitions, False)
            return t.append_column("prt", keyed["prt"])

        def merge_all_tiers(g: pa.Table) -> pa.Table:
            g = g.drop_columns(["tier_id"])
            tabs = []
            for i, tier in enumerate(tiers[1:], start=1):
                m = merge_dense_partials(rekey_dense(g, tier.width // coarse.width))
                tabs.append(
                    m.append_column(
                        "tier_id",
                        pa.array(np.full(m.num_rows, i, np.int64), pa.int64()),
                    )
                )
            return pa.concat_tables(tabs)

        merged = (
            partials.map_batches(add_prt_coarsest, batch_format="pyarrow")
            # coalesce the (small) partials: without this the sort inherits
            # one block per input group and the merge pays per-task
            # scheduling latency on ~100 mostly-empty tasks
            .repartition(merge_partitions)
            .groupby("prt")
            .map_groups(merge_all_tiers, batch_format="pyarrow")
        ).materialize()  # rollup-sized: all coarse tiers, one pass

    for i, tier in enumerate(tiers[1:], start=1):
        finalized = union.filter(expr=f"tier_id == {i}").drop_columns(drop_final)
        if merged is not None:
            finalized = finalized.union(
                merged.filter(expr=f"tier_id == {i}").drop_columns(["tier_id"])
            )
        out[tier.name] = finalized
    return out
