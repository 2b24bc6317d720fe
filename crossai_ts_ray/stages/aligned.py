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
    # right-bisect of a scalar into its own nondescending row == count of
    # row entries <= the scalar: one vectorized compare over the matrix
    # (micro-bench: ~4x vs the per-row searchsorted loop at G=4096)
    a = (cum <= lo[:, None]).sum(axis=1).astype(np.float64)
    b = (cum <= hi[:, None]).sum(axis=1).astype(np.float64)
    t = h - lo
    diff = b - a
    return np.where(t >= 0.5, b - diff * (1 - t), a + diff * t)


#: per-map-task row budget for group sizing.  Bigger groups amortize task
#: overhead, turn more sources into SOURCE-COMPLETE (zero exchange), and cut
#: the boundary-partial fraction for over-sized sources; the ceiling is the
#: worker heap (450k rows x ~100 tokens x 4B ~= 180MB Arrow + ~2x transients
#: per task -- safe at 8 tasks/node on multi-GB workers).
GROUP_TARGET_ROWS = 450_000


def plan_aligned_groups_ex(
    shard_dirs: list[str],
    chunk_rows: int,
    width: int,
    target_rows: int | None = None,
    coarse_width: int | None = None,
):
    """Plan bucket-aligned file groups per source.

    Returns ``(groups, complete, src_start, src_end)``:

    * ``groups``     -- [(files...)] such that finest-tier buckets never span
      groups (group stride is a multiple of k0 = width / gcd(width,
      chunk_rows)),
    * ``complete``   -- the whole source fits this one group,
    * ``src_start``  -- the group holds the source's first chunk file (no
      earlier data exists, so its leading tier buckets are complete),
    * ``src_end``    -- the group holds the source's last chunk file.

    Group sizing: prefer a stride that ALSO aligns group edges to
    ``coarse_width`` (the first coarse tier then finalizes entirely in-task
    and ships zero partials), as long as that stays within 2x
    ``target_rows``; otherwise the largest k0 multiple under the target.
    The target bounds the per-task working set -- large fresh allocations
    are expensive on ballooned VMs and real workers alike."""
    import glob as _glob
    import re

    if target_rows is None:
        target_rows = int(
            os.environ.get("GRAFT_GROUP_TARGET_ROWS", GROUP_TARGET_ROWS)
        )
    k0 = width // math.gcd(width, chunk_rows)
    k = k0 * max(1, target_rows // (k0 * chunk_rows))
    if coarse_width is not None:
        kc = coarse_width // math.gcd(coarse_width, chunk_rows)
        kc = kc // math.gcd(kc, k0) * k0  # lcm(kc, k0)
        if kc * chunk_rows <= 2 * target_rows:
            k = kc * max(1, target_rows // (kc * chunk_rows))
    by_source: dict[str, list[str]] = {}
    for sd in shard_dirs:
        for f in sorted(_glob.glob(os.path.join(sd, "*.parquet"))):
            m = re.match(r"part-(.+)-(\d+)\.parquet", os.path.basename(f))
            by_source.setdefault(m.group(1), []).append(f)
    groups, complete, starts, ends = [], [], [], []
    for src in sorted(by_source):
        files = by_source[src]
        one_group = len(files) <= k
        for i in range(0, len(files), k):
            groups.append(files[i : i + k])
            complete.append(one_group)
            starts.append(i == 0)
            ends.append(i + k >= len(files))
    return groups, complete, starts, ends


def plan_aligned_groups(shard_dirs: list[str], chunk_rows: int, width: int):
    """[(source_files...)] grouped so finest-tier buckets never span groups."""
    return plan_aligned_groups_ex(shard_dirs, chunk_rows, width)[0]


def process_aligned_group(
    files: list[str],
    fine: Tier,
    coarse: Tier | None = None,
    chunk_rows: int | None = None,
    tiers=None,
    source_complete: bool = False,
    src_start: bool | None = None,
    src_end: bool | None = None,
) -> pa.Table:
    """One map task: read a bucket-aligned file group of ONE source and emit
    union rows routed by ``tier_id``:

    * finalized rollup rows carry their tier index (kind=0),
    * partial rows (counters + dense hists) carry ``tier_id = -i`` (kind=1).

    Every tier finalizes IN-TASK every bucket that is complete inside this
    group's effective seq coverage: [lo, hi) widened to -inf when the group
    holds the source's first chunk file and +inf when it holds the last.
    Only the (at most two) BOUNDARY buckets per coarse tier -- cut by a
    non-terminal group edge -- ship partials, so the coarse exchange moves
    O(groups x tiers) dense hists instead of O(all coarse buckets).

    Percentiles stream per base-coarse bucket into one vocab-sized
    accumulator per tier (~400KB live, cache-resident); a G x VOCAB hist
    matrix would be memory-bandwidth-bound under task concurrency.
    Bitwise-exactness: identical multisets reach every percentile
    computation (``percentile_from_dense`` replicates np.percentile
    'linear' on the expanded multiset)."""
    if tiers is None:
        tiers = (fine,) if coarse is None or coarse is fine else (fine, coarse)
    if src_start is None:
        src_start = source_complete
    if src_end is None:
        src_end = source_complete
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
    lo, hi = None, None
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
    if lo is None and not (src_start and src_end):
        raise ValueError(
            "boundary-partial planning needs chunk_rows for groups that do "
            "not hold a whole source"
        )

    out_tables = []

    def base_cols(tid: int, kind: int, bkts, cnt, sm, mn, mx, tcnt, tsum, tmn, tmx):
        g = len(bkts)
        return {
            "kind": pa.array(np.full(g, kind, dtype=np.int8), pa.int8()),
            "tier_id": pa.array(np.full(g, tid, dtype=np.int8), pa.int8()),
            "source": pa.array([src] * g, pa.string()),
            "bucket": pa.array(np.asarray(bkts, np.int64), pa.int64()),
            "count": pa.array(np.asarray(cnt, np.int64), pa.int64()),
            "sum": pa.array(np.asarray(sm, np.int64), pa.int64()),
            "min": pa.array(np.asarray(mn).astype(np.int32), pa.int32()),
            "max": pa.array(np.asarray(mx).astype(np.int32), pa.int32()),
            "tok_count": pa.array(np.asarray(tcnt, np.int64), pa.int64()),
            "tok_sum": pa.array(np.asarray(tsum, np.int64), pa.int64()),
            "tok_min": pa.array(np.asarray(tmn).astype(np.int32), pa.int32()),
            "tok_max": pa.array(np.asarray(tmx).astype(np.int32), pa.int32()),
        }

    def assemble(cols, mean, tok_mean, p50, p99, tp50, tp99, nh_list, th_list):
        g = len(cols["bucket"])
        return pa.table(
            {
                "kind": cols["kind"],
                "tier_id": cols["tier_id"],
                "source": cols["source"],
                "bucket": cols["bucket"],
                "count": cols["count"],
                "sum": cols["sum"],
                "mean": mean if mean is not None else pa.array([None] * g, pa.float64()),
                "min": cols["min"],
                "max": cols["max"],
                "p50": p50 if p50 is not None else pa.array([None] * g, pa.float64()),
                "p99": p99 if p99 is not None else pa.array([None] * g, pa.float64()),
                "tok_count": cols["tok_count"],
                "tok_sum": cols["tok_sum"],
                "tok_mean": tok_mean
                if tok_mean is not None
                else pa.array([None] * g, pa.float64()),
                "tok_min": cols["tok_min"],
                "tok_max": cols["tok_max"],
                "tok_p50": tp50 if tp50 is not None else pa.array([None] * g, pa.float64()),
                "tok_p99": tp99 if tp99 is not None else pa.array([None] * g, pa.float64()),
                "ntok_hist": nh_list
                if nh_list is not None
                else pa.array([None] * g, pa.list_(pa.int32())),
                "tok_hist": th_list
                if th_list is not None
                else pa.array([None] * g, pa.list_(pa.int32())),
            }
        )

    # ---- finest tier: always complete inside the group (planner contract) ----
    bucket = seq // fine.width
    starts = group_boundaries(bucket)
    ends = np.append(starts[1:], n)
    G = len(starts)
    counts = (ends - starts).astype(np.int64)
    sum_n = np.add.reduceat(n_tok, starts)
    seg_starts = row_offs[starts]
    seg_ends = np.append(row_offs[starts[1:]], row_offs[-1])
    tok_count = (seg_ends - seg_starts).astype(np.int64)
    tok_sum = np.add.reduceat(flat64, seg_starts)
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
        # sort the int32 view, not the int64 copy: half the traffic
        tvv = np.sort(flat[seg_starts[i] : seg_ends[i]])
        tp50[i] = percentile_from_sorted(tvv, Q_LOW)
        tp99[i] = percentile_from_sorted(tvv, Q_HIGH)
    cols = base_cols(
        0, 0, bucket[starts], counts, sum_n,
        np.minimum.reduceat(n_tok, starts), np.maximum.reduceat(n_tok, starts),
        tok_count, tok_sum,
        np.minimum.reduceat(flat, seg_starts), np.maximum.reduceat(flat, seg_starts),
    )
    out_tables.append(
        assemble(
            cols,
            pa.array(mean, pa.float64()),
            pa.array(tok_mean, pa.float64()),
            pa.array(p50, pa.float64()),
            pa.array(p99, pa.float64()),
            pa.array(tp50, pa.float64()),
            pa.array(tp99, pa.float64()),
            None,
            None,
        )
    )

    if len(tiers) < 2:
        return pa.concat_tables(out_tables)

    # ---- coarse tiers: one streaming pass at base granularity ----
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
    b_bkt = bucket[starts]

    sub = tiers[1:]
    tier_nb = [b_bkt // (tt.width // base_t.width) for tt in sub]
    tier_s2 = [
        np.flatnonzero(np.concatenate(([True], nbv[1:] != nbv[:-1])))
        for nbv in tier_nb
    ]
    # completeness of each tier bucket inside the group's effective coverage
    tier_comp = []
    for ti, tt in enumerate(sub):
        bkts = tier_nb[ti][tier_s2[ti]]
        comp = np.ones(len(bkts), bool)
        if not src_start:
            comp &= bkts * tt.width >= lo
        if not src_end:
            comp &= (bkts + 1) * tt.width <= hi
        tier_comp.append(comp)

    pcts = [np.full((4, len(s2)), np.nan) for s2 in tier_s2]
    part_nh = [[] for _ in sub]  # dense hists of the (<=2) boundary buckets
    part_th = [[] for _ in sub]
    acc_nh = [np.zeros(NTOK_BINS, np.int64) for _ in sub]
    acc_th = [np.zeros(VOCAB_SIZE, np.int64) for _ in sub]
    out_i = [0] * len(sub)
    for g in range(G):
        nh_g = np.bincount(n_tok[starts[g] : ends[g]], minlength=NTOK_BINS)
        th_g = np.bincount(flat[seg_starts[g] : seg_ends[g]], minlength=VOCAB_SIZE)
        for ti in range(len(sub)):
            acc_nh[ti] += nh_g
            acc_th[ti] += th_g
            if g == G - 1 or tier_nb[ti][g + 1] != tier_nb[ti][g]:
                i = out_i[ti]
                if tier_comp[ti][i]:
                    pcts[ti][0, i] = percentile_from_dense(acc_nh[ti], Q_LOW)
                    pcts[ti][1, i] = percentile_from_dense(acc_nh[ti], Q_HIGH)
                    pcts[ti][2, i] = percentile_from_dense(acc_th[ti], Q_LOW)
                    pcts[ti][3, i] = percentile_from_dense(acc_th[ti], Q_HIGH)
                else:
                    part_nh[ti].append(acc_nh[ti].astype(np.int32))
                    part_th[ti].append(acc_th[ti].astype(np.int32))
                acc_nh[ti][:] = 0
                acc_th[ti][:] = 0
                out_i[ti] = i + 1

    for ti, tier in enumerate(tiers[1:], start=1):
        s2 = tier_s2[ti - 1]
        nb = tier_nb[ti - 1][s2]
        comp = tier_comp[ti - 1]
        cnt = np.add.reduceat(b_cnt, s2)
        sm = np.add.reduceat(b_sum, s2)
        mn = np.minimum.reduceat(b_min, s2)
        mx = np.maximum.reduceat(b_max, s2)
        tcnt = np.add.reduceat(b_tcnt, s2)
        tsum = np.add.reduceat(b_tsum, s2)
        tmn = np.minimum.reduceat(b_tmin, s2)
        tmx = np.maximum.reduceat(b_tmax, s2)
        p = pcts[ti - 1]
        if comp.any():
            c = comp
            cols = base_cols(ti, 0, nb[c], cnt[c], sm[c], mn[c], mx[c],
                             tcnt[c], tsum[c], tmn[c], tmx[c])
            out_tables.append(
                assemble(
                    cols,
                    pa.array(sm[c] / cnt[c].astype(np.float64), pa.float64()),
                    pa.array(tsum[c] / tcnt[c].astype(np.float64), pa.float64()),
                    pa.array(p[0][c], pa.float64()),
                    pa.array(p[1][c], pa.float64()),
                    pa.array(p[2][c], pa.float64()),
                    pa.array(p[3][c], pa.float64()),
                    None,
                    None,
                )
            )
        if (~comp).any():
            c = ~comp
            nh_flat = (
                np.concatenate(part_nh[ti - 1])
                if part_nh[ti - 1]
                else np.empty(0, np.int32)
            )
            th_flat = (
                np.concatenate(part_th[ti - 1])
                if part_th[ti - 1]
                else np.empty(0, np.int32)
            )
            gp = int(c.sum())
            cols = base_cols(-ti, 1, nb[c], cnt[c], sm[c], mn[c], mx[c],
                             tcnt[c], tsum[c], tmn[c], tmx[c])
            out_tables.append(
                assemble(
                    cols,
                    None, None, None, None, None, None,
                    _list_arr(
                        np.arange(gp + 1, dtype=np.int64) * NTOK_BINS,
                        nh_flat, pa.int32(),
                    ),
                    _list_arr(
                        np.arange(gp + 1, dtype=np.int64) * VOCAB_SIZE,
                        th_flat, pa.int32(),
                    ),
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


# partial rows drop the finalized-only float columns before any exchange
_PARTIAL_DROP = ["kind", "mean", "p50", "p99", "tok_mean", "tok_p50", "tok_p99"]


def _add_prt_coarsest(t: pa.Table, tiers, merge_partitions: int) -> pa.Table:
    """Key partial rows by (source, COARSEST bucket) hash partition: nesting
    tier widths mean one partition then owns every partial of each
    (tier, bucket) it touches."""
    from .rollup import with_partition_col

    coarsest = tiers[-1]
    widths = np.zeros(len(tiers) + 1, np.int64)
    for i, tt in enumerate(tiers):
        widths[i] = tt.width
    t = t.combine_chunks()
    if t.num_rows == 0:
        return t.append_column("prt", pa.array([], pa.int64()))
    tid = -t["tier_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    cb = b // (coarsest.width // widths[tid])
    keyed = with_partition_col(
        t.set_column(
            t.schema.get_field_index("bucket"), "bucket", pa.array(cb, pa.int64())
        ),
        merge_partitions,
        False,
    )
    return t.append_column("prt", keyed["prt"])


def _merge_all_tiers(g: pa.Table, tiers) -> pa.Table:
    """Merge co-located partial rows of EVERY coarse tier in one pass:
    filter by (negative) tier id, counter-reduce + dense-hist add, finalize
    percentiles; emits ROLLUP rows tagged with the positive tier id."""
    g = g.combine_chunks()
    tid = g["tier_id"].to_numpy(zero_copy_only=False)
    tabs = []
    for ti in range(1, len(tiers)):
        sub = g.filter(pa.array(tid == -ti)).drop_columns(["tier_id"])
        if sub.num_rows:
            m = merge_dense_partials(sub)
            tabs.append(
                m.append_column(
                    "tier_id",
                    pa.array(np.full(m.num_rows, ti, np.int64), pa.int64()),
                )
            )
    if not tabs:
        sch = ROLLUP_SCHEMA.append(pa.field("tier_id", pa.int64()))
        return pa.Table.from_pylist([], schema=sch)
    return pa.concat_tables(tabs)


def _tag_tier_names(t: pa.Table, names: np.ndarray) -> pa.Table:
    """tier_id int column -> tier string column (hive partition key)."""
    t = t.combine_chunks()
    if t.num_rows == 0:
        return t.drop_columns(["tier_id"]).append_column(
            "tier", pa.array([], pa.string())
        )
    tid = t["tier_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return t.drop_columns(["tier_id"]).append_column(
        "tier", pa.array(names[tid], pa.string())
    )


def aligned_rollup_stream(
    shard_dirs: list[str],
    tiers,
    chunk_rows: int,
    spill_dir: str,
):
    """Fully-STREAMING aligned cascade: one task-pool pass reads each
    bucket-aligned file group, finalizes every tier bucket complete inside
    the group, tags rows with the tier name, and side-writes the (<=2 per
    coarse tier per cut group) boundary partials to ``spill_dir`` as
    map-side shuffle files -- parquet, one file per group, deterministic
    name, written via atomic rename so a retried task is idempotent.

    Returns ``(finalized_ds, n_incomplete)``.  The caller consumes
    ``finalized_ds`` with a single ``write_parquet(partition_cols=["tier"])``
    (NO materialize barrier anywhere: blocks stream from read to write), then
    merges the spill with :func:`merge_spilled_partials`.  ``spill_dir`` must
    be on storage all workers reach -- here the job's own output directory,
    the same assumption every map-side shuffle file design makes."""
    import ray.data as rd

    for prev, cur_t in zip(tiers, tiers[1:]):
        if cur_t.width % prev.width != 0 or cur_t.width <= prev.width:
            raise ValueError(
                f"aligned cascade requires strictly-nesting tier widths; "
                f"{cur_t.width} is not a proper multiple of {prev.width}"
            )
    fine = tiers[0]
    groups, complete, g_start, g_end = plan_aligned_groups_ex(
        shard_dirs,
        chunk_rows,
        fine.width,
        coarse_width=tiers[1].width if len(tiers) > 1 else None,
    )
    os.makedirs(spill_dir, exist_ok=True)
    names = np.array([t.name for t in tiers])
    cols = [f.name for f in ROLLUP_SCHEMA] + ["tier_id"]
    # LPT order: heaviest groups dispatch first (see aligned_rollup_cascade)
    order = sorted(
        range(len(groups)),
        key=lambda i: -sum(os.path.getsize(f) for f in groups[i]),
    )
    gds = rd.from_items(
        [
            {"files": groups[i], "start": g_start[i], "end": g_end[i], "gid": i}
            for i in order
        ]
    )

    def run_group_spill(batch: pa.Table) -> pa.Table:
        outs = []
        for files, s, e, gid in zip(
            batch["files"].to_pylist(),
            batch["start"].to_pylist(),
            batch["end"].to_pylist(),
            batch["gid"].to_pylist(),
        ):
            t = process_aligned_group(
                list(files),
                fine,
                chunk_rows=chunk_rows,
                tiers=tiers,
                src_start=bool(s),
                src_end=bool(e),
            )
            kind = t["kind"].to_numpy(zero_copy_only=False)
            # EVERY incomplete group writes its spill file, even when zero
            # partial rows exist (a group whose edges land on every coarse
            # tier's bucket boundary -- the planner's preferred coarse-
            # aligned stride makes this common -- finalizes everything
            # in-task).  The unconditional write keeps merge's fail-loud
            # file count exact: expected files == incomplete groups by
            # construction, dense or gapped, aligned edges or not.
            if (kind == 1).any() or (len(tiers) > 1 and not (s and e)):
                part = t.filter(pa.array(kind == 1)).drop_columns(_PARTIAL_DROP)
                tmp = os.path.join(spill_dir, f".g{gid}.tmp")
                pq.write_table(part, tmp)
                os.replace(tmp, os.path.join(spill_dir, f"g{gid}.parquet"))
            fin = t.filter(pa.array(kind == 0)).select(cols)
            outs.append(_tag_tier_names(fin, names))
        return pa.concat_tables(outs)

    finalized = gds.map_batches(
        run_group_spill, batch_size=None, batch_format="pyarrow"
    )
    return finalized, sum(1 for c in complete if not c)


def merge_spilled_partials(
    spill_dir: str, tiers, n_incomplete: int, merge_partitions: int = 16
):
    """Boundary-partial merge over the map-side spill files: a Dataset of
    finalized ROLLUP rows tagged with tier names, or None when no group
    spilled.  Same adaptive shape as the cascade: one-task coalesce while the
    plan proves the partial count small, keyed groupby past that.

    Every boundary-incomplete group writes exactly one spill file, so the
    plan's ``n_incomplete`` is an exact expected file count: a shortfall
    means ``spill_dir`` is not storage every worker reaches (or a file was
    lost), and silently merging the remainder would drop boundary-bucket
    aggregates -- fail loudly instead of returning wrong totals."""
    import glob as _glob

    import ray.data as rd

    files = sorted(_glob.glob(os.path.join(spill_dir, "g*.parquet")))
    # single-tier jobs have no coarse boundary buckets and never spill
    if len(tiers) > 1 and len(files) != n_incomplete:
        why = (
            "spill_dir must be on storage all workers reach (shared "
            "filesystem on a multi-node cluster)"
            if len(files) < n_incomplete
            else "extra files mean a stale or foreign spill directory"
        )
        raise RuntimeError(
            f"aligned rollup spill merge: plan expected {n_incomplete} "
            f"boundary-partial spill files in {spill_dir!r} but found "
            f"{len(files)}; {why}"
        )
    if not files:
        return None
    ds = rd.read_parquet(files)
    max_partial_rows = 2 * (len(tiers) - 1) * max(1, n_incomplete)
    if max_partial_rows <= 65536:
        merged = ds.repartition(1).map_batches(
            lambda g: _merge_all_tiers(g, tiers),
            batch_size=None,
            batch_format="pyarrow",
        )
    else:
        merged = (
            ds.map_batches(
                lambda t: _add_prt_coarsest(t, tiers, merge_partitions),
                batch_format="pyarrow",
            )
            .repartition(merge_partitions)
            .groupby("prt")
            .map_groups(
                lambda g: _merge_all_tiers(g, tiers), batch_format="pyarrow"
            )
        )
    names = np.array([t.name for t in tiers])
    cols = [f.name for f in ROLLUP_SCHEMA] + ["tier_id"]
    return merged.map_batches(
        lambda t: _tag_tier_names(t.select(cols), names), batch_format="pyarrow"
    )


def aligned_rollup_cascade(
    shard_dirs: list[str],
    tiers,
    chunk_rows: int,
    merge_partitions: int = 16,
) -> dict:
    """The aligned plan: one map pass over bucket-aligned file groups emits
    finalized rows for every tier bucket complete inside the group, plus
    dense partials for the (<=2 per tier per group) boundary buckets; ONE
    small exchange merges the boundary partials per tier.  Returns
    {tier_name: Dataset}.  For a single fully-streaming consumer (the
    checkpointed job), use :func:`aligned_rollup_stream` instead -- it
    avoids this form's materialize barrier and per-tier executions."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .rollup import with_partition_col

    # tiers must nest exactly: bucket re-keying divides by the width ratio,
    # so a non-multiple width would silently emit a tier labeled w_k that is
    # actually bucketed at the previous width.
    for prev, cur_t in zip(tiers, tiers[1:]):
        if cur_t.width % prev.width != 0 or cur_t.width <= prev.width:
            raise ValueError(
                f"aligned cascade requires strictly-nesting tier widths; "
                f"{cur_t.width} is not a proper multiple of {prev.width}"
            )
    fine = tiers[0]
    groups, complete, g_start, g_end = plan_aligned_groups_ex(
        shard_dirs,
        chunk_rows,
        fine.width,
        coarse_width=tiers[1].width if len(tiers) > 1 else None,
    )
    any_partial = not all(complete)
    # LPT order: schedule the heaviest groups FIRST.  Group sizes are
    # Zipf-skewed (hot sources), and tasks dispatch in block order, so a
    # heavy group landing in the last wave sets the stage makespan; putting
    # the rocks first lets the small groups pack around them.  Pure
    # reordering -- rollup outputs are keyed by (source, bucket) and
    # order-independent.
    order = sorted(
        range(len(groups)),
        key=lambda i: -sum(os.path.getsize(f) for f in groups[i]),
    )
    gds = rd.from_items(
        [
            {"files": groups[i], "start": g_start[i], "end": g_end[i]}
            for i in order
        ]
    )

    def run_group(batch: pa.Table) -> pa.Table:
        tables = [
            process_aligned_group(
                list(files),
                fine,
                chunk_rows=chunk_rows,
                tiers=tiers,
                src_start=bool(s),
                src_end=bool(e),
            )
            for files, s, e in zip(
                batch["files"].to_pylist(),
                batch["start"].to_pylist(),
                batch["end"].to_pylist(),
            )
        ]
        return pa.concat_tables(tables)

    union = gds.map_batches(
        run_group, batch_size=None, batch_format="pyarrow"
    ).materialize()

    drop_final = ["kind", "tier_id", "ntok_hist", "tok_hist"]
    out = {}
    out[fine.name] = union.filter(expr="tier_id == 0").drop_columns(drop_final)
    if len(tiers) < 2:
        return out

    merged = None
    if any_partial and len(tiers) > 1:
        # ONE exchange serves every coarse tier: partition by (source,
        # COARSEST bucket) -- nesting widths mean a partition holds every
        # partial of each (tier, bucket) it owns.  Only BOUNDARY buckets
        # (cut by a non-terminal group edge) reach this exchange; interior
        # buckets were finalized inside their map task, so the exchange
        # moves O(groups x tiers) dense hists, not O(coarse buckets).
        partials = union.filter(expr="kind == 1").drop_columns(_PARTIAL_DROP)

        def add_prt_coarsest(t: pa.Table) -> pa.Table:
            return _add_prt_coarsest(t, tiers, merge_partitions)

        def merge_all_tiers(g: pa.Table) -> pa.Table:
            return _merge_all_tiers(g, tiers)

        # size the exchange from the PLAN, not the data: each incomplete
        # group contributes <= 2 boundary buckets per coarse tier, so the
        # partial-row count is known before any execution.  Below ~64k rows
        # a keyed sort-groupby is pure stage latency (measured: 4-8 s for 8
        # rows at 4 CPUs) -- coalesce to ONE block and merge in one task
        # (merge_dense_partials groups by (source, bucket) internally).
        # Past that, the groupby IS the scale path: partial volume grows
        # with group count at 10^12 rows and must merge keyed.
        n_incomplete = sum(1 for c in complete if not c)
        max_partial_rows = 2 * (len(tiers) - 1) * max(1, n_incomplete)
        if max_partial_rows <= 65536:
            merged = partials.repartition(1).map_batches(
                merge_all_tiers, batch_size=None, batch_format="pyarrow"
            )
        else:
            merged = (
                partials.map_batches(add_prt_coarsest, batch_format="pyarrow")
                # coalesce the (small) partials: without this the sort
                # inherits one block per input group and the merge pays
                # per-task scheduling latency on ~100 mostly-empty tasks
                .repartition(merge_partitions)
                .groupby("prt")
                .map_groups(merge_all_tiers, batch_format="pyarrow")
            )  # boundary-bucket-sized: all coarse tiers, one pass

    if merged is not None:
        merged = merged.materialize()  # reused by every coarse tier's filter
    for i, tier in enumerate(tiers[1:], start=1):
        finalized = union.filter(expr=f"tier_id == {i}").drop_columns(drop_final)
        if merged is not None:
            finalized = finalized.union(
                merged.filter(expr=f"tier_id == {i}").drop_columns(["tier_id"])
            )
        out[tier.name] = finalized
    return out
