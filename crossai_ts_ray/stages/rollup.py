"""Distributed tier rollup: partial aggregation inside ``map_batches`` +
salted ``groupby`` merge -- the engine's flagship path.

Plan (all-Arrow, zero-copy in, vectorized NumPy kernels)::

    read_parquet(token table, columns pruned)
      -> map_batches(partial_rollup, batch_format="pyarrow")   # 1 row per
         (source, bucket[, salt]) per batch: int64 counters + sparse hists
      -> groupby([source, bucket, salt]).map_groups(merge)     # optional level
      -> groupby([source, bucket]).map_groups(merge)           # exact combine
      -> map_batches(finalize)                                 # mean, p50, p99

Why this is exact (bitwise vs oracle.py): counters are int64 (commutative,
associative, overflow-free at 10^12 rows x 2048 tokens); percentiles come from
*sparse value histograms* -- the n_tok / token domains are bounded int32s, so
the histogram is a lossless multiset of the raw values and merges by
concatenate+re-unique.  ``finalize`` then replicates
``np.percentile(..., method="linear")`` arithmetic from the histogram
(functions/numutil.py).  No step depends on combination order, so salting /
retries / block boundaries cannot change a single output bit.

Why this scales: raw rows collapse to at most one partial row per
(source, bucket) per input batch, so the all-to-all shuffle moves rollup-sized
data, not raw data.  Skewed (hot) sources are spread with a salt derived from
batch content, giving a two-level reduction (partial -> per-salt merge ->
final merge), the classic combiner pattern (SURVEY.md §4.2).

Reference semantics re-expressed here: fixed-length bucketing =
/root/reference/caits/windowing.py:188 (create_chunks); the aggregate bundle =
/root/reference/caits/fe/_statistical.py:597 (signal_stats); the tier cascade =
the rms_max rollup-of-rollup pattern (/root/reference/caits/fe/_statistical.py:252).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.numutil import (
    group_boundaries,
    merge_sparse_hists,
    percentile_from_hist,
)
from ..schema import PARTIAL_EXTRA_FIELDS, ROLLUP_SCHEMA, Tier

Q_LOW, Q_HIGH = 50.0, 99.0

_SALT_MIX = np.int64(-0x61C8864680B583EB)  # 64-bit golden-ratio multiplier


def _list_col_to_numpy(col: pa.ChunkedArray | pa.Array):
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    n = len(col)
    # offsets relative to this array's slice
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    return flat.to_numpy(zero_copy_only=False), offs[: n + 1]


def partial_rollup(batch: pa.Table, width: int, salt_mod: int = 0) -> pa.Table:
    """Per-batch combiner: one partial row per (source, bucket) in the batch."""
    t = batch.combine_chunks()
    n = t.num_rows
    if n == 0:
        return _empty_partial(salt_mod)
    seq = t["seq"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    n_tok = t["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    src_col = t["source"]
    if isinstance(src_col, pa.ChunkedArray):
        src_col = src_col.combine_chunks()
    dict_arr = src_col.dictionary_encode()
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dictionary = dict_arr.dictionary

    bucket = seq // width
    order = np.lexsort((bucket, codes))
    c_s, b_s, n_s, seq_s = codes[order], bucket[order], n_tok[order], seq[order]
    starts = group_boundaries(c_s, b_s)
    G = len(starts)
    ends = np.append(starts[1:], n)
    counts = ends - starts
    sum_n = np.add.reduceat(n_s, starts)
    min_n = np.minimum.reduceat(n_s, starts)
    max_n = np.maximum.reduceat(n_s, starts)

    # sparse hist of n_tok per group: sort (group, value), run-length encode
    order2 = np.lexsort((n_tok, bucket, codes))
    c2, b2, v2 = codes[order2], bucket[order2], n_tok[order2]
    pair_starts = group_boundaries(c2, b2, v2)
    grp_new = np.zeros(n, dtype=bool)
    grp_new[0] = True
    grp_new[1:] = (c2[1:] != c2[:-1]) | (b2[1:] != b2[:-1])
    pair_gid = np.cumsum(grp_new[pair_starts]) - 1
    pair_cnt = np.diff(np.append(pair_starts, n))
    ntok_vals = v2[pair_starts].astype(np.int32)
    ntok_cnts = pair_cnt.astype(np.int64)
    ntok_offs = np.zeros(G + 1, dtype=np.int64)
    np.cumsum(np.bincount(pair_gid, minlength=G), out=ntok_offs[1:])

    # token stream per group
    tok_col = t["tokens"]
    flat_vals, row_offs = _list_col_to_numpy(tok_col)
    row_cnt = row_offs[1:] - row_offs[:-1]
    row_gid = np.empty(n, dtype=np.int64)
    gidx_sorted = np.cumsum(
        np.concatenate(([True], (c_s[1:] != c_s[:-1]) | (b_s[1:] != b_s[:-1])))
    ) - 1
    row_gid[order] = gidx_sorted
    flat_gid = np.repeat(row_gid, row_cnt)
    forder = np.lexsort((flat_vals, flat_gid))
    fg, fv = flat_gid[forder], flat_vals[forder]
    fstarts = group_boundaries(fg)
    if len(fstarts) != G:
        raise AssertionError("every (source,bucket) group must have >=1 token")
    fends = np.append(fstarts[1:], len(fg))
    tok_count = (fends - fstarts).astype(np.int64)
    fv64 = fv.astype(np.int64)
    tok_sum = np.add.reduceat(fv64, fstarts)
    tok_min = np.minimum.reduceat(fv, fstarts).astype(np.int32)
    tok_max = np.maximum.reduceat(fv, fstarts).astype(np.int32)
    tpair_starts = group_boundaries(fg, fv.astype(np.int64))
    tgrp_new = np.zeros(len(fg), dtype=bool)
    tgrp_new[0] = True
    tgrp_new[1:] = fg[1:] != fg[:-1]
    tpair_gid = np.cumsum(tgrp_new[tpair_starts]) - 1
    tok_vals = fv[tpair_starts].astype(np.int32)
    tok_cnts = np.diff(np.append(tpair_starts, len(fg))).astype(np.int64)
    tok_offs = np.zeros(G + 1, dtype=np.int64)
    np.cumsum(np.bincount(tpair_gid, minlength=G), out=tok_offs[1:])

    cols = {
        "source": dictionary.take(pa.array(c_s[starts])),
        "bucket": pa.array(b_s[starts], pa.int64()),
        "count": pa.array(counts.astype(np.int64), pa.int64()),
        "sum": pa.array(sum_n, pa.int64()),
        "min": pa.array(min_n.astype(np.int32), pa.int32()),
        "max": pa.array(max_n.astype(np.int32), pa.int32()),
        "tok_count": pa.array(tok_count, pa.int64()),
        "tok_sum": pa.array(tok_sum, pa.int64()),
        "tok_min": pa.array(tok_min, pa.int32()),
        "tok_max": pa.array(tok_max, pa.int32()),
        "ntok_vals": _list_arr(ntok_offs, ntok_vals, pa.int32()),
        "ntok_cnts": _list_arr(ntok_offs, ntok_cnts, pa.int64()),
        "tok_vals": _list_arr(tok_offs, tok_vals, pa.int32()),
        "tok_cnts": _list_arr(tok_offs, tok_cnts, pa.int64()),
    }
    if salt_mod:
        # salt from the group's min seq: deterministic per content, varies
        # across batches of the same hot (source, bucket)
        salt = ((seq_s[starts] * _SALT_MIX) >> np.int64(33)) % salt_mod
        cols["salt"] = pa.array(salt.astype(np.int64), pa.int64())
    return pa.table(cols)


def _list_arr(offsets: np.ndarray, values: np.ndarray, vtype) -> pa.ListArray:
    return pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int64), pa.int64()).cast(pa.int32())
        if offsets[-1] < 2**31
        else pa.array(offsets, pa.int64()),
        pa.array(values, vtype),
    )


def _empty_partial(salt_mod: int) -> pa.Table:
    fields = [
        ("source", pa.string()), ("bucket", pa.int64()), ("count", pa.int64()),
        ("sum", pa.int64()), ("min", pa.int32()), ("max", pa.int32()),
        ("tok_count", pa.int64()), ("tok_sum", pa.int64()),
        ("tok_min", pa.int32()), ("tok_max", pa.int32()),
    ] + PARTIAL_EXTRA_FIELDS
    if salt_mod:
        fields.append(("salt", pa.int64()))
    return pa.Table.from_pylist([], schema=pa.schema(fields))


def merge_partials_group(tbl: pa.Table) -> pa.Table:
    """Merge all partial rows of ONE (source, bucket[, salt]) group into one
    partial row (hists retained -> reusable for salted level and cascade)."""
    t = tbl.combine_chunks()
    if t.num_rows == 0:
        return _empty_partial(0)
    nv, nc = _merge_hist_cols(t, "ntok_vals", "ntok_cnts")
    tv, tc = _merge_hist_cols(t, "tok_vals", "tok_cnts")
    out = {
        "source": t["source"][:1],
        "bucket": t["bucket"][:1],
        "count": pa.array([int(_np(t, "count").sum())], pa.int64()),
        "sum": pa.array([int(_np(t, "sum").sum())], pa.int64()),
        "min": pa.array([int(_np(t, "min").min())], pa.int32()),
        "max": pa.array([int(_np(t, "max").max())], pa.int32()),
        "tok_count": pa.array([int(_np(t, "tok_count").sum())], pa.int64()),
        "tok_sum": pa.array([int(_np(t, "tok_sum").sum())], pa.int64()),
        "tok_min": pa.array([int(_np(t, "tok_min").min())], pa.int32()),
        "tok_max": pa.array([int(_np(t, "tok_max").max())], pa.int32()),
        "ntok_vals": _list_arr(np.array([0, len(nv)]), nv, pa.int32()),
        "ntok_cnts": _list_arr(np.array([0, len(nc)]), nc, pa.int64()),
        "tok_vals": _list_arr(np.array([0, len(tv)]), tv, pa.int32()),
        "tok_cnts": _list_arr(np.array([0, len(tc)]), tc, pa.int64()),
    }
    return pa.table(out)


def _np(t: pa.Table, col: str) -> np.ndarray:
    return t[col].to_numpy(zero_copy_only=False)


def _merge_hist_cols(t: pa.Table, vcol: str, ccol: str):
    vflat, voffs = _list_col_to_numpy(t[vcol])
    cflat, _ = _list_col_to_numpy(t[ccol])
    return merge_sparse_hists([vflat], [cflat.astype(np.int64)])


def finalize_batch(batch: pa.Table) -> pa.Table:
    """Partial rows (already fully merged per key) -> ROLLUP_SCHEMA rows."""
    t = batch.combine_chunks()
    n = t.num_rows
    if n == 0:
        return pa.Table.from_pylist([], schema=ROLLUP_SCHEMA)
    cnt = _np(t, "count").astype(np.int64)
    s = _np(t, "sum").astype(np.int64)
    tok_cnt = _np(t, "tok_count").astype(np.int64)
    tok_sum = _np(t, "tok_sum").astype(np.int64)
    mean = s.astype(np.float64) / cnt.astype(np.float64)
    tok_mean = tok_sum.astype(np.float64) / tok_cnt.astype(np.float64)
    nv, nvo = _list_col_to_numpy(t["ntok_vals"])
    ncf, _ = _list_col_to_numpy(t["ntok_cnts"])
    tv, tvo = _list_col_to_numpy(t["tok_vals"])
    tcf, _ = _list_col_to_numpy(t["tok_cnts"])
    p50 = np.empty(n)
    p99 = np.empty(n)
    tp50 = np.empty(n)
    tp99 = np.empty(n)
    for i in range(n):
        a, b = nvo[i], nvo[i + 1]
        p50[i] = percentile_from_hist(nv[a:b], ncf[a:b].astype(np.int64), Q_LOW)
        p99[i] = percentile_from_hist(nv[a:b], ncf[a:b].astype(np.int64), Q_HIGH)
        a, b = tvo[i], tvo[i + 1]
        tp50[i] = percentile_from_hist(tv[a:b], tcf[a:b].astype(np.int64), Q_LOW)
        tp99[i] = percentile_from_hist(tv[a:b], tcf[a:b].astype(np.int64), Q_HIGH)
    return pa.table(
        {
            "source": t["source"].cast(pa.string()),
            "bucket": t["bucket"],
            "count": pa.array(cnt, pa.int64()),
            "sum": pa.array(s, pa.int64()),
            "mean": pa.array(mean, pa.float64()),
            "min": t["min"],
            "max": t["max"],
            "p50": pa.array(p50, pa.float64()),
            "p99": pa.array(p99, pa.float64()),
            "tok_count": pa.array(tok_cnt, pa.int64()),
            "tok_sum": pa.array(tok_sum, pa.int64()),
            "tok_mean": pa.array(tok_mean, pa.float64()),
            "tok_min": t["tok_min"],
            "tok_max": t["tok_max"],
            "tok_p50": pa.array(tp50, pa.float64()),
            "tok_p99": pa.array(tp99, pa.float64()),
        }
    )


def rekey_batch(batch: pa.Table, factor: int) -> pa.Table:
    """Cascade re-key: coarser bucket = finer bucket // factor."""
    b = batch["bucket"].to_numpy(zero_copy_only=False) // factor
    return batch.set_column(
        batch.schema.get_field_index("bucket"), "bucket", pa.array(b, pa.int64())
    )


def merged_partials(ds, tier: Tier, salt_mod: int = 0, batch_size: int = 8192):
    """token Dataset -> merged partial rows (hists retained) per (source,bucket)."""
    parts = ds.map_batches(
        lambda b: partial_rollup(b, tier.width, salt_mod),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    if salt_mod:
        parts = parts.groupby(["source", "bucket", "salt"]).map_groups(
            lambda t: merge_partials_group(t.drop_columns(["salt"])),
            batch_format="pyarrow",
        )
    return parts.groupby(["source", "bucket"]).map_groups(
        merge_partials_group, batch_format="pyarrow"
    )


def cascade_merged(merged, factor: int):
    """Merged partials at tier k -> merged partials at coarser tier k+1."""
    return (
        merged.map_batches(
            lambda b: rekey_batch(b, factor), batch_format="pyarrow"
        )
        .groupby(["source", "bucket"])
        .map_groups(merge_partials_group, batch_format="pyarrow")
    )


def finalize(merged):
    return merged.map_batches(finalize_batch, batch_format="pyarrow")


def rollup_cascade(ds, tiers, salt_mod: int = 0, batch_size: int = 8192) -> dict:
    """Full cascade: raw -> tiers[0] -> tiers[1] -> ... ; returns
    {tier_name: finalized Dataset}.  Only the finest tier touches raw rows;
    coarser tiers merge the finer tier's (small) partials -- the continuous
    aggregate pattern from the north rule."""
    out = {}
    merged = merged_partials(ds, tiers[0], salt_mod=salt_mod, batch_size=batch_size)
    out[tiers[0].name] = finalize(merged)
    for prev, cur in zip(tiers, tiers[1:]):
        if cur.width % prev.width:
            raise ValueError(f"tier widths must nest: {prev} -> {cur}")
        merged = cascade_merged(merged, cur.width // prev.width)
        out[cur.name] = finalize(merged)
    return out
