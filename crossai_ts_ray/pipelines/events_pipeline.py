"""Wall-clock-bucketed rollups over the ``events`` stream table: tumbling /
sliding windows and gap-fill series.

The events table is the stream-shaped input (ts: timestamp, event_type,
value).  Windows are epoch-hour buckets; the reference analogue is the
sliding/rolling window family (/root/reference/caits/windowing.py:8-106) with
time expressed in sample offsets -- here offsets are epoch seconds // width.

All stages: vectorized partial per batch -> small keyed merge.  Sums of
float64 are bridged to the DuckDB oracle by rounding to 6 decimals (both
sides); counts are exact int64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.numutil import group_boundaries
from ..stages.gapfill import gapfill

HOUR = 3600


def _partial_hourly(batch: pa.Table, width: int) -> pa.Table:
    t = batch.combine_chunks()
    if t.num_rows == 0:
        return pa.Table.from_pylist([], schema=_PARTIAL_SCHEMA)
    ts = t["ts"]
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    # timestamp[us] -> epoch seconds -> bucket
    epoch_us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
    bucket = epoch_us // 1_000_000 // width
    et = t["event_type"]
    if isinstance(et, pa.ChunkedArray):
        et = et.combine_chunks()
    d = et.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    val = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.lexsort((bucket, codes))
    c_s, b_s, v_s = codes[order], bucket[order], val[order]
    starts = group_boundaries(c_s, b_s)
    ends = np.append(starts[1:], len(order))
    return pa.table(
        {
            "source": d.dictionary.take(pa.array(c_s[starts])).cast(pa.string()),
            "bucket": pa.array(b_s[starts], pa.int64()),
            "count": pa.array((ends - starts).astype(np.int64), pa.int64()),
            "val_sum": pa.array(np.add.reduceat(v_s, starts), pa.float64()),
        }
    )


_PARTIAL_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("bucket", pa.int64()),
        ("count", pa.int64()),
        ("val_sum", pa.float64()),
    ]
)


def _merge_hourly(t: pa.Table, decimals: int = 6) -> pa.Table:
    if t.num_rows == 0:
        return pa.Table.from_pylist([], schema=_MERGED_SCHEMA)
    t = t.combine_chunks()
    cnt = int(t["count"].to_numpy(zero_copy_only=False).sum())
    # deterministic float merge order: sort partial sums before adding
    parts = np.sort(t["val_sum"].to_numpy(zero_copy_only=False))
    s = float(parts.sum())
    return pa.table(
        {
            "source": t["source"][:1].cast(pa.string()),
            "bucket": t["bucket"][:1],
            "count": pa.array([cnt], pa.int64()),
            "val_sum": pa.array([round(s, decimals)], pa.float64()),
        }
    )


_MERGED_SCHEMA = _PARTIAL_SCHEMA


def hourly_rollup(sf_dir: str, width: int = HOUR) -> rd.Dataset:
    """Per (event_type, epoch-hour) count + rounded value sum."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])
    parts = ev.map_batches(
        lambda b: _partial_hourly(b, width), batch_format="pyarrow", zero_copy_batch=True
    )
    return parts.groupby(["source", "bucket"]).map_groups(
        _merge_hourly, batch_format="pyarrow"
    )


def hourly_gapfill(sf_dir: str, mode: str) -> rd.Dataset:
    """Dense per-type hour grid (min..max observed), gaps filled."""
    return gapfill(
        hourly_rollup(sf_dir), ["val_sum"], mode, grid_mode="min", decimals=6
    )


def sliding_hourly(sf_dir: str, window_buckets: int = 3) -> rd.Dataset:
    """Sliding window (size = ``window_buckets`` hours, step = 1 hour) counts
    and sums per event type, over the dense hour grid: rolling sum of the
    tumbling rollup -- the tier-cascade trick applied to overlapping windows
    (each sliding window recombines ``window_buckets`` tumbling buckets, so
    raw rows are touched once)."""
    dense = hourly_gapfill(sf_dir, "locf")  # dense grid; we ignore fill values

    def roll(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=_SLIDE_SCHEMA)
        bucket = t["bucket"].to_numpy(zero_copy_only=False)
        order = np.argsort(bucket, kind="stable")
        b = bucket[order]
        cnt = t["count"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
        filled = t["filled"].to_numpy(zero_copy_only=False)[order]
        val = np.where(filled, 0.0, np.nan_to_num(
            t["val_sum"].to_numpy(zero_copy_only=False)[order], nan=0.0))
        # windows ending at each bucket with a full window inside the grid
        w = window_buckets
        if len(b) < w:
            return pa.Table.from_pylist([], schema=_SLIDE_SCHEMA)
        ccnt = np.concatenate(([0], np.cumsum(cnt)))
        cval = np.concatenate(([0.0], np.cumsum(val)))
        win_cnt = ccnt[w:] - ccnt[:-w]
        win_val = np.round(cval[w:] - cval[:-w], 6)
        src = t["source"][0].as_py()
        return pa.table(
            {
                "source": pa.array([src] * len(win_cnt), pa.string()),
                "win_end": pa.array(b[w - 1 :], pa.int64()),
                "count": pa.array(win_cnt, pa.int64()),
                "val_sum": pa.array(win_val, pa.float64()),
            }
        )

    return dense.groupby("source").map_groups(roll, batch_format="pyarrow")


def user_sessions(sf_dir: str, gap_s: int = 1800) -> rd.Dataset:
    """Session windows per user: a new session starts after a silence gap
    > ``gap_s`` -- the classic order-sensitive per-key scan (Ray Data has no
    event-time windows; SURVEY.md §2.9 maps them to sorted per-key groups)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def sessions(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist(
                [], schema=pa.schema([("user_id", pa.int64()), ("sessions", pa.int64())])
            )
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        ts = np.sort(ts)
        gaps = np.diff(ts) > gap_s * 1_000_000
        return pa.table(
            {
                "user_id": t["user_id"][:1].cast(pa.int64()),
                "sessions": pa.array([int(gaps.sum()) + 1], pa.int64()),
            }
        )

    return ev.groupby("user_id").map_groups(sessions, batch_format="pyarrow")


def asof_last_event_value(sf_dir: str) -> rd.Dataset:
    """As-of join: for each order, the value of the customer's latest event
    at or before the order date.  Small side (events) is sorted per key and
    broadcast once; the probe is a vectorized searchsorted per batch --
    the broadcast as-of join (SURVEY.md §2.6; large-large sides would bucket
    by key hash and pd.merge_asof per bucket)."""
    import pyarrow.parquet as pq
    import ray

    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    uid = ev["user_id"].to_numpy(zero_copy_only=False)
    ts = ev["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    val = ev["value"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ts, uid))
    lookup = {}
    u_s, t_s, v_s = uid[order], ts[order], val[order]
    starts = np.flatnonzero(np.concatenate(([True], u_s[1:] != u_s[:-1])))
    ends = np.append(starts[1:], len(u_s))
    for s, e in zip(starts, ends):
        lookup[int(u_s[s])] = (t_s[s:e], v_s[s:e])
    ref = ray.put(lookup)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def probe(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        t = t.combine_chunks()
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        od = t["o_orderdate"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        out = np.full(len(ok), np.nan)
        for i in range(len(ok)):
            hit = m.get(int(ck[i]))
            if hit is None:
                continue
            j = np.searchsorted(hit[0], od[i], side="right") - 1
            if j >= 0:
                out[i] = hit[1][j]
        return pa.table(
            {
                "o_orderkey": pa.array(ok, pa.int64()),
                "last_event_value": pa.array(np.round(out, 6), pa.float64()),
            }
        )

    return orders.map_batches(probe, batch_format="pyarrow")


_SLIDE_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("win_end", pa.int64()),
        ("count", pa.int64()),
        ("val_sum", pa.float64()),
    ]
)
