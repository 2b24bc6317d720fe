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

from ..sources.readers import read_parquet_sized

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


_MERGED_SCHEMA = _PARTIAL_SCHEMA


def _source_hash(col) -> np.ndarray:
    """Deterministic per-row int64 hash of a string column: hash each
    DISTINCT value once (crc32 -- stable across processes, unlike Python's
    seeded hash()), then scatter by dictionary code.  Cost is O(distinct),
    not O(rows)."""
    import zlib

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    if not len(codes):
        return codes
    dh = np.array(
        [zlib.crc32(s.encode()) for s in d.dictionary.to_pylist()], dtype=np.int64
    )
    return dh[codes]


def _merge_hourly_partition(t: pa.Table, decimals: int = 6) -> pa.Table:
    """ALL (source, bucket) groups of one hash partition merged in a single
    vectorized pass: lexsort + segment reduceat -- one Python call per
    PARTITION, not per group (VERDICT r3 item 1; the stages/rollup.py
    partition-merge pattern).  Float determinism: partial sums sort
    ascending within each segment (val_sum is the innermost lexsort key),
    so the merged sum never depends on partial arrival order."""
    if t.num_rows == 0:
        return pa.Table.from_pylist([], schema=_MERGED_SCHEMA)
    t = t.combine_chunks()
    src = t["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    d = src.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    bucket = t["bucket"].to_numpy(zero_copy_only=False)
    cnt = t["count"].to_numpy(zero_copy_only=False)
    vs = t["val_sum"].to_numpy(zero_copy_only=False)
    order = np.lexsort((vs, bucket, codes))
    c_s, b_s = codes[order], bucket[order]
    starts = group_boundaries(c_s, b_s)
    counts = np.add.reduceat(cnt[order], starts)
    sums = np.round(np.add.reduceat(vs[order], starts), decimals)
    return pa.table(
        {
            "source": d.dictionary.take(pa.array(c_s[starts])).cast(pa.string()),
            "bucket": pa.array(b_s[starts], pa.int64()),
            "count": pa.array(counts.astype(np.int64), pa.int64()),
            "val_sum": pa.array(sums, pa.float64()),
        }
    )


def hourly_rollup(sf_dir: str, width: int = HOUR, buckets: int | None = None) -> rd.Dataset:
    """Per (event_type, epoch-hour) count + rounded value sum.

    Scale shape: per-batch combiner collapses raw rows to (source, bucket)
    partials, ONE hash((source, bucket)) exchange, then a vectorized
    segment merge per partition.  Group count (sources x hours) scales with
    retention, so the merge must not pay a Python call per group."""
    from ..sources.readers import suggest_buckets
    from ..stages.joins import hash_prt

    if buckets is None:
        # exchange moves PARTIAL rows (~1-5% of raw bytes): size at one
        # partition per ~512 MB of raw input, clamped at [32, ...]
        buckets = suggest_buckets(
            f"{sf_dir}/events.parquet", target_bytes=512 * 1024 * 1024
        )
    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def partial_with_prt(b: pa.Table) -> pa.Table:
        p = _partial_hourly(b, width)
        if p.num_rows == 0:
            return p.append_column("prt", pa.array([], pa.int64()))
        sh = _source_hash(p["source"])
        bk = p["bucket"].to_numpy(zero_copy_only=False)
        key = (sh << np.int64(32)) | (bk & np.int64(0xFFFFFFFF))
        return p.append_column("prt", pa.array(hash_prt(key, buckets), pa.int64()))

    # LARGE batches for the combiner: its output is one row per
    # (source, bucket) seen in the batch, so batches must dwarf the group
    # cardinality or the "combiner" ships ~raw-sized partials (measured at
    # 10M rows / 108k groups: 1MB read blocks -> 60k-row batches combined
    # nothing and the exchange sorted the whole table; 1M-row batches cut
    # shuffled partials ~10x)
    parts = ev.map_batches(
        partial_with_prt,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1_048_576,
    )
    return parts.groupby("prt").map_groups(
        lambda g: _merge_hourly_partition(g.drop_columns(["prt"])),
        batch_format="pyarrow",
    )


def hourly_gapfill(sf_dir: str, mode: str) -> rd.Dataset:
    """Dense per-type hour grid (min..max observed), gaps filled."""
    return gapfill(
        hourly_rollup(sf_dir), ["val_sum"], mode, grid_mode="min", decimals=6
    )


def sliding_hourly(
    sf_dir: str, window_buckets: int = 3, chunk_buckets: int = 100_000
) -> rd.Dataset:
    """Sliding window (size = ``window_buckets`` hours, step = 1 hour) counts
    and sums per event type, over the dense hour grid: rolling sum of the
    tumbling rollup -- the tier-cascade trick applied to overlapping windows
    (each sliding window recombines ``window_buckets`` tumbling buckets, so
    raw rows are touched once).

    Scale shape (VERDICT r3 item 2): the dense grid is split into
    ``chunk_buckets``-wide bucket ranges per source; each grid row also
    replicates to the NEXT chunk when it lies within ``window_buckets - 1``
    buckets of the boundary (the carried boundary rows, mirroring gap-fill's
    ``max_group_rows`` chunking), so a years-long hot source fans out over
    many tasks instead of serializing in one group.  The dense grid is
    contiguous per source, so every window ending inside a chunk finds its
    full ``w`` buckets in that chunk's (carried + own) rows, and carried
    rows never produce window ends -- no duplicate or missing windows."""
    w = window_buckets
    if chunk_buckets < w:
        raise ValueError(f"chunk_buckets={chunk_buckets} must be >= window={w}")
    dense = hourly_gapfill(sf_dir, "locf")  # dense grid; we ignore fill values

    def tag_chunks(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return t.append_column("chunk", pa.array([], pa.int64()))
        b = t["bucket"].to_numpy(zero_copy_only=False)
        own = b // chunk_buckets
        carry_to = (b + (w - 1)) // chunk_buckets
        tagged = t.append_column("chunk", pa.array(own, pa.int64()))
        rep = np.flatnonzero(carry_to != own)
        if len(rep):
            carried = t.take(pa.array(rep)).append_column(
                "chunk", pa.array(carry_to[rep], pa.int64())
            )
            tagged = pa.concat_tables([tagged, carried])
        return tagged

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

    return (
        dense.map_batches(tag_chunks, batch_format="pyarrow")
        .groupby(["source", "chunk"])
        .map_groups(
            lambda g: roll(g.drop_columns(["chunk"])), batch_format="pyarrow"
        )
    )


def user_sessions(sf_dir: str, gap_s: int = 1800, buckets: int | None = None) -> rd.Dataset:
    """Session windows per user: a new session starts after a silence gap
    > ``gap_s`` -- the classic order-sensitive per-key scan (Ray Data has no
    event-time windows; SURVEY.md §2.9 maps them to sorted per-key scans).

    Scale shape: hash-partition by user (one keyed shuffle), then ONE
    vectorized pass per partition computes every user's session count with
    segment ops (lexsort + reduceat) -- no per-user Python call, no
    single-user 1-row map_groups tasks."""
    from ..sources.readers import suggest_buckets

    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    from ..stages.joins import hash_prt

    def add_prt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        prt = hash_prt(u, buckets)
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "ts_us": pa.array(ts, pa.int64()),
                "prt": pa.array(prt, pa.int64()),
            }
        )

    out_schema = pa.schema([("user_id", pa.int64()), ("sessions", pa.int64())])

    def sessions_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, u))
        u_s, t_s = u[order], ts[order]
        new_user = np.concatenate(([True], u_s[1:] != u_s[:-1]))
        starts = np.flatnonzero(new_user)
        # a gap row: same user as previous AND silence > gap_s
        gap = np.concatenate(
            ([False], (~new_user[1:]) & (np.diff(t_s) > gap_s * 1_000_000))
        )
        cums = np.concatenate(([0], np.cumsum(gap)))
        ends = np.append(starts[1:], len(u_s))
        gaps_per_user = cums[ends] - cums[starts]
        return pa.table(
            {
                "user_id": pa.array(u_s[starts], pa.int64()),
                "sessions": pa.array(gaps_per_user + 1, pa.int64()),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(add_prt, batch_format="pyarrow")
        .groupby("prt")
        .map_groups(
            lambda g: sessions_partition(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


def asof_last_event_value(sf_dir: str, buckets: int | None = None,
                          direction: str = "backward",
                          out_col: str = "last_event_value") -> rd.Dataset:
    """As-of join: for each order, the value of the customer's latest event
    at or before the order date (``direction="backward"``), or of the
    EARLIEST event at or after it (``direction="forward"`` -- the
    next-touch attribution shape; see ``asof_next_event_value``).

    Ties on the event timestamp are broken deterministically by value
    (largest wins backward, smallest forward), mirrored in the SQL oracle's
    ORDER BY tiebreak.

    Large-large shape (SURVEY.md section 2.6): BOTH sides are bucketed by
    ``hash(user key) % buckets`` (plain column + one keyed shuffle of the
    union), and each bucket runs one vectorized ``pd.merge_asof`` (sorted
    search, by=key).  No side is broadcast or read on the driver;
    at stream scale neither events nor orders fits anywhere whole.  Skewed
    users can be salted by raising ``buckets``; within a bucket the cost is
    sort + one linear merge."""
    import pandas as pd

    from ..sources.readers import suggest_buckets

    if buckets is None:
        buckets = suggest_buckets(
            f"{sf_dir}/events.parquet", f"{sf_dir}/orders.parquet"
        )
    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    from ..stages.joins import hash_prt

    union_schema = pa.schema(
        [
            ("key", pa.int64()),
            ("t", pa.int64()),
            ("val", pa.float64()),
            ("okey", pa.int64()),
            ("side", pa.int8()),
            ("prt", pa.int64()),
        ]
    )

    def tag_events(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        k = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        prt = hash_prt(k, buckets)
        n = len(k)
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "t": pa.array(ts, pa.int64()),
                "val": t["value"].cast(pa.float64()),
                "okey": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                "prt": pa.array(prt, pa.int64()),
            },
            schema=union_schema,
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        k = t["o_custkey"].to_numpy(zero_copy_only=False)
        od = (
            t["o_orderdate"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        prt = hash_prt(k, buckets)
        n = len(k)
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "t": pa.array(od, pa.int64()),
                "val": pa.array(np.zeros(n, np.float64), pa.float64()),
                "okey": t["o_orderkey"].cast(pa.int64()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
                "prt": pa.array(prt, pa.int64()),
            },
            schema=union_schema,
        )

    both = ev.map_batches(tag_events, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    out_schema = pa.schema(
        [("o_orderkey", pa.int64()), (out_col, pa.float64())]
    )

    def merge_asof_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        side = t["side"].to_numpy(zero_copy_only=False)
        probe = t.filter(pa.array(side == 1))
        if probe.num_rows == 0:
            return pa.table(
                {"o_orderkey": pa.nulls(0, pa.int64()),
                 out_col: pa.nulls(0, pa.float64())},
                schema=out_schema,
            )
        build = t.filter(pa.array(side == 0))
        left = pd.DataFrame(
            {
                "key": probe["key"].to_numpy(zero_copy_only=False),
                "t": probe["t"].to_numpy(zero_copy_only=False),
                "okey": probe["okey"].to_numpy(zero_copy_only=False),
            }
        ).sort_values("t", kind="stable")
        # ts tiebreak by value: merge_asof picks the LAST right row among
        # equal t backward and the FIRST forward, so ascending-value sort
        # yields max-value backward / min-value forward -- both mirrored
        # in the oracle's ORDER BY
        right = pd.DataFrame(
            {
                "key": build["key"].to_numpy(zero_copy_only=False),
                "t": build["t"].to_numpy(zero_copy_only=False),
                "val": build["val"].to_numpy(zero_copy_only=False),
            }
        ).sort_values(["t", "val"], kind="stable")
        m = pd.merge_asof(left, right, on="t", by="key", direction=direction)
        return pa.table(
            {
                "o_orderkey": pa.array(m["okey"].to_numpy(np.int64), pa.int64()),
                out_col: pa.array(
                    np.round(m["val"].to_numpy(np.float64), 6), pa.float64()
                ),
            },
            schema=out_schema,
        )

    return both.groupby("prt").map_groups(merge_asof_bucket, batch_format="pyarrow")


def asof_next_event_value(sf_dir: str, buckets: int | None = None) -> rd.Dataset:
    """Forward as-of join: for each order, the value of the customer's
    EARLIEST event at or after the order date -- next-touch attribution.
    Same bucketed large-large shape as asof_last_event_value."""
    return asof_last_event_value(
        sf_dir, buckets, direction="forward", out_col="next_event_value"
    )


_WINDOW_7D_US = 7 * 86_400 * 1_000_000


def order_event_window(
    sf_dir: str, window_us: int = _WINDOW_7D_US, buckets: int | None = None
) -> rd.Dataset:
    """RANGE join: for each order, the count and value sum of the customer's
    events inside the attribution window ``[o_orderdate - 7d, o_orderdate)``
    (the SQL ``JOIN ... ON e.user_id = o.o_custkey AND e.ts BETWEEN ...``
    shape Ray Data has no native operator for).

    Scale shape: same bucketed large-large layout as the as-of join -- both
    sides hash-partition on the user key in ONE keyed exchange; each bucket
    reduces the range predicate to TWO vectorized as-of lookups against
    per-key cumulative (count, micro-sum) prefixes:
    ``F(key, x) = #events with t < x``, so
    ``count = F(T) - F(T - w)`` and likewise for the sum -- no per-order
    scan, no interval explosion.  Exactness: value sums ride int64
    micro-unit prefix differences (cum values stay < 2^53, so the float
    round-trip through merge_asof is lossless)."""
    import pandas as pd

    from ..sources.readers import suggest_buckets

    if buckets is None:
        buckets = suggest_buckets(
            f"{sf_dir}/events.parquet", f"{sf_dir}/orders.parquet"
        )
    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    from ..stages.joins import hash_prt

    union_schema = pa.schema(
        [
            ("key", pa.int64()),
            ("t", pa.int64()),
            ("val_u", pa.int64()),
            ("okey", pa.int64()),
            ("side", pa.int8()),
            ("prt", pa.int64()),
        ]
    )

    def tag_events(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        k = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        val_u = np.rint(
            t["value"].to_numpy(zero_copy_only=False) * 1_000_000
        ).astype(np.int64)
        n = len(k)
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "t": pa.array(ts, pa.int64()),
                "val_u": pa.array(val_u, pa.int64()),
                "okey": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                "prt": pa.array(hash_prt(k, buckets), pa.int64()),
            },
            schema=union_schema,
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        k = t["o_custkey"].to_numpy(zero_copy_only=False)
        od = (
            t["o_orderdate"].combine_chunks().cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        n = len(k)
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "t": pa.array(od, pa.int64()),
                "val_u": pa.array(np.zeros(n, np.int64), pa.int64()),
                "okey": t["o_orderkey"].cast(pa.int64()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
                "prt": pa.array(hash_prt(k, buckets), pa.int64()),
            },
            schema=union_schema,
        )

    both = ev.map_batches(tag_events, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    out_schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("ev_count", pa.int64()),
            ("ev_sum", pa.float64()),
        ]
    )

    def range_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        side = t["side"].to_numpy(zero_copy_only=False)
        probe = t.filter(pa.array(side == 1))
        if probe.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        build = t.filter(pa.array(side == 0))
        ek = build["key"].to_numpy(zero_copy_only=False)
        et = build["t"].to_numpy(zero_copy_only=False)
        ev_u = build["val_u"].to_numpy(zero_copy_only=False)
        # per-key cumulative prefixes in (key, t) order; the stable re-sort
        # by t below keeps equal-t duplicates of a key in cum order, so the
        # backward as-of lands on the LAST duplicate (counting all of them)
        order = np.lexsort((et, ek))
        ek_s, et_s, ev_s = ek[order], et[order], ev_u[order]
        starts = np.flatnonzero(
            np.concatenate(([True], ek_s[1:] != ek_s[:-1]))
        ) if len(ek_s) else np.empty(0, np.int64)
        seg = np.zeros(len(ek_s), np.int64)
        if len(starts):
            seg[starts] = 1
            seg = np.cumsum(seg) - 1
        cum = np.arange(1, len(ek_s) + 1, dtype=np.int64)
        cval = np.cumsum(ev_s)
        if len(starts):
            base_n = np.concatenate(([0], cum[starts[1:] - 1]))
            base_v = np.concatenate(([0], cval[starts[1:] - 1]))
            cum = cum - base_n[seg]
            cval = cval - base_v[seg]
        right = pd.DataFrame(
            {"key": ek_s, "t": et_s, "cum": cum, "cval": cval}
        ).sort_values("t", kind="stable")

        pk = probe["key"].to_numpy(zero_copy_only=False)
        pt = probe["t"].to_numpy(zero_copy_only=False)
        pok = probe["okey"].to_numpy(zero_copy_only=False)

        def F(at: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            """(#events with t < at, their micro-sum) per probe row."""
            left = pd.DataFrame({"key": pk, "t": at, "i": np.arange(len(pk))})
            m = pd.merge_asof(
                left.sort_values("t", kind="stable"),
                right,
                on="t",
                by="key",
                direction="backward",
                allow_exact_matches=False,
            ).sort_values("i")
            return (
                m["cum"].fillna(0).to_numpy(np.int64),
                m["cval"].fillna(0).to_numpy(np.int64),
            )

        n_hi, v_hi = F(pt)
        n_lo, v_lo = F(pt - window_us)
        return pa.table(
            {
                "o_orderkey": pa.array(pok, pa.int64()),
                "ev_count": pa.array(n_hi - n_lo, pa.int64()),
                "ev_sum": pa.array((v_hi - v_lo) / 1_000_000.0, pa.float64()),
            },
            schema=out_schema,
        )

    return both.groupby("prt").map_groups(range_bucket, batch_format="pyarrow")


ORDER_EVENT_WINDOW_SQL = """
SELECT o.o_orderkey::BIGINT AS o_orderkey,
       count(e.ts)::BIGINT AS ev_count,
       COALESCE(SUM(CAST(round(e.value * 1000000, 0) AS BIGINT)), 0)
         / 1000000.0 AS ev_sum
FROM orders o
LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >= o.o_orderdate - INTERVAL 7 DAY
 AND e.ts < o.o_orderdate
GROUP BY o.o_orderkey
"""


_SLIDE_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("win_end", pa.int64()),
        ("count", pa.int64()),
        ("val_sum", pa.float64()),
    ]
)


def user_value_stats(sf_dir: str, buckets: int | None = None) -> rd.Dataset:
    """``signal_stats``-bundle per user over the ts-ordered event-value
    series: n, mean, population std/var, min/max, rms, energy, crest factor,
    G1 sample skewness, excess kurtosis, and zero-crossing rate of the
    demeaned series (reference kernels caits/fe/_statistical.py:13-458; the
    per-signal bundle is signal_stats, _statistical.py:472 -- here the
    "signal" is each user's event stream, the engine-native shape).

    Scale shape: identical to user_sessions -- ONE keyed exchange
    (hash-partition by user), then one vectorized segment pass per partition
    (lexsort + reduceat) computes every user's full bundle; group size is
    bounded by per-user event counts, group count grows with data.

    Rounding bridges float64 summation-order differences vs the DuckDB
    oracle: O(1) shape stats at 4-6 dp, energy (a raw sum of squares) at 2.
    """
    from ..sources.readers import suggest_buckets

    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    from ..stages.joins import hash_prt

    def add_prt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "ts_us": pa.array(ts, pa.int64()),
                "v": pa.array(v, pa.float64()),
                "prt": pa.array(hash_prt(u, buckets), pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n", pa.int64()),
            ("mean", pa.float64()),
            ("std", pa.float64()),
            ("var", pa.float64()),
            ("vmin", pa.float64()),
            ("vmax", pa.float64()),
            ("rms", pa.float64()),
            ("energy", pa.float64()),
            ("crest", pa.float64()),
            ("skew", pa.float64()),
            ("kurt", pa.float64()),
            ("zcr", pa.float64()),
        ]
    )

    def stats_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        # order by (user, ts, v): the v tiebreak makes same-timestamp order
        # deterministic on both sides of the oracle comparison
        order = np.lexsort((v, ts, u))
        u_s, v_s = u[order], v[order]
        new_user = np.concatenate(([True], u_s[1:] != u_s[:-1]))
        starts = np.flatnonzero(new_user)
        n = np.diff(np.append(starts, len(u_s)))
        nf = n.astype(np.float64)
        mu = np.add.reduceat(v_s, starts) / nf
        dv = v_s - np.repeat(mu, n)
        m2 = np.add.reduceat(dv * dv, starts) / nf
        m3 = np.add.reduceat(dv**3, starts) / nf
        m4 = np.add.reduceat(dv**4, starts) / nf
        sq = np.add.reduceat(v_s * v_s, starts)
        rms = np.sqrt(sq / nf)
        vmin = np.minimum.reduceat(v_s, starts)
        vmax = np.maximum.reduceat(v_s, starts)
        peak = np.maximum.reduceat(np.abs(v_s), starts)
        with np.errstate(divide="ignore", invalid="ignore"):
            crest = peak / rms
            g1 = m3 / m2**1.5
            skew = np.sqrt(nf * (nf - 1.0)) / (nf - 2.0) * g1
            kurt = m4 / m2**2 - 3.0
        # zero crossings of the demeaned series: adjacent-product sign test
        # within each user's run (caits/fe/_statistical.py:324 semantics)
        neg = (dv[:-1] * dv[1:] < 0) & (u_s[1:] == u_s[:-1])
        csum = np.concatenate(([0], np.cumsum(neg)))
        ends = np.append(starts[1:], len(u_s))
        ncross = (csum[ends - 1] - csum[starts]).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            zcr = ncross / (nf - 1.0)

        def col(x, dec, valid=None):
            # epsilon-biased rounding, mirrored in the SQL oracle: means of
            # 2-decimal inputs land EXACTLY on 1e-6 rounding ties (rational
            # sums), where float summation-order noise flips the direction;
            # a bias of grid*1e-3 (>> accumulation error, << one grid step)
            # makes both sides decide ties identically
            arr = np.round(x + 10.0 ** (-dec) * 1e-3, dec)
            mask = ~np.isfinite(arr) if valid is None else ~(valid & np.isfinite(arr))
            return pa.array(np.where(mask, np.nan, arr), pa.float64(),
                            mask=mask)

        return pa.table(
            {
                "user_id": pa.array(u_s[starts], pa.int64()),
                "n": pa.array(n, pa.int64()),
                "mean": col(mu, 6),
                "std": col(np.sqrt(m2), 6),
                "var": col(m2, 4),
                "vmin": col(vmin, 6),
                "vmax": col(vmax, 6),
                "rms": col(rms, 6),
                "energy": col(sq, 2),
                "crest": col(crest, 6, m2 > 0),
                "skew": col(skew, 6, (n >= 3) & (m2 > 0)),
                "kurt": col(kurt, 6, m2 > 0),
                "zcr": col(zcr, 6, n >= 2),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(add_prt, batch_format="pyarrow")
        .groupby("prt")
        .map_groups(
            lambda g: stats_partition(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


USER_VALUE_STATS_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t, value AS v FROM events
),
c AS (
  SELECT user_id, t, v,
         avg(v) OVER (PARTITION BY user_id) AS mu
  FROM e
),
d AS (
  SELECT user_id, t, v, v - mu AS dv, mu,
         CASE WHEN (v - mu) * lag(v - mu)
                   OVER (PARTITION BY user_id ORDER BY t, v) < 0
              THEN 1 ELSE 0 END AS crossed
  FROM c
),
a AS (
  SELECT user_id,
         count(*)::BIGINT AS n,
         avg(v) AS mu,
         avg(dv * dv) AS m2,
         avg(dv * dv * dv) AS m3,
         avg(dv * dv * dv * dv) AS m4,
         min(v) AS vmin,
         max(v) AS vmax,
         sqrt(avg(v * v)) AS rms,
         sum(v * v) AS energy,
         max(abs(v)) AS peak,
         sum(crossed)::DOUBLE AS ncross
  FROM d GROUP BY user_id
)
SELECT user_id,
       n,
       round(mu + 1e-9, 6) AS "mean",
       round(sqrt(m2) + 1e-9, 6) AS "std",
       round(m2 + 1e-7, 4) AS "var",
       round(vmin + 1e-9, 6) AS vmin,
       round(vmax + 1e-9, 6) AS vmax,
       round(rms + 1e-9, 6) AS rms,
       round(energy + 1e-5, 2) AS energy,
       CASE WHEN m2 > 0 THEN round(peak / rms + 1e-9, 6) END AS crest,
       CASE WHEN n >= 3 AND m2 > 0
            THEN round(sqrt(n * (n - 1.0)) / (n - 2.0) * m3 / m2 ** 1.5 + 1e-9, 6)
       END AS skew,
       CASE WHEN m2 > 0 THEN round(m4 / m2 ** 2 - 3.0 + 1e-9, 6) END AS kurt,
       CASE WHEN n >= 2 THEN round(ncross / (n - 1.0) + 1e-9, 6) END AS zcr
FROM a
"""


def user_top_event(sf_dir: str, buckets: int | None = None) -> rd.Dataset:
    """Grouped ARGMAX: each user's single highest-value event (ties broken
    by earlier ts, then lower event_id -- a total order, so the result is
    deterministic and SQL-oracle-checkable).

    Scale shape: per-batch combiner keeps ONE candidate row per user seen in
    the batch (lexsort + first-of-run), so the keyed exchange moves at most
    batches x users_per_batch candidate rows, never raw events; the
    per-partition merge repeats the same vectorized selection."""
    from ..sources.readers import read_parquet_sized, suggest_buckets
    from ..stages.joins import hash_prt

    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    def best_rows(t: pa.Table, with_prt: bool) -> pa.Table:
        t = t.combine_chunks()
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        val = t["value"].to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False) \
            if isinstance(t["ts"], pa.ChunkedArray) else t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # argmax per user under (value desc, ts asc, event_id asc), with
        # SQL's total order on the value key (ADVICE r3): NULL sorts last
        # under DESC (DuckDB nulls_last default), NaN sorts FIRST (NaN >
        # every double incl. +inf).  Arrow keeps NULL distinct from NaN;
        # to_numpy collapses both to NaN, so take the validity mask first.
        vcol = t["value"]
        null = (
            vcol.is_null().to_numpy(zero_copy_only=False)
            if vcol.null_count
            else np.zeros(len(val), dtype=bool)
        )
        null_key = null.view(np.int8)  # non-null (0) before null (1)
        nan_key = np.where(np.isnan(val) & ~null, 0, 1).astype(np.int8)
        # "+ 0.0" canonicalizes -0.0 to +0.0 so a 0.0/-0.0 tie falls through
        # to the (ts, event_id) total-order keys on both sides
        order = np.lexsort((eid, ts, -(val + 0.0), nan_key, null_key, uid))
        u_s = uid[order]
        if not len(u_s):  # empty batch (upstream filter / empty block)
            sel = order
        else:
            first = np.flatnonzero(np.concatenate(([True], u_s[1:] != u_s[:-1])))
            sel = order[first]
        cols = {
            "user_id": pa.array(uid[sel], pa.int64()),
            "event_id": pa.array(eid[sel], pa.int64()),
            "ts": pa.array(ts[sel].view("datetime64[us]")),
            # carry the validity mask so NULL stays distinct from NaN
            # through the exchange (the merge pass re-applies SQL ordering)
            "value": pa.array(val[sel], pa.float64(), mask=null[sel]),
        }
        if with_prt:
            cols["prt"] = pa.array(hash_prt(uid[sel], buckets), pa.int64())
        return pa.table(cols)

    def combiner(t: pa.Table) -> pa.Table:
        # ts arrives as timestamp; normalize through the same kernel
        return best_rows(t, with_prt=True)

    return (
        # large batches: the combiner emits one row per user per batch, so
        # batch rows must dwarf user cardinality (see hourly_rollup)
        ev.map_batches(combiner, batch_format="pyarrow", batch_size=1_048_576)
        .groupby("prt")
        .map_groups(
            lambda g: best_rows(g.drop_columns(["prt"]), with_prt=False),
            batch_format="pyarrow",
        )
    )


USER_TOP_EVENT_SQL = """
SELECT user_id::BIGINT AS user_id, event_id::BIGINT AS event_id, ts,
       value::DOUBLE AS value
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id ORDER BY value DESC, ts, event_id
) = 1
"""


def user_running_total(sf_dir: str, buckets: int | None = None) -> rd.Dataset:
    """Order-sensitive per-user scan: cumulative value total over each
    user's (ts, event_id)-ordered event stream -- the running-window
    aggregate shape (SQL ``SUM() OVER (PARTITION BY ... ROWS UNBOUNDED
    PRECEDING)``).

    Scale shape: ONE keyed exchange (hash by user); each partition runs a
    single vectorized segmented cumsum (lexsort + cumsum - per-segment
    offset) over ALL its users at once.  Exactness: values accumulate as
    int64 micro-units, so float association order cannot perturb a bit."""
    from ..sources.readers import read_parquet_sized, suggest_buckets
    from ..stages.joins import hash_prt

    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    def add_prt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("prt", pa.array(hash_prt(uid, buckets), pa.int64()))

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("running_total", pa.float64()),
        ]
    )

    def scan_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts_col = t["ts"]
        if isinstance(ts_col, pa.ChunkedArray):
            ts_col = ts_col.combine_chunks()
        ts = ts_col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        val_u = np.round(
            t["value"].to_numpy(zero_copy_only=False) * 1_000_000
        ).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        u_s = uid[order]
        v_s = val_u[order]
        cum = np.cumsum(v_s)
        starts = np.flatnonzero(np.concatenate(([True], u_s[1:] != u_s[:-1])))
        # subtract the cumulative total up to each segment start
        seg_base = np.concatenate(([0], cum[starts[1:] - 1]))
        run = cum - np.repeat(seg_base, np.diff(np.append(starts, len(u_s))))
        return pa.table(
            {
                "user_id": pa.array(u_s, pa.int64()),
                "event_id": pa.array(eid[order], pa.int64()),
                "ts": pa.array(ts[order].view("datetime64[us]")),
                "running_total": pa.array(run / 1_000_000.0, pa.float64()),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(add_prt, batch_format="pyarrow")
        .groupby("prt")
        .map_groups(
            lambda g: scan_partition(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


USER_RUNNING_TOTAL_SQL = """
SELECT user_id::BIGINT AS user_id, event_id::BIGINT AS event_id, ts,
       SUM(CAST(round(value * 1000000, 0) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) / 1000000.0 AS running_total
FROM events
"""


def hourly_anomalies(sf_dir: str, window: int = 24, nsig: float = 3.0) -> rd.Dataset:
    """Rolling z-score anomaly detection over the hourly rollup: a bucket is
    anomalous when its value sum deviates more than ``nsig`` trailing-window
    standard deviations from the trailing-``window``-row mean (frame =
    ``ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW``, full frames only)
    -- the classic streaming-telemetry alert shape.

    Exactness: values quantize to centi-units, rolling sums and
    sum-of-squares ride int64 cumulative differences (bit-equal to the
    oracle's windowed integer SUMs under any association), and the
    mean/variance/threshold float math mirrors the SQL operand-for-operand
    -- so even the knife-edge ``|v - mean| > 3*std`` comparison cannot
    diverge.  Scale shape: runs on ROLLUP rows (one per source-hour,
    bounded by retention, never raw events), one group per source like the
    EWMA scan."""
    hourly = hourly_rollup(sf_dir)

    out_schema = pa.schema(
        [
            ("source", pa.string()),
            ("bucket", pa.int64()),
            ("val_sum", pa.float64()),
            ("mean24", pa.float64()),
            ("z", pa.float64()),
        ]
    )

    w = window

    def scan(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        if g.num_rows < w:
            return pa.Table.from_pylist([], schema=out_schema)
        bucket = g["bucket"].to_numpy(zero_copy_only=False)
        order = np.argsort(bucket, kind="stable")
        b = bucket[order]
        vs = g["val_sum"].to_numpy(zero_copy_only=False)[order]
        # HALF-AWAY (SQL round()): 6dp val_sums land exactly on .5
        # centi-ties where np.rint's half-even diverges
        vcf = vs * 100.0
        vc = np.where(
            vcf >= 0, np.floor(vcf + 0.5), np.ceil(vcf - 0.5)
        ).astype(np.int64)
        cum = np.concatenate(([0], np.cumsum(vc)))
        cumq = np.concatenate(([0], np.cumsum(vc * vc)))
        s = cum[w:] - cum[:-w]
        q = cumq[w:] - cumq[:-w]
        v_end = vc[w - 1:]
        sf8 = s.astype(np.float64)
        var = (q.astype(np.float64) - sf8 * sf8 / float(w)) / float(w)
        mean_c = sf8 / float(w)
        with np.errstate(invalid="ignore"):
            std = np.sqrt(var)
            dev = np.abs(v_end.astype(np.float64) - mean_c)
            flag = (var > 0) & (dev > nsig * std)
        if not flag.any():
            return pa.Table.from_pylist([], schema=out_schema)
        idx = np.flatnonzero(flag)
        src = g["source"][0].as_py()
        return pa.table(
            {
                "source": pa.array([src] * len(idx), pa.string()),
                "bucket": pa.array(b[w - 1:][idx], pa.int64()),
                "val_sum": pa.array(vs[w - 1:][idx], pa.float64()),
                "mean24": pa.array(mean_c[idx] / 100.0, pa.float64()),
                "z": pa.array(
                    (v_end[idx].astype(np.float64) - mean_c[idx]) / std[idx],
                    pa.float64(),
                ),
            },
            schema=out_schema,
        )

    return hourly.groupby("source").map_groups(scan, batch_format="pyarrow")


HOURLY_ANOMALIES_SQL = """
WITH agg AS (
  SELECT event_type AS source,
         (epoch_us(ts) // 1000000) // 3600 AS bucket,
         round(sum(value), 6) AS val_sum
  FROM events GROUP BY 1, 2
),
q AS (
  SELECT source, bucket, val_sum,
         CAST(round(val_sum * 100, 0) AS BIGINT) AS vc,
         row_number() OVER (PARTITION BY source ORDER BY bucket) AS rn,
         SUM(CAST(round(val_sum * 100, 0) AS BIGINT)) OVER w AS s,
         SUM(CAST(round(val_sum * 100, 0) AS BIGINT)
             * CAST(round(val_sum * 100, 0) AS BIGINT)) OVER w AS qq
  FROM agg
  WINDOW w AS (PARTITION BY source ORDER BY bucket
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT source, bucket, val_sum,
       CAST(s AS DOUBLE) / 24.0 / 100.0 AS mean24,
       (CAST(vc AS DOUBLE) - CAST(s AS DOUBLE) / 24.0)
         / sqrt((CAST(qq AS DOUBLE)
                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / 24.0) / 24.0) AS z
FROM q
WHERE rn >= 24
  AND (CAST(qq AS DOUBLE)
       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / 24.0) / 24.0 > 0
  AND abs(CAST(vc AS DOUBLE) - CAST(s AS DOUBLE) / 24.0)
      > 3.0 * sqrt((CAST(qq AS DOUBLE)
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / 24.0) / 24.0)
"""
