"""Window-function / pivot / distinct / quantile analytics over the events
and documents tables -- the SQL-analytics surface a training-data pipeline
leans on next to the rollup and dedup families.

Every operator here follows the engine's two-stage shape: a per-batch
VECTORIZED combiner that collapses rows to key-bounded partials, ONE keyed
hash exchange, and a per-partition vectorized segment pass (lexsort +
reduceat / shift) that computes every group in the partition at once -- no
per-group Python calls whose count scales with data.  Exactness bridges:
value sums ride int64 micro-units; quantiles mirror the oracle's linear
interpolation with the house epsilon-biased rounding (see
events_pipeline.user_value_stats).

Reference parity: the reference's per-signal feature extraction loops
(/root/reference/caits/fe/_statistical.py) are per-array NumPy; these are
the same kernels re-expressed as distributed grouped scans.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..sources.readers import read_parquet_sized, suggest_buckets
from ..stages.joins import hash_prt
from .relational_ext import _sum_runs

MICRO = 1_000_000.0


def _np(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def _ts_us(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def _round6(x: np.ndarray) -> np.ndarray:
    # epsilon-biased rounding, mirrored as round(x + 1e-9, 6) in the SQL
    # oracles: breaks 1e-6 rounding ties identically on both sides
    return np.round(x + 1e-9, 6)


def _read_events(sf_dir: str, cols: list[str]):
    return read_parquet_sized(f"{sf_dir}/events.parquet", columns=cols)


# ---------------------------------------------------------------------------
# LAG window: per-user previous value + delta
# ---------------------------------------------------------------------------

def user_event_lag_diff(sf_dir: str, buckets: int | None = None):
    """Each event with the SAME user's previous value and the delta
    (``LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)``) --
    the window-function scan shape.

    Scale shape: ONE keyed exchange (hash by user), then one vectorized
    lexsort + shift per partition computes every user's lag at once; the
    first event per user gets NULL prev/delta via a validity mask, never a
    sentinel value.
    """
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def add_prt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        uid = _np(t["user_id"]).astype(np.int64)
        return t.append_column("prt", pa.array(hash_prt(uid, buckets), pa.int64()))

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("value", pa.float64()),
            ("prev_value", pa.float64()),
            ("value_diff", pa.float64()),
        ]
    )

    def scan_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        uid = _np(t["user_id"]).astype(np.int64)
        ts = _ts_us(t["ts"])
        eid = _np(t["event_id"]).astype(np.int64)
        v = _np(t["value"])
        order = np.lexsort((eid, ts, uid))
        u_s, v_s = uid[order], v[order]
        prev = np.empty_like(v_s)
        prev[1:] = v_s[:-1]
        prev[0] = np.nan
        first = np.concatenate(([True], u_s[1:] != u_s[:-1]))
        # value - prev is the identical IEEE subtraction DuckDB performs,
        # so no rounding bridge is needed
        diff = v_s - prev
        return pa.table(
            {
                "user_id": pa.array(u_s, pa.int64()),
                "event_id": pa.array(eid[order], pa.int64()),
                "ts": pa.array(ts[order].view("datetime64[us]")),
                "value": pa.array(v_s, pa.float64()),
                "prev_value": pa.array(prev, pa.float64(), mask=first),
                "value_diff": pa.array(diff, pa.float64(), mask=first),
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


USER_EVENT_LAG_DIFF_SQL = """
SELECT user_id::BIGINT AS user_id, event_id::BIGINT AS event_id, ts,
       value::DOUBLE AS value,
       LAG(value) OVER w AS prev_value,
       value - LAG(value) OVER w AS value_diff
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---------------------------------------------------------------------------
# LEAD / FIRST_VALUE / LAST_VALUE windows: per-user next + bounds
# ---------------------------------------------------------------------------

def user_event_lead_bounds(sf_dir: str, buckets: int | None = None):
    """Each event with the SAME user's next value (LEAD), the user's
    first value and last value over the full partition -- the remaining
    navigation window functions next to LAG / PERCENT_RANK / NTILE.

    Scale shape: identical to ``user_event_lag_diff`` -- ONE hash(user)
    exchange, then a single vectorized lexsort + shift/segment-index per
    partition serves all three functions at once (LEAD is a -1 shift
    masked at each user's last row; FIRST/LAST_VALUE are the segment
    start/end values broadcast by ``np.repeat``).  No per-group Python.
    Exactness: pure value moves, no arithmetic -- bitwise vs the oracle.
    """
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def add_prt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        uid = _np(t["user_id"]).astype(np.int64)
        return t.append_column(
            "prt", pa.array(hash_prt(uid, buckets), pa.int64())
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("value", pa.float64()),
            ("next_value", pa.float64()),
            ("first_value", pa.float64()),
            ("last_value", pa.float64()),
        ]
    )

    def scan_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        uid = _np(t["user_id"]).astype(np.int64)
        ts = _ts_us(t["ts"])
        eid = _np(t["event_id"]).astype(np.int64)
        v = _np(t["value"])
        order = np.lexsort((eid, ts, uid))
        u_s, v_s = uid[order], v[order]
        nxt = np.empty_like(v_s)
        nxt[:-1] = v_s[1:]
        nxt[-1] = np.nan
        first = np.concatenate(([True], u_s[1:] != u_s[:-1]))
        last = np.concatenate((first[1:], [True]))  # last row of each user
        starts = np.flatnonzero(first)
        n = np.diff(np.append(starts, len(u_s)))
        fv = np.repeat(v_s[starts], n)
        lv = np.repeat(v_s[starts + n - 1], n)
        return pa.table(
            {
                "user_id": pa.array(u_s, pa.int64()),
                "event_id": pa.array(eid[order], pa.int64()),
                "ts": pa.array(ts[order].view("datetime64[us]")),
                "value": pa.array(v_s, pa.float64()),
                "next_value": pa.array(nxt, pa.float64(), mask=last),
                "first_value": pa.array(fv, pa.float64()),
                "last_value": pa.array(lv, pa.float64()),
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


USER_EVENT_LEAD_BOUNDS_SQL = """
SELECT user_id::BIGINT AS user_id, event_id::BIGINT AS event_id, ts,
       value::DOUBLE AS value,
       LEAD(value) OVER w AS next_value,
       FIRST_VALUE(value) OVER w AS first_value,
       LAST_VALUE(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS last_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---------------------------------------------------------------------------
# Grouped top-k rows: each user's 3 highest-value events with rank
# ---------------------------------------------------------------------------

_TOPK = 3


def topk_events_per_user(sf_dir: str, k: int = _TOPK, buckets: int | None = None):
    """Each user's top-``k`` events by value with their rank
    (``row_number() <= k`` per partition) -- the grouped top-k-ROWS shape,
    generalizing the k=1 grouped argmax of ``user_top_event``.

    Scale shape: the per-batch combiner prunes to k candidate rows per user
    per batch (lexsort + rank-within-run), so the keyed exchange moves at
    most ``batches x users_per_batch x k`` rows; the per-partition merge
    repeats the same selection and emits the rank.  Ordering is the SQL
    total order (value DESC with NaN first / NULL last, then ts, event_id).
    """
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def prune(t: pa.Table, with_prt: bool, emit_rank: bool) -> pa.Table:
        t = t.combine_chunks()
        uid = _np(t["user_id"]).astype(np.int64)
        val = _np(t["value"])
        ts = _ts_us(t["ts"])
        eid = _np(t["event_id"]).astype(np.int64)
        vcol = t["value"] if not isinstance(t["value"], pa.ChunkedArray) \
            else t["value"].combine_chunks()
        null = (
            vcol.is_null().to_numpy(zero_copy_only=False)
            if vcol.null_count
            else np.zeros(len(val), dtype=bool)
        )
        null_key = null.view(np.int8)
        nan_key = np.where(np.isnan(val) & ~null, 0, 1).astype(np.int8)
        order = np.lexsort((eid, ts, -(val + 0.0), nan_key, null_key, uid))
        u_s = uid[order]
        if len(u_s):
            starts = np.flatnonzero(
                np.concatenate(([True], u_s[1:] != u_s[:-1]))
            )
            counts = np.diff(np.append(starts, len(u_s)))
            rank = np.arange(len(u_s), dtype=np.int64) - np.repeat(starts, counts)
            keep = rank < k
            sel = order[keep]
            rnk = rank[keep] + 1
        else:
            sel = order
            rnk = np.zeros(0, np.int64)
        cols = {
            "user_id": pa.array(uid[sel], pa.int64()),
            "event_id": pa.array(eid[sel], pa.int64()),
            "ts": pa.array(ts[sel].view("datetime64[us]")),
            "value": pa.array(val[sel], pa.float64(), mask=null[sel]),
        }
        if emit_rank:
            cols["rnk"] = pa.array(rnk, pa.int64())
        if with_prt:
            cols["prt"] = pa.array(hash_prt(uid[sel], buckets), pa.int64())
        return pa.table(cols)

    return (
        ev.map_batches(
            lambda t: prune(t, with_prt=True, emit_rank=False),
            batch_format="pyarrow",
            batch_size=1_048_576,
        )
        .groupby("prt")
        .map_groups(
            lambda g: prune(g.drop_columns(["prt"]), with_prt=False, emit_rank=True),
            batch_format="pyarrow",
        )
    )


TOPK_EVENTS_PER_USER_SQL = """
SELECT user_id::BIGINT AS user_id, event_id::BIGINT AS event_id, ts,
       value::DOUBLE AS value,
       row_number() OVER w::BIGINT AS rnk
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, ts, event_id)
QUALIFY row_number() OVER w <= 3
"""


# ---------------------------------------------------------------------------
# Hourly event-count rate of change per type (LAG over grouped buckets)
# ---------------------------------------------------------------------------

def events_hourly_rate(sf_dir: str):
    """Hour-over-hour change in event count per type: hourly counts, then
    ``cnt - LAG(cnt)`` over each type's PRESENT buckets in order -- the
    time-series rate/derivative shape (PromQL ``rate()`` over a count
    stream, reset-free since counts are per-bucket).

    Scale shape: per-batch (type, hour-bucket) count combiner collapses raw
    events inside map tasks; the exchange carries one row per (type, bucket)
    partial; the per-type ordered diff is a vectorized sort + shift.  Group
    count equals the TYPE DOMAIN (a handful by construction) and rows per
    group are bounded by bucket count (hours of history), never raw events
    -- the same bounded-domain argument as lang_distribution.
    """
    ev = _read_events(sf_dir, ["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (_ts_us(t["ts"]) // 1_000_000) // 3600
        if not len(codes):
            return pa.table(
                {"event_type": pa.nulls(0, pa.string()),
                 "bucket": pa.nulls(0, pa.int64()),
                 "cnt": pa.nulls(0, pa.int64())}
            )
        # combined (type, bucket) key: buckets are epoch-hours < 2^40
        key = codes * (1 << 44) + bucket
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        cnt = np.diff(np.append(starts, len(ks)))
        sel = order[starts]
        return pa.table(
            {
                "event_type": et.take(pa.array(sel)).cast(pa.string()),
                "bucket": pa.array(bucket[sel], pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    parts = ev.map_batches(
        partial, batch_format="pyarrow", batch_size=1_048_576
    )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("bucket", pa.int64()),
            ("n_events", pa.int64()),
            ("prev_n", pa.int64()),
            ("delta", pa.int64()),
        ]
    )

    def rate_scan(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        b = _np(g["bucket"])
        c = _np(g["cnt"])
        order = np.argsort(b, kind="stable")
        bs, cs = b[order], c[order]
        # merge partial counts of the same bucket
        starts = np.flatnonzero(np.concatenate(([True], bs[1:] != bs[:-1])))
        ub = bs[starts]
        uc = np.add.reduceat(cs, starts)
        prev = np.empty_like(uc)
        prev[1:] = uc[:-1]
        first = np.zeros(len(uc), dtype=bool)
        first[0] = True
        return pa.table(
            {
                "event_type": pa.array(
                    [g["event_type"][0].as_py()] * len(ub), pa.string()
                ),
                "bucket": pa.array(ub, pa.int64()),
                "n_events": pa.array(uc, pa.int64()),
                "prev_n": pa.array(prev, pa.int64(), mask=first),
                "delta": pa.array(uc - prev, pa.int64(), mask=first),
            },
            schema=out_schema,
        )

    return parts.groupby("event_type").map_groups(rate_scan, batch_format="pyarrow")


EVENTS_HOURLY_RATE_SQL = """
WITH agg AS (
  SELECT event_type, (epoch_us(ts) // 1000000) // 3600 AS bucket,
         count(*)::BIGINT AS n_events
  FROM events GROUP BY 1, 2
)
SELECT event_type, bucket, n_events,
       LAG(n_events) OVER w AS prev_n,
       n_events - LAG(n_events) OVER w AS delta
FROM agg
WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
"""


# ---------------------------------------------------------------------------
# Grouped exact quantiles (PERCENTILE_CONT linear interpolation)
# ---------------------------------------------------------------------------

_QS = (0.25, 0.50, 0.75, 0.90)


def user_value_quantiles(sf_dir: str, buckets: int | None = None):
    """Exact per-user value quantiles (p25/p50/p75/p90) with SQL
    ``quantile_cont`` linear-interpolation semantics.

    Scale shape: ONE keyed exchange (hash by user); each partition sorts
    once (lexsort by user, value) and computes every user's four quantiles
    with vectorized segment indexing -- position ``(n-1)q`` split into
    floor/ceil gather + one fused lerp, no per-group Python.  Group size is
    bounded by per-user event counts; group count grows with data.
    """
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["user_id", "value"])

    def add_prt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        uid = _np(t["user_id"]).astype(np.int64)
        return t.append_column("prt", pa.array(hash_prt(uid, buckets), pa.int64()))

    names = [f"p{int(q * 100)}" for q in _QS]
    out_schema = pa.schema(
        [("user_id", pa.int64()), ("n", pa.int64())]
        + [(nm, pa.float64()) for nm in names]
    )

    def quant_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        uid = _np(t["user_id"]).astype(np.int64)
        v = _np(t["value"])
        order = np.lexsort((v, uid))
        u_s, v_s = uid[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], u_s[1:] != u_s[:-1])))
        n = np.diff(np.append(starts, len(u_s)))
        cols = {
            "user_id": pa.array(u_s[starts], pa.int64()),
            "n": pa.array(n.astype(np.int64), pa.int64()),
        }
        for q, nm in zip(_QS, names):
            pos = (n - 1).astype(np.float64) * q
            lo = np.floor(pos).astype(np.int64)
            hi = np.ceil(pos).astype(np.int64)
            frac = pos - lo
            vlo = v_s[starts + lo]
            vhi = v_s[starts + hi]
            cols[nm] = pa.array(_round6(vlo + (vhi - vlo) * frac), pa.float64())
        return pa.table(cols, schema=out_schema)

    return (
        ev.map_batches(add_prt, batch_format="pyarrow")
        .groupby("prt")
        .map_groups(
            lambda g: quant_partition(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


USER_VALUE_QUANTILES_SQL = """
SELECT user_id::BIGINT AS user_id, count(*)::BIGINT AS n,
       round(quantile_cont(value, 0.25) + 1e-9, 6) AS p25,
       round(quantile_cont(value, 0.50) + 1e-9, 6) AS p50,
       round(quantile_cont(value, 0.75) + 1e-9, 6) AS p75,
       round(quantile_cont(value, 0.90) + 1e-9, 6) AS p90
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Distributed exact COUNT(DISTINCT) per group
# ---------------------------------------------------------------------------

def type_user_distinct(sf_dir: str, buckets: int | None = None):
    """Exact distinct-user count per event type -- the distributed
    ``COUNT(DISTINCT)`` shape.

    Scale shape: the per-batch combiner dedupes (type, user) pairs inside
    map tasks; the exchange hashes by USER so every copy of a pair lands in
    one partition; each partition dedupes once (vectorized) and emits
    per-type partial counts, which are additive across partitions because a
    pair exists in exactly one.  The final sum is a type-domain-sized
    aggregate.  No per-key state ever concentrates: memory per partition is
    bounded by distinct pairs / buckets.
    """
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["user_id", "event_type"])

    def pair_dedupe(t: pa.Table, with_prt: bool) -> pa.Table:
        t = t.combine_chunks()
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uid = _np(t["user_id"]).astype(np.int64)
        if not len(codes):
            cols = {
                "event_type": pa.nulls(0, pa.string()),
                "user_id": pa.nulls(0, pa.int64()),
            }
            if with_prt:
                cols["prt"] = pa.nulls(0, pa.int64())
            return pa.table(cols)
        order = np.lexsort((codes, uid))
        u_s, c_s = uid[order], codes[order]
        keep = np.concatenate(
            ([True], (u_s[1:] != u_s[:-1]) | (c_s[1:] != c_s[:-1]))
        )
        sel = order[keep]
        cols = {
            "event_type": et.take(pa.array(sel)).cast(pa.string()),
            "user_id": pa.array(uid[sel], pa.int64()),
        }
        if with_prt:
            cols["prt"] = pa.array(hash_prt(uid[sel], buckets), pa.int64())
        return pa.table(cols)

    def count_partition(t: pa.Table) -> pa.Table:
        d = pair_dedupe(t, with_prt=False)
        et = d["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(codes, minlength=len(et.dictionary)).astype(np.int64)
        seen = np.flatnonzero(cnt)
        return pa.table(
            {
                "event_type": et.dictionary.take(pa.array(seen)).cast(pa.string()),
                "part_users": pa.array(cnt[seen], pa.int64()),
            }
        )

    parts = (
        ev.map_batches(
            lambda t: pair_dedupe(t, with_prt=True),
            batch_format="pyarrow",
            batch_size=1_048_576,
        )
        .groupby("prt")
        .map_groups(
            lambda g: count_partition(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )

    def final(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        return pa.table(
            {
                "event_type": g["event_type"][:1].cast(pa.string()),
                "distinct_users": pa.array(
                    [int(_np(g["part_users"]).sum())], pa.int64()
                ),
            }
        )

    return parts.groupby("event_type").map_groups(final, batch_format="pyarrow")


TYPE_USER_DISTINCT_SQL = """
SELECT event_type, count(DISTINCT user_id)::BIGINT AS distinct_users
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Pivot: per-user value sums spread over the event-type domain
# ---------------------------------------------------------------------------

_TYPES = ("click", "error", "purchase", "signup", "view")


def events_type_pivot(sf_dir: str, buckets: int | None = None):
    """Per-user event-value sums PIVOTED into one column per event type
    (plus the total event count) -- the wide-format feature-table shape a
    model-training join consumes.

    Scale shape: per-batch (user, type) micro-unit sum combiner, ONE keyed
    exchange on user, then a vectorized scatter per partition builds the
    (users x types) matrix -- the type domain is fixed and small, so the
    pivot is a dense gather, not a dynamic-schema explosion.  Types absent
    for a user emit 0.0 (the oracle's COALESCE).
    """
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["user_id", "event_type", "value"])
    type_rank = {t: i for i, t in enumerate(_TYPES)}
    ntypes = len(_TYPES)

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uid = _np(t["user_id"]).astype(np.int64)
        val_u = np.rint(_np(t["value"]) * MICRO).astype(np.int64)
        if not len(codes):
            return pa.table(
                {"user_id": pa.nulls(0, pa.int64()),
                 "tcode": pa.nulls(0, pa.int64()),
                 "sum_u": pa.nulls(0, pa.int64()),
                 "n": pa.nulls(0, pa.int64()),
                 "prt": pa.nulls(0, pa.int64())}
            )
        # map dictionary codes -> fixed domain ranks (fails loudly on an
        # unexpected type rather than silently mis-binning)
        dom = np.array(
            [type_rank[s] for s in et.dictionary.to_pylist()], dtype=np.int64
        )
        tcode = dom[codes]
        key = uid * ntypes + tcode
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        sums = np.add.reduceat(val_u[order], starts)
        n = np.diff(np.append(starts, len(ks)))
        uk = ks[starts]
        return pa.table(
            {
                "user_id": pa.array(uk // ntypes, pa.int64()),
                "tcode": pa.array(uk % ntypes, pa.int64()),
                "sum_u": pa.array(sums, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
                "prt": pa.array(hash_prt(uk // ntypes, buckets), pa.int64()),
            }
        )

    out_schema = pa.schema(
        [("user_id", pa.int64())]
        + [(f"{t}_sum", pa.float64()) for t in _TYPES]
        + [("n_events", pa.int64())]
    )

    def pivot_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        uid = _np(t["user_id"])
        tcode = _np(t["tcode"])
        sums = _np(t["sum_u"])
        n = _np(t["n"])
        uu, uidx = np.unique(uid, return_inverse=True)
        mat = np.zeros((len(uu), ntypes), dtype=np.int64)
        np.add.at(mat, (uidx, tcode), sums)
        cnt = np.zeros(len(uu), dtype=np.int64)
        np.add.at(cnt, uidx, n)
        cols = {"user_id": pa.array(uu, pa.int64())}
        for i, ty in enumerate(_TYPES):
            cols[f"{ty}_sum"] = pa.array(mat[:, i] / MICRO, pa.float64())
        cols["n_events"] = pa.array(cnt, pa.int64())
        return pa.table(cols, schema=out_schema)

    return (
        ev.map_batches(partial, batch_format="pyarrow", batch_size=1_048_576)
        .groupby("prt")
        .map_groups(
            lambda g: pivot_partition(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


EVENTS_TYPE_PIVOT_SQL = """
SELECT user_id::BIGINT AS user_id,
       COALESCE(SUM(CASE WHEN event_type = 'click'
         THEN CAST(round(value * 1000000, 0) AS BIGINT) END), 0) / 1000000.0 AS click_sum,
       COALESCE(SUM(CASE WHEN event_type = 'error'
         THEN CAST(round(value * 1000000, 0) AS BIGINT) END), 0) / 1000000.0 AS error_sum,
       COALESCE(SUM(CASE WHEN event_type = 'purchase'
         THEN CAST(round(value * 1000000, 0) AS BIGINT) END), 0) / 1000000.0 AS purchase_sum,
       COALESCE(SUM(CASE WHEN event_type = 'signup'
         THEN CAST(round(value * 1000000, 0) AS BIGINT) END), 0) / 1000000.0 AS signup_sum,
       COALESCE(SUM(CASE WHEN event_type = 'view'
         THEN CAST(round(value * 1000000, 0) AS BIGINT) END), 0) / 1000000.0 AS view_sum,
       count(*)::BIGINT AS n_events
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Grouped mode: most common language per document source
# ---------------------------------------------------------------------------

def source_top_lang(sf_dir: str, buckets: int | None = None):
    """Most common language per document source with its count (grouped
    MODE / top-1-by-frequency; ties break to the alphabetically first
    language so the result is a deterministic total order).

    Scale shape: per-batch (source, lang) count combiner, exchange hashed by
    source string (stable crc32 of distinct values), vectorized per-partition
    merge + argmax-per-run.  Exchange rows are bounded by sources x langs per
    batch, never documents.
    """
    from .events_pipeline import _source_hash

    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/documents.parquet")
    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["source", "lang"]
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        src = t["source"].combine_chunks().dictionary_encode()
        lng = t["lang"].combine_chunks().dictionary_encode()
        sc = src.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        lc = lng.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(sc):
            return pa.table(
                {"source": pa.nulls(0, pa.string()),
                 "lang": pa.nulls(0, pa.string()),
                 "cnt": pa.nulls(0, pa.int64()),
                 "prt": pa.nulls(0, pa.int64())}
            )
        nl = len(lng.dictionary)
        key = sc * nl + lc
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        cnt = np.diff(np.append(starts, len(ks)))
        uk = ks[starts]
        src_sel = src.dictionary.take(pa.array(uk // nl))
        return pa.table(
            {
                "source": src_sel.cast(pa.string()),
                "lang": lng.dictionary.take(pa.array(uk % nl)).cast(pa.string()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                "prt": pa.array(
                    hash_prt(_source_hash(src_sel), buckets), pa.int64()
                ),
            }
        )

    out_schema = pa.schema(
        [("source", pa.string()), ("top_lang", pa.string()), ("n_docs", pa.int64())]
    )

    def argmax_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        src = t["source"].combine_chunks().dictionary_encode()
        lng = t["lang"].combine_chunks().dictionary_encode()
        sc = src.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        lc = lng.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = _np(t["cnt"])
        nl = len(lng.dictionary)
        # merge partial counts of the same (source, lang)
        key = sc * nl + lc
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        csum = np.add.reduceat(cnt[order], starts)
        uk = ks[starts]
        u_sc, u_lc = uk // nl, uk % nl
        # alphabetical rank of each lang code for the tiebreak
        lang_strs = np.array(lng.dictionary.to_pylist())
        rank_of_code = np.empty(nl, dtype=np.int64)
        rank_of_code[np.argsort(lang_strs, kind="stable")] = np.arange(nl)
        # argmax per source: count desc, lang-rank asc
        sel_order = np.lexsort((rank_of_code[u_lc], -csum, u_sc))
        s_s = u_sc[sel_order]
        first = np.flatnonzero(np.concatenate(([True], s_s[1:] != s_s[:-1])))
        sel = sel_order[first]
        return pa.table(
            {
                "source": src.dictionary.take(pa.array(u_sc[sel])).cast(pa.string()),
                "top_lang": lng.dictionary.take(pa.array(u_lc[sel])).cast(pa.string()),
                "n_docs": pa.array(csum[sel], pa.int64()),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=1_048_576)
        .groupby("prt")
        .map_groups(
            lambda g: argmax_partition(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


SOURCE_TOP_LANG_SQL = """
WITH c AS (
  SELECT source, lang, count(*)::BIGINT AS n_docs
  FROM documents GROUP BY source, lang
)
SELECT source, lang AS top_lang, n_docs
FROM c
QUALIFY row_number() OVER (
  PARTITION BY source ORDER BY n_docs DESC, lang
) = 1
"""


# ---------------------------------------------------------------------------
# Deterministic hash sampling
# ---------------------------------------------------------------------------

def doc_sample_hash(sf_dir: str):
    """Deterministic 1/8 sample of documents by content hash: keep rows
    whose md5 starts below 0x20 -- the reproducible-sampling shape (same
    rows on every run, every cluster size, every partitioning; no RNG
    state to coordinate).

    Scale shape: embarrassingly parallel filter inside map tasks, zero
    exchanges; selectivity is uniform because md5 is.  The per-row md5 cost
    is the same measured trade documented at text_pipeline.LangQuality.
    """
    from .text_pipeline import md5_fingerprint

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "n_chars"],
    )

    def sample(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        keep = np.array(
            [md5_fingerprint(s)[:2] < "20" for s in t["text"].to_pylist()],
            dtype=bool,
        )
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "lang": t["lang"],
                "n_chars": t["n_chars"].cast(pa.int64()),
            }
        )

    return ds.map_batches(sample, batch_format="pyarrow")


DOC_SAMPLE_HASH_SQL = """
SELECT doc_id::BIGINT AS doc_id, lang, n_chars::BIGINT AS n_chars
FROM documents
WHERE substr(md5(text), 1, 2) < '20'
"""


# ---------------------------------------------------------------------------
# Funnel conversion: first signup -> first subsequent purchase per user
# ---------------------------------------------------------------------------

def user_conversion(sf_dir: str, buckets: int | None = None):
    """Per-user funnel: first signup timestamp, first purchase STRICTLY
    after it, and the conversion latency in microseconds (NULL when the
    user never converted; users who never signed up are excluded) -- the
    event-sequence/funnel shape.

    Scale shape: only the two funnel event types survive the map-side
    filter, signup rows collapse to per-user min partials per batch, and
    ONE keyed exchange co-locates each user's signup partials with their
    purchase rows; the per-partition pass is two vectorized segment
    reductions (min signup, then min purchase gated by it).  Exchange bytes
    are bounded by funnel-event rows, never the full stream.
    """
    import pyarrow.compute as pc

    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["user_id", "ts", "event_type"])

    def fun_partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        et = t["event_type"].combine_chunks()
        is_s = pc.equal(et, "signup").to_numpy(zero_copy_only=False)
        is_p = pc.equal(et, "purchase").to_numpy(zero_copy_only=False)
        uid = _np(t["user_id"]).astype(np.int64)
        ts = _ts_us(t["ts"])
        # signup rows collapse to one min per user per batch
        su, smin = (uid[is_s], ts[is_s])
        if len(su):
            order = np.argsort(su, kind="stable")
            ks = su[order]
            starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
            su = ks[starts]
            smin = np.minimum.reduceat(smin[order], starts)
        pu, pts = uid[is_p], ts[is_p]
        u = np.concatenate([su, pu])
        tt = np.concatenate([smin, pts])
        kind = np.concatenate(
            [np.zeros(len(su), np.int8), np.ones(len(pu), np.int8)]
        )
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "ts_us": pa.array(tt, pa.int64()),
                "kind": pa.array(kind, pa.int8()),
                "prt": pa.array(hash_prt(u, buckets), pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("signup_ts", pa.timestamp("us")),
            ("purchase_ts", pa.timestamp("us")),
            ("convert_us", pa.int64()),
        ]
    )

    def funnel_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        uid = _np(t["user_id"])
        ts = _np(t["ts_us"])
        kind = _np(t["kind"])
        s_mask = kind == 0
        su, sts = uid[s_mask], ts[s_mask]
        if not len(su):
            return pa.Table.from_pylist([], schema=out_schema)
        order = np.argsort(su, kind="stable")
        ks = su[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        users = ks[starts]
        signup = np.minimum.reduceat(sts[order], starts)
        # purchases gated by their user's first signup
        pu, pts = uid[~s_mask], ts[~s_mask]
        pos = np.searchsorted(users, pu)
        hit = (pos < len(users)) & (users[np.minimum(pos, len(users) - 1)] == pu)
        after = np.zeros(len(pu), dtype=bool)
        after[hit] = pts[hit] > signup[pos[hit]]
        pu, pts, pos = pu[after], pts[after], pos[after]
        first_p = np.full(len(users), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first_p, pos, pts)
        converted = first_p != np.iinfo(np.int64).max
        miss = ~converted
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "signup_ts": pa.array(signup.view("datetime64[us]")),
                "purchase_ts": pa.array(
                    first_p.view("datetime64[us]"), mask=miss
                ),
                "convert_us": pa.array(first_p - signup, pa.int64(), mask=miss),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(fun_partial, batch_format="pyarrow", batch_size=1_048_576)
        .groupby("prt")
        .map_groups(
            lambda g: funnel_partition(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


USER_CONVERSION_SQL = """
WITH s AS (
  SELECT user_id, min(ts) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s.signup_ts
  GROUP BY e.user_id
)
SELECT s.user_id::BIGINT AS user_id, s.signup_ts, p.purchase_ts,
       epoch_us(p.purchase_ts) - epoch_us(s.signup_ts) AS convert_us
FROM s LEFT JOIN p USING (user_id)
"""


# ---------------------------------------------------------------------------
# Grouped histogram over fixed-width value bins
# ---------------------------------------------------------------------------

_HIST_WIDTH = 25.0


def value_histogram(sf_dir: str, width: float = _HIST_WIDTH,
                    buckets: int | None = None,
                    combine_batch_rows: int = 1_048_576):
    """Event-count histogram per (event_type, fixed-width value bin) --
    the EDA distribution sketch, exact (``floor(value / width)`` binning,
    mirrored in the oracle with the identical double division).

    Scale shape: per-batch (type, bin) count combiner, one keyed exchange
    hashed on the pair, vectorized per-partition merge -- rows moved are
    bounded by types x occupied bins per batch.
    """
    from .events_pipeline import _source_hash

    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vbin = np.floor(_np(t["value"]) / width).astype(np.int64)
        if not len(codes):
            return pa.table(
                {"event_type": pa.nulls(0, pa.string()),
                 "bin": pa.nulls(0, pa.int64()),
                 "cnt": pa.nulls(0, pa.int64()),
                 "prt": pa.nulls(0, pa.int64())}
            )
        key = codes * (1 << 40) + (vbin - vbin.min())
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        cnt = np.diff(np.append(starts, len(ks)))
        sel = order[starts]
        et_sel = et.take(pa.array(sel)).cast(pa.string())
        # the partition hash MUST be batch-independent: dictionary codes are
        # first-appearance-ordered PER BATCH, so hashing them would split the
        # same (type, bin) group across partitions (duplicate output rows);
        # hash the stable crc32 of the type string instead
        with np.errstate(over="ignore"):
            pair_hash = _source_hash(et_sel) * np.int64(1_000_003) + vbin[sel]
        return pa.table(
            {
                "event_type": et_sel,
                "bin": pa.array(vbin[sel], pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                "prt": pa.array(hash_prt(pair_hash, buckets), pa.int64()),
            }
        )

    out_schema = pa.schema(
        [("event_type", pa.string()), ("bin", pa.int64()),
         ("n_events", pa.int64())]
    )

    def merge_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vbin = _np(t["bin"])
        cnt = _np(t["cnt"])
        key = codes * (1 << 40) + (vbin - vbin.min())
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        csum = np.add.reduceat(cnt[order], starts)
        sel = order[starts]
        return pa.table(
            {
                "event_type": et.take(pa.array(sel)).cast(pa.string()),
                "bin": pa.array(vbin[sel], pa.int64()),
                "n_events": pa.array(csum, pa.int64()),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(
            partial, batch_format="pyarrow", batch_size=combine_batch_rows
        )
        .groupby("prt")
        .map_groups(
            lambda g: merge_partition(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


VALUE_HISTOGRAM_SQL = """
SELECT event_type, floor(value / 25.0)::BIGINT AS bin,
       count(*)::BIGINT AS n_events
FROM events GROUP BY event_type, floor(value / 25.0)
"""


# ---------------------------------------------------------------------------
# Unpivot: the wide per-user feature table back to long form
# ---------------------------------------------------------------------------

def events_type_unpivot(sf_dir: str, buckets: int | None = None):
    """Long-form (user_id, event_type, type_sum) from the pivoted per-user
    table -- the UNPIVOT/melt inverse of ``events_type_pivot``, emitting
    every (user x type) cell including zeros so the pair is lossless.

    Scale shape: rides the pivot (combiner + one exchange), then a
    zero-exchange vectorized tile per batch (5 rows out per user row in).
    """
    wide = events_type_pivot(sf_dir, buckets=buckets)
    ntypes = len(_TYPES)
    type_arr = pa.array(list(_TYPES), pa.string())

    def melt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        n = t.num_rows
        uid = _np(t["user_id"])
        sums = np.stack(
            [_np(t[f"{ty}_sum"]) for ty in _TYPES], axis=1
        ).reshape(-1)
        return pa.table(
            {
                "user_id": pa.array(np.repeat(uid, ntypes), pa.int64()),
                "event_type": type_arr.take(
                    pa.array(np.tile(np.arange(ntypes, dtype=np.int64), n))
                ),
                "type_sum": pa.array(sums, pa.float64()),
            }
        )

    return wide.map_batches(melt, batch_format="pyarrow")


EVENTS_TYPE_UNPIVOT_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
ty AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type),
s AS (
  SELECT user_id, event_type,
         SUM(CAST(round(value * 1000000, 0) AS BIGINT)) AS sum_u
  FROM events GROUP BY user_id, event_type
)
SELECT u.user_id::BIGINT AS user_id, ty.event_type,
       COALESCE(s.sum_u, 0) / 1000000.0 AS type_sum
FROM u CROSS JOIN ty
LEFT JOIN s ON s.user_id = u.user_id AND s.event_type = ty.event_type
"""


# ---------------------------------------------------------------------------
# Expanding-window min/max per user (breakout detection scan)
# ---------------------------------------------------------------------------

def user_breakout_minmax(sf_dir: str, buckets: int | None = None):
    """Each event with the running min/max of the SAME user's STRICTLY
    PRECEDING values (``MIN/MAX(...) OVER (... ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)``) -- the breakout/new-high detection scan;
    the first event per user gets NULLs (empty frame).

    Scale shape: ONE keyed exchange (hash by user); the per-partition pass
    is a lexsort + per-group shift + cumulative min/max.  The grouped
    cummax/cummin runs through pandas' C kernels (one call per PARTITION,
    never per group); min/max are exact comparisons, so no float bridge.
    """
    import pandas as pd

    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def add_prt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        uid = _np(t["user_id"]).astype(np.int64)
        return t.append_column("prt", pa.array(hash_prt(uid, buckets), pa.int64()))

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("value", pa.float64()),
            ("run_min", pa.float64()),
            ("run_max", pa.float64()),
        ]
    )

    def scan_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        uid = _np(t["user_id"]).astype(np.int64)
        ts = _ts_us(t["ts"])
        eid = _np(t["event_id"]).astype(np.int64)
        v = _np(t["value"])
        order = np.lexsort((eid, ts, uid))
        u_s, v_s = uid[order], v[order]
        g = pd.Series(v_s).groupby(u_s, sort=False)
        prev = g.shift(1)
        pg = prev.groupby(u_s, sort=False)
        run_min = pg.cummin().to_numpy()
        run_max = pg.cummax().to_numpy()
        first = np.concatenate(([True], u_s[1:] != u_s[:-1]))
        return pa.table(
            {
                "user_id": pa.array(u_s, pa.int64()),
                "event_id": pa.array(eid[order], pa.int64()),
                "ts": pa.array(ts[order].view("datetime64[us]")),
                "value": pa.array(v_s, pa.float64()),
                "run_min": pa.array(run_min, pa.float64(), mask=first),
                "run_max": pa.array(run_max, pa.float64(), mask=first),
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


USER_BREAKOUT_MINMAX_SQL = """
SELECT user_id::BIGINT AS user_id, event_id::BIGINT AS event_id, ts,
       value::DOUBLE AS value,
       MIN(value) OVER w AS run_min,
       MAX(value) OVER w AS run_max
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
"""


# ---------------------------------------------------------------------------
# EWMA over hourly means per type (sequential IIR recurrence)
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.3


def ewma_hourly(sf_dir: str, alpha: float = _EWMA_ALPHA):
    """Exponentially-weighted moving average of the hourly mean value per
    event type: ``s_t = alpha * x_t + (1 - alpha) * s_{t-1}`` seeded with
    the first bucket's mean -- the classic time-series smoothing recurrence
    (same IIR family as the PCEN scan, functions/pcen.py).

    Scale shape: raw events collapse to (type, bucket) int64-micro partial
    sums inside map tasks; the exchange carries one row per partial; the
    per-type sequential recurrence runs over HOURLY BUCKETS (domain-bounded:
    years of history is ~10^4 steps, independent of event count).  The
    recurrence preserves the oracle's exact float op order, so equality is
    bitwise with no rounding bridge; the oracle is a recursive CTE.
    """
    ev = _read_events(sf_dir, ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (_ts_us(t["ts"]) // 1_000_000) // 3600
        val_u = np.rint(_np(t["value"]) * MICRO).astype(np.int64)
        if not len(codes):
            return pa.table(
                {"event_type": pa.nulls(0, pa.string()),
                 "bucket": pa.nulls(0, pa.int64()),
                 "sum_u": pa.nulls(0, pa.int64()),
                 "n": pa.nulls(0, pa.int64())}
            )
        key = codes * (1 << 44) + bucket
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        sums = np.add.reduceat(val_u[order], starts)
        n = np.diff(np.append(starts, len(ks)))
        sel = order[starts]
        return pa.table(
            {
                "event_type": et.take(pa.array(sel)).cast(pa.string()),
                "bucket": pa.array(bucket[sel], pa.int64()),
                "sum_u": pa.array(sums, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    parts = ev.map_batches(
        partial, batch_format="pyarrow", batch_size=1_048_576
    )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("bucket", pa.int64()),
            ("hourly_mean", pa.float64()),
            ("ewma", pa.float64()),
        ]
    )

    def ewma_scan(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        b = _np(g["bucket"])
        su = _np(g["sum_u"])
        n = _np(g["n"])
        order = np.argsort(b, kind="stable")
        bs = b[order]
        starts = np.flatnonzero(np.concatenate(([True], bs[1:] != bs[:-1])))
        ub = bs[starts]
        usum = np.add.reduceat(su[order], starts)
        un = np.add.reduceat(n[order], starts)
        # mirror the oracle's op order exactly: (BIGINT / 1000000.0) / n
        x = (usum / 1_000_000.0) / un
        # the decay factor must be the same DOUBLE the oracle's literal
        # parses to: `1.0 - 0.3` lands exactly on a rounding tie and can
        # differ from the literal 0.7 by one ulp, so mirror the literal
        beta = 0.7 if alpha == _EWMA_ALPHA else 1.0 - alpha
        s = np.empty_like(x)
        if len(x):
            s[0] = x[0]
            for i in range(1, len(x)):  # sequential by definition; the
                # series length is hourly buckets, not events
                s[i] = alpha * x[i] + beta * s[i - 1]
        return pa.table(
            {
                "event_type": pa.array(
                    [g["event_type"][0].as_py()] * len(ub), pa.string()
                ),
                "bucket": pa.array(ub, pa.int64()),
                "hourly_mean": pa.array(x, pa.float64()),
                "ewma": pa.array(s, pa.float64()),
            },
            schema=out_schema,
        )

    return parts.groupby("event_type").map_groups(ewma_scan, batch_format="pyarrow")


EWMA_HOURLY_SQL = """
WITH RECURSIVE agg AS (
  SELECT event_type, (epoch_us(ts) // 1000000) // 3600 AS bucket,
         SUM(CAST(round(value * 1000000, 0) AS BIGINT)) AS sum_u,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT event_type, bucket, (sum_u / 1000000.0) / n AS x,
         row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS rn
  FROM agg
),
rec AS (
  SELECT event_type, bucket, x, rn, x AS ewma FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.event_type, s.bucket, s.x, s.rn,
         0.3 * s.x + 0.7 * r.ewma
  FROM seq s JOIN rec r ON s.event_type = r.event_type AND s.rn = r.rn + 1
)
SELECT event_type, bucket, x AS hourly_mean, ewma FROM rec
"""


# ---------------------------------------------------------------------------
# Grouped linear regression: per-user value trend over time
# ---------------------------------------------------------------------------

_EPOCH_1990_US = np.datetime64("1990-01-01T00:00:00.000000").astype(np.int64)
_DAY_US = 86_400 * 1_000_000


def user_value_trend(sf_dir: str, buckets: int | None = None):
    """Per-user least-squares trend of event value over time: slope
    (value/day), intercept, and point count -- the grouped-regression shape
    (SQL ``regr_slope``/``regr_intercept``, computed here from EXACT integer
    sufficient statistics so distributed summation order cannot perturb a
    bit).

    Scale shape: the per-batch combiner collapses raw events to per-user
    moment partials (n, Sx, Sy, Sxx, Sxy -- five int64s per user), ONE
    keyed exchange merges them, and the final math is pure float64 on the
    exact sums, mirrored operand-for-operand in the oracle.  Integer
    bounds: x = days since 1990 (< 2^15), y = centi-units; Sxx and Sxy
    stay in int64 up to ~10^8 rows per user at |value| <= 10^4.
    """
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["user_id", "ts", "value"])

    part_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n", pa.int64()),
            ("sx", pa.int64()),
            ("sy", pa.int64()),
            ("sxx", pa.int64()),
            ("sxy", pa.int64()),
            ("prt", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        uid = _np(t["user_id"]).astype(np.int64)
        x = (_ts_us(t["ts"]) - _EPOCH_1990_US) // _DAY_US
        # HALF-AWAY (SQL round()): 3-decimal values land exactly on .5
        # centi-ties where np.rint's half-even diverges
        yv = _np(t["value"]) * 100.0
        y = np.where(
            yv >= 0, np.floor(yv + 0.5), np.ceil(yv - 0.5)
        ).astype(np.int64)
        keys, n, sx, sy, sxx, sxy = (
            _sum_runs(uid, np.ones(len(uid), np.int64), x, y, x * x, x * y)
        )
        return pa.table(
            {
                "user_id": pa.array(keys, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "sx": pa.array(sx, pa.int64()),
                "sy": pa.array(sy, pa.int64()),
                "sxx": pa.array(sxx, pa.int64()),
                "sxy": pa.array(sxy, pa.int64()),
                "prt": pa.array(hash_prt(keys, buckets), pa.int64()),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n", pa.int64()),
            ("slope_per_day", pa.float64()),
            ("intercept", pa.float64()),
        ]
    )

    def merge(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        keys, n, sx, sy, sxx, sxy = _sum_runs(
            _np(t["user_id"]), _np(t["n"]), _np(t["sx"]), _np(t["sy"]),
            _np(t["sxx"]), _np(t["sxy"]),
        )
        # float64 on exact integer sums, operand order mirrored in the SQL
        nf, sxf, syf = (
            n.astype(np.float64), sx.astype(np.float64), sy.astype(np.float64)
        )
        sxxf, sxyf = sxx.astype(np.float64), sxy.astype(np.float64)
        denom = nf * sxxf - sxf * sxf
        with np.errstate(divide="ignore", invalid="ignore"):
            slope_c = (nf * sxyf - sxf * syf) / denom
            slope = slope_c / 100.0
            intercept = (syf - slope_c * sxf) / nf / 100.0
        bad = denom == 0.0
        return pa.table(
            {
                "user_id": pa.array(keys, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "slope_per_day": pa.array(
                    np.where(bad, np.nan, slope), pa.float64(), mask=bad
                ),
                "intercept": pa.array(
                    np.where(bad, np.nan, intercept), pa.float64(), mask=bad
                ),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow", batch_size=1_048_576)
        .groupby("prt")
        .map_groups(
            lambda g: merge(g.drop_columns(["prt"])), batch_format="pyarrow"
        )
    )


USER_VALUE_TREND_SQL = """
WITH m AS (
  SELECT user_id,
         count(*)::BIGINT AS n,
         CAST(SUM((epoch_us(ts) - epoch_us(TIMESTAMP '1990-01-01'))
                  // 86400000000) AS DOUBLE) AS sx,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) AS sy,
         CAST(SUM(((epoch_us(ts) - epoch_us(TIMESTAMP '1990-01-01'))
                   // 86400000000)
                  * ((epoch_us(ts) - epoch_us(TIMESTAMP '1990-01-01'))
                     // 86400000000)) AS DOUBLE) AS sxx,
         CAST(SUM(((epoch_us(ts) - epoch_us(TIMESTAMP '1990-01-01'))
                   // 86400000000)
                  * CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) AS sxy
  FROM events GROUP BY user_id
)
SELECT user_id::BIGINT AS user_id, n,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE ((n * sxy - sx * sy) / (n * sxx - sx * sx)) / 100.0
       END AS slope_per_day,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                 / n / 100.0
       END AS intercept
FROM m
"""


# ---------------------------------------------------------------------------
# HyperLogLog: approximate distinct (user, day) pairs with an EXACT oracle
# ---------------------------------------------------------------------------

_HLL_P = 12
_EPOCH_DAY_US = 86_400 * 1_000_000


def approx_distinct_user_days(sf_dir: str, p: int = _HLL_P, buckets: int = 32):
    """Approximate count of distinct (user_id, day) pairs over the events
    stream via a distributed HyperLogLog (stages/sketch.py): per-batch
    vectorized register partials (<= 2^p rows each), one tiny keyed merge,
    and a deterministic estimate that the SQL oracle reproduces BIT-FOR-BIT
    (same splitmix64 hash, exact integer bit-length rho, exact HUGEINT
    indicator sum, identical float64 op order).

    Scale shape: the sketch is the 100 TB path for COUNT(DISTINCT) -- raw
    rows never shuffle; each map task ships at most 2^p register rows no
    matter how many billions of rows it scanned, and register MAX-merge is
    associative/commutative/idempotent, so block layout and retries cannot
    change a bit."""
    from ..stages.sketch import hll_estimate, merge_registers, partial_table

    ev = _read_events(sf_dir, ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        uid = _np(t["user_id"]).astype(np.int64)
        day = _ts_us(t["ts"]) // _EPOCH_DAY_US
        keys = uid * 100_000 + day
        return partial_table(keys, p=p, prt_mod=buckets)

    reg_schema = pa.schema([("bucket", pa.int64()), ("rho", pa.int64())])

    def merge(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=reg_schema)
        b, r = merge_registers(_np(t["bucket"]), _np(t["rho"]))
        return pa.table(
            {"bucket": pa.array(b, pa.int64()), "rho": pa.array(r, pa.int64())},
            schema=reg_schema,
        )

    out_schema = pa.schema([("approx_distinct", pa.float64())])

    def estimate(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        b, r = merge_registers(_np(g["bucket"]), _np(g["rho"]))
        return pa.table(
            {"approx_distinct": pa.array([hll_estimate(b, r, p=p)],
                                         pa.float64())},
            schema=out_schema,
        )

    regs = (
        ev.map_batches(partial, batch_format="pyarrow", batch_size=1_048_576)
        .groupby("prt")
        .map_groups(
            lambda g: merge(g.drop_columns(["prt"])), batch_format="pyarrow"
        )
    )
    return (
        regs.map_batches(
            lambda t: t.append_column(
                "k", pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
            ),
            batch_format="pyarrow",
        )
        .groupby("k")
        .map_groups(
            lambda g: estimate(g.drop_columns(["k"])), batch_format="pyarrow"
        )
    )


# Exact SQL mirror of the sketch: splitmix64 finalizer via HUGEINT mod-2^64
# multiplies, rho from the exact bit length (length(bin(w))), indicator sum
# as HUGEINT, final float64 math in the engine's literal operand order.
APPROX_DISTINCT_SQL = """
WITH keys AS (
  SELECT (user_id * 100000 + epoch_us(ts) // 86400000000)::UBIGINT AS k
  FROM events
),
-- 64x64-bit multiply mod 2^64 without INT128 overflow: split the constant
-- C = hi*2^32 + lo, so a*C mod 2^64 = (a*lo mod 2^64 + (a*hi mod 2^32)
-- * 2^32) mod 2^64 (each product < 2^96 fits HUGEINT).
-- 0xBF58476D1CE4E5B9 = 3210233709 * 2^32 + 484763065
-- 0x94D049BB133111EB = 2496678331 * 2^32 + 321982955
m1 AS (
  SELECT CAST(((CAST(xor(k, k >> 30) AS HUGEINT) * 484763065)
               % 18446744073709551616
               + ((CAST(xor(k, k >> 30) AS HUGEINT) * 3210233709)
                  % 4294967296) * 4294967296)
              % 18446744073709551616 AS UBIGINT) AS h FROM keys
),
m2 AS (
  SELECT CAST(((CAST(xor(h, h >> 27) AS HUGEINT) * 321982955)
               % 18446744073709551616
               + ((CAST(xor(h, h >> 27) AS HUGEINT) * 2496678331)
                  % 4294967296) * 4294967296)
              % 18446744073709551616 AS UBIGINT) AS h FROM m1
),
hashed AS (SELECT xor(h, h >> 31) AS h FROM m2),
rw AS (
  SELECT h >> 52 AS bucket,
         CAST((CAST(h AS HUGEINT) * 4096) % 18446744073709551616
              AS UBIGINT) AS w
  FROM hashed
),
reg AS (
  SELECT bucket,
         max(CASE WHEN w = 0 THEN 53
                  ELSE 64 - length(bin(w)) + 1 END)::BIGINT AS rho
  FROM rw GROUP BY bucket
),
s AS (
  SELECT SUM(CAST(1 AS HUGEINT) << (53 - rho)) AS s_nonzero,
         count(*)::BIGINT AS nonzero
  FROM reg
),
est AS (
  SELECT CAST(s_nonzero + (4096 - nonzero) * (CAST(1 AS HUGEINT) << 53)
              AS DOUBLE) AS s_total,
         (4096 - nonzero)::BIGINT AS v
  FROM s
)
SELECT round(
  CASE WHEN (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
            * 9007199254740992.0 / s_total <= 2.5 * 4096.0 AND v > 0
       THEN 4096.0 * ln(4096.0 / v)
       ELSE (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
            * 9007199254740992.0 / s_total
  END + 1e-9, 6) AS approx_distinct
FROM est
"""


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pre-filter, with exact-oracle false positives
# ---------------------------------------------------------------------------

_BLOOM_M = 16_384
_BLOOM_K = 5
_BLOOM_CUTOFF = np.datetime64("2001-01-01T00:00:00.000000").astype(np.int64)


def bloom_active_purchaser_events(
    sf_dir: str, m_bits: int = _BLOOM_M, k: int = _BLOOM_K
):
    """Count events whose user passes a Bloom filter built from customers
    with a 2001 order -- the semi-join PRE-FILTER a 100 TB join pipeline
    runs before its real exchange (stages/bloom.py).

    Scale shape: the build side collapses to per-batch position partials
    bounded by ``m_bits`` rows each; the union of set positions is bounded
    by ``m_bits`` (16K rows / 128 KB here) REGARDLESS of build cardinality,
    so materializing it on the driver and shipping the packed bitmap into
    probe tasks is safe by construction.  The probe side streams, never
    shuffles.  The count includes the filter's false positives -- which are
    deterministic bit math, so the SQL oracle reproduces them exactly."""
    from ..stages.bloom import pack_bitmap, partial_bits, probe_bitmap
    from ..util import dataset_to_table

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )

    def build_partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        od = _ts_us(t["o_orderdate"])
        ck = _np(t["o_custkey"]).astype(np.int64)[od >= _BLOOM_CUTOFF]
        return pa.table(
            {"p": pa.array(partial_bits(np.unique(ck), m_bits, k), pa.int64())}
        )

    pos_tbl = dataset_to_table(
        orders.map_batches(
            build_partial, batch_format="pyarrow", batch_size=1_048_576
        ),
        schema=pa.schema([("p", pa.int64())]),
    )
    bm = pack_bitmap(
        np.unique(pos_tbl["p"].to_numpy(zero_copy_only=False)), m_bits
    )

    ev = _read_events(sf_dir, ["user_id"])
    part_schema = pa.schema(
        [("bloom_pass", pa.int64()), ("total_events", pa.int64())]
    )

    def probe(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        uid = _np(t["user_id"]).astype(np.int64)
        ok = probe_bitmap(uid, bm, m_bits, k)
        return pa.table(
            {
                "bloom_pass": pa.array([int(ok.sum())], pa.int64()),
                "total_events": pa.array([len(uid)], pa.int64()),
            },
            schema=part_schema,
        )

    def final(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        return pa.table(
            {
                "bloom_pass": pa.array(
                    [int(_np(g["bloom_pass"]).sum())], pa.int64()
                ),
                "total_events": pa.array(
                    [int(_np(g["total_events"]).sum())], pa.int64()
                ),
            },
            schema=part_schema,
        )

    return (
        ev.map_batches(probe, batch_format="pyarrow", batch_size=1_048_576)
        .map_batches(
            lambda t: t.append_column(
                "g", pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
            ),
            batch_format="pyarrow",
        )
        .groupby("g")
        .map_groups(
            lambda g: final(g.drop_columns(["g"])), batch_format="pyarrow"
        )
    )


def _bloom_mulmod_sql(e: str, hi: int, lo: int) -> str:
    return (
        f"CAST(((CAST({e} AS HUGEINT) * {lo}) % 18446744073709551616 + "
        f"((CAST({e} AS HUGEINT) * {hi}) % 4294967296) * 4294967296) "
        f"% 18446744073709551616 AS UBIGINT)"
    )


def _bloom_mix_sql(e: str) -> str:
    """splitmix64 finalizer as one nested SQL expression (same constants as
    stages/sketch.mix64, 64x64 multiplies split into 32-bit halves)."""
    a1 = f"xor({e}, ({e}) >> 30)"
    b1 = _bloom_mulmod_sql(a1, 3210233709, 484763065)
    a2 = f"xor({b1}, ({b1}) >> 27)"
    b2 = _bloom_mulmod_sql(a2, 2496678331, 321982955)
    return f"xor({b2}, ({b2}) >> 31)"


def _bloom_pos_sql() -> str:
    return (
        "CAST(((CAST(h1 AS HUGEINT) + i * CAST(h2 AS HUGEINT)) "
        "% 18446744073709551616) % 16384 AS BIGINT)"
    )


BLOOM_ACTIVE_SQL = f"""
WITH build AS (
  SELECT DISTINCT o_custkey::UBIGINT AS key FROM orders
  WHERE o_orderdate >= TIMESTAMP '2001-01-01'
),
bh AS (
  SELECT {_bloom_mix_sql('key')} AS h1,
         {_bloom_mix_sql('xor(key, 11400714819323198485::UBIGINT)')} AS h2
  FROM build
),
pos AS (
  SELECT DISTINCT {_bloom_pos_sql()} AS p
  FROM bh, generate_series(0, 4) t(i)
),
ph AS (
  SELECT event_id,
         {_bloom_mix_sql('(user_id::UBIGINT)')} AS h1,
         {_bloom_mix_sql('xor(user_id::UBIGINT, 11400714819323198485::UBIGINT)')} AS h2
  FROM events
),
pp AS (
  SELECT event_id, {_bloom_pos_sql()} AS p
  FROM ph, generate_series(0, 4) t(i)
),
hits AS (
  SELECT event_id, count(*) AS nhit
  FROM pp JOIN pos USING (p)
  GROUP BY event_id
)
SELECT (SELECT count(*)::BIGINT FROM hits WHERE nhit = 5) AS bloom_pass,
       (SELECT count(*)::BIGINT FROM events) AS total_events
"""


# ---------------------------------------------------------------------------
# Count-Min sketch: per-user frequency estimates with bounded counters
# ---------------------------------------------------------------------------

_CMS_D, _CMS_W = 4, 1024


def cms_user_event_counts(
    sf_dir: str, d: int = _CMS_D, w: int = _CMS_W, buckets: int | None = None
):
    """Per-user event-count estimates from a Count-Min sketch
    (stages/sketch.py): counters are bounded by ``d x w`` int64s no matter
    how many billions of rows stream past, merge by plain addition
    (order-insensitive), and the min-of-d estimate NEVER underestimates.
    The whole path is deterministic integer math, so the approximate
    answers -- including any collision overestimates -- match the SQL
    oracle exactly.

    Scale shape: pass 1 collapses each batch to at most d*w counter
    increments and materializes the merged d x w table (16 KB here --
    bounded by construction, like the Bloom bitmap); pass 2 computes the
    distinct probe keys through one keyed exchange and estimates inside map
    tasks against the broadcast counter array."""
    from ..stages.sketch import cms_estimate, cms_partial
    from ..util import dataset_to_table

    ev = _read_events(sf_dir, ["user_id"])

    cnt_schema = pa.schema(
        [("row", pa.int64()), ("bucket", pa.int64()), ("cnt", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        uid = _np(t["user_id"]).astype(np.int64)
        rj, bj, cj = cms_partial(uid, d, w)
        return pa.table(
            {
                "row": pa.array(rj, pa.int64()),
                "bucket": pa.array(bj, pa.int64()),
                "cnt": pa.array(cj, pa.int64()),
            },
            schema=cnt_schema,
        )

    tbl = dataset_to_table(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=1_048_576),
        schema=cnt_schema,
    )
    counter = np.zeros((d, w), np.int64)
    np.add.at(
        counter,
        (
            _np(tbl["row"]).astype(np.int64),
            _np(tbl["bucket"]).astype(np.int64),
        ),
        _np(tbl["cnt"]).astype(np.int64),
    )

    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")

    def uniq_partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        u = np.unique(_np(t["user_id"]).astype(np.int64))
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "prt": pa.array(hash_prt(u, buckets), pa.int64()),
            }
        )

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("est_count", pa.int64())]
    )

    def estimate_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        u = np.unique(_np(t["user_id"]).astype(np.int64))
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "est_count": pa.array(cms_estimate(counter, u), pa.int64()),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(
            uniq_partial, batch_format="pyarrow", batch_size=1_048_576
        )
        .groupby("prt")
        .map_groups(
            lambda g: estimate_partition(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


def _cms_pos_sql(key_expr: str) -> str:
    """Bucket id for CMS hash row i: mix64(key + i*golden) % 1024."""
    e = (
        f"CAST((CAST({key_expr} AS HUGEINT) + i * 11400714819323198485) "
        f"% 18446744073709551616 AS UBIGINT)"
    )
    return f"CAST(({_bloom_mix_sql(e)}) % 1024 AS BIGINT)"


CMS_USER_COUNTS_SQL = f"""
WITH counters AS (
  SELECT i, {_cms_pos_sql('user_id::UBIGINT')} AS bucket,
         count(*)::BIGINT AS cnt
  FROM events, generate_series(0, 3) t(i)
  GROUP BY 1, 2
),
probe AS (SELECT DISTINCT user_id FROM events),
pb AS (
  SELECT user_id, i, {_cms_pos_sql('user_id::UBIGINT')} AS bucket
  FROM probe, generate_series(0, 3) t(i)
)
SELECT pb.user_id::BIGINT AS user_id, min(c.cnt)::BIGINT AS est_count
FROM pb JOIN counters c USING (i, bucket)
GROUP BY pb.user_id
"""


# ---------------------------------------------------------------------------
# CUSUM drift detection over hourly means (spike detector's complement)
# ---------------------------------------------------------------------------


def cusum_hourly_drift(sf_dir: str):
    """One-sided CUSUM change detection per event type over hourly mean
    values: ``s_i = max(0, s_{i-1} + (x_i - mu) - 0.5*sigma)``, alert when
    ``s_i > 4*sigma`` -- the classic drift detector (catches slow upward
    shifts the per-bucket z-score misses; complements hourly_anomalies).

    Exactness: x is the oracle-exact hourly mean; mu/sigma come from
    centi-quantized int64 sums (order-insensitive), and the sequential
    recurrence preserves the oracle's float op order exactly (recursive-CTE
    mirror, no rounding bridge).  Scale shape: same as ewma_hourly -- the
    per-type scan runs over hourly buckets (domain-bounded), never raw
    events."""
    ev = _read_events(sf_dir, ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (_ts_us(t["ts"]) // 1_000_000) // 3600
        val_u = np.rint(_np(t["value"]) * MICRO).astype(np.int64)
        if not len(codes):
            return pa.table(
                {"event_type": pa.nulls(0, pa.string()),
                 "bucket": pa.nulls(0, pa.int64()),
                 "sum_u": pa.nulls(0, pa.int64()),
                 "n": pa.nulls(0, pa.int64())}
            )
        key = codes * (1 << 44) + bucket
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        sums = np.add.reduceat(val_u[order], starts)
        n = np.diff(np.append(starts, len(ks)))
        sel = order[starts]
        return pa.table(
            {
                "event_type": et.take(pa.array(sel)).cast(pa.string()),
                "bucket": pa.array(bucket[sel], pa.int64()),
                "sum_u": pa.array(sums, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    parts = ev.map_batches(
        partial, batch_format="pyarrow", batch_size=1_048_576
    )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("bucket", pa.int64()),
            ("hourly_mean", pa.float64()),
            ("cusum", pa.float64()),
        ]
    )

    def cusum_scan(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        b = _np(g["bucket"])
        su = _np(g["sum_u"])
        nn = _np(g["n"])
        order = np.argsort(b, kind="stable")
        bs = b[order]
        starts = np.flatnonzero(np.concatenate(([True], bs[1:] != bs[:-1])))
        ub = bs[starts]
        usum = np.add.reduceat(su[order], starts)
        un = np.add.reduceat(nn[order], starts)
        x = (usum / 1_000_000.0) / un          # oracle-exact hourly mean
        # HALF-AWAY rounding (DuckDB round()), not np.rint's half-even:
        # hourly means of few-decimal values DO land exactly on .5 ties
        v = x * 100.0
        xc = np.where(
            v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)
        ).astype(np.int64)
        n = len(xc)
        if n == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        # per-source mu/sigma from exact integer sums, float math mirrored
        sx = float(int(xc.sum()))
        sxx = float(int((xc * xc).sum()))
        mu = sx / n
        sig = float(np.sqrt((sxx - sx * sx / n) / n))
        s = np.empty(n, np.float64)
        s[0] = max(0.0, (float(xc[0]) - mu) - 0.5 * sig)
        for i in range(1, n):  # sequential by definition; series length is
            # hourly buckets, not events
            s[i] = max(0.0, s[i - 1] + (float(xc[i]) - mu) - 0.5 * sig)
        flag = s > 4.0 * sig
        idx = np.flatnonzero(flag)
        src = g["event_type"][0].as_py()
        return pa.table(
            {
                "event_type": pa.array([src] * len(idx), pa.string()),
                "bucket": pa.array(ub[idx], pa.int64()),
                "hourly_mean": pa.array(x[idx], pa.float64()),
                "cusum": pa.array(s[idx] / 100.0, pa.float64()),
            },
            schema=out_schema,
        )

    return parts.groupby("event_type").map_groups(
        cusum_scan, batch_format="pyarrow"
    )


CUSUM_HOURLY_SQL = """
WITH RECURSIVE agg AS (
  SELECT event_type, (epoch_us(ts) // 1000000) // 3600 AS bucket,
         SUM(CAST(round(value * 1000000, 0) AS BIGINT)) AS sum_u,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
x AS (
  SELECT event_type, bucket,
         (sum_u / 1000000.0) / n AS x,
         CAST(round((sum_u / 1000000.0) / n * 100, 0) AS BIGINT) AS xc,
         row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS rn
  FROM agg
),
st AS (
  SELECT event_type, count(*)::BIGINT AS n,
         CAST(SUM(xc) AS DOUBLE) AS sx,
         CAST(SUM(xc * xc) AS DOUBLE) AS sxx
  FROM x GROUP BY 1
),
params AS (
  SELECT event_type, sx / n AS mu,
         sqrt((sxx - sx * sx / n) / n) AS sig
  FROM st
),
rec AS (
  SELECT x.event_type, x.bucket, x.x, x.rn,
         greatest(0.0, (CAST(x.xc AS DOUBLE) - p.mu) - 0.5 * p.sig) AS s
  FROM x JOIN params p USING (event_type)
  WHERE x.rn = 1
  UNION ALL
  SELECT x.event_type, x.bucket, x.x, x.rn,
         greatest(0.0, r.s + (CAST(x.xc AS DOUBLE) - p.mu) - 0.5 * p.sig)
  FROM x
  JOIN rec r ON x.event_type = r.event_type AND x.rn = r.rn + 1
  JOIN params p ON p.event_type = x.event_type
)
SELECT rec.event_type, rec.bucket, rec.x AS hourly_mean,
       rec.s / 100.0 AS cusum
FROM rec JOIN params p USING (event_type)
WHERE rec.s > 4.0 * p.sig
"""


# ---------------------------------------------------------------------------
# Holt double-exponential smoothing (level + trend) over hourly means
# ---------------------------------------------------------------------------

_HOLT_ALPHA, _HOLT_GAMMA = 0.5, 0.3


def holt_hourly(sf_dir: str):
    """Holt's linear (double-exponential) smoothing per event type over the
    hourly mean series: ``l_i = 0.5*x_i + 0.5*(l_{i-1} + b_{i-1})``,
    ``b_i = 0.3*(l_i - l_{i-1}) + 0.7*b_{i-1}``, one-step forecast
    ``l_i + b_i`` -- the trend-aware big sibling of ewma_hourly, with the
    same bitwise recursive-CTE oracle discipline (identical float op order,
    the decay factors written as the literals the oracle parses, two
    mutually-recursive states carried through the CTE).

    Scale shape: identical to ewma_hourly -- combiner-bounded partials, one
    keyed exchange, a per-type sequential scan over hourly buckets (bounded
    by retention, not event count)."""
    ev = _read_events(sf_dir, ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (_ts_us(t["ts"]) // 1_000_000) // 3600
        val_u = np.rint(_np(t["value"]) * MICRO).astype(np.int64)
        if not len(codes):
            return pa.table(
                {"event_type": pa.nulls(0, pa.string()),
                 "bucket": pa.nulls(0, pa.int64()),
                 "sum_u": pa.nulls(0, pa.int64()),
                 "n": pa.nulls(0, pa.int64())}
            )
        key = codes * (1 << 44) + bucket
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        sel = order[starts]
        return pa.table(
            {
                "event_type": et.take(pa.array(sel)).cast(pa.string()),
                "bucket": pa.array(bucket[sel], pa.int64()),
                "sum_u": pa.array(
                    np.add.reduceat(val_u[order], starts), pa.int64()
                ),
                "n": pa.array(
                    np.diff(np.append(starts, len(ks))).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    parts = ev.map_batches(
        partial, batch_format="pyarrow", batch_size=1_048_576
    )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("bucket", pa.int64()),
            ("hourly_mean", pa.float64()),
            ("level", pa.float64()),
            ("trend", pa.float64()),
            ("forecast", pa.float64()),
        ]
    )

    def holt_scan(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        b = _np(g["bucket"])
        su = _np(g["sum_u"])
        nn = _np(g["n"])
        order = np.argsort(b, kind="stable")
        bs = b[order]
        starts = np.flatnonzero(np.concatenate(([True], bs[1:] != bs[:-1])))
        ub = bs[starts]
        usum = np.add.reduceat(su[order], starts)
        un = np.add.reduceat(nn[order], starts)
        x = (usum / 1_000_000.0) / un
        n = len(x)
        if n == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        lv = np.empty(n, np.float64)
        tr = np.empty(n, np.float64)
        lv[0], tr[0] = x[0], 0.0
        for i in range(1, n):  # sequential recurrence over hourly buckets
            lv[i] = 0.5 * x[i] + 0.5 * (lv[i - 1] + tr[i - 1])
            tr[i] = 0.3 * (lv[i] - lv[i - 1]) + 0.7 * tr[i - 1]
        return pa.table(
            {
                "event_type": pa.array(
                    [g["event_type"][0].as_py()] * n, pa.string()
                ),
                "bucket": pa.array(ub, pa.int64()),
                "hourly_mean": pa.array(x, pa.float64()),
                "level": pa.array(lv, pa.float64()),
                "trend": pa.array(tr, pa.float64()),
                "forecast": pa.array(lv + tr, pa.float64()),
            },
            schema=out_schema,
        )

    return parts.groupby("event_type").map_groups(
        holt_scan, batch_format="pyarrow"
    )


HOLT_HOURLY_SQL = """
WITH RECURSIVE agg AS (
  SELECT event_type, (epoch_us(ts) // 1000000) // 3600 AS bucket,
         SUM(CAST(round(value * 1000000, 0) AS BIGINT)) AS sum_u,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
x AS (
  SELECT event_type, bucket, (sum_u / 1000000.0) / n AS x,
         row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS rn
  FROM agg
),
rec AS (
  SELECT event_type, bucket, x, rn, x AS l, CAST(0.0 AS DOUBLE) AS b
  FROM x WHERE rn = 1
  UNION ALL
  SELECT s.event_type, s.bucket, s.x, s.rn,
         0.5 * s.x + 0.5 * (r.l + r.b) AS l,
         0.3 * ((0.5 * s.x + 0.5 * (r.l + r.b)) - r.l) + 0.7 * r.b AS b
  FROM x s JOIN rec r ON s.event_type = r.event_type AND s.rn = r.rn + 1
)
SELECT event_type, bucket, x AS hourly_mean, l AS level, b AS trend,
       l + b AS forecast
FROM rec
"""


# ---------------------------------------------------------------------------
# Row-level sessionization: session id per event
# ---------------------------------------------------------------------------

_SESSION_GAP_S = 1800


def user_session_ids(sf_dir: str, gap_s: int = _SESSION_GAP_S,
                     buckets: int | None = None):
    """Assign each event its user's session id (0-based): a new session
    starts after a silence gap > ``gap_s`` -- the row-level output of the
    sessionization scan (events_pipeline.user_sessions returns only the
    per-user counts; downstream feature pipelines need the assignment
    itself).

    Scale shape: ONE keyed exchange (hash by user), then one vectorized
    segmented pass per partition -- gap markers via diff, session ids via
    segmented cumsum; no per-user Python call."""
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["event_id", "user_id", "ts"])

    def add_prt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        uid = _np(t["user_id"]).astype(np.int64)
        return t.append_column(
            "prt", pa.array(hash_prt(uid, buckets), pa.int64())
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("session_id", pa.int64()),
        ]
    )

    def scan(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        uid = _np(t["user_id"]).astype(np.int64)
        ts = _ts_us(t["ts"])
        eid = _np(t["event_id"]).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        u_s, t_s = uid[order], ts[order]
        new_user = np.concatenate(([True], u_s[1:] != u_s[:-1]))
        gap = np.concatenate(
            ([0], ((~new_user[1:]) & (np.diff(t_s) > gap_s * 1_000_000))
             .astype(np.int64))
        )
        cum = np.cumsum(gap)
        starts = np.flatnonzero(new_user)
        base = cum[starts]
        seg_len = np.diff(np.append(starts, len(u_s)))
        session = cum - np.repeat(base, seg_len)
        return pa.table(
            {
                "user_id": pa.array(u_s, pa.int64()),
                "event_id": pa.array(eid[order], pa.int64()),
                "ts": pa.array(t_s.view("datetime64[us]")),
                "session_id": pa.array(session, pa.int64()),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(add_prt, batch_format="pyarrow")
        .groupby("prt")
        .map_groups(
            lambda g: scan(g.drop_columns(["prt"])), batch_format="pyarrow"
        )
    )


USER_SESSION_IDS_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id::BIGINT AS user_id, event_id::BIGINT AS event_id, ts,
       SUM(gap) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       )::BIGINT AS session_id
FROM g
"""


# ---------------------------------------------------------------------------
# Seasonal decomposition: hour-of-day profile + residual per bucket
# ---------------------------------------------------------------------------


def _half_away_c(x: np.ndarray) -> np.ndarray:
    """Centi-quantize with SQL round() semantics (half AWAY from zero --
    hourly means DO land exactly on .5 ties where np.rint diverges)."""
    v = x * 100.0
    return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype(
        np.int64
    )


def seasonal_residuals_hourly(sf_dir: str):
    """Additive seasonal decomposition of the hourly mean series per event
    type: each bucket's mean minus its hour-of-day (0..23) profile mean --
    the de-seasonalized residual an anomaly detector would run on when the
    signal has a daily cycle.

    Exactness: means are the oracle-exact hourly x; the profile rides
    centi-quantized int64 sums per (source, hour-of-day); the residual
    float math mirrors the SQL operand-for-operand.  Scale shape: same
    per-type scan as the EWMA/Holt family -- the 24-bin profile and the
    residuals are computed inside ONE group pass over rollup rows."""
    ev = _read_events(sf_dir, ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (_ts_us(t["ts"]) // 1_000_000) // 3600
        val_u = np.rint(_np(t["value"]) * MICRO).astype(np.int64)
        if not len(codes):
            return pa.table(
                {"event_type": pa.nulls(0, pa.string()),
                 "bucket": pa.nulls(0, pa.int64()),
                 "sum_u": pa.nulls(0, pa.int64()),
                 "n": pa.nulls(0, pa.int64())}
            )
        key = codes * (1 << 44) + bucket
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        sel = order[starts]
        return pa.table(
            {
                "event_type": et.take(pa.array(sel)).cast(pa.string()),
                "bucket": pa.array(bucket[sel], pa.int64()),
                "sum_u": pa.array(
                    np.add.reduceat(val_u[order], starts), pa.int64()
                ),
                "n": pa.array(
                    np.diff(np.append(starts, len(ks))).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    parts = ev.map_batches(
        partial, batch_format="pyarrow", batch_size=1_048_576
    )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("bucket", pa.int64()),
            ("hod", pa.int64()),
            ("hourly_mean", pa.float64()),
            ("seasonal_mean", pa.float64()),
            ("residual", pa.float64()),
        ]
    )

    def scan(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        b = _np(g["bucket"])
        su = _np(g["sum_u"])
        nn = _np(g["n"])
        order = np.argsort(b, kind="stable")
        bs = b[order]
        starts = np.flatnonzero(np.concatenate(([True], bs[1:] != bs[:-1])))
        ub = bs[starts]
        usum = np.add.reduceat(su[order], starts)
        un = np.add.reduceat(nn[order], starts)
        x = (usum / 1_000_000.0) / un
        if not len(x):
            return pa.Table.from_pylist([], schema=out_schema)
        xc = _half_away_c(x)
        hod = ub % 24
        # exact integer per-hod sums (bincount's float weights would round)
        sums = np.zeros(24, np.int64)
        np.add.at(sums, hod, xc)
        cnt = np.bincount(hod, minlength=24).astype(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            # hods absent from this source never appear in hod[] below
            prof = sums.astype(np.float64) / cnt.astype(np.float64)
        seasonal = prof[hod]
        return pa.table(
            {
                "event_type": pa.array(
                    [g["event_type"][0].as_py()] * len(ub), pa.string()
                ),
                "bucket": pa.array(ub, pa.int64()),
                "hod": pa.array(hod, pa.int64()),
                "hourly_mean": pa.array(x, pa.float64()),
                "seasonal_mean": pa.array(seasonal / 100.0, pa.float64()),
                "residual": pa.array(
                    (xc.astype(np.float64) - seasonal) / 100.0, pa.float64()
                ),
            },
            schema=out_schema,
        )

    return parts.groupby("event_type").map_groups(scan, batch_format="pyarrow")


SEASONAL_RESIDUALS_SQL = """
WITH agg AS (
  SELECT event_type, (epoch_us(ts) // 1000000) // 3600 AS bucket,
         SUM(CAST(round(value * 1000000, 0) AS BIGINT)) AS sum_u,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
x AS (
  SELECT event_type, bucket, (sum_u / 1000000.0) / n AS x,
         CAST(round((sum_u / 1000000.0) / n * 100, 0) AS BIGINT) AS xc,
         bucket % 24 AS hod
  FROM agg
),
p AS (
  SELECT event_type, hod, CAST(SUM(xc) AS DOUBLE) AS sxc,
         count(*)::BIGINT AS c
  FROM x GROUP BY 1, 2
)
SELECT x.event_type, x.bucket, x.hod, x.x AS hourly_mean,
       p.sxc / p.c / 100.0 AS seasonal_mean,
       (CAST(x.xc AS DOUBLE) - p.sxc / p.c) / 100.0 AS residual
FROM x JOIN p USING (event_type, hod)
"""


# ---------------------------------------------------------------------------
# Autocorrelation function: ACF at lags 1..24 per event type
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 24


def acf_hourly(sf_dir: str, max_lag: int = _ACF_MAX_LAG):
    """Pearson autocorrelation of the hourly mean series at lags 1..24 per
    event type, pairing only buckets where both endpoints exist (gaps pair
    nothing; the SQL mirror is a self-join on ``bucket = bucket - lag``) --
    the diagnostic that finds the daily cycle seasonal_residuals_hourly
    removes.

    Exactness: centi-quantized int64 moment sums per (source, lag); the
    correlation float math runs on exact integers, mirrored
    operand-for-operand; degenerate lags (zero variance at either endpoint)
    yield NULL.  Scale shape: per-type scan over rollup rows; each lag's
    pairing is one vectorized searchsorted against the sorted bucket
    array."""
    ev = _read_events(sf_dir, ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (_ts_us(t["ts"]) // 1_000_000) // 3600
        val_u = np.rint(_np(t["value"]) * MICRO).astype(np.int64)
        if not len(codes):
            return pa.table(
                {"event_type": pa.nulls(0, pa.string()),
                 "bucket": pa.nulls(0, pa.int64()),
                 "sum_u": pa.nulls(0, pa.int64()),
                 "n": pa.nulls(0, pa.int64())}
            )
        key = codes * (1 << 44) + bucket
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        sel = order[starts]
        return pa.table(
            {
                "event_type": et.take(pa.array(sel)).cast(pa.string()),
                "bucket": pa.array(bucket[sel], pa.int64()),
                "sum_u": pa.array(
                    np.add.reduceat(val_u[order], starts), pa.int64()
                ),
                "n": pa.array(
                    np.diff(np.append(starts, len(ks))).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    parts = ev.map_batches(
        partial, batch_format="pyarrow", batch_size=1_048_576
    )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("lag", pa.int64()),
            ("n_pairs", pa.int64()),
            ("acf", pa.float64()),
        ]
    )

    def scan(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        b = _np(g["bucket"])
        su = _np(g["sum_u"])
        nn = _np(g["n"])
        order = np.argsort(b, kind="stable")
        ub = b[order]
        starts = np.flatnonzero(np.concatenate(([True], ub[1:] != ub[:-1])))
        ub = ub[starts]
        usum = np.add.reduceat(su[order], starts)
        un = np.add.reduceat(nn[order], starts)
        x = (usum / 1_000_000.0) / un
        xc = _half_away_c(x)
        src = g["event_type"][0].as_py()
        lags, npairs, acfs, mask = [], [], [], []
        for lag in range(1, max_lag + 1):
            want = ub - lag
            pos = np.searchsorted(ub, want)
            hit = (pos < len(ub)) & (ub[np.minimum(pos, len(ub) - 1)] == want)
            xa = xc[hit]                # current bucket
            xb = xc[pos[hit]]           # bucket - lag
            n = len(xa)
            if n == 0:
                continue  # the oracle's inner join emits no zero-pair lag
            lags.append(lag)
            npairs.append(n)
            nf = float(n)
            sx = float(int(xa.sum()))
            sy = float(int(xb.sum()))
            sxx = float(int((xa * xa).sum()))
            syy = float(int((xb * xb).sum()))
            sxy = float(int((xa * xb).sum()))
            va = nf * sxx - sx * sx
            vb = nf * syy - sy * sy
            if va > 0 and vb > 0:
                acfs.append(
                    (nf * sxy - sx * sy) / (np.sqrt(va) * np.sqrt(vb))
                )
                mask.append(False)
            else:
                acfs.append(np.nan)
                mask.append(True)
        return pa.table(
            {
                "event_type": pa.array([src] * len(lags), pa.string()),
                "lag": pa.array(lags, pa.int64()),
                "n_pairs": pa.array(npairs, pa.int64()),
                "acf": pa.array(
                    np.array(acfs, np.float64), pa.float64(),
                    mask=np.array(mask, bool),
                ),
            },
            schema=out_schema,
        )

    return parts.groupby("event_type").map_groups(scan, batch_format="pyarrow")


ACF_HOURLY_SQL = """
WITH agg AS (
  SELECT event_type, (epoch_us(ts) // 1000000) // 3600 AS bucket,
         SUM(CAST(round(value * 1000000, 0) AS BIGINT)) AS sum_u,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
x AS (
  SELECT event_type, bucket,
         CAST(round((sum_u / 1000000.0) / n * 100, 0) AS BIGINT) AS xc
  FROM agg
),
lags AS (SELECT unnest(generate_series(1, 24)) AS lag),
pairs AS (
  SELECT a.event_type, l.lag, a.xc AS xa, b.xc AS xb
  FROM x a
  CROSS JOIN lags l
  JOIN x b ON b.event_type = a.event_type AND b.bucket = a.bucket - l.lag
),
s AS (
  SELECT event_type, lag, count(*)::BIGINT AS n,
         CAST(SUM(xa) AS DOUBLE) AS sx, CAST(SUM(xb) AS DOUBLE) AS sy,
         CAST(SUM(xa * xa) AS DOUBLE) AS sxx,
         CAST(SUM(xb * xb) AS DOUBLE) AS syy,
         CAST(SUM(xa * xb) AS DOUBLE) AS sxy
  FROM pairs GROUP BY 1, 2
)
SELECT event_type, lag, n AS n_pairs,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN (n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
       END AS acf
FROM s
"""


# ---------------------------------------------------------------------------
# LTTB downsampling: largest-triangle-three-buckets per source
# ---------------------------------------------------------------------------


def lttb_hourly(sf_dir: str, n_out: int = 200):
    """Downsample each event type's hourly mean series to ``n_out`` points
    with Largest-Triangle-Three-Buckets (Steinarsson 2013) -- the standard
    visualization downsampler: endpoints kept, each middle bucket
    contributes the point forming the largest triangle with the previously
    selected point and the next bucket's centroid, so peaks and troughs
    survive where uniform striding would alias them.

    No SQL oracle by design (the selection is a sequential argmax chain);
    output invariants (subsequence, endpoints, peak preservation, exact
    hand-computed cases) are pinned in tests/test_analytics.py.  Scale
    shape: per-type scan over rollup rows; the selection loop runs n_out
    iterations with a vectorized area argmax per bucket."""
    ev = _read_events(sf_dir, ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (_ts_us(t["ts"]) // 1_000_000) // 3600
        val_u = np.rint(_np(t["value"]) * MICRO).astype(np.int64)
        if not len(codes):
            return pa.table(
                {"event_type": pa.nulls(0, pa.string()),
                 "bucket": pa.nulls(0, pa.int64()),
                 "sum_u": pa.nulls(0, pa.int64()),
                 "n": pa.nulls(0, pa.int64())}
            )
        key = codes * (1 << 44) + bucket
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        sel = order[starts]
        return pa.table(
            {
                "event_type": et.take(pa.array(sel)).cast(pa.string()),
                "bucket": pa.array(bucket[sel], pa.int64()),
                "sum_u": pa.array(
                    np.add.reduceat(val_u[order], starts), pa.int64()
                ),
                "n": pa.array(
                    np.diff(np.append(starts, len(ks))).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    parts = ev.map_batches(
        partial, batch_format="pyarrow", batch_size=1_048_576
    )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("bucket", pa.int64()),
            ("hourly_mean", pa.float64()),
        ]
    )

    def scan(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        b = _np(g["bucket"])
        su = _np(g["sum_u"])
        nn = _np(g["n"])
        order = np.argsort(b, kind="stable")
        ub = b[order]
        starts = np.flatnonzero(np.concatenate(([True], ub[1:] != ub[:-1])))
        ub = ub[starts]
        usum = np.add.reduceat(su[order], starts)
        un = np.add.reduceat(nn[order], starts)
        y = (usum / 1_000_000.0) / un
        x = ub.astype(np.float64)
        n = len(x)
        src = g["event_type"][0].as_py()
        if n <= n_out:
            keep = np.arange(n)
        else:
            every = (n - 2) / (n_out - 2)
            keep_list = [0]
            a = 0
            for i in range(n_out - 2):
                rs = int(np.floor(i * every)) + 1
                re_ = int(np.floor((i + 1) * every)) + 1
                ns = re_
                ne = min(int(np.floor((i + 2) * every)) + 1, n)
                if ns < ne:
                    avg_x = x[ns:ne].mean()
                    avg_y = y[ns:ne].mean()
                else:  # last bucket: use the final point
                    avg_x, avg_y = x[n - 1], y[n - 1]
                seg_x, seg_y = x[rs:re_], y[rs:re_]
                area = np.abs(
                    (x[a] - avg_x) * (seg_y - y[a])
                    - (x[a] - seg_x) * (avg_y - y[a])
                )
                a = rs + int(np.argmax(area))
                keep_list.append(a)
            keep_list.append(n - 1)
            keep = np.array(keep_list, np.int64)
        return pa.table(
            {
                "event_type": pa.array([src] * len(keep), pa.string()),
                "bucket": pa.array(ub[keep], pa.int64()),
                "hourly_mean": pa.array(y[keep], pa.float64()),
            },
            schema=out_schema,
        )

    return parts.groupby("event_type").map_groups(scan, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Cohort retention matrix: weekly active users by signup cohort
# ---------------------------------------------------------------------------

def cohort_retention(sf_dir: str, buckets: int | None = None,
                     week_s: int = 604_800):
    """Classic retention matrix: users grouped by first-active week
    (cohort), counted per weeks-since-cohort (age) -- the
    product-analytics shape behind every retention curve.

    Scale shape: batches dedupe (user, week) pairs before ONE hash(user)
    exchange; a user's whole history lands in one partition, so cohort
    (min week) and every (cohort, age) contribution compute vectorized
    there and the per-partition counts are additive.  The final merge
    moves only cohorts x ages rows per partition.
    """
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["user_id", "ts"])

    pair_schema = pa.schema(
        [("user_id", pa.int64()), ("week", pa.int64()), ("prt", pa.int64())]
    )

    def pair_dedupe(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=pair_schema)
        uid = _np(t["user_id"]).astype(np.int64)
        wk = (_ts_us(t["ts"]) // 1_000_000) // week_s
        off = wk - wk.min()
        if int(off.max()) >= (1 << 20):  # loud, not a silent pair merge
            raise ValueError(
                f"cohort_retention: week offset {int(off.max())} overflows "
                f"the 20-bit (user, week) pack; increase week_s"
            )
        key = uid * (1 << 20) + off
        order = np.argsort(key, kind="stable")
        ks = key[order]
        first = np.concatenate(([True], ks[1:] != ks[:-1]))
        sel = order[first]
        return pa.table(
            {
                "user_id": pa.array(uid[sel], pa.int64()),
                "week": pa.array(wk[sel], pa.int64()),
                "prt": pa.array(hash_prt(uid[sel], buckets), pa.int64()),
            },
            schema=pair_schema,
        )

    part_schema = pa.schema(
        [("cohort", pa.int64()), ("age", pa.int64()), ("cnt", pa.int64()),
         ("prt2", pa.int64())]
    )

    def cohort_partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=part_schema)
        uid = _np(t["user_id"])
        wk = _np(t["week"])
        order = np.lexsort((wk, uid))
        u_s, w_s = uid[order], wk[order]
        # re-dedupe across batch partials of the same user, then cohort =
        # each user's first (sorted) week
        keep = np.concatenate(
            ([True], (u_s[1:] != u_s[:-1]) | (w_s[1:] != w_s[:-1]))
        )
        u_d, w_d = u_s[keep], w_s[keep]
        dstarts = np.flatnonzero(
            np.concatenate(([True], u_d[1:] != u_d[:-1]))
        )
        dn = np.diff(np.append(dstarts, len(u_d)))
        cohort = np.repeat(w_d[dstarts], dn)
        age = w_d - cohort
        if int(age.max()) >= (1 << 20) or int(cohort.max()) >= (1 << 43):
            raise ValueError(
                f"cohort_retention: (cohort={int(cohort.max())}, "
                f"age={int(age.max())}) overflows the 20-bit pack; "
                f"increase week_s"
            )
        key = cohort * (1 << 20) + age
        korder = np.argsort(key, kind="stable")
        ks = key[korder]
        kstarts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        cnt = np.diff(np.append(kstarts, len(ks)))
        uk = ks[kstarts]
        return pa.table(
            {
                "cohort": pa.array(uk >> 20, pa.int64()),
                "age": pa.array(uk & ((1 << 20) - 1), pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                "prt2": pa.array(hash_prt(uk, 16), pa.int64()),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("cohort", pa.int64()), ("age", pa.int64()),
         ("active_users", pa.int64())]
    )

    def final(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        cohort = _np(t["cohort"])
        age = _np(t["age"])
        cnt = _np(t["cnt"])
        key = cohort * (1 << 20) + age
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        sums = np.add.reduceat(cnt[order], starts)
        uk = ks[starts]
        return pa.table(
            {
                "cohort": pa.array(uk >> 20, pa.int64()),
                "age": pa.array(uk & ((1 << 20) - 1), pa.int64()),
                "active_users": pa.array(sums, pa.int64()),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(pair_dedupe, batch_format="pyarrow",
                       batch_size=1_048_576)
        .groupby("prt")
        .map_groups(
            lambda g: cohort_partial(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
        .groupby("prt2")
        .map_groups(
            lambda g: final(g.drop_columns(["prt2"])),
            batch_format="pyarrow",
        )
    )


COHORT_RETENTION_SQL = """
WITH wk AS (
  SELECT DISTINCT user_id, (epoch_us(ts) // 1000000) // 604800 AS week
  FROM events
),
f AS (SELECT user_id, min(week) AS cohort FROM wk GROUP BY user_id)
SELECT f.cohort::BIGINT AS cohort, (wk.week - f.cohort)::BIGINT AS age,
       count(*)::BIGINT AS active_users
FROM wk JOIN f USING (user_id) GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# PERCENT_RANK + NTILE window functions per event type
# ---------------------------------------------------------------------------

_CANON_NAN_BITS = np.int64(0x7FF8000000000000)  # one quiet-NaN bit pattern


def _neq_nan(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise ``a != b`` that treats NaN as EQUAL to NaN -- the SQL
    peer order for RANK ties (DuckDB's float total order groups all NaNs
    as one peer run), unlike raw IEEE where NaN != NaN."""
    return (a != b) & ~(np.isnan(a) & np.isnan(b))


def _value_rank_bits(v: np.ndarray) -> np.ndarray:
    """Partition/equality key for float64 values under SQL comparison:
    +0.0 and -0.0 map to the same bits (they compare equal), and every
    NaN payload maps to ONE canonical NaN key (NaNs are peers)."""
    with np.errstate(invalid="ignore"):  # signalling-NaN + 0.0 flags FPE
        bits = (v + 0.0).view(np.int64).copy()  # -0.0 + 0.0 == +0.0
    bits[np.isnan(v)] = _CANON_NAN_BITS
    return bits


def _auto_scale_path(sf_dir: str, sample_rows: int = 65536,
                     hot_rows_per_task: int = 32_000_000) -> bool:
    """Route ``value_percent_rank`` the way ``salt='auto'`` routes joins:
    measure, don't ask the caller.  Reads ONLY the parquet footer row
    count plus a head sample of ``event_type``, estimates the hottest
    type's global row count, and picks the two-pass histogram path when
    that single type would out-size one task's sort HEAP.

    The threshold routes on MEMORY risk, not CPU: measured at 10M rows
    with a 50%-hot type (tools/bench_events.py table, 8 CPUs), the
    single-exchange path is still 1.6x FASTER (14.1 s vs 22.4 s) -- an
    in-memory lexsort of 5M rows is cheap next to the two-pass's second
    full read + histogram merge.  The two-pass exists for the type that
    cannot FIT one task's sort (~50 bytes/row working set -> tens of
    millions of rows per worker-GB), so the default cut is 32M hot rows."""
    import pyarrow.parquet as pq

    try:
        pf = pq.ParquetFile(f"{sf_dir}/events.parquet")
        total = pf.metadata.num_rows
        head = next(pf.iter_batches(batch_size=sample_rows,
                                    columns=["event_type"]))
        et = head["event_type"].to_numpy(zero_copy_only=False)
    except (OSError, StopIteration):  # dir layout / empty: default path
        return False
    if not len(et):
        return False
    _, counts = np.unique(et, return_counts=True)
    hot_fraction = counts.max() / len(et)
    return bool(hot_fraction * total > hot_rows_per_task)


def value_percent_rank(sf_dir: str, tiles: int = 4,
                       buckets: int | None = None,
                       scale_path: bool | None = None):
    """Every event with its PERCENT_RANK and NTILE(4) within its event
    type, ordered by (value, event_id) -- the rank-normalization window
    shape (feature scaling, decile reports).

    Exactness (both paths, bitwise-identical outputs -- parity-tested):
    percent_rank = (rank-1)/(n-1) with SQL RANK tie semantics; NTILE
    follows SQL's first-``n % tiles``-tiles-get-one-extra integer rule;
    the one float division is the identical IEEE op in the oracle.

    Two execution paths, same results:

    * default -- ONE hash(type) exchange, vectorized per-partition sort.
      A hot type sorts in one task: fine until a single type's row count
      dwarfs a worker (sorting is O(n log n) and cheap next to the
      exchange itself at bench scale).
    * ``scale_path=True`` -- two passes: a bounded (type, value, count)
      histogram broadcasts per-type cumulative ranks via ray.put, then
      rows exchange hashed on (type, VALUE-bits), so a pathologically hot
      type spreads over its distinct values instead of one task.  Pays a
      second read + the histogram merge; worth it only when one type
      holds a worker-crushing share of rows AND distinct values are
      bounded (the engine's histogram assumption).

    ``scale_path=None`` (the default) AUTO-SELECTS from a footer + head
    sample: the hottest type's estimated global row count decides, the
    same measured-not-guessed routing ``salt='auto'`` uses for joins
    (`_auto_scale_path`).  Callers can still force either path.
    """
    if scale_path is None:
        scale_path = _auto_scale_path(sf_dir)
    if scale_path:
        return _percent_rank_two_pass(sf_dir, tiles, buckets)
    return _percent_rank_single_exchange(sf_dir, tiles, buckets)


def _percent_rank_single_exchange(sf_dir: str, tiles: int, buckets):
    """Single hash(type) exchange variant: one partition sort per type
    (the default; fast until one type's row count dwarfs a worker)."""
    from .events_pipeline import _source_hash

    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["event_id", "event_type", "value"])

    def add_prt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        return t.append_column(
            "prt", pa.array(hash_prt(_source_hash(et), buckets), pa.int64())
        )

    out_schema = pa.schema(
        [("event_id", pa.int64()), ("event_type", pa.string()),
         ("value", pa.float64()), ("pct_rank", pa.float64()),
         ("tile", pa.int64())]
    )

    def scan_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        eid = _np(t["event_id"]).astype(np.int64)
        v = _np(t["value"])
        order = np.lexsort((eid, v, codes))
        c_s, v_s, e_s = codes[order], v[order], eid[order]
        starts = np.flatnonzero(np.concatenate(([True], c_s[1:] != c_s[:-1])))
        n = np.diff(np.append(starts, len(c_s)))
        grp = np.repeat(np.arange(len(starts)), n)
        pos = np.arange(len(c_s)) - np.repeat(starts, n)  # 0-based row pos
        # SQL RANK(): ties on value share the FIRST peer's position;
        # NaN-aware so all NaNs in a type tie as one peer run (ADVICE r4)
        new_val = np.concatenate(
            ([True], _neq_nan(v_s[1:], v_s[:-1]) | (c_s[1:] != c_s[:-1]))
        )
        rank0 = pos[np.maximum.accumulate(
            np.where(new_val, np.arange(len(c_s)), 0)
        )]
        gn = np.repeat(n, n)
        with np.errstate(invalid="ignore"):
            pct = np.where(gn > 1, rank0 / (gn - 1.0), 0.0)
        # NTILE: first (n % tiles) tiles take (n // tiles + 1) rows
        q, r = gn // tiles, gn % tiles
        cut = r * (q + 1)
        tile = np.where(
            pos < cut,
            pos // np.maximum(q + 1, 1),
            np.where(q > 0, r + (pos - cut) // np.maximum(q, 1), pos),
        ) + 1
        return pa.table(
            {
                "event_id": pa.array(e_s, pa.int64()),
                "event_type": et.take(pa.array(order)).cast(pa.string()),
                "value": pa.array(v_s, pa.float64()),
                "pct_rank": pa.array(pct, pa.float64()),
                "tile": pa.array(tile.astype(np.int64), pa.int64()),
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



def _percent_rank_two_pass(sf_dir: str, tiles: int, buckets,
                           combine_batch_rows: int = 1_048_576):
    """Every event with its PERCENT_RANK and NTILE(4) within its event
    type, ordered by (value, event_id) -- the rank-normalization window
    shape (feature scaling, decile reports).

    Exactness: percent_rank = (rank-1)/(n-1) with SQL RANK tie semantics
    (ties share the first peer's position); NTILE follows SQL's
    first-``n % tiles``-tiles-get-one-extra integer rule.  Both ride
    exact integer positions; the one float division is the identical
    IEEE op in the oracle.

    Scale shape (two passes, NO hot-type serialization): pass 1 ships a
    per-batch (type, value, count) HISTOGRAM through a small exchange
    and broadcasts the merged per-type cumulative table via ray.put --
    bounded by distinct values (the engine's bounded-domain-histogram
    assumption, same as the rollup percentile hists).  Pass 2 exchanges
    rows hashed on (type, value-bits), so a 50%-hot type spreads over
    its distinct values instead of sorting in one task; each partition
    orders event_ids within its tie runs and reads the strictly-below
    base from the broadcast table.  Output = input rows, consumed
    streaming.
    """
    import ray as _ray

    from ..util import dataset_to_table
    from .events_pipeline import _source_hash

    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["event_id", "event_type", "value"])

    # ---- pass 1: (type, value) histogram -> per-type cumulative table
    hist_schema = pa.schema(
        [("event_type", pa.string()), ("value", pa.float64()),
         ("cnt", pa.int64())]
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=hist_schema)
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = _np(t["value"])
        order = np.lexsort((v, codes))
        c_s, v_s = codes[order], v[order]
        first = np.concatenate(
            ([True], (c_s[1:] != c_s[:-1]) | _neq_nan(v_s[1:], v_s[:-1]))
        )
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, len(c_s)))
        sel = order[starts]
        return pa.table(
            {
                "event_type": et.take(pa.array(sel)).cast(pa.string()),
                "value": pa.array(v_s[starts], pa.float64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            },
            schema=hist_schema,
        )

    ht = dataset_to_table(
        ev.map_batches(
            hist_partial, batch_format="pyarrow",
            batch_size=combine_batch_rows,
        )
    )
    # driver merge of the bounded histogram: below/n per (type, value)
    lut: dict = {}
    if ht.num_rows:
        ets = ht["event_type"].to_numpy(zero_copy_only=False)
        vs = ht["value"].to_numpy(zero_copy_only=False)
        cs = ht["cnt"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vs, ets))
        e_s, v_s, c_s = ets[order], vs[order], cs[order]
        for et in np.unique(e_s):
            m = e_s == et
            vv, cc = v_s[m], c_s[m]
            # merge equal values arriving from different batches
            # (NaN-aware: all NaN partials collapse to one histogram row)
            first = np.concatenate(([True], _neq_nan(vv[1:], vv[:-1])))
            st = np.flatnonzero(first)
            vals = vv[st]
            cnts = np.add.reduceat(cc, st)
            cum = np.cumsum(cnts)
            lut[str(et)] = (vals, cum - cnts, int(cum[-1]))
    lut_ref = _ray.put(lut)

    # ---- pass 2: rows keyed on (type, value-bits)
    def add_prt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        v = _np(t["value"])
        # hash CANONICAL bits: -0.0/+0.0 and all NaN payloads are equal
        # under SQL comparison, so their tie runs must colocate (ADVICE r4)
        with np.errstate(over="ignore"):
            mix = _source_hash(et) * np.int64(1_000_003) + _value_rank_bits(v)
        return t.append_column(
            "prt", pa.array(hash_prt(mix, buckets), pa.int64())
        )

    out_schema = pa.schema(
        [("event_id", pa.int64()), ("event_type", pa.string()),
         ("value", pa.float64()), ("pct_rank", pa.float64()),
         ("tile", pa.int64())]
    )

    def scan_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        table = _ray.get(lut_ref)
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        eid = _np(t["event_id"]).astype(np.int64)
        v = _np(t["value"])
        order = np.lexsort((eid, v, codes))
        c_s, v_s, e_s = codes[order], v[order], eid[order]
        # tie-run starts within this partition (a full run is colocated
        # by the canonical (type, value-bits) exchange key; NaN-aware)
        first = np.concatenate(
            ([True], (c_s[1:] != c_s[:-1]) | _neq_nan(v_s[1:], v_s[:-1]))
        )
        rstarts = np.flatnonzero(first)
        rlen = np.diff(np.append(rstarts, len(c_s)))
        tie_pos = np.arange(len(c_s)) - np.repeat(rstarts, rlen)
        below = np.empty(len(rstarts), np.int64)
        nn = np.empty(len(rstarts), np.int64)
        dic = et.dictionary
        run_codes = c_s[rstarts]
        for code in np.unique(run_codes):  # bounded by TYPE count
            m = run_codes == code
            vals, blw, n_t = table[str(dic[int(code)].as_py())]
            idx = np.searchsorted(vals, v_s[rstarts[m]])
            below[m] = blw[idx]
            nn[m] = n_t
        rank0 = np.repeat(below, rlen)
        gn = np.repeat(nn, rlen)
        pos = rank0 + tie_pos  # global (value, event_id) position
        with np.errstate(invalid="ignore"):
            pct = np.where(gn > 1, rank0 / (gn - 1.0), 0.0)
        q, r = gn // tiles, gn % tiles
        cut = r * (q + 1)
        tile = np.where(
            pos < cut,
            pos // np.maximum(q + 1, 1),
            np.where(q > 0, r + (pos - cut) // np.maximum(q, 1), pos),
        ) + 1
        return pa.table(
            {
                "event_id": pa.array(e_s, pa.int64()),
                "event_type": et.take(pa.array(order)).cast(pa.string()),
                "value": pa.array(v_s, pa.float64()),
                "pct_rank": pa.array(pct, pa.float64()),
                "tile": pa.array(tile.astype(np.int64), pa.int64()),
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


VALUE_PERCENT_RANK_SQL = """
SELECT event_id::BIGINT AS event_id, event_type, value,
       percent_rank() OVER (PARTITION BY event_type
                            ORDER BY value) AS pct_rank,
       ntile(4) OVER (PARTITION BY event_type
                      ORDER BY value, event_id)::BIGINT AS tile
FROM events
"""


def value_cume_dist(sf_dir: str, buckets: int | None = None):
    """Every event with its CUME_DIST and DENSE_RANK within its event
    type (ORDER BY value) -- the remaining rank-family windows next to
    PERCENT_RANK/NTILE/RANK.

    Scale shape: identical to the percent_rank single-exchange path
    (ONE hash(type) exchange, vectorized per-partition sort); the same
    tie-run segmentation serves both outputs (cume_dist = run END
    position / n; dense_rank = run ordinal).  NaN-aware tie runs match
    SQL's NaN-peers total order (same bridge as value_percent_rank).
    """
    from .events_pipeline import _source_hash

    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["event_id", "event_type", "value"])

    def add_prt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        return t.append_column(
            "prt", pa.array(hash_prt(_source_hash(et), buckets), pa.int64())
        )

    out_schema = pa.schema(
        [("event_id", pa.int64()), ("event_type", pa.string()),
         ("value", pa.float64()), ("cume_dist", pa.float64()),
         ("dense_rank", pa.int64())]
    )

    def scan_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        eid = _np(t["event_id"]).astype(np.int64)
        v = _np(t["value"])
        order = np.lexsort((eid, v, codes))
        c_s, v_s, e_s = codes[order], v[order], eid[order]
        tstarts = np.flatnonzero(
            np.concatenate(([True], c_s[1:] != c_s[:-1]))
        )
        tn = np.diff(np.append(tstarts, len(c_s)))
        gn = np.repeat(tn, tn).astype(np.float64)
        pos = np.arange(len(c_s)) - np.repeat(tstarts, tn)
        new_run = np.concatenate(
            ([True], _neq_nan(v_s[1:], v_s[:-1]) | (c_s[1:] != c_s[:-1]))
        )
        rstarts = np.flatnonzero(new_run)
        rlen = np.diff(np.append(rstarts, len(c_s)))
        # CUME_DIST: rows at or below the current value / n = the tie
        # run's END position + 1, shared by the whole run
        run_end_pos = np.repeat(pos[rstarts] + rlen, rlen)
        cd = run_end_pos / gn
        # DENSE_RANK: ordinal of the run within its type
        run_type = c_s[rstarts]
        run_first_of_type = np.concatenate(
            ([True], run_type[1:] != run_type[:-1])
        )
        run_ordinal = (
            np.arange(len(rstarts))
            - np.repeat(
                np.flatnonzero(run_first_of_type),
                np.diff(np.append(np.flatnonzero(run_first_of_type),
                                  len(rstarts))),
            )
            + 1
        )
        dr = np.repeat(run_ordinal, rlen)
        return pa.table(
            {
                "event_id": pa.array(e_s, pa.int64()),
                "event_type": et.take(pa.array(order)).cast(pa.string()),
                "value": pa.array(v_s, pa.float64()),
                "cume_dist": pa.array(cd, pa.float64()),
                "dense_rank": pa.array(dr.astype(np.int64), pa.int64()),
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


VALUE_CUME_DIST_SQL = """
SELECT event_id::BIGINT AS event_id, event_type, value,
       cume_dist() OVER (PARTITION BY event_type
                         ORDER BY value) AS cume_dist,
       dense_rank() OVER (PARTITION BY event_type
                          ORDER BY value)::BIGINT AS dense_rank
FROM events
"""


# ---------------------------------------------------------------------------
# Robust stats: per-user median absolute deviation (MAD)
# ---------------------------------------------------------------------------

def user_value_mad(sf_dir: str, buckets: int | None = None):
    """Per-user median absolute deviation of value (with the median) --
    the robust dispersion measure outlier pipelines prefer to stddev.

    Scale shape: ONE hash(user) exchange; each partition computes every
    user's median (quantile_cont semantics), then the median of absolute
    deviations, both via vectorized segment indexing -- no per-group
    Python.  Exactness: the deviations ``abs(v - med)`` are the identical
    IEEE ops in the oracle, and both medians use the same floor/ceil lerp
    as SQL quantile_cont (same bridge as user_value_quantiles).
    """
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["user_id", "value"])

    def add_prt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        uid = _np(t["user_id"]).astype(np.int64)
        return t.append_column(
            "prt", pa.array(hash_prt(uid, buckets), pa.int64())
        )

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("n", pa.int64()),
         ("med", pa.float64()), ("mad", pa.float64())]
    )

    def _seg_median(v_sorted: np.ndarray, starts: np.ndarray,
                    n: np.ndarray) -> np.ndarray:
        pos = (n - 1).astype(np.float64) * 0.5
        lo = np.floor(pos).astype(np.int64)
        hi = np.ceil(pos).astype(np.int64)
        frac = pos - lo
        vlo = v_sorted[starts + lo]
        vhi = v_sorted[starts + hi]
        return vlo + (vhi - vlo) * frac

    def mad_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        uid = _np(t["user_id"]).astype(np.int64)
        v = _np(t["value"])
        order = np.lexsort((v, uid))
        u_s, v_s = uid[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], u_s[1:] != u_s[:-1])))
        n = np.diff(np.append(starts, len(u_s)))
        med = _seg_median(v_s, starts, n)
        dev = np.abs(v_s - np.repeat(med, n))
        # re-sort deviations within each user segment
        order2 = np.lexsort((dev, u_s))
        d_s = dev[order2]
        mad = _seg_median(d_s, starts, n)
        return pa.table(
            {
                "user_id": pa.array(u_s[starts], pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
                "med": pa.array(_round6(med), pa.float64()),
                "mad": pa.array(_round6(mad), pa.float64()),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(add_prt, batch_format="pyarrow")
        .groupby("prt")
        .map_groups(
            lambda g: mad_partition(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


USER_VALUE_MAD_SQL = """
WITH m AS (
  SELECT user_id, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY user_id
)
SELECT e.user_id::BIGINT AS user_id, count(*)::BIGINT AS n,
       round(any_value(m.med) + 1e-9, 6) AS med,
       round(quantile_cont(abs(e.value - m.med), 0.5) + 1e-9, 6) AS mad
FROM events e JOIN m USING (user_id)
GROUP BY e.user_id
"""


# ---------------------------------------------------------------------------
# Gini coefficient per event type (exact integer rank arithmetic)
# ---------------------------------------------------------------------------

def gini_by_type(sf_dir: str, buckets: int | None = None,
                 combine_batch_rows: int = 1_048_576):
    """Gini inequality coefficient of value per event type:
    ``sum((2 rn - n - 1) * c) / (n * sum(c))`` with values
    centi-quantized to int64 so every sum is an exact integer -- the
    float division at the end is the identical IEEE op in the oracle.

    Scale shape: NO row-level exchange at all.  Within a tie run the
    rank-weighted sum has the closed form ``v * cnt * (2 below + cnt -
    n)`` (ranks are consecutive integers), so the pipeline ships only a
    per-batch (type, centi-value, count) HISTOGRAM -- the same
    bounded-domain argument as the rollup percentile hists -- through one
    hash(type) exchange and computes n / below / wsum from the merged
    histogram's prefix sums.  A 50%-hot type costs its distinct-value
    count, not its row count.  Guard: fails loudly when
    ``n^2 * max_centi`` approaches int64.
    """
    from .events_pipeline import _source_hash

    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["event_type", "value"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("cv", pa.int64()),
         ("cnt", pa.int64()), ("prt", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=part_schema)
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        c = _half_away_c(_np(t["value"]))
        if (c < 0).any():
            raise ValueError("gini_by_type requires non-negative values")
        key = codes * (1 << 40) + c
        if c.max() >= (1 << 40):
            raise ValueError("centi values exceed 2^40 packing range")
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        cnt = np.diff(np.append(starts, len(ks)))
        sel = order[starts]
        et_sel = et.take(pa.array(sel)).cast(pa.string())
        return pa.table(
            {
                "event_type": et_sel,
                "cv": pa.array(c[sel], pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                "prt": pa.array(
                    hash_prt(_source_hash(et_sel), buckets), pa.int64()
                ),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("event_type", pa.string()), ("n", pa.int64()),
         ("gini", pa.float64())]
    )

    def gini_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cv = _np(t["cv"])
        cnt = _np(t["cnt"])
        order = np.lexsort((cv, codes))
        c_g, v_s, n_s = codes[order], cv[order], cnt[order]
        # merge duplicate (type, cv) histogram rows across batches
        pair = c_g * (1 << 40) + v_s
        pstarts = np.flatnonzero(
            np.concatenate(([True], pair[1:] != pair[:-1]))
        )
        cnt_m = np.add.reduceat(n_s, pstarts)
        g_m, v_m = c_g[pstarts], v_s[pstarts]
        gstarts = np.flatnonzero(
            np.concatenate(([True], g_m[1:] != g_m[:-1]))
        )
        n = np.add.reduceat(cnt_m, gstarts)
        if (n.astype(np.float64) ** 2 * max(v_m.max(), 1) >= 2**62).any():
            raise ValueError("gini weighted sum would overflow int64")
        runs = np.diff(np.append(gstarts, len(g_m)))
        gn = np.repeat(n, runs)
        # strictly-below count per histogram row: global prefix sum minus
        # the owning type's offset
        cum = np.cumsum(cnt_m)
        below = (cum - cnt_m) - np.repeat(
            np.concatenate(([0], cum[gstarts[1:] - 1])), runs
        )
        # closed-form tie-run sum: ranks below+1..below+cnt
        w = v_m * cnt_m * (2 * below + cnt_m - gn)
        wsum = np.add.reduceat(w, gstarts)
        csum = np.add.reduceat(v_m * cnt_m, gstarts)
        with np.errstate(invalid="ignore", divide="ignore"):
            gini = np.where(
                csum > 0, wsum / (n.astype(np.float64) * csum), 0.0
            )
        sel = order[pstarts][gstarts]
        return pa.table(
            {
                "event_type": t["event_type"].combine_chunks().take(
                    pa.array(sel)
                ),
                "n": pa.array(n.astype(np.int64), pa.int64()),
                "gini": pa.array(_round6(gini), pa.float64()),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(
            partial, batch_format="pyarrow", batch_size=combine_batch_rows
        )
        .groupby("prt")
        .map_groups(
            lambda g: gini_partition(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


GINI_BY_TYPE_SQL = """
WITH c AS (
  SELECT event_id, event_type,
         CAST(CASE WHEN value >= 0 THEN floor(value * 100.0 + 0.5)
              ELSE ceil(value * 100.0 - 0.5) END AS BIGINT) AS cv
  FROM events
), r AS (
  SELECT event_type, cv,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cv, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM c
)
SELECT event_type, max(n)::BIGINT AS n,
       round(CASE WHEN sum(cv) > 0 THEN
                sum((2 * rn - n - 1) * cv)::DOUBLE
                / (max(n)::DOUBLE * sum(cv))
             ELSE 0.0 END + 1e-9, 6) AS gini
FROM r GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Churn: users active in the penultimate week but absent from the last
# ---------------------------------------------------------------------------

def churned_users(sf_dir: str, buckets: int | None = None,
                  week_s: int = 604_800):
    """Users who were active in week W-1 but NOT in week W, where W is the
    data's last week -- the EXCEPT / NOT EXISTS churn shape every
    engagement dashboard runs.

    Scale shape: W comes from Parquet FOOTER statistics (max ts is exact
    in the metadata -- zero data read for the scalar); (user, week) pairs
    dedupe per batch, ONE hash(user) exchange, and each partition decides
    membership of both weeks per user vectorized.
    """
    import glob as _glob

    import pyarrow.parquet as pq

    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")

    import datetime as _dt

    def _naive_utc_us(v) -> int:
        # parquet footer stats give a NAIVE UTC datetime; convert with
        # exact integer timedelta math (never .timestamp(), which applies
        # the local timezone)
        td = v - _dt.datetime(1970, 1, 1)
        return (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds

    mx_us = None
    paths = sorted(_glob.glob(f"{sf_dir}/events.parquet")) or sorted(
        _glob.glob(f"{sf_dir}/events.parquet/*.parquet")
    )
    for p in paths:
        md = pq.ParquetFile(p).metadata
        ci = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.row_group(0).num_columns)
        }["ts"]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                mx_us = None
                break
            us = _naive_utc_us(st.max)
            mx_us = us if mx_us is None else max(mx_us, us)
        else:
            continue
        break
    if mx_us is None:
        # stats unavailable: one tiny max() aggregate pass (still no
        # driver-side row materialization)
        mx = _read_events(sf_dir, ["ts"]).max("ts")
        mx_us = _naive_utc_us(mx.replace(tzinfo=None)) if isinstance(
            mx, _dt.datetime
        ) else int(mx)
    w_last = (mx_us // 1_000_000) // week_s

    ev = _read_events(sf_dir, ["user_id", "ts"])

    pair_schema = pa.schema(
        [("user_id", pa.int64()), ("week", pa.int64()), ("prt", pa.int64())]
    )

    def pair_dedupe(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=pair_schema)
        uid = _np(t["user_id"]).astype(np.int64)
        wk = (_ts_us(t["ts"]) // 1_000_000) // week_s
        # only the last two weeks matter; prune the rest pre-exchange
        m = wk >= w_last - 1
        if not m.any():
            return pa.Table.from_pylist([], schema=pair_schema)
        uid, wk = uid[m], wk[m]
        key = uid * 4 + (wk - (w_last - 1))
        order = np.argsort(key, kind="stable")
        ks = key[order]
        first = np.concatenate(([True], ks[1:] != ks[:-1]))
        sel = order[first]
        return pa.table(
            {
                "user_id": pa.array(uid[sel], pa.int64()),
                "week": pa.array(wk[sel], pa.int64()),
                "prt": pa.array(hash_prt(uid[sel], buckets), pa.int64()),
            },
            schema=pair_schema,
        )

    out_schema = pa.schema([("user_id", pa.int64())])

    def churn_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        uid = _np(t["user_id"])
        wk = _np(t["week"])
        order = np.lexsort((wk, uid))
        u_s, w_s = uid[order], wk[order]
        starts = np.flatnonzero(np.concatenate(([True], u_s[1:] != u_s[:-1])))
        ends = np.append(starts[1:], len(u_s))
        # membership per user: had W-1, lacked W
        has_prev = np.zeros(len(starts), bool)
        has_last = np.zeros(len(starts), bool)
        gidx = np.repeat(np.arange(len(starts)), ends - starts)
        np.logical_or.at(has_prev, gidx, w_s == w_last - 1)
        np.logical_or.at(has_last, gidx, w_s == w_last)
        churn = has_prev & ~has_last
        return pa.table(
            {"user_id": pa.array(u_s[starts][churn], pa.int64())},
            schema=out_schema,
        )

    return (
        ev.map_batches(pair_dedupe, batch_format="pyarrow",
                       batch_size=1_048_576)
        .groupby("prt")
        .map_groups(
            lambda g: churn_partition(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


CHURNED_USERS_SQL = """
WITH mx AS (
  SELECT (epoch_us(max(ts)) // 1000000) // 604800 AS w FROM events
),
wk AS (
  SELECT DISTINCT user_id, (epoch_us(ts) // 1000000) // 604800 AS week
  FROM events
)
SELECT w1.user_id::BIGINT AS user_id
FROM wk w1, mx
WHERE w1.week = mx.w - 1
  AND NOT EXISTS (
    SELECT 1 FROM wk w2, mx m2
    WHERE w2.user_id = w1.user_id AND w2.week = m2.w
  )
"""


# ---------------------------------------------------------------------------
# Window FRAME aggregates: ROWS BETWEEN k PRECEDING and RANGE BETWEEN
# INTERVAL PRECEDING -- the moving-aggregate shapes (rolling count / sum /
# avg / min over a bounded trailing frame) that round out the window-function
# family next to the UNBOUNDED-PRECEDING running total.
# ---------------------------------------------------------------------------

def user_value_moving_stats(sf_dir: str, k: int = 10,
                            buckets: int | None = None):
    """Per-event trailing-``k``-row aggregates over each user's
    (ts, event_id)-ordered stream: frame ``ROWS BETWEEN k-1 PRECEDING AND
    CURRENT ROW``, emitting the frame's row count, value sum, average and
    minimum (clipped at the partition start, as SQL clips it).

    Scale shape: ONE keyed exchange (hash by user); each partition serves
    ALL its users in four vectorized passes -- prefix sums with a
    per-row ``win = min(k, pos_in_group+1)`` for count/sum/avg, and the
    two-pass block min (per-k-block forward/backward ``minimum.accumulate``)
    over a +inf-padded layout that inserts ``k-1`` sentinels before each
    group so no window ever reads a neighbouring user.  No per-group
    Python; the padding adds at most ``(k-1)/rows_per_group`` overhead.
    Exactness: sums ride int64 micro-units; the average mirrors the
    oracle's ``SUM(micro)/1e6/COUNT`` operand order; MIN is a pure value
    move -- all bitwise.
    """
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def add_prt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        uid = _np(t["user_id"]).astype(np.int64)
        return t.append_column(
            "prt", pa.array(hash_prt(uid, buckets), pa.int64())
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("value", pa.float64()),
            ("mov_cnt", pa.int64()),
            ("mov_sum", pa.float64()),
            ("mov_avg", pa.float64()),
            ("mov_min", pa.float64()),
        ]
    )

    def scan_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        uid = _np(t["user_id"]).astype(np.int64)
        ts = _ts_us(t["ts"])
        eid = _np(t["event_id"]).astype(np.int64)
        v = _np(t["value"])
        order = np.lexsort((eid, ts, uid))
        u_s, v_s = uid[order], v[order]
        n = len(u_s)
        first = np.concatenate(([True], u_s[1:] != u_s[:-1]))
        gid = np.cumsum(first) - 1
        starts = np.flatnonzero(first)
        pos = np.arange(n) - starts[gid]
        win = np.minimum(k, pos + 1)
        v_u = np.round(v_s * 1_000_000).astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(v_u)))
        idx = np.arange(1, n + 1)
        mov_sum_u = csum[idx] - csum[idx - win]
        mov_avg = (mov_sum_u / 1_000_000.0) / win
        # sliding MIN via the two-pass block trick on a +inf-padded layout:
        # k-1 sentinels before every group guarantee window isolation, and
        # q >= k-1 for every real row so right[q-k+1] never underflows
        q = np.arange(n) + (gid + 1) * (k - 1)
        m = int(q[-1]) + 1
        m += (-m) % k
        p = np.full(m, np.inf)
        p[q] = v_s
        blocks = p.reshape(-1, k)
        left = np.minimum.accumulate(blocks, axis=1).ravel()
        right = np.minimum.accumulate(
            blocks[:, ::-1], axis=1
        )[:, ::-1].ravel()
        mov_min = np.minimum(right[q - k + 1], left[q])
        return pa.table(
            {
                "user_id": pa.array(u_s, pa.int64()),
                "event_id": pa.array(eid[order], pa.int64()),
                "ts": pa.array(ts[order].view("datetime64[us]")),
                "value": pa.array(v_s, pa.float64()),
                "mov_cnt": pa.array(win.astype(np.int64), pa.int64()),
                "mov_sum": pa.array(mov_sum_u / 1_000_000.0, pa.float64()),
                "mov_avg": pa.array(mov_avg, pa.float64()),
                "mov_min": pa.array(mov_min, pa.float64()),
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


USER_VALUE_MOVING_STATS_SQL = """
SELECT user_id::BIGINT AS user_id, event_id::BIGINT AS event_id, ts,
       value::DOUBLE AS value,
       COUNT(*) OVER w::BIGINT AS mov_cnt,
       SUM(CAST(round(value * 1000000, 0) AS BIGINT)) OVER w / 1000000.0
         AS mov_sum,
       SUM(CAST(round(value * 1000000, 0) AS BIGINT)) OVER w / 1000000.0
         / COUNT(*) OVER w AS mov_avg,
       MIN(value) OVER w AS mov_min
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
"""


def user_value_time_window(sf_dir: str, window_s: int = 3600,
                           buckets: int | None = None):
    """Per-event trailing TIME-window aggregates: for every event, the
    count / sum / average of the SAME user's values with ``ts`` in
    ``[ts_i - window_s, ts_i]`` -- frame ``RANGE BETWEEN INTERVAL
    window_s SECOND PRECEDING AND CURRENT ROW`` (peers of the current
    timestamp included, as RANGE frames include them).

    Scale shape: ONE keyed exchange (hash by user); each partition
    computes every frame bound for ALL its users with two global
    ``searchsorted`` calls on a composite ``dense_gid * K + ts_rel`` key
    (K spans the partition's ts range + window, so group blocks never
    interleave), then prefix-sum differences -- no per-group Python.
    The composite pack guards loudly against int64 overflow in the house
    style (``n_groups * K < 2^62``).  Exactness: sums ride int64
    micro-units; the average mirrors the oracle's operand order.
    """
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["event_id", "user_id", "ts", "value"])
    w_us = np.int64(window_s) * 1_000_000

    def add_prt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        uid = _np(t["user_id"]).astype(np.int64)
        return t.append_column(
            "prt", pa.array(hash_prt(uid, buckets), pa.int64())
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("value", pa.float64()),
            ("w_cnt", pa.int64()),
            ("w_sum", pa.float64()),
            ("w_avg", pa.float64()),
        ]
    )

    def scan_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        uid = _np(t["user_id"]).astype(np.int64)
        ts = _ts_us(t["ts"])
        eid = _np(t["event_id"]).astype(np.int64)
        v = _np(t["value"])
        order = np.lexsort((eid, ts, uid))
        u_s, ts_s, v_s = uid[order], ts[order], v[order]
        n = len(u_s)
        first = np.concatenate(([True], u_s[1:] != u_s[:-1]))
        gid = np.cumsum(first) - 1
        ts_rel = ts_s - ts_s.min()
        K = np.int64(int(ts_rel.max()) + int(w_us) + 2)
        if int(gid[-1] + 1) * int(K) >= (1 << 62):
            raise ValueError(
                "user_value_time_window: composite frame key overflows "
                f"(groups={int(gid[-1]) + 1}, span_us={int(K)}); split the "
                "partition by time range before the windowed scan"
            )
        ckey = gid * K + ts_rel
        lo = np.searchsorted(ckey, gid * K + (ts_rel - w_us), side="left")
        hi = np.searchsorted(ckey, ckey, side="right") - 1
        v_u = np.round(v_s * 1_000_000).astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(v_u)))
        w_sum_u = csum[hi + 1] - csum[lo]
        w_cnt = hi - lo + 1
        w_avg = (w_sum_u / 1_000_000.0) / w_cnt
        return pa.table(
            {
                "user_id": pa.array(u_s, pa.int64()),
                "event_id": pa.array(eid[order], pa.int64()),
                "ts": pa.array(ts_s.view("datetime64[us]")),
                "value": pa.array(v_s, pa.float64()),
                "w_cnt": pa.array(w_cnt.astype(np.int64), pa.int64()),
                "w_sum": pa.array(w_sum_u / 1_000_000.0, pa.float64()),
                "w_avg": pa.array(w_avg, pa.float64()),
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


USER_VALUE_TIME_WINDOW_SQL = """
SELECT user_id::BIGINT AS user_id, event_id::BIGINT AS event_id, ts,
       value::DOUBLE AS value,
       COUNT(*) OVER w::BIGINT AS w_cnt,
       SUM(CAST(round(value * 1000000, 0) AS BIGINT)) OVER w / 1000000.0
         AS w_sum,
       SUM(CAST(round(value * 1000000, 0) AS BIGINT)) OVER w / 1000000.0
         / COUNT(*) OVER w AS w_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 3600 SECOND PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# Cross-series correlation: Pearson r between event types' hourly mean series
# ---------------------------------------------------------------------------


def type_hourly_corr(sf_dir: str):
    """Pearson correlation between each pair of event types' hourly mean
    series, over the hours where BOTH types have data (the time-series form
    of the reference's corr-matrix EDA, caits/eda via functions/eda.corr --
    there a per-DataFrame column matrix, here distributed series pairing).

    Scale shape: exchange 1 is the hourly rollup (events collapse to
    (type, hour) partials -- rollup-sized); exchange 2 groups the rollup by
    HOUR and emits T*(T-1)/2 pair rows per hour via triu indices (types are
    a bounded set, so pair rows are hours x T^2 -- still rollup-sized);
    the final per-pair moment reduce is #pairs rows.  Raw events are read
    once and never re-shipped.
    """
    from .events_pipeline import hourly_rollup

    pair_schema = pa.schema(
        [
            ("type_a", pa.string()),
            ("type_b", pa.string()),
            ("x", pa.float64()),
            ("y", pa.float64()),
        ]
    )

    def pair_rows(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        k = g.num_rows
        if k < 2:
            return pa.Table.from_pylist([], schema=pair_schema)
        src = g["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        order = pa.compute.sort_indices(src)
        src = src.take(order)
        # hourly mean from the already-exact rollup columns (val_sum is the
        # oracle-matched rounded sum, so x/y are bit-identical to SQL's)
        m = (
            _np(g["val_sum"])[order.to_numpy(zero_copy_only=False)]
            / _np(g["count"])[order.to_numpy(zero_copy_only=False)]
        )
        i, j = np.triu_indices(k, 1)
        return pa.table(
            {
                "type_a": src.take(pa.array(i)),
                "type_b": src.take(pa.array(j)),
                "x": pa.array(m[i], pa.float64()),
                "y": pa.array(m[j], pa.float64()),
            },
            schema=pair_schema,
        )

    pairs = (
        hourly_rollup(sf_dir)
        .groupby("bucket")
        .map_groups(pair_rows, batch_format="pyarrow")
    )
    return (
        pairs.groupby(["type_a", "type_b"])
        .map_groups(_corr_finalize, batch_format="pyarrow")
    )


def _corr_finalize(g: pa.Table) -> pa.Table:
    """Per-(type_a, type_b) Pearson r from the paired (x, y) series via
    moment sums -- one output row per group; the SQL mirror computes the
    identical avg-of-products form."""
    g = g.combine_chunks()
    x = _np(g["x"])
    y = _np(g["y"])
    n = len(x)
    mx, my = x.sum() / n, y.sum() / n
    sxx, syy, sxy = (x * x).sum() / n, (y * y).sum() / n, (x * y).sum() / n
    vx, vy = sxx - mx * mx, syy - my * my
    corr = (
        round(float((sxy - mx * my) / np.sqrt(vx * vy)), 6)
        if vx > 0 and vy > 0
        else None
    )
    return pa.table(
        {
            "type_a": g["type_a"][:1].cast(pa.string()),
            "type_b": g["type_b"][:1].cast(pa.string()),
            "n_hours": pa.array([n], pa.int64()),
            "corr_ab": pa.array([corr], pa.float64()),
        }
    )


TYPE_HOURLY_CORR_SQL = """
WITH h AS (
  SELECT event_type AS source, (epoch_us(ts) // 1000000) // 3600 AS bucket,
         count(*)::BIGINT AS cnt, round(sum(value), 6) AS val_sum
  FROM events GROUP BY 1, 2
),
m AS (SELECT source, bucket, val_sum / cnt AS v FROM h),
p AS (
  SELECT a.source AS type_a, b.source AS type_b, a.v AS x, b.v AS y
  FROM m a JOIN m b ON a.bucket = b.bucket AND a.source < b.source
),
s AS (
  SELECT type_a, type_b, count(*)::BIGINT AS n_hours,
         avg(x) AS mx, avg(y) AS my,
         avg(x * x) AS sxx, avg(y * y) AS syy, avg(x * y) AS sxy
  FROM p GROUP BY 1, 2
)
SELECT type_a, type_b, n_hours,
       CASE WHEN sxx - mx * mx > 0 AND syy - my * my > 0
            THEN round((sxy - mx * my)
                       / sqrt((sxx - mx * mx) * (syy - my * my)), 6)
       END AS corr_ab
FROM s
"""


# ---------------------------------------------------------------------------
# Lagged cross-correlation: type A's hourly mean at t vs type B's at t+1
# ---------------------------------------------------------------------------


def type_hourly_xcorr_lag1(sf_dir: str, lag: int = 1):
    """Pearson correlation between each ORDERED pair of event types with a
    one-hour lead: type_a's hourly mean at hour t paired with type_b's at
    t + ``lag`` (lead/lag structure detection -- which series anticipates
    which).  Direction matters at lag != 0, so all T*(T-1) ordered pairs.

    Scale shape: same two rollup-sized exchanges as ``type_hourly_corr``,
    plus one map-side duplication of the rollup (each (type, hour, mean) row
    is tagged once as the x side at pairing-hour ``bucket`` and once as the
    y side at ``bucket - lag``); the per-pairing-hour group emits the
    x-by-y cross pairs (bounded: types are a small domain).
    """
    from .events_pipeline import hourly_rollup

    tag_schema = pa.schema(
        [
            ("h", pa.int64()),
            ("side", pa.int8()),
            ("source", pa.string()),
            ("m", pa.float64()),
        ]
    )
    pair_schema = pa.schema(
        [
            ("type_a", pa.string()),
            ("type_b", pa.string()),
            ("x", pa.float64()),
            ("y", pa.float64()),
        ]
    )

    def tag(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        b = _np(t["bucket"]).astype(np.int64)
        m = _np(t["val_sum"]) / _np(t["count"])
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        n = len(b)
        return pa.table(
            {
                "h": pa.array(np.concatenate([b, b - lag])),
                "side": pa.array(
                    np.concatenate(
                        [np.zeros(n, dtype=np.int8), np.ones(n, dtype=np.int8)]
                    )
                ),
                "source": pa.concat_arrays([src, src]),
                "m": pa.array(np.concatenate([m, m]), pa.float64()),
            },
            schema=tag_schema,
        )

    def cross_pairs(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        side = _np(g["side"])
        src = np.asarray(g["source"].to_pylist(), dtype=object)
        m = _np(g["m"])
        xi = np.flatnonzero(side == 0)
        yi = np.flatnonzero(side == 1)
        if len(xi) == 0 or len(yi) == 0:
            return pa.Table.from_pylist([], schema=pair_schema)
        # deterministic pair order regardless of group row order
        xi = xi[np.argsort(src[xi], kind="stable")]
        yi = yi[np.argsort(src[yi], kind="stable")]
        ii, jj = np.meshgrid(xi, yi, indexing="ij")
        ii, jj = ii.ravel(), jj.ravel()
        keep = src[ii] != src[jj]
        ii, jj = ii[keep], jj[keep]
        return pa.table(
            {
                "type_a": pa.array(src[ii], pa.string()),
                "type_b": pa.array(src[jj], pa.string()),
                "x": pa.array(m[ii], pa.float64()),
                "y": pa.array(m[jj], pa.float64()),
            },
            schema=pair_schema,
        )

    pairs = (
        hourly_rollup(sf_dir)
        .map_batches(tag, batch_format="pyarrow")
        .groupby("h")
        .map_groups(cross_pairs, batch_format="pyarrow")
    )
    return (
        pairs.groupby(["type_a", "type_b"])
        .map_groups(_corr_finalize, batch_format="pyarrow")
    )


TYPE_HOURLY_XCORR_SQL = """
WITH h AS (
  SELECT event_type AS source, (epoch_us(ts) // 1000000) // 3600 AS bucket,
         count(*)::BIGINT AS cnt, round(sum(value), 6) AS val_sum
  FROM events GROUP BY 1, 2
),
m AS (SELECT source, bucket, val_sum / cnt AS v FROM h),
p AS (
  SELECT a.source AS type_a, b.source AS type_b, a.v AS x, b.v AS y
  FROM m a JOIN m b ON b.bucket = a.bucket + 1 AND a.source <> b.source
),
s AS (
  SELECT type_a, type_b, count(*)::BIGINT AS n_hours,
         avg(x) AS mx, avg(y) AS my,
         avg(x * x) AS sxx, avg(y * y) AS syy, avg(x * y) AS sxy
  FROM p GROUP BY 1, 2
)
SELECT type_a, type_b, n_hours,
       CASE WHEN sxx - mx * mx > 0 AND syy - my * my > 0
            THEN round((sxy - mx * my)
                       / sqrt((sxx - mx * mx) * (syy - my * my)), 6)
       END AS corr_ab
FROM s
"""


# ---------------------------------------------------------------------------
# Deterministic stratified sample: n docs per source by content-hash order
# ---------------------------------------------------------------------------


def stratified_sample_docs(sf_dir: str, n: int = 5):
    """The ``n`` documents per source with the smallest ``(md5(text),
    doc_id)`` key -- per-stratum capped sampling that is a pure function of
    content (same rows at any cluster size / partitioning), the grouped
    companion of ``doc_sample_hash``'s global Bernoulli sample.

    Scale shape: the per-batch combiner prunes to <= n rows per source per
    batch (selection by minimum is monotone under merging), so the keyed
    exchange moves at most ``batches x sources_per_batch x n`` rows; the
    per-source merge repeats the selection and emits the rank.
    """
    import pyarrow.compute as pc

    from ..functions.text import md5_fingerprint

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "source", "n_chars"],
    )

    def select(t: pa.Table, emit_rank: bool) -> pa.Table:
        t = t.combine_chunks()
        if "fp" not in t.schema.names:
            fp = pa.array(
                [md5_fingerprint(s) for s in t["text"].to_pylist()], pa.string()
            )
            t = t.drop_columns(["text"]).append_column("fp", fp)
        order = pc.sort_indices(
            t,
            sort_keys=[
                ("source", "ascending"),
                ("fp", "ascending"),
                ("doc_id", "ascending"),
            ],
        )
        t = t.take(order)
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        codes = src.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(
            np.concatenate(([True], codes[1:] != codes[:-1]))
        )
        rank = np.arange(len(codes), dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, len(codes)))
        )
        t = t.append_column("rn", pa.array(rank + 1))
        t = t.filter(pa.array(rank < n))
        if emit_rank:
            return pa.table(
                {
                    "source": t["source"],
                    "doc_id": t["doc_id"].cast(pa.int64()),
                    "n_chars": t["n_chars"].cast(pa.int64()),
                    "rn": t["rn"],
                }
            )
        return t.drop_columns(["rn"])

    pruned = ds.map_batches(lambda b: select(b, False), batch_format="pyarrow")
    return pruned.groupby("source").map_groups(
        lambda g: select(g, True), batch_format="pyarrow"
    )


STRATIFIED_SAMPLE_SQL = """
SELECT source, doc_id::BIGINT AS doc_id, n_chars::BIGINT AS n_chars,
       rn::BIGINT AS rn
FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(text), doc_id) AS rn
  FROM documents
)
WHERE rn <= 5
"""


# ---------------------------------------------------------------------------
# Inter-arrival gap statistics per user (burstiness)
# ---------------------------------------------------------------------------


def user_interarrival_stats(sf_dir: str, buckets: int | None = None):
    """Per-user inter-arrival statistics over event timestamps: number of
    gaps, mean gap (seconds), coefficient of variation (burstiness -- CV>1
    is burstier than Poisson), and max gap.  Users with a single event have
    no gaps and are excluded, matching the SQL mirror's NULL-lag drop.

    Exactness: gaps are integer SECONDS (floor of the microsecond diff);
    per-user count/sum/max/sum-of-squares are exact integer reductions
    (sum-of-squares escalates to Python-int math if int64 would overflow
    -- DuckDB's HUGEINT sum never overflows, so the Ray side must not
    either), and the float mean/CV expression is written in the same op
    order as the mirror.  Ties in ``ts`` are harmless: the multiset of
    consecutive gaps of a sorted sequence does not depend on tie order.

    Scale shape: ONE keyed exchange (hash by user), then one segmented
    vectorized pass per partition -- same shape as user_session_ids."""
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["user_id", "ts"])

    def add_prt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        uid = _np(t["user_id"]).astype(np.int64)
        return t.append_column(
            "prt", pa.array(hash_prt(uid, buckets), pa.int64())
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_gaps", pa.int64()),
            ("mean_gap_s", pa.float64()),
            ("cv_gap", pa.float64()),
            ("max_gap_s", pa.int64()),
        ]
    )

    def scan(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        uid = _np(t["user_id"]).astype(np.int64)
        ts = _ts_us(t["ts"])
        order = np.lexsort((ts, uid))
        u_s, t_s = uid[order], ts[order]
        same_user = np.concatenate(([False], u_s[1:] == u_s[:-1]))
        if not same_user.any():
            return pa.Table.from_pylist([], schema=out_schema)
        gap_all = np.concatenate(([0], np.diff(t_s)))
        g = (gap_all[same_user] // 1_000_000).astype(np.int64)
        gu = u_s[same_user]                      # user of each gap, sorted
        starts = np.flatnonzero(
            np.concatenate(([True], gu[1:] != gu[:-1]))
        )
        n = np.diff(np.append(starts, len(gu))).astype(np.int64)
        sx = np.add.reduceat(g, starts)
        mx = np.maximum.reduceat(g, starts)
        gmax = int(g.max()) if len(g) else 0
        if float(gmax) * gmax * len(g) >= 9.2e18:   # int64 would overflow
            g2 = g.astype(object) * g.astype(object)
        else:
            g2 = g * g
        sxx = np.add.reduceat(g2, starts).astype(np.float64)
        nf = n.astype(np.float64)
        sxf = sx.astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = sxf / nf
            var = (sxx - sxf * sxf / nf) / (nf - 1.0)
            cv = np.sqrt(var) / mean
        valid = (n >= 2) & (var > 0.0) & (sx > 0)
        return pa.table(
            {
                "user_id": pa.array(gu[starts], pa.int64()),
                "n_gaps": pa.array(n, pa.int64()),
                "mean_gap_s": pa.array(np.round(mean, 6), pa.float64()),
                "cv_gap": pa.array(
                    np.round(np.where(valid, cv, 0.0), 6), pa.float64(),
                    mask=~valid,
                ),
                "max_gap_s": pa.array(mx, pa.int64()),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(add_prt, batch_format="pyarrow")
        .groupby("prt")
        .map_groups(
            lambda g: scan(g.drop_columns(["prt"])), batch_format="pyarrow"
        )
    )


USER_INTERARRIVAL_SQL = """
WITH e AS (SELECT user_id::BIGINT AS user_id, epoch_us(ts) AS tu FROM events),
g0 AS (
  SELECT user_id,
         (tu - lag(tu) OVER (PARTITION BY user_id ORDER BY tu)) // 1000000
           AS gap
  FROM e
),
g AS (SELECT user_id, gap FROM g0 WHERE gap IS NOT NULL),
s AS (
  SELECT user_id,
         count(*)::BIGINT AS n_gaps,
         sum(gap)::BIGINT AS sx,
         CAST(sum(CAST(gap AS HUGEINT) * gap) AS DOUBLE) AS sxx,
         max(gap)::BIGINT AS max_gap_s
  FROM g GROUP BY 1
)
SELECT user_id, n_gaps,
       round(CAST(sx AS DOUBLE) / n_gaps, 6) AS mean_gap_s,
       CASE WHEN n_gaps >= 2
                 AND (sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n_gaps)
                     / (n_gaps - 1) > 0
                 AND sx > 0
            THEN round(
              sqrt((sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n_gaps)
                   / (n_gaps - 1))
              / (CAST(sx AS DOUBLE) / n_gaps), 6) END AS cv_gap,
       max_gap_s
FROM s
"""


# ---------------------------------------------------------------------------
# Rolling median over hourly means (windowed quantile per event type)
# ---------------------------------------------------------------------------


def rolling_median_hourly(sf_dir: str, window: int = 5):
    """Rolling median (ROWS ``window-1`` PRECEDING .. CURRENT) of each
    event type's hourly mean value -- the robust smoother a tier-level
    monitor runs where ``filter_median_simple`` runs on raw signals.

    Exactness without any rounding bridge: hourly means are centi-quantized
    to exact int64 (the cusum/ewma trick); the median of <=``window``
    INTEGERS interpolated at q=0.5 is ``(a+b)/2`` -- exact dyadic in
    float64 whichever lerp formula the engine uses -- so Ray and DuckDB
    produce bit-identical doubles.

    Scale shape: per-batch (type, bucket) integer partials, one hash(type)
    exchange of hourly-bucket-bounded rows, then a vectorized
    sliding-window sort per type (window x buckets, no per-row Python)."""
    ev = _read_events(sf_dir, ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (_ts_us(t["ts"]) // 1_000_000) // 3600
        val_u = np.rint(_np(t["value"]) * MICRO).astype(np.int64)
        if not len(codes):
            return pa.table(
                {"event_type": pa.nulls(0, pa.string()),
                 "bucket": pa.nulls(0, pa.int64()),
                 "sum_u": pa.nulls(0, pa.int64()),
                 "n": pa.nulls(0, pa.int64())}
            )
        key = codes * (1 << 44) + bucket
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        sums = np.add.reduceat(val_u[order], starts)
        n = np.diff(np.append(starts, len(ks)))
        sel = order[starts]
        return pa.table(
            {
                "event_type": et.take(pa.array(sel)).cast(pa.string()),
                "bucket": pa.array(bucket[sel], pa.int64()),
                "sum_u": pa.array(sums, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("bucket", pa.int64()),
            ("hourly_mean_c", pa.float64()),
            ("roll_med", pa.float64()),
        ]
    )

    def scan(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        b = _np(g["bucket"])
        su = _np(g["sum_u"])
        nn = _np(g["n"])
        order = np.argsort(b, kind="stable")
        bs = b[order]
        starts = np.flatnonzero(np.concatenate(([True], bs[1:] != bs[:-1])))
        ub = bs[starts]
        usum = np.add.reduceat(su[order], starts)
        un = np.add.reduceat(nn[order], starts)
        x = (usum / 1_000_000.0) / un
        xc = _half_away_c(x)                     # exact centi int64
        m = len(xc)
        if m == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        SENT = np.iinfo(np.int64).max
        pad = np.concatenate((np.full(window - 1, SENT, np.int64), xc))
        win = np.lib.stride_tricks.sliding_window_view(pad, window).copy()
        srt = np.sort(win, axis=1)               # sentinels sort last
        k = np.minimum(np.arange(m) + 1, window)
        lo = (k - 1) // 2
        hi = k // 2
        rows = np.arange(m)
        med = (srt[rows, lo] + srt[rows, hi]) / 2.0
        src = g["event_type"][0].as_py()
        return pa.table(
            {
                "event_type": pa.array([src] * m, pa.string()),
                "bucket": pa.array(ub, pa.int64()),
                "hourly_mean_c": pa.array(xc / 100.0, pa.float64()),
                "roll_med": pa.array(med / 100.0, pa.float64()),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow", batch_size=1_048_576)
        .groupby("event_type")
        .map_groups(scan, batch_format="pyarrow")
    )


ROLLING_MEDIAN_HOURLY_SQL = """
WITH agg AS (
  SELECT event_type, (epoch_us(ts) // 1000000) // 3600 AS bucket,
         SUM(CAST(round(value * 1000000, 0) AS BIGINT)) AS sum_u,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
x AS (
  SELECT event_type, bucket,
         CAST(round((sum_u / 1000000.0) / n * 100, 0) AS BIGINT) AS xc
  FROM agg
)
SELECT event_type, bucket,
       xc / 100.0 AS hourly_mean_c,
       quantile_cont(xc, 0.5) OVER (
         PARTITION BY event_type ORDER BY bucket
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
       ) / 100.0 AS roll_med
FROM x
"""


# ---------------------------------------------------------------------------
# Rolling 24h distinct active users per event type (sliding COUNT DISTINCT)
# ---------------------------------------------------------------------------


def rolling_active_users(sf_dir: str, window_h: int = 24,
                         buckets: int = 64):
    """For every (event_type, hour) that has events: the number of DISTINCT
    users active in the trailing ``window_h``-hour window ending at that
    hour -- the sliding COUNT(DISTINCT) behind DAU-style health metrics.

    All-integer exact (no float anywhere).  Scale shape: each batch first
    collapses to its DISTINCT (type, hour, user) triples; hours are then
    range-BLOCKED at the window width, and each triple replicates to at
    most TWO blocks (its own, plus the next one when its window reaches
    into it) before one hash(type, block) exchange -- the shuffled volume
    is <=2x the distinct-triple count (a naive expand-to-target-hours
    design ships window_h x; measured 12x less at 10M rows).  Per
    partition, a fully vectorized kernel merges each user's hour intervals
    (gap <= window-1 merges), scatters +/-1 coverage diffs per block
    target, and prefix-sums to per-target distinct-user counts -- a user's
    merged intervals are disjoint, so coverage IS the distinct count.
    Target hours with no event of their own (the window covers them but
    nothing happened AT them) are dropped, matching the SQL mirror's
    join-on-existing-hours semantics.  Duplicate triples across batches
    are harmless: they merge into the same interval."""
    B = window_h
    ev = _read_events(sf_dir, ["ts", "event_type", "user_id"])

    part_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("blk", pa.int64()),
            ("h", pa.int64()),
            ("user_id", pa.int64()),
            ("prt", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=part_schema)
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        hour = (_ts_us(t["ts"]) // 1_000_000) // 3600
        uid = _np(t["user_id"]).astype(np.int64)
        # batch-local distinct triples via lexsort boundaries (no key
        # packing, so no range guards needed)
        order = np.lexsort((uid, hour, codes))
        cs, hs, us = codes[order], hour[order], uid[order]
        first = np.concatenate(
            ([True],
             (cs[1:] != cs[:-1]) | (hs[1:] != hs[:-1]) | (us[1:] != us[:-1]))
        )
        c, h, u = cs[first], hs[first], us[first]
        blk = h // B
        fwd = (h + B - 1) // B > blk       # window reaches the next block
        c_r = np.concatenate((c, c[fwd]))
        h_r = np.concatenate((h, h[fwd]))
        u_r = np.concatenate((u, u[fwd]))
        b_r = np.concatenate((blk, blk[fwd] + 1))
        th = np.array(
            [zlib.crc32(s.encode()) for s in et.dictionary.to_pylist()],
            dtype=np.int64,
        )
        mix = th[c_r] * 1_000_003 + b_r
        return pa.table(
            {
                "event_type": et.dictionary.take(pa.array(c_r)).cast(
                    pa.string()),
                "blk": pa.array(b_r, pa.int64()),
                "h": pa.array(h_r, pa.int64()),
                "user_id": pa.array(u_r, pa.int64()),
                "prt": pa.array(hash_prt(mix, buckets), pa.int64()),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("bucket", pa.int64()),
            ("users_24h", pa.int64()),
        ]
    )

    def count_distinct(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        if g.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        et = g["event_type"].combine_chunks().dictionary_encode()
        c = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        blk = _np(g["blk"])
        h = _np(g["h"])
        uid = _np(g["user_id"])
        order = np.lexsort((h, uid, blk, c))
        cs, bs, us, hs = c[order], blk[order], uid[order], h[order]
        new_seg = np.concatenate(
            ([True], (cs[1:] != cs[:-1]) | (bs[1:] != bs[:-1]))
        )
        new_user = new_seg | np.concatenate(([True], us[1:] != us[:-1]))
        gap = np.concatenate(([0], hs[1:] - hs[:-1]))
        istart = new_user | (gap > B - 1)  # a user's merged-interval starts
        seg_id = np.cumsum(new_seg) - 1
        s_idx = np.flatnonzero(istart)
        e_idx = np.append(s_idx[1:] - 1, len(hs) - 1)
        nseg = int(seg_id[-1]) + 1
        t0 = bs[s_idx] * B                 # block start per interval
        lo = np.maximum(hs[s_idx], t0) - t0
        hi = np.minimum(hs[e_idx] + B - 1, t0 + B - 1) - t0
        base = seg_id[s_idx] * (B + 1)
        diff = np.zeros(nseg * (B + 1), np.int64)
        np.add.at(diff, base + lo, 1)
        np.add.at(diff, base + hi + 1, -1)
        cov = np.cumsum(diff.reshape(nseg, B + 1), axis=1)[:, :B]
        member = (hs // B) == bs           # replicas mark no existence
        exist = np.zeros(nseg * B, bool)
        exist[seg_id[member] * B + (hs[member] - bs[member] * B)] = True
        exist = exist.reshape(nseg, B)
        rows_seg, rows_t = np.nonzero(exist)
        seg_first = np.flatnonzero(new_seg)
        return pa.table(
            {
                "event_type": et.take(
                    pa.array(order[seg_first[rows_seg]])
                ).cast(pa.string()),
                "bucket": pa.array(
                    bs[seg_first][rows_seg] * B + rows_t, pa.int64()
                ),
                "users_24h": pa.array(
                    cov[rows_seg, rows_t], pa.int64()
                ),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow", batch_size=1_048_576)
        .groupby("prt")
        .map_groups(
            lambda g: count_distinct(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


ROLLING_ACTIVE_USERS_SQL = """
WITH t AS (
  SELECT DISTINCT event_type,
         (epoch_us(ts) // 1000000) // 3600 AS hour,
         user_id::BIGINT AS user_id
  FROM events
),
h AS (SELECT DISTINCT event_type, hour FROM t)
SELECT h.event_type, h.hour AS bucket,
       count(DISTINCT t.user_id)::BIGINT AS users_24h
FROM h JOIN t ON t.event_type = h.event_type
            AND t.hour BETWEEN h.hour - 23 AND h.hour
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Per-session statistics (sessionization rollup)
# ---------------------------------------------------------------------------


def user_session_stats(sf_dir: str, gap_s: int = _SESSION_GAP_S,
                       buckets: int | None = None):
    """One row per (user, session): event count and wall duration in
    seconds -- the sessionization rollup engagement metrics read.

    All-integer exact.  Scale shape: the user_session_ids exchange and
    segmented scan, with the per-session aggregation fused into the SAME
    partition pass (a user's rows co-locate, so sessions never straddle
    partitions -- no second exchange)."""
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["event_id", "user_id", "ts"])

    def add_prt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        uid = _np(t["user_id"]).astype(np.int64)
        return t.append_column(
            "prt", pa.array(hash_prt(uid, buckets), pa.int64())
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("session_id", pa.int64()),
            ("n_events", pa.int64()),
            ("duration_s", pa.int64()),
        ]
    )

    def scan(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        uid = _np(t["user_id"]).astype(np.int64)
        ts = _ts_us(t["ts"])
        eid = _np(t["event_id"]).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        u_s, t_s = uid[order], ts[order]
        new_user = np.concatenate(([True], u_s[1:] != u_s[:-1]))
        new_sess = new_user | np.concatenate(
            ([True], np.diff(t_s) > gap_s * 1_000_000)
        )
        sstarts = np.flatnonzero(new_sess)
        slen = np.diff(np.append(sstarts, len(u_s))).astype(np.int64)
        send = np.append(sstarts[1:] - 1, len(u_s) - 1)
        # 0-based session id within each user
        sess_seq = np.arange(len(sstarts), dtype=np.int64)
        ustarts_in_sess = np.flatnonzero(new_user[sstarts])
        ubase = sess_seq[ustarts_in_sess]
        ulen = np.diff(np.append(ustarts_in_sess, len(sstarts)))
        sid = sess_seq - np.repeat(ubase, ulen)
        return pa.table(
            {
                "user_id": pa.array(u_s[sstarts], pa.int64()),
                "session_id": pa.array(sid, pa.int64()),
                "n_events": pa.array(slen, pa.int64()),
                "duration_s": pa.array(
                    (t_s[send] - t_s[sstarts]) // 1_000_000, pa.int64()
                ),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(add_prt, batch_format="pyarrow")
        .groupby("prt")
        .map_groups(
            lambda g: scan(g.drop_columns(["prt"])), batch_format="pyarrow"
        )
    )


USER_SESSION_STATS_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         SUM(gap) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM g
)
SELECT user_id::BIGINT AS user_id, session_id::BIGINT AS session_id,
       count(*)::BIGINT AS n_events,
       (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_s
FROM s GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Full-outer join of two hourly series (side-by-side comparison)
# ---------------------------------------------------------------------------


def type_hourly_full_join(sf_dir: str, type_a: str = "click",
                          type_b: str = "purchase", buckets: int = 32):
    """Hourly event counts of two types side by side via a FULL OUTER join
    on the hour bucket -- hours where only one type fired keep the other
    side NULL (the comparison dashboards actually want, vs an inner join
    silently dropping one-sided hours).

    Scale shape: each side collapses to (bucket, count) partials per batch
    and merges exactly through one hash(bucket) exchange (hourly-bounded);
    the full join is stages/joins.keyed_equijoin(how='full') -- the right
    side carries its bucket as a data column so the driver-visible key is
    ``coalesce(left, right)``, mirroring SQL.  The two-type predicate is
    pushed into the parquet scan (row-group stats + decode-time filter),
    so only the compared types' rows ever leave the read."""
    import pyarrow.compute as pc

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type"],
        filter=pc.field("event_type").isin([type_a, type_b]),
    )
    from ..stages.joins import keyed_equijoin

    def side(type_name: str, col: str):
        schema = pa.schema(
            [("bucket", pa.int64()), (col, pa.int64()), ("prt", pa.int64())]
        )

        def part(t: pa.Table) -> pa.Table:
            t = t.combine_chunks()
            m = pc.equal(t["event_type"], type_name)
            hour = (_ts_us(t["ts"]) // 1_000_000) // 3600
            hour = hour[m.to_numpy(zero_copy_only=False)]
            if not len(hour):
                return pa.Table.from_pylist([], schema=schema)
            ub, cnt = np.unique(hour, return_counts=True)
            return pa.table(
                {"bucket": pa.array(ub, pa.int64()),
                 col: pa.array(cnt.astype(np.int64), pa.int64()),
                 "prt": pa.array(hash_prt(ub, buckets), pa.int64())},
                schema=schema,
            )

        out_schema = pa.schema([("bucket", pa.int64()), (col, pa.int64())])

        def merge(g: pa.Table) -> pa.Table:
            g = g.combine_chunks()
            if g.num_rows == 0:
                return pa.Table.from_pylist([], schema=out_schema)
            b = _np(g["bucket"])
            c = _np(g[col])
            order = np.argsort(b, kind="stable")
            bs = b[order]
            starts = np.flatnonzero(
                np.concatenate(([True], bs[1:] != bs[:-1]))
            )
            return pa.table(
                {"bucket": pa.array(bs[starts], pa.int64()),
                 col: pa.array(np.add.reduceat(c[order], starts),
                               pa.int64())},
                schema=out_schema,
            )

        return (
            ev.map_batches(part, batch_format="pyarrow",
                           batch_size=1_048_576)
            .groupby("prt")
            .map_groups(lambda g: merge(g.drop_columns(["prt"])),
                        batch_format="pyarrow")
        ), out_schema

    a, a_schema = side(type_a, "a_cnt")
    b, b_schema = side(type_b, "b_cnt")

    def dup_key(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        return t.append_column("rb", t["bucket"])

    b = b.map_batches(dup_key, batch_format="pyarrow")
    b_schema = b_schema.append(pa.field("rb", pa.int64()))
    j = keyed_equijoin(a, b, on=("bucket", "bucket"), buckets=buckets,
                       how="full", schemas=(a_schema, b_schema))

    final_schema = pa.schema(
        [("bucket", pa.int64()), ("a_cnt", pa.int64()),
         ("b_cnt", pa.int64())]
    )

    def finalize(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        key = pc.coalesce(t["bucket"], t["rb"])
        return pa.table(
            {"bucket": key, "a_cnt": t["a_cnt"], "b_cnt": t["b_cnt"]},
            schema=final_schema,
        )

    return j.map_batches(finalize, batch_format="pyarrow")


TYPE_HOURLY_FULL_JOIN_SQL = """
WITH a AS (
  SELECT (epoch_us(ts) // 1000000) // 3600 AS bucket,
         count(*)::BIGINT AS a_cnt
  FROM events WHERE event_type = 'click' GROUP BY 1
),
b AS (
  SELECT (epoch_us(ts) // 1000000) // 3600 AS bucket,
         count(*)::BIGINT AS b_cnt
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT coalesce(a.bucket, b.bucket) AS bucket, a.a_cnt, b.b_cnt
FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
"""


# ---------------------------------------------------------------------------
# RANK / DENSE_RANK per distinct value (window-function family completeness)
# ---------------------------------------------------------------------------


def value_rank_dense(sf_dir: str, buckets: int | None = None):
    """Per event type, the RANK() and DENSE_RANK() of every DISTINCT value
    (ascending) -- one row per (type, value), which is what rank lookups
    consume and what keeps the output distinct-value-bounded instead of
    row-bounded.

    All-integer exact: per-batch (type, value, count) partials, one
    hash(type) exchange of distinct-value-bounded rows, then per type a
    vectorized sort + cumsum -- RANK of a value = rows strictly below it
    + 1 (prefix sum of merged counts), DENSE_RANK = its run index + 1."""
    ev = _read_events(sf_dir, ["event_type", "value"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("value", pa.float64()),
         ("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=part_schema)
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = _np(t["value"])
        order = np.lexsort((v, codes))
        cs, vs = codes[order], v[order]
        first = np.concatenate(
            ([True], (cs[1:] != cs[:-1]) | (vs[1:] != vs[:-1]))
        )
        starts = np.flatnonzero(first)
        n = np.diff(np.append(starts, len(cs)))
        sel = order[starts]
        return pa.table(
            {
                "event_type": et.take(pa.array(sel)).cast(pa.string()),
                "value": pa.array(vs[starts], pa.float64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("event_type", pa.string()), ("value", pa.float64()),
         ("rnk", pa.int64()), ("drk", pa.int64())]
    )

    def rank_scan(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        if g.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        v = _np(g["value"])
        n = _np(g["n"])
        order = np.argsort(v, kind="stable")
        vs, ns = v[order], n[order]
        first = np.concatenate(([True], vs[1:] != vs[:-1]))
        starts = np.flatnonzero(first)
        merged = np.add.reduceat(ns, starts)
        below = np.concatenate(([0], np.cumsum(merged)[:-1]))
        src = g["event_type"][0].as_py()
        m = len(starts)
        return pa.table(
            {
                "event_type": pa.array([src] * m, pa.string()),
                "value": pa.array(vs[starts], pa.float64()),
                "rnk": pa.array(below + 1, pa.int64()),
                "drk": pa.array(np.arange(1, m + 1, dtype=np.int64),
                                pa.int64()),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow", batch_size=1_048_576)
        .groupby("event_type")
        .map_groups(rank_scan, batch_format="pyarrow")
    )


VALUE_RANK_DENSE_SQL = """
SELECT DISTINCT event_type, value,
       rank() OVER (PARTITION BY event_type ORDER BY value) AS rnk,
       dense_rank() OVER (PARTITION BY event_type ORDER BY value) AS drk
FROM events
"""


# ---------------------------------------------------------------------------
# Ordered string aggregation: per-user event-type path
# ---------------------------------------------------------------------------


def user_event_path(sf_dir: str, max_len: int = 64,
                    buckets: int | None = None):
    """Per user: the chronologically ordered path of event types (first
    ``max_len`` events) joined with '>' plus the total event count -- the
    ordered STRING_AGG shape funnel exploration reads.

    Scale shape: one hash(user) exchange, per-partition vectorized sort;
    the join to a path string is a per-USER Python join over an
    explicitly CAPPED prefix (max_len), so output rows are
    O(users x max_len chars) regardless of per-user event counts.  The
    tie order (ts, then event_id) is total, so the oracle mirror is
    deterministic."""
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def add_prt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        uid = _np(t["user_id"]).astype(np.int64)
        return t.append_column(
            "prt", pa.array(hash_prt(uid, buckets), pa.int64())
        )

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("n_events", pa.int64()),
         ("path", pa.string())]
    )

    def scan(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        uid = _np(t["user_id"]).astype(np.int64)
        ts = _ts_us(t["ts"])
        eid = _np(t["event_id"]).astype(np.int64)
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False)
        names = et.dictionary.to_pylist()
        order = np.lexsort((eid, ts, uid))
        u_s, c_s = uid[order], codes[order]
        starts = np.flatnonzero(
            np.concatenate(([True], u_s[1:] != u_s[:-1]))
        )
        n = np.diff(np.append(starts, len(u_s))).astype(np.int64)
        paths = [
            ">".join(names[c] for c in c_s[s: s + min(int(k), max_len)])
            for s, k in zip(starts, n)
        ]
        return pa.table(
            {
                "user_id": pa.array(u_s[starts], pa.int64()),
                "n_events": pa.array(n, pa.int64()),
                "path": pa.array(paths, pa.string()),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(add_prt, batch_format="pyarrow")
        .groupby("prt")
        .map_groups(
            lambda g: scan(g.drop_columns(["prt"])), batch_format="pyarrow"
        )
    )


USER_EVENT_PATH_SQL = """
WITH o AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
)
SELECT user_id::BIGINT AS user_id,
       (SELECT count(*) FROM o o2 WHERE o2.user_id = o.user_id)::BIGINT
         AS n_events,
       string_agg(event_type, '>' ORDER BY rn) AS path
FROM o WHERE rn <= 64
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Gaps-and-islands: contiguous busy-hour runs per event type
# ---------------------------------------------------------------------------


def busy_hour_islands(sf_dir: str, min_count: int = 2):
    """Contiguous runs ("islands") of hours where an event type fired at
    least ``min_count`` times: one row per run with its start/end hour,
    length and total events -- the gaps-and-islands shape burst detection
    reads.

    All-integer exact.  Scale shape: per-batch (type, hour) count partials
    (hour-domain bounded), one hash(type) exchange, then a vectorized
    island scan per type: sort hours, threshold, run boundaries where the
    hour step exceeds 1, segment reduceat for length/total."""
    ev = _read_events(sf_dir, ["ts", "event_type"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("h", pa.int64()), ("c", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=part_schema)
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        hour = (_ts_us(t["ts"]) // 1_000_000) // 3600
        order = np.lexsort((hour, codes))
        cs, hs = codes[order], hour[order]
        first = np.concatenate(
            ([True], (cs[1:] != cs[:-1]) | (hs[1:] != hs[:-1]))
        )
        starts = np.flatnonzero(first)
        n = np.diff(np.append(starts, len(cs)))
        sel = order[starts]
        return pa.table(
            {
                "event_type": et.take(pa.array(sel)).cast(pa.string()),
                "h": pa.array(hs[starts], pa.int64()),
                "c": pa.array(n.astype(np.int64), pa.int64()),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("run_start", pa.int64()),
            ("run_end", pa.int64()),
            ("n_hours", pa.int64()),
            ("total_events", pa.int64()),
        ]
    )

    def islands(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        if g.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        h = _np(g["h"])
        c = _np(g["c"])
        order = np.argsort(h, kind="stable")
        hs = h[order]
        # merge duplicate hours across batch partials
        ustarts = np.flatnonzero(
            np.concatenate(([True], hs[1:] != hs[:-1]))
        )
        uh = hs[ustarts]
        uc = np.add.reduceat(c[order], ustarts)
        keep = uc >= min_count
        uh, uc = uh[keep], uc[keep]
        if not len(uh):
            return pa.Table.from_pylist([], schema=out_schema)
        new_run = np.concatenate(([True], np.diff(uh) > 1))
        rstarts = np.flatnonzero(new_run)
        rend = np.append(rstarts[1:] - 1, len(uh) - 1)
        src = g["event_type"][0].as_py()
        m = len(rstarts)
        return pa.table(
            {
                "event_type": pa.array([src] * m, pa.string()),
                "run_start": pa.array(uh[rstarts], pa.int64()),
                "run_end": pa.array(uh[rend], pa.int64()),
                "n_hours": pa.array(
                    np.diff(np.append(rstarts, len(uh))).astype(np.int64),
                    pa.int64(),
                ),
                "total_events": pa.array(
                    np.add.reduceat(uc, rstarts), pa.int64()
                ),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow", batch_size=1_048_576)
        .groupby("event_type")
        .map_groups(islands, batch_format="pyarrow")
    )


BUSY_HOUR_ISLANDS_SQL = """
WITH a AS (
  SELECT event_type, (epoch_us(ts) // 1000000) // 3600 AS h,
         count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
),
b AS (
  SELECT *, h - row_number() OVER (PARTITION BY event_type ORDER BY h)
           AS grp
  FROM a WHERE c >= 2
)
SELECT event_type, min(h)::BIGINT AS run_start, max(h)::BIGINT AS run_end,
       count(*)::BIGINT AS n_hours, sum(c)::BIGINT AS total_events
FROM b GROUP BY event_type, grp
"""


# ---------------------------------------------------------------------------
# Day-of-week x hour-of-day activity profile
# ---------------------------------------------------------------------------


def activity_profile(sf_dir: str):
    """Event counts per (event_type, day-of-week, hour-of-day) -- the
    weekly activity heatmap a monitoring dashboard renders and seasonal
    models condition on.  All-integer exact; domain-bounded output
    (types x 7 x 24).

    Scale shape: per-batch counts collapse to the bounded (type, dow, hod)
    domain BEFORE one tiny exchange -- the groupby moves at most
    types x 168 rows per batch regardless of event volume."""
    ev = _read_events(sf_dir, ["ts", "event_type"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("dow", pa.int64()),
         ("hod", pa.int64()), ("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=part_schema)
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        us = _ts_us(t["ts"])
        days = us // 86_400_000_000
        dow = (days + 4) % 7        # epoch day 0 = Thursday; Sunday = 0
        hod = (us // 3_600_000_000) % 24
        key = codes * 168 + dow * 24 + hod
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        n = np.diff(np.append(starts, len(ks)))
        uk = ks[starts]
        return pa.table(
            {
                "event_type": et.take(
                    pa.array(order[starts])).cast(pa.string()),
                "dow": pa.array((uk // 24) % 7, pa.int64()),
                "hod": pa.array(uk % 24, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("event_type", pa.string()), ("dow", pa.int64()),
         ("hod", pa.int64()), ("n", pa.int64())]
    )

    def merge(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        if g.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        key = _np(g["dow"]) * 24 + _np(g["hod"])
        n = _np(g["n"])
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        sums = np.add.reduceat(n[order], starts)
        uk = ks[starts]
        src = g["event_type"][0].as_py()
        return pa.table(
            {
                "event_type": pa.array([src] * len(uk), pa.string()),
                "dow": pa.array(uk // 24, pa.int64()),
                "hod": pa.array(uk % 24, pa.int64()),
                "n": pa.array(sums, pa.int64()),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow", batch_size=1_048_576)
        .groupby("event_type")
        .map_groups(merge, batch_format="pyarrow")
    )


ACTIVITY_PROFILE_SQL = """
SELECT event_type,
       dayofweek(ts)::BIGINT AS dow,
       hour(ts)::BIGINT AS hod,
       count(*)::BIGINT AS n
FROM events GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Above-group-average filter (correlated-subquery shape)
# ---------------------------------------------------------------------------


def above_avg_events(sf_dir: str):
    """Per event type: how many events exceed THEIR TYPE'S mean value --
    the correlated-scalar-subquery shape (every row compared against its
    group's aggregate).

    Exact with no float comparison anywhere: values quantize to micro-unit
    int64, and ``v > mean`` is evaluated as the integer cross-multiply
    ``v_u * n > sum_u`` on both sides, so boundary rows cannot flip on
    float noise.  Scale shape: pass 1 reduces to per-type (sum_u, n)
    (domain-sized, broadcast via closure); pass 2 is an exchange-free
    per-batch count -- two reads, zero shuffles."""
    import pyarrow.compute as pc  # noqa: F401  (parity with house imports)

    ev = _read_events(sf_dir, ["event_type", "value"])

    def mom_partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {"event_type": pa.nulls(0, pa.string()),
                 "sum_u": pa.nulls(0, pa.int64()),
                 "n": pa.nulls(0, pa.int64())}
            )
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vu = np.rint(_np(t["value"]) * MICRO).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        cs = codes[order]
        starts = np.flatnonzero(np.concatenate(([True], cs[1:] != cs[:-1])))
        return pa.table(
            {
                "event_type": et.take(pa.array(order[starts])).cast(
                    pa.string()),
                "sum_u": pa.array(np.add.reduceat(vu[order], starts),
                                  pa.int64()),
                "n": pa.array(
                    np.diff(np.append(starts, len(cs))).astype(np.int64),
                    pa.int64()),
            }
        )

    moments = (
        ev.map_batches(mom_partial, batch_format="pyarrow",
                       batch_size=1_048_576)
        .take_all()  # domain-sized: one row per type per batch
    )
    agg: dict[str, list[int]] = {}
    for r in moments:
        a = agg.setdefault(r["event_type"], [0, 0])
        a[0] += int(r["sum_u"])
        a[1] += int(r["n"])

    out_schema = pa.schema(
        [("event_type", pa.string()), ("n_above", pa.int64()),
         ("n_total", pa.int64()), ("frac_above", pa.float64())]
    )

    def count_above(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vu = np.rint(_np(t["value"]) * MICRO).astype(np.int64)
        names = et.dictionary.to_pylist()
        sums = np.array([agg[s][0] for s in names], np.int64)
        ns = np.array([agg[s][1] for s in names], np.int64)
        # v > mean as integer cross-multiply: v_u * n > sum_u
        if len(vu) and float(np.abs(vu).max()) * float(ns.max()) >= 9.2e18:
            raise ValueError(
                "above_avg_events: v_u * n overflows int64; rescale the "
                "quantization unit (DuckDB's BIGINT mirror overflows at the "
                "same point)"
            )
        above = (vu * ns[codes]) > sums[codes]
        order = np.argsort(codes, kind="stable")
        cs = codes[order]
        starts = np.flatnonzero(np.concatenate(([True], cs[1:] != cs[:-1])))
        n_above = np.add.reduceat(above[order].astype(np.int64), starts)
        n_tot = np.diff(np.append(starts, len(cs))).astype(np.int64)
        return pa.table(
            {
                "event_type": et.take(pa.array(order[starts])).cast(
                    pa.string()),
                "n_above": pa.array(n_above, pa.int64()),
                "n_total": pa.array(n_tot, pa.int64()),
                "frac_above": pa.nulls(len(starts), pa.float64()),
            },
            schema=out_schema,
        )

    parts = ev.map_batches(
        count_above, batch_format="pyarrow", batch_size=1_048_576
    ).take_all()  # domain-sized
    fin: dict[str, list[int]] = {}
    for r in parts:
        a = fin.setdefault(r["event_type"], [0, 0])
        a[0] += int(r["n_above"])
        a[1] += int(r["n_total"])
    keys = sorted(fin)
    na = np.array([fin[k][0] for k in keys], np.int64)
    nt = np.array([fin[k][1] for k in keys], np.int64)
    return pa.table(
        {
            "event_type": pa.array(keys, pa.string()),
            "n_above": pa.array(na, pa.int64()),
            "n_total": pa.array(nt, pa.int64()),
            "frac_above": pa.array(
                np.round(na.astype(np.float64) / nt.astype(np.float64), 6),
                pa.float64()),
        }
    )


ABOVE_AVG_EVENTS_SQL = """
WITH v AS (
  SELECT event_type,
         CAST(round(value * 1000000, 0) AS BIGINT) AS vu
  FROM events
),
m AS (
  SELECT event_type, sum(vu)::BIGINT AS sum_u, count(*)::BIGINT AS n
  FROM v GROUP BY 1
)
SELECT v.event_type,
       sum(CASE WHEN v.vu * m.n > m.sum_u THEN 1 ELSE 0 END)::BIGINT
         AS n_above,
       count(*)::BIGINT AS n_total,
       round(sum(CASE WHEN v.vu * m.n > m.sum_u THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE, 6) AS frac_above
FROM v JOIN m USING (event_type)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Set operation: users active in BOTH halves of the time range (INTERSECT)
# ---------------------------------------------------------------------------


def users_both_halves(sf_dir: str, buckets: int | None = None):
    """User ids with events in BOTH the first and second half of the
    global time range -- the INTERSECT set-operation shape (retained-user
    audit).  All-integer exact.

    Scale shape: a tiny min/max pass pins the global midpoint; the main
    pass collapses each batch to distinct (user, half) pairs BEFORE one
    hash(user) exchange, and each partition emits the users carrying both
    halves.  Shuffled volume is 2x distinct users, not events."""
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["user_id", "ts"])

    # global [min, max] from batch partials (metadata-sized)
    def mm(t: pa.Table) -> pa.Table:
        us = _ts_us(t["ts"])
        if not len(us):
            return pa.Table.from_pylist(
                [], schema=pa.schema([("lo", pa.int64()),
                                      ("hi", pa.int64())]))
        return pa.table({"lo": pa.array([int(us.min())], pa.int64()),
                         "hi": pa.array([int(us.max())], pa.int64())})

    parts = ev.map_batches(mm, batch_format="pyarrow",
                           batch_size=1_048_576).take_all()
    lo = min(r["lo"] for r in parts)
    hi = max(r["hi"] for r in parts)
    mid = (lo + hi) // 2  # first half: ts_us <= mid (both sides mirror)

    part_schema = pa.schema(
        [("user_id", pa.int64()), ("half", pa.int8()), ("prt", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=part_schema)
        uid = _np(t["user_id"]).astype(np.int64)
        half = (_ts_us(t["ts"]) > mid).astype(np.int64)
        key = uid * 2 + half
        uniq = np.unique(key)
        u = uniq >> 1
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "half": pa.array((uniq & 1).astype(np.int8), pa.int8()),
                "prt": pa.array(hash_prt(u, buckets), pa.int64()),
            },
            schema=part_schema,
        )

    out_schema = pa.schema([("user_id", pa.int64())])

    def intersect(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        if g.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        uid = _np(g["user_id"])
        half = g["half"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = uid * 2 + half
        uniq = np.unique(key)           # dedup cross-batch partials
        u = uniq >> 1
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        n_halves = np.diff(np.append(starts, len(u)))
        both = u[starts][n_halves == 2]
        return pa.table({"user_id": pa.array(both, pa.int64())},
                        schema=out_schema)

    return (
        ev.map_batches(partial, batch_format="pyarrow",
                       batch_size=1_048_576)
        .groupby("prt")
        .map_groups(
            lambda g: intersect(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


USERS_BOTH_HALVES_SQL = """
WITH mm AS (
  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
),
mid AS (SELECT (lo + hi) // 2 AS m FROM mm)
SELECT user_id::BIGINT AS user_id FROM events, mid
WHERE epoch_us(ts) <= mid.m
INTERSECT
SELECT user_id::BIGINT AS user_id FROM events, mid
WHERE epoch_us(ts) > mid.m
"""


# ---------------------------------------------------------------------------
# Two-level aggregate: average over users of per-user totals
# ---------------------------------------------------------------------------


def avg_user_total_by_type(sf_dir: str, buckets: int | None = None):
    """Per event type: the AVERAGE over users of each user's total value --
    the nested-aggregate shape (aggregate of group aggregates), which a
    single GROUP BY cannot express.

    Exactness: per-(type, user) totals are exact micro-unit int64; the
    outer average divides the exact sum of user totals by the exact user
    count in one mirrored float expression.  Scale shape: batches collapse
    to (type, user) partials before ONE hash(type, user) exchange; the
    outer level reduces types x users rows to types rows."""
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["event_type", "user_id", "value"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("user_id", pa.int64()),
         ("sum_u", pa.int64()), ("prt", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=part_schema)
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uid = _np(t["user_id"]).astype(np.int64)
        vu = np.rint(_np(t["value"]) * MICRO).astype(np.int64)
        order = np.lexsort((uid, codes))
        cs, us = codes[order], uid[order]
        first = np.concatenate(
            ([True], (cs[1:] != cs[:-1]) | (us[1:] != us[:-1]))
        )
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(vu[order], starts)
        sel = order[starts]
        mix = us[starts] * 1_000_003 + cs[starts]
        return pa.table(
            {
                "event_type": et.take(pa.array(sel)).cast(pa.string()),
                "user_id": pa.array(us[starts], pa.int64()),
                "sum_u": pa.array(sums, pa.int64()),
                "prt": pa.array(hash_prt(mix, buckets), pa.int64()),
            },
            schema=part_schema,
        )

    mid_schema = pa.schema(
        [("event_type", pa.string()), ("n_users", pa.int64()),
         ("tot_u", pa.int64())]
    )

    def inner_merge(g: pa.Table) -> pa.Table:
        """Merge partials to exact per-(type, user) totals, then reduce to
        per-type (n_users_in_partition, sum of user totals)."""
        g = g.combine_chunks()
        if g.num_rows == 0:
            return pa.Table.from_pylist([], schema=mid_schema)
        et = g["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uid = _np(g["user_id"])
        su = _np(g["sum_u"])
        order = np.lexsort((uid, codes))
        cs, us = codes[order], uid[order]
        first = np.concatenate(
            ([True], (cs[1:] != cs[:-1]) | (us[1:] != us[:-1]))
        )
        starts = np.flatnonzero(first)
        tot = np.add.reduceat(su[order], starts)
        tcodes = cs[starts]
        tstarts = np.flatnonzero(
            np.concatenate(([True], tcodes[1:] != tcodes[:-1]))
        )
        return pa.table(
            {
                "event_type": et.dictionary.take(
                    pa.array(tcodes[tstarts])).cast(pa.string()),
                "n_users": pa.array(
                    np.diff(np.append(tstarts, len(tcodes))).astype(
                        np.int64), pa.int64()),
                "tot_u": pa.array(np.add.reduceat(tot, tstarts), pa.int64()),
            },
            schema=mid_schema,
        )

    mids = (
        ev.map_batches(partial, batch_format="pyarrow",
                       batch_size=1_048_576)
        .groupby("prt")
        .map_groups(lambda g: inner_merge(g.drop_columns(["prt"])),
                    batch_format="pyarrow")
        .take_all()  # types x partitions rows -- metadata-sized
    )
    agg: dict[str, list[int]] = {}
    for r in mids:
        a = agg.setdefault(r["event_type"], [0, 0])
        a[0] += int(r["n_users"])
        a[1] += int(r["tot_u"])
    keys = sorted(agg)
    n = np.array([agg[k][0] for k in keys], np.int64)
    tot = np.array([agg[k][1] for k in keys], np.int64)
    avg = np.round(
        (tot.astype(np.float64) / n.astype(np.float64)) / MICRO, 6
    )
    return pa.table(
        {
            "event_type": pa.array(keys, pa.string()),
            "n_users": pa.array(n, pa.int64()),
            "avg_user_total": pa.array(avg, pa.float64()),
        }
    )


AVG_USER_TOTAL_SQL = """
WITH u AS (
  SELECT event_type, user_id,
         sum(CAST(round(value * 1000000, 0) AS BIGINT))::BIGINT AS sum_u
  FROM events GROUP BY 1, 2
)
SELECT event_type, count(*)::BIGINT AS n_users,
       round((CAST(sum(sum_u) AS DOUBLE) / count(*)::DOUBLE) / 1000000.0, 6)
         AS avg_user_total
FROM u GROUP BY 1
"""


def users_first_half_only(sf_dir: str, buckets: int | None = None):
    """User ids active in the FIRST half of the time range but not the
    second -- the EXCEPT set-operation shape (lapsed-user audit);
    same distinct-(user, half) machinery as users_both_halves."""
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["user_id", "ts"])

    def mm(t: pa.Table) -> pa.Table:
        us = _ts_us(t["ts"])
        if not len(us):
            return pa.Table.from_pylist(
                [], schema=pa.schema([("lo", pa.int64()),
                                      ("hi", pa.int64())]))
        return pa.table({"lo": pa.array([int(us.min())], pa.int64()),
                         "hi": pa.array([int(us.max())], pa.int64())})

    parts = ev.map_batches(mm, batch_format="pyarrow",
                           batch_size=1_048_576).take_all()
    lo = min(r["lo"] for r in parts)
    hi = max(r["hi"] for r in parts)
    mid = (lo + hi) // 2

    part_schema = pa.schema(
        [("user_id", pa.int64()), ("half", pa.int8()), ("prt", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=part_schema)
        uid = _np(t["user_id"]).astype(np.int64)
        half = (_ts_us(t["ts"]) > mid).astype(np.int64)
        key = uid * 2 + half
        uniq = np.unique(key)
        u = uniq >> 1
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "half": pa.array((uniq & 1).astype(np.int8), pa.int8()),
                "prt": pa.array(hash_prt(u, buckets), pa.int64()),
            },
            schema=part_schema,
        )

    out_schema = pa.schema([("user_id", pa.int64())])

    def except_scan(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        if g.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        uid = _np(g["user_id"])
        half = g["half"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = uid * 2 + half
        uniq = np.unique(key)
        u = uniq >> 1
        h = uniq & 1
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        n_halves = np.diff(np.append(starts, len(u)))
        only_first = (n_halves == 1) & (h[starts] == 0)
        return pa.table(
            {"user_id": pa.array(u[starts][only_first], pa.int64())},
            schema=out_schema,
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow",
                       batch_size=1_048_576)
        .groupby("prt")
        .map_groups(
            lambda g: except_scan(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


USERS_FIRST_HALF_ONLY_SQL = """
WITH mm AS (
  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
),
mid AS (SELECT (lo + hi) // 2 AS m FROM mm)
SELECT user_id::BIGINT AS user_id FROM events, mid
WHERE epoch_us(ts) <= mid.m
EXCEPT
SELECT user_id::BIGINT AS user_id FROM events, mid
WHERE epoch_us(ts) > mid.m
"""


# ---------------------------------------------------------------------------
# N-step funnel: furthest stage reached per user (strictly-ordered chain)
# ---------------------------------------------------------------------------

def funnel_stages(
    sf_dir: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    buckets: int | None = None,
    within_us: int | None = None,
):
    """Greedy N-step funnel per user: ``t_0`` = first ``steps[0]`` event,
    ``t_i`` = first ``steps[i]`` event STRICTLY after ``t_{i-1}`` (and,
    when ``within_us`` is set, at most that many microseconds after it --
    the time-bound funnel); emits (user_id, stage reached in 1..N,
    t_first, t_last) for every user who performed step 0 -- the
    generalized sibling of the 2-step ``user_conversion``.

    Scale shape: only funnel event types survive the map-side filter;
    step-0 rows collapse to per-user min partials per batch, later steps'
    rows ship raw (bounded by those types' row counts, never the stream);
    ONE keyed exchange co-locates each user's rows, and the per-partition
    pass is N-1 vectorized gated segment minima (searchsorted +
    np.minimum.at), no Python loop over users.
    """
    import pyarrow.compute as pc

    if len(steps) < 2:
        raise ValueError("need at least two funnel steps")
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["user_id", "ts", "event_type"])
    step_of = {s: i for i, s in enumerate(steps)}
    if len(step_of) != len(steps):
        raise ValueError("funnel steps must be distinct")
    nsteps = len(steps)

    def fun_partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        et = t["event_type"].combine_chunks()
        si = np.full(t.num_rows, -1, np.int8)
        for s, i in step_of.items():
            si[pc.equal(et, s).to_numpy(zero_copy_only=False)] = i
        keep = si >= 0
        uid = _np(t["user_id"]).astype(np.int64)[keep]
        ts = _ts_us(t["ts"])[keep]
        si = si[keep]
        # step-0 rows collapse to one min per user per batch
        is0 = si == 0
        su, smin = uid[is0], ts[is0]
        if len(su):
            order = np.argsort(su, kind="stable")
            ks = su[order]
            starts = np.flatnonzero(
                np.concatenate(([True], ks[1:] != ks[:-1]))
            )
            su = ks[starts]
            smin = np.minimum.reduceat(smin[order], starts)
        u = np.concatenate([su, uid[~is0]])
        tt = np.concatenate([smin, ts[~is0]])
        kind = np.concatenate([np.zeros(len(su), np.int8), si[~is0]])
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "ts_us": pa.array(tt, pa.int64()),
                "kind": pa.array(kind, pa.int8()),
                "prt": pa.array(hash_prt(u, buckets), pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("stage", pa.int64()),
            ("t_first", pa.timestamp("us")),
            ("t_last", pa.timestamp("us")),
        ]
    )
    IMAX = np.iinfo(np.int64).max

    def funnel_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        uid = _np(t["user_id"])
        ts = _np(t["ts_us"])
        kind = _np(t["kind"])
        m0 = kind == 0
        su, sts = uid[m0], ts[m0]
        if not len(su):
            return pa.Table.from_pylist([], schema=out_schema)
        order = np.argsort(su, kind="stable")
        ks = su[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        users = ks[starts]
        t_first = np.minimum.reduceat(sts[order], starts)
        stage = np.ones(len(users), np.int64)
        t_prev = t_first.copy()
        for i in range(1, nsteps):
            mi = kind == i
            pu, pts = uid[mi], ts[mi]
            if not len(pu):
                break
            pos = np.searchsorted(users, pu)
            pos_c = np.minimum(pos, len(users) - 1)
            hit = (pos < len(users)) & (users[pos_c] == pu)
            # gate: the user must be exactly at stage i, and the candidate
            # event must be STRICTLY after the previous step's timestamp
            # (and inside the step deadline when one is set)
            ok = hit & (stage[pos_c] == i) & (pts > t_prev[pos_c])
            if within_us is not None:
                ok &= pts <= t_prev[pos_c] + within_us
            nxt = np.full(len(users), IMAX, np.int64)
            np.minimum.at(nxt, pos_c[ok], pts[ok])
            adv = nxt != IMAX
            stage[adv] += 1
            t_prev[adv] = nxt[adv]
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "stage": pa.array(stage, pa.int64()),
                "t_first": pa.array(t_first.view("datetime64[us]")),
                "t_last": pa.array(t_prev.view("datetime64[us]")),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(fun_partial, batch_format="pyarrow",
                       batch_size=1_048_576)
        .groupby("prt")
        .map_groups(
            lambda g: funnel_partition(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


FUNNEL_STAGES_SQL = """
WITH s0 AS (
  SELECT user_id, min(ts) AS t0 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
s1 AS (
  SELECT s0.user_id, min(e.ts) AS t1 FROM s0
  JOIN events e ON e.user_id = s0.user_id
   AND e.event_type = 'click' AND e.ts > s0.t0 GROUP BY 1
),
s2 AS (
  SELECT s1.user_id, min(e.ts) AS t2 FROM s1
  JOIN events e ON e.user_id = s1.user_id
   AND e.event_type = 'purchase' AND e.ts > s1.t1 GROUP BY 1
)
SELECT s0.user_id::BIGINT AS user_id,
       (1 + (s1.user_id IS NOT NULL)::INT
          + (s2.user_id IS NOT NULL)::INT)::BIGINT AS stage,
       s0.t0 AS t_first,
       coalesce(s2.t2, s1.t1, s0.t0) AS t_last
FROM s0 LEFT JOIN s1 ON s0.user_id = s1.user_id
LEFT JOIN s2 ON s0.user_id = s2.user_id
"""


# ---------------------------------------------------------------------------
# centered window frame: ROWS BETWEEN k PRECEDING AND k FOLLOWING
# ---------------------------------------------------------------------------

def user_value_centered_avg(sf_dir: str, k: int = 2,
                            buckets: int | None = None):
    """Per-event CENTERED frame aggregates over each user's
    (ts, event_id)-ordered stream: ``ROWS BETWEEN k PRECEDING AND k
    FOLLOWING`` count and average (clipped at both partition edges, as
    SQL clips them) -- the symmetric-smoothing companion of the trailing
    ``user_value_moving_stats``.

    Scale shape: ONE keyed exchange (hash by user); one lexsort + one
    int64 micro-unit prefix sum serves every user's frames via clipped
    index arithmetic.  Exactness: sums ride int64 micro-units; the
    average mirrors the oracle's ``SUM(micro)/1e6/COUNT`` operand order.
    """
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def add_prt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        uid = _np(t["user_id"]).astype(np.int64)
        return t.append_column(
            "prt", pa.array(hash_prt(uid, buckets), pa.int64())
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("value", pa.float64()),
            ("cen_cnt", pa.int64()),
            ("cen_avg", pa.float64()),
        ]
    )

    def scan_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        uid = _np(t["user_id"]).astype(np.int64)
        ts = _ts_us(t["ts"])
        eid = _np(t["event_id"]).astype(np.int64)
        v = _np(t["value"])
        order = np.lexsort((eid, ts, uid))
        u_s, v_s = uid[order], v[order]
        n = len(u_s)
        first = np.concatenate(([True], u_s[1:] != u_s[:-1]))
        gid = np.cumsum(first) - 1
        starts = np.flatnonzero(first)
        g_len = np.diff(np.concatenate((starts, [n])))
        pos = np.arange(n) - starts[gid]
        lo = np.maximum(pos - k, 0) + starts[gid]
        hi = np.minimum(pos + k, g_len[gid] - 1) + starts[gid]
        v_u = np.round(v_s * 1_000_000).astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(v_u)))
        w_sum = csum[hi + 1] - csum[lo]
        cnt = hi - lo + 1
        avg = (w_sum / 1_000_000.0) / cnt
        return pa.table(
            {
                "user_id": pa.array(u_s, pa.int64()),
                "event_id": pa.array(eid[order], pa.int64()),
                "ts": pa.array(ts[order].view("datetime64[us]")),
                "value": pa.array(v_s, pa.float64()),
                "cen_cnt": pa.array(cnt.astype(np.int64)),
                "cen_avg": pa.array(avg, pa.float64()),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(add_prt, batch_format="pyarrow",
                       batch_size=1_048_576)
        .groupby("prt")
        .map_groups(
            lambda g: scan_partition(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


USER_VALUE_CENTERED_AVG_SQL = """
SELECT user_id::BIGINT AS user_id, event_id::BIGINT AS event_id, ts,
       value::DOUBLE AS value,
       COUNT(*) OVER w::BIGINT AS cen_cnt,
       SUM(CAST(round(value * 1000000, 0) AS BIGINT)) OVER w / 1000000.0
         / COUNT(*) OVER w AS cen_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
"""


# ---------------------------------------------------------------------------
# Theil-Sen robust trend: median pairwise slope per user
# ---------------------------------------------------------------------------

def user_value_theilsen(sf_dir: str, max_pairs: int = 50_000_000,
                        buckets: int | None = None,
                        sample_pairs: int | None = None):
    """Theil-Sen estimator per user: the MEDIAN of all pairwise slopes
    ``(v_j - v_i) / hours(t_j - t_i)`` over event pairs with strictly
    increasing timestamps -- the outlier-robust companion of the
    least-squares ``user_value_trend`` (a single wild value moves OLS
    arbitrarily but shifts the slope median by one rank at most).

    Scale shape: ONE keyed exchange (hash by user); each partition
    enumerates its users' pairs with vectorized outer differences.  The
    estimator is inherently O(n^2) per group: a group whose pair count
    exceeds ``max_pairs`` raises loudly (at that size use the OLS trend
    or a sampled-pairs variant) rather than silently stalling a task.
    ``sample_pairs`` IS that scale path: groups above the threshold draw
    that many random pairs (counter-based RNG seeded per user -- rerun
    deterministic) and take the sampled median; groups at or below it
    stay exact, so the oracle holds wherever sampling never triggers.
    Exactness: each slope is one float expression mirrored verbatim in
    the oracle; the median interpolates ``vlo + (vhi - vlo) * 0.5`` the
    way DuckDB's ``quantile_cont`` does; output rounds to 6.
    """
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def add_prt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        uid = _np(t["user_id"]).astype(np.int64)
        return t.append_column(
            "prt", pa.array(hash_prt(uid, buckets), pa.int64())
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_pairs", pa.int64()),
            ("slope_hr", pa.float64()),
        ]
    )
    HOUR_US = 3600000000.0

    def ts_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        uid = _np(t["user_id"]).astype(np.int64)
        ts = _ts_us(t["ts"])
        v = _np(t["value"])
        order = np.lexsort((ts, uid))
        u_s, t_s, v_s = uid[order], ts[order], v[order]
        n = len(u_s)
        first = np.concatenate(([True], u_s[1:] != u_s[:-1]))
        starts = np.flatnonzero(first)
        ends = np.concatenate((starts[1:], [n]))
        users, npairs, med = [], [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            if m * (m - 1) // 2 > max_pairs:
                if sample_pairs is None:
                    raise ValueError(
                        f"user {u_s[s]} has {m} events -> "
                        f"{m * (m - 1) // 2} Theil-Sen pairs (> max_pairs="
                        f"{max_pairs}); use the OLS trend or pass "
                        f"sample_pairs for the sampled estimator"
                    )
                # sampled scale path: counter-based RNG seeded by the
                # user id -- rerun-deterministic, batching-independent
                rng = np.random.default_rng(
                    np.uint64(u_s[s]) ^ np.uint64(0x5DEECE66D)
                )
                ii = rng.integers(0, m, sample_pairs)
                jj = rng.integers(0, m, sample_pairs)
                lo_ = np.minimum(ii, jj)
                hi_ = np.maximum(ii, jj)
                tt = t_s[s:e]
                vv = v_s[s:e]
                dtf = (tt[hi_] - tt[lo_]).astype(np.float64)
                ok = dtf > 0
                if not ok.any():
                    continue
                dv = vv[hi_][ok] - vv[lo_][ok]
                slopes = dv / (dtf[ok] / HOUR_US)
            else:
                tt = t_s[s:e]
                vv = v_s[s:e]
                dt = tt[None, :] - tt[:, None]
                iu = np.triu_indices(m, k=1)
                dtf = dt[iu].astype(np.float64)
                ok = dtf > 0  # equal-timestamp pairs carry no slope
                if not ok.any():
                    continue
                dv = (vv[None, :] - vv[:, None])[iu][ok]
                slopes = dv / (dtf[ok] / HOUR_US)
            slopes.sort()
            k_ = len(slopes)
            h = (k_ - 1) * 0.5
            lo = int(np.floor(h))
            hi = int(np.ceil(h))
            users.append(int(u_s[s]))
            npairs.append(k_)
            med.append(
                round(slopes[lo] + (slopes[hi] - slopes[lo]) * 0.5, 6)
            )
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "n_pairs": pa.array(npairs, pa.int64()),
                "slope_hr": pa.array(med, pa.float64()),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(add_prt, batch_format="pyarrow",
                       batch_size=1_048_576)
        .groupby("prt")
        .map_groups(
            lambda g: ts_partition(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


USER_VALUE_THEILSEN_SQL = """
WITH p AS (
  SELECT a.user_id AS user_id,
         (b.value - a.value)
           / ((epoch_us(b.ts) - epoch_us(a.ts)) / 3600000000.0) AS s
  FROM events a JOIN events b
    ON a.user_id = b.user_id AND a.ts < b.ts
)
SELECT user_id::BIGINT AS user_id, count(*)::BIGINT AS n_pairs,
       round(quantile_cont(s, 0.5), 6) AS slope_hr
FROM p GROUP BY user_id
"""


def funnel_stages_windowed(sf_dir: str, buckets: int | None = None):
    """Time-bound funnel: each next step must land within 24 hours of the
    previous step's timestamp (the conversion-deadline shape)."""
    return funnel_stages(
        sf_dir, buckets=buckets, within_us=24 * 3600 * 1_000_000
    )


FUNNEL_STAGES_WINDOWED_SQL = """
WITH s0 AS (
  SELECT user_id, min(ts) AS t0 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
s1 AS (
  SELECT s0.user_id, min(e.ts) AS t1 FROM s0
  JOIN events e ON e.user_id = s0.user_id
   AND e.event_type = 'click' AND e.ts > s0.t0
   AND e.ts <= s0.t0 + INTERVAL 24 HOUR GROUP BY 1
),
s2 AS (
  SELECT s1.user_id, min(e.ts) AS t2 FROM s1
  JOIN events e ON e.user_id = s1.user_id
   AND e.event_type = 'purchase' AND e.ts > s1.t1
   AND e.ts <= s1.t1 + INTERVAL 24 HOUR GROUP BY 1
)
SELECT s0.user_id::BIGINT AS user_id,
       (1 + (s1.user_id IS NOT NULL)::INT
          + (s2.user_id IS NOT NULL)::INT)::BIGINT AS stage,
       s0.t0 AS t_first,
       coalesce(s2.t2, s1.t1, s0.t0) AS t_last
FROM s0 LEFT JOIN s1 ON s0.user_id = s1.user_id
LEFT JOIN s2 ON s0.user_id = s2.user_id
"""


# ---------------------------------------------------------------------------
# market-basket lift over event types per user
# ---------------------------------------------------------------------------

def event_type_lift(sf_dir: str, buckets: int | None = None):
    """Association strength between event-type pairs: for every unordered
    pair (a, b), the number of users who did BOTH, each type's user
    count, and the lift ``P(a,b) / (P(a) * P(b))`` over the user
    population -- the market-basket shape on the event stream.

    Scale shape: per-batch (user, type) dedup partials, ONE exchange
    hashed on user; each partition emits its users' type-pairs (a user
    has at most |type domain| types, so pairs per user are bounded by
    the domain, not the stream); the pair/type/user counts collapse in a
    SECOND small exchange whose cardinality is the type-domain square.
    Float exactness: lift = (both / n_users) / ((ca / n_users) *
    (cb / n_users)) in that literal op order, rounded to 6.
    """
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["user_id", "event_type"])

    def pair_partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = et.dictionary_encode()
        tid = np.asarray(codes.indices, np.int64)
        types = np.asarray(codes.dictionary.to_pylist(), dtype=object)
        uid = _np(t["user_id"]).astype(np.int64)
        # batch-local (user, type) dedup
        key = uid * np.int64(1 << 20) + tid
        if (tid >= (1 << 20)).any():
            raise ValueError("type domain exceeds pack width")
        _, first = np.unique(key, return_index=True)
        u, ty = uid[first], tid[first]
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "etype": pa.array(types[ty], pa.string()),
                "prt": pa.array(hash_prt(u, buckets), pa.int64()),
            }
        )

    mid_schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("cnt", pa.int64()),
         ("prt", pa.int64())]
    )

    def user_pairs(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=mid_schema)
        uid = _np(t["user_id"])
        ec = t["etype"]
        if isinstance(ec, pa.ChunkedArray):
            ec = ec.combine_chunks()
        codes = ec.dictionary_encode()
        tid = np.asarray(codes.indices, np.int64)
        # SORTED dictionary so pair (i < j) maps to (name_i < name_j),
        # matching the oracle's a.event_type < b.event_type
        raw_names = codes.dictionary.to_pylist()
        name_order = np.argsort(np.asarray(raw_names, dtype=object))
        remap = np.empty(len(raw_names), np.int64)
        remap[name_order] = np.arange(len(raw_names))
        tid = remap[tid]
        names = [raw_names[i] for i in name_order]
        nt = len(names)
        # dense user ids, then the whole partition's co-occurrence at
        # once: M = U^T @ U over the (users x types) membership matrix
        _, du = np.unique(uid, return_inverse=True)
        n_users = int(du.max()) + 1
        U = np.zeros((n_users, nt), np.int64)
        U[du, tid] = 1
        M = U.T @ U
        iu = np.triu_indices(nt, k=1)
        cnts = M[iu]
        keep = cnts > 0
        pa_ = [names[i] for i in iu[0][keep]]
        pb_ = [names[j] for j in iu[1][keep]]
        cc = list(cnts[keep])
        # singles ride as (type, NULL) rows; user count as ("", NULL)
        diag = np.diag(M)
        for i in range(nt):
            if diag[i] > 0:
                pa_.append(names[i])
                pb_.append(None)
                cc.append(int(diag[i]))
        pa_.append("")
        pb_.append(None)
        cc.append(n_users)
        tb = pa.table(
            {
                "a": pa.array(pa_, pa.string()),
                "b": pa.array(pb_, pa.string()),
                "cnt": pa.array(np.asarray(cc, np.int64)),
            }
        )
        import zlib

        h = np.array(
            [zlib.crc32(x.encode()) for x in pa_], np.int64
        )
        return tb.append_column(
            "prt", pa.array(hash_prt(h, 16), pa.int64())
        )

    out_schema = pa.schema(
        [
            ("type_a", pa.string()),
            ("type_b", pa.string()),
            ("both_users", pa.int64()),
            ("users_a", pa.int64()),
            ("users_b", pa.int64()),
            ("lift", pa.float64()),
        ]
    )

    def count_up(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        df = t.to_pydict()
        agg: dict = {}
        for a, b, c in zip(df["a"], df["b"], df["cnt"]):
            agg[(a, b)] = agg.get((a, b), 0) + c
        return pa.table(
            {
                "a": pa.array([k[0] for k in agg], pa.string()),
                "b": pa.array([k[1] for k in agg], pa.string()),
                "cnt": pa.array(list(agg.values()), pa.int64()),
            }
        )

    counted = (
        ev.map_batches(pair_partial, batch_format="pyarrow",
                       batch_size=1_048_576)
        .groupby("prt")
        .map_groups(
            lambda g: user_pairs(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
        .groupby("prt")
        .map_groups(
            lambda g: count_up(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )

    # type-domain-sized finalize on the driver side of the exchange: the
    # counted table is |domain|^2 rows regardless of stream size
    def finish(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        df = t.to_pydict()
        singles: dict = {}
        n_users = 0
        pairs = []
        for a, b, c in zip(df["a"], df["b"], df["cnt"]):
            if b is None:
                if a == "":
                    n_users += c
                else:
                    singles[a] = singles.get(a, 0) + c
            else:
                pairs.append((a, b, c))
        rows = {k: [] for k in (
            "type_a", "type_b", "both_users", "users_a", "users_b", "lift"
        )}
        nu = float(n_users)
        for a, b, c in sorted(pairs):
            ca, cb = singles[a], singles[b]
            lift = (c / nu) / ((ca / nu) * (cb / nu))
            rows["type_a"].append(a)
            rows["type_b"].append(b)
            rows["both_users"].append(c)
            rows["users_a"].append(ca)
            rows["users_b"].append(cb)
            rows["lift"].append(round(lift, 6))
        return pa.table(rows, schema=out_schema)

    return (
        counted.repartition(1)
        .map_batches(finish, batch_format="pyarrow",
                     batch_size=1 << 30)
    )


EVENT_TYPE_LIFT_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT count(DISTINCT user_id)::DOUBLE AS nu FROM events),
s AS (SELECT event_type, count(*)::BIGINT AS c FROM ut GROUP BY 1),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*)::BIGINT AS both_users
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.both_users,
       sa.c AS users_a, sb.c AS users_b,
       round((p.both_users / n.nu)
             / ((sa.c / n.nu) * (sb.c / n.nu)), 6) AS lift
FROM p, n
JOIN s sa ON sa.event_type = p.type_a
JOIN s sb ON sb.event_type = p.type_b
"""


# ---------------------------------------------------------------------------
# first-order transition matrix between consecutive event types per user
# ---------------------------------------------------------------------------

def event_transition_matrix(sf_dir: str, buckets: int | None = None):
    """Markov transition counts and probabilities between CONSECUTIVE
    events of the same user (ordered by ts, event_id): for every
    (from_type, to_type), the transition count and
    ``P(to | from) = cnt / sum_cnt(from)`` -- the sequence-mining
    companion of the per-user path string (``user_event_path``).

    Scale shape: ONE keyed exchange (hash by user); per partition, one
    lexsort + shifted-pair extraction; (from, to) counts collapse
    map-side before a type-domain-sized driver finalize.  Probability =
    cnt / row_total in literal op order, rounded to 6.
    """
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["user_id", "ts", "event_id", "event_type"])

    def add_prt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        uid = _np(t["user_id"]).astype(np.int64)
        return t.append_column(
            "prt", pa.array(hash_prt(uid, buckets), pa.int64())
        )

    mid_schema = pa.schema(
        [("f", pa.string()), ("g", pa.string()), ("cnt", pa.int64())]
    )

    def trans_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=mid_schema)
        uid = _np(t["user_id"]).astype(np.int64)
        ts = _ts_us(t["ts"])
        eid = _np(t["event_id"]).astype(np.int64)
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = et.dictionary_encode()
        tid = np.asarray(codes.indices, np.int64)
        types = codes.dictionary.to_pylist()
        order = np.lexsort((eid, ts, uid))
        u_s, t_s = uid[order], tid[order]
        same = u_s[1:] == u_s[:-1]
        f, g = t_s[:-1][same], t_s[1:][same]
        nt = len(types)
        key = f * nt + g
        vals, cnts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "f": pa.array([types[int(k) // nt] for k in vals],
                              pa.string()),
                "g": pa.array([types[int(k) % nt] for k in vals],
                              pa.string()),
                "cnt": pa.array(cnts.astype(np.int64)),
            },
            schema=mid_schema,
        )

    out_schema = pa.schema(
        [
            ("from_type", pa.string()),
            ("to_type", pa.string()),
            ("cnt", pa.int64()),
            ("prob", pa.float64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        df = t.to_pydict()
        agg: dict = {}
        for f, g, c in zip(df["f"], df["g"], df["cnt"]):
            agg[(f, g)] = agg.get((f, g), 0) + c
        row_tot: dict = {}
        for (f, _), c in agg.items():
            row_tot[f] = row_tot.get(f, 0) + c
        rows = {k: [] for k in ("from_type", "to_type", "cnt", "prob")}
        for (f, g), c in sorted(agg.items()):
            rows["from_type"].append(f)
            rows["to_type"].append(g)
            rows["cnt"].append(c)
            rows["prob"].append(round(c / row_tot[f], 6))
        return pa.table(rows, schema=out_schema)

    return (
        ev.map_batches(add_prt, batch_format="pyarrow",
                       batch_size=1_048_576)
        .groupby("prt")
        .map_groups(
            lambda g: trans_partition(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)
    )


EVENT_TRANSITION_MATRIX_SQL = """
WITH seq AS (
  SELECT user_id, event_type AS f,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS g
  FROM events
),
c AS (
  SELECT f AS from_type, g AS to_type, count(*)::BIGINT AS cnt
  FROM seq WHERE g IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, cnt,
       round(cnt / (sum(cnt) OVER (PARTITION BY from_type))::DOUBLE, 6)
         AS prob
FROM c
"""


# ---------------------------------------------------------------------------
# hourly OHLC bars: open/high/low/close per (type, hour)
# ---------------------------------------------------------------------------

def events_hourly_ohlc(sf_dir: str, buckets: int | None = None):
    """Open/high/low/close bars per (event_type, hour): open = value of
    the FIRST event in the hour, close = the LAST (both under the total
    (ts, event_id) order), high/low = max/min -- the bar-chart rollup
    every monitoring/trading stack derives from a tick stream.

    Scale shape: per-batch combiner collapses each (type, hour) to ONE
    candidate row carrying (first_key, open, last_key, close, hi, lo,
    cnt); candidates merge associatively in the per-partition pass after
    ONE hash exchange on (type, hour) -- exchange bytes are bounded by
    groups x batches, never rows.  All outputs are value moves or int
    sums; no float arithmetic at all, so the oracle is trivially exact.
    """
    import zlib

    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["event_id", "event_type", "ts", "value"])
    HOUR = 3600 * 1_000_000

    mid_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("hour_us", pa.int64()),
            ("fk_ts", pa.int64()), ("fk_id", pa.int64()),
            ("open", pa.float64()),
            ("lk_ts", pa.int64()), ("lk_id", pa.int64()),
            ("close", pa.float64()),
            ("hi", pa.float64()), ("lo", pa.float64()),
            ("cnt", pa.int64()),
            ("prt", pa.int64()),
        ]
    )

    def combine(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = et.dictionary_encode()
        tid = np.asarray(codes.indices, np.int64)
        types = codes.dictionary.to_pylist()
        ts = _ts_us(t["ts"])
        eid = _np(t["event_id"]).astype(np.int64)
        v = _np(t["value"]).astype(np.float64)
        hour = (ts // HOUR) * HOUR
        order = np.lexsort((eid, ts, hour, tid))
        tid, ts, eid, v, hour = (
            tid[order], ts[order], eid[order], v[order], hour[order]
        )
        first = np.concatenate(
            ([True], (tid[1:] != tid[:-1]) | (hour[1:] != hour[:-1]))
        )
        starts = np.flatnonzero(first)
        ends = np.concatenate((starts[1:], [len(tid)]))
        last = ends - 1
        names = [types[i] for i in tid[starts]]
        h = np.array(
            [
                zlib.crc32(f"{n}\x1f{hu}".encode())
                for n, hu in zip(names, hour[starts])
            ],
            np.int64,
        )
        his = np.maximum.reduceat(v, starts)
        los = np.minimum.reduceat(v, starts)
        return pa.table(
            {
                "event_type": pa.array(names, pa.string()),
                "hour_us": pa.array(hour[starts], pa.int64()),
                "fk_ts": pa.array(ts[starts], pa.int64()),
                "fk_id": pa.array(eid[starts], pa.int64()),
                "open": pa.array(v[starts], pa.float64()),
                "lk_ts": pa.array(ts[last], pa.int64()),
                "lk_id": pa.array(eid[last], pa.int64()),
                "close": pa.array(v[last], pa.float64()),
                "hi": pa.array(his, pa.float64()),
                "lo": pa.array(los, pa.float64()),
                "cnt": pa.array((ends - starts).astype(np.int64)),
                "prt": pa.array(hash_prt(h, buckets), pa.int64()),
            },
            schema=mid_schema,
        )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("hour", pa.timestamp("us")),
            ("open", pa.float64()),
            ("high", pa.float64()),
            ("low", pa.float64()),
            ("close", pa.float64()),
            ("n_events", pa.int64()),
        ]
    )

    def merge(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        hour = _np(t["hour_us"])
        order = np.lexsort((hour, et))
        cols = {n: _np(t[n])[order] for n in t.schema.names
                if n not in ("event_type", "prt")}
        et = et[order]
        hour = cols["hour_us"]
        first = np.concatenate(
            ([True], (et[1:] != et[:-1]) | (hour[1:] != hour[:-1]))
        )
        starts = np.flatnonzero(first)
        ends = np.concatenate((starts[1:], [len(et)]))
        # candidate with the smallest (fk_ts, fk_id) wins open; largest
        # (lk_ts, lk_id) wins close -- resolve via within-group argsort
        opens, closes = [], []
        for s, e in zip(starts, ends):
            fo = np.lexsort((cols["fk_id"][s:e], cols["fk_ts"][s:e]))[0]
            lo_ = np.lexsort((cols["lk_id"][s:e], cols["lk_ts"][s:e]))[-1]
            opens.append(cols["open"][s:e][fo])
            closes.append(cols["close"][s:e][lo_])
        return pa.table(
            {
                "event_type": pa.array(list(et[starts]), pa.string()),
                "hour": pa.array(
                    hour[starts].astype(np.int64).view("datetime64[us]")
                ),
                "open": pa.array(np.array(opens), pa.float64()),
                "high": pa.array(
                    np.maximum.reduceat(cols["hi"], starts), pa.float64()
                ),
                "low": pa.array(
                    np.minimum.reduceat(cols["lo"], starts), pa.float64()
                ),
                "close": pa.array(np.array(closes), pa.float64()),
                "n_events": pa.array(
                    np.add.reduceat(cols["cnt"], starts).astype(np.int64)
                ),
            },
            schema=out_schema,
        )

    return (
        ev.map_batches(combine, batch_format="pyarrow",
                       batch_size=1_048_576)
        .groupby("prt")
        .map_groups(
            lambda g: merge(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


EVENTS_HOURLY_OHLC_SQL = """
WITH e AS (
  SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS hour, ts,
         event_id, value,
         row_number() OVER (PARTITION BY event_type,
                            time_bucket(INTERVAL 1 HOUR, ts)
                            ORDER BY ts, event_id) AS rf,
         row_number() OVER (PARTITION BY event_type,
                            time_bucket(INTERVAL 1 HOUR, ts)
                            ORDER BY ts DESC, event_id DESC) AS rl
  FROM events
)
SELECT event_type, hour,
       max(CASE WHEN rf = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rl = 1 THEN value END) AS close,
       count(*)::BIGINT AS n_events
FROM e GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# winsorization: clip values to per-type percentile bounds
# ---------------------------------------------------------------------------

def winsorize_values(sf_dir: str, q_lo: float = 0.05, q_hi: float = 0.95,
                     buckets: int | None = None):
    """Every event with its value CLIPPED to that type's [q_lo, q_hi]
    percentile band -- the standard outlier-taming transform before
    model features.  Bounds are exact percentiles (np.percentile linear
    interpolation == quantile_cont).

    Scale shape: pass 1 computes the per-type bounds (one exchange of
    per-type value lists -- the same shape as user_value_quantiles);
    the |type-domain|-sized bounds table broadcasts into an
    exchange-free pass-2 map over the stream.  The clip is a pure value
    move (min/max against the bound), so the oracle is value-exact.
    """
    import ray

    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["event_id", "event_type", "value"])

    bschema = pa.schema(
        [("event_type", pa.string()), ("v", pa.float64()),
         ("prt", pa.int64())]
    )

    def tag(t: pa.Table) -> pa.Table:
        import zlib

        t = t.combine_chunks()
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        # one crc32 per DICTIONARY VALUE, gathered to rows -- never a
        # Python loop over the batch
        codes = et.dictionary_encode()
        tid = np.asarray(codes.indices, np.int64)
        h_c = np.array(
            [zlib.crc32(x.encode()) for x in codes.dictionary.to_pylist()],
            np.int64,
        )
        return pa.table(
            {
                "event_type": et,
                "v": t["value"].cast(pa.float64()),
                "prt": pa.array(hash_prt(h_c, buckets)[tid], pa.int64()),
            },
            schema=bschema,
        )

    qschema = pa.schema(
        [("event_type", pa.string()), ("lo", pa.float64()),
         ("hi", pa.float64())]
    )

    def bounds(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=qschema)
        et_col = t["event_type"]
        if isinstance(et_col, pa.ChunkedArray):
            et_col = et_col.combine_chunks()
        # dictionary indices, NOT Python strings: a 10M-row partition
        # lexsorts int codes in C, never materializing an object array
        codes = et_col.dictionary_encode()
        tid = np.asarray(codes.indices, np.int64)
        dict_names = codes.dictionary.to_pylist()
        v = _np(t["v"])
        order = np.lexsort((v, tid))
        et, v = tid[order], v[order]
        starts = np.flatnonzero(
            np.concatenate(([True], et[1:] != et[:-1]))
        )
        ends = np.concatenate((starts[1:], [len(et)]))
        names, los, his = [], [], []
        for s, e in zip(starts, ends):
            vv = v[s:e]  # already ascending within the type
            for q, acc in ((q_lo, los), (q_hi, his)):
                h_ = (len(vv) - 1) * q
                lo_i = int(np.floor(h_))
                hi_i = int(np.ceil(h_))
                f = h_ - lo_i
                # DuckDB's quantile_cont form: lo*(1-f) + hi*f (NOT
                # lo + (hi-lo)*f, which differs in the last ulp)
                acc.append(vv[lo_i] * (1 - f) + vv[hi_i] * f)
            names.append(dict_names[et[s]])
        return pa.table(
            {
                "event_type": pa.array(names, pa.string()),
                "lo": pa.array(los, pa.float64()),
                "hi": pa.array(his, pa.float64()),
            },
            schema=qschema,
        )

    parts = ray.get(
        [
            ref
            for ref in ev.map_batches(tag, batch_format="pyarrow",
                                      batch_size=1_048_576)
            .groupby("prt")
            .map_groups(
                lambda g: bounds(g.drop_columns(["prt"])),
                batch_format="pyarrow",
            )
            .to_arrow_refs()
        ]
    )
    # empty zero-column blocks appear after a groupby; drop them before
    # the concat (they carry no schema)
    parts = [p for p in parts if p.num_rows > 0]
    if not parts:
        raise ValueError("empty events table")
    bt = pa.concat_tables([p.select(qschema.names) for p in parts])
    bounds_map = {
        n: (lo, hi)
        for n, lo, hi in zip(
            bt["event_type"].to_pylist(),
            bt["lo"].to_pylist(),
            bt["hi"].to_pylist(),
        )
    }
    bref = ray.put(bounds_map)

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("clipped", pa.float64()),
        ]
    )

    def clip(t: pa.Table) -> pa.Table:
        bm = ray.get(bref)
        t = t.combine_chunks()
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        # one bound lookup per DICTIONARY VALUE, then a vectorized gather
        codes = et.dictionary_encode()
        tid = np.asarray(codes.indices, np.int64)
        dn = codes.dictionary.to_pylist()
        v = _np(t["value"]).astype(np.float64)
        lo_c = np.array([bm[n][0] for n in dn])
        hi_c = np.array([bm[n][1] for n in dn])
        lo = lo_c[tid]
        hi = hi_c[tid]
        return pa.table(
            {
                "event_id": t["event_id"].cast(pa.int64()),
                "event_type": et,
                "value": pa.array(v, pa.float64()),
                "clipped": pa.array(
                    np.minimum(np.maximum(v, lo), hi), pa.float64()
                ),
            },
            schema=out_schema,
        )

    return ev.map_batches(clip, batch_format="pyarrow",
                          batch_size=1_048_576)


WINSORIZE_VALUES_SQL = """
WITH b AS (
  SELECT event_type, quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY 1
)
SELECT e.event_id::BIGINT AS event_id, e.event_type,
       e.value::DOUBLE AS value,
       least(greatest(e.value, b.lo), b.hi) AS clipped
FROM events e JOIN b ON e.event_type = b.event_type
"""


# ---------------------------------------------------------------------------
# population stability index: value-distribution drift per event type
# ---------------------------------------------------------------------------

def value_drift_psi(sf_dir: str, n_bins: int = 10,
                    buckets: int | None = None):
    """Population Stability Index per event type between the FIRST and
    SECOND half of the stream's time range: equal-width value bins over
    the global [min, max], Laplace-smoothed shares
    ``p = (c1 + 1) / (n1 + B)`` vs ``q = (c2 + 1) / (n2 + B)``, and
    ``PSI = sum((q - p) * ln(q / p))`` -- the standard ML-monitoring
    drift score (PSI > 0.2 conventionally flags a shifted feature).

    Scale shape: pass 1 is a 3-scalar aggregate (global min/max/mid-ts);
    pass 2 collapses rows map-side to (type, half, bin) counts -- at most
    ``2 x B x |types|`` partial rows per batch -- into ONE hash exchange
    on type; the finalize is a B-term fixed-order float sum mirrored by
    the oracle, epsilon-bias-rounded to 6 (the 10-term sum's last-ulp
    order difference is absorbed, house convention).
    """
    import zlib

    import pyarrow.compute as pc

    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/events.parquet")
    ev = _read_events(sf_dir, ["ts", "event_type", "value"])

    # pass 1: global scalars (tiny)
    def scalars(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        v = _np(t["value"])
        ts = _ts_us(t["ts"])
        return pa.table(
            {
                "vmin": pa.array([float(v.min())], pa.float64()),
                "vmax": pa.array([float(v.max())], pa.float64()),
                "tmin": pa.array([int(ts.min())], pa.int64()),
                "tmax": pa.array([int(ts.max())], pa.int64()),
            }
        )

    lo = hi = None
    tlo = thi = None
    for b in ev.map_batches(
        scalars, batch_format="pyarrow", batch_size=1_048_576
    ).iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            lo = r["vmin"] if lo is None else min(lo, r["vmin"])
            hi = r["vmax"] if hi is None else max(hi, r["vmax"])
            tlo = r["tmin"] if tlo is None else min(tlo, r["tmin"])
            thi = r["tmax"] if thi is None else max(thi, r["tmax"])
    if lo is None:
        raise ValueError("empty events table")
    mid = (tlo + thi) // 2
    w = (hi - lo) / n_bins

    part_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("half", pa.int8()),
            ("bin", pa.int64()),
            ("cnt", pa.int64()),
            ("prt", pa.int64()),
        ]
    )

    def bin_partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = et.dictionary_encode()
        tid = np.asarray(codes.indices, np.int64)
        types = codes.dictionary.to_pylist()
        v = _np(t["value"]).astype(np.float64)
        ts = _ts_us(t["ts"])
        half = (ts > mid).astype(np.int64)
        bn = np.minimum(
            np.floor((v - lo) / w), n_bins - 1
        ).astype(np.int64)
        key = (tid * 2 + half) * n_bins + bn
        vals, cnts = np.unique(key, return_counts=True)
        names = [types[int(k) // (2 * n_bins)] for k in vals]
        h = np.array(
            [zlib.crc32(n.encode()) for n in names], np.int64
        )
        return pa.table(
            {
                "event_type": pa.array(names, pa.string()),
                "half": pa.array(
                    ((vals // n_bins) % 2).astype(np.int8)
                ),
                "bin": pa.array(vals % n_bins, pa.int64()),
                "cnt": pa.array(cnts.astype(np.int64)),
                "prt": pa.array(hash_prt(h, buckets), pa.int64()),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("n_first", pa.int64()),
            ("n_second", pa.int64()),
            ("psi", pa.float64()),
        ]
    )

    def finalize(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        df = t.to_pydict()
        agg: dict = {}
        for et, hf, bn, c in zip(
            df["event_type"], df["half"], df["bin"], df["cnt"]
        ):
            key = (et, int(hf), int(bn))
            agg[key] = agg.get(key, 0) + c
        types = sorted({k[0] for k in agg})
        rows = {k: [] for k in out_schema.names}
        for et in types:
            c1 = np.array(
                [agg.get((et, 0, b), 0) for b in range(n_bins)], np.float64
            )
            c2 = np.array(
                [agg.get((et, 1, b), 0) for b in range(n_bins)], np.float64
            )
            n1, n2 = c1.sum(), c2.sum()
            p = (c1 + 1.0) / (n1 + n_bins)
            q = (c2 + 1.0) / (n2 + n_bins)
            contrib = (q - p) * np.log(q / p)
            acc = 0.0
            for b in range(n_bins):  # fixed-order sum, mirrored in SQL
                acc = acc + contrib[b]
            rows["event_type"].append(et)
            rows["n_first"].append(int(n1))
            rows["n_second"].append(int(n2))
            rows["psi"].append(float(_round6(np.array([acc]))[0]))
        return pa.table(rows, schema=out_schema)

    return (
        ev.map_batches(bin_partial, batch_format="pyarrow",
                       batch_size=1_048_576)
        .groupby("prt")
        .map_groups(
            lambda g: finalize(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


VALUE_DRIFT_PSI_SQL = """
WITH sc AS (
  SELECT min(value) AS lo, max(value) AS hi,
         (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
  FROM events
),
binned AS (
  SELECT event_type,
         (epoch_us(ts) > sc.mid)::INT AS half,
         least(floor((value - sc.lo) / ((sc.hi - sc.lo) / 10)), 9)::BIGINT
           AS bin
  FROM events, sc
),
c AS (
  SELECT event_type, half, bin, count(*)::BIGINT AS cnt
  FROM binned GROUP BY 1, 2, 3
),
n AS (
  SELECT event_type,
         sum(CASE WHEN half = 0 THEN cnt ELSE 0 END)::DOUBLE AS n1,
         sum(CASE WHEN half = 1 THEN cnt ELSE 0 END)::DOUBLE AS n2
  FROM c GROUP BY 1
),
grid AS (
  SELECT n.event_type, n.n1, n.n2, g.bin,
         coalesce(c1.cnt, 0)::DOUBLE AS c1,
         coalesce(c2.cnt, 0)::DOUBLE AS c2
  FROM n
  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bin) g
  LEFT JOIN c c1 ON c1.event_type = n.event_type AND c1.half = 0
                AND c1.bin = g.bin
  LEFT JOIN c c2 ON c2.event_type = n.event_type AND c2.half = 1
                AND c2.bin = g.bin
),
contrib AS (
  SELECT event_type, n1, n2, bin,
         (((c2 + 1.0) / (n2 + 10)) - ((c1 + 1.0) / (n1 + 10)))
           * ln(((c2 + 1.0) / (n2 + 10)) / ((c1 + 1.0) / (n1 + 10)))
           AS x
  FROM grid
)
SELECT event_type, max(n1)::BIGINT AS n_first, max(n2)::BIGINT AS n_second,
       round(sum(x) + 1e-9, 6) AS psi
FROM contrib GROUP BY event_type
"""
