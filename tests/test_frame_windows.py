"""Bounded window FRAMES (ROWS BETWEEN k PRECEDING, RANGE BETWEEN
INTERVAL PRECEDING) and GROUP BY CUBE: brute-force references on planted
edge data (groups shorter than the frame, single-row groups, duplicate
timestamps / RANGE peers, group-boundary isolation of the block-min
kernel), plus bucket invariance and the DuckDB mirrors at sf0.001."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _canon(ds):
    from tools.verify_correctness import canon, to_pandas

    return canon(to_pandas(ds))


def _write_events(d, uid, ts_us, value):
    os.makedirs(d, exist_ok=True)
    n = len(uid)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "user_id": pa.array(np.asarray(uid, np.int64), pa.int64()),
                "ts": pa.array(
                    np.asarray(ts_us, np.int64).view("datetime64[us]")
                ),
                "value": pa.array(np.asarray(value, float), pa.float64()),
            }
        ),
        f"{d}/events.parquet",
    )


def test_moving_stats_brute_force_and_boundary_isolation(
    ray_session, tmp_path
):
    """Trailing-k ROWS frame vs an O(n*k) reference; user 2's tiny values
    sit immediately before user 7 in sort order, so any window bleed
    across the group boundary would corrupt user 7's mov_min."""
    from crossai_ts_ray.pipelines.analytics import user_value_moving_stats

    d = str(tmp_path / "mov")
    rng = np.random.default_rng(7)
    uid = np.repeat([2, 7, 9, 11], [3, 25, 1, 12])   # short, long, single
    ts = np.concatenate(
        [np.sort(rng.integers(0, 10**9, c)) for c in (3, 25, 1, 12)]
    )
    val = np.round(rng.uniform(-5, 5, len(uid)), 3)
    val[:3] = [-100.0, -200.0, -300.0]  # bleed would poison user 7's min
    _write_events(d, uid, ts, val)

    got = (
        _canon(user_value_moving_stats(d, k=10, buckets=3))
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    order = np.lexsort((np.arange(len(uid)), ts, uid))
    u_s, v_s = uid[order], val[order]
    for i in range(len(u_s)):
        lo = i
        while lo > 0 and u_s[lo - 1] == u_s[i] and i - lo < 9:
            lo -= 1
        w = v_s[lo : i + 1]
        w_u = np.round(w * 1_000_000).astype(np.int64)
        assert got.loc[i, "mov_cnt"] == len(w)
        assert got.loc[i, "mov_sum"] == w_u.sum() / 1_000_000.0
        assert got.loc[i, "mov_avg"] == (w_u.sum() / 1_000_000.0) / len(w)
        assert got.loc[i, "mov_min"] == w.min()

    # bucket invariance: identical bits at any exchange width
    alt = (
        _canon(user_value_moving_stats(d, k=10, buckets=1))
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    assert got.equals(alt)


def test_time_window_brute_force_with_range_peers(ray_session, tmp_path):
    """Trailing 1-hour RANGE frame vs an O(n^2) reference, including
    duplicate timestamps: RANGE's CURRENT ROW bound includes ALL peers
    with the same ts, even ones later in event_id order."""
    from crossai_ts_ray.pipelines.analytics import user_value_time_window

    d = str(tmp_path / "tw")
    H = 3_600_000_000
    # user 1: spread over 3 h with a duplicated timestamp pair
    ts1 = np.array([0, H // 2, H // 2, H, 2 * H, 3 * H], np.int64)
    # user 2: all inside one window; user 3: single event
    ts2 = np.array([10, 20, 30], np.int64)
    ts3 = np.array([5 * H], np.int64)
    uid = np.array([1] * 6 + [2] * 3 + [3], np.int64)
    ts = np.concatenate([ts1, ts2, ts3])
    val = np.round(np.linspace(-3, 3, len(uid)), 3)
    _write_events(d, uid, ts, val)

    got = (
        _canon(user_value_time_window(d, window_s=3600, buckets=3))
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    order = np.lexsort((np.arange(len(uid)), ts, uid))
    u_s, t_s, v_s = uid[order], ts[order], val[order]
    for i in range(len(u_s)):
        m = (u_s == u_s[i]) & (t_s >= t_s[i] - H) & (t_s <= t_s[i])
        w_u = np.round(v_s[m] * 1_000_000).astype(np.int64)
        assert got.loc[i, "w_cnt"] == int(m.sum())
        assert got.loc[i, "w_sum"] == w_u.sum() / 1_000_000.0
        assert got.loc[i, "w_avg"] == (w_u.sum() / 1_000_000.0) / m.sum()
    # the duplicated-ts rows (RANGE peers) must report identical frames
    dup = got[got["ts"] == np.datetime64(H // 2, "us")]
    assert len(dup) == 2
    assert dup["w_cnt"].nunique() == 1 and dup["w_sum"].nunique() == 1

    alt = (
        _canon(user_value_time_window(d, window_s=3600, buckets=1))
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    assert got.equals(alt)


def test_time_window_overflow_guard(ray_session, tmp_path):
    """The composite frame-key pack raises loudly instead of silently
    wrapping when groups x time-span exceeds int64 headroom."""
    import pytest

    from crossai_ts_ray.pipelines.analytics import user_value_time_window

    d = str(tmp_path / "ovf")
    # two users straddling a ~2^61 us span -> gid*K overflows the guard
    big = np.int64((1 << 61) + 7)
    _write_events(
        d, [1, 1, 2, 2], [0, big, 0, big], [1.0, 2.0, 3.0, 4.0]
    )
    with pytest.raises(ValueError, match="composite frame key overflows"):
        _canon(user_value_time_window(d, window_s=3600, buckets=1))


def test_frame_windows_and_cube_match_duckdb(ray_session):
    """Full-SF exact mirrors: both frame queries and GROUP BY CUBE vs
    DuckDB at sf0.001 (the driver runs the same compare at sf0.01)."""
    import duckdb

    import __ray_entry__ as E
    from tools.verify_correctness import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    qs, sqls = E.queries(), E.oracle_sql()
    for name in (
        "user_value_moving_stats",
        "user_value_time_window",
        "segment_nation_cube",
    ):
        got = _canon(qs[name](SF))
        want = _canon(con.sql(sqls[name]).df())
        assert list(got.columns) == list(want.columns), name
        assert got.equals(want), name
