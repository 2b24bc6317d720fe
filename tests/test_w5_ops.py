"""Randomized-oracle tests for the wave-5 kernels: generate small random
events tables (seeded), run the Ray op AND its oracle SQL through DuckDB on
the same parquet, compare exactly.  These hit shapes the fixed driver
testdata cannot guarantee -- hour-BLOCK boundaries in the sliding
count-distinct, single-event users, all-tied timestamps, constant series."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _events_dir(tmp_path, rng, rows, users=7, types=3, hours=60,
                tie_frac=0.3):
    """Random events table with deliberate ts ties and sparse hours."""
    ts_base = np.datetime64("2025-03-01T00:00:00.000000")
    hour = rng.integers(0, hours, rows)
    # sparse: drop a band of hours entirely so windows straddle gaps
    hour = np.where((hour % 13) == 5, hour + 13, hour)
    sec = rng.integers(0, 3600, rows)
    sec = np.where(rng.random(rows) < tie_frac, 0, sec)  # forced ties
    ts = ts_base + (hour * 3600 + sec).astype("timedelta64[s]").astype(
        "timedelta64[us]")
    t = pa.table(
        {
            "event_id": pa.array(np.arange(rows, dtype=np.int64)),
            "user_id": pa.array(
                rng.integers(0, users, rows).astype(np.int64)),
            "event_type": pa.array(
                np.char.add("t", rng.integers(0, types, rows).astype(str))),
            "ts": pa.array(ts),
            "value": pa.array(np.round(rng.random(rows) * 50, 3)),
        }
    )
    d = tmp_path / f"ev_{rng.integers(1 << 30)}"
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, str(d / "events.parquet"), row_group_size=64)
    return str(d)


def _compare(name, sf_dir, query, sql):
    import duckdb

    from tools.verify_correctness import compare, to_pandas

    ray_df = to_pandas(query(sf_dir))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    sql_df = con.execute(sql).df()
    problems = [p for p in compare(name, ray_df, sql_df)
                if "warning" not in p]
    assert not problems, problems
    return ray_df


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_rolling_active_users_random(ray_session, tmp_path, seed):
    """Block-boundary stress: random sparse hours + tied timestamps."""
    from crossai_ts_ray.pipelines.analytics import (
        ROLLING_ACTIVE_USERS_SQL, rolling_active_users)

    rng = np.random.default_rng(seed)
    d = _events_dir(tmp_path, rng, rows=400, users=5, types=2, hours=80)
    df = _compare("rau", d, rolling_active_users, ROLLING_ACTIVE_USERS_SQL)
    assert len(df) > 0 and (df["users_24h"] >= 1).all()


@pytest.mark.parametrize("seed", [4, 5])
def test_rolling_median_hourly_random(ray_session, tmp_path, seed):
    from crossai_ts_ray.pipelines.analytics import (
        ROLLING_MEDIAN_HOURLY_SQL, rolling_median_hourly)

    rng = np.random.default_rng(seed)
    d = _events_dir(tmp_path, rng, rows=300, users=4, types=3, hours=40)
    _compare("rmh", d, rolling_median_hourly, ROLLING_MEDIAN_HOURLY_SQL)


@pytest.mark.parametrize("seed", [6, 7])
def test_interarrival_random_with_single_event_users(ray_session, tmp_path,
                                                     seed):
    """Single-event users must vanish; all-tied-ts users get cv NULL."""
    from crossai_ts_ray.pipelines.analytics import (
        USER_INTERARRIVAL_SQL, user_interarrival_stats)

    rng = np.random.default_rng(seed)
    d = _events_dir(tmp_path, rng, rows=120, users=30, types=2, hours=20,
                    tie_frac=0.8)
    df = _compare("uis", d, user_interarrival_stats, USER_INTERARRIVAL_SQL)
    assert (df["n_gaps"] >= 1).all()


@pytest.mark.parametrize("seed", [8, 9])
def test_session_stats_random(ray_session, tmp_path, seed):
    from crossai_ts_ray.pipelines.analytics import (
        USER_SESSION_STATS_SQL, user_session_stats)

    rng = np.random.default_rng(seed)
    d = _events_dir(tmp_path, rng, rows=250, users=6, types=2, hours=50)
    df = _compare("uss", d, user_session_stats, USER_SESSION_STATS_SQL)
    assert (df["duration_s"] >= 0).all()


@pytest.mark.parametrize("seed", [10, 11])
def test_value_rank_dense_random(ray_session, tmp_path, seed):
    from crossai_ts_ray.pipelines.analytics import (
        VALUE_RANK_DENSE_SQL, value_rank_dense)

    rng = np.random.default_rng(seed)
    d = _events_dir(tmp_path, rng, rows=200, users=5, types=3, hours=30)
    df = _compare("vrd", d, value_rank_dense, VALUE_RANK_DENSE_SQL)
    # dense rank within a type is 1..n_distinct with no holes
    for _, g in df.groupby("event_type"):
        drk = np.sort(g["drk"].to_numpy())
        assert (drk == np.arange(1, len(g) + 1)).all()


@pytest.mark.parametrize("seed,win", [(12, 6), (13, 3)])
def test_rolling_active_users_custom_window(ray_session, tmp_path, seed,
                                            win):
    """The block kernel must generalize beyond the registered 24h window
    (block width = window_h changes the replication boundary math)."""
    from crossai_ts_ray.pipelines.analytics import rolling_active_users

    rng = np.random.default_rng(seed)
    d = _events_dir(tmp_path, rng, rows=350, users=6, types=2, hours=50)
    sql = f"""
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
            AND t.hour BETWEEN h.hour - {win - 1} AND h.hour
GROUP BY 1, 2
"""
    _compare(f"rau_w{win}", d,
             lambda sf: rolling_active_users(sf, window_h=win), sql)


@pytest.mark.parametrize("seed", [14, 15])
def test_set_ops_random(ray_session, tmp_path, seed):
    """INTERSECT/EXCEPT set ops on sparse data where lapsed users exist
    (the driver testdata's users all span both halves, so this is the
    test that proves the EXCEPT path emits rows)."""
    from crossai_ts_ray.pipelines.analytics import (
        USERS_BOTH_HALVES_SQL, USERS_FIRST_HALF_ONLY_SQL,
        users_both_halves, users_first_half_only)

    rng = np.random.default_rng(seed)
    d = _events_dir(tmp_path, rng, rows=90, users=40, types=2, hours=60)
    both = _compare("ubh", d, users_both_halves, USERS_BOTH_HALVES_SQL)
    first = _compare("ufho", d, users_first_half_only,
                     USERS_FIRST_HALF_ONLY_SQL)
    assert len(first) > 0          # sparse data must yield lapsed users
    # the two sets are disjoint by construction
    assert not set(both["user_id"]) & set(first["user_id"])
