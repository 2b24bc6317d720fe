"""Round-4 ADVICE fixes, pinned:

* ``_percent_rank_two_pass`` partition hashing must canonicalize value
  bits (+0.0 == -0.0, all NaN payloads one key) so split tie runs can't
  produce overlapping global positions / divergent NTILE tiles.
* Tie-run detection must be NaN-aware (SQL RANK ties all NaNs as peers).
* ``cohort_retention`` packing raises loudly instead of silently merging
  distinct (user, week) / (cohort, age) pairs when week offsets overflow
  the 20-bit pack.
* ``value_percent_rank`` auto-selects the two-pass scale path from a
  measured hot-type estimate (footer + head sample), like salt='auto'.
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _canon(ds):
    from tools.verify_correctness import canon, to_pandas

    return canon(to_pandas(ds))


def _write_events(path, event_id, event_type, value, ts_us=None,
                  user_id=None):
    cols = {
        "event_id": pa.array(np.asarray(event_id, np.int64), pa.int64()),
        "event_type": pa.array(list(event_type), pa.string()),
        "value": pa.array(np.asarray(value, np.float64), pa.float64()),
    }
    if user_id is not None:
        cols["user_id"] = pa.array(np.asarray(user_id, np.int64), pa.int64())
    if ts_us is not None:
        cols["ts"] = pa.array(
            np.asarray(ts_us, np.int64), pa.timestamp("us")
        )
    pq.write_table(pa.table(cols), str(path))


def _duck_percent_rank(d):
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    return con.execute(
        """
        SELECT event_id::BIGINT AS event_id, event_type, value,
               percent_rank() OVER (PARTITION BY event_type
                                    ORDER BY value) AS pct_rank,
               ntile(4) OVER (PARTITION BY event_type
                              ORDER BY value, event_id)::BIGINT AS tile
        FROM events
        """
    ).df()


@pytest.fixture()
def signed_zero_dir(tmp_path):
    """Mixed +/-0.0 with enough rows that every bucket count splits the
    zero tie run if the hash ever distinguishes the two zero encodings."""
    rng = np.random.default_rng(7)
    n = 400
    v = rng.choice(
        np.array([-0.0, 0.0, 1.5, -2.25, 3.0], np.float64), size=n
    )
    # force signed-zero representation to survive the choice round-trip
    signs = rng.random(n) < 0.5
    v = np.where((v == 0.0) & signs, -0.0, v)
    et = rng.choice(["a", "b"], size=n)
    _write_events(tmp_path / "events.parquet", np.arange(n), et, v)
    return str(tmp_path)


def test_percent_rank_two_pass_signed_zero_matches(signed_zero_dir,
                                                   ray_session):
    """ADVICE r4 (medium): +/-0.0 must land in ONE partition / tie run."""
    import pandas.testing as pdt

    from crossai_ts_ray.pipelines.analytics import value_percent_rank

    a = _canon(value_percent_rank(signed_zero_dir, buckets=7,
                                  scale_path=False))
    b = _canon(value_percent_rank(signed_zero_dir, buckets=7,
                                  scale_path=True))
    pdt.assert_frame_equal(a, b)
    oracle = _canon(_duck_percent_rank(signed_zero_dir))
    pdt.assert_frame_equal(b, oracle, check_dtype=False)


def test_percent_rank_nan_peers_match_duckdb(tmp_path, ray_session):
    """ADVICE r4 (low): NULL/NaN values rank as ONE peer run (SQL RANK),
    not one-rank-each, on BOTH paths."""
    import pandas.testing as pdt

    from crossai_ts_ray.pipelines.analytics import value_percent_rank

    v = np.array(
        [1.0, np.nan, 2.0, np.nan, np.nan, -1.0, 0.5, np.nan], np.float64
    )
    et = ["a", "a", "a", "a", "b", "b", "b", "b"]
    _write_events(tmp_path / "events.parquet", np.arange(len(v)), et, v)
    d = str(tmp_path)
    oracle = _canon(_duck_percent_rank(d))
    for sp in (False, True):
        mine = _canon(value_percent_rank(d, buckets=5, scale_path=sp))
        pdt.assert_frame_equal(mine, oracle, check_dtype=False), sp


def test_percent_rank_nan_payloads_one_key(ray_session, tmp_path):
    """Different NaN bit patterns hash to the same partition key."""
    from crossai_ts_ray.pipelines.analytics import _value_rank_bits

    payload_a = np.float64(np.nan)
    payload_b = np.frombuffer(
        np.int64(0x7FF0000000000001).tobytes(), np.float64
    )[0]  # a signalling-NaN payload
    bits = _value_rank_bits(
        np.array([payload_a, payload_b, -0.0, 0.0], np.float64)
    )
    assert bits[0] == bits[1]
    assert bits[2] == bits[3]


def test_cohort_retention_week_pack_guard(tmp_path, ray_session):
    """ADVICE r4 (low): tiny week_s must raise, not silently merge pairs."""
    from crossai_ts_ray.pipelines.analytics import cohort_retention

    n = 8
    # ~23-day steps: with week_s=1 the "week" offsets span ~1.4e7 >> 2**20
    ts = (np.arange(n, dtype=np.int64) * 2_000_000) * 1_000_000
    _write_events(
        tmp_path / "events.parquet", np.arange(n), ["x"] * n,
        np.zeros(n), ts_us=ts, user_id=np.arange(n) % 2,
    )
    # Ray re-raises worker ValueErrors wrapped (RayTaskError), so match
    # the loud message rather than the class
    with pytest.raises(Exception, match="overflows the 20-bit"):
        # week_s=1 -> offsets in seconds, way past 2**20
        _canon(cohort_retention(str(tmp_path), buckets=1, week_s=1))


def test_cohort_retention_still_green_default(ray_session):
    import duckdb
    import pandas.testing as pdt

    from crossai_ts_ray.pipelines.analytics import (COHORT_RETENTION_SQL,
                                                    cohort_retention)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    oracle = _canon(con.execute(COHORT_RETENTION_SQL).df())
    mine = _canon(cohort_retention(SF, buckets=3))
    pdt.assert_frame_equal(mine, oracle, check_dtype=False)


def test_auto_scale_path_routes_by_hot_estimate(tmp_path):
    """Footer+head routing: a 100%-hot file crosses a low threshold, a
    balanced file / high threshold does not; sf0.001 defaults to the
    single-exchange path."""
    from crossai_ts_ray.pipelines.analytics import _auto_scale_path

    n = 50_000
    _write_events(tmp_path / "events.parquet", np.arange(n), ["hot"] * n,
                  np.zeros(n))
    d = str(tmp_path)
    assert _auto_scale_path(d, hot_rows_per_task=10_000) is True
    assert _auto_scale_path(d, hot_rows_per_task=10_000_000) is False
    assert _auto_scale_path(SF) is False  # default threshold, real data


def test_percent_rank_auto_default_still_matches_gate(ray_session):
    """The new scale_path=None default stays bitwise on the sf0.001 gate."""
    import duckdb
    import pandas.testing as pdt

    from crossai_ts_ray.pipelines.analytics import (VALUE_PERCENT_RANK_SQL,
                                                    value_percent_rank)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    oracle = _canon(con.execute(VALUE_PERCENT_RANK_SQL).df())
    mine = _canon(value_percent_rank(SF))
    pdt.assert_frame_equal(mine, oracle, check_dtype=False)


def test_cume_dist_nan_and_zero_fixture(tmp_path, ray_session):
    """CUME_DIST/DENSE_RANK over mixed NaN / signed-zero values match
    DuckDB's NaN-peers total order (same bridge as percent_rank)."""
    import duckdb
    import pandas.testing as pdt

    from crossai_ts_ray.pipelines.analytics import value_cume_dist

    v = np.array([1.0, np.nan, -0.0, 0.0, np.nan, -1.0, 0.5, 2.0],
                 np.float64)
    et = ["a", "a", "a", "a", "b", "b", "b", "b"]
    _write_events(tmp_path / "events.parquet", np.arange(len(v)), et, v)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    oracle = _canon(con.execute(
        """
        SELECT event_id::BIGINT AS event_id, event_type, value,
               cume_dist() OVER (PARTITION BY event_type
                                 ORDER BY value) AS cume_dist,
               dense_rank() OVER (PARTITION BY event_type
                                  ORDER BY value)::BIGINT AS dense_rank
        FROM events
        """
    ).df())
    mine = _canon(value_cume_dist(str(tmp_path), buckets=5))
    pdt.assert_frame_equal(mine, oracle, check_dtype=False)
