"""Edge semantics of the range join (order_event_window): inclusive window
start, exclusive end, duplicate event timestamps, orders with empty windows,
and bucket invariance -- boundary cases random testdata rarely pins."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

US = 1_000_000
DAY = 86_400 * US


def _mini(tmp_path):
    d = str(tmp_path / "rj")
    os.makedirs(d, exist_ok=True)
    base = np.datetime64("2000-01-10T00:00:00", "us").astype(np.int64)
    # user 1 events: exactly at window start (counts), just before start
    # (doesn't), at order date (exclusive end -- doesn't), inside (counts,
    # duplicated timestamp -- both count)
    ets = np.array(
        [
            base - 7 * DAY,       # == T-7d  -> IN (inclusive start)
            base - 7 * DAY - 1,   # < T-7d   -> OUT
            base,                 # == T     -> OUT (exclusive end)
            base - 3 * DAY,       # inside   -> IN
            base - 3 * DAY,       # duplicate ts -> IN (both)
        ],
        dtype=np.int64,
    )
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 1, 1], pa.int64()),
                "ts": pa.array(ets.view("datetime64[us]")),
                "value": pa.array([1.0, 10.0, 100.0, 2.5, 3.5], pa.float64()),
            }
        ),
        f"{d}/events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([101, 102], pa.int64()),
                "o_custkey": pa.array([1, 2], pa.int64()),
                "o_orderdate": pa.array(
                    np.array([base, base], np.int64).view("datetime64[us]")
                ),
            }
        ),
        f"{d}/orders.parquet",
    )
    return d


def test_range_join_boundaries(ray_session, tmp_path):
    from crossai_ts_ray.pipelines.events_pipeline import order_event_window
    from tools.verify_correctness import canon, to_pandas

    d = _mini(tmp_path)
    got = canon(to_pandas(order_event_window(d, buckets=3))).set_index(
        "o_orderkey"
    )
    # order 101: start-boundary event + the two duplicates = 3 events
    assert got.loc[101, "ev_count"] == 3
    assert abs(got.loc[101, "ev_sum"] - (1.0 + 2.5 + 3.5)) < 1e-9
    # order 102: user 2 has no events -> zero row kept (LEFT semantics)
    assert got.loc[102, "ev_count"] == 0
    assert got.loc[102, "ev_sum"] == 0.0


def test_range_join_bucket_invariance(ray_session):
    from crossai_ts_ray.pipelines.events_pipeline import order_event_window
    from tools.verify_correctness import canon, to_pandas

    import pandas as pd

    sf = "/root/testdata/sf0.001"
    a = canon(to_pandas(order_event_window(sf, buckets=2)))
    b = canon(to_pandas(order_event_window(sf, buckets=19)))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 1500


def test_hourly_anomalies_planted_spike(ray_session, tmp_path):
    """A planted 10x spike after 30 flat hours must be flagged; the flat
    hours must not be."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crossai_ts_ray.pipelines.events_pipeline import hourly_anomalies
    from tools.verify_correctness import canon, to_pandas

    d = str(tmp_path / "anom")
    os.makedirs(d, exist_ok=True)
    base = np.datetime64("2000-01-01T00:00:00", "us").astype(np.int64)
    HOUR_US = 3600 * 1_000_000
    n_hours = 40
    # one event per hour; values ~10 with tiny deterministic jitter, one
    # 100.0 spike at hour 30
    ts = base + np.arange(n_hours, dtype=np.int64) * HOUR_US
    vals = 10.0 + 0.01 * (np.arange(n_hours) % 7)
    vals[30] = 100.0
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array(np.ones(n_hours, np.int64)),
                "event_id": pa.array(np.arange(n_hours, dtype=np.int64)),
                "event_type": pa.array(["t"] * n_hours),
                "ts": pa.array(ts.view("datetime64[us]")),
                "value": pa.array(vals, pa.float64()),
            }
        ),
        f"{d}/events.parquet",
    )
    got = canon(to_pandas(hourly_anomalies(d)))
    spike_bucket = (base // 1_000_000) // 3600 + 30
    assert spike_bucket in set(got["bucket"])
    row = got.set_index("bucket").loc[spike_bucket]
    assert row["z"] > 3.0
    assert abs(row["val_sum"] - 100.0) < 1e-9
    # nothing outside the spike's influence window is flagged
    assert (got["bucket"] == spike_bucket).all() or (
        got["bucket"] >= spike_bucket
    ).all()
