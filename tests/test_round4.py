"""Round-4 scale-path regressions: the vectorized hourly partition merge,
the chunked sliding window (carried boundary buckets), and the
partition-count plumbing."""

from __future__ import annotations

import sys

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _sorted(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    return df.sort_values(keys).reset_index(drop=True)


def test_sliding_hourly_chunked_bitwise(ray_session):
    """Forcing tiny bucket chunks (carried-boundary path in every group)
    must reproduce the single-chunk result bitwise."""
    from crossai_ts_ray.pipelines.events_pipeline import sliding_hourly

    whole = _sorted(
        sliding_hourly(SF, window_buckets=3, chunk_buckets=10**6).to_pandas(),
        ["source", "win_end"],
    )
    # span of the sf0.001 grid is ~3.6k buckets; 7-bucket chunks force
    # hundreds of chunk boundaries, each with 2 carried rows
    split = _sorted(
        sliding_hourly(SF, window_buckets=3, chunk_buckets=7).to_pandas(),
        ["source", "win_end"],
    )
    pd.testing.assert_frame_equal(whole, split)


def test_sliding_hourly_chunk_smaller_than_window_raises(ray_session):
    from crossai_ts_ray.pipelines.events_pipeline import sliding_hourly

    with pytest.raises(ValueError, match="chunk_buckets"):
        sliding_hourly(SF, window_buckets=5, chunk_buckets=3)


def test_hourly_rollup_bucket_count_invariance(ray_session):
    """The partition-merge rewrite: results identical under 1 partition
    (everything merges in one kernel) and 64 partitions."""
    from crossai_ts_ray.pipelines.events_pipeline import hourly_rollup

    a = _sorted(hourly_rollup(SF, buckets=1).to_pandas(), ["source", "bucket"])
    b = _sorted(hourly_rollup(SF, buckets=64).to_pandas(), ["source", "bucket"])
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize(
    "fn,kw,keys",
    [
        ("top_customers", {}, ["c_custkey"]),
        ("revenue_by_nation", {}, ["n_name"]),
        ("q5_local_supplier_revenue", {"buckets": 8}, ["n_name"]),
    ],
)
def test_broadcast_fallback_bitwise(ray_session, fn, kw, keys):
    """Forcing the partitioned-join fallback (as if the dimension exceeded
    SMALL_TABLE_BYTES) must reproduce the broadcast path bitwise."""
    from crossai_ts_ray.pipelines import relational

    f = getattr(relational, fn)
    fast = _sorted(f(SF, broadcast=True, **kw).to_pandas(), keys)
    slow = _sorted(f(SF, broadcast=False, **kw).to_pandas(), keys)
    pd.testing.assert_frame_equal(fast, slow)


def test_fits_broadcast_guard():
    from crossai_ts_ray.pipelines.relational import _fits_broadcast

    assert _fits_broadcast(f"{SF}/customer.parquet")  # tiny test file
    assert not _fits_broadcast(f"{SF}/customer.parquet", limit=10)  # forced
    assert not _fits_broadcast("/nonexistent/x.parquet")  # stat failure
