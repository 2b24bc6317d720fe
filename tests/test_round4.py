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
