"""t-digest sketch: rank-error contract vs exact np.percentile, merge
determinism / split-invariance bounds, and the per-type pipeline query."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


class TestKernel:
    def test_rank_error_bound_normal(self):
        from crossai_ts_ray.stages.tdigest import build_digest, quantile

        rng = np.random.default_rng(3)
        v = np.sort(rng.normal(0, 100, 200_000))
        m, w = build_digest(v, delta=200)
        assert len(m) <= 200
        for q in (0.01, 0.1, 0.5, 0.9, 0.99, 0.999):
            est = quantile(m, w, q)[0]
            rank = np.searchsorted(v, est) / len(v)
            assert abs(rank - q) < 0.005, (q, rank)

    def test_tails_tighter_than_middle(self):
        from crossai_ts_ray.stages.tdigest import build_digest

        v = np.sort(np.random.default_rng(4).random(100_000))
        m, w = build_digest(v, delta=100)
        # k1 scale: edge centroids are lighter than the middle ones
        assert w[0] < w[len(w) // 2]
        assert w[-1] < w[len(w) // 2]

    def test_merge_matches_single_build(self):
        from crossai_ts_ray.stages.tdigest import (
            build_digest,
            merge_digests,
            quantile,
        )

        rng = np.random.default_rng(7)
        v = rng.lognormal(0, 2, 300_000)
        sv = np.sort(v)
        whole = build_digest(sv, 200)
        # split into 7 shards (as batches would), digest each, merge
        parts = [
            build_digest(np.sort(s), 200)
            for s in np.array_split(rng.permutation(v), 7)
        ]
        merged = merge_digests(parts, 200)
        assert merged[1].sum() == pytest.approx(len(v))
        for q in (0.01, 0.5, 0.99):
            a = quantile(*whole, q)[0]
            b = quantile(*merged, q)[0]
            ra = np.searchsorted(sv, a) / len(v)
            rb = np.searchsorted(sv, b) / len(v)
            assert abs(ra - q) < 0.005
            assert abs(rb - q) < 0.01  # one merge level doubles the bound

    def test_merge_deterministic(self):
        from crossai_ts_ray.stages.tdigest import build_digest, merge_digests

        rng = np.random.default_rng(9)
        parts = [
            build_digest(np.sort(rng.random(10_000)), 100) for _ in range(5)
        ]
        a = merge_digests(parts, 100)
        b = merge_digests(parts, 100)
        assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])

    @given(st.lists(st.floats(-1e9, 1e9), min_size=1, max_size=500))
    @settings(max_examples=50, deadline=None)
    def test_weight_conservation_and_range(self, xs):
        from crossai_ts_ray.stages.tdigest import build_digest, quantile

        v = np.sort(np.asarray(xs, np.float64))
        m, w = build_digest(v, 50)
        assert w.sum() == pytest.approx(len(v))
        est = quantile(m, w, [0.0, 0.5, 1.0])
        # cumsum-based centroid means can round a few ULP past the true
        # extremes -- bound relatively
        tol = 1e-9 * max(1.0, abs(float(v.min())), abs(float(v.max())))
        assert est[0] >= v.min() - tol
        assert est[2] <= v.max() + tol

    def test_empty(self):
        from crossai_ts_ray.stages.tdigest import build_digest, quantile

        m, w = build_digest(np.zeros(0), 100)
        assert len(m) == 0
        assert np.isnan(quantile(m, w, 0.5)[0])


class TestPipeline:
    def test_per_type_counts_and_accuracy(self, ray_session):
        import pyarrow.parquet as pq

        from crossai_ts_ray.pipelines.semistruct import (
            tdigest_value_quantiles,
        )

        rdf = pd.DataFrame(tdigest_value_quantiles(SF).take_all())
        raw = pq.read_table(
            f"{SF}/events.parquet", columns=["event_type", "value"]
        ).to_pandas()
        counts = raw.groupby("event_type").size()
        assert dict(zip(rdf["event_type"], rdf["n"])) == counts.to_dict()
        for _, r in rdf.iterrows():
            vals = np.sort(
                raw[raw["event_type"] == r["event_type"]]["value"].values
            )
            for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
                rank = np.searchsorted(vals, r[col]) / len(vals)
                assert abs(rank - q) < 0.02, (r["event_type"], q, rank)

    def test_rerun_deterministic(self, ray_session):
        from crossai_ts_ray.pipelines.semistruct import (
            tdigest_value_quantiles,
        )

        a = (
            pd.DataFrame(tdigest_value_quantiles(SF).take_all())
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        b = (
            pd.DataFrame(tdigest_value_quantiles(SF).take_all())
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
