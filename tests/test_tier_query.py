"""Tier-aware range queries over the committed store: splice contract
(gap-free / overlap-free per source), bitwise aggregate parity vs the
single-process oracle, and pruning behavior after retention."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from crossai_ts_ray import oracle, synth  # noqa: E402
from crossai_ts_ray.schema import Tier  # noqa: E402

TIERS = (Tier("t60", 60), Tier("t240", 240))
KEEP = 4


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    from crossai_ts_ray.state.checkpoint import run_rollup_job
    from crossai_ts_ray.state.retention import apply_retention

    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    out = str(tmp_path_factory.mktemp("tierq") / "job")
    run_rollup_job(d, out, TIERS, salt_mod=0, batch_size=256)
    apply_retention(out, {"t60": KEEP})
    return d, out


def _query_df(out, lo, hi, sources=None):
    from crossai_ts_ray.state.query import query_range

    return pd.DataFrame(
        query_range(out, TIERS, lo, hi, sources=sources).take_all()
    )


class TestTierQuery:
    def test_splice_is_gap_and_overlap_free(self, store):
        _, out = store
        df = _query_df(out, 0, 10_000)
        for s, g in df.groupby("source"):
            g = g.sort_values("seq_start")
            spans = list(zip(g["seq_start"], g["seq_end"]))
            for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
                assert a1 == b0, (s, a1, b0)  # contiguous, no gap/overlap

    def test_recent_spans_come_from_fine_tier(self, store):
        d, out = store
        from crossai_ts_ray.state.query import tier_min_buckets

        fine_min = tier_min_buckets(out, "t60")
        df = _query_df(out, 0, 10_000)
        for s, g in df.groupby("source"):
            fine = g[g["tier"] == "t60"]
            coarse = g[g["tier"] == "t240"]
            assert len(fine)  # retention keeps the trailing fine buckets
            if len(coarse):
                assert coarse["seq_end"].max() <= fine["seq_start"].min()
            # fine rows start at/after that source's first kept bucket
            assert (
                fine["bucket"].min() >= fine_min[s]
            )

    def test_aggregates_match_oracle_bitwise(self, store):
        d, out = store
        import pyarrow.parquet as pq
        import glob as g_

        tbl_files = sorted(g_.glob(f"{d}/shard=*/*.parquet"))
        tbl = pq.read_table(tbl_files)
        df = _query_df(out, 0, 10_000)
        for tier in TIERS:
            gold = oracle.rollup(tbl, tier).to_pandas()
            got = df[df["tier"] == tier.name]
            merged = got.merge(
                gold,
                on=["source", "bucket"],
                suffixes=("", "_g"),
                how="left",
            )
            assert not merged["count_g"].isna().any()
            for c in ("count", "sum", "mean", "min", "max", "p50", "p99",
                      "tok_count", "tok_sum", "tok_mean"):
                a, b = merged[c], merged[f"{c}_g"]
                assert (
                    (a == b) | (a.isna() & b.isna())
                ).all(), (tier.name, c)

    def test_range_clipping_and_source_filter(self, store):
        _, out = store
        full = _query_df(out, 0, 10_000)
        src = sorted(full["source"].unique())[0]
        lo, hi = 240, 720
        df = _query_df(out, lo, hi, sources=[src])
        assert set(df["source"]) <= {src}
        assert (df["seq_start"] >= (lo // 240) * 240).all()
        assert (df["seq_end"] <= -(-hi // 60) * 60).all()
        # every returned span intersects the query range
        assert ((df["seq_end"] > lo) & (df["seq_start"] < hi)).all()

    def test_aged_out_prefix_is_absent_not_interpolated(self, store):
        _, out = store
        from crossai_ts_ray.state.query import tier_min_buckets

        coarse_min = tier_min_buckets(out, "t240")
        df = _query_df(out, 0, 10_000)
        for s, g in df.groupby("source"):
            # nothing below the coarsest tier's first kept bucket
            assert g["seq_start"].min() >= coarse_min[s] * 240

    def test_empty_range_raises(self, store):
        _, out = store
        from crossai_ts_ray.state.query import query_range

        with pytest.raises(ValueError):
            query_range(out, TIERS, 100, 100)
