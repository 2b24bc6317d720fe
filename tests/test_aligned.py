"""Aligned no-shuffle rollup path: bitwise vs oracle on plain and gapped
fixtures at all tiers, plus dense-histogram percentile exactness."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from crossai_ts_ray import oracle, synth
from crossai_ts_ray.schema import ROLLUP_SCHEMA, Tier
from crossai_ts_ray.stages.aligned import (
    aligned_rollup_cascade,
    percentile_from_dense,
    plan_aligned_groups,
)
from crossai_ts_ray.util import dataset_to_table

from .conftest import assert_tables_bitwise_equal

TIERS = (Tier("t60", 60), Tier("t240", 240), Tier("t480", 480))


@pytest.mark.parametrize("spec_name", ["TINY", "TINY_GAPPED"])
def test_aligned_cascade_bitwise(ray_session, spec_name):
    spec = getattr(synth, spec_name)
    d = synth.generate(spec, synth.default_cache_dir(spec))
    tbl = synth.read_all(d)
    shard_dirs = sorted(glob.glob(os.path.join(d, "shard=*")))
    out = aligned_rollup_cascade(shard_dirs, TIERS, chunk_rows=synth.CHUNK_ROWS)
    for t in TIERS:
        gold = oracle.rollup(tbl, t)
        got = dataset_to_table(out[t.name], ROLLUP_SCHEMA)
        assert_tables_bitwise_equal(gold, got, f"{spec_name} {t.name}")


def test_aligned_equals_generic(ray_session):
    """Both engine paths produce identical bytes."""
    from crossai_ts_ray.sources.readers import read_token_table
    from crossai_ts_ray.stages.rollup import rollup_cascade

    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    shard_dirs = sorted(glob.glob(os.path.join(d, "shard=*")))
    a = aligned_rollup_cascade(shard_dirs, TIERS, chunk_rows=synth.CHUNK_ROWS)
    g = rollup_cascade(read_token_table(d), TIERS, salt_mod=0, batch_size=256)
    for t in TIERS:
        assert_tables_bitwise_equal(
            dataset_to_table(a[t.name], ROLLUP_SCHEMA),
            dataset_to_table(g[t.name], ROLLUP_SCHEMA),
            f"aligned-vs-generic {t.name}",
        )


def test_percentile_from_dense_matches_numpy():
    rng = np.random.default_rng(5)
    for _ in range(100):
        vals = rng.integers(0, 30, int(rng.integers(1, 200)))
        counts = np.bincount(vals, minlength=30)
        for q in (50.0, 99.0, 0.0, 100.0, 37.5):
            want = np.float64(np.percentile(vals, q, method="linear"))
            got = np.float64(percentile_from_dense(counts, q))
            assert want.view(np.uint64) == got.view(np.uint64)


def test_plan_groups_alignment():
    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    shard_dirs = sorted(glob.glob(os.path.join(d, "shard=*")))
    groups = plan_aligned_groups(shard_dirs, synth.CHUNK_ROWS, 60)
    # each group holds files of exactly one source
    import re

    for g in groups:
        srcs = {re.match(r"part-(.+)-\d+\.parquet", os.path.basename(f)).group(1) for f in g}
        assert len(srcs) == 1


def test_aligned_rejects_striped_layout(ray_session):
    """A striped (unclustered) layout is seq-sorted per file but buckets span
    file groups -- the aligned path must REFUSE it, not silently mis-rollup."""
    spec = synth.SynthSpec(
        total_rows=80_000, num_sources=2, num_shards=2, stride_layout=True
    )
    d = synth.generate(spec, synth.default_cache_dir(spec))
    shard_dirs = sorted(glob.glob(os.path.join(d, "shard=*")))
    with pytest.raises(Exception, match="unaligned input|seq-sorted"):
        out = aligned_rollup_cascade(shard_dirs, TIERS, chunk_rows=synth.CHUNK_ROWS)
        dataset_to_table(out[TIERS[0].name])
