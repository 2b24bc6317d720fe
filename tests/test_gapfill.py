"""Gap-fill: engine (searchsorted scan in groupby(source).map_groups) vs
oracle (pandas ffill / np.interp) -- bitwise, on the F2 gapped fixture."""

from __future__ import annotations

import pytest

from crossai_ts_ray import oracle, synth
from crossai_ts_ray.schema import Tier
from crossai_ts_ray.sources.readers import read_token_table
from crossai_ts_ray.stages.gapfill import gapfill
from crossai_ts_ray.stages.rollup import rollup_cascade
from crossai_ts_ray.util import dataset_to_table

from .conftest import assert_tables_bitwise_equal

TIER = Tier("t60", 60)


@pytest.fixture(scope="module")
def gapped_dir():
    return synth.generate(
        synth.TINY_GAPPED, synth.default_cache_dir(synth.TINY_GAPPED)
    )


@pytest.mark.parametrize("mode", ["locf", "linear"])
def test_gapfill_bitwise(ray_session, gapped_dir, mode):
    tbl = synth.read_all(gapped_dir)
    gold_roll = oracle.rollup(tbl, TIER)
    gold = oracle.gapfill(gold_roll, mode)
    ds = read_token_table(gapped_dir)
    roll = rollup_cascade(ds, (TIER,), salt_mod=0, batch_size=256)[TIER.name]
    got = dataset_to_table(
        gapfill(roll, oracle.GAPFILL_STAT_COLS, mode, grid_mode="zero")
    )
    # column order normalization happens in the comparator via cast
    got = got.select(gold.schema.names)
    assert_tables_bitwise_equal(gold, got, f"gapfill-{mode}")
    # the fixture really has gaps
    filled = got["filled"].to_numpy(zero_copy_only=False)
    assert filled.any(), "fixture produced no gap rows"
    assert not filled.all()


@pytest.mark.parametrize("mode", ["locf", "linear"])
@pytest.mark.parametrize("span", [4, 7, 64])
def test_gapfill_chunked_bitwise_equal_single_chunk(
    ray_session, gapped_dir, mode, span
):
    """max_group_rows forces bucket-range chunking with carried boundary
    points; output must be bitwise identical to the single-chunk kernel on
    leading/interior/trailing gaps (span=7 exercises misaligned chunk
    boundaries, span=64 covers series smaller than a chunk)."""
    ds = read_token_table(gapped_dir)
    roll = rollup_cascade(ds, (TIER,), salt_mod=0, batch_size=256)[TIER.name]
    base = dataset_to_table(
        gapfill(roll, oracle.GAPFILL_STAT_COLS, mode, grid_mode="zero")
    )
    roll2 = rollup_cascade(ds, (TIER,), salt_mod=0, batch_size=256)[TIER.name]
    chunked = dataset_to_table(
        gapfill(
            roll2, oracle.GAPFILL_STAT_COLS, mode, grid_mode="zero",
            max_group_rows=span,
        )
    )
    key = [("source", "ascending"), ("bucket", "ascending")]
    base_s = base.sort_by(key)
    chunked_s = chunked.select(base.schema.names).sort_by(key)
    assert_tables_bitwise_equal(base_s, chunked_s, f"gapfill-chunked-{mode}-{span}")
