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
