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


def test_aligned_mixed_complete_and_multigroup_sources(ray_session, monkeypatch):
    """Sources that fit one aligned group finalize every tier in-task;
    over-sized sources go through the coarse exchange -- BOTH paths must be
    bitwise-exact and their union complete (no duplicate or missing
    (source, bucket) rows).  Pins the group target to the alignment quantum
    so this fixture exercises the exchange path (default sizing would make
    every source complete)."""
    monkeypatch.setenv("GRAFT_GROUP_TARGET_ROWS", str(3 * synth.CHUNK_ROWS))
    spec = synth.SynthSpec(total_rows=200_000, num_sources=3, num_shards=1)
    d = synth.generate(spec, synth.default_cache_dir(spec))
    tbl = synth.read_all(d)
    shard_dirs = sorted(glob.glob(os.path.join(d, "shard=*")))
    from crossai_ts_ray.stages.aligned import plan_aligned_groups_ex

    _, flags, _, _ = plan_aligned_groups_ex(shard_dirs, synth.CHUNK_ROWS, 60)
    assert any(flags) and not all(flags), f"fixture not mixed: {flags}"
    big = (Tier("t60", 60), Tier("t3600", 3600), Tier("t43200", 43200))
    out = aligned_rollup_cascade(shard_dirs, big, chunk_rows=synth.CHUNK_ROWS)
    for t in big:
        gold = oracle.rollup(tbl, t)
        got = dataset_to_table(out[t.name], ROLLUP_SCHEMA)
        assert_tables_bitwise_equal(gold, got, f"mixed {t.name}")


def test_aligned_rejects_non_nesting_tiers(ray_session):
    """Widths that don't nest (3600 -> 5400) would be silently mis-bucketed
    by the integer-division rekey -- must raise up front."""
    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    shard_dirs = sorted(glob.glob(os.path.join(d, "shard=*")))
    bad = (Tier("t60", 60), Tier("t3600", 3600), Tier("t5400", 5400))
    with pytest.raises(ValueError, match="nest"):
        aligned_rollup_cascade(shard_dirs, bad, chunk_rows=synth.CHUNK_ROWS)


def test_aligned_single_tier(ray_session):
    """A single-tier list must work (finest tier only), not crash."""
    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    tbl = synth.read_all(d)
    shard_dirs = sorted(glob.glob(os.path.join(d, "shard=*")))
    out = aligned_rollup_cascade(shard_dirs, (TIERS[0],), chunk_rows=synth.CHUNK_ROWS)
    gold = oracle.rollup(tbl, TIERS[0])
    got = dataset_to_table(out[TIERS[0].name], ROLLUP_SCHEMA)
    assert_tables_bitwise_equal(gold, got, "single-tier t60")


def test_aligned_rejects_missing_leading_chunk(ray_session, tmp_path):
    """Dropping a source's leading chunk file shifts every group start; each
    group still covers a contiguous seq range, so only the c0 % k check can
    catch the misalignment."""
    import shutil

    spec = synth.SynthSpec(total_rows=120_000, num_sources=2, num_shards=1)
    d = synth.generate(spec, synth.default_cache_dir(spec))
    dst = tmp_path / "data"
    shutil.copytree(d, dst)
    shard_dirs = sorted(glob.glob(os.path.join(dst, "shard=*")))
    # delete the first chunk file of a source that has MULTIPLE chunk files
    # (deleting a single-chunk source would just drop the source cleanly)
    victim = None
    for f0 in sorted(glob.glob(os.path.join(shard_dirs[0], "part-*-00000.parquet"))):
        if os.path.exists(f0.replace("-00000.parquet", "-00001.parquet")):
            victim = f0
            break
    assert victim, "fixture layout changed: no multi-chunk source"
    os.remove(victim)
    with pytest.raises(Exception, match="unaligned"):
        out = aligned_rollup_cascade(shard_dirs, TIERS, chunk_rows=synth.CHUNK_ROWS)
        for t in TIERS:
            dataset_to_table(out[t.name])


def test_zcr_reference_rule():
    """zcr counts product<0: a transition through exact zero is NOT a
    crossing (caits/fe/_statistical.py:338)."""
    from crossai_ts_ray.functions import stats

    assert stats.zcr_value(np.array([1.0, 0.0, -1.0, 1.0])) == pytest.approx(1 / 3)
    assert stats.zcr_value(np.array([1.0, -1.0, 1.0, -1.0])) == pytest.approx(1.0)
    # rolling_zcr: edge-padded, signbit diff, / frame_length
    x = np.array([1.0, -2.0, 3.0, -4.0, 5.0, -6.0, 7.0, -8.0])
    frame, hop = 4, 2
    pad = np.pad(x, frame // 2, mode="edge")
    want = []
    for i in range(1 + (len(pad) - frame) // hop):
        fr = pad[i * hop : i * hop + frame]
        want.append(np.abs(np.diff(np.signbit(fr))).sum() / frame)
    got = stats.rolling_zcr(x, frame, hop)
    np.testing.assert_allclose(got, want)


def test_rolling_rms_center_padded():
    from crossai_ts_ray.functions import stats

    x = np.arange(10, dtype=np.float64)
    frame, hop = 4, 2
    pad = np.pad(x, frame // 2, mode="constant")
    want = [
        np.sqrt(np.mean(pad[i * hop : i * hop + frame] ** 2))
        for i in range(1 + (len(pad) - frame) // hop)
    ]
    np.testing.assert_allclose(stats.rolling_rms(x, frame, hop), want)


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


def test_coarse_aligned_groups_spill_empty_files(ray_session, monkeypatch, tmp_path):
    """A multi-group source whose group edges land on EVERY coarse tier's
    bucket boundary (the planner prefers exactly this stride) finalizes all
    tiers in-task and has zero partial rows to ship -- but each incomplete
    group must still write its (empty) spill file, or merge's fail-loud
    file count trips on healthy runs (seen at the 38.4M-row bench scale:
    expected 73 files, found 72).  Regression: stream + merge must succeed,
    spill_dir must hold exactly n_incomplete files, output bitwise-exact."""
    from crossai_ts_ray.stages.aligned import (
        aligned_rollup_stream,
        merge_spilled_partials,
    )

    monkeypatch.setenv("GRAFT_GROUP_TARGET_ROWS", str(synth.CHUNK_ROWS))
    spec = synth.SynthSpec(total_rows=75_000, num_sources=1, num_shards=1)
    d = synth.generate(spec, synth.default_cache_dir(spec))
    tbl = synth.read_all(d)
    shard_dirs = sorted(glob.glob(os.path.join(d, "shard=*")))
    # widths divide CHUNK_ROWS (=the pinned group stride), so every group
    # edge is bucket-aligned for every tier
    tiers = (Tier("w50", 50), Tier("w1000", 1000), Tier("w5000", 5000))
    spill = str(tmp_path / "spill")
    finalized, n_incomplete = aligned_rollup_stream(
        shard_dirs, tiers, chunk_rows=synth.CHUNK_ROWS, spill_dir=spill
    )
    assert n_incomplete == 3  # one source, three single-file groups
    got = dataset_to_table(finalized)
    assert len(glob.glob(os.path.join(spill, "g*.parquet"))) == n_incomplete
    merged = merge_spilled_partials(spill, tiers, n_incomplete)
    assert merged is None or dataset_to_table(merged).num_rows == 0
    import pyarrow.compute as pc

    for t in tiers:
        gold = oracle.rollup(tbl, t)
        sub = got.filter(pc.equal(got["tier"], t.name)).select(
            [f.name for f in ROLLUP_SCHEMA]
        )
        assert_tables_bitwise_equal(gold, sub, f"aligned-edges {t.name}")


def test_spill_merge_fails_loudly_on_missing_files(tmp_path):
    """Plan says n_incomplete groups spilled boundary partials; an empty
    spill_dir means workers wrote to storage the merger can't see (or files
    were lost) -- merging silently would drop aggregates, so it must raise."""
    from crossai_ts_ray.stages.aligned import merge_spilled_partials

    with pytest.raises(RuntimeError, match="spill"):
        merge_spilled_partials(str(tmp_path), TIERS, n_incomplete=3)
    # single-tier jobs never spill: an empty dir is the expected no-op
    assert merge_spilled_partials(str(tmp_path), TIERS[:1], n_incomplete=3) is None
    # and zero incomplete groups is a clean no-op at any tier depth
    assert merge_spilled_partials(str(tmp_path), TIERS, n_incomplete=0) is None
