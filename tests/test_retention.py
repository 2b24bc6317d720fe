"""Retention-policy enforcement: per-tier keep-last-K pruning over the
committed job output -- exact vs an oracle filter, idempotent, resumable,
and file-stat-driven (whole files dropped/kept without rewrite)."""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow.compute as pc
import pytest

from crossai_ts_ray import oracle, synth
from crossai_ts_ray.schema import Tier
from crossai_ts_ray.state.checkpoint import (
    completed_partitions,
    read_job_output,
    run_rollup_job,
)
from crossai_ts_ray.state.retention import apply_retention, tier_horizons

from .conftest import assert_tables_bitwise_equal

TIERS = (Tier("t60", 60), Tier("t240", 240))
KEEP = 5


def _oracle_pruned(tbl, tier, keep_last):
    """Expected survivors: per-source bucket >= max_bucket + 1 - keep_last."""
    gold = oracle.rollup(tbl, tier)
    src = gold["source"].to_numpy(zero_copy_only=False)
    bkt = gold["bucket"].to_numpy(zero_copy_only=False)
    hz = {}
    for s in np.unique(src):
        hz[s] = bkt[src == s].max() + 1 - keep_last
    import pyarrow as pa

    keep = bkt >= np.array([hz[s] for s in src])
    return gold.filter(pa.array(keep))


@pytest.fixture(scope="module")
def pruned_job(ray_session, tmp_path_factory):
    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    out = str(tmp_path_factory.mktemp("retention") / "job")
    run_rollup_job(d, out, TIERS, salt_mod=0, batch_size=256)
    summary = apply_retention(out, {"t60": KEEP})
    return d, out, summary


def test_retention_matches_oracle_filter(pruned_job):
    d, out, summary = pruned_job
    tbl = synth.read_all(d)
    got = read_job_output(out, "t60")
    want = _oracle_pruned(tbl, TIERS[0], KEEP)
    assert_tables_bitwise_equal(want, got, "retention t60")
    # the un-pruned tier is untouched
    assert_tables_bitwise_equal(
        oracle.rollup(tbl, TIERS[1]), read_job_output(out, "t240"), "t240 intact"
    )
    st = summary["t60"]
    assert st["rows_dropped"] > 0
    assert st["partitions_pruned"] == len(completed_partitions(out))
    assert st["files_dropped"] + st["files_rewritten"] + st["files_kept"] > 0


def test_retention_idempotent_and_resumable(pruned_job):
    d, out, _ = pruned_job
    before = read_job_output(out, "t60")
    # second run: every partition skipped via its policy marker
    again = apply_retention(out, {"t60": KEEP})
    assert again["t60"]["partitions_pruned"] == 0
    assert again["t60"]["partitions_skipped"] > 0
    # simulate a crash that lost one marker: only that partition re-prunes,
    # and re-pruning already-pruned data is a no-op on the rows
    marker = sorted(glob.glob(os.path.join(out, "_lineage", "prune-t60-*.json")))[0]
    os.unlink(marker)
    third = apply_retention(out, {"t60": KEEP})
    assert third["t60"]["partitions_pruned"] == 1
    assert os.path.exists(marker)
    # fingerprint = policy + horizon signature (horizons advance with data)
    assert json.load(open(marker))["policy"].startswith(f"keep_last={KEEP};h=")
    assert_tables_bitwise_equal(before, read_job_output(out, "t60"), "re-prune noop")


def test_retention_tightening_policy_reprunes(pruned_job):
    d, out, _ = pruned_job
    tbl = synth.read_all(d)
    tighter = apply_retention(out, {"t60": KEEP - 2})
    assert tighter["t60"]["partitions_pruned"] > 0  # markers invalidated
    want = _oracle_pruned(tbl, TIERS[0], KEEP - 2)
    assert_tables_bitwise_equal(want, read_job_output(out, "t60"), "tightened")


def test_retention_rebuilds_compressed_copy(ray_session, tmp_path):
    """With compress_finest=True the Gorilla segment copy is 'the
    retention-store representation' -- pruning the plain tier must re-encode
    it, keeping read_job_output(from_compressed=True) bitwise identical."""
    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    out = str(tmp_path / "job")
    run_rollup_job(d, out, TIERS, salt_mod=0, batch_size=256, compress_finest=True)
    apply_retention(out, {"t60": KEEP})
    plain = read_job_output(out, "t60")
    comp = read_job_output(out, "t60", from_compressed=True)
    assert_tables_bitwise_equal(plain, comp, "compressed copy re-encoded")
    tbl = synth.read_all(d)
    assert_tables_bitwise_equal(
        _oracle_pruned(tbl, TIERS[0], KEEP), plain, "pruned vs oracle"
    )


def test_retention_reprunes_when_horizons_advance(ray_session, tmp_path):
    """Markers must NOT suppress pruning after the data grows: later ingest
    advances a source's horizon, and rows older than the NEW horizon must
    age out even in partitions that were already pruned under the old one
    (review finding: a keep_last-only fingerprint skipped them forever)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    out = str(tmp_path / "job")
    run_rollup_job(d, out, TIERS, salt_mod=0, batch_size=256)
    apply_retention(out, {"t60": KEEP})
    # simulate a later ingest: clone one committed row 100 buckets into the
    # future for its source -- that source's keep-last horizon advances
    pdir = sorted(glob.glob(os.path.join(out, "tier=t60", "part=*")))[0]
    f0 = sorted(glob.glob(os.path.join(pdir, "*.parquet")))[0]
    t = pq.read_table(f0)
    row = t.slice(0, 1)
    src0 = row["source"][0].as_py()
    new_bucket = int(
        max(tier_horizons(out, "t60", 1).values())
    ) + 100
    row = row.set_column(
        row.schema.get_field_index("bucket"),
        "bucket",
        pa.array([new_bucket], row.schema.field("bucket").type),
    )
    pq.write_table(row, os.path.join(pdir, "zz-future.parquet"))
    res = apply_retention(out, {"t60": KEEP})
    # fingerprint changed -> no partition skipped behind a stale marker
    assert res["t60"]["partitions_skipped"] == 0
    assert res["t60"]["rows_dropped"] > 0  # src0's old buckets age out
    got = read_job_output(out, "t60")
    src = got["source"].to_numpy(zero_copy_only=False)
    bkt = got["bucket"].to_numpy(zero_copy_only=False)
    assert bkt[src == src0].min() >= new_bucket + 1 - KEEP


def test_retention_skips_rebuild_of_untouched_compressed_copy(
    ray_session, tmp_path
):
    """A re-prune that drops nothing must not re-encode the Gorilla copy
    (review finding): the _plainfp sidecar gates the rebuild."""
    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    out = str(tmp_path / "job")
    run_rollup_job(
        d, out, TIERS, salt_mod=0, batch_size=256, compress_finest=True
    )
    apply_retention(out, {"t60": KEEP})
    segs = sorted(
        glob.glob(os.path.join(out, "tier=t60.gorilla", "part=*", "*.parquet"))
    )
    stat_before = [(os.path.getmtime(s), os.path.getsize(s)) for s in segs]
    # lose one marker (simulated crash): that partition re-prunes as a
    # no-op and the sidecar must spare the re-encode
    marker = sorted(
        glob.glob(os.path.join(out, "_lineage", "prune-t60-*.json"))
    )[0]
    os.unlink(marker)
    apply_retention(out, {"t60": KEEP})
    assert [
        (os.path.getmtime(s), os.path.getsize(s)) for s in segs
    ] == stat_before
    # parity still holds
    assert_tables_bitwise_equal(
        read_job_output(out, "t60"),
        read_job_output(out, "t60", from_compressed=True),
        "compressed copy parity after no-op re-prune",
    )


def test_retention_horizons_and_validation(pruned_job):
    d, out, _ = pruned_job
    hz = tier_horizons(out, "t240", 3)
    tbl = synth.read_all(d)
    gold = oracle.rollup(tbl, TIERS[1])
    src = gold["source"].to_numpy(zero_copy_only=False)
    bkt = gold["bucket"].to_numpy(zero_copy_only=False)
    for s in np.unique(src):
        assert hz[s] == bkt[src == s].max() + 1 - 3
    with pytest.raises(ValueError, match="keep_last"):
        tier_horizons(out, "t240", 0)
    assert tier_horizons(out, "no_such_tier", 3) == {}
