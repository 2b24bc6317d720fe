"""Small-file compaction: row-preserving, crash-safe (manifest two-phase),
idempotent-to-convergence, and composable with retention."""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crossai_ts_ray import oracle, synth
from crossai_ts_ray.schema import Tier
from crossai_ts_ray.state.checkpoint import read_job_output, run_rollup_job
from crossai_ts_ray.state.compact import (
    compact_partitions,
    recover_compactions,
)
from crossai_ts_ray.state.retention import apply_retention

from .conftest import assert_tables_bitwise_equal

TIERS = (Tier("t60", 60), Tier("t240", 240))


def _tier_files(out: str, tier: str) -> list[str]:
    return sorted(glob.glob(os.path.join(out, f"tier={tier}", "part=*", "*.parquet")))


def test_compaction_row_preserving(ray_session, tmp_path):
    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    out = str(tmp_path / "job")
    run_rollup_job(d, out, TIERS, salt_mod=0, batch_size=256)
    before = read_job_output(out, "t60")
    n_before = len(_tier_files(out, "t60"))
    summary = compact_partitions(out, "t60", target_bytes=1 << 30)
    assert summary["files_after"] < summary["files_before"] == n_before
    assert len(_tier_files(out, "t60")) == summary["files_after"]
    assert_tables_bitwise_equal(before, read_job_output(out, "t60"), "compact t60")
    # convergence: a fully-compacted tier (one file per partition) no-ops
    again = compact_partitions(out, "t60", target_bytes=1 << 30)
    assert again["bins"] == 0
    assert again["files_after"] == summary["files_after"]
    # oracle still matches through the compacted read path
    gold = oracle.rollup(synth.read_all(d), TIERS[0])
    assert_tables_bitwise_equal(gold, read_job_output(out, "t60"), "vs oracle")


def test_compaction_crash_recovery(tmp_path):
    """A manifest that renamed into place but whose promote/unlinks never
    ran (crash right after the commit point) must be replayed exactly."""
    pdir = tmp_path / "tier=t60" / "part=00"
    pdir.mkdir(parents=True)
    t1 = pa.table({"source": ["a"], "bucket": [0], "v": [1]})
    t2 = pa.table({"source": ["a"], "bucket": [1], "v": [2]})
    t3 = pa.table({"source": ["b"], "bucket": [0], "v": [3]})
    pq.write_table(t1, str(pdir / "f1.parquet"))
    pq.write_table(t2, str(pdir / "f2.parquet"))
    pq.write_table(t3, str(pdir / "f3.parquet"))
    # simulate the crash window: compacted tmp + committed manifest exist,
    # originals not yet unlinked
    comp = pa.concat_tables([t1, t2])
    pq.write_table(comp, str(pdir / "c-0-deadbeef.parquet.tmp"))
    with open(pdir / ".compact-0.manifest.json", "w") as fh:
        json.dump(
            {"compacted": "c-0-deadbeef.parquet",
             "replaces": ["f1.parquet", "f2.parquet"]},
            fh,
        )
    assert recover_compactions(str(pdir)) == 1
    files = sorted(os.path.basename(f) for f in glob.glob(str(pdir / "*.parquet")))
    assert files == ["c-0-deadbeef.parquet", "f3.parquet"]
    got = pa.concat_tables([pq.read_table(f) for f in sorted(glob.glob(str(pdir / "*.parquet")))])
    assert sorted(got["v"].to_pylist()) == [1, 2, 3]
    # replaying again is a no-op
    assert recover_compactions(str(pdir)) == 0
    # a manifest pointing at a missing compacted file must refuse loudly
    with open(pdir / ".compact-1.manifest.json", "w") as fh:
        json.dump({"compacted": "c-1-missing.parquet", "replaces": ["f3.parquet"]}, fh)
    with pytest.raises(RuntimeError, match="missing"):
        recover_compactions(str(pdir))


def test_compaction_then_retention(ray_session, tmp_path):
    """Store maintenance composes: compact first, then age out -- results
    identical to retention alone."""
    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    for out in (out_a, out_b):
        run_rollup_job(d, out, TIERS, salt_mod=0, batch_size=256)
    compact_partitions(out_a, "t60", target_bytes=1 << 30)
    apply_retention(out_a, {"t60": 4})
    apply_retention(out_b, {"t60": 4})
    assert_tables_bitwise_equal(
        read_job_output(out_b, "t60"), read_job_output(out_a, "t60"),
        "compact+retention == retention",
    )
