"""Kill-and-resume: a job aborted mid-run must resume without recomputing
committed partitions and produce output identical to an uninterrupted run."""

from __future__ import annotations

import os

import numpy as np
import pytest

from crossai_ts_ray import oracle, synth
from crossai_ts_ray.schema import Tier
from crossai_ts_ray.state.checkpoint import (
    completed_partitions,
    read_job_output,
    read_lineage,
    run_rollup_job,
)

from .conftest import assert_tables_bitwise_equal

TIERS = (Tier("t60", 60), Tier("t240", 240))


def test_kill_and_resume(ray_session, tmp_path):
    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    out_a = str(tmp_path / "killed")
    out_b = str(tmp_path / "clean")

    # 1. killed run: commits exactly one partition then dies
    with pytest.raises(RuntimeError, match="simulated kill"):
        run_rollup_job(d, out_a, TIERS, salt_mod=0, batch_size=256, fail_after=1)
    assert len(completed_partitions(out_a)) == 1

    # capture lineage mtime of the committed partition
    pid = next(iter(completed_partitions(out_a)))
    lin = os.path.join(out_a, "_lineage", f"part-{pid}.parquet")
    mtime_before = os.path.getmtime(lin)

    # 2. resume: must skip the committed partition, compute the rest
    rep = run_rollup_job(d, out_a, TIERS, salt_mod=0, batch_size=256)
    assert rep.skipped == [pid]
    assert len(rep.computed) >= 1
    assert os.path.getmtime(lin) == mtime_before, "committed partition was recomputed"

    # 3. uninterrupted run in a fresh dir -> identical output at every tier
    run_rollup_job(d, out_b, TIERS, salt_mod=0, batch_size=256)
    for t in TIERS:
        a = read_job_output(out_a, t.name)
        b = read_job_output(out_b, t.name)
        assert_tables_bitwise_equal(a, b, f"resume-vs-clean {t.name}")

    # 4. ... and identical to the oracle
    tbl = synth.read_all(d)
    for t in TIERS:
        gold = oracle.rollup(tbl, t)
        got = read_job_output(out_a, t.name)
        assert_tables_bitwise_equal(gold, got, f"job-vs-oracle {t.name}")

    # 5. lineage records are complete and sane
    lineage = read_lineage(out_a)
    assert lineage.num_rows == len(completed_partitions(out_a))
    rows = lineage.to_pylist()
    for r in rows:
        assert r["rows"] > 0 and r["bytes"] > 0 and r["wall_time_s"] > 0
        assert r["watermark"] >= 0
        assert len(r["input_fragments"]) > 0


def test_rerun_is_noop(ray_session, tmp_path):
    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    out = str(tmp_path / "noop")
    run_rollup_job(d, out, TIERS, salt_mod=0, batch_size=256)
    rep = run_rollup_job(d, out, TIERS, salt_mod=0, batch_size=256)
    assert rep.computed == []
    assert len(rep.skipped) == 2  # TINY has 2 shards


def test_compressed_finest_tier(ray_session, tmp_path):
    """compress_finest writes a Gorilla/DoD segment copy that decodes back to
    the plain tier output."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    from crossai_ts_ray.stages.codec import decode_segment_column

    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    out = str(tmp_path / "ckpt")
    run_rollup_job(d, out, TIERS, compress_finest=True)
    seg_files = glob.glob(os.path.join(out, "tier=t60.gorilla", "part=*", "*.parquet"))
    assert seg_files
    plain = read_job_output(out, "t60").sort_by(
        [("source", "ascending"), ("bucket", "ascending")]
    )
    segs = pq.read_table(seg_files[0])
    for r in segs.to_pylist():
        src_rows = [
            i for i, s in enumerate(plain["source"].to_pylist())
            if s == r["source"]
            and r["bucket_lo"] <= plain["bucket"][i].as_py() <= r["bucket_hi"]
        ]
        sub = plain.take(src_rows)
        got = decode_segment_column(r, "mean", True)
        want = sub["mean"].to_numpy(zero_copy_only=False)
        assert (got.view(np.uint64) == want.view(np.uint64)).all()


def test_job_submit_entrypoint(tmp_path):
    """python -m crossai_ts_ray.job (the `ray job submit` driver script):
    run, then resume -- in fresh processes, like a real resubmission."""
    import json
    import subprocess
    import sys

    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    out = str(tmp_path / "job_out")
    cmd = [
        sys.executable, "-m", "crossai_ts_ray.job",
        "--input", d, "--out", out, "--tiers", "60,240",
    ]
    r1 = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo")
    assert r1.returncode == 0, r1.stderr[-500:]
    rep1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert len(rep1["computed"]) == 2 and rep1["skipped"] == []
    r2 = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo")
    assert r2.returncode == 0, r2.stderr[-500:]
    rep2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert rep2["computed"] == [] and len(rep2["skipped"]) == 2


def test_kill_and_resume_compressed(ray_session, tmp_path):
    """Kill-and-resume with compress_finest=True: the resumed run completes
    the Gorilla/DoD segment copy, and decode-on-read reconstructs the FULL
    finest tier bitwise (VERDICT r3 item 9)."""
    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    out = str(tmp_path / "killed_gz")

    with pytest.raises(RuntimeError, match="simulated kill"):
        run_rollup_job(
            d, out, TIERS, salt_mod=0, batch_size=256,
            fail_after=1, compress_finest=True,
        )
    assert len(completed_partitions(out)) == 1
    rep = run_rollup_job(
        d, out, TIERS, salt_mod=0, batch_size=256, compress_finest=True
    )
    assert len(rep.skipped) == 1 and len(rep.computed) >= 1

    fine = TIERS[0].name
    plain = read_job_output(out, fine).sort_by(
        [("source", "ascending"), ("bucket", "ascending")]
    )
    decoded = read_job_output(out, fine, from_compressed=True).sort_by(
        [("source", "ascending"), ("bucket", "ascending")]
    )
    assert plain.num_rows > 0
    assert_tables_bitwise_equal(plain, decoded, "compressed round-trip t60")


def test_ray_job_cli_runs_and_resumes(tmp_path):
    """jobs/run_rollup.py is the `ray job submit` entrypoint: a fresh
    process (owning its own Ray session, like a job driver) runs the
    checkpointed rollup, and a second invocation over the same --out-dir
    skips the committed partition instead of recomputing."""
    import json
    import subprocess
    import sys

    from crossai_ts_ray import synth

    spec = synth.SynthSpec(
        total_rows=8000, num_sources=4, num_shards=2, mean_n_tok=24.0
    )
    td = synth.generate(spec, synth.default_cache_dir(spec))
    out = str(tmp_path / "job_out")

    def run():
        r = subprocess.run(
            [sys.executable, "jobs/run_rollup.py", "--token-dir", td,
             "--out-dir", out, "--num-cpus", "2",
             "--shards-per-commit", "2"],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
            env={**__import__("os").environ, "RAY_ADDRESS": ""},
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    first = run()
    assert first["partitions_computed"] >= 1
    assert first["rows_per_tier"]["1m"] > 0
    second = run()
    assert second["partitions_computed"] == 0
    assert second["partitions_skipped"] >= 1
    assert second["rows_per_tier"] == first["rows_per_tier"]


def test_ray_maintenance_cli(tmp_path):
    """jobs/run_maintenance.py compacts + prunes a committed job output in
    a fresh process and is idempotent on re-run."""
    import json
    import subprocess
    import sys

    from crossai_ts_ray import synth

    spec = synth.SynthSpec(
        total_rows=8000, num_sources=4, num_shards=2, mean_n_tok=24.0
    )
    td = synth.generate(spec, synth.default_cache_dir(spec))
    out = str(tmp_path / "m_out")
    env = {**__import__("os").environ, "RAY_ADDRESS": ""}

    def run(script, *extra):
        r = subprocess.run(
            [sys.executable, script, "--out-dir", out, "--num-cpus", "2",
             *extra],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
            env=env,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    run("jobs/run_rollup.py", "--token-dir", td)
    m1 = run("jobs/run_maintenance.py", "--compact-tier", "1m",
             "--retention", "1m:40")
    assert "1m" in m1["compaction"] and "1m" in m1["retention"]
    m2 = run("jobs/run_maintenance.py", "--compact-tier", "1m",
             "--retention", "1m:40")
    assert m2["retention"]["1m"].get("files_rewritten", 0) in (0, "0")
