"""Continuous-aggregate semantics: a committed partition is final only for
the input fragments its lineage row names -- appended chunk files trigger an
atomic recompute of that partition (and invalidate its retention markers);
unchanged partitions still skip."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crossai_ts_ray import synth
from crossai_ts_ray.schema import TOKEN_SCHEMA, Tier
from crossai_ts_ray.state.checkpoint import read_job_output, run_rollup_job
from crossai_ts_ray.state.retention import apply_retention

from .conftest import assert_tables_bitwise_equal

TIERS = (Tier("t60", 60), Tier("t240", 240))
CR = synth.CHUNK_ROWS


def _chunk(src: str, idx: int) -> pa.Table:
    """One deterministic aligned chunk file: seq [idx*CR, (idx+1)*CR)."""
    seq = np.arange(idx * CR, (idx + 1) * CR, dtype=np.int64)
    rng = np.random.default_rng(hash((src, idx)) % (2**32))
    n_tok = rng.integers(1, 6, len(seq)).astype(np.int32)
    toks = pa.array(
        [list(range(int(n))) for n in n_tok], pa.list_(pa.int32())
    )
    return pa.table(
        {
            "doc_id": pa.array([f"{src}-{s}" for s in seq], pa.string()),
            "tokens": toks,
            "n_tok": pa.array(n_tok, pa.int32()),
            "source": pa.array([src] * len(seq), pa.string()),
            "seq": pa.array(seq, pa.int64()),
        },
        schema=TOKEN_SCHEMA,
    )


def _write_chunks(d: str, src: str, idxs: list[int]) -> None:
    os.makedirs(os.path.join(d, "shard=0"), exist_ok=True)
    for i in idxs:
        pq.write_table(
            _chunk(src, i), os.path.join(d, "shard=0", f"part-{src}-{i}.parquet")
        )


def test_appended_fragments_recompute(ray_session, tmp_path):
    grow = str(tmp_path / "grow")
    full = str(tmp_path / "full")
    _write_chunks(grow, "a", [0, 1])

    rep1 = run_rollup_job(grow, grow + "-out", TIERS, salt_mod=0)
    assert rep1.computed == ["0"] and rep1.recomputed == []

    # unchanged rerun: pure skip
    rep2 = run_rollup_job(grow, grow + "-out", TIERS, salt_mod=0)
    assert rep2.skipped == ["0"] and rep2.computed == [] and rep2.recomputed == []

    # retention marker exists, then data grows
    apply_retention(grow + "-out", {"t60": 10**6})  # horizon below all: no-op prune
    marker = os.path.join(grow + "-out", "_lineage", "prune-t60-0.json")
    assert os.path.exists(marker)

    _write_chunks(grow, "a", [2])  # append one chunk file
    rep3 = run_rollup_job(grow, grow + "-out", TIERS, salt_mod=0)
    assert rep3.recomputed == ["0"] and rep3.computed == ["0"]
    assert not os.path.exists(marker), "stale retention marker must be dropped"

    # recomputed output == a fresh job over the full input, every tier
    _write_chunks(full, "a", [0, 1, 2])
    run_rollup_job(full, full + "-out", TIERS, salt_mod=0)
    for t in TIERS:
        assert_tables_bitwise_equal(
            read_job_output(full + "-out", t.name),
            read_job_output(grow + "-out", t.name),
            f"incremental == fresh {t.name}",
        )
    # exactly one lineage row, naming all three fragments
    lin = glob.glob(os.path.join(grow + "-out", "_lineage", "part-*.parquet"))
    assert len(lin) == 1
    frags = pq.read_table(lin[0])["input_fragments"][0].as_py()
    assert sorted(frags) == [f"part-a-{i}.parquet" for i in range(3)]
