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


def _late_fragment(src: str, late_seqs: list[int],
                   tail_seqs: list[int]) -> pa.Table:
    """An out-of-order append: some rows land in already-final buckets
    (late), some past the watermark (on-time tail)."""
    seq = np.array(late_seqs + tail_seqs, dtype=np.int64)
    rng = np.random.default_rng(99)
    n_tok = rng.integers(1, 6, len(seq)).astype(np.int32)
    toks = pa.array(
        [list(range(int(n))) for n in n_tok], pa.list_(pa.int32())
    )
    return pa.table(
        {
            "doc_id": pa.array([f"{src}-late-{s}" for s in seq], pa.string()),
            "tokens": toks,
            "n_tok": pa.array(n_tok, pa.int32()),
            "source": pa.array([src] * len(seq), pa.string()),
            "seq": pa.array(seq, pa.int64()),
        },
        schema=TOKEN_SCHEMA,
    )


def test_late_policy_drop_pins_watermark_semantics(ray_session, tmp_path):
    """late_policy='drop': appended rows at or below the committed
    watermark (minus allowed_lateness) are dropped, the rest recompute --
    output is BITWISE a fresh run over the input with those rows
    physically absent; the dropped count lands in the lineage row."""
    from crossai_ts_ray.state.checkpoint import read_lineage

    grow = str(tmp_path / "grow")
    _write_chunks(grow, "a", [0, 1])
    out = grow + "-out"
    rep1 = run_rollup_job(grow, out, TIERS, salt_mod=0)
    assert rep1.computed == ["0"]
    lin1 = read_lineage(out)
    wm = int(lin1["watermark"][0].as_py())  # max t60 bucket committed
    assert wm == (2 * CR - 1) // 60

    # append: 3 late rows (buckets <= wm), 2 on-time rows (bucket > wm)
    late = [5, 61, 2 * CR - 1]              # all inside committed buckets
    tail = [(wm + 1) * 60, (wm + 2) * 60]   # strictly past the watermark
    frag = _late_fragment("a", late, tail)
    pq.write_table(frag, os.path.join(grow, "shard=0", "part-a-late.parquet"))

    rep2 = run_rollup_job(grow, out, TIERS, salt_mod=0,
                          late_policy="drop", allowed_lateness=0)
    assert rep2.recomputed == ["0"]
    lin2 = read_lineage(out)
    assert int(lin2["late_rows_dropped"][0].as_py()) == len(late)

    # oracle: fresh job over the SAME input with the late rows physically
    # absent (generic cascade on both sides; aligned==generic is pinned
    # separately in test_aligned.py)
    fresh = str(tmp_path / "fresh")
    _write_chunks(fresh, "a", [0, 1])
    keep = frag.filter(
        pa.compute.greater(pa.compute.divide(frag["seq"], 60), wm)
    )
    pq.write_table(keep, os.path.join(fresh, "shard=0", "part-a-late.parquet"))
    run_rollup_job(fresh, fresh + "-out", TIERS, salt_mod=0, aligned=False)
    for t in TIERS:
        assert_tables_bitwise_equal(
            read_job_output(fresh + "-out", t.name),
            read_job_output(out, t.name),
            f"drop-policy == fresh-filtered {t.name}",
        )


def test_late_policy_lateness_window_accepts_recent(ray_session, tmp_path):
    """allowed_lateness=K reopens the last K buckets: a row K buckets
    behind the watermark is kept, an older one still drops."""
    from crossai_ts_ray.state.checkpoint import read_lineage

    grow = str(tmp_path / "grow")
    _write_chunks(grow, "a", [0, 1])
    out = grow + "-out"
    run_rollup_job(grow, out, TIERS, salt_mod=0)
    wm = (2 * CR - 1) // 60

    # one row in bucket wm (inside a 2-bucket window), one in bucket 0
    frag = _late_fragment("a", [0, wm * 60], [])
    pq.write_table(frag, os.path.join(grow, "shard=0", "part-a-late.parquet"))
    rep = run_rollup_job(grow, out, TIERS, salt_mod=0,
                         late_policy="drop", allowed_lateness=2)
    assert rep.recomputed == ["0"]
    lin = read_lineage(out)
    assert int(lin["late_rows_dropped"][0].as_py()) == 1  # only bucket 0

    fresh = str(tmp_path / "fresh")
    _write_chunks(fresh, "a", [0, 1])
    keep = frag.filter(
        pa.compute.greater(pa.compute.divide(frag["seq"], 60), wm - 2)
    )
    pq.write_table(keep, os.path.join(fresh, "shard=0", "part-a-late.parquet"))
    run_rollup_job(fresh, fresh + "-out", TIERS, salt_mod=0, aligned=False)
    for t in TIERS:
        assert_tables_bitwise_equal(
            read_job_output(fresh + "-out", t.name),
            read_job_output(out, t.name),
            f"lateness-window == fresh-filtered {t.name}",
        )


def test_late_policy_recompute_unchanged_default(ray_session, tmp_path):
    """The default policy is untouched: recompute incorporates EVERY
    appended row (continuous-aggregate semantics), late or not.  A
    misaligned late fragment breaks the aligned-chunk naming contract
    (rejected loudly by design), so this run rides the generic cascade."""
    grow = str(tmp_path / "grow")
    _write_chunks(grow, "a", [0, 1])
    out = grow + "-out"
    run_rollup_job(grow, out, TIERS, salt_mod=0, aligned=False)
    frag = _late_fragment("a", [5], [2 * CR + 3])
    pq.write_table(frag, os.path.join(grow, "shard=0", "part-a-late.parquet"))
    run_rollup_job(grow, out, TIERS, salt_mod=0, aligned=False)

    fresh = str(tmp_path / "fresh")
    _write_chunks(fresh, "a", [0, 1])
    pq.write_table(frag, os.path.join(fresh, "shard=0", "part-a-late.parquet"))
    run_rollup_job(fresh, fresh + "-out", TIERS, salt_mod=0, aligned=False)
    for t in TIERS:
        assert_tables_bitwise_equal(
            read_job_output(fresh + "-out", t.name),
            read_job_output(out, t.name),
            f"recompute == fresh-full {t.name}",
        )
