"""Persisted exact-dedup index: cross-shard novelty, in-shard first
occurrence, replay idempotence, crash recovery (.tmp without marker),
and partition-pruned novel-id reads."""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")


def _write_shard(path, texts, start_id=0):
    pq.write_table(pa.table({
        "doc_id": pa.array(
            np.arange(start_id, start_id + len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }), str(path))


def test_ingest_novelty_and_replay(ray_session, tmp_path):
    from crossai_ts_ray.state.dedup_index import (
        index_stats,
        ingest_documents,
        novel_doc_ids,
    )

    root = str(tmp_path / "idx")
    s1 = tmp_path / "shard1.parquet"
    # shard 1: 3 distinct texts, one in-shard duplicate (doc 3 == doc 0)
    _write_shard(s1, ["alpha", "beta", "gamma", "alpha"])
    r1 = ingest_documents(root, str(s1), "b1", buckets=8)
    assert r1 == {"total": 4, "novel": 3, "dup": 1, "replayed": False}
    ids1 = set(novel_doc_ids(root, "b1", buckets=8).to_pandas()["doc_id"])
    assert ids1 == {0, 1, 2}  # in-shard dup keeps the FIRST doc_id

    # shard 2: one cross-shard dup, one new
    s2 = tmp_path / "shard2.parquet"
    _write_shard(s2, ["beta", "delta"], start_id=10)
    r2 = ingest_documents(root, str(s2), "b2", buckets=8)
    assert r2 == {"total": 2, "novel": 1, "dup": 1, "replayed": False}
    ids2 = set(novel_doc_ids(root, "b2", buckets=8).to_pandas()["doc_id"])
    assert ids2 == {11}

    # replay of shard 2 is a no-op with identical numbers
    r2b = ingest_documents(root, str(s2), "b2", buckets=8)
    assert r2b == {"total": 2, "novel": 1, "dup": 1, "replayed": True}
    assert index_stats(root, buckets=8)["hashes"] == 4


def test_crash_recovery_tmp_without_marker(ray_session, tmp_path):
    """A .tmp left by a crash (no marker) must not count as committed:
    the re-run ingests normally and the numbers match a clean run."""
    from crossai_ts_ray.state.dedup_index import (
        index_stats,
        ingest_documents,
    )

    root = str(tmp_path / "idx")
    s1 = tmp_path / "shard1.parquet"
    _write_shard(s1, ["one", "two"])
    ingest_documents(root, str(s1), "b1", buckets=4)
    # fake a crashed second ingest: orphan .tmp data, NO marker
    pdir = os.path.join(root, "part=0")
    pq.write_table(pa.table({"h": pa.array(["deadbeef"], pa.string())}),
                   os.path.join(pdir, "seen-bX.parquet.tmp"))
    before = index_stats(root, buckets=4)["hashes"]
    s2 = tmp_path / "shard2.parquet"
    _write_shard(s2, ["one", "three"], start_id=5)
    r = ingest_documents(root, str(s2), "b2", buckets=4)
    assert r["novel"] == 1 and r["dup"] == 1
    # the orphan .tmp contributed nothing (readers glob *.parquet only)
    assert index_stats(root, buckets=4)["hashes"] == before + 1


def test_partial_marker_replay(ray_session, tmp_path):
    """If SOME partitions committed before a crash, the re-run redoes
    only the uncommitted ones and totals stay exact."""
    from crossai_ts_ray.state.dedup_index import (
        index_stats,
        ingest_documents,
    )

    root = str(tmp_path / "idx")
    s1 = tmp_path / "shard1.parquet"
    texts = [f"text number {i}" for i in range(40)]
    _write_shard(s1, texts)
    ingest_documents(root, str(s1), "b1", buckets=4)
    n_committed = index_stats(root, buckets=4)["hashes"]
    assert n_committed == 40
    # simulate a crash mid-b2: remove ONE partition's marker after a full
    # ingest (its data files stay -- exactly the replay-the-survivor case)
    s2 = tmp_path / "shard2.parquet"
    _write_shard(s2, [f"text number {i}" for i in range(30, 50)],
                 start_id=100)
    ingest_documents(root, str(s2), "b2", buckets=4)
    killed = os.path.join(root, "part=2")
    os.remove(os.path.join(killed, ".ingest-b2.done"))
    # also remove its committed data to mimic death before both renames
    for f in os.listdir(killed):
        if "b2" in f:
            os.remove(os.path.join(killed, f))
    r = ingest_documents(root, str(s2), "b2", buckets=4)
    assert r["replayed"] is False  # one partition really re-ran
    assert index_stats(root, buckets=4)["hashes"] == 50
    r2 = ingest_documents(root, str(s2), "b2", buckets=4)
    assert r2["replayed"] is True
    assert r2["novel"] == 10  # 30..39 dup vs shard1, 40..49 novel
