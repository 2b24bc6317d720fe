"""Persisted exact-dedup index: the production "seen hashes" state for
INCREMENTAL corpus ingest -- new document shards arrive forever; each
shard must keep only documents never seen in ANY earlier shard, without
rescanning the accumulated corpus.

Layout: ``root/part=K/seen-<batch>.parquet`` -- md5 fingerprints hash-
partitioned by ``hash_prt`` over the digest's first 8 bytes, so an ingest
touches only the partitions its own hashes land in (at 10^12 documents a
partition listing is metadata-sized while the full index never loads).

Crash-safety (the state/compact.py two-phase pattern): hashes write to
``.tmp`` files first; a per-(partition, batch) MARKER rename is the
commit point.  A replayed ingest sees the marker and skips (idempotent);
a crash before the marker leaves only ``.tmp`` files, which readers never
glob and a re-run overwrites.

Reference parity: crossai-ts has no incremental state; this extends the
engine's checkpoint/resume design (state/checkpoint.py) to the dedup
family the LLM-pipeline section requires.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..stages.joins import hash_prt

_SEEN_SCHEMA = pa.schema([("h", pa.string())])


def _h64(hexes: np.ndarray) -> np.ndarray:
    """First 8 digest bytes as int64 (partitioning key)."""
    return np.array(
        [np.int64(np.uint64(int(h[:16], 16))) for h in hexes], np.int64
    )


def _fingerprints(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    from ..functions.text import md5_fingerprint

    texts = t["text"].to_pylist()
    hexes = np.array([md5_fingerprint(x) for x in texts])
    return hexes, _h64(hexes)


def _part_dir(root: str, p: int) -> str:
    return os.path.join(root, f"part={p}")


def _marker(pdir: str, batch: str) -> str:
    return os.path.join(pdir, f".ingest-{batch}.done")


def ingest_documents(root: str, docs_path: str, batch_id: str,
                     buckets: int = 32) -> dict:
    """Ingest one document shard against the persisted index: returns
    ``{"total": N, "novel": M, "dup": N - M, "replayed": bool}`` and
    appends the novel fingerprints, two-phase.  Novel DOC IDS are also
    persisted (``novel-<batch>.parquet`` per partition) so a downstream
    clean-corpus writer can join them back without recomputing.

    Scale shape: the shard maps to (hash, prt) rows batch-combined; ONE
    groupby(prt) lands each hash next to its partition's seen file; each
    partition task reads ONLY its own partition directory (partition-
    pruned, metadata listing), anti-joins via one sorted membership
    test, and two-phase-commits its novel hashes.  In-shard duplicates
    dedupe to their first doc_id in the same pass."""
    os.makedirs(root, exist_ok=True)
    done = [
        p for p in range(buckets)
        if os.path.exists(_marker(_part_dir(root, p), batch_id))
    ]
    if len(done) == buckets:
        # full replay: report from the persisted novel files
        novel = 0
        total = 0
        for p in range(buckets):
            f = os.path.join(_part_dir(root, p), f"novel-{batch_id}.parquet")
            if os.path.exists(f):
                novel += pq.read_metadata(f).num_rows
            mfile = _marker(_part_dir(root, p), batch_id)
            total += json.load(open(mfile)).get("rows", 0)
        return {"total": total, "novel": novel, "dup": total - novel,
                "replayed": True}

    from ..sources.readers import read_parquet_sized

    docs = read_parquet_sized(docs_path, columns=["doc_id", "text"])

    map_schema = pa.schema([
        ("h", pa.string()), ("doc_id", pa.int64()), ("prt", pa.int64()),
    ])

    def to_hashes(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=map_schema)
        hexes, h64 = _fingerprints(t)
        did = t["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "h": pa.array(hexes, pa.string()),
            "doc_id": pa.array(did, pa.int64()),
            "prt": pa.array(hash_prt(h64, buckets), pa.int64()),
        }, schema=map_schema)

    stat_schema = pa.schema([("rows", pa.int64()), ("novel", pa.int64())])

    def ingest_partition(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        p = int(g["prt"][0].as_py())
        pdir = _part_dir(root, p)
        os.makedirs(pdir, exist_ok=True)
        if os.path.exists(_marker(pdir, batch_id)):  # partial replay
            f = os.path.join(pdir, f"novel-{batch_id}.parquet")
            nv = pq.read_metadata(f).num_rows if os.path.exists(f) else 0
            return pa.table({"rows": pa.array([g.num_rows], pa.int64()),
                             "novel": pa.array([nv], pa.int64())},
                            schema=stat_schema)
        hx = np.asarray(g["h"].to_pylist())
        did = g["doc_id"].to_numpy(zero_copy_only=False)
        # in-shard first occurrence by (hash, doc_id)
        order = np.lexsort((did, hx))
        hx_s, did_s = hx[order], did[order]
        first = np.concatenate(([True], hx_s[1:] != hx_s[:-1]))
        hx_u, did_u = hx_s[first], did_s[first]
        # seen set: every committed file in THIS partition only
        seen_files = [
            os.path.join(pdir, f) for f in os.listdir(pdir)
            if f.startswith("seen-") and f.endswith(".parquet")
        ]
        if seen_files:
            seen = np.sort(np.concatenate([
                np.asarray(pq.read_table(f, columns=["h"])["h"].to_pylist())
                for f in seen_files
            ]))
            at = np.searchsorted(seen, hx_u)
            at_c = np.minimum(at, len(seen) - 1)
            novel_mask = ~(seen[at_c] == hx_u) if len(seen) else np.ones(
                len(hx_u), bool)
        else:
            novel_mask = np.ones(len(hx_u), bool)
        hx_n, did_n = hx_u[novel_mask], did_u[novel_mask]
        # two-phase commit: data to .tmp, marker rename is the commit
        seen_tmp = os.path.join(pdir, f"seen-{batch_id}.parquet.tmp")
        novel_tmp = os.path.join(pdir, f"novel-{batch_id}.parquet.tmp")
        pq.write_table(pa.table({"h": pa.array(hx_n, pa.string())},
                                schema=_SEEN_SCHEMA), seen_tmp)
        pq.write_table(pa.table({
            "h": pa.array(hx_n, pa.string()),
            "doc_id": pa.array(did_n, pa.int64()),
        }), novel_tmp)
        os.replace(seen_tmp, os.path.join(pdir, f"seen-{batch_id}.parquet"))
        os.replace(novel_tmp, os.path.join(pdir, f"novel-{batch_id}.parquet"))
        m_tmp = _marker(pdir, batch_id) + ".tmp"
        with open(m_tmp, "w") as fh:
            json.dump({"batch": batch_id, "rows": g.num_rows,
                       "novel": int(novel_mask.sum())}, fh)
        os.replace(m_tmp, _marker(pdir, batch_id))
        return pa.table({"rows": pa.array([g.num_rows], pa.int64()),
                         "novel": pa.array([int(novel_mask.sum())],
                                           pa.int64())}, schema=stat_schema)

    from ..util import dataset_to_table

    stats = dataset_to_table(
        docs.map_batches(to_hashes, batch_format="pyarrow",
                         batch_size=65536)
        .groupby("prt")
        .map_groups(ingest_partition, batch_format="pyarrow"),
        schema=stat_schema,
    )
    total = int(stats["rows"].to_numpy(zero_copy_only=False).sum())
    novel = int(stats["novel"].to_numpy(zero_copy_only=False).sum())
    # mark empty partitions done too, so a replay short-circuits fully
    for p in range(buckets):
        pdir = _part_dir(root, p)
        os.makedirs(pdir, exist_ok=True)
        if not os.path.exists(_marker(pdir, batch_id)):
            m_tmp = _marker(pdir, batch_id) + ".tmp"
            with open(m_tmp, "w") as fh:
                json.dump({"batch": batch_id, "rows": 0, "novel": 0}, fh)
            os.replace(m_tmp, _marker(pdir, batch_id))
    return {"total": total, "novel": novel, "dup": total - novel,
            "replayed": False}


def novel_doc_ids(root: str, batch_id: str, buckets: int = 32) -> rd.Dataset:
    """The doc_ids a committed ingest admitted (partition-pruned read of
    just that batch's novel files) -- what a clean-corpus writer joins
    against the shard to materialize deduped documents."""
    files = []
    for p in range(buckets):
        f = os.path.join(_part_dir(root, p), f"novel-{batch_id}.parquet")
        if os.path.exists(f):
            files.append(f)
    if not files:
        return rd.from_arrow(pa.table({
            "h": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
        }))
    return rd.read_parquet(files)


def index_stats(root: str, buckets: int = 32) -> dict:
    """Metadata-only index telemetry: committed hashes and file counts
    per partition (parquet footers, no data reads)."""
    n = 0
    files = 0
    for p in range(buckets):
        pdir = _part_dir(root, p)
        if not os.path.isdir(pdir):
            continue
        for f in os.listdir(pdir):
            if f.startswith("seen-") and f.endswith(".parquet"):
                n += pq.read_metadata(os.path.join(pdir, f)).num_rows
                files += 1
    return {"hashes": n, "files": files}


def corpus_ingest_job(sf_dir: str, buckets: int = 16) -> pa.Table:
    """Driver query: two-shard incremental ingest of the documents table
    (even doc_ids arrive first, odd second) through a FRESH persisted
    index; returns per-shard admission stats.  Every number is SQL-
    checkable (DuckDB ``md5``): shard-1 novel = distinct hashes, shard-2
    novel = distinct hashes unseen in shard 1."""
    import tempfile

    import pyarrow.compute as pc

    from ..sources.readers import read_parquet_sized

    root = tempfile.mkdtemp(prefix="crossai_dedup_idx_")
    src = f"{sf_dir}/documents.parquet"
    tmp1 = os.path.join(root, "shard1")
    tmp2 = os.path.join(root, "shard2")

    def parity(keep: int):
        def f(t: pa.Table) -> pa.Table:
            t = t.combine_chunks()
            did = t["doc_id"].cast(pa.int64())
            mask = pc.equal(pc.bit_wise_and(did, 1), keep)
            return t.filter(mask)

        return f

    base = read_parquet_sized(src, columns=["doc_id", "text"])
    base.map_batches(parity(0), batch_format="pyarrow").write_parquet(tmp1)
    read_parquet_sized(src, columns=["doc_id", "text"]).map_batches(
        parity(1), batch_format="pyarrow").write_parquet(tmp2)
    rows = []
    for batch, shard in (("b1", tmp1), ("b2", tmp2)):
        r = ingest_documents(root, shard, batch, buckets=buckets)
        rows.append({"batch": batch, "total": r["total"],
                     "novel": r["novel"], "dup": r["dup"]})
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("batch", pa.string()), ("total", pa.int64()),
        ("novel", pa.int64()), ("dup", pa.int64()),
    ]))


CORPUS_INGEST_SQL = """
WITH b1 AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 2 = 0),
b2 AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 2 = 1),
s1 AS (
  SELECT 'b1' AS batch, count(*)::BIGINT AS total,
         count(DISTINCT h)::BIGINT AS novel
  FROM b1
),
s2 AS (
  SELECT 'b2' AS batch, count(*)::BIGINT AS total,
         (SELECT count(*) FROM
            (SELECT DISTINCT h FROM b2
             WHERE h NOT IN (SELECT h FROM b1)))::BIGINT AS novel
  FROM b2
)
SELECT batch, total, novel, (total - novel)::BIGINT AS dup FROM s1
UNION ALL
SELECT batch, total, novel, (total - novel)::BIGINT AS dup FROM s2
ORDER BY batch
"""
