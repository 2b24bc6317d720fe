"""Small-file compaction for committed tier outputs.

Streaming `write_parquet` commits one file per task block, so a tier
partition accumulates many KB-scale files; at 10^12-row scale the file
COUNT (metadata opens, object-store listings, read-task planning) becomes
the bottleneck long before bytes do.  ``compact_partitions`` merges each
partition's files into ~``target_bytes`` bins, preserving rows bitwise.

Crash-safety: replacing N files with 1 cannot be a single atomic rename,
so compaction is two-phase with a manifest (the Iceberg-style commit,
miniaturised):

1. write the compacted file to ``c-<bin>-<uuid>.parquet.tmp`` and fsync;
2. atomically rename a JSON manifest into place that names the compacted
   file and every input it replaces -- this rename IS the commit point;
3. promote the .tmp to its final ``.parquet`` name, unlink the inputs,
   remove the manifest.

Readers glob ``*.parquet`` and never see ``.tmp`` files, so a crash before
step 2 changes nothing.  A crash after step 2 is finished by
``recover_compactions`` (run automatically on entry): the manifest says
exactly which promote/unlinks remain, and replaying them is idempotent.
Compaction itself is partition-parallel (``from_items`` -> ``map_batches``
side-effect tasks, the engine's maintenance-task pattern) and safe to
re-run: already-compacted partitions fall below ``min_files`` and no-op.
"""

from __future__ import annotations

import glob
import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq


def _manifests(pdir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(pdir, ".compact-*.manifest.json")))


def recover_compactions(pdir: str) -> int:
    """Finish any committed-but-unfinished compactions in one partition dir
    (idempotent).  Returns the number of manifests replayed."""
    n = 0
    for mf in _manifests(pdir):
        m = json.load(open(mf))
        tmp = os.path.join(pdir, m["compacted"] + ".tmp")
        final = os.path.join(pdir, m["compacted"])
        if os.path.exists(tmp):
            os.replace(tmp, final)
        if not os.path.exists(final):
            # manifest without its data file: the rename of the manifest
            # happens strictly after the tmp fsync, so this means manual
            # tampering -- refuse to drop inputs
            raise RuntimeError(f"compaction manifest {mf!r} names missing file")
        for f in m["replaces"]:
            p = os.path.join(pdir, f)
            if os.path.exists(p):
                os.unlink(p)
        os.unlink(mf)
        n += 1
    return n


def _compact_partition_dir(
    pdir: str, target_bytes: int, min_files: int
) -> dict[str, int]:
    recover_compactions(pdir)
    files = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
    if len(files) < min_files:
        return {"files_before": len(files), "files_after": len(files), "bins": 0}
    # greedy size-binned packing in name order (any order is correct --
    # rollup rows are keyed, not positional)
    bins: list[list[str]] = [[]]
    acc = 0
    for f in files:
        sz = os.path.getsize(f)
        if bins[-1] and acc + sz > target_bytes:
            bins.append([])
            acc = 0
        bins[-1].append(f)
        acc += sz
    n_after = 0
    n_bins = 0
    for i, b in enumerate(bins):
        if len(b) < 2:  # nothing to merge in this bin
            n_after += len(b)
            continue
        t = pa.concat_tables([pq.read_table(f) for f in b])
        name = f"c-{i}-{uuid.uuid4().hex}.parquet"
        tmp = os.path.join(pdir, name + ".tmp")
        with open(tmp, "wb") as fh:
            pq.write_table(t, fh)
            fh.flush()
            os.fsync(fh.fileno())
        mf_tmp = os.path.join(pdir, f".compact-{i}.manifest.json.tmp")
        mf = os.path.join(pdir, f".compact-{i}.manifest.json")
        with open(mf_tmp, "w") as fh:
            json.dump(
                {"compacted": name, "replaces": [os.path.basename(f) for f in b]},
                fh,
            )
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(mf_tmp, mf)  # commit point
        os.replace(tmp, os.path.join(pdir, name))
        for f in b:
            os.unlink(f)
        os.unlink(mf)
        n_after += 1
        n_bins += 1
    return {"files_before": len(files), "files_after": n_after, "bins": n_bins}


def compact_partitions(
    out_dir: str,
    tier_name: str,
    target_bytes: int = 128 << 20,
    min_files: int = 2,
) -> dict:
    """Compact every committed partition of one tier.  Row-preserving
    (bitwise as a keyed multiset), crash-safe, idempotent, partition-
    parallel."""
    import ray.data as rd

    t0 = time.monotonic()
    pdirs = sorted(glob.glob(os.path.join(out_dir, f"tier={tier_name}", "part=*")))
    if not pdirs:
        return {"partitions": 0, "files_before": 0, "files_after": 0,
                "wall_s": 0.0}

    def compact_one(batch: pa.Table) -> pa.Table:
        rows = []
        for pdir in batch["pdir"].to_pylist():
            rows.append(_compact_partition_dir(pdir, target_bytes, min_files))
        return pa.Table.from_pylist(rows)

    res = (
        rd.from_items([{"pdir": d} for d in pdirs])
        .map_batches(compact_one, batch_format="pyarrow")
        .take_all()
    )
    agg = {"files_before": 0, "files_after": 0, "bins": 0}
    for r in res:
        for k in agg:
            agg[k] += r[k]
    return {
        "partitions": len(pdirs),
        "wall_s": round(time.monotonic() - t0, 3),
        **agg,
    }
