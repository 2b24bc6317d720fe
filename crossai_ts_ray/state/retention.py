"""Retention-policy enforcement over committed tier outputs.

The north-star engine is a rollup + downsample + RETENTION engine: coarse
tiers keep long history while fine tiers age out.  ``apply_retention``
enforces a per-tier "keep the last K buckets of every source" policy over
the checkpointed job output (``run_rollup_job``'s committed
``tier=<name>/part=<pid>`` tree), the way a production store prunes raw
data after the 1m/1h/1d cascades have been rolled up (reference analogue:
crossai-ts keeps only derived windows/features of a signal once
transformed -- caits/dataset/_dataset/_list.py apply-pipeline flows; the
retention policy machinery itself is engine-new, standard
TimescaleDB-style semantics).

Scale shape:

* horizons are computed with ONE column-pruned streaming read of the tier
  (``source``/``bucket`` only) and a per-batch partial max; the combined
  result is a per-source dict -- metadata-sized (one entry per source,
  the job's dimension cardinality), safe to broadcast.
* pruning is partition-parallel (``from_items`` over partition dirs ->
  ``map_batches`` side-effect tasks, the engine's spill-write pattern) and
  file-wise within a partition: parquet FOOTER stats decide entirely-keep
  (untouched) / entirely-drop (unlinked) without reading data; only
  horizon-straddling files are rewritten, atomically (tmp + rename).
* each pruned (tier, partition) writes a marker under ``_lineage/`` with
  the policy fingerprint: a re-run (or a resumed kill) skips partitions
  already pruned under the same policy, and row filtering is idempotent,
  so a crash mid-partition just re-prunes that partition.
"""

from __future__ import annotations

import glob
import json
import os
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _marker_path(out_dir: str, tier_name: str, pid: str) -> str:
    return os.path.join(out_dir, "_lineage", f"prune-{tier_name}-{pid}.json")


def tier_horizons(out_dir: str, tier_name: str, keep_last: int) -> dict[str, int]:
    """Per-source horizon bucket for one tier: ``max_bucket + 1 - keep_last``
    (rows with ``bucket < horizon`` age out; at most ``keep_last`` trailing
    buckets survive per source).  One streaming column-pruned read."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    import ray.data as rd

    from ..sources.readers import read_parquet_sized

    files = sorted(
        glob.glob(os.path.join(out_dir, f"tier={tier_name}", "part=*", "*.parquet"))
    )
    if not files:
        return {}

    def partial_max(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:  # empty blocks occur after reads/exchanges
            return pa.table(
                {"source": pa.array([], pa.string()),
                 "mx": pa.array([], pa.int64())}
            )
        src = t["source"].to_numpy(zero_copy_only=False)
        bkt = t["bucket"].to_numpy(zero_copy_only=False)
        order = np.argsort(src, kind="stable")
        src, bkt = src[order], bkt[order]
        cut = np.flatnonzero(np.concatenate(([True], src[1:] != src[:-1])))
        return pa.table(
            {
                "source": pa.array(src[cut], pa.string()),
                "mx": pa.array(np.maximum.reduceat(bkt, cut), pa.int64()),
            }
        )

    parts = (
        read_parquet_sized(files, columns=["source", "bucket"])
        .map_batches(partial_max, batch_format="pyarrow")
        .groupby("source")
        .max("mx")
    )
    out: dict[str, int] = {}
    for row in parts.take_all():
        out[row["source"]] = int(row["max(mx)"]) + 1 - keep_last
    return out


def _prune_partition_dir(
    pdir: str, horizons: dict[str, int], bucket_col: str = "bucket"
) -> dict[str, int]:
    """File-wise prune of one committed partition dir.  Footer stats first:
    a file whose min bucket clears every horizon is untouched; one whose max
    bucket is below every horizon is dropped whole; only straddlers are
    read, filtered and atomically replaced."""
    # finish any crashed compaction FIRST: its committed manifest names
    # pre-prune inputs, and replaying it after we rewrite/unlink those
    # files would resurrect aged-out rows and drop pruned rewrites
    from .compact import recover_compactions

    recover_compactions(pdir)
    if not horizons:
        return {"files_kept": 0, "files_dropped": 0, "files_rewritten": 0,
                "rows_dropped": 0}
    h_min = min(horizons.values())
    h_max = max(horizons.values())
    kept = dropped = rewritten = rows_dropped = 0
    for f in sorted(glob.glob(os.path.join(pdir, "*.parquet"))):
        md = pq.read_metadata(f)
        names = md.schema.to_arrow_schema().names
        ci = names.index(bucket_col)
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                fmin = None
                break
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is not None and fmin >= h_max:
            kept += 1
            continue
        if fmin is not None and fmax < h_min:
            rows_dropped += md.num_rows
            dropped += 1
            os.unlink(f)
            continue
        t = pq.read_table(f)
        src = t["source"].to_numpy(zero_copy_only=False)
        bkt = t[bucket_col].to_numpy(zero_copy_only=False)
        u, inv = np.unique(src, return_inverse=True)
        hzv = np.array([horizons.get(s, np.iinfo(np.int64).min) for s in u])
        keep = bkt >= hzv[inv]
        n_drop = int((~keep).sum())
        if n_drop == 0:
            kept += 1
            continue
        rows_dropped += n_drop
        if keep.any():
            tmp = f + ".tmp-prune"
            pq.write_table(t.filter(pa.array(keep)), tmp)
            os.replace(tmp, f)
            rewritten += 1
        else:
            dropped += 1
            os.unlink(f)
    return {
        "files_kept": kept,
        "files_dropped": dropped,
        "files_rewritten": rewritten,
        "rows_dropped": rows_dropped,
    }


def _plain_fingerprint(pdir: str) -> str:
    """Cheap content fingerprint of a partition's plain parquet files:
    sorted (basename, size, row count) triples -- footer reads only."""
    parts = []
    for f in sorted(glob.glob(os.path.join(pdir, "*.parquet"))):
        parts.append(
            f"{os.path.basename(f)}:{os.path.getsize(f)}:"
            f"{pq.read_metadata(f).num_rows}"
        )
    return f"{zlib.crc32('|'.join(parts).encode()) & 0xFFFFFFFF:08x}"


def _rebuild_compressed_copy(pdir: str) -> None:
    """If this partition has a Gorilla/DoD segment copy
    (``tier=<name>.gorilla/part=<pid>``, run_rollup_job's
    ``compress_finest``), re-encode it from the pruned plain rows so
    ``read_job_output(from_compressed=True)`` stays bitwise-identical to
    the pruned store.  Atomic dir swap; a crash mid-swap is healed on the
    next run (markers commit only after this succeeds).

    A ``_plainfp`` sidecar records the plain-file fingerprint the copy was
    encoded from, so partitions the prune left untouched skip the full
    read-reencode-swap (review finding) -- while a crash BETWEEN prune and
    rebuild still re-encodes on the next run, because the pruned plain
    files no longer match the stale sidecar."""
    import shutil

    tier_dir, part = os.path.split(pdir)
    root, tier = os.path.split(tier_dir)
    gdir = os.path.join(root, f"{tier}.gorilla", part)
    if not os.path.isdir(gdir):
        return
    fp = _plain_fingerprint(pdir)
    fp_file = os.path.join(gdir, "_plainfp")
    try:
        if open(fp_file).read().strip() == fp:
            return  # compressed copy already matches the plain files
    except OSError:
        pass  # no sidecar (pre-fix copy or mid-swap crash): rebuild
    from ..stages.codec import CodecStage

    int_cols = ["bucket", "count", "sum", "min", "max", "tok_count",
                "tok_sum", "tok_min", "tok_max"]
    float_cols = ["mean", "p50", "p99", "tok_mean", "tok_p50", "tok_p99"]
    files = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
    tabs = [pq.read_table(f) for f in files]
    tabs = [t for t in tabs if t.num_rows]
    tmp = gdir + ".tmp-prune"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    if tabs:
        segs = CodecStage(int_cols=int_cols, float_cols=float_cols)(
            pa.concat_tables(tabs).combine_chunks()
        )
        pq.write_table(segs, os.path.join(tmp, "segments.parquet"))
    with open(os.path.join(tmp, "_plainfp"), "w") as fh:
        fh.write(fp)
    shutil.rmtree(gdir)
    os.rename(tmp, gdir)


def apply_retention(out_dir: str, policies: dict[str, int]) -> dict:
    """Enforce ``{tier_name: keep_last_buckets}`` over a committed job
    output.  Returns a per-tier summary.  Partition-parallel, resumable,
    idempotent; markers record the policy fingerprint so changing the
    policy re-prunes (tightening a horizon is safe; loosening one cannot
    resurrect dropped rows and is reported untouched)."""
    import ray.data as rd

    summary: dict[str, dict] = {}
    for tier_name, keep_last in policies.items():
        t0 = time.monotonic()
        horizons = tier_horizons(out_dir, tier_name, keep_last)
        # the fingerprint must cover the HORIZONS, not just the policy: as
        # data grows the per-source horizons advance, and a marker recording
        # only keep_last would skip previously-pruned partitions forever,
        # leaving rows older than the new horizon alive (review finding)
        h_sig = zlib.crc32(
            json.dumps(sorted(horizons.items())).encode()
        ) & 0xFFFFFFFF
        fp = f"keep_last={keep_last};h={h_sig:08x}"
        pdirs = sorted(
            glob.glob(os.path.join(out_dir, f"tier={tier_name}", "part=*"))
        )
        todo = []
        skipped = 0
        for pdir in pdirs:
            pid = os.path.basename(pdir).split("=", 1)[1]
            mk = _marker_path(out_dir, tier_name, pid)
            if os.path.exists(mk) and json.load(open(mk)).get("policy") == fp:
                skipped += 1
                continue
            todo.append((pdir, pid))

        def prune_one(batch: pa.Table) -> pa.Table:
            rows = []
            for pdir, pid in zip(
                batch["pdir"].to_pylist(), batch["pid"].to_pylist()
            ):
                st = _prune_partition_dir(pdir, horizons)
                _rebuild_compressed_copy(pdir)
                mk = _marker_path(out_dir, tier_name, pid)
                os.makedirs(os.path.dirname(mk), exist_ok=True)
                tmp = mk + ".tmp"
                with open(tmp, "w") as fh:
                    json.dump({"policy": fp, **st}, fh)
                os.replace(tmp, mk)
                rows.append({"pid": pid, **st})
            return pa.Table.from_pylist(rows)

        agg = {"files_kept": 0, "files_dropped": 0, "files_rewritten": 0,
               "rows_dropped": 0}
        if todo:
            res = (
                rd.from_items([{"pdir": d, "pid": p} for d, p in todo])
                .map_batches(prune_one, batch_format="pyarrow")
                .take_all()
            )
            for r in res:
                for k in agg:
                    agg[k] += r[k]
        summary[tier_name] = {
            "keep_last": keep_last,
            "partitions_pruned": len(todo),
            "partitions_skipped": skipped,
            "wall_s": round(time.monotonic() - t0, 3),
            **agg,
        }
    return summary
