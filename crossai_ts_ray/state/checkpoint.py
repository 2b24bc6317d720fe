"""Checkpointed, resumable rollup job: per-partition watermarks + lineage.

Layout::

    out_dir/
      tier=1m/part=00/*.parquet      # atomic: written to .tmp-*, then rename
      tier=1h/part=00/*.parquet
      _lineage/part-00.parquet       # one row: partition id, input fragments,
                                     # rows, bytes, wall_time_s, watermark
                                     # (max finest-tier bucket completed)

Partitions are the input shards (``shard=NN`` directories).  The synthetic
table is sharded by ``source_index % num_shards`` (synth.py), so a
(source, bucket) rollup group never spans partitions and per-partition rollups
are final -- no cross-partition merge is needed and a killed run resumes by
skipping every partition with a committed lineage row.  (On real ingestion the
sharding key is hash(source); same invariant.)

Atomicity on a POSIX store is tmp-dir + ``os.rename``; on an object store the
rename becomes lineage-commit-last (the lineage row is only written after all
tier files are in place, and readers/resumers trust lineage, not file
listings).

The reference has no checkpointing (SURVEY.md §4.1: per-file try/except that
prints and skips, /root/reference/caits/loading/_csv_read.py:57-58); this is
a north-rule addition.
"""

from __future__ import annotations

import glob
import os
import shutil
import time
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq


@dataclass
class JobReport:
    computed: list[str]
    skipped: list[str]
    rows_per_tier: dict[str, int]
    #: committed partitions whose INPUT fragment set changed since their
    #: lineage row was written (appended chunk files) -- recomputed, not
    #: skipped; subset of ``computed``
    recomputed: list[str] = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.recomputed is None:
            self.recomputed = []


def plan_partitions(
    input_dir: str, shards_per_commit: int = 1
) -> list[tuple[str, list[str]]]:
    """[(partition_id, [shard_dirs])] -- commit units of ``shards_per_commit``
    input shards each.  A (source, bucket) group never spans shards (synth
    shards by source hash), so any grouping of whole shards keeps per-commit
    rollups final.  Coarser commits amortize per-pipeline fixed cost; finer
    commits give finer resume granularity."""
    shards = sorted(glob.glob(os.path.join(input_dir, "shard=*")))
    if not shards:
        return [("00", [input_dir])]
    out = []
    for i in range(0, len(shards), shards_per_commit):
        group = shards[i : i + shards_per_commit]
        pid = "-".join(os.path.basename(s).split("=")[1] for s in group)
        out.append((pid, group))
    return out


def lineage_path(out_dir: str, pid: str) -> str:
    return os.path.join(out_dir, "_lineage", f"part-{pid}.parquet")


def completed_partitions(out_dir: str) -> set[str]:
    return {
        os.path.basename(p)[len("part-") : -len(".parquet")]
        for p in glob.glob(os.path.join(out_dir, "_lineage", "part-*.parquet"))
    }


def read_lineage(out_dir: str) -> pa.Table | None:
    files = sorted(glob.glob(os.path.join(out_dir, "_lineage", "part-*.parquet")))
    if not files:
        return None
    # promote: lineage rows written before the late-policy column gained
    # ``late_rows_dropped`` read as nulls
    return pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="default"
    )


def _commit_lineage(out_dir: str, row: dict) -> None:
    os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)
    path = lineage_path(out_dir, row["partition"])
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pylist([row]), tmp)
    os.rename(tmp, path)


def _committed_fragments(out_dir: str, pid: str) -> list[str] | None:
    """Input fragment basenames named by a committed partition's lineage row
    (None when the row is missing/unreadable -> treat as changed)."""
    try:
        t = pq.read_table(lineage_path(out_dir, pid), columns=["input_fragments"])
        return list(t["input_fragments"][0].as_py())
    except Exception:
        return None


def _committed_watermark(out_dir: str, pid: str) -> int | None:
    """The committed partition's event-time watermark (max finest-tier
    bucket its lineage row recorded); None when missing/unreadable."""
    try:
        t = pq.read_table(lineage_path(out_dir, pid), columns=["watermark"])
        return int(t["watermark"][0].as_py())
    except Exception:
        return None


def _dir_stats(path: str) -> tuple[int, int, int]:
    """(rows, bytes, max_bucket) from parquet footers -- no data read."""
    rows = nbytes = 0
    max_bucket = -1
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.read_metadata(f)
        rows += md.num_rows
        nbytes += os.path.getsize(f)
        schema_names = md.schema.to_arrow_schema().names
        if "bucket" in schema_names:
            ci = schema_names.index("bucket")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is not None and st.has_min_max:
                    max_bucket = max(max_bucket, st.max)
    return rows, nbytes, max_bucket


def run_rollup_job(
    input_dir: str,
    out_dir: str,
    tiers,
    salt_mod: int = 0,
    batch_size: int = 65536,
    fail_after: int | None = None,
    shards_per_commit: int = 1,
    max_concurrent: int | None = None,
    aligned: bool = True,
    compress_finest: bool = False,
    late_policy: str = "recompute",
    allowed_lateness: int = 0,
) -> JobReport:
    """Run (or resume) the tier-cascade rollup over every input partition.

    ``salt_mod=0`` by default: input clustered by (source, seq) yields at most
    two partials per (source, bucket), so the salted pre-merge level would
    double shuffle volume for nothing; enable it (e.g. 8) for unclustered /
    late-data ingestion where hot groups fragment across many batches.

    ``fail_after=k`` aborts after k partitions commit (kill simulation for the
    resume test).  Ray must already be initialised by the caller.

    Event-time watermark / late-arrival policy (``late_policy``): a
    committed partition's lineage row records its WATERMARK (max
    finest-tier bucket).  When appended fragments arrive out of order:

    * ``"recompute"`` (default) -- the whole partition recomputes over
      old + new fragments; every late row is incorporated (bitwise ==
      a fresh run over the full input; continuous-aggregate semantics).
    * ``"drop"`` -- rows in the NEW fragments whose finest-tier bucket is
      <= watermark - ``allowed_lateness`` are DROPPED (buckets that far
      behind the watermark are final); rows inside the lateness window
      or past the watermark recompute as usual.  The dropped count is
      recorded in the lineage row (``late_rows_dropped``).  Filtered
      recomputes route through the generic cascade (row filtering breaks
      the aligned-chunk contract); both cascades are bitwise-identical
      (tests/test_aligned.py::test_aligned_equals_generic), so the
      result is pinned bitwise against a fresh run over the same input
      with those rows physically absent.
    """
    from ..sources.readers import read_token_table
    from ..stages.rollup import rollup_cascade

    if max_concurrent is None:
        # two concurrent partition pipelines starve each other below ~16
        # CPUs (each streaming execution needs read+map+write slots)
        import ray as _ray_mc

        max_concurrent = 2 if int(_ray_mc.cluster_resources().get("CPU", 4)) >= 16 else 1
    os.makedirs(out_dir, exist_ok=True)
    done = completed_partitions(out_dir)
    computed, skipped = [], []
    rows_per_tier: dict[str, int] = {t.name: 0 for t in tiers}

    def run_partition(
        pid: str, shard_dirs: list[str],
        late_filter: tuple[set, int] | None = None,
    ) -> dict[str, int]:
        t0 = time.perf_counter()
        frag_paths = sorted(
            f for sd in shard_dirs for f in glob.glob(os.path.join(sd, "*.parquet"))
        )
        fragments = [os.path.basename(f) for f in frag_paths]
        spill_dir = n_incomplete = None
        late_dropped = 0
        if late_filter is not None:
            # drop-policy recompute: NEW fragments lose their rows at or
            # below the final-bucket cut; generic cascade (the filtered
            # files no longer satisfy the aligned-chunk contract)
            import pyarrow.compute as _pc

            new_names, cut = late_filter
            width0 = tiers[0].width
            old_paths = [
                f for f in frag_paths
                if os.path.basename(f) not in new_names
            ]
            new_paths = [
                f for f in frag_paths if os.path.basename(f) in new_names
            ]

            def drop_late(t):
                keep = _pc.greater(
                    _pc.divide(t["seq"], width0), cut
                )
                return t.filter(keep)

            ds_new = read_token_table(new_paths)
            # count the dropped rows for the lineage row (footer rows -
            # surviving rows: no second data pass)
            new_rows = sum(
                pq.read_metadata(f).num_rows for f in new_paths
            )
            ds_new = ds_new.map_batches(
                drop_late, batch_format="pyarrow", batch_size=batch_size
            ).materialize()
            late_dropped = new_rows - ds_new.count()
            ds = ds_new
            if old_paths:
                ds = read_token_table(old_paths).union(ds_new)
            cascaded = rollup_cascade(
                ds, tiers, salt_mod=salt_mod, batch_size=batch_size,
                materialize_tiers=True,
            )
        elif aligned:
            # no-raw-shuffle fast path: input files are seq-aligned per
            # source (stages/aligned.py states the contract); fully
            # streaming -- boundary partials leave the map tasks as
            # spill files, finalized rows stream straight into the write
            from ..stages.aligned import aligned_rollup_stream
            from ..synth import CHUNK_ROWS

            spill_dir = os.path.join(out_dir, f".spill-{pid}")
            shutil.rmtree(spill_dir, ignore_errors=True)
            cascaded, n_incomplete = aligned_rollup_stream(
                shard_dirs, tiers, chunk_rows=CHUNK_ROWS, spill_dir=spill_dir
            )
        else:
            import ray as _ray_r

            blocks = min(
                len(frag_paths) * 4,
                max(8, int(_ray_r.cluster_resources().get("CPU", 4)) * 3),
            )
            ds = read_token_table(frag_paths, override_num_blocks=blocks)
            cascaded = rollup_cascade(
                ds, tiers, salt_mod=salt_mod, batch_size=batch_size,
                materialize_tiers=True,
            )
        part_rows = part_bytes = 0
        watermark = -1
        tier_rows: dict[str, int] = {}

        if not isinstance(cascaded, dict):
            # single-execution commit: all tiers stream through ONE
            # write_parquet partitioned by the tier tag, then each
            # tier=NAME subdir renames into its committed location --
            # same atomic layout, one Dataset-execution startup instead
            # of one per tier
            tmp_root = os.path.join(out_dir, f".tmp-part-{pid}")
            if os.path.exists(tmp_root):
                shutil.rmtree(tmp_root)
            cascaded.write_parquet(tmp_root, partition_cols=["tier"])
            if spill_dir is not None:
                # second (tiny) execution: merge the map-side boundary
                # partials and drop the finalized rows into the same
                # pre-commit tree
                from ..stages.aligned import merge_spilled_partials

                merged = merge_spilled_partials(spill_dir, tiers, n_incomplete)
                if merged is not None:
                    tmp_m = os.path.join(out_dir, f".tmp-merge-{pid}")
                    if os.path.exists(tmp_m):
                        shutil.rmtree(tmp_m)
                    merged.write_parquet(tmp_m, partition_cols=["tier"])
                    for tier in tiers:
                        msrc = os.path.join(tmp_m, f"tier={tier.name}")
                        if not os.path.isdir(msrc):
                            continue
                        dst = os.path.join(tmp_root, f"tier={tier.name}")
                        os.makedirs(dst, exist_ok=True)
                        for f in os.listdir(msrc):
                            os.rename(
                                os.path.join(msrc, f),
                                os.path.join(dst, f"m-{f}"),
                            )
                    shutil.rmtree(tmp_m, ignore_errors=True)
                shutil.rmtree(spill_dir, ignore_errors=True)
            results = {}
            for tier in tiers:
                src = os.path.join(tmp_root, f"tier={tier.name}")
                final_dir = os.path.join(
                    out_dir, f"tier={tier.name}", f"part={pid}"
                )
                if os.path.exists(final_dir):
                    shutil.rmtree(final_dir)  # uncommitted leftovers
                os.makedirs(os.path.dirname(final_dir), exist_ok=True)
                if not os.path.isdir(src):
                    os.makedirs(src)  # a tier with zero rows this partition
                os.rename(src, final_dir)
                results[tier.name] = _dir_stats(final_dir)
            shutil.rmtree(tmp_root, ignore_errors=True)
        else:

            def write_tier(tier):
                final_dir = os.path.join(out_dir, f"tier={tier.name}", f"part={pid}")
                tmp_dir = os.path.join(out_dir, f".tmp-{tier.name}-{pid}")
                if os.path.exists(tmp_dir):
                    shutil.rmtree(tmp_dir)
                if os.path.exists(final_dir):
                    shutil.rmtree(final_dir)  # uncommitted leftovers from a kill
                cascaded[tier.name].write_parquet(tmp_dir)
                os.makedirs(os.path.dirname(final_dir), exist_ok=True)
                os.rename(tmp_dir, final_dir)
                return tier.name, _dir_stats(final_dir)

            # tier writes are independent given the materialized partials --
            # overlap them: the work per write is tiny (rollup-sized
            # filters), so what overlapping hides is per-Dataset-execution
            # startup latency
            from concurrent.futures import ThreadPoolExecutor as _TPE

            with _TPE(max_workers=len(tiers)) as tex:
                results = dict(
                    (name, st) for name, st in tex.map(write_tier, tiers)
                )
        for tier in tiers:
            r, b, mb = results[tier.name]
            part_rows += r
            part_bytes += b
            tier_rows[tier.name] = r
            if tier is tiers[0]:
                watermark = mb
        if compress_finest:
            # Gorilla/DoD-compressed segment copy of the finest tier (the
            # retention-store representation), committed under the same
            # partition before its lineage row
            import ray.data as _rd

            from ..stages.codec import compress_rollup

            fine = tiers[0].name
            src_dir = os.path.join(out_dir, f"tier={fine}", f"part={pid}")
            seg_tmp = os.path.join(out_dir, f".tmp-seg-{fine}-{pid}")
            seg_dir = os.path.join(out_dir, f"tier={fine}.gorilla", f"part={pid}")
            if os.path.exists(seg_tmp):
                shutil.rmtree(seg_tmp)
            if os.path.exists(seg_dir):
                shutil.rmtree(seg_dir)
            compress_rollup(_rd.read_parquet(src_dir), concurrency=2).write_parquet(seg_tmp)
            # sidecar: the plain-file fingerprint this copy encodes, so
            # retention can skip re-encoding untouched partitions
            from .retention import _plain_fingerprint

            with open(os.path.join(seg_tmp, "_plainfp"), "w") as fh:
                fh.write(_plain_fingerprint(src_dir))
            os.makedirs(os.path.dirname(seg_dir), exist_ok=True)
            os.rename(seg_tmp, seg_dir)
        # a recomputed partition's rows are fresh: any retention-policy
        # markers for it are stale (they describe the replaced data) and
        # must not suppress a re-prune.  Unlink BEFORE the lineage commit:
        # a kill in between then just re-prunes (idempotent), whereas the
        # other order could commit fresh rows under a stale marker that
        # suppresses their pruning forever.
        for tier in tiers:
            mk = os.path.join(out_dir, "_lineage", f"prune-{tier.name}-{pid}.json")
            if os.path.exists(mk):
                os.unlink(mk)
        _commit_lineage(
            out_dir,
            {
                "partition": pid,
                "input_fragments": fragments,
                "rows": part_rows,
                "bytes": part_bytes,
                "wall_time_s": time.perf_counter() - t0,
                "watermark": watermark,
                "late_rows_dropped": int(late_dropped),
            },
        )
        return tier_rows

    if late_policy not in ("recompute", "drop"):
        raise ValueError(
            f"late_policy must be 'recompute' or 'drop', got {late_policy!r}"
        )
    todo = []
    recomputed = []
    for pid, shard_dirs in plan_partitions(input_dir, shards_per_commit):
        if pid in done:
            # continuous-aggregate semantics: a committed partition is only
            # final for the input fragments its lineage row names.  Appended
            # chunk files (late/growing sources) change the set -> recompute
            # and atomically replace this partition; unchanged -> skip.
            cur = sorted(
                os.path.basename(f)
                for sd in shard_dirs
                for f in glob.glob(os.path.join(sd, "*.parquet"))
            )
            prev = _committed_fragments(out_dir, pid)
            if prev is not None and sorted(prev) == cur:
                skipped.append(pid)
                continue
            recomputed.append(pid)
            late_filter = None
            if late_policy == "drop" and prev is not None:
                wm = _committed_watermark(out_dir, pid)
                if wm is not None and wm >= 0:
                    new_names = set(cur) - set(prev)
                    late_filter = (new_names, wm - allowed_lateness)
            todo.append((pid, shard_dirs, late_filter))
        else:
            todo.append((pid, shard_dirs, None))

    if fail_after is not None or max_concurrent <= 1:
        # sequential path (deterministic commit order for the kill test)
        for pid, shard_dirs, lf in todo:
            tier_rows = run_partition(pid, shard_dirs, lf)
            for k, v in tier_rows.items():
                rows_per_tier[k] += v
            computed.append(pid)
            if fail_after is not None and len(computed) >= fail_after:
                raise RuntimeError(f"simulated kill after {fail_after} partition(s)")
    elif todo:
        # overlapping partition pipelines: hides per-pipeline latency; each
        # commit is still independently atomic
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_concurrent) as ex:
            futs = {
                ex.submit(run_partition, pid, sd, lf): pid
                for pid, sd, lf in todo
            }
            for fut, pid in futs.items():
                tier_rows = fut.result()
                for k, v in tier_rows.items():
                    rows_per_tier[k] += v
                computed.append(pid)
    # account skipped partitions' rows for the report
    for pid in skipped:
        for tier in tiers:
            r, _, _ = _dir_stats(os.path.join(out_dir, f"tier={tier.name}", f"part={pid}"))
            rows_per_tier[tier.name] += r
    return JobReport(
        computed=computed,
        skipped=skipped,
        rows_per_tier=rows_per_tier,
        recomputed=recomputed,
    )


def read_job_output(
    out_dir: str, tier_name: str, from_compressed: bool = False
) -> pa.Table:
    """Committed tier rows across all partitions.  ``from_compressed=True``
    reads the ``tier=<name>.gorilla`` segment copy written by
    ``compress_finest`` and decodes it on read -- bitwise identical rows to
    the plain tier (the retention-store read path)."""
    if from_compressed:
        from ..stages.codec import decompress_segments

        files = sorted(
            glob.glob(
                os.path.join(out_dir, f"tier={tier_name}.gorilla", "part=*", "*.parquet")
            )
        )
        if not files:
            return pa.table({})
        return pa.concat_tables([decompress_segments(pq.read_table(f)) for f in files])
    files = sorted(
        glob.glob(os.path.join(out_dir, f"tier={tier_name}", "part=*", "*.parquet"))
    )
    return pa.concat_tables([pq.read_table(f) for f in files]) if files else pa.table({})
