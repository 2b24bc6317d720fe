"""Cross-tier consistency audit of the committed rollup store.

A continuous-aggregate store has an internal invariant: every coarse-tier
row must equal the recombination of its fine-tier sub-buckets (they were
produced from the same input by the cascade).  Silent store corruption —
a bad disk block, a partial manual edit, a codec bug — breaks that
invariant long before any query notices.  This audit recomputes the
RECOMBINABLE fields (count/sum/min/max over both the n_tok and token
streams — exact integer/value merges) from the fine tier and compares
them against the stored coarse rows.  mean/p50/p99 are NOT recombinable
from rolled-up rows (they need the partial histograms the cascade
consumed) and are intentionally out of scope — count/sum mismatches
catch any corruption that would move them anyway.

Scale shape: one column-pruned streaming read of each tier; fine rows
collapse map-side to per-(source, coarse-bucket) partials; ONE hash
exchange co-locates partials with the stored coarse rows; comparison is
vectorized per partition.  Coarse buckets whose fine sub-buckets were
aged out by retention (bucket < ceil(fine_min / ratio)) are skipped —
they are no longer recombinable, by design, not by corruption.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..schema import Tier
from ..sources.readers import read_parquet_sized
from ..stages.joins import hash_prt
from .query import tier_min_buckets

_CHECK_COLS = [
    ("count", "sum"), ("sum", "sum"), ("min", "min"), ("max", "max"),
    ("tok_count", "sum"), ("tok_sum", "sum"),
    ("tok_min", "min"), ("tok_max", "max"),
]

MISMATCH_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("bucket", pa.int64()),
        ("field", pa.string()),
        ("stored", pa.float64()),
        ("recombined", pa.float64()),
    ]
)


def verify_tier_consistency(
    out_dir: str, fine: Tier, coarse: Tier, buckets: int = 16
) -> dict:
    """Audit one tier pair.  Returns
    ``{"checked": n, "skipped_aged": n, "mismatches": [...]}`` where each
    mismatch is (source, bucket, field, stored, recombined)."""
    if coarse.width % fine.width:
        raise ValueError(
            f"tier widths not aligned: {coarse.width} % {fine.width}"
        )
    ratio = coarse.width // fine.width
    cols = ["source", "bucket"] + [c for c, _ in _CHECK_COLS]

    def tier_files(t: Tier) -> list[str]:
        return sorted(
            glob.glob(
                os.path.join(out_dir, f"tier={t.name}", "part=*", "*.parquet")
            )
        )

    f_files, c_files = tier_files(fine), tier_files(coarse)
    if not f_files or not c_files:
        return {"checked": 0, "skipped_aged": 0, "mismatches": []}
    fine_min = tier_min_buckets(out_dir, fine.name)
    # first fully-recombinable coarse bucket per source
    first_ok = {s: -(-m // ratio) for s, m in fine_min.items()}

    def fine_partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist(
                [], schema=pa.schema(
                    [("source", pa.string()), ("bucket", pa.int64()),
                     ("side", pa.int8())]
                    + [(c, pa.float64()) for c, _ in _CHECK_COLS]
                    + [("prt", pa.int64())]
                )
            )
        src = np.asarray(t["source"].to_pylist(), dtype=object)
        cb = t["bucket"].to_numpy(zero_copy_only=False) // ratio
        order = np.lexsort((cb, src))
        src, cb = src[order], cb[order]
        cut = np.flatnonzero(
            np.concatenate(
                ([True], (src[1:] != src[:-1]) | (cb[1:] != cb[:-1]))
            )
        )
        out: dict = {
            "source": pa.array(list(src[cut]), pa.string()),
            "bucket": pa.array(cb[cut], pa.int64()),
            "side": pa.array(np.zeros(len(cut), np.int8)),
        }
        for c, op in _CHECK_COLS:
            v = t[c].to_numpy(zero_copy_only=False).astype(np.float64)[order]
            red = {"sum": np.add, "min": np.minimum, "max": np.maximum}[op]
            out[c] = pa.array(red.reduceat(v, cut), pa.float64())
        import zlib

        h = np.array(
            [
                zlib.crc32(f"{s}\x1f{b}".encode())
                for s, b in zip(src[cut], cb[cut])
            ],
            np.int64,
        )
        out["prt"] = pa.array(hash_prt(h, buckets), pa.int64())
        return pa.table(out)

    def coarse_rows(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return fine_partial(t)
        src = t["source"].to_pylist()
        cb = t["bucket"].to_numpy(zero_copy_only=False)
        out: dict = {
            "source": t["source"],
            "bucket": t["bucket"].cast(pa.int64()),
            "side": pa.array(np.ones(t.num_rows, np.int8)),
        }
        for c, _ in _CHECK_COLS:
            out[c] = t[c].cast(pa.float64())
        import zlib

        h = np.array(
            [
                zlib.crc32(f"{s}\x1f{b}".encode())
                for s, b in zip(src, cb)
            ],
            np.int64,
        )
        out["prt"] = pa.array(hash_prt(h, buckets), pa.int64())
        return pa.table(out)

    def compare(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=MISMATCH_SCHEMA)
        src = np.asarray(t["source"].to_pylist(), dtype=object)
        cb = t["bucket"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, cb, src))
        src, cb, side = src[order], cb[order], side[order]
        vals = {
            c: t[c].to_numpy(zero_copy_only=False)[order]
            for c, _ in _CHECK_COLS
        }
        rows = {k: [] for k in MISMATCH_SCHEMA.names}
        cut = np.flatnonzero(
            np.concatenate(
                ([True], (src[1:] != src[:-1]) | (cb[1:] != cb[:-1]))
            )
        )
        ends = np.concatenate((cut[1:], [len(src)]))
        checked = 0
        skipped = 0
        for s, e in zip(cut, ends):
            b = int(cb[s])
            if b < first_ok.get(src[s], 0):
                skipped += 1
                continue
            fine_rows = np.flatnonzero(side[s:e] == 0)
            coarse_i = np.flatnonzero(side[s:e] == 1)
            if not len(coarse_i):
                # fine data with NO stored coarse row is itself a finding
                rows["source"].append(src[s])
                rows["bucket"].append(b)
                rows["field"].append("<missing coarse row>")
                rows["stored"].append(float("nan"))
                rows["recombined"].append(float("nan"))
                continue
            checked += 1
            ci = s + coarse_i[0]
            for c, op in _CHECK_COLS:
                fv = vals[c][s:e][fine_rows]
                if not len(fv):
                    continue
                rec = {
                    "sum": fv.sum(), "min": fv.min(), "max": fv.max()
                }[op]
                stv = vals[c][ci]
                if rec != stv:
                    rows["source"].append(src[s])
                    rows["bucket"].append(b)
                    rows["field"].append(c)
                    rows["stored"].append(float(stv))
                    rows["recombined"].append(float(rec))
        tbl = pa.table(rows, schema=MISMATCH_SCHEMA)
        # stats ride as metadata rows via a side channel: simplest is to
        # append them to the driver-side dict below, so compare() only
        # returns mismatches plus a per-partition checked/skipped row
        meta = pa.table(
            {
                "source": pa.array(["\x00stats"], pa.string()),
                "bucket": pa.array([checked], pa.int64()),
                "field": pa.array(["checked/skipped"], pa.string()),
                "stored": pa.array([float(checked)], pa.float64()),
                "recombined": pa.array([float(skipped)], pa.float64()),
            },
            schema=MISMATCH_SCHEMA,
        )
        return pa.concat_tables([tbl, meta])

    f_ds = read_parquet_sized(f_files, columns=cols).map_batches(
        fine_partial, batch_format="pyarrow", batch_size=1_048_576
    )
    c_ds = read_parquet_sized(c_files, columns=cols).map_batches(
        coarse_rows, batch_format="pyarrow", batch_size=1_048_576
    )
    res = (
        f_ds.union(c_ds)
        .groupby("prt")
        .map_groups(
            lambda g: compare(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )
    checked = 0
    skipped = 0
    mismatches = []
    for b in res.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            if r["source"] == "\x00stats":
                checked += int(r["stored"])
                skipped += int(r["recombined"])
            else:
                mismatches.append(r)
    return {
        "checked": checked,
        "skipped_aged": skipped,
        "mismatches": mismatches,
    }
