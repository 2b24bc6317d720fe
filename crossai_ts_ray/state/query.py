"""Tier-aware range queries over the committed rollup store.

The consumer side of the continuous-aggregate cascade: a caller asks for
per-source sequence range [seq_lo, seq_hi) and gets rolled-up points at
the FINEST resolution the store still holds for each sub-span.  Retention
(state/retention.py) ages fine-tier buckets out from the front, so a
range reaching into history is answered by splicing: recent spans from
the fine tier, older spans from coarser tiers — the classic TSDB
downsample-read.

Splice contract (gap-free, overlap-free): per source, the cutover from
tier T to the next coarser tier C is ``ceil(first_kept_T_seq / width_C)
* width_C`` — aligned UP to C's bucket grid, so C contributes only FULL
buckets strictly below the cut and T serves everything at/above it (T
always can: the cut is at or above T's first kept bucket).  A span older
than even the coarsest tier's coverage is simply absent (aged out of the
store entirely) — callers see a shorter result, never interpolation.

Scale shape: coverage discovery is one column-pruned (source, bucket)
scan per tier (metadata-scale); the data read is ONE pruned
``read_parquet`` per tier with a bucket-range + source scan filter
(row-group statistics skip non-matching groups), then an exchange-free
per-batch mask against the per-source cut table (broadcast dict of
#sources entries).  No shuffle anywhere.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..schema import ROLLUP_SCHEMA, Tier
from ..sources.readers import read_parquet_sized


def tier_min_buckets(out_dir: str, tier_name: str) -> dict[str, int]:
    """Per-source FIRST bucket still present in a tier (retention prunes
    from the front).  One streaming column-pruned read."""
    files = sorted(
        glob.glob(
            os.path.join(out_dir, f"tier={tier_name}", "part=*", "*.parquet")
        )
    )
    if not files:
        return {}

    def partial_min(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {"source": pa.array([], pa.string()),
                 "mn": pa.array([], pa.int64())}
            )
        src = t["source"].to_numpy(zero_copy_only=False)
        bkt = t["bucket"].to_numpy(zero_copy_only=False)
        order = np.argsort(src, kind="stable")
        src, bkt = src[order], bkt[order]
        cut = np.flatnonzero(np.concatenate(([True], src[1:] != src[:-1])))
        return pa.table(
            {
                "source": pa.array(src[cut], pa.string()),
                "mn": pa.array(np.minimum.reduceat(bkt, cut), pa.int64()),
            }
        )

    parts = (
        read_parquet_sized(files, columns=["source", "bucket"])
        .map_batches(partial_min, batch_format="pyarrow")
        .groupby("source")
        .min("mn")
    )
    return {
        row["source"]: int(row["min(mn)"]) for row in parts.take_all()
    }


_OUT_FIELDS = [("source", pa.string()), ("tier", pa.string()),
               ("bucket", pa.int64()),
               ("seq_start", pa.int64()), ("seq_end", pa.int64())] + [
    (n, t) for (n, t) in zip(ROLLUP_SCHEMA.names, ROLLUP_SCHEMA.types)
    if n not in ("source", "bucket")
]
QUERY_SCHEMA = pa.schema(_OUT_FIELDS)


def _read_tier_span(
    out_dir: str,
    tier: Tier,
    spans: dict[str, tuple[int, int]],
) -> rd.Dataset | None:
    """Pruned read of one tier: rows whose (source, bucket) fall inside
    that source's [seq_lo, seq_hi) span.  ``spans`` values are SEQ
    bounds; conversion to bucket bounds happens here."""
    spans = {
        s: (lo, hi) for s, (lo, hi) in spans.items() if hi > lo
    }
    if not spans:
        return None
    files = sorted(
        glob.glob(
            os.path.join(out_dir, f"tier={tier.name}", "part=*", "*.parquet")
        )
    )
    if not files:
        return None
    blo = {s: lo // tier.width for s, (lo, _) in spans.items()}
    bhi = {s: -(-hi // tier.width) for s, (_, hi) in spans.items()}
    g_lo = min(blo.values())
    g_hi = max(bhi.values())
    flt = (
        (pc.field("bucket") >= pa.scalar(g_lo, pa.int64()))
        & (pc.field("bucket") < pa.scalar(g_hi, pa.int64()))
        & pc.field("source").isin(list(spans))
    )
    ds = read_parquet_sized(files, filter=flt)

    def mask(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=QUERY_SCHEMA)
        src = t["source"].to_numpy(zero_copy_only=False)
        bkt = t["bucket"].to_numpy(zero_copy_only=False)
        lo_a = np.array([blo.get(s, 1 << 62) for s in src], np.int64)
        hi_a = np.array([bhi.get(s, -(1 << 62)) for s in src], np.int64)
        keep = (bkt >= lo_a) & (bkt < hi_a)
        t = t.filter(pa.array(keep))
        bk = t["bucket"].to_numpy(zero_copy_only=False)
        cols: dict = {
            "source": t["source"],
            "tier": pa.array([tier.name] * t.num_rows, pa.string()),
            "bucket": t["bucket"].cast(pa.int64()),
            "seq_start": pa.array(bk * tier.width, pa.int64()),
            "seq_end": pa.array((bk + 1) * tier.width, pa.int64()),
        }
        for n in ROLLUP_SCHEMA.names:
            if n not in ("source", "bucket"):
                cols[n] = t[n]
        return pa.table(cols, schema=QUERY_SCHEMA)

    return ds.map_batches(mask, batch_format="pyarrow")


def query_range(
    out_dir: str,
    tiers: tuple[Tier, ...],
    seq_lo: int,
    seq_hi: int,
    sources: list[str] | None = None,
) -> rd.Dataset:
    """Spliced multi-tier range query: rolled-up points covering
    [seq_lo, seq_hi) per source, finest-available resolution first.
    Returns QUERY_SCHEMA rows (tier + seq bounds attached)."""
    if seq_hi <= seq_lo:
        raise ValueError("empty range")
    tiers = tuple(sorted(tiers, key=lambda t: t.width))
    # per-tier per-source coverage starts (metadata-scale scans)
    mins = [tier_min_buckets(out_dir, t.name) for t in tiers]
    all_sources = sorted(
        set().union(*[m.keys() for m in mins]) if mins else set()
    )
    if sources is not None:
        all_sources = [s for s in all_sources if s in set(sources)]

    # walk fine -> coarse assigning spans; cut aligned UP to the NEXT
    # coarser tier's grid so it contributes only full buckets
    per_tier_spans: list[dict[str, tuple[int, int]]] = [
        {} for _ in tiers
    ]
    for s in all_sources:
        hi = seq_hi
        for i, t in enumerate(tiers):
            if hi <= seq_lo:
                break
            if s not in mins[i]:
                continue
            first_seq = mins[i][s] * t.width
            if i + 1 < len(tiers):
                wc = tiers[i + 1].width
                cut = -(-first_seq // wc) * wc
            else:
                cut = first_seq
            lo = max(seq_lo, cut)
            if hi > lo:
                per_tier_spans[i][s] = (lo, hi)
            hi = min(hi, lo)
    parts = [
        d
        for i, t in enumerate(tiers)
        for d in [_read_tier_span(out_dir, t, per_tier_spans[i])]
        if d is not None
    ]
    if not parts:
        return rd.from_arrow(pa.Table.from_pylist([], schema=QUERY_SCHEMA))
    acc = parts[0]
    if len(parts) > 1:
        acc = acc.union(*parts[1:])
    return acc
