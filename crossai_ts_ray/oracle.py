"""Single-process NumPy oracle: the golden semantics for every tier rollup,
gap-fill, and windowing result.  The distributed engine must match these
**bitwise** (BASELINE.md).

Pinned semantics (each also cited to its reference analogue):

* bucket  = ``seq // width``  (fixed-length chunking,
  /root/reference/caits/windowing.py:188 ``create_chunks``).
* count/sum/min/max over int32 streams accumulate in int64 -> exact in any
  combination order.
* mean    = ``sum / count`` -- ONE float64 division (no running means).
* p50/p99 = ``np.percentile(values, q, method="linear")`` over the raw values
  of the bucket, at *every* tier (coarser tiers recompute percentiles over raw
  values, not over finer-tier percentiles -- the rms_max cascade analogue,
  /root/reference/caits/fe/_statistical.py:252 defines rollup-of-rollup for
  recombinable stats only).
* LOCF gap-fill = forward-fill, leading gaps stay null
  (/root/reference/caits/augmentation/_augment_1d.py:344 ``dropout_ts``
  ``fill="ffill"``).
* linear gap-fill = ``np.interp`` with its endpoint clamping
  (/root/reference/caits/preprocessing.py:47-55 ``resample_signal``).
* sliding windows: step = window - overlap, trailing partial dropped,
  ``overlap >= window`` raises (/root/reference/caits/windowing.py:65-66,72).

This module is deliberately loop-y and simple -- it runs on tiny fixtures.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .schema import ROLLUP_SCHEMA, Tier

Q_LOW, Q_HIGH = 50.0, 99.0


def _columns(table: pa.Table):
    t = table.combine_chunks()
    src = np.asarray(t["source"].to_pylist(), dtype=object)
    seq = t["seq"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_tok = t["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
    toks = t["tokens"].chunk(0) if isinstance(t["tokens"], pa.ChunkedArray) else t["tokens"]
    flat = toks.values.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return src, seq, n_tok, flat, offs


def rollup(table: pa.Table, tier: Tier) -> pa.Table:
    """Golden per-(source, bucket) rollup for one tier, sorted by key."""
    src, seq, n_tok, flat, offs = _columns(table)
    bucket = seq // tier.width
    rows = []
    for s in sorted(set(src.tolist())):
        smask = src == s
        for b in np.unique(bucket[smask]):
            m = smask & (bucket == b)
            nv = n_tok[m]
            tok_chunks = [flat[offs[i] : offs[i + 1]] for i in np.flatnonzero(m)]
            tv = np.concatenate(tok_chunks) if tok_chunks else np.zeros(0, np.int64)
            rows.append(
                {
                    "source": s,
                    "bucket": int(b),
                    "count": int(nv.size),
                    "sum": int(nv.sum()),
                    "mean": float(np.float64(nv.sum()) / np.float64(nv.size)),
                    "min": int(nv.min()),
                    "max": int(nv.max()),
                    "p50": float(np.percentile(nv, Q_LOW, method="linear")),
                    "p99": float(np.percentile(nv, Q_HIGH, method="linear")),
                    "tok_count": int(tv.size),
                    "tok_sum": int(tv.sum()),
                    "tok_mean": float(np.float64(tv.sum()) / np.float64(tv.size)),
                    "tok_min": int(tv.min()),
                    "tok_max": int(tv.max()),
                    "tok_p50": float(np.percentile(tv, Q_LOW, method="linear")),
                    "tok_p99": float(np.percentile(tv, Q_HIGH, method="linear")),
                }
            )
    return pa.Table.from_pylist(rows, schema=ROLLUP_SCHEMA)


# Columns forward-filled / interpolated by gap-fill (everything but the key
# and count; count is 0 on synthesized gap rows).
GAPFILL_STAT_COLS = [
    "sum", "mean", "min", "max", "p50", "p99",
    "tok_count", "tok_sum", "tok_mean", "tok_min", "tok_max", "tok_p50", "tok_p99",
]


def gapfill(rollup_table: pa.Table, mode: str) -> pa.Table:
    """Golden gap-fill over a tier rollup (``mode`` in {"locf", "linear"}).

    The bucket grid per source spans 0 .. max(observed bucket).  Gap rows get
    ``count = 0`` and ``filled = True``; stat columns become float64 in the
    output (gap values are interpolated / carried floats; leading-gap LOCF
    values are NaN).
    """
    import pandas as pd

    df = rollup_table.to_pandas()
    out = []
    for s, g in df.groupby("source", sort=True):
        g = g.sort_values("bucket")
        grid = np.arange(0, int(g["bucket"].max()) + 1, dtype=np.int64)
        present = g.set_index("bucket").reindex(grid)
        filled = present["count"].isna().to_numpy()
        res = {"source": s, "bucket": grid, "filled": filled,
               "count": np.nan_to_num(present["count"].to_numpy(), nan=0).astype(np.int64)}
        xp = g["bucket"].to_numpy(dtype=np.float64)
        for c in GAPFILL_STAT_COLS:
            col = present[c].astype(np.float64)
            if mode == "locf":
                res[c] = col.ffill().to_numpy()
            elif mode == "linear":
                res[c] = np.interp(grid.astype(np.float64), xp, g[c].to_numpy(dtype=np.float64))
            else:
                raise ValueError(mode)
        out.append(pd.DataFrame(res))
    return pa.Table.from_pandas(pd.concat(out, ignore_index=True), preserve_index=False)


def sliding_window_starts(n: int, window: int, overlap: int) -> np.ndarray:
    """Window start offsets; the reference's exact rule
    (/root/reference/caits/windowing.py:65-72)."""
    if overlap >= window:
        raise ValueError("Overlap must be smaller than window size")
    step = window - overlap
    if n < window:
        return np.zeros(0, dtype=np.int64)
    return np.arange(0, n - window + 1, step, dtype=np.int64)
