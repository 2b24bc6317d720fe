"""Gap-fill over a rollup series: LOCF and linear interpolation.

Semantics (pinned in oracle.py, mirrored from the reference):
* LOCF  = forward-fill; leading gaps stay null
  (/root/reference/caits/augmentation/_augment_1d.py:324,344-350 ``dropout_ts``
  with ``fill="ffill"``).
* linear = ``np.interp`` including its endpoint clamping
  (/root/reference/caits/preprocessing.py:47-55 ``resample_signal``).

Execution: an order-sensitive per-series scan -> ``groupby("source")`` +
sort-by-bucket inside the group kernel (Ray Data gives no intra-group order;
SURVEY.md §7.5).  The group gathers one source's *rollup* series (raw_rows /
tier_width points), not raw rows.  For a pathologically hot source at 10^12
rows, chunk the series by bucket ranges with a carried boundary value; the
kernel below is the single-chunk case.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def gapfill_group(
    t: pa.Table,
    value_cols: list[str],
    mode: str,
    grid_mode: str = "zero",
    decimals: int | None = None,
) -> pa.Table:
    """One source's rollup rows -> dense bucket grid with gaps filled.

    ``grid_mode``: "zero" -> grid spans 0..max(bucket) (sequence-offset
    series); "min" -> min(bucket)..max(bucket) (wall-clock series).
    ``decimals``: if set, round filled values (oracle-SQL parity).
    """
    if t.num_rows == 0:
        return _empty(value_cols)
    t = t.combine_chunks()
    bucket = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(bucket, kind="stable")
    xp = bucket[order]
    lo = 0 if grid_mode == "zero" else int(xp[0])
    grid = np.arange(lo, int(xp[-1]) + 1, dtype=np.int64)
    pos = np.searchsorted(xp, grid)
    present = (pos < len(xp)) & (xp[np.minimum(pos, len(xp) - 1)] == grid)
    src = t["source"][0].as_py()
    cnt = np.zeros(len(grid), dtype=np.int64)
    if "count" in t.schema.names:
        cnt[present] = t["count"].to_numpy(zero_copy_only=False).astype(np.int64)[order][
            pos[present]
        ]
    out = {
        "source": pa.array([src] * len(grid), pa.string()),
        "bucket": pa.array(grid, pa.int64()),
        "filled": pa.array(~present),
        "count": pa.array(cnt, pa.int64()),
    }
    for c in value_cols:
        fp = t[c].to_numpy(zero_copy_only=False).astype(np.float64)[order]
        if mode == "locf":
            carry_idx = np.searchsorted(xp, grid, side="right") - 1
            vals = np.where(carry_idx >= 0, fp[np.maximum(carry_idx, 0)], np.nan)
        elif mode == "linear":
            vals = np.interp(grid.astype(np.float64), xp.astype(np.float64), fp)
        else:
            raise ValueError(mode)
        if decimals is not None:
            vals = np.round(vals, decimals)
        out[c] = pa.array(vals, pa.float64())
    return pa.table(out)


def _empty(value_cols: list[str]) -> pa.Table:
    fields = [
        ("source", pa.string()),
        ("bucket", pa.int64()),
        ("filled", pa.bool_()),
        ("count", pa.int64()),
    ] + [(c, pa.float64()) for c in value_cols]
    return pa.Table.from_pylist([], schema=pa.schema(fields))


def gapfill(
    rollup_ds,
    value_cols: list[str],
    mode: str,
    grid_mode: str = "zero",
    decimals: int | None = None,
):
    """Dataset of rollup rows -> dense gap-filled series (keyed shuffle on
    ``source``; sort-within-group happens inside the kernel)."""
    return rollup_ds.groupby("source").map_groups(
        lambda t: gapfill_group(t, value_cols, mode, grid_mode, decimals),
        batch_format="pyarrow",
    )
