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
    grid_span: tuple[int, int] | None = None,
) -> pa.Table:
    """One source's rollup rows -> dense bucket grid with gaps filled.

    ``grid_mode``: "zero" -> grid spans 0..max(bucket) (sequence-offset
    series); "min" -> min(bucket)..max(bucket) (wall-clock series).
    ``decimals``: if set, round filled values (oracle-SQL parity).
    ``grid_span``: explicit (lo, hi) inclusive grid override -- the chunked
    path emits each chunk's bucket range; rows outside it (carried boundary
    points) contribute to the fill math but produce no output rows.
    """
    if t.num_rows == 0:
        return _empty(value_cols)
    t = t.combine_chunks()
    bucket = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(bucket, kind="stable")
    xp = bucket[order]
    if grid_span is not None:
        lo, hi = int(grid_span[0]), int(grid_span[1])
    else:
        lo = 0 if grid_mode == "zero" else int(xp[0])
        hi = int(xp[-1])
    grid = np.arange(lo, hi + 1, dtype=np.int64)
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
    max_group_rows: int | None = None,
):
    """Dataset of rollup rows -> dense gap-filled series (keyed shuffle on
    ``source``; sort-within-group happens inside the kernel).

    ``max_group_rows``: when set, a pathologically hot source is split into
    bucket-range chunks of at most that many OUTPUT rows each (the
    chunked-scan path below) instead of gathering the whole series into one
    group."""
    if max_group_rows is not None:
        return gapfill_chunked(
            rollup_ds, value_cols, mode, grid_mode, decimals, max_group_rows
        )
    return rollup_ds.groupby("source").map_groups(
        lambda t: gapfill_group(t, value_cols, mode, grid_mode, decimals),
        batch_format="pyarrow",
    )


def _edge_points(t: pa.Table, value_cols: list[str], span: int) -> pa.Table:
    """Per-batch, per-(source, chunk) candidate FIRST and LAST present
    points -- the contracted boundary metadata (2 rows per chunk per batch,
    never the series)."""
    t = t.combine_chunks()
    if t.num_rows == 0:
        cols = {"source": pa.array([], pa.string()), "bucket": pa.array([], pa.int64())}
        for c in value_cols:
            cols[c] = pa.array([], pa.float64())
        cols["count"] = pa.array([], pa.int64())
        return pa.table(cols)
    bucket = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    src = t["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    d = src.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    chunk = bucket // span
    order = np.lexsort((bucket, chunk, codes))
    c_s, ck_s = codes[order], chunk[order]
    new_grp = np.concatenate(
        ([True], (c_s[1:] != c_s[:-1]) | (ck_s[1:] != ck_s[:-1]))
    )
    starts = np.flatnonzero(new_grp)
    ends = np.append(starts[1:], len(order)) - 1
    sel = np.unique(np.concatenate([order[starts], order[ends]]))
    keep = t.select(
        ["source", "bucket"]
        + value_cols
        + (["count"] if "count" in t.schema.names else [])
    ).take(pa.array(sel))
    if "count" not in keep.schema.names:
        keep = keep.append_column(
            "count", pa.array(np.zeros(len(sel), np.int64), pa.int64())
        )
    return keep


def gapfill_chunked(
    rollup_ds,
    value_cols: list[str],
    mode: str,
    grid_mode: str = "zero",
    decimals: int | None = None,
    max_group_rows: int = 1 << 20,
):
    """Chunked gap-fill for pathologically hot sources: bucket-range chunks
    of ``max_group_rows`` output rows with CARRIED BOUNDARY POINTS, bitwise
    equal to the single-chunk kernel.

    Shape: (1) a map pass extracts per-batch per-chunk first/last present
    points -- contracted metadata, O(chunks) rows, merged on the driver the
    way the union-find cluster merge is (never the series itself); the
    merge yields each chunk's carried neighbor points (previous present
    point for LOCF, previous + next for linear's bracketing/clamping) and
    the global grid range, broadcast via ray.put.  (2) one keyed exchange
    groups rows by (source, chunk); each group prepends/appends its carried
    points, runs the SINGLE-CHUNK kernel, and trims to its bucket range --
    np.interp/LOCF depend only on the bracketing present points, so the
    chunked output is bit-identical.  Chunks with no present rows (all-gap
    ranges) are injected as synthetic work items from the plan."""
    import ray
    import ray.data as rd

    span = int(max_group_rows)
    if span < 2:
        raise ValueError("max_group_rows must be >= 2")

    # ---- phase 1: contracted edge merge (driver state O(chunks)) ----
    from ..util import dataset_to_table

    edges = dataset_to_table(
        rollup_ds.map_batches(
            lambda t: _edge_points(t, value_cols, span), batch_format="pyarrow"
        )
    )
    if edges.num_rows == 0:
        return rd.from_arrow(_empty(value_cols))
    e_src = np.asarray(edges["source"].to_pylist(), dtype=object)
    e_bkt = edges["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    # NATIVE scalars (ints stay ints): carried points must cast back to the
    # rollup's own column types without a float64 round-trip
    e_vals = {c: np.asarray(edges[c].to_pylist(), dtype=object) for c in value_cols}
    # per source: sorted present edge points; per chunk: prev/next neighbors
    plan: dict = {}
    items = []
    for s in sorted(set(e_src.tolist())):
        m = e_src == s
        bk = e_bkt[m]
        order = np.argsort(bk, kind="stable")
        bk = bk[order]
        vv = {c: e_vals[c][m][order] for c in value_cols}
        lo = 0 if grid_mode == "zero" else int(bk[0])
        hi = int(bk[-1])
        first_chunk, last_chunk = lo // span, hi // span
        for ck in range(first_chunk, last_chunk + 1):
            c_lo, c_hi = max(lo, ck * span), min(hi, (ck + 1) * span - 1)
            # prev = last present point strictly before the chunk range;
            # next = first present point strictly after it
            pi = int(np.searchsorted(bk, c_lo)) - 1
            ni = int(np.searchsorted(bk, c_hi, side="right"))
            prev = (
                (int(bk[pi]),) + tuple(vv[c][pi] for c in value_cols)
                if pi >= 0
                else None
            )
            nxt = (
                (int(bk[ni]),) + tuple(vv[c][ni] for c in value_cols)
                if ni < len(bk)
                else None
            )
            has_rows = pi + 1 < ni  # any present point inside the range
            plan[(s, ck)] = (c_lo, c_hi, prev, nxt)
            if not has_rows:
                items.append({"source": s, "chunk": ck})
    plan_ref = ray.put(plan)

    def _fill_chunk(t: pa.Table, s: str, ck: int) -> pa.Table:
        """Single-chunk kernel over (carried points + group rows), trimmed
        to the chunk's bucket range."""
        p = ray.get(plan_ref)
        c_lo, c_hi, prev, nxt = p[(s, ck)]
        extra_rows = []
        for pt in (prev, nxt):
            if pt is not None:
                row = {"source": s, "bucket": pt[0], "count": 0}
                for j, c in enumerate(value_cols):
                    row[c] = pt[j + 1]
                extra_rows.append(row)
        if extra_rows:
            keep_cols = ["source", "bucket", "count"] + value_cols
            if t.num_rows:
                if "count" not in t.schema.names:
                    t = t.append_column(
                        "count", pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
                    )
                t = t.select(keep_cols)
                ex = pa.Table.from_pylist(extra_rows, schema=t.schema)
                t = pa.concat_tables([t, ex])
            else:
                schema_cols = {
                    "source": pa.string(),
                    "bucket": pa.int64(),
                    "count": pa.int64(),
                    **{c: pa.float64() for c in value_cols},
                }
                t = pa.Table.from_pylist(
                    extra_rows, schema=pa.schema(list(schema_cols.items()))
                )
        # carried points sit strictly OUTSIDE [c_lo, c_hi]: they drive the
        # fill math (LOCF carry, np.interp bracketing/clamping) but the
        # grid_span override keeps them out of the output, so presence
        # flags/counts come only from real rows -- bitwise-unchunked
        return gapfill_group(
            t, value_cols, mode, decimals=decimals, grid_span=(c_lo, c_hi)
        )

    def fill_group(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        s = t["source"][0].as_py()
        ck = int(t["_ck"][0].as_py())
        return _fill_chunk(t.drop_columns(["_ck"]), s, ck)

    def add_ck(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        b = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_ck", pa.array(b // span, pa.int64()))

    filled = (
        rollup_ds.map_batches(add_ck, batch_format="pyarrow")
        .groupby(["source", "_ck"])
        .map_groups(fill_group, batch_format="pyarrow")
    )
    if items:
        empty_chunks = rd.from_items(items).map_batches(
            lambda t: pa.concat_tables(
                [
                    _fill_chunk(_empty(value_cols), s, int(ck))
                    for s, ck in zip(t["source"].to_pylist(), t["chunk"].to_pylist())
                ]
            ),
            batch_size=None,
            batch_format="pyarrow",
        )
        filled = filled.union(empty_chunks)
    return filled
