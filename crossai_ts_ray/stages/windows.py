"""Sliding / tumbling window segmentation over token sequences.

Reference semantics preserved exactly (golden-fixture relevant, SURVEY.md
§2.2): step = ``window - overlap``; only complete windows emitted
(/root/reference/caits/windowing.py:72,100 ``sliding_window_arr``);
``overlap >= window`` raises (/root/reference/caits/windowing.py:65-66);
window start offsets 0, step, 2*step, ...; per-instance independence; key
columns (doc_id, source) replicated onto every window
(/root/reference/caits/windowing.py:148 ``windowing_df`` label replication,
/root/reference/caits/dataset/_dataset/_list.py:369-385 ``apply_windowing``).
``chunk_expand`` is the ragged-tail variant
(/root/reference/caits/windowing.py:188 ``create_chunks``).

All kernels are vectorized gather/reduce over the Arrow list buffers -- one
input row expands to many window rows inside a single ``map_batches`` call
(no per-row Python).  The fused aggregate variant never materializes window
token lists (the scale path for overlapping windows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .rollup import _list_col_to_numpy


def check_window_spec(window: int, overlap: int) -> int:
    """Returns step; raises on the reference's error condition."""
    if window <= 0:
        raise ValueError("window_size must be positive")
    if overlap >= window:
        raise ValueError("Overlap must be smaller than window size")
    return window - overlap


def window_counts(n: np.ndarray, window: int, overlap: int) -> np.ndarray:
    """Number of complete windows per sequence length (reference rule:
    ``1 + (n - ws) // step`` when ``n >= ws`` else 0)."""
    step = check_window_spec(window, overlap)
    return np.where(n >= window, (n - window) // step + 1, 0).astype(np.int64)


def _expansion_index(
    n_tok: np.ndarray, row_offs: np.ndarray, window: int, overlap: int
):
    step = window - overlap
    n_wins = window_counts(n_tok, window, overlap)
    total = int(n_wins.sum())
    doc_rep = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_wins)
    excl = np.zeros(len(n_tok), dtype=np.int64)
    np.cumsum(n_wins[:-1], out=excl[1:])
    win_id = np.arange(total, dtype=np.int64) - np.repeat(excl, n_wins)
    win_start = win_id * step
    base = row_offs[doc_rep] + win_start
    return doc_rep, win_id, win_start, base, total


def expand_windows(batch: pa.Table, window: int, overlap: int) -> pa.Table:
    """One row per complete window, window tokens materialized as list<int32>."""
    check_window_spec(window, overlap)
    t = batch.combine_chunks()
    if t.num_rows == 0:
        return _empty_windows()
    flat, row_offs = _list_col_to_numpy(t["tokens"])
    n_tok = (row_offs[1:] - row_offs[:-1]).astype(np.int64)
    doc_rep, win_id, win_start, base, total = _expansion_index(
        n_tok, row_offs, window, overlap
    )
    idx = base[:, None] + np.arange(window, dtype=np.int64)[None, :]
    values = flat[idx.ravel()]
    offsets = np.arange(total + 1, dtype=np.int64) * window
    take = pa.array(doc_rep)
    return pa.table(
        {
            "doc_id": t["doc_id"].take(take),
            "source": t["source"].take(take),
            "win_id": pa.array(win_id, pa.int64()),
            "win_start": pa.array(win_start, pa.int64()),
            "wtokens": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int64()).cast(pa.int32()), pa.array(values, pa.int32())
            ),
        }
    )


def rolling_windows(x: np.ndarray, ws: int, step: int,
                    w_center: bool = True) -> np.ndarray:
    """pandas-``.rolling(window=ws, step=step, min_periods=ws,
    center=w_center)`` iteration semantics, vectorized: windows anchored at
    positions 0, step, 2*step, ... where the anchor is the window's LAST row
    (w_center=False) or its center, row ``anchor - ws//2`` through
    ``anchor + ws - ws//2 - 1`` (w_center=True); only complete windows
    returned, as an (n_windows, ws) view-backed array.

    This is the reference's ``rolling_window_df``
    (/root/reference/caits/windowing.py:8) reduced to its array core — note
    the reference passes its ``overlap`` argument as the pandas ``step``, and
    pandas ignores ``win_type`` when iterating raw windows (it only weights
    ``.mean()``-style aggregations), so no taper is applied here either."""
    x = np.asarray(x)
    n = len(x)
    if ws <= 0 or step <= 0:
        raise ValueError("ws and step must be positive")
    anchors = np.arange(0, n, step, dtype=np.int64)
    starts = anchors - (ws // 2 if w_center else ws - 1)
    starts = starts[(starts >= 0) & (starts + ws <= n)]
    if len(starts) == 0:
        return np.empty((0, ws), dtype=x.dtype)
    return np.lib.stride_tricks.sliding_window_view(x, ws)[starts]


def rolling_window_df(df, ws: int = 500, overlap: int = 250,
                      w_type: str = "hann", w_center: bool = True) -> list:
    """API-parity wrapper over :func:`rolling_windows` returning a list of
    DataFrames like the reference (/root/reference/caits/windowing.py:8).
    Exists for single-machine parity; inside the engine use
    ``rolling_windows`` per batch — returning Python lists of DataFrames
    does not belong in a ``map_batches`` hot path."""
    import pandas as pd

    n = len(df)
    anchors = np.arange(0, n, overlap, dtype=np.int64)
    starts = anchors - (ws // 2 if w_center else ws - 1)
    starts = starts[(starts >= 0) & (starts + ws <= n)]
    return [df.iloc[s : s + ws] for s in starts]


def _empty_windows() -> pa.Table:
    return pa.Table.from_pylist(
        [],
        schema=pa.schema(
            [
                ("doc_id", pa.string()),
                ("source", pa.string()),
                ("win_id", pa.int64()),
                ("win_start", pa.int64()),
                ("wtokens", pa.list_(pa.int32())),
            ]
        ),
    )


def window_aggregates(
    batch: pa.Table, window: int, overlap: int, decimals: int | None = None
) -> pa.Table:
    """Fused segment+aggregate: per complete window emit
    count/sum/min/max/mean/p50 over token values without materializing window
    lists (the ``signal_stats`` bundle shape,
    /root/reference/caits/fe/_statistical.py:597, reduced to the engine's
    stat set).  ``decimals`` rounds float outputs for oracle-SQL parity."""
    check_window_spec(window, overlap)
    t = batch.combine_chunks()
    if t.num_rows == 0:
        return _empty_aggs()
    flat, row_offs = _list_col_to_numpy(t["tokens"])
    n_tok = (row_offs[1:] - row_offs[:-1]).astype(np.int64)
    doc_rep, win_id, win_start, base, total = _expansion_index(
        n_tok, row_offs, window, overlap
    )
    idx = base[:, None] + np.arange(window, dtype=np.int64)[None, :]
    mat = flat[idx].astype(np.int64)
    wsum = mat.sum(axis=1)
    wmean = wsum.astype(np.float64) / np.float64(window)
    p50 = np.percentile(mat, 50.0, axis=1, method="linear") if total else np.zeros(0)
    if decimals is not None:
        wmean = np.round(wmean, decimals)
        p50 = np.round(p50, decimals)
    take = pa.array(doc_rep)
    return pa.table(
        {
            "doc_id": t["doc_id"].take(take),
            "source": t["source"].take(take),
            "win_id": pa.array(win_id, pa.int64()),
            "win_start": pa.array(win_start, pa.int64()),
            "win_count": pa.array(np.full(total, window, dtype=np.int64), pa.int64()),
            "win_sum": pa.array(wsum, pa.int64()),
            "win_min": pa.array(mat.min(axis=1).astype(np.int32) if total else np.zeros(0, np.int32), pa.int32()),
            "win_max": pa.array(mat.max(axis=1).astype(np.int32) if total else np.zeros(0, np.int32), pa.int32()),
            "win_mean": pa.array(wmean, pa.float64()),
            "win_p50": pa.array(p50, pa.float64()),
        }
    )


def _empty_aggs() -> pa.Table:
    return pa.Table.from_pylist(
        [],
        schema=pa.schema(
            [
                ("doc_id", pa.string()),
                ("source", pa.string()),
                ("win_id", pa.int64()),
                ("win_start", pa.int64()),
                ("win_count", pa.int64()),
                ("win_sum", pa.int64()),
                ("win_min", pa.int32()),
                ("win_max", pa.int32()),
                ("win_mean", pa.float64()),
                ("win_p50", pa.float64()),
            ]
        ),
    )


def chunk_expand(batch: pa.Table, chunk_len: int) -> pa.Table:
    """Fixed-length chunking INCLUDING the ragged tail
    (/root/reference/caits/windowing.py:188 ``create_chunks`` uses ceil).
    Order-preserving: concatenating a doc's chunks reproduces its token array
    exactly -- the per-row token-array-equality invariant (FIXTURES.md F5)."""
    t = batch.combine_chunks()
    if t.num_rows == 0:
        return _empty_chunks()
    flat, row_offs = _list_col_to_numpy(t["tokens"])
    n_tok = (row_offs[1:] - row_offs[:-1]).astype(np.int64)
    n_chunks = -(-n_tok // chunk_len)  # ceil
    total = int(n_chunks.sum())
    doc_rep = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_chunks)
    excl = np.zeros(len(n_tok), dtype=np.int64)
    np.cumsum(n_chunks[:-1], out=excl[1:])
    win_id = np.arange(total, dtype=np.int64) - np.repeat(excl, n_chunks)
    start = win_id * chunk_len
    end = np.minimum(start + chunk_len, n_tok[doc_rep])
    # chunking preserves order: offsets are a refinement of row offsets
    chunk_offs = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(end - start, out=chunk_offs[1:])
    take = pa.array(doc_rep)
    return pa.table(
        {
            "doc_id": t["doc_id"].take(take),
            "source": t["source"].take(take),
            "win_id": pa.array(win_id, pa.int64()),
            "wtokens": pa.ListArray.from_arrays(
                pa.array(chunk_offs, pa.int64()).cast(pa.int32()),
                pa.array(flat, pa.int32()),
            ),
        }
    )


def _empty_chunks() -> pa.Table:
    return pa.Table.from_pylist(
        [],
        schema=pa.schema(
            [
                ("doc_id", pa.string()),
                ("source", pa.string()),
                ("win_id", pa.int64()),
                ("wtokens", pa.list_(pa.int32())),
            ]
        ),
    )
