"""Numeric primitives shared by the engine's distributed stages.

The bitwise-match contract (BASELINE.md): every rolled-up point must equal the
single-process NumPy oracle bit-for-bit.  Integer counters (count/sum/min/max)
recombine exactly in any order; ``mean`` is a single float64 division; exact
percentiles are computed from *sparse value histograms* which merge exactly
(the n_tok / token domains are bounded ints), replicating
``np.percentile(..., method="linear")`` arithmetic exactly -- including
NumPy's branched lerp (``b - diff*(1-t)`` when ``t >= 0.5``).
"""

from __future__ import annotations

import numpy as np


def np_lerp(a: float, b: float, t: float) -> float:
    """Replicates numpy.lib.function_base._lerp for scalars (bitwise)."""
    diff = b - a
    if t >= 0.5:
        return b - diff * (1 - t)
    return a + diff * t


def percentile_from_sorted(vals: np.ndarray, q: float) -> float:
    """``np.percentile(vals, q, method='linear')`` for an already-sorted 1-D
    array, replicated bit-for-bit (virtual index = (q/100) * (n-1))."""
    n = vals.shape[0]
    if n == 0:
        return float("nan")
    h = (q / 100.0) * (n - 1)
    lo = int(np.floor(h))
    hi = int(np.ceil(h))
    a = float(vals[lo])
    b = float(vals[hi])
    return np_lerp(a, b, h - lo)


def percentile_from_hist(
    uvals: np.ndarray, counts: np.ndarray, q: float
) -> float:
    """Exact linear-method percentile from a sparse histogram.

    ``uvals`` must be strictly increasing; ``counts`` positive int64.
    Equivalent (bitwise) to ``np.percentile(np.repeat(uvals, counts), q)``
    without materializing the expansion -- the engine's scale path for
    percentiles over token streams (up to tier_width * 2048 values/bucket).
    """
    n = int(counts.sum())
    if n == 0:
        return float("nan")
    h = (q / 100.0) * (n - 1)
    lo = int(np.floor(h))
    hi = int(np.ceil(h))
    cc = np.cumsum(counts)
    a = float(uvals[np.searchsorted(cc, lo, side="right")])
    b = float(uvals[np.searchsorted(cc, hi, side="right")])
    return np_lerp(a, b, h - lo)


def merge_sparse_hists(
    vals_list: list[np.ndarray], cnts_list: list[np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    """Merge sparse histograms exactly: concat, re-unique, sum counts."""
    v = np.concatenate(vals_list)
    c = np.concatenate(cnts_list)
    uv, inv = np.unique(v, return_inverse=True)
    # bincount with weights beats np.add.at's per-element scatter
    uc = np.bincount(inv, weights=c.astype(np.float64), minlength=len(uv)).astype(
        np.int64
    )
    return uv, uc


def segment_sum(vals: np.ndarray, starts: np.ndarray, total: int) -> np.ndarray:
    """Per-segment sum with empty segments handled (np.add.reduceat returns
    the *element at the index* for empty segments -- this fixes that)."""
    out = np.add.reduceat(vals, starts) if len(vals) else np.zeros(0, vals.dtype)
    ends = np.append(starts[1:], total)
    empty = ends == starts
    if empty.any():
        out = out.copy()
        out[empty] = 0
    return out


def segment_minmax(
    vals: np.ndarray, starts: np.ndarray, total: int, fill
) -> tuple[np.ndarray, np.ndarray]:
    mn = np.minimum.reduceat(vals, starts) if len(vals) else np.zeros(0, vals.dtype)
    mx = np.maximum.reduceat(vals, starts) if len(vals) else np.zeros(0, vals.dtype)
    ends = np.append(starts[1:], total)
    empty = ends == starts
    if empty.any():
        mn = mn.copy()
        mx = mx.copy()
        mn[empty] = fill
        mx[empty] = fill
    return mn, mx


def group_boundaries(*sorted_keys: np.ndarray) -> np.ndarray:
    """Start indices of key-change runs over pre-sorted parallel key arrays."""
    n = sorted_keys[0].shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for k in sorted_keys:
        new[1:] |= k[1:] != k[:-1]
    return np.flatnonzero(new)
