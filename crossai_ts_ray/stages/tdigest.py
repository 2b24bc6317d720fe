"""t-digest: a mergeable quantile sketch for UNBOUNDED float domains.

The HDR histogram sketch (stages/sketch.py / semistruct.hdr_value_quantiles)
is integer-exact but needs a bounded value domain fixed up front; the
t-digest trades exactness for domain freedom — centroids adapt to the data,
with rank resolution densest at the tails (the quantiles production
monitoring actually reads).

This is the DETERMINISTIC "static digest" formulation: centroid boundaries
are precomputed rank cuts from the k1 (arcsine/cosine) scale function, so
building from a sorted batch is pure ``reduceat`` (no data-order-dependent
greedy merging) and merging digests re-buckets centroid midpoints against
fresh cuts — same inputs, same bytes, every run.  Size is bounded by
``delta`` centroids per digest regardless of input cardinality, the same
bounded-state contract as the HLL/CMS/HDR family.

Rank-error contract (pinned in tests/test_tdigest.py): a value read at
quantile q differs from the exact quantile by at most the local centroid
weight, ~ ``W * sin(pi/delta) * sqrt(q(1-q))`` — sub-0.5% rank error at
delta=200, tightening toward the tails.
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-12


def _rank_cuts(total_w: float, delta: int) -> np.ndarray:
    """k1-scale rank boundaries: q_i = (1 - cos(pi * i / delta)) / 2 —
    dense near q=0 and q=1, coarse in the middle."""
    q = (1.0 - np.cos(np.pi * np.arange(delta + 1) / delta)) / 2.0
    return q * total_w


def build_digest(sorted_vals: np.ndarray, delta: int = 200
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Digest (means, weights) from an ASCENDING-sorted value array.
    Unit weights; centroid j spans the ranks in [cut_j, cut_{j+1})."""
    n = len(sorted_vals)
    if n == 0:
        return np.zeros(0, np.float64), np.zeros(0, np.float64)
    cuts = _rank_cuts(float(n), delta)
    idx = np.unique(np.clip(np.round(cuts).astype(np.int64), 0, n))
    starts = idx[:-1]
    ends = idx[1:]
    keep = ends > starts
    starts, ends = starts[keep], ends[keep]
    csum = np.concatenate(([0.0], np.cumsum(sorted_vals, dtype=np.float64)))
    w = (ends - starts).astype(np.float64)
    means = (csum[ends] - csum[starts]) / w
    return means, w


def merge_digests(parts: list[tuple[np.ndarray, np.ndarray]],
                  delta: int = 200) -> tuple[np.ndarray, np.ndarray]:
    """Merge digests: pool centroids sorted by mean (stable), then
    re-bucket each centroid's rank MIDPOINT against fresh k1 cuts and
    combine by weighted mean.  Deterministic for a given part list."""
    means = np.concatenate([p[0] for p in parts]) if parts else np.zeros(0)
    ws = np.concatenate([p[1] for p in parts]) if parts else np.zeros(0)
    if not len(means):
        return np.zeros(0, np.float64), np.zeros(0, np.float64)
    order = np.argsort(means, kind="stable")
    means, ws = means[order], ws[order]
    total = float(ws.sum())
    cuts = _rank_cuts(total, delta)
    mid = np.cumsum(ws) - ws / 2.0
    bucket = np.clip(np.searchsorted(cuts, mid, side="right") - 1,
                     0, delta - 1)
    wsum = np.zeros(delta, np.float64)
    msum = np.zeros(delta, np.float64)
    np.add.at(wsum, bucket, ws)
    np.add.at(msum, bucket, means * ws)
    keep = wsum > 0
    return msum[keep] / wsum[keep], wsum[keep]


def quantile(means: np.ndarray, weights: np.ndarray,
             q: float | np.ndarray) -> np.ndarray:
    """Estimate quantile(s) by linear interpolation between centroid
    centers (each centroid sits at rank ``cum - w/2``)."""
    q = np.atleast_1d(np.asarray(q, np.float64))
    if not len(means):
        return np.full(len(q), np.nan)
    total = weights.sum()
    centers = np.cumsum(weights) - weights / 2.0
    target = q * total
    out = np.interp(target, centers, means,
                    left=means[0], right=means[-1])
    return out
