"""Event-detection evaluation: the reference's prediction->events->IoU
pipeline (caits/performance/) as Ray stages.

* ``interpolate_probabilities``: window-level probabilities upsampled back
  to sample resolution (caits/performance/utils.py:51-108); linear
  ``np.interp`` variant (the reference also has a cubic-spline mode via
  SciPy -- spline absent here, mode documented).
* ``extract_events``: threshold -> contiguous segments -> duration filter
  (caits/performance/detection.py:8,28,70).
* ``classify_events``: match predicted vs ground-truth intervals by max IoU
  (caits/performance/detection.py:98-160; IoU caits/performance/metrics.py:69)
  -- the broadcast interval-join: ground truths are ray.put once and matched
  per batch.
* metrics: detection rate / reliability / ERER
  (caits/performance/metrics.py:103,118,132).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def interpolate_probabilities(
    probs: np.ndarray, window_starts: np.ndarray, window: int, n_samples: int,
    anchor: str = "center",
) -> np.ndarray:
    """Window-level probs -> per-sample probs by linear interpolation
    anchored at window centers (or starts/ends) -- utils.py:51-108
    ``interp_choice`` semantics, np.interp endpoint clamping."""
    offset = {"start": 0, "center": window // 2, "end": window - 1}[anchor]
    xp = np.asarray(window_starts, dtype=np.float64) + offset
    return np.interp(np.arange(n_samples, dtype=np.float64), xp, probs)


def _cubic_spline_coeffs(x: np.ndarray, y: np.ndarray):
    """Not-a-knot cubic spline second-derivative moments (the
    scipy.interpolate.CubicSpline default boundary condition), solved as a
    dense linear system -- knot counts here are window counts (small).
    Degenerate cases follow SciPy: 2 knots -> linear, 3 knots -> single
    parabola."""
    n = len(x)
    h = np.diff(x)
    A = np.zeros((n, n))
    b = np.zeros(n)
    for i in range(1, n - 1):
        A[i, i - 1] = h[i - 1] / 6.0
        A[i, i] = (h[i - 1] + h[i]) / 3.0
        A[i, i + 1] = h[i] / 6.0
        b[i] = (y[i + 1] - y[i]) / h[i] - (y[i] - y[i - 1]) / h[i - 1]
    if n == 2:
        return np.zeros(2)
    if n == 3:
        # single parabola: M0 = M1 = M2 = const second derivative
        A[0, 0], A[0, 1] = 1.0, -1.0
        A[-1, -2], A[-1, -1] = 1.0, -1.0
    else:
        # not-a-knot: third derivative continuous across x1 and x_{n-2}
        A[0, 0], A[0, 1], A[0, 2] = h[1], -(h[0] + h[1]), h[0]
        A[-1, -3], A[-1, -2], A[-1, -1] = h[-1], -(h[-2] + h[-1]), h[-2]
    return np.linalg.solve(A, b)


def cubic_spline_interp(x: np.ndarray, y: np.ndarray, xq: np.ndarray) -> np.ndarray:
    """Evaluate a not-a-knot cubic spline at ``xq``, extrapolating with the
    end polynomials (scipy CubicSpline extrapolate=True semantics)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    xq = np.asarray(xq, dtype=np.float64)
    if len(x) == 1:
        return np.full(len(xq), y[0])
    M = _cubic_spline_coeffs(x, y)
    h = np.diff(x)
    idx = np.clip(np.searchsorted(x, xq, side="right") - 1, 0, len(x) - 2)
    x0, x1 = x[idx], x[idx + 1]
    hi = h[idx]
    A = (x1 - xq) / hi
    B = (xq - x0) / hi
    return (
        A * y[idx]
        + B * y[idx + 1]
        + ((A**3 - A) * M[idx] + (B**3 - B) * M[idx + 1]) * hi**2 / 6.0
    )


def interpolate_probabilities_windows(
    probabilities: np.ndarray,
    sr: int,
    ws: float,
    overlap_percentage: float,
    interp_choice: int = 2,
) -> np.ndarray:
    """Window-level probability matrix (windows x classes) -> per-sample
    probabilities by per-class cubic-spline interpolation -- the reference
    signature and semantics (caits/performance/utils.py:51: non-overlap step
    grid, interp_choice 1/2/3 = start/middle/end anchors, samples
    0..end_idx[-1])."""
    probabilities = np.asarray(probabilities, dtype=np.float64)
    ws_samples = int(ws * sr)
    op_samples = int(ws_samples * overlap_percentage)
    non_op_step = ws_samples - op_samples
    n_instances, num_classes = probabilities.shape
    start_idx = np.arange(n_instances) * non_op_step
    end_idx = start_idx + non_op_step
    if interp_choice == 1:
        interp_idx = start_idx
    elif interp_choice == 2:
        interp_idx = (start_idx + end_idx) // 2
    elif interp_choice == 3:
        interp_idx = end_idx
    else:
        raise ValueError(
            "Invalid interp_choice. Choose 1 (start), 2 (middle), or 3 (end)."
        )
    interp_indices = np.arange(0, end_idx[-1], dtype=np.float64)
    out = np.zeros((len(interp_indices), num_classes))
    for c in range(num_classes):
        out[:, c] = cubic_spline_interp(
            interp_idx.astype(np.float64), probabilities[:, c], interp_indices
        )
    return out


def compute_class(predictions: np.ndarray) -> np.ndarray:
    """argmax over classes of the repeat-mean probabilities
    (caits/performance/metrics.py:8)."""
    return np.argmax(np.mean(predictions, axis=0), axis=1)


def compute_entropy(predictions: np.ndarray) -> np.ndarray:
    """Per-instance mean Shannon entropy (bits) across repeats
    (caits/performance/metrics.py:12)."""
    eps = np.finfo(float).eps
    return np.mean(
        -np.sum(predictions * np.log(predictions + eps), axis=2) / np.log(2), axis=0
    )


_STATS_FUNCTIONS = {
    "class": compute_class,
    "probas": lambda x: x,
    "mean_pred": lambda x: np.mean(x, axis=0),
    "std": lambda x: np.std(x, axis=0),
    "variance": lambda x: np.var(x, axis=0),
    "entropy": compute_entropy,
}


def prediction_statistics(probabilities: np.ndarray, stats="all") -> dict:
    """Trustworthiness statistics over (n_repeats, n_instances, n_classes)
    prediction probabilities (caits/performance/metrics.py:28): class
    prediction, raw probas, mean/std/variance across repeats, entropy.
    Unknown metric names are skipped (reference prints a notice)."""
    if stats == "all":
        metrics = list(_STATS_FUNCTIONS.keys())
    elif isinstance(stats, str):
        metrics = [stats]
    else:
        metrics = list(stats)
    return {m: _STATS_FUNCTIONS[m](probabilities) for m in metrics if m in _STATS_FUNCTIONS}


def extract_events(
    probs: np.ndarray, prob_threshold: float = 0.5, min_duration: int = 1
) -> list[tuple[int, int]]:
    """Threshold -> contiguous True runs -> duration filter
    (detection.py:8,28,70).  Intervals are [start, end) sample spans."""
    above = probs >= prob_threshold
    if not above.any():
        return []
    d = np.diff(above.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if above[0]:
        starts = np.concatenate(([0], starts))
    if above[-1]:
        ends = np.concatenate((ends, [len(probs)]))
    return [(int(s), int(e)) for s, e in zip(starts, ends) if e - s >= min_duration]


def interval_iou(a: tuple[int, int], b: tuple[int, int]) -> float:
    """caits/performance/metrics.py:69"""
    inter = max(0, min(a[1], b[1]) - max(a[0], b[0]))
    union = max(a[1], b[1]) - min(a[0], b[0])
    return inter / union if union > 0 else 0.0


def _match_intervals(
    ps: np.ndarray, pe: np.ndarray, ground_truth: list[tuple[int, int]]
) -> tuple[np.ndarray, np.ndarray]:
    """Best-IoU ground-truth match for every predicted interval, as one
    (n_pred x n_gt) broadcast: returns (best_index, best_iou) with ties
    resolved to the first maximum (argmax order, matching the scalar
    formulation in interval_iou / detection.py:98-160)."""
    n = len(ps)
    if not ground_truth or n == 0:
        return np.full(n, -1, dtype=np.int64), np.zeros(n, dtype=np.float64)
    g = np.asarray(ground_truth, dtype=np.float64).reshape(-1, 2)
    inter = np.maximum(
        0.0, np.minimum(pe[:, None], g[None, :, 1]) - np.maximum(ps[:, None], g[None, :, 0])
    )
    union = np.maximum(pe[:, None], g[None, :, 1]) - np.minimum(ps[:, None], g[None, :, 0])
    iou = np.divide(inter, union, out=np.zeros_like(inter), where=union > 0)
    best = iou.argmax(axis=1)
    return best, iou[np.arange(n), best]


def classify_events(
    predicted: list[tuple[int, int]],
    ground_truth: list[tuple[int, int]],
    iou_threshold: float = 0.5,
) -> pd.DataFrame:
    """Match each predicted event to the ground truth with max IoU
    (detection.py:98-160): insertions (no match), correct detections,
    and per-gt hit bookkeeping for deletion counting."""
    pred = np.asarray(predicted, dtype=np.float64).reshape(-1, 2)
    best, best_iou = _match_intervals(pred[:, 0], pred[:, 1], ground_truth)
    ok = best_iou >= iou_threshold
    rows = pd.DataFrame(
        {
            "pred_start": pred[:, 0].astype(np.int64),
            "pred_end": pred[:, 1].astype(np.int64),
            "gt_index": np.where(ok, best, -1),
            "iou": np.round(best_iou, 6),
            "kind": np.where(ok, "detection", "insertion"),
        }
    )
    matched_gt = set(best[ok].tolist())
    missing = [gi for gi in range(len(ground_truth)) if gi not in matched_gt]
    if missing:
        rows = pd.concat(
            [
                rows,
                pd.DataFrame(
                    {
                        "pred_start": -1, "pred_end": -1,
                        "gt_index": np.asarray(missing, dtype=np.int64),
                        "iou": 0.0, "kind": "deletion",
                    }
                ),
            ],
            ignore_index=True,
        )
    return rows[["pred_start", "pred_end", "gt_index", "iou", "kind"]]


def detection_metrics(events_df: pd.DataFrame, n_gt: int) -> dict:
    """DR / reliability / ERER (metrics.py:103,118,132)."""
    detections = int((events_df["kind"] == "detection").sum())
    insertions = int((events_df["kind"] == "insertion").sum())
    deletions = int((events_df["kind"] == "deletion").sum())
    dr = detections / n_gt if n_gt else 0.0
    reliability = detections / (detections + insertions) if detections + insertions else 0.0
    erer = (insertions + deletions) / n_gt if n_gt else 0.0
    return {"detection_rate": dr, "reliability": reliability, "erer": erer}


def classify_events_distributed(pred_ds, ground_truth_by_key: dict, iou_threshold: float = 0.5):
    """Batchwise event classification with the ground-truth table broadcast
    via ray.put -- the engine's broadcast interval join (SURVEY.md §2.6).
    ``pred_ds`` rows: (key, start, end)."""
    import pyarrow as pa
    import ray

    gt_ref = ray.put(ground_truth_by_key)

    out_schema = pa.schema(
        [
            ("pred_start", pa.int64()),
            ("pred_end", pa.int64()),
            ("gt_index", pa.int64()),
            ("iou", pa.float64()),
            ("kind", pa.string()),
            ("key", pa.string()),
        ]
    )

    def match(t: pa.Table) -> pa.Table:
        """Vectorized per-batch kernel: group rows by key with one stable
        argsort, then run the broadcast IoU match (_match_intervals) on each
        contiguous key slice -- no per-row or per-pair Python work; the only
        loop is over distinct keys in the batch, each iteration pure NumPy.
        Deletions need the global per-key view, so only detection/insertion
        rows are emitted here."""
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        gts = ray.get(gt_ref)
        t = t.combine_chunks()
        keys = np.asarray(t["key"].to_numpy(zero_copy_only=False))
        start = t["start"].to_numpy(zero_copy_only=False).astype(np.float64)
        end = t["end"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(keys, kind="stable")
        keys, start, end = keys[order], start[order], end[order]
        uniq, bounds = np.unique(keys, return_index=True)
        gt_index = np.empty(len(keys), dtype=np.int64)
        iou = np.empty(len(keys), dtype=np.float64)
        slices = np.append(bounds, len(keys))
        for ki, key in enumerate(uniq):
            sl = slice(slices[ki], slices[ki + 1])
            best, best_iou = _match_intervals(start[sl], end[sl], gts.get(key, []))
            gt_index[sl], iou[sl] = best, best_iou
        ok = iou >= iou_threshold
        return pa.table(
            {
                "pred_start": pa.array(start.astype(np.int64)),
                "pred_end": pa.array(end.astype(np.int64)),
                "gt_index": pa.array(np.where(ok, gt_index, -1)),
                "iou": pa.array(np.round(iou, 6)),
                "kind": pa.array(np.where(ok, "detection", "insertion")),
                "key": pa.array(keys, pa.string()),
            },
            schema=out_schema,
        )

    return pred_ds.map_batches(match, batch_format="pyarrow")
