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


def classify_events(
    predicted: list[tuple[int, int]],
    ground_truth: list[tuple[int, int]],
    iou_threshold: float = 0.5,
) -> pd.DataFrame:
    """Match each predicted event to the ground truth with max IoU
    (detection.py:98-160): insertions (no match), correct detections,
    and per-gt hit bookkeeping for deletion counting."""
    rows = []
    matched_gt: set[int] = set()
    for p in predicted:
        ious = [interval_iou(p, g) for g in ground_truth]
        best = int(np.argmax(ious)) if ious else -1
        best_iou = ious[best] if ious else 0.0
        ok = best_iou >= iou_threshold
        if ok:
            matched_gt.add(best)
        rows.append(
            {
                "pred_start": p[0], "pred_end": p[1],
                "gt_index": best if ok else -1,
                "iou": round(best_iou, 6),
                "kind": "detection" if ok else "insertion",
            }
        )
    for gi in range(len(ground_truth)):
        if gi not in matched_gt:
            rows.append(
                {
                    "pred_start": -1, "pred_end": -1, "gt_index": gi,
                    "iou": 0.0, "kind": "deletion",
                }
            )
    return pd.DataFrame(rows, columns=["pred_start", "pred_end", "gt_index", "iou", "kind"])


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

    def match(t: pa.Table) -> pa.Table:
        gts = ray.get(gt_ref)
        df = t.to_pandas()
        out = []
        for key, grp in df.groupby("key"):
            preds = list(zip(grp["start"], grp["end"]))
            res = classify_events(preds, gts.get(key, []), iou_threshold)
            res = res[res["kind"] != "deletion"].copy()  # deletions need global view
            res["key"] = key
            out.append(res)
        if not out:
            return pa.Table.from_pylist([])
        return pa.Table.from_pandas(pd.concat(out, ignore_index=True), preserve_index=False)

    return pred_ds.map_batches(match, batch_format="pyarrow")
