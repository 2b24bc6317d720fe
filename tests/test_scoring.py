"""Fitted-model scoring: distributed IRLS fit == single-process NumPy fit,
actor-pool scoring, and the full robustness pipeline (fit -> score ->
prediction statistics -> interpolation -> thresholds -> events -> IoU)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from crossai_ts_ray.pipelines.scoring import (
    LogisticScorer,
    _design,
    _sigmoid,
    fit_logistic,
    generate_probabilities,
    robustness_analysis,
    score_events,
)

SF = "/root/testdata/sf0.001"


def _numpy_irls(X: np.ndarray, y: np.ndarray, iters: int = 8, l2: float = 1e-6):
    """Single-process reference: same Newton updates as fit_logistic."""
    d1 = X.shape[1]
    w = np.zeros(d1)
    for _ in range(iters):
        p = _sigmoid(X @ w)
        g = X.T @ (y - p) - l2 * w
        r = p * (1 - p)
        H = (X * r[:, None]).T @ X + l2 * np.eye(d1)
        w = w + np.linalg.solve(H, g)
    return w


def test_fit_logistic_matches_numpy_reference(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 4000
    x1 = rng.normal(size=n)
    x2 = rng.normal(size=n)
    logits = 0.7 + 1.5 * x1 - 2.0 * x2
    y = (rng.random(n) < _sigmoid(logits)).astype(np.int64)
    t = pa.table(
        {
            "x1": pa.array(x1, pa.float64()),
            "x2": pa.array(x2, pa.float64()),
            "label": pa.array(y, pa.int64()),
        }
    )
    ds = rd.from_arrow(t).repartition(7)  # force multi-block partial sums
    w = fit_logistic(ds, ["x1", "x2"], "label", iters=8)

    X = np.column_stack([np.ones(n), x1, x2])
    w_ref = _numpy_irls(X, y.astype(np.float64), iters=8)
    # block-boundary float reassociation only: sub-ulp-scale drift
    assert np.allclose(w, w_ref, rtol=1e-9, atol=1e-12)
    # and the fit recovered the planted coefficients
    assert np.allclose(w, [0.7, 1.5, -2.0], atol=0.25)


def test_logistic_scorer_batch_kernel():
    w = np.array([0.5, 1.0, -1.0])
    sc = LogisticScorer(w, ["a", "b"])
    t = pa.table(
        {
            "a": pa.array([0.0, 1.0, -2.0], pa.float64()),
            "b": pa.array([0.0, 0.5, 1.0], pa.float64()),
        }
    )
    out = sc(t)
    X = _design(t, ["a", "b"])
    exp = _sigmoid(X @ w)
    got = np.array(out["proba_1"].to_pylist())
    assert np.allclose(got, np.round(exp, 6))
    assert np.allclose(
        np.array(out["proba_0"].to_pylist()) + got, 1.0, atol=2e-6
    )


def test_generate_probabilities_stacks_repeats():
    w = np.array([0.0, 1.0])
    sc = LogisticScorer(w, ["a"])
    X = np.column_stack([np.ones(5), np.linspace(-2, 2, 5)])
    probas = generate_probabilities(sc, X, repeats=4)
    assert probas.shape == (4, 5, 2)
    # deterministic model: every repeat identical (utils.py repeats semantic)
    for r in range(1, 4):
        assert np.array_equal(probas[r], probas[0])


def test_score_events_end_to_end(ray_session):
    out = score_events(SF, iters=4).materialize()
    t = out.to_pandas()
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert len(t) == n
    assert t["proba_1"].between(0, 1).all()
    # the fitted model must separate the planted label at least weakly:
    # mean score on positives > mean score on negatives
    pos = t.loc[t["label"] == 1, "proba_1"].mean()
    neg = t.loc[t["label"] == 0, "proba_1"].mean()
    assert pos >= neg


def test_robustness_analysis_detects_planted_event():
    """Deterministic end-to-end: a model whose probabilities are high inside
    a planted window-range and low outside must yield exactly one detected
    event matching the ground truth."""
    sr, ws, overlap = 10, 1.0, 0.0  # 10 samples per window, no overlap
    n_windows = 30
    # windows 10..19 are the event: feature value 1 inside, 0 outside
    feat = np.zeros(n_windows)
    feat[10:20] = 1.0
    X = np.column_stack([np.ones(n_windows), feat])

    class StepModel:
        def predict_proba(self, X):
            p1 = np.where(X[:, 1] > 0.5, 0.95, 0.02)
            return np.column_stack([1 - p1, p1])

    gt = [(100, 200)]  # samples
    res = robustness_analysis(
        StepModel(), X, sr=sr, ws=ws, overlap_percentage=overlap,
        ground_truths=gt, repeats=3, cutoff=2.0, prob_th=0.5,
        dur_th=0.5, iou_th=0.5,
    )
    assert res["pred_stats"]["mean_pred"].shape == (n_windows, 2)
    # deterministic model: repeats identical (np.std's mean subtraction
    # leaves ~1 ulp of float noise even on identical stacks)
    assert float(res["pred_stats"]["std"].max()) <= 1e-15
    evs = res["predicted_events"]
    assert len(evs) == 1
    s, e = evs[0]
    # spline interpolation + zero-phase smoothing blur the edges by < a
    # window on each side
    assert abs(s - 100) <= 12 and abs(e - 200) <= 12
    m = res["metrics"]
    assert m["detection_rate"] == 1.0
    assert m["reliability"] == 1.0
    assert m["erer"] == 0.0
    # rerun is bitwise identical (full determinism)
    res2 = robustness_analysis(
        StepModel(), X, sr=sr, ws=ws, overlap_percentage=overlap,
        ground_truths=gt, repeats=3, cutoff=2.0, prob_th=0.5,
        dur_th=0.5, iou_th=0.5,
    )
    assert np.array_equal(res2["smoothed_probas"], res["smoothed_probas"])
    assert res2["predicted_events"] == evs
