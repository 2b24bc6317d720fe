"""Fitted-model scoring: a hand-rolled logistic-regression estimator whose
FIT is a distributed aggregate pass and whose PREDICT is an actor-pool
``map_batches`` stage -- the end-to-end model path the reference reaches
through serialized sklearn/Keras artifacts:

* fit-as-aggregate + broadcast: ``SklearnWrapper.fit``
  (/root/reference/caits/transformers/_sklearn_wrapper.py:34-48),
* batched ``predict_proba``: ``generate_probabilities``
  (/root/reference/caits/performance/utils.py:10-48),
* downstream robustness evaluation: ``robustness_analysis``
  (/root/reference/caits/performance/evaluation.py:35) -- reproduced here
  as :func:`robustness_analysis` minus the matplotlib figures.

Scale shape: each IRLS iteration streams the dataset once and ships ONE
(d+1)^2-float partial per batch (gradient + Hessian of a d-feature model);
driver state is the weight vector.  Scoring is embarrassingly parallel --
weights ride to workers inside the callable (broadcast once per actor,
never per batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..sources.readers import read_parquet_sized


def _design(t: pa.Table, feature_cols: list[str]) -> np.ndarray:
    """(n, d+1) design matrix with leading intercept column."""
    n = t.num_rows
    X = np.empty((n, len(feature_cols) + 1), dtype=np.float64)
    X[:, 0] = 1.0
    for j, c in enumerate(feature_cols):
        X[:, j + 1] = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
    return X


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def fit_logistic(
    ds: rd.Dataset,
    feature_cols: list[str],
    label_col: str,
    iters: int = 8,
    l2: float = 1e-6,
) -> np.ndarray:
    """Fit binary logistic regression by IRLS (Newton) over a Dataset.

    Each iteration is ONE streaming pass: every batch emits the flattened
    per-batch gradient (d+1 floats) and Hessian ((d+1)^2 floats); a single
    ``.sum()`` aggregate combines them and the driver solves the tiny
    (d+1)x(d+1) system.  Communication per pass is O(batches x d^2),
    independent of row count -- the same partial-aggregate shape as
    ``StandardScalerStage``.  Deterministic: full-batch Newton from w=0 has
    no seed and no row-order dependence (float addition reassociation across
    block boundaries is sub-ulp here; weights are driver state).

    Returns the (d+1,) weight vector (bias first).
    """
    from ..util import dataset_to_table

    d1 = len(feature_cols) + 1
    w = np.zeros(d1, dtype=np.float64)
    wide = d1 + d1 * d1 > 512  # per-column Ray sum() crawls past ~512 cols

    for _ in range(iters):
        w_now = w.copy()

        def partial(t: pa.Table) -> pa.Table:
            tt = t.combine_chunks()
            X = _design(tt, feature_cols)
            y = tt[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
            p = _sigmoid(X @ w_now)
            g = X.T @ (y - p)  # (d1,)
            r = p * (1.0 - p)
            H = (X * r[:, None]).T @ X  # (d1, d1)
            flat = np.concatenate([g, H.reshape(-1)])
            if wide:
                # ONE fixed-size-list row per batch: wide models (hashed
                # n-gram quality filters, d1^2 ~ thousands) would pay a
                # per-column aggregate otherwise
                return pa.table(
                    {"vec": pa.FixedSizeListArray.from_arrays(
                        pa.array(flat, pa.float64()), len(flat))}
                )
            cols = {f"c{i}": pa.array([v], pa.float64()) for i, v in enumerate(flat)}
            return pa.table(cols)

        partials = ds.map_batches(partial, batch_format="pyarrow")
        if wide:
            # partials table is (#batches, d1+d1^2) -- driver-bounded by
            # batch count, never row count
            pt = dataset_to_table(partials)
            flat = np.add.reduce(
                pt["vec"].combine_chunks().flatten().to_numpy(
                    zero_copy_only=False
                ).reshape(pt.num_rows, d1 + d1 * d1),
                axis=0,
            )
        else:
            agg = partials.sum([f"c{i}" for i in range(d1 + d1 * d1)])
            flat = np.array([agg[f"sum(c{i})"] for i in range(d1 + d1 * d1)])
        g = flat[:d1] - l2 * w
        H = flat[d1:].reshape(d1, d1) + l2 * np.eye(d1)
        w = w + np.linalg.solve(H, g)
    return w


class LogisticScorer:
    """Actor-pool scoring stage: weights load once per actor in ``__init__``
    (the model-artifact seam -- swap in any deserialized model here), every
    batch is one vectorized matmul + sigmoid.  ``repeats`` stacks repeated
    predictions the way ``generate_probabilities`` does for stochastic
    models (utils.py:40-47); this model is deterministic, so repeats agree
    bit-for-bit -- the stacking exists for prediction_statistics parity."""

    def __init__(self, weights: np.ndarray, feature_cols: list[str]):
        self.w = np.asarray(weights, dtype=np.float64)
        self.feature_cols = list(feature_cols)

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        p1 = _sigmoid(X @ self.w)
        return np.stack([1.0 - p1, p1], axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        tt = t.combine_chunks()
        X = _design(tt, self.feature_cols)
        proba = self.predict_proba(X)
        out = {name: tt[name] for name in tt.schema.names}
        out["proba_0"] = pa.array(np.round(proba[:, 0], 6), pa.float64())
        out["proba_1"] = pa.array(np.round(proba[:, 1], 6), pa.float64())
        return pa.table(out)


def generate_probabilities(model, X: np.ndarray, repeats: int = 1) -> np.ndarray:
    """(repeats, n, classes) stacked predictions
    (caits/performance/utils.py:10-48): ``predict_proba`` when available,
    plain call otherwise."""
    if hasattr(model, "predict_proba"):
        preds = [model.predict_proba(X) for _ in range(repeats)]
    else:
        preds = [model(X) for _ in range(repeats)]
    return np.stack(preds, axis=0)


_FEATURE_DIRS: dict[str, str] = {}


def score_events(sf_dir: str, iters: int = 8, concurrency: int = 4) -> rd.Dataset:
    """End-to-end fitted-model scoring over the events table: fit
    P(event_type = 'error' | value, |value|) with the distributed IRLS
    pass, then score every event with an actor-pool ``map_batches``.

    Returns (event_id, label, proba_1) -- rows-only driver query (an
    iterative fit is not SQL-expressible; exactness of the IRLS path is
    pytest-verified against a NumPy reference fit)."""

    def featurize(t: pa.Table) -> pa.Table:
        tt = t.combine_chunks()
        v = tt["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        et = tt["event_type"].to_pylist()
        return pa.table(
            {
                "event_id": tt["event_id"].cast(pa.int64()),
                "x_value": pa.array(v, pa.float64()),
                "x_absvalue": pa.array(np.abs(v), pa.float64()),
                "label": pa.array(
                    np.array([1 if s == "error" else 0 for s in et], np.int64),
                    pa.int64(),
                ),
            }
        )

    # Persist the FEATURE table once per process (numeric columns only --
    # orders of magnitude smaller than raw input at scale) so the iterative
    # fit re-streams features, not the raw table: iters+1 passes over
    # features instead of iters+1 raw scans.  Same persisted-derived-table
    # pattern (tempdir cached per process, streaming reads, nothing
    # materialized) as the MinHash signature table / ANN index.
    import os
    import shutil
    import tempfile

    from ..pipelines.text_pipeline import read_persisted

    feat_dir = _FEATURE_DIRS.get(sf_dir)
    if feat_dir is None or not os.path.isdir(feat_dir):
        feat_dir = tempfile.mkdtemp(prefix="crossai_scoring_feats_")
        try:
            read_parquet_sized(
                f"{sf_dir}/events.parquet",
                columns=["event_id", "event_type", "value"],
            ).map_batches(featurize, batch_format="pyarrow").write_parquet(feat_dir)
        except BaseException:
            shutil.rmtree(feat_dir, ignore_errors=True)
            raise
        _FEATURE_DIRS[sf_dir] = feat_dir

    fcols = ["x_value", "x_absvalue"]
    w = fit_logistic(read_persisted(feat_dir), fcols, "label", iters=iters)

    scored = read_persisted(feat_dir).map_batches(
        LogisticScorer(w, fcols),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return scored.select_columns(["event_id", "label", "proba_1"])


def robustness_analysis(
    model,
    input_data: np.ndarray,
    sr: int,
    ws: float,
    overlap_percentage: float,
    ground_truths: list[tuple[int, int]],
    repeats: int = 5,
    interp_choice: int = 2,
    cutoff: float = 0.1,
    prob_th: float = 0.7,
    dur_th: float = 1.0,
    iou_th: float = 0.5,
    positive_class: int = 1,
) -> dict:
    """The reference robustness pipeline
    (caits/performance/evaluation.py:35) without the figures: windowed
    inference -> prediction statistics -> per-sample interpolation ->
    Butterworth low-pass smoothing -> probability + duration thresholds ->
    event extraction -> IoU classification -> detection metrics.
    Deterministic for a deterministic model."""
    from ..functions.filters import filter_butterworth
    from .evaluation import (
        classify_events,
        detection_metrics,
        extract_events,
        interpolate_probabilities_windows,
        prediction_statistics,
    )

    if input_data.ndim < 2:
        raise ValueError("`input_data` must be at least 2D.")

    probas = generate_probabilities(model, input_data, repeats)
    pred_stats = prediction_statistics(probas, "all")
    mean_probas = pred_stats["mean_pred"]

    interp = interpolate_probabilities_windows(
        mean_probas, sr=sr, ws=ws,
        overlap_percentage=overlap_percentage, interp_choice=interp_choice,
    )
    smoothed = np.stack(
        [
            filter_butterworth(
                interp[:, c], fs=sr, filter_type="lowpass",
                cutoff_freq=cutoff, order=3,
            )
            for c in range(interp.shape[1])
        ],
        axis=1,
    )
    min_dur = max(1, int(round(dur_th * sr)))
    events = extract_events(
        smoothed[:, positive_class], prob_threshold=prob_th, min_duration=min_dur
    )
    events_df = classify_events(events, ground_truths, iou_threshold=iou_th)
    metrics = detection_metrics(events_df, n_gt=len(ground_truths))
    return {
        "pred_stats": pred_stats,
        "interpolated_probas": interp,
        "smoothed_probas": smoothed,
        "predicted_events": events,
        "events_df": events_df,
        "metrics": metrics,
    }


# ---------------------------------------------------------------------------
# Hashed n-gram text-quality classifier (fastText-style linear filter)
# ---------------------------------------------------------------------------

_QUALITY_DIM = 256


def hash_ngram_matrix(texts: list[str], dim: int = _QUALITY_DIM,
                      bigrams: bool = True) -> np.ndarray:
    """(n_docs, dim) hashed bag of word uni+bi-grams, normalized by token
    count -- the fastText-style feature map behind every linear
    LLM-data quality/language filter.  crc32 keeps the bucket assignment
    deterministic across processes (hash() is salted per interpreter).
    Tokenizing is inherently per-string; the accumulate is np.add.at per
    doc, and the matrix never exceeds batch_rows x dim."""
    from zlib import crc32

    X = np.zeros((len(texts), dim), dtype=np.float64)
    for i, tx in enumerate(texts):
        ws = tx.split(" ")
        idx = np.fromiter(
            (crc32(w.encode()) % dim for w in ws), np.int64, len(ws)
        )
        np.add.at(X[i], idx, 1.0)
        if bigrams and len(ws) > 1:
            bidx = np.fromiter(
                (crc32((a + " " + b).encode()) % dim
                 for a, b in zip(ws, ws[1:])),
                np.int64, len(ws) - 1,
            )
            np.add.at(X[i], bidx, 1.0)
        X[i] /= max(1, len(ws))
    return X


_QUALITY_FEATURE_DIRS: dict[tuple, str] = {}


def doc_quality_scores(sf_dir: str, dim: int = _QUALITY_DIM,
                       iters: int = 8, concurrency: int = 4,
                       label_lang: str = "en") -> rd.Dataset:
    """The standard LLM-data quality-filter stage, end to end: train a
    linear classifier over hashed text n-grams DISTRIBUTED on the
    documents table (label: ``lang == label_lang`` -- the
    wiki-vs-crawl-style weak supervision real pipelines use), then score
    every document in the existing actor-pool stage.

    Returns (doc_id, label, proba_1) -- rows-only driver query (the
    iterative IRLS fit is not SQL-expressible; parity vs a
    single-process NumPy reference fit and planted-separable-class
    recovery are pytest-pinned in tests/test_quality_classifier.py).

    Scale shape: raw text is read ONCE to build the persisted numeric
    feature table (dim+2 columns, orders of magnitude smaller than the
    corpus); the fit re-streams features iters times shipping one
    (dim+1)^2 partial per batch; scoring broadcasts the weight vector
    inside the actor callable.  Nothing raw-sized is materialized.
    """
    import os
    import shutil
    import tempfile

    from ..pipelines.text_pipeline import read_persisted

    fcols = [f"f{j}" for j in range(dim)]

    def featurize(t: pa.Table) -> pa.Table:
        tt = t.combine_chunks()
        texts = tt["text"].to_pylist()
        X = hash_ngram_matrix(texts, dim=dim)
        langs = tt["lang"].to_pylist()
        cols: dict = {"doc_id": tt["doc_id"].cast(pa.int64())}
        for j, c in enumerate(fcols):
            cols[c] = pa.array(X[:, j], pa.float64())
        cols["label"] = pa.array(
            np.array([1 if s == label_lang else 0 for s in langs],
                     np.int64),
            pa.int64(),
        )
        return pa.table(cols)

    key = (sf_dir, dim, label_lang)
    feat_dir = _QUALITY_FEATURE_DIRS.get(key)
    if feat_dir is None or not os.path.isdir(feat_dir):
        feat_dir = tempfile.mkdtemp(prefix="crossai_quality_feats_")
        try:
            read_parquet_sized(
                f"{sf_dir}/documents.parquet",
                columns=["doc_id", "text", "lang"],
            ).map_batches(featurize, batch_format="pyarrow").write_parquet(
                feat_dir
            )
        except BaseException:
            shutil.rmtree(feat_dir, ignore_errors=True)
            raise
        _QUALITY_FEATURE_DIRS[key] = feat_dir

    w = fit_logistic(read_persisted(feat_dir), fcols, "label", iters=iters)
    scored = read_persisted(feat_dir).map_batches(
        LogisticScorer(w, fcols),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return scored.select_columns(["doc_id", "label", "proba_1"])
