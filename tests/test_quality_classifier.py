"""Hashed n-gram quality classifier: distributed fit == single-process
NumPy reference fit, planted separable classes recover perfectly, and the
real-corpus language filter actually separates."""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _canon(ds):
    from tools.verify_correctness import canon, to_pandas

    return canon(to_pandas(ds))


def _reference_irls(X: np.ndarray, y: np.ndarray, iters: int = 8,
                    l2: float = 1e-6) -> np.ndarray:
    """Single-process mirror of fit_logistic's exact math."""
    from crossai_ts_ray.pipelines.scoring import _sigmoid

    Xd = np.hstack([np.ones((len(X), 1)), X])
    w = np.zeros(Xd.shape[1])
    for _ in range(iters):
        p = _sigmoid(Xd @ w)
        g = Xd.T @ (y - p) - l2 * w
        H = (Xd * (p * (1 - p))[:, None]).T @ Xd + l2 * np.eye(len(w))
        w = w + np.linalg.solve(H, g)
    return w


def _write_docs(path, texts, langs):
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(path / "documents.parquet"))


def test_planted_classes_recovered_and_fit_matches_reference(
        ray_session, tmp_path):
    from crossai_ts_ray.pipelines.scoring import (
        doc_quality_scores,
        fit_logistic,
        hash_ngram_matrix,
    )
    from crossai_ts_ray.pipelines.text_pipeline import read_persisted  # noqa: F401

    rng = np.random.default_rng(3)
    texts, langs = [], []
    for i in range(120):
        if i % 2 == 0:
            words = rng.choice([f"aa{j}" for j in range(10)], size=20)
            langs.append("en")
        else:
            words = rng.choice([f"bb{j}" for j in range(10)], size=20)
            langs.append("xx")
        texts.append(" ".join(words))
    _write_docs(tmp_path, texts, langs)

    got = _canon(doc_quality_scores(str(tmp_path), dim=32, iters=8))
    # perfect separation on disjoint vocabularies
    assert ((got["proba_1"] > 0.5) == (got["label"] == 1)).all()

    # the distributed IRLS weights == the single-process reference fit
    X = hash_ngram_matrix(texts, dim=32)
    y = np.array([1 if s == "en" else 0 for s in langs], np.float64)
    w_ref = _reference_irls(X, y, iters=8)

    import ray.data as rd

    feat = {f"f{j}": X[:, j] for j in range(32)}
    feat["label"] = y.astype(np.int64)
    ds = rd.from_arrow(pa.table(feat))
    w_ray = fit_logistic(ds, [f"f{j}" for j in range(32)], "label", iters=8)
    np.testing.assert_allclose(w_ray, w_ref, rtol=1e-8, atol=1e-10)


def test_real_corpus_language_filter_separates(ray_session):
    from crossai_ts_ray.pipelines.scoring import doc_quality_scores

    got = _canon(doc_quality_scores(SF))
    assert len(got) == 500
    acc = float(((got["proba_1"] > 0.5) == (got["label"] == 1)).mean())
    assert acc >= 0.9, f"language filter accuracy {acc}"
    # deterministic across runs (fixed hashing, full-batch Newton)
    again = _canon(doc_quality_scores(SF))
    assert (got["proba_1"].to_numpy() == again["proba_1"].to_numpy()).all()
