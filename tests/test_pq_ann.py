"""Product-quantization ANN: codebook determinism, degenerate exactness
(every sample vector its own centroid -> ADC == exact), recall vs the
exact cosine scan, and the compression-stats telemetry."""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _pd(ds):
    from tools.verify_correctness import to_pandas

    return to_pandas(ds)


def test_codebooks_deterministic():
    from crossai_ts_ray.pipelines.ann_pipeline import train_pq_codebooks

    a = train_pq_codebooks(SF, m=4, ksub=16)
    b = train_pq_codebooks(SF, m=4, ksub=16)
    assert np.array_equal(a, b)
    assert a.shape[0] == 4 and a.shape[1] == 16


def test_pq_recall_vs_exact(ray_session):
    from crossai_ts_ray.pipelines.ann_pipeline import (
        cosine_topk,
        pq_ann_topk,
    )

    exact = set(_pd(cosine_topk(SF, k=10, query_id=0))["vec_id"])
    approx = set(_pd(pq_ann_topk(SF, k=10, query_id=0, m=8,
                                 ksub=32, rerank=64))["vec_id"])
    recall = len(exact & approx) / 10
    assert recall >= 0.8, recall  # ADC shortlist-64 + exact re-rank
    # a tighter shortlist trades recall for fetches but must stay useful
    approx16 = set(_pd(pq_ann_topk(SF, k=10, query_id=0, m=8,
                                   ksub=32, rerank=16))["vec_id"])
    assert len(exact & approx16) / 10 >= 0.5


def test_pq_degenerate_is_exact(ray_session):
    """With m=1 and ksub >= corpus size trained on the WHOLE corpus,
    every normalized vector is its own centroid, so ADC top-k must equal
    the exact cosine top-k."""
    import pyarrow.parquet as pq

    from crossai_ts_ray.pipelines.ann_pipeline import (
        cosine_topk,
        pq_ann_topk,
    )

    n = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    exact = _pd(cosine_topk(SF, k=5, query_id=3))
    approx = _pd(pq_ann_topk(SF, k=5, query_id=3, m=1, ksub=n))
    assert list(approx["vec_id"]) == list(exact["vec_id"])


def test_pq_compression_stats(ray_session):
    from crossai_ts_ray.pipelines.ann_pipeline import pq_compression_stats

    import duckdb

    dim = duckdb.sql(
        f"SELECT len(embedding) FROM read_parquet('{SF}/embeddings.parquet') LIMIT 1"
    ).fetchone()[0]
    t = _pd(pq_compression_stats(SF, m=4, ksub=16))
    assert len(t) == 1
    r = t.iloc[0]
    assert r.n_vectors == 500
    assert r.orig_bytes == 500 * dim * 4
    assert r.code_bytes == 500 * 4 + 4 * 16 * (dim // 4) * 4
    assert r.compression_x > 10
    assert 0 < r.mse < 1.0
