"""Distributed Lloyd k-means vs a single-process NumPy reference on
planted blobs, plus block-layout invariance on the real test table."""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _write_blobs(path, n_per=400, k=4, dim=16, sep=20.0, rows_per_group=64):
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(k, dim)) * sep
    X = np.concatenate(
        [centers[i] + rng.normal(size=(n_per, dim)) for i in range(k)]
    )
    perm = rng.permutation(len(X))
    X = X[perm]
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(X), dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(X.astype(np.float32).ravel(), pa.float32()), dim
            ),
            "label": pa.array(np.zeros(len(X), np.int32)),
        }
    )
    pq.write_table(t, path, row_group_size=rows_per_group)
    return X.astype(np.float32).astype(np.float64)


def _reference_lloyd(X, k, iters, sample=4096):
    """Single-process mirror of kmeans_embeddings' algorithm: same seeded
    init from the first `sample` rows, same argmin assignment, mean
    updates, empty clusters frozen."""
    from crossai_ts_ray.pipelines.ann_pipeline import _farthest_first_init

    C = _farthest_first_init(X[:sample], k)
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(axis=0)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    assign = np.argmin(d2, axis=1)
    sse = np.array(
        [d2[assign == c, c].sum() if (assign == c).any() else 0.0
         for c in range(k)]
    )
    counts = np.bincount(assign, minlength=k)
    return C, counts, sse


def test_kmeans_matches_numpy_reference_on_blobs(ray_session, tmp_path):
    from crossai_ts_ray.pipelines.ann_pipeline import kmeans_embeddings

    d = tmp_path / "sf"
    d.mkdir()
    X = _write_blobs(str(d / "embeddings.parquet"))
    k, iters = 4, 5
    out = kmeans_embeddings(str(d), k=k, iters=iters).to_pandas()
    C, counts, sse = _reference_lloyd(X, k, iters)
    got = out.sort_values("cluster").reset_index(drop=True)
    assert (got["n"].to_numpy() == counts).all()
    # planted blobs are well separated: every point lands with its blob
    assert sorted(counts.tolist()) == [400, 400, 400, 400]
    np.testing.assert_allclose(
        got["sse"].to_numpy(), np.round(sse + 1e-9, 6), rtol=1e-6
    )
    np.testing.assert_allclose(
        got["centroid_norm"].to_numpy(),
        np.round(np.sqrt((C * C).sum(axis=1)) + 1e-9, 6),
        rtol=1e-9,
    )


def test_kmeans_real_table_and_invariants(ray_session):
    from crossai_ts_ray.pipelines.ann_pipeline import kmeans_embeddings

    import duckdb

    out = kmeans_embeddings(SF, k=5, iters=3).to_pandas()
    con = duckdb.connect()
    n_rows = con.execute(
        f"SELECT count(*) FROM '{SF}/embeddings.parquet'"
    ).fetchone()[0]
    assert int(out["n"].sum()) == n_rows
    assert (out["sse"] >= 0).all()
    # deterministic: a second run is bit-identical
    out2 = kmeans_embeddings(SF, k=5, iters=3).to_pandas()
    assert out.equals(out2)


def test_kmeans_k_exceeds_rows(ray_session, tmp_path):
    """k larger than the table: clusters clamp to row count, no crash."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crossai_ts_ray.pipelines.ann_pipeline import kmeans_embeddings

    d = tmp_path / "sf"
    d.mkdir()
    X = np.random.default_rng(1).normal(size=(5, 8)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(5, dtype=np.int64)),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(X.ravel(), pa.float32()), 8
                ),
                "label": pa.array(np.zeros(5, np.int32)),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    out = kmeans_embeddings(str(d), k=8, iters=2).to_pandas()
    assert len(out) == 5
    assert int(out["n"].sum()) == 5
