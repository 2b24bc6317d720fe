"""Dataset-op equivalents: seeded shuffle, stratified split, union."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crossai_ts_ray.pipelines import dataset_ops as dops


def test_stratified_split(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {"y": ["a"] * 100 + ["b"] * 60 + ["c"] * 40, "v": np.arange(200)}
    )
    train, test = dops.train_test_split(rd.from_pandas(df), 0.25, stratify_col="y")
    tr, te = train.to_pandas(), test.to_pandas()
    assert len(tr) + len(te) == 200
    # per-class proportions preserved (exact rounding per class)
    assert len(te[te["y"] == "a"]) == 25
    assert len(te[te["y"] == "b"]) == 15
    assert len(te[te["y"] == "c"]) == 10
    # no row in both
    assert not set(tr["v"]) & set(te["v"])
    # deterministic
    _, test2 = dops.train_test_split(rd.from_pandas(df), 0.25, stratify_col="y")
    assert set(test2.to_pandas()["v"]) == set(te["v"])


def test_shuffle_seeded(ray_session):
    import ray.data as rd

    ds = rd.range(100)
    a = [r["id"] for r in dops.shuffle(ds, seed=5).take_all()]
    b = [r["id"] for r in dops.shuffle(rd.range(100), seed=5).take_all()]
    assert sorted(a) == list(range(100))
    assert a == b  # same seed -> same order


def test_concat(ray_session):
    import ray.data as rd

    a = rd.range(10)
    b = rd.range(5)
    assert dops.concat(a, b).count() == 15
