"""EDA grouped filters, PCEN scan, event-detection evaluation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from crossai_ts_ray.functions import eda, pcen
from crossai_ts_ray.pipelines import evaluation as ev


def test_outlier_masks():
    x = np.concatenate([np.random.default_rng(0).normal(0, 1, 500), [50.0, -40.0]])
    zm = eda.zscore_outlier_mask(x, 3.0)
    im = eda.iqr_outlier_mask(x, 1.5)
    assert not zm[-1] and not zm[-2]
    assert not im[-1] and not im[-2]
    assert zm[:500].mean() > 0.98


def test_filter_outliers_grouped(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(1)
    df = pd.DataFrame(
        {
            "cls": ["a"] * 300 + ["b"] * 300,
            "v": np.concatenate([rng.normal(0, 1, 300), rng.normal(100, 5, 300)]),
        }
    )
    df.loc[0, "v"] = 1000.0  # outlier for class a, inlier-scale for b
    ds = rd.from_pandas(df)
    out = eda.filter_outliers_grouped(ds, "cls", "v", "zscore", threshold=3.0).to_pandas()
    assert len(out) < len(df)
    assert 1000.0 not in out[out["cls"] == "a"]["v"].values


def test_corr_and_high_corr():
    rng = np.random.default_rng(2)
    a = rng.normal(0, 1, 500)
    df = pd.DataFrame({"a": a, "b": a * 2 + rng.normal(0, 0.01, 500), "c": rng.normal(0, 1, 500)})
    cm = eda.corr_matrix(df)
    assert cm.loc["a", "b"] > 0.99
    drops = eda.get_high_corr_features(df, 0.9)
    assert drops == ["b"]
    sm = eda.corr_matrix(df, "spearman")
    assert sm.loc["a", "b"] > 0.99


def test_pcen_iir_scan():
    rng = np.random.default_rng(3)
    S = np.abs(rng.normal(0, 1, (8, 200)))
    out = pcen.pcen(S, axis=-1)
    assert out.shape == S.shape
    # IIR smoother: step response converges to the step value
    step = np.zeros((1, 300))
    step[:, 100:] = 1.0
    M = pcen.iir_smooth(step, b=0.1, axis=-1)
    assert M[0, 99] < 0.01 and abs(M[0, -1] - 1.0) < 0.01
    # order dependence: reversing time changes the result
    assert not np.allclose(
        pcen.iir_smooth(S, 0.2, axis=-1),
        pcen.iir_smooth(S[:, ::-1], 0.2, axis=-1)[:, ::-1],
    )


def test_interpolate_and_extract_events():
    probs = np.array([0.1, 0.9, 0.9, 0.1])
    starts = np.array([0, 10, 20, 30])
    dense = ev.interpolate_probabilities(probs, starts, window=10, n_samples=40)
    assert len(dense) == 40
    assert dense[15] > 0.5  # inside the high-prob windows
    events = ev.extract_events(dense, 0.5, min_duration=3)
    assert len(events) == 1
    s, e = events[0]
    assert s > 5 and e < 35


def test_classify_events_iou():
    gt = [(10, 20), (40, 50)]
    pred = [(11, 19), (60, 70)]
    res = ev.classify_events(pred, gt, iou_threshold=0.5)
    kinds = res["kind"].tolist()
    assert kinds.count("detection") == 1
    assert kinds.count("insertion") == 1
    assert kinds.count("deletion") == 1
    m = ev.detection_metrics(res, n_gt=2)
    assert m["detection_rate"] == 0.5
    assert m["reliability"] == 0.5
    assert m["erer"] == 1.0


def test_classify_events_distributed_matches_serial(ray_session):
    """The vectorized batch kernel must reproduce the serial classify_events
    row-for-row (minus deletions, which need the global per-key view) on a
    randomized many-key fixture with overlaps, ties, and gt-less keys."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 400
    keys = rng.choice([f"k{i}" for i in range(12)], n)
    start = rng.integers(0, 1000, n)
    end = start + rng.integers(1, 60, n)
    pred = pd.DataFrame({"key": keys, "start": start, "end": end})
    gts = {
        f"k{i}": [
            (int(s), int(s + w))
            for s, w in zip(rng.integers(0, 1000, 8), rng.integers(1, 80, 8))
        ]
        for i in range(10)  # k10/k11 deliberately absent
    }
    out = (
        ev.classify_events_distributed(rd.from_pandas(pred), gts, 0.4)
        .to_pandas()
        .sort_values(["key", "pred_start", "pred_end", "gt_index"])
        .reset_index(drop=True)
    )
    expected = []
    for key, grp in pred.groupby("key"):
        res = ev.classify_events(
            list(zip(grp["start"], grp["end"])), gts.get(key, []), 0.4
        )
        res = res[res["kind"] != "deletion"].copy()
        res["key"] = key
        expected.append(res)
    exp = (
        pd.concat(expected, ignore_index=True)
        .sort_values(["key", "pred_start", "pred_end", "gt_index"])
        .reset_index(drop=True)
    )
    assert len(out) == n == len(exp)
    pd.testing.assert_frame_equal(
        out[["key", "pred_start", "pred_end", "gt_index", "iou", "kind"]],
        exp[["key", "pred_start", "pred_end", "gt_index", "iou", "kind"]],
        check_dtype=False,
    )


def test_classify_events_distributed(ray_session):
    import ray.data as rd

    pred = pd.DataFrame(
        {"key": ["f1", "f1", "f2"], "start": [10, 60, 5], "end": [20, 70, 9]}
    )
    gts = {"f1": [(10, 20)], "f2": [(100, 120)]}
    out = ev.classify_events_distributed(rd.from_pandas(pred), gts).to_pandas()
    f1 = out[out["key"] == "f1"]
    assert set(f1["kind"]) == {"detection", "insertion"}
    f2 = out[out["key"] == "f2"]
    assert set(f2["kind"]) == {"insertion"}
