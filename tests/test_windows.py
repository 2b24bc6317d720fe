"""Windowing: the F3 shape matrix (reference conftest fixture grid), exact
content checks, and the token-array-equality invariant through a real Ray
shuffle (FIXTURES.md F5)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from crossai_ts_ray import oracle
from crossai_ts_ray.stages.windows import (
    check_window_spec,
    chunk_expand,
    expand_windows,
    window_aggregates,
    window_counts,
)


def _table(lengths: list[int], seed: int = 3) -> pa.Table:
    rng = np.random.default_rng(seed)
    rows = []
    for i, n in enumerate(lengths):
        rows.append(
            {
                "doc_id": f"d{i:04d}",
                "tokens": rng.integers(0, 1000, n).astype(np.int32).tolist(),
                "n_tok": n,
                "source": f"s{i % 3}",
                "seq": i,
            }
        )
    return pa.Table.from_pylist(rows)


PARAMS = [(10, 0), (10, 5), (500, 250), (1, 0)]


@pytest.mark.parametrize("window,overlap", PARAMS)
def test_f3_shape_matrix(window, overlap):
    lengths = [1, window - 1, window, window + 1, 10 * window, 10 * window + 3]
    lengths = [max(1, n) for n in lengths]
    t = _table(lengths)
    out = expand_windows(t, window, overlap)
    flat, offs = (
        out["wtokens"].combine_chunks().flatten().to_numpy(zero_copy_only=False),
        None,
    )
    # counts per doc match the reference rule
    step = window - overlap
    by_doc = {}
    for d in out["doc_id"].to_pylist():
        by_doc[d] = by_doc.get(d, 0) + 1
    for i, n in enumerate(lengths):
        want = len(oracle.sliding_window_starts(n, window, overlap))
        assert by_doc.get(f"d{i:04d}", 0) == want, (n, window, overlap)
    # every window has exactly `window` tokens and matches the slice
    wt = out["wtokens"].combine_chunks()
    assert (np.diff(wt.offsets.to_numpy(zero_copy_only=False)) == window).all()
    src_rows = {r["doc_id"]: r["tokens"] for r in t.to_pylist()}
    for r in out.to_pylist():
        s = r["win_start"]
        assert r["wtokens"] == src_rows[r["doc_id"]][s : s + window]
        assert r["win_start"] == r["win_id"] * step


def test_overlap_ge_window_raises():
    with pytest.raises(ValueError, match="Overlap must be smaller"):
        check_window_spec(10, 10)
    with pytest.raises(ValueError):
        window_counts(np.array([100]), 5, 7)


def test_window_aggregates_match_expansion():
    t = _table([1, 9, 10, 11, 100, 103], seed=9)
    agg = window_aggregates(t, 10, 5)
    exp = expand_windows(t, 10, 5)
    assert agg.num_rows == exp.num_rows
    for ra, re in zip(agg.to_pylist(), exp.to_pylist()):
        toks = np.array(re["wtokens"], dtype=np.int64)
        assert ra["win_sum"] == toks.sum()
        assert ra["win_min"] == toks.min()
        assert ra["win_max"] == toks.max()
        assert ra["win_mean"] == round(float(toks.sum()) / 10.0, 6)
        assert ra["win_p50"] == round(float(np.percentile(toks, 50.0)), 6)


def test_token_array_equality_through_shuffle(ray_session):
    """F5: chunk the corpus, shuffle by doc, reassemble -> tokens identical to
    the input, element-wise, for every doc."""
    import ray.data as rd

    from crossai_ts_ray import synth
    from crossai_ts_ray.sources.readers import read_token_table
    from crossai_ts_ray.util import dataset_to_table

    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    ds = read_token_table(d)
    chunks = ds.map_batches(lambda b: chunk_expand(b, 37), batch_format="pyarrow")

    def reassemble(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        order = np.argsort(g["win_id"].to_numpy(zero_copy_only=False), kind="stable")
        toks = g["wtokens"].combine_chunks()
        parts = [toks[int(i)].values.to_numpy(zero_copy_only=False) for i in order]
        full = np.concatenate(parts).astype(np.int32)
        return pa.table(
            {
                "doc_id": g["doc_id"][:1],
                "tokens": pa.ListArray.from_arrays(
                    pa.array([0, len(full)], pa.int32()), pa.array(full, pa.int32())
                ),
            }
        )

    rebuilt = dataset_to_table(
        chunks.groupby("doc_id").map_groups(reassemble, batch_format="pyarrow")
    )
    orig = synth.read_all(d).select(["doc_id", "tokens"])
    want = {r["doc_id"]: r["tokens"] for r in orig.to_pylist()}
    got = {r["doc_id"]: r["tokens"] for r in rebuilt.to_pylist()}
    assert set(want) == set(got)
    assert all(want[k] == got[k] for k in want), "token-array equality violated"


def test_window_counts_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        n=st.integers(0, 5000),
        window=st.integers(1, 600),
        overlap_frac=st.floats(0.0, 0.99),
    )
    @settings(max_examples=200, deadline=None)
    def check(n, window, overlap_frac):
        overlap = int(window * overlap_frac)
        from crossai_ts_ray.stages.windows import window_counts

        got = int(window_counts(np.array([n]), window, overlap)[0])
        want = len(oracle.sliding_window_starts(n, window, overlap))
        assert got == want

    check()


def test_rolling_windows_matches_pandas():
    """rolling_windows == iterating pandas .rolling(step=, center=) exactly
    (the reference rolling_window_df's engine, windowing.py:8)."""
    import pandas as pd

    from crossai_ts_ray.stages.windows import rolling_window_df, rolling_windows

    rng = np.random.default_rng(7)
    for n in (12, 50, 501):
        for ws, step in ((4, 3), (5, 2), (16, 8), (7, 7), (10, 3)):
            for center in (False, True):
                x = rng.normal(size=n)
                df = pd.DataFrame({"a": x})
                ref = [
                    w["a"].to_numpy()
                    for w in df.rolling(window=ws, step=step, min_periods=ws,
                                        center=center)
                    if w["a"].count() >= ws
                ]
                got = rolling_windows(x, ws, step, w_center=center)
                assert len(got) == len(ref)
                assert all(np.array_equal(r, g) for r, g in zip(ref, got))
                dfs = rolling_window_df(df, ws=ws, overlap=step, w_center=center)
                assert len(dfs) == len(ref)
                assert all(
                    np.array_equal(r, g["a"].to_numpy()) for r, g in zip(ref, dfs)
                )
