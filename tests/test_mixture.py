"""Source-mixture resampling and greedy sequence packing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, rows):
    pq.write_table(
        pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_pack_sequences_greedy_semantics(ray_session, tmp_path):
    """Exact greedy contract: in-order fill, <= capacity keeps, oversized
    doc gets its own bin, next doc starts fresh after an oversized one."""
    from crossai_ts_ray.pipelines.mixture import pack_sequences

    def doc(i, n_tok):
        return {"doc_id": i, "text": " ".join(["w"] * n_tok), "source": "s"}

    # capacity 512: [300, 212] fill bin0 exactly; [600] oversized alone;
    # [200, 312] fill bin2 exactly; [5] spills to bin3
    sf = _write_docs(
        tmp_path, [doc(1, 300), doc(2, 212), doc(3, 600), doc(4, 200), doc(5, 312), doc(6, 5)]
    )
    out = (
        pack_sequences(sf).to_pandas().sort_values("bin_id").reset_index(drop=True)
    )
    assert out["bin_id"].tolist() == [0, 1, 2, 3]
    assert out["n_docs"].tolist() == [2, 1, 2, 1]
    assert out["tok_sum"].tolist() == [512, 600, 512, 5]
    assert out["first_doc"].tolist() == [1, 3, 4, 6]
    assert out["last_doc"].tolist() == [2, 3, 5, 6]
    assert out["fill_frac"].tolist() == [1.0, 600 / 512, 1.0, 5 / 512]


def test_pack_sequences_orders_by_doc_id_within_source(ray_session, tmp_path):
    from crossai_ts_ray.pipelines.mixture import pack_sequences

    rows = [
        {"doc_id": i, "text": " ".join(["w"] * 100), "source": f"s{i % 2}"}
        for i in (9, 1, 5, 3, 7, 2, 8, 4, 6)
    ]
    out = pack_sequences(_write_docs(tmp_path, rows), capacity=256).to_pandas()
    assert len(out) == 5  # s0: 4 docs -> 2 bins; s1: 5 docs -> 3 bins
    for _, g in out.groupby("source"):
        g = g.sort_values("bin_id")
        # doc spans must be contiguous and increasing across bins
        assert len(g) >= 2
        assert (g["first_doc"] <= g["last_doc"]).all()
        assert (
            np.asarray(g["first_doc"].iloc[1:]) > np.asarray(g["last_doc"].iloc[:-1])
        ).all()


def test_resample_mixture_min_source_keeps_all(ray_session):
    from crossai_ts_ray.pipelines.mixture import resample_mixture

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["source", "n_chars"])
    tot = (
        docs.to_pandas().groupby("source")["n_chars"].sum().sort_values()
    )
    out = resample_mixture(SF).to_pandas()
    kept = out.groupby("source")["n_chars"].agg(["count", "sum"])
    # the smallest source is never downsampled
    mn_src = tot.index[0]
    assert kept.loc[mn_src, "count"] == (docs["source"].to_pandas() == mn_src).sum()
    # every source's kept char mass is within sampling noise of the target
    mn = tot.min()
    for s in tot.index:
        assert kept.loc[s, "sum"] <= tot[s]
        assert abs(kept.loc[s, "sum"] - mn) < 6 * np.sqrt(float(mn)) * 40
    # deterministic: a second run keeps the identical row set
    out2 = resample_mixture(SF).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
