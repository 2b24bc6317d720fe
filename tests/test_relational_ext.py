"""Targeted tests for the second relational wave: the LEFT-join null branch
(testdata has no order-less customers, so the driver oracle can't reach it)
and bucket invariance for the semi-join."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _mini_pair(tmp_path):
    """5 customers, orders for only 3 of them (c2/c4 order-less)."""
    d = str(tmp_path / "mini")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "c_name": pa.array([f"Customer#{i}" for i in range(1, 6)]),
            }
        ),
        f"{d}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([1, 1, 3, 5, 5, 5], pa.int64()),
                "o_totalprice": pa.array(
                    [10.5, 20.25, 7.0, 1.125, 2.0, 3.5], pa.float64()
                ),
            }
        ),
        f"{d}/orders.parquet",
    )
    return d


def test_left_join_keeps_orderless_customers(ray_session, tmp_path):
    from crossai_ts_ray.pipelines.relational_ext import customer_order_counts
    from tools.verify_correctness import canon, to_pandas

    d = _mini_pair(tmp_path)
    got = canon(to_pandas(customer_order_counts(d, buckets=3)))
    assert len(got) == 5
    by_key = got.set_index("c_custkey")
    assert by_key.loc[2, "order_count"] == 0
    assert by_key.loc[2, "revenue"] == 0.0
    assert by_key.loc[4, "order_count"] == 0
    assert by_key.loc[1, "order_count"] == 2
    assert abs(by_key.loc[1, "revenue"] - 30.75) < 1e-9
    assert by_key.loc[5, "order_count"] == 3
    assert abs(by_key.loc[5, "revenue"] - 6.625) < 1e-9


def test_q4_bucket_invariance(ray_session):
    from crossai_ts_ray.pipelines.relational_ext import q4_order_priority
    from tools.verify_correctness import canon, to_pandas

    a = canon(to_pandas(q4_order_priority(SF, buckets=1)))
    b = canon(to_pandas(q4_order_priority(SF, buckets=17)))
    assert a.equals(b)
    assert (a["order_count"] > 0).all()


def test_q18_threshold_monotone(ray_session):
    from crossai_ts_ray.pipelines.relational_ext import q18_large_orders
    from tools.verify_correctness import to_pandas

    lo = to_pandas(q18_large_orders(SF, qty_threshold=150.0))
    hi = to_pandas(q18_large_orders(SF, qty_threshold=250.0))
    assert len(hi) <= len(lo)
    assert set(hi["o_orderkey"]) <= set(lo["o_orderkey"])
    assert (hi["sum_qty"] > 250.0).all()


def test_full_outer_join_matches_pandas(ray_session):
    """keyed_equijoin(how='full') == pandas outer merge on a fixture with
    left-only, right-only, matched, and duplicate keys; salt>1 rejected."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from crossai_ts_ray.stages.joins import keyed_equijoin

    lt = pa.table({"k": pa.array([1, 2, 2, 5], pa.int64()),
                   "lv": pa.array([10, 20, 21, 50], pa.int64())})
    rt = pa.table({"k2": pa.array([2, 3, 3, 5], pa.int64()),
                   "rv": pa.array([200, 300, 301, 500], pa.int64())})
    got = (
        keyed_equijoin(rd.from_arrow(lt), rd.from_arrow(rt),
                       on=("k", "k2"), buckets=4, how="full",
                       schemas=(lt.schema, rt.schema))
        .to_pandas()
    )
    exp = lt.to_pandas().merge(
        rt.to_pandas(), left_on="k", right_on="k2", how="outer"
    )[["k", "lv", "rv"]]

    def canon(df):
        return (
            df.assign(key=df["k"].fillna(df["rv"] // 100 if "rv" in df else -1))
            .sort_values(["lv", "rv"], na_position="last")
            .reset_index(drop=True)[["k", "lv", "rv"]]
        )

    pd.testing.assert_frame_equal(
        canon(got).astype("float64"), canon(exp).astype("float64")
    )
    # unmatched survive on BOTH sides
    assert got["lv"].isna().sum() == 2   # right-only k=3 twice
    assert got["rv"].isna().sum() == 1   # left-only k=1
    with pytest.raises(ValueError):
        keyed_equijoin(rd.from_arrow(lt), rd.from_arrow(rt),
                       on=("k", "k2"), how="full", salt=4,
                       schemas=(lt.schema, rt.schema))
