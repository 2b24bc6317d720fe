"""Regression tests for the round-3 ADVICE findings: empty-survivor batches
in filtered combiners, guarded FK lookups, and SQL-compatible NaN ordering
in the grouped argmax."""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")


def _write(tmp, name, df):
    df.to_parquet(os.path.join(tmp, f"{name}.parquet"), index=False)


@pytest.fixture()
def tiny_tpch(tmp_path):
    """Tiny TPC-H-ish dir where the q3 item filter keeps ZERO lineitem rows
    (all shipdates before the cutoff, as a date-clustered file would yield)."""
    d = str(tmp_path)
    _write(d, "customer", pd.DataFrame({
        "c_custkey": [1, 2, 3],
        "c_name": ["a", "b", "c"],
        "c_nationkey": np.array([0, 1, 1], np.int32),
        "c_acctbal": [1.0, 2.0, 3.0],
        "c_mktsegment": ["BUILDING", "AUTOMOBILE", "BUILDING"],
    }))
    _write(d, "nation", pd.DataFrame({
        "n_nationkey": np.array([0, 1], np.int32),
        "n_name": ["ALGERIA", "BRAZIL"],
        "n_regionkey": np.array([0, 1], np.int32),
    }))
    _write(d, "orders", pd.DataFrame({
        "o_orderkey": [10, 11, 12],
        "o_custkey": [1, 3, 2],
        "o_orderstatus": ["O"] * 3,
        "o_totalprice": [100.0, 200.0, 300.0],
        "o_orderdate": pd.to_datetime(["1997-01-01", "1997-06-01", "1997-03-01"]),
        "o_orderpriority": ["1-URGENT"] * 3,
    }))
    _write(d, "lineitem", pd.DataFrame({
        "l_orderkey": [10, 11, 12],
        "l_partkey": [1, 2, 3],
        "l_suppkey": [1, 2, 3],
        "l_linenumber": np.array([1, 1, 1], np.int32),
        "l_quantity": [1.0, 2.0, 3.0],
        "l_extendedprice": [10.0, 20.0, 30.0],
        "l_discount": [0.0, 0.1, 0.2],
        "l_tax": [0.0, 0.0, 0.0],
        "l_returnflag": ["N"] * 3,
        "l_linestatus": ["O"] * 3,
        # ALL before the 1998-06-01 cutoff -> every tag_items batch empty
        "l_shipdate": pd.to_datetime(["1995-01-01", "1995-02-01", "1995-03-01"]),
    }))
    return d


def test_q3_zero_survivor_batches(ray_session, tiny_tpch):
    """A lineitem batch where the shipdate filter keeps nothing must not
    crash the per-batch combiner (ADVICE r3: _sum_by_key empty guard)."""
    from crossai_ts_ray.pipelines.relational import q3_shipping_priority

    out = q3_shipping_priority(tiny_tpch, k=10, buckets=4).to_pandas()
    assert len(out) == 0  # no item survives the filter -> empty join result


def test_revenue_by_nation_dirty_fk_fails_loudly(ray_session, tmp_path):
    """An o_custkey absent from customer must raise, not silently attribute
    revenue to the next customer's nation (ADVICE r3)."""
    d = str(tmp_path)
    _write(d, "customer", pd.DataFrame({
        "c_custkey": [1, 2],
        "c_nationkey": np.array([0, 1], np.int32),
    }))
    _write(d, "nation", pd.DataFrame({
        "n_nationkey": np.array([0, 1], np.int32),
        "n_name": ["ALGERIA", "BRAZIL"],
    }))
    _write(d, "orders", pd.DataFrame({
        "o_custkey": [1, 2, 99],  # 99 not in customer
        "o_totalprice": [10.0, 20.0, 30.0],
    }))
    from crossai_ts_ray.pipelines.relational import revenue_by_nation

    with pytest.raises(Exception, match="o_custkey not in customer"):
        revenue_by_nation(d).to_pandas()


def _top_event_vs_duckdb(d):
    import duckdb

    from crossai_ts_ray.pipelines.events_pipeline import (
        USER_TOP_EVENT_SQL,
        user_top_event,
    )

    got = (
        user_top_event(d, buckets=2)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    want = (
        con.execute(USER_TOP_EVENT_SQL).df()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert got["user_id"].tolist() == want["user_id"].tolist()
    return got


_EV = pd.DataFrame({
    "event_id": [1, 2, 3, 4, 5, 6],
    "ts": pd.to_datetime([
        "2024-01-01 00:00:00", "2024-01-01 01:00:00",
        "2024-01-01 00:30:00", "2024-01-01 02:00:00",
        "2024-01-01 00:10:00", "2024-01-01 00:20:00",
    ]),
    "user_id": [7, 7, 7, 8, 8, 9],
    "event_type": ["x"] * 6,
    # user 7: event 2 is NaN/NULL; user 8: plain max; user 9: -0.0 only row
    "value": [5.0, np.nan, 2.0, 4.0, 9.0, -0.0],
    "props": [""] * 6,
})


def test_user_top_event_null_matches_duckdb(ray_session, tmp_path):
    """pandas NaN -> Parquet NULL: SQL ORDER BY value DESC puts NULL last
    (DuckDB nulls_last default), so user 7's top is 5.0, not the NULL."""
    d = str(tmp_path)
    _write(d, "events", _EV)
    got = _top_event_vs_duckdb(d)
    assert got.loc[got["user_id"] == 7, "event_id"].item() == 1


def test_user_top_event_true_nan_matches_duckdb(ray_session, tmp_path):
    """A TRUE (non-null) Arrow NaN sorts FIRST under ORDER BY value DESC
    (NaN > every double in DuckDB's float total order)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    t = pa.Table.from_pandas(_EV, preserve_index=False)
    vals = _EV["value"].to_numpy()
    t = t.set_column(
        t.schema.get_field_index("value"),
        "value",
        pa.array(vals, pa.float64()),  # no null mask: NaN stays NaN
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    got = _top_event_vs_duckdb(d)
    assert got.loc[got["user_id"] == 7, "event_id"].item() == 2


def test_user_top_event_empty_batch(ray_session, tmp_path):
    """Empty events table flows through the argmax without IndexError."""
    d = str(tmp_path)
    ev = pd.DataFrame({
        "event_id": pd.array([], dtype="int64"),
        "ts": pd.to_datetime(pd.Series([], dtype="object")),
        "user_id": pd.array([], dtype="int64"),
        "event_type": pd.Series([], dtype="string"),
        "value": pd.array([], dtype="float64"),
        "props": pd.Series([], dtype="string"),
    })
    _write(d, "events", ev)
    from crossai_ts_ray.pipelines.events_pipeline import user_top_event

    assert len(user_top_event(d, buckets=2).to_pandas()) == 0
