"""Fifth relational wave (TPC-H straggler shapes Q9/Q11/Q20/Q21):
broadcast==partitioned parity, DuckDB value parity at sf0.001, and the
EXISTS/NOT-EXISTS semantics of Q21 pinned on a hand-built fixture."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _canon(ds):
    from tools.verify_correctness import canon, to_pandas

    return canon(to_pandas(ds))


@pytest.mark.parametrize(
    "fn_name,sql_name",
    [
        ("q9_profit_by_nation_year", "Q9_SQL"),
        ("q11_important_parts", "Q11_SQL"),
        ("q20_dominant_suppliers", "Q20_SQL"),
        ("q21_waiting_suppliers", "Q21_SQL"),
    ],
)
def test_w5_broadcast_eq_partitioned_eq_oracle(ray_session, fn_name,
                                               sql_name):
    import duckdb
    import pandas.testing as pdt

    from crossai_ts_ray.pipelines import relational_w5 as w5

    fn = getattr(w5, fn_name)
    a = _canon(fn(SF, broadcast=True))
    b = _canon(fn(SF, broadcast=False))
    pdt.assert_frame_equal(a, b)  # bitwise: same kernels after the join

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders "
              "lineitem").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = _canon(con.execute(getattr(w5, sql_name)).df())
    pdt.assert_frame_equal(a, oracle, check_dtype=False)


def test_q21_exists_semantics_fixture(ray_session, tmp_path):
    """Hand-built orders/lineitem: only the sole-late supplier on a
    multi-supplier finished order qualifies; late-only orders with two
    late suppliers, single-supplier orders, and 'O' orders do not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crossai_ts_ray.pipelines.relational_w5 import q21_waiting_suppliers

    day = 86_400_000_000
    base = np.int64(1_000_000_000_000_000)  # some timestamp in us

    # orders: 1..5 status F except #5 ('O'); order date = base
    okeys = np.array([1, 2, 3, 4, 5], np.int64)
    status = ["F", "F", "F", "F", "O"]
    pq.write_table(pa.table({
        "o_orderkey": pa.array(okeys, pa.int64()),
        "o_orderdate": pa.array(np.full(5, base), pa.timestamp("us")),
        "o_orderstatus": pa.array(status, pa.string()),
    }), str(tmp_path / "orders.parquet"))

    # lineitem rows: (okey, skey, ship_offset_days)
    rows = [
        (1, 10, 90), (1, 10, 95), (1, 20, 5),   # qualifies: s10 twice late
        (2, 10, 90), (2, 20, 70),               # two late sups -> none
        (3, 10, 90),                            # single-supplier -> none
        (4, 20, 5), (4, 30, 5),                 # nobody late -> none
        (5, 10, 90), (5, 20, 5),                # order 'O' -> excluded
    ]
    ok = np.array([r[0] for r in rows], np.int64)
    sk = np.array([r[1] for r in rows], np.int64)
    ship = base + np.array([r[2] for r in rows], np.int64) * day
    pq.write_table(pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_suppkey": pa.array(sk, pa.int64()),
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))

    pq.write_table(pa.table({
        "s_suppkey": pa.array([10, 20, 30], pa.int64()),
        "s_name": pa.array(["S10", "S20", "S30"], pa.string()),
        "s_nationkey": pa.array([7, 7, 7], pa.int64()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([7], pa.int64()),
        "n_name": pa.array(["NATION_7"], pa.string()),
        "n_regionkey": pa.array([0], pa.int64()),
    }), str(tmp_path / "nation.parquet"))

    got = _canon(q21_waiting_suppliers(str(tmp_path), nation="NATION_7",
                                       buckets=3))
    want = pd.DataFrame({"numwait": [2], "s_name": ["S10"]})
    assert got.reset_index(drop=True).to_dict("list") == \
        want.to_dict("list")


def test_q20_more_than_half_boundary(ray_session, tmp_path):
    """Exactly-half does NOT qualify (strict >); 2/3 does."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crossai_ts_ray.pipelines.relational_w5 import q20_dominant_suppliers

    ship = np.datetime64("1996-06-01T00:00:00.000000").astype(np.int64)
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_name": pa.array(["red bolt", "red gear"], pa.string()),
        "p_retailprice": pa.array([1.0, 1.0], pa.float64()),
    }), str(tmp_path / "part.parquet"))
    # part 1: s10 ships 5 of 10 (exactly half -> no);
    # part 2: s20 ships 2 of 3 (> half -> yes)
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_suppkey": pa.array([10, 20, 20, 30], pa.int64()),
        "l_quantity": pa.array([5.0, 5.0, 2.0, 1.0], pa.float64()),
        "l_shipdate": pa.array(np.full(4, ship), pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([10, 20, 30], pa.int64()),
        "s_name": pa.array(["S10", "S20", "S30"], pa.string()),
    }), str(tmp_path / "supplier.parquet"))

    got = _canon(q20_dominant_suppliers(str(tmp_path), buckets=2))
    assert got["s_suppkey"].tolist() == [20]
