"""Wave-4 relational shapes: partition invariance, the Q16 broadcast /
partitioned-join parity, and DuckDB value parity at sf0.001."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _canon(ds):
    from tools.verify_correctness import canon, to_pandas

    return canon(to_pandas(ds))


def test_q15_bucket_invariance_and_semantics(ray_session):
    import duckdb

    from crossai_ts_ray.pipelines.relational_w4 import q15_top_supplier

    a = _canon(q15_top_supplier(SF, buckets=1))
    b = _canon(q15_top_supplier(SF, buckets=23))
    assert a.equals(b)
    # every returned supplier carries the same (maximal) revenue
    assert a["total_revenue"].nunique() == 1
    con = duckdb.connect()
    mx = con.execute(
        f"""SELECT max(r) FROM (
              SELECT SUM(CAST(round(l_extendedprice * (1 - l_discount)
                   * 1000000, 0) AS BIGINT)) / 1000000.0 AS r
              FROM '{SF}/lineitem.parquet'
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1996-04-01'
              GROUP BY l_suppkey)"""
    ).fetchone()[0]
    assert float(a["total_revenue"].iloc[0]) == float(mx)


def test_q16_broadcast_equals_partitioned(ray_session):
    from crossai_ts_ray.pipelines.relational_w4 import part_supplier_variety

    a = _canon(part_supplier_variety(SF, buckets=7, broadcast=True))
    b = _canon(part_supplier_variety(SF, buckets=7, broadcast=False))
    assert a.equals(b)
    c = _canon(part_supplier_variety(SF, buckets=1, broadcast=True))
    assert a.equals(c)


def test_q2_bucket_invariance_and_tiebreak(ray_session):
    import duckdb

    from crossai_ts_ray.pipelines.relational_w4 import q2_min_price_supplier

    a = _canon(q2_min_price_supplier(SF, buckets=1))
    b = _canon(q2_min_price_supplier(SF, buckets=29))
    assert a.equals(b)
    con = duckdb.connect()
    n_parts = con.execute(
        f"SELECT count(DISTINCT l_partkey) FROM '{SF}/lineitem.parquet'"
    ).fetchone()[0]
    assert len(a) == n_parts


def test_w4_duckdb_gate(ray_session):
    import duckdb
    import pandas.testing as pdt

    import __ray_entry__ as E

    qs = E.queries()
    sql = E.oracle_sql()
    con = duckdb.connect()
    for t in (
        "events region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    for name in (
        "q15_top_supplier", "part_supplier_variety", "q2_min_price_supplier"
    ):
        mine = _canon(qs[name](SF))
        oracle = _canon(con.execute(sql[name]).df())
        assert mine.shape == oracle.shape, name
        pdt.assert_frame_equal(mine, oracle, check_dtype=False)


def test_q15_empty_window_returns_empty(ray_session, tmp_path):
    """No shipments in the window -> empty result, not an IndexError."""
    import shutil

    import pandas as pd

    from crossai_ts_ray.pipelines.relational_w4 import q15_top_supplier

    d = tmp_path / "sf"
    d.mkdir()
    for t in ("supplier",):
        shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li = li[li["l_shipdate"] < pd.Timestamp("1995-06-01")]
    li.to_parquet(d / "lineitem.parquet", index=False)
    out = _canon(q15_top_supplier(str(d), buckets=4))
    assert len(out) == 0


def test_q16_all_parts_filtered_returns_empty(ray_session, tmp_path):
    import shutil

    import pandas as pd

    from crossai_ts_ray.pipelines.relational_w4 import part_supplier_variety

    d = tmp_path / "sf"
    d.mkdir()
    shutil.copy(f"{SF}/lineitem.parquet", d / "lineitem.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")
    part["p_type"] = "MEDIUM"  # the exclusion filter drops every part
    part.to_parquet(d / "part.parquet", index=False)
    out = _canon(part_supplier_variety(str(d), buckets=4, broadcast=True))
    assert len(out) == 0
