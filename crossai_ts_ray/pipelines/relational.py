"""Relational operator coverage over the TPC-H-ish tables: grouped
aggregates, broadcast hash joins, top-k, distinct counting.

Money arithmetic is decimal-exact: doubles are converted to int64
micro-units (``rint(x * 1e6)``) before summation, so distributed sums are
order-insensitive integers and match the DuckDB oracle exactly with no
rounding bridge (the oracle SQL mirrors the same conversion).

Joins follow the broadcast pattern (SURVEY.md §2.6): the small side is
``ray.put`` once and mapped per batch -- no shuffle.  The reference's closest
join-like op is interval matching against a small ground-truth table
(/root/reference/caits/performance/detection.py:98-160), same shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

MICRO = 1_000_000.0


def _micros(x: np.ndarray) -> np.ndarray:
    return np.rint(x * MICRO).astype(np.int64)


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape over lineitem (groupby aggregate, no join)."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate",
        ],
    )
    cutoff = np.datetime64("1998-09-02T00:00:00.000000")

    def partial(t: pa.Table) -> pd.DataFrame:
        t = t.combine_chunks()
        ship = t["l_shipdate"].to_numpy(zero_copy_only=False)
        m = ship <= cutoff
        df = pd.DataFrame(
            {
                "l_returnflag": np.asarray(t["l_returnflag"].to_pylist(), dtype=object)[m],
                "l_linestatus": np.asarray(t["l_linestatus"].to_pylist(), dtype=object)[m],
            }
        )
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)[m]
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        disc = t["l_discount"].to_numpy(zero_copy_only=False)[m]
        df["qty_u"] = _micros(qty)
        df["price_u"] = _micros(ep)
        df["disc_u"] = _micros(ep * (1.0 - disc))
        df["charge_u"] = _micros(ep * (1.0 - disc) * (1.0 + t["l_tax"].to_numpy(zero_copy_only=False)[m]))
        df["n"] = 1
        return df.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()

    parts = ds.map_batches(partial, batch_format="pyarrow")
    merged = parts.groupby(["l_returnflag", "l_linestatus"]).map_groups(
        lambda g: g.sum(numeric_only=True).to_frame().T.assign(
            l_returnflag=g["l_returnflag"].iloc[0], l_linestatus=g["l_linestatus"].iloc[0]
        ),
        batch_format="pandas",
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": g["l_returnflag"],
                "l_linestatus": g["l_linestatus"],
                "sum_qty": g["qty_u"] / MICRO,
                "sum_base_price": g["price_u"] / MICRO,
                "sum_disc_price": g["disc_u"] / MICRO,
                "sum_charge": g["charge_u"] / MICRO,
                "count_order": g["n"].astype(np.int64),
            }
        )

    return merged.map_batches(final, batch_format="pandas")


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       SUM(CAST(round(l_quantity * 1000000, 0) AS BIGINT)) / 1000000.0 AS sum_qty,
       SUM(CAST(round(l_extendedprice * 1000000, 0) AS BIGINT)) / 1000000.0 AS sum_base_price,
       SUM(CAST(round(l_extendedprice * (1 - l_discount) * 1000000, 0) AS BIGINT)) / 1000000.0 AS sum_disc_price,
       SUM(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000, 0) AS BIGINT)) / 1000000.0 AS sum_charge,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def top_customers(sf_dir: str, k: int = 10):
    """Broadcast join orders->customer + grouped sum + global top-k."""
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    cust_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_name"])))
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "c_custkey": t["o_custkey"].to_numpy(zero_copy_only=False),
                "rev_u": _micros(t["o_totalprice"].to_numpy(zero_copy_only=False)),
            }
        )
        return df.groupby("c_custkey", as_index=False).sum()

    parts = orders.map_batches(partial, batch_format="pyarrow")

    def merge_partition(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("c_custkey", as_index=False)["rev_u"].sum()

    keyed = parts.map_batches(
        lambda t: t.append_column(
            "prt",
            __import__("pyarrow").array(
                (t["c_custkey"].to_numpy(zero_copy_only=False) % 8).astype("int64")
            ),
        ),
        batch_format="pyarrow",
    )
    per_cust = keyed.groupby("prt").map_groups(
        lambda df: merge_partition(df.drop(columns=["prt"])), batch_format="pandas"
    )
    topk = per_cust.sort(["rev_u", "c_custkey"], descending=[True, False]).limit(k)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        names = ray.get(cust_ref)
        return pd.DataFrame(
            {
                "c_custkey": df["c_custkey"].astype(np.int64),
                "c_name": df["c_custkey"].map(names),
                "revenue": df["rev_u"] / MICRO,
            }
        )

    return topk.map_batches(attach, batch_format="pandas")


TOP_CUSTOMERS_SQL = """
SELECT o.o_custkey::BIGINT AS c_custkey, any_value(c.c_name) AS c_name,
       SUM(CAST(round(o.o_totalprice * 1000000, 0) AS BIGINT)) / 1000000.0 AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY o.o_custkey
ORDER BY SUM(CAST(round(o.o_totalprice * 1000000, 0) AS BIGINT)) DESC, o.o_custkey
LIMIT 10
"""


def revenue_by_nation(sf_dir: str):
    """Two-hop broadcast join: orders -> customer -> nation, grouped sum."""
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nk = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    nname = dict(zip(nation["n_nationkey"], nation["n_name"]))
    cust_to_nation = {ck: nname[nkey] for ck, nkey in nk.items()}
    ref = ray.put(cust_to_nation)
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        lookup = ray.get(ref)
        df = pd.DataFrame(
            {
                "n_name": pd.Series(
                    t["o_custkey"].to_numpy(zero_copy_only=False)
                ).map(lookup),
                "rev_u": _micros(t["o_totalprice"].to_numpy(zero_copy_only=False)),
                "n": 1,
            }
        )
        return df.groupby("n_name", as_index=False).sum()

    parts = orders.map_batches(partial, batch_format="pyarrow")
    return parts.groupby("n_name").map_groups(
        lambda g: pd.DataFrame(
            {
                "n_name": [g["n_name"].iloc[0]],
                "revenue": [g["rev_u"].sum() / MICRO],
                "orders": [np.int64(g["n"].sum())],
            }
        ),
        batch_format="pandas",
    )


REVENUE_BY_NATION_SQL = """
SELECT n.n_name,
       SUM(CAST(round(o.o_totalprice * 1000000, 0) AS BIGINT)) / 1000000.0 AS revenue,
       count(*)::BIGINT AS orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def order_lineitem_join(sf_dir: str, buckets: int = 16):
    """Large-large partitioned hash join: orders |X| lineitem on orderkey.

    Neither side is broadcast: both are bucketed by ``hash(key) % B`` (a
    plain column + one keyed shuffle each, unioned), then joined pairwise
    inside each bucket with pandas -- the explicit partitioned hash join
    for when no side fits in memory (SURVEY.md §2.6 / ray guide pattern;
    skew handling = salt hot keys into sub-buckets, not needed for
    orderkeys which are unique on the build side)."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    items = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def tag_orders(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "side": pa.array(np.zeros(len(k), np.int8), pa.int8()),
                "total_u": pa.array(
                    _micros(t["o_totalprice"].to_numpy(zero_copy_only=False)), pa.int64()
                ),
                "rev_u": pa.array(np.zeros(len(k), np.int64), pa.int64()),
                "n": pa.array(np.zeros(len(k), np.int64), pa.int64()),
                "prt": pa.array((k % buckets).astype(np.int64), pa.int64()),
            }
        )

    def tag_items(t: pa.Table) -> pa.Table:
        """Pre-aggregate the probe side per key per batch (combiner)."""
        t = t.combine_chunks()
        k = t["l_orderkey"].to_numpy(zero_copy_only=False)
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"key": k, "rev_u": _micros(ep * (1.0 - disc)), "n": 1})
        agg = df.groupby("key", as_index=False).sum()
        m = len(agg)
        return pa.table(
            {
                "key": pa.array(agg["key"].to_numpy(), pa.int64()),
                "side": pa.array(np.ones(m, np.int8), pa.int8()),
                "total_u": pa.array(np.zeros(m, np.int64), pa.int64()),
                "rev_u": pa.array(agg["rev_u"].to_numpy(), pa.int64()),
                "n": pa.array(agg["n"].to_numpy().astype(np.int64), pa.int64()),
                "prt": pa.array((agg["key"].to_numpy() % buckets).astype(np.int64), pa.int64()),
            }
        )

    both = orders.map_batches(tag_orders, batch_format="pyarrow").union(
        items.map_batches(tag_items, batch_format="pyarrow")
    )

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["side"] == 0][["key", "total_u"]]
        right = (
            df[df["side"] == 1]
            .groupby("key", as_index=False)[["rev_u", "n"]]
            .sum()
        )
        j = left.merge(right, on="key", how="inner")
        return pd.DataFrame(
            {
                "o_orderkey": j["key"].astype(np.int64),
                "o_totalprice": j["total_u"] / MICRO,
                "revenue": j["rev_u"] / MICRO,
                "items": j["n"].astype(np.int64),
            }
        )

    return both.groupby("prt").map_groups(
        lambda df: join_bucket(df.drop(columns=["prt"])), batch_format="pandas"
    )


ORDER_LINEITEM_JOIN_SQL = """
SELECT o.o_orderkey,
       CAST(round(any_value(o.o_totalprice) * 1000000, 0) AS BIGINT) / 1000000.0 AS o_totalprice,
       SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000, 0) AS BIGINT)) / 1000000.0 AS revenue,
       count(*)::BIGINT AS items
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderkey
"""


def brand_type_distinct(sf_dir: str):
    """Distinct counting: per p_type, count of distinct brands + parts."""
    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_type", "p_brand"])

    def pairs(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "p_type": t["p_type"].to_pylist(),
                "p_brand": t["p_brand"].to_pylist(),
                "n": 1,
            }
        )
        return df.groupby(["p_type", "p_brand"], as_index=False).sum()

    parts = ds.map_batches(pairs, batch_format="pyarrow")
    return parts.groupby("p_type").map_groups(
        lambda g: pd.DataFrame(
            {
                "p_type": [g["p_type"].iloc[0]],
                "brands": [np.int64(g["p_brand"].nunique())],
                "parts": [np.int64(g["n"].sum())],
            }
        ),
        batch_format="pandas",
    )


BRAND_TYPE_SQL = """
SELECT p_type, count(DISTINCT p_brand)::BIGINT AS brands, count(*)::BIGINT AS parts
FROM part GROUP BY p_type
"""
