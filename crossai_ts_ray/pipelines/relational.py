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

from ..sources.readers import read_parquet_sized

MICRO = 1_000_000.0


def _micros(x: np.ndarray) -> np.ndarray:
    return np.rint(x * MICRO).astype(np.int64)


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape over lineitem (groupby aggregate, no join)."""
    ds = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate",
        ],
    )
    cutoff = np.datetime64("1998-09-02T00:00:00.000000")

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        ship = t["l_shipdate"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ship <= cutoff))
        # group keys: dictionary-encode both strings (Arrow C++), combine the
        # codes; <= a handful of (flag, status) combos per batch
        rf = t["l_returnflag"].combine_chunks().dictionary_encode()
        ls = t["l_linestatus"].combine_chunks().dictionary_encode()
        rf_c = rf.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ls_c = ls.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nls = len(ls.dictionary)
        combined = rf_c * nls + ls_c
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        tax = t["l_tax"].to_numpy(zero_copy_only=False)
        measures = [
            _micros(qty),
            _micros(ep),
            _micros(ep * (1.0 - disc)),
            _micros(ep * (1.0 - disc) * (1.0 + tax)),
        ]
        if not len(combined):  # date-clustered file: filter kept nothing
            return pa.table(
                {
                    "l_returnflag": pa.nulls(0, pa.string()),
                    "l_linestatus": pa.nulls(0, pa.string()),
                    "qty_u": pa.nulls(0, pa.int64()),
                    "price_u": pa.nulls(0, pa.int64()),
                    "disc_u": pa.nulls(0, pa.int64()),
                    "charge_u": pa.nulls(0, pa.int64()),
                    "n": pa.nulls(0, pa.int64()),
                }
            )
        # exact int64 sums per group (bincount's float weights would round
        # above 2^53): one lexsort + segment reduceat, no per-group loop
        order = np.argsort(combined, kind="stable")
        cs = combined[order]
        starts = np.flatnonzero(np.concatenate(([True], cs[1:] != cs[:-1])))
        codes = cs[starts]
        counts = np.diff(np.append(starts, len(cs)))
        sums = np.stack(
            [np.add.reduceat(v[order], starts) for v in measures], axis=1
        ) if len(starts) else np.empty((0, 4), np.int64)
        rf_vals = rf.dictionary.take(pa.array(codes // nls))
        ls_vals = ls.dictionary.take(pa.array(codes % nls))
        return pa.table(
            {
                "l_returnflag": rf_vals,
                "l_linestatus": ls_vals,
                "qty_u": pa.array(sums[:, 0], pa.int64()),
                "price_u": pa.array(sums[:, 1], pa.int64()),
                "disc_u": pa.array(sums[:, 2], pa.int64()),
                "charge_u": pa.array(sums[:, 3], pa.int64()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def merge_final(g: pa.Table) -> pa.Table:
        # one (flag, status) group of int64 partials -> one output row,
        # Arrow-native (a handful of groups exist by construction)
        g = g.combine_chunks()

        def _s(c):
            return int(g[c].to_numpy(zero_copy_only=False).sum())

        return pa.table(
            {
                "l_returnflag": g["l_returnflag"][:1].cast(pa.string()),
                "l_linestatus": g["l_linestatus"][:1].cast(pa.string()),
                "sum_qty": pa.array([_s("qty_u") / MICRO], pa.float64()),
                "sum_base_price": pa.array([_s("price_u") / MICRO], pa.float64()),
                "sum_disc_price": pa.array([_s("disc_u") / MICRO], pa.float64()),
                "sum_charge": pa.array([_s("charge_u") / MICRO], pa.float64()),
                "count_order": pa.array([_s("n")], pa.int64()),
            }
        )

    return parts.groupby(["l_returnflag", "l_linestatus"]).map_groups(
        merge_final, batch_format="pyarrow"
    )


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


def _fits_broadcast(path: str, limit: int | None = None) -> bool:
    """Stat-based guard for the broadcast-dimension pattern: a 'dimension'
    is only broadcastable while its file is actually small (TPC-H sf100
    customer is ~15M rows -- GB-scale, NOT a broadcast).  Callers fall back
    to the partitioned join when this returns False (VERDICT r3 item 5)."""
    import os

    from ..sources.readers import SMALL_TABLE_BYTES

    limit = SMALL_TABLE_BYTES if limit is None else limit
    try:
        return os.path.getsize(path) < limit
    except OSError:
        return False


def top_customers(sf_dir: str, k: int = 10, broadcast: bool | None = None):
    """Grouped sum over orders + global top-k, then customer-name attach:
    broadcast map when the customer dimension is small, partitioned
    equijoin of the k-row result against customer otherwise."""
    if broadcast is None:
        broadcast = _fits_broadcast(f"{sf_dir}/customer.parquet")
    if broadcast:
        cust = pd.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
        )
        cust_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_name"])))
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def _sum_by_key(keys: np.ndarray, vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        if not len(keys):  # empty batch / filter kept nothing
            return keys, vals
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        return ks[starts], np.add.reduceat(vals[order], starts)

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        uk, sums = _sum_by_key(
            t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64),
            _micros(t["o_totalprice"].to_numpy(zero_copy_only=False)),
        )
        return pa.table(
            {
                "c_custkey": pa.array(uk, pa.int64()),
                "rev_u": pa.array(sums, pa.int64()),
                "prt": pa.array(uk % 8, pa.int64()),
            }
        )

    # 1M-row combiner batches: partial emits one row per custkey per
    # batch, so batch rows must dwarf key cardinality (see
    # events_pipeline.hourly_rollup)
    parts = orders.map_batches(
        partial, batch_format="pyarrow", batch_size=1_048_576
    )

    def merge_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        uk, sums = _sum_by_key(
            t["c_custkey"].to_numpy(zero_copy_only=False),
            t["rev_u"].to_numpy(zero_copy_only=False),
        )
        # per-partition top-k prune with the SAME tiebreak as the global
        # sort (rev desc, custkey asc): only k candidates per partition
        # reach the global sort
        if len(uk) > k:
            idx = np.lexsort((uk, -sums))[:k]
            uk, sums = uk[idx], sums[idx]
        return pa.table(
            {"c_custkey": pa.array(uk, pa.int64()), "rev_u": pa.array(sums, pa.int64())}
        )

    per_cust = parts.groupby("prt").map_groups(
        lambda t: merge_partition(t.drop_columns(["prt"])), batch_format="pyarrow"
    )
    topk = per_cust.sort(["rev_u", "c_custkey"], descending=[True, False]).limit(k)

    if broadcast:

        def attach(t: pa.Table) -> pa.Table:
            names = ray.get(cust_ref)
            t = t.combine_chunks()
            keys = t["c_custkey"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "c_custkey": pa.array(keys, pa.int64()),
                    "c_name": pa.array([names[k] for k in keys], pa.string()),
                    "revenue": pa.array(
                        t["rev_u"].to_numpy(zero_copy_only=False) / MICRO,
                        pa.float64(),
                    ),
                }
            )

        return topk.map_batches(attach, batch_format="pyarrow")

    # fallback: the k-row result joins the (too-big-to-broadcast) customer
    # dimension through the generic partitioned hash join
    from ..stages.joins import keyed_equijoin

    cust_ds = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    joined = keyed_equijoin(
        topk,
        cust_ds,
        on=("c_custkey", "c_custkey"),
        buckets=32,
        schemas=(
            pa.schema([("c_custkey", pa.int64()), ("rev_u", pa.int64())]),
            pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string())]),
        ),
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        return pa.table(
            {
                "c_custkey": t["c_custkey"].cast(pa.int64()),
                "c_name": t["c_name"],
                "revenue": pa.array(
                    t["rev_u"].to_numpy(zero_copy_only=False) / MICRO, pa.float64()
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


TOP_CUSTOMERS_SQL = """
SELECT o.o_custkey::BIGINT AS c_custkey, any_value(c.c_name) AS c_name,
       SUM(CAST(round(o.o_totalprice * 1000000, 0) AS BIGINT)) / 1000000.0 AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY o.o_custkey
ORDER BY SUM(CAST(round(o.o_totalprice * 1000000, 0) AS BIGINT)) DESC, o.o_custkey
LIMIT 10
"""


def revenue_by_nation(sf_dir: str, broadcast: bool | None = None):
    """Two-hop join: orders -> customer -> nation, grouped sum.  The
    customer hop broadcasts a sorted custkey->nationkey map when the
    dimension is small, else it becomes a partitioned equijoin; nation (a
    few dozen rows by construction) always broadcasts."""
    if broadcast is None:
        broadcast = _fits_broadcast(f"{sf_dir}/customer.parquet")
    nation = pd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    n_names = dict(zip(nation["n_nationkey"].astype(np.int64), nation["n_name"]))
    max_nat = int(nation["n_nationkey"].max()) + 1

    def _agg_by_nation(nidx: np.ndarray, rev: np.ndarray) -> pa.Table:
        acc = np.zeros(max_nat, dtype=np.int64)
        np.add.at(acc, nidx, rev)  # exact int64 accumulation
        cnt = np.bincount(nidx, minlength=max_nat)
        seen = np.flatnonzero(cnt)
        return pa.table(
            {
                "nat": pa.array(seen, pa.int64()),
                "rev_u": pa.array(acc[seen], pa.int64()),
                "n": pa.array(cnt[seen].astype(np.int64), pa.int64()),
            }
        )

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    if broadcast:
        cust = pd.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        # broadcast the custkey -> nationkey map as two sorted numpy arrays
        # (vectorized searchsorted lookup per batch -- no per-row dict hits)
        ck = cust["c_custkey"].to_numpy().astype(np.int64)
        order = np.argsort(ck, kind="stable")
        ck_sorted = ck[order]
        nat_of_cust = cust["c_nationkey"].to_numpy().astype(np.int64)[order]
        ref = ray.put((ck_sorted, nat_of_cust))

        def partial(t: pa.Table) -> pa.Table:
            cks, nat = ray.get(ref)
            t = t.combine_chunks()
            keys = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            # guarded membership lookup: a custkey absent from customer must
            # fail loudly, not silently attribute revenue to the next nation
            pos = np.searchsorted(cks, keys)
            hit = (pos < len(cks)) & (cks[np.minimum(pos, len(cks) - 1)] == keys)
            if not hit.all():
                bad = keys[~hit][:5]
                raise ValueError(f"orders.o_custkey not in customer: {bad.tolist()}")
            rev = _micros(t["o_totalprice"].to_numpy(zero_copy_only=False))
            return _agg_by_nation(nat[pos], rev)

        parts = orders.map_batches(partial, batch_format="pyarrow")
    else:
        # fallback: fact-dimension partitioned equijoin, then the same
        # per-batch nation combiner over the joined stream
        from ..stages.joins import keyed_equijoin

        cust_ds = read_parquet_sized(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        joined = keyed_equijoin(
            orders,
            cust_ds,
            on=("o_custkey", "c_custkey"),
            buckets=32,
            schemas=(
                pa.schema([("o_custkey", pa.int64()), ("o_totalprice", pa.float64())]),
                pa.schema([("c_custkey", pa.int64()), ("c_nationkey", pa.int32())]),
            ),
        )

        def partial_joined(t: pa.Table) -> pa.Table:
            t = t.combine_chunks()
            if t.num_rows == 0:
                return _agg_by_nation(
                    np.zeros(0, np.int64), np.zeros(0, np.int64)
                )
            nidx = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            rev = _micros(t["o_totalprice"].to_numpy(zero_copy_only=False))
            return _agg_by_nation(nidx, rev)

        parts = joined.map_batches(partial_joined, batch_format="pyarrow")

    def final(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        nat = int(t["nat"][0].as_py())
        return pa.table(
            {
                "n_name": pa.array([n_names[nat]], pa.string()),
                "revenue": pa.array(
                    [int(t["rev_u"].to_numpy(zero_copy_only=False).sum()) / MICRO],
                    pa.float64(),
                ),
                "orders": pa.array(
                    [int(t["n"].to_numpy(zero_copy_only=False).sum())], pa.int64()
                ),
            }
        )

    return parts.groupby("nat").map_groups(final, batch_format="pyarrow")


REVENUE_BY_NATION_SQL = """
SELECT n.n_name,
       SUM(CAST(round(o.o_totalprice * 1000000, 0) AS BIGINT)) / 1000000.0 AS revenue,
       count(*)::BIGINT AS orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def order_lineitem_join(sf_dir: str, buckets: int | None = None):
    """Large-large partitioned hash join: orders |X| lineitem on orderkey.

    Neither side is broadcast: both are bucketed by ``hash(key) % B`` (a
    plain column + one keyed shuffle each, unioned), then joined pairwise
    inside each bucket with pandas -- the explicit partitioned hash join
    for when no side fits in memory (SURVEY.md §2.6 / ray guide pattern;
    skew handling = salt hot keys into sub-buckets, not needed for
    orderkeys which are unique on the build side)."""
    from ..sources.readers import suggest_buckets

    if buckets is None:
        buckets = suggest_buckets(
            f"{sf_dir}/orders.parquet", f"{sf_dir}/lineitem.parquet"
        )
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    items = read_parquet_sized(
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

    def join_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        side = t["side"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False)
        left_m = side == 0
        lk = key[left_m]
        lt = t["total_u"].to_numpy(zero_copy_only=False)[left_m]
        rk = key[~left_m]
        rr = t["rev_u"].to_numpy(zero_copy_only=False)[~left_m]
        rn = t["n"].to_numpy(zero_copy_only=False)[~left_m]
        empty = pa.table(
            {
                "o_orderkey": pa.nulls(0, pa.int64()),
                "o_totalprice": pa.nulls(0, pa.float64()),
                "revenue": pa.nulls(0, pa.float64()),
                "items": pa.nulls(0, pa.int64()),
            }
        )
        if not len(lk) or not len(rk):
            return empty
        # aggregate probe side per key: sort + reduceat (exact int64 sums)
        ro = np.argsort(rk, kind="stable")
        rks = rk[ro]
        starts = np.flatnonzero(np.concatenate(([True], rks[1:] != rks[:-1])))
        uk = rks[starts]
        rrs = np.add.reduceat(rr[ro], starts)
        rns = np.add.reduceat(rn[ro], starts)
        # inner join: orderkeys are unique on the build side per bucket
        lo = np.argsort(lk, kind="stable")
        lks = lk[lo]
        pos = np.searchsorted(lks, uk)
        pos_c = np.minimum(pos, len(lks) - 1)
        valid = lks[pos_c] == uk
        sel = lo[pos_c[valid]]
        return pa.table(
            {
                "o_orderkey": pa.array(uk[valid], pa.int64()),
                "o_totalprice": pa.array(lt[sel] / MICRO, pa.float64()),
                "revenue": pa.array(rrs[valid] / MICRO, pa.float64()),
                "items": pa.array(rns[valid], pa.int64()),
            }
        )

    return both.groupby("prt").map_groups(
        lambda t: join_bucket(t.drop_columns(["prt"])), batch_format="pyarrow"
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
    ds = read_parquet_sized(f"{sf_dir}/part.parquet", columns=["p_type", "p_brand"])

    def pairs(t: pa.Table) -> pa.Table:
        # Arrow-native hash aggregate (C++): (type, brand) partial counts
        g = t.group_by(["p_type", "p_brand"]).aggregate([([], "count_all")])
        return g.rename_columns(["p_type", "p_brand", "n"])

    parts = ds.map_batches(pairs, batch_format="pyarrow")

    def merge_type(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        brands = g["p_brand"]
        if isinstance(brands, pa.ChunkedArray):
            brands = brands.combine_chunks()
        return pa.table(
            {
                "p_type": g["p_type"][:1].cast(pa.string()),
                "brands": pa.array(
                    [len(brands.dictionary_encode().dictionary)], pa.int64()
                ),
                "parts": pa.array(
                    [int(g["n"].to_numpy(zero_copy_only=False).sum())], pa.int64()
                ),
            }
        )

    return parts.groupby("p_type").map_groups(merge_type, batch_format="pyarrow")


BRAND_TYPE_SQL = """
SELECT p_type, count(DISTINCT p_brand)::BIGINT AS brands, count(*)::BIGINT AS parts
FROM part GROUP BY p_type
"""


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: predicate-heavy scan + one global sum -- the
    pure filter-and-aggregate pipeline (no exchange at all: per-batch
    partial sums, one metadata-sized reduce).  Exact int64 micro-unit
    arithmetic matches the SQL oracle bitwise.

    The predicate is ALSO pushed into the parquet scan (``filter=`` pyarrow
    expression -- row-group statistics skip non-matching groups and rows
    filter at decode, so only ~3% of rows ever cross the read boundary at
    sf0.1); the in-task mask stays as the exactness-preserving belt and
    suspenders."""
    import pyarrow.compute as _pc

    from ..util import dataset_to_table

    lo = np.datetime64("1996-01-01T00:00:00.000000")
    hi = np.datetime64("1997-01-01T00:00:00.000000")
    push = (
        (_pc.field("l_shipdate") >= pa.scalar(lo.item(), pa.timestamp("us")))
        & (_pc.field("l_shipdate") < pa.scalar(hi.item(), pa.timestamp("us")))
        & (_pc.field("l_discount") >= 0.03)
        & (_pc.field("l_discount") <= 0.07)
        & (_pc.field("l_quantity") < 24.0)
    )
    ds = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        filter=push,
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        ship = t["l_shipdate"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        m = (
            (ship >= lo)
            & (ship < hi)
            & (disc >= 0.03)
            & (disc <= 0.07)
            & (qty < 24.0)
        )
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        rev = int(_micros(ep * disc[m]).sum())
        return pa.table(
            {
                "rev_u": pa.array([rev], pa.int64()),
                "n": pa.array([int(m.sum())], pa.int64()),
            }
        )

    parts = dataset_to_table(ds.map_batches(partial, batch_format="pyarrow"))
    rev_u = int(parts["rev_u"].to_numpy(zero_copy_only=False).sum())
    n = int(parts["n"].to_numpy(zero_copy_only=False).sum())
    return pa.table(
        {
            "revenue": pa.array([rev_u / MICRO], pa.float64()),
            "n_items": pa.array([n], pa.int64()),
        }
    )


Q6_SQL = """
SELECT SUM(CAST(round(l_extendedprice * l_discount * 1000000, 0) AS BIGINT)) / 1000000.0 AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
"""


def q3_shipping_priority(sf_dir: str, k: int = 10, buckets: int | None = None):
    """TPC-H Q3 shape: dimension-broadcast filter + large-large partitioned
    hash join + grouped sum + top-k.

    Scale shape: the customer SEGMENT KEY SET is the only broadcast (one
    sorted int64 array via ray.put -- a dimension table); orders and
    lineitem both stream with predicate + column pruning, bucket by
    hash(orderkey), and meet in ONE keyed exchange; revenue per order sums
    inside the bucket; each bucket pre-prunes to its own top-k with the
    global tiebreak before the tiny global sort."""
    import ray

    from ..sources.readers import suggest_buckets
    from ..stages.joins import hash_prt

    if buckets is None:
        buckets = suggest_buckets(
            f"{sf_dir}/orders.parquet", f"{sf_dir}/lineitem.parquet"
        )
    cutoff = np.datetime64("1998-06-01T00:00:00.000000")
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    seg_keys = np.sort(
        cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"].to_numpy(np.int64)
    )
    seg_ref = ray.put(seg_keys)

    union_schema = pa.schema(
        [
            ("key", pa.int64()),
            ("side", pa.int8()),
            ("odate", pa.int64()),
            ("rev_u", pa.int64()),
            ("prt", pa.int64()),
        ]
    )

    def tag_orders(t: pa.Table) -> pa.Table:
        keys = ray.get(seg_ref)
        t = t.combine_chunks()
        od = t["o_orderdate"].to_numpy(zero_copy_only=False)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, ck)
        in_seg = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == ck)
        m = (od < cutoff) & in_seg
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False)[m]
        n = len(ok)
        return pa.table(
            {
                "key": pa.array(ok, pa.int64()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                "odate": pa.array(od[m].astype("datetime64[us]").view(np.int64), pa.int64()),
                "rev_u": pa.array(np.zeros(n, np.int64), pa.int64()),
                "prt": pa.array(hash_prt(ok, buckets), pa.int64()),
            },
            schema=union_schema,
        )

    def _sum_by_key(keys: np.ndarray, vals: np.ndarray):
        if not len(keys):  # filter may keep zero rows in a date-clustered file
            return keys, vals
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        return ks[starts], np.add.reduceat(vals[order], starts)

    def tag_items(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        ship = t["l_shipdate"].to_numpy(zero_copy_only=False)
        m = ship > cutoff
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)[m]
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        disc = t["l_discount"].to_numpy(zero_copy_only=False)[m]
        uk, sums = _sum_by_key(ok.astype(np.int64), _micros(ep * (1.0 - disc)))
        n = len(uk)
        return pa.table(
            {
                "key": pa.array(uk, pa.int64()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
                "odate": pa.array(np.zeros(n, np.int64), pa.int64()),
                "rev_u": pa.array(sums, pa.int64()),
                "prt": pa.array(hash_prt(uk, buckets), pa.int64()),
            },
            schema=union_schema,
        )

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(tag_orders, batch_format="pyarrow")
    items = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(tag_items, batch_format="pyarrow")

    out_schema = pa.schema(
        [
            ("l_orderkey", pa.int64()),
            ("revenue", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
        ]
    )

    def join_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        side = t["side"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False)
        lk = key[side == 0]
        ld = t["odate"].to_numpy(zero_copy_only=False)[side == 0]
        rk = key[side == 1]
        rv = t["rev_u"].to_numpy(zero_copy_only=False)[side == 1]
        if not len(lk) or not len(rk):
            return pa.Table.from_pylist([], schema=out_schema)
        # sum probe partials per key, then probe the build (unique orderkeys)
        uk, sums = _sum_by_key(rk, rv)
        order = np.argsort(lk, kind="stable")
        lk_s, ld_s = lk[order], ld[order]
        pos = np.searchsorted(lk_s, uk)
        hit = (pos < len(lk_s)) & (lk_s[np.minimum(pos, len(lk_s) - 1)] == uk)
        uk, sums = uk[hit], sums[hit]
        dates = ld_s[pos[hit]]
        # per-bucket top-k with the GLOBAL tiebreak (revenue desc, key asc)
        if len(uk) > k:
            idx = np.lexsort((uk, -sums))[:k]
            uk, sums, dates = uk[idx], sums[idx], dates[idx]
        return pa.table(
            {
                "l_orderkey": pa.array(uk, pa.int64()),
                "revenue": pa.array(sums / MICRO, pa.float64()),
                "o_orderdate": pa.array(dates.view("datetime64[us]")),
            },
            schema=out_schema,
        )

    return (
        orders.union(items)
        .groupby("prt")
        .map_groups(
            lambda g: join_bucket(g.drop_columns(["prt"])), batch_format="pyarrow"
        )
        .sort(["revenue", "l_orderkey"], descending=[True, False])
        .limit(k)
    )


Q3_SQL = """
SELECT l.l_orderkey::BIGINT AS l_orderkey,
       SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000, 0) AS BIGINT)) / 1000000.0 AS revenue,
       any_value(o.o_orderdate) AS o_orderdate
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l.l_orderkey
ORDER BY SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000, 0) AS BIGINT)) DESC, l.l_orderkey
LIMIT 10
"""


def parts_never_bulk_ordered(sf_dir: str, qty_threshold: float = 45.0, buckets: int | None = None):
    """Partitioned ANTI-join: parts with NO lineitem above the quantity
    threshold (NOT EXISTS).  Neither side broadcasts: the probe side
    (lineitem) collapses to DISTINCT matching partkeys per batch
    (combiner), both sides bucket by hash(partkey) in one keyed exchange,
    and each bucket emits its left rows whose key is absent from the probe
    set (sorted-array membership, vectorized)."""
    from ..sources.readers import suggest_buckets
    from ..stages.joins import hash_prt

    if buckets is None:
        buckets = suggest_buckets(
            f"{sf_dir}/part.parquet", f"{sf_dir}/lineitem.parquet"
        )
    union_schema = pa.schema(
        [
            ("key", pa.int64()),
            ("side", pa.int8()),
            ("p_brand", pa.string()),
            ("p_retailprice", pa.float64()),
            ("prt", pa.int64()),
        ]
    )

    def tag_parts(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        k = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "side": pa.array(np.zeros(len(k), np.int8), pa.int8()),
                "p_brand": t["p_brand"].cast(pa.string()),
                "p_retailprice": t["p_retailprice"].cast(pa.float64()),
                "prt": pa.array(hash_prt(k, buckets), pa.int64()),
            },
            schema=union_schema,
        )

    def tag_items(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)[qty > qty_threshold]
        uk = np.unique(pk.astype(np.int64))  # combiner: distinct keys per batch
        n = len(uk)
        return pa.table(
            {
                "key": pa.array(uk, pa.int64()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
                "p_brand": pa.nulls(n, pa.string()),
                "p_retailprice": pa.nulls(n, pa.float64()),
                "prt": pa.array(hash_prt(uk, buckets), pa.int64()),
            },
            schema=union_schema,
        )

    parts = read_parquet_sized(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_retailprice"]
    ).map_batches(tag_parts, batch_format="pyarrow")
    items = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity"]
    ).map_batches(tag_items, batch_format="pyarrow")

    out_schema = pa.schema(
        [
            ("p_partkey", pa.int64()),
            ("p_brand", pa.string()),
            ("p_retailprice", pa.float64()),
        ]
    )

    def anti_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        side = t["side"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False)
        probe = np.unique(key[side == 1])
        left_idx = np.flatnonzero(side == 0)
        lk = key[left_idx]
        pos = np.searchsorted(probe, lk)
        hit = (pos < len(probe)) & (probe[np.minimum(pos, len(probe) - 1)] == lk)
        keep = left_idx[~hit]
        sub = t.take(pa.array(keep))
        return pa.table(
            {
                "p_partkey": sub["key"],
                "p_brand": sub["p_brand"],
                "p_retailprice": sub["p_retailprice"],
            },
            schema=out_schema,
        )

    return (
        parts.union(items)
        .groupby("prt")
        .map_groups(
            lambda g: anti_bucket(g.drop_columns(["prt"])), batch_format="pyarrow"
        )
    )


PARTS_NEVER_BULK_SQL = """
SELECT p.p_partkey::BIGINT AS p_partkey, p.p_brand, p.p_retailprice::DOUBLE AS p_retailprice
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45
)
"""


def q5_local_supplier_revenue(
    sf_dir: str,
    region: str = "ASIA",
    buckets: int | None = None,
    broadcast: bool | None = None,
):
    """TPC-H Q5 shape: revenue by nation where the customer and the
    supplier share a nation inside one region -- the multi-dimension join.

    Scale shape: region/nation/customer/supplier are DIMENSIONS -- they
    fold into two broadcast int64 lookup arrays (custkey -> nationkey,
    suppkey -> nationkey, both restricted to the region) shipped once via
    ray.put.  The two FACT tables (orders, lineitem) meet in ONE
    hash(orderkey) exchange: orders rows carry the customer's nationkey,
    lineitem rows carry the supplier's nationkey + revenue, and the bucket
    merge keeps matches with equal nationkeys, emitting per-nation partial
    sums (combiner) into a #nations-row final groupby."""
    import ray

    from ..sources.readers import suggest_buckets
    from ..stages.joins import hash_prt

    if buckets is None:
        buckets = suggest_buckets(
            f"{sf_dir}/orders.parquet", f"{sf_dir}/lineitem.parquet"
        )
    if broadcast is None:
        broadcast = _fits_broadcast(f"{sf_dir}/customer.parquet") and _fits_broadcast(
            f"{sf_dir}/supplier.parquet"
        )
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    region_t = pd.read_parquet(f"{sf_dir}/region.parquet")
    rkeys = set(
        region_t.loc[region_t["r_name"] == region, "r_regionkey"].astype(int)
    )
    nat = nation[nation["n_regionkey"].astype(int).isin(rkeys)]
    nat_keys = set(nat["n_nationkey"].astype(int))
    nat_names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    if broadcast:
        cust = pd.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        cust = cust[cust["c_nationkey"].astype(int).isin(nat_keys)]
        ck = cust["c_custkey"].to_numpy(np.int64)
        order_c = np.argsort(ck, kind="stable")
        ck_sorted, c_nat = ck[order_c], cust["c_nationkey"].to_numpy(np.int64)[order_c]

        supp = pd.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        supp = supp[supp["s_nationkey"].astype(int).isin(nat_keys)]
        sk = supp["s_suppkey"].to_numpy(np.int64)
        order_s = np.argsort(sk, kind="stable")
        sk_sorted, s_nat = sk[order_s], supp["s_nationkey"].to_numpy(np.int64)[order_s]

        dims_ref = ray.put((ck_sorted, c_nat, sk_sorted, s_nat))
    else:
        # the only broadcast allowed in the fallback is the region's nation
        # KEY SET (dozens of int64s); customer and supplier each meet their
        # fact table in a partitioned equijoin below
        dims_ref = None
        nat_keys_ref = ray.put(np.sort(np.fromiter(nat_keys, np.int64)))

    union_schema = pa.schema(
        [
            ("key", pa.int64()),
            ("side", pa.int8()),
            ("nat", pa.int64()),
            ("rev_u", pa.int64()),
            ("prt", pa.int64()),
        ]
    )

    def _lookup(sorted_keys, vals, probe):
        pos = np.searchsorted(sorted_keys, probe)
        ok = (pos < len(sorted_keys)) & (
            sorted_keys[np.minimum(pos, len(sorted_keys) - 1)] == probe
        )
        return ok, vals[np.minimum(pos, len(vals) - 1)]

    def tag_orders(t: pa.Table) -> pa.Table:
        cks, cn, _, _ = ray.get(dims_ref)
        t = t.combine_chunks()
        ck_ = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok, natk = _lookup(cks, cn, ck_)
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False)[ok]
        n = len(okey)
        return pa.table(
            {
                "key": pa.array(okey, pa.int64()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                "nat": pa.array(natk[ok], pa.int64()),
                "rev_u": pa.array(np.zeros(n, np.int64), pa.int64()),
                "prt": pa.array(hash_prt(okey, buckets), pa.int64()),
            },
            schema=union_schema,
        )

    def tag_items(t: pa.Table) -> pa.Table:
        _, _, sks, sn = ray.get(dims_ref)
        t = t.combine_chunks()
        sk_ = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok, natk = _lookup(sks, sn, sk_)
        okey = t["l_orderkey"].to_numpy(zero_copy_only=False)[ok]
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)[ok]
        disc = t["l_discount"].to_numpy(zero_copy_only=False)[ok]
        n = len(okey)
        return pa.table(
            {
                "key": pa.array(okey, pa.int64()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
                "nat": pa.array(natk[ok], pa.int64()),
                "rev_u": pa.array(_micros(ep * (1.0 - disc)), pa.int64()),
                "prt": pa.array(hash_prt(okey, buckets), pa.int64()),
            },
            schema=union_schema,
        )

    orders_raw = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    items_raw = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    if broadcast:
        orders = orders_raw.map_batches(tag_orders, batch_format="pyarrow")
        items = items_raw.map_batches(tag_items, batch_format="pyarrow")
    else:
        from ..stages.joins import keyed_equijoin

        def _region_filter(key_col: str, nat_col: str):
            def f(t: pa.Table) -> pa.Table:
                keys = ray.get(nat_keys_ref)
                t = t.combine_chunks()
                nk = t[nat_col].to_numpy(zero_copy_only=False).astype(np.int64)
                pos = np.searchsorted(keys, nk)
                inreg = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == nk)
                return t.filter(pa.array(inreg))

            return f

        cust_f = read_parquet_sized(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ).map_batches(_region_filter("c_custkey", "c_nationkey"), batch_format="pyarrow")
        supp_f = read_parquet_sized(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        ).map_batches(_region_filter("s_suppkey", "s_nationkey"), batch_format="pyarrow")

        ojoin = keyed_equijoin(
            orders_raw,
            cust_f,
            on=("o_custkey", "c_custkey"),
            buckets=buckets,
            schemas=(
                pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
                pa.schema([("c_custkey", pa.int64()), ("c_nationkey", pa.int32())]),
            ),
        )
        ijoin = keyed_equijoin(
            items_raw,
            supp_f,
            on=("l_suppkey", "s_suppkey"),
            buckets=buckets,
            schemas=(
                pa.schema(
                    [
                        ("l_orderkey", pa.int64()),
                        ("l_suppkey", pa.int64()),
                        ("l_extendedprice", pa.float64()),
                        ("l_discount", pa.float64()),
                    ]
                ),
                pa.schema([("s_suppkey", pa.int64()), ("s_nationkey", pa.int32())]),
            ),
        )

        def orders_from_join(t: pa.Table) -> pa.Table:
            t = t.combine_chunks()
            okey = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            n = len(okey)
            return pa.table(
                {
                    "key": pa.array(okey, pa.int64()),
                    "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                    "nat": pa.array(
                        t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                        pa.int64(),
                    ),
                    "rev_u": pa.array(np.zeros(n, np.int64), pa.int64()),
                    "prt": pa.array(hash_prt(okey, buckets), pa.int64()),
                },
                schema=union_schema,
            )

        def items_from_join(t: pa.Table) -> pa.Table:
            t = t.combine_chunks()
            okey = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = t["l_discount"].to_numpy(zero_copy_only=False)
            n = len(okey)
            return pa.table(
                {
                    "key": pa.array(okey, pa.int64()),
                    "side": pa.array(np.ones(n, np.int8), pa.int8()),
                    "nat": pa.array(
                        t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                        pa.int64(),
                    ),
                    "rev_u": pa.array(_micros(ep * (1.0 - disc)), pa.int64()),
                    "prt": pa.array(hash_prt(okey, buckets), pa.int64()),
                },
                schema=union_schema,
            )

        orders = ojoin.map_batches(orders_from_join, batch_format="pyarrow")
        items = ijoin.map_batches(items_from_join, batch_format="pyarrow")

    partial_schema = pa.schema([("nat", pa.int64()), ("rev_u", pa.int64())])

    def join_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        side = t["side"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False)
        nat_col = t["nat"].to_numpy(zero_copy_only=False)
        lm = side == 0
        lk, lnat = key[lm], nat_col[lm]
        order = np.argsort(lk, kind="stable")
        lk_s, lnat_s = lk[order], lnat[order]
        rm = ~lm
        rk, rnat = key[rm], nat_col[rm]
        rv = t["rev_u"].to_numpy(zero_copy_only=False)[rm]
        pos = np.searchsorted(lk_s, rk)
        hit = (pos < len(lk_s)) & (lk_s[np.minimum(pos, len(lk_s) - 1)] == rk)
        same_nat = hit & (lnat_s[np.minimum(pos, len(lk_s) - 1)] == rnat)
        natk = rnat[same_nat]
        rev = rv[same_nat]
        if not len(natk):
            return pa.Table.from_pylist([], schema=partial_schema)
        uk = np.unique(natk)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, np.searchsorted(uk, natk), rev)
        return pa.table(
            {"nat": pa.array(uk, pa.int64()), "rev_u": pa.array(sums, pa.int64())},
            schema=partial_schema,
        )

    out_schema = pa.schema([("n_name", pa.string()), ("revenue", pa.float64())])
    names_ref = ray.put(nat_names)

    def final(t: pa.Table) -> pa.Table:
        names = ray.get(names_ref)
        t = t.combine_chunks()
        natk = int(t["nat"][0].as_py())
        rev = int(t["rev_u"].to_numpy(zero_copy_only=False).sum())
        return pa.table(
            {
                "n_name": pa.array([names[natk]], pa.string()),
                "revenue": pa.array([rev / MICRO], pa.float64()),
            },
            schema=out_schema,
        )

    return (
        orders.union(items)
        .groupby("prt")
        .map_groups(
            lambda g: join_bucket(g.drop_columns(["prt"])), batch_format="pyarrow"
        )
        .groupby("nat")
        .map_groups(final, batch_format="pyarrow")
    )


Q5_SQL = """
SELECT n.n_name,
       SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000, 0) AS BIGINT)) / 1000000.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA' AND s.s_nationkey = c.c_nationkey
GROUP BY n.n_name
"""


# ---------------------------------------------------------------------------
# Weighted aggregate: quantity-weighted mean price per return flag
# ---------------------------------------------------------------------------


def weighted_avg_price_by_flag(sf_dir: str):
    """Quantity-weighted mean extended price per return flag -- the
    weighted-aggregate shape (sum(w*x)/sum(w)) the plain mean family does
    not cover.

    Exactness: quantity and micro-unit price are exact int64; the weighted
    cross sum is int64 with a loud overflow guard (DuckDB's HUGEINT sum
    never overflows, so the Ray side escalates to Python-int math rather
    than wrap); the final division is one mirrored float expression.

    Scale shape: per-batch partials collapse to one row per flag (domain
    = 3), one tiny exchange."""
    ds = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    part_schema = pa.schema(
        [("l_returnflag", pa.string()), ("sw", pa.int64()),
         ("swp", pa.float64()), ("swp_exact", pa.string())]
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=part_schema)
        flag = t["l_returnflag"].combine_chunks().dictionary_encode()
        codes = flag.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.rint(
            t["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        pu = _micros(t["l_extendedprice"].to_numpy(zero_copy_only=False))
        order = np.argsort(codes, kind="stable")
        cs = codes[order]
        starts = np.flatnonzero(np.concatenate(([True], cs[1:] != cs[:-1])))
        sw = np.add.reduceat(q[order], starts)
        # per-row cross term can approach int64 at scale: escalate loudly
        if float(q.max(initial=0)) * float(np.abs(pu).max(initial=0)) \
                * len(q) >= 9.2e18:
            cross = (q.astype(object) * pu.astype(object))[order]
        else:
            cross = (q * pu)[order]
        swp = np.add.reduceat(cross, starts)
        return pa.table(
            {
                "l_returnflag": flag.take(pa.array(order[starts])).cast(
                    pa.string()),
                "sw": pa.array(sw, pa.int64()),
                "swp": pa.array(
                    np.asarray(swp, dtype=np.float64), pa.float64()),
                # exact integer carried as decimal string (no float loss)
                "swp_exact": pa.array([str(int(x)) for x in swp],
                                      pa.string()),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("l_returnflag", pa.string()), ("sum_qty", pa.int64()),
         ("wavg_price", pa.float64())]
    )

    def finalize(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        if g.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        sw = int(g["sw"].to_numpy(zero_copy_only=False).sum())
        swp = sum(int(s) for s in g["swp_exact"].to_pylist())
        wavg = round(float(swp) / float(sw) / 1_000_000.0, 6)
        return pa.table(
            {
                "l_returnflag": pa.array([g["l_returnflag"][0].as_py()],
                                         pa.string()),
                "sum_qty": pa.array([sw], pa.int64()),
                "wavg_price": pa.array([wavg], pa.float64()),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow",
                       batch_size=1_048_576)
        .groupby("l_returnflag")
        .map_groups(finalize, batch_format="pyarrow")
    )


WEIGHTED_AVG_PRICE_SQL = """
WITH l AS (
  SELECT l_returnflag,
         CAST(round(l_quantity, 0) AS BIGINT) AS q,
         CAST(round(l_extendedprice * 1000000, 0) AS BIGINT) AS pu
  FROM lineitem
)
SELECT l_returnflag, sum(q)::BIGINT AS sum_qty,
       round(CAST(sum(CAST(q AS HUGEINT) * pu) AS DOUBLE)
             / CAST(sum(q) AS DOUBLE) / 1000000.0, 6) AS wavg_price
FROM l GROUP BY 1
"""
