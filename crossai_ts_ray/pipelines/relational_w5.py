"""Fifth relational wave: the TPC-H straggler JOIN SHAPES the earlier
waves hadn't exercised, adapted to this schema (no partsupp table, no
commit/receipt dates -- same adaptation rule as ``relational_w4.py``):

* Q9  -- multi-fact profit aggregation (lineitem x part x supplier x
  nation, grouped by nation x year; supply cost proxied by
  ``0.1 * p_retailprice * l_quantity`` since partsupp is absent).
* Q11 -- group-vs-GLOBAL-scalar HAVING (per-part value filtered against
  a fraction of the whole nation's total).
* Q20 -- nested IN + correlated scalar subquery (suppliers who shipped
  MORE THAN HALF of a name-filtered part's windowed quantity -- the
  availqty>half-demand shape without partsupp).
* Q21 -- the hardest EXISTS / NOT-EXISTS composition: late suppliers who
  were the ONLY late supplier on a multi-supplier order (lateness
  proxied by ``l_shipdate > o_orderdate + 60 days``).

House rules as in ``relational.py`` / ``relational_w4.py``: money and
quantities ride int64 micro-units (order-insensitive sums, bit-exact vs
the DuckDB oracle), dimensions broadcast only behind the
``_fits_broadcast`` stat guard with a partitioned ``keyed_equijoin``
fallback, and every per-batch kernel is a vectorized combiner so rows
crossing an exchange are bounded by key cardinality, not input size.

Reference parity: exercises the same generic join/aggregate machinery as
the earlier waves; the reference's own relational surface is
dict/interval lookups (/root/reference/caits/performance/detection.py:98-160).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.readers import read_parquet_sized, suggest_buckets
from ..stages.joins import hash_prt, keyed_equijoin
from .relational import _fits_broadcast, _micros
from .relational_ext import _np, _ts_us

_US_PER_DAY = 86_400_000_000


def _sorted_lookup(sorted_keys: np.ndarray, vals: np.ndarray,
                   probe: np.ndarray):
    """(found_mask, values) for probe keys against a sorted key array."""
    if not len(sorted_keys):
        return np.zeros(len(probe), bool), np.zeros(len(probe), vals.dtype)
    pos = np.searchsorted(sorted_keys, probe)
    pos_c = np.minimum(pos, len(sorted_keys) - 1)
    ok = (pos < len(sorted_keys)) & (sorted_keys[pos_c] == probe)
    return ok, vals[pos_c]


def _nation_names(sf_dir: str) -> dict[int, str]:
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name"])
    return dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))


def _nation_key(sf_dir: str, nation: str) -> int:
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name"])
    hit = nat.loc[nat["n_name"] == nation, "n_nationkey"]
    if hit.empty:
        raise ValueError(f"unknown nation {nation!r}")
    return int(hit.iloc[0])


# ---------------------------------------------------------------------------
# Q9 shape: profit by (nation, year) across lineitem x part x supplier
# ---------------------------------------------------------------------------

def q9_profit_by_nation_year(sf_dir: str, prefix: str = "red",
                             buckets: int | None = None,
                             broadcast: bool | None = None):
    """TPC-H Q9 shape: profit per supplier-nation per ship year over the
    parts whose name starts with ``prefix`` (supply cost proxied as
    ``0.1 * p_retailprice * l_quantity``).

    Scale shape: part (name-filtered to a partkey->retailprice lookup)
    and supplier (suppkey->nationkey) are broadcast behind the stat
    guard; each lineitem batch folds to (nation, year) partial sums in
    micro-units, so the ONLY exchange moves #nations x #years rows per
    batch.  Fallback: two partitioned ``keyed_equijoin``s (lineitem x
    filtered part, then x supplier), same combiner after.
    """
    import ray

    if broadcast is None:
        broadcast = (_fits_broadcast(f"{sf_dir}/part.parquet")
                     and _fits_broadcast(f"{sf_dir}/supplier.parquet"))
    nat_names = _nation_names(sf_dir)

    part_schema = pa.schema([("key", pa.int64()), ("profit_u", pa.int64())])

    def combine(natk: np.ndarray, year: np.ndarray,
                profit_u: np.ndarray) -> pa.Table:
        # years are bounded (timestamp64[us] caps at 2262); 7 bits of
        # year offset next to the nation key can't collide
        key = natk * 128 + (year - 1970)
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        sums = np.add.reduceat(profit_u[order], starts)
        return pa.table(
            {"key": pa.array(ks[starts], pa.int64()),
             "profit_u": pa.array(sums, pa.int64())},
            schema=part_schema,
        )

    def profit_units(qty, eprice, disc, retail) -> np.ndarray:
        # two micro-roundings, same association as the oracle SQL
        return _micros(eprice * (1.0 - disc)) - _micros((0.1 * retail) * qty)

    if broadcast:
        part = pd.read_parquet(f"{sf_dir}/part.parquet",
                               columns=["p_partkey", "p_name",
                                        "p_retailprice"])
        part = part[part["p_name"].str.startswith(prefix)]
        pk = part["p_partkey"].to_numpy(np.int64)
        po = np.argsort(pk, kind="stable")
        supp = pd.read_parquet(f"{sf_dir}/supplier.parquet",
                               columns=["s_suppkey", "s_nationkey"])
        sk = supp["s_suppkey"].to_numpy(np.int64)
        so = np.argsort(sk, kind="stable")
        dims_ref = ray.put((
            pk[po], part["p_retailprice"].to_numpy(np.float64)[po],
            sk[so], supp["s_nationkey"].to_numpy(np.int64)[so],
        ))

        line = read_parquet_sized(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_quantity",
                     "l_extendedprice", "l_discount", "l_shipdate"],
        )

        def partial(t: pa.Table) -> pa.Table:
            pks, pret, sks, snat = ray.get(dims_ref)
            t = t.combine_chunks()
            lpk = _np(t["l_partkey"]).astype(np.int64)
            ok, retail = _sorted_lookup(pks, pret, lpk)
            if not ok.any():
                return pa.Table.from_pylist([], schema=part_schema)
            lsk = _np(t["l_suppkey"]).astype(np.int64)[ok]
            _, natk = _sorted_lookup(sks, snat, lsk)  # FK always resolves
            ship = _ts_us(t["l_shipdate"])[ok]
            year = ship.view("datetime64[us]").astype(
                "datetime64[Y]").astype(np.int64) + 1970
            profit_u = profit_units(
                _np(t["l_quantity"])[ok], _np(t["l_extendedprice"])[ok],
                _np(t["l_discount"])[ok], retail[ok],
            )
            return combine(natk, year, profit_u)

        partials = line.map_batches(partial, batch_format="pyarrow",
                                    batch_size=1_048_576)
    else:
        part_ds = read_parquet_sized(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_name", "p_retailprice"],
        ).map_batches(
            lambda t: t.filter(
                pa.compute.starts_with(
                    t["p_name"].combine_chunks().cast(pa.string()), prefix
                )
            ).select(["p_partkey", "p_retailprice"]),
            batch_format="pyarrow",
        )
        line = read_parquet_sized(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_quantity",
                     "l_extendedprice", "l_discount", "l_shipdate"],
        )
        if buckets is None:
            buckets = suggest_buckets(f"{sf_dir}/lineitem.parquet")
        j1 = keyed_equijoin(line, part_ds, on=("l_partkey", "p_partkey"),
                            buckets=buckets)
        supp_ds = read_parquet_sized(
            f"{sf_dir}/supplier.parquet",
            columns=["s_suppkey", "s_nationkey"],
        )
        j2 = keyed_equijoin(j1, supp_ds, on=("l_suppkey", "s_suppkey"),
                            buckets=buckets)

        def partial_joined(t: pa.Table) -> pa.Table:
            t = t.combine_chunks()
            if t.num_rows == 0:
                return pa.Table.from_pylist([], schema=part_schema)
            ship = _ts_us(t["l_shipdate"])
            year = ship.view("datetime64[us]").astype(
                "datetime64[Y]").astype(np.int64) + 1970
            profit_u = profit_units(
                _np(t["l_quantity"]), _np(t["l_extendedprice"]),
                _np(t["l_discount"]), _np(t["p_retailprice"]),
            )
            return combine(_np(t["s_nationkey"]).astype(np.int64), year,
                           profit_u)

        partials = j2.map_batches(partial_joined, batch_format="pyarrow",
                                  batch_size=1_048_576)

    out_schema = pa.schema(
        [("nation", pa.string()), ("o_year", pa.int64()),
         ("sum_profit", pa.float64())]
    )

    def final(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        key = _np(t["key"])
        pu = _np(t["profit_u"])
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        sums = np.add.reduceat(pu[order], starts)
        uk = ks[starts]
        names = [nat_names[int(k) // 128] for k in uk]
        return pa.table(
            {"nation": pa.array(names, pa.string()),
             "o_year": pa.array(uk % 128 + 1970, pa.int64()),
             "sum_profit": pa.array(sums / 1e6, pa.float64())},
            schema=out_schema,
        )

    # the partials are #nations x #years rows per batch -- a constant-key
    # final merge, not a data-sized exchange
    return partials.map_batches(
        lambda t: t.append_column(
            "g", pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
        ),
        batch_format="pyarrow",
    ).groupby("g").map_groups(
        lambda g: final(g.drop_columns(["g"])), batch_format="pyarrow"
    )


Q9_SQL = """
SELECT n_name AS nation, year(l_shipdate)::BIGINT AS o_year,
       SUM(CAST(round(l_extendedprice*(1-l_discount)*1000000,0) AS BIGINT)
           - CAST(round(0.1*p_retailprice*l_quantity*1000000,0) AS BIGINT))
       / 1000000.0 AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE 'red%'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q11 shape: per-part value vs a GLOBAL-scalar HAVING threshold
# ---------------------------------------------------------------------------

def q11_important_parts(sf_dir: str, nation: str = "NATION_3",
                        fraction: float = 0.001,
                        buckets: int | None = None,
                        broadcast: bool | None = None):
    """TPC-H Q11 shape: parts whose value (revenue shipped by one
    nation's suppliers) exceeds ``fraction`` of that nation's TOTAL --
    the group-vs-global-scalar HAVING.

    Scale shape: the nation's suppkey set broadcasts behind the stat
    guard (fallback: partitioned equijoin); per-batch combiners fold to
    (partkey, value_u) partials; ONE hash(partkey) exchange produces the
    per-part aggregate, which is MATERIALIZED (part-cardinality-sized,
    distributed -- never driver-collected) so the global total is one
    cheap second pass over the aggregate, then the HAVING filter streams
    over the same materialized blocks.  Exactness: int64 micro-unit
    sums; the one float multiply (total x fraction) is the identical
    IEEE op in the oracle.
    """
    import ray

    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/lineitem.parquet")
    if broadcast is None:
        broadcast = _fits_broadcast(f"{sf_dir}/supplier.parquet")
    natkey = _nation_key(sf_dir, nation)

    part_schema = pa.schema(
        [("pkey", pa.int64()), ("value_u", pa.int64()), ("prt", pa.int64())]
    )

    def combine(pkey: np.ndarray, val_u: np.ndarray) -> pa.Table:
        order = np.argsort(pkey, kind="stable")
        ks = pkey[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        sums = np.add.reduceat(val_u[order], starts)
        uk = ks[starts]
        return pa.table(
            {"pkey": pa.array(uk, pa.int64()),
             "value_u": pa.array(sums, pa.int64()),
             "prt": pa.array(hash_prt(uk, buckets), pa.int64())},
            schema=part_schema,
        )

    if broadcast:
        supp = pd.read_parquet(f"{sf_dir}/supplier.parquet",
                               columns=["s_suppkey", "s_nationkey"])
        keys = np.sort(
            supp.loc[supp["s_nationkey"].astype(int) == natkey, "s_suppkey"]
            .to_numpy(np.int64)
        )
        keys_ref = ray.put(keys)
        line = read_parquet_sized(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice",
                     "l_discount"],
        )

        def partial(t: pa.Table) -> pa.Table:
            sks = ray.get(keys_ref)
            t = t.combine_chunks()
            if not len(sks):
                return pa.Table.from_pylist([], schema=part_schema)
            lsk = _np(t["l_suppkey"]).astype(np.int64)
            pos = np.searchsorted(sks, lsk)
            ok = (pos < len(sks)) & (
                sks[np.minimum(pos, len(sks) - 1)] == lsk
            )
            if not ok.any():
                return pa.Table.from_pylist([], schema=part_schema)
            val_u = _micros(
                _np(t["l_extendedprice"])[ok]
                * (1.0 - _np(t["l_discount"])[ok])
            )
            return combine(_np(t["l_partkey"]).astype(np.int64)[ok], val_u)

        partials = line.map_batches(partial, batch_format="pyarrow",
                                    batch_size=1_048_576)
    else:
        supp_ds = read_parquet_sized(
            f"{sf_dir}/supplier.parquet",
            columns=["s_suppkey", "s_nationkey"],
        ).map_batches(
            lambda t: t.filter(
                pa.compute.equal(t["s_nationkey"], natkey)
            ).select(["s_suppkey"]),
            batch_format="pyarrow",
        )
        line = read_parquet_sized(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice",
                     "l_discount"],
        )
        j = keyed_equijoin(line, supp_ds, on=("l_suppkey", "s_suppkey"),
                           buckets=buckets)

        def partial_joined(t: pa.Table) -> pa.Table:
            t = t.combine_chunks()
            if t.num_rows == 0:
                return pa.Table.from_pylist([], schema=part_schema)
            val_u = _micros(
                _np(t["l_extendedprice"]) * (1.0 - _np(t["l_discount"]))
            )
            return combine(_np(t["l_partkey"]).astype(np.int64), val_u)

        partials = j.map_batches(partial_joined, batch_format="pyarrow",
                                 batch_size=1_048_576)

    agg_schema = pa.schema([("pkey", pa.int64()), ("value_u", pa.int64())])

    def merge(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=agg_schema)
        pk = _np(t["pkey"])
        vu = _np(t["value_u"])
        order = np.argsort(pk, kind="stable")
        ks = pk[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        sums = np.add.reduceat(vu[order], starts)
        return pa.table(
            {"pkey": pa.array(ks[starts], pa.int64()),
             "value_u": pa.array(sums, pa.int64())},
            schema=agg_schema,
        )

    agg = (
        partials.groupby("prt")
        .map_groups(lambda g: merge(g.drop_columns(["prt"])),
                    batch_format="pyarrow")
        .materialize()  # part-cardinality-sized: enables the 2nd pass
    )
    total_u = agg.sum("value_u") or 0
    threshold = total_u * fraction  # identical IEEE multiply as oracle

    out_schema = pa.schema(
        [("p_partkey", pa.int64()), ("value", pa.float64())]
    )

    def having(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        vu = _np(t["value_u"])
        m = vu > threshold
        return pa.table(
            {"p_partkey": pa.array(_np(t["pkey"])[m], pa.int64()),
             "value": pa.array(vu[m] / 1e6, pa.float64())},
            schema=out_schema,
        )

    return agg.map_batches(having, batch_format="pyarrow")


Q11_SQL = """
WITH v AS (
  SELECT l_partkey,
         SUM(CAST(round(l_extendedprice*(1-l_discount)*1000000,0) AS BIGINT))
           AS value_u
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey)
SELECT l_partkey::BIGINT AS p_partkey, value_u/1000000.0 AS value
FROM v
WHERE value_u > (SELECT sum(value_u) FROM v) * 0.001
"""


# ---------------------------------------------------------------------------
# Q20 shape: nested IN + correlated scalar (more-than-half-of-demand)
# ---------------------------------------------------------------------------

_Q20_LO = np.datetime64("1996-01-01T00:00:00.000000").astype(np.int64)
_Q20_HI = np.datetime64("1997-01-01T00:00:00.000000").astype(np.int64)


def q20_dominant_suppliers(sf_dir: str, prefix: str = "red",
                           buckets: int | None = None,
                           broadcast: bool | None = None):
    """TPC-H Q20 shape: suppliers who shipped MORE THAN HALF of some
    ``prefix``-named part's total 1996 quantity -- the nested
    ``IN (... HAVING agg > correlated scalar subquery)`` composition
    (availqty-vs-half-demand without partsupp).

    Scale shape: the name-filtered partkey set broadcasts behind the
    stat guard (fallback: partitioned equijoin); per-batch combiners
    fold to (partkey, suppkey, qty_u); ONE hash(partkey) exchange
    colocates each part's suppliers so the correlated per-part total and
    the >half test are one vectorized segment scan; the surviving
    suppkey set is tiny and the name attach scans supplier once with it
    broadcast.  Quantities ride int64 micro-units; the half test is the
    exact integer compare ``2*q_u > total_u``.
    """
    import ray

    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/lineitem.parquet")
    if broadcast is None:
        broadcast = _fits_broadcast(f"{sf_dir}/part.parquet")

    trip_schema = pa.schema(
        [("pkey", pa.int64()), ("skey", pa.int64()),
         ("q_u", pa.int64()), ("prt", pa.int64())]
    )

    def combine(pkey: np.ndarray, skey: np.ndarray,
                q_u: np.ndarray) -> pa.Table:
        order = np.lexsort((skey, pkey))
        p_s, s_s, q_s = pkey[order], skey[order], q_u[order]
        first = np.concatenate(
            ([True], (p_s[1:] != p_s[:-1]) | (s_s[1:] != s_s[:-1]))
        )
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(q_s, starts)
        up, us = p_s[starts], s_s[starts]
        return pa.table(
            {"pkey": pa.array(up, pa.int64()),
             "skey": pa.array(us, pa.int64()),
             "q_u": pa.array(sums, pa.int64()),
             "prt": pa.array(hash_prt(up, buckets), pa.int64())},
            schema=trip_schema,
        )

    if broadcast:
        part = pd.read_parquet(f"{sf_dir}/part.parquet",
                               columns=["p_partkey", "p_name"])
        pkeys = np.sort(
            part.loc[part["p_name"].str.startswith(prefix), "p_partkey"]
            .to_numpy(np.int64)
        )
        pkeys_ref = ray.put(pkeys)
        line = read_parquet_sized(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        )

        def partial(t: pa.Table) -> pa.Table:
            pks = ray.get(pkeys_ref)
            t = t.combine_chunks()
            if not len(pks):
                return pa.Table.from_pylist([], schema=trip_schema)
            ship = _ts_us(t["l_shipdate"])
            lpk = _np(t["l_partkey"]).astype(np.int64)
            pos = np.searchsorted(pks, lpk)
            m = (
                (ship >= _Q20_LO) & (ship < _Q20_HI)
                & (pos < len(pks))
                & (pks[np.minimum(pos, len(pks) - 1)] == lpk)
            )
            if not m.any():
                return pa.Table.from_pylist([], schema=trip_schema)
            return combine(
                lpk[m], _np(t["l_suppkey"]).astype(np.int64)[m],
                _micros(_np(t["l_quantity"])[m]),
            )

        partials = line.map_batches(partial, batch_format="pyarrow",
                                    batch_size=1_048_576)
    else:
        part_ds = read_parquet_sized(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
        ).map_batches(
            lambda t: t.filter(
                pa.compute.starts_with(
                    t["p_name"].combine_chunks().cast(pa.string()), prefix
                )
            ).select(["p_partkey"]),
            batch_format="pyarrow",
        )
        line = read_parquet_sized(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        )
        j = keyed_equijoin(line, part_ds, on=("l_partkey", "p_partkey"),
                           buckets=buckets)

        def partial_joined(t: pa.Table) -> pa.Table:
            t = t.combine_chunks()
            if t.num_rows == 0:
                return pa.Table.from_pylist([], schema=trip_schema)
            ship = _ts_us(t["l_shipdate"])
            m = (ship >= _Q20_LO) & (ship < _Q20_HI)
            if not m.any():
                return pa.Table.from_pylist([], schema=trip_schema)
            return combine(
                _np(t["l_partkey"]).astype(np.int64)[m],
                _np(t["l_suppkey"]).astype(np.int64)[m],
                _micros(_np(t["l_quantity"])[m]),
            )

        partials = j.map_batches(partial_joined, batch_format="pyarrow",
                                 batch_size=1_048_576)

    win_schema = pa.schema([("skey", pa.int64())])

    def part_winners(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=win_schema)
        pk, sk, qu = _np(t["pkey"]), _np(t["skey"]), _np(t["q_u"])
        order = np.lexsort((sk, pk))
        p_s, s_s, q_s = pk[order], sk[order], qu[order]
        first = np.concatenate(
            ([True], (p_s[1:] != p_s[:-1]) | (s_s[1:] != s_s[:-1]))
        )
        starts = np.flatnonzero(first)
        q_ps = np.add.reduceat(q_s, starts)  # per (part, supplier)
        up = p_s[starts]
        pstarts = np.flatnonzero(
            np.concatenate(([True], up[1:] != up[:-1]))
        )
        pn = np.diff(np.append(pstarts, len(up)))
        tot = np.repeat(np.add.reduceat(q_ps, pstarts), pn)  # per part
        win = 2 * q_ps > tot
        sks = np.unique(s_s[starts][win])
        return pa.table({"skey": pa.array(sks, pa.int64())},
                        schema=win_schema)

    winners = (
        partials.groupby("prt")
        .map_groups(lambda g: part_winners(g.drop_columns(["prt"])),
                    batch_format="pyarrow")
    )
    # winner suppkey set is bounded by supplier cardinality and in
    # practice tiny: dedupe + name-attach via one supplier scan
    from ..util import dataset_to_table

    wt = dataset_to_table(winners)
    wset_ref = ray.put(np.unique(
        wt["skey"].to_numpy(zero_copy_only=False)
        if wt.num_rows else np.empty(0, np.int64)
    ))

    out_schema = pa.schema([("s_suppkey", pa.int64()),
                            ("s_name", pa.string())])

    def attach(t: pa.Table) -> pa.Table:
        ws = ray.get(wset_ref)
        t = t.combine_chunks()
        if not len(ws) or t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        sk = _np(t["s_suppkey"]).astype(np.int64)
        pos = np.searchsorted(ws, sk)
        ok = (pos < len(ws)) & (ws[np.minimum(pos, len(ws) - 1)] == sk)
        return pa.table(
            {"s_suppkey": pa.array(sk[ok], pa.int64()),
             "s_name": t["s_name"].combine_chunks().filter(
                 pa.array(ok)).cast(pa.string())},
            schema=out_schema,
        )

    supp = read_parquet_sized(f"{sf_dir}/supplier.parquet",
                              columns=["s_suppkey", "s_name"])
    return supp.map_batches(attach, batch_format="pyarrow")


Q20_SQL = """
SELECT s.s_suppkey::BIGINT AS s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT ps.l_suppkey FROM (
    SELECT l_suppkey, l_partkey,
           SUM(CAST(round(l_quantity*1000000,0) AS BIGINT)) AS q_u
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'red%'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1, 2) ps
  WHERE 2*ps.q_u > (
    SELECT SUM(CAST(round(l2.l_quantity*1000000,0) AS BIGINT))
    FROM lineitem l2
    WHERE l2.l_partkey = ps.l_partkey
      AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l2.l_shipdate <  TIMESTAMP '1997-01-01'))
"""


# ---------------------------------------------------------------------------
# Q21 shape: EXISTS + NOT EXISTS (only-late supplier on shared orders)
# ---------------------------------------------------------------------------

def q21_waiting_suppliers(sf_dir: str, nation: str = "NATION_3",
                          late_days: int = 60,
                          buckets: int | None = None,
                          broadcast: bool | None = None):
    """TPC-H Q21 shape: per supplier of ``nation``, how many of its LATE
    lineitems (shipped > ``late_days`` after the order date) sit on a
    finished multi-supplier order where NO OTHER supplier was late --
    the double EXISTS / NOT-EXISTS composition.

    Scale shape: q5-style union-tag join -- orders('F') rows and
    lineitem rows meet in ONE hash(orderkey) exchange; the partition
    kernel resolves order dates by binary search, folds to per
    (order, supplier) late/any counts, and applies the EXISTS logic as
    one segment scan per order (>=2 distinct suppliers AND exactly one
    late supplier).  Qualifying (suppkey, n_late) pairs are
    supplier-cardinality-bounded; the nation filter + name attach scans
    supplier once behind the broadcast guard (fallback: partitioned
    equijoin of the tiny result).
    """
    import ray

    if buckets is None:
        buckets = suggest_buckets(
            f"{sf_dir}/orders.parquet", f"{sf_dir}/lineitem.parquet"
        )
    if broadcast is None:
        broadcast = _fits_broadcast(f"{sf_dir}/supplier.parquet")
    natkey = _nation_key(sf_dir, nation)
    late_us = late_days * _US_PER_DAY

    union_schema = pa.schema(
        [("key", pa.int64()), ("side", pa.int8()), ("a", pa.int64()),
         ("b", pa.int64()), ("prt", pa.int64())]
    )

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderstatus"],
    )

    def tag_orders(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        st = t["o_orderstatus"].combine_chunks().cast(pa.string())
        m = pa.compute.equal(st, "F").to_numpy(zero_copy_only=False)
        okey = _np(t["o_orderkey"]).astype(np.int64)[m]
        odate = _ts_us(t["o_orderdate"])[m]
        n = len(okey)
        return pa.table(
            {"key": pa.array(okey, pa.int64()),
             "side": pa.array(np.zeros(n, np.int8), pa.int8()),
             "a": pa.array(odate, pa.int64()),
             "b": pa.array(np.zeros(n, np.int64), pa.int64()),
             "prt": pa.array(hash_prt(okey, buckets), pa.int64())},
            schema=union_schema,
        )

    line = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )

    def tag_line(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        okey = _np(t["l_orderkey"]).astype(np.int64)
        n = len(okey)
        return pa.table(
            {"key": pa.array(okey, pa.int64()),
             "side": pa.array(np.ones(n, np.int8), pa.int8()),
             "a": pa.array(_ts_us(t["l_shipdate"]), pa.int64()),
             "b": pa.array(_np(t["l_suppkey"]).astype(np.int64),
                           pa.int64()),
             "prt": pa.array(hash_prt(okey, buckets), pa.int64())},
            schema=union_schema,
        )

    pair_schema = pa.schema(
        [("skey", pa.int64()), ("n_late", pa.int64())]
    )

    def match_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=pair_schema)
        key = _np(t["key"])
        side = _np(t["side"])
        a = _np(t["a"])
        b = _np(t["b"])
        om = side == 0
        okeys, odates = key[om], a[om]
        oo = np.argsort(okeys, kind="stable")
        okeys, odates = okeys[oo], odates[oo]
        lkey, lship, lsk = key[~om], a[~om], b[~om]
        if not len(okeys) or not len(lkey):
            return pa.Table.from_pylist([], schema=pair_schema)
        pos = np.searchsorted(okeys, lkey)
        hit = (pos < len(okeys)) & (
            okeys[np.minimum(pos, len(okeys) - 1)] == lkey
        )
        if not hit.any():
            return pa.Table.from_pylist([], schema=pair_schema)
        lkey, lship, lsk = lkey[hit], lship[hit], lsk[hit]
        late = lship > odates[pos[hit]] + late_us
        # per (order, supplier): any/late counts
        order = np.lexsort((lsk, lkey))
        k_s, s_s, late_s = lkey[order], lsk[order], late[order]
        first = np.concatenate(
            ([True], (k_s[1:] != k_s[:-1]) | (s_s[1:] != s_s[:-1]))
        )
        starts = np.flatnonzero(first)
        n_late = np.add.reduceat(late_s.astype(np.int64), starts)
        uo, us = k_s[starts], s_s[starts]
        # per order: distinct suppliers, distinct LATE suppliers
        ostarts = np.flatnonzero(
            np.concatenate(([True], uo[1:] != uo[:-1]))
        )
        on = np.diff(np.append(ostarts, len(uo)))
        nsup = np.repeat(on, on)
        nlate_sup = np.repeat(
            np.add.reduceat((n_late > 0).astype(np.int64), ostarts), on
        )
        qual = (n_late > 0) & (nsup >= 2) & (nlate_sup == 1)
        if not qual.any():
            return pa.Table.from_pylist([], schema=pair_schema)
        # fold to per-supplier partials before leaving the partition
        qs, qn = us[qual], n_late[qual]
        sorder = np.argsort(qs, kind="stable")
        ss = qs[sorder]
        sstarts = np.flatnonzero(
            np.concatenate(([True], ss[1:] != ss[:-1]))
        )
        return pa.table(
            {"skey": pa.array(ss[sstarts], pa.int64()),
             "n_late": pa.array(
                 np.add.reduceat(qn[sorder], sstarts), pa.int64())},
            schema=pair_schema,
        )

    pairs = (
        orders.map_batches(tag_orders, batch_format="pyarrow",
                           batch_size=1_048_576)
        .union(line.map_batches(tag_line, batch_format="pyarrow",
                                batch_size=1_048_576))
        .groupby("prt")
        .map_groups(lambda g: match_partition(g.drop_columns(["prt"])),
                    batch_format="pyarrow")
    )

    # supplier-cardinality-bounded partials -> nation filter + name attach
    import ray as _ray

    if broadcast:
        supp = pd.read_parquet(
            f"{sf_dir}/supplier.parquet",
            columns=["s_suppkey", "s_name", "s_nationkey"],
        )
        supp = supp[supp["s_nationkey"].astype(int) == natkey]
        sk = supp["s_suppkey"].to_numpy(np.int64)
        so = np.argsort(sk, kind="stable")
        dims_ref = _ray.put(
            (sk[so], supp["s_name"].to_numpy(object)[so])
        )

        out_schema = pa.schema(
            [("s_name", pa.string()), ("numwait", pa.int64())]
        )

        def finalize(t: pa.Table) -> pa.Table:
            sks, snames = _ray.get(dims_ref)
            t = t.combine_chunks()
            if t.num_rows == 0:
                return pa.Table.from_pylist([], schema=out_schema)
            sk_ = _np(t["skey"])
            nl = _np(t["n_late"])
            if not len(sks):
                return pa.Table.from_pylist([], schema=out_schema)
            pos = np.searchsorted(sks, sk_)
            ok = (pos < len(sks)) & (
                sks[np.minimum(pos, len(sks) - 1)] == sk_
            )
            if not ok.any():
                return pa.Table.from_pylist([], schema=out_schema)
            sk_, nl, pos = sk_[ok], nl[ok], pos[ok]
            order = np.argsort(sk_, kind="stable")
            ss, nn = sk_[order], nl[order]
            starts = np.flatnonzero(
                np.concatenate(([True], ss[1:] != ss[:-1]))
            )
            sums = np.add.reduceat(nn, starts)
            names = [str(snames[p]) for p in pos[order][starts]]
            return pa.table(
                {"s_name": pa.array(names, pa.string()),
                 "numwait": pa.array(sums, pa.int64())},
                schema=out_schema,
            )

        return pairs.map_batches(
            lambda t: t.append_column(
                "g", pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
            ),
            batch_format="pyarrow",
        ).groupby("g").map_groups(
            lambda g: finalize(g.drop_columns(["g"])),
            batch_format="pyarrow",
        )

    # fallback: partitioned equijoin of the TINY pair table vs supplier
    supp_ds = read_parquet_sized(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey"],
    ).map_batches(
        lambda t: t.filter(pa.compute.equal(t["s_nationkey"], natkey))
        .select(["s_suppkey", "s_name"]),
        batch_format="pyarrow",
    )
    j = keyed_equijoin(pairs, supp_ds, on=("skey", "s_suppkey"),
                       buckets=max(4, buckets // 8))

    out_schema = pa.schema(
        [("s_name", pa.string()), ("numwait", pa.int64())]
    )

    def final_join(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        names = t["s_name"].combine_chunks().cast(pa.string())
        codes = names.dictionary_encode()
        idx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nl = _np(t["n_late"])
        order = np.argsort(idx, kind="stable")
        is_, ns_ = idx[order], nl[order]
        starts = np.flatnonzero(
            np.concatenate(([True], is_[1:] != is_[:-1]))
        )
        sums = np.add.reduceat(ns_, starts)
        return pa.table(
            {"s_name": codes.dictionary.take(
                pa.array(is_[starts])).cast(pa.string()),
             "numwait": pa.array(sums, pa.int64())},
            schema=out_schema,
        )

    return j.map_batches(
        lambda t: t.append_column(
            "g", pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
        ),
        batch_format="pyarrow",
    ).groupby("g").map_groups(
        lambda g: final_join(g.drop_columns(["g"])),
        batch_format="pyarrow",
    )


Q21_SQL = """
WITH l AS (
  SELECT l_orderkey AS okey, l_suppkey AS skey,
         (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'),
q AS (
  SELECT l1.okey, l1.skey, count(*) AS n_late
  FROM l l1
  WHERE l1.late
    AND EXISTS (SELECT 1 FROM l l2
                WHERE l2.okey = l1.okey AND l2.skey <> l1.skey)
    AND NOT EXISTS (SELECT 1 FROM l l3
                    WHERE l3.okey = l1.okey AND l3.skey <> l1.skey
                      AND l3.late)
  GROUP BY 1, 2)
SELECT s_name, sum(q.n_late)::BIGINT AS numwait
FROM q
JOIN supplier ON s_suppkey = q.skey
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = 'NATION_3'
GROUP BY s_name
"""


# ---------------------------------------------------------------------------
# GROUP BY CUBE: all four granularities of (segment, nation) in one pass --
# completes the grouping-sets family next to segment_nation_rollup's ROLLUP
# ---------------------------------------------------------------------------

def segment_nation_cube(sf_dir: str, broadcast: bool | None = None):
    """Order revenue at ALL FOUR granularities of (market segment,
    customer nation) -- per (segment, nation), per segment, per nation,
    and the grand total -- the ``GROUP BY CUBE`` shape.  Rolled-up key
    columns are NULL exactly as SQL emits them.

    Scale shape: identical to ``segment_nation_rollup``
    (relational_ext.py) -- ONE combiner pass over orders folds to
    (segment x nation)-cell micro-unit partials, the bounded merged
    domain finalizes in one task, and every coarser CUBE level is a
    dense scatter over that domain (segment margins, nation margins,
    grand total) -- no second scan of raw rows, no extra exchange.
    The customer dimension broadcasts behind the stat guard.
    """
    import ray
    from .relational_ext import _lookup

    if broadcast is None:
        broadcast = _fits_broadcast(f"{sf_dir}/customer.parquet")
    if not broadcast:
        raise ValueError(
            "segment_nation_cube: customer exceeds the broadcast guard; "
            "route the (custkey -> segment, nation) attach through "
            "keyed_equijoin (revenue_by_nation shows the fallback wiring)"
        )
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_nationkey"],
    )
    ck = cust["c_custkey"].to_numpy().astype(np.int64)
    order = np.argsort(ck, kind="stable")
    segs = sorted(cust["c_mktsegment"].unique())
    seg_rank = {s: i for i, s in enumerate(segs)}
    seg_code = np.array(
        [seg_rank[s] for s in cust["c_mktsegment"].to_numpy()[order]],
        dtype=np.int64,
    )
    nat_code = cust["c_nationkey"].to_numpy().astype(np.int64)[order]
    nseg = len(segs)
    nnat = int(nat_code.max()) + 1
    ref = ray.put((ck[order], seg_code * nnat + nat_code))

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        keys, cell_of_cust = ray.get(ref)
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {"cell": pa.nulls(0, pa.int64()),
                 "rev_u": pa.nulls(0, pa.int64()),
                 "n": pa.nulls(0, pa.int64())}
            )
        probes = _np(t["o_custkey"]).astype(np.int64)
        pos = _lookup(keys, probes, "segment_nation_cube o_custkey")
        cell = cell_of_cust[pos]
        rev = _micros(_np(t["o_totalprice"]))
        acc = np.zeros(nseg * nnat, dtype=np.int64)
        np.add.at(acc, cell, rev)
        cnt = np.bincount(cell, minlength=nseg * nnat)
        seen = np.flatnonzero(cnt)
        return pa.table(
            {
                "cell": pa.array(seen, pa.int64()),
                "rev_u": pa.array(acc[seen], pa.int64()),
                "n": pa.array(cnt[seen].astype(np.int64), pa.int64()),
            }
        )

    parts = orders.map_batches(partial, batch_format="pyarrow")

    def finalize(t: pa.Table) -> pa.Table:
        # merged finest-level cells -> all four CUBE levels; O(domain)
        t = t.combine_chunks()
        cell = _np(t["cell"])
        acc = np.zeros(nseg * nnat, dtype=np.int64)
        np.add.at(acc, cell, _np(t["rev_u"]))
        cnt = np.zeros(nseg * nnat, dtype=np.int64)
        np.add.at(cnt, cell, _np(t["n"]))
        seen = np.flatnonzero(cnt)
        seg_s, nat_s = seen // nnat, seen % nnat
        # level (segment, nation)
        seg_col = [segs[i] for i in seg_s]
        nat_col: list = list(nat_s)
        rev_col = list(acc[seen])
        n_col = list(cnt[seen])
        # level (segment, NULL)
        m = np.zeros(nseg, dtype=np.int64)
        np.add.at(m, seg_s, acc[seen])
        c1 = np.zeros(nseg, dtype=np.int64)
        np.add.at(c1, seg_s, cnt[seen])
        live = np.flatnonzero(c1)
        seg_col += [segs[i] for i in live]
        nat_col += [None] * len(live)
        rev_col += list(m[live])
        n_col += list(c1[live])
        # level (NULL, nation) -- the margin ROLLUP lacks
        mn = np.zeros(nnat, dtype=np.int64)
        np.add.at(mn, nat_s, acc[seen])
        cn = np.zeros(nnat, dtype=np.int64)
        np.add.at(cn, nat_s, cnt[seen])
        nlive = np.flatnonzero(cn)
        seg_col += [None] * len(nlive)
        nat_col += list(nlive)
        rev_col += list(mn[nlive])
        n_col += list(cn[nlive])
        # level (NULL, NULL)
        seg_col += [None]
        nat_col += [None]
        rev_col += [int(acc.sum())]
        n_col += [int(cnt.sum())]
        from .relational import MICRO

        return pa.table(
            {
                "c_mktsegment": pa.array(seg_col, pa.string()),
                "c_nationkey": pa.array(
                    [None if x is None else int(x) for x in nat_col],
                    pa.int64(),
                ),
                "revenue": pa.array(
                    [u / MICRO for u in rev_col], pa.float64()
                ),
                "orders": pa.array([int(x) for x in n_col], pa.int64()),
            }
        )

    return parts.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


SEGMENT_NATION_CUBE_SQL = """
SELECT c.c_mktsegment, c.c_nationkey::BIGINT AS c_nationkey,
       SUM(CAST(round(o.o_totalprice * 1000000, 0) AS BIGINT)) / 1000000.0
         AS revenue,
       count(*)::BIGINT AS orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY CUBE (c.c_mktsegment, c.c_nationkey)
"""
