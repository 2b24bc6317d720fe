"""Fourth relational wave: the remaining TPC-H shapes expressible on this
schema (no partsupp table, no commit/receipt dates) — Q15's
aggregate-then-global-max with ties, Q16's grouped COUNT(DISTINCT) over a
dimension-filtered join, and Q2's correlated per-key minimum with winner
attribution.

House rules as in ``relational.py`` / ``relational_w3.py``: money rides
int64 micro-units (order-insensitive sums, bit-exact vs the DuckDB
oracle), dimensions broadcast only behind the ``_fits_broadcast`` stat
guard with a partitioned ``keyed_equijoin`` fallback, and every per-batch
kernel is a vectorized combiner so rows crossing an exchange are bounded
by key cardinality, not input size.

Reference parity: exercises the same generic join/aggregate machinery the
earlier waves cover; the reference's own relational surface is dict/interval
lookups (/root/reference/caits/performance/detection.py:98-160).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.readers import read_parquet_sized, suggest_buckets
from ..stages.joins import hash_prt, keyed_equijoin
from ..util import dataset_to_table
from .relational import MICRO, _fits_broadcast, _micros
from .relational_ext import _np, _ts_us

# ---------------------------------------------------------------------------
# Q15 shape: revenue per supplier in a quarter -> suppliers at the global max
# ---------------------------------------------------------------------------

_Q15_LO = np.datetime64("1996-01-01T00:00:00.000000").astype(np.int64)
_Q15_HI = np.datetime64("1996-04-01T00:00:00.000000").astype(np.int64)


def q15_top_supplier(sf_dir: str, buckets: int | None = None):
    """Supplier(s) with the maximum revenue over 1996Q1 shipments (TPC-H
    Q15: the ``revenue0`` view + ``total_revenue = (SELECT max ...)``
    correlated filter), with supplier names attached.

    Scale shape: per-batch (suppkey, rev_u) combiner -> ONE hash exchange
    -> per-partition segment merge that emits ONLY the partition's
    max-tied rows (the global winners are necessarily partition winners)
    -> constant-key finalize of the tiny candidate set.  Names attach by
    scanning supplier with the winner set broadcast — never the reverse,
    so nothing grows with supplier cardinality.
    """
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/lineitem.parquet")

    part_schema = pa.schema(
        [("skey", pa.int64()), ("rev_u", pa.int64()), ("prt", pa.int64())]
    )

    line = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        ship = _ts_us(t["l_shipdate"])
        m = (ship >= _Q15_LO) & (ship < _Q15_HI)
        if not m.any():
            return pa.Table.from_pylist([], schema=part_schema)
        sk = _np(t["l_suppkey"]).astype(np.int64)[m]
        rev = _micros(
            _np(t["l_extendedprice"])[m] * (1.0 - _np(t["l_discount"])[m])
        )
        order = np.argsort(sk, kind="stable")
        ks = sk[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        sums = np.add.reduceat(rev[order], starts)
        uk = ks[starts]
        return pa.table(
            {
                "skey": pa.array(uk, pa.int64()),
                "rev_u": pa.array(sums, pa.int64()),
                "prt": pa.array(hash_prt(uk, buckets), pa.int64()),
            },
            schema=part_schema,
        )

    cand_schema = pa.schema([("skey", pa.int64()), ("rev_u", pa.int64())])

    def partition_winners(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=cand_schema)
        sk = _np(t["skey"])
        rev = _np(t["rev_u"])
        order = np.argsort(sk, kind="stable")
        ks = sk[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        sums = np.add.reduceat(rev[order], starts)
        mx = sums.max()
        win = sums == mx
        return pa.table(
            {
                "skey": pa.array(ks[starts][win], pa.int64()),
                "rev_u": pa.array(sums[win], pa.int64()),
            },
            schema=cand_schema,
        )

    cands = (
        line.map_batches(
            partial, batch_format="pyarrow", batch_size=1_048_576
        )
        .groupby("prt")
        .map_groups(
            lambda g: partition_winners(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )
    # candidate set is <= one row per partition — driver-side is bounded
    ct = dataset_to_table(cands)
    # zero matching rows can surface as a zero-COLUMN table through the
    # exchange, so probe the schema before the columns
    if ct.num_rows == 0 or "skey" not in ct.schema.names:
        winners = np.empty(0, np.int64)
        win_rev = float("nan")
    else:
        sk = ct["skey"].to_numpy(zero_copy_only=False)
        rev = ct["rev_u"].to_numpy(zero_copy_only=False)
        mx = rev.max()
        winners = np.sort(sk[rev == mx])
        win_rev = float(mx) / MICRO

    out_schema = pa.schema(
        [("s_suppkey", pa.int64()), ("s_name", pa.string()),
         ("total_revenue", pa.float64())]
    )

    def attach(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if len(winners) == 0:  # empty window: empty result, like the oracle
            return pa.Table.from_pylist([], schema=out_schema)
        skv = _np(t["s_suppkey"]).astype(np.int64)
        pos = np.searchsorted(winners, skv)
        hit = (pos < len(winners)) & (
            winners[np.minimum(pos, len(winners) - 1)] == skv
        )
        if not hit.any():
            return pa.Table.from_pylist([], schema=out_schema)
        sel = t.filter(pa.array(hit))
        return pa.table(
            {
                "s_suppkey": sel["s_suppkey"].cast(pa.int64()),
                "s_name": sel["s_name"],
                "total_revenue": pa.array(
                    np.full(sel.num_rows, win_rev), pa.float64()
                ),
            },
            schema=out_schema,
        )

    sup = read_parquet_sized(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    return sup.map_batches(attach, batch_format="pyarrow")


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(round(l_extendedprice * (1 - l_discount) * 1000000, 0)
             AS BIGINT)) AS rev_u
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey::BIGINT AS s_suppkey, s.s_name,
       r.rev_u / 1000000.0 AS total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rev_u = (SELECT max(rev_u) FROM rev)
"""


# ---------------------------------------------------------------------------
# Q16 shape: supplier variety per (brand, size) over a filtered part join
# ---------------------------------------------------------------------------

_Q16_EXCL_BRAND = "Brand#45"
_Q16_EXCL_TYPE = "MEDIUM"


def part_supplier_variety(
    sf_dir: str, buckets: int | None = None, broadcast: bool | None = None
):
    """How many distinct suppliers ship each (brand, size) — TPC-H Q16's
    grouped COUNT(DISTINCT) with brand/type exclusion filters, computed
    from lineitem (this schema has no partsupp).

    Scale shape: part's (partkey -> brand-code, size) map broadcasts
    behind the stat guard (keyed-equijoin fallback otherwise); batches
    dedupe (brand, size, suppkey) triples BEFORE the exchange, which
    hashes on SUPPKEY so each triple lands in exactly one partition —
    per-partition counts are additive, and the final (brand, size) merge
    moves only brand x size rows.
    """
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/lineitem.parquet")
    if broadcast is None:
        broadcast = _fits_broadcast(f"{sf_dir}/part.parquet")

    triple_schema = pa.schema(
        [("bcode", pa.int64()), ("size", pa.int64()), ("skey", pa.int64()),
         ("prt", pa.int64())]
    )

    # brand dictionary is tiny (25 values at every TPC-H scale) and ships
    # with every task either way; derive it from ONE column read so the
    # full partkey -> (code, size) map only materializes driver-side in
    # the broadcast arm the stat guard approved
    import pyarrow.parquet as pq

    brands = np.sort(
        np.unique(
            pq.read_table(f"{sf_dir}/part.parquet", columns=["p_brand"])[
                "p_brand"
            ].to_numpy(zero_copy_only=False)
        )
    )

    def dedupe_triples(
        sk: np.ndarray, bcode: np.ndarray, size: np.ndarray
    ) -> pa.Table:
        if len(sk) and sk.max() >= (1 << 32):
            # the (group, suppkey) bit-packing below assumes 32-bit
            # suppkeys (TPC-H sf100 tops out at ~1M); widen loudly
            raise ValueError("suppkey exceeds 32-bit packing range")
        if len(size) and (size.max() >= 64 or size.min() < 0):
            # size rides the low 6 bits of the group key; out-of-range
            # sizes would silently corrupt (brand, size) groups
            raise ValueError("p_size outside [0, 64) packing range")
        key = (bcode * 64 + size) * (1 << 32) + sk
        order = np.argsort(key, kind="stable")
        ks = key[order]
        first = np.concatenate(([True], ks[1:] != ks[:-1]))
        sel = order[first]
        return pa.table(
            {
                "bcode": pa.array(bcode[sel], pa.int64()),
                "size": pa.array(size[sel], pa.int64()),
                "skey": pa.array(sk[sel], pa.int64()),
                "prt": pa.array(hash_prt(sk[sel], buckets), pa.int64()),
            },
            schema=triple_schema,
        )

    if broadcast:
        part = pd.read_parquet(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_brand", "p_type", "p_size"],
        )
        keep = (part["p_brand"] != _Q16_EXCL_BRAND) & (
            part["p_type"] != _Q16_EXCL_TYPE
        )
        sel_part = part.loc[keep]
        pkeys = sel_part["p_partkey"].to_numpy(np.int64)
        order = np.argsort(pkeys)
        pkeys = pkeys[order]
        pb = np.searchsorted(
            brands, sel_part["p_brand"].to_numpy()
        )[order].astype(np.int64)
        psz = sel_part["p_size"].to_numpy(np.int64)[order]

        def triples(t: pa.Table) -> pa.Table:
            t = t.combine_chunks()
            if len(pkeys) == 0:  # filters excluded every part
                return pa.Table.from_pylist([], schema=triple_schema)
            pk = _np(t["l_partkey"]).astype(np.int64)
            pos = np.searchsorted(pkeys, pk)
            hit = (pos < len(pkeys)) & (
                pkeys[np.minimum(pos, len(pkeys) - 1)] == pk
            )
            if not hit.any():
                return pa.Table.from_pylist([], schema=triple_schema)
            sk = _np(t["l_suppkey"]).astype(np.int64)[hit]
            p = pos[hit]
            return dedupe_triples(sk, pb[p], psz[p])

        rows = read_parquet_sized(
            f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
        ).map_batches(triples, batch_format="pyarrow", batch_size=1_048_576)
    else:
        part_ds = read_parquet_sized(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_brand", "p_type", "p_size"],
        ).map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.not_equal(t["p_brand"], _Q16_EXCL_BRAND),
                    pc.not_equal(t["p_type"], _Q16_EXCL_TYPE),
                )
            ).select(["p_partkey", "p_brand", "p_size"]),
            batch_format="pyarrow",
        )
        j = keyed_equijoin(
            read_parquet_sized(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_partkey", "l_suppkey"],
            ),
            part_ds,
            on=("l_partkey", "p_partkey"),
            buckets=buckets,
            schemas=(
                pa.schema(
                    [("l_partkey", pa.int64()), ("l_suppkey", pa.int64())]
                ),
                pa.schema(
                    [("p_partkey", pa.int64()), ("p_brand", pa.string()),
                     ("p_size", pa.int64())]
                ),
            ),
        )

        def triples_joined(t: pa.Table) -> pa.Table:
            t = t.combine_chunks()
            if t.num_rows == 0:
                return pa.Table.from_pylist([], schema=triple_schema)
            sk = _np(t["l_suppkey"]).astype(np.int64)
            bcode = np.searchsorted(
                brands, t["p_brand"].to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            size = _np(t["p_size"]).astype(np.int64)
            return dedupe_triples(sk, bcode, size)

        rows = j.map_batches(triples_joined, batch_format="pyarrow")

    part_cnt_schema = pa.schema(
        [("bcode", pa.int64()), ("size", pa.int64()), ("cnt", pa.int64()),
         ("prt2", pa.int64())]
    )

    def count_partition(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=part_cnt_schema)
        bcode = _np(t["bcode"])
        size = _np(t["size"])
        sk = _np(t["skey"])
        key = (bcode * 64 + size) * (1 << 32) + sk
        order = np.argsort(key, kind="stable")
        ks = key[order]
        first = np.concatenate(([True], ks[1:] != ks[:-1]))
        gk = (ks >> 32)[first]
        ustarts = np.flatnonzero(
            np.concatenate(([True], gk[1:] != gk[:-1]))
        )
        cnt = np.diff(np.append(ustarts, len(gk)))
        ug = gk[ustarts]
        return pa.table(
            {
                "bcode": pa.array(ug // 64, pa.int64()),
                "size": pa.array(ug % 64, pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                "prt2": pa.array(hash_prt(ug, 16), pa.int64()),
            },
            schema=part_cnt_schema,
        )

    out_schema = pa.schema(
        [("p_brand", pa.string()), ("p_size", pa.int64()),
         ("supplier_cnt", pa.int64())]
    )

    def final(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        bcode = _np(t["bcode"])
        size = _np(t["size"])
        cnt = _np(t["cnt"])
        key = bcode * 64 + size
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        sums = np.add.reduceat(cnt[order], starts)
        uk = ks[starts]
        return pa.table(
            {
                "p_brand": pa.array(brands[(uk // 64)].astype(object)),
                "p_size": pa.array(uk % 64, pa.int64()),
                "supplier_cnt": pa.array(sums, pa.int64()),
            },
            schema=out_schema,
        )

    return (
        rows.groupby("prt")
        .map_groups(
            lambda g: count_partition(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
        .groupby("prt2")
        .map_groups(
            lambda g: final(g.drop_columns(["prt2"])),
            batch_format="pyarrow",
        )
    )


Q16_SQL = f"""
SELECT p.p_brand, p.p_size::BIGINT AS p_size,
       count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> '{_Q16_EXCL_BRAND}' AND p.p_type <> '{_Q16_EXCL_TYPE}'
GROUP BY p.p_brand, p.p_size
"""


# ---------------------------------------------------------------------------
# Q2 shape: per-part minimum price with winner-supplier attribution
# ---------------------------------------------------------------------------

def q2_min_price_supplier(sf_dir: str, buckets: int | None = None):
    """For every part: the minimum extended price any supplier shipped it
    at, and the winning supplier (lowest suppkey on price ties) — TPC-H
    Q2's correlated ``ps_supplycost = (SELECT min ...)`` shape mapped onto
    lineitem.

    Scale shape: the per-batch combiner keeps ONE row per partkey (the
    running (price, suppkey) argmin, total-order tiebreak), so the single
    hash exchange moves at most one row per (partkey x batch); the
    partition merge repeats the same vectorized first-of-run selection.
    """
    if buckets is None:
        buckets = suggest_buckets(f"{sf_dir}/lineitem.parquet")

    part_schema = pa.schema(
        [("pkey", pa.int64()), ("price_u", pa.int64()),
         ("skey", pa.int64()), ("prt", pa.int64())]
    )

    def argmin_rows(
        pk: np.ndarray, price: np.ndarray, sk: np.ndarray, with_prt: bool
    ):
        order = np.lexsort((sk, price, pk))
        pk_s = pk[order]
        first = np.concatenate(([True], pk_s[1:] != pk_s[:-1]))
        sel = order[first]
        cols = {
            "pkey": pa.array(pk[sel], pa.int64()),
            "price_u": pa.array(price[sel], pa.int64()),
            "skey": pa.array(sk[sel], pa.int64()),
        }
        if with_prt:
            cols["prt"] = pa.array(hash_prt(pk[sel], buckets), pa.int64())
        return cols

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=part_schema)
        pk = _np(t["l_partkey"]).astype(np.int64)
        price = _micros(_np(t["l_extendedprice"]))
        sk = _np(t["l_suppkey"]).astype(np.int64)
        return pa.table(
            argmin_rows(pk, price, sk, True), schema=part_schema
        )

    out_schema = pa.schema(
        [("p_partkey", pa.int64()), ("cheapest_suppkey", pa.int64()),
         ("min_price", pa.float64())]
    )

    def merge(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        cols = argmin_rows(
            _np(t["pkey"]), _np(t["price_u"]), _np(t["skey"]), False
        )
        return pa.table(
            {
                "p_partkey": cols["pkey"],
                "cheapest_suppkey": cols["skey"],
                "min_price": pa.array(
                    cols["price_u"].to_numpy(zero_copy_only=False) / MICRO,
                    pa.float64(),
                ),
            },
            schema=out_schema,
        )

    line = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_suppkey"],
    )
    return (
        line.map_batches(
            partial, batch_format="pyarrow", batch_size=1_048_576
        )
        .groupby("prt")
        .map_groups(
            lambda g: merge(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


Q2_SQL = """
WITH m AS (
  SELECT l_partkey,
         min(CAST(round(l_extendedprice * 1000000, 0) AS BIGINT)) AS min_u
  FROM lineitem GROUP BY l_partkey
)
SELECT m.l_partkey::BIGINT AS p_partkey,
       min(l.l_suppkey)::BIGINT AS cheapest_suppkey,
       m.min_u / 1000000.0 AS min_price
FROM lineitem l
JOIN m ON l.l_partkey = m.l_partkey
      AND CAST(round(l.l_extendedprice * 1000000, 0) AS BIGINT) = m.min_u
GROUP BY m.l_partkey, m.min_u
"""
