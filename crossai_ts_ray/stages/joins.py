"""Partitioned hash equi-join on int64 keys for Ray Datasets.

The keyed-join building block for pipelines that must combine two
datasets without broadcasting either side or materializing anything on the
driver (the scale path the near-dup verify / cluster-propagation / ANN
stages ride on).  Shape (SURVEY.md section 2.6, same as the
order_lineitem_join pattern in pipelines/relational.py but generic):

* both sides get ``prt = hash(key) % buckets`` (a plain column),
* are unioned under one widened schema (absent columns null-filled --
  all-null Arrow arrays are bitmap-only, so the union costs no payload),
* one keyed shuffle (``groupby("prt")``), and
* a per-bucket merge: key->index with pandas, payload taken zero-copy
  from the Arrow tables.

Communication is one all-to-all of (left + right) bytes -- no driver
round-trip, no ``ray.put`` of a dataset-sized object.  Skewed keys can be
salted by the caller (raise ``buckets`` or pre-split hot keys); buckets
should be sized ~= cluster cores.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_GOLD = np.int64(0x9E3779B1)


def hash_prt(keys: np.ndarray, buckets: int) -> np.ndarray:
    """Partition id from an int64 key: splitmix64-style avalanche mix, then
    mod.  A plain ``(key * odd) % 2^k`` depends only on the key's low k bits
    (multiplication mod a power of two never mixes high bits downward), which
    silently skews partitioning for structured keys -- always use this."""
    with np.errstate(over="ignore"):
        h = keys.astype(np.int64).view(np.uint64).copy()
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
        return (h % np.uint64(buckets)).astype(np.int64)


def _prt_of(keys: np.ndarray, buckets: int) -> np.ndarray:
    return hash_prt(keys, buckets)


def _ray_schema_to_arrow(ds) -> pa.Schema:
    s = ds.schema()
    return pa.schema(list(zip(s.names, s.types)))


def estimate_salt(
    left,
    key: str,
    buckets: int,
    sample_rows: int = 65536,
    max_salt: int = 16,
    hot_threshold: float = 1.5,
) -> int:
    """Sub-bucket count from a MEASURED hot-key fraction, not caller
    guesswork: sample the first ``sample_rows`` of the left side (streaming
    limit -- only the first blocks execute), one ``np.unique`` over the
    sampled keys, and size the salt so the hottest key's partition shrinks
    back to ~average.  The hottest key carrying fraction ``f`` of rows makes
    its partition ``f x buckets`` times the average; salt by that factor,
    clamped to [1, max_salt].  Below ``hot_threshold`` x average the skew
    isn't worth the salt's right-side replication, so return 1."""
    try:
        tb = left.limit(sample_rows).take_batch(
            sample_rows, batch_format="pyarrow"
        )
    except ValueError:  # take_batch raises on an EMPTY dataset (e.g. a
        return 1        # filter kept nothing) before any len-guard can run
    k = tb[key].to_numpy(zero_copy_only=False)
    if not len(k):
        return 1
    _, counts = np.unique(k, return_counts=True)
    imbalance = (counts.max() / len(k)) * buckets
    if imbalance < hot_threshold:
        return 1
    return int(min(max_salt, max(1, int(np.ceil(imbalance)))))


def keyed_equijoin(
    left,
    right,
    on: tuple[str, str],
    buckets: int = 32,
    how: str = "inner",
    suffix: str = "_r",
    schemas: tuple[pa.Schema, pa.Schema] | None = None,
    salt: int | str = 1,
    bloom_prefilter: bool | int = False,
):
    """Join two Datasets on int64 key columns ``on=(left_key, right_key)``.

    Returns a Dataset with all left columns plus all right columns except
    the right key; right columns whose names collide with a left column are
    renamed with ``suffix``.  ``how`` is 'inner', 'left' or 'full' (full
    outer: unmatched rows of EITHER side survive with the other side's
    columns null, including the left key column -- coalesce downstream if
    a merged key is wanted; incompatible with ``salt > 1``, which would
    duplicate unmatched right rows).

    Pass ``schemas=(left_schema, right_schema)`` when a side has a long lazy
    lineage: ``Dataset.schema()`` on such a side executes part of the plan
    just to learn column types, and the union below would then re-execute it.

    ``salt > 1`` splits HOT LEFT KEYS: each left row lands in one of
    ``salt`` sub-buckets of its key's partition (cheap row-position salt --
    correctness never depends on which, since) each RIGHT row replicates to
    all ``salt`` sub-buckets.  A key carried by millions of left rows fans
    out over ``salt`` tasks at the cost of ``salt`` x the (smaller) right
    side's shuffle bytes; outputs are row-for-row identical to unsalted.
    ``bloom_prefilter`` (inner joins only; ``True`` or an ``m_bits`` int)
    builds a bounded Bloom filter from the right keys (stages/bloom.py) and
    drops non-matching left rows inside the map tasks BEFORE the exchange --
    output is row-for-row identical (false positives are removed by the
    join; a Bloom filter never false-negatives), but a selective right side
    stops paying the left side's full shuffle (tools/bench_bloom.py: 2.8x
    at 10M rows / 5% selectivity).

    ``salt="auto"`` measures the hot-key fraction on a sample of the left
    side (``estimate_salt``) instead of requiring the caller to know the
    skew; the factor must be GLOBAL (the right side replicates into every
    sub-bucket), which is why it is derived once here, not per batch.
    """
    import ray.data as rd  # noqa: F401  (callers hold Datasets already)

    lkey, rkey = on
    if how not in ("inner", "left", "full"):
        raise ValueError(f"how={how!r}: expected 'inner', 'left' or 'full'")
    if salt == "auto":
        salt = 1 if how == "full" else estimate_salt(left, lkey, buckets)
    if how == "full" and salt > 1:
        # salting replicates every right row into all sub-buckets, so an
        # unmatched right row would be emitted salt times -- loud, not wrong
        raise ValueError("salt > 1 is unsound for how='full'")

    # opt-in Bloom pre-filter (INNER joins only -- dropping unmatched left
    # rows changes a LEFT join's output): build a fixed-size bit array from
    # the right keys (bounded by m_bits/8 bytes regardless of right
    # cardinality -- the right plan executes one extra time to build it),
    # then drop left rows that cannot match INSIDE the map tasks, before
    # the exchange.  False positives survive the filter and are removed by
    # the join itself, so outputs are row-for-row identical (tested).
    bloom_bm = None
    bloom_m = 0
    _BLOOM_K = 5
    if bloom_prefilter:
        if how != "inner":
            raise ValueError("bloom_prefilter requires how='inner'")
        from ..util import dataset_to_table
        from .bloom import pack_bitmap, partial_bits

        bloom_m = (
            int(bloom_prefilter)
            if not isinstance(bloom_prefilter, bool) and bloom_prefilter > 1
            else (1 << 20)
        )

        def _bits(t: pa.Table) -> pa.Table:
            t = t.combine_chunks()
            ks = np.unique(
                t[rkey].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            return pa.table(
                {"p": pa.array(partial_bits(ks, bloom_m, _BLOOM_K), pa.int64())}
            )

        pos = dataset_to_table(
            right.map_batches(_bits, batch_format="pyarrow"),
            schema=pa.schema([("p", pa.int64())]),
        )
        bloom_bm = pack_bitmap(
            np.unique(pos["p"].to_numpy(zero_copy_only=False)), bloom_m
        )
    if schemas is not None:
        ls, rs = schemas
    else:
        ls = _ray_schema_to_arrow(left)
        rs = _ray_schema_to_arrow(right)
    lcols = list(ls.names)
    rcols_src = [n for n in rs.names if n != rkey]
    rename = {
        n: (n + suffix if n in lcols else n) for n in rcols_src
    }
    rcols_out = [rename[n] for n in rcols_src]

    union_fields = (
        [(n, ls.field(n).type) for n in lcols]
        + [(rename[n], rs.field(n).type) for n in rcols_src]
        + [("__rk", pa.int64()), ("side", pa.int8()), ("prt", pa.int64())]
    )
    union_schema = pa.schema(union_fields)

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if bloom_bm is not None and t.num_rows:
            from .bloom import probe_bitmap

            keep = probe_bitmap(
                t[lkey].to_numpy(zero_copy_only=False).astype(np.int64),
                bloom_bm, bloom_m, _BLOOM_K,
            )
            if not keep.all():
                t = t.filter(pa.array(keep))
        n = t.num_rows
        k = t[lkey].to_numpy(zero_copy_only=False)
        cols = {name: t[name] for name in lcols}
        for name in rcols_src:
            cols[rename[name]] = pa.nulls(n, rs.field(name).type)
        cols["__rk"] = pa.nulls(n, pa.int64())
        cols["side"] = pa.array(np.zeros(n, np.int8), pa.int8())
        prt = _prt_of(k, buckets)
        if salt > 1:
            prt = prt * salt + np.arange(n, dtype=np.int64) % salt
        cols["prt"] = pa.array(prt, pa.int64())
        return pa.table(cols, schema=union_schema)

    def tag_right(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        n = t.num_rows
        k = t[rkey].to_numpy(zero_copy_only=False)
        cols = {name: pa.nulls(n, ls.field(name).type) for name in lcols}
        for name in rcols_src:
            cols[rename[name]] = t[name]
        cols["__rk"] = pa.array(k.astype(np.int64), pa.int64())
        cols["side"] = pa.array(np.ones(n, np.int8), pa.int8())
        prt = _prt_of(k, buckets)
        if salt > 1:
            # replicate each right row into every sub-bucket of its key
            rep = pa.array(np.arange(n, dtype=np.int64).repeat(salt))
            out = pa.table(cols, schema=union_schema.remove(
                union_schema.get_field_index("prt")))
            out = out.take(rep)
            sub = np.tile(np.arange(salt, dtype=np.int64), n)
            prt_full = np.repeat(prt, salt) * salt + sub
            return out.append_column("prt", pa.array(prt_full, pa.int64()))
        cols["prt"] = pa.array(prt, pa.int64())
        return pa.table(cols, schema=union_schema)

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    out_fields = [(n, ls.field(n).type) for n in lcols] + [
        (rename[n], rs.field(n).type) for n in rcols_src
    ]
    out_schema = pa.schema(out_fields)

    def merge_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        side = t["side"].to_numpy(zero_copy_only=False)
        lmask, rmask = side == 0, side == 1
        lt = t.filter(pa.array(lmask))
        rt = t.filter(pa.array(rmask))
        empty_needs_left = lt.num_rows == 0 and how != "full"
        if empty_needs_left or (how == "inner" and rt.num_rows == 0):
            return pa.table(
                {n: pa.nulls(0, ty) for n, ty in zip(out_schema.names, out_schema.types)},
                schema=out_schema,
            )
        lk = lt[lkey].to_numpy(zero_copy_only=False)
        rk = rt["__rk"].to_numpy(zero_copy_only=False)
        li = pd.DataFrame({"k": lk, "i": np.arange(len(lk), dtype=np.int64)})
        ri = pd.DataFrame({"k": rk, "j": np.arange(len(rk), dtype=np.int64)})
        pd_how = {"inner": "inner", "left": "left", "full": "outer"}[how]
        m = li.merge(ri, on="k", how=pd_how)
        if how == "inner":
            i_idx = pa.array(m["i"].to_numpy(), pa.int64())
            j_idx = pa.array(m["j"].to_numpy(np.int64), pa.int64())
        else:  # nullable take indices: missing side -> null columns
            i_idx = pa.array(pd.array(m["i"], dtype="Int64"), pa.int64())
            j_idx = pa.array(pd.array(m["j"], dtype="Int64"), pa.int64())
        cols = {n: lt[n].take(i_idx) for n in lcols}
        for n in rcols_src:
            cols[rename[n]] = rt[rename[n]].take(j_idx)
        return pa.table(cols, schema=out_schema)

    return both.groupby("prt").map_groups(merge_bucket, batch_format="pyarrow")


def dedup_rows(ds, cols: list[str], buckets: int = 16):
    """Distinct rows by an int64 column tuple: hash-partition on the tuple,
    vectorized first-of-run within each partition (no per-group Python
    call).  Keeps the first occurrence's full row."""

    def add_prt(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        h = np.zeros(t.num_rows, dtype=np.int64)
        with np.errstate(over="ignore"):
            for c in cols:
                h = h * _GOLD ^ t[c].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("prt", pa.array(hash_prt(h, buckets), pa.int64()))

    def first_of_run(t: pa.Table) -> pa.Table:
        t = t.combine_chunks().drop_columns(["prt"])
        if t.num_rows == 0:
            return t
        arrs = [t[c].to_numpy(zero_copy_only=False) for c in cols]
        order = np.lexsort(arrs[::-1])
        diff = np.zeros(len(order) - 1, dtype=bool)
        for a in arrs:
            s = a[order]
            diff |= s[1:] != s[:-1]
        keep = np.concatenate(([True], diff))
        return t.take(pa.array(order[keep], pa.int64()))

    return (
        ds.map_batches(add_prt, batch_format="pyarrow")
        .groupby("prt")
        .map_groups(first_of_run, batch_format="pyarrow")
    )
