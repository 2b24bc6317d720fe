"""Distributed tier rollup: partial aggregation inside ``map_batches`` +
hash-partitioned vectorized merges -- the engine's flagship path.

Plan (all-Arrow, zero-copy in, vectorized NumPy kernels)::

    read_parquet(token table, columns pruned)
      -> map_batches(partial_rollup)            # 1 partial row per
         (source, bucket[, salt]) per batch: int64 counters + sparse hists
      [salted level] -> prt = hash(source,bucket,salt) % P
         -> groupby(prt).map_groups(vectorized merge)   # spreads hot sources
      -> prt = hash(source,bucket) % P
         -> groupby(prt).map_groups(vectorized merge)   # exact final combine
      -> map_batches(finalize)                  # mean, p50/p99 (vectorized)

Why this is exact (bitwise vs oracle.py): counters are int64 (commutative,
associative, overflow-free at 10^12 rows x 2048 tokens); percentiles come from
*sparse value histograms* -- the n_tok / token domains are bounded int32s, so
a histogram is a lossless multiset of the raw values and merges by
concatenate + re-unique.  ``finalize`` replicates
``np.percentile(..., method="linear")`` arithmetic from the histogram
(including NumPy's branched lerp).  No step depends on combination order, so
salting / retries / block boundaries cannot change a single output bit.

Why this scales: raw rows collapse to at most one partial row per
(source, bucket) per input batch, so the all-to-all shuffle moves rollup-sized
data, not raw data.  The merge is one Python call per *hash partition* (not
per group) with segment reductions inside, so group count doesn't add Python
overhead.  Hot (skewed) sources are spread with a salt derived from batch
content, giving the classic two-level combiner (SURVEY.md §4.2).

Reference semantics re-expressed here: fixed-length bucketing =
/root/reference/caits/windowing.py:188 (create_chunks); the aggregate bundle =
/root/reference/caits/fe/_statistical.py:597 (signal_stats); the tier cascade =
the rms_max rollup-of-rollup pattern (/root/reference/caits/fe/_statistical.py:252).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..functions.numutil import group_boundaries
from ..schema import PARTIAL_EXTRA_FIELDS, ROLLUP_SCHEMA, Tier

Q_LOW, Q_HIGH = 50.0, 99.0

_SALT_MIX = np.int64(-0x61C8864680B583EB)  # 64-bit golden-ratio multiplier


def _list_col_to_numpy(col: pa.ChunkedArray | pa.Array):
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    n = len(col)
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    return flat.to_numpy(zero_copy_only=False), offs[: n + 1]


def _list_arr(offsets: np.ndarray, values: np.ndarray, vtype) -> pa.ListArray:
    off = pa.array(offsets.astype(np.int64), pa.int64())
    if offsets[-1] < 2**31:
        off = off.cast(pa.int32())
    return pa.ListArray.from_arrays(off, pa.array(values, vtype))


def _dict_encode(col) -> tuple[np.ndarray, pa.Array]:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.dictionary_encode()
    return d.indices.to_numpy(zero_copy_only=False).astype(np.int64), d.dictionary


# ---------------------------------------------------------------------------
# stage 1: per-batch partial aggregation (combiner)
# ---------------------------------------------------------------------------

def partial_rollup(batch: pa.Table, width: int, salt_mod: int = 0) -> pa.Table:
    """Per-batch combiner: one partial row per (source, bucket) in the batch.

    Hist columns in *partial* rows carry the raw value multiset with an EMPTY
    counts list meaning "all counts are 1": the downstream merge sorts and
    run-length-encodes anyway, so sorting/deduping here would be duplicated
    work in the hot stage, and shipping ones doubles payload for nothing.
    (Merged rows always carry real sorted-unique hists.)"""
    t = batch.combine_chunks()
    n = t.num_rows
    if n == 0:
        return _empty_partial(salt_mod)
    seq = t["seq"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    n_tok = t["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    codes, dictionary = _dict_encode(t["source"])

    bucket = seq // width
    order = np.lexsort((bucket, codes))
    c_s, b_s, n_s, seq_s = codes[order], bucket[order], n_tok[order], seq[order]
    starts = group_boundaries(c_s, b_s)
    G = len(starts)
    ends = np.append(starts[1:], n)
    counts = ends - starts
    sum_n = np.add.reduceat(n_s, starts)
    min_n = np.minimum.reduceat(n_s, starts)
    max_n = np.maximum.reduceat(n_s, starts)
    # n_tok "hist": the grouped raw values (n_s is already grouped), cnts empty
    ntok_offs = np.append(starts, n).astype(np.int64)

    # token stream per group: gather token slices into group order
    flat_vals, row_offs = _list_col_to_numpy(t["tokens"])
    row_cnt = (row_offs[1:] - row_offs[:-1]).astype(np.int64)
    lens_r = row_cnt[order]
    total_tok = int(lens_r.sum())
    out_excl = np.zeros(n, dtype=np.int64)
    np.cumsum(lens_r[:-1], out=out_excl[1:])
    gather = (
        np.arange(total_tok, dtype=np.int64)
        - np.repeat(out_excl, lens_r)
        + np.repeat(row_offs[order], lens_r)
    )
    tok_grouped = flat_vals[gather]
    # per-group token segment offsets
    tok_offs = np.zeros(G + 1, dtype=np.int64)
    np.cumsum(np.add.reduceat(lens_r, starts), out=tok_offs[1:])
    gstarts = tok_offs[:-1]
    if (tok_offs[1:] == gstarts).any():
        raise AssertionError("every (source,bucket) group must have >=1 token")
    tg64 = tok_grouped.astype(np.int64)
    tok_count = (tok_offs[1:] - gstarts).astype(np.int64)
    tok_sum = np.add.reduceat(tg64, gstarts)
    tok_min = np.minimum.reduceat(tok_grouped, gstarts).astype(np.int32)
    tok_max = np.maximum.reduceat(tok_grouped, gstarts).astype(np.int32)

    empty32 = np.zeros(0, dtype=np.int32)
    zoffs = np.zeros(G + 1, dtype=np.int64)
    cols = {
        "source": dictionary.take(pa.array(c_s[starts])),
        "bucket": pa.array(b_s[starts], pa.int64()),
        "count": pa.array(counts.astype(np.int64), pa.int64()),
        "sum": pa.array(sum_n, pa.int64()),
        "min": pa.array(min_n.astype(np.int32), pa.int32()),
        "max": pa.array(max_n.astype(np.int32), pa.int32()),
        "tok_count": pa.array(tok_count, pa.int64()),
        "tok_sum": pa.array(tok_sum, pa.int64()),
        "tok_min": pa.array(tok_min, pa.int32()),
        "tok_max": pa.array(tok_max, pa.int32()),
        "ntok_vals": _list_arr(ntok_offs, n_s.astype(np.int32), pa.int32()),
        "ntok_cnts": _list_arr(zoffs, empty32, pa.int32()),
        "tok_vals": _list_arr(tok_offs, tok_grouped.astype(np.int32, copy=False), pa.int32()),
        "tok_cnts": _list_arr(zoffs, empty32, pa.int32()),
    }
    if salt_mod:
        # salt from the group's min seq: deterministic per content, varies
        # across batches of the same hot (source, bucket)
        salt = ((seq_s[starts] * _SALT_MIX) >> np.int64(33)) % salt_mod
        cols["salt"] = pa.array(salt.astype(np.int64), pa.int64())
    return pa.table(cols)


def _partial_schema(salt_mod: int) -> pa.Schema:
    fields = [
        ("source", pa.string()), ("bucket", pa.int64()), ("count", pa.int64()),
        ("sum", pa.int64()), ("min", pa.int32()), ("max", pa.int32()),
        ("tok_count", pa.int64()), ("tok_sum", pa.int64()),
        ("tok_min", pa.int32()), ("tok_max", pa.int32()),
    ] + PARTIAL_EXTRA_FIELDS
    if salt_mod:
        fields.append(("salt", pa.int64()))
    return pa.schema(fields)


def _empty_partial(salt_mod: int) -> pa.Table:
    return pa.Table.from_pylist([], schema=_partial_schema(salt_mod))


# ---------------------------------------------------------------------------
# stage 2: hash-partitioned vectorized merge
# ---------------------------------------------------------------------------

def _key_hash(sources: pa.Array | pa.ChunkedArray, bucket: np.ndarray,
              salt: np.ndarray | None, num_partitions: int) -> np.ndarray:
    """Deterministic partition id per row from (source, bucket[, salt])."""
    codes, dictionary = _dict_encode(sources)
    dict_hash = np.array(
        [zlib.crc32(s.encode()) for s in dictionary.to_pylist()], dtype=np.int64
    )
    h = dict_hash[codes] * np.int64(0x9E3779B1)
    h ^= bucket * _SALT_MIX
    if salt is not None:
        h ^= (salt + np.int64(0x9E3779B9)) * np.int64(0x85EBCA6B)
    return np.abs(h) % num_partitions


def with_partition_col(batch: pa.Table, num_partitions: int, use_salt: bool) -> pa.Table:
    t = batch.combine_chunks()
    if t.num_rows == 0:
        return t.append_column("prt", pa.array([], pa.int64()))
    bucket = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    salt = (
        t["salt"].to_numpy(zero_copy_only=False).astype(np.int64)
        if use_salt and "salt" in t.schema.names
        else None
    )
    prt = _key_hash(t["source"], bucket, salt, num_partitions)
    return t.append_column("prt", pa.array(prt, pa.int64()))


def merge_partials_table(tbl: pa.Table, with_salt: bool = False) -> pa.Table:
    """Vectorized merge of ALL groups present in ``tbl`` (requires that the
    table holds every partial row of each contained key -- guaranteed by hash
    partitioning).  One Python call per partition; inside, every reduction is
    a NumPy segment op, so group count adds no interpreter overhead."""
    t = tbl.combine_chunks()
    if "prt" in t.schema.names:
        t = t.drop_columns(["prt"])
    n = t.num_rows
    if n == 0:
        return _empty_partial(0)
    codes, dictionary = _dict_encode(t["source"])
    bucket = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    keys = [bucket, codes]
    if with_salt and "salt" in t.schema.names:
        salt = t["salt"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((salt, bucket, codes))
        k_sorted = (codes[order], bucket[order], salt[order])
    else:
        order = np.lexsort((bucket, codes))
        k_sorted = (codes[order], bucket[order])
    starts = group_boundaries(*k_sorted)
    G = len(starts)
    gid_sorted = np.zeros(n, dtype=np.int64)
    gid_sorted[starts] = 1
    gid_sorted = np.cumsum(gid_sorted) - 1
    row_gid = np.empty(n, dtype=np.int64)
    row_gid[order] = gid_sorted

    def seg(colname, op):
        v = t[colname].to_numpy(zero_copy_only=False)[order]
        return op.reduceat(v, starts)

    out = {
        "source": dictionary.take(pa.array(k_sorted[0][starts])),
        "bucket": pa.array(k_sorted[1][starts], pa.int64()),
        "count": pa.array(seg("count", np.add).astype(np.int64), pa.int64()),
        "sum": pa.array(seg("sum", np.add).astype(np.int64), pa.int64()),
        "min": pa.array(seg("min", np.minimum).astype(np.int32), pa.int32()),
        "max": pa.array(seg("max", np.maximum).astype(np.int32), pa.int32()),
        "tok_count": pa.array(seg("tok_count", np.add).astype(np.int64), pa.int64()),
        "tok_sum": pa.array(seg("tok_sum", np.add).astype(np.int64), pa.int64()),
        "tok_min": pa.array(seg("tok_min", np.minimum).astype(np.int32), pa.int32()),
        "tok_max": pa.array(seg("tok_max", np.maximum).astype(np.int32), pa.int32()),
    }
    for vcol, ccol in (("ntok_vals", "ntok_cnts"), ("tok_vals", "tok_cnts")):
        mv, mc, moffs = _merge_hists_vectorized(t, vcol, ccol, order, starts, G)
        out[vcol] = _list_arr(moffs, mv, pa.int32())
        out[ccol] = _list_arr(moffs, mc.astype(np.int32), pa.int32())
    if with_salt and "salt" in t.schema.names:
        # salt consumed by this merge level; keep one representative so the
        # column survives schema-wise until dropped (not needed downstream)
        pass
    return pa.table(out)


def _merge_hists_vectorized(t, vcol, ccol, row_order, row_starts, G):
    """Merge per-group hists: gather value lists into group order, sort each
    group SEGMENT in place (cache-friendly int32 quicksorts -- ~60x faster
    than a global lexsort on this data), then run-length encode.

    ``row_order`` sorts partial rows by group key; ``row_starts`` marks group
    boundaries in that sorted row space.  Empty counts list = all-ones
    (partial rows, see partial_rollup); else counts align with values."""
    vflat, voffs = _list_col_to_numpy(t[vcol])
    cflat, _ = _list_col_to_numpy(t[ccol])
    n_rows = len(voffs) - 1
    lens = voffs[1:] - voffs[:-1]
    lens_r = lens[row_order]
    total = int(lens_r.sum())
    all_ones = len(cflat) == 0
    if np.array_equal(row_order, np.arange(n_rows)):
        gv = vflat.copy()
        gc = None if all_ones else cflat.astype(np.int64)
    else:
        out_excl = np.zeros(n_rows, dtype=np.int64)
        np.cumsum(lens_r[:-1], out=out_excl[1:])
        gather = (
            np.arange(total, dtype=np.int64)
            - np.repeat(out_excl, lens_r)
            + np.repeat(voffs[:-1][row_order], lens_r)
        )
        gv = vflat[gather]
        gc = None if all_ones else cflat[gather].astype(np.int64)
    seg_offs = np.zeros(G + 1, dtype=np.int64)
    np.cumsum(np.add.reduceat(lens_r, row_starts), out=seg_offs[1:])
    if all_ones:
        for i in range(G):
            gv[seg_offs[i] : seg_offs[i + 1]].sort()
    else:
        for i in range(G):
            sl = slice(seg_offs[i], seg_offs[i + 1])
            o = np.argsort(gv[sl], kind="stable")
            gv[sl] = gv[sl][o]
            gc[sl] = gc[sl][o]
    # RLE over (group, value) runs
    seg_id = np.repeat(np.arange(G, dtype=np.int64), np.diff(seg_offs))
    new = np.ones(total, dtype=bool)
    new[1:] = (gv[1:] != gv[:-1]) | (seg_id[1:] != seg_id[:-1])
    pstarts = np.flatnonzero(new)
    mv = gv[pstarts].astype(np.int32)
    if all_ones:
        mc = np.diff(np.append(pstarts, total)).astype(np.int64)
    else:
        mc = np.add.reduceat(gc, pstarts) if total else np.zeros(0, np.int64)
    moffs = np.zeros(G + 1, dtype=np.int64)
    np.cumsum(np.bincount(seg_id[pstarts], minlength=G), out=moffs[1:])
    return mv, mc, moffs


def merge_partials_group(tbl: pa.Table) -> pa.Table:
    """Per-group merge (compat shim over the vectorized partition merge)."""
    return merge_partials_table(tbl)


# ---------------------------------------------------------------------------
# stage 3: vectorized finalize (mean + exact percentiles from hists)
# ---------------------------------------------------------------------------

def _percentiles_from_hists(vflat, cflat, offs, q):
    """Vectorized exact linear-method percentile per ragged hist segment;
    replicates np.percentile(method='linear') bitwise (branched lerp)."""
    cum = np.cumsum(cflat)
    base = np.where(offs[:-1] > 0, cum[np.maximum(offs[:-1] - 1, 0)], 0)
    base[offs[:-1] == 0] = 0
    totals = np.where(offs[1:] > 0, cum[np.maximum(offs[1:] - 1, 0)], 0) - base
    h = (q / 100.0) * (totals - 1)
    lo = np.floor(h).astype(np.int64)
    hi = np.ceil(h).astype(np.int64)
    jlo = np.searchsorted(cum, base + lo, side="right")
    jhi = np.searchsorted(cum, base + hi, side="right")
    a = vflat[jlo].astype(np.float64)
    b = vflat[jhi].astype(np.float64)
    tt = h - lo
    diff = b - a
    return np.where(tt >= 0.5, b - diff * (1 - tt), a + diff * tt)


def finalize_batch(batch: pa.Table) -> pa.Table:
    """Merged partial rows -> ROLLUP_SCHEMA rows (fully vectorized)."""
    t = batch.combine_chunks()
    n = t.num_rows
    if n == 0:
        return pa.Table.from_pylist([], schema=ROLLUP_SCHEMA)
    cnt = t["count"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = t["sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    tok_cnt = t["tok_count"].to_numpy(zero_copy_only=False).astype(np.int64)
    tok_sum = t["tok_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    mean = s.astype(np.float64) / cnt.astype(np.float64)
    tok_mean = tok_sum.astype(np.float64) / tok_cnt.astype(np.float64)
    nv, nvo = _list_col_to_numpy(t["ntok_vals"])
    ncf, _ = _list_col_to_numpy(t["ntok_cnts"])
    tv, tvo = _list_col_to_numpy(t["tok_vals"])
    tcf, _ = _list_col_to_numpy(t["tok_cnts"])
    ncf = ncf.astype(np.int64)
    tcf = tcf.astype(np.int64)
    p50 = _percentiles_from_hists(nv, ncf, nvo, Q_LOW)
    p99 = _percentiles_from_hists(nv, ncf, nvo, Q_HIGH)
    tp50 = _percentiles_from_hists(tv, tcf, tvo, Q_LOW)
    tp99 = _percentiles_from_hists(tv, tcf, tvo, Q_HIGH)
    return pa.table(
        {
            "source": t["source"].cast(pa.string()),
            "bucket": t["bucket"],
            "count": pa.array(cnt, pa.int64()),
            "sum": pa.array(s, pa.int64()),
            "mean": pa.array(mean, pa.float64()),
            "min": t["min"],
            "max": t["max"],
            "p50": pa.array(p50, pa.float64()),
            "p99": pa.array(p99, pa.float64()),
            "tok_count": pa.array(tok_cnt, pa.int64()),
            "tok_sum": pa.array(tok_sum, pa.int64()),
            "tok_mean": pa.array(tok_mean, pa.float64()),
            "tok_min": t["tok_min"],
            "tok_max": t["tok_max"],
            "tok_p50": pa.array(tp50, pa.float64()),
            "tok_p99": pa.array(tp99, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# dataset-level composition
# ---------------------------------------------------------------------------

def merge_finalize_table(tbl: pa.Table) -> pa.Table:
    """Fused merge + finalize: one pass from partial rows to ROLLUP rows.

    Identical multiset semantics to merge_partials_table + finalize_batch
    (bitwise-equal output), but the merged hists live only as NumPy arrays
    inside this call -- they are never serialized, which removes the
    dominant object-store traffic of the two-step path (the 1m-tier hist
    payload is ~the raw token volume)."""
    t = tbl.combine_chunks()
    if "prt" in t.schema.names:
        t = t.drop_columns(["prt"])
    n = t.num_rows
    if n == 0:
        return pa.Table.from_pylist([], schema=ROLLUP_SCHEMA)
    codes, dictionary = _dict_encode(t["source"])
    bucket = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((bucket, codes))
    k_sorted = (codes[order], bucket[order])
    starts = group_boundaries(*k_sorted)
    G = len(starts)

    def seg(colname, op):
        v = t[colname].to_numpy(zero_copy_only=False)[order]
        return op.reduceat(v, starts)

    cnt = seg("count", np.add).astype(np.int64)
    s = seg("sum", np.add).astype(np.int64)
    tok_cnt = seg("tok_count", np.add).astype(np.int64)
    tok_sum = seg("tok_sum", np.add).astype(np.int64)
    nv, nc, nvo = _merge_hists_vectorized(t, "ntok_vals", "ntok_cnts", order, starts, G)
    tv, tc, tvo = _merge_hists_vectorized(t, "tok_vals", "tok_cnts", order, starts, G)
    return pa.table(
        {
            "source": dictionary.take(pa.array(k_sorted[0][starts])).cast(pa.string()),
            "bucket": pa.array(k_sorted[1][starts], pa.int64()),
            "count": pa.array(cnt, pa.int64()),
            "sum": pa.array(s, pa.int64()),
            "mean": pa.array(s.astype(np.float64) / cnt.astype(np.float64), pa.float64()),
            "min": pa.array(seg("min", np.minimum).astype(np.int32), pa.int32()),
            "max": pa.array(seg("max", np.maximum).astype(np.int32), pa.int32()),
            "p50": pa.array(_percentiles_from_hists(nv, nc, nvo, Q_LOW), pa.float64()),
            "p99": pa.array(_percentiles_from_hists(nv, nc, nvo, Q_HIGH), pa.float64()),
            "tok_count": pa.array(tok_cnt, pa.int64()),
            "tok_sum": pa.array(tok_sum, pa.int64()),
            "tok_mean": pa.array(
                tok_sum.astype(np.float64) / tok_cnt.astype(np.float64), pa.float64()
            ),
            "tok_min": pa.array(seg("tok_min", np.minimum).astype(np.int32), pa.int32()),
            "tok_max": pa.array(seg("tok_max", np.maximum).astype(np.int32), pa.int32()),
            "tok_p50": pa.array(_percentiles_from_hists(tv, tc, tvo, Q_LOW), pa.float64()),
            "tok_p99": pa.array(_percentiles_from_hists(tv, tc, tvo, Q_HIGH), pa.float64()),
        }
    )


def rekey_batch(batch: pa.Table, factor: int) -> pa.Table:
    """Cascade re-key: coarser bucket = finer bucket // factor."""
    if batch.num_rows == 0 or "bucket" not in batch.schema.names:
        return batch
    b = batch["bucket"].to_numpy(zero_copy_only=False) // factor
    return batch.set_column(
        batch.schema.get_field_index("bucket"), "bucket", pa.array(b, pa.int64())
    )


def _partition_merge(parts, num_partitions: int, with_salt: bool):
    parts = parts.map_batches(
        lambda b: with_partition_col(b, num_partitions, with_salt),
        batch_format="pyarrow",
    )
    return parts.groupby("prt").map_groups(
        lambda t: merge_partials_table(t, with_salt=with_salt),
        batch_format="pyarrow",
    )


def merged_partials(
    ds,
    tier: Tier,
    salt_mod: int = 0,
    batch_size: int = 8192,
    merge_partitions: int = 32,
):
    """token Dataset -> merged partial rows (hists retained) per (source,bucket)."""
    parts = ds.map_batches(
        lambda b: partial_rollup(b, tier.width, salt_mod),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    if salt_mod:
        parts = _partition_merge(parts, merge_partitions, with_salt=True)
    return _partition_merge(parts, merge_partitions, with_salt=False)


def cascade_merged(merged, factor: int, merge_partitions: int = 32):
    """Merged partials at tier k -> merged partials at coarser tier k+1."""
    rekeyed = merged.map_batches(
        lambda b: rekey_batch(b, factor), batch_format="pyarrow"
    )
    return _partition_merge(rekeyed, merge_partitions, with_salt=False)


def finalize(merged):
    return merged.map_batches(finalize_batch, batch_format="pyarrow")


def rollup_cascade(
    ds,
    tiers,
    salt_mod: int = 0,
    batch_size: int = 8192,
    merge_partitions: int = 32,
    materialize_tiers: bool = False,
) -> dict:
    """Full cascade: raw -> tiers[0] -> tiers[1] -> ...; returns
    {tier_name: finalized Dataset}.

    Plan: raw rows collapse ONCE into finest-tier partial rows (lean: raw
    value multisets, implicit count=1); every tier is then one
    rekey + hash-partition shuffle + fused merge-finalize over those partials
    -- the merged histograms exist only inside the merge call and never hit
    the object store.  ``materialize_tiers=True`` pins the shared partials so
    consuming all tiers doesn't re-read raw input (partials are the one
    mid-pipeline materialization that is rollup-justified: they are the
    irreducible communication for exact finest-tier percentiles).

    A coarser tier re-merges the same partials rather than the finer tier's
    merged hists: bitwise-identical (same multiset per bucket) and cheaper --
    merged hists carry explicit counts (~2x payload) and 1m dedup saves <6%
    on near-uniform token draws."""
    out = {}
    parts = ds.map_batches(
        lambda b: partial_rollup(b, tiers[0].width, salt_mod),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    if salt_mod:
        parts = _partition_merge(parts, merge_partitions, with_salt=True)
    if materialize_tiers:
        parts = parts.materialize()
    for tier in tiers:
        if tier.width % tiers[0].width:
            raise ValueError(f"tier widths must nest: {tiers[0]} -> {tier}")
        factor = tier.width // tiers[0].width
        t = (
            parts
            if factor == 1
            else parts.map_batches(
                lambda b, f=factor: rekey_batch(b, f), batch_format="pyarrow"
            )
        )
        keyed = t.map_batches(
            lambda b: with_partition_col(b, merge_partitions, False),
            batch_format="pyarrow",
        )
        out[tier.name] = keyed.groupby("prt").map_groups(
            merge_finalize_table, batch_format="pyarrow"
        )
    return out
