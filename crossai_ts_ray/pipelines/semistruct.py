"""Semi-structured (JSON) column extraction + sketch quantiles over the
events stream.

The ``events.props`` column is a JSON string payload that no other family
touches; this module treats it the way a 100 TB log pipeline would: a
vectorized field-extraction kernel inside ``map_batches`` (Arrow
``extract_regex`` here — the seam where a simdjson-style parser would slot
in on a real cluster), followed by bounded-communication aggregation.

Two shapes:

* ``props_key_stats`` — per event_type count/sum/mean/min/max and exact
  linear-interpolation quantiles of the extracted integer field, carried
  as a sparse ``(type, k)`` histogram so the exchange moves
  O(types x distinct-k) rows regardless of event count (the engine's
  bounded-domain-histogram argument from ``stages/rollup.py``).
* ``hdr_value_quantiles`` — an HDR-histogram quantile SKETCH over
  ``value``: centi-quantized magnitudes binned by (bit-length, top-5
  mantissa bits), guaranteeing <= 1/32 relative bucket width.  Unlike
  float-log sketches (DDSketch's ``ceil(log_gamma v)``), the bucket id is
  INTEGER-exact math — mirrored bit-for-bit in DuckDB via
  ``length(printf('%b', c))`` — so the sketch has a full SQL value oracle,
  not just an error-bound test.

Reference parity: the reference has no JSON surface; this family is
engine-new (brief: "operations a large-scale training-data pipeline would
need").  The quantile machinery parallels the reference's feature
statistics (/root/reference/caits/fe/statistical_features.py) applied to
an extracted stream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.readers import read_parquet_sized
from ..stages.joins import hash_prt
from .analytics import _np, _read_events, _round6

_QS = (0.5, 0.9)


def extract_int_field(col: pa.ChunkedArray | pa.Array, key: str) -> pa.Array:
    """Vectorized integer-field extraction from a flat JSON string column.

    Arrow's RE2 ``extract_regex`` runs the whole batch in C++ — no Python
    per row.  Contract (the events.props payload): FLAT objects whose
    ``key`` holds a plain integer.  Rows missing the key come back NULL
    (like SQL ``json_extract_string``); rows where the key holds anything
    that is NOT a plain integer (floats, exponents, quoted numbers) FAIL
    LOUDLY — a regex cannot reproduce json_extract's cast semantics for
    those, and silently diverging from the oracle is worse than raising.
    Nested objects are outside the contract (RE2 has no recursion); at
    cluster scale this kernel is the swap-in seam for a real JSON parser.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # capture the WHOLE value token (up to , or }), then validate it
    pat = '"' + key + '"\\s*:\\s*(?P<v>[^,}]*)'
    tok = pc.utf8_trim_whitespace(
        pc.struct_field(pc.extract_regex(col, pat), "v")
    )
    is_int = pc.match_substring_regex(tok, r"^-?\d+$")
    bad = pc.and_(pc.is_valid(tok), pc.invert(is_int))
    if pc.any(bad).as_py():
        ex = pc.filter(col, bad)[0].as_py()
        raise ValueError(
            f"extract_int_field('{key}'): non-integer JSON value in "
            f"e.g. {ex!r}; the regex kernel only mirrors "
            "json_extract_string for plain-integer fields"
        )
    return pc.cast(tok, pa.int64())


# ---------------------------------------------------------------------------
# props_key_stats: exact grouped stats + quantiles of a JSON integer field
# ---------------------------------------------------------------------------

def props_key_stats(sf_dir: str, buckets: int = 32,
                    combine_batch_rows: int = 1_048_576):
    """Per-event_type stats of the JSON field ``props.k``: n, sum, mean,
    min, max and exact p50/p90 with SQL ``quantile_cont`` semantics.

    Scale shape: the parse is a per-batch Arrow regex kernel; each batch
    collapses to a sparse (type, k, count) histogram BEFORE the exchange,
    which is hashed on event_type so one partition owns a type's whole
    (bounded-domain) histogram and finalizes its quantiles vectorized.
    Rows shuffled are O(types x distinct k per batch) — independent of
    event count.  Rows whose props lack an integer ``k`` are dropped on
    both sides (SQL ``WHERE k IS NOT NULL``).
    """
    ev = _read_events(sf_dir, ["event_type", "props"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("k", pa.int64()),
         ("cnt", pa.int64()), ("prt", pa.int64())]
    )

    from .events_pipeline import _source_hash

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        k = extract_int_field(t["props"], "k")
        valid = pc.is_valid(k)
        if not pc.any(valid).as_py():
            return pa.Table.from_pylist([], schema=part_schema)
        t = t.filter(valid)
        kv = pc.filter(k, valid).to_numpy(zero_copy_only=False)
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if kv.max() - kv.min() >= (1 << 40):
            # k rides the low 40 bits of the sort key; silently merging
            # distinct values would corrupt counts -- fail loudly
            raise ValueError("props field span exceeds 2^40 packing range")
        key = codes * (1 << 40) + (kv - kv.min())
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        cnt = np.diff(np.append(starts, len(ks)))
        sel = order[starts]
        et_sel = et.take(pa.array(sel)).cast(pa.string())
        # partition hash must be batch-independent: hash the type STRING
        # (dictionary codes are first-appearance-ordered per batch)
        return pa.table(
            {
                "event_type": et_sel,
                "k": pa.array(kv[sel], pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                "prt": pa.array(
                    hash_prt(_source_hash(et_sel), buckets), pa.int64()
                ),
            },
            schema=part_schema,
        )

    names = [f"p{int(q * 100)}" for q in _QS]
    out_schema = pa.schema(
        [("event_type", pa.string()), ("n", pa.int64()),
         ("sum_k", pa.int64()), ("mean_k", pa.float64()),
         ("min_k", pa.int64()), ("max_k", pa.int64())]
        + [(nm + "_k", pa.float64()) for nm in names]
    )

    def finalize(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        kv = _np(t["k"])
        cnt = _np(t["cnt"])
        order = np.lexsort((kv, codes))
        c_s, k_s, n_s = codes[order], kv[order], cnt[order]
        if k_s.max() - k_s.min() >= (1 << 40):
            raise ValueError("props field span exceeds 2^40 packing range")
        # merge duplicate (type, k) rows from different batches first
        pair = c_s * (1 << 40) + (k_s - k_s.min())
        pstarts = np.flatnonzero(
            np.concatenate(([True], pair[1:] != pair[:-1]))
        )
        n_m = np.add.reduceat(n_s, pstarts)
        c_m, k_m = c_s[pstarts], k_s[pstarts]
        gstarts = np.flatnonzero(
            np.concatenate(([True], c_m[1:] != c_m[:-1]))
        )
        gn = np.add.reduceat(n_m, gstarts)          # rows per type
        gsum = np.add.reduceat(k_m * n_m, gstarts)  # int64-exact sum
        gmin = np.minimum.reduceat(k_m, gstarts)
        gmax = np.maximum.reduceat(k_m, gstarts)
        sel = t["event_type"].combine_chunks().take(
            pa.array(order[pstarts][gstarts])
        )
        cols = {
            "event_type": sel,
            "n": pa.array(gn, pa.int64()),
            "sum_k": pa.array(gsum, pa.int64()),
            "mean_k": pa.array(
                _round6(gsum.astype(np.float64) / gn), pa.float64()
            ),
            "min_k": pa.array(gmin, pa.int64()),
            "max_k": pa.array(gmax, pa.int64()),
        }
        # weighted linear-interp quantiles from the histogram: rank r =
        # (n-1)q splits into floor/ceil gathers over the cumulative counts
        gends = np.append(gstarts[1:], len(k_m))
        cum = np.cumsum(n_m)
        base = np.concatenate(([0], cum[gends[:-1] - 1]))
        for q, nm in zip(_QS, names):
            pos = (gn - 1).astype(np.float64) * q
            lo = np.floor(pos).astype(np.int64)
            hi = np.ceil(pos).astype(np.int64)
            frac = pos - lo
            # value at 0-based rank r within group g: first histogram row
            # whose group-local cumulative count exceeds r
            vlo = np.empty(len(gn), np.float64)
            vhi = np.empty(len(gn), np.float64)
            for g in range(len(gn)):  # bounded by TYPE COUNT, not rows
                s, e = gstarts[g], gends[g]
                local = cum[s:e] - base[g]
                vlo[g] = k_m[s + np.searchsorted(local, lo[g], side="right")]
                vhi[g] = k_m[s + np.searchsorted(local, hi[g], side="right")]
            cols[nm + "_k"] = pa.array(
                _round6(vlo + (vhi - vlo) * frac), pa.float64()
            )
        return pa.table(cols, schema=out_schema)

    return (
        ev.map_batches(
            partial, batch_format="pyarrow", batch_size=combine_batch_rows
        )
        .groupby("prt")
        .map_groups(
            lambda g: finalize(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


PROPS_KEY_STATS_SQL = """
WITH x AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type, count(*)::BIGINT AS n, sum(k)::BIGINT AS sum_k,
       round(sum(k)::DOUBLE / count(*) + 1e-9, 6) AS mean_k,
       min(k)::BIGINT AS min_k, max(k)::BIGINT AS max_k,
       round(quantile_cont(k, 0.50) + 1e-9, 6) AS p50_k,
       round(quantile_cont(k, 0.90) + 1e-9, 6) AS p90_k
FROM x WHERE k IS NOT NULL GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# HDR-histogram quantile sketch with an exact SQL mirror
# ---------------------------------------------------------------------------

_HDR_QS = (0.5, 0.9, 0.99)


def hdr_bucket(c: np.ndarray) -> np.ndarray:
    """HDR bucket id for non-negative centi-unit int64 values: values
    < 32 map to themselves (exact); larger values map to
    ``(bit_length << 5) | top-5-bits`` — relative bucket width <= 1/32.
    Pure integer math, so DuckDB mirrors it bit-for-bit with
    ``length(printf('%b', c))`` and shifts.
    """
    if (c < 0).any():
        raise ValueError("hdr_bucket requires non-negative centi-units")
    # bit_length via float exponent is unsafe near 2^53; use log2 on the
    # integer with an exact correction step instead
    bl = np.zeros(len(c), np.int64)
    nz = c > 0
    bl[nz] = np.frexp(c[nz].astype(np.float64))[1]
    # frexp exponent == bit_length for exact doubles; correct the (rare)
    # rounding-up case at >= 2^53 boundaries
    too_hi = nz & (bl > 1) & (c < (np.int64(1) << np.minimum(bl - 1, 62)))
    bl[too_hi] -= 1
    small = c < 32
    s = np.maximum(bl - 5, 0)
    bid = np.where(small, c, (bl << 5) | (c >> s))
    return bid.astype(np.int64)


def hdr_estimate(bid: np.ndarray) -> np.ndarray:
    """Bucket midpoint in ORIGINAL units (centi / 100); exact for ids<32."""
    small = bid < 32
    bl = bid >> 5
    sub = bid & 31
    s = np.maximum(bl - 5, 1)  # >= 1 whenever the wide branch is taken
    mid_c = (sub << s) + (np.int64(1) << (s - 1))
    return np.where(small, bid.astype(np.float64),
                    mid_c.astype(np.float64)) / 100.0


def hdr_value_quantiles(sf_dir: str, buckets: int = 32,
                        combine_batch_rows: int = 1_048_576):
    """Approximate p50/p90/p99 of ``value`` per event_type from a mergeable
    HDR-histogram sketch (<= ~3.2% relative error by construction), with a
    FULL SQL value oracle — the bucket id, rank rule (nearest-rank
    ``ceil(q*n)``) and midpoint estimate are integer-exact on both sides.

    Scale shape: identical to ``props_key_stats`` — per-batch (type,
    bucket) count combiner, one exchange hashed on type, vectorized
    finalize.  Sketch rows per type are bounded by ~32 + 32*bit-widths
    (~2k ids for the full int64 range), independent of event count;
    sketches MERGE by count addition, so tiers/retention could cascade
    them exactly like the rollup histograms.
    """
    ev = _read_events(sf_dir, ["event_type", "value"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("bid", pa.int64()),
         ("cnt", pa.int64()), ("prt", pa.int64())]
    )

    from .events_pipeline import _source_hash

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=part_schema)
        v = _np(t["value"])
        # centi-quantize with SQL round() half-away semantics
        c = np.where(v >= 0, np.floor(v * 100.0 + 0.5),
                     np.ceil(v * 100.0 - 0.5)).astype(np.int64)
        bid = hdr_bucket(c)
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        key = codes * (1 << 40) + bid
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        cnt = np.diff(np.append(starts, len(ks)))
        sel = order[starts]
        et_sel = et.take(pa.array(sel)).cast(pa.string())
        return pa.table(
            {
                "event_type": et_sel,
                "bid": pa.array(bid[sel], pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                "prt": pa.array(
                    hash_prt(_source_hash(et_sel), buckets), pa.int64()
                ),
            },
            schema=part_schema,
        )

    names = [f"p{str(q).replace('0.', '')}" for q in _HDR_QS]
    out_schema = pa.schema(
        [("event_type", pa.string()), ("n", pa.int64())]
        + [(nm + "_est", pa.float64()) for nm in names]
    )

    def finalize(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bid = _np(t["bid"])
        cnt = _np(t["cnt"])
        order = np.lexsort((bid, codes))
        c_s, b_s, n_s = codes[order], bid[order], cnt[order]
        pair = c_s * (1 << 40) + b_s
        pstarts = np.flatnonzero(
            np.concatenate(([True], pair[1:] != pair[:-1]))
        )
        n_m = np.add.reduceat(n_s, pstarts)
        c_m, b_m = c_s[pstarts], b_s[pstarts]
        gstarts = np.flatnonzero(
            np.concatenate(([True], c_m[1:] != c_m[:-1]))
        )
        gends = np.append(gstarts[1:], len(b_m))
        gn = np.add.reduceat(n_m, gstarts)
        est = hdr_estimate(b_m)
        cum = np.cumsum(n_m)
        base = np.concatenate(([0], cum[gends[:-1] - 1]))
        sel = t["event_type"].combine_chunks().take(
            pa.array(order[pstarts][gstarts])
        )
        cols = {"event_type": sel, "n": pa.array(gn, pa.int64())}
        for q, nm in zip(_HDR_QS, names):
            # nearest-rank: smallest bucket whose cumulative count reaches
            # ceil(q*n); the float product q*n is the SAME IEEE double op
            # in the SQL mirror, so the knife edge cannot diverge
            r = np.ceil(q * gn.astype(np.float64)).astype(np.int64)
            out = np.empty(len(gn), np.float64)
            for g in range(len(gn)):  # bounded by type count
                s, e = gstarts[g], gends[g]
                local = cum[s:e] - base[g]
                out[g] = est[s + np.searchsorted(local, r[g], side="left")]
            cols[nm + "_est"] = pa.array(out, pa.float64())
        return pa.table(cols, schema=out_schema)

    return (
        ev.map_batches(
            partial, batch_format="pyarrow", batch_size=combine_batch_rows
        )
        .groupby("prt")
        .map_groups(
            lambda g: finalize(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )


_HDR_C = """CAST(CASE WHEN value >= 0 THEN floor(value * 100.0 + 0.5)
                 ELSE ceil(value * 100.0 - 0.5) END AS BIGINT)"""

_HDR_BID = f"""CASE WHEN {_HDR_C} < 32 THEN {_HDR_C}
    ELSE (length(printf('%b', {_HDR_C})) << 5)
         | ({_HDR_C} >> (length(printf('%b', {_HDR_C})) - 5)) END"""

_HDR_EST = """CASE WHEN bid < 32 THEN bid / 100.0
    ELSE (((bid & 31) << ((bid >> 5) - 5))
          + (CAST(1 AS BIGINT) << ((bid >> 5) - 6)))
         / 100.0 END"""


def _hdr_pick(q: str) -> str:
    return (
        f"min(CASE WHEN cum >= ceil({q} * n) THEN est END)"
    )


HDR_VALUE_QUANTILES_SQL = f"""
WITH b AS (
  SELECT event_type, {_HDR_BID} AS bid, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
), w AS (
  SELECT event_type, bid, {_HDR_EST} AS est,
         sum(c) OVER (PARTITION BY event_type ORDER BY bid) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM b
)
SELECT event_type, max(n)::BIGINT AS n,
       {_hdr_pick('0.5')} AS p5_est,
       {_hdr_pick('0.9')} AS p9_est,
       {_hdr_pick('0.99')} AS p99_est
FROM w GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# t-digest quantiles: mergeable sketch for UNBOUNDED float domains
# ---------------------------------------------------------------------------

def tdigest_value_quantiles(sf_dir: str, delta: int = 200,
                            buckets: int = 32,
                            combine_batch_rows: int = 1_048_576):
    """Approximate p50/p90/p99 of ``value`` per event_type from a
    mergeable t-digest (stages/tdigest.py) -- the float-domain companion
    of ``hdr_value_quantiles`` (HDR needs a bounded integer domain fixed
    up front; the t-digest's centroids adapt to whatever arrives, with
    rank resolution densest at the tails).

    Rows-only query: the sketch is approximate by design; the rank-error
    contract (|rank(est) - q| bounded by the local centroid weight,
    sub-0.5%% at delta=200) and the merge determinism are pinned in
    tests/test_tdigest.py against exact np.percentile.

    Scale shape: per-batch (type -> digest) combiner collapses raw rows
    to <= delta centroids per type per batch; ONE exchange hashed on
    type ships centroid lists (bounded by delta x batches, never rows);
    the per-type finalize merges and reads the three quantiles."""
    from ..stages.tdigest import build_digest, merge_digests, quantile

    ev = _read_events(sf_dir, ["event_type", "value"])

    part_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("n", pa.int64()),
            ("means", pa.list_(pa.float64())),
            ("weights", pa.list_(pa.float64())),
            ("prt", pa.int64()),
        ]
    )

    def digest_partial(t: pa.Table) -> pa.Table:
        import zlib

        t = t.combine_chunks()
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = et.dictionary_encode()
        tid = np.asarray(codes.indices, np.int64)
        types = codes.dictionary.to_pylist()
        v = _np(t["value"]).astype(np.float64)
        order = np.lexsort((v, tid))
        tid_s, v_s = tid[order], v[order]
        starts = np.flatnonzero(
            np.concatenate(([True], tid_s[1:] != tid_s[:-1]))
        )
        ends = np.concatenate((starts[1:], [len(tid_s)]))
        names, ns, ms, ws = [], [], [], []
        for s, e in zip(starts, ends):
            mean_a, w_a = build_digest(v_s[s:e], delta)
            names.append(types[tid_s[s]])
            ns.append(int(e - s))
            ms.append(mean_a)
            ws.append(w_a)
        h = np.array([zlib.crc32(x.encode()) for x in names], np.int64)
        return pa.table(
            {
                "event_type": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "means": pa.array(ms, pa.list_(pa.float64())),
                "weights": pa.array(ws, pa.list_(pa.float64())),
                "prt": pa.array(hash_prt(h, buckets), pa.int64()),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("n", pa.int64()),
            ("p50", pa.float64()),
            ("p90", pa.float64()),
            ("p99", pa.float64()),
        ]
    )

    def finalize(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        df = t.to_pydict()
        by_type: dict = {}
        for et, n, m, w in zip(
            df["event_type"], df["n"], df["means"], df["weights"]
        ):
            slot = by_type.setdefault(et, [0, []])
            slot[0] += n
            slot[1].append(
                (np.asarray(m, np.float64), np.asarray(w, np.float64))
            )
        names = sorted(by_type)
        rows = {"event_type": [], "n": [], "p50": [], "p90": [], "p99": []}
        for et in names:
            n, parts = by_type[et]
            mm, ww = merge_digests(parts, delta)
            p = quantile(mm, ww, [0.5, 0.9, 0.99])
            rows["event_type"].append(et)
            rows["n"].append(n)
            rows["p50"].append(round(float(p[0]), 6))
            rows["p90"].append(round(float(p[1]), 6))
            rows["p99"].append(round(float(p[2]), 6))
        return pa.table(rows, schema=out_schema)

    return (
        ev.map_batches(digest_partial, batch_format="pyarrow",
                       batch_size=combine_batch_rows)
        .groupby("prt")
        .map_groups(
            lambda g: finalize(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )
