"""Distributed cardinality sketch: HyperLogLog over Ray Data batches.

The engine-new "novel sketch" operator class (SURVEY.md section 2 /
custom-operator list): a fixed 2^p-register HyperLogLog whose per-batch
partial is a vectorized (bucket, rho) max -- registers merge by MAX, which
is associative/commutative/idempotent, so ANY partition of the input
(batches, blocks, retries) yields bit-identical registers and therefore a
bit-identical estimate.

Everything is deterministic and exactly mirrorable in SQL: the hash is the
splitmix64 finalizer (same mix as stages/joins.hash_prt), rho comes from an
exact integer bit-length (no float log2 near power-of-two boundaries), and
the indicator sum rides exact integers (sum of 2^(53-rho) as Python ints /
HUGEINT in the oracle) so float summation order never perturbs the
estimate.  Flajolet et al.'s raw estimator + the small-range
linear-counting correction (the only branch reachable below ~2.5 * 2^p).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


def mix64(k: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (identical to the mix inside joins.hash_prt);
    input any int dtype, output uint64."""
    with np.errstate(over="ignore"):
        h = k.astype(np.int64).view(np.uint64).copy()
        h ^= h >> np.uint64(30)
        h *= _C1
        h ^= h >> np.uint64(27)
        h *= _C2
        h ^= h >> np.uint64(31)
        return h


def _bitlen(w: np.ndarray) -> np.ndarray:
    """Exact bit length of uint64 values (0 for 0) -- six-step binary
    reduction, pure integer ops (float log2 is off-by-one near 2^k)."""
    out = np.zeros(w.shape, np.int64)
    cur = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = cur >= (np.uint64(1) << np.uint64(s))
        out[big] += s
        cur[big] >>= np.uint64(s)
    out[w != 0] += 1
    return out


def hll_partial(keys: np.ndarray, p: int = 12) -> tuple[np.ndarray, np.ndarray]:
    """Per-batch HLL partial: (buckets, rho maxima) with at most 2^p rows,
    via one sort + segment max -- no Python loop over rows."""
    h = mix64(keys)
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    with np.errstate(over="ignore"):
        w = h << np.uint64(p)
    rho = np.where(w == 0, np.int64(64 - p + 1), 64 - _bitlen(w) + 1)
    if not len(bucket):
        return bucket, rho
    order = np.argsort(bucket, kind="stable")
    b_s, r_s = bucket[order], rho[order]
    starts = np.flatnonzero(np.concatenate(([True], b_s[1:] != b_s[:-1])))
    return b_s[starts], np.maximum.reduceat(r_s, starts)


def merge_registers(bucket: np.ndarray, rho: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Merge partial (bucket, rho) rows by per-bucket MAX (vectorized)."""
    if not len(bucket):
        return bucket, rho
    order = np.argsort(bucket, kind="stable")
    b_s, r_s = bucket[order], rho[order]
    starts = np.flatnonzero(np.concatenate(([True], b_s[1:] != b_s[:-1])))
    return b_s[starts], np.maximum.reduceat(r_s, starts)


def hll_estimate(bucket: np.ndarray, rho: np.ndarray, p: int = 12) -> float:
    """Estimate from merged registers; registers absent from ``bucket`` are
    zero.  Mirrored operand-for-operand in the SQL oracle (see
    analytics.APPROX_DISTINCT_SQL): the indicator sum is exact integer
    arithmetic, the final math is float64 with identical literal order."""
    m = 1 << p
    nonzero = len(bucket)
    v = m - nonzero
    # sum of 2^(53 - rho): exact Python ints (rho in [1, 53])
    s = int(sum(1 << (53 - int(r)) for r in rho)) + v * (1 << 53)
    alpha = 0.7213 / (1.0 + 1.079 / float(m))
    e_raw = alpha * float(m) * float(m) * 9007199254740992.0 / float(s)
    if e_raw <= 2.5 * float(m) and v > 0:
        e = float(m) * float(np.log(float(m) / float(v)))
    else:
        e = e_raw
    return float(np.round(e + 1e-9, 6))


PARTIAL_SCHEMA = pa.schema([("bucket", pa.int64()), ("rho", pa.int64())])


def partial_table(keys: np.ndarray, p: int = 12, prt_mod: int = 32) -> pa.Table:
    """Arrow partial for one batch, pre-tagged with a small partition id so
    the register merge runs as a handful of vectorized tasks."""
    b, r = hll_partial(keys, p)
    return pa.table(
        {
            "bucket": pa.array(b, pa.int64()),
            "rho": pa.array(r, pa.int64()),
            "prt": pa.array(b % prt_mod, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Count-Min sketch: frequency estimation with bounded counters
# ---------------------------------------------------------------------------

_CMS_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def cms_buckets(keys: np.ndarray, d: int, w: int) -> np.ndarray:
    """(n, d) bucket ids: row j hashes ``mix64(key + j*golden)`` mod w --
    d independent-enough hash rows from one mixer, all integer math,
    mirrored exactly in SQL."""
    k = keys.astype(np.int64).view(np.uint64)
    cols = []
    with np.errstate(over="ignore"):
        for j in range(d):
            cols.append(
                (mix64((k + np.uint64(j) * _CMS_GOLDEN).view(np.int64))
                 % np.uint64(w)).astype(np.int64)
            )
    return np.stack(cols, axis=1)


def cms_partial(keys: np.ndarray, d: int, w: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-batch counter increments as (row, bucket, count) triples --
    at most d*w rows regardless of batch size.  Merge = plain sum
    (order-insensitive int64)."""
    if not len(keys):
        z = np.empty(0, np.int64)
        return z, z, z
    b = cms_buckets(keys, d, w)
    rows_out, buckets_out, counts_out = [], [], []
    for j in range(d):
        cnt = np.bincount(b[:, j], minlength=w)
        nz = np.flatnonzero(cnt)
        rows_out.append(np.full(len(nz), j, np.int64))
        buckets_out.append(nz.astype(np.int64))
        counts_out.append(cnt[nz].astype(np.int64))
    return (
        np.concatenate(rows_out),
        np.concatenate(buckets_out),
        np.concatenate(counts_out),
    )


def cms_estimate(counter: np.ndarray, probe_keys: np.ndarray) -> np.ndarray:
    """min over d rows of the probe key's counters (the CMS upper-bound
    estimate; never underestimates)."""
    d, w = counter.shape
    b = cms_buckets(probe_keys, d, w)
    est = counter[0, b[:, 0]]
    for j in range(1, d):
        est = np.minimum(est, counter[j, b[:, j]])
    return est
