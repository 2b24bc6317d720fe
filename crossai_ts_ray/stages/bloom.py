"""Distributed Bloom filter: the semi-join pre-filter for large-large joins.

At 100 TB the cheapest way to join a huge probe side against a selective
build side is to NOT ship the probe side at all: build a fixed-size bit
array from the build keys (bounded by ``m_bits/8`` bytes no matter how many
billions of build rows), broadcast it once, and drop probe rows whose k
probe bits aren't all set -- only survivors (matches + a deterministic,
quantifiable false-positive residue) enter the real exchange.

Determinism mirrors stages/sketch.py: double hashing from two splitmix64
finalizers (h1 = mix64(key), h2 = mix64(key XOR golden)), positions
``(h1 + i*h2) mod 2^64 mod m``; the filter is a bit-OR of per-batch
partials -- associative/commutative/idempotent, so any sharding or retry
yields the same bits, and the SQL oracle reproduces membership (including
false positives) exactly.
"""

from __future__ import annotations

import numpy as np

from .sketch import mix64

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def bloom_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) int64 bit positions for each key (vectorized double hashing)."""
    h1 = mix64(keys)
    with np.errstate(over="ignore"):
        h2 = mix64(keys.astype(np.int64).view(np.uint64) ^ _GOLDEN)
        cols = [
            ((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.int64)
            for i in range(k)
        ]
    return np.stack(cols, axis=1)


def partial_bits(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Sorted unique bit positions set by this batch of build keys -- the
    mergeable partial (union = bit OR), at most min(n*k, m_bits) int64s."""
    if not len(keys):
        return np.empty(0, np.int64)
    return np.unique(bloom_positions(keys, m_bits, k).ravel())


def pack_bitmap(positions: np.ndarray, m_bits: int) -> np.ndarray:
    """Dense uint64 bitmap (m_bits/64 words) from set positions."""
    bm = np.zeros((m_bits + 63) // 64, np.uint64)
    if len(positions):
        w = positions >> 6
        b = (positions & 63).astype(np.uint64)
        np.bitwise_or.at(bm, w, np.uint64(1) << b)
    return bm


def probe_bitmap(keys: np.ndarray, bm: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Boolean mask: key passes iff ALL k probe bits are set."""
    if not len(keys):
        return np.zeros(0, bool)
    pos = bloom_positions(keys, m_bits, k)
    ok = np.ones(len(keys), bool)
    for i in range(k):
        p = pos[:, i]
        ok &= ((bm[p >> 6] >> (p & 63).astype(np.uint64)) & np.uint64(1)) == 1
    return ok
