"""Deduplication kernels: exact hash, MinHash, SimHash -- vectorized NumPy.

Engine-new (the reference has no dedup, SURVEY.md §2.8); these are the batch
kernels behind pipelines/text_pipeline.py's dedup stages:

* exact:    content hash -> hash-partition -> per-group first
* MinHash:  shingle -> k min-hashes -> band LSH -> bucket groupby ->
            candidate pairs -> Jaccard verify
* SimHash:  64-bit sign fingerprint of hashed shingles; near-dups share
            fingerprints within small Hamming distance
"""

from __future__ import annotations

import numpy as np

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, n: int = 5) -> np.ndarray:
    """Stable 64-bit hashes of character n-grams (FNV-1a over bytes,
    vectorized via byte matrix)."""
    b = text.encode("utf-8")
    if len(b) < n:
        b = b + b"\x00" * (n - len(b))
    arr = np.frombuffer(b, dtype=np.uint8)
    idx = np.arange(len(arr) - n + 1)[:, None] + np.arange(n)[None, :]
    windows = arr[idx].astype(np.uint64)
    h = np.full(len(windows), 0xCBF29CE484222325, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            h ^= windows[:, j]
            h *= np.uint64(0x100000001B3)
    return np.unique(h)


class MinHasher:
    """k-permutation MinHash over shingle hashes.  The (a, b) parameter
    matrix is built once (per actor) and applied vectorized per doc."""

    def __init__(self, num_hashes: int = 64, seed: int = 7, ngram: int = 5):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, num_hashes, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, num_hashes, dtype=np.uint64)
        self.k = num_hashes
        self.ngram = ngram

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.ngram)
        with np.errstate(over="ignore"):
            # (k, n_shingles) universal hash, min over shingles
            prod = self.a[:, None] * sh[None, :] + self.b[:, None]
            prod = (prod & _MERSENNE) + (prod >> np.uint64(61))
        return prod.min(axis=1).astype(np.uint64)

    def band_keys(self, sig: np.ndarray, bands: int) -> np.ndarray:
        """LSH band keys: hash of each band's rows; docs sharing any band key
        are candidates."""
        r = self.k // bands
        with np.errstate(over="ignore"):
            view = sig[: bands * r].reshape(bands, r)
            keys = np.full(bands, 0xCBF29CE484222325, dtype=np.uint64)
            for j in range(r):
                keys ^= view[:, j]
                keys *= np.uint64(0x100000001B3)
        return keys

    def estimate_jaccard(self, sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float((sig_a == sig_b).mean())


def simhash64(text: str, ngram: int = 5) -> np.uint64:
    """64-bit SimHash over shingle hashes: sign of per-bit vote sums."""
    sh = _shingle_hashes(text, ngram)
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = bits.sum(axis=0) * 2 - len(sh)
    fp = np.uint64(0)
    for i, v in enumerate(votes):
        if v > 0:
            fp |= np.uint64(1) << np.uint64(i)
    return fp


def hamming64(a: np.ndarray, b: np.uint64) -> np.ndarray:
    """Vectorized Hamming distance of uint64 array vs scalar."""
    x = a ^ b
    cnt = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt
