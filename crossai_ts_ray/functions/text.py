"""Text-analysis kernels for large-scale training-data pipelines: tokenize,
language-ID heuristic, quality scoring, fingerprints, shingles.

Engine-new capability (no reference equivalent -- crossai-ts is signal-only);
designed as vectorized per-batch kernels for ``map_batches``.  Stateful pieces
(compiled regexes, stopword tables) live in actor classes
(pipelines/text_pipeline.py).
"""

from __future__ import annotations

import hashlib

import numpy as np

# tiny per-language stopword lists for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "that", "it", "for"},
    "es": {"el", "la", "de", "y", "que", "en", "un", "una", "por", "con"},
    "fr": {"le", "la", "de", "et", "que", "en", "un", "une", "pour", "dans"},
    "de": {"der", "die", "das", "und", "zu", "in", "ein", "eine", "mit", "von"},
    "zh": set(),  # detected via CJK codepoint ratio instead
}

_MOD64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_B = np.uint64(1000003)  # polynomial rolling-hash base


def whitespace_tokens(text: str) -> list[str]:
    """The engine's pinned tokenization: ``str.split(' ')`` (keeps empties,
    matching DuckDB ``string_split(text, ' ')``)."""
    return text.split(" ")


def token_lengths(text: str) -> np.ndarray:
    return np.array([len(w) for w in whitespace_tokens(text)], dtype=np.int32)


def detect_language(text: str) -> str:
    """Heuristic language ID: CJK codepoint ratio, then stopword hit counts."""
    if not text:
        return "und"
    cjk = sum(1 for ch in text[:400] if "一" <= ch <= "鿿")
    if cjk / max(1, min(len(text), 400)) > 0.05:
        return "zh"
    words = set(text.lower().split(" ")[:200])
    best, best_hits = "und", 0
    for lang, sw in STOPWORDS.items():
        hits = len(words & sw)
        if hits > best_hits:
            best, best_hits = lang, hits
    return best


def quality_score(text: str) -> float:
    """Simple quality heuristic in [0,1]: length band, mean word length band,
    alpha ratio.  Deterministic, documented components."""
    if not text:
        return 0.0
    n = len(text)
    words = text.split(" ")
    mean_wl = sum(len(w) for w in words) / max(1, len(words))
    alpha = sum(ch.isalpha() or ch == " " for ch in text[:1000]) / min(n, 1000)
    len_ok = 1.0 if 50 <= n <= 100_000 else 0.5 if n >= 20 else 0.0
    wl_ok = 1.0 if 2.0 <= mean_wl <= 12.0 else 0.3
    return round((len_ok + wl_ok + alpha) / 3.0, 6)


def md5_fingerprint(text: str) -> str:
    """Content fingerprint (DuckDB-checkable: ``md5(text)``)."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def rolling_hash_fingerprint(tokens: np.ndarray) -> np.uint64:
    """Order-sensitive polynomial rolling hash of a token sequence
    (vectorized Horner via power table); the document-fingerprint primitive."""
    v = np.asarray(tokens, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return np.uint64(0)
    with np.errstate(over="ignore"):
        # powers B^(n-1-i); Horner without a Python loop: log-doubling table
        exps = np.arange(n - 1, -1, -1, dtype=np.uint64)
        result = np.uint64(0)
        powers = np.ones(n, dtype=np.uint64)
        base_pow = _B
        e = exps.copy()
        while e.any():
            odd = (e & np.uint64(1)).astype(bool)
            powers[odd] *= base_pow
            e >>= np.uint64(1)
            base_pow *= base_pow
        result = np.uint64((v * powers).sum())
    return result


def char_ngrams(text: str, n: int = 5) -> set[int]:
    """Hashed character shingles (n-gram set) for Jaccard similarity.
    Uses crc32 (stable across processes -- never Python ``hash()``, which is
    PYTHONHASHSEED-randomized and would break distributed determinism)."""
    import zlib

    if len(text) < n:
        return {zlib.crc32(text.encode("utf-8"))}
    enc = text.encode("utf-8")  # byte n-grams; fine for similarity purposes
    return {zlib.crc32(enc[i : i + n]) for i in range(len(enc) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def levenshtein(a: str, b: str, cap: int | None = None) -> int:
    """Unicode-code-point Levenshtein distance (matches DuckDB's
    ``levenshtein``), vectorized row DP with the scan trick: the
    insertion recurrence ``cur[j] = min(m[j], cur[j-1] + 1)`` unrolls to
    ``min_i (m[i] + (j - i))``, i.e. a running minimum of ``m - idx``.
    ``cap`` short-circuits to ``cap + 1`` once a full row exceeds it
    (banded early exit for near-dup thresholds)."""
    if a == b:
        return 0
    if len(a) < len(b):  # DP row over the shorter string
        a, b = b, a
    A = np.frombuffer(a.encode("utf-32-le"), np.uint32)
    B = np.frombuffer(b.encode("utf-32-le"), np.uint32)
    lb = len(B)
    if lb == 0:
        return len(A) if cap is None else min(len(A), cap + 1)
    idx = np.arange(1, lb + 1, dtype=np.int64)
    prev = np.arange(lb + 1, dtype=np.int64)
    for i, ca in enumerate(A, 1):
        m = np.minimum(prev[1:] + 1, prev[:-1] + (B != ca))
        v = np.concatenate(([np.int64(i)], m)) - np.concatenate(
            ([np.int64(0)], idx)
        )
        cur = np.minimum.accumulate(v)
        cur[1:] += idx
        cur[0] = i
        if cap is not None and cur.min() > cap:
            return cap + 1
        prev = cur
    d = int(prev[-1])
    return d if cap is None else min(d, cap + 1)


def levenshtein_one_vs_many(
    a: str, bs: list[str], cap: int | None = None
) -> np.ndarray:
    """Levenshtein distance of ``a`` against MANY candidates at once:
    the same scan-trick row DP, vectorized over the candidate axis (one
    (k x max_len) matrix per DP row instead of k separate Python loops).
    Returns int64 distances; entries exceeding ``cap`` are reported as
    ``cap + 1`` (rows whose running minimum passes ``cap`` are frozen).
    Padded columns beyond a candidate's true length cannot corrupt its
    result: position j depends only on positions <= j, and each row is
    read out at its own true length."""
    k = len(bs)
    if k == 0:
        return np.zeros(0, np.int64)
    A = np.frombuffer(a.encode("utf-32-le"), np.uint32)
    la = len(A)
    lens = np.array([len(b) for b in bs], np.int64)
    lb_max = int(lens.max())
    if lb_max == 0:
        out = np.full(k, la, np.int64)
        if cap is not None:
            out = np.minimum(out, cap + 1)
        return out
    B = np.zeros((k, lb_max), np.uint32)
    for i, b in enumerate(bs):
        if b:
            B[i, : len(b)] = np.frombuffer(b.encode("utf-32-le"), np.uint32)
    idx = np.arange(1, lb_max + 1, dtype=np.int64)
    prev = np.broadcast_to(
        np.arange(lb_max + 1, dtype=np.int64), (k, lb_max + 1)
    ).copy()
    out = np.full(k, la, np.int64)  # empty-a fallback; overwritten below
    alive = np.ones(k, bool)
    frozen = np.zeros(k, np.int64)
    for i in range(1, la + 1):
        ca = A[i - 1]
        m = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + (B != ca))
        v = np.concatenate(
            (np.full((k, 1), i, np.int64), m), axis=1
        )
        v[:, 1:] -= idx
        cur = np.minimum.accumulate(v, axis=1)
        cur[:, 1:] += idx
        prev = cur
        if cap is not None:
            over = alive & (cur.min(axis=1) > cap)
            if over.any():
                alive &= ~over
                frozen[over] = cap + 1
                if not alive.any():
                    return frozen
    res = prev[np.arange(k), lens]
    if cap is not None:
        res = np.where(alive, np.minimum(res, cap + 1), frozen)
    return res.astype(np.int64)


def levenshtein_pairs(
    a_list: list[str], b_list: list[str], cap: int | None = None
) -> np.ndarray:
    """Levenshtein distance of MANY INDEPENDENT PAIRS at once: all pairs
    advance through the row DP together (step i compares each pair's
    own i-th left-hand character against its padded right-hand row), so
    the per-step work is a handful of vectorized ops over a
    (pairs x max_len) matrix instead of a Python loop per pair.  Rows
    finish when their left string runs out (their result is read at
    their own right-hand length) or when their running minimum exceeds
    ``cap`` (frozen at ``cap + 1``); finished rows are compacted away,
    so distant pairs stop costing work as soon as the cap kills them.
    Same contract as ``levenshtein`` (cap-clamped)."""
    k = len(a_list)
    if k != len(b_list):
        raise ValueError("length mismatch")
    if k == 0:
        return np.zeros(0, np.int64)
    la = np.array([len(a) for a in a_list], np.int64)
    lb = np.array([len(b) for b in b_list], np.int64)
    la_max = int(la.max())
    lb_max = int(lb.max())
    res = np.zeros(k, np.int64)
    if lb_max == 0:
        res[:] = la if cap is None else np.minimum(la, cap + 1)
        return res
    A = np.zeros((k, max(la_max, 1)), np.uint32)
    B = np.zeros((k, lb_max), np.uint32)
    for i, (a, b) in enumerate(zip(a_list, b_list)):
        if a:
            A[i, : len(a)] = np.frombuffer(a.encode("utf-32-le"), np.uint32)
        if b:
            B[i, : len(b)] = np.frombuffer(b.encode("utf-32-le"), np.uint32)
    idx = np.arange(1, lb_max + 1, dtype=np.int64)
    prev = np.broadcast_to(
        np.arange(lb_max + 1, dtype=np.int64), (k, lb_max + 1)
    ).copy()
    live = np.arange(k)  # original indices of still-active rows
    # rows whose left string is empty finish immediately
    done0 = la[live] == 0
    if done0.any():
        orig = live[done0]
        res[orig] = lb[orig] if cap is None else np.minimum(
            lb[orig], cap + 1
        )
        keep = ~done0
        live, prev, A, B = live[keep], prev[keep], A[keep], B[keep]
    for i in range(1, la_max + 1):
        if not len(live):
            break
        ca = A[:, i - 1]
        m = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + (B != ca[:, None]))
        v = np.concatenate(
            (np.full((len(live), 1), i, np.int64), m), axis=1
        )
        v[:, 1:] -= idx
        cur = np.minimum.accumulate(v, axis=1)
        cur[:, 1:] += idx
        prev = cur
        finished = la[live] == i
        if finished.any():
            orig = live[finished]
            d = cur[finished, lb[orig]]
            res[orig] = d if cap is None else np.minimum(d, cap + 1)
        drop = finished
        if cap is not None:
            over = cur.min(axis=1) > cap
            res[live[over & ~finished]] = cap + 1
            drop = drop | over
        if drop.any():
            keep = ~drop
            live, prev, A, B = live[keep], prev[keep], A[keep], B[keep]
    return res
