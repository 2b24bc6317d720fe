"""Wave-5 quality operators: Gopher repetition signals vs a brute-force
per-doc reference, redaction parity vs Python re, and BPE merge learning /
encoding vs a naive pure-Python Sennrich reference."""

from __future__ import annotations

import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Gopher repetition signals
# ---------------------------------------------------------------------------


def _brute_signals(text: str):
    """Per-doc reference: count x charlen over word n-grams."""
    words = text.split(" ")
    nch = float(len(text)) or 1.0

    def grams(n):
        out = {}
        for i in range(len(words) - n + 1):
            g = " ".join(words[i : i + n])
            out[g] = out.get(g, 0) + 1
        return out

    g2, g3 = grams(2), grams(3)
    top2 = max((c * len(g) for g, c in g2.items()), default=0)
    top3 = max((c * len(g) for g, c in g3.items()), default=0)
    dup3 = sum(c * len(g) for g, c in g3.items() if c >= 2)
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    return r6(top2 / nch), r6(top3 / nch), r6(dup3 / nch)


def test_repetition_kernel_matches_bruteforce():
    from crossai_ts_ray.pipelines.quality_w5 import _repetition_kernel

    texts = [
        "a b a b a b",               # dominant bigram
        "x",                          # too short for any gram
        "q w e r t y",                # all grams unique -> dup3 = 0
        "go go go go go go",          # one repeated token
        "aa bb cc aa bb cc aa bb",    # repeated trigram
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    out = _repetition_kernel(t).to_pandas()
    for i, s in enumerate(texts):
        e2, e3, d3 = _brute_signals(s)
        assert out.top2_frac[i] == e2, (i, out.top2_frac[i], e2)
        assert out.top3_frac[i] == e3
        assert out.dup3_frac[i] == d3


def test_repetition_sf0001_spotcheck(ray_session):
    """Distributed output == brute-force on every sf0.001 doc."""
    from crossai_ts_ray.pipelines.quality_w5 import gopher_repetition

    got = gopher_repetition(SF).to_pandas().set_index("doc_id").sort_index()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    assert len(got) == docs.num_rows
    for did, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        e2, e3, d3 = _brute_signals(text)
        row = got.loc[did]
        assert (row.top2_frac, row.top3_frac, row.dup3_frac) == (e2, e3, d3)


def test_gate_filters_some_docs(ray_session):
    """The gate is non-degenerate on the synthetic corpus: it keeps most
    docs but drops a real tail."""
    from crossai_ts_ray.pipelines.quality_w5 import gopher_gate

    got = gopher_gate(SF).to_pandas()
    assert got.kept.sum() > 0.8 * (got.kept.sum() + got.dropped.sum())
    assert got.dropped.sum() > 0


# ---------------------------------------------------------------------------
# Redaction
# ---------------------------------------------------------------------------


def test_redaction_matches_python_re(ray_session):
    from crossai_ts_ray.pipelines.quality_w5 import (
        REDACT_PATTERN,
        REDACT_TOKEN,
        doc_redact_terms,
    )

    got = doc_redact_terms(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    pat = re.compile(REDACT_PATTERN)
    n_with_hits = 0
    for did, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        row = got.loc[did]
        assert row.n_hits == len(pat.findall(text))
        assert row.text_red == pat.sub(REDACT_TOKEN, text)
        n_with_hits += row.n_hits > 0
    assert n_with_hits > 0  # the blocklist actually fires on this corpus


# ---------------------------------------------------------------------------
# BPE
# ---------------------------------------------------------------------------


def _naive_bpe(word_counts, num_merges):
    """Independent reference: the textbook Sennrich loop, dict-based."""
    vocab = {tuple(w) + ("\x17",): c for w, c in word_counts.items() if w}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for sym, c in vocab.items():
            for a, b in zip(sym[:-1], sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < 2:
            break
        merges.append((best[0], best[1], pairs[best]))
        a, b = best
        new_vocab = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_learn_bpe_matches_naive_reference():
    from crossai_ts_ray.pipelines.quality_w5 import learn_bpe_merges

    wc = {
        "low": 5, "lower": 2, "newest": 6, "widest": 3,
        "aaaa": 4,  # overlap case: greedy left-to-right pairing
        "banana": 2,
    }
    for m in (1, 3, 8, 20):
        assert learn_bpe_merges(wc, m) == _naive_bpe(wc, m), m


def test_bpe_tiebreak_deterministic():
    from crossai_ts_ray.pipelines.quality_w5 import learn_bpe_merges

    # 'ab' and 'cd' both occur twice -> lexicographically smallest wins
    wc = {"ab": 2, "cd": 2}
    merges = learn_bpe_merges(wc, 1)
    assert merges[0][:2] == ("a", "b")


def test_encode_word_consistent_with_training():
    """Encoding a training word with the learned merge list reproduces the
    symbols the trainer ends with (greedy replacement order is shared)."""
    from crossai_ts_ray.pipelines.quality_w5 import encode_word, learn_bpe_merges

    wc = {"banana": 3, "bandana": 2, "low": 5, "lowest": 2, "aaaa": 2}
    merges = learn_bpe_merges(wc, 10)
    # re-run the trainer's replacement to get final symbols per word
    for w in wc:
        sym = list(w) + ["\x17"]
        for a, b, _ in merges:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == a and sym[i + 1] == b:
                    sym[i : i + 2] = [a + b]
                else:
                    i += 1
        assert encode_word(w, merges) == sym, w


def test_bpe_encode_stats_matches_bruteforce(ray_session):
    from crossai_ts_ray.pipelines.quality_w5 import (
        bpe_encode_stats,
        corpus_word_histogram,
        encode_word,
        learn_bpe_merges,
    )

    hist = corpus_word_histogram(SF)
    merges = learn_bpe_merges(hist, 12)
    piece_len = {w: len(encode_word(w, merges)) for w in hist}

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text", "source"])
    exp: dict[str, list[int]] = {}
    for text, src in zip(docs["text"].to_pylist(), docs["source"].to_pylist()):
        words = text.split(" ")
        e = exp.setdefault(src, [0, 0])
        e[0] += sum(piece_len[w] for w in words)
        e[1] += len(words)

    got = bpe_encode_stats(SF, 12).to_pandas().set_index("source")
    assert len(got) == len(exp)
    for src, (np_, nw) in exp.items():
        assert (got.loc[src].n_pieces, got.loc[src].n_words) == (np_, nw)


def test_bpe_merges_table_shape(ray_session):
    from crossai_ts_ray.pipelines.quality_w5 import bpe_merges

    t = bpe_merges(SF, 8)
    assert t.column_names == ["step", "left", "right", "pair_count"]
    assert t.num_rows == 8
    counts = t["pair_count"].to_pylist()
    assert all(c >= 2 for c in counts)
