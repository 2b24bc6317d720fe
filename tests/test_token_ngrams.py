"""Token-n-gram dedup layer: packing exactness, fixture semantics,
broadcast==partitioned parity, pack guards, and DuckDB value parity of all
four queries at sf0.001."""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _canon(ds):
    from tools.verify_correctness import canon, to_pandas

    return canon(to_pandas(ds))


def _write_docs(path, texts, sources=None):
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "source": pa.array(sources or ["s0"] * n, pa.string()),
    }), str(path / "documents.parquet"))


def test_ngram_keys_pack_exact_and_ragged():
    """Hand-computed window keys over a ragged batch; short rows yield no
    windows; the pack is the exact base-128 polynomial."""
    from crossai_ts_ray.pipelines.token_ngrams import _ngram_keys

    # rows: [1,2,3,4], [9], [5,6,7]
    vals = np.array([1, 2, 3, 4, 9, 5, 6, 7], dtype=np.int64)
    offs = np.array([0, 4, 5, 8], dtype=np.int64)
    keys, win_row = _ngram_keys(vals, offs, n=3)
    expect = [
        1 + 2 * 128 + 3 * 128 ** 2,
        2 + 3 * 128 + 4 * 128 ** 2,
        5 + 6 * 128 + 7 * 128 ** 2,
    ]
    assert keys.tolist() == expect
    assert win_row.tolist() == [0, 0, 2]


def test_ngram_pack_guards():
    import pytest

    from crossai_ts_ray.pipelines.token_ngrams import _ngram_keys

    with pytest.raises(ValueError, match="overflow"):
        _ngram_keys(np.array([128], np.int64), np.array([0, 1], np.int64), 1)
    with pytest.raises(ValueError, match="overflow"):
        _ngram_keys(np.array([1] * 20, np.int64),
                    np.array([0, 20], np.int64), 10)


def test_dup_ngrams_fixture_semantics(ray_session, tmp_path):
    """Two docs sharing one 3-token run, plus an in-doc repeat: occurrence
    and distinct-doc counts match hand counts; unique windows are absent."""
    from crossai_ts_ray.pipelines.token_ngrams import (
        doc_dup_ngram_rate,
        dup_token_ngrams,
    )
    from crossai_ts_ray.sources import readers

    readers._DERIVED_CACHE.clear()
    # token values are word LENGTHS: craft docs by word length patterns
    # doc0: lens 1,2,3,9    doc1: lens 1,2,3,5   doc2: lens 4,4,4,4,4
    _write_docs(tmp_path, [
        "a bb ccc ddddddddd",
        "x yy zzz eeeee",
        "pppp qqqq rrrr ssss tttt",
    ])
    out = _canon(dup_token_ngrams(str(tmp_path), n=3))
    key123 = 1 + 2 * 128 + 3 * 128 ** 2
    key444 = 4 + 4 * 128 + 4 * 128 ** 2
    rows = {int(r.ngram_key): (int(r.n_occ), int(r.n_docs))
            for r in out.itertuples()}
    assert rows[key123] == (2, 2)     # shared across doc0/doc1
    assert rows[key444] == (3, 1)     # repeated 3x inside doc2
    assert len(rows) == 2             # nothing else duplicated

    rate = _canon(doc_dup_ngram_rate(str(tmp_path), n=3))
    by_doc = {r.doc_id: (int(r.n_windows), int(r.n_dup), r.dup_rate)
              for r in rate.itertuples()}
    assert by_doc["0"] == (2, 1, 0.5)
    assert by_doc["1"] == (2, 1, 0.5)
    assert by_doc["2"] == (3, 3, 1.0)
    readers._DERIVED_CACHE.clear()


def test_clean_corpus_ngram_fixture(ray_session, tmp_path):
    """Threshold cleaning: the fully-duplicated doc drops, the half-dup
    docs stay at max_rate=0.5, and a too-short doc is trivially kept."""
    from crossai_ts_ray.pipelines.token_ngrams import clean_corpus_ngram
    from crossai_ts_ray.sources import readers

    readers._DERIVED_CACHE.clear()
    _write_docs(tmp_path, [
        "a bb ccc ddddddddd",            # 2 windows, 1 dup -> rate 0.5
        "x yy zzz eeeee",                # 2 windows, 1 dup -> rate 0.5
        "pppp qqqq rrrr ssss tttt",      # rate 1.0 -> dropped
        "hi bye",                        # n_tok=2 < n -> kept, zeros
    ])
    out = _canon(clean_corpus_ngram(str(tmp_path), n=3, max_rate=0.5))
    got = {r.doc_id: (int(r.n_windows), int(r.n_dup), r.dup_rate)
           for r in out.itertuples()}
    assert got == {"0": (2, 1, 0.5), "1": (2, 1, 0.5), "3": (0, 0, 0.0)}
    readers._DERIVED_CACHE.clear()


def test_dup_rate_broadcast_eq_partitioned(ray_session):
    import pandas.testing as pdt

    from crossai_ts_ray.pipelines.token_ngrams import doc_dup_ngram_rate

    a = _canon(doc_dup_ngram_rate(SF, broadcast=True))
    b = _canon(doc_dup_ngram_rate(SF, broadcast=False))
    pdt.assert_frame_equal(a, b)


def test_novelty_and_distinct_fixture(ray_session, tmp_path):
    """Per-source novelty: a token's first bucket claims it exactly once;
    distinct counts are per-cell exact."""
    from crossai_ts_ray.pipelines.token_ngrams import (
        rollup_distinct_tokens,
        token_novelty_by_bucket,
    )
    from crossai_ts_ray.sources import readers

    readers._DERIVED_CACHE.clear()
    # source s0: seq0 lens {1,2}, seq1 lens {1}, seq2 lens {3}
    # source s1: seq0 lens {2}
    _write_docs(
        tmp_path,
        ["a bb", "c", "ddd", "ee"],
        sources=["s0", "s0", "s0", "s1"],
    )
    nov = _canon(token_novelty_by_bucket(str(tmp_path), width=2))
    got = {(r.source, int(r.bucket)): int(r.n_new_tokens)
           for r in nov.itertuples()}
    # s0 bucket0 (seq 0-1): first-seen {1,2}; bucket1 (seq 2): {3}
    assert got == {("s0", 0): 2, ("s0", 1): 1, ("s1", 0): 1}

    dst = _canon(rollup_distinct_tokens(str(tmp_path), width=2))
    got2 = {(r.source, int(r.bucket)): int(r.n_distinct_tok)
            for r in dst.itertuples()}
    assert got2 == {("s0", 0): 2, ("s0", 1): 1, ("s1", 0): 1}
    readers._DERIVED_CACHE.clear()


def test_token_ngram_queries_duckdb_parity(ray_session):
    """All four registered queries match their oracles at sf0.001."""
    import duckdb
    import pandas.testing as pdt

    from crossai_ts_ray.pipelines import token_ngrams as tn
    from tools.verify_correctness import canon, to_pandas

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    pairs = [
        (tn.dup_token_ngrams(SF), tn.dup_token_ngrams_sql()),
        (tn.doc_dup_ngram_rate(SF), tn.doc_dup_ngram_rate_sql()),
        (tn.rollup_distinct_tokens(SF), tn.rollup_distinct_tokens_sql()),
        (tn.token_novelty_by_bucket(SF), tn.token_novelty_by_bucket_sql()),
    ]
    for ds, sql in pairs:
        mine = canon(to_pandas(ds))
        oracle = canon(con.execute(sql).df())
        pdt.assert_frame_equal(mine, oracle, check_dtype=False)


def test_dedup_ngram_spans_fixture(ray_session, tmp_path):
    """ExactSubstr semantics, hand-checked: the corpus-FIRST occurrence
    of a duplicated window survives; later occurrences excise their
    token span; overlapping loser spans union; unique docs lose nothing."""
    from crossai_ts_ray.pipelines.token_ngrams import dedup_ngram_spans
    from crossai_ts_ray.sources import readers

    readers._DERIVED_CACHE.clear()
    # doc0 owns the first (1,2,3) at pos 0; doc1 repeats it at pos 0 AND
    # pos 2 (overlap via lens 1,2,1,2,3); doc2 is unique
    _write_docs(tmp_path, [
        "a bb ccc",              # lens 1,2,3: winner of key(1,2,3)
        "x yy z ww eee",         # lens 1,2,1,2,3 -> windows at 0,1,2
        "pppp qq rrrrrr",        # lens 4,2,6: unique
    ])
    out = _canon(dedup_ngram_spans(str(tmp_path), n=3))
    got = {r.doc_id: (int(r.n_tok), int(r.n_removed), r.keep_frac)
           for r in out.itertuples()}
    # doc1: windows (1,2,1)@0 unique, (2,1,2)@1 unique, (1,2,3)@2 LOSES
    # to doc0 -> removes tokens [2,5) = 3 tokens
    assert got["0"] == (3, 0, 1.0)
    assert got["1"] == (5, 3, 0.4)
    assert got["2"] == (3, 0, 1.0)

    # in-doc repeat: first occurrence wins WITHIN a doc too
    readers._DERIVED_CACHE.clear()
    _write_docs(tmp_path, ["a bb ccc q a bb ccc"])  # lens 1,2,3,1,1,2,3
    out2 = _canon(dedup_ngram_spans(str(tmp_path), n=3))
    r = out2.iloc[0]
    # loser windows: (1,2,3)@4 -> removes [4,7) = 3 tokens
    assert (int(r.n_tok), int(r.n_removed)) == (7, 3)
    readers._DERIVED_CACHE.clear()


def test_dedup_ngram_spans_paths_and_oracle(ray_session):
    import duckdb
    import pandas.testing as pdt

    from crossai_ts_ray.pipelines.token_ngrams import (
        dedup_ngram_spans,
        dedup_ngram_spans_sql,
    )
    from tools.verify_correctness import canon, to_pandas

    a = canon(to_pandas(dedup_ngram_spans(SF, broadcast=True)))
    b = canon(to_pandas(dedup_ngram_spans(SF, broadcast=False)))
    pdt.assert_frame_equal(a, b)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    oracle = canon(con.execute(dedup_ngram_spans_sql()).df())
    pdt.assert_frame_equal(a, oracle, check_dtype=False)


def test_ngram_edges_no_dups_and_empty_tokens(ray_session, tmp_path):
    """Zero duplicated keys: rate=0 everywhere, spans remove nothing, on
    BOTH paths; empty-string tokens (len 0) pack fine."""
    import pandas.testing as pdt

    from crossai_ts_ray.pipelines.token_ngrams import (
        dedup_ngram_spans,
        doc_dup_ngram_rate,
        dup_token_ngrams,
    )
    from crossai_ts_ray.sources import readers

    readers._DERIVED_CACHE.clear()
    # all windows unique; doc1 has a double space -> an empty token (len 0)
    _write_docs(tmp_path, [
        "a bb ccc dddd",
        "x  yyy zz q",     # lens 1,0,3,2,1
    ])
    assert len(_canon(dup_token_ngrams(str(tmp_path), n=3))) == 0
    for bc in (True, False):
        rate = _canon(doc_dup_ngram_rate(str(tmp_path), n=3, broadcast=bc))
        assert (rate.n_dup == 0).all() and (rate.dup_rate == 0.0).all()
        spans = _canon(dedup_ngram_spans(str(tmp_path), n=3, broadcast=bc))
        assert (spans.n_removed == 0).all()
        assert (spans.keep_frac == 1.0).all()
    a = _canon(dedup_ngram_spans(str(tmp_path), n=3, broadcast=True))
    b = _canon(dedup_ngram_spans(str(tmp_path), n=3, broadcast=False))
    pdt.assert_frame_equal(a, b)
    readers._DERIVED_CACHE.clear()


def test_decontaminate_fixture_and_duckdb(ray_session, tmp_path):
    """Planted leakage: doc 0 is the eval split (eval_mod=2 puts even ids
    there); doc 1 copies an eval phrase (contaminated), doc 3 shares no
    window (clean), short docs are excluded.  Plus the full-SF DuckDB
    mirror at the default n=8/eval_mod=10."""
    import duckdb

    from crossai_ts_ray.pipelines.token_ngrams import (
        DECONTAMINATE_AGAINST_EVAL_SQL,
        decontaminate_against_eval,
    )
    from crossai_ts_ray.sources import readers
    from tools.verify_correctness import TABLES, canon, to_pandas

    readers._DERIVED_CACHE.clear()
    _write_docs(tmp_path, [
        "a bb ccc d",        # 0: eval (tokens 1,2,3,1)
        "a bb ccc d x",      # 1: train, windows [1,2,3],[2,3,1],[3,1,1]
                             #    -> first two hit eval's [1,2,3],[2,3,1]
        "zz qqq w",          # 2: eval
        "mm nn oo pp",       # 3: train (2,2,2,2) -> no eval window
        "hi yo",             # 4: train but < n tokens -> excluded
    ])
    got = canon(to_pandas(
        decontaminate_against_eval(str(tmp_path), n=3, eval_mod=2)
    )).set_index("doc_id")
    assert sorted(got.index) == ["1", "3"]
    assert int(got.loc["1", "windows"]) == 3
    assert int(got.loc["1", "contaminated"]) == 2
    assert got.loc["1", "contamination_rate"] == 2 / 3
    assert bool(got.loc["1", "is_contaminated"])
    assert int(got.loc["3", "contaminated"]) == 0
    assert not bool(got.loc["3", "is_contaminated"])

    readers._DERIVED_CACHE.clear()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    full = canon(to_pandas(decontaminate_against_eval(SF)))
    want = canon(con.sql(DECONTAMINATE_AGAINST_EVAL_SQL).df())
    assert full.equals(want)


def test_curate_corpus_composition(ray_session):
    """The composed curation gate equals its DuckDB mirror at sf0.001, and
    each predicate provably bites: the survivor set excludes every eval id,
    every contaminated id, every non-first duplicate, and every
    out-of-bounds length."""
    import duckdb

    from crossai_ts_ray.pipelines.token_ngrams import (
        CURATE_CORPUS_SQL,
        curate_corpus,
        decontaminate_against_eval,
    )
    from tools.verify_correctness import TABLES, canon, to_pandas

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    got = canon(to_pandas(curate_corpus(SF)))
    want = canon(con.sql(CURATE_CORPUS_SQL).df())
    assert got.equals(want)
    assert 0 < len(got) < 500  # the gate actually filters

    ids = got["doc_id"].to_numpy()
    assert (ids % 10 != 0).all()
    nch = got["n_chars"].to_numpy()
    assert ((nch >= 100) & (nch <= 500)).all()
    flagged = canon(to_pandas(decontaminate_against_eval(SF)))
    cont = set(
        flagged.loc[flagged["is_contaminated"], "doc_id"].astype(int)
    )
    assert not (set(ids.tolist()) & cont)
