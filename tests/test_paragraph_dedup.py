"""Paragraph(chunk)-level dedup: fixture semantics (first occurrence
wins, fully-duplicated docs vanish, chunk boundaries honored), bucket
invariance, and DuckDB value parity at sf0.001."""

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


def _write_docs(path, texts):
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64),
                           pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(path / "documents.parquet"))


def test_paragraph_dedup_fixture_semantics(ray_session, tmp_path):
    from crossai_ts_ray.pipelines.text_pipeline import (
        clean_corpus_paragraphs,
        dedup_paragraphs,
    )

    A = " ".join(f"a{i}" for i in range(16))   # one full chunk
    B = " ".join(f"b{i}" for i in range(16))
    C = " ".join(f"c{i}" for i in range(8))    # a ragged tail chunk
    texts = [
        f"{A} {B} {C}",   # doc 0: owns A, B, C
        f"{B} {A}",       # doc 1: both chunks already seen -> vanishes
        f"{C} {B}",       # doc 2: chunk0 = "c0..c7 b0..b7" is NEW (16-word
                          # window, not paragraph-aligned); chunk1 "b8..b15"
                          # is new too (different alignment of B)
        f"{A} {C}",       # doc 3: chunk A dup; tail chunk C dup of doc 0's
    ]
    _write_docs(tmp_path, texts)
    d = str(tmp_path)

    wins = _canon(dedup_paragraphs(d, P=3))
    # doc 0 owns its three chunks; copies counted corpus-wide
    by_hash = wins.set_index("par_hash")
    assert (wins["rep_doc_id"] == 0).sum() == 3
    # A appears in doc0(ch0), doc1(ch1), doc3(ch0) -> 3 copies
    import hashlib

    hA = hashlib.md5(A.encode()).hexdigest()
    assert int(by_hash.loc[hA, "copies"]) == 3
    assert int(by_hash.loc[hA, "rep_doc_id"]) == 0
    assert int(by_hash.loc[hA, "rep_idx"]) == 0

    clean = _canon(clean_corpus_paragraphs(d, P=3))
    got = dict(zip(clean["doc_id"], clean["clean_text"]))
    assert 1 not in got                      # fully-duplicated doc dropped
    assert got[0] == f"{A} {B} {C}"          # owner keeps everything
    assert got[2] == f"{C} {B}"              # re-aligned chunks are new
    assert 3 not in got                      # both of doc 3's chunks dup


def test_paragraph_dedup_bucket_invariance_and_oracle(ray_session):
    import duckdb
    import pandas.testing as pdt

    from crossai_ts_ray.pipelines.text_pipeline import (
        CLEAN_CORPUS_PARAGRAPHS_SQL,
        DEDUP_PARAGRAPHS_SQL,
        clean_corpus_paragraphs,
        dedup_paragraphs,
    )

    a = _canon(dedup_paragraphs(SF, P=1))
    b = _canon(dedup_paragraphs(SF, P=17))
    pdt.assert_frame_equal(a, b)
    c = _canon(clean_corpus_paragraphs(SF, P=1))
    e = _canon(clean_corpus_paragraphs(SF, P=13))
    pdt.assert_frame_equal(c, e)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    pdt.assert_frame_equal(
        a, _canon(con.execute(DEDUP_PARAGRAPHS_SQL).df()),
        check_dtype=False,
    )
    pdt.assert_frame_equal(
        c, _canon(con.execute(CLEAN_CORPUS_PARAGRAPHS_SQL).df()),
        check_dtype=False,
    )
    # conservation: every chunk is either kept somewhere or a dup copy
    n_chunks = int(a["copies"].sum())
    kept_words = sum(len(t.split(" ")) for t in c["clean_text"])
    orig_words = int(con.execute(
        "SELECT sum(len(string_split(text,' '))) FROM documents"
    ).fetchone()[0])
    assert kept_words <= orig_words and n_chunks >= len(a)


def test_paragraph_idx_pack_guard(ray_session, tmp_path):
    """A doc long enough to overflow the 20-bit chunk-index pack raises
    loudly instead of silently merging keep-keys."""
    import pytest

    from crossai_ts_ray.pipelines.text_pipeline import (
        clean_corpus_paragraphs,
    )

    # k=1 makes every word a chunk; 2**20 + 1 words overflows the pack
    _write_docs(tmp_path, [" ".join(["w"] * ((1 << 20) + 1))])
    with pytest.raises(Exception, match="overflow"):
        _canon(clean_corpus_paragraphs(str(tmp_path), k=1, P=2))


def test_clean_paragraphs_broadcast_eq_exchange(ray_session):
    """The broadcast keep-set fast path is bitwise the exchange path."""
    import pandas.testing as pdt

    from crossai_ts_ray.pipelines.text_pipeline import (
        clean_corpus_paragraphs,
    )

    a = _canon(clean_corpus_paragraphs(SF, P=5, broadcast=True))
    b = _canon(clean_corpus_paragraphs(SF, P=5, broadcast=False))
    pdt.assert_frame_equal(a, b)
