"""Round-5 wave-6 operators: BM25 ranked retrieval, blocked edit-distance
near-dup pairs, and the N-step funnel — each vs its DuckDB oracle at
sf0.001 plus kernel/edge properties."""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from '{SF}/documents.parquet'"
    )
    con.sql(f"create view events as select * from '{SF}/events.parquet'")
    return con.sql(sql).df()


def _cmp(rdf: pd.DataFrame, odf: pd.DataFrame, key: list[str]):
    assert len(rdf) == len(odf)
    rs = rdf.sort_values(key).reset_index(drop=True)
    os_ = odf.sort_values(key).reset_index(drop=True)
    os_ = os_.astype(rs.dtypes.to_dict())
    pd.testing.assert_frame_equal(rs, os_)


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

class TestBM25:
    def test_matches_oracle_default(self, ray_session):
        from crossai_ts_ray.pipelines.search import (
            BM25_SEARCH_SQL,
            bm25_search,
        )

        rdf = pd.DataFrame(bm25_search(SF).take_all())
        _cmp(rdf, _oracle(BM25_SEARCH_SQL), ["score", "doc_id"])

    def test_matches_oracle_three_terms(self, ray_session):
        from crossai_ts_ray.pipelines.search import bm25_search, bm25_sql

        terms = ("scan", "merge", "window")
        rdf = pd.DataFrame(bm25_search(SF, terms=terms, k=25).take_all())
        _cmp(rdf, _oracle(bm25_sql(terms=terms, k=25)), ["score", "doc_id"])

    def test_absent_term_contributes_nothing(self, ray_session):
        from crossai_ts_ray.pipelines.search import bm25_search

        base = pd.DataFrame(bm25_search(SF, terms=("scan",), k=10).take_all())
        plus = pd.DataFrame(
            bm25_search(SF, terms=("scan", "zzqqxx_not_a_word"), k=10).take_all()
        )
        # an absent term has no postings: same docs, same scores
        assert list(base["doc_id"]) == list(plus["doc_id"])
        assert np.allclose(base["score"], plus["score"])
        assert (plus["n_matched"] == 1).all()

    def test_empty_terms_raise(self, ray_session):
        from crossai_ts_ray.pipelines.search import bm25_search

        with pytest.raises(ValueError):
            bm25_search(SF, terms=())

    def test_scores_positive_and_sorted(self, ray_session):
        from crossai_ts_ray.pipelines.search import bm25_search

        rdf = pd.DataFrame(bm25_search(SF).take_all())
        assert (rdf["score"] > 0).all()
        assert (rdf["score"].values == np.sort(rdf["score"].values)[::-1]).all()


# ---------------------------------------------------------------------------
# Levenshtein kernel + blocked near-dup pairs
# ---------------------------------------------------------------------------

class TestEditDistance:
    def test_kernel_fuzz_vs_duckdb(self):
        import random

        from crossai_ts_ray.functions.text import levenshtein

        rng = random.Random(42)
        con = duckdb.connect()
        for _ in range(200):
            a = "".join(rng.choice("abcd e") for _ in range(rng.randrange(0, 30)))
            b = "".join(rng.choice("abcde f") for _ in range(rng.randrange(0, 30)))
            want = con.sql(
                "select levenshtein(?, ?)", params=[a, b]
            ).fetchone()[0]
            assert levenshtein(a, b) == want, (a, b)

    def test_kernel_cap_short_circuits(self):
        from crossai_ts_ray.functions.text import levenshtein

        assert levenshtein("abcdefgh", "zzzzzzzz", cap=3) == 4
        assert levenshtein("abc", "abd", cap=3) == 1
        assert levenshtein("", "abc") == 3
        assert levenshtein("same", "same", cap=0) == 0

    def test_pairs_match_oracle(self, ray_session):
        from crossai_ts_ray.pipelines.text_pipeline import (
            DEDUP_EDIT_PAIRS_SQL,
            dedup_edit_pairs,
        )

        rdf = pd.DataFrame(dedup_edit_pairs(SF).take_all())
        _cmp(rdf, _oracle(DEDUP_EDIT_PAIRS_SQL), ["doc_a", "doc_b"])

    def test_oversized_block_raises(self, ray_session):
        from crossai_ts_ray.pipelines.text_pipeline import dedup_edit_pairs

        with pytest.raises(Exception) as ei:
            dedup_edit_pairs(SF, max_block=1).take_all()
        assert "max_block" in str(ei.value)


# ---------------------------------------------------------------------------
# N-step funnel
# ---------------------------------------------------------------------------

class TestFunnelStages:
    def test_matches_oracle(self, ray_session):
        from crossai_ts_ray.pipelines.analytics import (
            FUNNEL_STAGES_SQL,
            funnel_stages,
        )

        rdf = pd.DataFrame(funnel_stages(SF).take_all())
        _cmp(rdf, _oracle(FUNNEL_STAGES_SQL), ["user_id"])

    def test_invariants(self, ray_session):
        from crossai_ts_ray.pipelines.analytics import funnel_stages

        rdf = pd.DataFrame(funnel_stages(SF).take_all())
        assert rdf["stage"].between(1, 3).all()
        assert (rdf["t_last"] >= rdf["t_first"]).all()
        # stage 1 means no later step: t_last == t_first
        one = rdf[rdf["stage"] == 1]
        assert (one["t_last"] == one["t_first"]).all()

    def test_two_step_agrees_with_user_conversion(self, ray_session):
        from crossai_ts_ray.pipelines.analytics import (
            funnel_stages,
            user_conversion,
        )

        fu = pd.DataFrame(
            funnel_stages(SF, steps=("signup", "purchase")).take_all()
        ).set_index("user_id")
        uc = pd.DataFrame(user_conversion(SF).take_all()).set_index("user_id")
        assert set(fu.index) == set(uc.index)
        uc = uc.loc[fu.index]
        assert (fu["t_first"] == uc["signup_ts"]).all()
        converted = fu["stage"] == 2
        assert (converted == uc["purchase_ts"].notna()).all()
        assert (
            fu.loc[converted, "t_last"] == uc.loc[converted, "purchase_ts"]
        ).all()

    def test_bad_steps_raise(self, ray_session):
        from crossai_ts_ray.pipelines.analytics import funnel_stages

        with pytest.raises(ValueError):
            funnel_stages(SF, steps=("view",))
        with pytest.raises(ValueError):
            funnel_stages(SF, steps=("view", "view"))


    def test_vectorized_kernels_match_scalar(self):
        import random

        import numpy as np

        from crossai_ts_ray.functions.text import (
            levenshtein,
            levenshtein_one_vs_many,
            levenshtein_pairs,
        )

        rng = random.Random(31)
        for _ in range(60):
            n = rng.randrange(1, 10)
            As = ["".join(rng.choice("abc d") for _ in range(rng.randrange(0, 30))) for _ in range(n)]
            Bs = ["".join(rng.choice("abcd e") for _ in range(rng.randrange(0, 30))) for _ in range(n)]
            cap = rng.choice([None, 0, 4, 12])
            want = np.array([levenshtein(a, b, cap=cap) for a, b in zip(As, Bs)])
            assert np.array_equal(levenshtein_pairs(As, Bs, cap=cap), want)
            got1 = levenshtein_one_vs_many(As[0], Bs, cap=cap)
            want1 = np.array([levenshtein(As[0], b, cap=cap) for b in Bs])
            assert np.array_equal(got1, want1)
