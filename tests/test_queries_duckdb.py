"""Self-contained driver-gate sample inside pytest: a representative query
from each family run through Ray AND its oracle SQL through DuckDB at
sf0.001, compared exactly (the full multi-query gate is
tools/verify_correctness.py; the external driver runs the same comparison at
sf0.01)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"

SAMPLE = [
    "rollup_w4",             # tier rollup bundle over the derived token table
    "events_gapfill_locf",   # wall-clock buckets + LOCF gap-fill
    "events_user_sessions",  # order-sensitive per-key scan
    "asof_last_event_value", # broadcast as-of join
    "window_agg_tumbling_w16",  # fused window segmentation + aggregation
    "q1_pricing_summary",    # decimal-exact grouped aggregate
    "dedup_exact",           # hash-partition dedup
    "ann_cosine_topk",       # brute-force cosine top-k
    "q3_shipping_priority",  # dimension-broadcast + large-large join + top-k
    "q5_local_supplier_revenue",  # multi-dimension join, same-nation filter
    "q6_forecast_revenue",   # zero-exchange filter + global sum
    "parts_never_bulk_ordered",   # partitioned anti-join (NOT EXISTS)
    "user_top_event",        # grouped argmax with per-batch combiner
    "user_running_total",    # ordered scan, segmented cumulative sum
    "doc_fingerprints",      # mod-2^64 Horner hash vs HUGEINT list_reduce
    "simhash_fingerprints",  # FNV-1a shingle SimHash vs UBIGINT bit-vote SQL
    "dedup_minhash_pairs",   # full MinHash-LSH pipeline vs its SQL mirror
    "ann_cosine_topk_multi", # broadcast query-matrix top-k vs window SQL
    "clean_corpus",          # SimHash pairs -> components -> representative
                             # keep, vs the recursive-CTE closure oracle
    "q4_order_priority",     # correlated EXISTS semi-join, one keyed exchange
    "q18_large_orders",      # groupby-HAVING + join-back of rare survivors
    "user_value_quantiles",  # grouped exact PERCENTILE_CONT (linear interp)
    "events_type_pivot",     # per-user pivot over the event-type domain
    "topk_events_per_user",  # grouped top-k rows with rank (row_number <= 3)
    "type_user_distinct",    # distributed exact COUNT(DISTINCT) per group
    "ewma_hourly",           # sequential IIR recurrence vs recursive CTE,
                             # bitwise (identical float op order)
    "user_breakout_minmax",  # expanding-frame window min/max scan
    "user_conversion",       # funnel: first signup -> first later purchase
    "q10_returned_revenue",  # join + grouped top-k + dimension attach
    "segment_nation_rollup", # GROUP BY ROLLUP: 3 granularities, one pass
    "type_hourly_corr",      # cross-series Pearson r over paired hourly means
    "source_token_entropy",  # per-source Shannon entropy + KL vs corpus via
                             # hash(word)-partitioned moment reduction
    "tier_anomaly_w4",       # trailing-window z-score drift flags over the
                             # w4 rollup tier (int64 micro-unit windows,
                             # bitwise-mirrored float expression)
    "token_pmi_topk",        # bigram PMI collocations: two crc32-routed
                             # partitioned joins + string post-filter
    "user_interarrival_stats",  # burstiness: exact integer gap reductions,
                                # mirrored float mean/CV
    "rolling_median_hourly",    # windowed quantile: rolling median of
                                # centi-int hourly means (exact dyadic)
    "canary_scan",              # probe-string audit: zero-exchange batch x
                                # probe partials, absent probes report zeros
    "rolling_active_users",     # sliding COUNT DISTINCT via expansion-
                                # before-exchange, all-integer exact
    "user_session_stats",       # per-session count+duration fused into
                                # the sessionization partition pass
    "type_hourly_full_join",    # FULL OUTER join of two hourly series
                                # (keyed_equijoin how='full')
    "asof_next_event_value",    # forward as-of (next-touch attribution),
                                # value tiebreak mirrored in the oracle
    "value_rank_dense",         # RANK/DENSE_RANK per distinct value from
                                # merged count histograms
    "user_event_path",          # ordered STRING_AGG: chronological path,
                                # capped prefix, total tie order
    "source_doclen_quantiles",  # grouped exact PERCENTILE_CONT over the
                                # documents table (length-gate audit)
    "busy_hour_islands",        # gaps-and-islands: contiguous busy-hour
                                # runs via row_number-difference mirror
    "activity_profile",         # weekly dow x hod heatmap, domain-bounded
                                # combiner (types x 168 rows per batch)
    "weighted_avg_price_by_flag",  # weighted aggregate sum(w*x)/sum(w),
                                   # exact-int cross sums vs HUGEINT
    "above_avg_events",         # correlated-subquery shape, integer
                                # cross-multiply mean comparison
    "users_both_halves",        # INTERSECT set op via distinct
                                # (user, half) pairs, 2x-users shuffle
    "avg_user_total_by_type",   # nested aggregate: avg over users of
                                # exact per-user totals
    "users_first_half_only",    # EXCEPT set op (lapsed users); non-empty
                                # outputs proven by randomized test
]


@pytest.fixture(scope="module")
def duck(ray_session):
    import duckdb

    from tools.verify_correctness import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle_sql(ray_session, duck, name):
    import __ray_entry__ as E
    from tools.verify_correctness import compare, to_pandas

    ray_df = to_pandas(E.queries()[name](SF))
    sql_df = duck.execute(E.oracle_sql()[name]).df()
    problems = [p for p in compare(name, ray_df, sql_df) if "warning" not in p]
    assert not problems, problems
