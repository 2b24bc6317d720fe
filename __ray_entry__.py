"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
(or in crossai_ts_ray) calls ``ray.init()`` / ``ray.shutdown()``.

``queries()`` / ``oracle_sql()`` pairs are verified side-by-side by the driver
at sf=0.01 (row count + schema + order-insensitive value hash) and mirrored
locally by ``tools/verify_correctness.py``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: documents -> derived token table -> 3-tier rollup cascade
    (count/sum/mean/min/max/p50/p99 over n_tok + token streams); returns the
    finest tier."""
    from crossai_ts_ray.pipelines.rollup_pipeline import documents_rollup

    return documents_rollup(SF_SMOKE, "w4")


# --------------------------------------------------------------------------
# rollup family: documents-derived token table, tier cascade
# --------------------------------------------------------------------------

def _rollup_query(tier_name: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        from crossai_ts_ray.pipelines.rollup_pipeline import documents_rollup

        return documents_rollup(sf_dir, tier_name)

    return run


def _rollup_sql(width: int) -> str:
    return f"""
WITH tok AS (
  SELECT source,
         (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1) // {width} AS bucket,
         string_split(text, ' ') AS words,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
),
flat0 AS (SELECT source, bucket, unnest(words) AS w FROM tok),
flat AS (SELECT source, bucket, length(w) AS tokval FROM flat0),
ntok_agg AS (
  SELECT source, bucket,
         count(*)::BIGINT AS "count",
         sum(n_tok)::BIGINT AS "sum",
         round(sum(n_tok)::DOUBLE / count(*)::DOUBLE, 6) AS "mean",
         min(n_tok)::INTEGER AS "min",
         max(n_tok)::INTEGER AS "max",
         round(quantile_cont(n_tok, 0.50), 6) AS p50,
         round(quantile_cont(n_tok, 0.99), 6) AS p99
  FROM tok GROUP BY source, bucket
),
tok_agg AS (
  SELECT source, bucket,
         count(*)::BIGINT AS tok_count,
         sum(tokval)::BIGINT AS tok_sum,
         round(sum(tokval)::DOUBLE / count(*)::DOUBLE, 6) AS tok_mean,
         min(tokval)::INTEGER AS tok_min,
         max(tokval)::INTEGER AS tok_max,
         round(quantile_cont(tokval, 0.50), 6) AS tok_p50,
         round(quantile_cont(tokval, 0.99), 6) AS tok_p99
  FROM flat GROUP BY source, bucket
)
SELECT n.source, n.bucket, n."count", n."sum", n."mean", n."min", n."max",
       n.p50, n.p99, t.tok_count, t.tok_sum, t.tok_mean, t.tok_min,
       t.tok_max, t.tok_p50, t.tok_p99
FROM ntok_agg n JOIN tok_agg t USING (source, bucket)
"""


def _tier_anomaly_q(sf_dir: str):
    from crossai_ts_ray.pipelines.rollup_pipeline import tier_anomaly

    return tier_anomaly(sf_dir, "w4", trail=8, z_thresh=3.0)


# Bitwise mirror of tier_anomaly: the tier's round-6 mean re-quantized to
# exact int64 micro-units; window count/sum/sum-of-squares are exact integer
# sums (order-free), and the float expression over them is written in the
# SAME op order as the numpy kernel, so the doubles agree bit-for-bit.
_TIER_ANOMALY_SQL = """
WITH tok AS (
  SELECT source,
         (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1) // 4
           AS bucket,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
),
agg AS (
  SELECT source, bucket,
         round(sum(n_tok)::DOUBLE / count(*)::DOUBLE, 6) AS mean
  FROM tok GROUP BY 1, 2
),
t AS (
  SELECT source, bucket,
         CAST(round(mean * 1000000, 0) AS BIGINT) AS xu
  FROM agg
),
w AS (
  SELECT source, bucket, xu,
         count(xu) OVER win AS pn,
         coalesce(sum(xu) OVER win, 0) AS ps1,
         coalesce(sum(xu * xu) OVER win, 0) AS ps2
  FROM t
  WINDOW win AS (PARTITION BY source ORDER BY bucket
                 ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)
),
calc AS (
  SELECT source, bucket, xu, pn,
         CAST(ps1 AS DOUBLE) / pn AS avgu,
         CASE WHEN pn >= 2 THEN
           (CAST(ps2 AS DOUBLE) - CAST(ps1 AS DOUBLE) * CAST(ps1 AS DOUBLE)
              / pn) / (pn - 1)
         END AS var
  FROM w
)
SELECT source, bucket,
       xu / 1000000.0 AS mean,
       pn::BIGINT AS trail_n,
       CASE WHEN pn > 0 THEN (avgu) / 1000000.0 END AS trail_mean,
       CASE WHEN pn >= 2 AND var > 0
            THEN round((CAST(xu AS DOUBLE) - avgu) / sqrt(var), 6) END AS z,
       coalesce(pn >= 2 AND var > 0
                AND abs((CAST(xu AS DOUBLE) - avgu) / sqrt(var)) > 3.0,
                FALSE) AS is_anomaly
FROM calc
"""


# --------------------------------------------------------------------------
# events family: wall-clock hour buckets, gap-fill, sliding windows
# --------------------------------------------------------------------------

def _events_hourly(sf_dir: str):
    from crossai_ts_ray.pipelines.events_pipeline import hourly_rollup

    return hourly_rollup(sf_dir)


def _events_gapfill(mode: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        from crossai_ts_ray.pipelines.events_pipeline import hourly_gapfill

        return hourly_gapfill(sf_dir, mode)

    return run


def _events_sliding(sf_dir: str):
    from crossai_ts_ray.pipelines.events_pipeline import sliding_hourly

    return sliding_hourly(sf_dir, window_buckets=3)


_EVENTS_AGG_SQL = """
  SELECT event_type AS source,
         (epoch_us(ts) // 1000000) // 3600 AS bucket,
         count(*)::BIGINT AS "count",
         round(sum(value), 6) AS val_sum
  FROM events GROUP BY 1, 2
"""

_EVENTS_GRID_SQL = f"""
agg AS ({_EVENTS_AGG_SQL}),
bounds AS (SELECT source, min(bucket) AS lo, max(bucket) AS hi FROM agg GROUP BY 1),
grid AS (
  SELECT b.source, unnest(generate_series(b.lo, b.hi)) AS bucket FROM bounds b
),
j AS (
  SELECT g.source, g.bucket,
         (a."count" IS NULL) AS filled,
         coalesce(a."count", 0)::BIGINT AS "count",
         a.val_sum AS v
  FROM grid g LEFT JOIN agg a USING (source, bucket)
)
"""

_EVENTS_HOURLY_SQL = f"SELECT * FROM ({_EVENTS_AGG_SQL})"

_EVENTS_LOCF_SQL = f"""
WITH {_EVENTS_GRID_SQL}
SELECT source, bucket, filled, "count",
       last_value(v IGNORE NULLS)
         OVER (PARTITION BY source ORDER BY bucket) AS val_sum
FROM j
"""

_EVENTS_LINEAR_SQL = f"""
WITH {_EVENTS_GRID_SQL},
m AS (
  SELECT *,
    last_value(v IGNORE NULLS)
      OVER (PARTITION BY source ORDER BY bucket) AS pv,
    last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
      OVER (PARTITION BY source ORDER BY bucket) AS pb,
    first_value(v IGNORE NULLS)
      OVER (PARTITION BY source ORDER BY bucket
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
      OVER (PARTITION BY source ORDER BY bucket
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
  FROM j
)
SELECT source, bucket, filled, "count",
  CASE
    WHEN v IS NOT NULL THEN v
    WHEN pv IS NULL THEN nv
    WHEN nv IS NULL THEN pv
    ELSE round((nv - pv) / (nb - pb) * (bucket - pb) + pv, 6)
  END AS val_sum
FROM m
"""

_EVENTS_SLIDING_SQL = f"""
WITH {_EVENTS_GRID_SQL},
dense AS (
  SELECT source, bucket, "count", coalesce(v, 0.0) AS v,
         row_number() OVER (PARTITION BY source ORDER BY bucket) AS rn
  FROM j
)
SELECT source, bucket AS win_end,
       sum("count") OVER w::BIGINT AS "count",
       round(sum(v) OVER w, 6) AS val_sum
FROM dense
WINDOW w AS (PARTITION BY source ORDER BY bucket ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
QUALIFY rn >= 3
"""


# --------------------------------------------------------------------------
# windowing family: reference sliding_window semantics over the token table
# --------------------------------------------------------------------------

def _window_counts_q(sf_dir: str):
    from crossai_ts_ray.pipelines.token_windows import doc_window_counts

    return doc_window_counts(sf_dir, window=16, overlap=8)


def _window_agg_q(window: int, overlap: int) -> Callable[[str], Any]:
    def run(sf_dir: str):
        from crossai_ts_ray.pipelines.token_windows import doc_window_aggs

        return doc_window_aggs(sf_dir, window, overlap)

    return run


_WINDOW_COUNTS_SQL = """
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       (CASE WHEN n_tok >= 16 THEN (n_tok - 16) // 8 + 1 ELSE 0 END)::BIGINT AS n_win
FROM (SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents)
"""


def _window_agg_sql(window: int, overlap: int) -> str:
    step = window - overlap
    return f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS words,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
),
flat AS (
  SELECT doc_id, n_tok, unnest(words) AS w, generate_subscripts(words, 1) AS i
  FROM tok
),
wins AS (
  SELECT doc_id, unnest(generate_series(0, (n_tok - {window}) // {step})) AS win_id
  FROM tok WHERE n_tok >= {window}
),
f AS (
  SELECT fl.doc_id, wi.win_id, length(fl.w)::BIGINT AS v
  FROM flat fl JOIN wins wi ON fl.doc_id = wi.doc_id
   AND fl.i - 1 >= wi.win_id * {step}
   AND fl.i - 1 <  wi.win_id * {step} + {window}
)
SELECT CAST(doc_id AS VARCHAR) AS doc_id, win_id,
       sum(v)::BIGINT AS win_sum,
       min(v)::INTEGER AS win_min,
       max(v)::INTEGER AS win_max,
       round(sum(v)::DOUBLE / {window}.0, 6) AS win_mean,
       round(quantile_cont(v, 0.5), 6) AS win_p50
FROM f GROUP BY doc_id, win_id
"""


def _rel(fn_name: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        from crossai_ts_ray.pipelines import relational

        return getattr(relational, fn_name)(sf_dir)

    return run


def _text(fn_name: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        from crossai_ts_ray.pipelines import text_pipeline

        return getattr(text_pipeline, fn_name)(sf_dir)

    return run


def _tngram(fn_name: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        from crossai_ts_ray.pipelines import token_ngrams

        return getattr(token_ngrams, fn_name)(sf_dir)

    return run


def _tngram_sql(fn_name: str) -> str:
    from crossai_ts_ray.pipelines import token_ngrams

    return getattr(token_ngrams, fn_name)()


def _qual(fn_name: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        from crossai_ts_ray.pipelines import quality_w5

        return getattr(quality_w5, fn_name)(sf_dir)

    return run


def _qual_sql(name: str) -> str:
    from crossai_ts_ray.pipelines import quality_w5

    return getattr(quality_w5, name)


def _mix(fn_name: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        from crossai_ts_ray.pipelines import mixture

        return getattr(mixture, fn_name)(sf_dir)

    return run


def _mix_sql(name: str) -> str:
    from crossai_ts_ray.pipelines import mixture

    return getattr(mixture, name)


def _ann(fn_name: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        from crossai_ts_ray.pipelines import ann_pipeline

        return getattr(ann_pipeline, fn_name)(sf_dir)

    return run


def _outlier_filter_q(sf_dir: str):
    """Grouped z-score outlier filter (the reference's filter_outliers,
    caits/eda/outliers_removal.py:58): per-lang filter of documents by
    n_chars.  Integer output columns -> exact comparison."""
    import ray.data as rd

    from crossai_ts_ray.functions.eda import filter_outliers_grouped

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    out = filter_outliers_grouped(ds, "lang", "n_chars", "zscore", threshold=2.0)
    return out.map_batches(
        lambda t: t.select(["doc_id", "lang", "n_chars"]), batch_format="pyarrow"
    )


_OUTLIER_SQL = """
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         avg(n_chars) OVER (PARTITION BY lang) AS m,
         stddev_pop(n_chars) OVER (PARTITION BY lang) AS sd
  FROM documents
) WHERE sd = 0 OR abs((n_chars - m) / sd) <= 2.0
"""


def _synth_job_q(sf_dir: str):
    """The full checkpointed rollup job (aligned cascade, atomic writes,
    lineage) on the deterministic TINY synthetic table; returns the finest
    tier.  Not SQL-expressible (input not a registered view): rows-only
    driver check; bitwise-vs-oracle is covered by tests/test_rollup.py and
    tests/test_resume.py."""
    import shutil
    import tempfile

    import pyarrow as pa

    from crossai_ts_ray import synth
    from crossai_ts_ray.schema import Tier
    from crossai_ts_ray.state.checkpoint import read_job_output, run_rollup_job

    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    out_dir = tempfile.mkdtemp(prefix="rollup_job_q_")
    try:
        run_rollup_job(d, out_dir, (Tier("t60", 60), Tier("t240", 240)))
        return read_job_output(out_dir, "t60")
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def _corpus_ingest_q(sf_dir: str):
    from crossai_ts_ray.state.dedup_index import corpus_ingest_job

    return corpus_ingest_job(sf_dir)


def _tier_range_q(sf_dir: str):
    """Checkpointed rollup job + fine-tier retention + the spliced
    multi-tier range query (state/query.py): recent spans answered from
    the fine tier, aged spans from the coarse tier, gap/overlap-free.
    Rows-only (input not a registered view); the splice contract and
    bitwise aggregate parity vs the single-process oracle are pinned in
    tests/test_tier_query.py."""
    import shutil
    import tempfile

    from crossai_ts_ray import synth
    from crossai_ts_ray.schema import Tier
    from crossai_ts_ray.state.checkpoint import run_rollup_job
    from crossai_ts_ray.state.query import query_range
    from crossai_ts_ray.state.retention import apply_retention

    tiers = (Tier("t60", 60), Tier("t240", 240))
    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    out_dir = tempfile.mkdtemp(prefix="tier_range_q_")
    try:
        run_rollup_job(d, out_dir, tiers)
        apply_retention(out_dir, {"t60": 5})
        res = query_range(out_dir, tiers, 0, 1 << 40)
        res = res.materialize()  # consume before the store is removed
        return res
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def _synth_retention_q(sf_dir: str):
    """Checkpointed rollup job + per-tier retention enforcement (keep the
    last 5 finest-tier buckets per source; file-stat fast paths, atomic
    rewrites, policy markers); returns the surviving finest-tier rows.
    Rows-only (input not a registered view); exactness vs the oracle
    filter, idempotence and resume are covered by tests/test_retention.py."""
    import shutil
    import tempfile

    from crossai_ts_ray import synth
    from crossai_ts_ray.schema import Tier
    from crossai_ts_ray.state.checkpoint import read_job_output, run_rollup_job
    from crossai_ts_ray.state.retention import apply_retention

    d = synth.generate(synth.TINY, synth.default_cache_dir(synth.TINY))
    out_dir = tempfile.mkdtemp(prefix="retention_job_q_")
    try:
        run_rollup_job(d, out_dir, (Tier("t60", 60), Tier("t240", 240)))
        apply_retention(out_dir, {"t60": 5})
        return read_job_output(out_dir, "t60")
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


_TEXT_STATS_SQL = """
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       len(string_split(text, ' '))::BIGINT AS n_tok,
       length(text)::BIGINT AS n_chars,
       round(
         (SELECT sum(length(w)) FROM unnest(string_split(text, ' ')) AS t(w))::DOUBLE
         / len(string_split(text, ' ')), 6) AS mean_word_len,
       md5(text) AS fingerprint
FROM documents
"""


def _sessions_q(sf_dir: str):
    from crossai_ts_ray.pipelines.events_pipeline import user_sessions

    return user_sessions(sf_dir, gap_s=1800)


_SESSIONS_SQL = """
WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
m AS (
  SELECT user_id,
         CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                   > 1800 * 1000000
              OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM e
)
SELECT user_id::BIGINT AS user_id, sum(new_s)::BIGINT AS sessions
FROM m GROUP BY user_id
"""


def _user_running_total_q(sf_dir: str):
    from crossai_ts_ray.pipelines.events_pipeline import user_running_total

    return user_running_total(sf_dir)


def _user_top_event_q(sf_dir: str):
    from crossai_ts_ray.pipelines.events_pipeline import user_top_event

    return user_top_event(sf_dir)


def _user_value_stats_q(sf_dir: str):
    from crossai_ts_ray.pipelines.events_pipeline import user_value_stats

    return user_value_stats(sf_dir)


def _asof_q(sf_dir: str):
    from crossai_ts_ray.pipelines.events_pipeline import asof_last_event_value

    return asof_last_event_value(sf_dir)


def _asof_next_q(sf_dir: str):
    from crossai_ts_ray.pipelines.events_pipeline import asof_next_event_value

    return asof_next_event_value(sf_dir)


def _order_event_window_q(sf_dir: str):
    from crossai_ts_ray.pipelines.events_pipeline import order_event_window

    return order_event_window(sf_dir)


def _hourly_anomalies_q(sf_dir: str):
    from crossai_ts_ray.pipelines.events_pipeline import hourly_anomalies

    return hourly_anomalies(sf_dir)


_ASOF_SQL = """
SELECT o.o_orderkey,
       round(
         (SELECT e.value FROM events e
          WHERE e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
          ORDER BY e.ts DESC, e.value DESC LIMIT 1), 6) AS last_event_value
FROM orders o
"""

_ASOF_NEXT_SQL = """
SELECT o.o_orderkey,
       round(
         (SELECT e.value FROM events e
          WHERE e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
          ORDER BY e.ts ASC, e.value ASC LIMIT 1), 6) AS next_event_value
FROM orders o
"""


def queries() -> dict[str, Callable[[str], Any]]:
    q: dict[str, Callable[[str], Any]] = {
        # rollup family (tier cascade over the documents-derived token table)
        "rollup_w4": _rollup_query("w4"),
        "rollup_w8_cascade": _rollup_query("w8"),
        "rollup_w16_cascade": _rollup_query("w16"),
        # trailing-window z-score drift flags over the w4 tier (anomaly
        # scans run on rollup-sized data, never raw tokens)
        "tier_anomaly_w4": _tier_anomaly_q,
        # events family (wall-clock buckets, gap-fill, sliding windows)
        "events_hourly": _events_hourly,
        "events_gapfill_locf": _events_gapfill("locf"),
        "events_gapfill_linear": _events_gapfill("linear"),
        "events_sliding_3h": _events_sliding,
        "events_user_sessions": _sessions_q,
        "user_value_stats": _user_value_stats_q,
        "user_top_event": _user_top_event_q,
        "user_running_total": _user_running_total_q,
        "asof_last_event_value": _asof_q,
        # forward as-of (next-touch attribution): earliest event at or
        # after the order date, same bucketed large-large shape
        "asof_next_event_value": _asof_next_q,
        # RANGE join: per-order 7-day attribution window over the
        # customer's events (two as-of prefix lookups per bucket)
        "order_event_window": _order_event_window_q,
        # rolling 24h z-score anomaly alerts over the hourly rollup
        "hourly_anomalies": _hourly_anomalies_q,
        # windowing family (reference sliding_window semantics)
        "window_counts_w16_o8": _window_counts_q,
        "window_agg_tumbling_w16": _window_agg_q(16, 0),
        "window_agg_sliding_w20_o10": _window_agg_q(20, 10),
        # relational family (groupby agg, broadcast joins, top-k, distinct)
        "q1_pricing_summary": _rel("q1_pricing_summary"),
        "order_lineitem_join": _rel("order_lineitem_join"),
        "top_customers": _rel("top_customers"),
        "revenue_by_nation": _rel("revenue_by_nation"),
        "brand_type_distinct": _rel("brand_type_distinct"),
        # text family (stats, lang, exact dedup; minhash/simhash rows-only)
        "text_stats": _text("text_stats"),
        # per-source token-distribution entropy + KL vs corpus (hash(word)
        # partitioning co-locates corpus totals -- no second join)
        "source_token_entropy": _text("source_token_entropy"),
        # grouped exact PERCENTILE_CONT over documents: per-source
        # doc-length quantiles (curation length-gate audit)
        "source_doclen_quantiles": _text("source_doclen_quantiles"),
        "lang_distribution": _text("lang_distribution"),
        "dedup_exact": _text("dedup_exact"),
        "dedup_minhash_pairs": _text("dedup_minhash_pairs"),
        "simhash_fingerprints": _text("simhash_fingerprints"),
        # order-sensitive rolling-hash doc fingerprints (rows-only:
        # mod-2^64 polynomial hashing isn't SQL; kernel pytest-verified)
        "doc_fingerprints": _text("doc_fingerprints"),
        "token_counts_regex": _text("token_counts_regex"),
        # corpus-trained unigram LM perplexity (micro-int log-prob sums)
        "doc_unigram_perplexity": _text("doc_unigram_perplexity"),
        # top-3 TF-IDF terms per doc (exact int64 tf * idf_u scores)
        "doc_tfidf_top_terms": _text("doc_tfidf_top_terms"),
        "lang_len_corr": _text("lang_len_corr"),
        "lang_quality": _text("lang_quality"),  # heuristic lang-ID + quality
        # score (rows-only: stopword-table heuristics aren't SQL)
        "dedup_jaccard_verified": _text("dedup_jaccard_verified"),
        "dedup_simhash_pairs": _text("dedup_simhash_pairs"),
        # connected components over the SimHash near-dup graph
        # (fixed-exchange local union-find + contracted driver merge;
        # oracle: recursive-CTE reachability closure in DuckDB)
        "dedup_clusters_simhash": _dedup_clusters_q,
        # flagship LLM-data composition: near-dup clusters -> keep each
        # component representative + all unclustered docs
        "clean_corpus": _text("clean_corpus"),
        # the SAME cluster + clean machinery driven by exact-duplicate
        # pairs, where md5 groups pin the expected answer without the
        # SimHash bit-math oracle
        "dedup_clusters_exact": _text("dedup_clusters_exact"),
        "clean_corpus_exact": _text("clean_corpus_exact"),
        # similarity search family
        "ann_cosine_topk": _ann("cosine_topk"),
        # incremental IVF: even half built, odd half APPENDED (two-phase
        # committed, no rebuild), all cells probed -- must equal exact top-k
        "ann_ivf_append_topk": _ann("ann_ivf_append_topk"),
        # one streaming pass scores ALL queries (batch x query matmul
        # vs a broadcast query matrix) -- the production batch shape
        "ann_cosine_topk_multi": _ann("cosine_topk_multi"),
        "ann_lsh_topk": _ann("lsh_topk"),
        # union-read multi-query probe over the same persisted index;
        # per-batch band-key recomputation keeps per-query results
        # EXACTLY equal to single-query probes (asserted in tests)
        "ann_lsh_topk_multi": _ann("lsh_topk_multi"),
        # IVF top-k over the persisted cell-partitioned index (the second
        # ANN scale path; rows-only -- k-means cells are data-dependent;
        # recall + nprobe=all==exact pinned in tests)
        "ann_ivf_topk": _ann("ivf_topk"),
        # union-cell multi-query IVF probe (per-batch centroid argmax
        # routes rows to queries; exact per-query parity in tests)
        "ann_ivf_topk_multi": _ann("ivf_topk_multi"),
        "embedding_near_pairs": _ann("embedding_near_pairs"),
        # embedding-modality corpus CLEAN: exact cosine pairs -> contracted
        # union-find components -> representative keep (SemDeDup semantics)
        "clean_corpus_embedding": _ann("clean_corpus_embedding"),
        # IVF cell-blocked approximate near-pairs (the 10^9-row scale path;
        # recall vs the exact triangle join measured in tests)
        "embedding_near_pairs_ivf": _ann("embedding_near_pairs_ivf"),
        # product-quantization ANN (codes-only ADC scoring; 32x smaller
        # embedding tier) + its corpus-level quality/size telemetry;
        # rows-only -- recall vs exact and degenerate-exactness pinned
        # in tests/test_pq_ann.py
        "ann_pq_topk": _ann("pq_ann_topk"),
        "pq_compression_stats": _ann("pq_compression_stats"),
        # spectral aggregate family (caits/fe/_spectral.py) over windowed
        # token signals -- FFT features, rows-only (no SQL oracle); kernel
        # parity tested in tests/test_spectral_features.py
        "spectral_features": _spectral_features_q,
        # grouped outlier filter + the full checkpointed job
        "outlier_filter_zscore": _outlier_filter_q,
        "synth_rollup_job": _synth_job_q,
        # job + retention-policy enforcement (keep-last-K prune with
        # file-stat fast paths, markers, atomic rewrites)
        "synth_retention_job": _synth_retention_q,
        # spliced multi-tier range query over the committed store
        # (fine tier for recent spans, coarser where retention aged the
        # fine one out; gap/overlap-free splice pinned in
        # tests/test_tier_query.py)
        "tier_range_query": _tier_range_q,
        # persisted exact-dedup index: two-shard incremental ingest with
        # crash-safe two-phase commits; admission stats are SQL-exact
        "corpus_ingest_job": _corpus_ingest_q,
        # fitted-model scoring: distributed IRLS logistic fit + actor-pool
        # predict_proba (rows-only -- an iterative fit has no SQL oracle;
        # the IRLS path is pytest-verified against a NumPy reference fit)
        "model_scoring": _model_scoring_q,
        # fastText-style hashed-n-gram quality/language filter (rows-only:
        # iterative IRLS fit; NumPy-reference parity + planted-class
        # recovery pinned in tests/test_quality_classifier.py)
        "doc_quality_scores": _doc_quality_q,
        # deterministic source-mixture resampling (domain balancing by
        # content-hash thresholds; one #sources exchange + a pure filter)
        "resample_mixture": _mix("resample_mixture"),
        # greedy sequence packing into 512-token bins, per-source in-order
        # (cumsum + searchsorted kernel; loop is per output bin)
        "pack_sequences": _mix("pack_sequences"),
        "q6_forecast_revenue": _rel("q6_forecast_revenue"),
        "q3_shipping_priority": _rel("q3_shipping_priority"),
        "parts_never_bulk_ordered": _rel("parts_never_bulk_ordered"),
        "q5_local_supplier_revenue": _rel("q5_local_supplier_revenue"),
        # second relational wave: EXISTS semi-join, conditional ratio,
        # join + conditional counts, HAVING + join-back, disjunctive join
        "q4_order_priority": _rel_ext("q4_order_priority"),
        "q12_priority_by_flag": _rel_ext("q12_priority_by_flag"),
        "q14_promo_revenue": _rel_ext("q14_promo_revenue"),
        "q18_large_orders": _rel_ext("q18_large_orders"),
        "q19_disjunctive_revenue": _rel_ext("q19_disjunctive_revenue"),
        # analytics family: window functions, pivot, exact distinct/quantile,
        # grouped mode, deterministic hash sampling
        "user_event_lag_diff": _analytics("user_event_lag_diff"),
        "user_event_lead_bounds": _analytics("user_event_lead_bounds"),
        "topk_events_per_user": _analytics("topk_events_per_user"),
        "events_hourly_rate": _analytics("events_hourly_rate"),
        "user_value_quantiles": _analytics("user_value_quantiles"),
        "type_user_distinct": _analytics("type_user_distinct"),
        "events_type_pivot": _analytics("events_type_pivot"),
        "source_top_lang": _analytics("source_top_lang"),
        "doc_sample_hash": _analytics("doc_sample_hash"),
        # time-series scans: expanding-frame window, sequential IIR smoothing
        "user_breakout_minmax": _analytics("user_breakout_minmax"),
        "ewma_hourly": _analytics("ewma_hourly"),
        "user_conversion": _analytics("user_conversion"),
        "value_histogram": _analytics("value_histogram"),
        "events_type_unpivot": _analytics("events_type_unpivot"),
        # grouped least-squares regression from exact integer moment sums
        "user_value_trend": _analytics("user_value_trend"),
        # HyperLogLog approximate distinct with a bit-exact SQL mirror
        "approx_distinct_user_days": _analytics("approx_distinct_user_days"),
        # Bloom semi-join pre-filter; false positives are deterministic
        # bit math, so even they oracle-match
        "bloom_prefilter_events": _analytics("bloom_active_purchaser_events"),
        # Count-Min frequency estimates; min-of-d never underestimates and
        # collision overestimates oracle-match exactly
        "cms_user_event_counts": _analytics("cms_user_event_counts"),
        # one-sided CUSUM drift alerts (recursive-CTE mirror, bitwise)
        "cusum_hourly_drift": _analytics("cusum_hourly_drift"),
        # Holt level+trend smoothing with one-step forecast (bitwise CTE)
        "holt_hourly_forecast": _analytics("holt_hourly"),
        # row-level sessionization (segmented-cumsum session assignment)
        "user_session_ids": _analytics("user_session_ids"),
        # additive seasonal decomposition (hour-of-day profile + residual)
        "seasonal_residuals_hourly": _analytics("seasonal_residuals_hourly"),
        # autocorrelation at lags 1..24 (self-join-on-lag oracle)
        "acf_hourly": _analytics("acf_hourly"),
        # LTTB visualization downsample (rows-only: sequential argmax
        # chain; invariants + hand-computed cases pinned in pytest)
        "lttb_downsample": _analytics("lttb_hourly"),
        # semi-structured family: vectorized JSON field extraction
        # (Arrow regex kernel) + bounded-histogram grouped stats, and the
        # HDR-histogram quantile sketch with an integer-exact SQL mirror
        "props_key_stats": _semistruct("props_key_stats"),
        "hdr_value_quantiles": _semistruct("hdr_value_quantiles"),
        # t-digest quantiles: mergeable sketch for UNBOUNDED float
        # domains (rows-only: approximate by design; rank-error and
        # merge-determinism contracts pinned in tests/test_tdigest.py)
        "tdigest_value_quantiles": _semistruct("tdigest_value_quantiles"),
        # distributed full-data Lloyd k-means (rows-only: iterative float
        # fitting; pinned vs a single-process NumPy reference in
        # tests/test_kmeans.py)
        "kmeans_embeddings": _kmeans_q,
        # cohort retention matrix (weekly actives by first-active week)
        "cohort_retention": _analytics("cohort_retention"),
        # cross-series Pearson correlation between event types' hourly
        # mean series (pairing over common hours; two rollup-sized exchanges)
        "type_hourly_corr": _analytics("type_hourly_corr"),
        # ordered-pair lagged cross-correlation (lead/lag structure): A at
        # hour t vs B at t+1 (map-side rollup duplication, bounded pairs)
        "type_hourly_xcorr_lag1": _analytics("type_hourly_xcorr_lag1"),
        # deterministic n-per-source sample by (md5, doc_id) order with
        # per-batch monotone combiner (grouped companion of doc_sample_hash)
        "stratified_sample_docs": _analytics("stratified_sample_docs"),
        # PERCENT_RANK + NTILE window functions (exact integer-ratio SQL)
        "value_percent_rank": _analytics("value_percent_rank"),
        # CUME_DIST + DENSE_RANK (same single-exchange rank-scan shape)
        "value_cume_dist": _analytics("value_cume_dist"),
        # bounded window FRAMES: trailing k-row count/sum/avg/min (block-min
        # kernel) and trailing time-interval RANGE frame (searchsorted)
        "user_value_moving_stats": _analytics("user_value_moving_stats"),
        "user_value_time_window": _analytics("user_value_time_window"),
        # robust dispersion (median absolute deviation) per user
        "user_value_mad": _analytics("user_value_mad"),
        # churn (EXCEPT shape): last week's absentees among the previous
        # week's actives; W from Parquet footer stats (zero data read)
        "churned_users": _analytics("churned_users"),
        # burstiness: per-user inter-arrival gap stats (exact integer
        # count/sum/max/sum-of-squares, mirrored float mean/CV)
        "user_interarrival_stats": _analytics("user_interarrival_stats"),
        # windowed quantile: rolling median of hourly means per type
        # (centi-int windows -- interpolation exact dyadic, no bridge)
        "rolling_median_hourly": _analytics("rolling_median_hourly"),
        # sliding COUNT DISTINCT: 24h active users per type, all-integer,
        # expansion-before-exchange on hash(type, target_hour)
        "rolling_active_users": _analytics("rolling_active_users"),
        # sessionization rollup: per-session event count + duration,
        # fused into the session scan's partition pass (no 2nd exchange)
        "user_session_stats": _analytics("user_session_stats"),
        # FULL OUTER join: two hourly series side by side (one-sided hours
        # survive with the other side NULL)
        "type_hourly_full_join": _analytics("type_hourly_full_join"),
        # RANK / DENSE_RANK per distinct value (window family completeness)
        "value_rank_dense": _analytics("value_rank_dense"),
        # ordered STRING_AGG: per-user chronological event-type path
        # (capped prefix, deterministic (ts, event_id) tie order)
        "user_event_path": _analytics("user_event_path"),
        # gaps-and-islands: contiguous busy-hour runs (burst detection)
        "busy_hour_islands": _analytics("busy_hour_islands"),
        # weekly heatmap: counts per (type, day-of-week, hour-of-day),
        # domain-bounded combiner before one tiny exchange
        "activity_profile": _analytics("activity_profile"),
        # weighted aggregate: quantity-weighted mean price per flag
        "weighted_avg_price_by_flag": _rel("weighted_avg_price_by_flag"),
        # correlated-subquery shape: rows vs their group's mean, exact
        # integer cross-multiply comparison (no float boundary flips)
        "above_avg_events": _analytics("above_avg_events"),
        # INTERSECT set op: users active in both halves of the range
        "users_both_halves": _analytics("users_both_halves"),
        # nested aggregate: average over users of per-user totals
        "avg_user_total_by_type": _analytics("avg_user_total_by_type"),
        # EXCEPT set op: lapsed users (first half only)
        "users_first_half_only": _analytics("users_first_half_only"),
        # Gini inequality coefficient per type (exact integer ranks)
        "gini_by_type": _analytics("gini_by_type"),
        # n-gram family over the corpus: global vocabulary head and
        # bigram statistics, both with per-partition top-k pre-pruning
        # paragraph(chunk)-level dedup: CCNet-style sub-document layer
        "dedup_paragraphs": _text("dedup_paragraphs"),
        "clean_corpus_paragraphs": _text("clean_corpus_paragraphs"),
        "token_vocab_topk": _text("token_vocab_topk"),
        # exact heavy hitters with bounded state: local-threshold candidate
        # pass (<= denom survivors/batch regardless of vocab) + exact recount
        "heavy_hitter_terms": _text("heavy_hitter_terms"),
        "token_bigram_topk": _text("token_bigram_topk"),
        # collocation strength: bigram PMI (two crc32-routed partitioned
        # joins attach unigram counts; string-equality post-filter)
        "token_pmi_topk": _text("token_pmi_topk"),
        # token-n-gram (substring-granularity) dedup layer + per-bucket
        # vocabulary dynamics over the derived token table
        "dup_token_ngrams": _tngram("dup_token_ngrams"),
        "doc_dup_ngram_rate": _tngram("doc_dup_ngram_rate"),
        "clean_corpus_ngram": _tngram("clean_corpus_ngram"),
        "dedup_ngram_spans": _tngram("dedup_ngram_spans"),
        "rollup_distinct_tokens": _tngram("rollup_distinct_tokens"),
        "token_novelty_by_bucket": _tngram("token_novelty_by_bucket"),
        # train/eval decontamination: eval-split n-gram keys broadcast once
        # (guarded), training docs scored exchange-free per batch
        "decontaminate_against_eval": _tngram("decontaminate_against_eval"),
        # flagship curation composition: exact dedup -> eval removal +
        # decontamination -> length gate, ONE extra anti-join exchange
        "curate_corpus": _tngram("curate_corpus"),
        # persisted inverted index: conjunctive term search reads ONLY
        # each term's hash partition (the text-search sibling of the
        # partitioned LSH/IVF ANN indexes)
        "inverted_index_search": _text("inverted_index_search"),
        # BM25 ranked retrieval over the persisted length-aware inverted
        # index: pruned per-term partition reads, one doc_id exchange,
        # per-partition top-k prune (fixed-order float sum mirrors SQL)
        "bm25_search": _search("bm25_search"),
        # blocked edit-distance near-dup pairs (typo-level layer below
        # the token-shingle dedup families; banded DP with cap early-exit)
        "dedup_edit_pairs": _text("dedup_edit_pairs"),
        # multi-blocking recall fix: prefix-key UNION suffix-key passes
        "dedup_edit_pairs_multiblock": _text("dedup_edit_pairs_multiblock"),
        # N-step funnel: furthest stage reached per user via gated
        # vectorized segment minima (generalizes user_conversion)
        "funnel_stages": _analytics("funnel_stages"),
        # PageRank over the symmetrized MinHash near-dup graph
        # (rows-only: iterative fixpoint in sharded rank-vector actors;
        # pinned vs a dense NumPy reference in tests/test_graph.py)
        "pagerank_simgraph": _graph_q,
        # triangle count of the near-dup graph (wedge join; oracle
        # composes the full MinHash-pairs SQL as a CTE)
        "simgraph_triangles": _graph_named("simgraph_triangles"),
        # CENTERED window frame (k PRECEDING AND k FOLLOWING), int64
        # micro-unit prefix sums like the trailing moving_stats
        "user_value_centered_avg": _analytics("user_value_centered_avg"),
        # Theil-Sen robust trend: median pairwise slope per user
        # (outlier-robust companion of the OLS user_value_trend)
        "user_value_theilsen": _analytics("user_value_theilsen"),
        # time-bound funnel: each step within 24h of the previous one
        "funnel_stages_windowed": _analytics("funnel_stages_windowed"),
        # market-basket lift between event-type pairs over users
        "event_type_lift": _analytics("event_type_lift"),
        # first-order Markov transition matrix between consecutive events
        "event_transition_matrix": _analytics("event_transition_matrix"),
        # OHLC bars per (type, hour): associative first/last candidates,
        # pure value moves -- no float arithmetic anywhere
        "events_hourly_ohlc": _analytics("events_hourly_ohlc"),
        # PSI distribution-drift score per type between time halves
        # (Laplace-smoothed equal-width bins; fixed-order mirrored sum)
        "value_drift_psi": _analytics("value_drift_psi"),
        # percentile winsorization: per-type exact bounds broadcast into
        # an exchange-free clip pass (DuckDB quantile_cont bit-form)
        "winsorize_values": _analytics("winsorize_values"),
        # Gopher-style repetition signals (top 2/3-gram + duplicated-3-gram
        # char fractions) and the per-source repetition quality gate
        "gopher_repetition": _qual("gopher_repetition"),
        "gopher_gate": _qual("gopher_gate"),
        # blocklist redaction (PII/contamination-removal shape; RE2 on
        # both sides so the oracle is value-exact incl. the rewritten text)
        "doc_redact_terms": _qual("doc_redact_terms"),
        # canary/PII probe scan: per-probe doc + occurrence counts,
        # zero keyed exchanges (batch x probe partials, driver reduce)
        "canary_scan": _qual("canary_scan"),
        # BPE tokenizer training: distributed word histogram -> driver-local
        # merge learning -> distributed encode (rows-only: iterative; pinned
        # vs a naive pure-Python reference in tests/test_quality_w5.py)
        "bpe_merges": _qual("bpe_merges"),
        "bpe_encode_stats": _qual("bpe_encode_stats"),
        "q10_returned_revenue": _rel_ext("q10_returned_revenue"),
        "segment_nation_rollup": _rel_ext("segment_nation_rollup"),
        "customer_order_counts": _rel_ext("customer_order_counts"),
        # multimodal REAL-decode features (rows-only: byte-level codecs have
        # no SQL oracle; decoder exactness is pytest-verified vs spec
        # fixtures in tests/test_wavcodec.py / test_imagecodec.py)
        "media_features": _media_features_q,
        # third relational wave: two-nation cross-border revenue, six-table
        # market-share ratio, count-of-counts distribution, correlated
        # per-key average threshold, global-scalar + NOT EXISTS anti-join
        # fourth relational wave: aggregate-then-global-max with ties
        # (Q15), grouped COUNT(DISTINCT) over a filtered dimension join
        # (Q16 on this schema), correlated per-key argmin (Q2 shape)
        "q15_top_supplier": _rel_w4("q15_top_supplier"),
        "part_supplier_variety": _rel_w4("part_supplier_variety"),
        "q2_min_price_supplier": _rel_w4("q2_min_price_supplier"),
        # fifth relational wave: the TPC-H straggler join shapes --
        # Q9 multi-fact profit, Q11 group-vs-global HAVING, Q20 nested
        # IN + correlated scalar, Q21 EXISTS/NOT-EXISTS composition
        "q9_profit_by_nation_year": _rel_w5("q9_profit_by_nation_year"),
        "q11_important_parts": _rel_w5("q11_important_parts"),
        "q20_dominant_suppliers": _rel_w5("q20_dominant_suppliers"),
        "q21_waiting_suppliers": _rel_w5("q21_waiting_suppliers"),
        # GROUP BY CUBE: all four (segment, nation) granularities from one
        # bounded-domain pass (ROLLUP's missing nation margin included)
        "segment_nation_cube": _rel_w5("segment_nation_cube"),
        "q7_volume_shipping": _rel_w3("q7_volume_shipping"),
        "q8_market_share": _rel_w3("q8_market_share"),
        "q13_customer_distribution": _rel_w3("q13_customer_distribution"),
        "q17_small_quantity_revenue": _rel_w3("q17_small_quantity_revenue"),
        "q22_lapsed_customers": _rel_w3("q22_lapsed_customers"),
    }
    return q


def _media_features_q(sf_dir: str):
    from crossai_ts_ray.pipelines.multimodal import media_features

    return media_features(sf_dir)


def _doc_quality_q(sf_dir: str):
    from crossai_ts_ray.pipelines.scoring import doc_quality_scores

    return doc_quality_scores(sf_dir)


def _model_scoring_q(sf_dir: str):
    from crossai_ts_ray.pipelines.scoring import score_events

    return score_events(sf_dir)


def _dedup_clusters_q(sf_dir: str):
    from crossai_ts_ray.pipelines.text_pipeline import (
        dedup_clusters,
        dedup_simhash_pairs,
    )

    return dedup_clusters(dedup_simhash_pairs(sf_dir))


def _spectral_features_q(sf_dir: str):
    from crossai_ts_ray.pipelines.feature_pipeline import doc_spectral_features

    return doc_spectral_features(sf_dir, window=64, overlap=32)


def _events_sql(name: str) -> str:
    from crossai_ts_ray.pipelines import events_pipeline

    return getattr(events_pipeline, name)


def relational_sql(name: str) -> str:
    from crossai_ts_ray.pipelines import relational

    return getattr(relational, name)


def _rel_ext(fn_name: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        from crossai_ts_ray.pipelines import relational_ext

        return getattr(relational_ext, fn_name)(sf_dir)

    return run


def rel_ext_sql(name: str) -> str:
    from crossai_ts_ray.pipelines import relational_ext

    return getattr(relational_ext, name)


def _rel_w3(fn_name: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        from crossai_ts_ray.pipelines import relational_w3

        return getattr(relational_w3, fn_name)(sf_dir)

    return run


def rel_w3_sql(name: str) -> str:
    from crossai_ts_ray.pipelines import relational_w3

    return getattr(relational_w3, name)


def _rel_w4(fn_name: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        from crossai_ts_ray.pipelines import relational_w4

        return getattr(relational_w4, fn_name)(sf_dir)

    return run


def _rel_w5(fn_name: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        from crossai_ts_ray.pipelines import relational_w5

        return getattr(relational_w5, fn_name)(sf_dir)

    return run


def rel_w5_sql(name: str) -> str:
    from crossai_ts_ray.pipelines import relational_w5

    return getattr(relational_w5, name)


def rel_w4_sql(name: str) -> str:
    from crossai_ts_ray.pipelines import relational_w4

    return getattr(relational_w4, name)


def _analytics(fn_name: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        from crossai_ts_ray.pipelines import analytics

        return getattr(analytics, fn_name)(sf_dir)

    return run


def analytics_sql(name: str) -> str:
    from crossai_ts_ray.pipelines import analytics

    return getattr(analytics, name)


def _graph_q(sf_dir: str):
    from crossai_ts_ray.pipelines.graph import pagerank_simgraph

    return pagerank_simgraph(sf_dir)


def _graph_named(fn_name: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        from crossai_ts_ray.pipelines import graph

        return getattr(graph, fn_name)(sf_dir)

    return run


def graph_sql(name: str) -> str:
    from crossai_ts_ray.pipelines import graph

    return getattr(graph, name)


def _kmeans_q(sf_dir: str):
    from crossai_ts_ray.pipelines.ann_pipeline import kmeans_embeddings

    return kmeans_embeddings(sf_dir)


def _semistruct(fn_name: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        from crossai_ts_ray.pipelines import semistruct

        return getattr(semistruct, fn_name)(sf_dir)

    return run


def semistruct_sql(name: str) -> str:
    from crossai_ts_ray.pipelines import semistruct

    return getattr(semistruct, name)


def text_sql(name: str) -> str:
    from crossai_ts_ray.pipelines import text_pipeline

    return getattr(text_pipeline, name)


def _search(fn_name: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        from crossai_ts_ray.pipelines import search

        return getattr(search, fn_name)(sf_dir)

    return run


def search_sql(name: str) -> str:
    from crossai_ts_ray.pipelines import search

    return getattr(search, name)


def ann_sql(name: str) -> str:
    from crossai_ts_ray.pipelines import ann_pipeline

    return getattr(ann_pipeline, name)


def oracle_sql() -> dict[str, str]:
    from crossai_ts_ray.state.dedup_index import CORPUS_INGEST_SQL

    return {
        "corpus_ingest_job": CORPUS_INGEST_SQL,
        "rollup_w4": _rollup_sql(4),
        "rollup_w8_cascade": _rollup_sql(8),
        "rollup_w16_cascade": _rollup_sql(16),
        "tier_anomaly_w4": _TIER_ANOMALY_SQL,
        "events_hourly": _EVENTS_HOURLY_SQL,
        "events_gapfill_locf": _EVENTS_LOCF_SQL,
        "events_gapfill_linear": _EVENTS_LINEAR_SQL,
        "events_sliding_3h": _EVENTS_SLIDING_SQL,
        "events_user_sessions": _SESSIONS_SQL,
        "user_value_stats": _events_sql("USER_VALUE_STATS_SQL"),
        "user_top_event": _events_sql("USER_TOP_EVENT_SQL"),
        "user_running_total": _events_sql("USER_RUNNING_TOTAL_SQL"),
        "asof_last_event_value": _ASOF_SQL,
        "asof_next_event_value": _ASOF_NEXT_SQL,
        "order_event_window": _events_sql("ORDER_EVENT_WINDOW_SQL"),
        "hourly_anomalies": _events_sql("HOURLY_ANOMALIES_SQL"),
        "window_counts_w16_o8": _WINDOW_COUNTS_SQL,
        "window_agg_tumbling_w16": _window_agg_sql(16, 0),
        "window_agg_sliding_w20_o10": _window_agg_sql(20, 10),
        "q1_pricing_summary": relational_sql("Q1_SQL"),
        "order_lineitem_join": relational_sql("ORDER_LINEITEM_JOIN_SQL"),
        "top_customers": relational_sql("TOP_CUSTOMERS_SQL"),
        "revenue_by_nation": relational_sql("REVENUE_BY_NATION_SQL"),
        "brand_type_distinct": relational_sql("BRAND_TYPE_SQL"),
        "q6_forecast_revenue": relational_sql("Q6_SQL"),
        "q3_shipping_priority": relational_sql("Q3_SQL"),
        "parts_never_bulk_ordered": relational_sql("PARTS_NEVER_BULK_SQL"),
        "q5_local_supplier_revenue": relational_sql("Q5_SQL"),
        "q4_order_priority": rel_ext_sql("Q4_SQL"),
        "q12_priority_by_flag": rel_ext_sql("Q12_SQL"),
        "q14_promo_revenue": rel_ext_sql("Q14_SQL"),
        "q18_large_orders": rel_ext_sql("Q18_SQL"),
        "q19_disjunctive_revenue": rel_ext_sql("Q19_SQL"),
        "user_event_lag_diff": analytics_sql("USER_EVENT_LAG_DIFF_SQL"),
        "user_event_lead_bounds": analytics_sql("USER_EVENT_LEAD_BOUNDS_SQL"),
        "topk_events_per_user": analytics_sql("TOPK_EVENTS_PER_USER_SQL"),
        "events_hourly_rate": analytics_sql("EVENTS_HOURLY_RATE_SQL"),
        "user_value_quantiles": analytics_sql("USER_VALUE_QUANTILES_SQL"),
        "type_user_distinct": analytics_sql("TYPE_USER_DISTINCT_SQL"),
        "events_type_pivot": analytics_sql("EVENTS_TYPE_PIVOT_SQL"),
        "source_top_lang": analytics_sql("SOURCE_TOP_LANG_SQL"),
        "doc_sample_hash": analytics_sql("DOC_SAMPLE_HASH_SQL"),
        "user_breakout_minmax": analytics_sql("USER_BREAKOUT_MINMAX_SQL"),
        "user_conversion": analytics_sql("USER_CONVERSION_SQL"),
        "value_histogram": analytics_sql("VALUE_HISTOGRAM_SQL"),
        "events_type_unpivot": analytics_sql("EVENTS_TYPE_UNPIVOT_SQL"),
        "user_value_trend": analytics_sql("USER_VALUE_TREND_SQL"),
        # the HLL sketch itself is deterministic, so even the APPROXIMATE
        # estimate has an exact oracle (same hash/rho/sum in SQL bit math)
        "approx_distinct_user_days": analytics_sql("APPROX_DISTINCT_SQL"),
        "bloom_prefilter_events": analytics_sql("BLOOM_ACTIVE_SQL"),
        "cms_user_event_counts": analytics_sql("CMS_USER_COUNTS_SQL"),
        "cusum_hourly_drift": analytics_sql("CUSUM_HOURLY_SQL"),
        "holt_hourly_forecast": analytics_sql("HOLT_HOURLY_SQL"),
        "user_session_ids": analytics_sql("USER_SESSION_IDS_SQL"),
        "seasonal_residuals_hourly": analytics_sql("SEASONAL_RESIDUALS_SQL"),
        "acf_hourly": analytics_sql("ACF_HOURLY_SQL"),
        "q10_returned_revenue": rel_ext_sql("Q10_SQL"),
        "segment_nation_rollup": rel_ext_sql("SEGMENT_NATION_ROLLUP_SQL"),
        "customer_order_counts": rel_ext_sql("CUSTOMER_ORDER_COUNTS_SQL"),
        # sequential EWMA recurrence mirrored by a recursive CTE (bitwise:
        # identical float op order on both sides, no rounding bridge)
        "ewma_hourly": analytics_sql("EWMA_HOURLY_SQL"),
        # JSON extraction mirrored by json_extract_string; the HDR sketch
        # bucket/rank/midpoint rules are integer-exact on both sides
        # (bit_length via printf('%b'))
        "props_key_stats": semistruct_sql("PROPS_KEY_STATS_SQL"),
        "hdr_value_quantiles": semistruct_sql("HDR_VALUE_QUANTILES_SQL"),
        "cohort_retention": analytics_sql("COHORT_RETENTION_SQL"),
        "value_percent_rank": analytics_sql("VALUE_PERCENT_RANK_SQL"),
        "value_cume_dist": analytics_sql("VALUE_CUME_DIST_SQL"),
        "user_value_moving_stats": analytics_sql("USER_VALUE_MOVING_STATS_SQL"),
        "user_value_time_window": analytics_sql("USER_VALUE_TIME_WINDOW_SQL"),
        "user_value_mad": analytics_sql("USER_VALUE_MAD_SQL"),
        "churned_users": analytics_sql("CHURNED_USERS_SQL"),
        "user_interarrival_stats": analytics_sql("USER_INTERARRIVAL_SQL"),
        "rolling_median_hourly": analytics_sql("ROLLING_MEDIAN_HOURLY_SQL"),
        "rolling_active_users": analytics_sql("ROLLING_ACTIVE_USERS_SQL"),
        "user_session_stats": analytics_sql("USER_SESSION_STATS_SQL"),
        "type_hourly_full_join": analytics_sql("TYPE_HOURLY_FULL_JOIN_SQL"),
        "value_rank_dense": analytics_sql("VALUE_RANK_DENSE_SQL"),
        "user_event_path": analytics_sql("USER_EVENT_PATH_SQL"),
        "busy_hour_islands": analytics_sql("BUSY_HOUR_ISLANDS_SQL"),
        "activity_profile": analytics_sql("ACTIVITY_PROFILE_SQL"),
        "weighted_avg_price_by_flag": relational_sql("WEIGHTED_AVG_PRICE_SQL"),
        "above_avg_events": analytics_sql("ABOVE_AVG_EVENTS_SQL"),
        "users_both_halves": analytics_sql("USERS_BOTH_HALVES_SQL"),
        "avg_user_total_by_type": analytics_sql("AVG_USER_TOTAL_SQL"),
        "users_first_half_only": analytics_sql("USERS_FIRST_HALF_ONLY_SQL"),
        "gini_by_type": analytics_sql("GINI_BY_TYPE_SQL"),
        "type_hourly_corr": analytics_sql("TYPE_HOURLY_CORR_SQL"),
        "type_hourly_xcorr_lag1": analytics_sql("TYPE_HOURLY_XCORR_SQL"),
        "stratified_sample_docs": analytics_sql("STRATIFIED_SAMPLE_SQL"),
        "resample_mixture": _mix_sql("RESAMPLE_MIXTURE_SQL"),
        "pack_sequences": _mix_sql("PACK_SEQUENCES_SQL"),
        "gopher_repetition": _qual_sql("GOPHER_REPETITION_SQL"),
        "gopher_gate": _qual_sql("GOPHER_GATE_SQL"),
        "doc_redact_terms": _qual_sql("DOC_REDACT_SQL"),
        "canary_scan": _qual_sql("CANARY_SCAN_SQL"),
        "dedup_paragraphs": text_sql("DEDUP_PARAGRAPHS_SQL"),
        "clean_corpus_paragraphs": text_sql("CLEAN_CORPUS_PARAGRAPHS_SQL"),
        "token_vocab_topk": text_sql("TOKEN_VOCAB_TOPK_SQL"),
        "heavy_hitter_terms": text_sql("HEAVY_HITTER_TERMS_SQL"),
        "token_bigram_topk": text_sql("TOKEN_BIGRAM_TOPK_SQL"),
        "token_pmi_topk": text_sql("TOKEN_PMI_TOPK_SQL"),
        "dup_token_ngrams": _tngram_sql("dup_token_ngrams_sql"),
        "doc_dup_ngram_rate": _tngram_sql("doc_dup_ngram_rate_sql"),
        "clean_corpus_ngram": _tngram_sql("clean_corpus_ngram_sql"),
        "dedup_ngram_spans": _tngram_sql("dedup_ngram_spans_sql"),
        "decontaminate_against_eval": _tngram_sql(
            "decontaminate_against_eval_sql"
        ),
        "curate_corpus": _tngram_sql("curate_corpus_sql"),
        "rollup_distinct_tokens": _tngram_sql("rollup_distinct_tokens_sql"),
        "token_novelty_by_bucket": _tngram_sql("token_novelty_by_bucket_sql"),
        "inverted_index_search": text_sql("INVERTED_INDEX_SEARCH_SQL"),
        "bm25_search": search_sql("BM25_SEARCH_SQL"),
        "dedup_edit_pairs": text_sql("DEDUP_EDIT_PAIRS_SQL"),
        "dedup_edit_pairs_multiblock": text_sql(
            "DEDUP_EDIT_PAIRS_MULTIBLOCK_SQL"
        ),
        "funnel_stages": analytics_sql("FUNNEL_STAGES_SQL"),
        "user_value_centered_avg": analytics_sql(
            "USER_VALUE_CENTERED_AVG_SQL"
        ),
        "user_value_theilsen": analytics_sql("USER_VALUE_THEILSEN_SQL"),
        "funnel_stages_windowed": analytics_sql(
            "FUNNEL_STAGES_WINDOWED_SQL"
        ),
        "event_type_lift": analytics_sql("EVENT_TYPE_LIFT_SQL"),
        "event_transition_matrix": analytics_sql(
            "EVENT_TRANSITION_MATRIX_SQL"
        ),
        "events_hourly_ohlc": analytics_sql("EVENTS_HOURLY_OHLC_SQL"),
        "value_drift_psi": analytics_sql("VALUE_DRIFT_PSI_SQL"),
        "simgraph_triangles": graph_sql("SIMGRAPH_TRIANGLES_SQL"),
        "winsorize_values": analytics_sql("WINSORIZE_VALUES_SQL"),
        "text_stats": _TEXT_STATS_SQL,
        "source_token_entropy": text_sql("SOURCE_TOKEN_ENTROPY_SQL"),
        "source_doclen_quantiles": text_sql("SOURCE_DOCLEN_QUANTILES_SQL"),
        "lang_distribution": text_sql("LANG_DISTRIBUTION_SQL"),
        "dedup_exact": text_sql("DEDUP_EXACT_SQL"),
        # the full connected-components + anti-join machinery on
        # exact-duplicate pairs: md5 groups pin the answer in SQL
        "dedup_clusters_exact": text_sql("DEDUP_CLUSTERS_EXACT_SQL"),
        "clean_corpus_exact": text_sql("CLEAN_CORPUS_EXACT_SQL"),
        "token_counts_regex": text_sql("TOKEN_COUNTS_REGEX_SQL"),
        "doc_unigram_perplexity": text_sql("DOC_PERPLEXITY_SQL"),
        "doc_tfidf_top_terms": text_sql("DOC_TFIDF_SQL"),
        # mod-2^64 Horner rolling hash reproduced with HUGEINT list_reduce
        "doc_fingerprints": text_sql("DOC_FINGERPRINTS_SQL"),
        # FNV-1a byte-shingle SimHash reproduced with UBIGINT/HUGEINT bit math
        "simhash_fingerprints": text_sql("SIMHASH_FINGERPRINTS_SQL"),
        # the whole MinHash-LSH candidate pipeline (64 universal hashes,
        # 16 FNV band keys, bucket pair enumeration, mean-equality Jaccard)
        "dedup_minhash_pairs": text_sql("DEDUP_MINHASH_PAIRS_SQL"),
        # MinHash-LSH candidates -> exact Jaccard over the true 5-gram
        # sets (the crc32 shingle hashing is an engine-side shortcut)
        "dedup_jaccard_verified": text_sql("DEDUP_JACCARD_VERIFIED_SQL"),
        # SimHash family end to end: brute-force Hamming pairs (the banded
        # blocking is provably complete for ham<=11, so brute force IS the
        # spec), recursive-CTE connected components, representative-keep
        "dedup_simhash_pairs": text_sql("DEDUP_SIMHASH_PAIRS_SQL"),
        "dedup_clusters_simhash": text_sql("DEDUP_CLUSTERS_SIMHASH_SQL"),
        "clean_corpus": text_sql("CLEAN_CORPUS_SQL"),
        # heuristic lang-ID + quality: exact SQL mirror (list_intersect
        # stopword hits, \p{L} alpha ratio, arithmetic mean-word-length)
        "lang_quality": text_sql("LANG_QUALITY_SQL"),
        "lang_len_corr": text_sql("LANG_LEN_CORR_SQL"),
        "q15_top_supplier": rel_w4_sql("Q15_SQL"),
        "q9_profit_by_nation_year": rel_w5_sql("Q9_SQL"),
        "q11_important_parts": rel_w5_sql("Q11_SQL"),
        "q20_dominant_suppliers": rel_w5_sql("Q20_SQL"),
        "q21_waiting_suppliers": rel_w5_sql("Q21_SQL"),
        "segment_nation_cube": rel_w5_sql("SEGMENT_NATION_CUBE_SQL"),
        "part_supplier_variety": rel_w4_sql("Q16_SQL"),
        "q2_min_price_supplier": rel_w4_sql("Q2_SQL"),
        "q7_volume_shipping": rel_w3_sql("Q7_SQL"),
        "q8_market_share": rel_w3_sql("Q8_SQL"),
        "q13_customer_distribution": rel_w3_sql("Q13_SQL"),
        "q17_small_quantity_revenue": rel_w3_sql("Q17_SQL"),
        "q22_lapsed_customers": rel_w3_sql("Q22_SQL"),
        "ann_cosine_topk": ann_sql("COSINE_TOPK_SQL"),
        # the append path probed at nprobe=all is exact, so it shares the
        # brute-force oracle
        "ann_ivf_append_topk": ann_sql("COSINE_TOPK_SQL"),
        "ann_cosine_topk_multi": ann_sql("COSINE_TOPK_MULTI_SQL"),
        # exact triangle-join near pairs ARE SQL-expressible (quadratic
        # oracle is fine at sf0.01)
        "embedding_near_pairs": ann_sql("EMBEDDING_NEAR_PAIRS_SQL"),
        "clean_corpus_embedding": ann_sql("CLEAN_CORPUS_EMBEDDING_SQL"),
        "outlier_filter_zscore": _OUTLIER_SQL,
        # still rows-only by design: ann_lsh_topk / ann_lsh_topk_multi
        # / ann_ivf_topk / ann_ivf_topk_multi /
        # embedding_near_pairs_ivf (trained-index algorithms),
        # spectral_features (FFT), model_scoring (IRLS), synth_rollup_job
        # / synth_retention_job (checkpointed jobs over synthesized
        # input), media_features
        # (binary decode); each verified against exact baselines in tests
    }
