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


def queries() -> dict[str, Callable[[str], Any]]:
    q: dict[str, Callable[[str], Any]] = {
        "rollup_w4": _rollup_query("w4"),
        "rollup_w8_cascade": _rollup_query("w8"),
        "rollup_w16_cascade": _rollup_query("w16"),
    }
    return q


def oracle_sql() -> dict[str, str]:
    return {
        "rollup_w4": _rollup_sql(4),
        "rollup_w8_cascade": _rollup_sql(8),
        "rollup_w16_cascade": _rollup_sql(16),
    }
