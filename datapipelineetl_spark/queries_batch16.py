"""Sixteenth query battery — STAGED behind batch 15 (r10 horizon if
the r9 window fills with the 20 queries already queued).

Round-8 tail: Zipf rank-frequency fitting (``text.zipf_fit``) — the
distribution-shape companion to ``q_token_entropy``. Same staging
contract as batches 11–15.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datapipelineetl_spark.operators import text
from datapipelineetl_spark.queries import _t_spread
from datapipelineetl_spark.queries import QUERIES as _GLOBAL_QUERIES
from datapipelineetl_spark.queries import ORACLES as _GLOBAL_ORACLES
from datapipelineetl_spark.queries_ext import _SQL_TOKENS

STAGED_QUERIES: dict = {}
STAGED_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        STAGED_QUERIES[name] = fn
        if oracle is not None:
            STAGED_ORACLES[name] = oracle
        return fn

    return deco


def register() -> None:
    """Promote the staged queries into the live registry."""
    _GLOBAL_QUERIES.update(STAGED_QUERIES)
    _GLOBAL_ORACLES.update(STAGED_ORACLES)


_TOKS = _SQL_TOKENS.format(c="text")


@query(
    "q_zipf_fit",
    f"""
    WITH counts AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT source, UNNEST({_TOKS}) AS w FROM documents)
      GROUP BY source, w),
    ranked AS (
      SELECT source, c,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, w)
               AS r
      FROM counts),
    sums AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(ln(r)) AS sx, SUM(ln(c)) AS sy,
             SUM(ln(r) * ln(c)) AS sxy, SUM(ln(r) * ln(r)) AS sxx
      FROM ranked GROUP BY source)
    SELECT source, n AS vocab,
           ROUND(CASE WHEN n > 1 THEN
                   (n * sxy - sx * sy) / (n * sxx - sx * sx)
                 END, 5) AS slope,
           ROUND(CASE WHEN n > 1 THEN
                   (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                     / n
                 END, 5) AS intercept
    FROM sums
    """,
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit per source: OLS of ln(freq) on ln(rank)
    over each source's token distribution (natural text slopes near
    -1; templated sources flatten) — every source's vocab size, slope,
    and intercept value-checked to 5 decimals against the full
    closed-form replay (ranks, logs, all five OLS sums).

    Scale: one (source, token) count shuffle, a per-source rank window
    over vocabulary-sized rows (partitioned, never a global sort), a
    group-cardinality OLS fold (text.zipf_fit docstring)."""
    docs = _t_spread(spark, sf_dir, "documents")
    return text.zipf_fit(docs, "source", "text")
