"""Eighth query battery (round 3): the TPC-H Q12 shape (adapted to fixture columns —
the driver's lineitem lacks shipmode/commit/receipt dates, and Q9/Q11/
Q16/Q20 need the absent partsupp table entirely) and winnowing document fingerprints (Schleimer et al.
SIGMOD'03), completing the §2.11 fingerprinting family next to md5 /
token-set / SimHash / MinHash.

Conventions identical to queries.py: aliases match the oracle exactly;
no session-conf dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelineetl_spark.operators import text
from datapipelineetl_spark.queries import _t, _t_spread, query

# =============================================================================
# TPC-H Q12 shape — priority classification over a fact-fact join
# =============================================================================

@query(
    "q12_line_priority_split",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag IN ('R', 'A')
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def q12_line_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 SHAPE (adapted: the driver fixture's lineitem has no
    l_shipmode/l_commitdate/l_receiptdate — the returnflag IN-list and a
    shipdate year range stand in for Q12's shipmode + date-ordering
    predicates; the conditional high/low priority split over a fact-fact
    join is the part that matters).

    Scale: the IN-list and year-range predicates push to the lineitem
    parquet scan. orders carries NO broadcast hint — both sides are fact
    tables; the join shuffles on orderkey and AQE converts only if the
    filtered lineitem side genuinely fits. The aggregate is 2 groups wide
    — partial agg collapses it map-side."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# =============================================================================
# Winnowing fingerprints (§2.11 document fingerprinting, rolling-hash family)
# =============================================================================

_WINNOW_K = 5
_WINNOW_W = 4


def _winnow_cte(k: int, w: int) -> str:
    """Shared DuckDB CTE prefix replaying the winnowing algebra: same
    k-gram hash (md5-prefix 60-bit), same sliding-window min. Ends at the
    ``mins`` CTE (doc_id, mins BIGINT[]) — batch-9's collision query
    builds its pair join on the same prefix."""
    h = "('0x' || substr(md5(substr(t, i, " + str(k) + ")), 1, 15))::BIGINT"
    return f"""
    WITH t AS (SELECT doc_id, lower(text) AS t FROM documents),
    gh AS (
      SELECT doc_id,
             CASE WHEN length(t) >= {k}
                  THEN list_transform(generate_series(1, length(t) - {k} + 1),
                                      i -> {h})
                  ELSE []::BIGINT[] END AS hs
      FROM t),
    mins AS (
      SELECT doc_id,
             CASE WHEN len(hs) >= {w}
                  THEN list_transform(generate_series(1, len(hs) - {w} + 1),
                                      j -> list_min(list_slice(hs, j, j + {w} - 1)))
                  WHEN len(hs) >= 1 THEN [list_min(hs)]
                  ELSE []::BIGINT[] END AS mins
      FROM gh)"""


def _winnow_oracle(k: int, w: int) -> str:
    """Winnowing fingerprints digested to md5 so the row stays
    driver-hashable."""
    return f"""{_winnow_cte(k, w)}
    SELECT doc_id,
           CAST(len(list_distinct(mins)) AS INT) AS n_fps,
           md5(array_to_string(list_sort(list_distinct(mins)), ',')) AS fp_digest
    FROM mins
    """


@query("q_winnowing_fingerprints", _winnow_oracle(_WINNOW_K, _WINNOW_W))
def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints over documents: per doc, the count of
    selected k-gram hashes and an md5 digest of the sorted fingerprint
    set (arrays are not driver-hashable — the digest carries the same
    information hash-comparably). The oracle replays the identical
    k-gram-hash / window-min / distinct-sort algebra in SQL, so the
    whole fingerprint construction is value-checked, not just counted.

    Scale: fingerprinting is narrow per-row codegen (no shuffle in the
    operator itself); the downstream collision join (explode fingerprints
    → groupBy) is the same bucketed shape as LSH banding — documented in
    text.with_winnowing_fingerprints. The repartition below exists because
    the work is CPU-bound (md5 per k-gram) and parallelism follows input
    splits: the test corpus is ONE small parquet split, which would pin
    the whole fingerprint pass to one core. Shuffling the narrow
    (doc_id, text) projection costs far less than the md5 work it
    parallelizes. At 100 TB the scan itself yields thousands of splits
    and the same repartition is a cheap rebalance (or drop it)."""
    docs = _t_spread(spark, sf_dir, "documents")
    fps = text.with_winnowing_fingerprints(docs, k=_WINNOW_K, window=_WINNOW_W)
    return fps.select(
        "doc_id",
        F.size("winnow_fps").alias("n_fps"),
        F.md5(F.array_join(F.col("winnow_fps").cast("array<string>"), ",")).alias("fp_digest"),
    )
