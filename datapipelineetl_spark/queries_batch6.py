"""Sixth query battery: column profiling (data-quality pass), KPI EAV→wide
pivot (the Kibana-dashboard shape over the XML feed), and the batch
equivalent of event-time session windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelineetl_spark.operators import profiling, relational
from datapipelineetl_spark.queries import _t, query

# =============================================================================
# Column profiling
# =============================================================================

@query(
    "q_profile_orders",
    """
    SELECT 'o_custkey' AS "column", COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_custkey) AS n_nulls,
           COUNT(DISTINCT o_custkey) AS n_distinct,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR)
    FROM orders
    """,
)
def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (null rate / cardinality / range) in ONE scan —
    the oracle needs three scans to say the same thing (profiling.profile
    docstring has the plan analysis)."""
    o = _t(spark, sf_dir, "orders")
    return profiling.profile(
        o, ["o_custkey", "o_orderstatus", "o_totalprice"], exact_distinct=True
    )


# =============================================================================
# KPI EAV→wide pivot (the dashboard shape, SURVEY.md §2.6)
# =============================================================================

@query(
    "q_kpi_pivot",
    """
    SELECT measObjLdn,
           MAX(CASE WHEN kpiName = 'RRC.ConnEstabAtt'  THEN kpiValue END) AS rrc_att,
           MAX(CASE WHEN kpiName = 'RRC.ConnEstabSucc' THEN kpiValue END) AS rrc_succ,
           MAX(CASE WHEN kpiName = 'DL.Thrp'           THEN kpiValue END) AS dl_thrp
    FROM (SELECT * FROM (VALUES
      ('eNodeBFunctionName=ENB1,cellId=7', 'RRC.ConnEstabAtt', '100'),
      ('eNodeBFunctionName=ENB1,cellId=7', 'RRC.ConnEstabSucc', '95'),
      ('eNodeBFunctionName=ENB1,cellId=8', 'RRC.ConnEstabAtt', '0'),
      ('eNodeBFunctionName=ENB1,cellId=8', 'RRC.ConnEstabSucc', '50'),
      ('eNodeBFunctionName=ENB2,cellId=1', 'DL.Thrp', '123.5')
    ) AS t(measObjLdn, kpiName, kpiValue))
    GROUP BY measObjLdn
    """,
)
def q_kpi_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAV→wide pivot of the XML feed's KPI records — what Kibana does
    interactively over the long-format index (SURVEY.md §2.6), as an
    engine operator (relational.pivot_eav with explicit value list).

    Scale: explicit ``values=`` skips the extra distinct-scan Spark
    otherwise runs to discover pivot columns; one shuffle on the group
    key."""
    from datapipelineetl_spark.queries import q_meascollec_flatten

    flat = q_meascollec_flatten(spark, sf_dir).filter(
        ~F.col("kpiName").startswith("UNKNOWN_")
    )
    wide = relational.pivot_eav(
        flat.select("measObjLdn", "kpiName", "kpiValue"),
        key_cols=["measObjLdn"],
        name_col="kpiName",
        value_col="kpiValue",
        names=["RRC.ConnEstabAtt", "RRC.ConnEstabSucc", "DL.Thrp"],
        agg="max",
    )
    # backtick-quoted: KPI names contain dots (the FT_UL.Interference
    # lesson, SURVEY.md §1.1a)
    return wide.select(
        "measObjLdn",
        F.col("`RRC.ConnEstabAtt`").alias("rrc_att"),
        F.col("`RRC.ConnEstabSucc`").alias("rrc_succ"),
        F.col("`DL.Thrp`").alias("dl_thrp"),
    )


# =============================================================================
# Session windows (batch form of streaming session_aggregate)
# =============================================================================

@query(
    "q_session_window_events",
    """
    WITH s AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    g AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM s)
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_event,
           COUNT(*) AS n_events
    FROM g GROUP BY user_id, sid
    """,
)
def q_session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (``F.session_window``) in batch mode —
    semantically identical to the lag+cumsum sessionize, but expressed as
    a first-class grouping; the streaming form (runner.session_aggregate)
    shares the operator, so batch and stream session semantics cannot
    drift.

    Output maps session_window.start → session_start and derives the last
    event time as end - gap (session_window.end is last_event + gap by
    definition)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window(F.col("ts"), "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            (F.col("session_window.end") - F.expr("INTERVAL 30 MINUTES")).alias(
                "last_event"
            ),
            "n_events",
        )
    )
