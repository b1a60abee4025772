"""Second query battery: the reference's flagship cleaning chains against
golden oracles, the as-of join, and broader relational-surface coverage
(cube, semi/full-outer/cross joins, scalar subqueries, string/date
function parity).
"""

from __future__ import annotations

import pathlib
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelineetl_spark.operators import cleaning, relational
from datapipelineetl_spark.queries import _t, query
from datapipelineetl_spark.schemas import CELL_METRICS_SCHEMA
from datapipelineetl_spark.sources import meascollec

# =============================================================================
# Reference cleaning chains on deterministic fixtures (golden VALUES oracles)
# =============================================================================

_CELL_CSV_HEADER = (
    "Time,eNodeB Name,Cell Name,Frequency band,Downlink EARFCN,"
    "Downlink bandwidth,LocalCell Id,Latitude,Longitude,Integrity,"
    '"FT_UL.Interference","FT_AVE 4G/LTE DL USER THRPUT without Last TTI(ALL) (KBPS)(kbit/s)",'
    '"FT_PHYSICAL RESOURCE BLOCKS LOAD DL(%)","FT_AVERAGE NB OF USERS (UEs RRC CONNECTED)",'
    '"FT_4G/LTE CALL SETUP SUCCESS RATE"'
)
_CELL_CSV_ROWS = [
    "07-04-2025 13:45,,CellA,B3,,20,11,,,OK,\" NIL \",,55.5,,0.99",
    "bad-stamp,ENB1,,B7,100,,,36.8,10.1,OK,2.25,1000.5,,12,",
]


def _cell_fixture_dir() -> str:
    d = pathlib.Path(tempfile.gettempdir()) / "datapipelineetl_cell_fixture"
    d.mkdir(exist_ok=True)
    f = d / "report.csv"
    content = _CELL_CSV_HEADER + "\n" + "\n".join(_CELL_CSV_ROWS) + "\n"
    if not f.exists() or f.read_text() != content:
        f.write_text(content)
    return str(d)


@query(
    "q_clean_cell_metrics",
    """
    SELECT * FROM (VALUES
      (TIMESTAMP '2025-07-04 13:45:00', 'N/A', 'CellA', 'B3', 0, 20, 11,
       999.0::DOUBLE, 999.0::DOUBLE, '0', 0.0::DOUBLE, 55.5::DOUBLE, 0, 0.99::DOUBLE),
      (NULL::TIMESTAMP, 'ENB1', 'N/A', 'B7', 100, 0, 0,
       36.8::DOUBLE, 10.1::DOUBLE, '2.25', 1000.5::DOUBLE, 0.0::DOUBLE, 12, 0.0::DOUBLE)
    ) AS t("Time", "eNodeB Name", "Cell Name", "Frequency band",
           "Downlink EARFCN", "Downlink bandwidth", "LocalCell Id",
           "Latitude", "Longitude", "FT_UL_Interference",
           "FT_AVE 4G/LTE DL USER THRPUT without Last TTI(ALL) (KBPS)(kbit/s)",
           "FT_PHYSICAL RESOURCE BLOCKS LOAD DL(%)",
           "FT_AVERAGE NB OF USERS (UEs RRC CONNECTED)",
           "FT_4G/LTE CALL SETUP SUCCESS RATE")
    """,
)
def q_clean_cell_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship CSV-feed cleaning chain (C1–C6 + P1/P3, reference order
    — mypy/preprocessproduce.py:48-65) on a deterministic fixture with every
    sentinel class, checked against a golden VALUES oracle.

    Exercises: explicit-schema CSV read with pathological column names,
    timestamp parse w/ null-on-error, targeted→global fill ordering, geo
    sentinel, nil→0, rename, drop.
    """
    raw = (
        spark.read.schema(CELL_METRICS_SCHEMA)
        .option("header", "true")
        .csv(_cell_fixture_dir())
    )
    return cleaning.clean_cell_metrics(raw)


@query(
    "q_clean_kpi_int",
    """
    SELECT * FROM (VALUES
      ('measInfo_Cell', 'eNodeBFunctionName=ENB1,cellId=7', '1', 'RRC.ConnEstabAtt', 100),
      ('measInfo_Cell', 'eNodeBFunctionName=ENB1,cellId=7', '2', 'RRC.ConnEstabSucc', 95),
      ('measInfo_Cell', 'eNodeBFunctionName=ENB1,cellId=7', '3', 'UNKNOWN_3', 7),
      ('measInfo_Cell', 'eNodeBFunctionName=ENB1,cellId=8', '1', 'RRC.ConnEstabAtt', 0),
      ('measInfo_Cell', 'eNodeBFunctionName=ENB1,cellId=8', '2', 'RRC.ConnEstabSucc', 50),
      ('measInfo_Thrp', 'eNodeBFunctionName=ENB2,cellId=1', '1', 'DL.Thrp', NULL)
    ) AS t(measInfoId, measObjLdn, kpiId, kpiName, kpiValue)
    """,
)
def q_clean_kpi_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 int-cast variant (gzip feed, mypy/streaming.py:128) on the XML
    fixture's EAV output. "123.5" does not cast to int → null (Spark 3.5
    semantics via try_cast); NIL→0 happened at flatten (C8)."""
    from datapipelineetl_spark.queries import q_meascollec_flatten

    flat = q_meascollec_flatten(spark, sf_dir)
    cleaned = cleaning.clean_kpi_records(flat, "int")
    return cleaned.select("measInfoId", "measObjLdn", "kpiId", "kpiName", "kpiValue")


@query(
    "q_asof_join_purchase",
    """
    SELECT c.event_id, c.user_id, c.ts, p.ts AS purchase_ts,
           ROUND(p.value, 2) AS purchase_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def q_asof_join_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click gets the user's most recent purchase at or
    before it (DuckDB native ASOF JOIN as oracle). Spark lacks the
    operator; the engine's union-and-window implementation is one shuffle,
    O(n log n) per key (relational.asof_join docstring)."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("purchase_ts"), F.round("value", 2).alias("purchase_value"))
    )
    return relational.asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="purchase_ts",
        right_cols=["purchase_ts", "purchase_value"],
    ).select("event_id", "user_id", "ts", "purchase_ts", "purchase_value")


# =============================================================================
# Broader relational surface
# =============================================================================

@query(
    "q_cube_lineitem",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
           COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (SURVEY.md §2.6)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n",
            "qty",
        )
    )


@query(
    "q_customers_with_orders_semi",
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q_customers_with_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q_full_outer_nation_activity",
    """
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def q_full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, c.nk == s.nk, "full_outer")
        .select(
            F.coalesce(c.nk, s.nk).alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@query(
    "q_cross_join_matrix",
    """
    SELECT r_name, o.s AS status FROM region
    CROSS JOIN (SELECT DISTINCT o_orderstatus AS s FROM orders) o
    """,
)
def q_cross_join_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (dimension matrix expansion)."""
    region = _t(spark, sf_dir, "region").select("r_name")
    status = _t(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("s")
    ).distinct().select(F.col("s").alias("status"))
    return region.crossJoin(status)


@query(
    "q_orders_above_avg",
    """
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
    """,
)
def q_orders_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: compare each row to a global aggregate. Spark form:
    broadcast the 1-row aggregate via crossJoin (no correlated rescan)."""
    orders = _t(spark, sf_dir, "orders")
    avg_df = orders.agg(F.avg("o_totalprice").alias("__avg"))
    return (
        orders.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("__avg"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_string_funcs",
    """
    SELECT p_partkey,
           UPPER(p_brand)                                   AS brand_u,
           SUBSTR(p_name, 1, 8)                             AS name_8,
           CONCAT(p_brand, ':', p_type)                     AS brand_type,
           LPAD(CAST(p_size AS VARCHAR), 4, '0')            AS size_pad,
           regexp_replace(p_type, '[aeiou]', '_', 'g')      AS type_devowel,
           CAST(LENGTH(p_name) AS INT)                      AS name_len
    FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function parity battery (narrow, codegen'd)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 8).alias("name_8"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.regexp_replace("p_type", "[aeiou]", "_").alias("type_devowel"),
        F.length("p_name").alias("name_len"),
    )


@query(
    "q_date_funcs",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)       AS y,
           CAST(month(o_orderdate) AS INT)      AS m,
           CAST(quarter(o_orderdate) AS INT)    AS q,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           o_orderdate + INTERVAL 30 DAY        AS due_date
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function parity battery. DuckDB dayofweek is 0=Sunday vs
    Spark's 1=Sunday — oracle adds 1."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
    )


@query(
    "q_having_filter",
    """
    SELECT l_suppkey, COUNT(*) AS n_items, ROUND(SUM(l_extendedprice), 2) AS total
    FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) > 550
    """,
)
def q_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation HAVING filter."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
        .filter(F.col("n_items") > 550)
    )
