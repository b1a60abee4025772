"""Fourth query battery: remaining analytical shapes — window-over-aggregate
(TPC-H Q15), min-per-group join-back (Q2 shape), anti-join + scalar subquery
(Q22 shape), correlated aggregate subquery, explode/UNNEST, ordered
collect_list, FILTER-clause conditional counts, calendar truncation, and the
C10 broadcast lookup as a standalone oracle query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipelineetl_spark.operators import relational
from datapipelineetl_spark.queries import _t, query

# =============================================================================
# Window-over-aggregate / min-per-group / anti + scalar subquery
# =============================================================================

@query(
    "q15_top_suppliers",
    """
    WITH rev AS (
      SELECT l_suppkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_rev
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q15_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): aggregate → global-max filter → join
    details.

    Scale: the revenue CTE aggregates once; the max is a window over the
    *aggregated* (tiny) relation — no second scan of the fact, unlike the
    textbook correlated-subquery phrasing which rescans. Supplier join
    broadcasts the one-row-ish winner set."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_rev")
    )
    top = rev.withColumn("__mx", F.max("total_rev").over(Window.partitionBy())).filter(
        F.col("total_rev") == F.col("__mx")
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        F.broadcast(top)
        .join(s, top.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "q2_cheapest_part_per_type",
    """
    SELECT p_type, p_partkey, p_retailprice
    FROM (SELECT p_type, p_partkey, p_retailprice,
                 ROW_NUMBER() OVER (PARTITION BY p_type
                                    ORDER BY p_retailprice, p_partkey) AS rn
          FROM part)
    WHERE rn = 1
    """,
)
def q2_cheapest_part_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost-per-group with full row retrieval), via
    the engine's top_k_per_group (row_number window, deterministic
    partkey tiebreaker) — one shuffle on the group key, no self-join."""
    p = _t(spark, sf_dir, "part")
    return relational.top_k_per_group(
        p, ["p_type"], "p_retailprice", 1, ascending=True, tiebreak=["p_partkey"]
    ).select("p_type", "p_partkey", "p_retailprice")


@query(
    "q22_idle_rich_customers",
    """
    SELECT c_mktsegment, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-counting): above-average balance AND no
    recent orders — scalar subquery + left-anti join + aggregate.

    Scale: the scalar average broadcasts as a 1-row crossJoin (evaluated
    once); the anti join shuffles on custkey or broadcasts the distinct
    orders keys if small. No correlated rescans."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("__avg"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
    )


@query(
    "q_lineitems_above_order_avg",
    """
    SELECT l_returnflag, COUNT(*) AS n_above
    FROM (SELECT l_returnflag, l_extendedprice,
                 AVG(l_extendedprice) OVER (PARTITION BY l_orderkey) AS order_avg
          FROM lineitem)
    WHERE l_extendedprice > order_avg
    GROUP BY l_returnflag
    """,
)
def q_lineitems_above_order_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated aggregate subquery (each row vs its group's average),
    decorrelated as a window — one shuffle on orderkey instead of a
    self-join + rescan. The canonical decorrelation pattern."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    return (
        li.withColumn("order_avg", F.avg("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") > F.col("order_avg"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_above"))
    )


# =============================================================================
# Explode / collection aggregation / conditional counts / calendar
# =============================================================================

@query(
    "q_name_word_counts",
    """
    SELECT word, COUNT(*) AS n
    FROM (SELECT UNNEST(string_split(p_name, ' ')) AS word FROM part)
    WHERE word <> ''
    GROUP BY word
    """,
)
def q_name_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode(split(...)) — the lateral/UNNEST shape (one row → N rows).

    Scale: explode is pipelined inside codegen (no shuffle of its own);
    the downstream groupBy is the only exchange. Generator output never
    materializes whole."""
    p = _t(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_order_quantity_profile",
    """
    SELECT l_orderkey,
           COUNT(*) AS n_items,
           array_to_string(list_sort(list(CAST(l_quantity AS INT))), ',') AS quantities,
           CAST(MAX(l_quantity) AS INT) AS max_qty
    FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) >= 6
    """,
)
def q_order_quantity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered collection aggregate: per-order sorted quantity list.

    collect_list order is nondeterministic under parallel merge —
    sort_array AFTER collection makes the result well-defined (and
    engine-comparable). The sorted list is emitted as a ','-joined
    string: the driver's canonicalizer hashes rows via pandas, and a
    raw array<int> column is unhashable there (r1/r2 checker crash) —
    same information, string-typed, hash-comparable on both engines.
    State is bounded by HAVING's group-size filter."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.array_join(
                F.sort_array(F.collect_list(F.col("l_quantity").cast("int"))).cast(
                    "array<string>"
                ),
                ",",
            ).alias("quantities"),
            F.max("l_quantity").cast("int").alias("max_qty"),
        )
        .filter(F.col("n_items") >= 6)
    )


@query(
    "q_conditional_counts",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           COUNT(*) FILTER (WHERE l_discount >= 0.05) AS n_discounted,
           COUNT(*) FILTER (WHERE l_quantity >= 40) AS n_bulk,
           ROUND(SUM(l_extendedprice) FILTER (WHERE l_tax > 0.04), 2) AS taxed_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregates (count_if / conditional sum) — one scan,
    no per-condition subqueries."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("l_discount") >= 0.05).alias("n_discounted"),
        F.count_if(F.col("l_quantity") >= 40).alias("n_bulk"),
        F.round(
            F.sum(F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice"))), 2
        ).alias("taxed_price"),
    )


@query(
    "q_weekly_order_volume",
    """
    SELECT CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
           COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS volume
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def q_weekly_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar truncation agg (ISO week start = Monday in both engines)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    return o.groupBy(F.date_trunc("week", "o_orderdate").alias("week_start")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("volume"),
    )


_SQL_REGIONAL_REVENUE = """
    SELECT r_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(DISTINCT s_suppkey) AS n_suppliers
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY r_name
"""


@query("q_sql_regional_revenue", _SQL_REGIONAL_REVENUE)
def q_sql_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL surface: the engine accepts ANSI SQL directly via
    ``spark.sql`` over ``catalog.register_views`` — the oracle IS the
    query text, run verbatim by both engines.

    Scale: identical logical plan to the DataFrame phrasing — Catalyst
    does not care which front-end built it (broadcast dims, pushed
    shipdate filter, partial aggs)."""
    from datapipelineetl_spark import catalog

    catalog.register_views(spark, sf_dir)
    return spark.sql(_SQL_REGIONAL_REVENUE)


@query(
    "q_nation_lookup",
    """
    SELECT s_suppkey, s_name,
           COALESCE(n_name, 'UNKNOWN_' || CAST(s_nationkey AS VARCHAR)) AS nation
    FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
    """,
)
def q_nation_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 standalone: the position→name broadcast lookup with
    UNKNOWN_{key} miss semantics (dags/Dag2.py:103-106,129), generalized
    to any dimension. Broadcast hash join — the fact side never moves."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), "n_name"
    )
    return relational.broadcast_lookup(
        s,
        n,
        on=["s_nationkey"],
        value_col="n_name",
        out="nation",
        default=F.concat(F.lit("UNKNOWN_"), F.col("s_nationkey").cast("string")),
    ).select("s_suppkey", "s_name", "nation")
