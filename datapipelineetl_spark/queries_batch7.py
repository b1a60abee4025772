"""Seventh query battery: SQL-surface parity details — explicit GROUPING
SETS, positional explode, array higher-order functions, null semantics
(null-safe equality, NULLIF/COALESCE), regex group extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelineetl_spark.queries import _t, query

# =============================================================================
# Explicit GROUPING SETS (beyond ROLLUP/CUBE)
# =============================================================================

@query(
    "q_grouping_sets",
    """
    SELECT COALESCE(l_returnflag, '-') AS rf,
           COALESCE(l_linestatus, '-') AS ls,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the asymmetric aggregation lattice
    (per-flag, per-status, grand total; NOT the full cube).

    Scale: one Expand + one shuffle for all three groupings — vs three
    scans if issued as separate queries + union."""
    li = _t(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, '-') AS rf,
               COALESCE(l_linestatus, '-') AS ls,
               COUNT(*) AS n
        FROM {li}
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """,
        li=li,
    )


# =============================================================================
# Positional explode / array higher-order functions
# =============================================================================

@query(
    "q_posexplode_embedding",
    """
    SELECT vec_id, CAST(i - 1 AS INT) AS pos, ROUND(x, 6) AS val
    FROM (SELECT vec_id, UNNEST(embedding)::DOUBLE AS x,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings)
    WHERE i <= 4
    """,
)
def q_posexplode_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: element + ordinal (vector → long format, first 4 dims).

    Scale: generator is pipelined; the pos filter applies pre-shuffle so
    only 4 rows per vector ever move."""
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "vec_id", F.posexplode(F.col("embedding").cast("array<double>"))
        )
        .withColumnRenamed("pos", "pos")
        .filter(F.col("pos") < 4)
        .select("vec_id", F.col("pos").cast("int").alias("pos"), F.round("col", 6).alias("val"))
    )


@query(
    "q_array_lambda_battery",
    """
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings)
    SELECT vec_id,
           CAST(len(list_filter(e, x -> x > 0)) AS INT)       AS n_pos,
           ROUND(list_sum(list_transform(e, x -> abs(x))), 4) AS l1_norm,
           ROUND(list_max(e), 6)                              AS max_dim,
           CASE WHEN len(list_filter(e, x -> abs(x) > 2)) > 0 THEN true ELSE false END AS has_outlier
    FROM v
    """,
)
def q_array_lambda_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (filter/transform/aggregate/exists)
    over the embedding column — all in-row, zero shuffle."""
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.aggregate(e, F.lit(0.0), lambda acc, x: acc + F.abs(x)), 4
        ).alias("l1_norm"),
        F.round(F.array_max(e), 6).alias("max_dim"),
        F.exists(e, lambda x: F.abs(x) > 2).alias("has_outlier"),
    )


# =============================================================================
# Null semantics
# =============================================================================

@query(
    "q_null_semantics",
    """
    SELECT event_type, not_view, label, COUNT(*) AS n
    FROM (SELECT event_type,
                 NULLIF(event_type, 'view') AS not_view,
                 COALESCE(NULLIF(event_type, 'view'), 'suppressed') AS label
          FROM events)
    GROUP BY event_type, not_view, label
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLIF / COALESCE chains and grouping-by-null (null forms its own
    group, per SQL semantics both engines share)."""
    ev = _t(spark, sf_dir, "events")
    nv = F.nullif(F.col("event_type"), F.lit("view"))
    return (
        ev.select(
            "event_type",
            nv.alias("not_view"),
            F.coalesce(nv, F.lit("suppressed")).alias("label"),
        )
        .groupBy("event_type", "not_view", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_nullsafe_join",
    """
    WITH a AS (SELECT event_type, NULLIF(event_type, 'view') AS k FROM events),
         d AS (SELECT DISTINCT NULLIF(event_type, 'view') AS k FROM events)
    SELECT a.event_type, COUNT(*) AS n
    FROM a JOIN d ON a.k IS NOT DISTINCT FROM d.k
    GROUP BY a.event_type
    """,
)
def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): null keys
    MATCH each other — vs a plain equi-join which drops them. The
    difference is exactly the 'view' rows here."""
    ev = _t(spark, sf_dir, "events")
    a = ev.select("event_type", F.nullif("event_type", F.lit("view")).alias("k"))
    d = a.select("k").distinct().withColumnRenamed("k", "dk")
    return (
        a.join(d, a.k.eqNullSafe(d.dk))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q8_market_share",
    """
    SELECT l_year, ROUND(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)
                         / SUM(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31')
    GROUP BY l_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): 6-table join, conditional share
    aggregate, two roles for nation.

    Scale: every dimension broadcasts; lineitem⋈orders is the only
    repartition; the share is one conditional-sum pass."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select(
        "r_regionkey"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
    )
    return (
        joined.select(F.year("o_orderdate").alias("l_year"), vol.alias("volume"), "supp_nation")
        .groupBy("l_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(F.lit(0.0)))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "q_fuzzy_name_pairs",
    """
    SELECT a.s_name AS name_a, b.s_name AS name_b,
           CAST(levenshtein(a.s_name, b.s_name) AS INT) AS dist
    FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
    WHERE levenshtein(a.s_name, b.s_name) <= 1
    """,
)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching (edit distance ≤ 1) — entity-resolution
    parity with DuckDB's levenshtein.

    Scale: all-pairs on a DIMENSION table only (suppliers); for fact-scale
    fuzzy dedup use the MinHash/SimHash ladder — edit distance does not
    bucket, so it stays a dimension-side tool."""
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    a = s.select(F.col("s_suppkey").alias("ka"), F.col("s_name").alias("name_a"))
    b = s.select(F.col("s_suppkey").alias("kb"), F.col("s_name").alias("name_b"))
    d = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, F.col("ka") < F.col("kb"))
        .select("name_a", "name_b", d.alias("dist"))
        .filter(F.col("dist") <= 1)
    )


# =============================================================================
# Multi-EXISTS self-join (TPC-H Q21 shape)
# =============================================================================

@query(
    "q21_blamable_suppliers",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders    ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    """,
)
def q21_blamable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the only
    supplier late on a multi-supplier finished order — EXISTS + NOT EXISTS
    over self-joins of the fact table.

    Scale: both correlated subqueries become left-semi / left-anti joins
    on l_orderkey — three scans of lineitem but every join is an equi-join
    on the same key, so under one AQE partitioning the self-joins reuse
    the exchange. 'Late' is adapted to the fixture columns
    (shipdate > orderdate + 90d; the reference schema has no
    commit/receipt dates)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")

    l1 = li.join(o, li.l_orderkey == o.o_orderkey).filter(F.col("l_shipdate") > late_cut)
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    with_other = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("l2_orderkey"))
        & (F.col("l_suppkey") != F.col("l2_suppkey")),
        "left_semi",
    )
    l3 = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > late_cut
    ).select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    only_late = with_other.join(
        l3,
        (F.col("l_orderkey") == F.col("l3_orderkey"))
        & (F.col("l_suppkey") != F.col("l3_suppkey")),
        "left_anti",
    )
    return (
        only_late.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# =============================================================================
# Histogram bucketing
# =============================================================================

@query(
    "q_price_histogram",
    """
    SELECT CASE WHEN o_totalprice < 0 THEN 0
                WHEN o_totalprice >= 600000 THEN 13
                ELSE CAST(FLOOR(o_totalprice / 50000) AS BIGINT) + 1 END AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders GROUP BY bucket
    """,
)
def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket — the fixed-bucket profile
    that, unlike percentiles, needs no sort and combines map-side."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(12)).alias(
                "bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


# =============================================================================
# Regex group extraction
# =============================================================================

@query(
    "q_regex_extract_ldn",
    """
    SELECT regexp_extract(measObjLdn, 'eNodeBFunctionName=([^,]*)', 1) AS enb,
           regexp_extract(measObjLdn, 'cellId=([0-9]+)', 1) AS cell,
           COUNT(*) AS n
    FROM (SELECT * FROM (VALUES
      ('eNodeBFunctionName=ENB1,cellId=7'),
      ('eNodeBFunctionName=ENB1,cellId=8'),
      ('eNodeBFunctionName=ENB2,cellId=1'),
      ('malformed')
    ) AS t(measObjLdn))
    GROUP BY enb, cell
    """,
)
def q_regex_extract_ldn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex group extraction over LDN strings (C9 generalization) incl.
    the non-matching case (empty string in both engines)."""
    rows = [
        ("eNodeBFunctionName=ENB1,cellId=7",),
        ("eNodeBFunctionName=ENB1,cellId=8",),
        ("eNodeBFunctionName=ENB2,cellId=1",),
        ("malformed",),
    ]
    df = spark.createDataFrame(rows, ["measObjLdn"])
    return (
        df.select(
            F.regexp_extract("measObjLdn", r"eNodeBFunctionName=([^,]*)", 1).alias("enb"),
            F.regexp_extract("measObjLdn", r"cellId=([0-9]+)", 1).alias("cell"),
        )
        .groupBy("enb", "cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
