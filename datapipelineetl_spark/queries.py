"""Named queries + DuckDB oracle SQL — the judged correctness surface.

Each entry exercises operators from SURVEY.md §2 over the driver fixtures
(TESTDATA.md). Conventions required by the driver harness
(__spark_entry__.py):

- every computed column is aliased IDENTICALLY in Spark and oracle SQL;
- floating aggregates are rounded (or decimal-cast) the same way on both
  sides so the order-insensitive value hash matches exactly;
- LIMIT/top-k queries carry explicit deterministic tiebreakers.

Scale notes appear per query: what shuffles, what broadcasts, what pushes
down. The implementations intentionally stay declarative so Catalyst's
physical choices (broadcast-hash-join, partial aggregation, AQE coalescing)
apply unchanged on a 1000-executor cluster.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datapipelineetl_spark import catalog
from datapipelineetl_spark.operators import cleaning, relational
from datapipelineetl_spark.sinks import serde
from datapipelineetl_spark.sources import meascollec

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame query and its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def driver_unsafe_cols(schema: T.StructType) -> list[tuple[str, str]]:
    """Output columns the DRIVER's correctness canon cannot hash.

    The driver lexsorts result rows via pandas before hashing; a cell
    holding a Python list/dict/Row cannot be factorized
    (``TypeError: unhashable type: 'list'`` — the r7
    q_encode_tokens/q_pack_sequences miss). Any registered or staged
    query whose Spark schema contains ArrayType/MapType/StructType must
    reshape first: md5-digest the collection (q_winnowing_fingerprints
    pattern) or posexplode to scalar rows. Every local gate layer
    (tools/check_correctness.py, tests/test_corpus_oracles.py,
    tools/rotate_window.py) hard-fails on these so the class of miss
    cannot reach the driver again."""
    return [
        (f.name, f.dataType.simpleString())
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return catalog.load(spark, sf_dir, name)


def _t_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``_t`` + repartition to the session's core count: CPU-heavy
    narrow queries otherwise serialize through the fixture's SINGLE
    parquet split (a real corpus arrives in many splits — the
    repartition models production input layout, it is not engine
    tuning). Use for per-row-expensive plans (hashing, regex chains,
    the prepare ladder); plain ``_t`` elsewhere — the extra Exchange
    is pure cost for scan-light queries."""
    return catalog.load(spark, sf_dir, name).repartition(
        spark.sparkContext.defaultParallelism
    )


# =============================================================================
# Relational core (SURVEY.md §2.5–2.7 — the general query surface)
# =============================================================================

@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 4)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (flagship aggregate).

    Scale: the shipdate filter pushes into the parquet scan
    (PushedFilters), only 8 columns are read (ReadSchema pruning), and the
    groupBy runs as partial+final hash aggregate — the shuffle carries just
    |groups| ≈ 6 rows per map task regardless of input size.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective 3-way join + agg + deterministic top-10.

    Scale: only the segment-filtered customer (~1/5 of a dimension table)
    carries a broadcast hint. orders filtered by ``o_orderdate <
    1998-03-15`` keeps ~97% of the table — fact-sized, never hinted: at
    100× a forced broadcast of it OOMs the driver. The orders⋈lineitem
    join shuffles on orderkey (AQE converts to broadcast only if the
    post-filter side actually fits). ORDER BY + LIMIT executes as
    TakeOrderedAndProject (no global sort materialization).
    """
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q5_local_supplier_volume",
    """
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way star join.

    Scale: region/nation/supplier are small dimensions → broadcast hints.
    customer is NOT hinted: at SF100 it's 15M rows (~3.5 GB), past any
    safe broadcast size — it shuffle-joins on custkey and AQE converts to
    broadcast only where it genuinely fits. The fact-side orders⋈lineitem
    join shuffles on orderkey. Dimension filters prune before the join
    (predicate pushdown).
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q_top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn_big AS INT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn_big
      FROM orders)
    WHERE rn_big <= 3
    """,
)
def q_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via window + row_number (SURVEY.md §2.7 windows).

    Scale: one hash shuffle on o_custkey; no global sort. Uses the
    engine's ``top_k_per_group`` with an explicit tiebreaker for
    determinism.
    """
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return relational.top_k_per_group(
        orders,
        ["o_custkey"],
        "o_totalprice",
        k=3,
        rank_col="rn",
        keep_rank=True,
        tiebreak=["o_orderkey"],
    )


@query(
    "q_agg_stats",
    """
    SELECT l_returnflag,
           COUNT(*)                               AS n_rows,
           COUNT(DISTINCT l_partkey)              AS nd_parts,
           ROUND(MIN(l_extendedprice), 2)         AS min_price,
           ROUND(MAX(l_extendedprice), 2)         AS max_price,
           ROUND(AVG(l_extendedprice), 4)         AS avg_price,
           ROUND(STDDEV_SAMP(l_extendedprice), 4) AS sd_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate battery incl. exact distinct count (SURVEY.md §2.6).

    Scale: count(distinct) expands to a two-phase aggregate; everything
    else partial-aggregates map-side.
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_partkey").alias("nd_parts"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
    )


@query(
    "q_customers_without_orders",
    """
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name
    """,
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS) + broadcast dim join (SURVEY.md §2.5).

    Scale: left_anti against orders shuffles on the key (AQE may broadcast
    the distinct o_custkey side); nation is broadcast.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q_active_supplier_keys",
    """
    SELECT l_suppkey AS suppkey FROM lineitem
    INTERSECT
    SELECT s_suppkey AS suppkey FROM supplier WHERE s_acctbal > 0
    """,
)
def q_active_supplier_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation: INTERSECT (SURVEY.md §2.7 set ops)."""
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("suppkey"))
    supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 0)
        .select(F.col("s_suppkey").alias("suppkey"))
    )
    return li.intersect(supp)


@query(
    "q_priciest_lineitems",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def q_priciest_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit (SURVEY.md §2.7 sorts/limits).

    Scale: compiles to TakeOrderedAndProject — each task keeps a 100-row
    heap; no full sort, no full shuffle.
    """
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(100)
    )


@query(
    "q_events_pivot",
    """
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS error,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS view
    FROM events GROUP BY user_id
    """,
)
def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAV/long → wide pivot (SURVEY.md §2.6 — the Kibana-side reshape).

    Uses the engine's ``pivot_eav`` with explicit pivot values — no extra
    distinct-discovery scan (critical at 100 TB).
    """
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    wide = (
        ev.groupBy("user_id").pivot("event_type", types).agg(F.count(F.lit(1)))
    ).na.fill(0, types)
    return wide


@query(
    "q_rollup_order_volume",
    """
    SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*)                          AS n_orders,
           ROUND(SUM(o_totalprice), 2)       AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_rollup_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregate via ROLLUP (SURVEY.md §2.6 grouping sets)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "total",
        )
    )


# =============================================================================
# Cleaning chain (SURVEY.md §2.4 C1–C14) expressed over the fixtures
# =============================================================================

@query(
    "q_clean_chain_events",
    """
    SELECT event_id,
           strptime(strftime(ts, '%m-%d-%Y %H:%M'), '%m-%d-%Y %H:%M') AS ts_min,
           COALESCE(CASE WHEN value < 2.0 THEN NULL ELSE ROUND(value, 2) END, 0) AS value_clean,
           CASE WHEN event_type = 'error' THEN 'N/A' ELSE event_type END  AS type_clean,
           CAST(TRIM(regexp_extract(props, ':([^}]*)', 1)) AS INTEGER)    AS k_val
    FROM events
    """,
)
def q_clean_chain_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference cleaning chain (C1/C2/C4/C6/C9) over the events table.

    - C1 timestamp parse with explicit format (minute truncation via
      format→parse round trip, mypy/preprocessproduce.py:50);
    - C2/C5 null fill to 0 (nulls injected where value < 2);
    - C4-style sentinel replacement on a string column;
    - C9 substring-between extraction from the JSON props string
      (dags/Dag2.py:111 nodeid pattern).

    All narrow, codegen'd column ops — no shuffle.
    """
    ev = _t(spark, sf_dir, "events")
    df = ev.withColumn("ts_str", F.date_format("ts", cleaning.REFERENCE_TIME_FORMAT))
    df = cleaning.parse_timestamp(df, "ts_str", out="ts_min")
    df = df.withColumn(
        "value_clean", F.when(F.col("value") < 2.0, None).otherwise(F.round("value", 2))
    )
    df = cleaning.fill_nulls(df, 0, ["value_clean"])
    df = df.withColumn(
        "type_clean", F.when(F.col("event_type") == "error", "N/A").otherwise(F.col("event_type"))
    )
    df = cleaning.extract_between(df, "props", out="k_raw", start=":", end="}")
    df = df.withColumn("k_val", F.trim(F.col("k_raw")).cast("int"))
    return df.select("event_id", "ts_min", "value_clean", "type_clean", "k_val")


@query(
    "q_envelope_roundtrip",
    """
    SELECT event_id, event_type, ROUND(value, 2) AS value FROM events
    """,
)
def q_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka envelope serde round trip (K1/C12 + schema-as-projection).

    Rows → ``to_json(struct(...))`` envelope → ``from_json`` with a
    declared schema that *omits* one serialized field (user_id), proving
    the reference's "schema prunes unknown fields" semantics
    (SURVEY.md §1.2). Oracle is the identity projection — the round trip
    must be lossless for declared fields.
    """
    ev = _t(spark, sf_dir, "events").withColumn("value", F.round("value", 2))
    env = serde.to_envelope(ev, key="batch-1", columns=["event_id", "event_type", "value", "user_id"])
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    return serde.from_envelope(env, schema)


@query(
    "q_sessionize",
    """
    SELECT user_id, session_id, COUNT(*) AS n_events,
           SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS session_value
    FROM (
      SELECT user_id, value,
             CAST(SUM(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id
      FROM (
        SELECT user_id, ts, event_id, value,
               FLOOR(epoch(ts)) - LAG(FLOOR(epoch(ts))) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
        FROM events))
    GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag + conditional cumsum windows (SURVEY.md §2.7).

    Scale: one shuffle on user_id shared by both window evaluations, then
    a partial-aggregated groupBy on (user_id, session_id) — which AQE can
    run shuffle-free since the data is already user-partitioned.

    Engine-parity notes (driver hash gate): session_value is summed as
    integer cents (order-independent; double sums are not), the oracle
    casts session_id to BIGINT (DuckDB SUM(int) yields HUGEINT/int128,
    which some client paths stringify differently), and the oracle FLOORs
    epoch(ts) to whole seconds to match Spark's truncating timestamp→long
    cast on sub-second event times.
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    sess = ev.withColumn(
        "session_id",
        F.sum(F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)).over(w),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0).alias("session_value"),
    )


_MEASCOLLEC_FIXTURE = """<?xml version="1.0" encoding="UTF-8"?>
<measCollecFile xmlns="http://www.3gpp.org/ftp/specs/archive/32_series/32.435#measCollec">
  <fileHeader fileFormatVersion="32.435 V10.0">
    <fileSender localDn="ENB1"/>
    <measCollec beginTime="2025-07-04T13:00:00+01:00"/>
  </fileHeader>
  <measData>
    <managedElement localDn="SubNetwork=1,ManagedElement=ENB1"/>
    <measInfo measInfoId="measInfo_Cell">
      <job jobId="job1"/>
      <granPeriod duration="PT900S" endTime="2025-07-04T13:15:00+01:00"/>
      <measType p="1">RRC.ConnEstabAtt</measType>
      <measType p="2">RRC.ConnEstabSucc</measType>
      <measValue measObjLdn="eNodeBFunctionName=ENB1,cellId=7">
        <r p="1">100</r>
        <r p="2">95</r>
        <r p="3">7</r>
      </measValue>
      <measValue measObjLdn="eNodeBFunctionName=ENB1,cellId=8">
        <r p="1">NIL</r>
        <r p="2">50</r>
      </measValue>
    </measInfo>
    <measInfo measInfoId="measInfo_Thrp">
      <job jobId="job2"/>
      <granPeriod duration="PT900S" endTime="2025-07-04T13:15:00+01:00"/>
      <measType p="1">DL.Thrp</measType>
      <measValue measObjLdn="eNodeBFunctionName=ENB2,cellId=1">
        <r p="1">123.5</r>
      </measValue>
    </measInfo>
  </measData>
</measCollecFile>
"""


@query(
    "q_meascollec_flatten",
    """
    SELECT * FROM (VALUES
      ('measInfo_Cell','job1','PT900S','2025-07-04T13:00:00+01:00','2025-07-04T13:15:00+01:00','eNodeBFunctionName=ENB1,cellId=7','ENB1','1','RRC.ConnEstabAtt','100'),
      ('measInfo_Cell','job1','PT900S','2025-07-04T13:00:00+01:00','2025-07-04T13:15:00+01:00','eNodeBFunctionName=ENB1,cellId=7','ENB1','2','RRC.ConnEstabSucc','95'),
      ('measInfo_Cell','job1','PT900S','2025-07-04T13:00:00+01:00','2025-07-04T13:15:00+01:00','eNodeBFunctionName=ENB1,cellId=7','ENB1','3','UNKNOWN_3','7'),
      ('measInfo_Cell','job1','PT900S','2025-07-04T13:00:00+01:00','2025-07-04T13:15:00+01:00','eNodeBFunctionName=ENB1,cellId=8','ENB1','1','RRC.ConnEstabAtt','0'),
      ('measInfo_Cell','job1','PT900S','2025-07-04T13:00:00+01:00','2025-07-04T13:15:00+01:00','eNodeBFunctionName=ENB1,cellId=8','ENB1','2','RRC.ConnEstabSucc','50'),
      ('measInfo_Thrp','job2','PT900S','2025-07-04T13:00:00+01:00','2025-07-04T13:15:00+01:00','eNodeBFunctionName=ENB2,cellId=1','ENB2','1','DL.Thrp','123.5')
    ) AS t(measInfoId, jobId, granPeriod, beginTime, endTime, measObjLdn, nodeid, kpiId, kpiName, kpiValue)
    """,
)
def q_meascollec_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS 32.435 XML flatten (S4/C8/C9/C10) against a golden VALUES oracle.

    The fixture document exercises: measType lookup, UNKNOWN_{p} fallback,
    NIL→0, nodeid extraction, multi-measInfo/multi-measValue explode. The
    plan is shuffle-free (document-parallel at scale — SURVEY.md §4.2).
    """
    import pathlib
    import tempfile

    d = pathlib.Path(tempfile.gettempdir()) / "datapipelineetl_xml_fixture"
    d.mkdir(exist_ok=True)
    f = d / "A20250704.xml"
    if not f.exists() or f.read_text() != _MEASCOLLEC_FIXTURE:
        f.write_text(_MEASCOLLEC_FIXTURE)
    raw = meascollec.read_meascollec(spark, str(d))
    return meascollec.flatten_meascollec(raw, "xmlonly")


@query(
    "q_tumbling_window_events",
    """
    SELECT time_bucket(INTERVAL 5 MINUTE, ts)                    AS window_start,
           time_bucket(INTERVAL 5 MINUTE, ts) + INTERVAL 5 MINUTE AS window_end,
           event_type,
           COUNT(*)              AS n,
           ROUND(SUM(value), 2)  AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregate (ST8 semantics, batch form).

    The identical ``F.window`` expression runs under Structured Streaming
    with a watermark (streaming/runner.windowed_aggregate — tested in
    tests/test_streaming.py); batch form here for the DuckDB oracle.
    """
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "q_unpivot_lineitem",
    """
    SELECT name, ROUND(SUM(value), 2) AS total
    FROM (
      SELECT l_orderkey, name, value
      FROM lineitem
      UNPIVOT (value FOR name IN (l_quantity, l_extendedprice, l_discount, l_tax)))
    GROUP BY name
    """,
)
def q_unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → EAV unpivot + aggregate (inverse of the pivot path)."""
    li = _t(spark, sf_dir, "lineitem")
    long = relational.unpivot(
        li, ["l_orderkey"], ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )
    return long.groupBy("name").agg(F.round(F.sum("value"), 2).alias("total"))
