from __future__ import annotations

from pyspark.sql import functions as F

from datapipelineetl_spark.operators import relational


def test_broadcast_lookup_with_default(spark):
    facts = spark.createDataFrame([("m1", "p1"), ("m1", "p9"), ("m2", "p1")], ["mi", "p"])
    dim = spark.createDataFrame([("m1", "p1", "KPI_A"), ("m2", "p1", "KPI_B")], ["mi", "p", "name"])
    out = relational.broadcast_lookup(
        facts, dim, ["mi", "p"], "name", "kpiName",
        default=F.concat(F.lit("UNKNOWN_"), F.col("p")),
    )
    got = {(r.mi, r.p): r.kpiName for r in out.collect()}
    assert got == {("m1", "p1"): "KPI_A", ("m1", "p9"): "UNKNOWN_p9", ("m2", "p1"): "KPI_B"}
    # dim side must be broadcast: no shuffle exchange for the join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_top_k_per_group_deterministic(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 10.0), ("a", 3, 5.0), ("b", 4, 1.0)], ["g", "id", "v"]
    )
    out = relational.top_k_per_group(df, ["g"], "v", k=1, tiebreak=["id"])
    got = {(r.g, r.id) for r in out.collect()}
    assert got == {("a", 1), ("b", 4)}


def test_pivot_and_unpivot_roundtrip(spark):
    long = spark.createDataFrame(
        [(1, "x", 10.0), (1, "y", 20.0), (2, "x", 30.0)], ["k", "name", "value"]
    )
    wide = relational.pivot_eav(long, ["k"], "name", "value", names=["x", "y"])
    got = {r.k: (r.x, r.y) for r in wide.collect()}
    assert got == {1: (10.0, 20.0), 2: (30.0, None)}
    back = relational.unpivot(wide, ["k"], ["x", "y"]).filter(F.col("value").isNotNull())
    assert back.count() == 3


def test_dedupe_exact(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], ["id", "t"])
    assert relational.dedupe_exact(df).count() == 2
    assert relational.dedupe_exact(df, ["t"]).count() == 2


def test_sessionize(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:10:00", 2.0),
        (1, "2024-01-01 02:00:00", 3.0),
        (2, "2024-01-01 00:00:00", 4.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "v"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = relational.sessionize(df, "user_id", "ts", gap_minutes=30)
    sessions = {(r.user_id, r.session_id) for r in out.collect()}
    assert sessions == {(1, 1), (1, 2), (2, 1)}


def test_range_join_ship_day_preagg_exact(spark, sf_dir):
    """Round 17: q_range_join_ship_windows pre-aggregates lineitem to
    day rows before the range join (guide §2.3). The rewrite is exact
    ONLY because every l_quantity is an integer stored in double (sums
    re-associate exactly below 2^53) — this test guards that fixture
    invariant AND pins the rewritten aggregate equal (==, no tolerance)
    to the direct per-row form."""
    from datapipelineetl_spark import catalog

    li = catalog.load(spark, sf_dir, "lineitem").select("l_shipdate", "l_quantity")
    # the integrality invariant the re-association argument rests on
    assert li.filter(F.col("l_quantity") != F.floor("l_quantity")).count() == 0
    windows = (
        catalog.load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "o_orderkey",
            F.col("o_orderdate").alias("w_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS")).alias("w_end"),
        )
    )
    direct = {
        (r.o_orderkey): (r.n, r.q)
        for r in relational.range_join(
            li, windows, "l_shipdate", "w_start", "w_end", bucket_days=2
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
        .collect()
    }
    day = li.groupBy("l_shipdate").agg(
        F.count(F.lit(1)).alias("__n_day"), F.sum("l_quantity").alias("__qty_day")
    )
    pre = {
        (r.o_orderkey): (r.n, r.q)
        for r in relational.range_join(
            day, windows, "l_shipdate", "w_start", "w_end", bucket_days=2
        )
        .groupBy("o_orderkey")
        .agg(F.sum("__n_day").alias("n"), F.sum("__qty_day").alias("q"))
        .collect()
    }
    assert direct == pre and len(pre) > 0
