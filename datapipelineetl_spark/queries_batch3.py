"""Third query battery: remaining relational surface from SURVEY.md §2.6-2.7
(set ops, window-function battery, range frames, percentiles), more
multi-join analytical shapes (TPC-H Q4/Q6/Q10/Q14/Q18/Q19 adapted to the
fixture schemas), JSON extraction, n-gram Jaccard dedup, and the rows-only
checked operators (ANN-LSH, multimodal feature extraction).

Scale notes per query; conventions identical to queries.py (aliases match
the oracle, floats rounded on both sides, deterministic tiebreakers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipelineetl_spark.operators import multimodal, similarity, text
from datapipelineetl_spark.queries import _t, query

# =============================================================================
# Multi-join analytical shapes (TPC-H-style, adapted to fixture columns)
# =============================================================================

@query(
    "q6_revenue_delta",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast-revenue-change: pure scan + filter + global agg.

    Scale: every predicate (shipdate range, discount range, quantity) is a
    parquet PushedFilter; ReadSchema is 4 columns; the aggregate is a
    single partial+final sum — the shuffle carries one row per map task.
    The canonical 'did the filter reach the scan' benchmark."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@query(
    "q4_priority_late_ship",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking) adapted to the fixture
    columns: orders with at least one line shipped >60 days after order.

    Scale: correlated EXISTS becomes a left-semi join — Spark never
    materializes the duplicate matches, and the join degenerates to one
    shuffle on orderkey (or broadcast if the filtered orders side is
    small). The date filter prunes the orders scan first."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): 4-table join + agg + top-20.

    Scale: lineitem (the fact) joins orders on orderkey after both carry
    pushed-down filters; customer and nation are broadcast (nation always,
    customer small relative to the fact side at any SF — Catalyst/AQE
    picks broadcast from stats). Top-20 runs as TakeOrderedAndProject —
    no global sort materialization. Tiebreaker c_custkey makes the cut
    deterministic."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    """
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): conditional aggregate over a
    fact⋈dimension join.

    Scale: part is the dimension — explicitly broadcast, so the fact side
    never shuffles; the month filter is a PushedFilter on the lineitem
    scan. The CASE folds into one whole-stage-codegen'd projection."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0)))
                / F.sum(disc),
                4,
            ).alias("promo_pct")
        )
    )


@query(
    "q18_large_orders",
    """
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           ROUND(SUM(l_quantity), 2) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): IN-subquery over an aggregate.

    Scale: the HAVING aggregate runs first (partial+final on orderkey);
    its survivor set is tiny (<0.1% of orders) so Spark broadcasts it for
    the left-semi IN join — the big fact⋈fact self-join never happens.
    Aggregation keys then carry the already-shuffled orderkey partitioning
    forward (no second exchange on the lineitem side under AQE)."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 300)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    c = _t(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


@query(
    "q19_bracket_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, OR-of-AND brackets).

    Scale: Catalyst extracts the common join key and pushes the
    per-side conjuncts below the join (l_quantity ranges to the lineitem
    scan, brand/size to the part scan) — the OR only evaluates on joined
    survivors. Part broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    bracket = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return j.filter(bracket).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


# =============================================================================
# Set operations (SURVEY.md §2.7 — absent in reference, engine built-ins)
# =============================================================================

@query(
    "q_union_parties_by_nation",
    """
    SELECT kind, nationkey, COUNT(*) AS n FROM (
      SELECT 'customer' AS kind, c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT 'supplier' AS kind, s_nationkey AS nationkey FROM supplier
    ) GROUP BY kind, nationkey
    """,
)
def q_union_parties_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of tagged projections + aggregate.

    Scale: union is a zero-cost plan node (no shuffle); the groupBy is the
    only exchange and runs partial-agg on each input leg independently."""
    c = _t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"), F.col("c_nationkey").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"), F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).groupBy("kind", "nationkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_intersect_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def q_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): nations having both customers and
    suppliers. Spark plans a left-semi join over distinct inputs."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q_parts_never_ordered",
    """
    SELECT p_partkey FROM part
    EXCEPT
    SELECT l_partkey AS p_partkey FROM lineitem
    """,
)
def q_parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): parts with zero lineitem references.
    Spark plans a left-anti join — at scale, distinct-then-anti on the
    fact side beats a NOT IN rewrite (null-safe and shuffle-partitioned)."""
    p = _t(spark, sf_dir, "part").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    return p.exceptAll(li.distinct()).distinct()


# =============================================================================
# Window-function battery (SURVEY.md §2.7)
# =============================================================================

@query(
    "q_window_order_seq",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           LAG(o_totalprice)  OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           CAST(date_diff('day', LAG(o_orderdate) OVER w, o_orderdate) AS INT) AS days_since_prev,
           CAST(ROW_NUMBER() OVER w AS INT) AS rn,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 4) AS pr
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_order_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window battery — lag/lead/row_number/ntile/percent_rank over one
    window spec.

    Scale: all six functions share one Window (one shuffle on o_custkey +
    one in-partition sort); the tiebreaker o_orderkey makes every rank
    deterministic. Per-customer groups are tiny → no skew concern."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("days_since_prev"),
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pr"),
    )


@query(
    "q_window_trailing_revenue",
    """
    WITH daily AS (
      SELECT l_returnflag, l_shipdate AS ship_date,
             SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                 * CAST(ROUND((1 - l_discount) * 100, 0) AS BIGINT)) AS rev_u
      FROM lineitem GROUP BY l_returnflag, l_shipdate)
    SELECT l_returnflag, ship_date, rev_u / 10000.0 AS day_rev,
           SUM(rev_u) OVER (PARTITION BY l_returnflag ORDER BY ship_date
                            RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
             / 10000.0 AS trailing_7d_rev
    FROM daily
    """,
)
def q_window_trailing_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: trailing-7-day revenue per return flag over a
    pre-aggregated daily series.

    Scale: the daily pre-aggregation shrinks the window input from |fact|
    to |flags × days| rows BEFORE the sort — the window itself then costs
    nothing. Range frame keyed on the day number (value-based, handles
    date gaps correctly, unlike a 7-ROW frame); revenue is accumulated as
    exact integer 1e-4 units — see inline note."""
    li = _t(spark, sf_dir, "lineitem")
    # exact integer arithmetic end-to-end: price cents × discount hundredths
    # = revenue in 1e-4 units. Integer sums are order-independent and
    # ROUND never lands on a tie (inputs are within 1e-9 of integers), so
    # the result is bit-identical across engines — double sums/rounds are
    # not (summation order + half-even vs half-up tie handling).
    rev_u = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        * F.round((1 - F.col("l_discount")) * 100, 0).cast("long")
    )
    daily = li.groupBy("l_returnflag", F.col("l_shipdate").alias("ship_date")).agg(
        F.sum(rev_u).alias("rev_u")
    )
    # range key = day number (TIMESTAMP_NTZ has no direct long cast in Spark 4)
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy(F.datediff(F.col("ship_date"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "l_returnflag",
        "ship_date",
        (F.col("rev_u") / 10000.0).alias("day_rev"),
        (F.sum("rev_u").over(w) / 10000.0).alias("trailing_7d_rev"),
    )


@query(
    "q_percentiles_by_priority",
    """
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
           ROUND(quantile_cont(o_totalprice, 0.99), 2) AS p99_price,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_percentiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles + distinct-count per group.

    Scale: exact percentile requires the group's values on one partition —
    fine for low-cardinality groups; for high-cardinality keys switch to
    approx_percentile (t-digest, mergeable map-side). COUNT(DISTINCT)
    plans as a two-phase expand+agg, no driver involvement."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90_price"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 2).alias("p99_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


# =============================================================================
# Semi-structured extraction (events.props JSON)
# =============================================================================

@query(
    "q_json_props",
    """
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(AVG(json_extract_string(props, '$.k')::INT), 4) AS avg_k,
           MAX(json_extract_string(props, '$.k')::INT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from a string column + aggregate.

    Scale: get_json_object is JVM-side (Jackson, codegen) — no Python.
    For repeated multi-key extraction prefer from_json once into a struct
    (single parse) over N get_json_object calls (N parses)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


# =============================================================================
# n-gram Jaccard near-dup (SURVEY.md §2.11 dedup ladder, exact baseline)
# =============================================================================

# lockstep with text.tokens(): post-split empty filter, not trim-then-split
_SQL_TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"

@query(
    "q_ngram_jaccard_pairs",
    rf"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS ts FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(ts) - 2),
                           i -> array_to_string(list_slice(ts, i, i + 2), ' '))) AS sg
      FROM toks),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.sg, b.sg)) AS inter,
             len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg)) AS uni
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
    SELECT id_a, id_b, ROUND(inter * 1.0 / GREATEST(uni, 1), 4) AS jaccard
    FROM pairs WHERE inter * 1.0 / GREATEST(uni, 1) >= 0.3
    """,
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram shingle Jaccard pairs ≥ 0.3 — the *exact* all-pairs
    baseline of the dedup ladder (MinHash+LSH in q_minhash_near_dups is
    the scale path; this is what its recall is measured against).

    Scale: O(n²) by construction — run on samples/buckets only. The
    shingle sets themselves are computed narrowly (no explode; one
    in-row transform)."""
    docs = _t(spark, sf_dir, "documents")
    toks = text.tokens("text")
    sg = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - 2, F.lit(0))),
            lambda i: F.array_join(F.slice(toks, i, 3), " "),
        )
    )
    withsg = docs.select("doc_id", sg.alias("sg"))
    a = withsg.select(F.col("doc_id").alias("id_a"), F.col("sg").alias("sg_a"))
    b = withsg.select(F.col("doc_id").alias("id_b"), F.col("sg").alias("sg_b"))
    inter = F.size(F.array_intersect("sg_a", "sg_b"))
    uni = F.size("sg_a") + F.size("sg_b") - inter
    # greatest(…, 1): two <3-token docs have empty shingle sets → 0/0
    # (ANSI error); define their similarity as 0 on both engines
    jac = inter / F.greatest(uni, F.lit(1))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"), jac.alias("__j"))
        .filter(F.col("__j") >= 0.3)
        .drop("__j")
    )


# =============================================================================
# ANN top-k — oracle-checked by embedding the deterministic hyperplanes
# as SQL literals (the LCG that derives them is seed-fixed, so the planes
# are compile-time constants, not runtime algebra)
# =============================================================================

_ANN_DIM = 64          # fixture embedding width; q_ann_lsh_topk asserts it
_ANN_PLANES = similarity._hyperplanes(8, _ANN_DIM, seed=42)
_ANN_PROBE = [(1.0 if i % 7 == 0 else 0.1) for i in range(_ANN_DIM)]


def _ann_oracle() -> str:
    """DuckDB replay of the full SRP-LSH probe: identical hyperplane
    constants (full-precision literals), identical sign-bit signature,
    identical Hamming≤1 multi-probe filter, identical cosine + ordering.
    The dot products fold left-to-right in both engines, so the sign
    decisions and rounded scores are bit-identical."""
    qsig = 0
    for p, plane in enumerate(_ANN_PLANES):
        if sum(q * x for q, x in zip(_ANN_PROBE, plane)) >= 0:
            qsig |= 1 << p
    def arr(xs):
        return "[" + ", ".join(repr(float(x)) for x in xs) + "]"
    sig_terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, {arr(plane)}) >= 0 THEN {1 << p} ELSE 0 END)"
        for p, plane in enumerate(_ANN_PLANES)
    )
    probe = arr(_ANN_PROBE)
    return f"""
    WITH s AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sig AS (
      SELECT vec_id, v, ({sig_terms})::BIGINT AS sig FROM s)
    SELECT vec_id,
           ROUND(list_dot_product(v, {probe})
                 / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product({probe}, {probe}))),
                 4) AS cos_sim
    FROM sig
    WHERE bit_count(xor(sig, {qsig}::BIGINT)) <= 1
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
    """


@query("q_ann_lsh_topk", _ann_oracle())
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: LSH-bucketed cosine top-10 around a fixed probe vector
    (multi-probe Hamming ≤ 1). Oracle-checked end-to-end: the seed-42 LCG
    hyperplanes are embedded in the oracle as literal constants, so the
    signature/bucket/score path is value-verified, not just row-counted
    (recall vs the exact baseline is separately gated by q_ann_recall and
    tests/test_text_dedup_similarity.py).

    Scale: signature is a persistable narrow column; a probe touches
    ~(planes+1)/2^planes of rows instead of all — the IVF-style pruning
    path for 100 TB embedding stores."""
    emb = _t(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    if dim != _ANN_DIM:
        raise ValueError(
            f"embeddings dim {dim} != {_ANN_DIM}; the ANN oracle's hyperplane "
            "literals are derived for the fixture width — regenerate _ANN_PLANES"
        )
    out = similarity.ann_lsh_topk(emb, _ANN_PROBE, k=10, num_planes=8)
    return out.select("vec_id", F.round("cos_sim", 4).alias("cos_sim"))


@query(
    "q_multimodal_features",
    """
    SELECT doc_id AS media_id,
           CAST(COALESCE(octet_length(text::BLOB), 0) AS BIGINT) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: documents.text encoded to a binary
    payload column (stand-in for image/audio bytes), featurized via the
    Arrow-batched mapInPandas kernel (deterministic fake decode — real
    codecs are stubbed, module docstring).

    The kernel computes n_bytes + md5 checksum + an 8-float rolling-hash
    feature vector per payload. The emitted columns are the kernel outputs
    DuckDB can replay (octet_length / md5) — so the Python/Arrow kernel
    path itself is HASH-CHECKED against the oracle. The feature vector is
    still computed inside the same kernel invocation (projection prunes
    after the Python function runs, not inside it) and its exact values
    are pinned by tests/test_text_dedup_similarity.py::
    test_multimodal_fake_decode_plumbing — the rolling hash is the one
    part no SQL engine can express.

    Scale: payload bytes never leave the executor; only the feature
    vector and metadata shuffle."""
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    feats = multimodal.extract_features(docs, fake=True, n_features=8)
    return feats.select("media_id", "n_bytes", "checksum")


@query(
    "q_frame_sample_plan",
    """
    SELECT doc_id AS media_id,
           UNNEST(generate_series(0, GREATEST(n_chars - 1, 0), 250)) AS frame_ts_ms
    FROM documents
    """,
)
def q_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: one row per (media, frame timestamp)
    from duration metadata only — the explode that precedes a real frame
    decoder (multimodal.frame_sample_plan); payload bytes stay untouched.
    Duration here is synthesized from documents.n_chars (ms)."""
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.struct(F.col("n_chars").cast("long").alias("duration_ms")).alias("meta"),
    )
    return multimodal.frame_sample_plan(docs, every_ms=250)


@query(
    "q_multimodal_meta",
    """
    SELECT doc_id AS media_id, CAST(octet_length(text::BLOB) AS INT) AS n_bytes, md5(text) AS checksum
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata (length + checksum) computed JVM-side —
    the oracle-checked half of the multimodal path (the mapInPandas
    feature kernel is rows-only in q_multimodal_features)."""
    docs = _t(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("checksum"),
    )
