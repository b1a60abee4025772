"""Nineteenth query battery — staged round 12, PROMOTED round 13
(__spark_entry__ calls ``register()``; the five names hold the r13
window's promotion slots).

Round-12 depth addition: the PRODUCT-QUANTIZATION tier of the ANN
ladder (Jégou et al. 2011, public) — the memory-compression leg next
to SRP-LSH (`ann_lsh_topk`) and IVF (`ivf_fit_centroids`). A dim-64
float32 vector is 256 bytes; its PQ code is m small ints — the column
a 100 TB embedding store scans INSTEAD of the raw vectors. Plus the
computed-weight leg of corpus mixing (temperature/alpha scaling).
Five staged queries pin the pipelines cross-engine:

- ``q_pq_codes`` — fit (per-subspace deterministic Lloyd) + encode:
  EVERY vector's code in EVERY subspace is value-checked; the oracle
  replays the full m-subspace Lloyd trajectory (seed rounding, every
  distance, every argmin tiebreak, every rounded codeword mean) the
  way `_kmeans_ctes` replays the kmeans one.
- ``q_pq_topk`` — asymmetric-distance (ADC) top-k: the oracle
  re-derives the query's m × k_sub lookup table and every row's
  sequential m-term ADC sum, so the approximate distances AND the
  result order are value-checked, not just recall-gated.
- ``q_temperature_mix`` — temperature weights w ∝ n^alpha over a
  skewed pseudo-source tag, the limiting-source total, and every
  hash-gate decision replayed (the q_corpus_mix guarantee extended
  to COMPUTED weights).
- ``q_pq_refine_recall`` — the two-stage search's recall@10 as a
  boolean gate (the q_ann_recall pattern): ADC shortlist (scaled with
  the corpus, max(200, n/5)) → exact re-rank must recover ≥ 0.7 of
  the brute-force top-10.
- ``q_l2_topk`` — the exact squared-L2 top-k baseline every L2-metric
  ANN tier is measured against, every distance fold replayed.

Same staging contract as batches 11–18: separate dicts so importing
this module cannot grow the live ``queries()`` surface mid-round;
``tests/test_corpus_oracles.py`` runs the driver-style comparison
locally; ``register()`` (called by __spark_entry__ since round 13)
promotes them into the live registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelineetl_spark.operators import corpus, similarity
from datapipelineetl_spark.queries import _t
from datapipelineetl_spark.queries import QUERIES as _GLOBAL_QUERIES
from datapipelineetl_spark.queries import ORACLES as _GLOBAL_ORACLES
from datapipelineetl_spark.queries_ext import _query_vec

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
    """Promote the staged queries into the live registry — called by
    __spark_entry__ since round 13 (idempotent; the five names hold
    the r13 window's promotion slots)."""
    _GLOBAL_QUERIES.update(STAGED_QUERIES)
    _GLOBAL_ORACLES.update(STAGED_ORACLES)


# geometry: dim 64 → m=16 subspaces of 4 dims, 16 codewords each, 1
# Lloyd iteration — picked by MEASUREMENT on the fixture (adc
# recall@10 0.5, refine_n=50 recall 0.9, fit ~8 s: the recall/gate-cost
# frontier across the (m, k_sub, iters) grid — richer geometries gain
# recall slowly while the fold's literal expression tree, the kmeans
# analysis-cost lesson, doubles the fit wall; recall gates in
# tests/test_pq.py pin the measured numbers)
_PQ_M = 16
_PQ_K = 16
_PQ_ITERS = 1
_PQ_SUB = 4
_PQ_DP = 6


def _pq_ctes(
    m: int, k_sub: int, iters: int, sub: int, dp: int,
    v_chain: str | None = None,
) -> str:
    """Generate the unrolled per-subspace Lloyd CTE chain ending in
    ``codes(vec_id, j, c)`` — the `_kmeans_ctes` discipline generalized
    to m independent subspaces carried as a `j` grouping column (ONE
    chain replays all m trajectories): seeds = the k_sub lowest-id
    vectors' subvectors (rounded), each iteration = per-(vec,subspace)
    argmin (ties to the lower code) + per-(subspace,code) rounded
    means (empty codes keep the previous codeword via COALESCE).
    Shared by the q_pq_codes and q_pq_topk oracles.

    ``v_chain`` (round 14, for the staged residual battery) replaces
    the default leading ``v`` CTE with a caller-supplied CTE chunk that
    must end by defining ``v(vec_id, v)`` — e.g. raw + frozen coarse
    centroids + fold assignment + residual subtraction — so the SAME
    Lloyd replay runs over residuals instead of raw embeddings."""
    dist = (
        f"list_sum(list_transform(generate_series(1, {sub}), "
        f"z -> (s[z] - cv[z]) * (s[z] - cv[z])))"
    )
    ctes = [
        v_chain if v_chain is not None else
        "v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
        "FROM embeddings WHERE embedding IS NOT NULL)",
        f"sv AS (SELECT vec_id, CAST(j AS INT) AS j, "
        f"list_slice(v, j*{sub}+1, (j+1)*{sub}) AS s "
        f"FROM v, LATERAL UNNEST(generate_series(0, {m - 1})) AS t(j))",
        f"c0 AS (SELECT j, CAST(rn - 1 AS INT) AS c, "
        f"list_transform(s, x -> ROUND(x, {dp})) AS cv "
        f"FROM (SELECT j, s, ROW_NUMBER() OVER (PARTITION BY j ORDER BY vec_id) "
        f"AS rn FROM sv) WHERE rn <= {k_sub})",
    ]
    for i in range(iters):
        ctes.append(
            f"a{i} AS (SELECT vec_id, j, s, c FROM ("
            f"SELECT vec_id, j, s, c, ROW_NUMBER() OVER "
            f"(PARTITION BY vec_id, j ORDER BY d, c) AS rn FROM ("
            f"SELECT sv.vec_id, sv.j, sv.s, cc.c, cc.cv, {dist} AS d "
            f"FROM sv JOIN c{i} cc USING (j))) WHERE rn = 1)"
        )
        ctes.append(
            f"c{i + 1} AS (SELECT s.j, s.c, COALESCE(u.cv, s.cv) AS cv FROM c{i} s "
            f"LEFT JOIN (SELECT j, c, list(ROUND(mn, {dp}) ORDER BY z) AS cv FROM ("
            f"SELECT j, c, z, AVG(s[z]) AS mn FROM a{i}, "
            f"LATERAL UNNEST(generate_series(1, {sub})) AS t(z) "
            f"GROUP BY j, c, z) GROUP BY j, c) u ON s.j = u.j AND s.c = u.c)"
        )
    ctes.append(
        f"codes AS (SELECT vec_id, j, c FROM (SELECT vec_id, j, c, ROW_NUMBER() OVER "
        f"(PARTITION BY vec_id, j ORDER BY d, c) AS rn FROM ("
        f"SELECT sv.vec_id, sv.j, cc.c, {dist} AS d "
        f"FROM sv JOIN c{iters} cc USING (j))) WHERE rn = 1)"
    )
    return ",\n".join(ctes)


@query(
    "q_pq_codes",
    f"""WITH {_pq_ctes(_PQ_M, _PQ_K, _PQ_ITERS, _PQ_SUB, _PQ_DP)}
    SELECT vec_id, j AS subspace, c AS code FROM codes""",
)
def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization fit + encode over the embedding corpus
    (m={0} subspaces × {1} codewords, {2} Lloyd iteration(s)): every
    vector's code in every subspace, posexploded to scalar rows — the
    oracle replays all m per-subspace Lloyd trajectories (seed
    rounding, every distance, every argmin tiebreak, every rounded
    codeword mean) in one CTE chain carrying the subspace as a
    grouping column, so the ENTIRE fit+encode path is value-checked
    cross-engine, the q_kmeans_clusters guarantee extended to PQ.

    Scale: codebooks are driver metadata (m × k_sub × dim/m rounded
    doubles); each fit iteration is ONE narrow pass + ONE
    (subspace, code)-key partial agg; the encode is one narrow
    fold-over-literals pass. The encode's `mode="arrow"` knob is the
    k_sub=256 production path (similarity.pq_encode docstring)."""
    emb = _t(spark, sf_dir, "embeddings")
    books = similarity.pq_fit(
        emb, m=_PQ_M, k_sub=_PQ_K, iters=_PQ_ITERS, round_dp=_PQ_DP
    )
    enc = similarity.pq_encode(emb, books)
    return enc.filter(F.col("pq_code").isNotNull()).select(
        "vec_id", F.posexplode("pq_code").alias("subspace", "code")
    )


@query(
    "q_pq_topk",
    f"""WITH {_pq_ctes(_PQ_M, _PQ_K, _PQ_ITERS, _PQ_SUB, _PQ_DP)},
    q AS (SELECT j, s AS qs FROM sv WHERE vec_id = 0),
    lut AS (SELECT q.j, cc.c,
            list_sum(list_transform(generate_series(1, {_PQ_SUB}),
                     z -> (qs[z] - cv[z]) * (qs[z] - cv[z]))) AS d
            FROM q JOIN c{_PQ_ITERS} cc ON q.j = cc.j),
    adc AS (SELECT vec_id, ROUND(list_sum(list(d ORDER BY j)), {_PQ_DP}) AS adc
            FROM (SELECT codes.vec_id, codes.j, lut.d FROM codes
                  JOIN lut ON codes.j = lut.j AND codes.c = lut.c)
            GROUP BY vec_id)
    SELECT vec_id, adc FROM adc WHERE vec_id <> 0
    ORDER BY adc, vec_id LIMIT 10""",
)
def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance (ADC) PQ top-10 neighbors of vec_id 0: the
    query's m × k_sub exact-subspace-distance lookup table ships as a
    literal (driver metadata) and each row's approximate squared L2 is
    a pure JVM fold of m table lookups over its code — the oracle
    re-derives the codebooks, the LUT, and every sequential m-term ADC
    sum, so approximate distances AND result order are value-checked
    (ordering is on the ROUNDED distance, the cosine_topk discipline).

    Scale: THE 100 TB scan tier — the pass reads m small ints per row
    instead of the dim-sized vector (32× less I/O at m=8/k_sub=256 on
    dim-64 float32), no join, no shuffle beyond the
    TakeOrderedAndProject k-heap; `refine_n` re-ranks a shortlist
    against raw vectors for exact-search recall
    (similarity.pq_adc_topk docstring; recall gates in tests/test_pq.py)."""
    emb = _t(spark, sf_dir, "embeddings")
    books = similarity.pq_fit(
        emb, m=_PQ_M, k_sub=_PQ_K, iters=_PQ_ITERS, round_dp=_PQ_DP
    )
    enc = similarity.pq_encode(emb, books)
    qv = _query_vec(spark, sf_dir, 0)
    return similarity.pq_adc_topk(
        enc, qv, books, k=10, round_dp=_PQ_DP, exclude_ids=(0,)
    )


# =============================================================================
# Temperature-based corpus remix (UniMax / multilingual alpha-scaling)
# =============================================================================

_TM_ALPHA = 0.5
_TM_SALT = "tm0"
# the fixture's real `source` column is perfectly uniform (25 docs per
# src*), which makes temperature weighting degenerate (every weight
# equal, every fraction 1) — derive a SKEWED 4:2:1 pseudo-source so
# the alpha actually moves the mix
_TM_TAG = (
    "CASE WHEN doc_id % 7 < 4 THEN 'head' "
    "WHEN doc_id % 7 < 6 THEN 'mid' ELSE 'tail' END"
)
_SQL_GATE_TM = (
    "(('0x' || substr(md5(COALESCE(doc_id::VARCHAR, '__null__') "
    f"|| '{_TM_SALT}'), 1, 15))::BIGINT % 1000000)"
)


@query(
    "q_temperature_mix",
    f"""
    WITH tagged AS (
      SELECT doc_id, {_TM_TAG} AS mix_source FROM documents),
    cnt AS (SELECT mix_source, CAST(COUNT(*) AS DOUBLE) AS n
            FROM tagged GROUP BY mix_source),
    z AS (SELECT SUM(POWER(n, {_TM_ALPHA})) AS z FROM cnt),
    w AS (SELECT mix_source, POWER(n, {_TM_ALPHA}) / z.z AS w, n
          FROM cnt CROSS JOIN z),
    t AS (SELECT MIN(n / w) AS total FROM w),
    fr AS (SELECT mix_source,
                  CAST(ROUND(LEAST(1.0, w * t.total / n) * 1000000) AS BIGINT)
                    AS thr
           FROM w CROSS JOIN t)
    SELECT g.doc_id, g.mix_source
    FROM tagged g JOIN fr USING (mix_source)
    WHERE {_SQL_GATE_TM} < fr.thr
    """,
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based corpus remix (alpha={0}): a skewed 4:2:1
    pseudo-source tag, temperature weights w ∝ n^alpha, the
    limiting-source total, per-source fractions, and every row's
    hash-gate decision ALL replayed by the oracle — the full
    `corpus.temperature_mix` derivation value-checked cross-engine
    (the q_corpus_mix guarantee extended to computed-weight mixing;
    fraction thresholds quantize to millionths, which absorbs any
    cross-libm POWER last-ulp difference).

    Scale: one source-cardinality count aggregate + ONE narrow
    CASE-threshold filter — no join, no union
    (corpus.temperature_mix docstring)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_TM_TAG).alias("mix_source")
    )
    return corpus.temperature_mix(
        docs, key_col="doc_id", source_col="mix_source",
        alpha=_TM_ALPHA, salt=_TM_SALT,
    ).select("doc_id", "mix_source")


@query(
    "q_pq_refine_recall",
    """
    SELECT 10 AS k, TRUE AS recall_ge_070
    """,
)
def q_pq_refine_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 gate for the PQ two-stage search (ADC shortlist →
    exact squared-L2 re-rank): |refined top-10 ∩ exact top-10| / 10
    emitted as a boolean threshold check (≥ 0.7) so DuckDB verifies it
    as a constant — the q_ann_recall pattern applied to the PQ tier.

    ``refine_n`` SCALES with the corpus (max(200, n/5)) so the
    shortlist stays a constant fraction as fixtures grow — the r12
    staging held it at 100 while the corpus grew 4×, leaving the worst
    measured point (0.8 at sf0.1) one hit above the floor (VERDICT r12
    "what's wrong" #2). Re-measured with the scaled rule before r13
    promotion: recall@10 = 1.0 / 1.0 / 0.9 at sf0.001/0.01/0.1
    (refine_n 200/200/400 over n 500/500/2000) — every fixture now
    carries ≥ two-hit headroom, so a regeneration-sized drift cannot
    flake this boolean driver gate. The corpus count is one
    metadata-only parquet count job.

    Deterministic: the codebooks are the same replayed-trajectory fit
    as q_pq_codes, the baseline is brute force, the re-rank is exact.

    Scale: the ADC leg is the compressed scan (q_pq_topk); the refine
    leg touches refine_n raw vectors via a broadcast-shortlist join;
    the intersection is a 10×10 broadcast semi-join. Nothing is O(n²);
    refine_n/n is a fixed 20% ratio ONLY at oracle-fixture scale — a
    production store pins an absolute refine_n (the SCALING.md PQ
    measurements) because recall there is governed by the geometry,
    not the corpus fraction."""
    emb = _t(spark, sf_dir, "embeddings")
    refine_n = max(200, -(-emb.count() // 5))
    books = similarity.pq_fit(
        emb, m=_PQ_M, k_sub=_PQ_K, iters=_PQ_ITERS, round_dp=_PQ_DP
    )
    enc = similarity.pq_encode(emb, books)
    qv = _query_vec(spark, sf_dir, 0)
    vec = F.col("embedding").cast("array<double>")
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    exact = (
        emb.filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.aggregate(
                F.zip_with(vec, qlit, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, d: acc + d,
            ).alias("d2"),
        )
        .orderBy("d2", "vec_id")
        .limit(10)
        .select("vec_id")
    )
    refined = similarity.pq_adc_topk(
        enc, qv, books, k=10, round_dp=_PQ_DP, exclude_ids=(0,),
        refine_n=refine_n, vectors=emb,
    ).select("vec_id")
    hits = refined.join(F.broadcast(exact), "vec_id", "semi")
    return hits.agg(
        F.lit(10).alias("k"),
        (F.count(F.lit(1)) >= F.lit(7)).alias("recall_ge_070"),
    )


@query(
    "q_l2_topk",
    """
    WITH ex AS (SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings),
    q AS (SELECT v AS qv FROM ex WHERE vec_id = 0)
    SELECT vec_id,
           ROUND(list_sum(list_transform(generate_series(1, 64),
                 z -> (v[z] - qv[z]) * (v[z] - qv[z]))), 6) AS l2
    FROM ex, q WHERE vec_id <> 0
    ORDER BY l2, vec_id LIMIT 10
    """,
)
def q_l2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 by squared L2 distance from vec_id 0 — the
    Euclidean twin of q_cosine_topk and the exact baseline every
    L2-metric ANN tier (IVF l2, PQ ADC, residual IVF-PQ) is measured
    against. Every distance is a sequential fold both engines replay
    term-for-term; ordering is on the ROUNDED distance (hash-stable).

    Scale: narrow literal-query scoring + TakeOrderedAndProject
    (per-partition k-heap), no shuffle beyond the heap merge
    (similarity.l2_topk docstring)."""
    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    return similarity.l2_topk(emb, qv, k=10, exclude_ids=(0,))


# A '"""...""".format(...)' first statement is an expression, not a
# string literal, so __doc__ was None (ADVICE r13, fixed repo-wide r14).
# The docstrings above are plain literals; interpolate their geometry
# constants here, after definition.
q_pq_codes.__doc__ = q_pq_codes.__doc__.format(_PQ_M, _PQ_K, _PQ_ITERS)
q_temperature_mix.__doc__ = q_temperature_mix.__doc__.format(_TM_ALPHA)
