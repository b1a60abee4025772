"""Fourteenth query battery — STAGED for the round-9 verify window.

Round-8 additions to the training-data surface: LM-based quality
scoring (``text.unigram_logprob`` — the CCNet-style perplexity filter,
here an exact add-alpha unigram model so the score is
oracle-replayable), DSIR-style hashed n-gram importance weighting
(``corpus.dsir_weights``), per-source quality calibration
(``text.calibrate_quality``), Heaps-law vocabulary growth
(``text.vocab_growth``), deterministic Euclidean k-means corpus
clustering (``similarity.kmeans`` — every Lloyd iteration replayed in
SQL, so the full assignment is value-checked, not just a recall
number), gumbel-top-k importance resampling (``corpus.dsir_resample``
— the selection half of DSIR, every deterministic gumbel draw
replayed), best-fit-decreasing packing (``corpus.pack_best_fit`` —
the open-bin state machine replayed as a recursive CTE), and
cluster-balanced sampling (``corpus.cluster_balanced_sample`` — k-means
strata × exactly-k selection, both halves' oracles composed).

Same staging contract as batches 11–13: separate dicts so importing
this module cannot grow the live ``queries()`` surface mid-round;
``tests/test_corpus_oracles.py`` runs the driver-style comparison
locally; ``register()`` promotes them when the r9 window has slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelineetl_spark.operators import corpus, similarity, text
from datapipelineetl_spark.queries import _t, _t_spread
from datapipelineetl_spark.queries import QUERIES as _GLOBAL_QUERIES
from datapipelineetl_spark.queries import ORACLES as _GLOBAL_ORACLES
from datapipelineetl_spark.queries_ext import _SQL_TOKENS

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
    """Round-9 wiring: promote the staged queries into the live registry
    (call from __spark_entry__ next to the batch-13 register, then give
    them window slots)."""
    _GLOBAL_QUERIES.update(STAGED_QUERIES)
    _GLOBAL_ORACLES.update(STAGED_ORACLES)


_TOKS = _SQL_TOKENS.format(c="text")


# =============================================================================
# LM quality scoring (CCNet-style, exact unigram model)
# =============================================================================

@query(
    "q_unigram_logprob",
    f"""
    WITH cnts AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT UNNEST({_TOKS}) AS tok FROM documents)
      GROUP BY tok),
    tot AS (
      SELECT COALESCE(SUM(cnt), 0) AS total, COUNT(*) AS vocab FROM cnts),
    toks AS (
      SELECT doc_id, UNNEST(arr) AS tok
      FROM (SELECT doc_id, {_TOKS} AS arr FROM documents)),
    lp AS (
      SELECT t.doc_id,
             ln((COALESCE(c.cnt, 0) + 0.5) / (tot.total + 0.5 * (tot.vocab + 1)))
               AS lp
      FROM toks t LEFT JOIN cnts c ON t.tok = c.tok CROSS JOIN tot),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             ROUND(AVG(lp), 5) AS avg_logprob
      FROM lp GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
           a.avg_logprob
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM quality scoring (the CCNet-style perplexity filter on an
    exact add-0.5 unigram model fit on the corpus itself): per-doc mean
    ln-probability of its tokens, value-checked to 5 decimals — the
    oracle re-fits the identical model and replays every smoothed
    probability, so the whole fit+score path is pinned cross-engine.

    Scale: one token-count shuffle for the LM (vocabulary-sized,
    materialized once) + one broadcastable LM join + one groupBy(doc);
    the totals row is an allowlisted 1-row scalar crossJoin
    (text.unigram_logprob docstring)."""
    docs = _t_spread(spark, sf_dir, "documents")
    return text.unigram_logprob(docs)


# =============================================================================
# DSIR-style hashed n-gram importance weighting
# =============================================================================

_DSIR_BUCKETS = 1024
_SQL_HASH60 = "('0x' || substr(md5({t}), 1, 15))::BIGINT"

# gram construction replay: unigrams + word bigrams, with the degenerate
# sub-2-token shingles filtered (corpus.dsir_weights' grams())
_SQL_GRAMS = rf"""list_concat(
  toks,
  list_filter(
    list_transform(generate_series(0, GREATEST(len(toks) - 2, 0)),
                   i -> array_to_string(list_slice(toks, i + 1, i + 2), ' ')),
    g -> g <> '' AND NOT regexp_matches(g, '^\S+$')))"""


@query(
    "q_dsir_weights",
    f"""
    WITH docs_g AS (
      SELECT doc_id, source, {_SQL_GRAMS} AS grams
      FROM (SELECT doc_id, source, {_TOKS} AS toks FROM documents)),
    raw_d AS (
      SELECT {_SQL_HASH60.format(t='g')} % {_DSIR_BUCKETS} AS b,
             CAST(COUNT(*) AS BIGINT) AS raw_cnt
      FROM (SELECT UNNEST(grams) AS g FROM docs_g) GROUP BY b),
    tgt_d AS (
      SELECT {_SQL_HASH60.format(t='g')} % {_DSIR_BUCKETS} AS b,
             CAST(COUNT(*) AS BIGINT) AS tgt_cnt
      FROM (SELECT UNNEST(grams) AS g FROM docs_g WHERE source = 'src0')
      GROUP BY b),
    model AS (
      SELECT COALESCE(r.b, t.b) AS b,
             COALESCE(raw_cnt, 0) AS raw_cnt,
             COALESCE(tgt_cnt, 0) AS tgt_cnt
      FROM raw_d r FULL JOIN tgt_d t ON r.b = t.b),
    tot AS (
      SELECT COALESCE(SUM(raw_cnt), 0) AS raw_total,
             COALESCE(SUM(tgt_cnt), 0) AS tgt_total
      FROM model),
    lr AS (
      SELECT g.doc_id,
             ln((COALESCE(m.tgt_cnt, 0) + 1.0) / (tot.tgt_total + 1.0 * {_DSIR_BUCKETS}))
             - ln((COALESCE(m.raw_cnt, 0) + 1.0) / (tot.raw_total + 1.0 * {_DSIR_BUCKETS}))
               AS lr
      FROM (SELECT doc_id, {_SQL_HASH60.format(t='g')} % {_DSIR_BUCKETS} AS b
            FROM (SELECT doc_id, UNNEST(grams) AS g FROM docs_g)) g
      LEFT JOIN model m ON g.b = m.b CROSS JOIN tot),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
             ROUND(AVG(lr), 5) AS dsir_weight
      FROM lr GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(a.n_grams, 0) AS BIGINT) AS n_grams,
           a.dsir_weight
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023) of every raw doc
    against the 'src0' target slice: hashed uni+bigram features,
    add-1-smoothed bucket distributions, per-doc mean log-likelihood
    ratio — the oracle re-derives both distributions AND every hashed
    bucket assignment, so the whole importance model is value-checked.

    Scale: the model is two {0}-bucket metadata frames (fixed size
    regardless of corpus); scoring is one explode + broadcast bucket
    join + one groupBy(doc) (corpus.dsir_weights docstring)."""
    docs = _t_spread(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == "src0")
    return corpus.dsir_weights(docs, target, n_buckets=_DSIR_BUCKETS)


# =============================================================================
# Per-source quality calibration
# =============================================================================

@query(
    "q_quality_calibrated",
    r"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(length(text) AS INT) AS n_chars_m,
             ROUND(len(regexp_extract_all(text, '[^\w\s]')) * 1.0
                   / GREATEST(length(text), 1), 4) AS punct_ratio,
             ROUND(len(list_filter(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''),
                                   x -> x IN ('the','and','of','to','is'))) * 1.0
                   / GREATEST(len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')), 1), 4)
               AS stopword_ratio,
             ROUND(len(regexp_extract_all(text, '[A-Za-z]')) * 1.0
                   / GREATEST(length(text), 1), 4) AS alpha_ratio
      FROM documents),
    s AS (
      SELECT doc_id, source,
             ROUND(CAST(
               (CASE WHEN n_chars_m < 20 THEN 0.0 ELSE 1.0 END) * 0.25
               + (CASE WHEN stopword_ratio >= 0.01 AND stopword_ratio <= 0.6 THEN 1.0 ELSE 0.0 END) * 0.25
               + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END) * 0.25
               + (CASE WHEN alpha_ratio >= 0.5 THEN 1.0 ELSE 0.0 END) * 0.25
               AS DOUBLE), 4) AS quality_score
      FROM t)
    SELECT doc_id, source, quality_score,
           ROUND((ROW_NUMBER() OVER (PARTITION BY source ORDER BY quality_score, doc_id) - 1)
                 / GREATEST(COUNT(*) OVER (PARTITION BY source) - 1, 1) * 1.0, 6)
             AS quality_pct
    FROM s
    """,
)
def q_quality_calibrated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source rank calibration of the composite quality score: each
    doc's percentile within its source (deterministic id tiebreak) —
    the oracle replays the scoring CTE and the window arithmetic, so
    every percentile is value-checked.

    Scale: narrow scoring + ONE shuffle on source with per-source
    windows (text.calibrate_quality docstring, incl. the
    dominant-source caveat)."""
    docs = _t(spark, sf_dir, "documents")
    return text.calibrate_quality(docs).select(
        "doc_id", "source", "quality_score", "quality_pct"
    )


# =============================================================================
# Heaps-law vocabulary growth
# =============================================================================

_VG_WIDTH = 50


@query(
    "q_vocab_growth",
    f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(arr) AS tok
      FROM (SELECT doc_id, {_TOKS} AS arr FROM documents)),
    firsts AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_toks
      FROM (SELECT CAST(MIN(doc_id) // {_VG_WIDTH} AS BIGINT) AS bucket
            FROM toks GROUP BY tok)
      GROUP BY bucket),
    per_b AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS docs,
             CAST(SUM(nt) AS BIGINT) AS toks
      FROM (SELECT CAST(doc_id // {_VG_WIDTH} AS BIGINT) AS bucket,
                   len({_TOKS}) AS nt
            FROM documents)
      GROUP BY bucket)
    SELECT p.bucket,
           CAST(p.bucket * {_VG_WIDTH} AS BIGINT) AS bucket_start,
           CAST(SUM(p.docs) OVER w AS BIGINT) AS docs_cum,
           CAST(SUM(p.toks) OVER w AS BIGINT) AS tokens_cum,
           CAST(SUM(COALESCE(f.new_toks, 0)) OVER w AS BIGINT) AS vocab_cum
    FROM per_b p LEFT JOIN firsts f ON p.bucket = f.bucket
    WINDOW w AS (ORDER BY p.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: cumulative docs/tokens/distinct-token
    counts at every {0}-id-wide corpus checkpoint — first-occurrence
    attribution, bucket arithmetic, and all three cumulative sums
    value-checked.

    Scale: one token min-id shuffle; every window runs over the
    bucket-cardinality frame (text.vocab_growth docstring)."""
    docs = _t_spread(spark, sf_dir, "documents")
    return text.vocab_growth(docs, bucket_width=_VG_WIDTH)


# =============================================================================
# Deterministic Euclidean k-means (full Lloyd trajectory replayed in SQL)
# =============================================================================

_KM_K = 4
_KM_ITERS = 3
_KM_DIM = 64
_KM_DP = 6


def _kmeans_ctes(k: int, iters: int, dim: int, dp: int) -> str:
    """Generate the unrolled Lloyd-iteration CTE chain ending in
    ``afinal(vec_id, c)``: seeds = the k lowest-id vectors (rounded),
    each iteration = argmin assignment (ties to lower cluster id) +
    per-dimension rounded means (empty clusters keep the previous
    centroid via COALESCE). Shared by the kmeans and
    cluster-balanced-sample oracles — ONE replay of the trajectory."""
    dist = (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        f"j -> (v[j] - cv[j]) * (v[j] - cv[j])))"
    )
    ctes = [
        "v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
        "FROM embeddings WHERE embedding IS NOT NULL)",
        f"c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS c, "
        f"list_transform(v, x -> ROUND(x, {dp})) AS cv "
        f"FROM v ORDER BY vec_id LIMIT {k})",
    ]
    for i in range(iters):
        ctes.append(
            f"a{i} AS (SELECT vec_id, v, c FROM ("
            f"SELECT vec_id, v, c, ROW_NUMBER() OVER "
            f"(PARTITION BY vec_id ORDER BY d, c) AS rn FROM ("
            f"SELECT vec_id, v, c, cv, {dist} AS d FROM v CROSS JOIN c{i})) "
            f"WHERE rn = 1)"
        )
        ctes.append(
            f"c{i + 1} AS (SELECT s.c, COALESCE(u.cv, s.cv) AS cv FROM c{i} s "
            f"LEFT JOIN (SELECT c, list(ROUND(m, {dp}) ORDER BY j) AS cv FROM ("
            f"SELECT c, j, AVG(v[j]) AS m FROM a{i}, "
            f"LATERAL UNNEST(generate_series(1, {dim})) AS t(j) "
            f"GROUP BY c, j) GROUP BY c) u ON s.c = u.c)"
        )
    ctes.append(
        f"afinal AS (SELECT vec_id, c FROM (SELECT vec_id, c, ROW_NUMBER() OVER "
        f"(PARTITION BY vec_id ORDER BY d, c) AS rn FROM ("
        f"SELECT vec_id, c, {dist} AS d FROM v CROSS JOIN c{iters})) "
        f"WHERE rn = 1)"
    )
    return ",\n".join(ctes)


@query(
    "q_kmeans_clusters",
    f"""WITH {_kmeans_ctes(_KM_K, _KM_ITERS, _KM_DIM, _KM_DP)}
    SELECT e.vec_id, a.c AS cluster
    FROM embeddings e LEFT JOIN afinal a USING (vec_id)""",
)
def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Euclidean k-means over the embedding corpus
    (k={0}, {1} Lloyd iterations, seeds = lowest-id vectors): the
    oracle re-derives EVERY iteration — seed rounding, every distance,
    every argmin tiebreak, every rounded centroid mean — so the final
    assignment of every vector is value-checked, a strictly stronger
    guarantee than the IVF family's recall checks. Per-iteration
    centroid rounding to {2} decimals is what makes cross-engine float
    parity exact (similarity.kmeans docstring).

    Scale: centroids are driver metadata; per iteration one narrow
    argmin pass + one k-row partial agg."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.kmeans(emb, k=_KM_K, iters=_KM_ITERS)


# =============================================================================
# Gumbel-top-k importance resampling (the selection half of DSIR)
# =============================================================================

_RS_K = 100

# dsir_weights' whole CTE chain is reused verbatim (ONE definition above,
# via the oracle string of q_dsir_weights up to `agg`) — the resample
# oracle extends it with the deterministic gumbel key + top-k
_SQL_DSIR_CTES = STAGED_ORACLES["q_dsir_weights"].split("SELECT d.doc_id")[0].rstrip().rstrip(",")


@query(
    "q_dsir_resample",
    f"""
    {_SQL_DSIR_CTES},
    keyed AS (
      SELECT doc_id, n_grams, dsir_weight,
             ROUND(dsir_weight / 1.0
                   + -ln(-ln((({_SQL_HASH60.format(t="doc_id::VARCHAR || 'e0'")}) + 0.5) / 1152921504606846976.0)),
                   6) AS resample_key
      FROM agg WHERE dsir_weight IS NOT NULL)
    SELECT doc_id, dsir_weight, resample_key
    FROM keyed ORDER BY resample_key DESC, doc_id LIMIT {_RS_K}
    """,
)
def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full DSIR selection pipeline: hashed-feature importance
    weights → gumbel-top-k resampling (k={0}, salt 'e0') — the oracle
    replays the weight model AND every deterministic gumbel draw
    (u from the doc's own 60-bit hash), so the exact selected set and
    every selection key are value-checked.

    Scale: the weights pass (corpus.dsir_weights) + a narrow key
    computation + ONE top-k (corpus.dsir_resample docstring)."""
    docs = _t_spread(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == "src0")
    w = corpus.dsir_weights(docs, target, n_buckets=_DSIR_BUCKETS)
    return corpus.dsir_resample(w, k=_RS_K, salt="e0").select(
        "doc_id", "dsir_weight", "resample_key"
    )


# =============================================================================
# Best-fit-decreasing packing (open-bin state replayed as a recursive CTE)
# =============================================================================

_BF_BUDGET = 512
_BF_SHARDS = 8


def _best_fit_oracle(budget: int, n_shards: int) -> str:
    """Replay pack_best_fit's sequential bin state in SQL: items in
    (len desc, id) order per shard; the recursion carries the open-pack
    remaining-room LIST, choosing min-(room, index) among fitting packs
    (exactly the operator's least-room/lowest-id tiebreak); a new pack
    opens when none fits, with room -1 (never fits again) for oversized
    singletons."""
    return f"""
    WITH RECURSIVE lens AS (
      SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS nt,
             {_SQL_HASH60.format(t='doc_id::VARCHAR')} % {n_shards} AS shard
      FROM documents),
    seq AS (
      SELECT shard, doc_id, nt,
             ROW_NUMBER() OVER (PARTITION BY shard ORDER BY nt DESC, doc_id) AS rn
      FROM lens),
    bounds AS (SELECT shard, MAX(rn) AS mx FROM seq GROUP BY shard),
    rec AS (
      SELECT shard, CAST(0 AS BIGINT) AS rn,
             CAST([] AS BIGINT[]) AS room, CAST([] AS BIGINT[]) AS assign
      FROM bounds
      UNION ALL
      SELECT r.shard, r.rn + 1,
             CASE WHEN best.pos IS NULL
                  THEN list_append(r.room,
                       CASE WHEN s.nt > {budget} THEN -1 ELSE {budget} - s.nt END)
                  ELSE list_transform(generate_series(1, len(r.room)),
                       z -> CASE WHEN z = best.pos THEN r.room[z] - s.nt
                            ELSE r.room[z] END)
             END,
             list_append(r.assign,
                         COALESCE(best.pos, len(r.room) + 1))
      FROM rec r
      JOIN seq s ON s.shard = r.shard AND s.rn = r.rn + 1
      LEFT JOIN LATERAL (
        SELECT list_sort(list_filter(
                 list_transform(generate_series(1, len(r.room)),
                                z -> {{'rm': r.room[z], 'pos': z}}),
                 x -> x.rm >= s.nt))[1].pos AS pos
      ) best ON TRUE),
    final AS (
      SELECT r.shard, u.j AS rn, CAST(u.p AS BIGINT) AS p
      FROM rec r JOIN bounds b ON r.shard = b.shard AND r.rn = b.mx,
           LATERAL (SELECT UNNEST(r.assign) AS p,
                           generate_subscripts(r.assign, 1) AS j) u)
    SELECT s.doc_id, s.nt AS n_tokens,
           CAST(s.shard * 4294967296 + (f.p - 1) AS BIGINT) AS pack_id
    FROM seq s JOIN final f ON s.shard = f.shard AND s.rn = f.rn
    """


@query("q_pack_best_fit", _best_fit_oracle(_BF_BUDGET, _BF_SHARDS))
def q_pack_best_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-fit-decreasing packing of the corpus on REAL token counts
    (budget {0}, {1} shards): the oracle replays the whole sequential
    bin-state machine — (len desc, id) order, least-room/lowest-id
    placement, oversized singleton closure — as a recursive CTE
    carrying the open-pack room list, so EVERY document's pack
    assignment is value-checked.

    Scale: one shard shuffle + per-shard sequential Arrow pass
    (corpus.pack_best_fit docstring)."""
    docs = _t(spark, sf_dir, "documents")
    lens = docs.select(
        "doc_id",
        F.size(text.tokens("text")).cast("long").alias("n_tokens"),
    )
    packed = corpus.pack_best_fit(
        lens, "doc_id", "n_tokens", budget=_BF_BUDGET, n_shards=_BF_SHARDS
    )
    return packed.select("doc_id", "n_tokens", "pack_id")


# =============================================================================
# Cluster-balanced sampling (k-means strata × exactly-k selection)
# =============================================================================

_CBS_K = 25


@query(
    "q_cluster_balanced_sample",
    f"""WITH {_kmeans_ctes(_KM_K, _KM_ITERS, _KM_DIM, _KM_DP)},
    joined AS (
      SELECT d.doc_id, a.c AS cluster
      FROM documents d JOIN afinal a ON d.doc_id = a.vec_id)
    SELECT doc_id, cluster FROM (
      SELECT doc_id, cluster,
             ROW_NUMBER() OVER (
               PARTITION BY cluster
               ORDER BY ('0x' || substr(md5(COALESCE(CAST(doc_id AS VARCHAR),
                 '__null__') || 'cb0'), 1, 15))::BIGINT, doc_id
             ) AS rk
      FROM joined)
    WHERE rk <= {_CBS_K}
    """,
)
def q_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced corpus sample: k-means strata over the embedding
    space (k={0}, the SAME replayed Lloyd trajectory as
    q_kmeans_clusters — one `_kmeans_ctes` definition feeds both
    oracles) × exactly {1} docs per cluster by keyed-hash order — the
    unlabeled-axis balancing an eval-set builder needs. Every cluster
    assignment AND every selection is value-checked.

    Scale: k-means driver metadata loop + one narrow assignment join +
    one shuffle on the cluster id (corpus.cluster_balanced_sample
    docstring)."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    return corpus.cluster_balanced_sample(
        docs, emb, k_per_cluster=_CBS_K, n_clusters=_KM_K, iters=_KM_ITERS,
        salt="cb0",
    ).select("doc_id", "cluster")


# =============================================================================
# CCNet perplexity buckets (per-language head/middle/tail quality tiers)
# =============================================================================

# the unigram-LM CTE chain is reused verbatim from q_unigram_logprob
# (ONE definition — a model change can never update only one replay)
_SQL_LM_CTES = STAGED_ORACLES["q_unigram_logprob"].split("SELECT d.doc_id")[0].rstrip().rstrip(",")


@query(
    "q_perplexity_buckets",
    f"""
    {_SQL_LM_CTES},
    scored AS (
      SELECT d.doc_id, d.lang, a.avg_logprob
      FROM documents d LEFT JOIN agg a USING (doc_id))
    SELECT doc_id, lang, avg_logprob,
           CASE WHEN avg_logprob IS NULL THEN NULL
                ELSE CAST(FLOOR(
                  (ROW_NUMBER() OVER (
                     PARTITION BY lang,
                       CASE WHEN avg_logprob IS NULL THEN 1 ELSE 0 END
                     ORDER BY avg_logprob DESC, doc_id) - 1) * 3.0
                  / COUNT(*) OVER (
                     PARTITION BY lang,
                       CASE WHEN avg_logprob IS NULL THEN 1 ELSE 0 END)
                ) AS INT) END AS ppl_bucket
    FROM scored
    """,
)
def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: every document dealt into
    head/middle/tail (3 equal-count buckets) by LM log-probability rank
    WITHIN its language — the oracle replays the LM fit (the SAME CTE
    chain as q_unigram_logprob), every score, and the rank-to-bucket
    arithmetic, so each doc's quality tier is value-checked.

    Scale: the unigram_logprob cost + ONE shuffle on lang with
    per-language windows (text.perplexity_buckets docstring)."""
    docs = _t_spread(spark, sf_dir, "documents")
    return text.perplexity_buckets(docs, group_col="lang", n_buckets=3).select(
        "doc_id", "lang", "avg_logprob", "ppl_bucket"
    )


# =============================================================================
# Distributed BPE merge training (the FULL training loop replayed in SQL)
# =============================================================================

_BPE_N = 12


def _bpe_ctes(n_merges: int) -> str:
    """Replay the ENTIRE BPE training loop as one recursive CTE whose
    single-row state carries every word's symbol string: per iteration,
    weighted adjacent-pair counts via nested list lambdas, the argmax
    pair by (count desc, pair lexicographic) struct-sort, and the merge
    applied by ONE string replace. Two encoding tricks make it exact:
    symbols join on a DOUBLE \\x1f separator, so the merge pattern
    ``\\x1f a \\x1f\\x1f b \\x1f`` consumes one separator from each side
    — symbol-level occurrences stay disjoint in the string and a single
    left-to-right non-overlapping replace IS the engine's fold; and
    pairs dedupe as \\x1f-joined strings (list_distinct can't hash
    structs). Caveat shared with the engine: tokens must not contain
    \\x1f (not a whitespace char, so tokenization leaves it — absent
    from any real corpus)."""
    s, d = "\x1f", "\x1f\x1f"
    return f"""
    WITH RECURSIVE words0 AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT UNNEST({_TOKS}) AS word FROM documents)
      GROUP BY word),
    init AS (
      SELECT list({{'o': word, 'w': '{d}' || array_to_string(list_append(regexp_split_to_array(word, ''), '</w>'), '{d}') || '{d}', 'c': cnt}}) AS ws
      FROM words0),
    rec AS (
      SELECT 0 AS it, (SELECT ws FROM init) AS ws,
             CAST([] AS STRUCT(a VARCHAR, b VARCHAR, cnt BIGINT)[]) AS ms
      UNION ALL
      SELECT it + 1,
             list_transform(ws, wc -> {{
               'o': wc.o,
               'w': replace(wc.w, '{s}' || best.a || '{d}' || best.b || '{s}',
                            '{s}' || best.a || best.b || '{s}'),
               'c': wc.c}}),
             list_append(ms, best)
      FROM (
        SELECT it, ws, ms,
               CASE WHEN b0.negc IS NULL THEN NULL
                    ELSE {{'a': string_split(b0.p, '{s}')[1],
                          'b': string_split(b0.p, '{s}')[2],
                          'cnt': -b0.negc}} END AS best
        FROM (
          SELECT it, ws, ms,
                 list_sort(list_transform(
                   list_distinct(list_transform(pw, x -> x.p)),
                   p -> {{'negc': -list_sum(list_transform(pw, x ->
                            CASE WHEN x.p = p THEN x.c ELSE 0 END)),
                         'p': p}}))[1] AS b0
          FROM (
            SELECT it, ws, ms,
                   flatten(list_transform(ws, wc ->
                     list_transform(generate_series(1, len(list_filter(string_split(wc.w, '{d}'), y -> y <> '')) - 1),
                       i -> {{'p': list_filter(string_split(wc.w, '{d}'), y -> y <> '')[i] || '{s}'
                                 || list_filter(string_split(wc.w, '{d}'), y -> y <> '')[i + 1],
                             'c': wc.c}}))) AS pw
            FROM rec WHERE it < {n_merges}))
      ) WHERE best IS NOT NULL
    )"""


_BPE_TRAIN_TAIL = """
    SELECT CAST(u.rank AS BIGINT) AS rank, u.m.a AS left_sym,
           u.m.b AS right_sym, u.m.cnt AS pair_count
    FROM (SELECT ms FROM rec ORDER BY it DESC LIMIT 1) r,
         LATERAL (SELECT UNNEST(r.ms) AS m, generate_subscripts(r.ms, 1) AS rank) u
    ORDER BY rank
    """


@query("q_train_bpe", _bpe_ctes(_BPE_N) + _BPE_TRAIN_TAIL)
def q_train_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge training over the corpus ({0} merges): the
    oracle replays the ENTIRE training loop — word counting, every
    iteration's weighted pair counts, every (count desc, lexicographic)
    argmax, every left-to-right merge application — so the merge table
    (THE tokenizer artifact) is value-checked rank by rank, pair by
    pair, count by count. The iterative-algorithm companion to
    q_kmeans_clusters' unrolled replay: here the recursion carries the
    full segmented-word state.

    Scale: the corpus is scanned once (word counts); each of the {0}
    merge iterations runs on the vocabulary-sized word table only
    (text.train_bpe docstring). The merge list itself is metadata
    ({0} rows) — building the result frame from the driver-held list is
    the attrition_report pattern."""
    docs = _t_spread(spark, sf_dir, "documents")
    merges, _ = text.train_bpe(docs, n_merges=_BPE_N)
    rows = [(i + 1, a, b, cnt) for i, (a, b, cnt) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank long, left_sym string, right_sym string, pair_count long"
    )


@query(
    "q_bpe_segment",
    _bpe_ctes(_BPE_N)
    + """,
    wmap AS (
      SELECT u.wc.o AS word,
             list_filter(string_split(u.wc.w, chr(31) || chr(31)), y -> y <> '')
               AS pieces
      FROM (SELECT ws FROM rec ORDER BY it DESC LIMIT 1) r,
           LATERAL (SELECT UNNEST(r.ws) AS wc) u),
    toks AS (
      SELECT doc_id, UNNEST(arr) AS word, generate_subscripts(arr, 1) AS pos
      FROM (SELECT doc_id, """
    + _TOKS
    + """ AS arr FROM documents)),
    per_doc AS (
      SELECT t.doc_id,
             md5(array_to_string(flatten(list(m.pieces ORDER BY t.pos)), ' '))
               AS pieces_digest,
             CAST(SUM(len(m.pieces)) AS BIGINT) AS n_pieces
      FROM toks t JOIN wmap m ON t.word = m.word
      GROUP BY t.doc_id)
    SELECT d.doc_id,
           COALESCE(p.pieces_digest, md5('')) AS pieces_digest,
           CAST(COALESCE(p.n_pieces, 0) AS BIGINT) AS n_pieces
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
)
def q_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE inference over the corpus with the merges trained on it: each
    document's subword piece stream, shipped as an md5 digest of the
    space-joined pieces + the piece count (driver-hashable; pieces
    contain no spaces by construction). The oracle replays the SAME
    training recursion as q_train_bpe (one `_bpe_ctes` definition feeds
    both) and maps every document's token sequence through the final
    segmented word table — so training AND inference are value-checked
    at every position. Tokenless docs digest the empty string.

    Scale: the train cost + one posexplode + one broadcastable
    word-table join + one in-aggregate ordered rebuild per doc — the
    encode_tokens plan shape with BPE pieces instead of vocab ids."""
    docs = _t_spread(spark, sf_dir, "documents")
    merges, words = text.train_bpe(docs, n_merges=_BPE_N)
    toks = docs.select(
        F.col("doc_id"),
        F.posexplode_outer(
            text.tokens(F.coalesce(F.col("text"), F.lit("")))
        ).alias("pos", "word"),
    )
    joined = toks.join(words.select("word", "syms"), "word", "left")
    per_doc = (
        joined.filter(F.col("word").isNotNull())
        .groupBy("doc_id")
        .agg(
            F.md5(
                F.array_join(
                    F.flatten(
                        F.transform(
                            F.array_sort(
                                F.collect_list(
                                    F.struct(F.col("pos"), F.col("syms"))
                                )
                            ),
                            lambda s: s["syms"],
                        )
                    ),
                    " ",
                )
            ).alias("pieces_digest"),
            F.sum(F.size("syms")).cast("long").alias("n_pieces"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("pieces_digest"), F.md5(F.lit(""))).alias(
                "pieces_digest"
            ),
            F.coalesce(F.col("n_pieces"), F.lit(0).cast("long")).alias(
                "n_pieces"
            ),
        )
    )


# A '"""...""".format(...)' first statement is an expression, not a
# string literal, so __doc__ was None (ADVICE r13, fixed repo-wide r14).
# The docstrings above are plain literals; interpolate their geometry
# constants here, after definition.
q_dsir_weights.__doc__ = q_dsir_weights.__doc__.format(_DSIR_BUCKETS)
q_vocab_growth.__doc__ = q_vocab_growth.__doc__.format(_VG_WIDTH)
q_kmeans_clusters.__doc__ = q_kmeans_clusters.__doc__.format(_KM_K, _KM_ITERS, _KM_DP)
q_dsir_resample.__doc__ = q_dsir_resample.__doc__.format(_RS_K)
q_pack_best_fit.__doc__ = q_pack_best_fit.__doc__.format(_BF_BUDGET, _BF_SHARDS)
q_cluster_balanced_sample.__doc__ = q_cluster_balanced_sample.__doc__.format(_KM_K, _CBS_K)
q_train_bpe.__doc__ = q_train_bpe.__doc__.format(_BPE_N)
