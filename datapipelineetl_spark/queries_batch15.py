"""Fifteenth query battery — STAGED for the next verify window.

Round-8 additions: the probabilistic-sketch surface
(``operators/sketch.py`` — count-min frequency estimation, HyperLogLog
distinct counting, Bloom-filter decontamination) plus interpolated
bigram language-model scoring (``text.bigram_logprob``). Every hash in
the sketches is an md5 hex-slice, so the oracles rebuild the SAME
counters / registers / bit positions in SQL and the comparison pins
the sketch contents — including collisions and false positives —
rather than a tolerance band around the estimate.

Same staging contract as batches 11–14: separate dicts so importing
this module cannot grow the live ``queries()`` surface mid-round;
``tests/test_corpus_oracles.py`` runs the driver-style comparison
locally; ``register()`` promotes them when a future window has slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelineetl_spark.operators import sketch, text
from datapipelineetl_spark.queries import _t_spread
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
    """Promote the staged queries into the live registry (call from
    __spark_entry__ next to the earlier batch registers, then give
    them window slots)."""
    _GLOBAL_QUERIES.update(STAGED_QUERIES)
    _GLOBAL_ORACLES.update(STAGED_ORACLES)


_TOKS = _SQL_TOKENS.format(c="text")


def _sql_shingles(n: int) -> str:
    # text.shingles replay (same fragment as queries_batch11)
    return (
        f"list_transform(generate_series(0, GREATEST(len(toks) - {n}, 0)), "
        f"i -> array_to_string(list_slice(toks, i + 1, i + {n}), ' '))"
    )


# =============================================================================
# count-min sketch (Cormode & Muthukrishnan 2005)
# =============================================================================

_CM_DEPTH, _CM_WIDTH = 3, 64
_SQL_CM_ROWS = "(SELECT UNNEST([0, 1, 2]) AS r)"
_SQL_CM_BUCKET = (
    "('0x' || substr(md5(CAST({r} AS VARCHAR) || ':' || {t}), 1, 15))::BIGINT"
    f" % {_CM_WIDTH}"
)


@query(
    "q_countmin_counts",
    f"""
    WITH toks AS (SELECT UNNEST({_TOKS}) AS tok FROM documents),
    cnts AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS true_count
      FROM toks GROUP BY tok),
    top AS (
      SELECT tok, true_count FROM cnts
      ORDER BY true_count DESC, tok LIMIT 20),
    cells AS (
      SELECT rr.r AS row, {_SQL_CM_BUCKET.format(r='rr.r', t='t.tok')} AS bucket
      FROM toks t, {_SQL_CM_ROWS} rr),
    sk AS (
      SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM cells GROUP BY row, bucket),
    est AS (
      SELECT p.tok, MIN(COALESCE(s.cnt, 0)) AS cm
      FROM (SELECT t2.tok, rr.r AS row,
                   {_SQL_CM_BUCKET.format(r='rr.r', t='t2.tok')} AS bucket
            FROM top t2, {_SQL_CM_ROWS} rr) p
      LEFT JOIN sk s ON p.row = s.row AND p.bucket = s.bucket
      GROUP BY p.tok)
    SELECT top.tok AS token, top.true_count,
           CAST(est.cm AS BIGINT)                  AS cm_count,
           CAST(est.cm - top.true_count AS BIGINT) AS overcount
    FROM top JOIN est ON top.tok = est.tok
    """,
)
def q_countmin_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation: the corpus token stream
    folded into a 3x64 counter grid, then the top-20 tokens' estimates
    read back against their true counts. The oracle rebuilds the SAME
    grid (every md5 row-hash replayed), so the estimates — including
    each bucket collision's exact overcount — are value-checked, not
    tolerance-banded. CM guarantees estimate >= truth; ``overcount``
    makes the collision inflation visible.

    Scale: the grid build is one explode + ONE partial-aggregated
    shuffle bounded by depth*width per partition (operators/sketch.py
    countmin_sketch docstring); the probe side is 20 rows joined
    against the broadcast metadata-sized grid."""
    docs = _t_spread(spark, sf_dir, "documents")
    sk = sketch.countmin_sketch(docs, depth=_CM_DEPTH, width=_CM_WIDTH)
    true = (
        docs.select(F.explode_outer(text.tokens("text")).alias("token"))
        .filter(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    top = true.orderBy(F.desc("true_count"), "token").limit(20)
    est = sketch.countmin_estimate(
        sk, top.select("token"), depth=_CM_DEPTH, width=_CM_WIDTH
    )
    return top.join(est, "token").select(
        "token",
        "true_count",
        F.col("cm_count").cast("long").alias("cm_count"),
        (F.col("cm_count") - F.col("true_count")).cast("long").alias("overcount"),
    )


# =============================================================================
# HyperLogLog (Flajolet et al. 2007)
# =============================================================================

_HLL_M, _HLL_B = 64, 6
_HLL_W = 60 - _HLL_B
_HLL_ALPHA_M2 = 0.7213 / (1 + 1.079 / _HLL_M) * _HLL_M * _HLL_M
_HLL_POW = float(2 ** (_HLL_W + 1))


def _sql_hll(items_cte: str, grain: str) -> str:
    """Full HLL replay for one grain: ``items_cte`` must yield
    (source, it) rows. Harmonic numerator kept as an exact BIGINT sum
    of powers of two (matches the engine's float-order-proof design);
    every float literal is ::DOUBLE (DuckDB bare decimals are DECIMAL,
    whose arithmetic diverges from IEEE). NULL items are filtered
    explicitly — the engine's hll_registers filters isNotNull, and a
    NULL-text document would otherwise feed a phantom NULL register
    into COUNT(*) here (latent on this fixture, which has no NULL
    text, but the oracle must not depend on that)."""
    items_cte = f"SELECT * FROM ({items_cte}) WHERE it IS NOT NULL"
    return f"""
    SELECT source, '{grain}' AS grain,
           CAST(COUNT(DISTINCT it) AS BIGINT) AS true_distinct,
           CAST({_HLL_M} - n_present AS INT) AS n_empty_buckets,
           ROUND(CASE WHEN ({_HLL_ALPHA_M2!r}::DOUBLE /
                            ((num / {_HLL_POW!r}::DOUBLE) + ({_HLL_M} - n_present)))
                           <= {2.5 * _HLL_M!r}::DOUBLE
                       AND n_present < {_HLL_M}
                 THEN {float(_HLL_M)!r}::DOUBLE *
                      ln({float(_HLL_M)!r}::DOUBLE / ({_HLL_M} - n_present))
                 ELSE {_HLL_ALPHA_M2!r}::DOUBLE /
                      ((num / {_HLL_POW!r}::DOUBLE) + ({_HLL_M} - n_present))
                 END, 2) AS hll_estimate
    FROM (
      SELECT source, COUNT(*) AS n_present,
             SUM(1::BIGINT << ({_HLL_W + 1} - reg)) AS num
      FROM (
        SELECT source, bucket, MAX(rho) AS reg
        FROM (
          SELECT source, h % {_HLL_M} AS bucket,
                 CASE WHEN (h >> {_HLL_B}) = 0 THEN {_HLL_W + 1}
                      ELSE {_HLL_W + 1} - length(bin(h >> {_HLL_B})) END AS rho
          FROM (SELECT source,
                       ('0x' || substr(md5(it), 1, 15))::BIGINT AS h
                FROM ({items_cte})))
        GROUP BY source, bucket)
      GROUP BY source) folded
    JOIN ({items_cte}) USING (source)
    GROUP BY source, n_present, num
    """


@query(
    "q_hll_distinct",
    f"""
    WITH toks AS (SELECT source, {_TOKS} AS toks FROM documents)
    {_sql_hll("SELECT source, UNNEST(toks) AS it FROM toks", "token")}
    UNION ALL
    {_sql_hll(f"SELECT source, UNNEST({_sql_shingles(3)}) AS it FROM toks",
              "3gram")}
    """,
)
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct counting per source at two grains: unigram
    vocabulary (low cardinality — exercises the small-range
    linear-counting correction) and distinct 3-gram phrases (high
    cardinality — exercises the raw bias-corrected harmonic branch).
    The oracle rebuilds every register (bucket, max-rank) from the
    same md5 hashes and replays the full estimator, so BOTH correction
    branches are value-checked to 2 decimals, alongside the true
    distinct count for context.

    Scale: one partial-aggregated shuffle on (source, bucket) — at
    most m=64 partial registers per group per partition cross the
    exchange regardless of corpus size (operators/sketch.py
    hll_distinct docstring). The true count here is for the oracle's
    demonstration; production uses the sketch precisely to avoid it."""
    docs = _t_spread(spark, sf_dir, "documents")

    def one(grain: str, ngram: int) -> DataFrame:
        items = (
            text.tokens("text") if ngram == 1 else text.shingles("text", ngram)
        )
        true = (
            docs.select("source", F.explode_outer(items).alias("__it"))
            .filter(F.col("__it").isNotNull())
            .groupBy("source")
            .agg(F.countDistinct("__it").alias("true_distinct"))
        )
        est = sketch.hll_distinct(docs, "source", "text", m=_HLL_M, ngram=ngram)
        return true.join(est, "source").select(
            "source",
            F.lit(grain).alias("grain"),
            "true_distinct",
            "n_empty_buckets",
            "hll_estimate",
        )

    return one("token", 1).unionAll(one("3gram", 3))


# =============================================================================
# Bloom-filter decontamination (Bloom 1970)
# =============================================================================

_BLOOM_K, _BLOOM_HW = 2, 4  # 2 hashes x 16-bit slices -> m = 2^16


def _sql_bloom_pos(g: str, j: int) -> str:
    return (
        f"('0x' || substr(md5({g}), {1 + _BLOOM_HW * j}, {_BLOOM_HW}))::BIGINT"
    )


@query(
    "q_bloom_decontam",
    # COALESCE(text, ''): the engine side coalesces NULL text to the ""
    # gram (sketch._distinct_grams) — the oracle must shingle the same
    # way or a NULL-text doc diverges (latent on this fixture)
    f"""
    WITH toks AS (SELECT doc_id, source,
                         {_SQL_TOKENS.format(c="COALESCE(text, '')")} AS toks
                  FROM documents),
    grams AS (
      SELECT doc_id, source, UNNEST(list_distinct({_sql_shingles(8)})) AS g
      FROM toks),
    bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src0'),
    bpos AS (
      SELECT DISTINCT p FROM (
        SELECT {_sql_bloom_pos('g', 0)} AS p FROM bench
        UNION ALL
        SELECT {_sql_bloom_pos('g', 1)} FROM bench)),
    corp AS (SELECT doc_id, g FROM grams WHERE source <> 'src0'),
    hits AS (
      SELECT doc_id, g FROM corp
      WHERE {_sql_bloom_pos('g', 0)} IN (SELECT p FROM bpos)
        AND {_sql_bloom_pos('g', 1)} IN (SELECT p FROM bpos)),
    per AS (
      SELECT c.doc_id,
             CAST(COUNT(*) AS INT) AS n_grams,
             CAST(SUM(CASE WHEN h.g IS NOT NULL THEN 1 ELSE 0 END) AS INT)
               AS n_bloom_hits,
             MAX(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS exact_c
      FROM corp c
      LEFT JOIN hits h ON c.doc_id = h.doc_id AND c.g = h.g
      LEFT JOIN bench b ON c.g = b.g
      GROUP BY c.doc_id)
    SELECT doc_id, n_grams, n_bloom_hits,
           CAST(CASE WHEN n_bloom_hits > 0 THEN 1 ELSE 0 END AS INT)
             AS bloom_contaminated,
           CAST(exact_c AS INT) AS exact_contaminated,
           CAST(CASE WHEN n_bloom_hits > 0 AND exact_c = 0 THEN 1 ELSE 0 END
                AS INT) AS bloom_false_positive
    FROM per
    """,
)
def q_bloom_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter benchmark decontamination, side by side with the
    exact join it approximates: src0 is the held-out benchmark, every
    other source the training corpus; a document is Bloom-contaminated
    when any of its distinct word 8-grams hits all k=2 bit positions
    of the benchmark bitset. The filter here is deliberately SMALL
    (m = 2^16 via 4-hex md5 slices) so false positives occur at test
    scale — and because the positions are deterministic md5 slices the
    oracle replays the bitset and reproduces every false positive
    bit-for-bit. ``exact_contaminated`` (gram-string semi-join) pins
    the no-false-negative guarantee; ``bloom_false_positive`` makes
    the precision tradeoff a checked column instead of prose.

    Scale: this is the map-only decontamination path — the corpus side
    never shuffles (narrow gram/position math + one Arrow-batched bit
    test against the broadcast bitset); only the exact-comparison
    column adds the gram join, which production omits
    (operators/sketch.py bloom_flag_contaminated docstring). The
    bitset build collects only the benchmark's distinct positions
    (eval-set-sized)."""
    docs = _t_spread(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    corp = docs.filter(F.col("source") != "src0")
    bits = sketch.build_bloom_bitset(
        bench, n=8, k=_BLOOM_K, hex_width=_BLOOM_HW
    )
    flagged = sketch.bloom_flag_contaminated(
        corp, bits, n=8, k=_BLOOM_K, hex_width=_BLOOM_HW
    )

    def grams_of(df: DataFrame, *cols: str) -> DataFrame:
        # same NULL-text coalesce as the bloom side (_distinct_grams):
        # the exact-comparison column must shingle identically
        return df.select(
            *cols,
            F.explode_outer(
                F.array_distinct(
                    text.shingles(F.coalesce(F.col("text"), F.lit("")), 8)
                )
            ).alias("__g"),
        ).filter(F.col("__g").isNotNull())

    bench_g = grams_of(bench).distinct()
    exact = (
        grams_of(corp, "doc_id")
        .join(bench_g, "__g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("__exact", F.lit(1))
    )
    return (
        flagged.join(exact, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            "n_bloom_hits",
            "bloom_contaminated",
            F.coalesce(F.col("__exact"), F.lit(0)).cast("int").alias(
                "exact_contaminated"
            ),
            (
                (F.col("bloom_contaminated") == 1)
                & F.col("__exact").isNull()
            ).cast("int").alias("bloom_false_positive"),
        )
    )


# =============================================================================
# Interpolated bigram language model
# =============================================================================

@query(
    "q_bigram_logprob",
    f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS arr FROM documents),
    toks AS (
      SELECT doc_id, arr[u.i] AS tok,
             CASE WHEN u.i > 1 THEN arr[u.i - 1] END AS prev
      FROM d, UNNEST(generate_series(1, len(arr))) AS u(i)),
    uni AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS ucnt FROM toks GROUP BY tok),
    tot AS (
      SELECT COALESCE(SUM(ucnt), 0) AS total, COUNT(*) AS vocab FROM uni),
    big AS (
      SELECT prev, tok, CAST(COUNT(*) AS BIGINT) AS bcnt
      FROM toks WHERE prev IS NOT NULL GROUP BY prev, tok),
    ctx AS (
      SELECT prev, CAST(COUNT(*) AS BIGINT) AS ccnt
      FROM toks WHERE prev IS NOT NULL GROUP BY prev),
    lp AS (
      SELECT t.doc_id,
             ln(CASE WHEN t.prev IS NULL THEN
                  (COALESCE(u.ucnt, 0) + 0.5::DOUBLE)
                    / (tot.total + 0.5::DOUBLE * (tot.vocab + 1))
                ELSE
                  0.7::DOUBLE * (COALESCE(b.bcnt, 0) / c.ccnt)
                  + (1.0::DOUBLE - 0.7::DOUBLE) *
                    ((COALESCE(u.ucnt, 0) + 0.5::DOUBLE)
                      / (tot.total + 0.5::DOUBLE * (tot.vocab + 1)))
                END) AS lp
      FROM toks t
      LEFT JOIN uni u ON t.tok = u.tok
      LEFT JOIN big b ON t.prev = b.prev AND t.tok = b.tok
      LEFT JOIN ctx c ON t.prev = c.prev
      CROSS JOIN tot),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             ROUND(AVG(lp), 5) AS avg_logprob
      FROM lp GROUP BY doc_id)
    SELECT d2.doc_id, CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
           a.avg_logprob
    FROM documents d2 LEFT JOIN agg a USING (doc_id)
    """,
)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM scoring (the n-gram step above
    q_unigram_logprob toward CCNet's KenLM filters): per token,
    0.7 x bigram MLE + 0.3 x add-0.5 unigram, first tokens backing off
    to the unigram model. The oracle refits the full model — bigram,
    context, and unigram counts plus totals — and replays every
    interpolated probability, value-checked to 5 decimals.

    Scale: (prev, tok) pairs are per-row ARRAY math (no window
    shuffle); count fits are bigram-vocabulary-bounded partial-agg
    shuffles; scoring is three broadcastable dimension joins + one
    groupBy(doc). 1-row totals crossJoin on the lint allowlist
    (text.bigram_logprob docstring)."""
    docs = _t_spread(spark, sf_dir, "documents")
    return text.bigram_logprob(docs, lam=0.7, alpha=0.5)


# =============================================================================
# PMI phrase detection (Mikolov et al. 2013 phrase-collocation scoring)
# =============================================================================

@query(
    "q_pmi_bigrams",
    f"""
    WITH toksarr AS (SELECT {_TOKS} AS toks FROM documents),
    uni AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT UNNEST(toks) AS w FROM toksarr) GROUP BY w),
    bigs AS (
      SELECT bg FROM (SELECT UNNEST({_sql_shingles(2)}) AS bg FROM toksarr)
      WHERE contains(bg, ' ')),
    big AS (
      SELECT bg, split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2,
             CAST(COUNT(*) AS BIGINT) AS c12
      FROM bigs GROUP BY bg HAVING COUNT(*) >= 5),
    tot AS (
      SELECT (SELECT SUM(c) FROM uni) AS t1,
             (SELECT COUNT(*) FROM bigs) AS t2)
    SELECT b.w1, b.w2, b.c12 AS pair_count,
           ROUND(ln((b.c12 / tot.t2) /
                    ((u1.c / tot.t1) * (u2.c / tot.t1))), 5) AS pmi
    FROM big b
    JOIN uni u1 ON b.w1 = u1.w
    JOIN uni u2 ON b.w2 = u2.w
    CROSS JOIN tot
    ORDER BY pmi DESC, b.w1, b.w2
    LIMIT 20
    """,
)
def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI phrase detection: top-20 word bigrams whose joint
    probability beats independence (word2vec-style collocation
    scoring), min pair count 5. The oracle refits both count tables
    and replays every log-ratio; ranking is on the ROUNDED score with
    lexicographic tiebreak (the extract_keywords cross-engine rank
    discipline), so the top-k set is deterministic on both engines.

    Scale: two vocabulary-bounded partial-agg shuffles + broadcast
    unigram joins + TakeOrderedAndProject; 1-row totals crossJoin
    allowlisted (text.pmi_bigrams docstring)."""
    docs = _t_spread(spark, sf_dir, "documents")
    return text.pmi_bigrams(docs, min_count=5, k=20)


# =============================================================================
# Cross-source vocabulary overlap
# =============================================================================

@query(
    "q_vocab_overlap",
    f"""
    WITH gt AS (
      SELECT DISTINCT source AS grp, w
      FROM (SELECT source, UNNEST({_TOKS}) AS w FROM documents)),
    sizes AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS vocab FROM gt GROUP BY grp),
    shared AS (
      SELECT a.grp AS src_a, b.grp AS src_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM gt a JOIN gt b ON a.w = b.w AND a.grp < b.grp
      GROUP BY a.grp, b.grp)
    SELECT s.src_a, s.src_b,
           sa.vocab AS vocab_a, sb.vocab AS vocab_b, s.n_shared,
           ROUND(s.n_shared / (sa.vocab + sb.vocab - s.n_shared), 6)
             AS jaccard
    FROM shared s
    JOIN sizes sa ON s.src_a = sa.grp
    JOIN sizes sb ON s.src_b = sb.grp
    """,
)
def q_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the lexical-drift
    companion to q_corpus_drift: every unordered source pair's
    distinct-token intersection and similarity, all 190 pairs
    value-checked (set sizes, intersections, and the rounded ratio).

    Scale: one (source, token) distinct shuffle over the corpus
    (materialized once), a vocabulary-sized token self-join, and a
    pair-cardinality aggregate (text.vocab_overlap docstring)."""
    docs = _t_spread(spark, sf_dir, "documents")
    return text.vocab_overlap(docs, "source", "text")


# =============================================================================
# Token-distribution entropy / OOV exposure (corpus statistics)
# =============================================================================

@query(
    "q_token_entropy",
    f"""
    WITH counts AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT source, UNNEST({_TOKS}) AS w FROM documents)
      GROUP BY source, w),
    per AS (
      SELECT source, SUM(c) AS t, CAST(COUNT(*) AS BIGINT) AS vocab,
             SUM(c * ln(c)) AS clnc
      FROM counts GROUP BY source)
    SELECT source, CAST(t AS BIGINT) AS n_tokens, vocab,
           ROUND(ln(t) - clnc / t, 5) AS entropy,
           ROUND(CASE WHEN vocab > 1
                      THEN (ln(t) - clnc / t) / ln(vocab)
                      ELSE 0.0::DOUBLE END, 5) AS norm_entropy
    FROM per
    """,
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Shannon entropy of the token distribution plus the
    vocab-normalized form — the information-density / templatedness
    signal. The oracle refits the distribution and replays
    ``ln T - (sum c ln c)/T`` to 5 decimals.

    Scale: ONE (source, token) partial-agg shuffle, then a
    group-cardinality fold over vocabulary-sized rows
    (text.token_entropy docstring)."""
    docs = _t_spread(spark, sf_dir, "documents")
    return text.token_entropy(docs, "source", "text")


@query(
    "q_oov_rate",
    f"""
    WITH toks AS (SELECT source, UNNEST({_TOKS}) AS w FROM documents),
    fit AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY w)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN f.c < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           ROUND(SUM(CASE WHEN f.c < 20 THEN 1 ELSE 0 END) / COUNT(*), 6)
             AS oov_rate
    FROM toks t JOIN fit f ON t.w = f.w
    GROUP BY source
    """,
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source out-of-vocabulary exposure: the share of token
    occurrences whose corpus-wide frequency is below 20 — the
    tokenizer-coverage signal a frequency-pruned vocabulary
    (build_vocab's min_count rule) turns into <unk> mass. Every
    source's numerator, denominator, and rounded rate value-checked.

    Scale: one vocabulary-sized count fit broadcast back onto the
    narrow token explode, one group-cardinality aggregate
    (text.oov_rate docstring)."""
    docs = _t_spread(spark, sf_dir, "documents")
    return text.oov_rate(docs, "source", "text", min_count=20)


# =============================================================================
# C4 blocklist screening
# =============================================================================

_BLOCKLIST = ("slow", "legacy", "lorem")


@query(
    "q_blocklist_filter",
    f"""
    SELECT doc_id, text, lang, source, n_chars,
           CAST(len(list_filter({_SQL_TOKENS.format(c="COALESCE(text, '')")},
                                t -> list_contains({list(_BLOCKLIST)}, t)))
                AS INT) AS n_blocked_tokens,
           CAST(CASE WHEN len(list_filter(
                              {_SQL_TOKENS.format(c="COALESCE(text, '')")},
                              t -> list_contains({list(_BLOCKLIST)}, t))) = 0
                     THEN 1 ELSE 0 END AS INT) AS kept
    FROM documents
    """,
)
def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 bad-words screening (Raffel et al. 2020's banned-list drop
    rule) as an auditable annotation: every document's blocklisted
    whole-token count plus the keep decision, value-checked per row —
    token-level matching, so substrings never false-trip.

    Scale: the blocklist is a plan literal; the screen is one narrow
    codegen array pass — zero shuffle, zero Python, no join
    (corpus.flag_blocklisted docstring)."""
    docs = _t_spread(spark, sf_dir, "documents")
    from datapipelineetl_spark.operators import corpus as corpus_ops

    return corpus_ops.flag_blocklisted(docs, list(_BLOCKLIST))
