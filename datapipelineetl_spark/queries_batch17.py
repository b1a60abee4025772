"""Seventeenth query battery — STAGED for the round-10 window (the r9
window is already committed to the 21 batch-14/15/16 promotions + the
30 contract-forced core rows).

Round-9 surface: the corpus-curation completions — SemDeDup
(cluster-fenced embedding dedup), the Gopher quality-rule battery, a
fastText-style hashed linear quality classifier, per-source KL
divergence, n-gram novelty, and asymmetric containment pairs. Same
staging contract as batches 11–16: verified by
``tests/test_corpus_oracles.py`` and ``check_correctness.py --staged``
now; promotion is one ``register()`` call + window slots.

Oracle conventions follow the earlier batteries: the md5-60 hash
replays as ``('0x' || substr(md5(x), 1, 15))::BIGINT``; integer work
is CAST to BIGINT/INT on both sides; float enters only at final
ROUNDed columns; the k-means trajectory is replayed via batch-14's
``_kmeans_ctes`` (ONE definition of the Lloyd unroll feeds all three
kmeans-consuming oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datapipelineetl_spark.operators import dedup, similarity, text
from datapipelineetl_spark.queries import _t
from datapipelineetl_spark.queries import QUERIES as _GLOBAL_QUERIES
from datapipelineetl_spark.queries import ORACLES as _GLOBAL_ORACLES
from datapipelineetl_spark.queries_batch14 import (
    _KM_DIM,
    _KM_DP,
    _KM_ITERS,
    _KM_K,
    _kmeans_ctes,
)
from datapipelineetl_spark.queries_ext import _SQL_HASH60, _SQL_TOKENS

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
    """Promote the staged queries into the live registry."""
    _GLOBAL_QUERIES.update(STAGED_QUERIES)
    _GLOBAL_ORACLES.update(STAGED_ORACLES)


_TOKS = _SQL_TOKENS.format(c="text")


def _sql_shingles(n: int) -> str:
    # text.shingles replay (same fragment as queries_batch11/15)
    return (
        f"list_transform(generate_series(0, GREATEST(len(toks) - {n}, 0)), "
        f"i -> array_to_string(list_slice(toks, i + 1, i + {n}), ' '))"
    )


# =============================================================================
# SemDeDup — cluster-fenced embedding near-dup (Abbas et al. 2023)
# =============================================================================

_SD_THRESHOLD = 0.45  # the q_cosine_near_pairs / q_semantic_dupes level
# semdedup runs its OWN kmeans geometry: k=16 (vs q_kmeans_clusters'
# k=4) because the cluster count IS the pairwise-work bound — at k=4
# half the corpus pairs with itself and the fence demonstrates
# nothing; ONE Lloyd iteration because the dedup story needs a
# deterministic replayable fence, not a converged clustering (and each
# iteration is a k*dim-literal plan whose analysis cost is real —
# measured grid in SCALING.md)
_SD_K = 16
_SD_ITERS = 1

# normalize-then-dot, operation-for-operation the engine's float path
# (similarity.semdedup pre-normalizes so the pair stage is one fold;
# zero-norm vectors map to the zero unit vector in both engines — a
# bare division would be NULL in Spark but inf/NaN in DuckDB — and a
# NULL norm (corrupt NULL element) falls through both branches to
# NULL, exactly the engine's no-otherwise when-chain)
_SQL_UNIT = (
    "list_transform(v.v, x -> CASE WHEN sqrt(list_sum("
    "list_transform(v.v, y -> y * y))) > 0 THEN x / sqrt(list_sum("
    "list_transform(v.v, y -> y * y))) WHEN sqrt(list_sum("
    "list_transform(v.v, y -> y * y))) = 0 THEN 0.0 END)"
)
_SQL_COS = (
    "ROUND(list_sum(list_transform(generate_series(1, {dim}), "
    "j -> a.u[j] * b.u[j])), 4)"
).format(dim=_KM_DIM)


@query(
    "q_semdedup",
    f"""
    WITH {_kmeans_ctes(_SD_K, _SD_ITERS, _KM_DIM, _KM_DP)},
    m AS (SELECT v.vec_id, {_SQL_UNIT} AS u, a.c
          FROM v JOIN afinal a USING (vec_id)),
    pr AS (
      SELECT b.vec_id, {_SQL_COS} AS cos
      FROM m a JOIN m b ON a.c = b.c AND a.vec_id < b.vec_id),
    dups AS (
      SELECT vec_id, CAST(COUNT(*) AS INT) AS n_dups_earlier
      FROM pr WHERE cos >= {_SD_THRESHOLD} GROUP BY vec_id)
    SELECT e.vec_id, a.c AS cluster,
           COALESCE(d.n_dups_earlier, 0) AS n_dups_earlier,
           CASE WHEN COALESCE(d.n_dups_earlier, 0) = 0 THEN 1 ELSE 0 END
             AS kept
    FROM embeddings e
    LEFT JOIN afinal a USING (vec_id)
    LEFT JOIN dups d USING (vec_id)
    """,
)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embedding corpus (k={0} k-means fence, {1}
    Lloyd iterations, cosine >= {2} within clusters, drop-if-similar-
    to-earlier-id): the oracle replays the ENTIRE trajectory — batch
    14's `_kmeans_ctes` Lloyd unroll (same parameterized definition the
    kmeans oracles use, instantiated at this query's geometry) plus
    every within-cluster cosine, every rounded threshold decision, and
    every keep flag. The cluster fence is what separates this from
    q_semantic_dupes' exact O(n²) baseline: pairs exist only inside
    clusters, so the comparison here IS the method's scale story,
    value-checked.

    Scale: pairwise work bounded by Σ|cluster|² (production raises k
    to keep clusters small — SemDeDup used 50k); one cluster-keyed
    equi-join; the k-means fit collects k×dim centroid metadata only
    (similarity.semdedup docstring)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.semdedup(
        emb, k=_SD_K, iters=_SD_ITERS, threshold=_SD_THRESHOLD,
        materialize=True,
    )


# =============================================================================
# Gopher quality-rule battery (Rae et al. 2021)
# =============================================================================

# the fixture's 31-token synthetic vocabulary contains only these two
# of Gopher's 8 stop words — the operator defaults to the paper's list;
# the registered query pins a fixture-meaningful one so the rule
# exercises BOTH outcomes under the gate
_GOPHER_STOPS = ("the", "a")
_GOPHER_MIN_WORDS = 50

_SQL_GOPHER_FLAGS = f"""
    t AS (
      SELECT doc_id, COALESCE(text, '') AS txt,
             {_SQL_TOKENS.format(c="COALESCE(text, '')")} AS toks
      FROM documents),
    f AS (
      SELECT doc_id,
        CAST(len(toks) AS INT) AS n_words,
        COALESCE(list_sum(list_transform(toks, w -> len(w))), 0) AS sum_len,
        (len(txt) - len(replace(txt, '#', '')))
          + (len(txt) - len(replace(txt, '…', '')))
          + CAST((len(txt) - len(replace(txt, '...', ''))) / 3 AS BIGINT)
          AS n_symbols,
        list_filter(string_split(txt, chr(10)),
                    x -> trim(x, ' ' || chr(9) || chr(13)) <> '') AS lines,
        len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS n_alpha,
        len(list_filter(list_distinct(toks),
                        w -> w IN {_GOPHER_STOPS!r})) AS n_stop
      FROM t),
    g AS (
      SELECT doc_id, n_words,
        CAST(n_words >= {_GOPHER_MIN_WORDS} AND n_words <= 100000 AS INT)
          AS r_word_count,
        CAST(n_words > 0 AND sum_len >= 3 * n_words
             AND sum_len <= 10 * n_words AS INT) AS r_mean_word_len,
        CAST(10 * n_symbols <= n_words AS INT) AS r_symbol_ratio,
        CAST(10 * len(list_filter(lines,
               x -> substring(trim(x, ' ' || chr(9) || chr(13)), 1, 1)
                    IN ('-', '*', '•')))
             <= 9 * len(lines) AS INT) AS r_bullet_lines,
        CAST(10 * len(list_filter(lines,
               x -> ends_with(trim(x, ' ' || chr(9) || chr(13)), '...')
                    OR ends_with(trim(x, ' ' || chr(9) || chr(13)), '…')))
             <= 3 * len(lines) AS INT) AS r_ellipsis_lines,
        CAST(5 * n_alpha >= 4 * n_words AS INT) AS r_alpha_words,
        CAST(n_stop >= 2 AS INT) AS r_stopwords
      FROM f)
"""


@query(
    "q_gopher_rules",
    f"""
    WITH {_SQL_GOPHER_FLAGS}
    SELECT doc_id, n_words, r_word_count, r_mean_word_len, r_symbol_ratio,
           r_bullet_lines, r_ellipsis_lines, r_alpha_words, r_stopwords,
           CAST(r_word_count + r_mean_word_len + r_symbol_ratio
                + r_bullet_lines + r_ellipsis_lines + r_alpha_words
                + r_stopwords = 7 AS INT) AS kept
    FROM g
    """,
)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher quality-rule battery over the documents table (word
    count >= {0}, mean word length, symbol ratio, bullet/ellipsis line
    shares, alphabetic-word share, >= 2 stop words): every flag is an
    INTEGER-arithmetic inequality (10·n_symbols <= n_words, never a
    float ratio), so each of the seven decisions plus the conjunction
    is value-checked bit-exactly — the oracle replays token lengths,
    symbol counts, line filters, and the regex alpha test literally.
    The stop list is pinned to the fixture's vocabulary ({1!r}); the
    operator's default is the published 8-word list.

    Scale: ONE narrow codegen pass, zero shuffle, zero joins
    (text.gopher_rules docstring)."""
    docs = _t(spark, sf_dir, "documents")
    return text.gopher_rules(
        docs, min_words=_GOPHER_MIN_WORDS, stopwords=_GOPHER_STOPS
    )


# =============================================================================
# fastText-style hashed linear quality classifier (Joulin et al. 2016)
# =============================================================================

_QL_BUCKETS = 1024


@query(
    "q_quality_linear",
    f"""
    WITH toks AS (
      SELECT doc_id, UNNEST({_TOKS}) AS tok FROM documents),
    w AS (
      SELECT doc_id,
             ((({_SQL_HASH60.format(t="tok")} % {_QL_BUCKETS})
               * 2654435761) % 2001) - 1000 AS milli
      FROM toks),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS INT) AS n_tokens,
             CAST(SUM(milli) AS BIGINT) AS s
      FROM w GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(a.n_tokens, 0) AS INT) AS n_tokens,
           ROUND(1.0 / (1.0 + exp(-(a.s / (1000.0 * a.n_tokens)))), 5)
             AS quality_prob
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def q_quality_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed bag-of-words linear quality scoring (the fastText
    architecture of the GPT-3/LLaMA-class quality filters): token →
    md5-60 bucket (of {0}) → deterministic integer milli-weight →
    exact BIGINT accumulation → one final sigmoid. The oracle replays
    the hash, the Knuth-multiplicative weight formula, the integer
    sum, and the rounded sigmoid — the whole scoring path
    value-checked per document. Integer milli-weights are what make
    the doc score partitioning- and engine-independent (a float sum
    would be addition-order-dependent — text.quality_linear).

    Scale: per-row array math against an inline weight formula (a
    trained model rides as one constant-folded array literal); zero
    shuffle, zero Python, no explode."""
    docs = _t(spark, sf_dir, "documents")
    return text.quality_linear(docs, n_buckets=_QL_BUCKETS)


# =============================================================================
# Per-source KL divergence vs the corpus distribution
# =============================================================================


@query(
    "q_source_kl",
    f"""
    WITH gt AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cgt
      FROM (SELECT source, UNNEST({_TOKS}) AS tok FROM documents)
      GROUP BY source, tok),
    ct AS (SELECT tok, CAST(SUM(cgt) AS BIGINT) AS ctot FROM gt GROUP BY tok),
    tot AS (SELECT CAST(SUM(cgt) AS BIGINT) AS T FROM gt),
    pg AS (
      SELECT g.source, CAST(SUM(g.cgt) AS BIGINT) AS n_tokens,
             SUM(g.cgt * ln(g.cgt::DOUBLE)) AS s_in,
             SUM(g.cgt * ln(c.ctot::DOUBLE)) AS s_cross
      FROM gt g JOIN ct c USING (tok) GROUP BY g.source)
    SELECT source, n_tokens,
           ROUND((s_in - s_cross) / n_tokens
                 + ln(T::DOUBLE) - ln(n_tokens::DOUBLE), 6) AS kl_divergence
    FROM pg CROSS JOIN tot
    """,
)
def q_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence KL(P_source || P_corpus) over unigram
    distributions — the domain-shift diagnostic of data-mixing work.
    Support(source) ⊆ support(corpus) by construction, so no smoothing
    is needed and the oracle replays the exact identity the engine
    uses: KL = (Σc·ln c − Σc·ln c_corpus)/n + ln T − ln n, every count
    exact BIGINT, float only in the two ln-folds (the q_token_entropy
    discipline).

    Scale: ONE (source, token) partial-agg shuffle; the corpus counts
    derive from that same table (no second corpus pass); the totals
    row is the allowlisted 1-row crossJoin (text.source_kl)."""
    docs = _t(spark, sf_dir, "documents")
    return text.source_kl(docs, materialize=True)


# =============================================================================
# n-gram novelty + asymmetric containment (Broder measures)
# =============================================================================

_NOV_N = 8


@query(
    "q_gram_novelty",
    f"""
    WITH toks_all AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents),
    grams AS (
      SELECT doc_id, g
      FROM (SELECT doc_id, UNNEST(list_distinct({_sql_shingles(_NOV_N)})) AS g
            FROM toks_all)
      WHERE g <> ''),  -- drop_empty: zero-token docs share no grams
    freq AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ndocs
             FROM grams GROUP BY g),
    pd AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_common
      FROM grams JOIN freq USING (g) GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(p.n_grams, 0) AS n_grams,
           COALESCE(p.n_common, 0) AS n_common,
           CASE WHEN p.n_grams > 0 THEN
             ROUND((p.n_grams - p.n_common) / p.n_grams::DOUBLE, 6)
           END AS novelty
    FROM documents d LEFT JOIN pd p USING (doc_id)
    """,
)
def q_gram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document {0}-gram novelty (share of distinct shingles seen
    in no other doc — the memorization-risk mirror of contamination):
    the oracle replays shingling, per-doc distinct, corpus document
    frequencies, and the single rounded division. The operator joins
    on the 60-bit gram hash, the oracle on gram text — identical
    counts unless md5-60 collides, which the value compare would
    expose (the contamination-family caveat).

    Scale: three shuffles all bounded by the DISTINCT-gram table
    (frequency agg, gram join, doc fold) — never pairwise
    (dedup.gram_novelty)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.gram_novelty(docs, n=_NOV_N, materialize=True)


_CT_THRESHOLD = 0.2


@query(
    "q_doc_containment",
    f"""
    WITH toks_all AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents),
    grams AS (
      SELECT doc_id, g
      FROM (SELECT doc_id, UNNEST(list_distinct({_sql_shingles(_NOV_N)})) AS g
            FROM toks_all)
      WHERE g <> ''),  -- drop_empty: zero-token docs share no grams
    sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
           FROM grams GROUP BY doc_id),
    sh AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    scored AS (
      SELECT id_a, id_b, n_shared,
             ROUND(n_shared / sa.sz::DOUBLE, 6) AS containment_a,
             ROUND(n_shared / sb.sz::DOUBLE, 6) AS containment_b
      FROM sh
      JOIN sz sa ON sh.id_a = sa.doc_id
      JOIN sz sb ON sh.id_b = sb.doc_id)
    SELECT id_a, id_b, n_shared, containment_a, containment_b
    FROM scored
    WHERE containment_a >= {_CT_THRESHOLD} OR containment_b >= {_CT_THRESHOLD}
    """,
)
def q_doc_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric {0}-gram containment pairs at threshold {1} — the
    Broder measure that catches one document EMBEDDING another (tiny
    Jaccard, containment → 1). Both directional scores are reported
    and the oracle replays shingle distinct-ing, the gram equi-join,
    per-pair shared counts, both rounded divisions, and the
    either-direction threshold.

    Scale: gram-hash equi-join + per-pair count (O(corpus ×
    grams/doc), never |corpus|²); doc-size joins stay un-forced so AQE
    broadcasts only when the size table actually fits
    (dedup.containment_pairs; boilerplate grams capped via
    max_bucket_size in production)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.containment_pairs(
        docs, threshold=_CT_THRESHOLD, n=_NOV_N, materialize=True
    )


# A '"""...""".format(...)' first statement is an expression, not a
# string literal, so __doc__ was None (ADVICE r13, fixed repo-wide r14).
# The docstrings above are plain literals; interpolate their geometry
# constants here, after definition.
q_semdedup.__doc__ = q_semdedup.__doc__.format(_SD_K, _SD_ITERS, _SD_THRESHOLD)
q_gopher_rules.__doc__ = q_gopher_rules.__doc__.format(_GOPHER_MIN_WORDS, _GOPHER_STOPS)
q_quality_linear.__doc__ = q_quality_linear.__doc__.format(_QL_BUCKETS)
q_gram_novelty.__doc__ = q_gram_novelty.__doc__.format(_NOV_N)
q_doc_containment.__doc__ = q_doc_containment.__doc__.format(_NOV_N, _CT_THRESHOLD)
