"""Eighteenth query battery — STAGED behind batch 17 (r11 horizon if
the r10 window fills with batch-17's six).

Round-9 tail: tokenizer fertility statistics — the "how well does the
tokenizer fit this corpus" diagnostic (pieces per word, characters per
piece, per language) computed from the SAME distributed BPE training
the q_train_bpe/q_bpe_segment pair pins. Same staging contract as
batches 11–17.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelineetl_spark.operators import text
from datapipelineetl_spark.queries import _t_spread
from datapipelineetl_spark.queries import QUERIES as _GLOBAL_QUERIES
from datapipelineetl_spark.queries import ORACLES as _GLOBAL_ORACLES
from datapipelineetl_spark.queries_batch9 import (
    _MH_BANDS,
    _MH_CAP,
    _MH_ROWS,
    _minhash_capped_pairs_cte,
)
from datapipelineetl_spark.queries_batch14 import _BPE_N, _bpe_ctes
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
    """Promote the staged queries into the live registry."""
    _GLOBAL_QUERIES.update(STAGED_QUERIES)
    _GLOBAL_ORACLES.update(STAGED_ORACLES)


_TOKS = _SQL_TOKENS.format(c="text")


@query(
    "q_token_fertility",
    _bpe_ctes(_BPE_N)
    + """,
    wmap AS (
      SELECT u.wc.o AS word,
             len(list_filter(string_split(u.wc.w, chr(31) || chr(31)),
                             y -> y <> '' AND y <> '</w>')) AS n_pieces
      FROM (SELECT ws FROM rec ORDER BY it DESC LIMIT 1) r,
           LATERAL (SELECT UNNEST(r.ws) AS wc) u),
    toks AS (
      SELECT lang, UNNEST("""
    + _TOKS
    + """) AS word FROM documents)
    SELECT t.lang,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(m.n_pieces) AS BIGINT) AS n_pieces,
           ROUND(SUM(m.n_pieces) / CAST(COUNT(*) AS DOUBLE), 6)
             AS fertility,
           ROUND(SUM(len(t.word)) / CAST(SUM(m.n_pieces) AS DOUBLE), 6)
             AS chars_per_piece
    FROM toks t JOIN wmap m ON t.word = m.word
    GROUP BY t.lang
    """,
)
def q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language for the corpus-trained BPE
    ({0} merges): pieces per word (the fertility metric multilingual
    tokenizer work reports — high fertility on a language means the
    vocabulary underserves it; the standalone </w> marker is excluded,
    it is training bookkeeping, not a piece) and characters per piece
    (compression).
    The oracle replays the SAME full training recursion as
    q_train_bpe (one `_bpe_ctes` definition now feeds THREE oracles)
    and folds every token occurrence through the final segmented word
    state — both ratios value-checked per language.

    Scale: the train cost (corpus scanned once, iterations on the
    vocabulary-sized word table) + one token explode joined against
    the broadcastable word table (piece counts are vocabulary
    metadata, not corpus data) + one partial-agg groupBy(lang) — no
    re-segmentation pass: the training word state already holds every
    word's piece count."""
    docs = _t_spread(spark, sf_dir, "documents")
    _, words = text.train_bpe(docs, n_merges=_BPE_N)
    toks = docs.select(
        F.col("lang"),
        F.explode_outer(
            text.tokens(F.coalesce(F.col("text"), F.lit("")))
        ).alias("word"),
    ).filter(F.col("word").isNotNull())
    # the STANDALONE end-of-word marker is training bookkeeping, not a
    # subword piece — counting it would overstate fertility by ~+1 per
    # word (a merged 'low</w>' IS a real piece and stays counted)
    pieces = words.select(
        "word",
        F.size(F.filter("syms", lambda s: s != text._BPE_EOW))
        .cast("long")
        .alias("__np"),
    )
    return (
        toks.join(pieces, "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("__np").cast("long").alias("n_pieces"),
            F.round(
                F.sum("__np") / F.count(F.lit(1)).cast("double"), 6
            ).alias("fertility"),
            F.round(
                F.sum(F.length("word"))
                / F.sum("__np").cast("double"),
                6,
            ).alias("chars_per_piece"),
        )
    )


# =============================================================================
# MinHash estimator accuracy (sketch-accuracy pairing, q_ann_recall style)
# =============================================================================

_MH_HASHES = 16


@query(
    "q_minhash_estimate",
    f"""WITH {_minhash_capped_pairs_cte(0.0, _MH_BANDS, _MH_ROWS, _MH_CAP)},
    est AS (
      SELECT p.id_a, p.id_b,
             ROUND(len(list_filter(generate_series(1, {_MH_HASHES}),
                                   i -> sa.s[i] = sb.s[i]))
                   / {_MH_HASHES}.0, 6) AS est_jaccard,
             p.jaccard AS exact_jaccard
      FROM pairs p
      JOIN sig sa ON p.id_a = sa.doc_id
      JOIN sig sb ON p.id_b = sb.doc_id)
    SELECT id_a, id_b, est_jaccard, exact_jaccard,
           ROUND(ABS(est_jaccard - exact_jaccard), 6) AS abs_err
    FROM est
    """,
)
def q_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash ESTIMATOR accuracy over every LSH candidate pair: the
    sketch-side Jaccard estimate (share of agreeing signature
    components, {0} hashes) next to the exact token-set Jaccard and
    the absolute error — the sketch-accuracy pairing the count-min /
    HLL / Bloom / ANN-recall queries established, applied to the
    near-dup family's own estimator. The oracle replays the ENTIRE
    ladder at threshold 0 (signature, banding, hot-bucket cap,
    candidates, exact verify — batch-9's `_minhash_capped_pairs_cte`,
    one shared definition) plus every per-component agreement count:
    estimator, truth, and error all value-checked pair by pair.

    Scale: the capped-candidate shape (O(n × bands) banding shuffle,
    cap² pair bound per bucket); signatures computed ONCE and
    materialized (the candidate join and both estimate sides reuse the
    same narrow frame), estimates are per-pair array equality folds —
    no extra corpus pass beyond the ladder itself."""
    from datapipelineetl_spark.operators import dedup

    docs = _t_spread(spark, sf_dir, "documents")
    sigd = dedup.minhash_signature(
        docs, "text", "minhash", _MH_HASHES
    ).select(
        "doc_id",
        "minhash",
        text.tokens("text", distinct=True).alias("__toks"),
    ).localCheckpoint(eager=True)  # feeds banding + both pair sides
    cand = dedup.lsh_candidate_pairs(
        sigd, "doc_id", "minhash", _MH_BANDS, _MH_ROWS,
        max_bucket_size=_MH_CAP, sig_len=_MH_HASHES,
    )
    side_a = sigd.select(
        F.col("doc_id").alias("id_a"),
        F.col("minhash").alias("__sa"),
        F.col("__toks").alias("__ta"),
    )
    side_b = sigd.select(
        F.col("doc_id").alias("id_b"),
        F.col("minhash").alias("__sb"),
        F.col("__toks").alias("__tb"),
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("__sa"), F.col("__sb"), lambda x, y: x == y),
            lambda b: b,
        )
    )
    est = F.round(agree / F.lit(float(_MH_HASHES)), 6)
    exact = F.round(dedup.jaccard(F.col("__ta"), F.col("__tb")), 6)
    return (
        cand.join(side_a, "id_a")
        .join(side_b, "id_b")
        .withColumn("est_jaccard", est)
        .withColumn("exact_jaccard", exact)
        .withColumn(
            "abs_err",
            F.round(F.abs(F.col("est_jaccard") - F.col("exact_jaccard")), 6),
        )
        .select("id_a", "id_b", "est_jaccard", "exact_jaccard", "abs_err")
    )


# A '"""...""".format(...)' first statement is an expression, not a
# string literal, so __doc__ was None (ADVICE r13, fixed repo-wide r14).
# The docstrings above are plain literals; interpolate their geometry
# constants here, after definition.
q_token_fertility.__doc__ = q_token_fertility.__doc__.format(_BPE_N)
q_minhash_estimate.__doc__ = q_minhash_estimate.__doc__.format(_MH_HASHES)
