"""Thirteenth query battery — STAGED for the round-8 verify window.

Oracle-paired queries for the corpus operators added round 7:
``corpus.shuffle_corpus`` (deterministic global shuffle → (shard, pos)
addresses for training data loaders), ``corpus.sample_k_per_stratum``
(exactly-k balanced sampling per stratum), ``text.normalize_text``
(mojibake repair + NFC + control/zero-width/NBSP cleanup — the Unicode
pass upstream of every tokenization/hashing operator),
``corpus.select_until_token_budget`` (best-first selection to a token
budget via the two-phase global cumsum), ``corpus.corpus_report``
(the per-(source, lang) profile dashboard), ``corpus.corpus_drift``
(the between-crawls report diff), and
``dedup.remove_duplicate_spans`` (Lee-et-al.-style exact duplicated
token-span removal).

Same staging contract as batches 11/12: separate dicts so importing
this module cannot grow the live ``queries()`` surface mid-round;
``tests/test_corpus_oracles.py`` runs the driver-style comparison
locally; ``register()`` promotes them when the r8 window has slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelineetl_spark.operators import corpus, text
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
    """Round-8 wiring: promote the staged queries into the live registry
    (call from __spark_entry__ next to the batch-12 register, then give
    them window slots)."""
    _GLOBAL_QUERIES.update(STAGED_QUERIES)
    _GLOBAL_ORACLES.update(STAGED_ORACLES)


# the 60-bit keyed hash both engines share (text.token_hash60 on
# COALESCE(key, '__null__') || salt — corpus samplers' convention)
def _sql_key_hash(key: str, salt: str) -> str:
    return (
        f"('0x' || substr(md5(COALESCE(CAST({key} AS VARCHAR), '__null__') "
        f"|| '{salt}'), 1, 15))::BIGINT"
    )


# =============================================================================
# Deterministic global shuffle
# =============================================================================

_SHUFFLE_SHARDS = 16
_SHUFFLE_SALT = "epoch0"


@query(
    "q_shuffle_corpus",
    f"""
    WITH h AS (
      SELECT doc_id, {_sql_key_hash('doc_id', _SHUFFLE_SALT)} AS hk
      FROM documents)
    SELECT doc_id,
           CAST(hk % {_SHUFFLE_SHARDS} AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY hk % {_SHUFFLE_SHARDS} ORDER BY hk, doc_id
           ) AS BIGINT) AS pos
    FROM h
    """,
)
def q_shuffle_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle: every document gets a (shard, pos)
    address from a keyed 60-bit hash — the reproducible permutation a
    training data loader consumes (same corpus + salt = same order;
    new salt = independent epoch reshuffle). The oracle replays the
    hash, the shard modulus, and the within-shard rank exactly, so
    every position is value-checked.

    Scale: ONE shuffle on the shard id + an independent per-shard sort
    (`corpus.shuffle_corpus` docstring: pick n_shards so a shard is
    file-sized; no global ordering ever materializes)."""
    docs = _t(spark, sf_dir, "documents")
    return corpus.shuffle_corpus(
        docs, key_col="doc_id", n_shards=_SHUFFLE_SHARDS, salt=_SHUFFLE_SALT
    ).select("doc_id", "shard", "pos")


# =============================================================================
# Exactly-k per-stratum sampling
# =============================================================================

_KPS_K = 30
_KPS_SALT = "balance"


@query(
    "q_sample_k_per_stratum",
    f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {_sql_key_hash('doc_id', _KPS_SALT)}, doc_id
             ) AS rk
      FROM documents)
    WHERE rk <= {_KPS_K}
    """,
)
def q_sample_k_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k balanced sample (k=30 docs per language):
    hash-ordered row_number per stratum, so the selection is
    reproducible, order-independent, and nested (a larger k extends the
    smaller sample). Fraction-based sample_stratified cannot hit exact
    counts; this is the eval-set builder.

    Scale: one shuffle on the stratum + per-stratum window sort; hot
    strata pre-gate with sample_fraction (operator docstring)."""
    docs = _t(spark, sf_dir, "documents")
    return corpus.sample_k_per_stratum(
        docs, _KPS_K, "lang", key_col="doc_id", salt=_KPS_SALT
    ).select("doc_id", "lang")


# =============================================================================
# Unicode normalization
# =============================================================================

def _norm_oracle() -> str:
    # the injected dirt: mojibake digraphs, CRLF, a zero-width space, a
    # BEL control, a combining-acute e (NFC-composes to é), an NBSP —
    # replayed identically on both sides so every repair branch executes
    # against real rows
    inject = (
        "'CafÃ©â€™ ' || text || chr(13) || chr(10) || 'tailâ€œq' || "
        "chr(8203) || chr(7) || 'e' || chr(769) || chr(160) || 'end'"
    )
    # chained literal replaces, longest key first — the SAME order the
    # engine applies (text.normalize_text sorts MOJIBAKE_MAP by length)
    expr = "t"
    for bad in sorted(text.MOJIBAKE_MAP, key=len, reverse=True):
        good = text.MOJIBAKE_MAP[bad].replace("'", "''")
        expr = f"replace({expr}, '{bad}'," + f" '{good}')"
    expr = f"nfc_normalize({expr})"
    expr = f"replace({expr}, chr(13) || chr(10), chr(10))"
    expr = f"replace({expr}, chr(13), chr(10))"
    # RE2 takes \\x{{hhhh}} (not \\uhhhh) for codepoint escapes
    expr = (
        f"regexp_replace({expr}, "
        "'[\\x{200b}\\x{200c}\\x{200d}\\x{feff}]', '', 'g')"
    )
    expr = (
        f"regexp_replace({expr}, "
        "'[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]', '', 'g')"
    )
    expr = f"replace({expr}, chr(160), ' ')"
    return f"""
    WITH src AS (SELECT doc_id, {inject} AS t FROM documents)
    SELECT doc_id, {expr} AS text FROM src
    """


@query("q_normalize_text", _norm_oracle())
def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode cleanup, value-checked byte-for-byte on the normalized
    text: every document is dirtied with mojibake digraphs (Ã© / â€™ /
    â€œ), a CRLF, a zero-width space, a BEL control, a combining-acute
    sequence, and an NBSP; `text.normalize_text` must repair the
    mojibake, NFC-compose the combining pair, fold the line ending, and
    strip/replace the rest. The oracle replays the SAME mojibake table
    (generated from text.MOJIBAKE_MAP, longest-first) and DuckDB's
    nfc_normalize — Unicode's normalization-stability policy makes the
    two NFC implementations agree on assigned codepoints.

    Scale: literal/regexp replace chains in codegen plus ONE
    Arrow-batched pandas UDF for NFC (no Spark built-in exists); zero
    shuffle — the plan lint's no-BatchEvalPython rule still holds."""
    docs = _t_spread(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("CafÃ©â€™ "),
            F.col("text"),
            # zero-width space U+200B, BEL, e + combining acute U+0301
            # (the NFC target), NBSP U+00A0 - the chr() twins of the oracle's injection
            F.lit("\r\ntailâ€œq\u200b\x07e\u0301\u00a0end"),
        ).alias("text"),
    )
    return text.normalize_text(docs).select("doc_id", "text")


# =============================================================================
# Budget-capped best-first selection
# =============================================================================

_BUDGET = 20_000


def _budget_oracle() -> str:
    toks = _SQL_TOKENS.format(c="text")
    return rf"""
    WITH q0 AS (
      SELECT doc_id, text,
             CAST(length(text) AS INT) AS n_chars_m,
             ROUND(len(regexp_extract_all(text, '[^\w\s]')) * 1.0
                   / GREATEST(length(text), 1), 4) AS punct_ratio,
             ROUND(len(list_filter({toks}, x -> x IN ('the','and','of','to','is'))) * 1.0
                   / GREATEST(len({toks}), 1), 4) AS stopword_ratio,
             ROUND(len(regexp_extract_all(text, '[A-Za-z]')) * 1.0
                   / GREATEST(length(text), 1), 4) AS alpha_ratio
      FROM documents),
    scored AS (
      SELECT doc_id,
             ROUND(CAST(
               (CASE WHEN n_chars_m < 20 THEN 0.0 ELSE 1.0 END) * 0.25
               + (CASE WHEN stopword_ratio >= 0.01 AND stopword_ratio <= 0.6 THEN 1.0 ELSE 0.0 END) * 0.25
               + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END) * 0.25
               + (CASE WHEN alpha_ratio >= 0.5 THEN 1.0 ELSE 0.0 END) * 0.25
               AS DOUBLE), 4) AS quality_score,
             CAST(len({toks}) AS INT) AS n_tokens
      FROM q0),
    r AS (
      SELECT doc_id, quality_score, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               ORDER BY quality_score DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS off
      FROM scored)
    SELECT doc_id, quality_score, n_tokens
    FROM r WHERE off < {_BUDGET}
    """


@query("q_select_budget", _budget_oracle())
def q_select_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-capped best-first selection ("the best 20k tokens"):
    documents in (quality desc, id) order are kept while the EXCLUSIVE
    running token total sits under the budget. The oracle computes the
    same global running sum with one ORDER BY window; the engine
    refuses the global sort and uses the two-phase cumsum (per-score
    totals -> key offsets over the metadata-sized aggregate -> within-
    key distributed cumsum) — `corpus.select_until_token_budget`. Every
    selected id is value-checked, which pins the two computations
    equivalent including the quality-tie id ordering.

    Scale: one partial-agg shuffle on the score, a one-task window over
    ~score-cardinality rows, one broadcast join, per-score windows —
    no global sort anywhere (plan: zero global-ORDER Exchange)."""
    docs = text.with_token_stats(
        text.with_quality_score(_t_spread(spark, sf_dir, "documents"))
    )
    return corpus.select_until_token_budget(
        docs, _BUDGET, "n_tokens", "quality_score"
    ).select("doc_id", "quality_score", "n_tokens")


# =============================================================================
# Per-group corpus profile report
# =============================================================================

def _report_ctes(prefix: str, where: str = "TRUE") -> str:
    """The corpus-report aggregation as named CTE fragments over a
    filtered slice of ``documents`` — shared between the report and
    drift oracles (ONE definition of the scoring/aggregation SQL)."""
    toks = _SQL_TOKENS.format(c="text")
    return rf"""
    {prefix}q0 AS (
      SELECT source, lang, text,
             CAST(length(text) AS INT) AS n_chars_m,
             ROUND(len(regexp_extract_all(text, '[^\w\s]')) * 1.0
                   / GREATEST(length(text), 1), 4) AS punct_ratio,
             ROUND(len(list_filter({toks}, x -> x IN ('the','and','of','to','is'))) * 1.0
                   / GREATEST(len({toks}), 1), 4) AS stopword_ratio,
             ROUND(len(regexp_extract_all(text, '[A-Za-z]')) * 1.0
                   / GREATEST(length(text), 1), 4) AS alpha_ratio,
             CAST(len({toks}) AS INT) AS nt
      FROM documents WHERE {where}),
    {prefix}scored AS (
      SELECT source, lang, nt,
             ROUND(CAST(
               (CASE WHEN n_chars_m < 20 THEN 0.0 ELSE 1.0 END) * 0.25
               + (CASE WHEN stopword_ratio >= 0.01 AND stopword_ratio <= 0.6 THEN 1.0 ELSE 0.0 END) * 0.25
               + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END) * 0.25
               + (CASE WHEN alpha_ratio >= 0.5 THEN 1.0 ELSE 0.0 END) * 0.25
               AS DOUBLE), 4) AS quality_score
      FROM {prefix}q0),
    {prefix}rep AS (
      SELECT source, lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(nt) AS BIGINT) AS total_tokens,
             ROUND(AVG(quality_score), 4) AS mean_quality
      FROM {prefix}scored GROUP BY source, lang)
    """.strip()


def _report_oracle() -> str:
    toks = _SQL_TOKENS.format(c="text")
    return rf"""
    WITH q0 AS (
      SELECT source, lang, text,
             CAST(length(text) AS INT) AS n_chars_m,
             ROUND(len(regexp_extract_all(text, '[^\w\s]')) * 1.0
                   / GREATEST(length(text), 1), 4) AS punct_ratio,
             ROUND(len(list_filter({toks}, x -> x IN ('the','and','of','to','is'))) * 1.0
                   / GREATEST(len({toks}), 1), 4) AS stopword_ratio,
             ROUND(len(regexp_extract_all(text, '[A-Za-z]')) * 1.0
                   / GREATEST(length(text), 1), 4) AS alpha_ratio,
             CAST(len({toks}) AS INT) AS nt
      FROM documents),
    scored AS (
      SELECT source, lang, nt, CAST(length(text) AS BIGINT) AS nc,
             ROUND(CAST(
               (CASE WHEN n_chars_m < 20 THEN 0.0 ELSE 1.0 END) * 0.25
               + (CASE WHEN stopword_ratio >= 0.01 AND stopword_ratio <= 0.6 THEN 1.0 ELSE 0.0 END) * 0.25
               + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END) * 0.25
               + (CASE WHEN alpha_ratio >= 0.5 THEN 1.0 ELSE 0.0 END) * 0.25
               AS DOUBLE), 4) AS quality_score
      FROM q0)
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS total_tokens,
           CAST(SUM(nc) AS BIGINT) AS total_chars,
           ROUND(AVG(quality_score), 4) AS mean_quality,
           ROUND(quantile_cont(nt, 0.5), 1) AS p50_tokens,
           ROUND(quantile_cont(nt, 0.9), 1) AS p90_tokens
    FROM scored GROUP BY source, lang
    """


@query("q_corpus_report", _report_oracle())
def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus profile: doc counts, token/char
    volumes, mean quality, exact p50/p90 document lengths — the
    per-crawl drift dashboard, every cell value-checked (the oracle
    replays the quality-score SQL and quantile_cont matches Spark's
    interpolated percentile, the q_percentiles_by_priority-proven
    mapping).

    Scale: narrow annotations + ONE partial-agg groupBy; exact
    percentiles are safe at (source, lang) cardinality
    (`corpus.corpus_report` docstring)."""
    docs = _t_spread(spark, sf_dir, "documents")
    return corpus.corpus_report(docs).select(
        "source", "lang", "n_docs", "total_tokens", "total_chars",
        "mean_quality", "p50_tokens", "p90_tokens",
    )


# =============================================================================
# Between-crawls drift diff
# =============================================================================

# crawl A = the docs whose id is not divisible by 3 (a "previous crawl"
# missing a third of the corpus); crawl B = everything. Replayed
# identically on both sides so appeared/changed branches all execute.
_DRIFT_A = "doc_id % 3 <> 0"


@query(
    "q_corpus_drift",
    f"""
    WITH {_report_ctes('a_', _DRIFT_A)},
    {_report_ctes('b_')}
    SELECT COALESCE(a.source, b.source) AS source,
           COALESCE(a.lang, b.lang) AS lang,
           COALESCE(a.n_docs, 0) AS n_docs_before,
           COALESCE(b.n_docs, 0) AS n_docs_after,
           COALESCE(b.n_docs, 0) - COALESCE(a.n_docs, 0) AS doc_delta,
           COALESCE(b.total_tokens, 0) - COALESCE(a.total_tokens, 0) AS token_delta,
           ROUND(COALESCE(b.mean_quality, 0) - COALESCE(a.mean_quality, 0), 4)
             AS quality_delta,
           CASE WHEN a.n_docs IS NULL THEN 'appeared'
                WHEN b.n_docs IS NULL THEN 'vanished'
                WHEN a.n_docs <> b.n_docs
                     OR a.total_tokens <> b.total_tokens
                     OR a.mean_quality <> b.mean_quality THEN 'changed'
                ELSE 'stable' END AS status
    FROM a_rep a FULL JOIN b_rep b
      ON a.source = b.source AND a.lang = b.lang
    """,
)
def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Between-crawls drift: corpus_report over a simulated previous
    crawl (two-thirds of the documents) diffed against the full corpus
    — per-(source, lang) doc/token/quality deltas and a status tag,
    every cell value-checked (the oracle builds BOTH report CTEs from
    the same `_report_ctes` fragment the report oracle uses).

    Scale: both inputs are group-count-sized report frames; the drift
    join is metadata-on-metadata (`corpus.corpus_drift` docstring)."""
    docs = _t_spread(spark, sf_dir, "documents")
    before = corpus.corpus_report(docs.filter(F.col("doc_id") % 3 != 0))
    after = corpus.corpus_report(docs)
    return corpus.corpus_drift(before, after).select(
        "source", "lang", "n_docs_before", "n_docs_after",
        "doc_delta", "token_delta", "quality_delta", "status",
    )


# =============================================================================
# Exact duplicated-span removal
# =============================================================================

# a fixed 8-token span appended to every 7th doc: its first occurrence
# must survive, every other injected copy must be cut — both branches of
# the operator execute regardless of the fixture's natural repeats
_SPAN_DOC = (
    "SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN text || "
    "' the shared eight token span sentence repeats here' "
    "ELSE text END AS text FROM documents"
)


def _span_oracle() -> str:
    toks = _SQL_TOKENS.format(c="text")
    return f"""
    WITH src AS ({_SPAN_DOC}),
    t AS (SELECT doc_id, {toks} AS ts FROM src),
    wins AS (
      SELECT doc_id, i - 1 AS wstart,
             ('0x' || substr(md5(array_to_string(
                list_slice(ts, i, i + 7), ' ')), 1, 15))::BIGINT AS gh
      FROM t, LATERAL UNNEST(generate_series(1, len(ts) - 7)) AS u(i)
      WHERE ts IS NOT NULL AND len(ts) >= 8),
    ranked AS (
      SELECT doc_id, wstart,
             ROW_NUMBER() OVER (PARTITION BY gh ORDER BY doc_id, wstart) AS rn
      FROM wins),
    masked AS (
      SELECT DISTINCT doc_id, wstart + o AS pos
      FROM ranked, LATERAL UNNEST(generate_series(0, 7)) AS v(o)
      WHERE rn > 1),
    toki AS (
      SELECT doc_id, i - 1 AS pos, ts[i] AS tok
      FROM t, LATERAL UNNEST(generate_series(1, len(ts))) AS w(i)
      WHERE ts IS NOT NULL),
    kept AS (
      SELECT k.doc_id, k.pos, k.tok FROM toki k
      WHERE NOT EXISTS (
        SELECT 1 FROM masked m
        WHERE m.doc_id = k.doc_id AND m.pos = k.pos)),
    rebuilt AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text
      FROM kept GROUP BY doc_id)
    SELECT s.doc_id, COALESCE(r.text, '') AS text
    FROM src s LEFT JOIN rebuilt r ON s.doc_id = r.doc_id
    """


@query("q_dedup_spans", _span_oracle())
def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span removal (Lee et al. 2021 substring dedup at
    8-token-window granularity), value-checked byte-for-byte on the
    rebuilt token stream: a fixed 8-token span injected on every 7th
    document must survive ONLY at its corpus-wide first (doc_id, start)
    occurrence; the fixture's natural 8-gram repeats cut too, and both
    engines replay the same window hash, first-occurrence rank, mask
    union, and ordered rebuild.

    Scale: O(total windows) through two shuffles (window-hash argmin +
    occurrence join) — no pairwise blowup (`dedup.duplicate_spans`);
    rebuild is the in-aggregate ordered reassembly shape."""
    docs = _t_spread(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" the shared eight token span sentence repeats here"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    from datapipelineetl_spark.operators import dedup as _dedup

    return _dedup.remove_duplicate_spans(docs, n=8).select("doc_id", "text")
