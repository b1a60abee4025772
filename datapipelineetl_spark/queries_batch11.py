"""Eleventh query battery — STAGED for the round-6 verify window.

Oracle-paired queries for the round-5 corpus-preparation operators
(``operators/corpus.py``). NOT yet imported by ``__spark_entry__`` /
``bench.py``: the driver verifies only the first 50 ``queries()``
entries and round 5's window is fully committed to rotating the 44
aged queries plus this round's five registrations — so these five wait
one round. They are verified NOW by ``tests/test_corpus_oracles.py``,
which runs exactly the driver's comparison (row count + sorted-column
value compare vs DuckDB) locally; wiring them in next round is one
import line plus window slots (NOTES.md round-6 checklist).

Oracle conventions identical to queries_ext.py: the md5-60-bit hash
gate replays as ``('0x' || substr(md5(x), 1, 15))::BIGINT`` so the
DETERMINISTIC sampling decisions — the whole point of hash-gated
sampling — are value-checked row by row across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelineetl_spark.operators import corpus, text
from datapipelineetl_spark.queries import _t, _t_spread
from datapipelineetl_spark.queries import QUERIES as _GLOBAL_QUERIES
from datapipelineetl_spark.queries import ORACLES as _GLOBAL_ORACLES
from datapipelineetl_spark.queries_batch9 import (
    _MH_BANDS,
    _MH_CAP,
    _MH_ROWS,
    _MH_THRESHOLD,
    _minhash_capped_pairs_cte,
)
from datapipelineetl_spark.queries_ext import _SQL_TOKENS, _SQL_TOKSET

# STAGED registry — deliberately separate from queries.QUERIES so that
# importing this module (the oracle test does) cannot grow the live
# queries() surface mid-round and break the 50-slot window contract.
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
    """Round-6 wiring: promote the staged queries into the live registry
    (call from __spark_entry__ next to the batch-10 import, then give
    each a window slot)."""
    _GLOBAL_QUERIES.update(STAGED_QUERIES)
    _GLOBAL_ORACLES.update(STAGED_ORACLES)


# the engine's sampling gate, replayed in DuckDB SQL ({k}: key expression
# already cast to VARCHAR; {s}: salt literal). COALESCE mirrors
# corpus._hash_gate's null-key sentinel exactly.
_SQL_GATE = (
    "(('0x' || substr(md5(COALESCE({k}, '__null__') || '{s}'), 1, 15))::BIGINT"
    " % 1000000)"
)


@query(
    "q_sample_stratified",
    f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_SQL_GATE.format(k='doc_id::VARCHAR', s='')} <
          CASE lang WHEN 'en' THEN 1000000
                    WHEN 'de' THEN 500000
                    ELSE 100000 END
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: keep all English docs, half the
    German, 10% of everything else — the training-data rebalance op. The
    oracle replays the md5-gate per row, so every individual keep/drop
    DECISION is value-checked, not just the realized rates.

    Scale: narrow filter (CASE over a driver-known strata map + hash
    compare) — no shuffle, no RNG state, no join."""
    docs = _t(spark, sf_dir, "documents")
    return corpus.sample_stratified(
        docs, "lang", {"en": 1.0, "de": 0.5}, key_col="doc_id", default_fraction=0.1
    ).select("doc_id", "lang")


@query(
    "q_corpus_mix",
    f"""
    WITH web AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 0),
    code AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 1),
    n AS (SELECT (SELECT COUNT(*) FROM web) AS nw, (SELECT COUNT(*) FROM code) AS nc),
    t AS (SELECT LEAST(nw / 0.8, nc / 0.2) AS total, nw, nc FROM n)
    SELECT doc_id, 'web' AS mix_source FROM web, t
    WHERE {_SQL_GATE.format(k='doc_id::VARCHAR', s='web')} <
          CAST(ROUND(LEAST(1.0, 0.8 * total / nw) * 1000000) AS BIGINT)
    UNION ALL
    SELECT doc_id, 'code' AS mix_source FROM code, t
    WHERE {_SQL_GATE.format(k='doc_id::VARCHAR', s='code')} <
          CAST(ROUND(LEAST(1.0, 0.2 * total / nc) * 1000000) AS BIGINT)
    """,
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing: the documents fixture split into two
    pseudo-sources by id parity, remixed 80/20 — the data-mixture step
    of a pretraining pipeline. The oracle replays the full derivation:
    per-source counts, the limiting-source total, the down-sample
    fractions, AND each row's hash-gate decision.

    Scale: one metadata count per source, then narrow filters + UNION
    ALL — the mix never shuffles or up-samples (corpus.mix_corpora)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    web = docs.filter(F.col("doc_id") % 2 == 0)
    code = docs.filter(F.col("doc_id") % 2 == 1)
    return corpus.mix_corpora(
        {"web": web, "code": code},
        {"web": 0.8, "code": 0.2},
        key_col="doc_id",
        source_col="mix_source",
    ).select("doc_id", "mix_source")


@query(
    "q_pack_chunks",
    f"""
    WITH t AS (
      SELECT doc_id,
             len({_SQL_TOKENS.format(c='text')}) AS nt,
             {_SQL_GATE.format(k='doc_id::VARCHAR', s='')} % 8 AS shard
      FROM documents),
    p AS (
      SELECT doc_id,
             CAST(shard * 4294967296 + FLOOR(
               COALESCE(SUM(nt) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512
             ) AS BIGINT) AS pack_id,
             nt
      FROM t)
    SELECT pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS pack_tokens
    FROM p GROUP BY pack_id
    """,
)
def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (contiguous-chunk form) over the documents
    corpus: 8 hash shards, 512-token budget, per-pack doc count and
    token totals. The oracle replays the shard hash, the exclusive
    cumulative sum, and the pack-id arithmetic in window SQL — the
    packing ASSIGNMENT is value-checked, not just pack statistics.

    Scale: ONE shuffle on the shard key; per-shard window sorts are
    independent (corpus.pack_chunks docstring — a single global window
    would serialize the corpus through one task)."""
    docs = text.with_token_stats(_t(spark, sf_dir, "documents"))
    # corpus.pack_chunks shards by token_hash60(order_col) % n_shards and
    # the oracle replays it with % (hash is non-negative, pmod ≡ %)
    packed = corpus.pack_chunks(
        docs, "n_tokens", budget=512, order_col="doc_id", n_shards=8
    )
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("pack_tokens"),
    )


def _redact_oracle() -> str:
    """The operator's PII_PATTERNS replayed verbatim — DuckDB's RE2 and
    Spark's Java regex agree on this (anchorless, ASCII) pattern subset;
    the value compare is exactly what pins that."""
    expr = "text"
    for pat, token in corpus.PII_PATTERNS:
        sql_pat = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sql_pat}', '{token}', 'g')"
    return f"""
    WITH t AS (
      SELECT doc_id,
             'reach user' || doc_id::VARCHAR ||
             '@example.com or 10.0.' || (doc_id % 256)::VARCHAR ||
             '.7 ssn 123-45-6789 ' || text AS text
      FROM documents)
    SELECT doc_id, {expr} AS redacted
    FROM t
    """


@query("q_redact_pii", _redact_oracle())
def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction value-checked byte-for-byte: synthetic PII (a
    per-row email, IP, and SSN) is prepended to every document and the
    ordered regexp_replace chain must produce identical redacted text in
    Spark (Java regex) and DuckDB (RE2) — pinning the patterns to the
    dialect-portable subset.

    Scale: narrow codegen'd column map — no shuffle, no Python
    (plan-asserted in test_redact_pii_plan_is_narrow)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("reach user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 ssn 123-45-6789 "), F.col("text"),
        ).alias("text"),
    )
    return corpus.redact_pii(docs, "text", out="redacted").select("doc_id", "redacted")


def _prepare_pipeline_cte(representative: str = "min_id") -> str:
    """The prepare_corpus pipeline's WITH-prefix (quality scoring →
    exact dedup → capped ladder → components → losers) — ONE SQL
    replica, shared by q_prepare_corpus / q_prepare_corpus_quality here
    and q_attrition_report in queries_batch12 (a formula change edited
    in one oracle but not the other would silently split them)."""
    return _prepare_corpus_oracle(representative, _prefix_only=True)


def _prepare_corpus_oracle(
    representative: str = "min_id", _prefix_only: bool = False
) -> str:
    """The WHOLE prepare_corpus pipeline replayed in one SQL statement:
    quality scoring (q_text_quality's exact formula) → exact dedup
    (min-id per sorted-token-set md5) → the capped MinHash ladder
    (queries_batch9's shared CTE, re-based onto the survivors) →
    recursive-CTE connected components → drop non-representatives →
    the PII regexp chain. Every stage reuses the SQL fragment already
    proven equal to its operator by that operator's own oracle query —
    this one checks the COMPOSITION (stage order and the survivor set
    each stage hands the next). ``representative`` selects the survivor
    rule replayed in the losers CTE (min_id | quality — mirroring
    ``corpus.prepare_corpus``; the quality variant is registered from
    queries_batch12)."""
    toks = _SQL_TOKENS.format(c="text")
    redact = "text"
    for pat, token in corpus.PII_PATTERNS:
        redact = f"regexp_replace({redact}, '{pat.replace(chr(39), chr(39) * 2)}', '{token}', 'g')"
    ladder = _minhash_capped_pairs_cte(
        _MH_THRESHOLD, _MH_BANDS, _MH_ROWS, _MH_CAP
    ).replace("FROM documents)", "FROM base)")
    losers = (
        "SELECT node FROM comp WHERE node <> cid"
        if representative == "min_id"
        else """
      SELECT node FROM (
        SELECT comp.node,
               ROW_NUMBER() OVER (PARTITION BY comp.cid
                 ORDER BY s.quality_score DESC, comp.node) AS rk
        FROM comp JOIN scored s ON s.doc_id = comp.node)
      WHERE rk > 1"""
    )
    return rf"""
    WITH RECURSIVE q0 AS (
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
      SELECT doc_id, text,
             ROUND(CAST(
               (CASE WHEN n_chars_m < 20 THEN 0.0 ELSE 1.0 END) * 0.25
               + (CASE WHEN stopword_ratio >= 0.01 AND stopword_ratio <= 0.6 THEN 1.0 ELSE 0.0 END) * 0.25
               + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END) * 0.25
               + (CASE WHEN alpha_ratio >= 0.5 THEN 1.0 ELSE 0.0 END) * 0.25
               AS DOUBLE), 4) AS quality_score
      FROM q0),
    kept AS (SELECT doc_id, text FROM scored WHERE quality_score >= 0.5),
    fp AS (
      SELECT doc_id, text,
             md5(array_to_string(list_sort({_SQL_TOKSET.format(c='text')}), ' ')) AS f
      FROM kept),
    base AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text, ROW_NUMBER() OVER (PARTITION BY f ORDER BY doc_id) AS rn
        FROM fp)
      WHERE rn = 1),
    {ladder},
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    cc AS (
      SELECT DISTINCT src AS node, src AS label FROM edges
      UNION
      SELECT e.src AS node, cc.label FROM edges e JOIN cc ON cc.node = e.dst),
    comp AS (SELECT node, MIN(label) AS cid FROM cc GROUP BY node),
    losers AS ({losers})""" + (
        ""
        if _prefix_only
        else rf"""
    SELECT doc_id, {redact} AS text
    FROM base WHERE doc_id NOT IN (SELECT node FROM losers)
    """
    )


@query("q_prepare_corpus", _prepare_corpus_oracle())
def q_prepare_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-call training-corpus preparation, end-to-end vs a single
    SQL statement: quality filter (≥0.5) → exact dedup → capped MinHash
    near-dup clustering (the production ladder configuration shared with
    q_minhash_capped_near_dups) → keep each cluster's min-id
    representative → PII redaction. Each stage's algebra is already
    value-checked by its own oracle query; THIS query checks the
    composition — stage order and the survivor set handed down the
    pipeline.

    Scale: see corpus.prepare_corpus — one narrow pass + one partial-agg
    shuffle around the capped ladder, whose 100 TB design is the
    measured one (SCALING.md)."""
    docs = _t_spread(spark, sf_dir, "documents")
    out = corpus.prepare_corpus(
        docs,
        min_quality=0.5,
        near_dup_threshold=_MH_THRESHOLD,
        max_bucket_size=_MH_CAP,
    )
    return out.select("doc_id", "text")


# shingle replay shared by the chunking/contamination/ngram oracles:
# text.shingles(col, n) = word n-grams from the whitespace token array
def _sql_shingles(n: int) -> str:
    return (
        f"list_transform(generate_series(0, GREATEST(len(toks) - {n}, 0)), "
        f"i -> array_to_string(list_slice(toks, i + 1, i + {n}), ' '))"
    )


@query(
    "q_split_documents",
    f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS.format(c='text')} AS toks FROM documents),
    c AS (
      SELECT doc_id, toks,
             GREATEST(CAST(CEIL((len(toks) - 16) / 48.0) AS INT), 1) AS nc
      FROM t)
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           array_to_string(list_slice(toks, i * 48 + 1, i * 48 + 64), ' ') AS chunk_text
    FROM c, LATERAL UNNEST(generate_series(0, nc - 1)) AS u(i)
    """,
)
def q_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking over the corpus: 64-token windows, 16-token
    overlap (step 48). The oracle replays the chunk-count arithmetic,
    the window slicing, AND the rejoined chunk text — so the exact
    token-window contents are value-checked byte-for-byte.

    Scale: narrow per-row array math, 1 row → ceil(n/step) rows, no
    shuffle (corpus.split_documents; posexplode_outer per the
    computed-array rule)."""
    docs = _t(spark, sf_dir, "documents")
    return corpus.split_documents(docs, max_tokens=64, overlap=16)


@query(
    "q_contamination_pairs",
    f"""
    WITH toks_all AS (
      SELECT doc_id, {_SQL_TOKENS.format(c='text')} AS toks FROM documents),
    grams AS (
      SELECT doc_id, g
      FROM (SELECT doc_id, UNNEST(list_distinct({_sql_shingles(8)})) AS g
            FROM toks_all)),
    tr AS (SELECT doc_id AS train_id, g FROM grams WHERE doc_id < 250),
    te AS (SELECT doc_id AS test_id, g FROM grams WHERE doc_id >= 250)
    SELECT test_id, train_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM te JOIN tr USING (g)
    GROUP BY test_id, train_id
    """,
)
def q_contamination_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination: the corpus split into pseudo-train
    (doc_id < 250) and pseudo-eval (≥ 250) halves, cross-joined on
    shared distinct 8-grams — the eval-decontamination step of a
    training pipeline. The oracle replays shingling, distinct, the
    cross-corpus equi-join, and the shared counts. (The operator joins
    on the 60-bit md5 of each gram; the oracle joins on the gram text —
    identical pairs unless md5-60 collides, which the value compare
    would expose.)

    Scale: bucketed equi-join on the n-gram hash, O(corpus × grams/doc)
    shuffle — never |train|×|test| (corpus.contamination_pairs; hot
    boilerplate grams capped via max_bucket_size in production)."""
    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") < 250)
    test = docs.filter(F.col("doc_id") >= 250)
    return corpus.contamination_pairs(train, test, n=8)


@query(
    "q_ngram_counts",
    f"""
    WITH toks_all AS (
      SELECT doc_id, {_SQL_TOKENS.format(c='text')} AS toks FROM documents),
    g AS (
      SELECT UNNEST(list_distinct({_sql_shingles(2)})) AS ngram FROM toks_all)
    SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM g WHERE ngram IS NOT NULL AND ngram <> ''
    GROUP BY ngram
    ORDER BY n_docs DESC, ngram
    LIMIT 20
    """,
)
def q_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams by document frequency (vocabulary /
    boilerplate statistics). Deterministic tiebreak on the ngram itself;
    the oracle replays shingling + distinct-per-doc + the ordered top-k.

    Scale: one partial-agg shuffle on the ngram + TakeOrderedAndProject
    (text.ngram_counts)."""
    docs = _t(spark, sf_dir, "documents")
    return text.ngram_counts(docs, n=2, k=20)


@query(
    "q_funnel_stages",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS v0 FROM events WHERE event_type = 'view'
      GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS c0
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.v0
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS p0
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.c0
      GROUP BY e.user_id)
    SELECT 'view' AS stage, CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_users
    UNION ALL
    SELECT 'view>click', CAST((SELECT COUNT(*) FROM c) AS BIGINT)
    UNION ALL
    SELECT 'view>click>purchase', CAST((SELECT COUNT(*) FROM p) AS BIGINT)
    """,
)
def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: users who viewed, then clicked AFTER
    their first view, then purchased AFTER that click — the ordered
    event-sequence query of product analytics (strictly stronger than
    per-type distinct counts: the ORDER is the semantics).

    Scale: three per-user aggregates, each ONE shuffle on user_id with
    map-side combine; each stage's survivor set (already aggregated,
    one row per user) joins the next — no event-level self-join, no
    collect_list of whole histories."""
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("v0"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v0"))
        .groupBy("user_id").agg(F.min("ts").alias("c0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c0"))
        .groupBy("user_id").agg(F.min("ts").alias("p0"))
    )

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"), F.count(F.lit(1)).alias("n_users")
        )

    return (
        stage("view", v)
        .unionByName(stage("view>click", c))
        .unionByName(stage("view>click>purchase", p))
    )


@query(
    "q_retention_cohorts",
    """
    WITH first_seen AS (
      SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
      FROM events GROUP BY user_id)
    SELECT cohort_week,
           CAST(FLOOR(date_diff('day', cohort_week, date_trunc('week', e.ts)) / 7) AS INT)
             AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY cohort_week, week_offset
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-active week, counted
    distinct in each subsequent week offset — the retention triangle of
    product analytics.

    Scale: one per-user aggregate (first week), joined back (AQE
    broadcasts the per-user frame when it fits, else shuffles on the
    same user_id partitioning the aggregate produced), then a
    two-phase distinct-count on (cohort, offset)."""
    ev = _t(spark, sf_dir, "events")
    # cast to DATE: Spark's date_trunc returns TIMESTAMP, DuckDB's a DATE —
    # the hash compare is on rendered values, so align the type explicitly
    week = F.date_trunc("week", "ts").cast("date")
    first = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    return (
        ev.join(first, "user_id")
        .withColumn(
            "week_offset",
            F.floor(F.datediff(week, F.col("cohort_week")) / 7).cast("int"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )
