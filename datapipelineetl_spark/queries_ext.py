"""Extension queries (SURVEY.md §2.11): dedup, similarity search, text
analysis over the ``documents`` / ``embeddings`` fixtures.

Registered into the same QUERIES/ORACLES dicts as queries.py. Oracle SQL
for the hash-based operators (MinHash, SimHash, fingerprints) reproduces
the engine's md5-derived hash family in ANSI SQL — the oracle is
*equivalent SQL*, so these normally-unverifiable operators are fully
hash-checked rather than rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelineetl_spark.operators import dedup, similarity, text
from datapipelineetl_spark.operators.dedup import MINHASH_COEFFS, MINHASH_P
from datapipelineetl_spark.queries import _t, _t_spread, query

# DuckDB fragments mirroring text.py's primitives exactly.
# list_filter drops the phantom empty edge token on \n/\t-edged text —
# in lockstep with text.tokens()'s post-split filter (NOT trim-then-split,
# which is space-only on both engines).
_SQL_TOKENS = r"list_filter(string_split_regex(lower({c}), '\s+'), x -> x <> '')"
_SQL_TOKSET = f"list_distinct({_SQL_TOKENS})"
_SQL_HASH60 = "('0x' || substr(md5({t}), 1, 15))::BIGINT"


# =============================================================================
# Text analysis
# =============================================================================

@query(
    "q_text_token_stats",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS.format(c='text')} AS toks, text FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INT)                AS n_tokens,
           CAST(len(list_distinct(toks)) AS INT) AS n_distinct_tokens,
           ROUND(list_sum(list_transform(toks, x -> len(x))) * 1.0
                 / GREATEST(len(toks), 1), 4) AS avg_token_len,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_subwords
    FROM t
    """,
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish segment count) — narrow
    projection, zero shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return text.with_token_stats(docs).select(
        "doc_id", "n_tokens", "n_distinct_tokens", "avg_token_len", "n_subwords"
    )


@query(
    "q_text_quality",
    r"""
    WITH t AS (
      SELECT doc_id, text,
             CAST(length(text) AS INT) AS n_chars_m,
             ROUND(len(regexp_extract_all(text, '[^\w\s]')) * 1.0
                   / GREATEST(length(text), 1), 4) AS punct_ratio,
             ROUND(len(list_filter(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''),
                                   x -> x IN ('the','and','of','to','is'))) * 1.0
                   / GREATEST(len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')), 1), 4)
               AS stopword_ratio,
             ROUND(len(regexp_extract_all(text, '[A-Za-z]')) * 1.0
                   / GREATEST(length(text), 1), 4) AS alpha_ratio
      FROM documents)
    SELECT doc_id, n_chars_m, punct_ratio, stopword_ratio, alpha_ratio,
           ROUND(CAST(
             (CASE WHEN n_chars_m < 20 THEN 0.0 ELSE 1.0 END) * 0.25
             + (CASE WHEN stopword_ratio >= 0.01 AND stopword_ratio <= 0.6 THEN 1.0 ELSE 0.0 END) * 0.25
             + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END) * 0.25
             + (CASE WHEN alpha_ratio >= 0.5 THEN 1.0 ELSE 0.0 END) * 0.25
             AS DOUBLE), 4) AS quality_score
    FROM t
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (length / punctuation / stopword / alpha
    ratios + composite score)."""
    docs = _t(spark, sf_dir, "documents")
    return text.with_quality_score(docs).select(
        "doc_id", "n_chars_m", "punct_ratio", "stopword_ratio", "alpha_ratio", "quality_score"
    )


def _lang_oracle() -> str:
    score_cols = ", ".join(
        f"len(list_intersect(ts, [{', '.join(repr(m) for m in markers)}])) AS s_{lang}"
        for lang, markers in text.LANG_MARKERS.items()
    )
    langs = list(text.LANG_MARKERS)
    all_scores = ", ".join(f"s_{la}" for la in langs)
    # declaration order = tiebreak priority: lang L wins if its score beats
    # every earlier lang strictly and every later lang non-strictly.
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} > s_{other}" for other in langs[:i]]
        conds += [f"s_{lang} >= s_{other}" for other in langs[i + 1:]]
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return f"""
    WITH t AS (SELECT doc_id, lang, {_SQL_TOKSET.format(c='text')} AS ts FROM documents),
    s AS (SELECT doc_id, lang, {score_cols} FROM t)
    SELECT doc_id, lang AS lang_label,
           CASE WHEN GREATEST({all_scores}) = 0 THEN 'und' {' '.join(cases)} END AS lang_pred
    FROM s
    """


@query("q_lang_id", _lang_oracle())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword-marker voting) next to the labeled
    ``lang`` for accuracy inspection."""
    docs = _t(spark, sf_dir, "documents")
    return text.with_lang_id(docs).select(
        "doc_id", F.col("lang").alias("lang_label"), "lang_pred"
    )


# =============================================================================
# Dedup
# =============================================================================

@query(
    "q_dedup_token_set",
    rf"""
    WITH f AS (
      SELECT doc_id,
             md5(array_to_string(list_sort({_SQL_TOKSET.format(c='text')}), ' ')) AS ts_fingerprint
      FROM documents)
    SELECT ts_fingerprint, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM f GROUP BY ts_fingerprint
    """,
)
def q_dedup_token_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalized exact dedup: md5 of the sorted token set groups
    word-order/repetition-invariant duplicates in O(n) — one fingerprint
    shuffle, no pairwise work (the Jaccard-1.0 fast path)."""
    docs = text.with_token_set_fingerprint(_t(spark, sf_dir, "documents"))
    return dedup.dedup_by_fingerprint(docs, "ts_fingerprint", ["doc_id"], "doc_id")


def _minhash_sig_sql() -> str:
    terms = ", ".join(
        f"list_min(list_transform(hs, x -> ({a} * x + {b}) % {MINHASH_P}))"
        for a, b in MINHASH_COEFFS
    )
    return f"[{terms}]"


def _minhash_oracle(threshold: float, bands: int, rows: int) -> str:
    h = _SQL_HASH60.format(t="tok")
    band_rows = ", ".join(f"({b})" for b in range(bands))
    return rf"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKSET.format(c='text')} AS ts FROM documents),
    hs AS (
      SELECT doc_id, ts, list_transform(ts, tok -> {h} % {MINHASH_P}) AS hs FROM toks),
    sig AS (
      SELECT doc_id, ts, {_minhash_sig_sql()} AS s FROM hs),
    bands AS (
      SELECT doc_id, band,
             md5(array_to_string(list_slice(s, band * {rows} + 1, band * {rows} + {rows}), ',')) AS bk
      FROM sig, (VALUES {band_rows}) b(band)),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id)
    SELECT id_a, id_b,
           ROUND(len(list_intersect(ta.ts, tb.ts)) * 1.0
                 / GREATEST(len(list_distinct(list_concat(ta.ts, tb.ts))), 1), 6) AS jaccard
    FROM cand JOIN toks ta ON cand.id_a = ta.doc_id
              JOIN toks tb ON cand.id_b = tb.doc_id
    WHERE len(list_intersect(ta.ts, tb.ts)) * 1.0
          / GREATEST(len(list_distinct(list_concat(ta.ts, tb.ts))), 1) >= {threshold}
    """


@query("q_minhash_near_dups", _minhash_oracle(0.7, 4, 4))
def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4 bands × 4 rows) near-dup pairs, exact-Jaccard
    verified at 0.7. The oracle replays the identical signature/banding
    algebra in SQL, so candidate *and* verify stages are hash-checked.

    Scale: signatures are narrow; banding shuffles O(n×4) band keys;
    pairwise Jaccard only on bucket collisions (SURVEY.md §2.11)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.near_dup_pairs(
        docs, "doc_id", "text", threshold=0.7, num_hashes=16, bands=4,
        rows_per_band=4, materialize=True,
    )


def _simhash_sql(bits: int = 32) -> str:
    h = _SQL_HASH60.format(t="tok")
    terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(hs, x -> (x >> {b}) & 1 = 1)) > len(hs) "
        f"THEN {1 << b}::BIGINT ELSE 0 END)"
        for b in range(bits)
    )
    return rf"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKSET.format(c='text')} AS ts FROM documents),
    hs AS (SELECT doc_id, list_transform(ts, tok -> {h}) AS hs FROM toks)
    SELECT doc_id, {terms} AS simhash FROM hs
    """


@query("q_simhash", _simhash_sql())
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document (integer-exact across engines).

    Spread across cores (``_t_spread``): the md5-per-token CPU work
    otherwise serializes through the fixture's single parquet split —
    measured 1.15 → 0.84 s warm at sf0.1."""
    docs = _t_spread(spark, sf_dir, "documents")
    return text.with_simhash(docs).select("doc_id", "simhash")


# =============================================================================
# Similarity search
# =============================================================================

def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    from datapipelineetl_spark import catalog

    row = (
        catalog.load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return list(row.embedding)


_COSINE_ORACLE_TOPK = """
    WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
    ex AS (SELECT vec_id, UNNEST(embedding)::DOUBLE AS x,
                  generate_subscripts(embedding, 1) AS i FROM embeddings),
    qx AS (SELECT UNNEST(e)::DOUBLE AS x, generate_subscripts(e, 1) AS i FROM q),
    d AS (SELECT vec_id, SUM(ex.x * qx.x) AS dp, SQRT(SUM(ex.x * ex.x)) AS na
          FROM ex JOIN qx USING (i) GROUP BY vec_id),
    nq AS (SELECT SQRT(SUM(x * x)) AS n FROM qx)
    SELECT vec_id, ROUND(dp / (na * (SELECT n FROM nq)), 4) AS cos_sim
    FROM d WHERE vec_id <> 0
    ORDER BY cos_sim DESC, vec_id LIMIT 10
"""


@query("q_cosine_topk", _COSINE_ORACLE_TOPK)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors of vec_id 0 — brute-force baseline.
    Narrow scoring + TakeOrderedAndProject (per-partition k-heap)."""
    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    return similarity.cosine_topk(emb, qv, k=10, exclude_ids=(0,))


@query(
    "q_cosine_near_pairs",
    """
    WITH ex AS (SELECT vec_id, UNNEST(embedding)::DOUBLE AS x,
                       generate_subscripts(embedding, 1) AS i FROM embeddings),
    d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 SUM(a.x * b.x) AS dp,
                 SQRT(SUM(a.x * a.x)) AS na, SQRT(SUM(b.x * b.x)) AS nb
          FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
          GROUP BY a.vec_id, b.vec_id)
    SELECT id_a, id_b, ROUND(dp / (na * nb), 4) AS cos_sim
    FROM d WHERE ROUND(dp / (na * nb), 4) >= 0.45
    """,
)
def q_cosine_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.45) — the exact
    all-pairs baseline the LSH-bucketed path (similarity.ann_lsh_topk) is
    measured against."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_pairs(emb, 0.45)


@query(
    "q_ann_recall",
    """
    SELECT 10 AS k, TRUE AS recall_ge_090
    """,
)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 gate for the ANN path: |ANN top-10 ∩ exact top-10| / 10
    against the same probe vector used by q_ann_lsh_topk, emitted as a
    boolean threshold check (≥ 0.9) so DuckDB can verify it as a
    constant — converting the rows-only ANN check into a real gate
    (VERDICT.md round-1 item 7).

    Deterministic: hyperplanes are seed-derived and the exact baseline is
    brute-force, so the recall value is a pure function of the fixture.

    Scale: both sides are top-k probes (narrow scan + per-partition
    k-heap; ANN touches only Hamming≤1 buckets); the intersection is a
    10×10 broadcast semi-join. Nothing here is O(n²).
    """
    emb = _t(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    probe = [(1.0 if i % 7 == 0 else 0.1) for i in range(dim)]
    exact = similarity.cosine_topk(emb, probe, k=10).select("vec_id")
    # 8 tables × 8 planes, Hamming≤2: measured recall 1.0 on the fixture
    # (near-uniform vectors — the hardest case for LSH; a clustered real
    # corpus reaches the same recall with 1–2 tables and far less probing)
    ann = similarity.ann_lsh_topk(
        emb, probe, k=10, num_planes=8, num_tables=8, radius=2
    ).select("vec_id")
    hits = ann.join(F.broadcast(exact), "vec_id", "semi")
    return hits.agg(
        F.lit(10).alias("k"),
        (F.count(F.lit(1)) >= F.lit(9)).alias("recall_ge_090"),
    )
