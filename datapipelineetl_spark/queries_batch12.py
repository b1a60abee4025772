"""Twelfth query battery — STAGED for the round-7 verify window.

Oracle-paired queries for the two §2.11 corpus operators that until now
had tests but no oracle query (VERDICT r5 item 3): ``pack_greedy`` (the
exact-greedy sequence packer — its reset-on-overflow recurrence replays
as a DuckDB recursive CTE) and ``remove_boilerplate_lines`` (the
C4-style shared-line scrub — its doc-frequency threshold and ordered
text rebuild replay in window/aggregate SQL).

Same staging contract as queries_batch11 (round 5): separate dicts so
importing this module cannot grow the live ``queries()`` surface
mid-round; ``tests/test_corpus_oracles.py`` runs the driver-style
comparison locally; ``register()`` promotes them when the r7 window has
slots (the r6 window is fully committed to the batch-11 promotions plus
the 40 rotating r4-green queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelineetl_spark.operators import corpus, dedup, text
from datapipelineetl_spark.queries import _t, _t_spread
from datapipelineetl_spark.queries import QUERIES as _GLOBAL_QUERIES
from datapipelineetl_spark.queries import ORACLES as _GLOBAL_ORACLES
from datapipelineetl_spark.queries_ext import _SQL_TOKENS
from datapipelineetl_spark import queries_batch11 as _b11

# the sampling gate replay (corpus._hash_gate) — ONE definition, shared
# with queries_batch11 so a gate change can never update only one copy
_SQL_GATE12 = _b11._SQL_GATE

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
    """Round-7 wiring: promote the staged queries into the live registry
    (call from __spark_entry__ next to the batch-11 register, then give
    them window slots)."""
    _GLOBAL_QUERIES.update(STAGED_QUERIES)
    _GLOBAL_ORACLES.update(STAGED_ORACLES)


@query(
    "q_pack_greedy",
    f"""
    WITH RECURSIVE t0 AS (
      SELECT doc_id,
             len({_SQL_TOKENS.format(c='text')}) AS nt,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 8 AS shard
      FROM documents),
    t AS (
      SELECT doc_id, nt, shard,
             ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      FROM t0),
    g AS (
      SELECT shard, rn, doc_id, nt,
             nt AS fill, CAST(0 AS BIGINT) AS pack
      FROM t WHERE rn = 1
      UNION ALL
      SELECT t.shard, t.rn, t.doc_id, t.nt,
             CASE WHEN g.fill > 0 AND g.fill + t.nt > 512
                  THEN t.nt ELSE g.fill + t.nt END,
             CASE WHEN g.fill > 0 AND g.fill + t.nt > 512
                  THEN g.pack + 1 ELSE g.pack END
      FROM t JOIN g ON t.shard = g.shard AND t.rn = g.rn + 1)
    SELECT doc_id, CAST(shard * 4294967296 + pack AS BIGINT) AS pack_id
    FROM g
    """,
)
def q_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-greedy sequence packing over the documents corpus: 8 hash
    shards, 512-token budget; within a shard (doc_id order) a pack
    closes when the next document would overflow it — the oracle replays
    the data-dependent reset recurrence as a per-shard recursive CTE
    (fill' = t if fill>0 and fill+t>B else fill+t), so every PACK
    ASSIGNMENT is value-checked row by row, including the single-doc-
    over-budget case (fill>0 guard, `corpus.pack_greedy`'s `if fill`).

    Scale: the engine side is ONE shuffle on the shard hash, then a
    sequential Arrow pass per shard with two integers of state
    (`corpus.pack_greedy` — applyInPandas because no window function
    expresses reset-on-condition). The oracle's recursive CTE is
    O(rows) per shard too, but single-threaded — it exists to pin
    semantics at fixture scale, not as a scale path."""
    docs = text.with_token_stats(_t(spark, sf_dir, "documents"))
    packed = corpus.pack_greedy(
        docs, id_col="doc_id", token_col="n_tokens", budget=512, n_shards=8
    )
    return packed.select("doc_id", "pack_id")


# the boilerplate fixture needs boilerplate: a header line shared by ALL
# docs (must be removed), a rare line on ~1/97 of docs (must stay), the
# original text in between. Replayed identically on both sides.
_BOILER_DOC = (
    "SELECT doc_id, 'COOKIE BANNER - ACCEPT ALL' || chr(10) || text || "
    "CASE WHEN doc_id % 97 = 0 THEN chr(10) || 'rare footer line' ELSE '' END"
    " AS text FROM documents"
)


@query(
    "q_boilerplate_removal",
    f"""
    WITH src AS ({_BOILER_DOC}),
    params AS (
      SELECT GREATEST(2, CAST(FLOOR(0.2 * COUNT(*)) AS BIGINT)) + 1 AS thr
      FROM src),
    lines AS (
      SELECT doc_id, i AS idx, parts[i + 1] AS line
      FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM src),
           LATERAL UNNEST(generate_series(0, len(parts) - 1)) AS u(i)),
    boiler AS (
      SELECT key FROM (
        SELECT DISTINCT doc_id,
               regexp_replace(line, '^\\s+|\\s+$', '', 'g') AS key FROM lines
        WHERE regexp_replace(line, '^\\s+|\\s+$', '', 'g') <> '')
      GROUP BY key HAVING COUNT(*) >= (SELECT thr FROM params)),
    kept AS (
      SELECT * FROM lines
      WHERE regexp_replace(line, '^\\s+|\\s+$', '', 'g')
            NOT IN (SELECT key FROM boiler)),
    rebuilt AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS text
      FROM kept GROUP BY doc_id)
    SELECT s.doc_id, COALESCE(r.text, '') AS text
    FROM src s LEFT JOIN rebuilt r ON s.doc_id = r.doc_id
    """,
)
def q_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate line removal, value-checked byte-for-byte on
    the rebuilt text: a synthetic cookie-banner line is prepended to
    EVERY document (must be deleted everywhere — above the 20% doc-
    frequency threshold) and a rare footer is appended to ~1% of
    documents (must survive — below it); the original lines keep their
    order. The oracle replays the trimmed-line doc-frequency, the
    exclusive threshold (strictly more than max(min_docs, frac×N)), the
    anti-join, and the index-ordered rejoin.

    Scale: O(total lines) narrow explode, one partial-agg shuffle for
    line doc-frequency, broadcast-able boilerplate set, one groupBy(doc)
    with in-aggregate sorted rebuild (`corpus.remove_boilerplate_lines`
    docstring)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("COOKIE BANNER - ACCEPT ALL\n"),
            F.col("text"),
            F.when(F.col("doc_id") % 97 == 0, F.lit("\nrare footer line"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return corpus.remove_boilerplate_lines(
        docs, max_doc_frac=0.2, min_docs=2
    ).select("doc_id", "text")


# the repetition fixture needs repetition: a duplicated line pair appended
# to every 5th doc; gram repeats occur naturally in the synthetic text.
_REP_DOC = (
    "SELECT doc_id, text || CASE WHEN doc_id % 5 = 0 THEN "
    "chr(10) || 'repeated boiler line' || chr(10) || 'repeated boiler line' "
    "ELSE '' END AS text FROM documents"
)


def _rep_oracle() -> str:
    toks = _SQL_TOKENS.format(c="text")
    # full whitespace strip per line (regexp, not trim: spaces-only) —
    # lockstep with corpus.repetition_stats' engine-side regexp_replace
    lines = (
        "list_filter(list_transform(string_split(text, chr(10)), "
        r"x -> regexp_replace(x, '^\s+|\s+$', '', 'g')), x -> x <> '')"
    )
    chars = "COALESCE(list_aggregate(list_transform({l}, x -> length(x)), 'sum'), 0)"

    def gram_frac(n: int) -> str:
        g = (
            f"list_transform(generate_series(0, GREATEST(len(toks) - {n}, 0)), "
            f"i -> array_to_string(list_slice(toks, i + 1, i + {n}), ' '))"
        )
        return (
            f"ROUND(CASE WHEN len(toks) >= {n} THEN "
            f"(len({g}) - len(list_distinct({g}))) * 1.0 / GREATEST(len({g}), 1) "
            f"ELSE 0.0 END, 4) AS dup_{n}gram_frac"
        )

    return f"""
    WITH src AS ({_REP_DOC}),
    t AS (SELECT doc_id, {toks} AS toks, {lines} AS l FROM src)
    SELECT doc_id,
           ROUND((len(l) - len(list_distinct(l))) * 1.0
                 / GREATEST(len(l), 1), 4) AS dup_line_frac,
           ROUND(({chars.format(l='l')} - {chars.format(l='list_distinct(l)')}) * 1.0
                 / GREATEST({chars.format(l='l')}, 1), 4) AS dup_line_char_frac,
           {gram_frac(2)},
           {gram_frac(3)}
    FROM t
    """


@query("q_repetition_stats", _rep_oracle())
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition metrics (duplicate-line
    fraction by count and by characters, duplicate word 2-/3-gram
    fractions), with a duplicated line pair injected into every 5th
    document so both branches of each ratio are exercised. Every ratio
    is value-checked per row against the SQL replay of the same
    split/trim/distinct/length-sum pipeline.

    Scale: the OPERATOR is narrow per-row array math in codegen (no
    explode, no Python); the query's only Exchange is the `_t_spread`
    round-robin that spreads the single-file fixture across cores —
    measured 6.1 → 1.1 s warm at sf0.1 (the SCALING.md r7-EXPECTED
    number)."""
    docs = _t_spread(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.lit("\nrepeated boiler line\nrepeated boiler line"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return corpus.repetition_stats(docs).select(
        "doc_id", "dup_line_frac", "dup_line_char_frac",
        "dup_2gram_frac", "dup_3gram_frac",
    )


@query(
    "q_semantic_dupes",
    """
    WITH RECURSIVE ex AS (
      SELECT vec_id, UNNEST(embedding)::DOUBLE AS x,
             generate_subscripts(embedding, 1) AS i FROM embeddings),
    d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 SUM(a.x * b.x) AS dp,
                 SQRT(SUM(a.x * a.x)) AS na, SQRT(SUM(b.x * b.x)) AS nb
          FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
          GROUP BY a.vec_id, b.vec_id),
    pairs AS (SELECT id_a, id_b FROM d WHERE ROUND(dp / (na * nb), 4) >= 0.45),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    cc AS (
      SELECT DISTINCT src AS node, src AS label FROM edges
      UNION
      SELECT e.src AS node, cc.label FROM edges e JOIN cc ON cc.node = e.dst)
    SELECT node AS vec_id
    FROM (SELECT node, MIN(label) AS cid FROM cc GROUP BY node)
    WHERE node <> cid
    """,
)
def q_semantic_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style embedding near-duplicate drop list at cosine 0.45
    (the q_cosine_near_pairs threshold): exact all-pairs → connected
    components → every non-minimum member listed for removal. The oracle
    replays the brute-force cosine join and the component formation as a
    recursive CTE, so the DROP SET is value-checked exactly.

    Scale: the registered form uses the exact baseline for oracle
    parity; `dedup.semantic_dupes` defaults to the LSH-bucketed pair
    path (one Arrow signature pass + equi-join + skew cap) with the same
    output contract — the production route at corpus scale."""
    emb = _t(spark, sf_dir, "embeddings")
    return dedup.semantic_dupes(emb, 0.45, exact=True)


@query("q_prepare_corpus_quality", _b11._prepare_corpus_oracle("quality"))
def q_prepare_corpus_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """prepare_corpus with the QUALITY-ranked representative rule: each
    near-dup cluster keeps its highest-quality member (ties → min id)
    instead of the min id — the production preference (keep the best-
    written copy). The oracle is the same one-statement pipeline replay
    as q_prepare_corpus with only the losers CTE swapped to a
    per-component quality rank, so the two registered variants pin that
    the representative rule — and nothing else — differs.

    Scale: identical to q_prepare_corpus plus one window over the
    (id, cluster, score) metadata frame (corpus.prepare_corpus
    docstring)."""
    docs = _t_spread(spark, sf_dir, "documents")
    out = corpus.prepare_corpus(
        docs,
        min_quality=0.5,
        near_dup_threshold=_b11._MH_THRESHOLD,
        max_bucket_size=_b11._MH_CAP,
        representative="quality",
    )
    return out.select("doc_id", "text")


@query(
    "q_extract_keywords",
    f"""
    WITH terms AS (
      SELECT doc_id, UNNEST({_SQL_TOKENS.format(c='text')}) AS token FROM documents),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM terms WHERE token <> '' GROUP BY 1, 2),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, token, ROUND(tf * ln(n_docs * 1.0 / df), 6) AS tf_idf_r
      FROM tf JOIN dfreq USING (token), n),
    ranked AS (
      SELECT doc_id, token, tf_idf_r,
             ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY tf_idf_r DESC, token) AS keyword_rank
      FROM scored)
    SELECT doc_id, CAST(keyword_rank AS INT) AS keyword_rank,
           token AS keyword, tf_idf_r
    FROM ranked WHERE keyword_rank <= 5
    """,
)
def q_extract_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 TF-IDF keywords: q_tf_idf's scoring replay plus
    a per-doc rank window — every (doc, rank, keyword, score) tuple
    value-checked. Score rounds to 6 places BEFORE ranking so the order
    is identical across engines (ln ulp differences).

    Scale: tf_idf's shrinking shuffles + one window shuffle on the doc
    key (text.extract_keywords docstring)."""
    docs = _t(spark, sf_dir, "documents")
    out = text.extract_keywords(docs, k=5)
    return out.withColumn("keyword_rank", F.col("keyword_rank").cast("int"))


@query(
    "q_user_hour_anomalies",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT user_id, AVG(n_events) AS user_mean FROM hourly GROUP BY 1)
    SELECT h.user_id, h.hour, h.n_events, ROUND(s.user_mean, 4) AS user_mean
    FROM hourly h JOIN stats s ON h.user_id = s.user_id
    WHERE h.n_events > 1.5 * s.user_mean
    """,
)
def q_user_hour_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity-spike detection: hours where a user's event
    count exceeds 1.5× their own hourly mean — the self-baselined anomaly
    shape of product/abuse analytics. The threshold is exact IEEE
    arithmetic on both engines (integer sums, one division, one
    exact 1.5× product), so the FLAGGED SET is deterministic cross-engine — no
    stddev accumulation-order hazard.

    Scale: one partial-agg shuffle to (user, hour), one to (user), and
    a join back on user_id that AQE broadcasts when the per-user frame
    fits; all frames shrink monotonically."""
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    stats = hourly.groupBy("user_id").agg(F.avg("n_events").alias("user_mean"))
    return (
        hourly.join(stats, "user_id")
        .filter(F.col("n_events") > 1.5 * F.col("user_mean"))
        .select(
            "user_id", "hour", "n_events", F.round("user_mean", 4).alias("user_mean")
        )
    )


_SQL_VOCAB = f"""
    terms AS (
      SELECT UNNEST({_SQL_TOKENS.format(c='text')}) AS token FROM documents),
    counts AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS count FROM terms
      WHERE token <> '' AND token NOT IN ('<pad>', '<unk>')
      GROUP BY token),
    vocab AS (
      SELECT '<pad>' AS token, CAST(0 AS BIGINT) AS token_id, CAST(0 AS BIGINT) AS count
      UNION ALL
      SELECT '<unk>', 1, 0
      UNION ALL
      SELECT token,
             CAST(ROW_NUMBER() OVER (ORDER BY count DESC, token) + 1 AS BIGINT),
             count
      FROM counts)
"""


# per-doc id-encoding replay shared by q_encode_tokens / q_pack_sequences:
# tokenize via the ONE _SQL_TOKENS fragment, LEFT-join the vocab, list in
# token order, and restore empty/whitespace/NULL-text docs as EMPTY
# sequences — matching text.encode_tokens' no-silent-drop contract (a
# WHERE-filtered doc would otherwise vanish from enc and, downstream,
# from q_pack_sequences' packs and n_docs)
_SQL_ENC = f"""
    toks AS (
      SELECT doc_id, UNNEST(arr) AS token, generate_subscripts(arr, 1) AS pos
      FROM (SELECT doc_id, {_SQL_TOKENS.format(c='text')} AS arr
            FROM documents)),
    enc0 AS (
      SELECT doc_id, list(COALESCE(v.token_id, 1) ORDER BY t.pos) AS input_ids
      FROM toks t LEFT JOIN vocab v USING (token)
      WHERE t.token <> ''
      GROUP BY doc_id),
    enc AS (
      SELECT d.doc_id, COALESCE(e.input_ids, []) AS input_ids
      FROM documents d LEFT JOIN enc0 e ON d.doc_id = e.doc_id)
"""


@query("q_build_vocab", f"WITH {_SQL_VOCAB} SELECT token, token_id, count FROM vocab")
def q_build_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary build: dense ids, specials first, then count
    descending with the token as tiebreak — every (token, id, count)
    triple value-checked, so the ID ASSIGNMENT itself (what the encoder
    depends on) is pinned cross-engine.

    Scale: one token-count shuffle + one vocabulary-sized rank window
    (text.build_vocab docstring)."""
    docs = _t(spark, sf_dir, "documents")
    return text.build_vocab(docs)


@query(
    "q_encode_tokens",
    f"""
    WITH {_SQL_VOCAB},
    {_SQL_ENC}
    SELECT doc_id,
           md5(array_to_string(input_ids, ',')) AS ids_digest,
           CAST(len(input_ids) AS INT) AS n_tokens
    FROM enc
    """,
)
def q_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-id encoding of every document against the corpus-built
    vocabulary (the text→tensor boundary): per-doc id sequences in
    original token order, OOV → <unk>. The oracle replays the vocabulary
    AND the ordered encoding; the sequence ships as an md5 digest of the
    comma-joined ids (arrays are not driver-hashable — the r7 lesson,
    same pattern as q_winnowing_fingerprints), which still pins every
    token-id at every position: any positional drift breaks the digest.

    Scale: explode + one broadcastable vocab join + in-aggregate sorted
    rebuild — no per-doc window (text.encode_tokens docstring)."""
    docs = _t(spark, sf_dir, "documents")
    vocab = text.build_vocab(docs)
    enc = text.encode_tokens(docs, vocab)
    return enc.select(
        "doc_id",
        F.md5(F.array_join(F.col("input_ids").cast("array<string>"), ",")).alias(
            "ids_digest"
        ),
        F.size("input_ids").cast("int").alias("n_tokens"),
    )


@query(
    "q_pack_sequences",
    f"""
    WITH {_SQL_VOCAB},
    {_SQL_ENC},
    lens AS (
      SELECT doc_id, input_ids, len(input_ids) AS nt,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 8 AS shard
      FROM enc),
    assigned AS (
      SELECT doc_id, input_ids, nt,
             CAST(shard * 4294967296 + FLOOR(
               COALESCE(SUM(nt) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512
             ) AS BIGINT) AS pack_id
      FROM lens)
    SELECT pack_id,
           md5(array_to_string(flatten(list(input_ids ORDER BY doc_id)), ','))
             AS token_digest,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS n_tokens
    FROM assigned GROUP BY pack_id
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete text→tensor pipeline in one query: corpus vocabulary
    → per-doc id encoding → contiguous packing on REAL sequence lengths
    → per-pack concatenated id arrays. The oracle replays everything
    down to the exact token-id at every position of every pack; the
    per-pack tensor ships as an md5 digest of the comma-joined ids
    (arrays are not driver-hashable — the r7 lesson, same pattern as
    q_winnowing_fingerprints), so if any stage (vocab ranks, encoding
    order, shard hash, cumulative-sum pack assignment, flatten order)
    drifted, the digest breaks.

    Scale: see corpus.pack_sequences — one shard shuffle + one pack
    groupBy with in-aggregate ordered flatten."""
    docs = _t(spark, sf_dir, "documents")
    vocab = text.build_vocab(docs)
    enc = text.encode_tokens(docs, vocab)
    packs = corpus.pack_sequences(enc, budget=512, n_shards=8)
    return packs.select(
        "pack_id",
        F.md5(F.array_join(F.col("token_ids").cast("array<string>"), ",")).alias(
            "token_digest"
        ),
        "n_docs",
        "n_tokens",
    )


@query(
    "q_split_corpus",
    f"""
    SELECT doc_id,
           CASE
             WHEN {_SQL_GATE12.format(k='doc_id::VARCHAR', s='v1')} < 980000 THEN 'train'
             WHEN {_SQL_GATE12.format(k='doc_id::VARCHAR', s='v1')} < 990000 THEN 'val'
             ELSE 'test'
           END AS split
    FROM documents
    """,
)
def q_split_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjoint-exhaustive train/val/test split (98/1/1, salt 'v1'):
    every row's BAND ASSIGNMENT is value-checked — the oracle replays
    the hash gate and the cumulative thresholds, so the exact membership
    of each split (what reproducibility means here) is pinned
    cross-engine.

    Scale: narrow CASE over the hash gate — no shuffle
    (corpus.split_corpus)."""
    docs = _t(spark, sf_dir, "documents")
    return corpus.split_corpus(
        docs, {"train": 0.98, "val": 0.01, "test": 0.01}, key_col="doc_id", salt="v1"
    ).select("doc_id", "split")


@query(
    "q_attrition_report",
    f"""
    {_b11._prepare_pipeline_cte("min_id")},
    n AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n0,
             (SELECT COUNT(*) FROM kept) AS n1,
             (SELECT COUNT(*) FROM base) AS n2,
             (SELECT COUNT(*) FROM base WHERE doc_id NOT IN (SELECT node FROM losers)) AS n3)
    SELECT '0_input' AS stage, CAST(n0 AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_dropped FROM n
    UNION ALL SELECT '1_quality_lang', CAST(n1 AS BIGINT), CAST(n0 - n1 AS BIGINT) FROM n
    UNION ALL SELECT '2_exact_dedup', CAST(n2 AS BIGINT), CAST(n1 - n2 AS BIGINT) FROM n
    UNION ALL SELECT '3_near_dedup', CAST(n3 AS BIGINT), CAST(n2 - n3 AS BIGINT) FROM n
    """,
)
def q_attrition_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage attrition of the prepare_corpus ladder on the fixture
    corpus (the "where did my documents go" diagnostic): all four stage
    counts and their drops value-checked against the full SQL replay of
    the pipeline — a count drifting at ANY stage breaks the compare.

    Scale: metadata counts over prepare_corpus's own checkpointed
    lineage (corpus.attrition_report docstring)."""
    docs = _t_spread(spark, sf_dir, "documents")
    return corpus.attrition_report(
        docs, min_quality=0.5,
        near_dup_threshold=_b11._MH_THRESHOLD,
        max_bucket_size=_b11._MH_CAP,
    )
