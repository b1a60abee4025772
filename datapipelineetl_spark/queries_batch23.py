"""Twenty-third query battery — STAGED in round 15 for the round-16
verify window (alongside batch 22).

Round-15 depth: the multimodal surface's REAL-pixel measurement tier
gets a driver-facing value oracle —

- ``q_image_stats`` — `multimodal.image_stats` (per-channel
  mean/min/max over ACTUAL decoded pixels, the brightness/uniformity
  feature tier an image-corpus pipeline filters on) run over P6
  payloads built from document bytes; the oracle re-derives every
  byte value from the hex payload (nibble arithmetic), regroups the
  channels, and replays each mean as the identical exact
  int-sum / n IEEE division plus each min/max — so the whole
  decode → stats kernel path is value-checked cross-engine, the
  q_resize_media pixels-not-just-metadata guarantee extended from
  bytes-out to statistics-out.

Same staging contract as batches 11–22: separate dicts so importing
this module cannot grow the live ``queries()`` surface mid-round;
``tests/test_corpus_oracles.py`` runs the driver-style comparison
locally; ``register()`` promotes when the r16 window has slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelineetl_spark.queries import _t

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
    """Round-16 wiring: promote the staged queries into the live
    registry (call from __spark_entry__ next to the batch-22 register,
    then give them window slots via tools/rotate_window.py)."""
    from datapipelineetl_spark.queries import ORACLES as _GLOBAL_ORACLES
    from datapipelineetl_spark.queries import QUERIES as _GLOBAL_QUERIES

    _GLOBAL_QUERIES.update(STAGED_QUERIES)
    _GLOBAL_ORACLES.update(STAGED_ORACLES)


# 4x3 RGB image from each document's first 36 text bytes — the
# q_resize_media payload geometry, reused so the two multimodal value
# oracles pin the same construction at two different kernel outputs
_IS_W, _IS_H = 4, 3
_IS_PX = _IS_W * _IS_H * 3  # 36 raw bytes
_IS_N = _IS_W * _IS_H       # 12 pixels per channel

# hex nibble pair i (1-based byte index) → byte value, replayed with
# strpos arithmetic over DuckDB's uppercase hex()
_HEXB = (
    "(strpos('0123456789ABCDEF', substring(hx, 2*i-1, 1)) - 1) * 16"
    " + (strpos('0123456789ABCDEF', substring(hx, 2*i, 1)) - 1)"
)


@query(
    "q_image_stats",
    f"""
    WITH src AS (
      SELECT doc_id AS media_id, hex(encode(text)) AS hx
      FROM documents
      WHERE octet_length(encode(text)) >= {_IS_PX}),
    bytes AS (
      SELECT media_id,
             list_transform(generate_series(1, {_IS_PX}),
                            i -> {_HEXB}) AS bv
      FROM src),
    ch AS (
      SELECT media_id,
        list_transform(generate_series(0, {_IS_N - 1}), k -> bv[3*k + 1]) AS r,
        list_transform(generate_series(0, {_IS_N - 1}), k -> bv[3*k + 2]) AS g,
        list_transform(generate_series(0, {_IS_N - 1}), k -> bv[3*k + 3]) AS b
      FROM bytes)
    SELECT media_id, 'ppm' AS detected_format,
           {_IS_W} AS width, {_IS_H} AS height,
           CAST({_IS_N} AS BIGINT) AS n_pixels,
           CAST(list_sum(r) AS DOUBLE) / {_IS_N}.0 AS mean_r,
           CAST(list_sum(g) AS DOUBLE) / {_IS_N}.0 AS mean_g,
           CAST(list_sum(b) AS DOUBLE) / {_IS_N}.0 AS mean_b,
           CAST(list_min(r) AS INT) AS min_r,
           CAST(list_min(g) AS INT) AS min_g,
           CAST(list_min(b) AS INT) AS min_b,
           CAST(list_max(r) AS INT) AS max_r,
           CAST(list_max(g) AS INT) AS max_g,
           CAST(list_max(b) AS INT) AS max_b,
           TRUE AS valid
    FROM ch
    """,
)
def q_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel statistics value-checked cross-engine: each
    document's first {0} text bytes become a {1}×{2} P6 payload (the
    q_resize_media construction), `multimodal.image_stats` decodes the
    ACTUAL pixels through the real P6 parser and emits per-channel
    mean/min/max — and the oracle re-derives every byte from the hex
    payload with nibble arithmetic, regroups the channels, and replays
    each mean as the SAME exact int-sum / {3} IEEE division. The
    multimodal measurement tier's first driver-facing value check
    (tests additionally pin PNG/GIF payloads of identical pixels to
    identical stats — SQL can't replay zlib/LZW, the P6 leg stands in
    for the shared post-decode kernel).

    Scale: Arrow-batched mapInPandas; payload bytes never leave the
    executor — 13 scalars per image do."""
    from datapipelineetl_spark.operators import multimodal  # noqa: PLC0415

    payload = F.encode("text", "UTF-8")
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.length(payload) >= _IS_PX)
        .select(
            F.col("doc_id").alias("media_id"),
            F.concat(
                F.encode(F.lit(f"P6\n{_IS_W} {_IS_H}\n255\n"), "UTF-8"),
                F.substring(payload, 1, _IS_PX),
            ).alias("payload"),
        )
    )
    return multimodal.image_stats(docs)


q_image_stats.__doc__ = q_image_stats.__doc__.format(
    _IS_PX, _IS_W, _IS_H, _IS_N
)
