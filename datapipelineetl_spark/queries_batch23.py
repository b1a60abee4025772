"""Twenty-third query battery — STAGED in round 15 for the round-16
verify window (alongside batch 22).

Round-15 depth: the multimodal surface's REAL measurement tier gets
driver-facing value oracles —

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
- ``q_audio_stats`` — the audio twin: `multimodal.audio_stats` over
  8-bit mono PCM WAVs built from document bytes (`_wav_samples`' real
  RIFF walk), DC offset / peak / RMS replayed sample for sample with
  the same nibble arithmetic (centered samples = byte − 128).

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


# 8-bit mono PCM: 32 data bytes at 8 kHz — centered convention makes
# each sample value (byte − 128), all stats exact-int replayable
_AS_N = 32
_AS_SR = 8000

import struct as _struct  # noqa: E402

_AS_HEADER = (
    b"RIFF" + _struct.pack("<I", 36 + _AS_N) + b"WAVE"
    + b"fmt " + _struct.pack("<I", 16)
    + _struct.pack("<HHIIHH", 1, 1, _AS_SR, _AS_SR, 1, 8)
    + b"data" + _struct.pack("<I", _AS_N)
)


@query(
    "q_audio_stats",
    f"""
    WITH src AS (
      SELECT doc_id AS media_id, hex(encode(text)) AS hx
      FROM documents
      WHERE octet_length(encode(text)) >= {_AS_N}),
    vals AS (
      SELECT media_id,
             list_transform(generate_series(1, {_AS_N}),
                            i -> ({_HEXB}) - 128) AS v
      FROM src)
    SELECT media_id,
           {_AS_SR} AS sample_rate, 1 AS n_channels, 8 AS bit_depth,
           CAST({_AS_N} AS BIGINT) AS n_frames,
           CAST({_AS_N * 1000 // _AS_SR} AS BIGINT) AS duration_ms,
           CAST(list_sum(v) AS DOUBLE) / {_AS_N}.0 AS mean_sample,
           CAST(list_max(list_transform(v, x -> abs(x))) AS INT) AS peak_abs,
           sqrt(CAST(list_sum(list_transform(v, x -> x * x)) AS DOUBLE)
                / {_AS_N}.0) AS rms,
           TRUE AS valid
    FROM vals
    """,
)
def q_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio sample statistics value-checked cross-engine — the
    audio twin of q_image_stats: each document's first {0} text bytes
    become the data chunk of an 8-bit mono {1} Hz PCM WAV,
    `multimodal.audio_stats` decodes the ACTUAL samples through the
    real RIFF walk (`_wav_samples`, centered convention: sample =
    byte − 128) and emits frame count, exact duration, DC offset, peak
    amplitude and RMS loudness — and the oracle re-derives every
    sample from the hex payload with nibble arithmetic and replays
    each measure: the mean and RMS radicand as exact int-sum / {0}
    IEEE divisions, sqrt correctly rounded in both engines. With this
    the REAL-decode envelope is value-checked in all three modalities
    the surface models (pixels: q_resize_media/q_image_stats, audio:
    here, video: q_frame_sample_plan).

    Scale: Arrow-batched mapInPandas; waveform bytes never leave the
    executor — 8 scalars per clip do."""
    from datapipelineetl_spark.operators import multimodal  # noqa: PLC0415

    payload = F.encode("text", "UTF-8")
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.length(payload) >= _AS_N)
        .select(
            F.col("doc_id").alias("media_id"),
            F.concat(
                F.lit(_AS_HEADER), F.substring(payload, 1, _AS_N)
            ).alias("payload"),
        )
    )
    return multimodal.audio_stats(docs)


q_audio_stats.__doc__ = q_audio_stats.__doc__.format(_AS_N, _AS_SR)
