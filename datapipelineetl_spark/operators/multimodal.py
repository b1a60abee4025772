"""Multimodal column plumbing (SURVEY.md §2.11): image/audio/video as
opaque ``binary`` columns + typed metadata, processed via Arrow-batched
``mapInPandas``.

The decode/feature kernels are STUBBED (the container has no image/audio
libraries): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (bytes → shape +
checksum-derived features) exercises the real Spark-side plumbing — schema
evolution, Arrow batch shapes, partition sizing — which is the part that
has to be right at 100 TB. Swap the kernel body for PIL/ffmpeg at
deployment; the dataflow does not change.

Scale notes:
- Binary payloads ride in parquet as BYTE_ARRAY; keep
  ``spark.sql.files.maxPartitionBytes`` sized so a partition of payloads
  fits executor memory (the session default 128 MB is payload-aware).
- ``mapInPandas`` streams Arrow record batches — peak memory is one batch,
  not one partition; tune ``spark.sql.execution.arrow.maxRecordsPerBatch``
  for large blobs (e.g. 64 for multi-MB images).
- Never collect payloads; features/metadata leave the executor, bytes don't.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

# Typed metadata struct carried next to every payload column.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|jpeg|wav|mp4…
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)

_FEATURE_SCHEMA = "media_id long, n_bytes long, checksum string, features array<double>"


def _fake_decode(payload: bytes, n_features: int) -> list[float]:
    """Deterministic stand-in for a real decode+featurize kernel: derives
    ``n_features`` floats from the payload's rolling byte sums."""
    if not payload:
        return [0.0] * n_features
    out = []
    acc = 0
    for i, byte in enumerate(payload):
        acc = (acc * 31 + byte) % 1_000_003
        if i % max(1, len(payload) // n_features) == 0 and len(out) < n_features:
            out.append(acc / 1_000_003.0)
    while len(out) < n_features:
        out.append(0.0)
    return out


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_features: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Decode + featurize payloads via ``mapInPandas`` (Arrow-batched).

    Real decoding is stubbed: pass ``fake=True`` for the deterministic fake
    kernel, else NotImplementedError surfaces at execution (by design —
    see module docstring).
    """

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd  # noqa: PLC0415 — executor-side import

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio libraries not present in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "checksum": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "features": payloads.map(
                        lambda b: _fake_decode(b or b"", n_features)
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, _FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, id_col: str = "media_id"
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media, frame_ts) —
    the explode that precedes a real frame decoder. Uses duration metadata
    only; payload untouched (and unmoved) until the decode stage."""
    return (
        df.select(
            id_col,
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
