"""Media-file ingestion via Spark's ``binaryFile`` source — the missing
first step of the multimodal tier: a DIRECTORY of image/audio files
becomes the opaque-binary media table the ``operators.multimodal``
kernels consume (payload + typed metadata, bytes never on the driver).

The reference treats media as out-of-band blobs next to its feeds; here
the ingest is a real columnar scan: ``binaryFile`` yields one row per
file (path, modificationTime, length, content) with the content read
executor-side, so a million-file image corpus lands as a parquet table
in one distributed pass.

Scale notes:
- ``binaryFile`` reads each file WHOLE into one row — right for media
  corpora (KB–MB objects); multi-GB video masters belong in a chunked
  reader (or frame-extracted upstream), not in a single row. 2 GB is
  the hard row limit.
- File *listing* is driver-side metadata work: for tens of millions of
  files prefer fewer/larger containers (tar-to-parquet upstream) or a
  manifest join; listing cost, not byte movement, becomes the
  bottleneck first.
- ``spark.sql.files.maxPartitionBytes`` groups small files into tasks;
  the session default (128 MB) keeps payload partitions
  executor-memory-sized.
- ``pathGlobFilter`` prunes at the listing (e.g. ``*.png``), so a
  mixed directory doesn't even list the formats you skip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelineetl_spark.operators import multimodal, text


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
    with_header_meta: bool = False,
) -> DataFrame:
    """Read a directory of media files into the opaque-binary media
    shape: (media_id, path, length, payload[, header metadata…]).

    ``media_id`` is the 60-bit keyed hash of the file path — stable
    across re-ingests of the same tree (a re-run or a late-arriving
    replica keeps its id, so downstream dedup/joins are replay-safe),
    unlike ``monotonically_increasing_id`` which depends on the task
    layout. ``with_header_meta=True`` chains the REAL stdlib header
    decode (``multimodal.decode_headers``: WAV/PPM/BMP/PNG/GIF/JPEG
    dimensions & rates) onto the scan in the same job.

    Scale: one distributed ``binaryFile`` scan; payloads stay
    executor-side (the header decode is Arrow-batched ``mapInPandas``).
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path).select(
        text.token_hash60(F.col("path")).alias("media_id"),
        F.col("path"),
        F.col("length"),
        F.col("content").alias("payload"),
    )
    if with_header_meta:
        meta = multimodal.decode_headers(df)
        df = df.join(meta, "media_id")
    return df
