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
    layout. ``with_header_meta=True`` runs the REAL stdlib header
    decode (``multimodal._parse_media_header``: WAV/PPM/BMP/PNG/GIF/JPEG
    dimensions & rates) INLINE on the scanned batches — one
    ``mapInPandas`` pass emitting payload + metadata together, so the
    file contents are read exactly once (the previous self-join against
    ``decode_headers`` re-executed the scan on both branches and read
    every byte twice).

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
        parse = multimodal._parse_media_header
        fields = (
            "detected_format", "width", "height", "duration_ms",
            "sample_rate", "n_channels", "bit_depth", "valid",
        )

        def kernel(batches):
            for pdf in batches:
                parsed = [parse(b) for b in pdf["payload"]]
                out = pdf.copy()
                for k in fields:
                    out[k] = [p[k] for p in parsed]
                yield out

        schema = (
            "media_id long, path string, length long, payload binary, "
            + multimodal._HEADER_FIELDS
        )
        df = df.mapInPandas(kernel, schema)
    return df


def read_media_chunks(
    spark: SparkSession,
    path: str,
    chunk_bytes: int = 64 * 1024 * 1024,
    glob: str | None = None,
    recursive: bool = True,
    opener=None,
) -> DataFrame:
    """Chunked media ingestion — the path for files too large for
    ``read_media_dir``'s one-row-per-file contract (multi-GB video
    masters; 2 GB is the hard single-row limit): each file becomes
    ``ceil(length / chunk_bytes)`` rows of ``(media_id, path,
    chunk_idx, offset, n_bytes, payload)``, reassemblable by
    ``(media_id, chunk_idx)`` order. NOTE: Spark's ``binaryFile``
    source omits zero-length files from the listing itself (verified —
    the skip happens before this operator sees a row); audit empty
    files with a filesystem listing if they are meaningful in your
    corpus.

    How it stays scalable: the listing pass selects ONLY (path, length)
    from the ``binaryFile`` source — column pruning means no file
    CONTENT is read or shipped for the plan's metadata half; the chunk
    ranges are computed columnar (sequence + transform), and the bytes
    themselves are read executor-side by an Arrow-batched
    ``mapInPandas`` kernel doing seek+read of exactly its chunk. Peak
    memory per task is one Arrow batch of chunks, so ``chunk_bytes``
    (not file size) bounds memory.

    ``opener`` is the byte-range hook for NON-posix storage (a 100 TB
    media corpus lives in object storage): a serializable callable
    ``opener(path) -> file-like`` supporting ``seek``/``read``, invoked
    EXECUTOR-side per file. Default ``None`` = posix ``open`` on
    local/``file:`` paths with a loud failure on any other scheme
    (never a misread). Object-store example (fsspec implements ranged
    GETs behind the file interface)::

        import fsspec
        chunks = read_media_chunks(spark, "s3a://bucket/videos",
                                   opener=lambda p: fsspec.open(p, "rb").open())
    """
    if chunk_bytes < 1:
        raise ValueError(f"chunk_bytes must be >= 1, got {chunk_bytes}")
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    meta = reader.load(path).select("path", "length")
    n_chunks = F.greatest(
        F.ceil(F.col("length") / F.lit(chunk_bytes)).cast("long"), F.lit(1)
    )
    ranges = meta.select(
        text.token_hash60(F.col("path")).alias("media_id"),
        F.col("path"),
        F.col("length"),
        F.posexplode_outer(
            F.sequence(F.lit(0), n_chunks - 1)
        ).alias("chunk_idx", "__c"),
    ).select(
        "media_id",
        "path",
        F.col("chunk_idx").cast("int"),
        (F.col("__c") * chunk_bytes).alias("offset"),
        F.least(
            F.lit(chunk_bytes).cast("long"),
            F.col("length") - F.col("__c") * chunk_bytes,
        ).alias("n_bytes"),
    )

    def kernel(batches):
        from urllib.parse import unquote, urlparse  # noqa: PLC0415

        import pandas as pd  # noqa: PLC0415 — executor-side import

        for pdf in batches:
            payloads = []
            for p, off, n in zip(pdf["path"], pdf["offset"], pdf["n_bytes"]):
                if opener is not None:
                    f = opener(p)
                else:
                    u = urlparse(p)
                    if u.scheme not in ("", "file"):
                        # object-store byte ranges need the store's
                        # ranged GET, not posix seek — fail loudly
                        # (pass opener= for s3a/gs/abfs), don't misread
                        raise ValueError(
                            f"read_media_chunks reads local/shared-posix "
                            f"paths only without an opener, got scheme "
                            f"{u.scheme!r} in {p}"
                        )
                    # binaryFile returns URI-style paths: percent-decode
                    # so filenames with spaces/specials open correctly
                    local = unquote(u.path) if u.scheme == "file" else p
                    f = open(local, "rb")
                with f:
                    f.seek(int(off))
                    payloads.append(f.read(int(n)))
            out = pdf.copy()
            out["payload"] = pd.Series(payloads, index=pdf.index, dtype=object)
            yield out

    schema = (
        "media_id long, path string, chunk_idx int, offset long, "
        "n_bytes long, payload binary"
    )
    return ranges.mapInPandas(kernel, schema)
