"""Operational sinks for long-lived 100 TB tables: idempotent partition
re-processing and small-file compaction.

These are the two maintenance jobs every file-based ETL pipeline grows at
scale: (a) replaying a feed's day/hour must replace exactly that partition
(not append duplicates, not truncate the table), and (b) streaming
micro-batches (the reference writes one file per trigger —
mypy/preprocessproduce.py:184) accrete small files until scans are
metadata-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Idempotent partition upsert: rewrite ONLY the partitions present in
    ``df`` (dynamic partition-overwrite), leaving all others untouched.

    This is the replay-safe write for feed re-processing: running the same
    day twice yields the same table state (exactly-once at partition
    granularity) — vs append (duplicates) or static overwrite (drops the
    whole table).
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> int:
    """Compact a parquet directory's small files toward
    ``target_file_bytes`` outputs. Returns the file count written.

    Sizing comes from the actual on-disk bytes (not row counts), so the
    result respects the target regardless of schema width. With
    ``partition_cols`` the rewrite keeps the partition layout (each
    partition's files merge among themselves via one hash redistribution
    on the partition key).

    At scale, run per-partition (e.g. yesterday's partition after the
    day closes) — never as one table-wide job.
    """
    from pathlib import Path

    total = sum(p.stat().st_size for p in Path(path).rglob("*.parquet"))
    n_files = max(1, round(total / target_file_bytes))
    df = spark.read.parquet(path)
    if partition_cols:
        out = df.repartition(n_files, *[F.col(c) for c in partition_cols])
    else:
        out = df.repartition(n_files)
    # write to a temp sibling, then swap via two renames (old aside →
    # tmp into place → drop old). The table directory is never absent:
    # a crash before the second rename leaves the original intact at
    # path__old for manual restore; a crash after it only leaks the
    # __old copy. Local-FS only — rglob/rename don't apply to object
    # stores (there, compact into a NEW prefix and flip a pointer/view).
    import shutil

    tmp = f"{path}__compacting"
    old = f"{path}__old"
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    if Path(old).exists():
        shutil.rmtree(old)
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old)
    return n_files
