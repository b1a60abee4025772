"""Bucketed table sink — pre-shuffled storage for repeated big⋈big joins.

Bucketing persists the shuffle: `bucketBy(n, key)` + `sortBy(key)` writes
each partition pre-hash-partitioned and pre-sorted on the join key. Two
tables bucketed the same way then sort-merge-join with NO exchange and NO
sort at query time — at 100 TB that removes the dominant cost of every
repeated fact⋈fact join (the shuffle is paid once, at write).

Differences from `partitionBy` (sinks/serde.write_routed_parquet): partition
columns create directories (pruning, low-cardinality routing keys); bucket
columns hash rows into a fixed file count per partition (join/agg
co-location, high-cardinality keys). They compose.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    path: str | None = None,
    mode: str = "overwrite",
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) parquet table.

    ``path`` makes it an external table (data at ``path``, metadata in the
    session catalog). Bucket count should divide evenly into cluster
    parallelism and keep per-bucket files in the 100 MB–1 GB band at the
    target scale.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table (bucket metadata intact — joins/aggs on the
    bucket key skip the exchange)."""
    return spark.table(table)
