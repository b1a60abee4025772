"""Table catalog for the driver-provided parquet fixtures (TESTDATA.md).

``load`` returns lazy DataFrames — parquet scans with pushdown/pruning left
to Catalyst. Nothing is cached here: each query plans its own scan so
``.explain`` shows the real pushed filters per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table not in TABLES:
        raise KeyError(f"unknown table {table!r}; known: {TABLES}")
    # The driver harness calls queries() with its OWN session; pin the two
    # runtime-settable confs correctness depends on: UTC rendering (DuckDB
    # timestamps are UTC-naive) — others are handled via try_* functions.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if table == "events":
        # events.parquet has shipped with two physical ts encodings across
        # fixture generations: TIMESTAMP(NANOS) (Spark's vectorized reader
        # rejects it — read nanos as long via the legacy conf and truncate
        # to micros, matching DuckDB's nanos→micros truncation) and plain
        # TIMESTAMP(MICROS) (inferred as TIMESTAMP_NTZ). Normalize both to
        # a session-UTC TIMESTAMP so query code sees ONE type; with the
        # session timezone pinned UTC above, the NTZ→LTZ cast is
        # wall-clock-preserving and oracle comparison stays byte-exact.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so ``spark.sql(...)``
    is a first-class query surface (same lazy scans as ``load`` — views
    add no materialization, and pushdown/pruning still reach parquet)."""
    for t, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(t)
