"""Tabular (CSV/JSON) reads with malformed-row quarantine.

The reference's feeds are dirty telecom exports read with a declared
schema (mypy/preprocessproduce.py:109-177): rows that do not fit are a
FACT of the input, not an exception. Spark's PERMISSIVE mode keeps such
rows but nulls their fields silently; DROPMALFORMED discards them
silently; FAILFAST kills the job. None of those is the operational
answer at 100 TB — what a production feed needs is the PERMISSIVE read
PLUS a quarantine split: well-formed rows flow on, malformed raw lines
land somewhere auditable (the file-level analogue of the reference's
sentinel-value cleaning, and of multimodal's corrupt-bytes→valid=False
rule: bad data is data).

Spark caveat encoded here: a query that references ONLY the internal
corrupt-record column is disallowed (the parser would skip the very
work that populates it), so the split materializes the parsed frame
once before filtering — documented in the Spark SQL migration notes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_with_quarantine(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType,
    corrupt_col: str = CORRUPT_COL,
    **options,
) -> DataFrame:
    """PERMISSIVE read of ``fmt`` (``csv`` or ``json``) with the raw
    text of every malformed row captured in ``corrupt_col`` (appended to
    ``schema`` automatically). Pair with :func:`split_quarantine`.

    Scale: the corrupt column is populated by the same parse pass — no
    second read; the quarantine split below is two narrow filters over
    one materialized parse.
    """
    if fmt not in ("csv", "json"):
        raise ValueError(f"fmt must be 'csv' or 'json', got {fmt!r}")
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType(), True)]
    )
    reader = (
        spark.read.format(fmt)
        .schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def split_quarantine(
    df: DataFrame, corrupt_col: str = CORRUPT_COL, keep_cols: tuple = ()
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine) split of a :func:`read_with_quarantine` frame.

    ``good`` drops the corrupt column; ``quarantine`` is the raw
    malformed lines plus any ``keep_cols`` present on the frame (pass
    ``("input_file",)`` to preserve source-file lineage, without which
    a bad line cannot be traced back to the feed file that shipped it). The input is cached for the two filters
    — required correctness, not just economy: Spark refuses a plan that
    selects only the corrupt column from the raw scan, and without the
    materialization the two filters would each re-parse the input.
    The cache pins the parsed frame in executor storage: the CALLER
    owns the input df, so call ``df.unpersist()`` once both outputs are
    materialized (or written) — a long-lived session re-reading large
    feeds without unpersisting accumulates cache pressure.
    """
    df = df.cache()
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    extras = [c for c in keep_cols if c in df.columns]
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col, *extras)
    return good, bad
