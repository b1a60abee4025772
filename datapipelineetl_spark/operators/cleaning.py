"""Cleaning / scalar-transform operators (SURVEY.md §2.4, C1–C14).

These parameterize the reference's canonical cleaning chain
(/root/reference/mypy/preprocessproduce.py:48-65) and the EAV-feed casts
(mypy/streaming.py:128, mypy/xmlonly.py:120, mypy/xmlhard.py:111). Order
matters: targeted fills run before the global fill (C2–C5 interaction) —
``clean_cell_metrics`` preserves the exact reference order.

All operators are narrow transforms (no shuffle) built from JVM-side column
functions, so a 100 TB scan applies them inside the same whole-stage-codegen
span as the parquet read.

Where the reference has latent bugs (``trim``/``lower`` used but never
imported, mypy/preprocessproduce.py:3 vs :61; ``pd`` alias mismatch,
dags/Dag2.py:16-17 vs :118) we implement the evident *intent*, documented
per-operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- C1 ----------------------------------------------------------------------
REFERENCE_TIME_FORMAT = "MM-dd-yyyy HH:mm"  # mypy/preprocessproduce.py:50


def parse_timestamp(
    df: DataFrame, column: str, fmt: str = REFERENCE_TIME_FORMAT, out: str | None = None
) -> DataFrame:
    """C1: string → timestamp with explicit format; non-matching → null.

    Reference: ``to_timestamp(col("Time"), "MM-dd-yyyy HH:mm")``
    (mypy/preprocessproduce.py:50). The reference runs Spark 3.5 with ANSI
    off, where non-matching input yields null; under Spark 4's ANSI default
    plain ``to_timestamp`` would throw, so we use ``try_to_timestamp`` to
    pin the null-on-error semantics regardless of session config.
    """
    return df.withColumn(out or column, F.try_to_timestamp(F.col(column), F.lit(fmt)))


# --- C2/C3/C5 ----------------------------------------------------------------
def fill_nulls(df: DataFrame, value, subset: Sequence[str] | None = None) -> DataFrame:
    """C2/C3/C5: null fill — targeted when ``subset`` given, global otherwise.

    Reference: ``df.na.fill(0, subset=[...])`` then ``df.na.fill("N/A",
    subset=[...])`` then the global ``df.na.fill(0)``
    (mypy/preprocessproduce.py:51-57). Type-directed: a numeric fill only
    touches numeric columns, a string fill only string columns (Spark
    ``DataFrameNaFunctions`` semantics, same as the reference relies on).
    """
    return df.na.fill(value, subset=list(subset) if subset else None)


# --- C4 ----------------------------------------------------------------------
def replace_null_with_sentinel(df: DataFrame, columns: Sequence[str], sentinel) -> DataFrame:
    """C4: null → out-of-range sentinel (reference: geo 999).

    Reference: ``when(col("Longitude").isNull(), 999).otherwise(col(...))``
    (mypy/preprocessproduce.py:53-55; the comment says 123456 but the code
    says 999 — code wins, SURVEY.md §2.4).
    """
    return df.withColumns(
        {c: F.when(F.col(c).isNull(), F.lit(sentinel)).otherwise(F.col(c)) for c in columns}
    )


# --- C6 ----------------------------------------------------------------------
def string_sentinel_to_value(
    df: DataFrame,
    column: str,
    sentinel: str = "nil",
    value=0,
    case_insensitive: bool = True,
    trim: bool = True,
) -> DataFrame:
    """C6: case/space-insensitive string sentinel → numeric value.

    Reference intent (mypy/preprocessproduce.py:60-62):
    ``when(trim(lower(col)) == "nil", 0).otherwise(col)``. The reference
    never imports ``trim``/``lower`` (NameError at runtime,
    preprocessproduce.py:3) — we implement the intended semantics.
    """
    c: Column = F.col(column)
    probe: Column = c
    if trim:
        probe = F.trim(probe)
    if case_insensitive:
        probe = F.lower(probe)
        sentinel = sentinel.lower()
    # Pin the replacement to the column's own type: under Spark 3.5/non-ANSI
    # (the reference runtime) `when(cond, 0).otherwise(string_col)` coerces
    # the branch to string; ANSI mode would instead try string→bigint and
    # throw. Casting the literal reproduces the reference behavior.
    replacement = F.lit(value).cast(df.schema[column].dataType)
    return df.withColumn(column, F.when(probe == sentinel, replacement).otherwise(c))


# --- C7 ----------------------------------------------------------------------
def cast_with_sentinel(
    df: DataFrame, column: str, dtype: str, sentinels: Sequence[str] = ("NIL",), value=0
) -> DataFrame:
    """C7: sentinel → value, else cast.

    Reference: ``when(col("kpiValue") == "NIL", 0).otherwise(col.cast(...))``
    — int for the gzip feed (mypy/streaming.py:128), double for xmlonly
    (mypy/xmlonly.py:120) and xmlhard (mypy/xmlhard.py:111). The per-feed
    type divergence is spec (SURVEY.md §7 risks), hence the ``dtype`` param.
    """
    c = F.col(column)
    return df.withColumn(
        column,
        F.when(c.isin(*sentinels), F.lit(value).cast(dtype)).otherwise(c.try_cast(dtype)),
    )


# --- C8 ----------------------------------------------------------------------
def nil_null_nan_to_zero(df: DataFrame, column: str) -> DataFrame:
    """C8: null / "NIL" / "NULL" / NaN → 0, else passthrough.

    Reference intent (dags/Dag2.py:118, Dag3.py:184, Dag4.py:116):
    ``0 if pd.isna(v) or v == "NIL" or v == "NULL" else v`` (the ``pd``
    alias is another latent reference bug; intent is clear).
    """
    c = F.col(column)
    zero = F.lit(0).cast(df.schema[column].dataType)
    return df.withColumn(
        column, F.when(c.isNull() | c.isin("NIL", "NULL", "NaN"), zero).otherwise(c)
    )


# --- C9 ----------------------------------------------------------------------
def extract_between(
    df: DataFrame, column: str, out: str, start: str = "=", end: str = ","
) -> DataFrame:
    """C9: substring between first ``start`` and next ``end``; null-safe.

    Reference (dags/Dag2.py:111, Dag3.py:177): ``nodeid`` = text between the
    first '=' and the following ',' of ``measObjLdn``
    (``eNodeBFunctionName=X,...`` → ``X``). Implemented as a single
    ``regexp_extract`` so it stays in codegen.
    """
    import re as _re

    pat = f"{_re.escape(start)}([^{_re.escape(end)}]*)"
    extracted = F.regexp_extract(F.col(column), pat, 1)
    # regexp_extract returns "" on no-match/null input; preserve null-safety:
    return df.withColumn(
        out, F.when(F.col(column).isNull(), F.lit(None).cast("string")).otherwise(extracted)
    )


# --- C11 ---------------------------------------------------------------------
def constant_column(df: DataFrame, name: str, value) -> DataFrame:
    """C11: constant column (reference: Kafka key = str(batch_id),
    mypy/preprocessproduce.py:71)."""
    return df.withColumn(name, F.lit(value))


# --- C14 ---------------------------------------------------------------------
def strip_file_uri_prefix(df: DataFrame, column: str, out: str | None = None) -> DataFrame:
    """C14: strip ``file:``/``file://`` URI prefix from a path column.

    Reference does this driver-side with str.replace (mypy/streaming.py:121,
    xmlonly.py:113, xmlhard.py:100); we keep it on-executor.
    """
    return df.withColumn(out or column, F.regexp_replace(F.col(column), "^file:/*", "/"))


# --- The canonical chain (C1–C6 + P1 + P3, exact reference order) ------------
def clean_cell_metrics(df: DataFrame) -> DataFrame:
    """The flagship CSV-feed cleaning chain, reference order preserved
    (mypy/preprocessproduce.py:48-65):

    1. C1  parse ``Time`` (MM-dd-yyyy HH:mm)
    2. C2  null→0 for Downlink EARFCN / LocalCell Id / Downlink bandwidth
    3. C3  null→"N/A" for eNodeB Name / Cell Name
    4. C4  null Longitude/Latitude → 999 sentinel
    5. C5  global numeric null→0 (runs AFTER the targeted fills — order is
       load-bearing: C4's 999 must win over C5's 0 for geo columns)
    6. P3  rename ``FT_UL.Interference`` → ``FT_UL_Interference``
    7. C6  "nil" (case/space-insensitive) → 0 in FT_UL_Interference
    8. P1  drop ``Integrity``

    Entirely narrow — at 100 TB this fuses into the scan stage.
    """
    df = parse_timestamp(df, "Time")
    df = fill_nulls(df, 0, ["Downlink EARFCN", "LocalCell Id", "Downlink bandwidth"])
    df = fill_nulls(df, "N/A", ["eNodeB Name", "Cell Name"])
    df = replace_null_with_sentinel(df, ["Longitude", "Latitude"], 999.0)
    df = fill_nulls(df, 0)
    df = df.withColumnRenamed("FT_UL.Interference", "FT_UL_Interference")
    df = string_sentinel_to_value(df, "FT_UL_Interference", "nil", 0)
    df = df.drop("Integrity")
    return df


def clean_kpi_records(df: DataFrame, value_type: str = "int") -> DataFrame:
    """The EAV-feed cleaning step: C7 on ``kpiValue``.

    ``value_type="int"`` for the gzip feed (mypy/streaming.py:128),
    ``"double"`` for xmlonly/xmlhard (mypy/xmlonly.py:120,
    mypy/xmlhard.py:111).
    """
    return cast_with_sentinel(df, "kpiValue", value_type, ("NIL",), 0)
