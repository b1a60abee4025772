"""Column profiling — the data-quality pass every ETL engine needs before
trusting a 100 TB feed: per-column null rates, cardinality, and value
ranges, computed in ONE scan.

Plan: all per-column aggregates go into a single ``agg`` (one partial+final
pass, no per-column jobs); the wide 1-row result is then unpivoted to one
row per column driver-side (it is |columns| cells — trivially small).
Never profile with N separate ``df.select(col).distinct().count()`` jobs:
that is N scans of the 100 TB input.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """One row per column: ``column, n_rows, n_nulls, n_distinct,
    min_value, max_value`` (min/max as strings — type-heterogeneous).

    ``exact_distinct=False`` (default) uses HyperLogLog
    (approx_count_distinct) — the right choice at scale; ``True`` uses
    exact COUNT(DISTINCT) (expand-based; one extra shuffle per column but
    still a single scan) for oracle-comparable output.
    """
    cols = list(columns) if columns else df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"))
        aggs.append(
            (
                F.countDistinct(F.col(c))
                if exact_distinct
                else F.approx_count_distinct(F.col(c))
            ).alias(f"__nd_{c}")
        )
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")
