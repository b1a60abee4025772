"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``datapipelineetl_spark`` (queries.py registers
every named query + oracle); this module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from datapipelineetl_spark import queries as _q  # noqa: E402
from datapipelineetl_spark import queries_batch2  # noqa: E402, F401 — registers batch-2 queries
from datapipelineetl_spark import queries_batch3  # noqa: E402, F401 — registers batch-3 queries
from datapipelineetl_spark import queries_batch4  # noqa: E402, F401 — registers batch-4 queries
from datapipelineetl_spark import queries_batch5  # noqa: E402, F401 — registers batch-5 queries
from datapipelineetl_spark import queries_batch6  # noqa: E402, F401 — registers batch-6 queries
from datapipelineetl_spark import queries_batch7  # noqa: E402, F401 — registers batch-7 queries
from datapipelineetl_spark import queries_ext  # noqa: E402, F401 — registers extension queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return _q.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys → rows-only check."""
    return dict(_q.ORACLES)
