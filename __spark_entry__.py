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
from datapipelineetl_spark import queries_batch8  # noqa: E402, F401 — registers batch-8 queries
from datapipelineetl_spark import queries_batch9  # noqa: E402, F401 — registers batch-9 queries
from datapipelineetl_spark import queries_ext  # noqa: E402, F401 — registers extension queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return _q.q1_pricing_summary(spark, "/root/testdata/sf0.001")


# The driver verifies the FIRST 50 entries of queries() in dict order.
# Round-4 rotation (VERDICT r3 item 3): slot 0 = q12_line_priority_split
# (the only red r3 row — an oracle HUGEINT typing defect, fixed by the
# CAST-to-BIGINT commit this round; the Spark answer was already
# judge-verified correct); slots 1–9 = the nine queries registered this
# round (winnowing collision join, LSH cosine near-pairs, capped MinHash
# near-dups, clusters over the capped pair graph, IVF recall gate,
# bucketized range join, hypertable rollup, forward as-of, salted-join
# parity — VERDICT r3 items 4–6 plus the new operator families);
# slots 10–44 = all 35 queries whose newest green row is from
# round 2 (rotated out of the r3 window); the tail = r3-green family
# representatives so every SURVEY §2 family keeps a fresh row. Every
# registered query's newest driver row is ≤2 rounds old under this
# window; tests/test_schemas.py pins the contract.
PRIORITY: list[str] = [
    # -- red in r3 (oracle typing, fixed this round) --
    "q12_line_priority_split",
    # -- new this round (need their first driver rows) --
    "q_winnow_collisions",
    "q_lsh_cosine_near_pairs",
    "q_minhash_capped_near_dups",
    "q_dedup_clusters_lsh",
    "q_ivf_recall",
    "q_range_join_ship_windows",
    "q_hypertable_rollup",
    "q_asof_join_next_purchase",
    "q_salted_join_volume",
    # -- r2-green only; rotated out of the r3 window --
    "q7_volume_shipping",
    "q8_market_share",
    "q13_order_count_distribution",
    "q17_small_quantity_revenue",
    "q21_blamable_suppliers",
    "q_events_pivot",
    "q_clean_kpi_int",
    "q_cube_lineitem",
    "q_window_trailing_revenue",
    "q_percentiles_by_priority",
    "q_ngram_jaccard_pairs",
    "q_frame_sample_plan",
    "q_multimodal_meta",
    "q_conditional_counts",
    "q_weekly_order_volume",
    "q_sql_regional_revenue",
    "q_nation_lookup",
    "q_text_token_stats",
    "q_text_quality",
    "q_lang_id",
    "q_dedup_token_set",
    "q_cosine_topk",
    "q_cosine_near_pairs",
    "q_tf_idf",
    "q_profile_orders",
    "q_kpi_pivot",
    "q_session_window_events",
    "q_grouping_sets",
    "q_posexplode_embedding",
    "q_array_lambda_battery",
    "q_null_semantics",
    "q_nullsafe_join",
    "q_fuzzy_name_pairs",
    "q_price_histogram",
    "q_regex_extract_ldn",
    # -- r3-green family representatives (keep one row fresh per family;
    #    families of the dropped reps stay fresh via the new queries:
    #    winnowing via q_winnow_collisions, star joins via q5) --
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q_meascollec_flatten",
    "q_clean_cell_metrics",
    "q_envelope_roundtrip",
]


def _ordered(mapping: dict) -> dict:
    front = {n: mapping[n] for n in PRIORITY if n in mapping}
    back = {n: v for n, v in mapping.items() if n not in front}
    return {**front, **back}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(_q.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys → rows-only check."""
    return _ordered(dict(_q.ORACLES))
