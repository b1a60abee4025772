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
from datapipelineetl_spark import queries_batch10  # noqa: E402, F401 — registers batch-10 queries
from datapipelineetl_spark import queries_ext  # noqa: E402, F401 — registers extension queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return _q.q1_pricing_summary(spark, "/root/testdata/sf0.001")


# The driver verifies the FIRST 50 entries of queries() in dict order.
# Round-5 rotation (VERDICT r4 item 1): slots 0–4 = the five queries
# registered this round (the sub-day range join from VERDICT r4 item 5
# plus the four TPC-H shapes completing the 22-query suite); slot 5 =
# q_dedup_clusters_lsh, re-verified because cluster_pairs' convergence
# probe was rebuilt this round (type-agnostic changed-row count, fused
# into the checkpoint job — VERDICT item 4 + ADVICE medium); slots 6–49
# = ALL 44 queries whose newest green row is from round 3 (the exact set
# test_driver_check_window_contract enumerated against
# CORRECTNESS_r04.json). Every registered query's newest driver row is
# ≤2 rounds old under this window; tests/test_schemas.py pins the
# contract.
PRIORITY: list[str] = [
    # -- new this round (need their first driver rows) --
    "q_range_join_event_windows",
    "q9_product_type_profit",
    "q11_important_parts",
    "q16_supplier_part_counts",
    "q20_top_part_shippers",
    # -- implementation changed this round (cluster_pairs rework) --
    "q_dedup_clusters_lsh",
    # -- r3-green only; rotated out of the r4 window --
    "q3_shipping_priority",
    "q_top3_orders_per_customer",
    "q_agg_stats",
    "q_customers_without_orders",
    "q_active_supplier_keys",
    "q_priciest_lineitems",
    "q_rollup_order_volume",
    "q_clean_chain_events",
    "q_sessionize",
    "q_tumbling_window_events",
    "q_unpivot_lineitem",
    "q_asof_join_purchase",
    "q_customers_with_orders_semi",
    "q_full_outer_nation_activity",
    "q_cross_join_matrix",
    "q_orders_above_avg",
    "q_string_funcs",
    "q_date_funcs",
    "q_having_filter",
    "q6_revenue_delta",
    "q4_priority_late_ship",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_orders",
    "q19_bracket_revenue",
    "q_union_parties_by_nation",
    "q_intersect_nations",
    "q_parts_never_ordered",
    "q_window_order_seq",
    "q_json_props",
    "q_ann_lsh_topk",
    "q_multimodal_features",
    "q15_top_suppliers",
    "q2_cheapest_part_per_type",
    "q22_idle_rich_customers",
    "q_lineitems_above_order_avg",
    "q_name_word_counts",
    "q_order_quantity_profile",
    "q_minhash_near_dups",
    "q_simhash",
    "q_ann_recall",
    "q_dedup_clusters",
    "q_approx_sketches",
    "q_winnowing_fingerprints",
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
