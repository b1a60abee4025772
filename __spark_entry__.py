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
from datapipelineetl_spark import queries_ext  # noqa: E402, F401 — registers extension queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return _q.q1_pricing_summary(spark, "/root/testdata/sf0.001")


# The driver verifies the FIRST 50 entries of queries() in dict order.
# Round-3 rotation (VERDICT r2 item 4): slot 0 = q_order_quantity_profile
# (checker-crashed r1+r2, emitted driver-hashable this round); slots 1–2 =
# the two queries whose rows-only checks were upgraded to real oracles
# this round (q_approx_sketches tolerance booleans, q_multimodal_features
# kernel-output hash check); slots 3–35 = the 33 queries whose only green
# row is from round 1 (rotated out of the r2 window) — q3/q5 first since
# their broadcast hints changed this round; then q_ann_lsh_topk (upgraded
# this round from rows-only to oracle-checked — the seed-fixed hyperplanes
# are embedded as SQL literals) with its recall shadow q_ann_recall;
# the tail = r2-green family representatives so every SURVEY §2 family
# keeps a fresh row. Every registered query's newest driver row is ≤2
# rounds old under this window; tests/test_schemas.py pins the contract.
PRIORITY: list[str] = [
    # -- never green (r1/r2 checker crash, fixed this round) --
    "q_order_quantity_profile",
    # -- rows-only checks upgraded to hard oracles this round --
    "q_approx_sketches",
    "q_multimodal_features",
    # -- broadcast-hint changes this round (VERDICT item 3) --
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    # -- r1-green only; rotated out of the r2 window --
    "q_top3_orders_per_customer",
    "q_agg_stats",
    "q_customers_without_orders",
    "q_active_supplier_keys",
    "q_priciest_lineitems",
    "q_rollup_order_volume",
    "q_clean_chain_events",
    "q_unpivot_lineitem",
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
    "q15_top_suppliers",
    "q2_cheapest_part_per_type",
    "q22_idle_rich_customers",
    "q_lineitems_above_order_avg",
    "q_name_word_counts",
    # -- new this round (need their first driver rows) --
    "q12_line_priority_split",
    "q_winnowing_fingerprints",
    # -- last rows-only query + its hash-checked shadow --
    "q_ann_lsh_topk",
    "q_ann_recall",
    # -- r2-green family representatives (keep one row fresh per family) --
    "q1_pricing_summary",
    "q_sessionize",
    "q_meascollec_flatten",
    "q_clean_cell_metrics",
    "q_envelope_roundtrip",
    "q_tumbling_window_events",
    "q_asof_join_purchase",
    "q_minhash_near_dups",
    "q_dedup_clusters",
    "q_simhash",
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
