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
from datapipelineetl_spark import queries_batch11  # noqa: E402
from datapipelineetl_spark import queries_ext  # noqa: E402, F401 — registers extension queries

queries_batch11.register()  # promoted the 10 staged corpus queries (round 6)

from datapipelineetl_spark import queries_batch12  # noqa: E402

queries_batch12.register()  # promote the 12 staged batch-12 queries (round 7)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return _q.q1_pricing_summary(spark, "/root/testdata/sf0.001")


# The driver verifies the FIRST 50 entries of queries() in dict order.
# Round-7 rotation (VERDICT r6 item 2): slots 0–11 = the twelve staged
# batch-12 queries promoted this round (their first driver rows);
# slots 12–20 = the 9 r4-green queries the 3-round contract forces in
# (green in neither of the two newest records after r6 landed);
# slots 21–49 = 29 queries whose newest green row is CORRECTNESS_r05 —
# the 24 oldest in registration order plus the 5 token-family queries
# (minhash/simhash/winnowing/dedup-cluster) whose tokenization changed
# this round (phantom-empty-token fix, engine+oracle in lockstep), so
# they earn fresh driver rows under the new semantics. The remaining
# 21 r5-green queries age out next round and are forced into r8.
PRIORITY: list[str] = [
    # -- staged batch-12 corpus/tensor family (first driver rows) --
    "q_pack_greedy",
    "q_boilerplate_removal",
    "q_repetition_stats",
    "q_semantic_dupes",
    "q_prepare_corpus_quality",
    "q_extract_keywords",
    "q_user_hour_anomalies",
    "q_build_vocab",
    "q_encode_tokens",
    "q_pack_sequences",
    "q_split_corpus",
    "q_attrition_report",
    # -- r4-green, contract-forced (3-round rotation limit) --
    "q12_line_priority_split",
    "q_winnow_collisions",
    "q_range_join_ship_windows",
    "q_asof_join_next_purchase",
    "q_salted_join_volume",
    "q_hypertable_rollup",
    "q_minhash_capped_near_dups",
    "q_ivf_recall",
    "q_lsh_cosine_near_pairs",
    # -- r5-green refresh: oldest first --
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
    # -- r5-green token-family (tokenization semantics changed r7) --
    "q_minhash_near_dups",
    "q_simhash",
    "q_dedup_clusters",
    "q_winnowing_fingerprints",
    "q_dedup_clusters_lsh",
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
