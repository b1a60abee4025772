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

from datapipelineetl_spark import queries_batch13  # noqa: E402

queries_batch13.register()  # promote the 7 staged batch-13 queries (round 8)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return _q.q1_pricing_summary(spark, "/root/testdata/sf0.001")


# The driver verifies the FIRST 50 entries of queries() in dict order.
# Round-8 rotation (VERDICT r7 items 1+3): slots 0–1 = the two r7-RED
# queries re-earning their rows with driver-hashable output shapes
# (array<bigint> → md5 digest — the r7 canon-crash fix); then the 21
# r5-green queries the 3-round contract forces in, interleaved (in
# registration order, as rotate_window.py emits) with the 7 batch-13
# promotions earning their first driver rows; the remaining 20 slots
# fill oldest-newest-green-record first. The r6-green balance ages out
# next round and is forced into r9.
PRIORITY: list[str] = [
    # -- r7 RED re-earns (driver-canon-safe reshapes) --
    "q_encode_tokens",
    "q_pack_sequences",
    # -- contract-forced (r5-green aging past the 3-round horizon),
    #    with the 7 batch-13 first rows in registration order --
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
    "q_ann_recall",
    "q_approx_sketches",
    "q_range_join_event_windows",
    "q9_product_type_profit",
    "q11_important_parts",
    "q16_supplier_part_counts",
    "q20_top_part_shippers",
    "q_shuffle_corpus",
    "q_sample_k_per_stratum",
    "q_normalize_text",
    "q_select_budget",
    "q_corpus_report",
    "q_corpus_drift",
    "q_dedup_spans",
    # -- free slots: oldest-newest-green-record first --
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q_events_pivot",
    "q_envelope_roundtrip",
    "q_meascollec_flatten",
    "q_clean_cell_metrics",
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
