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

from datapipelineetl_spark import queries_batch14  # noqa: E402
from datapipelineetl_spark import queries_batch15  # noqa: E402
from datapipelineetl_spark import queries_batch16  # noqa: E402

queries_batch14.register()  # promote the 11 staged batch-14 queries (round 9)
queries_batch15.register()  # promote the 9 staged batch-15 sketch queries (round 9)
queries_batch16.register()  # promote q_zipf_fit (round 9 — the tiering
# policy freed the slot the flat contract would have spent on batch-11)

from datapipelineetl_spark import queries_batch17  # noqa: E402
from datapipelineetl_spark import queries_batch18  # noqa: E402

queries_batch17.register()  # promote the 6 staged corpus-curation queries (round 10)
queries_batch18.register()  # promote the 2 staged fertility/estimator queries (round 10)

from datapipelineetl_spark import queries_batch19  # noqa: E402

queries_batch19.register()  # promote the 5 staged PQ/temperature/L2 queries (round 13)

from datapipelineetl_spark import queries_batch20  # noqa: E402

queries_batch20.register()  # promote the 3 staged IVF-PQ/batched-ADC/resize queries (round 14)

from datapipelineetl_spark import queries_batch21  # noqa: E402

queries_batch21.register()  # promote the 4 staged refine/residual/batched-exact queries (round 15)

from datapipelineetl_spark import queries_batch22  # noqa: E402
from datapipelineetl_spark import queries_batch23  # noqa: E402

queries_batch22.register()  # promote the 2 staged batched ANN serving oracles (round 16)
queries_batch23.register()  # promote the 2 staged real-decode measurement oracles (round 16)


def _extension_tier() -> frozenset[str]:
    """Names promoted from any staged battery — derived, not hand-kept.

    Freshness tiers (VERDICT r8 item 2 — the rotation-capacity policy).
    CORE = the SURVEY §2 reference-parity surface (relational battery,
    cleaning chain, feeds, streaming envelopes): re-verified every 3
    CORRECTNESS records. EXTENSION = the LLM-pipeline batteries promoted
    from the staged batches (corpus/text/dedup/similarity/sketch):
    re-verified every 5 records. Capacity math at the round-10 census
    (99 core + 58 extension): 99/3 + 58/5 ≈ 45 forced slots per round
    against the 50-slot window — ~5 slots of structural slack.

    VERDICT r9 item 2 hardening: the tier auto-discovers every
    ``queries_batch*`` module carrying a ``STAGED_QUERIES`` dict and
    takes the keys that actually reached the live registry, so
    promotion is ONE step (call ``register()``) and a forgotten tuple
    entry can no longer silently mis-tier a battery. A staged-but-not-
    registered battery contributes nothing (its names aren't in
    ``_q.QUERIES`` yet), which is the correct tier for it.
    """
    import importlib
    import pkgutil

    import datapipelineetl_spark as _pkg

    names: set[str] = set()
    for info in pkgutil.iter_modules(_pkg.__path__):
        if not info.name.startswith("queries_batch"):
            continue
        mod = importlib.import_module(f"datapipelineetl_spark.{info.name}")
        staged = getattr(mod, "STAGED_QUERIES", None)
        if staged:
            names.update(n for n in staged if n in _q.QUERIES)
    return frozenset(names)


EXTENSION_TIER: frozenset[str] = _extension_tier()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return _q.q1_pricing_summary(spark, "/root/testdata/sf0.001")


# The driver verifies the FIRST 50 entries of queries() in dict order.
# Round-17 rotation (tools/rotate_window.py — the perennial round-start
# task, skipped by round 16's interruption): 52 queries hit their
# re-verification horizon at once (the r15/r16 driver samples were
# fully disjoint, so both rounds refreshed different halves of the
# registry), 2 more than the window holds; the 50 oldest-green take
# the slots and the 2 overflow rows (q_hll_distinct, q_bloom_decontam)
# are the first forced picks of any subsequent rotation. No
# staged promotions this round (optimization round - no new features).
PRIORITY: list[str] = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q_events_pivot",
    "q_envelope_roundtrip",
    "q_meascollec_flatten",
    "q_clean_cell_metrics",
    "q_clean_kpi_int",
    "q_cube_lineitem",
    "q19_bracket_revenue",
    "q_union_parties_by_nation",
    "q_intersect_nations",
    "q_parts_never_ordered",
    "q_window_order_seq",
    "q_window_trailing_revenue",
    "q_percentiles_by_priority",
    "q_json_props",
    "q_ngram_jaccard_pairs",
    "q_ann_lsh_topk",
    "q_multimodal_features",
    "q_frame_sample_plan",
    "q_multimodal_meta",
    "q15_top_suppliers",
    "q2_cheapest_part_per_type",
    "q22_idle_rich_customers",
    "q_lineitems_above_order_avg",
    "q_name_word_counts",
    "q_order_quantity_profile",
    "q_conditional_counts",
    "q_weekly_order_volume",
    "q_sql_regional_revenue",
    "q_nation_lookup",
    "q_text_token_stats",
    "q_text_quality",
    "q_lang_id",
    "q_ann_recall",
    "q_approx_sketches",
    "q_range_join_event_windows",
    "q9_product_type_profit",
    "q11_important_parts",
    "q16_supplier_part_counts",
    "q20_top_part_shippers",
    "q_vocab_growth",
    "q_kmeans_clusters",
    "q_dsir_resample",
    "q_pack_best_fit",
    "q_cluster_balanced_sample",
    "q_perplexity_buckets",
    "q_train_bpe",
    "q_bpe_segment",
    "q_countmin_counts",
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
