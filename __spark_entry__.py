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


# Freshness tiers (VERDICT r8 item 2 — the rotation-capacity policy).
# CORE = the SURVEY §2 reference-parity surface (relational battery,
# cleaning chain, feeds, streaming envelopes): re-verified every 3
# CORRECTNESS records, unchanged contract. EXTENSION = the LLM-pipeline
# batteries promoted from the staged batches (corpus/text/dedup/
# similarity/sketch): re-verified every 5 records. Capacity math at the
# current census (99 core + 50 extension): 99/3 + 50/5 = 43 forced
# slots per round on average against the 50-slot window — ~7 slots of
# structural slack, room for ~35 more extension queries before the next
# policy decision. The tier of a query is fixed at promotion time:
# everything that entered through a staged batch is EXTENSION.
EXTENSION_TIER: frozenset[str] = frozenset(
    name
    for mod in (
        queries_batch11,
        queries_batch12,
        queries_batch13,
        queries_batch14,
        queries_batch15,
        queries_batch16,
    )
    for name in mod.STAGED_QUERIES
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return _q.q1_pricing_summary(spark, "/root/testdata/sf0.001")


# The driver verifies the FIRST 50 entries of queries() in dict order.
# Round-9 rotation (VERDICT r8 items 1+2): the tiering policy (below)
# released the 10 batch-11 slots the flat 3-round contract would have
# forced, so ALL 21 staged queries promote this round — slots 0-20 =
# batch-16's q_zipf_fit + batch-14's 11 LM/BPE/DSIR/k-means queries +
# batch-15's 9 sketch/corpus-statistics queries earning first driver
# rows; then the 20 contract-forced core queries (r6-green aging past
# the 3-record core horizon); the last 9 slots pad oldest-newest-green
# -record first (batch-11, green r6 — refreshing them now defers their
# extension-horizon forcing past r11).
PRIORITY: list[str] = [
    "q_zipf_fit",
    "q_unigram_logprob",
    "q_dsir_weights",
    "q_quality_calibrated",
    "q_vocab_growth",
    "q_kmeans_clusters",
    "q_dsir_resample",
    "q_pack_best_fit",
    "q_cluster_balanced_sample",
    "q_perplexity_buckets",
    "q_train_bpe",
    "q_bpe_segment",
    "q_countmin_counts",
    "q_hll_distinct",
    "q_bloom_decontam",
    "q_bigram_logprob",
    "q_pmi_bigrams",
    "q_vocab_overlap",
    "q_token_entropy",
    "q_oov_rate",
    "q_blocklist_filter",
    "q_dedup_token_set",
    "q_cosine_topk",
    "q_cosine_near_pairs",
    "q_tf_idf",
    "q7_volume_shipping",
    "q13_order_count_distribution",
    "q17_small_quantity_revenue",
    "q_profile_orders",
    "q_kpi_pivot",
    "q_session_window_events",
    "q_grouping_sets",
    "q_posexplode_embedding",
    "q_array_lambda_battery",
    "q_null_semantics",
    "q_nullsafe_join",
    "q8_market_share",
    "q_fuzzy_name_pairs",
    "q21_blamable_suppliers",
    "q_price_histogram",
    "q_regex_extract_ldn",
    "q_sample_stratified",
    "q_corpus_mix",
    "q_pack_chunks",
    "q_redact_pii",
    "q_prepare_corpus",
    "q_split_documents",
    "q_contamination_pairs",
    "q_ngram_counts",
    "q_funnel_stages",
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
