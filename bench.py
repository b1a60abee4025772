"""Benchmark runner — the driver's per-round throughput feedback loop.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}``.

Each query is forced end-to-end with the ``noop`` sink (full plan execution,
no driver-side collect). One warm-up run of the smallest query amortizes JVM
/ codegen startup out of the per-query numbers.

Outlier defense (VERDICT r4 item 2 — a noisy driver-run row once recorded
q_agg_stats at 4.6× its true cost): each query runs best-of-2; if the
best-of-2 still exceeds 2× its recorded sf0.1 reference (EXPECTED_SEC,
refreshed whenever SCALING.md is), a THIRD run is taken. Queries that
exceed the threshold even after three runs are listed under ``"outliers"``
in the JSON so a recording anomaly is self-flagged instead of silently
masquerading as a regression (or masking one).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from datapipelineetl_spark import queries as _q
from datapipelineetl_spark import queries_batch2  # noqa: F401 — registers
from datapipelineetl_spark import queries_batch3  # noqa: F401 — registers
from datapipelineetl_spark import queries_batch8  # noqa: F401 — registers
from datapipelineetl_spark import queries_batch9  # noqa: F401 — registers
from datapipelineetl_spark import queries_batch10  # noqa: F401 — registers
from datapipelineetl_spark import queries_ext  # noqa: F401 — registers
from datapipelineetl_spark.session import get_session

HEADLINE = [
    # scan + agg
    "q1_pricing_summary",
    "q6_revenue_delta",
    "q_agg_stats",
    # joins
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_type_profit",
    "q10_returned_items",
    "q18_large_orders",
    "q_asof_join_purchase",
    "q_range_join_ship_windows",
    "q_range_join_event_windows",
    # windows / reshaping
    "q_top3_orders_per_customer",
    "q_window_trailing_revenue",
    "q_sessionize",
    "q_events_pivot",
    "q_unpivot_lineitem",
    "q_hypertable_rollup",
    # streaming-source flatten (the reference's XML feed, batch form)
    "q_meascollec_flatten",
    # training-data extensions. (Uncapped q_minhash_near_dups stays
    # excluded: the synthetic docs are so self-similar that its output is
    # O(n²) pairs — that timing would measure data degeneracy, not the
    # engine. The CAPPED variant below is the production form and IS
    # timed, as are the winnowing ladder and the full cluster pipeline —
    # the round-3 brief asked the bench to cover the heavy operators
    # where regressions would hide.)
    "q_dedup_token_set",
    "q_simhash",
    "q_winnowing_fingerprints",
    "q_winnow_collisions",
    "q_minhash_capped_near_dups",
    "q_dedup_clusters_lsh",
    "q_cosine_topk",
    "q_lsh_cosine_near_pairs",
]

# Reference warm best-of-2 seconds at sf0.1 / local[32] (SCALING.md refresh
# cadence). 2× + 0.5 s absolute slack = the outlier threshold — generous
# enough that real regressions (the things the bench exists to catch) still
# show as big ratios in BENCH vs BASELINE, tight enough that a one-off
# environment stall (GC pause, noisy neighbor) triggers the extra run.
EXPECTED_SEC = {
    "q1_pricing_summary": 0.45,
    "q6_revenue_delta": 0.30,
    "q_agg_stats": 0.75,
    "q3_shipping_priority": 0.84,
    "q5_local_supplier_volume": 0.90,
    "q9_product_type_profit": 0.90,
    "q10_returned_items": 0.67,
    "q18_large_orders": 0.84,
    "q_asof_join_purchase": 0.47,
    "q_range_join_ship_windows": 3.46,
    "q_range_join_event_windows": 0.80,
    "q_top3_orders_per_customer": 0.33,
    "q_window_trailing_revenue": 0.50,
    "q_sessionize": 0.42,
    "q_events_pivot": 0.31,
    "q_unpivot_lineitem": 0.28,
    "q_hypertable_rollup": 0.33,
    "q_meascollec_flatten": 0.21,
    "q_dedup_token_set": 0.29,
    "q_simhash": 1.00,
    "q_winnowing_fingerprints": 0.83,
    "q_winnow_collisions": 1.61,
    "q_minhash_capped_near_dups": 1.43,
    "q_dedup_clusters_lsh": 3.3,
    "q_cosine_topk": 0.34,
    "q_lsh_cosine_near_pairs": 3.84,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    spark = get_session("bench")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        _q.QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run("q1_pricing_summary")  # warm-up: JVM JIT + codegen + parquet footer cache

    # best-of-2 per query (second run has codegen/footers warm, so the min
    # reflects engine cost, not JIT noise); best-of-3 when the result still
    # reads as an outlier vs the recorded reference — see module docstring
    timings: dict[str, float] = {}
    outliers: list[str] = []
    for name in HEADLINE:
        if name not in _q.QUERIES:
            continue
        best = min(run(name), run(name))
        expected = EXPECTED_SEC.get(name) if sf == 0.1 else None
        if expected is not None and best > max(2 * expected, expected + 0.5):
            best = min(best, run(name))
            if best > max(2 * expected, expected + 0.5):
                outliers.append(name)
        timings[name] = round(best, 3)
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "outliers": outliers,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
