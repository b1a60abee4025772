"""Benchmark runner — the driver's per-round throughput feedback loop.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}``.

Each query is forced end-to-end with the ``noop`` sink (full plan execution,
no driver-side collect). One warm-up run of the smallest query amortizes JVM
/ codegen startup out of the per-query numbers.
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
    "q10_returned_items",
    "q18_large_orders",
    "q_asof_join_purchase",
    "q_range_join_ship_windows",
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

    # best-of-2 per query: the second run has codegen/footers warm, so the
    # min reflects engine cost, not JIT noise
    timings = {
        name: round(min(run(name), run(name)), 3)
        for name in HEADLINE
        if name in _q.QUERIES
    }
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
