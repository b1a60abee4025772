"""Per-operator micro-bench for the sketch family (SCALING.md evidence).

Times the Bloom decontamination path against the exact gram join it
replaces, plus the count-min and HLL builds, isolated per stage:

    python tools/bench_sketch.py 32                       # sf0.1
    python tools/bench_sketch.py 32 .scratch/docs10x      # 10x corpus

Prints one JSON line: {"master": ..., "sf_dir": ..., "stages": {...}}.

The claims under test (operators/sketch.py docstrings):
- ``bloom_flag`` is MAP-ONLY — cost grows ~linearly with corpus rows
  and carries no shuffle, while ``exact_join`` shuffles
  O(corpus x grams/doc) rows; the gap should widen on the 10x corpus.
- ``countmin`` / ``hll`` shuffles are bounded by sketch geometry per
  partition (partial-agg), so they too scale ~linearly with scan cost.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from datapipelineetl_spark.operators import corpus, sketch  # noqa: E402


def timed(fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> int:
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"bench-sketch-{cpus}")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "8g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        int(cpus)
    )
    docs = docs.localCheckpoint(eager=True)  # isolate stages from scan
    bench = docs.filter(F.col("source") == "src0")
    corp = docs.filter(F.col("source") != "src0")

    stages: dict[str, float] = {}
    stages["bitset_build"] = timed(
        lambda: sketch.build_bloom_bitset(bench, n=8, k=2)
    )
    bits = sketch.build_bloom_bitset(bench, n=8, k=2)
    stages["bloom_flag"] = timed(
        lambda: sketch.bloom_flag_contaminated(corp, bits, n=8, k=2)
        .filter("bloom_contaminated = 1")
        .count()
    )
    stages["exact_join"] = timed(
        lambda: corpus.contaminated_ids(
            corp, bench, n=8, side="train"
        ).count()
    )
    stages["countmin"] = timed(
        lambda: sketch.countmin_sketch(docs, depth=3, width=64).count()
    )
    stages["hll"] = timed(
        lambda: sketch.hll_distinct(docs, "source", "text", m=64).count()
    )
    print(
        json.dumps(
            {
                "master": f"local[{cpus}]",
                "sf_dir": sf_dir,
                "n_docs": docs.count(),
                "stages": stages,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
