"""Measure temperature_mix's threshold-dispatch crossover (VERDICT r12
"what's wrong" #1): the CASE form's nested ``F.when`` tree has depth =
source cardinality — fine at the tens of sources a language mix has,
the literal-tree analysis-cost family at the thousands a per-DOMAIN mix
has. The broadcast-join form pays one metadata-sized broadcast instead
and stays flat.

Output parity between the forms is pinned by
``test_temperature_mix_join_dispatch_parity`` (value-identical by
construction — same integer thresholds, same hash gate); this tool
pins the WALL numbers that justify ``case_max_sources``'s default.

    python tools/bench_temperature_dispatch.py [n_rows] [cardinalities...]
    # default 200000 rows over 16 64 256 1024 sources
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from datapipelineetl_spark.operators import corpus


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cards = [int(a) for a in sys.argv[2:]] or [16, 64, 256, 1024]
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("bench-temperature-dispatch")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for s_card in cards:
        # skewed sizes: source k gets ~ n * (k+1) / sum weights rows
        df = (
            spark.range(n_rows)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(
                    F.lit("src"),
                    F.pmod(F.col("id") * F.col("id"), F.lit(s_card)).cast("string"),
                ).alias("source"),
            )
            .localCheckpoint(eager=True)  # exclude input gen from timings
        )
        out = {}
        for mode in ("case", "join"):
            best = float("inf")
            try:
                for _ in range(2):
                    t0 = time.perf_counter()
                    got = corpus.temperature_mix(
                        df, "doc_id", alpha=0.5, salt="bx", dispatch=mode
                    ).count()
                    best = min(best, time.perf_counter() - t0)
            except Exception as e:  # noqa: BLE001 — the cliff IS the result
                # measured: the CASE tree StackOverflows the analyzer
                # outright at 4096 sources — a hard cliff, not a slope
                out[mode] = (None, type(e).__name__)
                continue
            out[mode] = (best, got)
        (tc, nc), (tj, nj) = out["case"], out["join"]
        if tc is None:
            print(
                f"sources={s_card:5d} rows={n_rows}: case CLIFF ({nc}; "
                f"java StackOverflowError at analysis)  join {tj:6.2f}s  "
                f"kept={nj}"
            )
            continue
        assert nc == nj, (nc, nj)
        print(
            f"sources={s_card:5d} rows={n_rows}: case {tc:6.2f}s  "
            f"join {tj:6.2f}s  ratio {tc / tj:5.2f}x  kept={nc}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
