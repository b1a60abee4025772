"""Skew micro-bench: where does salting actually WIN? (VERDICT r4 item 7)

q_salted_join_volume verifies salted_join's result parity on uniform TPC-H
keys — which never exercises the skew the operator exists for. This tool
measures the plain shuffle join vs relational.salted_join on a synthetic
Zipf-ish keyed frame where one key holds ``hot_pct`` % of all rows, with
size-based broadcast disabled (the regime salting targets: both sides
shuffle) under three configurations:

  plain / AQE skew-split OFF   — the unmitigated baseline: the hot key's
                                  rows all land on ONE reducer task
  plain / AQE skew-split ON    — Spark's built-in runtime mitigation
  salted / AQE skew-split OFF  — the explicit rewrite (for engines/
                                  situations where AQE can't help: e.g.
                                  the skewed side feeds a co-partitioned
                                  downstream, or a streaming micro-batch)

Usage: python tools/bench_salted.py [n_rows] [hot_pct ...]
Prints a markdown table for SCALING.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from datapipelineetl_spark.operators import relational
from datapipelineetl_spark.session import get_session

N_KEYS = 256
BUCKETS = 16


def build(spark, n_rows: int, hot_pct: int):
    """Left: n_rows with key 0 holding hot_pct% of rows, rest uniform
    over N_KEYS. Right: one row per key (the lookup side salting
    replicates). Deterministic — no RNG. Staged through parquet (not
    localCheckpoint) so the generator never competes for heap with the
    join under test."""
    path = f".scratch/salted_left_{n_rows}_{hot_pct}"
    (
        spark.range(n_rows)
        .withColumn(
            "k",
            F.when(F.col("id") % 100 < hot_pct, F.lit(0)).otherwise(
                F.col("id") % N_KEYS
            ),
        )
        .withColumn("v", F.col("id") % 1000)
        .write.mode("overwrite")
        .parquet(path)
    )
    left = spark.read.parquet(path)
    right = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("w")
    )
    return left, right


def timed(fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def drain(df) -> None:
    df.groupBy().agg(F.sum(F.col("v") + F.col("w"))).collect()


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    hot_pcts = [int(x) for x in sys.argv[2:]] or [0, 50, 90]
    spark = get_session("bench-salted")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    print(f"| rows | hot-key share | plain (AQE skew off) | plain (AQE skew on) | salted×{BUCKETS} (AQE skew off) |")
    print("| --- | --- | --- | --- | --- |")
    for hot in hot_pcts:
        left, right = build(spark, n_rows, hot)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        t_plain = timed(lambda: drain(left.join(right, "k")))
        t_salted = timed(
            lambda: drain(relational.salted_join(left, right, ["k"], buckets=BUCKETS))
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        t_aqe = timed(lambda: drain(left.join(right, "k")))
        print(
            f"| {n_rows:,} | {hot}%+uniform | {t_plain} s | {t_aqe} s | {t_salted} s |"
        )


if __name__ == "__main__":
    main()
