"""Measure the semdedup pair-stage crossover: interpreted-dot equi-join
vs the per-cluster applyInPandas BLAS kernel (VERDICT r9 item 4).

Builds synthetic unit-ish embeddings forced into ONE cluster (k=1,
iters=1) so the measured quantity is exactly the within-cluster pair
stage at cluster size m — the regime the kernel exists for. Warm
best-of-2 per (m, stage); results recorded in SCALING.md ("Round 10:
semdedup pair-stage crossover").

    python tools/bench_semdedup.py [m ...]     # default 250 500 1000 2000

``--skewed`` (VERDICT r10 item 6) measures the production shape the
single-cluster grid can't: a corpus whose k-means partition is SKEWED —
one giant cluster (the regime that dominates Σ|cluster|²) amid many
small ones. Blobs are drawn around well-separated random centers so
Lloyd recovers the designed membership; the tool prints the realized
cluster-size histogram next to the timings so the skew is auditable.

    python tools/bench_semdedup.py --skewed [giant small n_small ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from datapipelineetl_spark.operators import similarity
from datapipelineetl_spark.session import get_session

DIM = 64


def skewed_main(args: list[str]) -> int:
    """One giant blob + many small ones: time the FULL semdedup (fit +
    pair stage) per pair_stage on the realized skewed partition."""
    sizes = [int(a) for a in args] or [2000, 100, 12]
    giant, small, n_small = sizes[0], sizes[1], sizes[2]
    k = n_small + 1
    spark = get_session("bench-semdedup")
    rng = np.random.default_rng(42)
    # centers far apart relative to the within-blob noise so the Lloyd
    # fit recovers the designed (giant, small, ..., small) membership
    centers = rng.normal(size=(k, DIM)) * 10.0
    blobs = [giant] + [small] * n_small
    vecs = np.concatenate(
        [centers[j] + rng.normal(size=(n, DIM)) for j, n in enumerate(blobs)]
    )
    # kmeans seeds from the k LOWEST-id vectors: give ids 0..k-1 to one
    # member per blob so Lloyd recovers the DESIGNED membership (random
    # seeding would drop several seeds into the giant blob and split it
    # — the realized histogram below audits that the skew held)
    first_of_blob = np.cumsum([0] + blobs[:-1])
    rest = np.setdiff1d(np.arange(len(vecs)), first_of_blob)
    order = np.concatenate([first_of_blob, rng.permutation(rest)])
    rows = [(int(i), [float(x) for x in vecs[p]])
            for i, p in enumerate(order)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).localCheckpoint(eager=True)

    hist = (
        similarity.kmeans(df, k=k, iters=2)
        .groupBy("cluster").count().orderBy("count", ascending=False)
    )
    print("realized cluster sizes:",
          [r["count"] for r in hist.collect()])
    timings = {}
    for stage in ("join", "kernel"):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            similarity.semdedup(
                df, k=k, iters=2, threshold=0.95, materialize=True,
                pair_stage=stage,
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[stage] = best
    print(
        f"| {giant}+{n_small}x{small} | {timings['join']:.2f} "
        f"| {timings['kernel']:.2f} "
        f"| {timings['join'] / timings['kernel']:.1f}x |"
    )
    return 0


def largek_main(args: list[str]) -> int:
    """The composed large-k measurement: FULL semdedup on n random
    vectors at production k, oracle path (all JVM folds) vs production
    path (arrow assignment + broadcast transport + BLAS pair stage).
    The fold path is linear in k twice over, so it runs ONCE (cold)
    per k; the production path gets warm best-of-2."""
    sizes = [int(a) for a in args] or [512]
    n = 20_000
    spark = get_session("bench-semdedup")
    rng = np.random.default_rng(42)
    vecs = rng.normal(size=(n, DIM))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).localCheckpoint(eager=True)
    print(f"| k (n={n}, dim={DIM}, iters=2) | oracle path (s, cold) "
          f"| production path (s) | ratio |")
    print("| --- | --- | --- | --- |")
    for k in sizes:
        t0 = time.perf_counter()
        similarity.semdedup(
            df, k=k, iters=2, threshold=0.95, materialize=True,
        ).write.format("noop").mode("overwrite").save()
        fold = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            similarity.semdedup(
                df, k=k, iters=2, threshold=0.95, materialize=True,
                assignment="arrow", transport="broadcast",
                pair_stage="kernel",
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"| {k} | {fold:.2f} | {best:.2f} | {fold / best:.1f}x |")
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--skewed":
        return skewed_main(sys.argv[2:])
    if len(sys.argv) > 1 and sys.argv[1] == "--largek":
        return largek_main(sys.argv[2:])
    sizes = [int(a) for a in sys.argv[1:]] or [250, 500, 1000, 2000]
    spark = get_session("bench-semdedup")
    rng = np.random.default_rng(42)
    print(f"| cluster size m | join (s) | kernel (s) | ratio |")
    print(f"| --- | --- | --- | --- |")
    for m in sizes:
        vecs = rng.normal(size=(m, DIM))
        rows = [(i, [float(x) for x in vecs[i]]) for i in range(m)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).localCheckpoint(eager=True)  # exclude fixture-build cost
        timings = {}
        for stage in ("join", "kernel"):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                similarity.semdedup(
                    df, k=1, iters=1, threshold=0.95, materialize=True,
                    pair_stage=stage,
                ).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[stage] = best
        print(
            f"| {m} | {timings['join']:.2f} | {timings['kernel']:.2f} "
            f"| {timings['join'] / timings['kernel']:.1f}x |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
