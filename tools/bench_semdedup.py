"""Measure the semdedup pair-stage crossover: interpreted-dot equi-join
vs the per-cluster applyInPandas BLAS kernel (VERDICT r9 item 4).

Builds synthetic unit-ish embeddings forced into ONE cluster (k=1,
iters=1) so the measured quantity is exactly the within-cluster pair
stage at cluster size m — the regime the kernel exists for. Warm
best-of-2 per (m, stage); results recorded in SCALING.md ("Round 10:
semdedup pair-stage crossover").

    python tools/bench_semdedup.py [m ...]     # default 250 500 1000 2000
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


def main() -> int:
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
