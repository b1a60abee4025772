"""Measure the WIDE-DIM centroid update (VERDICT r11 item 4): kmeans'
Lloyd mean update and ivf_fit_centroids' per-cell average are both
``groupBy(cell).agg(dim x F.avg(__v[i]))`` — one aggregate EXPRESSION
per dimension. Assignment cost is held constant (``assignment="arrow"``
for kmeans; IVF's assignment is already Arrow), k is held small, and
dim sweeps 64 -> 1024: whatever grows is the dim-wide agg itself
(plan analysis + codegen of dim expressions + the k x dim partial-agg
shuffle). Warm best-of-2 per (dim, op); results recorded in SCALING.md
("Round 12: wide-dim centroid update").

    python tools/bench_wide_dim.py [dim ...]    # default 64 256 512 1024
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from datapipelineetl_spark.operators import similarity
from datapipelineetl_spark.session import get_session

N, K, ITERS = 20_000, 16, 2


def main() -> int:
    dims = [int(a) for a in sys.argv[1:]] or [64, 256, 512, 1024]
    spark = get_session("bench-wide-dim")
    rng = np.random.default_rng(42)
    print(f"| dim (n={N}, k={K}, iters={ITERS}) | kmeans arrow fit (s) | ivf fit (s) |")
    print("| --- | --- | --- |")
    for dim in dims:
        vecs = rng.normal(size=(N, dim))
        rows = [(i, [float(x) for x in vecs[i]]) for i in range(N)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).localCheckpoint(eager=True)
        best_km = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            similarity.kmeans(
                df, k=K, iters=ITERS, assignment="arrow"
            ).write.format("noop").mode("overwrite").save()
            best_km = min(best_km, time.perf_counter() - t0)
        best_ivf = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            similarity.ivf_fit_centroids(df, k_cells=K, iters=ITERS, dim=dim)
            best_ivf = min(best_ivf, time.perf_counter() - t0)
        print(f"| {dim} | {best_km:.2f} | {best_ivf:.2f} |")
        df.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
