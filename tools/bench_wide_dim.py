"""Measure the WIDE-DIM centroid update (VERDICT r11 item 4): kmeans'
Lloyd mean update and ivf_fit_centroids' per-cell average were both
``groupBy(cell).agg(dim x F.avg(__v[i]))`` — one aggregate EXPRESSION
per dimension, which OOMs the 1 GiB local JVM outright at
dim=1024/n=20k (measured: every probe died in the agg stage while the
Arrow assignment pass completed in ~3 s). The Arrow running-sum update
(``_mean_update_arrow``; kmeans assignment="arrow" routes through it,
ivf update="arrow") replaces the dim-wide agg with two Arrow passes.
This tool sweeps dim with k fixed small and assignment held Arrow, so
whatever grows (or dies) is the UPDATE plan. Warm best-of-2; "OOM"
rows are recorded from separate single-run probes since they kill the
JVM. Results in SCALING.md ("Round 12: wide-dim centroid update").

    python tools/bench_wide_dim.py [dim ...]    # default 64 256 512 1024
    SPARK_GRAFT_WIDEDIM_AGG=1 python tools/bench_wide_dim.py 1024  # agg-update probe (expect OOM at 1024)
"""

from __future__ import annotations

import os
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
    agg_probe = os.environ.get("SPARK_GRAFT_WIDEDIM_AGG") == "1"
    ivf_update = "agg" if agg_probe else "arrow"
    spark = get_session("bench-wide-dim")
    rng = np.random.default_rng(42)
    print(
        f"| dim (n={N}, k={K}, iters={ITERS}, update={ivf_update}) "
        f"| kmeans arrow fit (s) | ivf fit (s) |"
    )
    print("| --- | --- | --- |")
    for dim in dims:
        vecs = rng.normal(size=(N, dim))
        rows = [(i, [float(x) for x in vecs[i]]) for i in range(N)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).localCheckpoint(eager=True)
        if agg_probe:
            # the agg-update form: kmeans fold-mode mean agg is the same
            # plan shape; probe via ivf update="agg" only (single run —
            # an OOM kills the JVM)
            t0 = time.perf_counter()
            similarity.ivf_fit_centroids(
                df, k_cells=K, iters=ITERS, dim=dim, update="agg")
            print(f"| {dim} | n/a | {time.perf_counter() - t0:.2f} |")
            df.unpersist()
            continue
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
            similarity.ivf_fit_centroids(
                df, k_cells=K, iters=ITERS, dim=dim, update="arrow")
            best_ivf = min(best_ivf, time.perf_counter() - t0)
        print(f"| {dim} | {best_km:.2f} | {best_ivf:.2f} |")
        df.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
