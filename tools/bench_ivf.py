"""IVF ANN evidence at 10× corpus (VERDICT r4 item 8): probe fraction vs
recall@10 on a 20k-vector store, with the production path exercised —
fit on a SAMPLE, assign the full corpus once, persist partitioned by
cell, probe via partition pruning.

The corpus is the sf0.1 embeddings replicated R× with a small
deterministic per-replica perturbation (F.hash-derived, no RNG), so
every source vector becomes an R-member neighbor cluster — the
clustered-corpus regime IVF serves (the raw fixture is near-uniform,
LSH/IVF's worst case, covered by q_ivf_recall).

    python tools/bench_ivf.py [R] [sf_dir] [out_dir]

Prints a markdown table for SCALING.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from pyspark.sql import functions as F

from datapipelineetl_spark import catalog
from datapipelineetl_spark.operators import similarity
from datapipelineetl_spark.session import get_session

K_CELLS = 32
K = 10


def main() -> int:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else ".scratch/ivf10x"
    spark = get_session("bench-ivf")
    emb = catalog.load(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])

    reps = spark.range(r).withColumnRenamed("id", "rep")
    big = emb.crossJoin(reps).select(
        (F.col("vec_id") * r + F.col("rep")).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            # ±2.5% deterministic jitter per (replica-id, dimension)
            lambda x, i: x
            + (F.pmod(F.hash(F.col("vec_id") * r + F.col("rep"), i), 1000) - 500)
            / F.lit(20000.0),
        ).alias("embedding"),
    )
    big = big.repartition(32).localCheckpoint(eager=True)
    n = big.count()

    # production fit path: sample → fit → one assignment pass → persist
    sample = big.filter(F.col("vec_id") % 10 == 0)
    t0 = time.perf_counter()
    cents = similarity.ivf_fit_centroids(sample, k_cells=K_CELLS, iters=4, dim=dim)
    t_fit = time.perf_counter() - t0
    t0 = time.perf_counter()
    similarity.ivf_assign(big, cents).write.mode("overwrite").partitionBy(
        "ivf_cell"
    ).parquet(out)
    t_assign = time.perf_counter() - t0
    store = spark.read.parquet(out)
    cell_sizes = {
        row.ivf_cell: row.n
        for row in store.groupBy("ivf_cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(f"corpus: {n} vectors, {K_CELLS} cells, fit-on-sample {t_fit:.1f}s "
          f"(10% sample), assign+write {t_assign:.1f}s")

    probe_vec = [(1.0 if i % 7 == 0 else 0.1) for i in range(dim)]
    exact = {
        row.vec_id
        for row in similarity.cosine_topk(store, probe_vec, k=K).collect()
    }
    c = np.asarray(cents)
    q = np.asarray(probe_vec)
    order = np.argsort(-(c @ q), kind="stable")
    print("| nprobe | rows scanned | corpus fraction | recall@10 |")
    print("| --- | --- | --- | --- |")
    for nprobe in (1, 2, 4, 8, 16):
        cells = [int(x) for x in order[:nprobe]]
        scanned = sum(cell_sizes.get(cc, 0) for cc in cells)
        approx = {
            row.vec_id
            for row in similarity.ivf_topk(
                store, probe_vec, cents, k=K, nprobe=nprobe, cell_col="ivf_cell"
            ).collect()
        }
        rec = len(exact & approx) / K
        print(f"| {nprobe} | {scanned:,} | {scanned / n:.1%} | {rec:.2f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
