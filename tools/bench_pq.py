"""Measure the PQ ADC scan tier against the exact brute-force scan it
replaces (round 12 depth: the memory-compression leg of the ANN ladder,
similarity.pq_fit/pq_encode/pq_adc_topk).

Two claims to pin with numbers, not arguments:

1. **Scan cost**: an ADC top-k pass reads m small ints per row and does
   m literal-LUT lookups — vs the exact pass reading the dim-sized
   vector and doing a dim-term fold. Measured as warm best-of-2 top-10
   wall over an n-vector synthetic corpus, both from the same cached
   encoded frame (the persisted-store shape: codes NEXT TO vectors).
2. **Storage**: the code column is m × int vs dim × float — the 100 TB
   store either drops the raw vectors entirely (ADC-only, refine
   against a small exact shard) or scans 10-30× fewer bytes per query.
   Reported from the parquet footprint of each column written alone.

Fit is on a SAMPLE (the ivf_fit_centroids practice) — fit cost is
excluded from the scan comparison on purpose; encode cost (one Arrow
pass, mode="arrow") is reported once.

    python tools/bench_pq.py [n ...]    # default 50000 200000
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from pyspark.sql import functions as F

from datapipelineetl_spark.operators import similarity
from datapipelineetl_spark.session import get_session

DIM, M, KSUB, ITERS, FIT_N = 64, 8, 256, 2, 10_000


def _timed(fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    ns = [int(a) for a in sys.argv[1:]] or [50_000, 200_000]
    spark = get_session("bench-pq")
    rng = np.random.default_rng(42)
    print(
        f"| n (dim={DIM}, m={M}, k_sub={KSUB}, arrow encode, fit on "
        f"{FIT_N}-row sample) | encode (s) | exact top-10 (s) "
        f"| ADC top-10 (s) | vec col (MiB) | code col (MiB) |"
    )
    print("| --- | --- | --- | --- | --- | --- |")
    for n in ns:
        vecs = rng.normal(size=(n, DIM))
        rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
        df = (
            spark.createDataFrame(rows, "vec_id long, embedding array<double>")
            .repartition(32)
            .localCheckpoint(eager=True)
        )
        fit_sample = df.filter(F.col("vec_id") < FIT_N)
        books = similarity.pq_fit(
            fit_sample, m=M, k_sub=KSUB, iters=ITERS, dim=DIM
        )
        t0 = time.perf_counter()
        enc = similarity.pq_encode(df, books, mode="arrow").localCheckpoint(
            eager=True
        )
        t_enc = time.perf_counter() - t0
        q = [float(x) for x in vecs[0]]
        t_exact = _timed(
            lambda: similarity.cosine_topk(enc, q, k=10, exclude_ids=(0,)).collect()
        )
        t_adc = _timed(
            lambda: similarity.pq_adc_topk(
                enc, q, books, k=10, exclude_ids=(0,)
            ).collect()
        )
        with tempfile.TemporaryDirectory() as td:
            enc.select("vec_id", "embedding").write.parquet(f"{td}/vec")
            enc.select("vec_id", "pq_code").write.parquet(f"{td}/code")
            mib = lambda p: sum(
                f.stat().st_size for f in Path(p).rglob("*.parquet")
            ) / 2**20
            v_mib, c_mib = mib(f"{td}/vec"), mib(f"{td}/code")
        print(
            f"| {n} | {t_enc:.2f} | {t_exact:.2f} | {t_adc:.2f} "
            f"| {v_mib:.1f} | {c_mib:.1f} |"
        )
        df.unpersist()
        enc.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
