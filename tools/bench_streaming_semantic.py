"""Measure streaming_semantic_dedup's per-batch drain cost as the
accepted-vector state grows — the scaling claim in its docstring made
a table: each batch's work is the batch-side signature matmul + one
(__table, __sig) equi-join against the partition-pruned state + cosine
verification on candidates only, so per-batch time should stay FLAT
(fixture-scale job overhead) while the state grows linearly.

Batches arrive one file at a time (fresh drain per file, same
checkpoint — the incremental-ingest shape); vectors are random, so
cross-batch candidates are rare and the measured quantity is the
state-scan + join infrastructure, the part that grows.

    python tools/bench_streaming_semantic.py [n_batches batch_size]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import shutil
import tempfile

import numpy as np

from datapipelineetl_spark.session import get_session
from datapipelineetl_spark.streaming import runner

DIM = 64


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    spark = get_session("bench-streaming-semantic")
    rng = np.random.default_rng(42)
    work = Path(tempfile.mkdtemp(prefix="sem_stream_bench_"))
    src, state, out, ck = (str(work / d) for d in
                           ("src", "state", "out", "ck"))
    schema = "vec_id long, embedding array<double>"
    print("| batch # | state rows before | drain (s) |")
    print("| --- | --- | --- |")
    try:
        for b in range(n_batches):
            vecs = rng.normal(size=(batch, DIM))
            rows = [(b * batch + i, [float(x) for x in vecs[i]])
                    for i in range(batch)]
            mode = "append" if b else "overwrite"
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                mode
            ).parquet(src)
            state_rows = 0
            if Path(state, "vecs").is_dir():
                state_rows = spark.read.parquet(state + "/vecs").count()
            t0 = time.perf_counter()
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(src)
            )
            runner.streaming_semantic_dedup(
                stream, state, out, ck, dim=DIM, threshold=0.95,
                num_planes=8, num_tables=2,
            )
            dt = time.perf_counter() - t0
            print(f"| {b} | {state_rows} | {dt:.2f} |")
        n_out = spark.read.parquet(out).count()
        print(f"accepted {n_out} of {n_batches * batch}")
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
