"""Measure streaming_near_dup_filter's per-batch drain cost as the
accumulated bands/tokens state grows — the surface twin of
tools/bench_streaming_semantic.py (VERDICT r14 optional depth 7: the
semantic tier had a measured state-growth row, the MinHash tier's
docstring claim did not).

Per its docstring, each batch's work is: banding the batch (narrow),
ONE (band, band_key) equi-join against the partition-pruned state scan
(AQE-broadcast while small), exact-Jaccard verification on candidates
only, then batch-id-partitioned state/output overwrites. So per-batch
drain time should stay FLAT (fixture-scale job overhead dominated)
while state rows grow linearly with accepted docs × bands.

Documents are near-unique (id-salted token tails over a shared
vocabulary), so cross-batch candidate pairs exist but verified dups
are rare — the measured quantity is the state-scan + join + write
infrastructure, the part that grows with history.

    python tools/bench_streaming_neardup.py [n_batches batch_size]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datapipelineetl_spark.session import get_session
from datapipelineetl_spark.streaming import runner


def _doc_text(i: int) -> str:
    # shared head (band-bucket pressure exists) + per-doc-unique tail
    # (tokens carry the doc id, so NO two docs share a tail token —
    # cross-doc Jaccard ≈ 8/56 < threshold, nearly everything is
    # accepted and the state grows linearly with arrivals)
    head = f"common preamble tokens shared by cohort {i % 7}"
    tail = " ".join(f"tok{i}x{j}" for j in range(24))
    return f"{head} {tail}"


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    spark = get_session("bench-streaming-neardup")
    work = Path(tempfile.mkdtemp(prefix="neardup_stream_bench_"))
    src, state, out, ck = (str(work / d) for d in ("src", "state", "out", "ck"))
    schema = "doc_id long, text string"
    print("| batch # | state band rows before | drain (s) |")
    print("| --- | --- | --- |")
    try:
        for b in range(n_batches):
            rows = [(b * batch + i, _doc_text(b * batch + i)) for i in range(batch)]
            mode = "append" if b else "overwrite"
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                mode
            ).parquet(src)
            state_rows = 0
            if Path(state, "bands").is_dir():
                state_rows = spark.read.parquet(state + "/bands").count()
            t0 = time.perf_counter()
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(src)
            )
            runner.streaming_near_dup_filter(
                stream, state, out, ck, threshold=0.7,
                num_hashes=16, bands=4, rows_per_band=4,
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
