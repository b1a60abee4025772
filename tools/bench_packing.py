"""Measure the packing-efficiency delta pack_best_fit buys over
pack_greedy (VERDICT r11 item 7c): both packers share the
no-pack-exceeds-budget contract, so the comparable figure is
UTILIZATION = total_tokens / (packs x budget) — the complement of the
padding a training loader would burn. Lengths are the REAL token
counts of the documents table at $SPARK_GRAFT_SF_DIR (ragged,
long-tailed — the distribution BFD's keep-every-pack-open rule is
built for). pack_chunks is timed alongside as the contiguous baseline
but its utilization is not comparable (boundary docs straddle packs by
contract). Warm best-of-2; results recorded in SCALING.md
("Round 12: packing efficiency").

    python tools/bench_packing.py [budget [n_shards]]    # default 2048 32
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from datapipelineetl_spark.operators import corpus, text
from datapipelineetl_spark.session import get_session


def main() -> int:
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("bench-packing")
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", F.size(text.tokens("text")).alias("n_tokens"))
        .localCheckpoint(eager=True)
    )
    n_docs, total = docs.agg(
        F.count(F.lit(1)), F.sum("n_tokens")
    ).first()
    print(f"docs={n_docs} total_tokens={total} budget={budget} n_shards={n_shards} (sf_dir={sf_dir})")
    print("| packer | packs | utilization | wall (s) |")
    print("| --- | --- | --- | --- |")

    def run(name, fn, comparable=True):
        best, packs = float("inf"), None
        for _ in range(2):
            t0 = time.perf_counter()
            packs = fn().select("pack_id").distinct().count()
            best = min(best, time.perf_counter() - t0)
        util = f"{total / (packs * budget):.4f}" if comparable else "n/a (straddle)"
        print(f"| {name} | {packs} | {util} | {best:.2f} |")

    run("pack_greedy", lambda: corpus.pack_greedy(
        docs, "doc_id", "n_tokens", budget=budget, n_shards=n_shards))
    run("pack_best_fit", lambda: corpus.pack_best_fit(
        docs, "doc_id", "n_tokens", budget=budget, n_shards=n_shards))
    run("pack_chunks", lambda: corpus.pack_chunks(
        docs, "n_tokens", budget=budget, order_col="doc_id", n_shards=n_shards),
        comparable=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
