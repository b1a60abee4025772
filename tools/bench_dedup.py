"""Per-operator micro-bench for the dedup ladder (SCALING.md evidence).

Times each stage of the §2.11 dedup ladder on the ``documents`` fixture,
isolated per stage (upstream stages cached + materialized first so a
stage's number is ITS cost, not its lineage's). Run once per parallelism
to evidence the shuffle-volume claims in ``dedup.py`` docstrings:

    python tools/bench_dedup.py 32   # local[32]
    python tools/bench_dedup.py 4    # local[4]
    python tools/bench_dedup.py 32 /root/testdata/sf0.1
    python tools/bench_dedup.py 32 .scratch/docs10x 50   # capped ladder

Prints one JSON line: {"master": "local[N]", "sf_dir": ..., "stages": {...}}.

The optional third argument is a hot-bucket cap (``max_bucket_size``) for
the banding/verify/cluster stages — REQUIRED on the 10× replicated corpus
(tools/gen_docs.py), where every source doc is an R-member near-dup
cluster and the uncapped bucket self-join's pair emission grows ~R² (the
capped ladder is the production configuration; measuring the uncapped one
there measures data degeneracy, not the engine).

A narrow codegen stage (minhash, simhash) should barely move between
local[4] and local[32] at this size (single-wave, overhead-bound), while
shuffle-bearing stages (LSH bucket join, verify join, cluster iterations)
should show the gap — that asymmetry is the point of the table.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from datapipelineetl_spark.operators import dedup, text  # noqa: E402


def timed(fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> int:
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else None
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"bench-dedup-{cpus}")
        .config("spark.sql.shuffle.partitions", cpus)
        # local mode = driver JVM hosts all executor threads; the default
        # 1g heap OOMs with 32 concurrent token-array tasks at sf0.1
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # The fixture is ONE parquet file → one input split, which would cap
    # every narrow stage at parallelism 1 regardless of master. A 100 TB
    # table has millions of splits; repartition to the worker count so the
    # measurement reflects per-core scaling, not fixture file layout.
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .repartition(int(cpus))
    )
    docs.cache().count()

    stages: dict[str, float] = {}

    # narrow, no-shuffle stages
    stages["minhash_signature"] = timed(
        lambda: dedup.minhash_signature(docs).select(F.sum(F.element_at("minhash", 1))).collect()
    )
    stages["simhash"] = timed(
        lambda: text.with_simhash(docs).select(F.sum("simhash")).collect()
    )

    # shuffle-bearing stages, upstream materialized
    sigs = dedup.minhash_signature(docs)
    sigs.cache().count()
    stages["lsh_candidate_pairs"] = timed(
        lambda: dedup.lsh_candidate_pairs(
            sigs, "doc_id", sig_len=16, max_bucket_size=cap, materialize=True
        ).count()
    )
    cands = dedup.lsh_candidate_pairs(
        sigs, "doc_id", sig_len=16, max_bucket_size=cap, materialize=True
    )
    cands.cache().count()
    stages["verify_jaccard_join"] = timed(
        lambda: dedup.near_dup_pairs(
            docs, threshold=0.7, max_bucket_size=cap, materialize=True
        ).count()
    )
    pairs = dedup.near_dup_pairs(docs, threshold=0.7, max_bucket_size=cap, materialize=True)
    pairs.cache().count()
    stages["cluster_pairs"] = timed(
        lambda: dedup.cluster_pairs(pairs.select("id_a", "id_b")).count(), reps=1
    )
    stages["exact_dedup_fingerprint"] = timed(
        lambda: dedup.dedup_by_fingerprint(
            text.with_token_set_fingerprint(docs, out="fp"),
            "fp",
            ["doc_id"],
            "doc_id",
        ).count()
    )

    print(json.dumps({"master": f"local[{cpus}]", "sf_dir": sf_dir, "stages": stages}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
