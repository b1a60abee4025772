"""Generate an R× replicated near-dup corpus from a documents fixture
(SCALING.md evidence beyond sf0.1 — VERDICT r3 item 8).

Each replica keeps the original text plus a short replica token, so every
source doc becomes an R-member near-duplicate cluster: Jaccard between
replicas stays ≈ 1 (one extra token), which preserves — and intensifies —
the fixture's hot-bucket degeneracy. That is the point: the UNCAPPED
banding join must not survive this corpus, and the capped ladder must,
with ~linear cost in corpus size.

    python tools/gen_docs.py 10 /root/testdata/sf0.1 .scratch/docs10x

Output: {out}/documents.parquet (a parquet directory; written with 32
splits so downstream scans parallelize like a real multi-file table).
Deterministic — no RNG anywhere.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else ".scratch/docs10x"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("gen-docs")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{src}/documents.parquet")
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    reps = spark.range(r).withColumnRenamed("id", "rep")
    out_df = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * F.lit(n)).alias("doc_id"),
        F.when(F.col("rep") == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" rep"), F.col("rep")))
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    out_df.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    print(f"wrote {out_df.count()} docs ({r}x {src}) to {out}/documents.parquet")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
