"""End-to-end demo: the CCNet quality pipeline as ONE stream — the
production shape whose halves are oracle/parity-checked individually
(see the streaming composition tests): a crawl sample calibrates a
unigram LM and fixed perplexity cutoffs ONCE; the crawl itself then
flows through a single readStream that annotates Gopher flags + linear
quality inline (stateless narrow projections) and lands each
micro-batch scored, bucketed, and partitioned exactly-once.

    python examples/ccnet_quality_stream.py [sf_dir] [work_dir]

Stages:
  0. calibration (batch, once)   streaming_lm_counts over a held-out
                                 sample -> the accumulated token LM;
                                 perplexity_thresholds -> fixed
                                 per-language cutoffs (how CCNet
                                 shipped: calibrate once, annotate the
                                 crawl forever after)
  1. inline annotation (stream)  gopher_rules + quality_linear with
                                 annotate=True directly on the
                                 readStream frame — no foreachBatch,
                                 no state
  2. perplexity bucketing        streaming_perplexity_buckets with
                                 lm_mode="frozen": every batch (and any
                                 checkpoint-loss replay) scores against
                                 the SAME snapshotted LM — value-
                                 deterministic replay
  3. DSIR annotation             streaming_dsir_weights over the
                                 annotated store as its own stream —
                                 a second frozen-model annotator
                                 (bucket LLR vs a target domain),
                                 composing on the same pipeline the
                                 way DSIR composes on CCNet
  4. tiering                     head/middle bucket + kept=1 rows are
                                 the training tier; everything else
                                 stays in the annotated store for audit
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from datapipelineetl_spark import catalog
from datapipelineetl_spark.operators import text
from datapipelineetl_spark.session import get_session
from datapipelineetl_spark.streaming import runner


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = Path(sys.argv[2] if len(sys.argv) > 2 else ".scratch/ccnet_stream")
    spark = get_session("ccnet-quality-stream")
    docs = catalog.load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )

    import shutil

    if work.exists():
        shutil.rmtree(work)

    # --- stage 0: calibration. The sample is a held-out hash band (the
    # split_corpus discipline); its token counts accrue through the
    # same streaming LM store production would maintain.
    t_cal = time.perf_counter()
    sample = docs.filter(F.abs(F.hash("doc_id")) % 10 == 0)
    cal_src = work / "cal_arrivals"
    sample.coalesce(1).write.parquet(str(cal_src))
    lm_store = str(work / "lm_store")
    runner.streaming_lm_counts(
        spark.readStream.schema(docs.schema).parquet(str(cal_src)),
        store=lm_store,
        checkpoint=str(work / "ck_lm"),
    )
    lm = runner.read_lm_counts(spark, lm_store)
    thresholds = text.perplexity_thresholds(
        sample, group_col="lang", n_buckets=3, lm_counts=lm
    )
    n_groups = thresholds.count()
    t_cal = time.perf_counter() - t_cal

    # --- stages 1+2: the crawl as ONE stream. Quality annotation is a
    # narrow projection ON the stream frame; the bucketing sink scores
    # each micro-batch against the FROZEN LM snapshot and rewrites its
    # __batch_id partition on replay.
    crawl_src = work / "crawl_arrivals"
    docs.repartition(3).write.parquet(str(crawl_src))
    annotated_dir = str(work / "annotated")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(crawl_src))
    )
    # corpus-appropriate stopword list (the gopher_rules contract for
    # non-English/synthetic corpora): the fixture's high-frequency terms
    annotated = text.quality_linear(
        text.gopher_rules(
            stream,
            stopwords=("the", "data", "table", "join", "row", "query"),
            annotate=True,
        ),
        annotate=True,
    )
    t_crawl = time.perf_counter()
    runner.streaming_perplexity_buckets(
        annotated,
        lm_store,
        thresholds,
        annotated_dir,
        str(work / "ck_crawl"),
        group_col="lang",
        lm_mode="frozen",
    )
    t_crawl = time.perf_counter() - t_crawl

    # --- stage 3: DSIR importance annotation, chained as its own
    # stream over the annotated store (the two-drain topology of
    # examples/streaming_corpus_ingest.py). The model — raw = the
    # calibration sample, target = its head-perplexity half — is fit
    # once and collected at wire-up; scoring is stateless, so replay is
    # value-deterministic with no snapshot machinery.
    from datapipelineetl_spark.operators import corpus

    sample_scored = text.bucket_by_thresholds(
        text.unigram_logprob(sample, lm_counts=lm).join(
            sample.select("doc_id", "lang"), "doc_id"
        ),
        thresholds,
        group_col="lang",
    )
    target = (
        sample.join(
            sample_scored.filter(F.col("ppl_bucket") == 0).select("doc_id"),
            "doc_id",
        )
    )
    dsir = corpus.dsir_model(
        sample.select("doc_id", "text"), target.select("doc_id", "text"),
        n_buckets=1024,
    )
    weighted_dir = str(work / "weighted")
    annotated_schema = spark.read.parquet(annotated_dir).schema
    t_dsir = time.perf_counter()
    runner.streaming_dsir_weights(
        # drop the upstream drain's partition column: this stream's
        # sink assigns its own __batch_id partitions
        spark.readStream.schema(annotated_schema)
        .parquet(annotated_dir)
        .drop("__batch_id"),
        dsir,
        weighted_dir,
        str(work / "ck_dsir"),
        n_buckets=1024,
    )
    t_dsir = time.perf_counter() - t_dsir

    # --- stage 4: tiering off the weighted store
    store = spark.read.parquet(weighted_dir)
    n_all = store.count()
    train = store.filter((F.col("kept") == 1) & (F.col("ppl_bucket") <= 1))
    n_train = train.count()
    n_tail = store.filter(F.col("ppl_bucket") == 2).count()
    n_unscored = store.filter(F.col("ppl_bucket").isNull()).count()
    train.write.mode("overwrite").parquet(str(work / "train_tier"))

    by_bucket = (
        store.groupBy("lang", "ppl_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("quality_prob").alias("avg_q"),
            F.round(F.avg("dsir_weight"), 4).alias("avg_dsir"),
        )
        .orderBy("lang", "ppl_bucket")
    )
    by_bucket.show(truncate=False)
    print(
        f"calibrated {n_groups} language threshold rows; crawl rows={n_all} "
        f"train_tier={n_train} tail={n_tail} unscored={n_unscored}"
    )
    print(
        f"timings: calibrate={t_cal:.1f}s crawl_drain={t_crawl:.1f}s "
        f"(3 micro-batches) dsir_drain={t_dsir:.1f}s"
    )
    ok = n_all == docs.count() and 0 < n_train < n_all and n_groups > 0
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
