"""End-to-end demo: CONTINUOUS corpus ingest — documents arrive as a
file stream and leave as a deduplicated, decontaminated, PII-scrubbed
store, with all dedup/decontamination state replay-safe on disk.

    python examples/streaming_corpus_ingest.py [sf_dir] [work_dir]

The streaming twin of examples/prepare_training_corpus.py: the batch
script is the terminal form (run once over a finished crawl); this one
is the crawl-while-ingesting form. Stages per micro-batch:

  1. streaming_near_dup_filter   drop docs near-duplicating anything
                                 accepted earlier (persisted MinHash
                                 band + token-set state, batch-id
                                 partitioned → replays rewrite) and
                                 within-batch dups beyond the min-id
                                 representative
  1b. streaming_semantic_dedup   (parallel tier) the embedding stream:
                                 drop vectors cosine-≥-0.95 to anything
                                 accepted earlier (SRP-LSH signature +
                                 unit-vector state) — semantic copies
                                 that share no surface n-grams
  2. streaming_decontaminate     drop docs sharing 8-grams with the
                                 held-out eval set (static precomputed
                                 n-gram store)
  3. redact_pii                  inside the decontamination batch fn,
                                 narrow regexp chain

Two chained availableNow drains (stage 1's accepted store feeds stage
2's stream) keep each operator's checkpoint/state independent — the
same topology as chaining two jobs off a message bus, without needing
one. (`runner.streaming_corpus_filter` is the fused single-drain form
of the same ladder: one source read, one checkpoint, one output; this
demo keeps the two-stage topology to show the stores compose.)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from datapipelineetl_spark import catalog
from datapipelineetl_spark.operators import corpus
from datapipelineetl_spark.session import get_session
from datapipelineetl_spark.streaming import runner


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = Path(sys.argv[2] if len(sys.argv) > 2 else ".scratch/stream_ingest")
    spark = get_session("streaming-corpus-ingest")
    docs = catalog.load(spark, sf_dir, "documents")
    n0 = docs.count()

    # fresh run every time: checkpoints/state from a previous invocation
    # would otherwise make the drains no-ops (state and checkpoint share
    # fate — see streaming_near_dup_filter's caveat)
    import shutil

    if work.exists():
        shutil.rmtree(work)

    # --- simulate a crawler: land the fixture docs as parquet arrivals
    # (three files × 1-file triggers = three micro-batches, so the state
    # store accrues enough partitions to demonstrate compaction below;
    # repartition, not coalesce — the tiny fixture arrives as ONE split
    # and coalesce can never raise the count)
    src = work / "arrivals"
    docs.select("doc_id", "text").repartition(3).write.mode("overwrite").parquet(
        str(src)
    )

    # held-out eval set = last 10% of doc ids; its n-gram store is
    # precomputed ONCE (corpus.ngram_hashes) — the static side of the
    # decontamination join
    cut = docs.agg(F.expr("percentile(doc_id, 0.9)")).first()[0]
    eval_df = docs.filter(F.col("doc_id") > cut).select("doc_id", "text")
    eval_grams = corpus.ngram_hashes(eval_df, n=8)

    # --- stage 1: streaming near-dup filter (incremental LSH state)
    deduped_dir = str(work / "deduped")
    stream1 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    runner.streaming_near_dup_filter(
        stream1,
        state_dir=str(work / "dedup_state"),
        output_dir=deduped_dir,
        checkpoint=str(work / "ck1"),
        threshold=0.7,
        max_bucket_size=50,
        dropped_dir=str(work / "dup_audit"),
    )
    n1 = spark.read.parquet(deduped_dir).count()

    # --- state-compaction scheduling: fold old __batch_id partitions
    # BETWEEN drains (never while a query writes the store). In
    # production hang this off whatever runs between ingest windows —
    # a cron slot, the orchestrator's post-drain hook — keyed on the
    # partition count, e.g. fold once a sub-store exceeds ~100
    # partitions. keep_last >= 1 is mandatory: the newest partition may
    # belong to an epoch whose checkpoint commit never landed, and a
    # replay of that epoch must still see (and then overwrite) it.
    parts_before = len(
        list((work / "dedup_state" / "tokens").glob("__batch_id=*"))
    )
    folded = 0
    if parts_before > 2:
        folded = runner.compact_state(
            spark, str(work / "dedup_state"), keep_last=1
        )

    # --- crawl-health sketches, maintained batch-by-batch over the
    # same arrivals (streaming_sketch_state): count-min cells + HLL
    # registers land under each __batch_id and fold EXACTLY at read
    # time (sum / max) — the monitor never re-reads history, and the
    # folded state is bit-identical to a batch build (test-pinned)
    stream_sk = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    runner.streaming_sketch_state(
        stream_sk.withColumn("source", F.lit("crawl")),
        store=str(work / "sketch_state"),
        checkpoint=str(work / "ck_sk"),
        group_col="source",
    )
    vocab_est = runner.read_hll_state(
        spark, str(work / "sketch_state"), "source"
    ).first()["hll_estimate"]
    token_mass = (
        runner.read_countmin_state(spark, str(work / "sketch_state"))
        .filter(F.col("row") == 0)
        .agg(F.sum("cnt"))
        .first()[0]
    )
    print(
        f"crawl monitor (sketch state): ~{vocab_est} distinct tokens "
        f"(HLL), {token_mass} tokens ingested (CM row mass)"
    )

    # --- stage 1b (parallel tier): streaming SEMANTIC dedup over the
    # embedding table — the crawl's vector side arrives as its own
    # stream and leaves as an accepted-vector registry (SRP-LSH state,
    # batch-id partitioned like stage 1's). Semantic copies share no
    # surface n-grams, so this catches what stage 1 cannot
    # (translations, templated rewrites); production would anti-join
    # the doc store on the dropped vec ids.
    emb = catalog.load(spark, sf_dir, "embeddings")
    emb_dim = emb.selectExpr("size(embedding) AS d").filter("d > 0").first()["d"]
    emb_src = work / "emb_arrivals"
    emb.select("vec_id", "embedding").repartition(3).write.mode(
        "overwrite"
    ).parquet(str(emb_src))
    sem_dir = str(work / "sem_accepted")
    stream_sem = (
        spark.readStream.schema(emb.select("vec_id", "embedding").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(emb_src))
    )
    runner.streaming_semantic_dedup(
        stream_sem,
        state_dir=str(work / "sem_state"),
        output_dir=sem_dir,
        checkpoint=str(work / "ck_sem"),
        dim=emb_dim,
        threshold=0.95,
        max_bucket_size=100,
        dropped_dir=str(work / "sem_audit"),
    )
    n_vec = emb.count()
    n_sem = spark.read.parquet(sem_dir).count()
    print(
        f"semantic tier: {n_vec} vectors arrived, {n_sem} accepted "
        f"({n_vec - n_sem} semantic near-dups dropped)"
    )

    # --- stage 2: streaming decontamination + redaction of the survivors
    clean_dir = str(work / "clean")
    stream2 = (
        spark.readStream.schema("doc_id long, text string, __batch_id int")
        .parquet(deduped_dir)
        .drop("__batch_id")
    )
    runner.streaming_decontaminate(
        stream2,
        eval_grams,
        output_dir=clean_dir,
        checkpoint=str(work / "ck2"),
        n=8,
        dropped_dir=str(work / "contam_audit"),
    )
    with_epoch = spark.read.parquet(clean_dir)
    clean = corpus.redact_pii(with_epoch.drop("__batch_id"), "text")
    n2 = clean.count()
    clean.write.mode("overwrite").parquet(str(work / "final"))

    # --- between-epochs drift: profile each ingest epoch's survivors
    # and diff the two corpus_report snapshots — the "did the crawl's
    # source/language/quality mix shift while we ingested?" dashboard.
    # Epochs come from STAGE 1's micro-batches (1-file triggers → one
    # __batch_id per arrival file; stage 2 drains all files at once so
    # its batch id is a single epoch): batch 0 = the first crawl
    # window, later batches = the next. In production: store each
    # window's report (group-count-sized parquet) and diff consecutive
    # snapshots. The demo stream carries only (doc_id, text), so
    # source/lang rejoin from the document store — a real crawler
    # would keep them on the arrival records.
    epochs = spark.read.parquet(deduped_dir).select("doc_id", "__batch_id")
    meta = docs.select("doc_id", "source", "lang")
    epoch = (
        clean.select("doc_id", "text").join(epochs, "doc_id").join(meta, "doc_id")
    )
    rep1 = corpus.corpus_report(epoch.filter(F.col("__batch_id") == 0))
    rep2 = corpus.corpus_report(epoch.filter(F.col("__batch_id") > 0))
    drift = corpus.corpus_drift(rep1, rep2)
    print("drift between ingest epochs (batch 0 vs later):")
    drift.orderBy("source", "lang").show(truncate=False)
    n_drift = drift.count()

    def audit_count(path: Path) -> int:
        # an audit store may not exist (no drops, or every batch's
        # dropped frame empty) — absence means zero, not a crash
        if not path.is_dir() or not any(path.rglob("*.parquet")):
            return 0
        return spark.read.parquet(str(path)).count()

    dups = audit_count(work / "dup_audit")
    contam = audit_count(work / "contam_audit")

    # --- per-stage attrition accounting, same (stage, n_rows,
    # n_dropped) shape as corpus.attrition_report gives the batch
    # ladder — "where did my documents go?" for the streaming form
    attrition = spark.createDataFrame(
        [
            ("0_arrived", n0, 0),
            ("1_near_dedup", n1, n0 - n1),
            ("2_decontaminated", n2, n1 - n2),
        ],
        "stage string, n_rows long, n_dropped long",
    )
    attrition.show(truncate=False)
    print(
        f"arrived={n0} accepted_after_dedup={n1} clean={n2} "
        f"dup_pairs_audited={dups} contamination_pairs_audited={contam} "
        f"state_partitions_folded={folded} (of {parts_before}) "
        f"drift_rows={n_drift} semantic_accepted={n_sem}/{n_vec}"
    )
    ok = n2 > 0 and n2 <= n1 <= n0 and n_drift > 0 and 0 < n_sem <= n_vec
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
