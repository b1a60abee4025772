"""End-to-end demo: raw document store → packed, decontaminated,
PII-scrubbed training corpus — the engine's §2.11 surface in one
runnable script.

    python examples/prepare_training_corpus.py [sf_dir]

Stages (each one an oracle-checked operator; see COVERAGE.md):
  1. prepare_corpus     Unicode normalize → quality/lang filter → exact
                        dedup → capped near-dup clustering →
                        representative keep → PII redaction
  2. contaminated_ids   drop docs sharing 8-grams with the held-out set
  2a. perplexity tiers  per-language CCNet buckets; the tail tier drops
                        (perplexity_buckets on the unigram LM)
  2b. token budget      best-first selection until the token budget
                        (select_until_token_budget, two-phase cumsum)
  3. train/val split    disjoint-exhaustive holdout bands (split_corpus)
  4. split_documents    64-token windows, 16-token overlap
  5. pack_greedy        1024-token training packs (budget-bounded)
  6. zorder_write       pack store laid out for (pack, doc) skipping,
                        plus deterministic (shard, pos) loader
                        addresses per pack (shuffle_corpus)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from datapipelineetl_spark import catalog
from datapipelineetl_spark.operators import corpus, text
from datapipelineetl_spark.session import get_session
from datapipelineetl_spark.sinks import layout


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else ".scratch/training_corpus"
    spark = get_session("prepare-corpus-demo")
    docs = catalog.load(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. normalize + clean + dedup + redact (each stage oracle-checked
    #    individually; the composition by the q_prepare_corpus oracle;
    #    normalize=True makes spelling variants exact dups before any
    #    hash sees them)
    clean = corpus.prepare_corpus(
        docs, min_quality=0.5, near_dup_threshold=0.7, max_bucket_size=50,
        normalize=True,
    ).select("doc_id", "text")
    n1 = clean.count()

    # 2. decontaminate against a pretend eval set (last 10% of doc ids):
    #    side="train" lists the TRAINING docs that contain held-out
    #    8-grams — those are what must leave the training corpus
    cut = docs.agg(F.expr("percentile(doc_id, 0.9)")).first()[0]
    evalset = docs.filter(F.col("doc_id") > cut)
    drop = corpus.contaminated_ids(
        clean, evalset, n=8, max_bucket_size=50, side="train"
    )
    decon = clean.join(drop, "doc_id", "anti")
    n2 = decon.count()

    # 2'. the crawl-monitoring sketches over the surviving corpus —
    #     metadata-sized answers without vocabulary-wide shuffles
    #     (oracle-checked as q_countmin_counts / q_hll_distinct; at
    #     ingest time the same state maintains incrementally via
    #     streaming_sketch_state):
    #     - count-min heavy hitters: top tokens by estimated frequency
    #     - HLL: per-corpus distinct-token estimate from 64 registers
    from datapipelineetl_spark.operators import sketch

    grid = sketch.countmin_sketch(decon, depth=3, width=64)
    probes = (
        decon.select(F.explode(text.tokens("text")).alias("token"))
        .groupBy("token").count()
        .orderBy(F.desc("count"), "token").limit(3).select("token")
    )
    hot = sketch.countmin_estimate(grid, probes).orderBy(
        F.desc("cm_count"), "token"
    ).collect()
    vocab_est = sketch.hll_distinct(
        decon.withColumn("__all", F.lit("corpus")), "__all", "text"
    ).first()["hll_estimate"]

    # 2''. the round-9 rule tier: Gopher quality rules + C4 blocklist
    #      + the fastText-style hashed linear score, all as ANNOTATIONS
    #      (annotate=True keeps every column — the same composition
    #      works verbatim on a readStream frame; oracle-checked as
    #      q_gopher_rules / q_blocklist_filter / q_quality_linear). The
    #      fixture's synthetic vocabulary is clean, so the keep rule
    #      here is the rule battery minus the stop-word check (31
    #      distinct tokens can't carry a stop-word distribution) —
    #      production keeps `kept == 1` outright.
    ruled = text.gopher_rules(
        decon, stopwords=("the", "a"), annotate=True
    )
    ruled = corpus.flag_blocklisted(
        ruled.drop("kept"), ["spam-token"],
    ).withColumnRenamed("kept", "bl_kept")
    ruled = text.quality_linear(ruled, annotate=True)
    decon = (
        ruled.filter(
            (F.col("r_word_count") + F.col("r_mean_word_len")
             + F.col("r_symbol_ratio") + F.col("r_bullet_lines")
             + F.col("r_ellipsis_lines") + F.col("r_alpha_words") >= 6)
            & (F.col("bl_kept") == 1)
        )
        .select("doc_id", "text")
    )
    n2r = decon.count()

    # 2a. LM quality tier: CCNet-style per-language perplexity buckets
    #     (unigram-LM score rank within language) — drop the tail
    #     third, the statistical-outlier tier (oracle-checked as
    #     q_perplexity_buckets)
    tiers = text.perplexity_buckets(
        decon.join(docs.select("doc_id", "lang"), "doc_id"),
        group_col="lang", n_buckets=3,
    )
    decon = tiers.filter(F.col("ppl_bucket") < 2).select("doc_id", "text")
    n2a = decon.count()

    # 2b. cap the corpus at a token budget, best quality first — the
    #     "train on the best N tokens" selection (two-phase cumsum, no
    #     global sort; oracle-checked as q_select_budget)
    scored = text.with_token_stats(text.with_quality_score(decon))
    decon = corpus.select_until_token_budget(
        scored, 4_000, "n_tokens", "quality_score"
    ).select("doc_id", "text")
    n2b = decon.count()

    # 3. deterministic 95/5 train/val HOLDOUT (disjoint-exhaustive
    #    band split — reproducible forever; val is a true holdout, not
    #    an independent sample that could overlap train)
    split = corpus.split_corpus(
        decon, {"train": 0.95, "val": 0.05}, key_col="doc_id"
    )
    train = split.filter(F.col("split") == "train").drop("split")
    n3 = train.count()

    # 4. chunk to context windows, 5. pack to training sequences
    chunks = corpus.split_documents(train, max_tokens=64, overlap=16)
    chunks = text.with_token_stats(
        chunks.withColumnRenamed("chunk_text", "text")
    ).withColumn("chunk_key", F.col("doc_id") * 10_000 + F.col("chunk_idx"))
    packed = corpus.pack_greedy(
        chunks.select("chunk_key", "doc_id", "chunk_idx", "text", "n_tokens"),
        "chunk_key", "n_tokens", budget=1024, n_shards=32,
    )
    n4 = packed.count()

    # 6. write z-ordered on (pack_id, doc_id): a loader reading one pack
    #    OR one document's chunks skips most files. Each pack also gets
    #    a deterministic (shard, pos) loader address — the reproducible
    #    epoch order (new salt = new epoch permutation)
    addressed = packed.join(
        corpus.shuffle_corpus(
            packed.select("pack_id").distinct(),
            key_col="pack_id", n_shards=4, salt="epoch0",
        ),
        "pack_id",
    )
    layout.zorder_write(addressed, out_dir, ["pack_id", "doc_id"], n_files=8)
    packs = spark.read.parquet(out_dir).select("pack_id").distinct().count()

    # 7. the BINARY training artifact: chunk text -> vocab -> token ids
    #    -> packed id streams -> shuffled shard addresses -> mmap-able
    #    .bin + .idx.json files (the complete text->tensor->disk path)
    from datapipelineetl_spark.sinks import tensor

    chunk_docs = chunks.select(F.col("chunk_key").alias("doc_id"), "text")
    vocab = text.build_vocab(chunk_docs)
    encoded = text.encode_tokens(chunk_docs, vocab)
    tensors = corpus.pack_sequences(
        encoded, budget=1024, id_col="doc_id", n_shards=8
    )
    shard_addr = tensors.join(
        corpus.shuffle_corpus(
            tensors.select("pack_id"), key_col="pack_id",
            n_shards=4, salt="epoch0",
        ),
        "pack_id",
    )
    manifest = tensor.write_token_shards(shard_addr, out_dir + "_bin").collect()
    n_bin_tokens = sum(m.n_tokens for m in manifest)

    # 7b. the second tokenizer artifact: BPE merges trained on the SAME
    #     chunk corpus the id-vocab came from (train_bpe — corpus
    #     scanned once, then vocabulary-sized iterations; the full loop
    #     is oracle-checked as q_train_bpe / q_bpe_segment)
    merges, _ = text.train_bpe(chunk_docs, n_merges=12)

    # 8. artifact integrity: read the shards back loader-style — each
    #    task re-hashes its shard against the index's md5 and every
    #    (shard, pos) id stream must hold exactly the packed token count
    read_back = tensor.read_token_shards(spark, out_dir + "_bin")
    n_read = read_back.select(
        F.sum(F.size("token_ids")).cast("long")
    ).first()[0]
    assert n_read == n_bin_tokens, (n_read, n_bin_tokens)

    hh = ", ".join(f"{r.token}~{r.cm_count}" for r in hot)
    print(f"sketch monitor: heavy hitters [{hh}]; HLL vocab ~{vocab_est}")
    print(
        f"documents {n0} -> cleaned {n1} -> decontaminated {n2} -> "
        f"rule-tiered {n2r} -> ppl-tiered {n2a} -> budgeted {n2b} -> train {n3} -> "
        f"chunks {n4} -> packs {packs} "
        f"-> binary artifact {len(manifest)} shards / {n_bin_tokens} tokens "
        f"+ {len(merges)} BPE merges "
        f"(checksum-verified read-back: {n_read} tokens; store: {out_dir})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
