"""Round-17 interleaved same-session A/Bs (noop sink, impls alternate
run-for-run, medians compared — the ambient-steal-resistant protocol
from OPTIMIZATION_r16.md):

  lsh    — q_lsh_cosine_near_pairs verify: r16 per-pair JVM cosine
           ("old") vs norm-precomputed JVM ("jvm") vs broadcast-matrix
           Arrow kernel ("kernel")
  range  — q_range_join_ship_windows: r16 per-row range join ("old")
           vs day-preaggregated ("new")
  pack   — q_pack_sequences body: encode_tokens impl "checkpoint"
           ("old") vs "local" ("new")

Usage: python tools/probe_r17_ab.py [lsh|range|pack] [rounds]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datapipelineetl_spark import catalog  # noqa: E402
from datapipelineetl_spark.operators import corpus, relational, similarity, text  # noqa: E402
from datapipelineetl_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


# --- lsh ---------------------------------------------------------------
from datapipelineetl_spark.queries_batch9 import (  # noqa: E402
    _LSH_DIM,
    _LSH_N_PLANES,
    _LSH_N_TABLES,
    _LSH_THRESHOLD,
)


def lsh_old(spark):
    """The r16 shape: per-pair cosine (3 interpreted dim-folds/pair)."""
    emb = catalog.load(spark, SF_DIR, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    sig_arr = similarity._lsh_signatures_pandas(
        [
            similarity._hyperplanes(_LSH_N_PLANES, _LSH_DIM, 42 + 1000003 * t)
            for t in range(_LSH_N_TABLES)
        ]
    )(vec)
    tabled = emb.select(
        F.col("vec_id"), F.posexplode_outer(sig_arr).alias("__table", "__sig")
    ).localCheckpoint(eager=True)
    a, b = tabled.alias("a"), tabled.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__table") == F.col("b.__table"))
            & (F.col("a.__sig") == F.col("b.__sig"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
        .repartition(spark.sparkContext.defaultParallelism, F.col("id_a"))
    )
    v = emb.select(F.col("vec_id"), vec.alias("__v"))
    _noop(
        cand.join(v.withColumnsRenamed({"vec_id": "id_a", "__v": "__va"}), "id_a")
        .join(v.withColumnsRenamed({"vec_id": "id_b", "__v": "__vb"}), "id_b")
        .withColumn(
            "cos_sim", F.round(similarity.cosine(F.col("__va"), F.col("__vb")), 4)
        )
        .filter(F.col("cos_sim") >= _LSH_THRESHOLD)
        .select("id_a", "id_b", "cos_sim")
    )


def _lsh(spark, impl):
    emb = catalog.load(spark, SF_DIR, "embeddings")
    _noop(
        similarity.lsh_cosine_near_pairs(
            emb,
            _LSH_THRESHOLD,
            num_planes=_LSH_N_PLANES,
            num_tables=_LSH_N_TABLES,
            seed=42,
            dim=_LSH_DIM,
            materialize=True,
            verify_impl=impl,
        )
    )


# --- range -------------------------------------------------------------
def _range(spark, new):
    orders = catalog.load(spark, SF_DIR, "orders")
    windows = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey",
        F.col("o_orderdate").alias("w_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS")).alias("w_end"),
    )
    points = catalog.load(spark, SF_DIR, "lineitem").select(
        "l_shipdate", "l_quantity"
    )
    if new:
        points = points.groupBy("l_shipdate").agg(
            F.count(F.lit(1)).alias("__n_day"),
            F.sum("l_quantity").alias("__qty_day"),
        )
        joined = relational.range_join(
            points, windows, "l_shipdate", "w_start", "w_end", bucket_days=2
        )
        out = joined.groupBy("o_orderkey").agg(
            F.sum("__n_day").alias("n_shipments"),
            F.sum("__qty_day").alias("sum_qty"),
        )
    else:
        joined = relational.range_join(
            points, windows, "l_shipdate", "w_start", "w_end", bucket_days=2
        )
        out = joined.groupBy("o_orderkey").agg(
            F.count(F.lit(1)).alias("n_shipments"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    _noop(out)


# --- pack --------------------------------------------------------------
def _pack(spark, impl):
    docs = catalog.load(spark, SF_DIR, "documents")
    vocab = text.build_vocab(docs)
    enc = text.encode_tokens(docs, vocab, impl=impl)
    packs = corpus.pack_sequences(enc, budget=512, n_shards=8)
    _noop(
        packs.select(
            "pack_id",
            F.md5(
                F.array_join(F.col("token_ids").cast("array<string>"), ",")
            ).alias("token_digest"),
            "n_docs",
            "n_tokens",
        )
    )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "lsh"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_session("probe-r17")
    variants: dict[str, list[tuple[str, object]]] = {
        "lsh": [
            ("old", lambda s: lsh_old(s)),
            ("jvm", lambda s: _lsh(s, "jvm")),
            ("kernel", lambda s: _lsh(s, "kernel")),
        ],
        "range": [
            ("old", lambda s: _range(s, False)),
            ("new", lambda s: _range(s, True)),
        ],
        "pack": [
            ("old", lambda s: _pack(s, "checkpoint")),
            ("new", lambda s: _pack(s, "local")),
        ],
    }[which]
    # warm-up once per variant
    for name, fn in variants:
        fn(spark)
    times: dict[str, list[float]] = {n: [] for n, _ in variants}
    for r in range(rounds):
        for name, fn in variants:
            spark.sparkContext.setJobDescription(f"{which}:{name} r{r}")
            t0 = time.perf_counter()
            fn(spark)
            times[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    for name, ts in times.items():
        print(
            f"{which}/{name}: med {statistics.median(ts):.3f} "
            f"best {min(ts):.3f} all {[round(t, 3) for t in ts]}"
        )


if __name__ == "__main__":
    main()
