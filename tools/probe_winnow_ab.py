"""Interleaved same-session A/B: winnowing jvm vs kernel impl on the
sf0.1 bench geometry (q_winnowing_fingerprints / q_winnow_collisions
bodies, noop sink), plus formatted-plan capture into plans/r16/.

Run on an idle machine; impls alternate run-for-run so ambient noise
hits both sides equally (OPTIMIZATION_r16.md methodology).
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datapipelineetl_spark.operators import dedup, text  # noqa: E402
from datapipelineetl_spark.queries_batch8 import _WINNOW_K, _WINNOW_W, _t_spread  # noqa: E402
from datapipelineetl_spark.queries_batch9 import _WINNOW_CAP  # noqa: E402
from datapipelineetl_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_ROUNDS = int(os.environ.get("AB_ROUNDS", "5"))


def build_fps(spark, impl):
    docs = _t_spread(spark, SF_DIR, "documents")
    fps = text.with_winnowing_fingerprints(docs, k=_WINNOW_K, window=_WINNOW_W, impl=impl)
    return fps.select(
        "doc_id",
        F.size("winnow_fps").alias("n_fps"),
        F.md5(F.array_join(F.col("winnow_fps").cast("array<string>"), ",")).alias("fp_digest"),
    )


def build_coll(spark, impl):
    docs = _t_spread(spark, SF_DIR, "documents")
    fps = text.with_winnowing_fingerprints(docs, k=_WINNOW_K, window=_WINNOW_W, impl=impl)
    return dedup.fingerprint_collision_pairs(
        fps, "doc_id", "winnow_fps", max_bucket_size=_WINNOW_CAP, materialize=True
    )


def build_simhash(spark, impl):
    docs = _t_spread(spark, SF_DIR, "documents")
    return text.with_simhash(docs, impl=impl).select("doc_id", "simhash")


def build_spans(spark, impl):
    docs = _t_spread(spark, SF_DIR, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" the shared eight token span sentence repeats here"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    return dedup.remove_duplicate_spans(docs, n=8, impl=impl).select("doc_id", "text")


def main() -> None:
    spark = get_session("probe_winnow_ab")
    # plan capture (construction only, cheap)
    plan_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16")
    os.makedirs(plan_dir, exist_ok=True)
    for qname, builder in (
        ("q_winnowing_fingerprints", build_fps),
        ("q_winnow_collisions", build_coll),
        ("q_simhash", build_simhash),
        ("q_dedup_spans", build_spans),
    ):
        for impl, tag in (("jvm", "before"), ("kernel", "after")):
            df = builder(spark, impl)
            p = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(plan_dir, f"{qname}_{tag}.txt"), "w") as f:
                f.write(p)
    print("plans captured", flush=True)

    results: dict[tuple[str, str], list[float]] = {}
    for rnd in range(N_ROUNDS):
        for qname, builder in (
            ("fps", build_fps),
            ("coll", build_coll),
            ("simhash", build_simhash),
            ("spans", build_spans),
        ):
            for impl in ("jvm", "kernel"):
                spark.sparkContext.setJobDescription(f"winnow_ab:{qname}:{impl}:{rnd}")
                t0 = time.perf_counter()
                builder(spark, impl).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                results.setdefault((qname, impl), []).append(dt)
                print(f"round {rnd} {qname} {impl}: {dt:.3f}s", flush=True)
    for key, vals in sorted(results.items()):
        print(
            f"{key[0]:>4} {key[1]:>6}: med {statistics.median(vals):.3f} "
            f"best {min(vals):.3f} all {[round(v, 2) for v in vals]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
