"""Interleaved same-session A/B: prepare-ladder annotation impl jvm vs
fused kernel on the q_prepare_corpus / q_attrition_report bench bodies
(noop sink / full construction). Run idle; impls alternate run-for-run.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipelineetl_spark.operators import corpus  # noqa: E402
from datapipelineetl_spark.queries import _t_spread  # noqa: E402
from datapipelineetl_spark.queries_batch11 import _MH_CAP, _MH_THRESHOLD  # noqa: E402
from datapipelineetl_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_ROUNDS = int(os.environ.get("AB_ROUNDS", "5"))


def run_prepare(spark, impl):
    docs = _t_spread(spark, SF_DIR, "documents")
    out = corpus.prepare_corpus(
        docs,
        min_quality=0.5,
        near_dup_threshold=_MH_THRESHOLD,
        max_bucket_size=_MH_CAP,
        annot_impl=impl,
    )
    out.select("doc_id", "text").write.format("noop").mode("overwrite").save()


def run_attrition(spark, impl):
    docs = _t_spread(spark, SF_DIR, "documents")
    _, att = corpus.prepare_corpus(
        docs,
        min_quality=0.5,
        near_dup_threshold=_MH_THRESHOLD,
        max_bucket_size=_MH_CAP,
        redact=False,
        with_attrition=True,
        annot_impl=impl,
    )
    att.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_session("probe_prepare_ab")
    results: dict[tuple[str, str], list[float]] = {}
    for rnd in range(N_ROUNDS):
        for qname, fn in (("prepare", run_prepare), ("attrition", run_attrition)):
            for impl in ("jvm", "fused"):
                spark.sparkContext.setJobDescription(f"prepare_ab:{qname}:{impl}:{rnd}")
                t0 = time.perf_counter()
                fn(spark, impl)
                dt = time.perf_counter() - t0
                results.setdefault((qname, impl), []).append(dt)
                print(f"round {rnd} {qname} {impl}: {dt:.3f}s", flush=True)
    for key, vals in sorted(results.items()):
        print(
            f"{key[0]:>9} {key[1]:>5}: med {statistics.median(vals):.3f} "
            f"best {min(vals):.3f} all {[round(v, 2) for v in vals]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
