"""Capture .explain('formatted') for the round-17 touched queries into
plans/r17/<query>_<tag>.txt.

Usage: python tools/dump_r17_plans.py <tag>     # tag = before | after

Run with tag=before on the pre-change tree (git stash), tag=after on
the working tree.
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from datapipelineetl_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = [
    "q_lsh_cosine_near_pairs",
    "q_range_join_ship_windows",
    "q_pack_sequences",
    "q_encode_tokens",
]


def main() -> None:
    tag = sys.argv[1]
    outdir = Path(__file__).resolve().parent.parent / "plans" / "r17"
    outdir.mkdir(parents=True, exist_ok=True)
    spark = get_session("dump-r17-plans")
    qs = entrymod.queries()
    for name in QUERIES:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        (outdir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
