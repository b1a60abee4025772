"""Stage-level profile of registered queries via the Spark status REST
API (steal-resistant: executorCpuTime is CPU, not wall clock).

Usage: SPARK_GRAFT_UI=true python tools/profile_query.py q_name [q_name...]

Runs each query once warm (noop sink), then prints its stages sorted by
executorRunTime with task counts and CPU time — the OPTIMIZATION_r16.md
measurement discipline (guide §1.1).
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_UI", "true")

import __spark_entry__ as entrymod  # noqa: E402
from datapipelineetl_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _api(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
        return json.loads(r.read())


def main() -> None:
    names = sys.argv[1:]
    spark = get_session("profile_query")
    qs = dict(entrymod.queries())
    app_id = _api("applications")[0]["id"]
    for name in names:
        fn = qs[name]
        # warm-up run (codegen/footers), then the measured run
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        jobs_before = {j["jobId"] for j in _api(f"applications/{app_id}/jobs?status=succeeded")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        stage_ids: set[int] = set()
        for j in _api(f"applications/{app_id}/jobs?status=succeeded"):
            if j["jobId"] not in jobs_before:
                stage_ids.update(j["stageIds"])
        rows = []
        tot_run = tot_cpu = 0.0
        for s in _api(f"applications/{app_id}/stages?status=complete"):
            if s["stageId"] in stage_ids:
                run_s = s["executorRunTime"] / 1e3
                cpu_s = s["executorCpuTime"] / 1e9
                tot_run += run_s
                tot_cpu += cpu_s
                rows.append((run_s, cpu_s, s["numCompleteTasks"], s["stageId"], s["name"].split("\n")[0][:80]))
        print(f"\n== {name}: wall {wall:.2f}s, sum runTime {tot_run:.2f}s, sum cpuTime {tot_cpu:.2f}s, {len(rows)} stages")
        for run_s, cpu_s, ntask, sid, sname in sorted(rows, reverse=True)[:12]:
            print(f"  stage {sid:>4} run {run_s:7.2f}s cpu {cpu_s:7.2f}s tasks {ntask:>3}  {sname}")


if __name__ == "__main__":
    main()
