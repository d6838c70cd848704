"""Per-stage breakdown of selected headline queries (guide §1/§7.1).

For each named query: run once warm, then list every stage with task
count, task time, CPU time, GC time, shuffle read/write, spill, and
input bytes — the data needed to attribute the dedup trio's task time
to scan/hash vs shuffle vs agg stages.

Usage: python tools/stage_profile.py <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from aoseventstreamer_spark import queries as Q
    from aoseventstreamer_spark.session import get_spark

    spark = get_spark(
        "stage-profile", cpus=cpus, extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    base = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[-1]}/api/v1"
    app_id = sc.applicationId

    from tools.dump_plans import near_dup_unpinned

    builders = dict(Q.QUERIES)
    builders["q_near_dup_verified"] = near_dup_unpinned

    for name in names:
        df = builders[name](spark, sf_dir)
        for _ in range(2):  # JIT warm
            df.write.format("noop").mode("overwrite").save()
        jobs_before = {j["jobId"] for j in _rest(base, f"/applications/{app_id}/jobs")}
        df.write.format("noop").mode("overwrite").save()
        jobs = [
            j
            for j in _rest(base, f"/applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = _rest(base, f"/applications/{app_id}/stages?status=complete")
        mine = sorted(
            (s for s in stages if s["stageId"] in stage_ids),
            key=lambda s: s["stageId"],
        )
        print(f"\n== {name}")
        print(
            "| stage | tasks | task_s | cpu_s | gc_s | in_mb | sh_r_mb | "
            "sh_w_mb | spill_mb | name |"
        )
        print("|---|---|---|---|---|---|---|---|---|---|")
        for s in mine:
            print(
                f"| {s['stageId']} | {s['numCompleteTasks']} | "
                f"{s['executorRunTime'] / 1e3:.2f} | "
                f"{s.get('executorCpuTime', 0) / 1e9:.2f} | "
                f"{s.get('jvmGcTime', 0) / 1e3:.2f} | "
                f"{s.get('inputBytes', 0) / 1e6:.2f} | "
                f"{s.get('shuffleReadBytes', 0) / 1e6:.2f} | "
                f"{s.get('shuffleWriteBytes', 0) / 1e6:.2f} | "
                f"{s.get('memoryBytesSpilled', 0) / 1e6:.2f} | "
                f"{s['name'].splitlines()[0][:60]} |"
            )
    spark.stop()


if __name__ == "__main__":
    main()
