"""Per-query breakdown of the headline bench (guide §1: measure first).

For each headline query: wall time of a noop execution (after the same
warm-up discipline as bench.py), the number of Spark jobs/stages it
launched, summed executor task time, and summed shuffle bytes — pulled
from the Spark REST API (UI enabled for this tool only). The gap
between wall clock and (task time / cores) is driver-side cost:
planning, AQE re-optimization rounds, codegen, task scheduling. At
sf0.1 that gap is where most of the time hides, and it tells us which
queries pay for plan complexity rather than data.

Usage: python tools/headline_profile.py [sf_dir] [passes]
Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import bench
    from aoseventstreamer_spark import queries as Q
    from aoseventstreamer_spark.session import get_spark

    spark = get_spark(
        "headline-profile", cpus=cpus, extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    base = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[-1]}/api/v1"
    app_id = sc.applicationId

    # bench.py warm-up discipline: session + codegen + Arrow workers
    Q.QUERIES["q_agg_events_by_type"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _w(x: pd.Series) -> pd.Series:
        return x

    spark.range(0, cpus, 1, cpus).select(_w("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    from tools.dump_plans import near_dup_unpinned

    builders = dict(Q.QUERIES)
    builders["q_near_dup_verified"] = near_dup_unpinned

    t_build: dict[str, float] = {}
    dfs = {}
    for name in bench.HEADLINE:
        t0 = time.time()
        dfs[name] = builders[name](spark, sf_dir)
        t_build[name] = time.time() - t0

    # two untimed passes (JIT), as in bench.py
    for _ in range(2):
        for name in bench.HEADLINE:
            dfs[name].write.format("noop").mode("overwrite").save()

    rows = []
    agg = {}
    for name in bench.HEADLINE:
        best = None
        for _ in range(passes):
            jobs_before = {j["jobId"] for j in _rest(base, f"/applications/{app_id}/jobs")}
            t0 = time.time()
            dfs[name].write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            jobs = [
                j
                for j in _rest(base, f"/applications/{app_id}/jobs")
                if j["jobId"] not in jobs_before
            ]
            stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
            stages = _rest(base, f"/applications/{app_id}/stages?status=complete")
            mine = [s for s in stages if s["stageId"] in stage_ids]
            rec = {
                "wall_s": round(wall, 3),
                "jobs": len(jobs),
                "stages": len(mine),
                "tasks": sum(s["numCompleteTasks"] for s in mine),
                "task_time_s": round(
                    sum(s["executorRunTime"] for s in mine) / 1000.0, 3
                ),
                "cpu_time_s": round(
                    sum(s.get("executorCpuTime", 0) for s in mine) / 1e9, 3
                ),
                "shuffle_write_mb": round(
                    sum(s["shuffleWriteBytes"] for s in mine) / 1e6, 3
                ),
            }
            if best is None or rec["wall_s"] < best["wall_s"]:
                best = rec
        ideal = best["task_time_s"] / cpus
        best["driver_overhead_s"] = round(best["wall_s"] - ideal, 3)
        best["build_s"] = round(t_build[name], 3)
        agg[name] = best
        rows.append((name, best))

    print("| query | wall | build | jobs | stages | tasks | task_time | cpu | drv_ovh |")
    print("|---|---|---|---|---|---|---|---|---|")
    for name, b in rows:
        print(
            f"| {name} | {b['wall_s']} | {b['build_s']} | {b['jobs']} | "
            f"{b['stages']} | {b['tasks']} | {b['task_time_s']} | "
            f"{b['cpu_time_s']} | {b['driver_overhead_s']} |"
        )
    total = round(sum(b["wall_s"] for _, b in rows), 3)
    print(json.dumps({"metric": "headline_profile_total", "value": total, "queries": agg}))
    spark.stop()


if __name__ == "__main__":
    main()
