"""Measured-shuffle audit: run each headline query once at the given
SF and record ACTUAL bytes/records shuffled and scanned, from the
Spark UI REST API (exact runtime metrics, not plan guesses).

The static plan audit (tools/plan_audit.py) proves the plan SHAPE is
right (broadcasts, pushdown, no Python nodes); this tool proves the
shapes hold up at runtime: a "single-shuffle" claim shows up here as
shuffle bytes ≈ the keyed aggregate's partial-agg output, not the
input size. Writes docs/SHUFFLE_AUDIT.md.

Usage: python tools/shuffle_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def fmt_bytes(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if n < 1024 or unit == "GiB":
            return f"{n:.1f} {unit}" if unit != "B" else f"{n} B"
        n /= 1024
    return f"{n}"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from bench import HEADLINE

    from aoseventstreamer_spark import queries as Q
    from aoseventstreamer_spark.session import get_spark

    # the engine session disables the UI (tests don't need it); this
    # tool needs the REST metrics endpoint
    spark = get_spark(
        "shuffle-audit",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedJobs": "5000",
            "spark.ui.retainedStages": "5000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId

    rows = []
    for name in HEADLINE:
        df = Q.QUERIES[name](spark, sf_dir)
        sc.setJobGroup(name, name)
        df.write.format("noop").mode("overwrite").save()
        sc.setJobGroup("idle", "idle")

    jobs = _get(f"{ui}/api/v1/applications/{app_id}/jobs")
    stages = {
        s["stageId"]: s
        for s in _get(f"{ui}/api/v1/applications/{app_id}/stages?status=COMPLETE")
    }
    by_query: dict[str, list[int]] = {}
    for j in jobs:
        g = j.get("jobGroup")
        if g and g in set(HEADLINE):
            by_query.setdefault(g, []).extend(j.get("stageIds", []))

    for name in HEADLINE:
        sids = set(by_query.get(name, []))
        st = [stages[s] for s in sids if s in stages]
        rows.append(
            {
                "query": name,
                "stages": len(st),
                "input_bytes": sum(s.get("inputBytes", 0) for s in st),
                "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in st),
                "shuffle_records": sum(s.get("shuffleWriteRecords", 0) for s in st),
            }
        )

    out = [
        "# SHUFFLE_AUDIT — measured runtime shuffle volume",
        "",
        f"One execution per headline query at `{sf_dir}` on "
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]; numbers are the "
        "Spark UI's per-stage metrics summed over the query's stages "
        "(skipped/reused stages excluded by the UI itself). "
        "Shuffle volume orders of magnitude below input volume is the "
        "direct evidence of map-side combine / broadcast discipline.",
        "",
        "| query | stages | input | shuffle written | shuffle records |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        out.append(
            f"| {r['query']} | {r['stages']} | {fmt_bytes(r['input_bytes'])} "
            f"| {fmt_bytes(r['shuffle_write'])} | {r['shuffle_records']} |"
        )
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs", "SHUFFLE_AUDIT.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path}")
    for r in rows:
        print(r["query"], fmt_bytes(r["shuffle_write"]), r["shuffle_records"])
    spark.stop()


if __name__ == "__main__":
    main()
