"""Runtime duplicate-pass audit: for every registry query, execute once
(noop sink) and count parquet scans in the FINAL adaptive plan.

Textual plan scan counts overstate real work — AQE stage reuse dedupes
identical subtrees at runtime — so this audit reads the executed plan
AFTER a run. A query whose final plan still carries 3+ scans of one
table re-reads the corpus per reference at 100 TB (the class fixed for
substring-dup/DSIR/contamination in r11 and for the curation capstone's
fan-outs); 2 scans is the decide-then-select floor of the two-pass
shapes (guide §8).

Usage: python tools/runtime_scan_audit.py [sf_dir] [min_scans]
Prints every query at or above min_scans (default 3) + one JSON line.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    min_scans = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from aoseventstreamer_spark import queries as Q
    from aoseventstreamer_spark.session import get_spark

    spark = get_spark("runtime-scan-audit", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    flagged: list[str] = []
    for name in sorted(Q.QUERIES):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"scan-audit: {name}")
        try:
            df = Q.QUERIES[name](spark, sf_dir)
            # execute THIS dataset's own QueryExecution (a .write would
            # create a fresh one, leaving df's plan un-executed with
            # isFinalPlan=false — the r11 advice note): toRdd() returns
            # the physical plan's RDD, count() runs it, and the
            # executedPlan read below then shows the post-AQE final
            # plan with stage reuse applied.
            qe = df._jdf.queryExecution()
            qe.toRdd().count()
            plan = qe.executedPlan().toString()
        except Exception as e:  # audit tool: record, keep sweeping
            results[name] = {"err": str(e)[:200]}
            continue
        # per-table runtime scan counts: each FileScan block carries a
        # "Location: <Index>(n paths)[file:...]" whose first path names
        # the table; a query scanning N DIFFERENT tables once each is
        # fine — the defect is ONE table scanned repeatedly
        locs = re.findall(r"Location: \w+\(\d+ paths?\)\[([^\],]*)", plan)
        per_table: dict[str, int] = {}
        for s in locs:
            key = os.path.basename(s.rstrip("/")) or "(parquet)"
            per_table[key] = per_table.get(key, 0) + 1
        if not locs:  # path elided — fall back to total scan count
            n = len(re.findall(r"Scan parquet", plan))
            if n:
                per_table["(parquet)"] = n
        cached = plan.count("InMemoryTableScan")
        worst = max(per_table.values(), default=0)
        results[name] = {
            "scans": per_table,
            "max_per_table": worst,
            "inmemory_scans": cached,
        }
        if worst >= min_scans:
            flagged.append(name)
            print(f"{name}: {per_table} (inmemory={cached})")
    print(
        json.dumps(
            {
                "metric": "runtime_scan_audit",
                "flagged_min_scans": min_scans,
                "flagged": flagged,
                "n_queries": len(results),
                "errors": {k: v["err"] for k, v in results.items() if "err" in v},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
