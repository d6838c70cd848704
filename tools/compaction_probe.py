"""Compaction scale probe: fragment a partitioned event log the way a
250 ms-trigger emit storm does, then measure compact_event_log —
files before/after, rewrite wall time, and the full-scan read latency
before/after (the number the small-file pathology actually hurts).

Usage: python tools/compaction_probe.py [files_per_partition ...]
Defaults to 50 200 800. One markdown table row per fleet size, for
RESULTS.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.compaction import compact_event_log
from aoseventstreamer_spark.session import get_spark, load_table


def n_files(root: str) -> int:
    out = 0
    for dirpath, _, filenames in os.walk(root):
        if any(s.startswith(".") for s in dirpath.split(os.sep)):
            continue
        out += sum(1 for f in filenames if not f.startswith(("_", ".")))
    return out


def scan_ms(spark, path: str) -> float:
    t0 = time.time()
    spark.read.parquet(path).agg(F.count("*"), F.sum("user_id")).collect()
    return (time.time() - t0) * 1000


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [50, 200, 800]
    spark = get_spark("compaction-probe", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "user_id", "event_type",
        F.concat(F.lit("p"), (F.col("user_id") % 8)).alias("project_id"),
    ).localCheckpoint()

    print("| files/part | files before | files after | scan before | "
          "scan after | compact wall |")
    print("|---|---|---|---|---|---|")
    for fpp in sizes:
        tmp = tempfile.mkdtemp(prefix="compactprobe-")
        path = os.path.join(tmp, "log")
        (
            ev.repartition(fpp)
            .write.mode("overwrite")
            .partitionBy("project_id")
            .parquet(path)
        )
        before = n_files(path)
        scan_b = min(scan_ms(spark, path) for _ in range(3))
        t0 = time.time()
        report = compact_event_log(
            spark, path,
            target_file_bytes=128 * 1024 * 1024,
            small_file_bytes=32 * 1024 * 1024,
            min_files=4,
        ).collect()
        wall = time.time() - t0
        after = n_files(path)
        scan_a = min(scan_ms(spark, path) for _ in range(3))
        assert all(r.compacted for r in report), "probe expects full rewrite"
        print(
            f"| {fpp} | {before} | {after} | {scan_b:.0f} ms | "
            f"{scan_a:.0f} ms | {wall:.2f} s |",
            flush=True,
        )
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
