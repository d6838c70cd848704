"""Incremental-rollup scaling probe: partial-history growth vs
merge-on-read cost.

Feeds the sf0.1 events table through IncrementalRollup as N
micro-batches (event_id % N slices — every batch touches every key,
the adversarial direction for partial-table growth), then times
``current()`` as history accumulates and after ``compact()``.

What it demonstrates: the merge-on-read cost grows with
(batches × keys), NOT with event history — and compaction resets the
partial table to (keys) rows, after which current() is a single tiny
scan. The per-batch write cost is flat (each batch aggregates only
its own slice).

Usage: python tools/rollup_scale.py [n_batches...]   (default: 20 100)
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aoseventstreamer_spark.session import get_spark, load_table
from aoseventstreamer_spark.streaming.rollup import IncrementalRollup


def main() -> None:
    batch_counts = [int(a) for a in sys.argv[1:]] or [20, 100]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("rollup-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    ev.persist().count()

    for n in batch_counts:
        root = tempfile.mkdtemp(prefix="rollup_scale_")
        r = IncrementalRollup(
            spark,
            root,
            keys=["event_type"],
            aggs={"cnt": F.count(F.lit(1)).cast("long"), "total": F.sum("cents")},
        )
        t0 = time.time()
        for bid in range(n):
            r.process_batch(ev.filter(F.col("event_id") % n == bid), bid)
        ingest_s = time.time() - t0

        t0 = time.time()
        rows = r.current().count()
        read_s = time.time() - t0

        dst = os.path.join(root, "base")
        t0 = time.time()
        base_rows = r.compact(dst)
        compact_s = time.time() - t0
        t0 = time.time()
        spark.read.parquet(dst).groupBy("event_type").agg(F.sum("cnt")).count()
        read_base_s = time.time() - t0

        print(
            json.dumps(
                {
                    "batches": n,
                    "keys": rows,
                    "ingest_total_s": round(ingest_s, 2),
                    "per_batch_s": round(ingest_s / n, 3),
                    "merge_read_s": round(read_s, 2),
                    "compact_s": round(compact_s, 2),
                    "base_rows": base_rows,
                    "read_after_compact_s": round(read_base_s, 2),
                }
            ),
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)

    ev.unpersist()


if __name__ == "__main__":
    main()
