"""Measured cost of RENAME/DROP COLUMN's full-rewrite design
(VERDICT r9 item 5): tablelog deliberately skips Delta-style
column-mapping indirection — a rename rewrites the table once instead
of making EVERY future read translate logical→physical names and
keying stats/skipping/DVs physical forever. This probe quantifies the
wall the 100 TB operator hits so the trade-off is a number, not an
argument: rename wall + bytes rewritten at growing row counts, next
to the O(metadata) ops (constraint add, schema-widening append) that
show what the metadata tier costs by contrast.

Usage: python tools/migration_cost_probe.py [row_counts...]
(default: 1_000_000 4_000_000 16_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aoseventstreamer_spark.session import get_spark  # noqa: E402
from aoseventstreamer_spark.tablelog import TableLog  # noqa: E402


def _table_bytes(log: TableLog) -> int:
    return sum(int(e.get("size", 0)) for e in log.snapshot_files())


def probe(spark, n_rows: int) -> dict:
    path = tempfile.mkdtemp(prefix=f"mig_{n_rows}_")
    log = TableLog(spark, path)
    df = (
        spark.range(n_rows)
        .select(
            F.col("id"),
            (F.col("id") % 97).alias("v"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            (F.col("id") % 8).cast("string").alias("part"),
        )
    )
    log.append(df, partition_by=["part"])
    size0 = _table_bytes(log)

    t0 = time.time()
    log.commit(
        added=[], removed=[], data_change=False,
        txn=("mig-probe", 1), operation="METADATA",
    )
    meta_wall = time.time() - t0

    t0 = time.time()
    log.rename_column("v", "val")
    rename_wall = time.time() - t0

    t0 = time.time()
    log.drop_column("payload")
    drop_wall = time.time() - t0

    return {
        "rows": n_rows,
        "table_mib": round(size0 / (1 << 20), 1),
        "metadata_commit_s": round(meta_wall, 3),
        "rename_column_s": round(rename_wall, 2),
        "drop_column_s": round(drop_wall, 2),
        "rename_mib_per_s": round(size0 / (1 << 20) / rename_wall, 1),
    }


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [
        1_000_000,
        4_000_000,
        16_000_000,
    ]
    spark = get_spark(
        "migration-cost-probe",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in counts:
        print(json.dumps(probe(spark, n)), flush=True)


if __name__ == "__main__":
    main()
