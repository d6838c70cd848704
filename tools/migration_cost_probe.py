"""Measured cost of RENAME/DROP COLUMN, both designs side by side.

Round 9-10 quantified the full-rewrite default (a rename pays one
parquet decode+encode pass, ~170 MiB/s/node). Round 11 added the
opt-in column-mapping tier (``enable_column_mapping()`` — Delta name
mode: rename/drop become one metadata commit and reads alias
physical→logical at the scan boundary). This probe now measures BOTH
on the same table sizes: the unmapped rewrite wall, the mapped
metadata-commit wall, and the post-rename read+skipping wall on the
mapped table (the indirection's steady-state cost).

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

    # the mapped tier on an identical second table
    path2 = tempfile.mkdtemp(prefix=f"migmap_{n_rows}_")
    log2 = TableLog(spark, path2)
    log2.append(df, partition_by=["part"])
    baseline_read = _timed_filtered_count(log2, "v")
    log2.enable_column_mapping()
    t0 = time.time()
    log2.rename_column("v", "val")
    mapped_rename_wall = time.time() - t0
    mapped_read = _timed_filtered_count(log2, "val")

    return {
        "rows": n_rows,
        "table_mib": round(size0 / (1 << 20), 1),
        "metadata_commit_s": round(meta_wall, 3),
        "rename_column_s": round(rename_wall, 2),
        "drop_column_s": round(drop_wall, 2),
        "rename_mib_per_s": round(size0 / (1 << 20) / rename_wall, 1),
        "mapped_rename_s": round(mapped_rename_wall, 3),
        "read_unmapped_s": round(baseline_read, 2),
        "read_mapped_renamed_s": round(mapped_read, 2),
    }


def _timed_filtered_count(log: TableLog, col: str) -> float:
    t0 = time.time()
    n = log.read(where=[(col, ">=", 90)]).count()
    assert n > 0
    return time.time() - t0


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
