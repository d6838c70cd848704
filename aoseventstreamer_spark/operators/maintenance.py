"""Event-log maintenance: small-file compaction.

Emit storms write many small files per project partition (each
micro-batch appends); scans then pay per-file open costs. Compaction
rewrites the log with one task per project partition — the standard
OPTIMIZE-style rewrite, kept engine-local (no table format required).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def compact_event_log(
    spark: SparkSession,
    src: str,
    dst: str,
    partition_col: str = "project_id",
) -> tuple[int, int]:
    """Rewrite ``src`` into ``dst`` with files consolidated per
    partition directory. Returns (rows, distinct_partitions). Writes
    to a NEW location — atomic swap/retention is the deployment's
    concern, not silently destructive here."""
    df = spark.read.parquet(src)
    rows = df.count()
    n_parts = df.select(partition_col).distinct().count()
    (
        df.repartition(max(n_parts, 1), F.col(partition_col))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(dst)
    )
    return rows, n_parts
