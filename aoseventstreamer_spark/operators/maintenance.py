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
    concern, not silently destructive here.

    This is the full copy-based rewrite (every partition, new
    location). The in-place selective OPTIMIZE — per-partition
    small-file predicate, rewrite of only breaching partitions,
    atomic rename swap with crash recovery, idempotent re-run — is
    ``operators/compaction.compact_event_log``; prefer it for
    routine maintenance of a live log (it touches only what needs
    rewriting), and this one for migrations that want a fresh copy."""
    from pyspark.sql import Observation

    df = spark.read.parquet(src)
    # n_parts sizes the shuffle so it needs its own (column-pruned)
    # pre-scan; the row count rides the rewrite itself via Observation
    # instead of paying a second full pass
    n_parts = df.select(partition_col).distinct().count()
    obs = Observation("compact")
    (
        df.observe(obs, F.count(F.lit(1)).alias("rows"))
        .repartition(max(n_parts, 1), F.col(partition_col))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(dst)
    )
    return int(obs.get["rows"]), n_parts


def optimize_zorder(
    spark: SparkSession,
    src: str,
    dst: str,
    cluster_cols: list[str],
    partition_col: str = "project_id",
    files_per_partition: int = 4,
) -> tuple[int, int]:
    """Compaction + multi-column clustering in one rewrite (the
    OPTIMIZE ... ZORDER BY shape): within each ``partition_col``
    directory, rows are ordered by the Z-order key of
    ``cluster_cols`` (operators/layout.zorder_key over a min/max
    bucket grid), so footer min/max statistics prune scans filtered
    on ANY clustered column — on top of the directory-level partition
    pruning the log already has.

    One keyed shuffle, same cost class as compaction alone; writes to
    a NEW location like compact_event_log. Returns (rows, partitions).
    """
    from pyspark.sql import Observation

    from aoseventstreamer_spark.operators.layout import quantile_buckets, zorder_key

    df = spark.read.parquet(src)
    n_parts = df.select(partition_col).distinct().count()
    buckets = quantile_buckets(df, cluster_cols, bits=8)
    obs = Observation("optimize")
    (
        df.withColumn("__zkey", zorder_key(buckets, bits=8))
        .repartitionByRange(
            max(n_parts * files_per_partition, 1), F.col(partition_col), F.col("__zkey")
        )
        .sortWithinPartitions(partition_col, "__zkey")
        # observe ABOVE the range exchange: repartitionByRange runs a
        # boundary-sampling pass over its child, which would execute a
        # below-exchange observe twice and double the count
        .observe(obs, F.count(F.lit(1)).alias("rows"))
        .drop("__zkey")
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(dst)
    )
    return int(obs.get["rows"]), n_parts
