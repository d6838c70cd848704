"""Distributed exact global ranking — row_number / NTILE over a total
order WITHOUT a single-partition window.

The naive form — ``row_number().over(Window.orderBy(...))`` or
``ntile(n).over(Window.orderBy(...))`` — compiles to a WindowExec with
an empty partitionSpec: Spark moves EVERY input row through one task
("Moving all data to a single partition"), which is fine at test SFs
and fatal at 10^10 rows. The optimizer only rescues the post-limit
cases (LimitPushDownThroughWindow / InferWindowGroupLimit); a rank that
must be assigned to EVERY row has no limit to push, so the bound has to
come from the algorithm.

This module implements the classic two-phase (zipWithIndex-style)
global rank instead:

1. range-repartition on the order key so partition ``p`` holds a
   contiguous key range and partition ids ascend with the order
   (``RangePartitioner`` assigns ranges to ids 0..P-1 in key order;
   its reservoir sampling is seeded per input-partition index, so the
   boundaries — and therefore the ids — are deterministic for a given
   input);
2. rank locally per partition (window PARTITIONED by the physical
   partition id — parallel, bounded by partition size);
3. per-partition row counts (one row per partition — a P-row frame,
   P = shuffle partitions, cluster-sized not corpus-sized) become each
   partition's starting offset via a broadcast triangular self-join
   (P² pairs at worst, trivially small, and — deliberately — not a
   window at all, so the whole plan passes the unpartitioned-window
   gate with zero allowlist entries);
4. global rank = offset + local rank. NTILE buckets are then pure
   arithmetic on (rank, N): bucket sizes are ``base = N div n`` with
   the first ``N mod n`` buckets one larger — exactly the SQL-standard
   NTILE both Spark and DuckDB implement, verified against Spark's own
   ``F.ntile`` in tests/test_ranking.py.

Every wide operation is bounded: the range shuffle (same cost as the
sort the naive window needs anyway, but parallel), the per-partition
window, and two broadcast joins of P-row / 1-row frames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order: list[Column],
    rank_col: str = "rank",
) -> DataFrame:
    """Append ``rank_col`` = exact 1-based row_number over ``order``
    (which MUST be a total order — end it with a unique id tie-break)
    plus ``__n_total`` = the total row count, without any
    single-partition window. Callers that don't need the count should
    drop ``__n_total``."""
    ordered = df.repartitionByRange(*order)
    part = ordered.withColumn("__pid", F.spark_partition_id())
    w_local = Window.partitionBy("__pid").orderBy(*order)
    local = part.withColumn("__lr", F.row_number().over(w_local))
    counts = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    # offsets via triangular broadcast self-join on the P-row counts
    # frame (NOT a window — keeps the gate clean with no allowlist)
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(
            F.broadcast(b),
            F.col("b.__pid") < F.col("a.__pid"),
            "left",
        )
        .groupBy(F.col("a.__pid").alias("__pid"))
        .agg(F.coalesce(F.sum("b.__cnt"), F.lit(0)).alias("__off"))
    )
    total = counts.agg(F.sum("__cnt").alias("__n_total"))
    return (
        local.join(F.broadcast(offsets), "__pid")
        .crossJoin(F.broadcast(total))
        .withColumn(rank_col, F.col("__off") + F.col("__lr"))
        .drop("__pid", "__lr", "__off")
    )


def _idiv(a: Column, b: Column) -> Column:
    """Exact floor division of non-negative longs via subtract-mod —
    the double division is exact because the numerator is a multiple
    of the denominator and both are < 2^53 (documented bound: frames
    up to ~9·10^15 rows, far past any real corpus)."""
    return ((a - a % b) / b).cast("long")


def ntile_bucket(rank: Column, n_total: Column, n: int) -> Column:
    """SQL-standard NTILE(n) bucket (1-based) for a row at 1-based
    ``rank`` of ``n_total`` rows: the first ``n_total mod n`` buckets
    get ``n_total div n + 1`` rows, the rest ``n_total div n`` — the
    definition Spark and DuckDB share (verified against ``F.ntile`` in
    tests/test_ranking.py). Pure arithmetic — no window, no shuffle.
    The small-bucket denominator is clamped (``greatest(…, 1)``) so
    the branch that is unreachable when ``n_total < n`` stays
    ANSI-safe."""
    base = _idiv(n_total, F.lit(n))          # small-bucket size, may be 0
    rem = n_total % F.lit(n)                  # first `rem` buckets are big
    big = base + F.lit(1)                     # big-bucket size, >= 1
    cutoff = rem * big                        # rows living in big buckets
    safe_base = F.greatest(base, F.lit(1))
    return F.when(
        rank <= cutoff,
        _idiv(rank - 1, big) + 1,
    ).otherwise(rem + _idiv(rank - cutoff - 1, safe_base) + 1)


def ntile_exact(
    df: DataFrame,
    n: int,
    order: list[Column],
    bucket_col: str = "ntile",
) -> DataFrame:
    """``NTILE(n) OVER (ORDER BY order)`` for every row, computed with
    the two-phase global rank — value-identical to the window form
    (same total order ⇒ same ranks ⇒ same buckets) with every wide op
    bounded. ``order`` must end in a unique tie-break."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    ranked = global_rank(df, order, rank_col="__grank")
    return ranked.withColumn(
        bucket_col,
        ntile_bucket(F.col("__grank"), F.col("__n_total"), n).cast("int"),
    ).drop("__grank", "__n_total")
