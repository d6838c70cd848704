"""HDR-histogram-style mergeable quantile sketch, exact-integer and
engine-portable.

The missing member of the sketch family (bloom/cms/hll/kmv): exact
``percentile_disc`` shuffles the whole value column — the one
aggregate in the suite without a mergeable pre-aggregation path at
100 TB. This sketch is a log-scale histogram with ``2^k`` sub-buckets
per octave (the HdrHistogram / DDSketch layout): relative error is
bounded by ``2^-k`` (~1.6% at the default k=6), state is bounded by
``(64-k+1)·2^k`` buckets (≈3.8k rows at k=6) regardless of input
size, and merging shards/days/streams is a cell-wise COUNT add — the
same algebra as the count-min cells.

Everything is exact int64 arithmetic reproducible in ANSI SQL, so the
sketch *and* the quantile answers extracted from it hash-compare
against a DuckDB oracle (the same discipline as ``operators/hll.py``):

- msb(v) = length(bin(v)) - 1 — binary-string length, no float log2.
- bucket(v) = v                                   if v < 2^k
            = (msb-k)·2^k + (v >> (msb-k))        otherwise
  (contiguous, monotone: octave msb spans buckets
  [(msb-k+1)·2^k, (msb-k+2)·2^k)).
- inverse: with q = bucket div 2^k, r = bucket mod 2^k:
  lo = bucket if q = 0 else (r + 2^k) << (q-1);  hi = lo + 2^(q-1) - 1.
- quantile(permil): target rank = ceil(permil·N/1000) in integers;
  the answer bucket is the first with running count ≥ target; the
  reported estimate is the integer bucket midpoint, and [lo, hi] is a
  hard containment bound for the exact percentile_disc value.

Values must be non-negative int64 (the repo's cents convention);
callers with signed data shift or split by sign first.

Reference scope: no reference analog (LLM-pipeline mandate; fills
VERDICT r5 item 3 — the percentile pressure valve).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_K = 6  # 64 sub-buckets per octave: ≤ 2^-6 ≈ 1.6% relative error


def bucket_expr(col: str, k: int = DEFAULT_K) -> str:
    """Spark-SQL expression for the HDR bucket of non-negative ``col``."""
    m = 1 << k
    e = f"(length(bin({col})) - 1 - {k})"
    return (
        f"CAST(CASE WHEN {col} < {m} THEN {col} "
        f"ELSE {e} * {m} + shiftright({col}, CAST({e} AS INT)) END AS BIGINT)"
    )


def sql_bucket_expr(col: str, k: int = DEFAULT_K) -> str:
    """The identical arithmetic in DuckDB SQL (oracle side)."""
    m = 1 << k
    e = f"(length(bin({col})) - 1 - {k})"
    return (
        f"CAST(CASE WHEN {col} < {m} THEN {col} "
        f"ELSE {e} * {m} + ({col} >> {e}) END AS BIGINT)"
    )


def bounds_exprs(bucket: str, k: int = DEFAULT_K) -> tuple[str, str]:
    """(lo, hi) Spark-SQL expressions inverting ``bucket_expr``."""
    m = 1 << k
    q = f"({bucket} div {m})"
    r = f"({bucket} % {m})"
    lo = (
        f"CAST(CASE WHEN {q} = 0 THEN {bucket} "
        f"ELSE shiftleft({r} + {m}, CAST({q} - 1 AS INT)) END AS BIGINT)"
    )
    # hi = lo + (2^(q-1) - 1): the inner parens matter — the top
    # octave's lo + 2^(q-1) is exactly 2^63 and overflows int64 before
    # the -1 lands (left-associative evaluation raised under ANSI on
    # v = 2^63-1; caught by the int64-extremes test)
    hi = (
        f"CAST(CASE WHEN {q} = 0 THEN {bucket} "
        f"ELSE shiftleft({r} + {m}, CAST({q} - 1 AS INT)) "
        f"   + (shiftleft(CAST(1 AS BIGINT), CAST({q} - 1 AS INT)) - 1) "
        f"END AS BIGINT)"
    )
    return lo, hi


def sql_bounds_exprs(bucket: str, k: int = DEFAULT_K) -> tuple[str, str]:
    """(lo, hi) DuckDB expressions inverting ``sql_bucket_expr``."""
    m = 1 << k
    q = f"({bucket} // {m})"
    r = f"({bucket} % {m})"
    lo = (
        f"CAST(CASE WHEN {q} = 0 THEN {bucket} "
        f"ELSE ({r} + {m}) << ({q} - 1) END AS BIGINT)"
    )
    hi = (
        f"CAST(CASE WHEN {q} = 0 THEN {bucket} "
        f"ELSE (({r} + {m}) << ({q} - 1)) + ((CAST(1 AS BIGINT) << ({q} - 1)) - 1) "
        f"END AS BIGINT)"
    )
    return lo, hi


def qsketch(
    df: DataFrame,
    value_col: str,
    k: int = DEFAULT_K,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., bucket, cnt) histogram over non-negative int64
    ``value_col``. One shuffle with map-side partial COUNT; output is
    bounded by groups·(64-k+1)·2^k rows at any input size."""
    g = group_cols or []
    rows = df.select(
        *[F.col(c) for c in g], F.expr(bucket_expr(value_col, k)).alias("bucket")
    )
    return rows.groupBy(*g, "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def qsketch_merge(
    *sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Cell-wise COUNT add of same-k sketches — the merge algebra that
    makes per-shard/per-day/per-batch partials combinable."""
    g = group_cols or []
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*g, "bucket").agg(F.sum("cnt").alias("cnt"))


def with_bounds(sketch: DataFrame, k: int = DEFAULT_K) -> DataFrame:
    """Attach the integer [lo, hi] value bounds of each bucket."""
    lo, hi = bounds_exprs("bucket", k)
    return sketch.withColumn("lo", F.expr(lo)).withColumn("hi", F.expr(hi))


def qsketch_quantiles(
    sketch: DataFrame,
    permils: list[int],
    k: int = DEFAULT_K,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., q_permil, est, lo, hi) — one row per requested
    per-mil quantile (1..1000). ``est`` is the integer midpoint of the
    answer bucket; the exact percentile_disc value is guaranteed in
    [lo, hi]. The window below runs over the *sketch*, whose size is
    bounded by the bucket count — never over the data — so the
    no-partition single-task concern does not apply at scale."""
    g = group_cols or []
    wp = Window.partitionBy(*[F.col(c) for c in g]) if g else Window.partitionBy()
    w = wp.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n_total", F.sum("cnt").over(wp)
    )
    qs = cum.withColumn(
        "q_permil", F.explode(F.array(*[F.lit(p) for p in permils]))
    ).withColumn(
        "target", F.expr("(q_permil * n_total + 999) div 1000")
    )
    hit = qs.where((F.col("cum") >= F.col("target")) & (F.col("cum") - F.col("cnt") < F.col("target")))
    lo, hi = bounds_exprs("bucket", k)
    return hit.select(
        *[F.col(c) for c in g],
        "q_permil",
        F.expr(f"({lo} + {hi}) div 2").alias("est"),
        F.expr(lo).alias("lo"),
        F.expr(hi).alias("hi"),
    )


def bucketize(
    df: DataFrame,
    value_col: str,
    k: int = DEFAULT_K,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The per-row bucket projection shared by the batch sketch and
    the streaming maintenance path: (group..., bucket). Narrow — safe
    to apply to a STREAMING frame before foreachBatch."""
    g = group_cols or []
    return df.select(
        *[F.col(c) for c in g], F.expr(bucket_expr(value_col, k)).alias("bucket")
    )


def qsketch_rollup(
    spark,
    state_root: str,
    group_cols: list[str] | None = None,
):
    """Streaming maintenance of the quantile sketch (VERDICT r6
    item 6): an ``IncrementalRollup`` whose keys are
    (group..., bucket) and whose only aggregate is the cell count —
    so each micro-batch contributes ``qsketch(batch)`` as its partial
    and ``current()`` IS ``qsketch_merge`` over all committed batches
    (cell-wise add, the sketch's merge algebra). Inherits the rollup's
    replay idempotence: a redelivered batch overwrites its own
    ``batch_id`` partition instead of double-counting, so the sketch
    survives kill/restart under at-least-once delivery. Wire it as

        stream -> bucketize(...) -> rollup.attach(..., checkpoint)

    and read quantiles at any time with
    ``qsketch_quantiles(rollup.current(), permils)``."""
    from ..streaming.rollup import IncrementalRollup

    g = group_cols or []
    return IncrementalRollup(
        spark,
        state_root,
        keys=[*g, "bucket"],
        aggs={"cnt": F.count(F.lit(1)).cast("long")},
    )
