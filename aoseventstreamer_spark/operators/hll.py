"""HyperLogLog distinct-count sketch with an engine-portable hash.

``approx_count_distinct`` is Spark's built-in HLL++ — right answer,
but its register values are an implementation detail no other engine
can reproduce, so a cross-engine audit can only be rows-only. This
module is HLL (Flajolet et al. 2007) over the repo's portable
md5-derived hash: every register is bit-for-bit reproducible in ANSI
SQL, so the *sketch itself* can be value-compared against an oracle,
and only the final float estimate is a derived display value (the
same discipline as ``avg_nll_u`` vs ``ppl`` in ``operators/lm.py``).

Construction (all exact int64 arithmetic, both engines):

- h = md5_long(key): 60 uniform bits (``operators/dedup.py:149``).
- bucket = h % m (m = 2^p registers).
- r = h div m: the remaining bits; rho = 1 + log2(r & -r) — the
  trailing-zero count (symmetric to HLL's leading-zero rho under a
  uniform hash). ``r & -r`` isolates the lowest set bit, an exact
  power of two, so ``round(log2(.))`` is exact despite libm (the
  repo's documented float-log trap does not bite on exact powers).
  r = 0 (probability 2^-(60-p)) maps to the max rho.
- register value = MAX(rho) per bucket — one groupBy with map-side
  partial max; merging shards/days/streams is the same MAX, so the
  sketch is as mergeable as the count-min cells.

The estimate applies the standard small-range (linear counting) and
raw corrections driver-free, as a 1-row aggregate.

Reference scope: no reference analog (LLM-pipeline mandate; the
capability matches SURVEY §2.B "approximate aggregation").
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.dedup import md5_long

H_BITS = 60  # md5_long yields 60 uniform bits


def hll_rhos(
    df: DataFrame,
    key_col: str,
    p: int = 6,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Pre-aggregation (bucket, rho) rows — the streaming integration
    point: feed these to ``IncrementalRollup`` with keys=(bucket,) and
    a MAX agg (merge_fn 'max') and the per-batch partials merge to
    exactly ``hll_sketch`` of the union (tested). With ``group_cols``
    the rows carry the group keys, yielding one sketch per group."""
    m = 1 << p
    h = md5_long(key_col)
    # h >> p, NOT h/m: double division drops low bits above 2^53
    r = F.shiftright(h, p)
    low = r.bitwiseAND(-r)
    rho = (
        F.when(r == 0, F.lit(H_BITS - p + 1))
        .otherwise(F.round(F.log2(low)).cast("long") + 1)
    )
    g = [F.col(c) for c in (group_cols or [])]
    return df.select(*g, (h % m).alias("bucket"), rho.alias("rho"))


def hll_sketch(
    df: DataFrame,
    key_col: str,
    p: int = 6,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(bucket, max_rho) registers over the keys of ``df`` (duplicate
    keys are free — MAX absorbs them). At most groups·2^p rows; one
    shuffle with map-side partial MAX."""
    return (
        hll_rhos(df, key_col, p, group_cols)
        .groupBy(*(group_cols or []), "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Register-wise MAX of same-p sketches."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("max_rho").alias("max_rho"))


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def denom_shift(p: int) -> int:
    """Fixed-point scale S for the integer denominator: Σ over m=2^p
    registers of 2^(S - max_rho) with max_rho ≥ 0 is < m·2^S = 2^(p+S),
    so S = 62-p keeps the sum exactly representable in int64."""
    return 62 - p


def hll_estimate(
    sketch: DataFrame, p: int = 6, group_cols: list[str] | None = None
) -> DataFrame:
    """Per group (1 row total without ``group_cols``):
    (n_registers, denom_scaled, estimate). denom_scaled is the exact
    integer Σ 2^(S-max_rho) (S = 62-p) with each empty register
    contributing 2^S (value-comparable across engines); estimate is
    the corrected HLL cardinality (derived float — compare
    denom_scaled across engines, not this)."""
    m = 1 << p
    s = denom_shift(p)
    agg = sketch.groupBy(*(group_cols or [])).agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({s} - max_rho AS INT))")
        ).alias("di_used"),
    )
    n_empty = F.lit(m) - F.col("n_used")
    denom_scaled = F.col("di_used") + n_empty.cast("long") * (1 << s)
    raw = F.lit(_alpha(m) * m * m * float(1 << s)) / denom_scaled.cast("double")
    # small-range: linear counting while empty registers remain
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / n_empty.cast("double"))
    est = F.when((raw <= 2.5 * m) & (n_empty > 0), lc).otherwise(raw)
    g = [F.col(c) for c in (group_cols or [])]
    return agg.select(
        *g,
        F.lit(m).alias("n_registers"),
        denom_scaled.alias("denom_scaled"),
        est.alias("estimate"),
    )
