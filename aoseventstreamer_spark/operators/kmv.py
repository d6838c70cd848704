"""KMV (k-minimum-values) distinct sketch with set-operation support.

The third mergeable sketch in the family (count-min = frequency,
HLL = cardinality): KMV keeps the k smallest distinct values of a
uniform hash. Its distinguishing power over HLL is SET ALGEBRA
(Beyer et al. 2007, "On Synopses for Distinct-Value Estimation Under
Multiset Operations"): two KMV sketches combine into a sketch of the
union, and the fraction of the combined sketch present in BOTH input
sketches estimates the Jaccard of the underlying sets — so
|A ∩ B| ≈ (n_match / k) · |A ∪ B|, which register-wise HLL cannot do.

Portability discipline (same as ``operators/hll.py``): the hash is
the repo's md5-derived 60-bit ``md5_long``, the sketch CONTENT
(rank, hash value) is exact int64 and value-comparable across
engines, and every float estimate is a derived display value built
by :func:`kmv_estimate` — registered queries compare the integers
(tau, counts), never the division.

Scale shape: one shuffle for the distinct, one for the top-k. The
GROUPED rank-filter window compiles to WindowGroupLimit
(Spark >= 3.5), which pushes a per-partition k-limit BELOW the
shuffle — each mapper forwards at most k rows per group, so the
sketch build moves O(groups · k) rows no matter how large the key
population is. The UNGROUPED build instead uses sort+limit
(TakeOrderedAndProject) — an empty-partitionBy window would sort the
entire hash population in one task, and WindowGroupLimit does not
fire without partition keys. Merges and set ops touch only sketch
rows (≤ k each).

Reference scope: no reference analog (LLM-pipeline mandate; the
capability matches SURVEY §2.B "approximate aggregation").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.dedup import md5_long

H_BITS = 60  # md5_long yields 60 uniform bits


def kmv_sketch(
    df: DataFrame,
    key: Column | str,
    k: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The k smallest distinct 60-bit hashes of ``key`` (per group if
    ``group_cols`` given): rows of (*group_cols, rank, h), rank 1..k
    ascending in h. Duplicate keys are free — the distinct absorbs
    them before ranking."""
    groups = group_cols or []
    h = md5_long(F.col(key).cast("string") if isinstance(key, str) else key)
    hashes = df.select(*groups, h.alias("h")).distinct()
    if not groups:
        # global top-k via sort+limit = TakeOrderedAndProject: every
        # partition forwards its k smallest, no single-partition window
        # sort over the whole distinct hash population (which is what
        # an empty-partitionBy window compiles to — WindowGroupLimit
        # does NOT fire without partition keys; verified in test_kmv).
        # The rank window then runs over <= k rows only.
        top = hashes.orderBy("h").limit(k)
        w = Window.orderBy("h")
        return top.withColumn(
            "rank", F.row_number().over(w).cast("long")
        ).select("rank", "h")
    w = Window.partitionBy(*[F.col(g) for g in groups]).orderBy("h")
    return (
        hashes.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(*groups, "rank", "h")
    )


def kmv_merge(k: int, *sketches: DataFrame) -> DataFrame:
    """Sketch of the UNION of the sketched sets: k smallest of the
    distinct hash values across the inputs, re-ranked. Exact — a KMV
    of A ∪ B built from scratch would contain exactly these rows."""
    out = sketches[0].select("h")
    for s in sketches[1:]:
        out = out.unionByName(s.select("h"))
    w = Window.orderBy("h")
    return (
        out.distinct()
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("rank", "h")
    )


def kmv_stats(sketch: DataFrame) -> DataFrame:
    """1-row (n_used, tau): sketch occupancy and its largest (k-th
    smallest) hash — the exact integers an estimate derives from."""
    return sketch.agg(
        F.count(F.lit(1)).alias("n_used"), F.max("h").alias("tau")
    )


def kmv_set_ops(sk_a: DataFrame, sk_b: DataFrame, k: int) -> DataFrame:
    """1-row exact-integer summary of the union/intersection evidence
    two same-k sketches carry: the combined (union) sketch's occupancy
    and tau, plus ``n_match`` — how many combined-sketch hashes occur
    in BOTH inputs. All int64; turn into float estimates with
    :func:`kmv_estimate` / the ratio (n_match/n_used)·est_union."""
    comb = kmv_merge(k, sk_a, sk_b)
    stats = kmv_stats(comb)
    matched = (
        comb.join(sk_a.select("h"), "h", "semi")
        .join(sk_b.select("h"), "h", "semi")
        .agg(F.count(F.lit(1)).alias("n_match"))
    )
    return stats.crossJoin(matched).select("n_used", "tau", "n_match")


def kmv_estimate(n_used: int, tau: int, k: int) -> float:
    """Distinct-count estimate from a sketch's exact integers: exact
    occupancy while the sketch is not full, else the standard unbiased
    (k-1) / normalized-tau. Driver-side display math — deliberately
    NOT a column, so no registered projection depends on float
    division (the repo's exp()/libm discipline)."""
    if n_used < k:
        return float(n_used)
    return (k - 1) * float(1 << H_BITS) / float(tau)
