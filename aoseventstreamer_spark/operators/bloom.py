"""Bloom-filter membership for incremental corpus admission.

A 100 TB corpus that admits new crawl batches cannot afford an exact
anti-join against every fingerprint it has ever seen on every batch.
The standard scale answer is a Bloom filter over the historical
fingerprints: "definitely new" documents skip the exact check entirely;
only the (few) "possibly seen" ones pay for it. This module builds the
filter and evaluates membership as plain DataFrame relational algebra,
bit-for-bit reproducibly on any engine:

- Two independent 60-bit hashes come from disjoint halves of one
  ``md5`` (hex chars 1-15 and 16-30) — the repo's portable-hash
  convention (``operators/dedup.py:149``), exact on Spark and DuckDB.
- The k probe positions use Kirsch-Mitzenmacher double hashing,
  ``(h1 + i*h2) mod m`` for i in 0..k-1 — every intermediate stays
  below 2^63 for k ≤ 4, exact in int64.
- The *filter itself is a DataFrame* of distinct set-bit positions
  (≤ m rows of one BIGINT). Building it is one map + one distinct;
  membership is a broadcast-able equi-join. No driver-side bitmap, no
  UDF, no mutable state — and the same SQL runs on the oracle side,
  so even the false positives are deterministic and value-comparable.

At real scale m grows to 2^30+: the positions frame is still only
|bits-set| rows (bounded by #distinct keys × k), the join stays a
broadcast until several hundred MiB, and beyond that it degrades
gracefully to a shuffle join on the bit position — unlike a literal
bitmap, which would have to fit on every executor.

Reference scope: no reference analog (LLM-pipeline mandate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# SQL twins of the two hash halves (DuckDB dialect), for oracles.
H1_SQL = "CAST(('0x' || substr(md5({c}), 1, 15)) AS BIGINT)"
H2_SQL = "CAST(('0x' || substr(md5({c}), 16, 15)) AS BIGINT)"


def _h1(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _h2(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 16, 15), 16, 10).cast("long")


def bloom_positions(
    df: DataFrame, key_col: str, m: int, k: int, out: str = "pos"
) -> DataFrame:
    """All k probe positions per row (the row's other columns are
    kept): (h1 + i*h2) mod m, i = 0..k-1."""
    if k > 4:
        raise ValueError("k>4 risks int64 overflow in h1 + i*h2")
    c = F.col(key_col)
    probes = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: (_h1(c) + i * _h2(c)) % m,
    )
    return df.withColumn(out, F.explode(probes))


def bloom_build(df: DataFrame, key_col: str, m: int, k: int) -> DataFrame:
    """The filter: distinct set-bit positions (≤ m single-BIGINT rows)
    over every key in ``df``. Map-side partial distinct, one shuffle."""
    return (
        bloom_positions(df.select(key_col), key_col, m, k)
        .select("pos")
        .distinct()
    )


def bloom_admit(
    batch: DataFrame, bits: DataFrame, key_col: str, m: int, k: int
) -> DataFrame:
    """Tag each batch row ``maybe_seen``: true iff all k of its probe
    positions are set in ``bits``. False ⇒ definitely not in the
    corpus the filter was built over (Bloom filters have no false
    negatives); true ⇒ route to the exact check. The ``bits`` side is
    broadcast when small — the common case."""
    keys = batch.select(key_col).distinct()
    probes = bloom_positions(keys, key_col, m, k)
    hit = bits.withColumn("_hit", F.lit(1))
    flags = (
        probes.join(F.broadcast(hit), "pos", "left")
        .groupBy(key_col)
        .agg((F.sum(F.coalesce("_hit", F.lit(0))) == k).alias("maybe_seen"))
    )
    return batch.join(flags, key_col)


def bloom_pack(bits: DataFrame) -> DataFrame:
    """Pack the set-bit positions into ONE row holding a
    word -> 64-bit-mask map (``bloom``): ≤ m/64 entries, broadcastable.
    The map form (not a dense array) stays proportional to bits SET,
    so a sparse filter over a huge m ships small."""
    masks = bits.select(
        F.expr("pos div 64").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("m"),
    ).groupBy("word").agg(F.expr("bit_or(m)").alias("mask"))
    return masks.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word", "mask"))
        ).alias("bloom")
    )


def bloom_semi_reduce(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    m: int = 1 << 20,
    k: int = 3,
    build_key: str | None = None,
) -> DataFrame:
    """Runtime semi-join reduction — the classic 100 TB join trick:
    build a Bloom filter over the BUILD side's join keys, broadcast it
    as one packed-bitmap row, and drop probe rows whose keys are
    definitely absent BEFORE the join's shuffle ever sees them. No
    false negatives ⇒ the subsequent exact join returns exactly what
    it would have without the reduction (register-checked by
    q_bloom_join against the plain-join oracle); false positives only
    cost a little shuffled dead weight.

    Plan shape: build side pays one distinct-positions shuffle bounded
    by m; the probe side pays ZERO extra exchanges — the filter is a
    broadcast cross join of one map row plus a narrow k-probe bit test
    (Kirsch-Mitzenmacher double hashing, all int64-exact). Spark's own
    runtime bloom (spark.sql.optimizer.runtime.bloomFilter) does this
    inside AQE when statistics justify it; this operator is the
    explicit, engine-portable form for when the planner can't see the
    selectivity (e.g. the build side is a filtered subquery)."""
    bkey = build_key or key_col
    # both sides hash the STRING form of the key so numeric keys hash
    # identically (md5 over a raw bigint would binary-cast on one side
    # and string-cast on the other)
    packed = bloom_pack(
        bloom_build(
            build.select(F.col(bkey).cast("string").alias(bkey)), bkey, m, k
        )
    ).select(F.col("bloom").alias("__bloom_bits"))
    # collision-proof internal name: a probe frame legitimately owning
    # a 'bloom' column must survive the crossJoin + drop round-trip
    if "__bloom_bits" in probe.columns:
        raise ValueError("probe must not carry a __bloom_bits column")
    c = F.col(key_col).cast("string")
    cond = F.lit(True)
    for i in range(k):
        pos = (_h1(c) + i * _h2(c)) % m
        word = F.floor(pos / 64).cast("long")
        # call_function: the Python shiftleft wrapper requires a
        # literal int shift, but the SQL function takes expressions
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        cond = cond & (
            F.coalesce(
                F.element_at(F.col("__bloom_bits"), word), F.lit(0).cast("long")
            ).bitwiseAND(mask)
            != 0
        )
    return (
        probe.crossJoin(F.broadcast(packed))
        .filter(cond)
        .drop("__bloom_bits")
    )
