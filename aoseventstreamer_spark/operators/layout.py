"""Data-layout operators: multi-column clustering for scan pruning.

At 100 TB the cheapest query is the one that never reads the data:
parquet row-group min/max statistics prune whole files when the file
layout correlates with the filter columns. A single-column sort only
helps filters on that column; interleaving the bits of several
columns into one Z-order (Morton) key gives every interleaved column
locality, so filters on ANY of them skip most files.

This is the same layout trick Delta Lake / Iceberg expose as
``OPTIMIZE ... ZORDER BY`` — here expressed as a pure-arithmetic
Catalyst expression (zero shuffle to compute) plus one
``repartitionByRange`` on the key at write time.

The key expression is also registered as the oracle-checked query
``q_zorder_key`` (queries/corpus_pack.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of each column into one long.

    Columns must already be non-negative integers (callers map their
    domain onto 0..2**bits-1, e.g. ``col % 256`` or a rank bucket).
    Bit ``i`` of column ``j`` lands at position ``i*len(cols)+j`` —
    pure shift/mask arithmetic, fully codegen'd, no UDF.
    """
    n = len(cols)
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    key = F.lit(0).cast("long")
    for j, c in enumerate(cs):
        c = c.cast("long")
        for i in range(bits):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            key = key + bit * F.lit(2 ** (i * n + j)).cast("long")
    return key


def quantile_buckets(df: DataFrame, cols: list[str], bits: int = 8) -> list[Column]:
    """Monotone bucket index per column via QUANTILE (equal-frequency)
    boundaries — what production Z-order implementations use, because
    equal-WIDTH grids collapse under skew (a heavy low-value mode puts
    most rows in a few buckets and every file ends up covering them).

    Boundaries come from one sampled ``approxQuantile`` pass (driver
    gets ``2**bits`` scalars per column — at 100 TB this runs on the
    same sample a range partitioner would draw). The bucket index is
    ``count(boundaries <= value)``: a fold over a 255-element literal
    array, codegen'd, zero shuffle, and monotone in the raw value, so
    per-file footer min/max on the RAW column stays tight.
    """
    grid = 2**bits
    probs = [i / grid for i in range(1, grid)]
    aliases = [f"__qb_{j}" for j in range(len(cols))]
    cast_df = df.select(
        *[F.col(c).cast("double").alias(a) for c, a in zip(cols, aliases)]
    )
    # one sampled pass for ALL columns (approxQuantile takes a column
    # list) — a per-column loop would re-scan the corpus per column
    all_cuts = cast_df.approxQuantile(aliases, probs, 0.001)
    def bucket_of(c: str, cuts: list[float]) -> Column:
        bounds = F.array(*[F.lit(float(b)) for b in cuts])
        return F.aggregate(
            bounds,
            F.lit(0).cast("long"),
            lambda acc, b: acc + F.when(F.col(c).cast("double") >= b, 1).otherwise(0),
        )

    return [bucket_of(c, cuts) for c, cuts in zip(cols, all_cuts)]


def cluster_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 8,
    curve: str = "zorder",
) -> None:
    """Write ``df`` as parquet clustered on the Z-order key of
    ``cols``: each column is first mapped MONOTONICALLY onto a
    ``2**bits``-bucket grid (quantile-scaled — see quantile_buckets;
    bucket order = value order, so per-file footer min/max on the RAW
    column stays tight), the bucket indices are bit-interleaved, and
    rows are range-partitioned + sorted by the key (each output file
    owns a contiguous key range). After this write a range filter on
    any clustered column prunes most files via footer min/max stats —
    verified against real footers in tests/test_layout.py.

    Cost: one sampled quantile pass (2**bits scalars per column to
    the driver at plan time) + one range shuffle (with its sampling
    pass) — the same profile as a global sort, which is what any
    clustering rewrite costs; the payoff is every subsequent scan.

    ``curve="hilbert"`` (two columns only) orders by the Hilbert key
    instead: measurably fewer files read under selective range
    filters (tools/layout_probe.py: 8/16 vs 12/16 at 10%
    selectivity) at the same write cost.
    """
    # validate BEFORE the quantile pass — approxQuantile is a sampled
    # corpus scan; misuse must fail instantly, not after minutes
    if curve == "hilbert" and len(cols) != 2:
        raise ValueError("curve='hilbert' supports exactly 2 columns")
    if curve not in ("zorder", "hilbert"):
        raise ValueError(f"unknown curve: {curve!r} (zorder | hilbert)")
    buckets = quantile_buckets(df, cols, bits=bits)
    if curve == "hilbert":
        keyed = with_hilbert_key(
            df.withColumns({"__bx": buckets[0], "__by": buckets[1]}),
            "__bx", "__by", bits=bits, out="__zkey",
        ).drop("__bx", "__by")
    else:
        keyed = df.withColumn("__zkey", zorder_key(buckets, bits=bits))
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def with_hilbert_key(
    df: DataFrame,
    x: Column | str,
    y: Column | str,
    bits: int = 8,
    out: str = "hkey",
) -> DataFrame:
    """Hilbert-curve clustering key over a 2^bits x 2^bits grid — the
    published xy2d algorithm (Wikipedia, public domain) unrolled into
    ``bits`` per-level projections.

    Why offer it next to zorder_key: the Hilbert curve never makes the
    long diagonal jumps Morton order does (every consecutive key step
    is one grid step), so per-file min/max envelopes on the raw
    columns are tighter at the same file count — measurably fewer
    false-positive file reads under range filters at 100 TB. Costs a
    few more integer ops per row; both are zero-shuffle codegen
    arithmetic.

    Implemented as a withColumn chain (one projection per level, state
    columns reused) rather than one nested Column: each level reads
    x AND y of the previous level, so a single expression tree would
    double per level — 2^bits leaves by the end — while the chained
    form stays linear and Catalyst's CollapseProject keeps multi-use
    references intact. Inputs must already be ints in [0, 2^bits)
    (use quantile_buckets)."""
    n = 1 << bits
    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")
    df = df.withColumns({"__hx": xc, "__hy": yc, "__hd": F.lit(0).cast("long")})
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        hx, hy = F.col("__hx"), F.col("__hy")
        rx = F.when(hx.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(hy.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        fx = F.when(rx == 1, F.lit(n - 1) - hx).otherwise(hx)
        fy = F.when(rx == 1, F.lit(n - 1) - hy).otherwise(hy)
        df = df.withColumns(
            {
                "__hd": F.col("__hd")
                + F.lit(s * s) * (rx * 3).bitwiseXOR(ry).cast("long"),
                # rot: only when ry == 0 — flip (if rx) then swap x/y
                "__hx": F.when(ry == 0, fy).otherwise(hx),
                "__hy": F.when(ry == 0, fx).otherwise(hy),
            }
        )
    return df.withColumnRenamed("__hd", out).drop("__hx", "__hy")


def hilbert_oracle_sql(
    table: str,
    x_sql: str,
    y_sql: str,
    select_sql: str,
    bits: int = 8,
    out: str = "hkey",
) -> str:
    """DuckDB SQL replaying with_hilbert_key exactly: the same
    per-level state updates as chained CTEs, generated from the same
    algorithm spec, so the key column value-matches bit-for-bit."""
    n = 1 << bits
    ctes = [
        f"h{bits} AS (SELECT {select_sql}, CAST({x_sql} AS BIGINT) AS hx,"
        f" CAST({y_sql} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM {table})"
    ]
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        fx = f"(CASE WHEN {rx} = 1 THEN {n - 1} - hx ELSE hx END)"
        fy = f"(CASE WHEN {rx} = 1 THEN {n - 1} - hy ELSE hy END)"
        ctes.append(
            f"h{level} AS (SELECT * REPLACE ("
            f"hd + {s * s} * CAST(xor({rx} * 3, {ry}) AS BIGINT) AS hd, "
            f"CASE WHEN {ry} = 0 THEN {fy} ELSE hx END AS hx, "
            f"CASE WHEN {ry} = 0 THEN {fx} ELSE hy END AS hy"
            f") FROM h{level + 1})"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT {select_sql}, hd AS {out} FROM h0"
    )
