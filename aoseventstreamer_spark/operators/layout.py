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
    """
    buckets = quantile_buckets(df, cols, bits=bits)
    (
        df.withColumn("__zkey", zorder_key(buckets, bits=bits))
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
