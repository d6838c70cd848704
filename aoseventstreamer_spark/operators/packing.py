"""Sequence packing: place every document into fixed-size token-budget
packs (context windows) for pretraining — the "concatenate the corpus,
cut every N tokens" step every LLM data pipeline runs last.

Semantics (the standard pretraining shape): documents are laid out in
a deterministic global order (``order_col``, ascending); each document
occupies the half-open token interval
``[prefix_sum - tokens, prefix_sum)`` of the concatenated stream, and
pack ``p`` is the interval ``[p*budget, (p+1)*budget)``. A document
therefore lands in packs ``pack_first..pack_last`` (it may straddle a
boundary — exactly what happens to real training examples).

Scale shape — the naive formulation is a global running sum, i.e. ONE
unbounded window partition (a driver-killer at 10^9 docs). This
implements the classic two-phase distributed prefix sum instead:

1. block-local cumulative sums inside ``order_col div block_size``
   blocks (window partitioned BY BLOCK — parallel, bounded state);
2. per-block totals (one tiny row per block) get their own running
   sum on the driver-sized block frame, then broadcast-join back as
   each block's starting offset.

Both phases are exact BIGINT arithmetic, so the result value-matches
a plain ``SUM() OVER (ORDER BY ...)`` oracle bit-for-bit while keeping
every wide operation bounded by block size or block count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    budget: int,
    token_col: str = "tok",
    id_col: str = "doc_id",
    order_col: str | None = None,
    block_size: int = 1_000_000,
) -> DataFrame:
    """Assign packs: returns (id, tok, offset, pack_first, pack_last)
    where ``offset`` is the document's start position in the
    concatenated token stream and packs are ``budget``-token windows.

    ``order_col`` (default: ``id_col``) must be unique and is the
    global layout order. ``block_size`` bounds the per-partition
    window state; correctness is independent of it (tested), so tune
    it to taste — 10^6 ids per block keeps blocks ≈ single shuffle
    partitions at any corpus size."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    order_col = order_col or id_col
    base = docs.select(
        F.col(id_col),
        F.col(order_col).alias("__ord"),
        F.col(token_col).cast("long").alias("tok"),
    ).withColumn("__block", F.col("__ord").cast("long") - F.pmod("__ord", F.lit(block_size)))

    # phase 1: block-local running sums (parallel across blocks)
    w_local = (
        Window.partitionBy("__block")
        .orderBy("__ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("__local_sum", F.sum("tok").over(w_local))

    # phase 2: per-block totals -> running offsets (block frame is tiny:
    # one row per block_size ids; its window is proportionally bounded)
    w_blocks = (
        Window.orderBy("__block")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    block_offsets = (
        base.groupBy("__block")
        .agg(F.sum("tok").alias("__block_total"))
        .withColumn(
            "__block_start",
            F.sum("__block_total").over(w_blocks) - F.col("__block_total"),
        )
        .select("__block", "__block_start")
    )

    packed = (
        local.join(F.broadcast(block_offsets), "__block")
        .withColumn("offset", F.col("__block_start") + F.col("__local_sum") - F.col("tok"))
        # integer div (all quantities non-negative, so div == floor and
        # stays exact past 2^53 where double floor(x/b) would not)
        .withColumn("pack_first", F.expr(f"offset div {budget}"))
        # last pack: position of the document's final token; empty
        # (tok=0) documents sit entirely at their offset
        .withColumn(
            "pack_last",
            F.expr(f"(offset + greatest(tok, 1L) - 1) div {budget}"),
        )
    )
    return packed.select(id_col, "tok", "offset", "pack_first", "pack_last")


def pack_sequences_oracle_sql(
    budget: int,
    table: str = "documents",
    token_expr: str = "len(regexp_split_to_array(trim(text), '\\s+'))",
    id_col: str = "doc_id",
) -> str:
    """DuckDB SQL computing EXACTLY pack_sequences over ``table`` with
    a plain global running sum — the semantic spec the two-phase form
    must (and does) match bit-for-bit."""
    return f"""
    WITH d AS (
      SELECT {id_col}, CAST({token_expr} AS BIGINT) AS tok FROM {table}
    ), s AS (
      SELECT {id_col}, tok,
             SUM(tok) OVER (ORDER BY {id_col}
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - tok AS "offset"
      FROM d
    )
    SELECT {id_col}, tok, "offset",
           CAST("offset" // {budget} AS BIGINT) AS pack_first,
           CAST(("offset" + GREATEST(tok, 1) - 1) // {budget} AS BIGINT)
             AS pack_last
    FROM s
    """
