"""As-of join — the canonical time-series operator Spark lacks as a
built-in, expressed as a composition of existing DataFrame ops (no
UDF, no mapPartitions):

    union(left tagged 1, right tagged 0)
      → window last(right_payload, ignorenulls) over
        (partition key, order (ts, tag), rows unbounded-preceding..current)
      → keep left rows

Ordering right rows (tag 0) before left rows (tag 1) at equal
timestamps gives the standard ASOF semantics ``left.ts >= right.ts``
(a right row at exactly left.ts matches). Right rows are pre-deduped
to one per (key, ts) so ties inside the right stream can't make the
carried value nondeterministic.

Scale shape: one shuffle on the key (the window), state linear in the
union — the same cost profile as a sort-merge join, with no range
explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_vals: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """For every left row: the most recent right row of the same key
    with ``right.ts <= left.ts``. ``how='inner'`` drops left rows with
    no prior right row; ``how='left'`` keeps them with nulls."""
    if right_vals is None:
        right_vals = [c for c in right.columns if c not in (key, right_ts)]

    rv = F.struct(
        F.col(right_ts).alias("_asof_ts"), *[F.col(c) for c in right_vals]
    )
    # one right row per (key, ts): max-struct keeps the comparison
    # deterministic under ties inside the right stream
    r = (
        right.groupBy(F.col(key), F.col(right_ts).alias("_ts"))
        .agg(F.max(rv).alias("_rv"))
        .select(key, "_ts", F.lit(0).alias("_tag"), "_rv")
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    r = r.withColumn("_lrow", F.lit(None).cast(l.schema["_lrow"].dataType))

    combined = l.unionByName(r)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = combined.withColumn("_match", F.last("_rv", ignorenulls=True).over(w))
    out = carried.filter(F.col("_tag") == 1)
    if how == "inner":
        out = out.filter(F.col("_match").isNotNull())
    elif how != "left":
        raise ValueError(f"as_of_join supports inner/left, not {how!r}")

    cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    cols.append(F.col("_match._asof_ts").alias("asof_ts"))
    cols.extend(F.col(f"_match.{c}").alias(f"asof_{c}") for c in right_vals)
    return out.select(*cols)
