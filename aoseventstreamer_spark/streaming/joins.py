"""Stream-stream joins and the exactly-once sink pattern.

Stream-stream joins are the streaming capability the reference's
model (single log, filter-only consumers) never reaches for; with
watermarks on both sides Spark bounds the join state, making windowed
attribution (click → purchase within N minutes) run indefinitely.

The idempotent sink upgrades the engine's at-least-once chunk
delivery to exactly-once *effects*: a replayed micro-batch overwrites
its own batch directory instead of appending a duplicate — the
standard deterministic-batch-id pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_attribution(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    within: str = "30 minutes",
    state_watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Each left event matched to right events of the same key
    occurring in (left.ts, left.ts + within]. Watermarks on both
    sides let Spark evict join state older than the horizon — without
    them, stream-stream join state grows forever.

    ``how='left_outer'`` additionally emits every UNMATCHED left event
    (right columns null) once the watermark passes its join horizon —
    the "clicks that never converted" stream, which an inner join can
    never produce. ``right_outer`` mirrors it ("purchases with no
    preceding click" — the fraud-screen shape), and ``full_outer``
    emits BOTH unmatched sides, completing the stream-stream join
    matrix. Spark requires the time-interval condition for outer
    stream-stream joins precisely so it can prove when an unmatched
    row is final; state stays bounded exactly as for inner.
    """
    if how not in ("inner", "left_outer", "right_outer", "full_outer"):
        raise ValueError(f"unsupported stream-stream join type: {how}")
    l = left.withWatermark(ts_col, state_watermark).alias("l")
    r = right.withWatermark(ts_col, state_watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{ts_col}") > F.col(f"l.{ts_col}"))
        & (F.col(f"r.{ts_col}") <= F.col(f"l.{ts_col}") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how).select(
        # coalesce: an unmatched RIGHT row (right/full outer) carries
        # the key only on its own side
        F.coalesce(F.col(f"l.{key}"), F.col(f"r.{key}")).alias(key),
        F.col(f"l.{ts_col}").alias("left_ts"),
        F.col(f"r.{ts_col}").alias("right_ts"),
        F.col(f"l.{id_col}").alias("left_id"),
        F.col(f"r.{id_col}").alias("right_id"),
    )


def exactly_once_parquet_sink(stream: DataFrame, path: str, checkpoint: str, trigger: dict | None = None):
    """At-least-once replay + idempotent (batch-id-keyed, overwrite)
    writes = exactly-once table contents. A replayed batch rewrites
    `batch=<id>/` instead of appending duplicates."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/batch={batch_id}")

    return (
        stream.writeStream.foreachBatch(write)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"processingTime": "250 milliseconds"}))
        .start()
    )
