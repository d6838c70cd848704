"""Event-time streaming operators: watermarked windowed aggregation,
dedup-within-watermark, and a custom stateful operator via
applyInPandasWithState.

The reference has no event time at all (timestamps are explicitly
nulled, public_event_server.rs:428-429); these are the north-star
extensions that make the engine useful as an analytics/streaming
system. Watermarks bound state at scale: without them, windowed state
on a 100 TB stream grows without limit.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window counts with late-data drop: events older than
    (max event time - watermark) never re-open a closed window."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("win_start"), key_col, "cnt")
    )


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates arriving
    within the watermark horizon are dropped; state for older keys is
    evicted."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


USER_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_cents", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("cents", T.LongType())]
)


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running event count + value sum, updated per micro-batch, state
    carried in the checkpoint. The reference's only state is a cursor;
    this is the generalized per-key accumulator a real pipeline needs."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # null values count as 0 cents — a NaN->int64 cast would
            # poison the batch forever (checkpoint replays it on every
            # restart)
            cents += int((pdf["value"].fillna(0.0) * 100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_cents": [cents]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def session_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming session windows: per-key sessions close once the
    watermark passes their end; append mode emits each finished
    session exactly once."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.session_window(ts_col, gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
