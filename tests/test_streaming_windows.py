"""Event-time streaming tests: watermarked windows drop late data,
dedup-within-watermark, and the applyInPandasWithState custom stateful
operator carrying state across micro-batches."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aoseventstreamer_spark.streaming import windows as W

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_batch(spark, path, rows, n_file: int):
    import os

    df = spark.createDataFrame(rows, EVENTS_SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    df.coalesce(1).write.mode("append").parquet(f"{path}/f{n_file}")
    # the file stream source orders files by modification time; spread
    # mtimes so trigger order matches write order deterministically
    for root, _, files in os.walk(f"{path}/f{n_file}"):
        for f in files:
            p = os.path.join(root, f)
            os.utime(p, (n_file * 1000, n_file * 1000))


def _stream(spark, path):
    # one subdir per trigger via maxFilesPerTrigger=1 → deterministic
    # multi-batch execution
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(path + "/*")
    )


def _row(eid, ts, uid=1, et="click", v=1.0):
    import datetime

    return (eid, datetime.datetime.fromisoformat(ts), uid, et, v)


def test_watermark_drops_late_event(spark, tmp_path):
    """An event arriving after its window was finalized must not
    re-open it (append mode emits each window exactly once).

    Note Spark's eviction is lazy: the watermark passes a window's end
    in batch N, but the state is emitted+evicted while processing
    batch N, so a straggler arriving in that same batch still merges.
    The drop guarantee holds from the following batch on — hence the
    extra watermark-advancing batch before the straggler."""
    src = str(tmp_path / "src")
    # batch 0: events at 10:00-10:10; batch 1 advances event time to
    # 12:00 (watermark → 11:30); batch 2 advances further (the 10:00
    # window is emitted and evicted); batch 3 is the straggler at 10:05
    _write_batch(spark, src, [_row(1, "2024-01-01 10:00:00"), _row(2, "2024-01-01 10:05:00")], 1)
    _write_batch(spark, src, [_row(3, "2024-01-01 12:00:00")], 2)
    _write_batch(spark, src, [_row(5, "2024-01-01 13:00:00")], 3)
    _write_batch(spark, src, [_row(4, "2024-01-01 10:05:00")], 4)

    agg = W.windowed_counts(_stream(spark, src), window="15 minutes", watermark="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {
        (str(r.win_start), r.event_type): r.cnt
        for r in spark.sql("SELECT * FROM wm_counts").collect()
    }
    # the 10:00 window closed with 2 events — the batch-3 straggler
    # (event 4) was dropped, not merged as a 3rd
    assert out.get(("2024-01-01 10:00:00", "click")) == 2


def test_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(
        spark, src,
        [_row(1, "2024-01-01 10:00:00"), _row(1, "2024-01-01 10:00:30")],  # dup id
        1,
    )
    deduped = W.dedup_within_watermark(_stream(spark, src), keys=["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT count(*) c FROM dedup_out").first().c == 1


def test_stateful_running_stats_across_batches(spark, tmp_path):
    """applyInPandasWithState: totals must accumulate across separate
    micro-batches via checkpointed state, not within-batch only."""
    src = str(tmp_path / "src")
    _write_batch(spark, src, [_row(1, "2024-01-01 10:00:00", uid=7, v=1.50)], 1)
    _write_batch(spark, src, [_row(2, "2024-01-01 10:01:00", uid=7, v=2.25)], 2)

    stats = W.running_user_stats(_stream(spark, src))
    q = (
        stats.writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM user_stats WHERE user_id = 7 ORDER BY n_events DESC"
    ).collect()
    # last update reflects BOTH batches: 2 events, 375 cents
    assert rows[0].n_events == 2
    assert rows[0].sum_cents == 375


def test_streaming_session_window(spark, tmp_path):
    """Sessions merge within the gap and close via the watermark:
    events at 10:00/10:10 form one session; 12:00 starts another;
    advancing event time far enough emits the finished sessions."""
    src = str(tmp_path / "src")
    _write_batch(spark, src, [_row(1, "2024-01-01 10:00:00"), _row(2, "2024-01-01 10:10:00")], 1)
    _write_batch(spark, src, [_row(3, "2024-01-01 12:00:00")], 2)
    _write_batch(spark, src, [_row(4, "2024-01-01 18:00:00")], 3)  # closes everything older

    sessions = W.session_counts(_stream(spark, src), gap="30 minutes", watermark="1 hour")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {
        (str(r.session_start), str(r.session_end)): r.n_events
        for r in spark.sql("SELECT * FROM sess").collect()
    }
    # one merged session 10:00-10:40 (2 events), one 12:00-12:30
    assert out.get(("2024-01-01 10:00:00", "2024-01-01 10:40:00")) == 2
    assert out.get(("2024-01-01 12:00:00", "2024-01-01 12:30:00")) == 1


def test_stateful_stats_survive_null_values(spark, tmp_path):
    """A null value must not poison the stateful batch (NaN→int64
    raises; checkpoint replay would kill the stream forever)."""
    src = str(tmp_path / "src")
    _write_batch(spark, src, [_row(1, "2024-01-01 10:00:00", uid=7, v=1.50),
                              (2, __import__("datetime").datetime(2024, 1, 1, 10, 1), 7, "click", None)], 1)
    got = []
    q = (
        W.running_user_stats(_stream(spark, src))
        .writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert got[0].n_events == 2 and got[0].sum_cents == 150  # null counted as 0
