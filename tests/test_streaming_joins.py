"""Stream-stream join and exactly-once sink tests."""

from __future__ import annotations

import pytest

from aoseventstreamer_spark.streaming.joins import (
    exactly_once_parquet_sink,
    windowed_attribution,
)
from tests.test_streaming_windows import EVENTS_SCHEMA, _row, _stream, _write_batch


def test_windowed_attribution(spark, tmp_path):
    clicks = str(tmp_path / "clicks")
    buys = str(tmp_path / "buys")
    # user 1: click 10:00, purchase 10:10  -> attributed (within 30m)
    # user 1: purchase 12:00               -> NOT attributed (outside)
    # user 2: purchase 10:05 w/o click     -> not attributed (inner join)
    _write_batch(spark, clicks, [_row(1, "2024-01-01 10:00:00", uid=1)], 1)
    _write_batch(
        spark, buys,
        [_row(10, "2024-01-01 10:10:00", uid=1, et="purchase"),
         _row(11, "2024-01-01 12:00:00", uid=1, et="purchase"),
         _row(12, "2024-01-01 10:05:00", uid=2, et="purchase")],
        1,
    )
    joined = windowed_attribution(
        _stream(spark, clicks), _stream(spark, buys), within="30 minutes"
    )
    out = []
    q = (
        joined.writeStream.foreachBatch(lambda df, bid: out.extend(df.collect()))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert [(r.user_id, r.left_id, r.right_id) for r in out] == [(1, 1, 10)]


def test_exactly_once_sink_no_duplicates_after_replay(spark, tmp_path):
    """Crash after the write but before the checkpoint commit: the
    replayed batch must overwrite, not duplicate."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    _write_batch(spark, src, [_row(i, "2024-01-01 10:00:00") for i in range(5)], 1)

    # first attempt: write succeeds, then the epoch "fails" before commit
    attempt = {"n": 0}

    def write_then_crash(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(f"{dst}/batch={batch_id}")
        attempt["n"] += 1
        raise RuntimeError("crash after write, before checkpoint commit")

    q1 = (
        _stream(spark, src).writeStream.foreachBatch(write_then_crash)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception):
        q1.awaitTermination(120)
    assert attempt["n"] == 1
    assert spark.read.parquet(dst).count() == 5  # written once

    # restart: the batch replays into the SAME directory (overwrite)
    q2 = exactly_once_parquet_sink(
        _stream(spark, src), dst, ck, trigger={"availableNow": True}
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(dst).count() == 5  # still 5 — no duplicates


def test_windowed_attribution_left_outer_emits_unmatched(spark, tmp_path):
    """Left-outer stream-stream join: the unconverted click appears
    with null right columns, but only after the watermark passes its
    join horizon (click.ts + within + watermark) — before that it is
    held as pending state, not lost."""
    clicks = str(tmp_path / "clicks")
    buys = str(tmp_path / "buys")
    # user 1 converts within 30m; user 2's click never converts
    _write_batch(spark, clicks,
                 [_row(1, "2024-01-01 10:00:00", uid=1),
                  _row(2, "2024-01-01 10:00:00", uid=2)], 1)
    _write_batch(spark, buys,
                 [_row(10, "2024-01-01 10:10:00", uid=1, et="purchase")], 1)
    # watermark pushers on BOTH streams, far past the horizon
    _write_batch(spark, clicks, [_row(98, "2024-01-01 14:00:00", uid=9)], 2)
    _write_batch(spark, buys, [_row(99, "2024-01-01 14:00:00", uid=9, et="purchase")], 2)

    joined = windowed_attribution(
        _stream(spark, clicks), _stream(spark, buys),
        within="30 minutes", how="left_outer",
    )
    out = []
    q = (
        joined.writeStream.foreachBatch(lambda df, bid: out.extend(df.collect()))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r.user_id, r.left_id, r.right_id) for r in out}
    assert (1, 1, 10) in got            # matched pair, right cols populated
    assert (2, 2, None) in got          # unmatched click flushed with nulls
    assert (9, 98, 99) not in got       # r.ts must be STRICTLY after l.ts


def test_windowed_attribution_full_outer_emits_both_sides(spark, tmp_path):
    """Full-outer stream-stream join (r7): unmatched CLICKS flush with
    null right columns AND unmatched PURCHASES flush with null left
    columns once the watermark passes their horizons — the complete
    join matrix over bounded state."""
    clicks = str(tmp_path / "clicks")
    buys = str(tmp_path / "buys")
    # user 1 converts; user 2's click never converts; user 3 purchases
    # with no preceding click
    _write_batch(spark, clicks,
                 [_row(1, "2024-01-01 10:00:00", uid=1),
                  _row(2, "2024-01-01 10:00:00", uid=2)], 1)
    _write_batch(spark, buys,
                 [_row(10, "2024-01-01 10:10:00", uid=1, et="purchase"),
                  _row(13, "2024-01-01 10:07:00", uid=3, et="purchase")], 1)
    # watermark pushers far past every horizon
    _write_batch(spark, clicks, [_row(98, "2024-01-01 16:00:00", uid=9)], 2)
    _write_batch(spark, buys, [_row(99, "2024-01-01 16:00:00", uid=9, et="purchase")], 2)

    joined = windowed_attribution(
        _stream(spark, clicks), _stream(spark, buys),
        within="30 minutes", how="full_outer",
    )
    out = []
    q = (
        joined.writeStream.foreachBatch(lambda df, bid: out.extend(df.collect()))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r.user_id, r.left_id, r.right_id) for r in out}
    assert (1, 1, 10) in got        # matched
    assert (2, 2, None) in got      # unconverted click
    assert (3, None, 13) in got     # clickless purchase, key from right


def test_windowed_attribution_right_outer(spark, tmp_path):
    clicks = str(tmp_path / "clicks")
    buys = str(tmp_path / "buys")
    _write_batch(spark, clicks, [_row(1, "2024-01-01 10:00:00", uid=1)], 1)
    _write_batch(spark, buys,
                 [_row(10, "2024-01-01 10:10:00", uid=1, et="purchase"),
                  _row(13, "2024-01-01 10:07:00", uid=3, et="purchase")], 1)
    _write_batch(spark, clicks, [_row(98, "2024-01-01 16:00:00", uid=9)], 2)
    _write_batch(spark, buys, [_row(99, "2024-01-01 16:00:00", uid=9, et="purchase")], 2)

    joined = windowed_attribution(
        _stream(spark, clicks), _stream(spark, buys),
        within="30 minutes", how="right_outer",
    )
    out = []
    q = (
        joined.writeStream.foreachBatch(lambda df, bid: out.extend(df.collect()))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r.user_id, r.left_id, r.right_id) for r in out}
    assert (1, 1, 10) in got
    assert (3, None, 13) in got     # right side preserved
    # a right-outer never emits unmatched LEFT rows
    assert all(rid is not None for _, _, rid in got)
