"""Incremental rollup maintenance (streaming/rollup.py): partials
merge to the batch-recompute answer, batch replay cannot double-count,
min/max merge functions, compaction, and the streaming e2e path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aoseventstreamer_spark.streaming.rollup import IncrementalRollup


def _events(spark, rows):
    return spark.createDataFrame(rows, "etype string, value long")


def _rollup(spark, root):
    return IncrementalRollup(
        spark,
        str(root),
        keys=["etype"],
        aggs={
            "cnt": F.count(F.lit(1)).cast("long"),
            "total": F.sum("value"),
            "peak": F.max("value"),
        },
        merge_fns={"peak": "max"},
    )


def test_partials_merge_to_batch_recompute(spark, tmp_path):
    r = _rollup(spark, tmp_path)
    b0 = [("a", 1), ("a", 2), ("b", 10)]
    b1 = [("a", 5), ("c", 7)]
    r.process_batch(_events(spark, b0), 0)
    r.process_batch(_events(spark, b1), 1)
    got = {t.etype: (t.cnt, t.total, t.peak) for t in r.current().collect()}
    want_df = _events(spark, b0 + b1).groupBy("etype").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("value").alias("total"),
        F.max("value").alias("peak"),
    )
    want = {t.etype: (t.cnt, t.total, t.peak) for t in want_df.collect()}
    assert got == want == {"a": (3, 8, 5), "b": (1, 10, 10), "c": (1, 7, 7)}


def test_replayed_batch_overwrites_not_doubles(spark, tmp_path):
    r = _rollup(spark, tmp_path)
    r.process_batch(_events(spark, [("a", 1)]), 0)
    r.process_batch(_events(spark, [("a", 2)]), 1)
    before = r.current().collect()
    # at-least-once redelivery of batch 1 — same id, same rows
    r.process_batch(_events(spark, [("a", 2)]), 1)
    after = r.current().collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
    assert after[0].cnt == 2 and after[0].total == 3


def test_compact_preserves_rollup(spark, tmp_path):
    r = _rollup(spark, tmp_path)
    for i in range(5):
        r.process_batch(_events(spark, [("a", i), ("b", i * 10)]), i)
    want = sorted(map(tuple, r.current().collect()))
    dst = str(tmp_path / "base")
    n = r.compact(dst)
    assert n == 2
    base = spark.read.parquet(dst)
    got = sorted(
        map(tuple, base.select("etype", "cnt", "total", "peak").collect())
    )
    assert got == want


def test_streaming_attach_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    r = _rollup(spark, tmp_path / "state")
    _events(spark, [("a", 1), ("b", 2)]).write.parquet(src)
    stream = spark.readStream.schema("etype string, value long").parquet(src)
    q = r.attach(stream, ckpt, trigger={"availableNow": True})
    q.awaitTermination(120)
    # second drop; restart from the same checkpoint picks up only it
    _events(spark, [("a", 9)]).write.mode("append").parquet(src)
    stream = spark.readStream.schema("etype string, value long").parquet(src)
    q = r.attach(stream, ckpt, trigger={"availableNow": True})
    q.awaitTermination(120)
    got = {t.etype: (t.cnt, t.total, t.peak) for t in r.current().collect()}
    assert got == {"a": (2, 10, 9), "b": (1, 2, 2)}


def test_empty_batch_is_harmless(spark, tmp_path):
    r = _rollup(spark, tmp_path)
    r.process_batch(_events(spark, [("a", 1)]), 0)
    r.process_batch(_events(spark, []).limit(0), 1)
    got = r.current().collect()
    assert [(t.etype, t.cnt) for t in got] == [("a", 1)]


def test_current_before_any_batch_raises_clearly(spark, tmp_path):
    r = _rollup(spark, tmp_path / "never")
    with pytest.raises(FileNotFoundError, match="no rollup partials"):
        r.current()
