"""Streaming data-quality monitor tests: per-batch constraint rows,
replay idempotence, failure filtering, integer z-score volume
anomalies, and the end-to-end foreachBatch wiring with checkpoint
resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aoseventstreamer_spark.streaming.dq_monitor import StreamingDQMonitor


def _checks():
    return {
        "completeness_v": (
            F.expr("(count(v) * 1000000) div count(*)"),
            "metric = 1000000",
        ),
        "row_count": (F.count(F.lit(1)), "metric >= 2"),
        "max_v_cents": (
            F.expr("max(CAST(ROUND(v * 100) AS BIGINT))"),
            "metric <= 100000",
        ),
    }


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id long, v double")


def test_per_batch_rows_and_replay_idempotence(spark, tmp_path):
    mon = StreamingDQMonitor(spark, str(tmp_path / "dq"), _checks())
    mon.process_batch(_batch(spark, [(1, 1.0), (2, 2.0)]), 0)
    mon.process_batch(_batch(spark, [(3, None), (4, 2000.0)]), 1)
    # at-least-once replay of batch 1: rows replaced, not duplicated
    mon.process_batch(_batch(spark, [(3, None), (4, 2000.0)]), 1)
    h = mon.history().collect()
    assert len(h) == 6  # 2 batches x 3 checks
    b0 = {r.check_name: r for r in h if r.batch_id == 0}
    b1 = {r.check_name: r for r in h if r.batch_id == 1}
    assert b0["completeness_v"].passed and b0["completeness_v"].metric == 1_000_000
    assert b0["max_v_cents"].passed
    # batch 1: a null v and an out-of-range value must both fail
    assert not b1["completeness_v"].passed
    assert b1["completeness_v"].metric == 500_000
    assert not b1["max_v_cents"].passed
    fails = {(r.batch_id, r.check_name) for r in mon.failures().collect()}
    assert fails == {(1, "completeness_v"), (1, "max_v_cents")}


def test_volume_anomaly_flags_outlier_batch(spark, tmp_path):
    mon = StreamingDQMonitor(
        spark,
        str(tmp_path / "dq2"),
        {"row_count": (F.count(F.lit(1)), "metric >= 1")},
    )
    for bid in range(6):
        mon.process_batch(_batch(spark, [(i, 1.0) for i in range(10)]), bid)
    mon.process_batch(_batch(spark, [(i, 1.0) for i in range(500)]), 6)
    an = {r.batch_id: r.is_anomaly for r in mon.volume_anomalies().collect()}
    assert an[6] is True
    assert all(not an[b] for b in range(6))


def test_history_before_any_batch_raises_clearly(spark, tmp_path):
    mon = StreamingDQMonitor(spark, str(tmp_path / "dq3"), _checks())
    with pytest.raises(FileNotFoundError, match="no batch committed"):
        mon.history()
    with pytest.raises(ValueError, match="at least one check"):
        StreamingDQMonitor(spark, str(tmp_path / "dq4"), {})


def test_attach_end_to_end_with_checkpoint_resume(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    mon = StreamingDQMonitor(spark, str(tmp_path / "dq5"), _checks())
    _batch(spark, [(1, 1.0), (2, 2.0)]).write.parquet(src)
    stream = spark.readStream.schema("id long, v double").parquet(src)
    q = mon.attach(stream, ckpt, trigger={"availableNow": True})
    q.awaitTermination(120)
    # second drop picked up from the SAME checkpoint -> new batch id
    _batch(spark, [(3, None), (4, 3.0)]).write.mode("append").parquet(src)
    stream = spark.readStream.schema("id long, v double").parquet(src)
    q = mon.attach(stream, ckpt, trigger={"availableNow": True})
    q.awaitTermination(120)
    h = mon.history().collect()
    assert len(h) == 6
    assert {r.batch_id for r in h} == {0, 1}
    late = {r.check_name: r for r in h if r.batch_id == 1}
    assert not late["completeness_v"].passed


def test_predicate_metric_word_boundary(spark, tmp_path):
    """'metric' inside another identifier or a quoted literal must
    survive substitution (ADVICE r5: plain substring replace corrupted
    such predicates into invalid SQL)."""
    from pyspark.sql import functions as F

    from aoseventstreamer_spark.streaming.dq_monitor import _subst_metric

    # unit: identifiers containing the word and quoted literals pass
    # through; the bare word substitutes everywhere else
    assert (
        _subst_metric("metric <= max_metric_cents", "_m_0")
        == "_m_0 <= max_metric_cents"
    )
    assert (
        _subst_metric("'metric' = 'a''metric' AND metric > 0", "_m_1")
        == "'metric' = 'a''metric' AND _m_1 > 0"
    )

    # end-to-end: a predicate with the word inside string literals
    # compiles and evaluates (the r5 substring replace produced
    # invalid SQL here: stack(..., CASE WHEN '_m_1' = ...)
    checks = {
        "tagged": (
            F.count(F.lit(1)).cast("long"),
            "CASE WHEN 'metric' = 'metric' THEN metric >= 1 ELSE false END",
        ),
    }
    mon = StreamingDQMonitor(spark, str(tmp_path / "dq_wb"), checks)
    mon.process_batch(_batch(spark, [(1, 1.0), (2, 2.0)]), 0)
    rows = {r.check_name: r for r in mon.history().collect()}
    assert rows["tagged"].passed and rows["tagged"].metric == 2
