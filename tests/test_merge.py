"""MERGE-style upsert operators (operators/merge.py): SCD1 latest-wins
semantics and SCD2 history tracking."""

from __future__ import annotations

import pytest

from aoseventstreamer_spark.operators.merge import merge_scd2, merge_upsert


def _state(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, ver long")


def test_upsert_update_insert_keep(spark):
    target = _state(spark, [(1, "a", 1), (2, "b", 1), (3, "c", 1)])
    updates = _state(spark, [(2, "B", 2), (4, "d", 2)])
    out = {r.k: (r.v, r.ver) for r in merge_upsert(target, updates, "k", "ver").collect()}
    assert out == {1: ("a", 1), 2: ("B", 2), 3: ("c", 1), 4: ("d", 2)}


def test_upsert_latest_update_wins_within_batch(spark):
    target = _state(spark, [(1, "a", 1)])
    updates = _state(spark, [(1, "mid", 5), (1, "latest", 9), (1, "old", 2)])
    out = merge_upsert(target, updates, "k", "ver").collect()
    assert len(out) == 1 and out[0].v == "latest"


def test_upsert_rejects_column_mismatch(spark):
    target = _state(spark, [(1, "a", 1)])
    bad = spark.createDataFrame([(1, "x")], "k long, v string")
    with pytest.raises(ValueError, match="column mismatch"):
        merge_upsert(target, bad, "k", "ver")


def test_scd2_closes_and_appends(spark):
    target = spark.createDataFrame(
        [(1, "a", 10, None, True), (2, "b", 10, None, True),
         (1, "a0", 5, 10, False)],
        "k long, v string, valid_from long, valid_to long, is_current boolean",
    )
    updates = spark.createDataFrame([(1, "A", 20)], "k long, v string, ver long")
    out = merge_scd2(target, updates, "k", order_by="ver")
    rows = sorted(
        ((r.k, r.v, r.valid_from, r.valid_to, r.is_current) for r in out.collect())
    )
    assert rows == [
        (1, "A", 20, None, True),    # new current version
        (1, "a", 10, 20, False),     # closed at the update's version
        (1, "a0", 5, 10, False),     # historic row untouched
        (2, "b", 10, None, True),    # unmatched key untouched
    ]


def test_scd2_history_chain_is_contiguous(spark):
    state = spark.createDataFrame(
        [(1, "v1", 1, None, True)],
        "k long, v string, valid_from long, valid_to long, is_current boolean",
    )
    for ver, val in [(2, "v2"), (3, "v3"), (4, "v4")]:
        upd = spark.createDataFrame([(1, val, ver)], "k long, v string, ver long")
        state = merge_scd2(state, upd, "k", order_by="ver")
    rows = sorted((r.valid_from, r.valid_to, r.v, r.is_current) for r in state.collect())
    assert rows == [
        (1, 2, "v1", False), (2, 3, "v2", False),
        (3, 4, "v3", False), (4, None, "v4", True),
    ]
    # each version's close equals the next version's open: no gaps


def test_streaming_upsert_foreachbatch(spark, tmp_path):
    """The streaming shape: each micro-batch upserts into a parquet
    state table via merge_upsert — batch replay (at-least-once) is
    idempotent because latest-wins merges are."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    src = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType()),
         T.StructField("ver", T.LongType())]
    )
    # the file-stream source lists files directly under the path (no
    # recursion): surface each batch's part files at the top level
    import glob
    import shutil

    for i, rows in enumerate([[(1, "a", 1), (2, "b", 2)], [(2, "B", 3), (3, "c", 4)]]):
        staged = str(tmp_path / f"stage{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(staged)
        for j, part in enumerate(glob.glob(os.path.join(staged, "part-*.parquet"))):
            shutil.move(part, os.path.join(src, f"batch{i}_{j}.parquet"))

    def upsert(batch_df, batch_id):
        try:
            target = batch_df.sparkSession.read.parquet(state_dir)
        except Exception:
            target = batch_df.limit(0)
        new_state = merge_upsert(target, batch_df, "k", "ver")
        # overwrite to a temp then swap would be production; direct
        # overwrite is fine for the contract test (deterministic batch)
        new_state.cache().count()
        new_state.write.mode("overwrite").parquet(state_dir)
        new_state.unpersist()

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(upsert)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    final = {r.k: (r.v, r.ver) for r in spark.read.parquet(state_dir).collect()}
    assert final == {1: ("a", 1), 2: ("B", 3), 3: ("c", 4)}


def test_upsert_idempotent_under_replay(spark):
    """At-least-once safety: applying the same update batch twice
    yields the same state as applying it once."""
    target = _state(spark, [(1, "a", 1), (2, "b", 1)])
    updates = _state(spark, [(2, "B", 5), (3, "c", 5)])
    once = merge_upsert(target, updates, "k", "ver")
    twice = merge_upsert(once, updates, "k", "ver")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_scd2_replay_is_idempotent_and_stale_updates_ignored(spark):
    """Review regression: re-applying the same update batch must be a
    no-op (no zero-length history rows), and a LATE update older than
    the current row must not close it backwards."""
    from aoseventstreamer_spark.operators.merge import merge_scd2

    target = spark.createDataFrame(
        [(1, "a", 20, None, True), (1, "old", 10, 20, False)],
        "k long, v string, valid_from long, valid_to long, is_current boolean",
    )
    updates = spark.createDataFrame([(1, "a2", 20)], "k long, v string, ver long")
    # same version as current -> no-op
    out = merge_scd2(target, updates, keys="k", order_by="ver")
    assert sorted((r.v, r.valid_from, r.is_current) for r in out.collect()) == [
        ("a", 20, True), ("old", 10, False)
    ]
    # stale update (ver 15 < current valid_from 20) -> ignored
    stale = spark.createDataFrame([(1, "stale", 15)], "k long, v string, ver long")
    out2 = merge_scd2(target, stale, keys="k", order_by="ver")
    cur = [r for r in out2.collect() if r.is_current]
    assert [(r.v, r.valid_from) for r in cur] == [("a", 20)]
    # genuinely newer update -> closes current and installs new
    newer = spark.createDataFrame([(1, "b", 30)], "k long, v string, ver long")
    out3 = merge_scd2(target, newer, keys="k", order_by="ver")
    rows = {(r.v, r.valid_from, r.valid_to, r.is_current) for r in out3.collect()}
    assert ("b", 30, None, True) in rows
    assert ("a", 20, 30, False) in rows


def test_engine_fresh_log_reads_empty(spark, tmp_path):
    from aoseventstreamer_spark.engine import EventStreamerEngine

    eng = EventStreamerEngine(spark, str(tmp_path / "fresh"), secret="t")
    assert eng.event_log().count() == 0
    assert eng.query_events(["p1"], True).count() == 0


def test_snapshot_diff_classifies_all_three_statuses(spark):
    from aoseventstreamer_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x"), (3, "c", "x"), (4, "d", "x")],
        "id long, text string, meta string",
    )
    new = spark.createDataFrame(
        [(2, "b", "x"), (3, "c-EDITED", "x"), (4, "d", "y"), (5, "e", "x")],
        "id long, text string, meta string",
    )
    got = {r.id: r.status for r in snapshot_diff(old, new, "id", ["text", "meta"]).collect()}
    # 1 removed; 2 unchanged (absent); 3 text-changed; 4 meta-changed; 5 added
    assert got == {1: "removed", 3: "changed", 4: "changed", 5: "added"}


def test_snapshot_diff_null_vs_empty_are_distinct(spark):
    from aoseventstreamer_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, None)], "id long, text string")
    new = spark.createDataFrame([(1, "")], "id long, text string")
    got = snapshot_diff(old, new, "id", ["text"]).collect()
    assert [(r.id, r.status) for r in got] == [(1, "changed")]


def test_incremental_admit_min_id_wins_and_corpus_blocks(spark):
    from aoseventstreamer_spark.operators.merge import incremental_admit

    corpus = spark.createDataFrame(
        [(100, "already ingested")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (1, "brand new"),
            (7, "brand new"),        # within-batch dup of 1 -> dropped
            (3, "already ingested"),  # corpus dup -> dropped
            (5, "also new"),
        ],
        "doc_id long, text string",
    )
    got = sorted(r.doc_id for r in incremental_admit(corpus, batch).collect())
    assert got == [1, 5]
