"""Online near-dup filtering (streaming/online_dedup.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aoseventstreamer_spark.streaming.online_dedup import OnlineDeduper

DOC_A = "the quick brown fox jumps over the lazy dog again and again today"
DOC_B = "spark plans shuffle exchanges broadcast joins and codegen stages"
DOC_C = "completely different content about distributed query processing"
# near-copy of A: one word changed
DOC_A2 = "the quick brown fox jumps over the lazy cat again and again today"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def dedup(spark, tmp_path):
    return OnlineDeduper(spark, str(tmp_path / "state"))


def test_cross_batch_near_dup_rejected(spark, dedup):
    b1 = dedup.process_batch(_docs(spark, [(1, DOC_A), (2, DOC_B)]), 0)
    assert {r.doc_id for r in b1.collect()} == {1, 2}
    b2 = dedup.process_batch(_docs(spark, [(3, DOC_A2), (4, DOC_C)]), 1)
    assert {r.doc_id for r in b2.collect()} == {4}  # near-copy of 1 rejected


def test_intra_batch_smallest_wins(spark, dedup):
    out = dedup.process_batch(
        _docs(spark, [(7, DOC_A), (5, DOC_A2), (9, DOC_B)]), 0
    )
    assert {r.doc_id for r in out.collect()} == {5, 9}  # 5 < 7 wins the A-cluster


def test_replay_is_idempotent(spark, dedup):
    dedup.process_batch(_docs(spark, [(1, DOC_A)]), 0)
    first = {r.doc_id for r in dedup.process_batch(_docs(spark, [(3, DOC_B)]), 1).collect()}
    # at-least-once: batch 1 replays — store must not have been poisoned
    # by its own earlier write (doc 3's bands overwrite, not duplicate),
    # and the batch admits the same set again
    replay = {r.doc_id for r in dedup.process_batch(_docs(spark, [(3, DOC_B)]), 1).collect()}
    assert first == replay == {3}
    # store holds exactly one copy of doc 3's bands
    store = spark.read.parquet(dedup.store)
    assert store.filter(F.col("doc_id") == 3).count() == dedup.bands


def test_streaming_run_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    dedup = OnlineDeduper(spark, str(tmp_path / "state2"))
    _docs(spark, [(1, DOC_A), (2, DOC_B)]).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = dedup.run(stream, ckpt, sink, trigger={"availableNow": True})
    q.awaitTermination(120)
    # second drop: a near-copy and a novel doc
    _docs(spark, [(3, DOC_A2), (4, DOC_C)]).write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = dedup.run(stream, ckpt, sink, trigger={"availableNow": True})
    q.awaitTermination(120)
    admitted = {r.doc_id for r in spark.read.parquet(sink).collect()}
    assert admitted == {1, 2, 4}


def test_validates_band_division(spark, tmp_path):
    with pytest.raises(ValueError, match="divide"):
        OnlineDeduper(spark, str(tmp_path / "x"), num_hashes=16, bands=5)


def test_online_curator_gates_then_dedups(spark, tmp_path):
    from aoseventstreamer_spark.streaming.online_dedup import OnlineCurator

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat again and again") for i in range(5)],
        ["doc_id", "text"],
    )
    cur = OnlineCurator(
        spark,
        str(tmp_path / "state"),
        steps=[
            ("min_words", {"n": 4}),
            ("perplexity", {"max_ppl": 1e6, "train": ref}),
        ],
        observe=True,
    )
    good = "the cat sat on the mat again and again today"
    b1 = spark.createDataFrame(
        [(1, good), (2, "too short"), (3, good + " extra tail")],
        ["doc_id", "text"],
    )
    a1 = {r.doc_id for r in cur.process_batch(b1, 0).collect()}
    # 2 gated out (min_words); 3 near-dups 1 within the batch -> 1 wins
    assert a1 == {1}
    assert cur.counts == {"arrived": 3, "gated": 2, "admitted": 1}

    # next batch: replaying the same content is rejected by the store.
    # Nothing is admitted, so AQE prunes the observed plan — counts
    # must still be right via the fallback path.
    b2 = spark.createDataFrame([(9, good)], ["doc_id", "text"])
    assert cur.process_batch(b2, 1).count() == 0
    assert cur.counts == {"arrived": 1, "gated": 1, "admitted": 0}
    cur.close()


def test_online_curator_refuses_corpus_wide_steps(spark, tmp_path):
    from aoseventstreamer_spark.streaming.online_dedup import OnlineCurator

    with pytest.raises(ValueError, match="not per-row-stateless"):
        OnlineCurator(spark, str(tmp_path / "s"), steps=[("exact_dedup", {})])
    with pytest.raises(ValueError, match="pre-trained reference"):
        OnlineCurator(
            spark, str(tmp_path / "s2"), steps=[("perplexity", {"max_ppl": 10.0})]
        )
