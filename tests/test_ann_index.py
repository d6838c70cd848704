"""Persisted ANN index (operators/ann_index.py, VERDICT r9 item 3):
build-once LSH band table as a tablelog table, version-pinned to the
corpus snapshot; queries from the prebuilt index must be bit-identical
to the from-scratch portable path, and a stale pin must refuse."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aoseventstreamer_spark.operators import ann_index as AI
from aoseventstreamer_spark.operators.similarity import portable_lsh_pairs
from aoseventstreamer_spark.tablelog import TableLog

DIM = 8


def _vecs(spark, n, offset=0):
    rows = [
        (
            offset + i,
            [((offset + i) * 31 + d * 7) % 13 - 6.0 for d in range(DIM)],
        )
        for i in range(n)
    ]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    return spark.createDataFrame(rows, schema)


@pytest.fixture()
def corpus(spark, tmp_path):
    log = TableLog(spark, str(tmp_path / "corpus"))
    log.append(_vecs(spark, 40))
    return log


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_persisted_equals_from_scratch(spark, tmp_path, corpus):
    v = corpus.latest_version()
    snap = corpus.read(version=v)
    idx = str(tmp_path / "idx")
    AI.build_lsh_index(
        spark, snap, idx, corpus_ident="c", corpus_version=v, dim=DIM
    )
    queries = snap.filter(F.col("vec_id") < 5)
    got = AI.query_lsh_index(
        spark, idx, queries, corpus_ident="c", corpus_version=v, dim=DIM
    )
    want = portable_lsh_pairs(snap, queries, dim=DIM)
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) > 0  # the fixture actually collides


def test_stale_pin_refuses(spark, tmp_path, corpus):
    v = corpus.latest_version()
    idx = str(tmp_path / "idx")
    AI.build_lsh_index(
        spark,
        corpus.read(version=v),
        idx,
        corpus_ident="c",
        corpus_version=v,
        dim=DIM,
    )
    corpus.append(_vecs(spark, 10, offset=1000))  # corpus moves to N+1
    v2 = corpus.latest_version()
    assert v2 == v + 1
    with pytest.raises(AI.StaleIndexError, match="pinned to corpus"):
        AI.query_lsh_index(
            spark,
            idx,
            corpus.read().filter(F.col("vec_id") < 5),
            corpus_ident="c",
            corpus_version=v2,
            dim=DIM,
        )
    # the pinned snapshot itself is still answerable
    AI.query_lsh_index(
        spark,
        idx,
        corpus.read(version=v).filter(F.col("vec_id") < 5),
        corpus_ident="c",
        corpus_version=v,
        dim=DIM,
    ).collect()


def test_refresh_rebuilds_and_noop(spark, tmp_path, corpus):
    v = corpus.latest_version()
    idx = str(tmp_path / "idx")
    assert AI.build_or_refresh_lsh_index(
        spark,
        corpus.read(version=v),
        idx,
        corpus_ident="c",
        corpus_version=v,
        dim=DIM,
    )
    # same version: no-op
    assert not AI.build_or_refresh_lsh_index(
        spark,
        corpus.read(version=v),
        idx,
        corpus_ident="c",
        corpus_version=v,
        dim=DIM,
    )
    corpus.append(_vecs(spark, 10, offset=1000))
    v2 = corpus.latest_version()
    snap2 = corpus.read(version=v2)
    assert AI.build_or_refresh_lsh_index(
        spark, snap2, idx, corpus_ident="c", corpus_version=v2, dim=DIM
    )
    queries = snap2.filter(F.col("vec_id") < 5)
    got = AI.query_lsh_index(
        spark, idx, queries, corpus_ident="c", corpus_version=v2, dim=DIM
    )
    want = portable_lsh_pairs(snap2, queries, dim=DIM)
    assert _rows(got) == _rows(want)


def test_ivf_persisted_equals_from_scratch(spark, tmp_path, corpus):
    from aoseventstreamer_spark.operators.similarity import (
        portable_ivf_pairs,
    )

    v = corpus.latest_version()
    snap = corpus.read(version=v)
    idx = str(tmp_path / "ivf")
    AI.build_ivf_index(
        spark, snap, idx, corpus_ident="c", corpus_version=v,
        n_clusters=4, dim=DIM,
    )
    queries = snap.filter(F.col("vec_id") < 5)
    got = AI.query_ivf_index(
        spark, idx, queries, corpus_ident="c", corpus_version=v,
        n_clusters=4, dim=DIM,
    )
    want = portable_ivf_pairs(snap, queries, n_clusters=4, dim=DIM)
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) > 0


def test_ivf_stale_pin_refuses(spark, tmp_path, corpus):
    v = corpus.latest_version()
    idx = str(tmp_path / "ivf")
    AI.build_ivf_index(
        spark, corpus.read(version=v), idx, corpus_ident="c",
        corpus_version=v, n_clusters=4, dim=DIM,
    )
    corpus.append(_vecs(spark, 10, offset=1000))
    with pytest.raises(AI.StaleIndexError, match="pinned to corpus"):
        AI.query_ivf_index(
            spark, idx,
            corpus.read().filter(F.col("vec_id") < 5),
            corpus_ident="c",
            corpus_version=corpus.latest_version(),
            n_clusters=4, dim=DIM,
        )


def test_pq_persisted_equals_from_scratch(spark, tmp_path, corpus):
    from aoseventstreamer_spark.operators.similarity import (
        portable_pq_topk,
    )

    v = corpus.latest_version()
    snap = corpus.read(version=v)
    idx = str(tmp_path / "pq")
    AI.build_pq_index(
        spark, snap, idx, corpus_ident="c", corpus_version=v,
        m_subspaces=2, n_clusters=4, dim=DIM,
    )
    queries = snap.filter(F.col("vec_id") < 5)
    got = AI.query_pq_index(
        spark, idx, queries, corpus_ident="c", corpus_version=v,
        m_subspaces=2, n_clusters=4, k=3, dim=DIM,
    )
    want = portable_pq_topk(
        snap, queries, m_subspaces=2, n_clusters=4, k=3, dim=DIM
    )
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) > 0


def test_pq_stale_pin_refuses(spark, tmp_path, corpus):
    v = corpus.latest_version()
    idx = str(tmp_path / "pq")
    AI.build_pq_index(
        spark, corpus.read(version=v), idx, corpus_ident="c",
        corpus_version=v, m_subspaces=2, n_clusters=4, dim=DIM,
    )
    corpus.append(_vecs(spark, 10, offset=1000))
    with pytest.raises(AI.StaleIndexError, match="pinned to corpus"):
        AI.query_pq_index(
            spark, idx,
            corpus.read().filter(F.col("vec_id") < 5),
            corpus_ident="c",
            corpus_version=corpus.latest_version(),
            m_subspaces=2, n_clusters=4, dim=DIM,
        )


def test_incremental_refresh_appends(spark, tmp_path, corpus):
    """Append-only delta: incremental refresh must produce query
    results identical to a from-scratch build at the new version."""
    v1 = corpus.latest_version()
    idx = str(tmp_path / "idx")
    AI.build_lsh_index(
        spark, corpus.read(version=v1), idx, corpus_ident="c",
        corpus_version=v1, dim=DIM,
    )
    corpus.append(_vecs(spark, 15, offset=1000))
    v2 = corpus.latest_version()
    mode = AI.refresh_lsh_index_incremental(
        spark, corpus, idx, corpus_ident="c", dim=DIM
    )
    assert mode == "incremental"
    snap2 = corpus.read(version=v2)
    queries = snap2.filter(F.col("vec_id") < 5)
    got = AI.query_lsh_index(
        spark, idx, queries, corpus_ident="c", corpus_version=v2, dim=DIM
    )
    want = portable_lsh_pairs(snap2, queries, dim=DIM)
    assert _rows(got) == _rows(want)
    # new vectors are actually visible through the index
    assert any(r[1] >= 1000 for r in _rows(got))


def test_incremental_refresh_handles_deletes_and_noop(spark, tmp_path, corpus):
    v1 = corpus.latest_version()
    idx = str(tmp_path / "idx")
    AI.build_lsh_index(
        spark, corpus.read(version=v1), idx, corpus_ident="c",
        corpus_version=v1, dim=DIM,
    )
    corpus.delete_where([("vec_id", ">=", 30)])
    corpus.append(_vecs(spark, 5, offset=2000))
    v2 = corpus.latest_version()
    assert (
        AI.refresh_lsh_index_incremental(
            spark, corpus, idx, corpus_ident="c", dim=DIM
        )
        == "incremental"
    )
    snap2 = corpus.read(version=v2)
    queries = snap2.filter(F.col("vec_id") < 5)
    got = AI.query_lsh_index(
        spark, idx, queries, corpus_ident="c", corpus_version=v2, dim=DIM
    )
    want = portable_lsh_pairs(snap2, queries, dim=DIM)
    assert _rows(got) == _rows(want)
    # deleted ids never surface as candidates
    assert all(not (30 <= r[1] < 1000) for r in _rows(got))
    # already-pinned: refresh is a no-op
    assert (
        AI.refresh_lsh_index_incremental(
            spark, corpus, idx, corpus_ident="c", dim=DIM
        )
        == "noop"
    )


def test_incremental_refresh_falls_back_to_full(spark, tmp_path, corpus):
    """No index yet → full build; expired CDF window → full build."""
    idx = str(tmp_path / "idx")
    assert (
        AI.refresh_lsh_index_incremental(
            spark, corpus, idx, corpus_ident="c", dim=DIM
        )
        == "full"
    )
    v = corpus.latest_version()
    queries = corpus.read(version=v).filter(F.col("vec_id") < 5)
    got = AI.query_lsh_index(
        spark, idx, queries, corpus_ident="c", corpus_version=v, dim=DIM
    )
    assert len(_rows(got)) > 0


def _run_maintenance(spark, corpus, idx, ck):
    q = AI.attach_lsh_index_maintenance(
        spark,
        corpus.path,
        idx,
        ck,
        corpus_ident="c",
        dim=DIM,
        trigger={"availableNow": True},
    )
    q.awaitTermination(300)


def test_streaming_maintenance_follows_corpus(spark, tmp_path, corpus):
    """The CDF-driven maintenance stream must bring the index to the
    corpus head from nothing, absorb append+delete batches on rerun,
    and leave the band multiset identical to a from-scratch build."""
    idx = str(tmp_path / "idx")
    ck = str(tmp_path / "ck")
    _run_maintenance(spark, corpus, idx, ck)
    v1 = corpus.latest_version()
    queries = corpus.read(version=v1).filter(F.col("vec_id") < 5)
    got = AI.query_lsh_index(
        spark, idx, queries, corpus_ident="c", corpus_version=v1, dim=DIM
    )
    assert _rows(got) == _rows(
        portable_lsh_pairs(corpus.read(version=v1), queries, dim=DIM)
    )

    corpus.append(_vecs(spark, 12, offset=1000))
    corpus.delete_where([("vec_id", ">=", 35), ("vec_id", "<", 40)])
    _run_maintenance(spark, corpus, idx, ck)
    v2 = corpus.latest_version()
    snap2 = corpus.read(version=v2)
    queries2 = snap2.filter(F.col("vec_id") < 5)
    got2 = AI.query_lsh_index(
        spark, idx, queries2, corpus_ident="c", corpus_version=v2, dim=DIM
    )
    assert _rows(got2) == _rows(portable_lsh_pairs(snap2, queries2, dim=DIM))

    # no new commits: rerun must not duplicate bands
    bands_before = TableLog(spark, idx).read().count()
    _run_maintenance(spark, corpus, idx, ck)
    assert TableLog(spark, idx).read().count() == bands_before
    assert (
        AI.pinned_corpus_version(spark, idx, corpus_ident="c", dim=DIM)
        == v2
    )


def test_param_mismatch_reads_as_unpinned(spark, tmp_path, corpus):
    """An index built with different LSH parameters must not answer:
    the parameter set is part of the pin's app id."""
    v = corpus.latest_version()
    idx = str(tmp_path / "idx")
    AI.build_lsh_index(
        spark,
        corpus.read(version=v),
        idx,
        corpus_ident="c",
        corpus_version=v,
        dim=DIM,
        n_tables=2,
    )
    assert (
        AI.pinned_corpus_version(
            spark, idx, corpus_ident="c", dim=DIM, n_tables=4
        )
        == -1
    )


def test_maintenance_fold_replay_is_idempotent(spark, tmp_path, corpus):
    """The stamp-guarded fold: applying the SAME CDF batch twice must
    not duplicate bands, and a replay whose first attempt crashed
    between the band append and the pin commit must re-advance ONLY
    the pin."""
    idx = str(tmp_path / "idx")
    v1 = corpus.latest_version()
    AI.build_lsh_index(
        spark, corpus.read(version=v1), idx, corpus_ident="c",
        corpus_version=v1, dim=DIM,
    )
    corpus.append(_vecs(spark, 8, offset=1000))
    v2 = corpus.latest_version()
    batch = corpus.read_changes(v1, v2)
    AI.fold_cdf_batch_into_lsh_index(
        spark, corpus.path, idx, batch, 1, corpus_ident="c", dim=DIM
    )
    bands = TableLog(spark, idx).read().count()
    pin = AI.pinned_corpus_version(spark, idx, corpus_ident="c", dim=DIM)
    assert pin == v2
    # full replay: nothing changes
    AI.fold_cdf_batch_into_lsh_index(
        spark, corpus.path, idx, batch, 1, corpus_ident="c", dim=DIM
    )
    assert TableLog(spark, idx).read().count() == bands
    assert (
        AI.pinned_corpus_version(spark, idx, corpus_ident="c", dim=DIM)
        == v2
    )
    # crash-between-commits: bands + stamp landed at a NEWER batch but
    # the pin lags (simulated by folding the next delta with the pin
    # commit suppressed via a pre-stamped append)
    corpus.append(_vecs(spark, 4, offset=2000))
    v3 = corpus.latest_version()
    batch2 = corpus.read_changes(v2, v3)
    it = TableLog(spark, idx)
    from aoseventstreamer_spark.operators.similarity import (
        portable_band_frame,
    )
    from pyspark.sql import functions as SF

    band2 = portable_band_frame(
        batch2.filter(SF.col("_change_type") == "insert").select(
            "vec_id", "embedding"
        ),
        "cand", 4, 4, DIM, "vec_id", "embedding",
    ).select(
        "cand_id", "cand_q", "cand_normsq",
        SF.col("tb.t").alias("t"), SF.col("tb.bucket").alias("bucket"),
    )
    app = AI._app_id("c", 4, 4, DIM)
    # the maint stamp is the batch's max corpus version (v3), NOT the
    # stream batch_id — batch ids restart per checkpoint (r11 fix)
    it.append(band2, txn_app=app + "|maint", txn_version=v3)  # no pin
    assert (
        AI.pinned_corpus_version(spark, idx, corpus_ident="c", dim=DIM)
        == v2  # pin lags: the simulated crash window
    )
    bands2 = TableLog(spark, idx).read().count()
    AI.fold_cdf_batch_into_lsh_index(
        spark, corpus.path, idx, batch2, 2, corpus_ident="c", dim=DIM
    )
    # recovery: pin advanced, bands untouched
    assert (
        AI.pinned_corpus_version(spark, idx, corpus_ident="c", dim=DIM)
        == v3
    )
    assert TableLog(spark, idx).read().count() == bands2
    # and the recovered index answers exactly like a fresh build
    snap3 = corpus.read(version=v3)
    queries = snap3.filter(F.col("vec_id") < 5)
    got = AI.query_lsh_index(
        spark, idx, queries, corpus_ident="c", corpus_version=v3, dim=DIM
    )
    assert _rows(got) == _rows(portable_lsh_pairs(snap3, queries, dim=DIM))


def test_reattach_with_fresh_checkpoint_folds_new_changes(
    spark, tmp_path, corpus
):
    """r11 fresh-eyes regression: maintenance stamped the band append
    with the stream's ``batch_id``, which restarts at 0 for every new
    checkpoint directory — a RE-ATTACHED stream (new checkpoint, old
    index) saw the stale stamp, skipped folding the genuinely new
    changes, and still advanced the pin: an index claiming a corpus
    version it does not contain. The stamp is now the batch's max
    corpus ``_commit_version`` (monotone across streams), so the
    re-attach must fold and the final bands must equal a from-scratch
    build."""
    idx = str(tmp_path / "idx")
    ck1 = str(tmp_path / "ck1")
    ck2 = str(tmp_path / "ck2")
    _run_maintenance(spark, corpus, idx, ck1)

    corpus.append(_vecs(spark, 6, offset=3000))
    _run_maintenance(spark, corpus, idx, ck1)

    # re-attach with a FRESH checkpoint after more appends
    corpus.append(_vecs(spark, 6, offset=4000))
    q = AI.attach_lsh_index_maintenance(
        spark, corpus.path, idx, ck2, corpus_ident="c", dim=DIM,
        trigger={"availableNow": True},
    )
    q.awaitTermination(300)

    head = corpus.latest_version()
    assert (
        AI.pinned_corpus_version(spark, idx, corpus_ident="c", dim=DIM)
        == head
    )
    snap = corpus.read(version=head)
    queries = snap.filter(F.col("vec_id") < 5)
    got = AI.query_lsh_index(
        spark, idx, queries, corpus_ident="c", corpus_version=head,
        dim=DIM,
    )
    assert _rows(got) == _rows(portable_lsh_pairs(snap, queries, dim=DIM))


def test_fold_skips_rows_already_covered_by_pin(spark, tmp_path, corpus):
    """r11 fresh-eyes: a resumed stale checkpoint can deliver a batch
    whose version range OVERLAPS what the batch refresher already
    folded (its offsets predate the refresh). Rows at or below the pin
    must be filtered out of the fold, or their bands duplicate."""
    idx = str(tmp_path / "idx")
    v1 = corpus.latest_version()
    AI.build_lsh_index(
        spark, corpus.read(version=v1), idx, corpus_ident="c",
        corpus_version=v1, dim=DIM,
    )
    corpus.append(_vecs(spark, 5, offset=5000))
    v2 = corpus.latest_version()
    # batch refresher brings the index to v2
    assert (
        AI.refresh_lsh_index_incremental(
            spark, corpus, idx, corpus_ident="c", dim=DIM
        )
        == "incremental"
    )
    corpus.append(_vecs(spark, 5, offset=6000))
    v3 = corpus.latest_version()
    # a stale stream delivers the WHOLE (v1, v3] range in one batch
    stale_batch = corpus.read_changes(v1, v3)
    AI.fold_cdf_batch_into_lsh_index(
        spark, corpus.path, idx, stale_batch, 0, corpus_ident="c",
        dim=DIM,
    )
    snap = corpus.read(version=v3)
    queries = snap.filter(F.col("vec_id") < 5)
    got = AI.query_lsh_index(
        spark, idx, queries, corpus_ident="c", corpus_version=v3,
        dim=DIM,
    )
    assert _rows(got) == _rows(portable_lsh_pairs(snap, queries, dim=DIM))
    # band multiset == from-scratch build (no duplicates)
    scratch = str(tmp_path / "scratch")
    AI.build_lsh_index(
        spark, snap, scratch, corpus_ident="c", corpus_version=v3,
        dim=DIM,
    )
    assert (
        TableLog(spark, idx).read().count()
        == TableLog(spark, scratch).read().count()
    )
