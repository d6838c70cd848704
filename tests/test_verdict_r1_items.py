"""Round-3 hardening items from the round-1 verdict:

- LSH pathological-bucket cap (operators/dedup.py): a mass-duplicated
  cluster must not go O(b^2); the truncation must be auditable.
- Declared dim= on the ANN APIs (operators/similarity.py): building
  the query must not submit a driver-side probe job.
- Shared-group chunk splitting (streaming/groups.py): one stream
  group, N consumers, one message set split exactly once across them
  (reference handler.rs:21-33).
"""

from __future__ import annotations

import pytest

from aoseventstreamer_spark import schemas
from aoseventstreamer_spark.operators import dedup, similarity
from aoseventstreamer_spark.operators.routing import route_emits, write_event_log
from aoseventstreamer_spark.streaming.groups import StreamGroupManager


# ---------------------------------------------------------------- LSH cap


def _dup_cluster_docs(spark, n_copies: int, n_unique: int):
    boiler = "the same boilerplate text repeated across many pages " * 3
    rows = [(i, boiler) for i in range(n_copies)]
    rows += [
        (10_000 + i, f"unique document number {i} with its own words {i * 7}")
        for i in range(n_unique)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_bucket_cap_bounds_pairs(spark):
    docs = _dup_cluster_docs(spark, n_copies=200, n_unique=20)
    capped = dedup.minhash_dedup_pairs(docs, max_bucket_size=10)
    n_pairs = capped.count()
    # every bucket keeps the same 10 lowest ids (identical docs agree on
    # all bands), so the cluster contributes at most C(10,2)=45 pairs
    assert 0 < n_pairs <= 45 + 20 * 19 // 2
    uncapped = dedup.minhash_dedup_pairs(docs)
    assert uncapped.count() >= 200 * 199 // 2  # the O(b^2) blowup the cap stops


def test_lsh_bucket_cap_is_audited(spark):
    docs = _dup_cluster_docs(spark, n_copies=50, n_unique=5)
    sigs = dedup.minhash_docs(docs)
    overflow = dedup.lsh_bucket_overflow(sigs, max_bucket_size=10).collect()
    # the 50-copy cluster overflows in every band
    assert len(overflow) >= 1
    for row in overflow:
        assert row.bucket_size > 10
        assert row.n_dropped == row.bucket_size - 10
    # and a cap large enough to change nothing reports nothing
    assert dedup.lsh_bucket_overflow(sigs, max_bucket_size=10_000).count() == 0


def test_lsh_cap_none_is_identity(spark):
    docs = _dup_cluster_docs(spark, n_copies=5, n_unique=10)
    a = dedup.minhash_dedup_pairs(docs).collect()
    b = dedup.minhash_dedup_pairs(docs, max_bucket_size=None).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------- dim=


def _embeddings(spark, n: int, dim: int):
    rows = [(i, [float((i * 31 + j * 7) % 13) - 6.0 for j in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_declared_dim_skips_probe_job(spark, monkeypatch):
    emb = _embeddings(spark, 60, 8)
    qry = _embeddings(spark, 3, 8)

    def _boom(df, vec_col):
        raise AssertionError("probe job submitted despite declared dim")

    monkeypatch.setattr(similarity, "_probe_dim", _boom)
    # plan construction must not probe; execution must still be correct
    out = similarity.lsh_ann_topk(emb, qry, k=2, dim=8)
    assert out.count() > 0
    pairs = similarity.cosine_near_dup_pairs(emb, threshold=0.99, dim=8)
    pairs.count()  # builds and runs without the probe


def test_declared_dim_matches_probed(spark):
    emb = _embeddings(spark, 40, 8)
    qry = _embeddings(spark, 2, 8)
    with_dim = similarity.lsh_ann_topk(emb, qry, k=3, dim=8).collect()
    probed = similarity.lsh_ann_topk(emb, qry, k=3).collect()
    assert sorted(map(tuple, with_dim)) == sorted(map(tuple, probed))


# ------------------------------------------------- shared-group splitting


def _emit_rows(start_id: int, project: str, n: int):
    return [
        {
            "emit_id": start_id + i,
            "token": "t",
            "event_resource": schemas.RESOURCE_COLLECTION,
            "resource_id": f"c{i}",
            "event_type": schemas.EVENT_TYPE_ALL,
            "relations": [
                {"project": project, "collection": None, "shared_object": None,
                 "object_groups": []}
            ],
        }
        for i in range(n)
    ]


def test_shared_group_splits_message_set_once(spark, tmp_path):
    log_dir = str(tmp_path / "events")
    raw = spark.createDataFrame(_emit_rows(0, "p1", 40), schemas.RAW_EMITS_SCHEMA)
    write_event_log(route_emits(raw, secret="t"), log_dir, partition_by=None)

    mgr = StreamGroupManager(spark, log_dir, str(tmp_path / "state"))
    group = mgr.create_stream_group(
        schemas.RESOURCE_PROJECT, "p1", include_subresources=True
    )

    seen: dict[int, list[tuple]] = {0: [], 1: []}

    def consumer(i: int):
        def deliver(chunk_id: int, df):
            seen[i].extend((r.subject, r.seq) for r in df.collect())

        return deliver

    q = mgr.read_available_shared(group.id, [consumer(0), consumer(1)])
    q.awaitTermination(120)

    all_seen = seen[0] + seen[1]
    # together: the full message set, exactly once
    assert len(all_seen) == 40
    assert len(set(all_seen)) == 40
    # split is real: both consumers got a share
    assert len(seen[0]) > 0 and len(seen[1]) > 0


def test_shared_group_redelivers_whole_chunk_on_failure(spark, tmp_path):
    log_dir = str(tmp_path / "events")
    raw = spark.createDataFrame(_emit_rows(0, "p1", 12), schemas.RAW_EMITS_SCHEMA)
    write_event_log(route_emits(raw, secret="t"), log_dir, partition_by=None)

    mgr = StreamGroupManager(spark, log_dir, str(tmp_path / "state"))
    group = mgr.create_stream_group(
        schemas.RESOURCE_PROJECT, "p1", include_subresources=True
    )

    ok: list[tuple] = []

    def good(chunk_id: int, df):
        ok.extend((r.subject, r.seq) for r in df.collect())

    def failing(chunk_id: int, df):
        df.count()
        raise RuntimeError("consumer crashed before ack")

    from pyspark.errors import StreamingQueryException

    q = mgr.read_available_shared(group.id, [good, failing])
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(120)

    # offset was never committed: a restart redelivers the chunk to all
    ok.clear()
    got: list[tuple] = []

    def second(chunk_id: int, df):
        got.extend((r.subject, r.seq) for r in df.collect())

    q2 = mgr.read_available_shared(group.id, [good, second])
    q2.awaitTermination(120)
    assert len(ok) + len(got) == 12
