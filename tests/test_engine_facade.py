"""End-to-end facade test: the reference's full e2e flow
(/root/reference/src/e2e/tests.rs:108-277) through EventStreamerEngine —
emit → create group → chunked receive → batch query — plus the authz
deny path the mock backends only stub."""

from __future__ import annotations

import pytest

from aoseventstreamer_spark import schemas
from aoseventstreamer_spark.engine import AuthorizationError, EventStreamerEngine


def _emit(i: int, project: str, resource_id: str, token: str = "s3cr3t"):
    return {
        "emit_id": i,
        "token": token,
        "event_resource": schemas.RESOURCE_PROJECT,
        "resource_id": resource_id,
        "event_type": schemas.EVENT_TYPE_ALL,
        "relations": [
            {"project": project, "collection": None, "shared_object": None,
             "object_groups": []}
        ],
    }


@pytest.fixture()
def engine(spark, tmp_path):
    grants = spark.createDataFrame(
        [("good-token", schemas.RESOURCE_PROJECT, "p1", 1)], schemas.GRANTS_SCHEMA
    )
    return EventStreamerEngine(
        spark, str(tmp_path), secret="s3cr3t", grants=grants, partition_log=True
    )


def test_full_e2e_flow(engine, spark):
    # emit BEFORE the group exists (replay-from-start, tests.rs:154-170)
    engine.emit_events(
        spark.createDataFrame(
            [_emit(1, "p1", "p1"), _emit(2, "p2", "p2"),
             _emit(3, "p1", "p1", token="bad")],  # rejected by token filter
            schemas.RAW_EMITS_SCHEMA,
        )
    )
    gid = engine.create_event_streaming_group(
        "good-token", schemas.RESOURCE_PROJECT, "p1", include_subresources=True
    )
    assert engine.get_stream_group(gid).filter_subject == "UPDATES.STORAGE._.p1.>"

    chunks: dict[int, list[str]] = {}
    q = engine.read_stream_group_messages(
        gid,
        lambda cid, df: chunks.__setitem__(cid, [r.subject for r in df.collect()]),
        catch_up_only=True,
    )
    q.awaitTermination(120)
    delivered = [s for c in chunks.values() for s in c]
    assert delivered == ["UPDATES.STORAGE._.p1._"]  # p2 filtered, bad token dropped


def test_authz_denied(engine):
    with pytest.raises(AuthorizationError):
        engine.create_event_streaming_group(
            "wrong-token", schemas.RESOURCE_PROJECT, "p1", include_subresources=True
        )


def test_batch_query_partition_prunes(engine, spark):
    from aoseventstreamer_spark.plans.inspect import formatted_plan

    engine.emit_events(
        spark.createDataFrame(
            [_emit(i, f"p{i % 3}", f"p{i % 3}") for i in range(9)],
            schemas.RAW_EMITS_SCHEMA,
        )
    )
    df = engine.query_events(["p1"], include_subresources=True)
    assert df.count() == 3
    plan = formatted_plan(df)
    scan = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "project_id" in scan  # prunes whole project partitions
