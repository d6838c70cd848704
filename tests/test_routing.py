"""Routing-pipeline tests: fan-out counts and exact subjects per
resource type, mirroring the reference dispatch
(/root/reference/src/stream_handler/natsio.rs:78-129) and the FIXTURES.md
§1 recommendation (relations with 0/1/3 object groups, one bad-token row)."""

from __future__ import annotations

import pytest

from aoseventstreamer_spark import schemas
from aoseventstreamer_spark.functions import subjects as S
from aoseventstreamer_spark.operators.routing import filter_token, route_emits

SECRET = "s3cr3t"


def _emits(spark):
    def rel(project, collection=None, shared_object=None, n_groups=0):
        return {
            "project": project,
            "collection": collection,
            "shared_object": shared_object,
            "object_groups": [
                {"shared_object_group_id": f"sg{i}"} for i in range(n_groups)
            ],
        }

    rows = [
        # project event: 1 subject
        {"emit_id": 1, "token": SECRET, "event_resource": schemas.RESOURCE_PROJECT,
         "resource_id": "p1", "event_type": schemas.EVENT_TYPE_ALL,
         "relations": [rel("p1")]},
        # collection event: 1 subject
        {"emit_id": 2, "token": SECRET, "event_resource": schemas.RESOURCE_COLLECTION,
         "resource_id": "c1", "event_type": schemas.EVENT_TYPE_ALL,
         "relations": [rel("p1")]},
        # object event, 0 groups: 1 subject (its own)
        {"emit_id": 3, "token": SECRET, "event_resource": schemas.RESOURCE_OBJECT,
         "resource_id": "o1", "event_type": schemas.EVENT_TYPE_ALL,
         "relations": [rel("p1", "c1", "so1", n_groups=0)]},
        # object event, 3 groups: 4 subjects (3 group + own)
        {"emit_id": 4, "token": SECRET, "event_resource": schemas.RESOURCE_OBJECT,
         "resource_id": "o2", "event_type": schemas.EVENT_TYPE_ALL,
         "relations": [rel("p1", "c1", "so2", n_groups=3)]},
        # object-group event, 2 groups: 2 subjects
        {"emit_id": 5, "token": SECRET, "event_resource": schemas.RESOURCE_OBJECT_GROUP,
         "resource_id": "og1", "event_type": schemas.EVENT_TYPE_ALL,
         "relations": [rel("p1", "c1", n_groups=2)]},
        # two relations on one emit: fan-out per relation
        # (internal_event_server.rs:51-63)
        {"emit_id": 6, "token": SECRET, "event_resource": schemas.RESOURCE_PROJECT,
         "resource_id": "p2", "event_type": schemas.EVENT_TYPE_ALL,
         "relations": [rel("p2"), rel("p2")]},
        # bad token: rejected
        {"emit_id": 7, "token": "wrong", "event_resource": schemas.RESOURCE_PROJECT,
         "resource_id": "p3", "event_type": schemas.EVENT_TYPE_ALL,
         "relations": [rel("p3")]},
    ]
    return spark.createDataFrame(rows, schemas.RAW_EMITS_SCHEMA)


@pytest.fixture(scope="module")
def routed(spark):
    return route_emits(_emits(spark), secret=SECRET).cache()


def test_token_filter(spark):
    kept = filter_token(_emits(spark), SECRET).select("emit_id").collect()
    assert sorted(r.emit_id for r in kept) == [1, 2, 3, 4, 5, 6]


def test_fanout_counts(routed):
    counts = {r["seq"]: r["n"] for r in routed.groupBy("seq").count().withColumnRenamed("count", "n").collect()}
    assert counts == {1: 1, 2: 1, 3: 1, 4: 4, 5: 2, 6: 2}


def test_project_and_collection_subjects(routed):
    subs = {r.seq: r.subject for r in routed.filter("seq in (1,2)").collect()}
    assert subs[1] == S.project_subject("p1")
    assert subs[2] == S.collection_subject("p1", "c1")


def test_object_fanout_subjects(routed):
    subs = sorted(r.subject for r in routed.filter("seq = 4").collect())
    expected = sorted(
        [S.object_group_subject("p1", "c1", f"sg{i}", "o2") for i in range(3)]
        + [S.object_subject("p1", "c1", "so2", "o2")]
    )
    # note the id-reuse quirk: the OBJECT's resource_id ("o2") occupies
    # the group-id slot in the group subjects (natsio.rs:112)
    assert subs == expected


def test_object_group_subjects(routed):
    subs = sorted(r.subject for r in routed.filter("seq = 5").collect())
    assert subs == sorted(
        S.object_group_subject("p1", "c1", f"sg{i}", "og1") for i in range(2)
    )


def test_component_columns(routed):
    row = routed.filter("seq = 3").first()
    assert (row.project_id, row.collection_id, row.kind, row.shared_id, row.leaf_id) == (
        "p1", "c1", "OBJECT", "so1", "o1"
    )
    prow = routed.filter("seq = 1").first()
    assert prow.project_id == "p1" and prow.collection_id is None


def test_subtree_query_catches_descendants(routed):
    base = S.base_subject(["p1"], False)
    got = routed.filter(S.subtree_predicate("subject", base)).count()
    assert got == 9  # every p1-rooted subject: seqs 1-5 (1+1+1+4+2)


def test_strict_mode_raises_on_unknown_resource(spark):
    rows = [{"emit_id": 1, "token": "t", "event_resource": schemas.RESOURCE_ALL,
             "resource_id": "x", "event_type": 6,
             "relations": [{"project": "p", "collection": None,
                            "shared_object": None, "object_groups": []}]}]
    df = spark.createDataFrame(rows, schemas.RAW_EMITS_SCHEMA)
    # default: dropped silently
    assert route_emits(df, secret="t").count() == 0
    # strict: reproduces the reference's todo!() loud failure
    with pytest.raises(Exception, match="unsupported resource_type"):
        route_emits(df, secret="t", on_unknown="error").count()
