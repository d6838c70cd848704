"""Golden tests for the subject grammar — exact strings from the
reference's unit tests (/root/reference/src/utils/utils.rs:181-298).
Both the Python builders and the Catalyst Column builders must
reproduce them byte-for-byte."""

from __future__ import annotations

from pyspark.sql import functions as F

from aoseventstreamer_spark.functions import subjects as S

P, C, SO, O = "project_id", "collection_id", "shared_object_id", "object_id"
SG, OG = "shared_object_group_id", "object_group_id"

GOLDEN_SUBJECTS = {
    "project": ("UPDATES.STORAGE._.project_id._", S.project_subject(P)),
    "collection": (
        "UPDATES.STORAGE._.project_id._.collection_id._",
        S.collection_subject(P, C),
    ),
    "object": (
        "UPDATES.STORAGE._.project_id._.collection_id._.OBJECT._.shared_object_id._.object_id._",
        S.object_subject(P, C, SO, O),
    ),
    "object_group": (
        "UPDATES.STORAGE._.project_id._.collection_id._.OBJECTGROUP._."
        "shared_object_group_id._.object_group_id._",
        S.object_group_subject(P, C, SG, OG),
    ),
}


def test_publish_subjects_golden():
    for name, (expected, actual) in GOLDEN_SUBJECTS.items():
        assert actual == expected, name


def test_query_subjects_golden():
    # utils.rs:241-263 — exact-level (terminal ._) vs subtree (terminal .>)
    assert S.project_query(P, False) == "UPDATES.STORAGE._.project_id._"
    assert S.project_query(P, True) == "UPDATES.STORAGE._.project_id.>"
    assert S.collection_query(P, C, False) == "UPDATES.STORAGE._.project_id._.collection_id._"
    assert S.collection_query(P, C, True) == "UPDATES.STORAGE._.project_id._.collection_id.>"
    assert (
        S.object_query(P, C, SO, O, False)
        == "UPDATES.STORAGE._.project_id._.collection_id._.OBJECT._."
        "shared_object_id._.object_id._"
    )
    assert (
        S.object_group_query(P, C, SG, OG, True)
        == "UPDATES.STORAGE._.project_id._.collection_id._.OBJECTGROUP._."
        "shared_object_group_id._.object_group_id.>"
    )


def test_exact_query_equals_publish_subject():
    # The exact-level query matches only the node's own publish subject.
    assert S.project_query(P, False) == S.project_subject(P)
    assert S.collection_query(P, C, False) == S.collection_subject(P, C)


def test_column_builders_match_python(spark):
    df = spark.createDataFrame([(P, C, SO, O, SG, OG)], "p string, c string, so string, o string, sg string, og string")
    row = df.select(
        S.project_subject_col("p").alias("ps"),
        S.collection_subject_col("p", "c").alias("cs"),
        S.object_subject_col("p", "c", "so", "o").alias("os"),
        S.object_group_subject_col("p", "c", "sg", "og").alias("ogs"),
    ).first()
    assert row["ps"] == S.project_subject(P)
    assert row["cs"] == S.collection_subject(P, C)
    assert row["os"] == S.object_subject(P, C, SO, O)
    assert row["ogs"] == S.object_group_subject(P, C, SG, OG)


def test_predicates_semantics(spark):
    subs = [
        S.project_subject("p1"),
        S.collection_subject("p1", "c1"),
        S.object_subject("p1", "c1", "s1", "o1"),
        S.project_subject("p2"),
        S.collection_subject("p2", "c9"),
    ]
    df = spark.createDataFrame([(s,) for s in subs], "subject string")
    base_p1 = S.base_subject(["p1"], False)

    exact = df.filter(S.exact_level_predicate("subject", base_p1))
    assert [r.subject for r in exact.collect()] == [S.project_subject("p1")]

    subtree = set(
        r.subject for r in df.filter(S.subtree_predicate("subject", base_p1)).collect()
    )
    assert subtree == set(subs[:3])  # node itself + all descendants, p2 excluded
