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


def test_grammar_equivalence_property_over_legal_ids():
    """r8 review: the startswith-subtree / equality-exact rewrite must
    agree with NATS token-wildcard semantics for every id drawn from
    the legal (dot-free) alphabet — including ids that are prefixes of
    one another (p1 vs p10), the historical corner that startswith
    rewrites get wrong without the trailing separator."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aoseventstreamer_spark.functions import subjects as S

    ident = st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=127
        ),
        min_size=1,
        max_size=8,
    )

    def nats_matches(query: str, subject: str) -> bool:
        """Reference semantics: NATS token matching ('.' separated;
        '>' = >=1 trailing tokens)."""
        q = query.split(".")
        s = subject.split(".")
        if q and q[-1] == ">":
            return len(s) >= len(q) and s[: len(q) - 1] == q[:-1]
        return s == q

    @given(p1=ident, p2=ident, c1=ident, subtree=st.booleans())
    @settings(max_examples=200, deadline=None)
    def check(p1, p2, c1, subtree):
        query = S.query(S.base_subject([p1], False), subtree)
        for subject in (
            S.project_subject(p1),
            S.project_subject(p2),
            S.collection_subject(p1, c1),
            S.collection_subject(p2, c1),
            S.object_subject(p1, c1, "s", "o"),
        ):
            want = nats_matches(query, subject)
            if subtree:
                got = subject.startswith(
                    query[: -len(S.SUBTREE_TERMINATOR)] + "."
                )
            else:
                got = subject == query
            assert got == want, (query, subject, got, want)

    check()
