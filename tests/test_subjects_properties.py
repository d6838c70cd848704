"""Property-based tests (hypothesis) for the subject grammar: build →
parse roundtrips, and the exact-vs-subtree matching laws, over random
dot-free ids (NATS tokens may not contain '.')."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from aoseventstreamer_spark.functions import subjects as S

# ids: nonempty, dot-free (NATS token constraint); '_' alone is the
# grammar's own filler token, so exclude the bare "_" id
_id = st.text(
    alphabet=string.ascii_letters + string.digits + "-_",
    min_size=1,
    max_size=24,
).filter(lambda s: s != "_")


def _parse_py(subject: str):
    """Reference Python parse (mirror of parse_subject_col)."""
    assert subject.endswith(S.PUBLISH_TERMINATOR)
    toks = subject[: -len(S.PUBLISH_TERMINATOR)].split(S.SEP)
    out = [None] * 5
    for i, v in enumerate(toks[1:6]):
        out[i] = v
    return tuple(out)


@given(p=_id)
@settings(max_examples=200, deadline=None)
def test_project_roundtrip(p):
    subj = S.project_subject(p)
    assert _parse_py(subj) == (p, None, None, None, None)
    assert subj == S.project_query(p, False)
    assert S.project_query(p, True) == S.base_subject([p], False) + ".>"


@given(p=_id, c=_id)
@settings(max_examples=200, deadline=None)
def test_collection_roundtrip(p, c):
    subj = S.collection_subject(p, c)
    assert _parse_py(subj) == (p, c, None, None, None)


@given(p=_id, c=_id, so=_id, o=_id)
@settings(max_examples=200, deadline=None)
def test_object_roundtrip(p, c, so, o):
    subj = S.object_subject(p, c, so, o)
    assert _parse_py(subj) == (p, c, "OBJECT", so, o)
    g = S.object_group_subject(p, c, so, o)
    assert _parse_py(g) == (p, c, "OBJECTGROUP", so, o)


@given(p=_id, c=_id, so=_id, o=_id)
@settings(max_examples=200, deadline=None)
def test_subtree_covers_descendants_exact_does_not(p, c, so, o):
    base = S.base_subject([p], False)
    project_subj = S.project_subject(p)
    descendants = [
        S.collection_subject(p, c),
        S.object_subject(p, c, so, o),
        S.object_group_subject(p, c, so, o),
    ]
    # subtree `<base>.>` ≡ startswith(base + '.'): node + all descendants
    assert project_subj.startswith(base + ".")
    for d in descendants:
        assert d.startswith(base + ".")
    # exact `<base>._` matches only the node's own publish subject
    exact = S.project_query(p, False)
    assert project_subj == exact
    for d in descendants:
        assert d != exact


@given(p1=_id, p2=_id)
@settings(max_examples=200, deadline=None)
def test_distinct_projects_never_cross_match(p1, p2):
    if p1 == p2 or p1.startswith(p2) or p2.startswith(p1):
        return  # prefix-related ids handled by the token boundary below
    base1 = S.base_subject([p1], False)
    assert not S.project_subject(p2).startswith(base1 + ".")


@given(p=_id, extra=_id)
@settings(max_examples=200, deadline=None)
def test_token_boundary_prevents_prefix_collision(p, extra):
    """'p' vs 'p<extra>': the dot token boundary must keep project
    'p123' out of project 'p1's subtree — the reason the grammar uses
    dot-separated tokens at all."""
    longer = p + extra
    base = S.base_subject([p], False)
    assert not S.project_subject(longer).startswith(base + ".")


def test_parse_subject_col_matches_python(spark):
    cases = [
        S.project_subject("p1"),
        S.collection_subject("p1", "c2"),
        S.object_subject("p1", "c2", "s3", "o4"),
        S.object_group_subject("p1", "c2", "sg5", "og6"),
    ]
    df = spark.createDataFrame([(s,) for s in cases], "subject string")
    got = df.select(S.parse_subject_col("subject").alias("p")).collect()
    for subj, row in zip(cases, got):
        parsed = row.p
        assert (
            parsed.project_id, parsed.collection_id, parsed.kind,
            parsed.shared_id, parsed.leaf_id,
        ) == _parse_py(subj)


def test_parse_roundtrips_routed_log(spark):
    """route_emits' component columns must equal re-parsing its own
    subjects (the builder and parser agree end-to-end)."""
    from aoseventstreamer_spark import schemas
    from aoseventstreamer_spark.operators.routing import route_emits

    raw = spark.createDataFrame(
        [
            {
                "emit_id": 1, "token": "t",
                "event_resource": schemas.RESOURCE_OBJECT,
                "resource_id": "o9", "event_type": 6,
                "relations": [
                    {"project": "p", "collection": "c", "shared_object": "so",
                     "object_groups": [{"shared_object_group_id": "sg"}]}
                ],
            }
        ],
        schemas.RAW_EMITS_SCHEMA,
    )
    routed = route_emits(raw, secret="t")
    reparsed = routed.select(
        "project_id", "collection_id", "kind", "shared_id", "leaf_id",
        S.parse_subject_col("subject").alias("p"),
    )
    for r in reparsed.collect():
        assert (r.project_id, r.collection_id, r.kind, r.shared_id, r.leaf_id) == (
            r.p.project_id, r.p.collection_id, r.p.kind, r.p.shared_id, r.p.leaf_id,
        )
