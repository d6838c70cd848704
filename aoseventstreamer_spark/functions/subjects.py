"""Subject (routing-key) grammar of the event log.

Re-implements, byte-for-byte, the subject/query-string builders of the
reference (`/root/reference/src/utils/utils.rs:16-147`): ids joined by
the separator ``._.`` under the common prefix ``UPDATES.STORAGE``, an
``OBJECT`` / ``OBJECTGROUP`` discriminator token inserted before the
3rd id (utils.rs:20-27), publish subjects terminated by ``._``
(utils.rs:44-47), and query subjects terminated by ``._`` (exact
level) or ``.>`` (whole subtree) (utils.rs:35-42).

Two parallel APIs:

- plain-Python string builders (golden-tested against the reference's
  unit-test strings, utils.rs:181-298) for driver-side code;
- Catalyst ``Column`` builders (pure ``concat`` expressions — no UDFs,
  fully codegen'd and pushdown-friendly) for dataflow.

The subtree query ``<base>.>`` is a NATS multi-token wildcard: it
matches any subject with >= 1 token after ``<base>``. Because every
publish subject under a node starts with ``<base>.``, the equivalent
Spark predicate is ``startswith(base + '.')``; the exact-level query
``<base>._`` is plain string equality. Both are pushed to Parquet by
Catalyst (EqualTo / StringStartsWith).

ID-TOKEN CONTRACT (r8 review): the grammar equivalence above — and
NATS's own tokenization, and ``parse_subject_col``'s inverse — all
assume resource ids contain no ``.`` (and are not the literal
discriminator/terminator tokens). The reference inherits that
guarantee from its id generator (ULIDs) and performs no validation
(utils.rs:16-32 interpolates ids verbatim); we match that posture in
the hot-path Column builders (a per-row validity expression would tax
every event for a malformed-id case the upstream system cannot
produce) and property-test the equivalence over the legal id alphabet
(tests/test_subjects_golden.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

COMMON_PREFIX = "UPDATES.STORAGE"
OBJECT_NAME = "OBJECT"
OBJECT_GROUP_NAME = "OBJECTGROUP"
SEP = "._."
PUBLISH_TERMINATOR = "._"
SUBTREE_TERMINATOR = ".>"

# ---------------------------------------------------------------------------
# Plain-Python builders (parity with utils.rs; golden-tested)
# ---------------------------------------------------------------------------


def base_subject(ids: list[str], is_object_group: bool) -> str:
    """Join ids with ``._.``; before the 3rd id insert the OBJECT /
    OBJECTGROUP discriminator (utils.rs:16-32)."""
    out = COMMON_PREFIX
    for stage, rid in enumerate(ids):
        if stage == 2:
            out += SEP + (OBJECT_GROUP_NAME if is_object_group else OBJECT_NAME)
        out += SEP + rid
    return out


def query(base: str, include_subresources: bool) -> str:
    """Exact-level (``<base>._``) vs subtree (``<base>.>``) query
    subject (utils.rs:35-42)."""
    return base + (SUBTREE_TERMINATOR if include_subresources else PUBLISH_TERMINATOR)


def project_subject(project_id: str) -> str:
    return base_subject([project_id], False) + PUBLISH_TERMINATOR


def project_query(project_id: str, include_subresources: bool) -> str:
    return query(base_subject([project_id], False), include_subresources)


def collection_subject(project_id: str, collection_id: str) -> str:
    return base_subject([project_id, collection_id], False) + PUBLISH_TERMINATOR


def collection_query(project_id: str, collection_id: str, include_subresources: bool) -> str:
    return query(base_subject([project_id, collection_id], False), include_subresources)


def object_subject(project_id: str, collection_id: str, shared_object_id: str, object_id: str) -> str:
    return (
        base_subject([project_id, collection_id, shared_object_id, object_id], False)
        + PUBLISH_TERMINATOR
    )


def object_query(
    project_id: str,
    collection_id: str,
    shared_object_id: str,
    object_id: str,
    include_subresources: bool,
) -> str:
    return query(
        base_subject([project_id, collection_id, shared_object_id, object_id], False),
        include_subresources,
    )


def object_group_subject(
    project_id: str, collection_id: str, shared_object_group_id: str, object_group_id: str
) -> str:
    return (
        base_subject(
            [project_id, collection_id, shared_object_group_id, object_group_id], True
        )
        + PUBLISH_TERMINATOR
    )


def object_group_query(
    project_id: str,
    collection_id: str,
    shared_object_group_id: str,
    object_group_id: str,
    include_subresources: bool,
) -> str:
    return query(
        base_subject(
            [project_id, collection_id, shared_object_group_id, object_group_id], True
        ),
        include_subresources,
    )


# ---------------------------------------------------------------------------
# Catalyst Column builders (no UDFs — plain concat, codegen'd JVM-side)
# ---------------------------------------------------------------------------


def _as_col(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("string")


def base_subject_col(ids: list[Column | str], is_object_group: bool = False) -> Column:
    parts: list[Column] = [F.lit(COMMON_PREFIX)]
    for stage, rid in enumerate(ids):
        if stage == 2:
            parts.append(F.lit(SEP + (OBJECT_GROUP_NAME if is_object_group else OBJECT_NAME)))
        parts.append(F.lit(SEP))
        parts.append(_as_col(rid))
    return F.concat(*parts)


def publish_subject_col(ids: list[Column | str], is_object_group: bool = False) -> Column:
    return F.concat(base_subject_col(ids, is_object_group), F.lit(PUBLISH_TERMINATOR))


def project_subject_col(project_id: Column | str) -> Column:
    return publish_subject_col([project_id], False)


def collection_subject_col(project_id: Column | str, collection_id: Column | str) -> Column:
    return publish_subject_col([project_id, collection_id], False)


def object_subject_col(
    project_id: Column | str,
    collection_id: Column | str,
    shared_object_id: Column | str,
    object_id: Column | str,
) -> Column:
    return publish_subject_col([project_id, collection_id, shared_object_id, object_id], False)


def object_group_subject_col(
    project_id: Column | str,
    collection_id: Column | str,
    shared_object_group_id: Column | str,
    object_group_id: Column | str,
) -> Column:
    return publish_subject_col(
        [project_id, collection_id, shared_object_group_id, object_group_id], True
    )


# ---------------------------------------------------------------------------
# Query predicates (pushdown-friendly: EqualTo / StringStartsWith)
# ---------------------------------------------------------------------------


def exact_level_predicate(subject_col: Column | str, base: str) -> Column:
    """``<base>._`` — events at exactly this node (utils.rs:39)."""
    col = F.col(subject_col) if isinstance(subject_col, str) else subject_col
    return col == F.lit(base + PUBLISH_TERMINATOR)


def subtree_predicate(subject_col: Column | str, base: str) -> Column:
    """``<base>.>`` — this node and every descendant (utils.rs:37)."""
    col = F.col(subject_col) if isinstance(subject_col, str) else subject_col
    return col.startswith(base + ".")


def query_predicate(subject_col: Column | str, base: str, include_subresources: bool) -> Column:
    if include_subresources:
        return subtree_predicate(subject_col, base)
    return exact_level_predicate(subject_col, base)


def filter_subject_predicate(subject_col: Column | str, filter_subject: str) -> Column:
    """Compile a RAW query-subject string (``<base>._`` exact /
    ``<base>.>`` subtree, utils.rs:35-42) into its Catalyst predicate
    — the inverse of :func:`query`, for callers holding the wire-form
    filter string instead of (ids, include_subresources)."""
    if filter_subject.endswith(SUBTREE_TERMINATOR):
        return subtree_predicate(
            subject_col, filter_subject[: -len(SUBTREE_TERMINATOR)]
        )
    if filter_subject.endswith(PUBLISH_TERMINATOR):
        return exact_level_predicate(
            subject_col, filter_subject[: -len(PUBLISH_TERMINATOR)]
        )
    raise ValueError(
        f"not a query subject (expected '{PUBLISH_TERMINATOR}' or "
        f"'{SUBTREE_TERMINATOR}' terminator): {filter_subject!r}"
    )


def scoped_filter(
    df,
    filter_subject: str,
    subject_col: str = "subject",
    partition_col: str = "project_id",
):
    """SURVEY §4's subtree-predicate → partition-filter rewrite, as a
    query-construction hint usable on ANY frame — no engine facade in
    the path.

    Catalyst cannot know that subject prefixes functionally determine
    ``project_id`` (that knowledge lives in the subject grammar:
    every query subject fixes the project as its first id token,
    utils.rs:16-32), so a raw ``subtree_predicate`` filter on a
    ``partitionBy(project_id)`` log scans every partition. This
    helper derives the safe ``project_id == <p>`` equality from the
    filter subject (:func:`project_of_query_subject`) and injects it
    alongside the subject predicate whenever the frame carries the
    partition column — Catalyst then turns it into a file-listing
    PartitionFilter (plan-gated in tests/test_plans.py) while the
    subject predicate still pushes to Parquet as
    EqualTo/StringStartsWith. On frames without the partition column
    (e.g. the raw testdata events table) it degrades to the plain
    subject predicate.
    """
    pred = filter_subject_predicate(subject_col, filter_subject)
    project = project_of_query_subject(filter_subject)
    if project is not None and partition_col in df.columns:
        pred = (F.col(partition_col) == project) & pred
    return df.filter(pred)


def project_of_query_subject(filter_subject: str) -> str | None:
    """Project id a compiled query subject is scoped to, or None.

    Every query subject at any level fixes the project (the first id
    token, utils.rs:16-32), so a consumer of that subject can never
    see an event from another project — which makes
    ``project_id == <p>`` a safe extra predicate that prunes whole
    partitions of a project-partitioned event log before listing.
    """
    if filter_subject.endswith(SUBTREE_TERMINATOR):
        base = filter_subject[: -len(SUBTREE_TERMINATOR)]
    elif filter_subject.endswith(PUBLISH_TERMINATOR):
        base = filter_subject[: -len(PUBLISH_TERMINATOR)]
    else:
        base = filter_subject
    parts = base.split(SEP)
    if len(parts) < 2 or parts[0] != COMMON_PREFIX or not parts[1]:
        return None
    return parts[1]


def is_canonical_query_subject(filter_subject: str) -> bool:
    """True iff ``filter_subject`` is one the grammar's query builders
    (utils.rs:35-147) can produce: a project / collection / object /
    object-group base plus the ``._`` (exact) or ``.>`` (subtree)
    terminator, with non-empty ids. Matching by candidate-key
    enumeration (:func:`candidate_query_subjects`) is exact for these
    and only these.
    """
    if filter_subject.endswith(SUBTREE_TERMINATOR):
        base = filter_subject[: -len(SUBTREE_TERMINATOR)]
    elif filter_subject.endswith(PUBLISH_TERMINATOR):
        base = filter_subject[: -len(PUBLISH_TERMINATOR)]
    else:
        return False
    parts = base.split(SEP)
    if not parts or parts[0] != COMMON_PREFIX:
        return False
    ids = parts[1:]
    if len(ids) in (1, 2):  # project / collection level
        return all(ids) and not any(i in (OBJECT_NAME, OBJECT_GROUP_NAME) for i in ids)
    if len(ids) == 5:  # [p, c, KIND, shared, leaf]
        return (
            all(ids)
            and ids[2] in (OBJECT_NAME, OBJECT_GROUP_NAME)
            and not any(
                i in (OBJECT_NAME, OBJECT_GROUP_NAME) for i in (ids[0], ids[1], ids[3], ids[4])
            )
        )
    return False


def candidate_query_subjects(
    subject: Column | str = "subject",
    project_id: Column | str = "project_id",
    collection_id: Column | str = "collection_id",
    kind: Column | str = "kind",
    shared_id: Column | str = "shared_id",
    leaf_id: Column | str = "leaf_id",
) -> Column:
    """Every canonical query subject that matches this publish subject,
    as an ``array<string>`` of at most 4 keys.

    Subjects have bounded depth, so pub/sub matching inverts cleanly:
    instead of evaluating N group predicates per event (N scans, or a
    non-equi join), enumerate the event's possible matches — its own
    subject (= the exact-level query at its node, utils.rs:39) plus
    ``<ancestor base>.>`` for each grammar ancestor base (project,
    collection, and the full leaf base; utils.rs:37) — and hash-join
    that against the subscriptions' ``filter_subject`` keys. This is
    the scale path for fleets of stream groups: one equi-join per
    micro-batch, broadcast on the (tiny) group dimension, instead of
    one filtered scan per group.
    """
    subj = F.col(subject) if isinstance(subject, str) else subject
    p = F.col(project_id) if isinstance(project_id, str) else project_id
    c = F.col(collection_id) if isinstance(collection_id, str) else collection_id
    k = F.col(kind) if isinstance(kind, str) else kind
    s = F.col(shared_id) if isinstance(shared_id, str) else shared_id
    leaf = F.col(leaf_id) if isinstance(leaf_id, str) else leaf_id

    proj_base = F.concat(F.lit(COMMON_PREFIX + SEP), p)
    coll_base = F.concat(proj_base, F.lit(SEP), c)
    leaf_base = F.concat(coll_base, F.lit(SEP), k, F.lit(SEP), s, F.lit(SEP), leaf)
    sub = F.lit(SUBTREE_TERMINATOR)
    return F.array_compact(
        F.array(
            subj,  # exact-level query == the publish subject itself
            F.when(p.isNotNull(), F.concat(proj_base, sub)),
            F.when(c.isNotNull(), F.concat(coll_base, sub)),
            F.when(k.isNotNull(), F.concat(leaf_base, sub)),
        )
    )


# ---------------------------------------------------------------------------
# Inverse: parse a publish subject back into hierarchy components
# ---------------------------------------------------------------------------


def parse_subject_col(subject_col: Column | str) -> Column:
    """Parse a publish subject into a struct
    ``(project_id, collection_id, kind, shared_id, leaf_id)``.

    Inverse of the builders above: strip the ``._`` terminator, split
    on the ``._.`` separator, read positional tokens (the discriminator
    occupies its own token before the 3rd id). Pure split/element_at
    expressions — usable on raw logs that carry only the subject
    string (e.g. external NATS dumps) to recover partition columns.
    """
    c = F.col(subject_col) if isinstance(subject_col, str) else subject_col
    stripped = F.regexp_replace(c, r"\._$", "")
    toks = F.split(stripped, r"\._\.")
    n = F.size(toks)
    kind = F.when(n >= 4, F.element_at(toks, 4)).otherwise(F.lit(None).cast("string"))
    return F.struct(
        F.when(n >= 2, F.element_at(toks, 2)).otherwise(F.lit(None).cast("string")).alias("project_id"),
        F.when(n >= 3, F.element_at(toks, 3)).otherwise(F.lit(None).cast("string")).alias("collection_id"),
        kind.alias("kind"),
        F.when(n >= 5, F.element_at(toks, 5)).otherwise(F.lit(None).cast("string")).alias("shared_id"),
        F.when(n >= 6, F.element_at(toks, 6)).otherwise(F.lit(None).cast("string")).alias("leaf_id"),
    )
