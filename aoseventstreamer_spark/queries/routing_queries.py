"""Routing-core queries (SURVEY.md §7.2): the reference's subject
grammar and its two query modes, expressed over the driver's generic
``events`` table (user_id → project, event_type → collection,
event_id-derived ids below that).

These exercise scan, projection (subject construction, natsio.rs
operator #7-8), the exact-level / subtree predicates (operator #9/#14)
and fan-out union (operator #6) — hash-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aoseventstreamer_spark.functions import subjects as S
from aoseventstreamer_spark.queries import query, t

# Spark-side derived id columns (lazy: Column construction needs an
# active session in classic mode) and their DuckDB spellings.
def _PROJECT():
    return F.col("user_id").cast("string")


def _COLLECTION():
    return F.col("event_type")


def _SHARED():
    return F.concat(F.lit("s"), (F.col("event_id") % 50).cast("string"))


def _LEAF():
    return F.concat(F.lit("o"), F.col("event_id").cast("string"))

_SQL_PROJECT = "CAST(user_id AS VARCHAR)"
_SQL_COLLECTION = "event_type"
_SQL_SHARED = "'s' || CAST(event_id % 50 AS VARCHAR)"
_SQL_LEAF = "'o' || CAST(event_id AS VARCHAR)"


@query(
    "q_scan_events",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
           value, props
    FROM events
    """,
)
def q_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of the event log (source operator #1/#16)."""
    ev = t(spark, sf_dir, "events")
    return ev.select("event_id", "ts", "user_id", "event_type", "value", "props")


@query(
    "q_replay_all",
    oracle=f"""
    SELECT event_id AS seq,
           'UPDATES.STORAGE._.' || {_SQL_PROJECT} || '._.' || {_SQL_COLLECTION} || '._'
             AS subject,
           user_id, event_type, value
    FROM events
    """,
)
def q_replay_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay-from-start (operator #22): a new stream group reads the
    full retained history, in routed form."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("seq"),
        S.collection_subject_col(_PROJECT(), _COLLECTION()).alias("subject"),
        "user_id",
        "event_type",
        "value",
    )


@query(
    "q_project_event_fields",
    oracle="SELECT event_id, user_id, event_type FROM events",
)
def q_project_event_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure projection (operator #4/#20) — column pruning reaches the scan."""
    return t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")


@query(
    "q_subject_project",
    oracle=f"""
    SELECT event_id,
           'UPDATES.STORAGE._.' || {_SQL_PROJECT} || '._' AS subject
    FROM events
    """,
)
def q_subject_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.select("event_id", S.project_subject_col(_PROJECT()).alias("subject"))


@query(
    "q_subject_collection",
    oracle=f"""
    SELECT event_id,
           'UPDATES.STORAGE._.' || {_SQL_PROJECT} || '._.' || {_SQL_COLLECTION} || '._'
             AS subject
    FROM events
    """,
)
def q_subject_collection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id", S.collection_subject_col(_PROJECT(), _COLLECTION()).alias("subject")
    )


@query(
    "q_subject_object",
    oracle=f"""
    SELECT event_id,
           'UPDATES.STORAGE._.' || {_SQL_PROJECT} || '._.' || {_SQL_COLLECTION}
             || '._.OBJECT._.' || {_SQL_SHARED} || '._.' || {_SQL_LEAF} || '._'
             AS subject
    FROM events
    """,
)
def q_subject_object(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        S.object_subject_col(_PROJECT(), _COLLECTION(), _SHARED(), _LEAF()).alias("subject"),
    )


@query(
    "q_subject_object_group",
    oracle=f"""
    SELECT event_id,
           'UPDATES.STORAGE._.' || {_SQL_PROJECT} || '._.' || {_SQL_COLLECTION}
             || '._.OBJECTGROUP._.' || 'g' || CAST(event_id % 10 AS VARCHAR)
             || '._.' || {_SQL_LEAF} || '._'
             AS subject
    FROM events
    """,
)
def q_subject_object_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    group = F.concat(F.lit("g"), (F.col("event_id") % 10).cast("string"))
    return ev.select(
        "event_id",
        S.object_group_subject_col(_PROJECT(), _COLLECTION(), group, _LEAF()).alias("subject"),
    )


@query(
    "q_filter_exact_level",
    oracle=f"""
    SELECT event_id, subject FROM (
      SELECT event_id,
             'UPDATES.STORAGE._.' || {_SQL_PROJECT} || '._.' || {_SQL_COLLECTION} || '._'
               AS subject
      FROM events
    ) WHERE subject = 'UPDATES.STORAGE._.7._.click._'
    """,
)
def q_filter_exact_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-level query ``<base>._`` (utils.rs:39) — plain equality,
    pushed to the scan as EqualTo."""
    ev = t(spark, sf_dir, "events")
    subj = ev.select(
        "event_id", S.collection_subject_col(_PROJECT(), _COLLECTION()).alias("subject")
    )
    base = S.base_subject(["7", "click"], False)
    return subj.filter(S.exact_level_predicate("subject", base))


@query(
    "q_filter_subtree_prefix",
    oracle=f"""
    SELECT event_id, subject FROM (
      SELECT event_id,
             'UPDATES.STORAGE._.' || {_SQL_PROJECT} || '._.' || {_SQL_COLLECTION}
               || '._.OBJECT._.' || {_SQL_SHARED} || '._.' || {_SQL_LEAF} || '._'
               AS subject
      FROM events
    ) WHERE starts_with(subject, 'UPDATES.STORAGE._.7.')
    """,
)
def q_filter_subtree_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtree query ``<base>.>`` (utils.rs:37) — StringStartsWith,
    pushed to the scan; matches project 7 at every depth."""
    ev = t(spark, sf_dir, "events")
    subj = ev.select(
        "event_id",
        S.object_subject_col(_PROJECT(), _COLLECTION(), _SHARED(), _LEAF()).alias("subject"),
    )
    return subj.filter(S.subtree_predicate("subject", S.base_subject(["7"], False)))


@query(
    "q_filter_compound",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type IN ('click', 'purchase') AND value > 100 AND user_id % 2 = 0
    """,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate (token filter #2 + authz gate #11 style)."""
    ev = t(spark, sf_dir, "events")
    return ev.select("event_id", "user_id", "event_type", "value").filter(
        F.col("event_type").isin("click", "purchase")
        & (F.col("value") > 100)
        & (F.col("user_id") % 2 == 0)
    )


@query(
    "q_union_subjects",
    oracle=f"""
    SELECT event_id, 'project' AS level,
           'UPDATES.STORAGE._.' || {_SQL_PROJECT} || '._' AS subject
    FROM events
    UNION ALL
    SELECT event_id, 'collection' AS level,
           'UPDATES.STORAGE._.' || {_SQL_PROJECT} || '._.' || {_SQL_COLLECTION} || '._'
             AS subject
    FROM events
    """,
)
def q_union_subjects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fan-out union (operator #6): each event appears under its
    project-level and collection-level subject."""
    ev = t(spark, sf_dir, "events")
    proj = ev.select(
        "event_id",
        F.lit("project").alias("level"),
        S.project_subject_col(_PROJECT()).alias("subject"),
    )
    coll = ev.select(
        "event_id",
        F.lit("collection").alias("level"),
        S.collection_subject_col(_PROJECT(), _COLLECTION()).alias("subject"),
    )
    return proj.unionByName(coll)


@query(
    "q_dedup_events",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (stateful op #14/#21 analogue in batch)."""
    return t(spark, sf_dir, "events").select("user_id", "event_type").distinct()
