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


@query(
    "q_route_emits",
    oracle="""
    WITH e AS (
      SELECT event_id,
             CAST((event_id % 4) + 1 AS INTEGER) AS resource,
             'res_' || CAST(event_id AS VARCHAR) AS rid,
             'proj_' || CAST(user_id AS VARCHAR) AS proj,
             event_type AS coll,
             'so_' || CAST(event_id % 50 AS VARCHAR) AS so,
             CASE WHEN event_id % 3 = 0
                  THEN ['sg_' || CAST(event_id % 7 AS VARCHAR)]
                  ELSE CAST([] AS VARCHAR[]) END AS ogs
      FROM events
    )
    SELECT event_id AS seq, resource, rid AS resource_id,
           'UPDATES.STORAGE._.' || rid || '._' AS subject
    FROM e WHERE resource = 1
    UNION ALL
    SELECT event_id, resource, rid,
           'UPDATES.STORAGE._.' || proj || '._.' || rid || '._'
    FROM e WHERE resource = 2
    UNION ALL
    SELECT event_id, resource, rid,
           'UPDATES.STORAGE._.' || proj || '._.' || coll || '._.OBJECT._.'
             || so || '._.' || rid || '._'
    FROM e WHERE resource = 3
    UNION ALL
    SELECT event_id, resource, rid,
           'UPDATES.STORAGE._.' || proj || '._.' || coll || '._.OBJECTGROUP._.'
             || og || '._.' || rid || '._'
    FROM (SELECT e.*, UNNEST(ogs) AS og FROM e) WHERE resource IN (3, 4)
    """,
)
def q_route_emits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE core reference operator, hash-checked end-to-end: emit
    requests (derived deterministically from the events table) run
    through the real ``route_emits`` pipeline — token filter, relation
    explode, resource-type dispatch, object-group fan-out (natsio.rs
    :60-148) — and the resulting routed log must match a plain-SQL
    formulation of the same dispatch rules."""
    from aoseventstreamer_spark import schemas
    from aoseventstreamer_spark.operators.routing import route_emits

    ev = t(spark, sf_dir, "events")
    raw = ev.select(
        F.col("event_id").alias("emit_id"),
        F.lit("s3cr3t").alias("token"),
        ((F.col("event_id") % 4) + 1).cast("int").alias("event_resource"),
        F.concat(F.lit("res_"), F.col("event_id").cast("string")).alias("resource_id"),
        F.lit(schemas.EVENT_TYPE_ALL).alias("event_type"),
        F.array(
            F.struct(
                F.concat(F.lit("proj_"), F.col("user_id").cast("string")).alias("project"),
                F.col("event_type").alias("collection"),
                F.concat(F.lit("so_"), (F.col("event_id") % 50).cast("string")).alias(
                    "shared_object"
                ),
                F.when(
                    F.col("event_id") % 3 == 0,
                    F.array(
                        F.struct(
                            F.concat(
                                F.lit("sg_"), (F.col("event_id") % 7).cast("string")
                            ).alias("shared_object_group_id")
                        )
                    ),
                )
                .otherwise(F.array().cast("array<struct<shared_object_group_id:string>>"))
                .alias("object_groups"),
            )
        ).alias("relations"),
    )
    routed = route_emits(raw, secret="s3cr3t")
    return routed.select("seq", "resource", "resource_id", "subject")
