"""Fixed StructType schemas for the engine's own tables.

The reference takes all message shapes from the pinned aruna-rust-api
protobuf crate (Cargo.toml:9) — fixed schemas, no inference. We mirror
that: every engine table has a declared schema here (FIXTURES.md §1-3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ResourceType wire enum (aruna API; match arms at
# /root/reference/src/stream_handler/natsio.rs:78-129)
RESOURCE_UNSPECIFIED = 0
RESOURCE_PROJECT = 1
RESOURCE_COLLECTION = 2
RESOURCE_OBJECT = 3
RESOURCE_OBJECT_GROUP = 4
RESOURCE_ALL = 5

RESOURCE_TYPE_NAMES = {
    RESOURCE_UNSPECIFIED: "UNSPECIFIED",
    RESOURCE_PROJECT: "PROJECT",
    RESOURCE_COLLECTION: "COLLECTION",
    RESOURCE_OBJECT: "OBJECT",
    RESOURCE_OBJECT_GROUP: "OBJECTGROUP",
    RESOURCE_ALL: "ALL",
}

# EventType wire enum (only All is exercised by the reference e2e test,
# /root/reference/src/e2e/tests.rs:157)
EVENT_TYPE_ALL = 6

OBJECT_GROUP_SCHEMA = T.StructType(
    [T.StructField("shared_object_group_id", T.StringType())]
)

RELATION_SCHEMA = T.StructType(
    [
        T.StructField("project", T.StringType()),
        T.StructField("collection", T.StringType()),
        T.StructField("shared_object", T.StringType()),
        T.StructField("object_groups", T.ArrayType(OBJECT_GROUP_SCHEMA)),
    ]
)

# Ingest-path input: one row per EmitEventRequest
# (/root/reference/src/server/internal_event_server.rs:47-63)
RAW_EMITS_SCHEMA = T.StructType(
    [
        T.StructField("emit_id", T.LongType()),
        T.StructField("token", T.StringType()),
        T.StructField("event_resource", T.IntegerType()),
        T.StructField("resource_id", T.StringType()),
        T.StructField("event_type", T.IntegerType()),
        T.StructField("relations", T.ArrayType(RELATION_SCHEMA)),
    ]
)

# Routed event log: one row per (relation x subject) publish
# (/root/reference/src/stream_handler/natsio.rs:131-135)
ROUTED_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("subject", T.StringType()),
        T.StructField("project_id", T.StringType()),
        T.StructField("collection_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # null | OBJECT | OBJECTGROUP
        T.StructField("shared_id", T.StringType()),
        T.StructField("leaf_id", T.StringType()),
        T.StructField("resource", T.IntegerType()),
        T.StructField("updated_type", T.IntegerType()),
        T.StructField("resource_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

# Dimension tables (mock-backend equivalents, FIXTURES.md §3)
HIERARCHY_SCHEMA = T.StructType(
    [
        T.StructField("resource_id", T.StringType()),
        T.StructField("resource_type", T.IntegerType()),
        T.StructField("project_id", T.StringType()),
        T.StructField("collection_id", T.StringType()),
        T.StructField("object_id", T.StringType()),
    ]
)

STREAM_GROUPS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("event_type", T.IntegerType()),
        T.StructField("resource_type", T.IntegerType()),
        T.StructField("resource_id", T.StringType()),
        T.StructField("notify_on_sub_resource", T.BooleanType()),
        # engine extension beyond the mock's 5 fields: the compiled
        # query subject is persisted with the group so attach never
        # needs to re-derive it
        T.StructField("filter_subject", T.StringType()),
    ]
)

GRANTS_SCHEMA = T.StructType(
    [
        T.StructField("token", T.StringType()),
        T.StructField("resource_type", T.IntegerType()),
        T.StructField("resource_id", T.StringType()),
        T.StructField("action", T.IntegerType()),
    ]
)
