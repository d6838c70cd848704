"""EventStreamerEngine — the user-level facade with the reference
server's API surface (SURVEY.md §3), so a user of the reference can
switch 1:1:

    reference gRPC call                     engine method
    ------------------------------------    ---------------------------
    InternalEventEmitterService.emit_event  emit_events(df)
    CreateEventStreamingGroup               create_event_streaming_group(...)
    ReadStreamGroupMessages (bidi stream)   read_stream_group_messages(...)
    GetEventStreamingGroup                  get_stream_group(...)
    (no batch query in reference)           query_events(...) — bonus

Authorization (reference operators #2/#11) is carried by a token check
on emit and an optional grants table consulted at group creation.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from aoseventstreamer_spark import schemas
from aoseventstreamer_spark.functions import subjects as S
from aoseventstreamer_spark.operators.routing import route_emits, write_event_log
from aoseventstreamer_spark.streaming.groups import StreamGroup, StreamGroupManager


class AuthorizationError(Exception):
    pass


class EventStreamerEngine:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        secret: str | None = None,
        grants: DataFrame | None = None,
        partition_log: bool = True,
    ):
        self.spark = spark
        self.root = root
        self.secret = secret
        self.grants = grants
        self.partition_log = partition_log
        self.events_path = os.path.join(root, "event_log")
        self.groups = StreamGroupManager(spark, self.events_path, os.path.join(root, "state"))

    # -- write path (operator #1-#10) ---------------------------------------

    def emit_events(self, raw_emits: DataFrame) -> None:
        """The EmitEvent pipeline: token filter → route → publish."""
        routed = route_emits(raw_emits, secret=self.secret)
        write_event_log(
            routed,
            self.events_path,
            partition_by=("project_id",) if self.partition_log else None,
        )

    # -- subscription DDL (operators #11-#14) --------------------------------

    def _authorize(self, token: str, resource_type: int, resource_id: str) -> None:
        """AuthZ gate (public_event_server.rs:74-100): a lookup against
        the grants table; absence of a grants table = mock always-true
        (storage_endpoint_mock.rs:104-110)."""
        if self.grants is None:
            return
        ok = not self.grants.filter(
            (F.col("token") == token)
            & (F.col("resource_type") == resource_type)
            & (F.col("resource_id") == resource_id)
        ).isEmpty()
        if not ok:
            raise AuthorizationError(f"token not granted on {resource_type}:{resource_id}")

    def create_event_streaming_group(
        self,
        token: str,
        resource_type: int,
        resource_id: str,
        include_subresources: bool,
        hierarchy: dict | None = None,
        event_type: int = schemas.EVENT_TYPE_ALL,
    ) -> str:
        self._authorize(token, resource_type, resource_id)
        group = self.groups.create_stream_group(
            resource_type, resource_id, include_subresources, hierarchy, event_type
        )
        return group.id

    def get_stream_group(self, group_id: str) -> StreamGroup:
        return self.groups.get_stream_group(group_id)

    # -- read path (operators #15-#22) ---------------------------------------

    def read_stream_group_messages(
        self,
        group_id: str,
        deliver: Callable[[int, DataFrame], None],
        catch_up_only: bool = False,
    ):
        """Chunked at-least-once delivery; ``deliver(chunk_id, df)``.
        ``catch_up_only`` drains retained history then stops
        (Trigger.AvailableNow) instead of tailing at 250 ms."""
        if catch_up_only:
            return self.groups.read_available(group_id, deliver)
        return self.groups.read_stream_group(group_id, deliver)

    # -- batch query over the log (bonus surface) -----------------------------

    def event_log(self) -> DataFrame:
        """The routed log; a fresh engine (nothing emitted yet) reads
        as an EMPTY frame with the declared schema rather than leaking
        the datasource's raw PATH_NOT_FOUND — matching the streaming
        path, which avoids the same hazard via its explicit schema.
        Only the missing-path case is swallowed; any other analysis
        failure (corrupt directory, schema clash) re-raises, so a real
        fault can't masquerade as 'no events yet'."""
        try:
            return self.spark.read.parquet(self.events_path)
        except AnalysisException as e:
            cond = getattr(e, "getCondition", e.getErrorClass)() or ""
            if cond.startswith("PATH_NOT_FOUND"):
                return self.spark.createDataFrame([], schemas.ROUTED_EVENTS_SCHEMA)
            raise

    def query_events(
        self, ids: list[str], include_subresources: bool, is_object_group: bool = False
    ) -> DataFrame:
        """Batch query with the same exact-level / subtree semantics as
        a stream group filter; partition-prunes on project_id when the
        log carries the partition column. Delegates to
        subjects.scoped_filter — the same rewrite now works facade-free
        on any frame (SURVEY §4's subtree→partition-filter hint)."""
        base = S.base_subject(ids, is_object_group)
        subject = S.query(base, include_subresources)
        return S.scoped_filter(self.event_log(), subject)
