"""Demux runner: ONE streaming scan serving many stream groups.

Per-group streaming queries (streaming/groups.py) are the faithful
reference shape, but at thousands of groups the N-scans cost dominates.
The demux job amortizes: a single ``readStream`` over the event log;
each micro-batch is cached once and fanned out to every registered
group's filter + deliver callback. Chunk ids stay per-group
(batch_id), the checkpoint is shared — commit happens only after ALL
groups accepted the batch, preserving (coarsening) the at-least-once
contract: a failed deliver for any group replays the batch for all.

That coarsening is the deliberate trade: one scan + one checkpoint vs
per-group offsets. Groups that need isolated progress stay on
``StreamGroupManager``; fleets of cheap subscribers ride the demux.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from aoseventstreamer_spark import schemas
from aoseventstreamer_spark.streaming.groups import subject_filter


@dataclass
class DemuxGroup:
    id: str
    filter_subject: str
    deliver: Callable[[int, DataFrame], None]


class DemuxRunner:
    def __init__(self, spark: SparkSession, events_path: str, checkpoint: str):
        self.spark = spark
        self.events_path = events_path
        self.checkpoint = checkpoint
        self._groups: list[DemuxGroup] = []
        self._started = False

    def register(
        self, group_id: str, filter_subject: str, deliver: Callable[[int, DataFrame], None]
    ) -> None:
        if self._started:
            # the running foreachBatch closes over the group snapshot
            # taken at start(); accepting a late registration would be
            # silent total data loss for that subscriber
            raise RuntimeError(
                "DemuxRunner already started; stop it and start a new "
                "runner to change the group set"
            )
        self._groups.append(DemuxGroup(group_id, filter_subject, deliver))

    def _check_group_set(self, group_ids: list[str], allow_missed_history: bool) -> None:
        """A shared checkpoint means a group added on restart starts at
        the committed offsets — it silently misses all prior history
        (unlike per-group StreamGroupManager queries, which replay from
        the start). Detect that and make it explicit."""
        manifest = os.path.join(self.checkpoint, "demux_groups.json")
        previous: list[str] = []
        if os.path.exists(manifest):
            with open(manifest) as f:
                previous = json.load(f)
        new_groups = sorted(set(group_ids) - set(previous))
        if previous and new_groups and not allow_missed_history:
            raise ValueError(
                f"groups {new_groups} were added to an existing demux "
                "checkpoint and would miss all previously committed "
                "history; replay them via StreamGroupManager first, or "
                "pass allow_missed_history=True to accept the gap"
            )
        os.makedirs(self.checkpoint, exist_ok=True)
        with open(manifest, "w") as f:
            json.dump(sorted(set(group_ids) | set(previous)), f)

    def start(
        self,
        trigger: dict | None = None,
        max_files_per_trigger: int = 64,
        allow_missed_history: bool = False,
    ):
        groups = list(self._groups)
        if not groups:
            raise ValueError("no groups registered")
        self._check_group_set([g.id for g in groups], allow_missed_history)
        self._started = True

        def fan_out(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.persist()
            try:
                for g in groups:
                    matched = batch_df.filter(subject_filter(g.filter_subject))
                    g.deliver(batch_id, matched)
            finally:
                batch_df.unpersist()

        stream = (
            self.spark.readStream.schema(schemas.ROUTED_EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(self.events_path)
        )
        return (
            stream.writeStream.foreachBatch(fan_out)
            .option("checkpointLocation", self.checkpoint)
            .trigger(**(trigger or {"processingTime": "250 milliseconds"}))
            .start()
        )
