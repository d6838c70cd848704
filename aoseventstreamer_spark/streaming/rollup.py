"""Incremental aggregate maintenance (materialized-rollup upkeep).

A 100 TB event log makes "recompute the per-(type, day) rollup from
scratch" a non-starter; the standard design is delta maintenance: each
micro-batch contributes a PARTIAL aggregate, and the rollup is the
merge of partials. This module is that design with the same
idempotence trick as streaming/online_dedup.py's band store:

- ``process_batch`` writes the batch's partial aggregate under its
  ``batch_id=<n>`` partition, REPLACING it on at-least-once replay —
  a redelivered batch overwrites its own contribution instead of
  double-counting. No read-modify-write of global state ever happens
  on the hot path (the classic double-count hazard of "merge into
  state then write state"), so concurrent/replayed batches cannot
  corrupt the rollup.
- ``current()`` is merge-on-read: one map-side-combinable sum over
  the partial table, grouped by the rollup keys. Partials are
  key-cardinality-sized (days × types, not events), so the read stays
  tiny even after millions of batches of history; when partial-file
  count grows, ``compact(dst)`` folds everything into a single base
  partition at a NEW location (same non-destructive convention as
  operators/maintenance.compact_event_log — atomic swap/retention is
  the deployment's concern).

Only ADDITIVE aggregates participate (count/sum — and avg/stddev via
sum+count+sum-of-squares columns the caller derives): additivity is
exactly what makes partials mergeable in any order. Min/max are
mergeable too (max of maxes); arbitrary holistic aggregates
(exact median) are not, which is the same line every materialized-view
engine draws.

Scale shape: the per-batch partial is one map-side-combined shuffle
of the BATCH (not the log); merge-on-read shuffles only the partial
table. At 100 TB, bucket the partial store by the rollup keys and
both stay co-located.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class IncrementalRollup:
    """Maintain an additive rollup of a stream, one partial aggregate
    per micro-batch, idempotent under batch replay.

    ``aggs`` maps output column name → an additive aggregate Column
    (``F.count(F.lit(1))``, ``F.sum("value")``, ``F.max("ts")`` …)
    evaluated per batch; ``current()`` re-merges them with the
    matching merge function (sum for counts/sums, max for max, min
    for min) inferred from ``merge_fns`` (default: sum)."""

    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        keys: list[str],
        aggs: dict[str, Column],
        merge_fns: dict[str, str] | None = None,
    ) -> None:
        self.spark = spark
        self.keys = list(keys)
        self.aggs = dict(aggs)
        self.merge_fns = dict(merge_fns or {})
        self.path = os.path.join(state_root, "rollup_partials")

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Aggregate one micro-batch and (over)write its partial under
        ``batch_id=<n>`` — replay-safe: dynamic partition overwrite
        touches only this batch's partition."""
        partial = batch_df.groupBy(*self.keys).agg(
            *[c.alias(name) for name, c in self.aggs.items()]
        )
        (
            partial.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(self.path)
        )

    def _merge(self, name: str) -> Column:
        fn = self.merge_fns.get(name, "sum")
        return getattr(F, fn)(name).alias(name)

    def current(self) -> DataFrame:
        """The rollup as of all committed partials: one merge
        aggregation over the partial table (map-side combinable).
        Raises a clear error before any batch has committed — only the
        genuinely-missing-path case, anything else propagates (the
        engine.event_log discipline: never mask real read failures as
        'no data yet'). The probe is the read itself, not an
        os.path.exists check: state_root may be HDFS/S3, where a local
        filesystem stat is meaningless."""
        try:
            partials = self.spark.read.parquet(self.path)
        except AnalysisException as e:
            cond = getattr(e, "getCondition", e.getErrorClass)() or ""
            if cond.startswith("PATH_NOT_FOUND"):
                raise FileNotFoundError(
                    f"no rollup partials at {self.path}: process_batch/attach "
                    "has not committed any batch yet"
                ) from e
            raise
        return partials.groupBy(*self.keys).agg(
            *[self._merge(name) for name in self.aggs]
        )

    def compact(self, dst: str) -> int:
        """Fold every partial into a single base partition written to
        ``dst`` (batch_id = -1, so a future swap keeps the same
        layout). Returns the number of base rows."""
        base = self.current().withColumn("batch_id", F.lit(-1))
        base.write.mode("overwrite").partitionBy("batch_id").parquet(dst)
        return self.spark.read.parquet(dst).count()

    def attach(self, stream_df: DataFrame, checkpoint: str, trigger: dict | None = None):
        """Wire onto a streaming frame: foreachBatch(process_batch)
        with a durable checkpoint — the checkpoint is the consumer
        cursor (reference semantics), the per-batch partition is the
        idempotent commit."""
        w = stream_df.writeStream.foreachBatch(
            lambda df, bid: self.process_batch(df, bid)
        ).option("checkpointLocation", checkpoint)
        if trigger:
            w = w.trigger(**trigger)
        return w.start()
