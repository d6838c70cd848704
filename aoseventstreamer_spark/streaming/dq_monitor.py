"""Streaming data-quality monitor: the q_dq_checks constraint suite
run per micro-batch, with results appended to a durable metrics
repository (the Deequ metrics-repository pattern, on streams).

Design is the same replay-idempotent shape as
``streaming/rollup.IncrementalRollup``:

- each micro-batch evaluates EVERY declared check in one aggregate
  over that batch (adding a check adds a column, never a pass), then
  unpivots to (check_name, metric, passed) rows written under the
  batch's ``batch_id=<n>`` partition with dynamic partition
  overwrite — a redelivered batch replaces its own rows instead of
  duplicating them;
- ``history()`` is a plain read of the repository: one row per
  (batch, check), the time series a quality dashboard plots;
- ``failures()`` filters it to violated constraints;
- ``volume_anomalies()`` flags batches whose metric deviates more
  than 2σ from that check's history — the same cross-multiplied
  integer z-score as q_anomaly_zscore (events_ext.py), so the flag
  is deterministic and never computes a float.

State is metric rows (batches × checks), never data rows: at 100 TB
the repository grows with time, not with volume.
"""

from __future__ import annotations

import os
import re

from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _subst_metric(pred: str, repl: str) -> str:
    """Replace the bare identifier ``metric`` in a SQL predicate.
    Plain substring replace corrupted predicates where 'metric' occurs
    inside another identifier or a quoted literal (ADVICE r5) — split
    out single-quoted literals, then word-boundary substitute."""
    parts = re.split(r"('(?:[^']|'')*')", pred)
    return "".join(
        p if p.startswith("'") else re.sub(r"\bmetric\b", repl, p)
        for p in parts
    )


class StreamingDQMonitor:
    """``checks`` maps check_name → (metric aggregate Column,
    SQL predicate string over the scalar ``metric``), e.g.::

        {"completeness_v": (F.expr("(count(v) * 1000000) div count(*)"),
                            "metric = 1000000"),
         "max_value_cents": (F.max(cents), "metric <= 50000000")}

    The metric column must aggregate to a BIGINT-able scalar — use
    integer ``div`` for ratios (the repo's micro-unit discipline), not
    float division, so the repository stays exactly replayable.

    The predicate references the scalar as the bare word ``metric``;
    substitution is word-boundary-aware, so identifiers merely
    *containing* it (``max_metric_cents``) and quoted literals like
    ``'metric'`` pass through untouched."""

    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        checks: dict[str, tuple[Column, str]],
    ) -> None:
        if not checks:
            raise ValueError("StreamingDQMonitor needs at least one check")
        self.spark = spark
        self.checks = dict(checks)
        self.path = os.path.join(state_root, "dq_metrics")

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """One aggregate over the batch → one (check, metric, passed)
        row per check → idempotent overwrite of this batch's
        partition."""
        agg = batch_df.agg(
            *[
                col.cast("long").alias(f"_m_{i}")
                for i, (col, _) in enumerate(self.checks.values())
            ]
        )
        stack_args = ", ".join(
            f"'{name}', _m_{i}, ({_subst_metric(pred, f'_m_{i}')})"
            for i, (name, (_, pred)) in enumerate(self.checks.items())
        )
        rows = agg.selectExpr(
            f"stack({len(self.checks)}, {stack_args})"
            " AS (check_name, metric, passed)"
        )
        (
            rows.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(self.path)
        )

    def history(self) -> DataFrame:
        """(batch_id, check_name, metric, passed) for every committed
        batch. Read-probe discipline as IncrementalRollup.current()."""
        try:
            return self.spark.read.parquet(self.path).select(
                "batch_id", "check_name", "metric", "passed"
            )
        except AnalysisException as e:
            cond = getattr(e, "getCondition", e.getErrorClass)() or ""
            if cond.startswith("PATH_NOT_FOUND"):
                raise FileNotFoundError(
                    f"no DQ metrics at {self.path}: no batch committed yet"
                ) from e
            raise

    def failures(self) -> DataFrame:
        return self.history().where(~F.col("passed"))

    def volume_anomalies(self) -> DataFrame:
        """Per (check, batch): is this batch's metric > 2σ from the
        check's own history? Pure-integer cross-multiplied z-score —
        needs Σ metric² to fit int64, i.e. per-check metrics below
        ~3e9 over the window; compact or window the repository past
        that."""
        h = self.history()
        stats = h.groupBy(F.col("check_name").alias("cn")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("metric").alias("s"),
            F.sum(F.col("metric") * F.col("metric")).alias("ss"),
        )
        j = h.join(F.broadcast(stats), h.check_name == stats.cn)
        dev = F.col("metric") * F.col("n") - F.col("s")
        var_n2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
        return j.select(
            "batch_id",
            "check_name",
            "metric",
            (dev * dev > 4 * var_n2).alias("is_anomaly"),
        )

    def attach(
        self,
        stream_df: DataFrame,
        checkpoint: str,
        trigger: dict | None = None,
    ):
        """foreachBatch wiring, checkpoint = consumer cursor, the
        per-batch partition = the idempotent commit."""
        w = stream_df.writeStream.foreachBatch(
            lambda df, bid: self.process_batch(df, bid)
        ).option("checkpointLocation", checkpoint)
        if trigger:
            w = w.trigger(**trigger)
        return w.start()
