"""Temporal operator pack: as-of join (DuckDB has native ASOF JOIN as
the oracle), equi+range join, and RANGE-frame windowed aggregation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aoseventstreamer_spark.queries import cents, query, t


@query(
    "q_asof_join",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, CAST(ts AS TIMESTAMP)
    )
    SELECT c.event_id, c.user_id, c.ts,
           p.ts AS asof_ts, p.value AS asof_value
    FROM clicks c ASOF JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click matched to the user's most recent purchase at or
    before it — the custom operator composed from union+window
    (operators/asof.py), hash-checked against DuckDB's native ASOF."""
    from aoseventstreamer_spark.operators.asof import as_of_join

    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return as_of_join(
        clicks, purchases, key="user_id", right_vals=["value"], how="inner"
    )


@query(
    "q_range_join",
    oracle="""
    SELECT o.o_orderkey, COUNT(*) AS n_shipped_in_window
    FROM orders o JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL '60 days'
    GROUP BY o.o_orderkey
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range join: lineitems shipped within 60 days of their
    order. The equi key carries the shuffle; the range condition is a
    post-join filter, so there is no interval cross-join blowup."""
    orders = t(spark, sf_dir, "orders")
    lineitem = t(spark, sf_dir, "lineitem")
    cond = (
        (lineitem.l_orderkey == orders.o_orderkey)
        & (lineitem.l_shipdate >= orders.o_orderdate)
        & (lineitem.l_shipdate < orders.o_orderdate + F.expr("INTERVAL 60 days"))
    )
    return (
        lineitem.join(orders, cond)
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n_shipped_in_window"))
    )


@query(
    "q_running_sum_range",
    oracle="""
    SELECT event_id, user_id,
           SUM(CAST(ROUND(value*100) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
                   RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW) / 100.0
             AS rolling_30m
    FROM events
    """,
)
def q_running_sum_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame rolling sum (value within the trailing 30 minutes).
    Both engines order by the same epoch-second integers so frame
    membership is identical; cents keep the sum exact."""
    ev = t(spark, sf_dir, "events")
    # ts arrives as TIMESTAMP_NTZ (current testdata) or TIMESTAMP
    # (nanos-era testdata via load_table); NTZ has no direct cast to
    # long, so go through TIMESTAMP — an identity mapping under the
    # pinned UTC session timezone
    epoch_s = F.col("ts").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_s)
        .rangeBetween(-1800, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        (F.sum(cents("value")).over(w) / 100.0).alias("rolling_30m"),
    )


@query(
    "q_multimodal_frames",
    oracle="""
    SELECT d.doc_id AS media_id, CAST(f.fi AS INTEGER) AS frame_idx
    FROM (
      SELECT doc_id,
             least(4, greatest(1, strlen(text) // 256)) AS n
      FROM documents WHERE strlen(text) > 0
    ) d, UNNEST(generate_series(0, CAST(d.n AS BIGINT) - 1)) AS f(fi)
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: 1 media row → N frame rows. The frame
    COUNT and indices are pure byte arithmetic over the payload length
    (min(max_frames, max(1, len//every_n)) slices), so the fan-out is
    SQL-expressible: the oracle replays it from the UTF-8 byte length
    (strlen) of the source text that attach_binary_payload encodes."""
    from aoseventstreamer_spark.operators import multimodal as MM

    media = MM.attach_binary_payload(t(spark, sf_dir, "documents"))
    return MM.sample_frames(media, every_n_bytes=256, max_frames=4).select(
        "media_id", "frame_idx"
    )


@query(
    "q_interval_join_binned",
    oracle="""
    WITH inc AS (
      SELECT event_id AS incident_id, ts AS ts_start,
             ts + INTERVAL 2 HOUR AS ts_end
      FROM events WHERE event_type = 'error' AND event_id % 101 = 0
    )
    SELECT i.incident_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT)
             AS sum_value_cents
    FROM inc i JOIN events e
      ON e.ts >= i.ts_start AND e.ts < i.ts_end
    GROUP BY i.incident_id
    """,
)
def q_interval_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure interval containment with NO equi key — all activity
    inside each 2-hour incident window (error events as incidents) —
    through operators/intervals.bin_interval_join: intervals explode
    into the hour bins they cover, points equi-join on their bin, the
    exact predicate trims bin-edge pairs. The naive spelling is a
    BroadcastNestedLoopJoin over every (event, incident) pair; this
    plan is an ordinary shuffled equi-join that scales with matches,
    not with |points|x|intervals| (plan-gated: no nested-loop node).
    Hash-exact vs DuckDB's native range-predicate join."""
    from aoseventstreamer_spark.operators.intervals import bin_interval_join

    ev = t(spark, sf_dir, "events")
    incidents = ev.where(
        (F.col("event_type") == "error") & (F.col("event_id") % 101 == 0)
    ).select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("ts_start"),
        (F.col("ts") + F.expr("INTERVAL 2 hours")).alias("ts_end"),
    )
    joined = bin_interval_join(
        ev.select("user_id", "value", "ts"), incidents, bin_seconds=3600
    )
    return joined.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum(cents("value")).alias("sum_value_cents"),
    )
