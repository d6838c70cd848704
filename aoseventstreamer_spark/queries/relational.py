"""Relational query surface (SURVEY.md §7.3/§7.4): joins over the
TPC-H-ish star schema (the hierarchy-lookup shape of reference
operators #11/#12/#18), aggregations, window functions, sort/top-k,
set ops, scalar-function suites, and event-time windows.

Scale notes (100 TB posture):
- FIXED-SIZE dimension joins (region/nation: 5/25 rows at every SF)
  are explicitly ``broadcast()`` — no shuffle of the fact side.
  SF-SCALING relations (customer/supplier/part), even filtered
  small, carry NO broadcast hint (r8 review): Spark/AQE broadcasts
  them while they fit the threshold and degrades to a shuffle join
  at 100 TB instead of OOMing the executors on a forced build side;
- fact-fact joins shuffle on their keys and rely on AQE for skew;
- top-k per group is a window + filter (single shuffle on the
  partition key), top-k global is ``orderBy().limit()`` which Spark
  executes as TakeOrderedAndProject (no full sort of the data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aoseventstreamer_spark.queries import (
    SQL_AVG_4DP,
    SQL_SUM_2DP,
    avg_value_4dp,
    cents,
    query,
    sum_value_2dp,
    t,
)

# ---------------------------------------------------------------------------
# Joins (operators #11/#12/#18 generalized)
# ---------------------------------------------------------------------------


@query(
    "q_join_hierarchy",
    oracle="""
    SELECT c.c_custkey, n.n_name AS nation_name, r.r_name AS region_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def q_join_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy lookup (operator #12): fact × two broadcast dims —
    the region→nation→customer chain has the same shape as
    project→collection→object."""
    customer = t(spark, sf_dir, "customer")
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    region = F.broadcast(t(spark, sf_dir, "region"))
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select(
            "c_custkey",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left"
    ).select("c_custkey", "c_name", "o_orderkey")


@query(
    "q_semi_authz",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    """,
)
def q_semi_authz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AuthZ gate (operator #11) as a left-semi join against a
    'grants' set (customers with positive standing). No broadcast
    hint: the grant set scales with the customer table, so the
    planner must stay free to shuffle it at 100 TB."""
    orders = t(spark, sf_dir, "orders")
    grants = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    return orders.join(
        grants, orders.o_custkey == grants.c_custkey, "left_semi"
    ).select("o_orderkey", "o_custkey")


@query(
    "q_anti_unauthorized",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 5000
    )
    """,
)
def q_anti_unauthorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    grants = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    return orders.join(
        grants, orders.o_custkey == grants.c_custkey, "left_anti"
    ).select("o_orderkey", "o_custkey")


@query(
    "q_join_multiway",
    oracle="""
    SELECT o.o_orderkey AS orderkey,
           CAST(o.o_orderdate AS TIMESTAMP) AS orderdate,
           ROUND(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
                 / 100.0, 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1996-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped 3-way join + aggregation. Filters reach all
    three scans (pushdown); the filtered customer side is tiny at
    bench SFs so the planner broadcasts it unhinted (and may stop
    at 100 TB — customer scales with SF)."""
    customer = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    lineitem = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
        )
        .agg(
            # per-row cents before the sum (sum_value_2dp): the scalar
            # double product is bit-identical across engines, so the
            # aggregate is exact integer math
            sum_value_2dp(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@query(
    "q_agg_events_by_type",
    oracle="SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type",
)
def q_agg_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship aggregation: events per type (hash agg,
    partial+final automatically)."""
    return t(spark, sf_dir, "events").groupBy("event_type").agg(F.count("*").alias("cnt"))


@query(
    "q_agg_multi",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS cnt,
           {SQL_SUM_2DP.format(c="value")} AS sum_value,
           {SQL_AVG_4DP.format(c="value")} AS avg_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events GROUP BY event_type
    """,
)
def q_agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            sum_value_2dp("value", "sum_value"),
            avg_value_4dp("value", "avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


@query(
    "q_count_distinct_users",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS users
    FROM events GROUP BY event_type
    """,
)
def q_count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("users"))
    )


_ADP = 6  # HLL precision for q_approx_distinct: m = 64 registers


@query(
    "q_approx_distinct",
    oracle=f"""
    WITH hh AS (SELECT event_type,
                       CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                            AS BIGINT) AS h
                FROM events),
    br AS (SELECT event_type, h % {1 << _ADP} AS bucket, h // {1 << _ADP} AS r
           FROM hh),
    rr AS (SELECT event_type, bucket,
                  CASE WHEN r = 0 THEN {60 - _ADP + 1}
                       ELSE CAST(ROUND(log2(r & (-r))) AS BIGINT) + 1
                  END AS rho
           FROM br),
    sk AS (SELECT event_type, bucket, MAX(rho) AS max_rho
           FROM rr GROUP BY event_type, bucket),
    agg AS (SELECT event_type, COUNT(*) AS n_used,
                   CAST(SUM(CAST(1 AS BIGINT) << CAST({62 - _ADP} - max_rho AS INT))
                        AS BIGINT) AS di
            FROM sk GROUP BY event_type)
    SELECT event_type, CAST({1 << _ADP} AS INT) AS n_registers,
           di + ({1 << _ADP} - n_used) * (CAST(1 AS BIGINT) << {62 - _ADP})
             AS denom_scaled
    FROM agg
    """,
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate COUNT(DISTINCT user_id) per event_type — the scale
    path for distinct counting on 100 TB: one pass, 2^p registers per
    group, mergeable by register-wise MAX (no exact-distinct shuffle).

    Built on the repo's engine-portable HLL (``operators/hll.py``):
    every register and the fixed-point denominator ``denom_scaled``
    (= the sketch's entire information content) are exact int64
    arithmetic reproducible in ANSI SQL, so the driver hash-compares
    them against DuckDB. The float cardinality estimate is a derived
    display value (``hll.hll_estimate``; accuracy asserted against the
    exact count in tests/test_quantile.py); the native HLL++
    ``approx_count_distinct`` sibling is q_approx_distinct_native."""
    from aoseventstreamer_spark.operators import hll

    ev = t(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("string").alias("uid")
    )
    sk = hll.hll_sketch(ev, "uid", _ADP, group_cols=["event_type"])
    return hll.hll_estimate(sk, _ADP, group_cols=["event_type"]).select(
        "event_type", "n_registers", "denom_scaled"
    )


@query(
    "q_rollup_type_day",
    oracle=f"""
    SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           COUNT(*) AS cnt, {SQL_SUM_2DP.format(c="value")} AS sum_value
    FROM events
    GROUP BY ROLLUP(event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
    """,
)
def q_rollup_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts")).cast("date")
    )
    return ev.rollup("event_type", "day").agg(
        F.count("*").alias("cnt"), sum_value_2dp("value", "sum_value")
    )


@query(
    "q_cube_small",
    oracle="""
    SELECT event_type, user_id % 3 AS bucket, COUNT(*) AS cnt
    FROM events GROUP BY CUBE(event_type, user_id % 3)
    """,
)
def q_cube_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").withColumn("bucket", F.col("user_id") % 3)
    return ev.cube("event_type", "bucket").agg(F.count("*").alias("cnt"))


@query(
    "q_grouping_sets",
    oracle="""
    SELECT event_type, bucket, COUNT(*) AS cnt
    FROM (SELECT event_type, user_id % 3 AS bucket FROM events)
    GROUP BY GROUPING SETS ((event_type), (bucket))
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "events").createOrReplaceTempView("gs_events")
    return spark.sql(
        """
        SELECT event_type, bucket, COUNT(*) AS cnt
        FROM (SELECT event_type, user_id % 3 AS bucket FROM gs_events)
        GROUP BY GROUPING SETS ((event_type), (bucket))
        """
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "q_rank_events_per_user",
    oracle="""
    SELECT event_id, user_id,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
           RANK() OVER (PARTITION BY user_id ORDER BY value DESC) AS rk
    FROM events
    """,
)
def q_rank_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w_time = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_val = Window.partitionBy("user_id").orderBy(F.col("value").desc())
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w_time).alias("rn"),
        F.rank().over(w_val).alias("rk"),
    )


@query(
    "q_lag_value_delta",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)
             AS delta
    FROM events
    """,
)
def q_lag_value_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        prev.alias("prev_value"),
        F.round(F.col("value") - prev, 2).alias("delta"),
    )


@query(
    "q_running_sum_frame",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(CAST(ROUND(value*100) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0,
                 2) AS running_sum
    FROM events
    """,
)
def q_running_sum_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with an explicit ROWS frame; integer-cents keeps it
    exact regardless of each engine's frame-evaluation order."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum(cents("value")).over(w) / 100.0, 2).alias("running_sum"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k
# ---------------------------------------------------------------------------


@query(
    "q_topk_global",
    oracle="""
    SELECT event_id, user_id, value FROM events
    ORDER BY value DESC, event_id LIMIT 20
    """,
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (per-partition heaps +
    driver merge; no full sort at scale)."""
    return (
        t(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .orderBy(F.col("value").desc(), "event_id")
        .limit(20)
    )


@query(
    "q_topk_per_group",
    oracle="""
    SELECT event_type, event_id, value FROM (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
      FROM events
    ) WHERE rn <= 5
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), "event_id")
    return (
        ev.select("event_type", "event_id", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "q_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clickers.intersect(buyers)


@query(
    "q_except",
    oracle="""
    SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
    FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
    FROM events WHERE event_type = 'error'
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, day) pairs with views but no errors — daily granularity
    keeps the difference non-empty at every SF, so the EXCEPT surface
    is actually exercised (user-level difference is vacuously empty in
    these fixtures: every user has every event type)."""
    ev = t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    viewers = ev.filter(F.col("event_type") == "view").select("user_id", day)
    erroring = ev.filter(F.col("event_type") == "error").select("user_id", day)
    return viewers.subtract(erroring)


# ---------------------------------------------------------------------------
# Scalar-function suites
# ---------------------------------------------------------------------------


@query(
    "q_string_funcs",
    oracle="""
    SELECT event_id,
           upper(event_type) AS et_upper,
           lower(event_type) AS et_lower,
           substr(event_type, 1, 3) AS et_pre,
           CAST(length(event_type) AS INTEGER) AS et_len,
           concat_ws('-', event_type, CAST(user_id AS VARCHAR)) AS et_key,
           replace(event_type, 'c', 'X') AS et_repl,
           reverse(event_type) AS et_rev,
           lpad(event_type, 10, '*') AS et_pad,
           starts_with(event_type, 'c') AS et_c
    FROM events
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    et = F.col("event_type")
    return ev.select(
        "event_id",
        F.upper(et).alias("et_upper"),
        F.lower(et).alias("et_lower"),
        F.substring(et, 1, 3).alias("et_pre"),
        F.length(et).alias("et_len"),
        F.concat_ws("-", et, F.col("user_id").cast("string")).alias("et_key"),
        F.replace(et, F.lit("c"), F.lit("X")).alias("et_repl"),
        F.reverse(et).alias("et_rev"),
        F.lpad(et, 10, "*").alias("et_pad"),
        et.startswith("c").alias("et_c"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT event_id,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(year(ts) AS INTEGER) AS y,
           CAST(month(ts) AS INTEGER) AS m,
           CAST(day(ts) AS INTEGER) AS d,
           CAST(hour(ts) AS INTEGER) AS h,
           CAST(minute(ts) AS INTEGER) AS mi,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER)
             AS days_since
    FROM events
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    ts = F.col("ts")
    return ev.select(
        "event_id",
        F.date_trunc("day", ts).cast("date").alias("day"),
        F.year(ts).alias("y"),
        F.month(ts).alias("m"),
        F.dayofmonth(ts).alias("d"),
        F.hour(ts).alias("h"),
        F.minute(ts).alias("mi"),
        F.datediff(ts.cast("date"), F.lit("2024-01-01").cast("date")).alias("days_since"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT event_id,
           value * 2 AS dbl,
           value / 4 AS quarter,
           ROUND(sqrt(GREATEST(value, 0)), 6) AS sq,
           abs(value - 100.0) AS dev,
           CAST(FLOOR(value) AS BIGINT) AS fl,
           CAST(CEIL(value) AS BIGINT) AS ce,
           event_id % 7 AS m7
    FROM events
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        (v * 2).alias("dbl"),
        (v / 4).alias("quarter"),
        F.round(F.sqrt(F.greatest(v, F.lit(0.0))), 6).alias("sq"),
        F.abs(v - 100.0).alias("dev"),
        F.floor(v).alias("fl"),
        F.ceil(v).alias("ce"),
        (F.col("event_id") % 7).alias("m7"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           embedding[1] AS first_elem,
           ROUND(list_sum(CAST(embedding AS DOUBLE[])), 4) AS elem_sum,
           label
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over the embedding column —
    aggregate/fold stays JVM-side (no UDF)."""
    emb = t(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("elem_sum"),
        "label",
    )


@query(
    "q_json_props",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
    FROM events
    """,
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select("event_id", k.alias("k_str"), k.cast("int").alias("k_int"))


# ---------------------------------------------------------------------------
# Event-time windows (streaming semantics, batch-checked)
# ---------------------------------------------------------------------------


@query(
    "q_window_tumbling",
    oracle=f"""
    SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) AS win_start,
           COUNT(*) AS cnt, {SQL_SUM_2DP.format(c="value")} AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window (Spark aligns to the epoch; DuckDB's
    time_bucket origin 2000-01-01 is equi-aligned for minute
    granularities that divide 946684800 s)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"), sum_value_2dp("value", "sum_value"))
        .select(F.col("w.start").alias("win_start"), "cnt", "sum_value")
    )


@query(
    "q_window_sliding",
    oracle=f"""
    WITH t AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    w AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts) AS win_start, value FROM t
      UNION ALL
      SELECT time_bucket(INTERVAL '15 minutes', ts) - INTERVAL '15 minutes'
               AS win_start, value FROM t
    )
    SELECT win_start, COUNT(*) AS cnt, {SQL_SUM_2DP.format(c="value")} AS sum_value
    FROM w GROUP BY win_start
    """,
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (30 min width / 15 min slide): every event lands
    in exactly 2 windows."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "30 minutes", "15 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"), sum_value_2dp("value", "sum_value"))
        .select(F.col("w.start").alias("win_start"), "cnt", "sum_value")
    )


@query(
    "q_session_window",
    oracle="""
    WITH o AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ), s AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window, 30-min gap per user. Spark merges event windows
    [ts, ts+gap) that overlap OR TOUCH: an event exactly gap after the
    previous one still extends the session, so a new session starts
    only when the inter-event time is strictly greater than the gap
    (verified against session_window on boundary fixtures); session
    end = last ts + gap. The oracle is the classic gaps-and-islands
    formulation with the matching strict break."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "q_join_tpch_q5",
    oracle="""
    SELECT n.n_name AS nation_name,
           ROUND(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
                 / 100.0, 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND c.c_nationkey = s.s_nationkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    """,
)
def q_join_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join (local-supplier revenue by nation).
    nation/region broadcast (fixed dims); supplier/customer join
    unhinted (SF-scaling); lineitem⋈orders carries the one big shuffle; the c_nationkey = s_nationkey local-supplier predicate
    is applied post-join as in the spec query."""
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    lineitem = t(spark, sf_dir, "lineitem")
    supplier = (t(spark, sf_dir, "supplier"))
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    region = F.broadcast(t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            sum_value_2dp(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
    )


@query(
    "q_bloom_join",
    oracle=f"""
    SELECT l.l_returnflag,
           COUNT(*) AS n_items,
           {SQL_SUM_2DP.format(c="l.l_quantity")} AS sum_qty
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey % 97 = 0
    GROUP BY l.l_returnflag
    """,
)
def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-reduced fact-fact join (the classic 100 TB shuffle-saver,
    operators/bloom.bloom_semi_reduce): the build side is a ~1%
    selective orders subset the PLANNER cannot see the selectivity of;
    a packed-bitmap Bloom filter over its keys broadcasts as one map
    row and drops non-matching lineitem rows with a narrow k-probe bit
    test BEFORE the join shuffle. No false negatives, so the exact
    join's result — what this query returns — is IDENTICAL to the
    plain join, and the oracle is exactly that plain join: the hash
    match proves the reduction is semantics-preserving while the probe
    side sheds ~99% of its shuffle volume (measured in
    tests/test_spans_bloom.py)."""
    from aoseventstreamer_spark.operators.bloom import bloom_semi_reduce

    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    reduced = bloom_semi_reduce(
        li, orders, key_col="l_orderkey", build_key="o_orderkey"
    )
    return (
        reduced.join(orders, reduced["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            sum_value_2dp("l_quantity", "sum_qty"),
        )
    )
