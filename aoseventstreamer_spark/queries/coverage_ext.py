"""Second coverage pack: window navigation (ntile/percent_rank/
cume_dist/nth_value), regex functions, conditional expressions,
distinct set union, correlated EXISTS, interval arithmetic. All
DuckDB-hash-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aoseventstreamer_spark.queries import cents, query, t


@query(
    "q_window_navigation",
    oracle="""
    SELECT event_id, user_id,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pr,
           ROUND(CUME_DIST() OVER w, 6) AS cd,
           FIRST_VALUE(event_id) OVER w AS first_id,
           NTH_VALUE(event_id, 2) OVER w AS second_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation window functions over a deterministic (ts, event_id)
    order; the explicit unbounded frame makes ntile/percent_rank/
    nth_value agree across engines' default-frame conventions."""
    ev = t(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    framed = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.ntile(4).over(order).alias("quartile"),
        F.round(F.percent_rank().over(order), 6).alias("pr"),
        F.round(F.cume_dist().over(order), 6).alias("cd"),
        F.first("event_id").over(framed).alias("first_id"),
        F.nth_value("event_id", 2).over(framed).alias("second_id"),
    )


@query(
    "q_regex_funcs",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled_head,
           regexp_matches(text, 'spark') AS mentions_spark,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_numbers
    FROM (SELECT doc_id, substr(text, 1, 80) AS text FROM documents)
    """,
)
def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex suite on an 80-char prefix (ASCII-safe patterns where the
    Java and RE2 engines agree)."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 80).alias("text")
    )
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("text", r"[aeiou]", "_").alias("devoweled_head"),
        F.col("text").rlike("spark").alias("mentions_spark"),
        F.size(F.regexp_extract_all("text", F.lit(r"[0-9]+"), F.lit(0))).alias("n_numbers"),
    )


@query(
    "q_conditional_funcs",
    oracle="""
    SELECT event_id,
           CASE WHEN value > 150 THEN 'high' WHEN value > 50 THEN 'mid'
                ELSE 'low' END AS tier,
           COALESCE(NULLIF(event_type, 'error'), 'unknown') AS safe_type,
           IF(user_id % 2 = 0, 'even', 'odd') AS parity,
           GREATEST(value, 100.0) AS at_least_100,
           LEAST(CAST(user_id AS DOUBLE), 10.0) AS capped_uid
    FROM events
    """,
)
def q_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.when(v > 150, "high").when(v > 50, "mid").otherwise("low").alias("tier"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("unknown")).alias("safe_type"),
        F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd").alias("parity"),
        F.greatest(v, F.lit(100.0)).alias("at_least_100"),
        F.least(F.col("user_id").cast("double"), F.lit(10.0)).alias("capped_uid"),
    )


@query(
    "q_union_distinct",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'view'
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) vs the UNION ALL of q_union_subjects."""
    ev = t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "view").select("user_id")
    return a.union(b).distinct()


@query(
    "q_exists_correlated",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS in SQL form (Catalyst decorrelates it into the
    same left-semi join the DataFrame API would build)."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("ec_customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("ec_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM ec_customer c
        WHERE EXISTS (SELECT 1 FROM ec_orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        """
    )


@query(
    "q_interval_arith",
    oracle="""
    SELECT event_id,
           CAST(ts AS TIMESTAMP) + INTERVAL '90 minutes' AS deadline,
           CAST(ts AS TIMESTAMP) - INTERVAL '1 day' AS day_before,
           CAST(CAST(ts AS DATE) + INTERVAL '7 days' AS DATE) AS next_week
    FROM events
    """,
)
def q_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    ts = F.col("ts")
    return ev.select(
        "event_id",
        (ts + F.expr("INTERVAL 90 minutes")).alias("deadline"),
        (ts - F.expr("INTERVAL 1 day")).alias("day_before"),
        F.date_add(ts.cast("date"), 7).alias("next_week"),
    )


@query(
    "q_lateral_topn",
    oracle="""
    SELECT n.n_name, top.c_custkey, top.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_custkey, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 2
    ) AS top
    """,
)
def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 customers per nation) in SQL
    form. Catalyst decorrelates the lateral ORDER BY ... LIMIT into a
    rank-filtered window over one customer shuffle — same physical
    plan a hand-written row_number() query gets, so the lateral form
    is free at 100 TB: no per-nation re-scan of the fact table, unlike
    a literal nested-loop interpretation."""
    t(spark, sf_dir, "nation").createOrReplaceTempView("lt_nation")
    t(spark, sf_dir, "customer").createOrReplaceTempView("lt_customer")
    return spark.sql(
        """
        SELECT n.n_name, top.c_custkey, top.c_acctbal
        FROM lt_nation n, LATERAL (
          SELECT c_custkey, c_acctbal FROM lt_customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 2
        ) AS top
        """
    )


@query(
    "q_recursive_cte",
    oracle="""
    WITH RECURSIVE series(day_n, running) AS (
      SELECT 1, 1
      UNION ALL
      SELECT day_n + 1, running + day_n + 1 FROM series WHERE day_n < 30
    )
    SELECT day_n, running FROM series
    """,
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (iterate-until-done inside one SQL statement —
    Spark 4 executes it as an iterative union loop). The relational
    form of the pointer-doubling loops operators/components.py builds
    by hand; here the engine handles the fixpoint."""
    return spark.sql(
        """
        WITH RECURSIVE series(day_n, running) AS (
          SELECT 1, 1
          UNION ALL
          SELECT day_n + 1, running + day_n + 1 FROM series WHERE day_n < 30
        )
        SELECT day_n, running FROM series
        """
    )


@query(
    "q_join_full_outer",
    oracle="""
    SELECT g.user_id AS user_id,
           g.n_events, b.buy_cents
    FROM (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
          FROM events WHERE event_type <> 'purchase' GROUP BY user_id) g
    FULL OUTER JOIN
         (SELECT user_id, CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)
                   AS buy_cents
          FROM events WHERE event_type = 'purchase' GROUP BY user_id) b
      ON g.user_id = b.user_id
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregated frames — users active but
    never buying, buying-only users, and both, in one result with
    nulls marking the absent side. Spark plans full-outer as one
    SortMergeJoin over the shared user_id exchange: both inputs
    aggregate on the same key, so AQE reuses the partitioning and the
    outer join adds no extra shuffle.

    Note the join key is COALESCEd into one output column — the
    USING-style semantics both engines agree on."""
    ev = t(spark, sf_dir, "events")
    g = (
        ev.filter(F.col("event_type") != "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(cents("value")).alias("buy_cents"))
    )
    gb = g.alias("g").join(
        b.alias("b"), F.col("g.user_id") == F.col("b.user_id"), "full_outer"
    )
    return gb.select(
        F.coalesce(F.col("g.user_id"), F.col("b.user_id")).alias("user_id"),
        "n_events",
        "buy_cents",
    )


@query(
    "q_unpivot",
    oracle="""
    WITH wide AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS even_users,
             CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS odd_users
      FROM events GROUP BY event_type
    )
    SELECT event_type, parity, cnt
    FROM wide UNPIVOT (cnt FOR parity IN (even_users, odd_users))
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide per-type counts back to long form — the
    inverse of q_pivot_types, via the native unpivot operator (a
    zero-shuffle Expand node, not a UNION of self-scans)."""
    ev = t(spark, sf_dir, "events")
    wide = ev.groupBy("event_type").agg(
        F.sum((F.col("user_id") % 2 == 0).cast("long")).alias("even_users"),
        F.sum((F.col("user_id") % 2 == 1).cast("long")).alias("odd_users"),
    )
    return wide.unpivot(
        ids=["event_type"],
        values=["even_users", "odd_users"],
        variableColumnName="parity",
        valueColumnName="cnt",
    )


@query(
    "q_mode_median",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS cents
      FROM events
    ), freq AS (
      SELECT event_type, cents, COUNT(*) AS n
      FROM c GROUP BY event_type, cents
    ), best AS (
      SELECT event_type, cents AS mode_cents,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY n DESC, cents) AS rn
      FROM freq
    ), med AS (
      SELECT event_type,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT)
               AS median_lo_cents
      FROM c GROUP BY event_type
    )
    SELECT b.event_type, b.mode_cents, m.median_lo_cents
    FROM best b JOIN med m ON b.event_type = m.event_type
    WHERE b.rn = 1
    """,
)
def q_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode + discrete median per group. Engines'
    native mode() tie-breaks arbitrarily, so the mode is computed as
    count-then-rank with an explicit (n DESC, value) order — same
    shape, deterministic everywhere. The median is percentile_disc
    (the lower middle element — an actual data value, no
    interpolation), on integer cents."""
    ev = t(spark, sf_dir, "events")
    c = ev.select("event_type", cents("value").alias("cents"))
    freq = c.groupBy("event_type", "cents").agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc(), "cents")
    best = (
        freq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("cents").alias("mode_cents"))
    )
    med = c.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)")
        .cast("long")
        .alias("median_lo_cents")
    )
    return best.join(med, "event_type")
