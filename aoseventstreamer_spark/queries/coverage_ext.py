"""Second coverage pack: window navigation (ntile/percent_rank/
cume_dist/nth_value), regex functions, conditional expressions,
distinct set union, correlated EXISTS, interval arithmetic. All
DuckDB-hash-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aoseventstreamer_spark.queries import query, t


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
