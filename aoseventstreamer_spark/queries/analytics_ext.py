"""Extended analytics surface: statistical aggregates, subqueries,
pivots, ordered collection aggregates, histograms. All hash-checked
against DuckDB (determinism notes inline — ordered collects, rounded
statistical aggregates, cents-exact thresholds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aoseventstreamer_spark.queries import query, t


@query(
    "q_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.9), 4) AS p90,
           ROUND(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines implement the
    standard linear-interpolation definition; round 4 absorbs the
    final-arithmetic ulps). The approximate scale path is
    approx_percentile — engine-specific sketch, so not oracled."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


@query(
    "q_stats_corr",
    oracle="""
    SELECT event_type,
           ROUND(stddev_samp(value), 4) AS sd,
           ROUND(var_samp(value), 2) AS var,
           ROUND(corr(value, CAST(user_id AS DOUBLE)), 6) AS c,
           ROUND(covar_samp(value, CAST(user_id AS DOUBLE)), 4) AS cv
    FROM events GROUP BY event_type
    """,
)
def q_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    uid = F.col("user_id").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 4).alias("sd"),
        F.round(F.var_samp("value"), 2).alias("var"),
        F.round(F.corr(F.col("value"), uid), 6).alias("c"),
        F.round(F.covar_samp(F.col("value"), uid), 4).alias("cv"),
    )


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE value > (SELECT SUM(CAST(ROUND(value*100) AS BIGINT))
                          / (100.0*COUNT(*)) FROM events)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter vs a scalar subquery. The threshold is left UNROUNDED:
    exact integer cents divided by 100.0*n is the same IEEE double in
    both engines, whereas ROUND(x, 2) can diverge on decimal ties
    (Spark rounds the decimal string HALF_UP, DuckDB rounds the binary
    value)."""
    t(spark, sf_dir, "events").createOrReplaceTempView("ssq_events")
    return spark.sql(
        """
        SELECT event_id, user_id, value
        FROM ssq_events
        WHERE value > (SELECT SUM(CAST(ROUND(value*100) AS BIGINT))
                              / (100.0*COUNT(*)) FROM ssq_events)
        """
    )


@query(
    "q_pivot_types",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS clicks,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases,
           COUNT(*) FILTER (WHERE event_type = 'error') AS errors,
           COUNT(*) FILTER (WHERE event_type = 'view') AS views,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signups
    FROM events GROUP BY user_id
    """,
)
def q_pivot_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide counts per type). Implemented with conditional
    aggregation rather than .pivot() so column names are fixed."""
    ev = t(spark, sf_dir, "events")

    def cnt(et: str, alias: str):
        return F.count(F.when(F.col("event_type") == et, 1)).alias(alias)

    return ev.groupBy("user_id").agg(
        cnt("click", "clicks"),
        cnt("purchase", "purchases"),
        cnt("error", "errors"),
        cnt("view", "views"),
        cnt("signup", "signups"),
    )


@query(
    "q_string_agg",
    oracle="""
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
    FROM events GROUP BY user_id
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered collection aggregate — sort_array makes the
    nondeterministic collect order canonical on both engines."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.sort_array(F.collect_set("event_type")), ","
        ).alias("types")
    )


@query(
    "q_histogram",
    oracle="""
    SELECT CAST(FLOOR(value / 20) AS BIGINT) AS bucket, COUNT(*) AS cnt,
           MIN(value) AS lo, MAX(value) AS hi
    FROM events GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.col("value") / 20).cast("long").alias("bucket")
    ).agg(
        F.count("*").alias("cnt"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


@query(
    "q_bool_aggs",
    oracle="""
    SELECT user_id,
           bool_or(event_type = 'purchase') AS ever_bought,
           bool_and(value > 0) AS all_positive,
           COUNT(*) FILTER (WHERE value > 100) AS n_big
    FROM events GROUP BY user_id
    """,
)
def q_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.bool_or(F.col("event_type") == "purchase").alias("ever_bought"),
        F.bool_and(F.col("value") > 0).alias("all_positive"),
        F.count(F.when(F.col("value") > 100, 1)).alias("n_big"),
    )


@query("q_approx_percentile")  # rows-only: sketch is engine-specific
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path: one-pass mergeable sketch."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_percentile("value", F.lit(0.5), F.lit(1000)).alias("p50_approx")
    )


@query(
    "q_winsorize",
    oracle="""
    WITH c AS (SELECT event_id, event_type,
                      CAST(ROUND(value * 100) AS BIGINT) AS value_cents
               FROM events),
    pct AS (SELECT event_type,
                   percentile_disc(0.05) WITHIN GROUP (ORDER BY value_cents)
                     AS p05_cents,
                   percentile_disc(0.95) WITHIN GROUP (ORDER BY value_cents)
                     AS p95_cents
            FROM c GROUP BY event_type)
    SELECT c.event_id, c.event_type, c.value_cents,
           LEAST(GREATEST(c.value_cents, p.p05_cents), p.p95_cents)
             AS winsorized_cents,
           c.value_cents <> LEAST(GREATEST(c.value_cents, p.p05_cents),
                                  p.p95_cents) AS clamped
    FROM c JOIN pct p USING (event_type)
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — the outlier-capping step of a feature/quality
    pipeline: every value clamps to its group's exact [p05, p95]
    band. Percentiles are percentile_disc over integer cents (an
    actual data value, no interpolation — the only percentile with a
    deterministic cross-engine answer), computed per group in one
    aggregate and joined back broadcast: two shuffles total, the
    second a map-side broadcast join at any fact size."""
    ev = t(spark, sf_dir, "events")
    c = ev.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    pct = c.groupBy("event_type").agg(
        F.expr(
            "percentile_disc(0.05) WITHIN GROUP (ORDER BY value_cents)"
        ).cast("long").alias("p05_cents"),
        F.expr(
            "percentile_disc(0.95) WITHIN GROUP (ORDER BY value_cents)"
        ).cast("long").alias("p95_cents"),
    )
    win = F.least(
        F.greatest(F.col("value_cents"), F.col("p05_cents")),
        F.col("p95_cents"),
    )
    return (
        c.join(F.broadcast(pct), "event_type")
        .select(
            "event_id",
            "event_type",
            "value_cents",
            win.alias("winsorized_cents"),
            (F.col("value_cents") != win).alias("clamped"),
        )
    )
