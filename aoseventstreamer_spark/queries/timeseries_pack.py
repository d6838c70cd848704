"""Time-series repair & feature pack: per-key gap filling.

The engine already has a GLOBAL date spine with zero-fill
(q_date_spine_gapfill) and windowed aggregates; what a metrics /
feature-store workload additionally needs is PER-KEY series repair —
every key gets its own regular grid bounded by its own observations,
missing buckets are filled by last-observation-carried-forward (LOCF)
or linear interpolation, and decay-weighted rolling features are
computed over the irregular raw series. All three are expressed in
exact integer arithmetic (cents; rational numerator/denominator for
the interpolation) so the DuckDB oracles are hash-exact, never
float-tolerant.

Scale posture: the per-key spine is `sequence()` + `explode` on the
key's own (min, max) bounds — generated executor-side, never a driver
loop; grid size is span×keys, bounded here by the purchase filter.
Each query is one keyed shuffle for the grid join plus one window pass
partitioned by the key; nothing is quadratic and nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aoseventstreamer_spark.queries import cents, query, t


def _purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 40)
    )


_DAILY_OBS_SQL = """
    obs AS (
      SELECT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS c
      FROM events
      WHERE event_type = 'purchase' AND user_id < 40
      GROUP BY 1, 2
    ), b AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM obs GROUP BY 1
    ), spine AS (
      SELECT user_id, CAST(g AS DATE) AS day
      FROM b, UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) t(g)
    ), joined AS (
      SELECT s.user_id, s.day, o.c
      FROM spine s LEFT JOIN obs o USING (user_id, day)
    )
"""


def _daily_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily grid over each user's own [min, max] day with
    the observed sum-of-cents (null on gap days)."""
    obs = (
        _purchases(spark, sf_dir)
        .groupBy(
            "user_id",
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
        )
        .agg(F.sum(cents("value")).alias("c"))
    )
    bounds = obs.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    return spine.join(obs, ["user_id", "day"], "left")


@query(
    "q_locf_fill",
    oracle=f"""
    WITH {_DAILY_OBS_SQL}
    SELECT user_id, day,
           last_value(c IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_cents
    FROM joined
    """,
)
def q_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward gap fill: each user's daily
    purchase series on its own dense grid, gap days taking the most
    recent observed value (exact integer cents; days before the first
    observation stay null — none exist here since the grid starts at
    the user's min). Spark: ``last(c, ignorenulls=True)`` over a
    running row frame — ONE window pass per key after the grid join;
    the DuckDB oracle is the standard ``last_value IGNORE NULLS``
    spelling of the same repair."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return _daily_grid(spark, sf_dir).select(
        "user_id",
        "day",
        F.last("c", ignorenulls=True).over(w).alias("filled_cents"),
    )


@query(
    "q_linear_interp",
    oracle=f"""
    WITH {_DAILY_OBS_SQL}
    SELECT user_id, day,
           CASE WHEN c IS NOT NULL THEN c
                ELSE pc * (nd - pd) + (nc - pc) * (day - pd) END AS interp_num,
           CASE WHEN c IS NOT NULL THEN 1
                ELSE nd - pd END AS interp_den
    FROM (
      SELECT user_id, day, c,
             last_value(c IGNORE NULLS) OVER wp AS pc,
             last_value(CASE WHEN c IS NOT NULL THEN day END IGNORE NULLS)
               OVER wp AS pd,
             first_value(c IGNORE NULLS) OVER wn AS nc,
             first_value(CASE WHEN c IS NOT NULL THEN day END IGNORE NULLS)
               OVER wn AS nd
      FROM joined
      WINDOW wp AS (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    """,
)
def q_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of gap days between the neighboring
    observations, kept EXACT by emitting the value as a rational:
    ``interp_num / interp_den`` where
    num = prev·(d_next−d_prev) + (next−prev)·(d−d_prev),
    den = d_next−d_prev (observed days are num=c, den=1). Emitting the
    rational instead of dividing sidesteps the one cross-engine trap —
    integer-division semantics (truncate vs floor) differ for negative
    numerators. Two window passes (backward LOCF, forward NOCB) over
    the same key partitioning, no extra shuffle between them. Grid
    edges (a user's first/last day) are always observed, so no
    null-neighbor case exists."""
    day_i = F.datediff("day", F.lit("1970-01-01"))
    wp = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("c").isNotNull(), day_i)
    g = _daily_grid(spark, sf_dir).select(
        "user_id",
        "day",
        "c",
        day_i.alias("di"),
        F.last("c", ignorenulls=True).over(wp).alias("pc"),
        F.last(obs_day, ignorenulls=True).over(wp).alias("pd"),
        F.first("c", ignorenulls=True).over(wn).alias("nc"),
        F.first(obs_day, ignorenulls=True).over(wn).alias("nd"),
    )
    return g.select(
        "user_id",
        "day",
        F.when(F.col("c").isNotNull(), F.col("c"))
        .otherwise(
            F.col("pc") * (F.col("nd") - F.col("pd"))
            + (F.col("nc") - F.col("pc")) * (F.col("di") - F.col("pd"))
        )
        .cast("long")
        .alias("interp_num"),
        F.when(F.col("c").isNotNull(), F.lit(1))
        .otherwise(F.col("nd") - F.col("pd"))
        .cast("long")
        .alias("interp_den"),
    )


def _ewma_terms(k: int) -> str:
    terms = []
    for i in range(k):
        terms.append(
            f"COALESCE(lag(c, {i}) OVER (PARTITION BY user_id "
            f"ORDER BY CAST(ts AS TIMESTAMP), event_id), 0) * {2 ** (k - 1 - i)}"
        )
    return " + ".join(terms)


@query(
    "q_ewma_decay",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CAST(ROUND(value*100) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase' AND user_id < 40
    )
    SELECT user_id, event_id,
           CAST({_ewma_terms(16)} AS BIGINT) AS ewma_num
    FROM e
    """,
)
def q_ewma_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decay-weighted rolling feature (EWMA, α=1/2, 16-lag horizon)
    per user over the irregular event series, EXACT: the feature is
    the integer numerator Σᵢ cents(x_{t−i})·2^(15−i) — the α=1/2
    EWMA truncated at 16 terms and scaled by 2^15, so both engines
    compute identical BIGINTs and the hash can't drift the way a
    float recurrence would. All 16 lag terms share one window
    specification, so Catalyst plans a SINGLE WindowExec pass — one
    shuffle by user, no self-joins. Ties on ts are broken by the
    unique event_id on both sides."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = cents("value")
    expr = None
    for i in range(16):
        term = F.coalesce(F.lag(c, i).over(w), F.lit(0)) * F.lit(
            2 ** (15 - i)
        )
        expr = term if expr is None else expr + term
    return _purchases(spark, sf_dir).select(
        "user_id", "event_id", expr.cast("long").alias("ewma_num")
    )
