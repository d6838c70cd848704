"""Event-analytics extension 2: path/transition analysis, integer-
exact anomaly detection, co-occurrence, and value deciles.

The product-analytics queries a real event platform runs on top of the
routed log (SURVEY.md §2.B "beyond the reference"). All oracles are
hash-exact: probabilities/shares round through scale-0 integers, and
the anomaly rule is cross-multiplied into pure integer arithmetic so
no engine ever compares derived doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aoseventstreamer_spark.queries import cents, query, t


@query(
    "q_path_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS next_type
      FROM events
    ), pairs AS (
      SELECT event_type AS from_type, next_type AS to_type
      FROM ordered WHERE next_type IS NOT NULL
    ), counted AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM pairs GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           CAST(ROUND(n * 1000000.0 / SUM(n) OVER (PARTITION BY from_type))
                AS BIGINT) / 1000000.0 AS p
    FROM counted
    """,
)
def q_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix over per-user event paths: LEAD within
    (user, time) order, pair counts, and row-normalized transition
    probabilities. One shuffle on user_id for the sequence step, one
    tiny (|types|^2) aggregate after — the 100 TB shape for path
    analysis. event_id breaks timestamp ties so both engines walk the
    same sequence."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .select(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
    )
    counted = pairs.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    wt = Window.partitionBy("from_type")
    return counted.select(
        "from_type",
        "to_type",
        "n",
        (
            F.round(F.col("n") * 1000000.0 / F.sum("n").over(wt)).cast("long")
            / 1000000.0
        ).alias("p"),
    )


@query(
    "q_anomaly_zscore",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             COUNT(*) AS cnt
      FROM events GROUP BY event_type, day
    ), stats AS (
      SELECT event_type, COUNT(*) AS n, SUM(cnt) AS s, SUM(cnt * cnt) AS ss
      FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.day, d.cnt,
           (d.cnt * st.n - st.s) * (d.cnt * st.n - st.s)
             > 4 * (st.n * st.ss - st.s * st.s) AS is_anomaly
    FROM daily d JOIN stats st ON d.event_type = st.event_type
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly flags per event type: |cnt - mean| > 2*std
    cross-multiplied into pure integers — (cnt*n - S)^2 > 4*(n*SS - S^2)
    — so the z-score never exists as a float on either engine. The
    per-type stats frame is |types| rows and broadcasts back onto the
    daily counts; two shuffles total (daily agg, stats agg), both tiny
    after the first map-side combine.

    Range note: the integer form needs S^2 and (cnt*n - S)^2 to fit in
    int64 — safe while per-type totals stay under ~3e9 rows per stats
    window. Beyond that, window the stats (per month) or drop to the
    double z-score, which no longer needs cross-engine exactness."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count("*").alias("cnt"))
    stats = daily.groupBy(F.col("event_type").alias("st_type")).agg(
        F.count("*").alias("n"),
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss"),
    )
    j = daily.join(
        F.broadcast(stats), daily.event_type == stats.st_type
    )
    dev = F.col("cnt") * F.col("n") - F.col("s")
    var_n2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    return j.select(
        "event_type",
        "day",
        "cnt",
        (dev * dev > 4 * var_n2).alias("is_anomaly"),
    )


@query(
    "q_event_cooccurrence",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_users
    FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY type_a, type_b
    """,
)
def q_event_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: for each unordered pair of event
    types, how many users did both. The distinct (user, type) frame is
    at most |users| x |types| rows — orders of magnitude smaller than
    the log — and self-joins on user_id: one dedup shuffle + one
    equi-join on the same key."""
    ev = t(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select(F.col("user_id").alias("user_b"), F.col("event_type").alias("type_b"))
    return (
        a.join(b, (a.user_id == b.user_b) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "q_user_value_deciles",
    oracle="""
    WITH per_user AS (
      SELECT user_id, SUM(CAST(ROUND(value*100) AS BIGINT)) AS total_c
      FROM events GROUP BY user_id
    ), ranked AS (
      SELECT user_id, total_c,
             NTILE(10) OVER (ORDER BY total_c, user_id) AS decile
      FROM per_user
    )
    SELECT decile, COUNT(*) AS n_users,
           ROUND(SUM(total_c)/100.0, 2) AS total_value,
           ROUND(MIN(total_c)/100.0, 2) AS min_value,
           ROUND(MAX(total_c)/100.0, 2) AS max_value
    FROM ranked GROUP BY decile
    """,
)
def q_user_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifetime-value deciles: per-user totals (exact cents), NTILE
    into 10 buckets (user_id tiebreak makes the split engine-
    deterministic), per-decile stats. The NTILE runs over the
    AGGREGATED per-user frame — 4-5 orders of magnitude smaller than
    the event log — and uses operators/ranking.ntile_exact (two-phase
    distributed global rank), so even at 10^9+ users no single task
    ever sees the whole per-user frame; the plan gate
    (tests/test_window_gate.py) holds the query to that shape."""
    from aoseventstreamer_spark.operators.ranking import ntile_exact

    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(cents("value")).alias("total_c")
    )
    ranked = ntile_exact(
        per_user,
        10,
        [F.asc("total_c"), F.asc("user_id")],
        bucket_col="decile",
    )
    return ranked.groupBy("decile").agg(
        F.count("*").alias("n_users"),
        F.round(F.sum("total_c") / 100.0, 2).alias("total_value"),
        F.round(F.min("total_c") / 100.0, 2).alias("min_value"),
        F.round(F.max("total_c") / 100.0, 2).alias("max_value"),
    )


@query(
    "q_table_profile",
    oracle="""
    SELECT 'event_id' AS col, COUNT(*) AS n_rows,
           COUNT(event_id) AS n_nonnull,
           COUNT(DISTINCT event_id) AS n_distinct,
           CAST(MIN(event_id) AS VARCHAR) AS min_val,
           CAST(MAX(event_id) AS VARCHAR) AS max_val
    FROM events
    UNION ALL
    SELECT 'user_id', COUNT(*), COUNT(user_id), COUNT(DISTINCT user_id),
           CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR)
    FROM events
    UNION ALL
    SELECT 'event_type', COUNT(*), COUNT(event_type), COUNT(DISTINCT event_type),
           MIN(event_type), MAX(event_type)
    FROM events
    UNION ALL
    SELECT 'value', COUNT(*), COUNT(value),
           COUNT(DISTINCT CAST(ROUND(value*100) AS BIGINT)),
           CAST(MIN(CAST(ROUND(value*100) AS BIGINT)) AS VARCHAR),
           CAST(MAX(CAST(ROUND(value*100) AS BIGINT)) AS VARCHAR)
    FROM events
    """,
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling report (the ANALYZE TABLE / data-quality-check
    shape): per-column row count, null count, exact distinct count,
    and min/max, emitted as one tall frame. One pass over the scan —
    all four column profiles aggregate in a single groupBy-less
    aggregate, then pivot tall via explode of a struct array (no
    second scan). Doubles profile via integer cents so both engines
    count the same distincts; min/max stringified so heterogeneous
    column types share one schema at 100 TB table widths."""
    ev = t(spark, sf_dir, "events")
    wide = ev.agg(
        F.count("*").alias("n_rows"),
        F.count("event_id").alias("nn_event_id"),
        F.count_distinct("event_id").alias("nd_event_id"),
        F.min("event_id").cast("string").alias("mn_event_id"),
        F.max("event_id").cast("string").alias("mx_event_id"),
        F.count("user_id").alias("nn_user_id"),
        F.count_distinct("user_id").alias("nd_user_id"),
        F.min("user_id").cast("string").alias("mn_user_id"),
        F.max("user_id").cast("string").alias("mx_user_id"),
        F.count("event_type").alias("nn_event_type"),
        F.count_distinct("event_type").alias("nd_event_type"),
        F.min("event_type").alias("mn_event_type"),
        F.max("event_type").alias("mx_event_type"),
        F.count("value").alias("nn_value"),
        F.count_distinct(cents("value")).alias("nd_value"),
        F.min(cents("value")).cast("string").alias("mn_value"),
        F.max(cents("value")).cast("string").alias("mx_value"),
    )
    profile = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"nn_{c}").alias("n_nonnull"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").alias("min_val"),
                F.col(f"mx_{c}").alias("max_val"),
            )
            for c in ["event_id", "user_id", "event_type", "value"]
        ]
    )
    return wide.select("n_rows", F.explode(profile).alias("p")).select(
        F.col("p.col").alias("col"),
        "n_rows",
        F.col("p.n_nonnull").alias("n_nonnull"),
        F.col("p.n_distinct").alias("n_distinct"),
        F.col("p.min_val").alias("min_val"),
        F.col("p.max_val").alias("max_val"),
    )


_PR_EDGES_CTE = """
  SELECT event_type AS src, next_type AS dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM (SELECT event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY CAST(ts AS TIMESTAMP), event_id)
                 AS next_type
        FROM events)
  WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
"""


def _pr_oracle() -> str:
    from aoseventstreamer_spark.operators.graph import pagerank_oracle_sql

    return pagerank_oracle_sql(_PR_EDGES_CTE, iters=5, damping_pct=85)


@query("q_pagerank", oracle=_pr_oracle())
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact PageRank (operators/graph.py) over the event-type
    transition graph (same LEAD-derived edges as q_path_transitions).
    Hash-exact vs a DuckDB oracle that unrolls the identical integer
    recurrence as chained CTEs — possible because every step is
    BIGINT multiply/floor-divide, so shuffle order cannot perturb a
    single bit. 5 iterations, damping 0.85."""
    from aoseventstreamer_spark.operators.graph import pagerank

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("src"), F.col("next_type").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    return pagerank(
        edges, iters=5, damping_pct=85, weight_col="w", broadcast_ranks=True
    )


# Shared oracle CTE chain for the co-purchase triangle queries:
# lineitem self-join pairs → weight>=2 edges → (deg,id)-oriented DAG →
# wedge join → closure probe. Mirrors operators/graph.triangles.
_TRI_CTES = """
    li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    pr AS (SELECT a.pk AS u, b.pk AS v FROM li a
           JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
    ew AS (SELECT u, v FROM pr GROUP BY u, v HAVING COUNT(*) >= 2),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM
              (SELECT u AS node FROM ew UNION ALL SELECT v FROM ew)
            GROUP BY node),
    o AS (SELECT CASE WHEN du.deg < dv.deg
                        OR (du.deg = dv.deg AND e.u < e.v)
                      THEN e.u ELSE e.v END AS a,
                 CASE WHEN du.deg < dv.deg
                        OR (du.deg = dv.deg AND e.u < e.v)
                      THEN e.v ELSE e.u END AS b
          FROM ew e JOIN deg du ON e.u = du.node
                    JOIN deg dv ON e.v = dv.node),
    wed AS (SELECT w1.a AS x, w1.b AS y, w2.b AS z
            FROM o w1 JOIN o w2 ON w1.a = w2.a AND w1.b < w2.b),
    tri AS (SELECT x, y, z FROM wed
            WHERE EXISTS (SELECT 1 FROM o
                          WHERE LEAST(o.a, o.b) = wed.y
                            AND GREATEST(o.a, o.b) = wed.z))
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    )
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= 2)
        .select("src", "dst")
    )


@query(
    "q_triangle_stats",
    oracle=f"""
    WITH {_TRI_CTES}
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM tri) AS n_triangles,
           (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) FROM deg)
             AS n_wedges,
           (SELECT CASE WHEN SUM(deg * (deg - 1) // 2) = 0 THEN 0
                   ELSE (3 * (SELECT COUNT(*) FROM tri) * 1000000)
                        // SUM(deg * (deg - 1) // 2) END
            FROM deg) AS gcc_micro
    """,
)
def q_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle census of the co-purchase graph (parts linked
    when bought together in >= 2 orders): triangle count, wedge count
    Σ C(deg,2), and the global clustering coefficient 3·tri/wedges in
    integer micro-units. The triangle pass orients edges by (degree,
    id) — Suri & Vassilvitskii 2011 — so the wedge self-join is
    skew-bounded (out-degree O(sqrt|E|)) no matter how hot the
    best-selling part is; the closure check is a semi-join, so no
    triangle row ever shuffles twice."""
    from aoseventstreamer_spark.operators.graph import triangle_stats

    return triangle_stats(_copurchase_edges(spark, sf_dir))


@query(
    "q_triangle_top_nodes",
    oracle=f"""
    WITH {_TRI_CTES},
    tn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM
             (SELECT x AS node FROM tri UNION ALL
              SELECT y FROM tri UNION ALL
              SELECT z FROM tri)
           GROUP BY node),
    top AS (SELECT t.node, t.n_tri, d.deg,
                   (2 * t.n_tri * 1000000) // (d.deg * (d.deg - 1))
                     AS lcc_micro
            FROM tn t JOIN deg d USING (node)
            ORDER BY t.n_tri DESC, t.node LIMIT 20)
    SELECT node, n_tri, deg, lcc_micro FROM top
    """,
)
def q_triangle_top_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 most triangle-embedded parts with their local clustering
    coefficient 2·tri/(deg·(deg−1)) in integer micro-units — the
    community-core detector over the co-purchase graph. Per-node
    counts explode each triangle to its three corners (3 rows per
    triangle, never per pair), so the aggregate input is exactly
    3·|triangles| rows."""
    from aoseventstreamer_spark.operators.graph import (
        _degree_oriented,
        oriented_degrees,
        triangles,
    )

    o = _degree_oriented(
        _copurchase_edges(spark, sf_dir), "src", "dst"
    ).localCheckpoint()
    tri = triangles(oriented=o)
    corners = (
        tri.select(F.col("x").alias("node"))
        .unionByName(tri.select(F.col("y").alias("node")))
        .unionByName(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    deg = oriented_degrees(o)
    return (
        corners.join(deg, "node")
        .select(
            "node",
            "n_tri",
            "deg",
            F.expr("(2 * n_tri * 1000000) div (deg * (deg - 1))").alias(
                "lcc_micro"
            ),
        )
        .orderBy(F.desc("n_tri"), "node")
        .limit(20)
    )


_DSP = 6  # HLL precision for q_distinct_sliding: m = 64 registers


@query(
    "q_distinct_sliding",
    oracle=f"""
    WITH hh AS (
      SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) AS tumb,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events
    ),
    rr AS (
      SELECT tumb, h % {1 << _DSP} AS bucket,
             CASE WHEN h // {1 << _DSP} = 0 THEN {60 - _DSP + 1}
                  ELSE CAST(ROUND(log2((h // {1 << _DSP})
                                       & (-(h // {1 << _DSP})))) AS BIGINT) + 1
             END AS rho
      FROM hh
    ),
    sk AS (SELECT tumb, bucket, MAX(rho) AS max_rho
           FROM rr GROUP BY tumb, bucket),
    slid AS (
      SELECT tumb AS win_start, bucket, max_rho FROM sk
      UNION ALL
      SELECT tumb - INTERVAL '15 minutes' AS win_start, bucket, max_rho FROM sk
    ),
    merged AS (SELECT win_start, bucket, MAX(max_rho) AS max_rho
               FROM slid GROUP BY win_start, bucket),
    agg AS (SELECT win_start, COUNT(*) AS n_used,
                   CAST(SUM(CAST(1 AS BIGINT)
                            << CAST({62 - _DSP} - max_rho AS INT))
                        AS BIGINT) AS di
            FROM merged GROUP BY win_start)
    SELECT win_start, CAST({1 << _DSP} AS INT) AS n_registers,
           di + ({1 << _DSP} - n_used) * (CAST(1 AS BIGINT) << {62 - _DSP})
             AS denom_scaled
    FROM agg
    """,
)
def q_distinct_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct users (30 min width / 15 min slide) the
    way it must be done at 100 TB (VERDICT r6 item 7): the raw rows
    aggregate ONCE into per-TUMBLING-bucket HLL registers (map-side
    partial MAX, the only shuffle that sees event-derived rows), and
    each sliding window is the register-wise MAX of its two tumbling
    sketches — the naive plan instead explodes every event into both
    windows and re-shuffles the doubled user_id column. Registers and
    the integer denom_scaled hash-compare in DuckDB; the float
    cardinality is a derived display value (the q_approx_distinct
    discipline; operators/hll.py)."""
    from aoseventstreamer_spark.operators import hll

    ev = t(spark, sf_dir, "events").select(
        F.window("ts", "15 minutes").start.alias("tumb"),
        F.col("user_id").cast("string").alias("uid"),
    )
    sk = hll.hll_sketch(ev, "uid", _DSP, group_cols=["tumb"])
    slid = sk.select(
        F.explode(
            F.array(
                F.col("tumb"),
                F.col("tumb") - F.expr("INTERVAL 15 minutes"),
            )
        ).alias("win_start"),
        "bucket",
        "max_rho",
    )
    merged = slid.groupBy("win_start", "bucket").agg(
        F.max("max_rho").alias("max_rho")
    )
    return hll.hll_estimate(merged, _DSP, group_cols=["win_start"]).select(
        "win_start", "n_registers", "denom_scaled"
    )


@query(
    "q_topk_per_window",
    oracle="""
    WITH w AS (
      SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS win_start,
             user_id
      FROM events
    ),
    counted AS (
      SELECT win_start, user_id, COUNT(*) AS cnt
      FROM w GROUP BY win_start, user_id
    )
    SELECT win_start, user_id, cnt, CAST(rnk AS INT) AS rnk FROM (
      SELECT win_start, user_id, cnt,
             row_number() OVER (PARTITION BY win_start
                                ORDER BY cnt DESC, user_id) AS rnk
      FROM counted
    ) WHERE rnk <= 3
    """,
)
def q_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most active users per tumbling hour — the weekly-report
    shape over the event log (VERDICT r6 item 7). Plan: ONE partial-agg
    shuffle of (window, user) counts, then the rank window re-shuffles
    only the aggregated rows (windows x users, never raw events);
    deterministic tie-break (cnt DESC, user_id ASC) keeps the answer
    hash-exact."""
    ev = t(spark, sf_dir, "events")
    counted = (
        ev.groupBy(
            F.window("ts", "1 hour").start.alias("win_start"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("win_start").orderBy(
        F.col("cnt").desc(), F.col("user_id")
    )
    return (
        counted.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("win_start", "user_id", "cnt", "rnk")
    )
