"""Mergeable-quantile-sketch surface (round 6) plus the native HLL++
sibling of q_approx_distinct.

The sketch (``operators/quantile.py``) is the percentile pressure
valve: exact q_percentiles shuffles the full value column (1.2 MiB for
5 rows at sf0.1 per SHUFFLE_AUDIT), while this path moves only bounded
(bucket, cnt) partials with map-side combine — at 100 TB the only
viable percentile plan. All arithmetic is exact int64 on cents, so
unlike ``approx_percentile`` (engine-specific sketch, rows-only) every
query here hash-compares against DuckDB, including the containment
audit of the extracted quantiles against exact percentile_disc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import quantile as Q
from aoseventstreamer_spark.queries import query, t

_K = Q.DEFAULT_K
_PERMILS = [500, 900, 990]

_SQL_B = Q.sql_bucket_expr("v", _K)
_SQL_LO, _SQL_HI = Q.sql_bounds_exprs("bucket", _K)


def _cents_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v")
    )


@query(
    "q_quantile_sketch",
    oracle=f"""
    WITH c AS (SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS v
               FROM events),
    b AS (SELECT event_type, {_SQL_B} AS bucket FROM c),
    sk AS (SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM b GROUP BY event_type, bucket)
    SELECT event_type, bucket, cnt, {_SQL_LO} AS lo, {_SQL_HI} AS hi FROM sk
    """,
)
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HDR quantile sketch, value-compared cell by
    cell: log-scale bucket → count, with the integer [lo, hi] value
    bounds attached. One shuffle with map-side partial COUNT; output
    bounded by groups·(64-k+1)·2^k rows at any input size, mergeable
    across shards/days by cell-wise add (see q_quantile_merge)."""
    sk = Q.qsketch(_cents_events(spark, sf_dir), "v", _K, group_cols=["event_type"])
    return Q.with_bounds(sk, _K)


@query(
    "q_quantile_merge",
    oracle=f"""
    WITH c AS (SELECT CAST(ROUND(value*100) AS BIGINT) AS v FROM events),
    b AS (SELECT {_SQL_B} AS bucket FROM c),
    sk AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY bucket),
    cum AS (SELECT bucket, cnt,
                   SUM(cnt) OVER (ORDER BY bucket) AS cum,
                   SUM(cnt) OVER () AS n_total
            FROM sk),
    qq AS (SELECT * FROM cum, (VALUES (500),(900),(990)) AS q(q_permil)),
    hit AS (SELECT q_permil, bucket FROM qq
            WHERE cum >= (q_permil * n_total + 999) // 1000
              AND cum - cnt < (q_permil * n_total + 999) // 1000),
    hb AS (SELECT q_permil, ({_SQL_LO} + {_SQL_HI}) // 2 AS est,
                  {_SQL_LO} AS lo, {_SQL_HI} AS hi
           FROM hit),
    ex AS (SELECT CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY v) AS BIGINT) AS p500,
                  CAST(percentile_disc(0.90) WITHIN GROUP (ORDER BY v) AS BIGINT) AS p900,
                  CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY v) AS BIGINT) AS p990
           FROM c),
    exu AS (SELECT 500 AS q_permil, p500 AS exact_cents FROM ex
            UNION ALL SELECT 900, p900 FROM ex
            UNION ALL SELECT 990, p990 FROM ex)
    SELECT hb.q_permil, hb.est, hb.lo, hb.hi, exu.exact_cents,
           exu.exact_cents BETWEEN hb.lo AND hb.hi AS contained
    FROM hb JOIN exu USING (q_permil)
    """,
)
def q_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge algebra + accuracy audit in one hash-exact query: the
    per-event-type sketches of q_quantile_sketch merge (cell-wise add,
    as shards/days/streams would at 100 TB) into the global sketch,
    p50/p90/p99 are extracted from it in pure integer arithmetic, and
    each answer is audited against the exact percentile_disc value —
    ``contained`` is the sketch's hard [lo, hi] guarantee holding.
    The oracle builds the global sketch directly from the values; its
    equality with the Spark-side merge IS the merge-correctness proof
    (COUNT associativity)."""
    ev = _cents_events(spark, sf_dir)
    per_group = Q.qsketch(ev, "v", _K, group_cols=["event_type"])
    merged = Q.qsketch_merge(per_group.drop("event_type"))
    qs = Q.qsketch_quantiles(merged, _PERMILS, _K)
    exact = ev.agg(
        *[
            F.expr(
                f"percentile_disc({p / 1000}) WITHIN GROUP (ORDER BY v)"
            ).cast("long").alias(f"p{p}")
            for p in _PERMILS
        ]
    ).selectExpr(
        "stack(3, 500, p500, 900, p900, 990, p990) AS (q_permil, exact_cents)"
    )
    return qs.join(F.broadcast(exact), "q_permil").select(
        "q_permil",
        "est",
        "lo",
        "hi",
        "exact_cents",
        F.col("exact_cents").between(F.col("lo"), F.col("hi")).alias("contained"),
    )


@query(
    "q_quantile_groups",
    oracle=f"""
    WITH c AS (SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS v
               FROM events),
    b AS (SELECT event_type, {_SQL_B} AS bucket FROM c),
    sk AS (SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM b GROUP BY event_type, bucket),
    cum AS (SELECT event_type, bucket, cnt,
                   SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
                   SUM(cnt) OVER (PARTITION BY event_type) AS n_total
            FROM sk),
    qq AS (SELECT * FROM cum, (VALUES (500),(950)) AS q(q_permil)),
    hit AS (SELECT event_type, q_permil, bucket FROM qq
            WHERE cum >= (q_permil * n_total + 999) // 1000
              AND cum - cnt < (q_permil * n_total + 999) // 1000)
    SELECT event_type, q_permil, ({_SQL_LO} + {_SQL_HI}) // 2 AS est,
           {_SQL_LO} AS lo, {_SQL_HI} AS hi
    FROM hit
    """,
)
def q_quantile_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantile extraction from the per-group sketches
    (p50/p95 per event_type) — the grouped path of
    ``qsketch_quantiles``: the running-count window partitions by the
    group key over the BOUNDED sketch (never the data), so extraction
    cost is O(groups · buckets) at any input size. Hash-exact."""
    sk = Q.qsketch(_cents_events(spark, sf_dir), "v", _K, group_cols=["event_type"])
    return Q.qsketch_quantiles(sk, [500, 950], _K, group_cols=["event_type"])


@query("q_approx_distinct_native")  # rows-only: HLL++ registers are engine-specific
def q_approx_distinct_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in HLL++ ``approx_count_distinct`` — engine
    coverage for the native sketch. The hash-exact portable-HLL
    variant is q_approx_distinct (``operators/hll.py``)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("approx_users"))
    )
