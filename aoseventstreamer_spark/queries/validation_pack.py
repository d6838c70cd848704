"""Data-validation constraint suite (the Deequ/Great-Expectations
shape): a declared set of completeness / uniqueness / range /
referential-integrity / accepted-values / volume checks evaluated in
ONE scan of the fact table plus one broadcast dim join — the metrics
all fold into a single aggregate row that a ``stack`` unpivots into
(check, metric, passed) rows. At 100 TB this is the property that
matters: adding a check adds a column to the aggregate, never a scan.

Fractions are integer micro-units (the repo's round-once discipline);
every metric is BIGINT so the DuckDB oracle is hash-exact. The range
check's bound is deliberately tighter than the data (violations > 0)
so the suite demonstrably reports failures, not just green rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aoseventstreamer_spark.queries import query, t

_PRICE_LO_C = 100_000  # 1000.00 in cents
_PRICE_HI_C = 45_000_000  # 450000.00 — tighter than max(o_totalprice)


@query(
    "q_dq_checks",
    oracle=f"""
    WITH joined AS (
      SELECT o.*,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS price_c,
             EXISTS (SELECT 1 FROM customer c
                     WHERE c.c_custkey = o.o_custkey) AS has_cust
      FROM orders o
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(o_custkey) AS BIGINT) AS n_custkey,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct_ok,
             CAST(COUNT(*) FILTER (WHERE price_c NOT BETWEEN {_PRICE_LO_C}
                                     AND {_PRICE_HI_C}) AS BIGINT)
               AS n_range_viol,
             CAST(COUNT(*) FILTER (WHERE NOT has_cust) AS BIGINT)
               AS n_orphans,
             CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN
                                     ('O', 'F', 'P')) AS BIGINT)
               AS n_status_viol
      FROM joined
    )
    SELECT 'completeness_o_custkey' AS check_name,
           (n_custkey * 1000000) // n_rows AS metric,
           n_custkey = n_rows AS passed FROM m
    UNION ALL SELECT 'uniqueness_o_orderkey', n_rows - n_distinct_ok,
           n_rows = n_distinct_ok FROM m
    UNION ALL SELECT 'range_o_totalprice', n_range_viol,
           n_range_viol = 0 FROM m
    UNION ALL SELECT 'ref_orders_customer', n_orphans,
           n_orphans = 0 FROM m
    UNION ALL SELECT 'accepted_o_orderstatus', n_status_viol,
           n_status_viol = 0 FROM m
    UNION ALL SELECT 'min_rows_orders', n_rows, n_rows >= 1000 FROM m
    """,
)
def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six constraint checks over orders — completeness(o_custkey),
    uniqueness(o_orderkey), range(o_totalprice cents within declared
    bounds), referential integrity(orders→customer), accepted
    values(o_orderstatus), minimum volume — evaluated as ONE
    aggregate over one scan + one broadcast semi-flag join, unpivoted
    with stack(). The range bound is intentionally violated by the
    data so failing rows are exercised."""
    orders = t(spark, sf_dir, "orders")
    cust = (
        t(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("o_custkey"))
        .distinct()
        .withColumn("_has_cust", F.lit(1))
    )
    joined = orders.join(cust, "o_custkey", "left").withColumn(
        "price_c", F.round(F.col("o_totalprice") * 100).cast("long")
    )
    m = joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("n_custkey"),
        F.count_distinct("o_orderkey").alias("n_distinct_ok"),
        F.sum(
            (
                ~F.col("price_c").between(_PRICE_LO_C, _PRICE_HI_C)
            ).cast("long")
        ).alias("n_range_viol"),
        F.sum(F.col("_has_cust").isNull().cast("long")).alias("n_orphans"),
        F.sum(
            (~F.col("o_orderstatus").isin("O", "F", "P")).cast("long")
        ).alias("n_status_viol"),
    )
    return m.selectExpr(
        """stack(6,
           'completeness_o_custkey', (n_custkey * 1000000) div n_rows,
               n_custkey = n_rows,
           'uniqueness_o_orderkey', n_rows - n_distinct_ok,
               n_rows = n_distinct_ok,
           'range_o_totalprice', n_range_viol, n_range_viol = 0,
           'ref_orders_customer', n_orphans, n_orphans = 0,
           'accepted_o_orderstatus', n_status_viol, n_status_viol = 0,
           'min_rows_orders', n_rows, n_rows >= 1000
        ) AS (check_name, metric, passed)"""
    )
