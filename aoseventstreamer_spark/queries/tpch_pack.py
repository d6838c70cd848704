"""TPC-H classic aggregation shapes (Q1, Q3, Q6, Q18) over the
driver's TPC-H-ish tables. All hash-exact vs DuckDB via the
integer-cents conventions (queries/__init__.py docstring): monetary
expressions like extendedprice*(1-discount) become exact scale-4 /
scale-6 integer arithmetic so aggregation-order float drift can never
flip a digit.

Scale notes (plans verified via .explain):
- Q1 is a pure scan + partial/final hash agg — the canonical
  map-side-combine workload; no shuffle besides the 6-group exchange.
- Q3/Q18 shuffle lineitem⋈orders on the orderkey once; the
  customer side is UNHINTED (it scales with SF) — the planner
  broadcasts it while it fits and shuffles it at 100 TB.
- Q6 is scan + filter + a single global agg (filters pushed to
  parquet row groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aoseventstreamer_spark.queries import (
    SQL_AVG_4DP,
    avg_value_4dp,
    cents,
    query,
    sum_value_2dp,
    t,
)

# exact scale-4 integer: price-cents * (100 - discount-cents)
_DISC_PRICE_SQL = (
    "CAST(ROUND(l_extendedprice*100) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount*100) AS BIGINT))"
)
# exact scale-6 integer: additionally * (100 + tax-cents)
_CHARGE_SQL = f"{_DISC_PRICE_SQL} * (100 + CAST(ROUND(l_tax*100) AS BIGINT))"


def _disc_price_scale4() -> F.Column:
    return cents("l_extendedprice") * (100 - cents("l_discount"))


@query(
    "q_tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(CAST(ROUND(l_quantity*100) AS BIGINT))/100.0, 2) AS sum_qty,
           ROUND(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT))/100.0, 2) AS sum_base_price,
           ROUND(SUM({_DISC_PRICE_SQL})/10000.0, 2) AS sum_disc_price,
           ROUND(SUM({_CHARGE_SQL})/1000000.0, 2) AS sum_charge,
           {SQL_AVG_4DP.format(c="l_quantity")} AS avg_qty,
           {SQL_AVG_4DP.format(c="l_extendedprice")} AS avg_price,
           {SQL_AVG_4DP.format(c="l_discount")} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: the canonical wide-aggregate scan.
    Partial aggregation (map-side combine) reduces the shuffle to
    n_mappers x 6 groups x 9 columns — at 100 TB the scan dominates
    and the exchange is bytes."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        sum_value_2dp("l_quantity", "sum_qty"),
        sum_value_2dp("l_extendedprice", "sum_base_price"),
        F.round(F.sum(_disc_price_scale4()) / 10000.0, 2).alias("sum_disc_price"),
        F.round(
            F.sum(_disc_price_scale4() * (100 + cents("l_tax"))) / 1000000.0, 2
        ).alias("sum_charge"),
        avg_value_4dp("l_quantity", "avg_qty"),
        avg_value_4dp("l_extendedprice", "avg_price"),
        avg_value_4dp("l_discount", "avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "q_tpch_q3",
    oracle=f"""
    SELECT l.l_orderkey,
           ROUND(SUM({_DISC_PRICE_SQL})/10000.0, 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority (o_orderpriority stands in for the
    spec's p_shippriority, absent from the synthetic schema). The
    filtered customer side is planner-broadcast (unhinted — it scales
    with SF); the one shuffle is lineitem⋈orders on orderkey; the
    final ORDER BY ... LIMIT 10 is a TakeOrderedAndProject, never a
    global sort."""
    cust = (
        t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    )
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_disc_price_scale4()) / 10000.0, 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking). The synthetic schema
    has no commit/receipt dates, so the spec's "late lineitem"
    predicate is adapted to "shipped > 90 days after the order date" —
    the plan shape is identical: EXISTS compiled to a LEFT SEMI join
    on the orderkey with a non-equi residual, then a tiny priority
    aggregation."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q_tpch_q6",
    oracle="""
    SELECT ROUND(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                     * CAST(ROUND(l_discount*100) AS BIGINT))/10000.0, 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND CAST(ROUND(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast revenue change: scan + conjunctive filter +
    one global sum. The date/quantity predicates push into the parquet
    scan (row-group skipping); the discount band compares integer
    cents so the two engines agree at the 0.05/0.07 boundaries."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & cents("l_discount").between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(cents("l_extendedprice") * cents("l_discount")) / 10000.0, 2)
            .alias("revenue")
        )
    )


@query(
    "q_tpch_q18",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           ROUND(SUM(CAST(ROUND(l.l_quantity*100) AS BIGINT))/100.0, 2) AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) > 19000
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: HAVING subquery as a
    left-semi join. The big-orders key set is aggregated first (one
    shuffle on orderkey) and semi-joins lineitem on the same key, so
    AQE can reuse the partitioning; customer joins unhinted
    (SF-scaling)."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(cents("l_quantity")).alias("_sq"))
        .filter(F.col("_sq") > 19000)
        .select("l_orderkey")
    )
    orders = t(spark, sf_dir, "orders")
    cust = (t(spark, sf_dir, "customer"))
    return (
        li.join(big, on="l_orderkey", how="left_semi")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(sum_value_2dp("l_quantity", "sum_qty"))
    )
