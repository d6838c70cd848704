"""TPC-H completion pack: Q7-Q10, Q12-Q17, Q19, Q21, Q22 shapes over
the driver's TPC-H-ish tables.

The synthetic schema has no partsupp table, no ship/commit/receipt
date triple, no phone/address columns — queries that depend on those
are adapted to the closest shape the schema supports (each docstring
states the adaptation). The *plan* shapes — the reason these queries
are canonical — are preserved: multi-way broadcast+shuffle joins,
correlated aggregates turned into self-join aggregations, scalar
subqueries, anti-joins, conditional aggregation.

All oracles are hash-exact vs DuckDB via the integer-cents
conventions (queries/__init__.py): monetary math is exact scale-2/4/6
integer arithmetic; ratios round through scale-0 integers
(``ROUND(num * 10^k / den)`` — scale-0 ties are exactly representable
doubles, so both engines round identically).

Scale notes: lineitem⋈orders on the orderkey is the single big
shuffle everywhere; part (2k rows), supplier (100), customer (1.5k),
nation, region broadcast. Per-part / per-order self-aggregations
(Q15, Q17, Q21) reuse the same shuffle key as the join that follows,
so AQE plans them without an extra exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aoseventstreamer_spark.queries import cents, query, sum_value_2dp, t
from aoseventstreamer_spark.queries.tpch_pack import _DISC_PRICE_SQL, _disc_price_scale4

# exact share-of-total at 6 decimal places: both engines round the
# scale-0 double num*1e6/den (ties representable → identical HALF_UP)
_SHARE_6DP_SQL = "CAST(ROUND({num} * 1000000.0 / {den}) AS BIGINT) / 1000000.0"


def _share_6dp(num: F.Column, den: F.Column) -> F.Column:
    return F.round(num * 1000000.0 / den).cast("long") / 1000000.0


@query(
    "q_tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,
           ROUND(SUM({_DISC_PRICE_SQL})/10000.0, 2) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1995-01-01'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping between two nations. lineitem⋈orders
    is the one shuffle; nation broadcasts (fixed dim),
    supplier/customer join unhinted (SF-scaling), and the
    nation-pair disjunction is applied after both nation names are in
    scope, exactly as the spec writes it."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = (t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    cust = (t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    n1 = F.broadcast(
        t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_disc_price_scale4()) / 10000.0, 2).alias("revenue"))
    )


@query(
    "q_tpch_q8",
    oracle=f"""
    WITH all_nations AS (
        SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
               {_DISC_PRICE_SQL} AS volume,
               n1.n_name AS supp_nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        JOIN region r   ON n2.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           {_SHARE_6DP_SQL.format(
               num="SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END)",
               den="SUM(volume)")} AS mkt_share
    FROM all_nations
    GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: NATION_7's share of PROMO-part
    revenue sold into ASIA-region customers, by order year. The share
    is conditional-sum / sum over exact scale-4 integers, rounded
    through a scale-0 integer so both engines agree to 6 dp."""
    li = t(spark, sf_dir, "lineitem")
    part = (
        t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    )
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = (t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    n2 = F.broadcast(
        t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey")
        )
    )
    region = F.broadcast(
        t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    supp = (t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    n1 = F.broadcast(
        t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    vol = _disc_price_scale4()
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _share_6dp(
                F.sum(F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(0)),
                F.sum(vol),
            ).alias("mkt_share")
        )
    )


@query(
    "q_tpch_q9",
    oracle="""
    SELECT n.n_name AS nation, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
           ROUND(SUM(
               2 * CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT))
               - CAST(ROUND(l.l_quantity*100) AS BIGINT)
                 * CAST(ROUND(p.p_retailprice*100) AS BIGINT)
           )/20000.0, 2) AS sum_profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit. The schema has no
    ps_supplycost, so unit cost is adapted to half the part's retail
    price; profit = disc_price - qty*retail/2, computed at doubled
    scale-4 so the /2 stays integer-exact. Nation broadcasts (fixed
    dim); part/supplier join unhinted (SF-scaling); lineitem⋈orders
    shuffles once."""
    part = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    li = t(spark, sf_dir, "lineitem")
    supp = (t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    nation = F.broadcast(
        t(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit2 = 2 * _disc_price_scale4() - cents("l_quantity") * cents("p_retailprice")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit2) / 20000.0, 2).alias("sum_profit"))
    )


@query(
    "q_tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM({_DISC_PRICE_SQL})/10000.0, 2) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting (top 20 customers by lost
    revenue; c_custkey tiebreak makes the limit deterministic across
    engines). TakeOrderedAndProject, never a global sort."""
    cust = (t(spark, sf_dir, "customer"))
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_disc_price_scale4()) / 10000.0, 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q_tpch_q12",
    oracle="""
    SELECT l.l_linestatus AS ship_bucket,
           COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY ship_bucket
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping-mode priority shape. The schema has no
    l_shipmode / commit / receipt dates, so "late" is adapted to
    shipped >60 days after ordering, bucketed by l_linestatus.
    Conditional counting (COUNT CASE) is the point of the query; the
    join carries a non-equi residual on the dates."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy(F.col("l_linestatus").alias("ship_bucket"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution: left join keeps
    zero-order customers (COUNT over the null-extended side is 0),
    then a second aggregation histograms the counts. The comment-
    filter of the spec becomes an orderpriority exclusion inside the
    join condition — the left-join-with-filtered-right shape is what
    the query exists to test."""
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    orders = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    return (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "q_tpch_q14",
    oracle=f"""
    SELECT CAST(ROUND(
             100.0 * SUM(CASE WHEN p.p_type = 'PROMO' THEN {_DISC_PRICE_SQL} ELSE 0 END)
             * 1000000.0 / SUM({_DISC_PRICE_SQL})
           ) AS BIGINT) / 1000000.0 AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: percentage of one month's revenue
    from PROMO parts. part joins unhinted (SF-scaling); single
    global conditional
    aggregate; ratio rounded through a scale-0 integer (6 dp)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = (t(spark, sf_dir, "part").select("p_partkey", "p_type"))
    vol = _disc_price_scale4()
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.round(
                    100.0
                    * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0))
                    * 1000000.0
                    / F.sum(vol)
                ).cast("long")
                / 1000000.0
            ).alias("promo_revenue")
        )
    )


@query(
    "q_tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, SUM({_DISC_PRICE_SQL}) AS total_rev4
        FROM lineitem l
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, ROUND(r.total_rev4/10000.0, 2) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev4 = (SELECT MAX(total_rev4) FROM revenue)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: the revenue "view" is aggregated once
    and reused for both the per-supplier rows and the scalar MAX
    (integer scale-4 comparison — ties surface all maxima, exactly as
    the spec requires). The MAX is a 1-row broadcast cross join, not
    a window over an unpartitioned frame."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price_scale4()).alias("total_rev4")
    )
    best = revenue.agg(F.max("total_rev4").alias("best_rev4"))
    supp = (t(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        revenue.join(F.broadcast(best), F.col("total_rev4") == F.col("best_rev4"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev4") / 10000.0, 2).alias("total_revenue"),
        )
    )


@query(
    "q_tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'ECONOMY'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship. No partsupp table, so
    the observed part-supplier pairs in lineitem stand in for it —
    the COUNT(DISTINCT supplier) over a filtered dimension join is
    the shape under test. Distinct-aggregate expands to a two-phase
    plan (partial distinct on (group, suppkey), then count)."""
    part = (
        t(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "ECONOMY")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
    )
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q17",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)) / 7.0)
                AS BIGINT) / 100.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
        SELECT l_partkey,
               SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS sum_qty_c,
               COUNT(*) AS n_li
        FROM lineitem GROUP BY l_partkey
    ) pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND CAST(ROUND(l.l_quantity*100) AS BIGINT) * 5 * pa.n_li < pa.sum_qty_c
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: the correlated
    "qty < 0.2 * avg(qty) for this part" subquery becomes a per-part
    aggregate self-join, and the comparison is cross-multiplied into
    pure integers (qty*5*n < sum_qty) so no engine ever divides.
    Both sides of the self-join shuffle on l_partkey — one exchange,
    reused."""
    li = t(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        F.sum(cents("l_quantity")).alias("sum_qty_c"),
        F.count("*").alias("n_li"),
    )
    part = (
        t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == per_part.pa_partkey)
        .filter(cents("l_quantity") * 5 * F.col("n_li") < F.col("sum_qty_c"))
        .agg(
            (F.round(F.sum(cents("l_extendedprice")) / 7.0).cast("long") / 100.0).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "q_tpch_q19",
    oracle=f"""
    SELECT ROUND(SUM({_DISC_PRICE_SQL})/10000.0, 2) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue: disjunction of three
    brand/size/quantity conjuncts straddling the join (container and
    shipmode predicates dropped with the absent columns). Catalyst
    extracts the common part-side predicate below the (planner-chosen)
    join;
    the quantity legs evaluate post-join."""
    li = t(spark, sf_dir, "lineitem")
    part = (t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size"))
    q = F.col("l_quantity")

    def leg(brand: str, size_hi: int, q_lo: int, q_hi: int) -> F.Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & (q >= q_lo)
            & (q <= q_hi)
        )

    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(leg("Brand#1", 5, 1, 11) | leg("Brand#2", 10, 10, 20) | leg("Brand#3", 15, 20, 30))
        .agg(F.round(F.sum(_disc_price_scale4()) / 10000.0, 2).alias("revenue"))
    )


@query(
    "q_tpch_q21",
    oracle="""
    WITH l3 AS (
        SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS last_ship
        FROM lineitem GROUP BY l_orderkey, l_suppkey
    ),
    ostat AS (
        SELECT l3.l_orderkey, COUNT(*) AS n_supp,
               COUNT(CASE WHEN l3.last_ship > o.o_orderdate + INTERVAL 90 DAY
                          THEN 1 END) AS n_late
        FROM l3 JOIN orders o
          ON o.o_orderkey = l3.l_orderkey AND o.o_orderstatus = 'F'
        GROUP BY l3.l_orderkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM l3
    JOIN orders o ON o.o_orderkey = l3.l_orderkey AND o.o_orderstatus = 'F'
    JOIN ostat   ON ostat.l_orderkey = l3.l_orderkey
    JOIN supplier s ON s.s_suppkey = l3.l_suppkey
    WHERE l3.last_ship > o.o_orderdate + INTERVAL 90 DAY
      AND ostat.n_supp >= 2
      AND ostat.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting. Without
    commit/receipt dates, "late" is shipped >90 days after ordering.
    The spec's EXISTS (another supplier) / NOT EXISTS (another late
    supplier) pair is computed as one per-order aggregate
    (n_supp >= 2 AND n_late = 1 — equivalent since the outer row is
    itself late): the per-(order,supplier) rollup, the per-order
    stats, and the final join all shuffle on the same l_orderkey, so
    the exchange is planned once and reused."""
    li = t(spark, sf_dir, "lineitem")
    l3 = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("last_ship")
    )
    orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lo = l3.join(orders, l3.l_orderkey == orders.o_orderkey).withColumn(
        "is_late",
        (F.col("last_ship") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).cast(
            "int"
        ),
    )
    ostat = lo.groupBy(F.col("l_orderkey").alias("os_orderkey")).agg(
        F.count("*").alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    supp = (t(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        lo.filter(F.col("is_late") == 1)
        .join(ostat, F.col("l_orderkey") == F.col("os_orderkey"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@query(
    "q_tpch_q22",
    oracle="""
    WITH act AS (
        SELECT c_custkey, c_acctbal,
               CAST(c_custkey % 10 AS INT) AS cntrycode
        FROM customer
        WHERE CAST(c_custkey % 10 AS INT) IN (1, 3, 5, 7, 9)
    ),
    avgbal AS (
        SELECT SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS s, COUNT(*) AS n
        FROM act WHERE c_acctbal > 0.0
    )
    SELECT cntrycode, COUNT(*) AS numcust,
           ROUND(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT))/100.0, 2) AS totacctbal
    FROM act, avgbal
    WHERE CAST(ROUND(c_acctbal*100) AS BIGINT) * avgbal.n > avgbal.s
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = act.c_custkey
            AND o.o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY cntrycode
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity. No phone column, so the
    country code is adapted to c_custkey % 10; "has no orders"
    (vacuous here — every customer orders) becomes "no orders since
    1999", keeping the anti-join shape meaningful. The above-average
    balance test cross-multiplies into integers (bal*n > sum) — no
    division, no rounding, engine-exact. The scalar average is a
    1-row broadcast; orders anti-joins on the customer key."""
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    act = cust.filter((F.col("c_custkey") % 10).cast("int").isin(1, 3, 5, 7, 9)).withColumn(
        "cntrycode", (F.col("c_custkey") % 10).cast("int")
    )
    avgbal = act.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(cents("c_acctbal")).alias("s"), F.count("*").alias("n")
    )
    recent = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        act.join(recent, act.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(avgbal))
        .filter(cents("c_acctbal") * F.col("n") > F.col("s"))
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            sum_value_2dp("c_acctbal", "totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Derived partsupp: the synthetic schema has no partsupp table, so the
# three queries that need one (Q2, Q11, Q20) derive it from lineitem:
# availqty := total observed shipped quantity per (part, supplier);
# supplycost := the supplier's minimum observed extended price for the
# part. Both are exact integers (cents), so every downstream
# comparison cross-multiplies instead of dividing. The derivation is
# itself the canonical partsupp plan shape: ONE hash aggregate on
# (partkey, suppkey) — the same key the consuming joins use.
# ---------------------------------------------------------------------------

_PS_SQL = """
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS ps_availqty_c,
             MIN(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS ps_supplycost_c
      FROM lineitem GROUP BY 1, 2
"""


def _ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.sum(cents("l_quantity")).alias("ps_availqty_c"),
            F.min(cents("l_extendedprice")).alias("ps_supplycost_c"),
        )
    )


def _ps_region(spark: SparkSession, sf_dir: str, r_name: str) -> DataFrame:
    """Derived partsupp restricted to suppliers of one region, with
    s_acctbal and n_name carried along (dims broadcast)."""
    sup = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(t(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t(spark, sf_dir, "region")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == r_name)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    return _ps(spark, sf_dir).join(
        sup, F.col("ps_suppkey") == F.col("s_suppkey")
    )


@query(
    "q_tpch_q2",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    pse AS (
      SELECT ps.*, s.s_name, CAST(ROUND(s.s_acctbal*100) AS BIGINT) AS bal_c,
             n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    mc AS (
      SELECT ps_partkey, MIN(ps_supplycost_c) AS min_cost_c
      FROM pse GROUP BY ps_partkey
    )
    SELECT * FROM (
      SELECT pse.bal_c / 100.0 AS s_acctbal, pse.s_name, pse.n_name,
             p.p_partkey, p.p_name
      FROM pse
      JOIN part p ON p.p_partkey = pse.ps_partkey
      JOIN mc ON mc.ps_partkey = pse.ps_partkey
            AND mc.min_cost_c = pse.ps_supplycost_c
      WHERE p.p_size = 3 AND p.p_type LIKE '%OMY'
    ) ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost-supplier: for every EUROPE-sourced part of
    one size/type, the supplier(s) achieving the regional minimum
    supply cost (adapted to the derived partsupp; p_type LIKE '%OMY'
    stands in for '%BRASS'). The correlated MIN subquery decorrelates
    into a per-part aggregate re-joined on (partkey, cost) — both
    sides share the partkey shuffle; nation/region broadcast (fixed
    dims), part/supplier join unhinted (SF-scaling). Top-100 is
    TakeOrderedAndProject."""
    pse = _ps_region(spark, sf_dir, "EUROPE")
    mc = pse.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("ps_supplycost_c").alias("min_cost_c")
    )
    part = (
        t(spark, sf_dir, "part").filter(
            (F.col("p_size") == 3) & F.col("p_type").like("%OMY")
        )
    )
    return (
        pse.join(part, F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            mc,
            (F.col("mc_partkey") == F.col("ps_partkey"))
            & (F.col("min_cost_c") == F.col("ps_supplycost_c")),
        )
        .select(
            (cents("s_acctbal") / 100.0).alias("s_acctbal"),
            "s_name", "n_name", "p_partkey", "p_name",
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@query(
    "q_tpch_q11",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    nat AS (
      SELECT ps.ps_partkey, ps.ps_supplycost_c * ps.ps_availqty_c AS v
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
    ),
    tot AS (SELECT SUM(v) AS total_v FROM nat)
    SELECT ps_partkey, SUM(v) AS value_c
    FROM nat, tot
    GROUP BY ps_partkey, total_v
    HAVING SUM(v) * 1000 > total_v
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important-stock identification: per-part inventory
    value among one nation's suppliers, keeping parts holding more
    than 0.1% of the nation's total. The scalar total is a broadcast
    single-row aggregate; the HAVING cross-multiplies (value*1000 >
    total) so both engines compare exact integers. value_c is in
    cents x quantity-cents — exact by construction."""
    ps = _ps(spark, sf_dir)
    sup = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(t(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_3")
        .select("s_suppkey")
    )
    nat = ps.join(sup, F.col("ps_suppkey") == F.col("s_suppkey")).select(
        "ps_partkey",
        (F.col("ps_supplycost_c") * F.col("ps_availqty_c")).alias("v"),
    )
    tot = nat.agg(F.sum("v").alias("total_v"))
    return (
        nat.join(F.broadcast(tot))
        .groupBy("ps_partkey", "total_v")
        .agg(F.sum("v").alias("value_c"))
        .filter(F.col("value_c") * 1000 > F.col("total_v"))
        .select("ps_partkey", "value_c")
    )


@query(
    "q_tpch_q20",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    q95 AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS qty95_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate <  TIMESTAMP '1996-01-01'
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM ps
      JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_name LIKE 'red%'
      LEFT JOIN q95 ON q95.l_partkey = ps.ps_partkey
                   AND q95.l_suppkey = ps.ps_suppkey
      WHERE 2 * ps.ps_availqty_c > COALESCE(q95.qty95_c, 0)
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN cand ON cand.ps_suppkey = s.s_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_1'
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential-part-promotion: suppliers in one nation
    whose availability of 'red%' parts exceeds half of what they
    shipped in 1995 (derived partsupp; availability = all-time shipped
    quantity). The 'availqty > 0.5*qty' correlated subquery becomes a
    (partkey, suppkey)-keyed aggregate LEFT-joined back — the same
    shuffle key as the partsupp derivation, so AQE reuses the
    exchange; the 0.5 factor cross-multiplies to exact integers. The
    candidate set semi-joins into supplier."""
    li = t(spark, sf_dir, "lineitem")
    q95 = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy(
            F.col("l_partkey").alias("q_partkey"),
            F.col("l_suppkey").alias("q_suppkey"),
        )
        .agg(F.sum(cents("l_quantity")).alias("qty95_c"))
    )
    part = (
        t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    )
    cand = (
        _ps(spark, sf_dir)
        .join(part, F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            q95,
            (F.col("q_partkey") == F.col("ps_partkey"))
            & (F.col("q_suppkey") == F.col("ps_suppkey")),
            "left",
        )
        .filter(2 * F.col("ps_availqty_c") > F.coalesce(F.col("qty95_c"), F.lit(0)))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(t(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_1")
        .join(cand, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )
