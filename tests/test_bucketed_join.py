"""Bucketed co-located join: writing both fact tables bucketed by the
join key removes the join-time shuffle entirely — the 100 TB answer to
repeated fact-fact joins (docs/SCALE.md)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aoseventstreamer_spark.plans.inspect import formatted_plan
from aoseventstreamer_spark.session import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # warehouse.dir is a static conf — managed tables land in the
    # session default (./spark-warehouse, gitignored); DROP cleans up
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    lineitem.repartition(8, "l_orderkey").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable("b_lineitem")
    yield "b_orders", "b_lineitem"
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    o, l = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the issue
    try:
        df = (
            spark.table(l)
            .join(spark.table(o), F.col("l_orderkey") == F.col("o_orderkey"))
            .select("l_orderkey", "o_orderdate", "l_quantity")
        )
        plan = formatted_plan(df)
        assert "SortMergeJoin" in plan  # fact-fact join, no broadcast
        assert "Exchange hashpartitioning" not in plan  # ...but NO shuffle
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_matches_unbucketed(spark, sf_dir, bucketed_tables):
    o, l = bucketed_tables
    plain = (
        load_table(spark, sf_dir, "lineitem")
        .join(load_table(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    bucketed = (
        spark.table(l).join(spark.table(o), F.col("l_orderkey") == F.col("o_orderkey")).count()
    )
    assert plain == bucketed
