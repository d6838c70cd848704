"""Salted-join / two-phase-agg equivalence: skew handling must never
change results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.skew import salted_join, two_phase_agg
from aoseventstreamer_spark.session import load_table


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90%) + a tail — the shape AQE alone may miss pre-shuffle
    rows = [(0 if i % 10 else i, float(i % 100)) for i in range(5000)]
    return spark.createDataFrame(rows, "k long, v double").cache()


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [(i, f"name_{i}") for i in range(0, 5000, 10)], "k long, name string"
    ).cache()


def test_salted_join_matches_plain_join(skewed, dim):
    plain = skewed.join(dim, "k").select("k", "v", "name")
    salted = salted_join(skewed, dim, on="k").select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_matches(skewed, dim):
    plain = skewed.join(dim, "k", "left").select("k", "v", "name")
    salted = salted_join(skewed, dim, on="k", how="left").select("k", "v", "name")
    assert sorted(map(tuple, plain.collect()), key=str) == sorted(
        map(tuple, salted.collect()), key=str
    )


def test_two_phase_agg_matches_plain(skewed):
    plain = {
        r.k: (r.cnt, r.total, r.mn, r.mx)
        for r in skewed.groupBy("k")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("v").alias("total"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    two = {
        r.k: (r.cnt, r.total, r.mn, r.mx)
        for r in two_phase_agg(
            skewed, "k",
            {"cnt": "count(*)", "total": "sum(v)", "mn": "min(v)", "mx": "max(v)"},
        ).collect()
    }
    assert plain.keys() == two.keys()
    for k in plain:
        assert plain[k][0] == two[k][0]
        assert abs(plain[k][1] - two[k][1]) < 1e-6
        assert plain[k][2:] == two[k][2:]


def test_two_phase_rejects_non_reaggregatable(skewed):
    with pytest.raises(ValueError):
        two_phase_agg(skewed, "k", {"a": "avg(v)"})


def test_real_table_equivalence(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    plain = orders.join(customer, orders.o_custkey == customer.c_custkey).count()
    # salted_join requires a shared column name
    o = orders.withColumnRenamed("o_custkey", "custkey")
    c = customer.withColumnRenamed("c_custkey", "custkey")
    assert salted_join(o, c, on="custkey").count() == plain
