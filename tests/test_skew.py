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


def test_aqe_skew_split_activates_on_hot_key_join(spark):
    """Adversarial hot-key fact-fact join (tools/skew_probe.py shape):
    with thresholds sized to the observed shuffle and >1 mapper, AQE's
    OptimizeSkewedJoin must actually split the hot partition — the
    final adaptive plan carries SortMergeJoin(skew=true). Data is
    synthesized with incompressible padding so the hot partition
    dominates the shuffle regardless of fixture SF (at sf0.001/0.01
    the fixed per-chunk shuffle overhead of 16 mappers x 32 partitions
    swamps the data signal entirely — measured via the
    OptimizeSkewedJoin debug log). Conf-scoped so the tuned thresholds
    never leak to other tests."""
    fact = (
        spark.range(0, 50_000)
        .select(
            F.when(F.pmod(F.xxhash64("id"), F.lit(20)) != 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5000)))
            .alias("k"),
            # incompressible per-row padding: the hot partition must be
            # heavy in BYTES, not just rows (lz4 flattens repeats)
            F.concat(F.md5(F.col("id").cast("string")),
                     F.md5(F.hex(F.col("id") + 7))).alias("pad"),
            (F.col("id") % 100).alias("v"),
        )
    )
    dim = spark.range(0, 5000).select(
        F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    tuned = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "32k",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        skewed = fact.repartition(16).localCheckpoint()  # splits happen at MAP boundaries
        # the aggregate must REFERENCE pad or column pruning strips it
        # before the exchange and the hot partition shrinks to bare keys
        j = (
            skewed.join(dim.hint("merge"), on="k")
            .groupBy("name")
            .agg(F.count("*").alias("n"), F.max("pad").alias("mp"))
        )
        plain = {
            (r["name"], r["n"], r["mp"])
            for r in skewed.join(dim, on="k")
            .groupBy("name")
            .agg(F.count("*").alias("n"), F.max("pad").alias("mp"))
            .collect()
        }
        got = {(r["name"], r["n"], r["mp"]) for r in j.collect()}
        assert got == plain  # split never changes results
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan or "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salt_column_collision_guarded(spark):
    """An input already carrying the internal __salt column is refused
    (same contract as bloom_semi_reduce's __bloom_bits guard)."""
    import pytest as _pytest

    from aoseventstreamer_spark.operators.skew import salted_join, two_phase_agg

    poisoned = spark.range(5).withColumnRenamed("id", "__salt")
    clean = spark.range(5).select(F.col("id").alias("k"))
    with _pytest.raises(ValueError, match="__salt"):
        salted_join(poisoned.withColumn("k", F.lit(1)), clean, on="k")
    with _pytest.raises(ValueError, match="__salt"):
        two_phase_agg(poisoned, "__salt", {"n": "count(*)"})
