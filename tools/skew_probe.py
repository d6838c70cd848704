"""Adversarial hot-key fact-fact join probe: one order key carries ~33%
of all lineitem rows, then orders ⋈ lineitem runs three ways —

1. plain sort-merge with AQE skew-join ON (the engine default),
2. plain sort-merge with AQE skew-join OFF (the control),
3. explicit salted_join (operators/skew.py — the pre-AQE fallback),

recording wall time, whether AQE actually split the skewed partition
(``SortMergeJoin(skew=true)`` / ``AQEShuffleRead skewed`` in the final
adaptive plan), and row-count equality across all three.

What it takes to make the detector FIRE at fixture scale — each item
is a real-cluster tuning lesson, verified by reading the
OptimizeSkewedJoin debug decisions:

- **Thresholds scale with your shuffle, not your table.** The hot
  partition (200k rows) is only ~160 KiB post-shuffle: the join
  exchange carries just the pruned join key, and lz4 flattens repeated
  keys. The 256 MiB default threshold is 3 orders of magnitude away —
  set skewedPartitionThresholdInBytes (and the coalesce
  minPartitionSize floor, which otherwise re-merges the split pieces)
  relative to OBSERVED partition bytes.
- **Splits happen at MAP boundaries.** A skewed reduce partition fed
  by ONE mapper cannot be split at all (OptimizeSkewedJoin reports
  "left 0" even when sizes qualify). The fixture's single parquet file
  scans as one partition, so the probe repartitions to 16 mappers —
  on a real cluster the scan provides thousands.
- **A downstream keyed aggregate suppresses the rewrite** (splitting
  breaks the join's output partitioning); forceOptimizeSkewedJoin=true
  accepts the extra exchange — right whenever the skewed join
  dominates, as a 33%-hot-key join does.

Usage: python tools/skew_probe.py [sf_dir]  (summary lands in
RESULTS.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aoseventstreamer_spark.operators.skew import salted_join  # noqa: E402
from aoseventstreamer_spark.session import get_spark, load_table  # noqa: E402

SKEW_PROBE_CONF = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "32k",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
}


def build_skewed(spark, sf_dir: str, n_mappers: int = 16):
    """lineitem with ~1/3 of rows remapped onto ONE hot order key,
    checkpointed behind ``n_mappers`` map partitions (split units)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    hot = orders.select(F.min("o_orderkey").alias("k")).first()["k"]
    skewed = (
        li.withColumn(
            "l_orderkey",
            F.when(
                F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(3)) == 0,
                F.lit(hot),
            ).otherwise(F.col("l_orderkey")),
        )
        .repartition(n_mappers)
        .localCheckpoint()  # freeze the remap; isolate join cost
    )
    return orders, skewed, hot


def run_join(orders, lineitem):
    j = (
        lineitem.join(
            orders.hint("merge"), on=(lineitem.l_orderkey == orders.o_orderkey)
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
    )
    t0 = time.time()
    rows = {r["o_orderpriority"]: (r["n"], round(float(r["qty"]), 2)) for r in j.collect()}
    dt = time.time() - t0
    plan = j._jdf.queryExecution().executedPlan().toString()
    split = "SortMergeJoin(skew=true)" in plan or "AQEShuffleRead skewed" in plan
    return rows, dt, split


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        "skew-probe",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf=SKEW_PROBE_CONF,
    )
    spark.sparkContext.setLogLevel("ERROR")

    orders, skewed, hot = build_skewed(spark, sf_dir)
    n_hot = skewed.filter(F.col("l_orderkey") == hot).count()
    n_all = skewed.count()
    print(f"hot key {hot}: {n_hot}/{n_all} rows ({100.0 * n_hot / n_all:.1f}%)")

    rows_aqe, t_aqe, split = run_join(orders, skewed)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    rows_off, t_off, _ = run_join(orders, skewed)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    t0 = time.time()
    salted = (
        salted_join(
            skewed,
            orders.withColumnRenamed("o_orderkey", "l_orderkey"),
            on="l_orderkey",
            n_salts=16,
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
    )
    rows_salt = {
        r["o_orderpriority"]: (r["n"], round(float(r["qty"]), 2))
        for r in salted.collect()
    }
    t_salt = time.time() - t0

    assert rows_aqe == rows_off == rows_salt, "row mismatch across strategies"
    print(f"AQE skew-join ON : {t_aqe:.2f}s  (skew split in final plan: {split})")
    print(f"AQE skew-join OFF: {t_off:.2f}s")
    print(f"salted_join (16) : {t_salt:.2f}s")
    print(f"aqe_split_detected: {split}")
    spark.stop()


if __name__ == "__main__":
    main()
