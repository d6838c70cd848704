"""Quantile-sketch scaling probe: amplify the sf0.1 events values
in-memory (deterministic perturbation, no RNG) and time the mergeable
sketch path (build + p50/p90/p99 extraction) against the exact
percentile_disc path at 1x / 10x / 100x.

The point at 100 TB: exact percentile_disc shuffles every value to its
group; the sketch path moves only bounded (bucket, cnt) partials with
map-side combine — its shuffle size is constant in the input.

Usage: python tools/quantile_scale.py [factors...]   (default: 1 10 100)
Prints one JSON line per (factor, op) with rows and seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import quantile as Q
from aoseventstreamer_spark.session import get_spark, load_table


def amplified(spark, sf_dir: str, factor: int):
    ev = load_table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("v")
    )
    if factor == 1:
        return ev
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    # perturb: shift each replica's values by a deterministic offset so
    # the amplified distribution isn't factor identical copies
    return (
        ev.crossJoin(reps)
        .select((F.col("v") + F.col("rep") * 37 % 1000).alias("v"))
        .repartition(int(spark.sparkContext.defaultParallelism))
    )


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "quantile-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")

    for factor in factors:
        ev = amplified(spark, sf_dir, factor).cache()
        n = ev.count()  # materialize outside the timing
        for op, fn in [
            (
                "qsketch_p50_p90_p99",
                lambda d: Q.qsketch_quantiles(
                    Q.qsketch(d, "v"), [500, 900, 990]
                ),
            ),
            (
                "exact_percentile_disc",
                lambda d: d.agg(
                    *[
                        F.expr(
                            f"percentile_disc({p}) WITHIN GROUP (ORDER BY v)"
                        ).alias(f"p{p}")
                        for p in (0.5, 0.9, 0.99)
                    ]
                ),
            ),
        ]:
            t0 = time.time()
            fn(ev).write.format("noop").mode("overwrite").save()
            print(
                json.dumps(
                    {
                        "op": op,
                        "factor": factor,
                        "rows": n,
                        "sec": round(time.time() - t0, 2),
                    }
                ),
                flush=True,
            )
        ev.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
