"""Routing-throughput probe: synthesize N emit requests with
``spark.range`` (no I/O bound), run the full routing pipeline, report
events/sec. The reference's write path is a per-request gRPC→NATS hop;
this measures the same logical work as one vectorized job.

Usage: python tools/throughput.py [n_emits]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aoseventstreamer_spark import schemas
from aoseventstreamer_spark.operators.routing import route_emits
from aoseventstreamer_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("throughput", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    raw = spark.range(n).select(
        F.col("id").alias("emit_id"),
        F.lit("s").alias("token"),
        ((F.col("id") % 4) + 1).cast("int").alias("event_resource"),
        F.concat(F.lit("res_"), F.col("id")).alias("resource_id"),
        F.lit(schemas.EVENT_TYPE_ALL).alias("event_type"),
        F.array(
            F.struct(
                F.concat(F.lit("p"), F.col("id") % 1000).cast("string").alias("project"),
                F.concat(F.lit("c"), F.col("id") % 100).cast("string").alias("collection"),
                F.concat(F.lit("so"), F.col("id") % 50).cast("string").alias("shared_object"),
                F.when(
                    F.col("id") % 3 == 0,
                    F.array(F.struct(F.concat(F.lit("sg"), F.col("id") % 7).alias("shared_object_group_id"))),
                ).otherwise(F.array().cast("array<struct<shared_object_group_id:string>>")).alias("object_groups"),
            )
        ).alias("relations"),
    )
    # warm-up
    route_emits(raw.limit(10000), secret="s").write.format("noop").mode("overwrite").save()
    t0 = time.time()
    route_emits(raw, secret="s").write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "metric": "routing_throughput",
                "emits": n,
                "seconds": round(dt, 2),
                "emits_per_sec": int(n / dt),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
