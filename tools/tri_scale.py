"""Triangle-counting scaling probe: amplify the sf0.1 lineitem table
1x/4x/10x by stamping shifted order+part key replicas (each replica
is a disjoint copy of the co-purchase graph, so edges/triangles grow
linearly and the wedge join's work is the quantity under test) and
time the full census (orient -> wedge join -> closure -> stats).

Usage: python tools/tri_scale.py [factors...]   (default: 1 4 10)
Prints one JSON line per factor: edges, triangles, wedges, seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.graph import triangle_stats
from aoseventstreamer_spark.session import get_spark, load_table


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "tri-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    for f_ in factors:
        reps = spark.range(f_).select(F.col("id").alias("rep"))
        ampl = li.crossJoin(reps).select(
            (F.col("l_orderkey") + F.col("rep") * 10_000_000).alias("ok"),
            (F.col("l_partkey") + F.col("rep") * 10_000_000).alias("pk"),
        )
        a, b = ampl.alias("a"), ampl.alias("b")
        edges = (
            a.join(
                b,
                (F.col("a.ok") == F.col("b.ok"))
                & (F.col("a.pk") < F.col("b.pk")),
            )
            .groupBy(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
            .agg(F.count(F.lit(1)).alias("w"))
            .where(F.col("w") >= 2)
            .select("src", "dst")
        )
        # materialize the amplified edge list OUTSIDE the timer — the
        # probe measures the census (orient/wedge/closure), not the
        # synthetic amplification join
        edges = edges.localCheckpoint()
        n_edges = edges.count()
        t0 = time.time()
        row = triangle_stats(edges).collect()[0]
        sec = round(time.time() - t0, 2)
        print(
            json.dumps(
                {
                    "factor": f_,
                    "edges": n_edges,
                    "triangles": row.n_triangles,
                    "wedges": row.n_wedges,
                    "sec": sec,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
