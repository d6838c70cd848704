"""Corpus-versioning scaling probe: snapshot diff + incremental
admission over the amplified sf0.1 documents table (same deterministic
amplification as sketch_scale.py) at 1x / 10x / 40x.

What it demonstrates: both operators exchange 16-byte fingerprints,
never text — diff is one full-outer key join, admission one
distinct + anti-join — so runtime tracks the corpus ~linearly with no
pairwise term, and the shuffled bytes stay a fixed small multiple of
the row count regardless of document size.

The derived v2 snapshot drops every 5th doc and edits every 11th —
amplification preserves the ratio, so added/removed/changed volumes
scale with the corpus (the adversarial direction for a diff).

Usage: python tools/versioning_scale.py [factors...]   (default 1 10 40)
Prints one JSON line per (factor, op).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.merge import incremental_admit, snapshot_diff
from aoseventstreamer_spark.session import get_spark
from tools.sketch_scale import amplified


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 40]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("versioning-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    for factor in factors:
        docs = amplified(spark, sf_dir, factor)
        docs.persist()
        n = docs.count()
        old = docs.filter(F.col("doc_id") % 7 != 0)
        new = docs.filter(F.col("doc_id") % 5 != 0).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text")),
        )

        t0 = time.time()
        by_status = {
            r.status: r.cnt
            for r in snapshot_diff(old, new, "doc_id", ["text"])
            .groupBy("status")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        print(
            json.dumps(
                {
                    "op": "snapshot_diff",
                    "factor": factor,
                    "docs": n,
                    "by_status": by_status,
                    "sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )

        t0 = time.time()
        admitted = incremental_admit(
            docs.filter(F.col("doc_id") % 5 != 0),
            docs.filter(F.col("doc_id") % 5 == 0),
        ).count()
        print(
            json.dumps(
                {
                    "op": "incremental_admit",
                    "factor": factor,
                    "docs": n,
                    "admitted": admitted,
                    "sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )
        docs.unpersist()


if __name__ == "__main__":
    main()
