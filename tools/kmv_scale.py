"""KMV sketch scaling probe: does the grouped build really move
O(groups·k) rows, not O(distinct keys)?

Amplifies sf0.1 events 1x/10x/40x with UNIQUE synthetic user ids per
replica (so the distinct-hash population grows linearly — the
quantity a naive global-window build would sort through one task) and
times the grouped sketch build plus a set-op between two amplified
event types. Shuffle volume for the top-k stage is read from the
WindowGroupLimit contract: mappers forward ≤ k rows per group.

Usage: python tools/kmv_scale.py [factors...]   (default: 1 10 40)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import kmv
from aoseventstreamer_spark.session import get_spark, load_table

K = 256


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 40]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "kmv-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    for f_ in factors:
        reps = spark.range(f_).select(F.col("id").alias("rep"))
        ampl = ev.crossJoin(reps).select(
            "event_type",
            (F.col("user_id") + F.col("rep") * 10_000_000).alias("user_id"),
        ).localCheckpoint()
        n_rows = ampl.count()
        t0 = time.time()
        sk = kmv.kmv_sketch(ampl, "user_id", K, group_cols=["event_type"])
        n_sketch = sk.count()
        t1 = time.time()
        a = kmv.kmv_sketch(
            ampl.where(F.col("event_type") == "click"), "user_id", K
        )
        b = kmv.kmv_sketch(
            ampl.where(F.col("event_type") == "purchase"), "user_id", K
        )
        ops = kmv.kmv_set_ops(a, b, K).collect()[0]
        t2 = time.time()
        est_union = kmv.kmv_estimate(ops.n_used, ops.tau, K)
        print(
            json.dumps(
                {
                    "factor": f_,
                    "rows": n_rows,
                    "sketch_rows": n_sketch,
                    "grouped_build_sec": round(t1 - t0, 2),
                    "set_ops_sec": round(t2 - t1, 2),
                    "est_union": round(est_union),
                    "n_match": ops.n_match,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
