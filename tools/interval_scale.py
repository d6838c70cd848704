"""Binned interval-join scaling probe, including the adversarial
hot-bin case.

Amplifies sf0.1 events 1x/10x/40x two ways:

- ``spread``: replicas shifted by +factor days — bins stay uniformly
  loaded, matches grow linearly (the friendly case);
- ``hot``: every replica folded into the SAME month (timestamps kept,
  ids shifted) — the per-bin point population multiplies, the worst
  case for the bin equi-join (one hot hour = one hot join key).

For each, joins all events against the incident windows (error events,
id-mod rule, 2-hour span) and reports rows, matches, wall seconds.
AQE's skew-join split is what keeps the hot case from degrading — the
same machinery tools/skew_probe.py proves arms on hot fact-fact keys.

Usage: python tools/interval_scale.py [factors...]   (default: 1 10 40)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.intervals import bin_interval_join
from aoseventstreamer_spark.session import get_spark, load_table


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 40]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "interval-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    for f_ in factors:
        reps = spark.range(f_).select(F.col("id").alias("rep"))
        for mode in ("spread", "hot"):
            shift = (
                F.expr("make_interval(0, 0, 0, rep, 0, 0, 0)")
                if mode == "spread"
                else F.expr("make_interval(0, 0, 0, 0, 0, 0, 0)")
            )
            ampl = ev.crossJoin(reps).select(
                (F.col("event_id") + F.col("rep") * 10_000_000).alias(
                    "event_id"
                ),
                "user_id",
                "event_type",
                (F.col("ts") + shift).alias("ts"),
            ).localCheckpoint()  # amplification outside the timer
            n_rows = ampl.count()
            incidents = ampl.where(
                (F.col("event_type") == "error")
                & (F.col("event_id") % 101 == 0)
            ).select(
                F.col("event_id").alias("incident_id"),
                F.col("ts").alias("ts_start"),
                (F.col("ts") + F.expr("INTERVAL 2 hours")).alias("ts_end"),
            )
            t0 = time.time()
            matches = bin_interval_join(
                ampl.select("user_id", "ts"), incidents, bin_seconds=3600
            ).count()
            sec = round(time.time() - t0, 2)
            print(
                json.dumps(
                    {
                        "factor": f_,
                        "mode": mode,
                        "rows": n_rows,
                        "matches": matches,
                        "sec": sec,
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
