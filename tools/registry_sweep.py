"""Time EVERY registry query once with the noop sink (guide §1.4).

One warmed session, one untimed JIT pass of a cheap query, then each
registry query executed once, labelled (guide §1.5), wall-clocked.
Single-pass numbers are for OUTLIER HUNTING (which operator is 10x the
others), not for A/B adjudication — pair runs in one window for that.

Usage: python tools/registry_sweep.py [sf_dir] [name-substring ...]
Prints a markdown table sorted by time desc + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    subs = sys.argv[2:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from aoseventstreamer_spark import queries as Q
    from aoseventstreamer_spark.session import get_spark

    spark = get_spark("registry-sweep", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    names = [
        n for n in Q.QUERIES
        if not subs or any(s in n for s in subs)
    ]

    # warm-up: session, codegen path, parquet footers, Arrow workers
    Q.QUERIES["q_agg_events_by_type"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    times: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        t0 = time.time()
        try:
            Q.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001 - sweep must survive one bad query
            times[name] = -1.0
            print(f"ERROR {name}: {type(e).__name__}: {e}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    print("| query | sec |")
    print("|---|---|")
    for name, sec in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"| {name} | {sec:.3f} |")
    print(json.dumps({"sweep": times, "sf_dir": sf_dir, "total": round(sum(times.values()), 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
