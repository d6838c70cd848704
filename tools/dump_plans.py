"""Dump .explain('formatted') for a set of queries to plans/<round>/.

Usage: python tools/dump_plans.py <suffix> [query ...]
  suffix: 'before' or 'after' — file name becomes
  plans/$SPARK_GRAFT_PLANS_ROUND/<q>_<suffix>.txt (round default: r12);
  with no query names, dumps every bench.HEADLINE query.

The captured plan is the pre-execution formatted plan (AdaptiveSparkPlan
initial plan) — the artifact the judge checks plan claims against.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def near_dup_unpinned(s, d):
    """Same unpinned form bench.py times (its local _near_dup_unpinned)."""
    from aoseventstreamer_spark.operators import dedup as D
    from aoseventstreamer_spark.session import load_table

    return D.verified_near_dup_pairs(
        load_table(s, d, "documents"), threshold=0.4, portable=True, pin=False
    )


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import bench
    from aoseventstreamer_spark import queries as Q
    from aoseventstreamer_spark.session import get_spark

    if not names:
        names = list(bench.HEADLINE)

    spark = get_spark("plan-dump", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    round_dir = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)

    builders = dict(Q.QUERIES)
    builders["q_near_dup_verified"] = near_dup_unpinned

    for name in names:
        df = builders[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
