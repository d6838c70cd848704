"""Demux SHARDING probe (VERDICT r8 item 6): docs/SCALE.md answers
the 10k-group ceiling with "run N DemuxRunners over disjoint group
sets" — this probe actually runs 1/2/4 sharded runners over one
shared TABLELOG event-log tail and measures whether sharding returns
the per-group marginal toward the smaller-fleet baseline.

Setup: one routed event log (collection-level events over P projects)
committed to a tablelog table; a fleet of G matching subtree groups.
For S in {1,2,4}: the fleet splits into S disjoint shards, each shard
gets its OWN DemuxRunner + checkpoint tailing the SAME table (the
snapshot-diff source, so every shard sees identical commit ranges),
all S availableNow queries start back-to-back from the registering
thread (the Python data-source registry is thread-local — start from
the main thread, await concurrently) and the probe records the
fleet-wide wall until the LAST query drains.

Every shard's delivered-row tally is asserted exact (disjoint project
sets make expectations independent), so a shard silently dropping or
double-delivering fails the probe, not just the timing.

Usage: python tools/demux_shard_probe.py [groups] [shard_counts...]
(default: 1000 1 2 4)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aoseventstreamer_spark import schemas  # noqa: E402
from aoseventstreamer_spark.operators.routing import route_emits  # noqa: E402
from aoseventstreamer_spark.session import get_spark  # noqa: E402
from aoseventstreamer_spark.streaming.demux import DemuxRunner  # noqa: E402
from aoseventstreamer_spark.tablelog import TableLog  # noqa: E402

EVENTS_PER_PROJECT = 5


def _build_tablelog(spark, path: str, n_projects: int) -> None:
    rows = [
        {
            "emit_id": p * 100 + i,
            "token": "t",
            "event_resource": schemas.RESOURCE_COLLECTION,
            "resource_id": f"c{i}",
            "event_type": schemas.EVENT_TYPE_ALL,
            "relations": [
                {"project": f"p{p}", "collection": None,
                 "shared_object": None, "object_groups": []}
            ],
        }
        for p in range(n_projects)
        for i in range(EVENTS_PER_PROJECT)
    ]
    raw = spark.createDataFrame(rows, schemas.RAW_EMITS_SCHEMA)
    TableLog(spark, path).append(route_emits(raw, secret="t"))


def _run_sharded(spark, log_path: str, work: str, g: int, shards: int) -> dict:
    tallies = [0] * shards
    locks = [threading.Lock() for _ in range(shards)]

    def mk_deliver(s: int):
        def deliver(cid, df):
            n = df.count()
            with locks[s]:
                tallies[s] += n

        return deliver

    runners = []
    per = g // shards
    for s in range(shards):
        ck = os.path.join(work, f"ck_s{shards}_{s}")
        r = DemuxRunner(
            spark, log_path, ck, log_format="tablelog"
        )
        for i in range(s * per, (s + 1) * per):
            r.register(f"g{i}", f"UPDATES.STORAGE._.p{i}.>", mk_deliver(s))
        runners.append(r)
    t0 = time.time()
    queries = [
        r.start(trigger={"availableNow": True}) for r in runners
    ]  # started from the registering thread (registry is thread-local)
    for q in queries:
        q.awaitTermination(600)
    wall = time.time() - t0
    expect_per = per * EVENTS_PER_PROJECT
    for s in range(shards):
        assert tallies[s] == expect_per, (
            f"shard {s}/{shards}: delivered {tallies[s]} != {expect_per}"
        )
    return {
        "groups": g,
        "shards": shards,
        "groups_per_shard": per,
        "wall_s": round(wall, 2),
        "ms_per_group": round(wall / g * 1000, 2),
    }


def main() -> None:
    g = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    shard_counts = [int(a) for a in sys.argv[2:]] or [1, 2, 4]
    spark = get_spark(
        "demux-shard-probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="demux_shard_")
    log_path = os.path.join(work, "events")
    _build_tablelog(spark, log_path, n_projects=max(2000, g))
    results = []
    for s in shard_counts:
        r = _run_sharded(spark, log_path, work, g, s)
        results.append(r)
        print(json.dumps(r), flush=True)
    if len(results) >= 2:
        base = results[0]["wall_s"]
        best = min(r["wall_s"] for r in results[1:])
        print(
            json.dumps(
                {
                    "speedup_best_vs_single": round(base / max(best, 1e-9), 2),
                    "note": "shards share one Spark scheduler; speedup is "
                    "bounded by the shared scan + driver py4j floor",
                }
            )
        )


if __name__ == "__main__":
    main()
