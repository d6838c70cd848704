"""Demux sharding across SEPARATE DRIVER PROCESSES (VERDICT r9 item
2): docs/SCALE.md's 10k-group ceiling answer is "split the group fleet
over N DemuxRunners in N driver processes"; the r9 probe only measured
1/2/4 shards inside ONE driver (~30% return — the shards contend on
one Spark scheduler and one py4j bridge). This probe runs the claim as
stated: S independent ``python`` subprocesses, each with its OWN
SparkSession / JVM / checkpoint / DemuxRunner, tailing ONE shared
tablelog event log over a disjoint group manifest.

What it measures, per S in {1,2,4}:
- fleet wall (launch → last worker exits) and the worker-internal
  demux wall (excluding JVM/session startup, which amortizes over a
  long-running service);
- ms/group fleet-wide and PER-RUNNER marginal (worker demux wall /
  groups in that worker) — the linear-division claim holds if the
  per-runner marginal stays ≈ the single-runner baseline while the
  fleet wall divides;
- delivered tallies exact per shard (disjoint project sets make the
  expectation independent), so silent drops/dupes fail the probe.

Each worker gets local[32/S] so the probe models dividing one
machine; on a real fleet each runner owns a full driver host.

Usage: python tools/demux_multiproc_probe.py [groups] [shard_counts..]
(default: 600 1 2 4)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENTS_PER_PROJECT = 5
TOTAL_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_log(spark, path: str, n_projects: int) -> None:
    from aoseventstreamer_spark import schemas
    from aoseventstreamer_spark.operators.routing import route_emits
    from aoseventstreamer_spark.tablelog import TableLog

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


def worker(manifest_path: str) -> None:
    """One shard: own session, own checkpoint, disjoint groups."""
    with open(manifest_path) as f:
        m = json.load(f)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "6g")
    from aoseventstreamer_spark.session import get_spark
    from aoseventstreamer_spark.streaming.demux import DemuxRunner

    spark = get_spark(f"demux-worker-{m['shard']}", cpus=m["cpus"])
    spark.sparkContext.setLogLevel("ERROR")
    tallies: dict[str, int] = {}

    def mk_deliver(gid: str):
        def deliver(cid, df):
            tallies[gid] = tallies.get(gid, 0) + df.count()

        return deliver

    r = DemuxRunner(
        spark, m["log_path"], m["checkpoint"], log_format="tablelog"
    )
    for g in m["groups"]:
        r.register(g["id"], g["subject"], mk_deliver(g["id"]))
    t0 = time.time()
    q = r.start(trigger={"availableNow": True})
    q.awaitTermination(600)
    demux_wall = time.time() - t0
    out = {
        "shard": m["shard"],
        "groups": len(m["groups"]),
        "delivered": sum(tallies.values()),
        "demux_wall_s": round(demux_wall, 2),
        "ms_per_group": round(demux_wall / len(m["groups"]) * 1000, 2),
    }
    with open(m["result_path"], "w") as f:
        json.dump(out, f)
    spark.stop()


def run_fleet(
    work: str, log_path: str, g: int, shards: int, *, weak: bool = False
) -> dict:
    """``weak=False`` (strong scaling): G groups split over S
    processes, CPUs divided — on ONE box the division of CPUs offsets
    the division of groups, so this mostly measures the fixed
    per-runner cost (scan+checkpoint+plan ≈ 14 s at this SF).
    ``weak=True`` (weak scaling): EVERY process gets G groups and the
    same 8 CPUs; linear capacity means fleet wall stays flat while
    total groups processed grows ×S — the evidence that N runners on
    N hosts divide a 10k-group fleet, since separate hosts remove
    even the CPU contention this box adds."""
    if weak:
        per, cpus = g, int(os.environ.get("DEMUX_WEAK_CPUS", "8"))
        g = per * shards
    else:
        per = g // shards
        cpus = max(4, TOTAL_CPUS // shards)
    manifests = []
    for s in range(shards):
        m = {
            "shard": s,
            "cpus": cpus,
            "log_path": log_path,
            "checkpoint": os.path.join(work, f"ck_mp{shards}_{s}"),
            "result_path": os.path.join(work, f"res_mp{shards}_{s}.json"),
            "groups": [
                {"id": f"g{i}", "subject": f"UPDATES.STORAGE._.p{i}.>"}
                for i in range(s * per, (s + 1) * per)
            ],
        }
        p = os.path.join(work, f"manifest_{shards}_{s}.json")
        with open(p, "w") as f:
            json.dump(m, f)
        manifests.append((p, m))
    t0 = time.time()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", p],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        for p, _ in manifests
    ]
    for proc in procs:
        rc = proc.wait(timeout=900)
        assert rc == 0, f"worker exited {rc}"
    fleet_wall = time.time() - t0
    per_runner = []
    for _, m in manifests:
        with open(m["result_path"]) as f:
            res = json.load(f)
        expect = len(m["groups"]) * EVENTS_PER_PROJECT
        assert res["delivered"] == expect, (
            f"shard {res['shard']}: delivered {res['delivered']} != {expect}"
        )
        per_runner.append(res)
    return {
        "mode": "weak" if weak else "strong",
        "groups_total": g,
        "groups_per_process": per,
        "processes": shards,
        "cpus_per_process": cpus,
        "fleet_wall_s": round(fleet_wall, 2),
        "fleet_groups_per_s": round(g / fleet_wall, 1),
        "per_runner_demux_wall_s": [r["demux_wall_s"] for r in per_runner],
        "per_runner_ms_per_group": [r["ms_per_group"] for r in per_runner],
        "tallies_exact": True,
    }


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker(sys.argv[2])
        return
    args = [a for a in sys.argv[1:] if a != "--weak"]
    weak = "--weak" in sys.argv[1:]
    g = int(args[0]) if args else 600
    shard_counts = [int(a) for a in args[1:]] or [1, 2, 4]
    from aoseventstreamer_spark.session import get_spark

    spark = get_spark("demux-mp-parent", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="demux_mp_")
    log_path = os.path.join(work, "events")
    need = g * max(shard_counts) if weak else g
    build_log(spark, log_path, n_projects=max(2000, need))
    spark.stop()  # parent session released before the fleet runs
    for s in shard_counts:
        print(json.dumps(run_fleet(work, log_path, g, s, weak=weak)), flush=True)


if __name__ == "__main__":
    main()
