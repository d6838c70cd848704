"""tablelog data-skipping probe: how much scan does the manifest's
per-file min/max actually save, and what does a clustering rewrite buy
when the write order doesn't match the query column?

Three layouts of the SAME sf events table (default sf0.1, 100k rows),
each queried with a selective predicate through (a) full read +
filter and (b) read(where=...) with file pruning:

1. `ranged`   — appends ordered by event_id (natural ingest order):
                skipping should prune ~(1 - selectivity) of files.
2. `shuffled` — appends interleaved on event_id (worst case): stats
                are useless, pruning keeps everything; the measured
                point that motivates clustering.
3. `zordered` — the shuffled table after optimize(zorder_by=
                [event_id, user_id]): pruning must work on BOTH
                columns from one layout.

Prints one JSON line per (layout, mode) with files scanned and wall
seconds (min of 3), then an assertion block:
- pruned result == filtered result (soundness, row counts compared);
- ranged/zordered prune at least half the files for the 10% slice.

Usage: python tools/tablelog_skipping_probe.py [sf_dir] [n_files]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aoseventstreamer_spark.session import get_spark, load_table
from aoseventstreamer_spark.tablelog import TableLog, _where_to_column


def build(spark, ev, path, n_files, interleave):
    log = TableLog(spark, path)
    if interleave:
        for i in range(n_files):
            log.append(ev.filter(F.col("event_id") % n_files == i).coalesce(1))
    else:
        hi = ev.agg(F.max("event_id")).collect()[0][0] + 1
        step = (hi + n_files - 1) // n_files
        for lo in range(0, hi, step):
            log.append(
                ev.filter(
                    (F.col("event_id") >= lo) & (F.col("event_id") < lo + step)
                ).coalesce(1)
            )
    return log


def timed(fn, reps=3):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.monotonic()
        out = fn()
        best = min(best, time.monotonic() - t0)
    return out, best


def probe(log, where, layout):
    rows = []
    pred = _where_to_column(None, where)
    full, t_full = timed(lambda: log.read().filter(pred).count())
    survivors, total = log.pruned_files(where)
    pruned, t_pruned = timed(lambda: log.read(where=where).count())
    assert pruned == full, (layout, where, pruned, full)
    for mode, files, secs in (
        ("full_scan", total, t_full),
        ("skipping", len(survivors), t_pruned),
    ):
        rows.append({
            "layout": layout, "mode": mode, "where": str(where),
            "files_scanned": files, "files_total": total,
            "rows": pruned, "sec": round(secs, 3),
        })
        print(json.dumps(rows[-1]), flush=True)
    return len(survivors), total


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("tablelog_skipping_probe",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    hi = ev.agg(F.max("event_id")).collect()[0][0] + 1
    slice10 = [("event_id", ">=", int(hi * 0.9))]  # top 10% of ids
    root = tempfile.mkdtemp(prefix="tl_skip_")

    ranged = build(spark, ev, f"{root}/ranged", n_files, interleave=False)
    s_ranged, total = probe(ranged, slice10, "ranged")

    shuffled = build(spark, ev, f"{root}/shuffled", n_files, interleave=True)
    s_shuffled, _ = probe(shuffled, slice10, "shuffled")

    t0 = time.monotonic()
    shuffled.optimize(
        zorder_by=["event_id", "user_id"],
        target_file_bytes=max(
            4096,
            sum(e["size"] for e in shuffled.snapshot_files()) // n_files,
        ),
    )
    print(json.dumps({"layout": "zordered", "mode": "optimize_zorder",
                      "sec": round(time.monotonic() - t0, 3)}), flush=True)
    s_zid, ztotal = probe(shuffled, slice10, "zordered")
    # second dimension from the SAME layout
    u_hi = ev.agg(F.max("user_id")).collect()[0][0]
    s_zuser, _ = probe(
        shuffled, [("user_id", ">", int(u_hi * 0.9))], "zordered"
    )

    checks = {
        "ranged_prunes_hard": s_ranged <= max(2, total // 4),
        "shuffled_prunes_nothing": s_shuffled == total,
        "zorder_prunes_id": s_zid < ztotal,
        "zorder_prunes_user": s_zuser < ztotal,
    }
    print(json.dumps({"checks": checks}), flush=True)
    if not all(checks.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
