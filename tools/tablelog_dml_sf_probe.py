"""DML-tier scale probe on REAL testdata with a hive layout
(VERDICT r8 item 5): delete / update / merge / CDF / OPTIMIZE walls
and BYTES WRITTEN at two SFs, copy-on-write vs deletion vectors.

Setup per SF: the events table lands in a tablelog partitioned by
event_type (hive layout), each partition split into ranged event_id
slices — the layout a streaming ingest + OPTIMIZE would leave. Every
operation targets a FIXED-SELECTIVITY slice (1% of event_id space,
spread across every partition), so the claim under test is the
touched-file discipline: 10x rows with the same file granularity must
not cost 10x wall, and DV writes must stay proportional to deleted
ROWS while CoW rewrites whole files.

Bytes written: summed `size` of the commit's add actions (CoW) or the
on-disk size of the dv generation (DV) — both from the manifest the
operation landed.

Usage: python tools/tablelog_dml_sf_probe.py [sf_dir ...]
(default /root/testdata/sf0.1 /tmp/sf1 — generate /tmp/sf1 with
tools/gen_scale.py first)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aoseventstreamer_spark import get_spark  # noqa: E402
from aoseventstreamer_spark.session import load_table  # noqa: E402
from aoseventstreamer_spark.tablelog import TableLog  # noqa: E402


def _du(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def _commit_add_bytes(log: TableLog, version: int) -> int:
    return sum(
        a.get("size", 0)
        for a in log._read_manifest(version)["actions"]
        if a["op"] == "add"
    )


def build(spark, sf_dir: str, files_per_part: int = 8) -> TableLog:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    log = TableLog(spark, tempfile.mkdtemp(prefix="dmlsf_"))
    hi = ev.agg(F.max("event_id")).collect()[0][0] + 1
    step = max(1, hi // files_per_part)
    for lo in range(0, hi, step):
        log.append(
            ev.filter(
                (F.col("event_id") >= lo) & (F.col("event_id") < lo + step)
            ).repartition(1, "event_type"),
            partition_by=["event_type"],
        )
    return log, hi


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def probe(spark, sf_dir: str) -> dict:
    out = {"sf_dir": sf_dir}
    # --- CoW table ---
    log, hi = build(spark, sf_dir)
    out["rows"] = log.read().count()
    out["files"] = len(log.snapshot_files())
    out["table_bytes"] = _du(log.path)
    v0 = log.latest_version()
    # 1%-of-keyspace delete, spread across every hive partition
    sel = [("event_id", ">=", hi // 2), ("event_id", "<", hi // 2 + hi // 100)]
    s, r = timed(lambda: log.delete_where(sel))
    out["cow_delete_s"] = round(s, 2)
    out["cow_delete_files"] = r["files_rewritten"]
    out["cow_delete_bytes"] = _commit_add_bytes(log, log.latest_version())
    s, r = timed(
        lambda: log.update_where(
            [("event_id", "<", hi // 100)], {"value": "value + 1"}
        )
    )
    out["cow_update_s"] = round(s, 2)
    out["cow_update_bytes"] = _commit_add_bytes(log, log.latest_version())
    src = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .filter(F.col("event_id") % 199 == 0)
        .withColumn("value", F.col("value") * 2)
    )
    s, r = timed(lambda: log.merge_into(src, on=["event_id"]))
    out["merge_s"] = round(s, 2)
    out["merge_bytes"] = _commit_add_bytes(log, log.latest_version())
    s, n = timed(lambda: log.read_changes(v0).count())
    out["cdf_s"] = round(s, 2)
    out["cdf_rows"] = n
    s, r = timed(lambda: log.optimize(min_files=2))
    out["optimize_s"] = round(s, 2)
    out["optimize_groups"] = r["rewritten_groups"]
    # --- DV table (fresh clone, same delete) ---
    dvlog, _ = build(spark, sf_dir)
    s, r = timed(lambda: dvlog.delete_where(sel, use_dv=True))
    out["dv_delete_s"] = round(s, 2)
    gen = {
        e["dv"]["path"].rsplit("/", 1)[0]
        for e in dvlog.snapshot_files()
        if e.get("dv")
    }
    out["dv_delete_bytes"] = sum(_du(f"{dvlog.path}/{g}") for g in gen)
    out["dv_vs_cow_bytes"] = round(
        out["cow_delete_bytes"] / max(out["dv_delete_bytes"], 1), 1
    )
    return out


if __name__ == "__main__":
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1"]
    spark = get_spark(
        "tablelog-dml-sf-probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    rows = [probe(spark, d) for d in sf_dirs]
    for r in rows:
        print(json.dumps(r))
    if len(rows) == 2:
        for k in (
            "cow_delete_s",
            "cow_update_s",
            "merge_s",
            "cdf_s",
            "optimize_s",
            "dv_delete_s",
        ):
            ratio = rows[1][k] / max(rows[0][k], 1e-9)
            print(f"{k}: {rows[0][k]} -> {rows[1][k]} ({ratio:.2f}x for "
                  f"{rows[1]['rows'] // max(rows[0]['rows'], 1)}x rows)")
