"""Measure deletion-vector DELETE vs copy-on-write DELETE.

The claim under test: a selective delete's WRITE cost under
merge-on-read tracks the DELETED ROW COUNT (a position sidecar),
while copy-on-write tracks the TOUCHED FILE BYTES (full rewrite of
every file containing a match) — and the dv read path's anti-join
overhead stays small against the rewrite it avoids. At 100 TB this is
the difference between an MB-scale sidecar write and a multi-GB
rewrite for a 0.1% delete.

Usage: python tools/tablelog_dv_probe.py [n_rows] [n_files]
(defaults 2M rows / 16 files; the delete marks 1 row per 1000,
spread across EVERY file — the adversarial case for copy-on-write)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from aoseventstreamer_spark import get_spark  # noqa: E402
from aoseventstreamer_spark.tablelog import TableLog  # noqa: E402


def build(spark, n_rows: int, n_files: int) -> TableLog:
    log = TableLog(spark, tempfile.mkdtemp(prefix="dvprobe_"))
    per = n_rows // n_files
    for i in range(n_files):
        log.append(
            spark.range(i * per, (i + 1) * per)
            .select(
                F.col("id"),
                (F.col("id") % 97).alias("k"),
                F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            )
            .coalesce(1)
        )
    return log


def tree_bytes(log: TableLog, subdir: str = "") -> int:
    import os

    total = 0
    root = f"{log.path}/{subdir}" if subdir else log.path
    for dirpath, dirs, files in os.walk(root):
        if not subdir:
            dirs[:] = [d for d in dirs if d != "_tablelog" or subdir]
        for f in files:
            total += os.path.getsize(f"{dirpath}/{f}")
    return total


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("dv-probe", cpus=8)
    pred = [("k", "=", 7)]  # ~1% of rows, present in EVERY file

    out = {}
    for mode, use_dv in (("cow", False), ("dv", True)):
        log = build(spark, n_rows, n_files)
        data_before = tree_bytes(log)
        t0 = time.time()
        res = log.delete_where(pred, use_dv=use_dv)
        t_del = time.time() - t0
        # bytes WRITTEN by the delete = tree growth (old files are
        # retained for time travel either way)
        written = tree_bytes(log) - data_before
        t0 = time.time()
        n = log.read().count()
        t_read = time.time() - t0
        out[mode] = {
            "rows_deleted": res["rows_deleted"],
            "files_touched": res.get("files_rewritten", res.get("files_marked")),
            "delete_s": round(t_del, 2),
            "bytes_written": written,
            "read_count_s": round(t_read, 2),
            "rows_after": n,
        }
        print(f"{mode}: {out[mode]}", flush=True)

    amp = out["cow"]["bytes_written"] / max(1, out["dv"]["bytes_written"])
    print(
        f"\nwrite amplification cow/dv = {amp:,.0f}x "
        f"({out['cow']['bytes_written']:,} vs {out['dv']['bytes_written']:,} bytes); "
        f"dv read overhead {out['dv']['read_count_s']}s vs {out['cow']['read_count_s']}s"
    )
    assert out["cow"]["rows_after"] == out["dv"]["rows_after"]


if __name__ == "__main__":
    main()
