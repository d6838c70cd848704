"""Z-order vs Hilbert pruning probe: cluster the sf0.1 events table
both ways (same quantile grid, same file count), then measure how many
files a range filter on EACH dimension must read, from REAL parquet
footer min/max. Lower = tighter per-file envelopes = fewer false
reads at 100 TB. Prints one JSON line per (layout, dim, selectivity).

Usage: python tools/layout_probe.py [sf_dir] [n_files]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.layout import cluster_write
from aoseventstreamer_spark.session import get_spark, load_table


def file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    out = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = meta.schema.names.index(col)
        lo = min(meta.row_group(r).column(idx).statistics.min for r in range(meta.num_row_groups))
        hi = max(meta.row_group(r).column(idx).statistics.max for r in range(meta.num_row_groups))
        out.append((lo, hi))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("layout-probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("user_id").cast("long").alias("user_id"),
        F.col("value").cast("double").alias("value"),
    )
    base = tempfile.mkdtemp(prefix="layout_probe_")
    zpath, hpath = os.path.join(base, "z"), os.path.join(base, "h")
    # the PRODUCTION write path for both layouts — the probe must
    # measure what cluster_write actually does, not a re-implementation
    # (quantile_buckets is deterministic, so both calls see one grid)
    cluster_write(ev, zpath, ["user_id", "value"], n_files=n_files, curve="zorder")
    cluster_write(ev, hpath, ["user_id", "value"], n_files=n_files, curve="hilbert")

    stats = {c: ev.approxQuantile(c, [0.45, 0.55, 0.25, 0.75], 0.001)
             for c in ("user_id", "value")}
    for layout, path in (("zorder", zpath), ("hilbert", hpath)):
        for col in ("user_id", "value"):
            ranges = file_ranges(path, col)
            q45, q55, q25, q75 = stats[col]
            for sel, (lo, hi) in (("10pct", (q45, q55)), ("50pct", (q25, q75))):
                hit = sum(1 for a, b in ranges if not (b < lo or a > hi))
                print(json.dumps({
                    "layout": layout, "filter_col": col, "selectivity": sel,
                    "files_read": hit, "files_total": len(ranges),
                }), flush=True)


if __name__ == "__main__":
    main()
