"""Measure the native tablelog writer vs TableLog.append.

The claim under test: the native writer's inline executor-side stats
remove append()'s post-write stats job (one extra scan of the written
files), so a stats-bearing transactional append through
``df.write.format("tablelog")`` costs about one parquet job — and both
paths produce equivalent manifests (stats present, counts provable).

Usage: python tools/tablelog_native_probe.py [n_rows] [n_appends]
(defaults 2M rows across 8 appends)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from aoseventstreamer_spark import get_spark  # noqa: E402
from aoseventstreamer_spark.sources.tablelog_source import (  # noqa: E402
    register_tablelog_source,
)
from aoseventstreamer_spark.tablelog import TableLog  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_appends = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("native-probe", cpus=8)
    register_tablelog_source(spark)
    per = n_rows // n_appends

    def slice_df(i: int):
        return spark.range(i * per, (i + 1) * per).select(
            F.col("id"),
            (F.col("id") % 97).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )

    out = {}
    for mode in ("append_api", "native_writer"):
        root = tempfile.mkdtemp(prefix=f"nprobe_{mode}_") + "/t"
        t0 = time.time()
        if mode == "append_api":
            log = TableLog(spark, root)
            for i in range(n_appends):
                log.append(slice_df(i))
        else:
            for i in range(n_appends):
                slice_df(i).write.format("tablelog").mode("append").save(
                    root
                )
            log = TableLog(spark, root)
        wall = time.time() - t0
        meta = log.metadata_count()
        assert meta == n_rows, (mode, meta)
        assert all(e.get("stats") for e in log.snapshot_files())
        kept, total = log.pruned_files([("id", "<", per)])
        out[mode] = {
            "wall_s": round(wall, 2),
            "s_per_append": round(wall / n_appends, 2),
            "files": total,
            "skipping_kept": len(kept),
        }
        print(f"{mode}: {out[mode]}", flush=True)

    speedup = out["append_api"]["wall_s"] / out["native_writer"]["wall_s"]
    print(
        f"\nnative writer {speedup:.2f}x vs append() at {n_appends} appends "
        f"x {per:,} rows (inline stats remove the post-write stats job); "
        "both manifests carry exact stats and prove metadata counts"
    )


if __name__ == "__main__":
    main()
