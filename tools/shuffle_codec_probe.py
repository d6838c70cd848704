"""Shuffle-codec A/B (guide §2.3): lz4 (default) vs zstd at amplified
corpus scale, where shuffle volume is large enough for the codec to
matter (sf0.1 shuffles KBs — no measurement power there).

Each (codec, workload) cell runs in its OWN subprocess/session so the
codec config is clean and executor shuffle totals are attributable.
Workloads are the registry's shuffle-heaviest operators at 40x
amplification (~200k docs): substring-dup gram shuffle and the minhash
near-dup pipeline.

Usage: python tools/shuffle_codec_probe.py [factor]   (default 40)
Prints a markdown table + one JSON line per cell.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from aoseventstreamer_spark.session import get_spark
from tools.sketch_scale import amplified

codec, workload, factor = {codec!r}, {workload!r}, {factor}
spark = get_spark(
    "codec-probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    extra_conf={{"spark.io.compression.codec": codec, "spark.ui.enabled": "true"}},
)
spark.sparkContext.setLogLevel("ERROR")
docs = amplified(spark, "/root/testdata/sf0.1", factor).localCheckpoint()

if workload == "substring_dup":
    from aoseventstreamer_spark.operators.dedup import substring_dup_counts
    df = substring_dup_counts(docs)
elif workload == "minhash_pairs":
    from aoseventstreamer_spark.operators.dedup import minhash_dedup_pairs
    df = minhash_dedup_pairs(docs, max_bucket_size=50)
elif workload == "span_grams":
    from aoseventstreamer_spark.operators.spans import token_windows
    df = token_windows(docs, w=8).groupBy("key").agg(
        F.count("*").alias("n"), F.min("doc_id").alias("first_doc")
    )
else:
    raise SystemExit(f"unknown workload {{workload}}")

df.write.format("noop").mode("overwrite").save()  # warm (JIT, codegen)
walls = []
for _ in range(int(os.environ.get("SPARK_GRAFT_CODEC_PASSES", "4"))):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    walls.append(time.time() - t0)

import urllib.request
with urllib.request.urlopen("http://localhost:4040/api/v1/applications", timeout=3) as r:
    app = json.load(r)[0]["id"]
with urllib.request.urlopen(
    f"http://localhost:4040/api/v1/applications/{{app}}/executors", timeout=5
) as r:
    ex = json.load(r)
sh_w = sum(e.get("totalShuffleWrite", 0) for e in ex)
print(json.dumps({{
    "codec": codec, "workload": workload, "factor": factor,
    "wall_min_s": round(min(walls), 3), "walls": [round(w, 3) for w in walls],
    "total_shuffle_write_mb": round(sh_w / 1e6, 1),
}}))
spark.stop()
"""


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = []
    for workload in ("substring_dup", "minhash_pairs", "span_grams"):
        for codec in ("lz4", "zstd"):
            src = CHILD.format(repo=repo, codec=codec, workload=workload, factor=factor)
            out = subprocess.run(
                [sys.executable, "-c", src], capture_output=True, text=True
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not line:
                print(f"FAILED {codec}/{workload}: {out.stderr[-500:]}")
                continue
            rec = json.loads(line[-1])
            rows.append(rec)
            print(json.dumps(rec))
    print("\n| workload | lz4 s | zstd s | lz4 shuffle MB | zstd shuffle MB |")
    print("|---|---|---|---|---|")
    by = {(r["workload"], r["codec"]): r for r in rows}
    for w in ("substring_dup", "minhash_pairs", "span_grams"):
        l, z = by.get((w, "lz4")), by.get((w, "zstd"))
        if l and z:
            print(
                f"| {w} | {l['wall_min_s']} | {z['wall_min_s']} "
                f"| {l['total_shuffle_write_mb']} | {z['total_shuffle_write_mb']} |"
            )


if __name__ == "__main__":
    main()
