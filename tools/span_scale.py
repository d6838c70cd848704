"""Exact-substring (span) dedup scaling probe: amplify the sf0.1
documents table 1x / 10x / 40x and time the full ExactSubstr pass
(duplicate windows → merged spans → cut) on the production hashed-gram
key.

Amplification reuses the sketch-scale perturbation (replica marker +
word rotation, deterministic). Rotated replicas shift every window by
one position but keep the window *text* mostly intact, so the number
of duplicated occurrences grows superlinearly with the factor — the
dup-dense regime is the hard case for the gram-keyed shuffle (hot
grams get big window-function groups).

Usage: python tools/span_scale.py [factors...]   (default: 1 10 40)
Prints one JSON line per factor with rows, spans, tokens cut, seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import spans
from aoseventstreamer_spark.session import get_spark
from tools.sketch_scale import amplified

W = 8


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 40]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "span-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    for factor in factors:
        docs = amplified(spark, sf_dir, factor).localCheckpoint()
        n_docs = docs.count()
        t0 = time.time()
        occ = spans.duplicate_occurrences(docs, W, gram_key="xxhash64")
        sp = spans.merged_spans(occ, W)
        out = spans.cut_spans(docs, sp)
        agg = out.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens_cut").alias("cut"),
            F.sum((F.col("n_tokens_cut") > 0).cast("long")).alias("touched"),
        ).collect()[0]
        wall = time.time() - t0
        print(
            json.dumps(
                {
                    "factor": factor,
                    "docs": n_docs,
                    "touched_docs": int(agg["touched"]),
                    "tokens_cut": int(agg["cut"]),
                    "sec": round(wall, 2),
                }
            ),
            flush=True,
        )
        docs.unpersist()


if __name__ == "__main__":
    main()
