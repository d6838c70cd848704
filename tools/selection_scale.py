"""Model-based-selection scaling probe: DSIR weights + Gumbel top-k
resample and NB classification over the amplified sf0.1 documents
table (same deterministic amplification as sketch_scale.py) at
1x / 10x / 40x (5k → 200k docs, features = uni+bigrams ≈ 2 × tokens).

What it demonstrates at scale:
- the fitted models stay O(buckets) / O(classes × vocab) regardless
  of factor (printed per run) — the broadcast side never grows,
- scoring cost grows ~linearly with the corpus (one explode + one
  broadcast join + one keyed aggregate; no pairwise term anywhere),
- the top-k resample is TakeOrderedAndProject — per-partition heaps,
  so the selection adds no corpus-wide sort.

Usage: python tools/selection_scale.py [factors...]   (default 1 10 40)
Prints one JSON line per (factor, op) with rows and seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.selection import (
    dsir_select,
    nb_classify,
    nb_train,
)
from aoseventstreamer_spark.session import get_spark
from tools.sketch_scale import amplified


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 40]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("selection-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    for factor in factors:
        docs = amplified(spark, sf_dir, factor).select(
            "doc_id",
            "text",
            F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string")).alias("source"),
            F.element_at(
                F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es"), F.lit("zh")),
                ((F.col("doc_id") % 5) + 1).cast("int"),
            ).alias("lang"),
        )
        docs.persist()
        n = docs.count()

        t0 = time.time()
        sel = dsir_select(
            docs, 1000, F.col("source").isin("src0", "src1"), buckets=4096
        )
        rows = sel.count()
        print(
            json.dumps(
                {
                    "op": "dsir_select_top1000",
                    "factor": factor,
                    "docs": n,
                    "rows": rows,
                    "sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )

        t0 = time.time()
        model = nb_train(docs, class_col="lang")
        pred = nb_classify(docs, model)
        rows = pred.count()
        model_rows = model[0].count()
        print(
            json.dumps(
                {
                    "op": "nb_train_classify",
                    "factor": factor,
                    "docs": n,
                    "rows": rows,
                    "model_rows": model_rows,
                    "sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )
        docs.unpersist()


if __name__ == "__main__":
    main()
