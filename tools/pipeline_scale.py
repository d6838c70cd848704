"""Training-pipeline scaling probe (round-3 ops): amplify the sf0.1
documents table (same deterministic scheme as sketch_scale.py) and
time, at 1x / 10x / 40x:

- the Gopher quality suite (pure codegen'd expressions),
- repetition stats (explode → count → max, doc-keyed),
- fixed-window chunking (sequence + slice explode, no shuffle),
- the FULL dedup pipeline: minhash → LSH bands (capped buckets) →
  candidate pairs → connected components → keeper selection.

Amplification makes every base doc a 10/40-member near-dup cluster, so
the components stage faces a *denser* graph as scale grows — the
adversarial direction.

Usage: python tools/pipeline_scale.py [factors...]   (default: 1 10 40)
Prints one JSON line per (factor, op) with rows and seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.components import dedup_components
from aoseventstreamer_spark.operators.dedup import minhash_dedup_pairs
from aoseventstreamer_spark.session import get_spark
from tools.sketch_scale import amplified


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 40]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pipeline-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    from aoseventstreamer_spark.queries import QUERIES

    for factor in factors:
        docs = amplified(spark, sf_dir, factor)
        docs.persist()
        n = docs.count()  # materialize once so probes time the op, not the amplify

        def probe(op: str, fn) -> None:
            t0 = time.time()
            rows = fn()
            print(
                json.dumps(
                    {"factor": factor, "docs": n, "op": op,
                     "rows": rows, "sec": round(time.time() - t0, 2)}
                ),
                flush=True,
            )

        toks = F.split("text", " ")
        probe(
            "quality_suite",
            lambda: docs.select(
                "doc_id",
                F.size(toks).alias("n"),
                F.aggregate(
                    F.transform(toks, lambda x: F.length(x).cast("long")),
                    F.lit(0).cast("long"),
                    lambda a, x: a + x,
                ).alias("sum_len"),
            ).write.format("noop").mode("overwrite").save() or docs.count(),
        )
        probe(
            "chunking",
            lambda: docs.select(
                "doc_id", toks.alias("toks")
            )
            .filter(F.size("toks") >= 16)
            .select(
                "doc_id",
                F.explode(F.sequence(F.lit(1), F.size("toks") - 15, F.lit(12))).alias("i"),
                "toks",
            )
            .select(F.concat_ws(" ", F.slice("toks", F.col("i"), F.lit(16))))
            .write.format("noop")
            .mode("overwrite")
            .save()
            or 0,
        )
        probe(
            "dedup_to_components",
            lambda: dedup_components(
                docs, minhash_dedup_pairs(docs, max_bucket_size=200)
            )
            .filter(~F.col("is_keeper"))
            .count(),
        )

        # the FULL 6-step curation recipe in one plan (round-4 form:
        # portable near-dup + self-trained perplexity gate). The
        # amplified corpus is near-dup-dense, so the near_dedup step
        # does real work at every factor.
        from aoseventstreamer_spark.operators.curation import CurationPipeline

        pipe = CurationPipeline(
            [
                ("lang", {"keep": ["en"]}),
                ("quality", {"min_score": 0.5}),
                ("exact_dedup", {}),
                ("near_dedup", {"threshold": 0.4, "max_bucket_size": 200}),
                # perplexity with train=None reads its input ~5x (model
                # aggregates + scoring); cache the near-dedup survivors
                # so the LSH chain above runs once, not five times
                ("materialize", {}),
                ("perplexity", {"max_ppl": 35.0}),
                ("weighted_sample", {"weight_col": "n_chars"}),
            ]
        )
        cdocs = docs.withColumn("n_chars", F.length("text").cast("long"))
        probe("curation_full_6step", lambda: pipe.apply(cdocs).count())
        pipe.release()
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
