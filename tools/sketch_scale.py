"""Document-sketch scaling probe: amplify the sf0.1 documents table
in-memory with deterministic perturbation and time the sketch
pipelines at 1x / 10x / 40x.

Amplification appends a per-replica marker token and rotates the word
order deterministically (no RNG — replicas are stable across runs), so
each base document gains near-copies and the LSH candidate structure
gets *denser* with scale — a harder workload than i.i.d. growth.

Usage: python tools/sketch_scale.py [factors...]   (default: 1 10 40)
Prints one JSON line per (factor, op) with rows and seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.dedup import (
    minhash_dedup_pairs,
    simhash_docs,
)
from aoseventstreamer_spark.session import get_spark, load_table


def amplified(spark, sf_dir: str, factor: int):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    if factor == 1:
        return docs
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    return (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") * factor + F.col("rep")).alias("doc_id"),
            # perturb: replica marker + rotate the first word to the end
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(
                F.concat_ws(
                    " ",
                    F.expr("concat_ws(' ', slice(split(text, ' '), 2, 1000000))"),
                    F.expr("split(text, ' ')[0]"),
                    F.concat(F.lit("rep"), F.col("rep")),
                )
            )
            .alias("text"),
        )
        .repartition(int(spark.sparkContext.defaultParallelism))
    )


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 40]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("sketch-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    for factor in factors:
        docs = amplified(spark, sf_dir, factor).cache()
        n = docs.count()  # materialize the amplified corpus outside the timing
        for op, fn in [
            ("minhash_lsh_pairs", lambda d: minhash_dedup_pairs(d)),
            ("simhash", lambda d: simhash_docs(d)),
        ]:
            t0 = time.time()
            out = fn(docs)
            out.write.format("noop").mode("overwrite").save()
            print(
                json.dumps(
                    {
                        "op": op,
                        "factor": factor,
                        "docs": n,
                        "sec": round(time.time() - t0, 2),
                    }
                ),
                flush=True,
            )
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
