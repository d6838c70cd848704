"""ANN scaling probe: amplify the sf0.1 embeddings table in-memory
with deterministic perturbation and time the three approximate paths
(LSH, IVF, PQ) plus PQ encode alone at 1x / 10x / 40x.

Amplification adds a small deterministic per-replica offset to a few
coordinates, so replicas are near-duplicates of their base vector —
candidate structure gets denser with scale, the adversarial direction
for bucketed search.

Usage: python tools/ann_scale.py [factors...]   (default: 1 10 40)
Prints one JSON line per (factor, op) with rows and seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import pq as PQ
from aoseventstreamer_spark.operators.similarity import ivf_topk, lsh_ann_topk
from aoseventstreamer_spark.session import get_spark, load_table

DIM = 64


def amplified(spark, sf_dir: str, factor: int):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    if factor == 1:
        return emb
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    return (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") * factor + F.col("rep")).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + ((F.col("rep") % 7).cast("float") - 3.0)
                * F.when(i % 11 == F.col("rep") % 11, F.lit(0.01)).otherwise(0.0),
            ).alias("embedding"),
        )
        .repartition(int(spark.sparkContext.defaultParallelism))
    )


def timed(name: str, factor: int, df) -> None:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(
        json.dumps(
            {"op": name, "factor": factor, "sec": round(time.time() - t0, 2)}
        ),
        flush=True,
    )


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 40]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ann-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, sf_dir, "embeddings")
    queries = base.filter(F.col("vec_id") < 10)
    # codebooks train ONCE on the base corpus — at scale codebooks come
    # from a sample, not the amplified set
    books = PQ.train_pq_codebooks(base, dim=DIM, m=16, k=64)

    for factor in factors:
        cand = amplified(spark, sf_dir, factor)
        cand.cache().count()
        timed("lsh_topk", factor, lsh_ann_topk(cand, queries, k=3, dim=DIM))
        timed("pq_encode", factor, PQ.pq_encode(cand, books, DIM))
        timed("pq_topk", factor, PQ.pq_topk(cand, queries, books, dim=DIM, k=3))
        if factor <= 10:  # KMeans refit per factor; bounded
            timed("ivf_topk", factor, ivf_topk(cand, queries, k=3, n_probe=4))
        cand.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
