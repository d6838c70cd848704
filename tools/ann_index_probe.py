"""Persisted-index scale probe: the build-once/query-many and
O(delta)-refresh claims as numbers.

At N corpus vectors (amplified from the sf0.1 embeddings table, same
deterministic perturbation as tools/ann_scale.py):

1. BUILD: full LSH index build into a tablelog table (band compute +
   write + pin).
2. QUERY (from-scratch vs persisted): the portable LSH pair query
   rebuilt per call vs answered from the prebuilt band table — the
   per-query saving is the reason the index exists.
3. INCREMENTAL: append a 1% delta to the corpus tablelog and refresh
   by change data feed vs a full rebuild at the new version — the
   refresh should cost O(delta), not O(corpus).

Usage: python tools/ann_index_probe.py [factors...]  (default: 1 10)
Prints one JSON line per (factor, op) with rows and seconds.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import ann_index as AI
from aoseventstreamer_spark.operators.similarity import portable_lsh_pairs
from aoseventstreamer_spark.session import get_spark, load_table
from aoseventstreamer_spark.tablelog import TableLog

DIM = 64


def amplified(spark, sf_dir: str, factor: int):
    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    if factor == 1:
        return base
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    return (
        base.crossJoin(reps)
        .select(
            (F.col("vec_id") * factor + F.col("rep")).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + F.when(i < 3, F.col("rep") * 0.001).otherwise(0.0),
            ).alias("embedding"),
        )
    )


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "ann-index-probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    for factor in factors:
        work = tempfile.mkdtemp(prefix=f"annidx_{factor}_")
        corpus = TableLog(spark, os.path.join(work, "corpus"))
        corpus.append(amplified(spark, sf_dir, factor))
        v1 = corpus.latest_version()
        n = corpus.read().count()
        idx = os.path.join(work, "idx")

        t0 = time.time()
        AI.build_lsh_index(
            spark, corpus.read(version=v1), idx,
            corpus_ident="p", corpus_version=v1, dim=DIM,
        )
        build_s = time.time() - t0

        queries = corpus.read(version=v1).filter(
            F.col("vec_id") % (50 * factor) == 0
        )
        t0 = time.time()
        scratch_rows = portable_lsh_pairs(
            corpus.read(version=v1), queries, dim=DIM
        ).count()
        scratch_s = time.time() - t0
        t0 = time.time()
        persisted_rows = AI.query_lsh_index(
            spark, idx, queries, corpus_ident="p", corpus_version=v1,
            dim=DIM,
        ).count()
        persisted_s = time.time() - t0
        assert persisted_rows == scratch_rows

        # 1% delta append -> CDF refresh vs full rebuild
        delta = corpus.read(version=v1).filter(
            F.col("vec_id") % 100 == 7
        ).withColumn("vec_id", F.col("vec_id") + n * 10)
        corpus.append(delta)
        v2 = corpus.latest_version()
        t0 = time.time()
        mode = AI.refresh_lsh_index_incremental(
            spark, corpus, idx, corpus_ident="p", dim=DIM
        )
        incr_s = time.time() - t0
        t0 = time.time()
        AI.build_lsh_index(
            spark, corpus.read(version=v2), os.path.join(work, "idx2"),
            corpus_ident="p", corpus_version=v2, dim=DIM,
        )
        rebuild_s = time.time() - t0
        print(
            json.dumps(
                {
                    "factor": factor,
                    "corpus_rows": n,
                    "build_s": round(build_s, 2),
                    "query_scratch_s": round(scratch_s, 2),
                    "query_persisted_s": round(persisted_s, 2),
                    "pair_rows": persisted_rows,
                    "refresh_mode": mode,
                    "incremental_refresh_s": round(incr_s, 2),
                    "full_rebuild_s": round(rebuild_s, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
