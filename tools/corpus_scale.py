"""Corpus-curation scaling probe (round-3 pack): amplify the sf0.1
documents table (same deterministic scheme as sketch_scale.py) and
time, at 1x / 10x / 40x:

- substring dup fraction (gram-keyed min + join-back; amplification
  turns every gram into a 10/40-way duplicate — the adversarial
  direction, the gram table grows linearly but the dup ratio goes to
  ~100%),
- deterministic weighted Bernoulli sampling (broadcast max + narrow
  filter),
- per-source reservoir sampling (one stratum shuffle),
- BPE pair mining (narrow fan-out + map-side-combined counts +
  TakeOrdered),
- epoch shuffle manifest (one shard-keyed exchange).

Usage: python tools/corpus_scale.py [factors...]   (default: 1 10 40)
Prints one JSON line per (factor, op) with rows and seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from aoseventstreamer_spark.session import get_spark
from tools.sketch_scale import amplified

KNUTH, M32 = 2654435761, 2**32


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 40]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("corpus-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    for factor in factors:
        docs = amplified(spark, sf_dir, factor).select(
            "doc_id",
            "text",
            F.length("text").cast("long").alias("n_chars"),
            F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string")).alias(
                "source"
            ),
        )
        docs.persist()
        n = docs.count()

        def probe(op: str, df) -> None:
            t0 = time.time()
            rows = df.count()
            print(
                json.dumps(
                    {"factor": factor, "docs": n, "op": op,
                     "rows": rows, "sec": round(time.time() - t0, 2)}
                ),
                flush=True,
            )

        from aoseventstreamer_spark.operators.dedup import substring_dup_counts

        probe(
            "substring_dup_exact_strings",
            substring_dup_counts(docs, hashed=False),
        )
        probe(
            "substring_dup_hashed",
            substring_dup_counts(docs, hashed=True),
        )
        toks = F.split("text", " ")

        h = (F.col("doc_id") * KNUTH) % F.lit(M32)
        mx = docs.agg(F.max("n_chars").alias("m"))
        probe(
            "weighted_sample",
            docs.crossJoin(F.broadcast(mx)).filter(
                h * F.col("m") < F.col("n_chars") * F.lit(M32)
            ),
        )

        w = Window.partitionBy("source").orderBy(h, F.col("doc_id"))
        probe(
            "reservoir_sample",
            docs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10),
        )

        pairs = F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(2))),
        )
        probe(
            "bpe_pairs",
            docs.select(F.explode(pairs).alias("pair"))
            .groupBy("pair")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "pair")
            .limit(50),
        )

        shard_w = Window.partitionBy(h % 16).orderBy(
            F.floor(h / 16).cast("long"), F.col("doc_id")
        )
        probe(
            "epoch_shuffle",
            docs.select(
                "doc_id",
                (h % 16).cast("long").alias("shard"),
                F.row_number().over(shard_w).alias("position"),
            ),
        )
        from aoseventstreamer_spark.operators import bpe as B
        from aoseventstreamer_spark.operators import lm as LM

        probe("lm_perplexity_selftrained", LM.perplexity_scores(docs))

        t0 = time.time()
        merges = B.train_bpe(docs, num_merges=100)
        print(
            json.dumps(
                {"factor": factor, "docs": n, "op": "bpe_train_100_merges",
                 "rows": len(merges), "sec": round(time.time() - t0, 2)}
            ),
            flush=True,
        )
        probe("bpe_encode", B.bpe_token_count(docs, merges))
        docs.unpersist()


if __name__ == "__main__":
    main()
