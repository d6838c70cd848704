"""Headline benchmark: runs representative queries from every operator
family at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Execution is forced with the noop sink (full pipeline runs, no driver
collect overhead), after a warm-up query that absorbs session/JIT cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aoseventstreamer_spark import queries as Q
from aoseventstreamer_spark.session import get_spark

HEADLINE = [
    "q_route_emits",
    "q_agg_events_by_type",
    "q_filter_subtree_prefix",
    "q_join_multiway",
    "q_agg_multi",
    "q_rank_events_per_user",
    "q_session_window",
    "q_window_sliding",
    "q_topk_per_group",
    "q_doc_exact_dedup",
    "q_doc_minhash_band",
    "q_doc_simhash",
    "q_near_dup_verified",
    "q_text_stats",
    "q_cosine_topk",
    "q_asof_join",
    "q_range_join",
    "q_percentiles",
    "q_ann_lsh",
]


def _amplify_inputs(spark, sf_dir: str, factor: int) -> str:
    """Deterministic row-amplification for the SCALING mode
    (SPARK_GRAFT_BENCH_AMPLIFY=N, default off): at sf0.1 every headline
    query is fixed-driver-overhead-bound, so a 32-vs-8-core ratio
    measures nothing (VERDICT r11). With N>1 the three fact tables are
    replicated N× into a fresh temp dir (generated UNTIMED before the
    bench, deleted at exit — inputs derived per invocation, never a
    cached result) and the bench runs the identical queries over it:

    - documents: doc_id*N+rep, replica text rotated + marked (the same
      deterministic perturbation as tools/sketch_scale.amplified);
    - events: event_id and user_id remapped per replica (per-user
      session/window shapes preserved, user count ×N);
    - embeddings: vec_id*N+rep, vectors unchanged;
    - dimension tables symlinked verbatim.

    Results under N>1 are NOT oracle-comparable (ids are remapped);
    the mode exists so the low-core/high-core ratio can separate
    parallel queries from driver-bound ones."""
    import atexit
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    out_dir = tempfile.mkdtemp(prefix=f"bench_amplify_{factor}x_")
    atexit.register(shutil.rmtree, out_dir, True)
    par = int(spark.sparkContext.defaultParallelism)
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    for name in sorted(os.listdir(sf_dir)):
        if not name.endswith(".parquet"):
            continue
        src, dst = f"{sf_dir}/{name}", f"{out_dir}/{name}"
        base = name[: -len(".parquet")]
        if base == "documents":
            df = (
                spark.read.parquet(src)
                .crossJoin(reps)
                .select(
                    (F.col("doc_id") * factor + F.col("rep")).alias("doc_id"),
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
                    "lang", "source", "n_chars",
                )
            )
        elif base == "events":
            df = spark.read.parquet(src).crossJoin(reps)
            df = df.select(
                (F.col("event_id") * factor + F.col("rep")).alias("event_id"),
                "ts",
                (F.col("user_id") * factor + F.col("rep")).alias("user_id"),
                "event_type", "value", "props",
            )
        elif base == "embeddings":
            df = (
                spark.read.parquet(src)
                .crossJoin(reps)
                .select(
                    (F.col("vec_id") * factor + F.col("rep")).alias("vec_id"),
                    "embedding", "label",
                )
            )
        else:
            os.symlink(os.path.abspath(src), dst)
            continue
        df.repartition(par).write.mode("overwrite").parquet(dst)
    return out_dir


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    amplify = int(os.environ.get("SPARK_GRAFT_BENCH_AMPLIFY", "1"))

    spark = get_spark("aoseventstreamer-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    if amplify > 1:
        spark.sparkContext.setJobDescription(f"amplify inputs {amplify}x (untimed)")
        sf_dir = _amplify_inputs(spark, sf_dir, amplify)
        spark.sparkContext.setJobDescription(None)

    # warm-up: session, codegen, parquet footers
    Q.QUERIES["q_agg_events_by_type"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # warm the Arrow worker pool (fork + pandas/numpy import, one worker
    # per core) so the embedding-similarity queries measure the kernel,
    # not the one-time daemon spawn
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _arrow_warmup(x: pd.Series) -> pd.Series:
        return x

    spark.range(0, cpus, 1, cpus).select(_arrow_warmup("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    # Build each query's DataFrame ONCE, then time two executions and
    # report the min:
    # - best-of-2 absorbs one-off JIT / GC / container-neighbor pauses
    #   (observed 3.6 s → 21 s on one run);
    # - building once keeps Python-side expression construction (heavy
    #   py4j chatter for the wide sketch plans — ~1.8 s for the
    #   minhash/simhash trees) out of the repeated passes, so the
    #   reported number is the engine's execution cost, which is what
    #   scales with data. Catalyst still re-optimizes per action; only
    #   the Python plan-tree build is amortized.
    # q_near_dup_verified's registered form pins its candidate phase
    # with an EAGER localCheckpoint at build time (the plan-shape
    # optimization, see operators/dedup.py) — that work would escape a
    # build-once timer. Benching the pin=False lazy form keeps ALL
    # engine work inside the timed action under this protocol; runtime
    # ReuseExchange dedupes the shared candidate subtree, so the
    # engine cost matches the pinned plan.
    def _near_dup_unpinned(s, d):
        from aoseventstreamer_spark.operators import dedup as D
        from aoseventstreamer_spark.session import load_table

        return D.verified_near_dup_pairs(
            load_table(s, d, "documents"), threshold=0.4, portable=True,
            pin=False,
        )

    builders = dict(Q.QUERIES)
    builders["q_near_dup_verified"] = _near_dup_unpinned

    dfs = {name: builders[name](spark, sf_dir) for name in HEADLINE}

    # TWO untimed executions per query first: the wide sketch plans
    # (minhash/simhash/LSH) generate kilobytes of codegen that the JVM
    # C2 JIT compiles asynchronously across the first executions — a
    # fixed per-plan cost that at real scale amortizes to zero, and on
    # this 5k-doc fixture otherwise dominates (q_near_dup_verified
    # measured 1.89 → 1.55 → 1.46 → 1.30 s across consecutive runs:
    # one warm run under-JITs it, and the interleaved timing below —
    # unlike the old back-to-back best-of-2 — gives C2 no second
    # chance before the first timed sample).
    for _ in range(2):
        for name in HEADLINE:
            dfs[name].write.format("noop").mode("overwrite").save()

    # min-of-N over INTERLEAVED full passes (VERDICT r6 item 1): a
    # single timing window can sample host contention that neither a
    # repeat run nor an idle machine reproduces (BENCH_r06 recorded
    # 31.2 s against a verified 7.8 s steady state — a 4x phantom).
    # Interleaving whole passes (pass loop OUTSIDE the query loop)
    # spreads each query's N samples across the full wall-clock span
    # of the bench, so a contention burst must last the entire bench
    # to poison every sample of any query. The reported value is the
    # sum of per-query minima — the contention-free estimate — and the
    # spread (per-query max-min plus per-pass totals) is printed
    # alongside so a regression claim is falsifiable from the artifact
    # alone. tools/bench_repeat.py remains for cross-JVM repeats.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    pass_totals: list[float] = []
    for _ in range(passes):
        pt = 0.0
        for name in HEADLINE:
            t0 = time.time()
            dfs[name].write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            samples[name].append(dt)
            pt += dt
        pass_totals.append(round(pt, 3))

    timings = {name: round(min(v), 3) for name, v in samples.items()}
    spread = {name: round(max(v) - min(v), 3) for name, v in samples.items()}
    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "passes": passes,
        "pass_totals": pass_totals,
        "spread": spread,
    }
    if amplify > 1:  # scaling mode: flagged so runs are never conflated
        payload["amplify"] = amplify
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
