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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    spark = get_spark("aoseventstreamer-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

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
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "passes": passes,
                "pass_totals": pass_totals,
                "spread": spread,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
