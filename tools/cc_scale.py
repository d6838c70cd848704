"""Connected-components scaling probe (round-5 verdict item #7):
prove the O(log n) driver-sync claim empirically.

Builds synthetic near-dup graphs at growing node counts — a mix of
quasi-cliques (the shape LSH near-dup graphs actually produce) plus
one long path (worst-case diameter) — and measures resolve wall time,
propagation rounds, and driver-sync blocks. The claim under test:
blocks grow like log2(diameter)/checkpoint_every and wall time grows
sub-linearly in nodes (per-block job cost is data-bound, not
round-bound).

Usage: python tools/cc_scale.py [sizes...]   (default: 1000 10000 40000)
Prints one JSON line per size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.components import connected_components
from aoseventstreamer_spark.session import get_spark


def synthetic_edges(spark, n_nodes: int):
    """~n_nodes nodes: 90% in 5-node quasi-cliques (ring edges), 10%
    in one long path — deterministic, no RNG."""
    clique_nodes = (n_nodes * 9) // 10
    path_nodes = n_nodes - clique_nodes
    cliques = (
        spark.range(clique_nodes)
        .select(
            F.col("id").alias("doc_a"),
            # ring within each 5-node group: (i) -> (group*5 + (i+1)%5)
            ((F.col("id") - F.col("id") % 5) + (F.col("id") + 1) % 5).alias("doc_b"),
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
    )
    path = (
        spark.range(clique_nodes, clique_nodes + path_nodes - 1)
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    )
    return cliques.unionByName(path)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1000, 10000, 40000]
    spark = get_spark("cc_scale")
    for n in sizes:
        edges = synthetic_edges(spark, n).localCheckpoint()
        n_edges = edges.count()
        stats: dict = {}
        t0 = time.time()
        comp = connected_components(edges, stats=stats)
        n_out = comp.count()
        dt = time.time() - t0
        n_comp = comp.select("component").distinct().count()
        print(json.dumps({
            "nodes": n, "edges": n_edges, "labeled": n_out,
            "components": n_comp, "rounds": stats.get("rounds"),
            "blocks": stats.get("blocks"), "resolve_sec": round(dt, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
