"""Rank fusion for hybrid retrieval: combine a lexical ranking
(BM25) and a semantic ranking (embedding dot product) into one
result list with Reciprocal Rank Fusion — the standard way a
training-data search stack merges its two persisted indexes
(operators/lexical.py postings, operators/ann_index.py bands)
without comparing incommensurable scores.

RRF(doc) = Σ_legs 1/(k + rank_leg(doc)), summed over the legs the
doc appears in (Cormack/Clarke/Buettcher 2009; k=60 is the paper's
constant). Engine-portable discipline: the reciprocal is computed as
the INTEGER 10^12 div (k + rank) — identical on any engine — and
every ordering carries an explicit id tie-break, so the fused list
hash-compares against a DuckDB oracle.

Scale shape: each leg is truncated to its own top-``leg_top`` FIRST
via ``orderBy(...).limit(leg_top)`` — which plans as
TakeOrderedAndProject (per-partition top-k heaps + one k-row merge),
NOT a single-partition sort — and only the ≤leg_top survivors see a
rank window. An unpartitioned ``row_number().over(orderBy)`` with a
post-filter is NOT equivalent at scale: Spark 4.1.2 fires neither
WindowGroupLimit nor a limit pushdown for empty-partitionBy windows
(same trap documented at operators/kmv.py:58-64), so the window
would funnel the whole corpus through one task. Truncate-then-rank
equals rank-then-filter for row_number over a total order, so the
result is unchanged — only the plan is. The fuse itself is a union +
one id-keyed sum over |legs|·leg_top rows, and the final fused-top
window ranks ≤ |legs|·leg_top aggregated rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60
RRF_UNIT = 10**12


def rrf_fuse(
    legs: list[tuple[DataFrame, list[Column]]],
    id_col: str = "doc_id",
    k: int = RRF_K,
    leg_top: int = 100,
    top: int = 20,
) -> DataFrame:
    """Fuse ``legs`` — each (frame, ordering) where the ordering MUST
    end in a deterministic id tie-break — into
    (id, rrf_u, n_legs) for the ``top`` fused ids, ordered by
    (rrf_u desc, id asc). ``rrf_u`` is the exact integer
    Σ 10^12 div (k + rank)."""
    if not legs:
        raise ValueError("at least one leg required")
    parts = []
    for df, order in legs:
        # Bound the leg BEFORE any window: sort+limit plans as
        # TakeOrderedAndProject (parallel per-partition heaps), then
        # the rank window runs over <= leg_top rows only.
        survivors = df.orderBy(*order).limit(leg_top)
        w = Window.orderBy(*order)
        parts.append(
            survivors.withColumn("__rank", F.row_number().over(w))
            .select(
                F.col(id_col),
                F.expr(f"{RRF_UNIT} div ({k} + __rank)").alias("__rrf"),
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    # The fused frame has <= |legs| * leg_top distinct ids, so this
    # final rank window is bounded by construction.
    w_top = Window.orderBy(F.desc("rrf_u"), F.asc(id_col))
    return (
        allp.groupBy(id_col)
        .agg(
            F.sum("__rrf").alias("rrf_u"),
            F.count(F.lit(1)).cast("long").alias("n_legs"),
        )
        .withColumn("__r", F.row_number().over(w_top))
        .filter(F.col("__r") <= top)
        .drop("__r")
    )
