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
(rank-then-filter equals truncate-then-rank for row_number), so the
single-partition rank windows run over bounded candidate lists —
never the corpus; the fuse is a union + one id-keyed sum over
|legs|·leg_top rows.
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
        w = Window.orderBy(*order)
        parts.append(
            df.withColumn("__rank", F.row_number().over(w))
            .filter(F.col("__rank") <= leg_top)
            .select(
                F.col(id_col),
                F.expr(f"{RRF_UNIT} div ({k} + __rank)").alias("__rrf"),
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
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
