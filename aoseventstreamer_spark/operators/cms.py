"""Count-min sketch: mergeable approximate frequency counts.

Exact per-token counts over 100 TB of text are one giant shuffle whose
key cardinality is the vocabulary of the crawl — unbounded. A count-min
sketch caps the state at depth×width cells no matter the cardinality,
is mergeable by cell-wise addition (so partial sketches combine
map-side and across corpus shards/days), and answers point queries
with one-sided error: estimate ≥ truth, overcount ≤ εN with
probability 1-δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉ (Cormode &
Muthukrishnan 2005).

Spark-first representation: the sketch IS a DataFrame of (row_i, pos,
cnt) cells — built with one groupBy (map-side partial sums do the
merging), merged across sketches by unioning and re-grouping, probed
with an equi-join. No driver-side array, no UDF. The hash family is
the repo's portable md5 double-hashing (``operators/bloom.py``), so a
DuckDB oracle reproduces every cell and every overcount bit-for-bit.

Reference scope: no reference analog (LLM-pipeline mandate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.bloom import _h1, _h2


def _cell_pos(c: Column, i, m: int) -> Column:
    return (_h1(c) + i * _h2(c)) % m


def cms_cells(
    df: DataFrame, key_col: str, m: int, depth: int, weight_col: str | None = None
) -> DataFrame:
    """Pre-aggregation cell rows (row_i, pos, w) — the streaming
    integration point: feed these to ``IncrementalRollup`` with
    keys=(row_i, pos) and a SUM agg and the per-batch partials merge
    to exactly ``cms_build`` of the union (tested)."""
    if depth > 4:
        raise ValueError("depth>4 risks int64 overflow in h1 + i*h2")
    c = F.col(key_col)
    w = F.col(weight_col) if weight_col else F.lit(1)
    rows = F.transform(
        F.sequence(F.lit(0), F.lit(depth - 1)),
        lambda i: F.struct(i.alias("row_i"), _cell_pos(c, i, m).alias("pos")),
    )
    return df.select(F.explode(rows).alias("cell"), w.alias("w")).select(
        F.col("cell.row_i").alias("row_i"),
        F.col("cell.pos").alias("pos"),
        "w",
    )


def cms_build(
    df: DataFrame, key_col: str, m: int, depth: int, weight_col: str | None = None
) -> DataFrame:
    """Build the sketch over ``df`` rows (each counts ``weight_col`` or
    1): (row_i, pos, cnt) cells, at most depth×m rows. One shuffle on
    the cell key; partial aggregation does the map-side merge."""
    return (
        cms_cells(df, key_col, m, depth, weight_col)
        .groupBy("row_i", "pos")
        .agg(F.sum("w").cast("long").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-shape sketches (shards, days, streams)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row_i", "pos").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, m: int, depth: int
) -> DataFrame:
    """Point-query every row of ``keys``: est = min over the depth
    cells the key hashes to. Keys absent from the build estimate ≥ 0
    via the left join. The sketch side is bounded (depth×m cells) —
    broadcast it."""
    c = F.col(key_col)
    probes = F.transform(
        F.sequence(F.lit(0), F.lit(depth - 1)),
        lambda i: F.struct(i.alias("row_i"), _cell_pos(c, i, m).alias("pos")),
    )
    return (
        keys.select(*keys.columns, F.explode(probes).alias("cell"))
        .select(*keys.columns, F.col("cell.row_i").alias("row_i"), F.col("cell.pos").alias("pos"))
        .join(F.broadcast(sketch), ["row_i", "pos"], "left")
        .groupBy(*keys.columns)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )
