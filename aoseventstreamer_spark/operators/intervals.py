"""Binned interval join: point-in-interval matching WITHOUT an equi
key, at fact-x-fact scale.

Spark has no native interval join; the naive spelling
``points.join(intervals, (ts >= s) & (ts < e))`` plans as a
BroadcastNestedLoop/CartesianProduct — every point against every
interval, unusable past dim-table sizes (the repo's q_range_join
avoids this only because it HAS an equi key to carry the shuffle).
The standard fix (DuckDB/Trino range-join binning, GeoSpark grids):
quantize the axis into fixed bins, explode each interval into the
bins it covers, equi-join points to intervals on the bin id, then
apply the exact predicate. The join is a plain hash/sort-merge
shuffle on the bin key; the exact filter trims the bin-edge
false pairs.

Dedup-free by construction: a point lives in exactly ONE bin, and an
interval's exploded bin list is distinct — so a matching (point,
interval) pair meets exactly once and no post-join dropDuplicates
shuffle is needed.

Bin-width tuning is the usual grid tradeoff: shuffle volume grows
with intervals x (span/bin) exploded rows, per-bin fan-in grows with
points per bin. Set ``bin_seconds`` near the median interval span;
for heavily clustered points (one hot hour), shrink bins or salt the
hot bin — AQE's skew-join split also arms on the post-explode join
(see tools/skew_probe.py).

Epoch arithmetic follows the repo's portable pattern: TIMESTAMP →
integer epoch seconds (cast-truncation == FLOOR(epoch()) for
post-1970 data, asserted by the q_running_sum_range oracle family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _epoch_s(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("timestamp").cast("long")


def bin_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "ts_start",
    end_col: str = "ts_end",
    bin_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join every point row to every interval row whose half-open
    [start, end) window contains it, via an equi-join on a
    ``bin_seconds`` quantization of the time axis. Returns the
    combined columns (point columns + interval columns, minus the
    helper bin). ``how='inner'`` only — outer variants of a binned
    join need an anti-join on the matched set, which callers
    compose explicitly."""
    if how != "inner":
        raise ValueError("bin_interval_join supports how='inner' only")
    b = F.lit(bin_seconds)
    p = points.withColumn("_bin", F.floor(_epoch_s(point_ts) / b))
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(_epoch_s(start_col) / b),
                F.floor(_epoch_s(end_col) / b),
            )
        ),
    )
    exact = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) < F.col(end_col)
    )
    return p.join(iv, "_bin").where(exact).drop("_bin")
