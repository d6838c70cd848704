"""Z-order clustered writes: verify against REAL parquet footers that
range filters on either clustered column prune most files."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.layout import cluster_write, zorder_key
from aoseventstreamer_spark.session import load_table


def _file_ranges(path, col):
    """(min, max) of ``col`` per parquet file, from footer stats."""
    out = {}
    for f in glob.glob(os.path.join(path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        mn, mx = None, None
        idx = meta.schema.names.index(col)
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            mn = st.min if mn is None else min(mn, st.min)
            mx = st.max if mx is None else max(mx, st.max)
        out[f] = (mn, mx)
    return out


def test_cluster_write_prunes_on_both_columns(spark, sf_dir, tmp_path):
    """Cluster on the two CONTINUOUS columns (z-order trades locality
    between columns, so each needs real domain cardinality) and verify
    against actual footers that a point query prunes on EITHER."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_int", F.col("value").cast("long")
    )
    path = str(tmp_path / "clustered")
    cluster_write(ev, path, ["event_id", "value_int"], n_files=16)

    files = glob.glob(os.path.join(path, "*.parquet"))
    assert len(files) >= 8  # range partitioner actually split the data

    total = ev.count()
    back = spark.read.parquet(path)
    assert back.count() == total  # lossless rewrite

    for col in ("event_id", "value_int"):
        ranges = _file_ranges(path, col)
        lo = min(mn for mn, _ in ranges.values())
        hi = max(mx for _, mx in ranges.values())
        span = (hi - lo) or 1
        # a point query at 25% of the domain (inside one z-quadrant on
        # this axis) must be skippable by footer stats in at least
        # half the files
        q = lo + 0.25 * span
        overlapping = [
            f for f, (mn, mx) in ranges.items() if mn <= q <= mx
        ]
        assert len(overlapping) <= len(files) // 2, (
            col,
            len(overlapping),
            len(files),
        )


def test_zorder_key_is_monotone_per_axis(spark):
    """Fixing one axis, the key must grow with the other — the
    property that makes range partitions align with value ranges."""
    df = spark.range(0, 256).select(
        F.col("id").alias("x"), F.lit(7).alias("y")
    )
    rows = (
        df.select("x", zorder_key(["x", "y"]).alias("z"))
        .orderBy("x")
        .collect()
    )
    zs = [r.z for r in rows]
    assert zs == sorted(zs)


def test_hilbert_key_matches_reference_and_is_bijective(spark):
    """with_hilbert_key == the published xy2d for every cell of a
    16x16 grid, covers 0..255 exactly once, and consecutive keys are
    grid-neighbors (the locality property Z-order lacks)."""
    from aoseventstreamer_spark.operators.layout import with_hilbert_key

    def rot(n, x, y, rx, ry):
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        return x, y

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            x, y = rot(n, x, y, rx, ry)
            s //= 2
        return d

    n = 16
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], ["x", "y"]
    )
    rows = with_hilbert_key(grid, "x", "y", bits=4).collect()
    pos = {}
    for r in rows:
        assert r.hkey == xy2d(n, r.x, r.y), (r.x, r.y)
        pos[r.hkey] = (r.x, r.y)
    assert sorted(pos) == list(range(n * n))
    for d in range(1, n * n):
        (a, b), (c, e) = pos[d - 1], pos[d]
        assert abs(a - c) + abs(b - e) == 1


def test_cluster_write_hilbert_prunes_and_roundtrips(spark, sf_dir, tmp_path):
    """curve='hilbert' through the same production API: lossless
    rewrite and point-query pruning on BOTH clustered columns via
    real footers; 3+ columns rejected loudly."""
    import pytest

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_int", F.col("value").cast("long")
    )
    path = str(tmp_path / "hclustered")
    cluster_write(ev, path, ["event_id", "value_int"], n_files=16, curve="hilbert")

    files = glob.glob(os.path.join(path, "*.parquet"))
    assert len(files) >= 8
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    for col in ("event_id", "value_int"):
        ranges = _file_ranges(path, col)
        lo = min(mn for mn, _ in ranges.values())
        hi = max(mx for _, mx in ranges.values())
        q = lo + 0.25 * ((hi - lo) or 1)
        overlapping = [f for f, (mn, mx) in ranges.items() if mn <= q <= mx]
        assert len(overlapping) <= len(files) // 2, (col, len(overlapping))

    with pytest.raises(ValueError, match="exactly 2 columns"):
        cluster_write(ev, path, ["event_id", "value_int", "user_id"], curve="hilbert")
    with pytest.raises(ValueError, match="unknown curve"):
        cluster_write(ev, path, ["event_id", "value_int"], curve="peano")
