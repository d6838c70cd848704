"""Tests for the binned interval join (operators/intervals.py):
half-open boundary semantics, bin-edge coverage (interval spanning
bins, point in a bin the interval only grazes), once-per-pair
uniqueness, and the no-nested-loop plan contract."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.intervals import bin_interval_join


def _pts(spark, ts_list):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(ts_list)], "pid long, ts timestamp"
    )


def _ivs(spark, rows):
    return spark.createDataFrame(
        rows, "iid long, ts_start timestamp, ts_end timestamp"
    )


def test_half_open_boundaries_and_bin_edges(spark):
    d = datetime
    pts = _pts(
        spark,
        [
            d(2024, 1, 1, 9, 59, 59),  # just before start -> no match
            d(2024, 1, 1, 10, 0, 0),  # == start -> match (closed)
            d(2024, 1, 1, 11, 30, 0),  # inside, different hour bin
            d(2024, 1, 1, 12, 0, 0),  # == end -> NO match (open)
        ],
    )
    ivs = _ivs(spark, [(1, d(2024, 1, 1, 10, 0, 0), d(2024, 1, 1, 12, 0, 0))])
    got = sorted(
        r.pid
        for r in bin_interval_join(pts, ivs, bin_seconds=3600).collect()
    )
    assert got == [1, 2]


def test_each_pair_matches_exactly_once_across_many_bins(spark):
    d = datetime
    # 10-hour interval (11 exploded bins) x points in several bins
    pts = _pts(spark, [d(2024, 1, 1, h, 30) for h in range(0, 12)])
    ivs = _ivs(spark, [(7, d(2024, 1, 1, 1, 0), d(2024, 1, 1, 11, 0))])
    rows = bin_interval_join(pts, ivs, bin_seconds=3600).collect()
    assert sorted(r.pid for r in rows) == list(range(1, 11))  # no dups


def test_plan_is_equi_join_not_nested_loop(spark):
    d = datetime
    pts = _pts(spark, [d(2024, 1, 1, 5, 0)])
    ivs = _ivs(spark, [(1, d(2024, 1, 1, 4, 0), d(2024, 1, 1, 6, 0))])
    plan = (
        bin_interval_join(pts, ivs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_outer_mode_rejected(spark):
    d = datetime
    pts = _pts(spark, [d(2024, 1, 1, 5, 0)])
    ivs = _ivs(spark, [(1, d(2024, 1, 1, 4, 0), d(2024, 1, 1, 6, 0))])
    with pytest.raises(ValueError):
        bin_interval_join(pts, ivs, how="left")
