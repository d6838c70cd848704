"""operators/ranking.py: the two-phase global rank / exact NTILE must
value-match Spark's own window functions (the semantic spec) while its
plan contains no unpartitioned window over an unbounded frame (the
scale spec — checked here AND by the registry-wide gate in
tests/test_window_gate.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.ranking import (
    global_rank,
    ntile_bucket,
    ntile_exact,
)


def _frame(spark, n, parts=7):
    # non-trivial value distribution with duplicate sort values; id is
    # the unique tie-break
    return (
        spark.range(0, n, 1, parts)
        .withColumn("v", (F.col("id") * 37 % 11).cast("long"))
        .withColumn("id", (F.col("id") * 1103515245 + 12345) % 100003)
        .distinct()
    )


@pytest.mark.parametrize("n_rows", [0, 1, 2, 5, 1000])
def test_global_rank_matches_window_row_number(spark, n_rows):
    df = _frame(spark, n_rows)
    order = [F.asc("v"), F.asc("id")]
    got = {
        (r["v"], r["id"]): r["rank"]
        for r in global_rank(df, order).collect()
    }
    w = Window.orderBy(*order)
    want = {
        (r["v"], r["id"]): r["rank"]
        for r in df.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_rank_total_col(spark):
    df = _frame(spark, 100)
    n = df.count()
    rows = global_rank(df, [F.asc("v"), F.asc("id")]).collect()
    assert all(r["__n_total"] == n for r in rows)
    assert sorted(r["rank"] for r in rows) == list(range(1, n + 1))


@pytest.mark.parametrize("n_rows,n", [(0, 3), (1, 3), (2, 3), (3, 3),
                                      (4, 3), (100, 3), (101, 3),
                                      (102, 3), (7, 10), (1000, 7)])
def test_ntile_exact_matches_window_ntile(spark, n_rows, n):
    df = _frame(spark, n_rows)
    order = [F.asc("v"), F.asc("id")]
    got = {
        (r["v"], r["id"]): r["b"]
        for r in ntile_exact(df, n, order, bucket_col="b").collect()
    }
    w = Window.orderBy(*order)
    want = {
        (r["v"], r["id"]): r["b"]
        for r in df.withColumn("b", F.ntile(n).over(w)).collect()
    }
    assert got == want


def test_ntile_bucket_descending_order(spark):
    df = _frame(spark, 50)
    order = [F.desc("v"), F.asc("id")]
    got = {
        (r["v"], r["id"]): r["b"]
        for r in ntile_exact(df, 4, order, bucket_col="b").collect()
    }
    want = {
        (r["v"], r["id"]): r["b"]
        for r in df.withColumn(
            "b", F.ntile(4).over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


def test_ntile_rejects_nonpositive_n(spark):
    with pytest.raises(ValueError):
        ntile_exact(_frame(spark, 10), 0, [F.asc("id")])


def test_ranking_plan_has_no_unbounded_global_window(spark, tmp_path):
    # Read from parquet so a real FileSourceScan sits under the plan —
    # the exact shape the gate inspects.
    from aoseventstreamer_spark.plans.inspect import (
        unbounded_global_window_sites,
    )

    p = str(tmp_path / "rank_src")
    _frame(spark, 500).write.parquet(p)
    df = spark.read.parquet(p)
    out = ntile_exact(df, 3, [F.asc("v"), F.asc("id")], bucket_col="b")
    assert unbounded_global_window_sites(out) == []
    # and the naive form IS flagged (the gate actually bites)
    naive = df.withColumn(
        "b", F.ntile(3).over(Window.orderBy(F.asc("v"), F.asc("id")))
    )
    assert unbounded_global_window_sites(naive) != []
