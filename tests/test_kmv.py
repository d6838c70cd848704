"""Unit tests for the KMV distinct sketch (operators/kmv.py):
merge exactness, the not-full-is-exact contract, set-op estimate
quality on a known-overlap construction, and the WindowGroupLimit
plan shape that makes the grouped build scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import kmv


def _keys(spark, vals, col="k"):
    return spark.createDataFrame([(v,) for v in vals], f"{col} string")


def test_merge_equals_sketch_of_union(spark):
    a = _keys(spark, [f"a{i}" for i in range(200)])
    b = _keys(spark, [f"a{i}" for i in range(100, 300)])  # 100 shared
    k = 16
    merged = kmv.kmv_merge(k, kmv.kmv_sketch(a, "k", k), kmv.kmv_sketch(b, "k", k))
    scratch = kmv.kmv_sketch(a.unionByName(b), "k", k)
    assert sorted(r.h for r in merged.collect()) == sorted(
        r.h for r in scratch.collect()
    )


def test_not_full_sketch_is_exact_and_duplicates_free(spark):
    df = _keys(spark, ["x", "y", "z", "x", "y"])  # 3 distinct
    sk = kmv.kmv_sketch(df, "k", 16).collect()
    assert len(sk) == 3
    assert [r.rank for r in sorted(sk, key=lambda r: r.h)] == [1, 2, 3]
    st = kmv.kmv_stats(kmv.kmv_sketch(df, "k", 16)).collect()[0]
    assert kmv.kmv_estimate(st.n_used, st.tau, 16) == 3.0


def test_estimate_within_tolerance_when_full(spark):
    n = 2000
    df = _keys(spark, [f"key{i}" for i in range(n)])
    k = 64
    st = kmv.kmv_stats(kmv.kmv_sketch(df, "k", k)).collect()[0]
    est = kmv.kmv_estimate(st.n_used, st.tau, k)
    # standard error ~ n/sqrt(k-2): 1/sqrt(62) ≈ 13%; allow 4 sigma
    assert abs(est - n) / n < 0.5


def test_set_ops_estimates_known_overlap(spark):
    # |A|=400, |B|=400, |A∩B|=200, |A∪B|=600
    a = _keys(spark, [f"v{i}" for i in range(400)])
    b = _keys(spark, [f"v{i}" for i in range(200, 600)])
    k = 128
    ops = kmv.kmv_set_ops(
        kmv.kmv_sketch(a, "k", k), kmv.kmv_sketch(b, "k", k), k
    ).collect()[0]
    est_union = kmv.kmv_estimate(ops.n_used, ops.tau, k)
    est_inter = ops.n_match / ops.n_used * est_union
    assert abs(est_union - 600) / 600 < 0.4
    assert abs(est_inter - 200) / 200 < 0.6
    # one-sided sanity: every matched hash really is in both sets
    assert 0 < ops.n_match < ops.n_used <= k


def test_ungrouped_build_compiles_to_take_ordered_not_global_window(spark):
    df = _keys(spark, [f"k{i}" for i in range(500)])
    sk = kmv.kmv_sketch(df, "k", 16)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = sk.collect()
    assert [r.rank for r in sorted(rows, key=lambda r: r.h)] == list(
        range(1, 17)
    )


def test_grouped_build_compiles_to_window_group_limit(spark):
    df = spark.createDataFrame(
        [(f"g{i % 3}", f"k{i}") for i in range(100)], "g string, k string"
    )
    sk = kmv.kmv_sketch(df, "k", 8, group_cols=["g"])
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    counts = {r.g: r["count"] for r in sk.groupBy("g").count().collect()}
    assert counts == {"g0": 8, "g1": 8, "g2": 8}
