"""UDx extension points (operators/udx.py): the UDTF and grouped-UDAF
shapes, each checked against a built-in-expression equivalent."""

from __future__ import annotations

from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import udx


def test_udtf_matches_posexplode(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, ""), (2, "solo")], "doc_id long, text string"
    )
    via_udtf = sorted(
        map(tuple, udx.tokenize_with_udtf(docs).collect())
    )
    via_builtin = sorted(
        map(
            tuple,
            docs.select(
                "doc_id", F.posexplode(F.split("text", r"\s+")).alias("pos", "tok")
            ).filter(F.col("tok") != "").collect(),
        )
    )
    assert via_udtf == via_builtin
    assert (0, 0, "alpha") in via_udtf


def test_grouped_udaf_matches_expression_math(spark):
    ev = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 3.0, 3), ("b", 10.0, 0)],
        "event_type string, value double, user_id long",
    )
    out = {r.event_type: r for r in udx.grouped_weighted_stats(ev).collect()}
    # group a: weights 2,4 -> mean (2*1+4*3)/6 = 7/3
    assert abs(out["a"].w_mean - 7 / 3) < 1e-6
    assert out["a"].n == 2
    # group b: single member -> variance 0
    assert out["b"].w_mean == 10.0 and out["b"].w_var == 0.0
