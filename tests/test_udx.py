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


def test_cogrouped_asof_matches_builtin_asof_join(spark, sf_dir):
    from aoseventstreamer_spark.operators.asof import as_of_join
    from aoseventstreamer_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    via_cogroup = sorted(
        map(tuple, udx.cogrouped_asof(clicks, purchases).collect())
    )
    via_builtin = sorted(
        map(
            tuple,
            as_of_join(
                clicks, purchases, key="user_id",
                right_vals=["value"], how="inner",
            )
            .select("event_id", "user_id", "ts", "asof_ts", "asof_value")
            .collect(),
        )
    )
    assert via_cogroup == via_builtin
    assert len(via_cogroup) > 0


def test_cogrouped_asof_handles_one_sided_keys(spark):
    import datetime as d

    left = spark.createDataFrame(
        [(1, 10, d.datetime(2024, 1, 1, 12))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(99, d.datetime(2024, 1, 1, 11), 5.0)],
        "user_id long, ts timestamp, value double",
    )
    # no shared key -> inner semantics -> empty, not an Arrow crash
    assert udx.cogrouped_asof(left, right).count() == 0
