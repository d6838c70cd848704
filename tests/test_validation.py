"""Tests for the data-validation constraint suite (q_dq_checks) and
the winsorization/inverted-index additions: check semantics (a
violated bound must FAIL, clean constraints must PASS), clamp-band
invariants, and posting-list completeness."""

from __future__ import annotations

from pyspark.sql import functions as F

from aoseventstreamer_spark.queries import QUERIES


def test_dq_suite_reports_pass_and_fail(spark, sf_dir):
    rows = {r.check_name: r for r in QUERIES["q_dq_checks"](spark, sf_dir).collect()}
    assert len(rows) == 6
    # clean fixture: completeness/uniqueness/ref/accepted/volume pass
    assert rows["completeness_o_custkey"].passed
    assert rows["completeness_o_custkey"].metric == 1_000_000
    assert rows["uniqueness_o_orderkey"].passed
    assert rows["uniqueness_o_orderkey"].metric == 0
    assert rows["ref_orders_customer"].passed
    assert rows["accepted_o_orderstatus"].passed
    assert rows["min_rows_orders"].passed
    # the deliberately tight price bound must actually catch rows
    assert not rows["range_o_totalprice"].passed
    assert rows["range_o_totalprice"].metric > 0


def test_winsorize_clamps_to_band_and_keeps_interior(spark, sf_dir):
    df = QUERIES["q_winsorize"](spark, sf_dir)
    bad = df.where(
        (F.col("clamped") & (F.col("winsorized_cents") == F.col("value_cents")))
        | (~F.col("clamped") & (F.col("winsorized_cents") != F.col("value_cents")))
    ).count()
    assert bad == 0
    # winsorized values never exceed the observed clamped range
    agg = df.agg(
        F.min("winsorized_cents").alias("lo"),
        F.max("winsorized_cents").alias("hi"),
        F.sum(F.col("clamped").cast("long")).alias("n_clamped"),
    ).collect()[0]
    assert agg.lo >= 0 and agg.hi > agg.lo
    # p05/p95 capping must touch roughly 10% of rows (5% per tail)
    n = df.count()
    assert 0.02 * n < agg.n_clamped < 0.25 * n


def test_inverted_index_postings_cover_token_occurrences(spark, sf_dir):
    idx = QUERIES["q_inverted_index"](spark, sf_dir)
    r = idx.where(F.col("df") > 1).orderBy("tok").first()
    assert r is not None
    assert len(r.postings) == r.df
    assert r.postings == sorted(r.postings)
    assert r.cf >= r.df
