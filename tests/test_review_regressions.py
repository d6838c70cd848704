"""Regression tests for defects found in the package-wide review:
short-document guards, salted-join mode safety, count(col) semantics,
null-payload tolerance, LSH dimension independence, band divisibility."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import dedup as D
from aoseventstreamer_spark.operators import multimodal as MM
from aoseventstreamer_spark.operators import similarity as SIM
from aoseventstreamer_spark.operators.skew import salted_join, two_phase_agg


def test_minhash_survives_short_and_empty_docs(spark):
    rows = [(1, ""), (2, "one"), (3, "only two"),
            (4, "a full length document body here"),
            (5, "a full length document body here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r.doc_id: r.sig for r in D.minhash_docs(df).collect()}
    assert set(sigs) == {4, 5}  # short docs yield no shingles, no crash
    pairs = {(r.doc_a, r.doc_b) for r in D.minhash_dedup_pairs(df).collect()}
    assert pairs == {(4, 5)}


def test_ngram_set_empty_for_short_strings(spark):
    df = spark.createDataFrame([(1, "ab"), (2, "abc")], "doc_id long, text string")
    got = {r.doc_id: r.g for r in df.select("doc_id", D.ngram_set("text", 3).alias("g")).collect()}
    assert got[1] == []  # previously returned ['ab'] — a fake 3-gram
    assert got[2] == ["abc"]


def test_minhash_band_divisibility_enforced(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    with pytest.raises(ValueError, match="divisible"):
        D.minhash_dedup_pairs(df, num_hashes=18, bands=4)


def test_salted_join_rejects_outer_modes(spark):
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, on="k", how="right")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, on="k", how="full")


def test_two_phase_count_col_skips_nulls(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (1, None), (2, 3.0)], "k long, v double"
    )
    out = {r.k: (r.n_rows, r.n_vals) for r in two_phase_agg(
        df, "k", {"n_rows": "count(*)", "n_vals": "count(v)"}
    ).collect()}
    assert out[1] == (2, 1)  # count(*) counts the null row; count(v) doesn't
    assert out[2] == (1, 1)


def test_multimodal_tolerates_null_and_empty_payloads(spark):
    rows = [(1, "real content here"), (2, ""), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    media = MM.attach_binary_payload(df)
    feats = {r.media_id: r for r in MM.extract_image_features(media).collect()}
    assert len(feats) == 3  # no task death
    assert feats[1].feat is not None and feats[2].feat is None and feats[3].feat is None
    assert feats[3].n_bytes == 0 and feats[3].checksum is None
    # frame sampling skips unsampleable rows instead of crashing
    frames = MM.sample_frames(media, every_n_bytes=8).collect()
    assert {r.media_id for r in frames} == {1}


def test_lsh_bucket_independent_of_dimension(spark):
    """Hyperplanes size themselves from the data: 32-dim vectors must
    spread across buckets (previously a wrong dim param nulled every
    dot product and collapsed all rows into one bucket)."""
    import random

    random.seed(1)
    rows = [(i, [random.uniform(-1, 1) for _ in range(32)]) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    buckets = {
        r.b
        for r in df.select(
            SIM.lsh_bucket(SIM.as_double_vec("embedding"), 8).alias("b")
        ).collect()
    }
    assert len(buckets) > 4  # spread, not collapsed
    ann = SIM.lsh_ann_topk(df, df.filter(F.col("vec_id") < 3), k=2)
    assert ann.count() <= 6


def test_demux_reregistered_group_trips_missed_history_guard(spark, tmp_path):
    """Review regression: the manifest must hold the CURRENT group
    set, not the historical union — a group removed for some batches
    and re-registered also missed history."""
    import json
    import os

    import pytest

    from aoseventstreamer_spark.streaming.demux import DemuxRunner

    ck = str(tmp_path / "ck")
    r = DemuxRunner(spark, str(tmp_path / "events"), ck)
    r._check_group_set(["a", "b"], allow_missed_history=False)
    # 'a' drops out; manifest now must record only {'b'}
    r._check_group_set(["b"], allow_missed_history=False)
    with open(os.path.join(ck, "demux_groups.json")) as f:
        assert json.load(f) == ["b"]
    # 'a' re-registers -> guard fires (it missed the 'b'-only batches)
    with pytest.raises(ValueError, match="missed"):
        r._check_group_set(["a", "b"], allow_missed_history=False)


def test_compile_query_subject_missing_hierarchy_is_descriptive(spark, tmp_path):
    import pytest

    from aoseventstreamer_spark import schemas
    from aoseventstreamer_spark.streaming.groups import compile_query_subject

    with pytest.raises(ValueError, match="hierarchy keys"):
        compile_query_subject(schemas.RESOURCE_COLLECTION, "c1", True, None)
    with pytest.raises(ValueError, match="missing \\['shared_id'\\]"):
        compile_query_subject(
            schemas.RESOURCE_OBJECT, "o1", False,
            {"project_id": "p", "collection_id": "c"},
        )


def test_online_dedup_rejects_non_long_id(spark, tmp_path):
    import pytest

    from aoseventstreamer_spark.streaming.online_dedup import OnlineDeduper

    d = OnlineDeduper(spark, str(tmp_path / "state"), id_col="url")
    df = spark.createDataFrame([("u1", "some text here ok")], "url string, text string")
    with pytest.raises(TypeError, match="bigint"):
        d.process_batch(df, 0)


def test_uniform_draw_nonnegative_for_all_int64_ids(spark):
    """Round-4 ADVICE (medium): the naive (id*KNUTH) % 2**32 overflows
    int64 past id ~3.47e9 and Spark's wrap yields NEGATIVE draws, so
    every Bernoulli filter built on the draw silently accepts all rows.
    The limb-split form must stay in [0, 2**32) for every int64 id,
    agree with true Knuth mod 2**32, and match DuckDB's DRAW_SQL."""
    import duckdb

    from aoseventstreamer_spark.operators.sampling import DRAW_SQL, uniform_draw

    ids = [0, 1, 12345, 2**31 - 1, 2**31, 2**32 - 1, 2**32, 3_470_000_000,
           10**10, 2**40 + 7, 2**62, -1, -2**31, -(2**40) - 3,
           9223372036854775807, -9223372036854775808]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {r["id"]: r["d"] for r in
           df.select("id", uniform_draw("id").alias("d")).collect()}
    con = duckdb.connect()
    for i in ids:
        want = ((i % 2**32) * 2654435761) % 2**32
        assert got[i] == want, (i, got[i], want)
        assert 0 <= got[i] < 2**32
        duck = con.execute(f"SELECT {DRAW_SQL.format(c=str(i))}").fetchone()[0]
        assert duck == want, (i, duck, want)


def test_curation_near_dedup_rejects_typod_param(spark):
    """Round-4 ADVICE (low): a typo'd near_dedup kwarg must raise the
    friendly per-step error, not a TypeError inside minhash."""
    from aoseventstreamer_spark.operators.curation import CurationPipeline

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    pipe = CurationPipeline([("near_dedup", {"num_hashs": 8})])  # typo'd key
    with pytest.raises(ValueError, match="unused params for step near_dedup"):
        pipe.apply(df, observe=False)


def test_ngram_jaccard_guards_all_pairs_misuse(spark):
    """Round-4 VERDICT note: the all-pairs verify helper must refuse
    discovery-scale inputs instead of exploding O(n^2)."""
    big = spark.range(0, 50).select(
        F.col("id").alias("doc_id"), F.lit("some document text here").alias("text")
    )
    with pytest.raises(ValueError, match="all-pairs"):
        D.ngram_jaccard_pairs(big, max_docs=20)
    # bounded candidate sets still work
    assert D.ngram_jaccard_pairs(big.filter("doc_id < 5"), max_docs=20).count() == 10
