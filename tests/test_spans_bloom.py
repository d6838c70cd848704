"""Unit tests for span-level exact-substring dedup (operators/spans.py)
and the DataFrame-native Bloom filter (operators/bloom.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import bloom, spans
from aoseventstreamer_spark.session import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- spans


def test_planted_duplicate_span_found_and_first_copy_kept(spark):
    # doc 2 repeats doc 1's 6-token sentence inside otherwise-unique text
    dup = "p q r s t u"
    df = _docs(
        spark,
        [
            (1, f"a b c {dup} d e f"),
            (2, f"g h i j {dup} k l"),
        ],
    )
    occ = spans.duplicate_occurrences(df, 6).collect()
    # only doc 2's occurrence is cut (doc 1 is the corpus-global first)
    assert {(r.doc_id, r.pos) for r in occ} == {(2, 5)}
    sp = spans.merged_spans(spans.duplicate_occurrences(df, 6), 6).collect()
    assert [(r.doc_id, r.span_start, r.span_end, r.n_windows, r.n_tokens) for r in sp] == [
        (2, 5, 10, 1, 6)
    ]


def test_overlapping_windows_merge_into_one_span(spark):
    # a 8-token duplicated region at w=6 → 3 overlapping dup windows
    region = "p q r s t u v w"
    df = _docs(spark, [(1, f"{region} x y z"), (2, f"a b {region} c")])
    sp = spans.merged_spans(spans.duplicate_occurrences(df, 6), 6).collect()
    assert [(r.doc_id, r.span_start, r.span_end, r.n_windows, r.n_tokens) for r in sp] == [
        (2, 3, 10, 3, 8)
    ]


def test_disjoint_spans_stay_separate(spark):
    d1, d2 = "p q r s t u", "j k l m n o"
    df = _docs(
        spark,
        [
            (1, f"{d1} a b {d2}"),
            (2, f"{d1} c d {d2}"),  # two dup regions, gap 2 < w but
            # separated by non-duplicate windows → islands split on pos gap
        ],
    )
    sp = sorted(
        spans.merged_spans(spans.duplicate_occurrences(df, 6), 6).collect(),
        key=lambda r: r.span_start,
    )
    # the in-between windows ("t u a b j k"...) differ across docs, so
    # only the two 6-token regions are dup; pos 1 and pos 9, gap 8 > 6
    assert [(r.doc_id, r.span_start, r.span_end) for r in sp] == [
        (2, 1, 6),
        (2, 9, 14),
    ]


def test_cut_rebuilds_text_and_counts(spark):
    dup = "p q r s t u"
    df = _docs(spark, [(1, f"{dup} x y"), (2, f"a b {dup} z")])
    out = {r.doc_id: r for r in spans.exact_substring_dedup(df, 6, gram_key="string").collect()}
    assert out[1].clean_text == f"{dup} x y"  # first copy untouched
    assert out[1].n_tokens_cut == 0
    assert out[2].clean_text == "a b z"
    assert out[2].n_tokens_cut == 6


def test_whole_doc_duplicate_cuts_to_empty(spark):
    txt = "p q r s t u v"
    df = _docs(spark, [(1, txt), (2, txt)])
    out = {r.doc_id: r for r in spans.exact_substring_dedup(df, 6, gram_key="string").collect()}
    assert out[1].clean_text == txt
    assert out[2].clean_text == ""
    assert out[2].n_tokens_cut == 7


def test_short_docs_produce_no_windows(spark):
    df = _docs(spark, [(1, "a b c"), (2, "a b c")])
    assert spans.duplicate_occurrences(df, 6).count() == 0


def test_hashed_gram_keys_match_string_keys(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    want = spans.merged_spans(
        spans.duplicate_occurrences(docs, 8, gram_key="string"), 8
    )
    for key in ("xxhash64", "md5"):
        got = spans.merged_spans(
            spans.duplicate_occurrences(docs, 8, gram_key=key), 8
        )
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0


def test_intra_doc_repeat_is_cut(spark):
    dup = "p q r s t u"
    df = _docs(spark, [(1, f"{dup} a b c {dup}")])
    sp = spans.merged_spans(spans.duplicate_occurrences(df, 6), 6).collect()
    assert [(r.doc_id, r.span_start, r.span_end) for r in sp] == [(1, 10, 15)]


# ---------------------------------------------------------------- bloom


@pytest.fixture(scope="module")
def corpus_batch(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("source") != "src0").select("text").distinct().cache()
    batch = docs.where(F.col("source") == "src0").select("doc_id", "text").cache()
    return corpus, batch


def test_bloom_no_false_negatives(spark, corpus_batch):
    corpus, batch = corpus_batch
    bits = bloom.bloom_build(corpus, "text", 4096, 3)
    adm = bloom.bloom_admit(batch, bits, "text", 4096, 3)
    exact = adm.join(corpus.withColumn("_s", F.lit(1)), "text", "left")
    # every exactly-seen text must be flagged maybe_seen
    assert (
        exact.where(F.col("_s").isNotNull() & ~F.col("maybe_seen")).count() == 0
    )


def test_bloom_self_membership_all_positive(spark, corpus_batch):
    corpus, _ = corpus_batch
    bits = bloom.bloom_build(corpus, "text", 4096, 3)
    self_adm = bloom.bloom_admit(
        corpus.withColumn("doc_id", F.lit(0)), bits, "text", 4096, 3
    )
    assert self_adm.where(~F.col("maybe_seen")).count() == 0


def test_bloom_fp_rate_sane(spark, corpus_batch):
    corpus, batch = corpus_batch
    bits = bloom.bloom_build(corpus, "text", 4096, 3)
    n_bits = bits.count()
    assert n_bits <= 4096
    adm = bloom.bloom_admit(batch, bits, "text", 4096, 3)
    novel = adm.join(corpus, "text", "left_anti")
    n_novel = novel.count()
    fp = novel.where("maybe_seen").count()
    # theoretical FP ≈ (fill ratio)^k; allow generous slack
    fill = n_bits / 4096
    assert fp / max(n_novel, 1) <= max(5 * fill**3, 0.02)


def test_bloom_matches_pure_python(spark):
    import hashlib

    rows = [(i, f"text number {i}") for i in range(50)]
    df = _docs(spark, rows)
    m, k = 512, 3

    def positions(s):
        h = hashlib.md5(s.encode()).hexdigest()
        h1, h2 = int(h[:15], 16), int(h[15:30], 16)
        return [(h1 + i * h2) % m for i in range(k)]

    want = sorted({p for _, s in rows for p in positions(s)})
    got = sorted(r.pos for r in bloom.bloom_build(df, "text", m, k).collect())
    assert got == want


# ------------------------------------------------------------------ cms


def test_cms_estimate_is_one_sided(spark):
    from aoseventstreamer_spark.operators import cms

    rows = [(i, f"tok{i % 7}") for i in range(100)]
    df = spark.createDataFrame(rows, "i long, tok string")
    sk = cms.cms_build(df, "tok", 8, 3)
    keys = df.select("tok").distinct()
    est = cms.cms_estimate(sk, keys, "tok", 8, 3)
    exact = df.groupBy("tok").count()
    j = est.join(exact, "tok").collect()
    assert len(j) == 7
    assert all(r.est_count >= r["count"] for r in j)


def test_cms_merge_equals_single_build(spark):
    from aoseventstreamer_spark.operators import cms

    rows = [(i, f"tok{i % 11}") for i in range(200)]
    df = spark.createDataFrame(rows, "i long, tok string")
    a, b = df.where("i < 90"), df.where("i >= 90")
    merged = cms.cms_merge(
        cms.cms_build(a, "tok", 16, 4), cms.cms_build(b, "tok", 16, 4)
    )
    whole = cms.cms_build(df, "tok", 16, 4)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_cms_absent_key_estimates_zero_when_no_collision(spark):
    from aoseventstreamer_spark.operators import cms

    df = spark.createDataFrame([(1, "only")], "i long, tok string")
    sk = cms.cms_build(df, "tok", 4096, 3)
    probe = spark.createDataFrame([("never-seen-key",)], "tok string")
    est = cms.cms_estimate(sk, probe, "tok", 4096, 3).collect()[0]
    # one key in a 4096-wide sketch: collision on all 3 rows is ~(1/4096)^3
    assert est.est_count == 0


# ------------------------------------------------------------------ hll


def test_hll_estimate_accuracy_at_10k(spark):
    from aoseventstreamer_spark.operators import hll

    df = spark.range(10_000).select(F.concat(F.lit("key-"), "id").alias("k"))
    sk = hll.hll_sketch(df, "k", p=9)  # 512 registers → ~4.6% rel err
    est = hll.hll_estimate(sk, p=9).collect()[0].estimate
    assert abs(est - 10_000) / 10_000 < 0.15


def test_hll_duplicates_do_not_change_sketch(spark):
    from aoseventstreamer_spark.operators import hll

    df = spark.range(1000).select(F.concat(F.lit("k"), "id").alias("k"))
    dup = df.unionAll(df).unionAll(df)
    a = sorted(hll.hll_sketch(df, "k", 6).collect())
    b = sorted(hll.hll_sketch(dup, "k", 6).collect())
    assert a == b


def test_hll_merge_equals_single_build(spark):
    from aoseventstreamer_spark.operators import hll

    df = spark.range(5000).select(F.concat(F.lit("k"), "id").alias("k"))
    a, b = df.where("id < 2000"), df.where("id >= 2000")
    merged = sorted(
        hll.hll_merge(
            hll.hll_sketch(a, "k", 7), hll.hll_sketch(b, "k", 7)
        ).collect()
    )
    whole = sorted(hll.hll_sketch(df, "k", 7).collect())
    assert merged == whole


def test_hll_small_range_uses_linear_counting(spark):
    from aoseventstreamer_spark.operators import hll

    df = spark.range(20).select(F.concat(F.lit("k"), "id").alias("k"))
    sk = hll.hll_sketch(df, "k", p=6)
    est = hll.hll_estimate(sk, p=6).collect()[0].estimate
    # linear counting at n=20, m=64 is typically within a few keys
    assert abs(est - 20) < 6


def test_bloom_semi_reduce_correct_and_selective(spark, sf_dir):
    """bloom_semi_reduce (r7): no false negatives — the reduced join
    equals the plain join exactly — and the probe side actually
    shrinks to near the true match fraction (the shuffle the reduction
    saves at 100 TB)."""
    from aoseventstreamer_spark.operators.bloom import bloom_semi_reduce
    from aoseventstreamer_spark.session import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 97 == 0
    )
    reduced = bloom_semi_reduce(
        li, orders, key_col="l_orderkey", build_key="o_orderkey"
    )
    n_probe = li.count()
    n_match = li.join(
        orders.select("o_orderkey"),
        li["l_orderkey"] == F.col("o_orderkey"),
        "left_semi",
    ).count()
    n_reduced = reduced.count()
    # superset of true matches (no false negatives) ...
    assert n_reduced >= n_match
    # ... and the false-positive overhead is a small fraction of the
    # rows DROPPED (m=2^20 bits vs ~100 distinct keys -> fp ~ 0)
    assert n_reduced - n_match <= max(1, (n_probe - n_match) // 100)
    assert n_reduced < n_probe // 10  # genuinely selective

    plain = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_returnflag").count()
    )
    via_bloom = (
        reduced.join(orders, reduced["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_returnflag").count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, via_bloom.collect())
    )


def test_bloom_semi_reduce_empty_build_drops_everything(spark):
    from aoseventstreamer_spark.operators.bloom import bloom_semi_reduce

    probe = spark.createDataFrame([(i,) for i in range(50)], "k long")
    build = probe.where("k < 0")  # empty
    assert bloom_semi_reduce(probe, build, key_col="k").count() == 0
