"""DSIR importance resampling + NB classifier invariants
(operators/selection.py). Cross-engine value parity is covered by the
DuckDB oracles (tools/parity.py: q_dsir_weights, q_dsir_select,
q_nb_classify, q_ccnet_buckets); these tests pin the semantic
invariants parity can't see — separation on separable data, exact
feature accounting, reproducible Gumbel keys, top-k contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.selection import (
    dsir_log_weights,
    dsir_select,
    gumbel_key_u,
    nb_classify,
    nb_train,
)


def _corpus(spark):
    """Separable two-domain corpus: target docs speak 'alpha beta',
    raw-only docs speak 'gamma delta'."""
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "tgt", "alpha beta alpha gamma beta alpha"))
        else:
            rows.append((i, "web", "gamma delta gamma delta epsilon gamma"))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_dsir_separates_target_like_documents(spark):
    df = _corpus(spark)
    w = dsir_log_weights(df, F.col("source") == "tgt", buckets=64)
    rows = {r.doc_id: r.logw for r in w.collect()}
    tgt = [rows[i] for i in range(0, 40, 2)]
    web = [rows[i] for i in range(1, 40, 2)]
    # every target-style doc outscores every web-style doc
    assert min(tgt) > max(web)
    # E_target[ln(pt/pr)] is a KL divergence: positive on separable data
    assert min(tgt) > 0 > max(web)


def test_dsir_feature_count_is_unigrams_plus_bigrams(spark):
    df = spark.createDataFrame(
        [(1, "x", "a b c d")], "doc_id long, source string, text string"
    )
    w = dsir_log_weights(df, F.lit(True)).collect()[0]
    assert w.n_feats == 4 + 3  # 4 unigrams + 3 bigrams


def test_dsir_select_topk_contract(spark):
    df = _corpus(spark)
    sel = dsir_select(df, 10, F.col("source") == "tgt", buckets=64)
    rows = sel.orderBy("rank").collect()
    assert [r.rank for r in rows] == list(range(1, 11))
    assert len({r.doc_id for r in rows}) == 10
    # resampling targets the target-like half overwhelmingly: the
    # weight gap (KL * n_feats ≈ dozens of nats) dwarfs Gumbel noise
    assert sum(1 for r in rows if r.doc_id % 2 == 0) >= 9
    # deterministic: the same call reproduces the same selection
    again = dsir_select(df, 10, F.col("source") == "tgt", buckets=64)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))


def test_gumbel_keys_are_deterministic_and_spread(spark):
    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    a = df.select("doc_id", gumbel_key_u("doc_id").alias("g")).collect()
    b = df.select("doc_id", gumbel_key_u("doc_id").alias("g")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    gs = [r.g / 1e6 for r in a]
    # Gumbel(0,1): median = -ln(ln 2) ≈ 0.3665, all draws finite
    med = sorted(gs)[len(gs) // 2]
    assert 0.2 < med < 0.55
    assert len(set(gs)) > 900  # distinct per id, not a constant


def test_nb_recovers_separable_classes(spark):
    rows = []
    for i in range(30):
        rows.append((i, "spam", "buy now cheap buy pills now"))
        rows.append((100 + i, "ham", "meeting notes agenda notes review"))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    model = nb_train(df, class_col="lang")
    pred = nb_classify(df, model)
    got = {r.doc_id: r.pred for r in pred.collect()}
    assert all(got[i] == "spam" for i in range(30))
    assert all(got[100 + i] == "ham" for i in range(30))
    # scores are mean per-token log-likelihoods: negative, finite
    assert all(r.score < 0 for r in pred.collect())


def test_nb_unseen_tokens_score_by_smoothing(spark):
    train = spark.createDataFrame(
        [(1, "a", "x x x"), (2, "a", "x y"), (3, "b", "z z")],
        "doc_id long, lang string, text string",
    )
    model = nb_train(train, class_col="lang")
    # All-unseen doc, hand computation (V=3, add-1):
    #   a: ln(2/3) + 2*ln(1/(5+3)) = -4.564
    #   b: ln(1/3) + 2*ln(1/(2+3)) = -4.318  <- wins: the smaller
    # class's token total gives unseen tokens more smoothed mass than
    # the 2:1 prior recovers — standard multinomial-NB behavior.
    test = spark.createDataFrame(
        [(9, "?", "qqq www")], "doc_id long, lang string, text string"
    )
    r = nb_classify(test, model).collect()[0]
    assert r.pred == "b"
    assert abs(r.score - (-4.318 / 2)) < 0.01  # score = mean per token
