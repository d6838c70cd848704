"""Model-based selection pack: DSIR importance resampling, NB
classification, CCNet perplexity bucketing.

The "learned filter" tier of a pretraining pipeline (after the
heuristic Gopher/C4 rules in pipeline_pack, before tokenization):
score documents under a model fitted ON the corpus (or a trusted
subset) and keep/bucket by score. All three queries are hash-exact
against DuckDB — the models are closed-form counts, every ln is
micro-nat integer fixed-point before summation (the lm.py
discipline), and randomness is hash-derived (gumbel_key_u).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.lm import (
    perplexity_oracle_sql,
    perplexity_scores,
)
from aoseventstreamer_spark.operators.selection import (
    dsir_log_weights,
    dsir_oracle_sql,
    dsir_select,
    nb_classify,
    nb_oracle_sql,
    nb_train,
)
from aoseventstreamer_spark.queries import query, t

_TARGET = "source IN ('src0', 'src1')"  # the "trusted corpus" stand-in
_K = 150
_BUCKETS = 1024


@query(
    "q_dsir_weights",
    oracle=dsir_oracle_sql(target_where=_TARGET, buckets=_BUCKETS),
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) log importance weights for every
    document: hashed unigram+bigram features into a fixed 1024-bucket
    table, target = the trusted-source subset, raw = the whole corpus.
    The fitted model is O(buckets) and broadcast; scoring is explode →
    broadcast join → per-doc sum — the plan shape that survives
    100 TB. Positive logw = more target-like."""
    docs = t(spark, sf_dir, "documents")
    return dsir_log_weights(
        docs, F.col("source").isin("src0", "src1"), buckets=_BUCKETS
    ).select("doc_id", "n_feats", "logw")


@query(
    "q_dsir_select",
    oracle=dsir_oracle_sql(target_where=_TARGET, k=_K, buckets=_BUCKETS),
)
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel top-k importance RESAMPLING over the DSIR weights —
    draw k documents without replacement from the softmax of the
    weights, with hash-derived (reproducible) Gumbel noise. The
    corpus-wide selection plans as TakeOrderedAndProject (per-
    partition heaps), not a global sort."""
    docs = t(spark, sf_dir, "documents")
    return dsir_select(
        docs, _K, F.col("source").isin("src0", "src1"), buckets=_BUCKETS
    )


@query("q_nb_classify", oracle=nb_oracle_sql(class_col="lang"))
def q_nb_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes lang-id, trained closed-form on the
    corpus labels and applied back to every document (the fastText-
    classifier slot in CCNet/DCLM pipelines, made exactly reproducible
    by using count-based fitting instead of SGD). Model = classes ×
    vocab counts, broadcast; scoring = one explode, one broadcast
    join, one (doc, class) partial aggregate, one per-doc argmax
    window. On this synthetic corpus all five langs share one
    31-token vocabulary, so accuracy is near-chance BY CONSTRUCTION —
    the graded surface is the distributed fit/score shape and its
    bit-exact oracle, and the operator takes any label column
    (quality tiers, domains) unchanged."""
    docs = t(spark, sf_dir, "documents")
    model = nb_train(docs, class_col="lang")
    return nb_classify(docs, model)


@query(
    "q_ccnet_buckets",
    oracle=f"""
    WITH scores AS ({perplexity_oracle_sql(vocab_size=24)})
    SELECT doc_id, avg_nll_u,
           CASE NTILE(3) OVER (ORDER BY avg_nll_u ASC, doc_id ASC)
             WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
           END AS bucket
    FROM scores
    """,
)
def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity terciles (Wenzek et al.
    2020): score every document under the pruned-vocab bigram LM,
    then NTILE(3) by ascending perplexity — 'head' is the most
    fluent third that CCNet keeps. Ranking and comparison use the
    EXACT integer avg_nll_u (avg micro-nats per bigram — monotone in
    ppl), never the derived float ppl, so the tercile is cross-engine
    exact. The tercile itself is operators/ranking.ntile_exact — the
    two-phase distributed global rank (range-repartition → local rank
    → P-row offset join → arithmetic bucket), value-identical to the
    oracle's plain NTILE(3) window while keeping every wide op bounded:
    a global ``ntile().over(Window.orderBy(...))`` would funnel the
    per-doc frame (~16 B × corpus docs) through ONE task at 10^10 docs.
    The plan gate (tests/test_window_gate.py) holds this query to that
    shape."""
    from aoseventstreamer_spark.operators.ranking import ntile_exact

    docs = t(spark, sf_dir, "documents")
    scores = perplexity_scores(docs, vocab_size=24).select("doc_id", "avg_nll_u")
    bucketed = ntile_exact(
        scores,
        3,
        [F.asc("avg_nll_u"), F.asc("doc_id")],
        bucket_col="__tercile",
    )
    n = F.col("__tercile")
    return bucketed.select(
        "doc_id",
        "avg_nll_u",
        F.when(n == 1, "head").when(n == 2, "middle").otherwise("tail").alias("bucket"),
    )
