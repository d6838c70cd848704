"""N-gram language-model quality scoring (CCNet-style perplexity
filtering).

The CCNet pipeline (Wenzek et al., 2020 — public) ranks web documents
by the perplexity of a language model trained on a trusted corpus and
keeps the low-perplexity head. This module is that shape on Spark:

- ``bigram_lm_counts``: train = two aggregations over the exploded
  bigram stream (c(w1,w2) and the derived left-context totals c(w1)),
  plus the training vocabulary size V. The model tables are tiny
  relative to the corpus (Heaps' law: unique n-grams grow ~O(N^0.5-0.8)
  while the corpus grows O(N)), so at 100 TB they remain join-able; a
  top-k vocabulary prune with an <unk> bucket (CCNet does the same)
  bounds them enough to broadcast.
- ``perplexity_scores``: score = one explode + equi-join of each
  document's bigrams against the model on (w1, w2) — broadcast when
  the model fits, shuffle-on-key otherwise — then a per-doc aggregate.
  No Python anywhere; every expression codegens.

Add-k smoothing (k=1): P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V), so unseen
bigrams and unseen contexts score 1/(c1+V) and 1/V instead of 0.

Cross-engine determinism (the same discipline as operators/lexical.py
BM25): each bigram's ln P rounds to integer micro-nats BEFORE the
per-doc sum, so the sum is exact long arithmetic in any order; the
per-doc average divides as positive integers (Spark ``div`` truncates
toward zero, DuckDB ``//`` floors — they agree only on non-negative
operands, so the negated log-prob sum is divided, not the raw one);
only then does one exp land back in float space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str) -> Column:
    from .text import whitespace_tokens

    return whitespace_tokens(text_col)


def _bigrams() -> Column:
    """array<struct<w1,w2>> of adjacent token pairs over the __toks
    alias (callers select _tokens(...) AS __toks first). Caller must
    also filter size(__toks) >= 2: Spark's sequence(1, 0) is the
    DESCENDING [1, 0], not empty, and would fabricate a reversed
    pair."""
    return F.expr(
        f"transform(sequence(1, size({_TOKS_ALIAS}) - 1), "
        f"i -> struct(element_at({_TOKS_ALIAS}, i) AS w1, "
        f"element_at({_TOKS_ALIAS}, i + 1) AS w2))"
    )


_TOKS_ALIAS = "__toks"


def bigram_lm_counts(
    train: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the bigram LM: returns (c2, c1, vstats).

    c2 = (w1, w2, c2) bigram counts; c1 = (w1, c1) left-context totals
    derived from c2 (no second pass over the corpus); vstats = a
    single-row frame with the training vocabulary size V. All three
    stay DataFrames so scoring composes into ONE plan — no driver
    collect of model tables."""
    toks = train.select(_tokens(text_col).alias(_TOKS_ALIAS))
    bi = (
        toks.filter(F.size(F.col(_TOKS_ALIAS)) >= 2)
        .select(F.explode(_bigrams()).alias("b"))
        .select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    c2 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vstats = toks.select(F.explode(F.col(_TOKS_ALIAS)).alias("w")).agg(
        F.count_distinct("w").cast("long").alias("v")
    )
    return c2, c1, vstats


def perplexity_scores(
    docs: DataFrame,
    train: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document bigram perplexity under a model trained on
    ``train`` (default: score the corpus under itself). Returns
    (id, n_bigrams, ppl) for docs with >= 2 tokens, ppl rounded to
    4dp. Lower ppl = more like the training corpus — filter on it the
    way CCNet keeps its low-perplexity head."""
    if train is None:
        train = docs
    c2, c1, vstats = bigram_lm_counts(train, text_col)

    doc_bi = (
        docs.select(F.col(id_col), _tokens(text_col).alias(_TOKS_ALIAS))
        .filter(F.size(F.col(_TOKS_ALIAS)) >= 2)
        .select(F.col(id_col), F.explode(_bigrams()).alias("b"))
        .select(F.col(id_col), F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    scored = (
        doc_bi.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .join(F.broadcast(vstats))
        .withColumn(
            "p",
            # greatest(v,1): an EMPTY training corpus gives V=0, where
            # a zero denominator is NULL in Spark but inf in DuckDB —
            # pin both to the V=1 degenerate model instead
            (F.coalesce(F.col("c2"), F.lit(0)) + 1)
            / (F.coalesce(F.col("c1"), F.lit(0)) + F.greatest(F.col("v"), F.lit(1))),
        )
        # integer micro-nats: long sums are exact in any order
        .withColumn("lp_u", F.round(F.log("p") * 1_000_000).cast("long"))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            (-F.sum("lp_u")).alias("nll_u"),
        )
        # nll_u >= 0 (ln P <= 0 always: numerator <= denominator), so
        # truncating div and floor div agree with DuckDB's //
        .select(
            id_col,
            "n_bigrams",
            F.round(F.exp(F.expr("nll_u div n_bigrams") / 1_000_000.0), 4).alias(
                "ppl"
            ),
        )
    )


def perplexity_oracle_sql(
    table: str = "documents",
    train_where: str = "TRUE",
    score_where: str = "TRUE",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB SQL replaying perplexity_scores exactly (same
    tokenization, same add-1 smoothing, same micro-nat rounding and
    non-negative integer division)."""
    toks = f"regexp_split_to_array(trim(lower({text_col})), '\\s+')"
    return f"""
    WITH tr AS (
      SELECT {toks} AS arr FROM {table} WHERE {train_where}
    ), tr_bi AS (
      SELECT arr[i] AS w1, arr[i + 1] AS w2
      FROM tr, UNNEST(range(1, len(arr))) AS t(i)
      WHERE len(arr) >= 2
    ), c2 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM tr_bi GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1
    ), vstats AS (
      SELECT CAST(COUNT(DISTINCT t.w) AS BIGINT) AS v
      FROM tr, UNNEST(arr) AS t(w)
    ), doc_bi AS (
      SELECT {id_col}, arr[i] AS w1, arr[i + 1] AS w2
      FROM (SELECT {id_col}, {toks} AS arr FROM {table} WHERE {score_where}),
           UNNEST(range(1, len(arr))) AS t(i)
      WHERE len(arr) >= 2
    ), scored AS (
      SELECT d.{id_col},
             CAST(ROUND(ln(
               (COALESCE(c2.c2, 0) + 1) * 1.0
               / (COALESCE(c1.c1, 0) + GREATEST(vstats.v, 1))
             ) * 1000000) AS BIGINT) AS lp_u
      FROM doc_bi d
      LEFT JOIN c2 ON c2.w1 = d.w1 AND c2.w2 = d.w2
      LEFT JOIN c1 ON c1.w1 = d.w1
      CROSS JOIN vstats
    )
    SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(exp(((-SUM(lp_u)) // COUNT(*)) / 1000000.0), 4) AS ppl
    FROM scored GROUP BY {id_col}
    """
