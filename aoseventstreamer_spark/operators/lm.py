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

r9 fresh-eyes review: checked, sound — the sequence(1, 0)-descending
trap (Spark fabricates a reversed pair on 1-token docs) is guarded by
the documented size >= 2 filter at every _bigrams() call site; the
pruned-vocab broadcast bound and the c1-from-c2 derivation (no second
corpus pass) hold as documented.
"""

from __future__ import annotations

from dataclasses import dataclass

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


UNK = "<unk>"


def _vocab(train: DataFrame, text_col: str, vocab_size: int) -> DataFrame:
    """Top-``vocab_size`` training tokens by (count desc, token asc) —
    the deterministic tie-break makes the pruned model reproducible
    across partitionings and engines. One column: ``w``."""
    return (
        train.select(F.explode(_tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(vocab_size)
        .select("w")
    )


def _map_unk(bi: DataFrame, vocab: DataFrame) -> DataFrame:
    """Replace OOV w1/w2 with the <unk> symbol via two broadcast
    left-semi-style joins (the vocab is bounded by vocab_size, so it
    always broadcasts — this is exactly what makes the pruned model
    100 TB-viable)."""
    va = vocab.select(F.col("w").alias("__v1"))
    vb = vocab.select(F.col("w").alias("__v2"))
    return (
        bi.join(F.broadcast(va), bi.w1 == F.col("__v1"), "left")
        .join(F.broadcast(vb), bi.w2 == F.col("__v2"), "left")
        .select(
            *[c for c in bi.columns if c not in ("w1", "w2")],
            F.coalesce(F.col("__v1"), F.lit(UNK)).alias("w1"),
            F.coalesce(F.col("__v2"), F.lit(UNK)).alias("w2"),
        )
    )


@dataclass
class PerplexityModel:
    """A frozen bigram LM: the three count frames plus the optional
    pruned vocabulary used to map OOV tokens at scoring time. Build
    with ``train_bigram_model``; pass to ``perplexity_scores(...,
    model=...)`` to score many frames/batches WITHOUT re-deriving the
    model each time (persist() the members for streaming use)."""

    c2: DataFrame
    c1: DataFrame
    vstats: DataFrame
    vocab: DataFrame | None = None

    def persist(self) -> "PerplexityModel":
        for f in (self.c2, self.c1, self.vstats, self.vocab):
            if f is not None:
                f.persist()
        return self

    def unpersist(self) -> None:
        for f in (self.c2, self.c1, self.vstats, self.vocab):
            if f is not None:
                f.unpersist()


def train_bigram_model(
    train: DataFrame, text_col: str = "text", vocab_size: int | None = None
) -> PerplexityModel:
    """Train once, score many: the PerplexityModel packages c2/c1/V
    (and the pruned vocab, computed a single time) so repeated scoring
    — per micro-batch, per corpus shard — reuses one model instead of
    re-aggregating the training corpus per call."""
    vocab = _vocab(train, text_col, vocab_size) if vocab_size is not None else None
    c2, c1, vstats = _bigram_lm_counts_with_vocab(train, text_col, vocab)
    return PerplexityModel(c2, c1, vstats, vocab)


def bigram_lm_counts(
    train: DataFrame, text_col: str = "text", vocab_size: int | None = None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the bigram LM: returns (c2, c1, vstats).

    c2 = (w1, w2, c2) bigram counts; c1 = (w1, c1) left-context totals
    derived from c2 (no second pass over the corpus); vstats = a
    single-row frame with the training vocabulary size V. All three
    stay DataFrames so scoring composes into ONE plan — no driver
    collect of model tables.

    ``vocab_size`` enables the CCNet-style scale path: tokens outside
    the top-k vocabulary (count desc, token asc) collapse into one
    ``<unk>`` symbol BEFORE counting, so the model tables are bounded
    by vocab_size² regardless of corpus size — small enough to
    broadcast at any scale. V then counts the mapped alphabet
    (min(vocab_size, distinct) + 1 for <unk> when any token is OOV)."""
    vocab = _vocab(train, text_col, vocab_size) if vocab_size is not None else None
    return _bigram_lm_counts_with_vocab(train, text_col, vocab)


def _bigram_lm_counts_with_vocab(
    train: DataFrame, text_col: str, vocab: DataFrame | None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    toks = train.select(_tokens(text_col).alias(_TOKS_ALIAS))
    bi = (
        toks.filter(F.size(F.col(_TOKS_ALIAS)) >= 2)
        .select(F.explode(_bigrams()).alias("b"))
        .select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    unig = toks.select(F.explode(F.col(_TOKS_ALIAS)).alias("w"))
    if vocab is not None:
        bi = _map_unk(bi, vocab)
        unig = unig.join(
            F.broadcast(vocab.select(F.col("w").alias("__v1"))),
            unig.w == F.col("__v1"),
            "left",
        ).select(F.coalesce(F.col("__v1"), F.lit(UNK)).alias("w"))
    c2 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vstats = unig.agg(F.count_distinct("w").cast("long").alias("v"))
    return c2, c1, vstats


def perplexity_scores(
    docs: DataFrame,
    train: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int | None = None,
    model: PerplexityModel | None = None,
) -> DataFrame:
    """Per-document bigram perplexity under a model trained on
    ``train`` (default: score the corpus under itself). Returns
    (id, n_bigrams, ppl) for docs with >= 2 tokens, ppl rounded to
    4dp. Lower ppl = more like the training corpus — filter on it the
    way CCNet keeps its low-perplexity head. With ``vocab_size``,
    scored tokens outside the TRAINING vocabulary map to the same
    ``<unk>`` the model was trained with — the vocabulary is computed
    ONCE and shared between training and scoring. Pass a pre-built
    ``model`` (train_bigram_model) to score repeatedly without
    re-deriving it."""
    if model is None:
        model = train_bigram_model(
            docs if train is None else train, text_col, vocab_size
        )
    c2, c1, vstats = model.c2, model.c1, model.vstats

    doc_bi = (
        docs.select(F.col(id_col), _tokens(text_col).alias(_TOKS_ALIAS))
        .filter(F.size(F.col(_TOKS_ALIAS)) >= 2)
        .select(F.col(id_col), F.explode(_bigrams()).alias("b"))
        .select(F.col(id_col), F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    if model.vocab is not None:
        doc_bi = _map_unk(doc_bi, model.vocab)
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
        # truncating div and floor div agree with DuckDB's //.
        # avg_nll_u (average micro-nats per bigram) is the EXACT
        # integer quantity — the column cross-engine comparisons and
        # threshold filters should use. ppl = exp(avg_nll_u/1e6) is a
        # DERIVED display value: exp() is not correctly rounded (JVM
        # Math.exp vs libm can differ by 1 ulp) and ROUND(x,4) has the
        # decimal-vs-binary tie hazard, so it is deliberately excluded
        # from registered-query projections.
        .select(
            id_col,
            "n_bigrams",
            F.expr("nll_u div n_bigrams").alias("avg_nll_u"),
        )
        .withColumn(
            "ppl", F.round(F.exp(F.col("avg_nll_u") / 1_000_000.0), 4)
        )
    )


def perplexity_oracle_sql(
    table: str = "documents",
    train_where: str = "TRUE",
    score_where: str = "TRUE",
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int | None = None,
) -> str:
    """DuckDB SQL replaying perplexity_scores exactly (same
    tokenization, same optional <unk> vocabulary mapping, same add-1
    smoothing, same micro-nat rounding and non-negative integer
    division). Emits the exact integer ``avg_nll_u`` only — the
    derived float ``ppl`` is intentionally absent (exp() + ROUND(x,4)
    are the two cross-engine hazards this column exists to avoid), so
    callers compare ``SELECT ... EXCEPT ppl`` shapes."""
    toks = f"regexp_split_to_array(trim(lower({text_col})), '\\s+')"
    if vocab_size is None:
        vocab_ctes = ""
        map1 = map2 = lambda col: col  # noqa: E731
        v_expr = (
            f"SELECT CAST(COUNT(DISTINCT t.w) AS BIGINT) AS v"
            f" FROM tr, UNNEST(arr) AS t(w)"
        )
    else:
        vocab_ctes = f"""vocab AS (
      SELECT w FROM (
        SELECT t.w, COUNT(*) AS c
        FROM tr, UNNEST(arr) AS t(w)
        GROUP BY t.w ORDER BY c DESC, t.w ASC LIMIT {vocab_size}
      )
    ), """
        map1 = lambda col: (  # noqa: E731
            f"COALESCE((SELECT v.w FROM vocab v WHERE v.w = {col}), '{UNK}')"
        )
        map2 = map1
        v_expr = (
            f"SELECT CAST(COUNT(DISTINCT COALESCE(v.w, '{UNK}')) AS BIGINT) AS v"
            f" FROM (SELECT t.w AS uw FROM tr, UNNEST(arr) AS t(w)) u"
            f" LEFT JOIN vocab v ON v.w = u.uw"
        )
    return f"""
    WITH tr AS (
      SELECT {toks} AS arr FROM {table} WHERE {train_where}
    ), {vocab_ctes}tr_bi AS (
      SELECT {map1('arr[i]')} AS w1, {map2('arr[i + 1]')} AS w2
      FROM tr, UNNEST(range(1, len(arr))) AS t(i)
      WHERE len(arr) >= 2
    ), c2 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM tr_bi GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1
    ), vstats AS (
      {v_expr}
    ), doc_bi AS (
      SELECT {id_col}, {map1('arr[i]')} AS w1, {map2('arr[i + 1]')} AS w2
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
           (-SUM(lp_u)) // COUNT(*) AS avg_nll_u
    FROM scored GROUP BY {id_col}
    """
