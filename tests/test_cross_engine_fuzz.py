"""Cross-engine fuzz: hypothesis-generated corpora, Spark vs DuckDB.

The driver's correctness gate replays every oracle on the FIXED
fixture tables; these tests generalize that to randomized corpora —
ragged whitespace, empty/whitespace-only documents, single-token docs,
duplicate texts — for the operators whose exactness argument is the
subtlest (micro-nat fixed-point log sums + md5-derived hashing):
bigram-LM perplexity, DSIR importance weights, NB classification.

Each example registers the same rows as a Spark DataFrame and as a
DuckDB view named ``documents`` and asserts row-for-row equality of
the operator output against its own oracle-SQL generator. Failures
here mean a cross-engine divergence the fixtures happened not to
exercise (exactly how the Spark-div/DuckDB-floor and unicode-\\s traps
were found by hand in earlier rounds).
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.lm import (
    perplexity_oracle_sql,
    perplexity_scores,
)
from aoseventstreamer_spark.operators.selection import (
    dsir_log_weights,
    dsir_oracle_sql,
    nb_classify,
    nb_oracle_sql,
    nb_train,
)

# ASCII words with ragged 1-3-space joins; whitespace-only and empty
# texts included deliberately (the ['']-token edge both engines share)
_word = st.text(alphabet="abcdefgz019", min_size=1, max_size=5)
_text = st.one_of(
    st.just(""),
    st.just("   "),
    st.lists(_word, min_size=1, max_size=8).map(lambda ws: "  ".join(ws)),
)
_corpus = st.lists(
    st.tuples(st.integers(0, 10**6), _text, st.sampled_from(["en", "de", "zh"])),
    min_size=1,
    max_size=20,
    unique_by=lambda r: r[0],
)

_FUZZ = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _frames(spark, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    sdf = spark.createDataFrame(pdf.assign(source=pdf.lang))
    con = duckdb.connect()
    con.register("documents", pdf.assign(source=pdf.lang))
    return sdf, con


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _oracle(con, sql, cols):
    out = con.sql(sql).df()
    return sorted(tuple(r) for r in out[list(cols)].itertuples(index=False))


@given(rows=_corpus)
@_FUZZ
def test_perplexity_matches_oracle_on_random_corpora(spark, rows):
    sdf, con = _frames(spark, rows)
    got = _rows(perplexity_scores(sdf), ["doc_id", "n_bigrams", "ppl"])
    want = _oracle(con, perplexity_oracle_sql(), ["doc_id", "n_bigrams", "ppl"])
    assert got == want


@given(rows=_corpus)
@_FUZZ
def test_dsir_weights_match_oracle_on_random_corpora(spark, rows):
    sdf, con = _frames(spark, rows)
    got = _rows(
        dsir_log_weights(sdf, F.col("lang") == "en", buckets=64),
        ["doc_id", "n_feats", "logw"],
    )
    want = _oracle(
        con,
        dsir_oracle_sql(target_where="lang = 'en'", buckets=64),
        ["doc_id", "n_feats", "logw"],
    )
    assert got == want


@given(rows=_corpus)
@_FUZZ
def test_nb_classify_matches_oracle_on_random_corpora(spark, rows):
    sdf, con = _frames(spark, rows)
    got = _rows(nb_classify(sdf, nb_train(sdf, "lang")), ["doc_id", "pred", "score"])
    want = _oracle(con, nb_oracle_sql(class_col="lang"), ["doc_id", "pred", "score"])
    assert got == want
