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
    got = _rows(perplexity_scores(sdf), ["doc_id", "n_bigrams", "avg_nll_u"])
    want = _oracle(con, perplexity_oracle_sql(), ["doc_id", "n_bigrams", "avg_nll_u"])
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


from aoseventstreamer_spark.operators.dedup import (  # noqa: E402
    minhash_dedup_pairs,
    minhash_band_oracle_sql,
    simhash_docs,
    simhash_oracle_sql,
)
from aoseventstreamer_spark.operators.sampling import (  # noqa: E402
    DRAW_SQL,
    uniform_draw,
)


@given(rows=_corpus)
@_FUZZ
def test_portable_simhash_matches_oracle_on_random_corpora(spark, rows):
    sdf, con = _frames(spark, rows)
    got = _rows(simhash_docs(sdf, portable=True), ["doc_id", "simhash"])
    want = _oracle(con, simhash_oracle_sql(), ["doc_id", "simhash"])
    assert got == want


@given(rows=_corpus)
@_FUZZ
def test_portable_minhash_bands_match_oracle_on_random_corpora(spark, rows):
    sdf, con = _frames(spark, rows)
    got = _rows(minhash_dedup_pairs(sdf, portable=True), ["doc_a", "doc_b"])
    want = _oracle(con, minhash_band_oracle_sql(), ["doc_a", "doc_b"])
    assert got == want


@given(
    ids=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=50,
        unique=True,
    )
)
@_FUZZ
def test_uniform_draw_matches_oracle_over_full_int64(spark, ids):
    """The exact trap ADVICE r3 flagged: draws must agree (and stay in
    [0, 2^32)) for EVERY int64 id, negatives and near-overflow
    included."""
    sdf = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = sorted(
        tuple(r)
        for r in sdf.select("doc_id", uniform_draw("doc_id").alias("d")).collect()
    )
    con = duckdb.connect()
    con.register("ids", pd.DataFrame({"doc_id": pd.array(ids, dtype="Int64")}))
    want = sorted(
        tuple(r)
        for r in con.sql(
            f"SELECT doc_id, {DRAW_SQL.format(c='doc_id')} AS d FROM ids"
        ).df()[["doc_id", "d"]].itertuples(index=False)
    )
    assert got == want
    assert all(0 <= d < 2**32 for _, d in got)


from aoseventstreamer_spark.operators.sampling import (  # noqa: E402
    domain_mix,
    temperature_mix,
)

_mix_corpus = st.lists(
    st.tuples(
        st.integers(0, 10**6),
        st.sampled_from(["s0", "s1", "s2", "s3"]),
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda r: r[0],
)
_weights = st.dictionaries(
    st.sampled_from(["s0", "s1", "s2", "s3"]), st.integers(1, 9), min_size=1
)


@given(rows=_mix_corpus, weights=_weights)
@_FUZZ
def test_domain_mix_matches_oracle_on_random_corpora(spark, rows, weights):
    from hypothesis import assume

    present = {s for _, s in rows}
    assume(set(weights) <= present)  # infeasible mixes raise by design
    sdf = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(tuple(r) for r in domain_mix(sdf, weights).collect())

    W = sum(weights.values())
    values = ", ".join(f"('{s}', {w})" for s, w in sorted(weights.items()))
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "source"]))
    want = sorted(
        tuple(r)
        for r in con.sql(f"""
        WITH wts(source, w) AS (VALUES {values}),
        counts AS (SELECT source, COUNT(*) AS n FROM docs GROUP BY source),
        avail AS (SELECT w.source, c.n, w.w FROM wts w JOIN counts c USING (source)),
        budget AS (SELECT MIN(n * {W} // w) AS b FROM avail),
        quota AS (SELECT source, (b * w) // {W} AS k FROM avail, budget),
        ranked AS (SELECT source, doc_id,
                          CAST(ROW_NUMBER() OVER (
                            PARTITION BY source
                            ORDER BY {DRAW_SQL.format(c='doc_id')}, doc_id) AS BIGINT) AS rn
                   FROM docs)
        SELECT r.source, r.doc_id, r.rn
        FROM ranked r JOIN quota q USING (source)
        WHERE r.rn <= q.k
        """).df()[["source", "doc_id", "rn"]].itertuples(index=False)
    )
    assert got == want
    # quota law: retained per-source counts follow B*w div W exactly
    by_src = {}
    for s, _, _ in got:
        by_src[s] = by_src.get(s, 0) + 1
    n_by = {}
    for _, s in rows:
        n_by[s] = n_by.get(s, 0) + 1
    B = min(n_by[s] * W // w for s, w in weights.items())
    for s, w in weights.items():
        assert by_src.get(s, 0) == B * w // W


@given(rows=_mix_corpus, alpha=st.sampled_from([0.0, 0.25, 0.5, 0.75, 1.0]))
@_FUZZ
def test_temperature_mix_quota_law_and_determinism(spark, rows, alpha):
    sdf = spark.createDataFrame(rows, "doc_id long, source string")
    total = 10
    got = sorted(tuple(r) for r in temperature_mix(sdf, total, alpha).collect())
    again = sorted(tuple(r) for r in temperature_mix(sdf, total, alpha).collect())
    assert got == again
    # quota law: k_s = least(total * p_u div sum_p_u, n_s), p_u = round(n^a*1e6)
    n_by = {}
    for _, s in rows:
        n_by[s] = n_by.get(s, 0) + 1
    p_u = {s: round((n ** alpha) * 1_000_000) for s, n in n_by.items()}
    sp = sum(p_u.values())
    by_src = {}
    for s, _, _ in got:
        by_src[s] = by_src.get(s, 0) + 1
    for s, n in n_by.items():
        assert by_src.get(s, 0) == min(total * p_u[s] // sp, n)
