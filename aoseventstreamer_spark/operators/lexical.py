"""Lexical retrieval operators: BM25 scoring and vocabulary building —
the non-embedding half of a training-data search/curation stack
(dataset search, boilerplate discovery, tokenizer prep).

Both are pure DataFrame pipelines (explode → hash aggregate →
broadcast-joined statistics): one shuffle each on near-uniform token
keys, map-side partial aggregation, no Python. BM25's per-term
contributions are summed in integer micro-units (1e-6) so the per-doc
sum is order-independent — float addition order would otherwise make
two runs (or two engines) disagree in the last bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def _tokens(text_col: str) -> F.Column:
    from .text import whitespace_tokens

    return whitespace_tokens(text_col)


def vocab_counts(
    docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus vocabulary: (token, n_docs, n_occurrences), the tokenizer-
    prep / boilerplate-discovery table. One explode + one hash agg."""
    toks = docs.select(F.explode(_tokens(text_col)).alias("token"), F.col("doc_id"))
    out = toks.groupBy("token").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )
    if min_count > 1:
        out = out.filter(F.col("n_occurrences") >= min_count)
    return out


def vocab_topk(docs: DataFrame, k: int = 100, text_col: str = "text") -> DataFrame:
    """Top-k tokens by occurrence count, ties broken by token asc —
    fully deterministic. The truncation is a structural
    orderBy+limit (TakeOrderedAndProject: per-partition heaps over
    the token frame, which can be 10^9 rows at corpus scale) and only
    the ≤k survivors see the rank window — the kmv.py:58 /
    fusion.py discipline, enforced registry-wide by
    tests/test_window_gate.py. (The old rank-then-filter form was
    bounded only because the optimizer happened to rewrite it.)"""
    order = [F.col("n_occurrences").desc(), F.col("token")]
    top = vocab_counts(docs, text_col).orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "token", "n_docs", "n_occurrences")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """BM25 (Robertson; the Lucene idf variant) of every document
    against a fixed bag of query terms. Returns (id, score) for docs
    with score > 0, score rounded to 4dp.

        idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
        tf-part = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Shape: tokenize once; per-(doc, term) tf for ONLY the query terms
    (filter before the aggregate, so the shuffle carries |Q| keys per
    doc at most); df/N/avgdl are tiny aggregates broadcast back in.
    Per-term contributions round to integer micro-units before the
    per-doc sum so the result is bitwise order-independent."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    toks = docs.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("token")
    )
    # document lengths (all docs, incl. non-matching: they shape avgdl)
    dl = docs.select(
        F.col(id_col), F.size(_tokens(text_col)).cast("long").alias("dl")
    )
    tf = (
        toks.filter(F.col("token").isin(terms))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    return _bm25_score(tf, dl, k1, b, id_col)


def _bm25_score(
    tf: DataFrame, dl: DataFrame, k1: float, b: float, id_col: str
) -> DataFrame:
    """BM25 given per-(doc, matching-term) counts + ALL doc lengths —
    SHARED by the per-call path above and the persisted inverted
    index (``bm25_from_index``), so the two are hash-identical by
    construction. ``df`` per term is computed from the already
    term-filtered ``tf`` (distinct docs carrying the term — the same
    value whether tf came from a fresh tokenize or stored postings)."""
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    df_t = tf.groupBy("token").agg(F.count_distinct(id_col).cast("long").alias("df"))
    contrib = (
        tf.join(F.broadcast(df_t), "token")
        .join(F.broadcast(stats))
        .join(dl, id_col)
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "part",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        # integer micro-units: long sums are exact in any order
        .withColumn("part_u", F.round(F.col("part") * 1_000_000).cast("long"))
    )
    return (
        contrib.groupBy(id_col)
        .agg(F.sum("part_u").alias("score_u"))
        # 4dp via integer truncation of the micro-units: a second
        # float ROUND here diverges across engines exactly at the
        # .xxx95 boundaries (Spark rounds the decimal rendering
        # HALF_UP, DuckDB rounds the binary double, which sits a hair
        # below) — integer div is identical everywhere
        .select(
            id_col,
            (F.expr("score_u div 100") / 10_000.0).alias("score"),
        )
        .filter(F.col("score") > 0)
    )


def bm25_oracle_sql(
    query_terms: list[str],
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
) -> str:
    """DuckDB SQL replaying bm25_scores exactly (same tokenization,
    same micro-unit rounding)."""
    terms_sql = ", ".join("'" + t.lower().replace("'", "''") + "'" for t in query_terms)
    toks = f"regexp_split_to_array(trim(lower({text_col})), '\\s+')"
    return f"""
    WITH dl AS (
      SELECT {id_col}, CAST(len({toks}) AS BIGINT) AS dl FROM {table}
    ), stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) * 1.0 / COUNT(*) AS avgdl FROM dl
    ), tok AS (
      SELECT {id_col}, t.token FROM (
        SELECT {id_col}, {toks} AS arr FROM {table}
      ), UNNEST(arr) AS t(token)
      WHERE t.token IN ({terms_sql})
    ), tf AS (
      SELECT {id_col}, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY {id_col}, token
    ), dft AS (
      SELECT token, CAST(COUNT(DISTINCT {id_col}) AS BIGINT) AS df
      FROM tf GROUP BY token
    ), contrib AS (
      SELECT tf.{id_col},
             CAST(ROUND(
               ln(1.0 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
               * (tf.tf * ({k1} + 1))
               / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / stats.avgdl))
               * 1000000) AS BIGINT) AS part_u
      FROM tf
      JOIN dft USING (token)
      CROSS JOIN stats
      JOIN dl ON dl.{id_col} = tf.{id_col}
    )
    SELECT {id_col}, (SUM(part_u) // 100) / 10000.0 AS score
    FROM contrib GROUP BY {id_col}
    HAVING (SUM(part_u) // 100) / 10000.0 > 0
    """


# --------------------------------------------------------------------
# Persisted inverted index (the lexical sibling of operators/
# ann_index.py): postings + doc lengths as version-pinned tablelog
# tables, so BM25 serves many queries without re-tokenizing the
# corpus. Same pin discipline: an idempotent-writer txn carries the
# corpus version; both tables must agree or the query refuses.
# --------------------------------------------------------------------


_N_TOKEN_BUCKETS = 64


def _lex_app_id(corpus_ident: str, text_col: str, id_col: str) -> str:
    return f"lexical_index|corpus={corpus_ident}|text={text_col}|id={id_col}"


def build_lexical_index(
    spark,
    corpus: DataFrame,
    index_path: str,
    *,
    corpus_ident: str,
    corpus_version: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize the full postings table (doc, token, tf) and the
    doc-length table under ``index_path``, pinned to
    ``corpus_version``. Postings are the classic inverted-index
    working set: one row per distinct (doc, token), partitionable by
    token — a query term's rows are one partition-pruned slice, never
    a corpus re-tokenize."""
    from aoseventstreamer_spark.tablelog import TableLog

    app = _lex_app_id(corpus_ident, text_col, id_col)
    postings = (
        corpus.select(
            F.col(id_col), F.explode(_tokens(text_col)).alias("token")
        )
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        # hive-partition by a token-hash bucket: a query's terms map
        # to a handful of buckets, and bm25_from_index's where=
        # IN-filter prunes whole partitions via manifest stats — at
        # corpus scale a term lookup reads |terms| buckets of
        # postings, never the full index
        .withColumn(
            "tok_bucket",
            F.pmod(F.xxhash64("token"), F.lit(_N_TOKEN_BUCKETS)).cast("int"),
        )
    )
    pt = TableLog(spark, f"{index_path}/postings")
    pt.overwrite(
        postings, partition_by=["tok_bucket"], operation="LEX_INDEX_BUILD"
    )
    pt.commit(
        added=[], removed=[], data_change=False,
        txn=(app, corpus_version), operation="LEX_INDEX_PIN",
    )
    dl = corpus.select(
        F.col(id_col), F.size(_tokens(text_col)).cast("long").alias("dl")
    )
    dt = TableLog(spark, f"{index_path}/doclen")
    dt.overwrite(dl, operation="LEX_INDEX_BUILD")
    dt.commit(
        added=[], removed=[], data_change=False,
        txn=(app, corpus_version), operation="LEX_INDEX_PIN",
    )


class StaleLexicalIndexError(Exception):
    """The persisted lexical index was built from an older corpus
    snapshot than the one being queried."""


def bm25_from_index(
    spark,
    index_path: str,
    query_terms: list[str],
    *,
    corpus_ident: str,
    corpus_version: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """``bm25_scores`` answered from the prebuilt postings + doc
    lengths (hash-identical via the shared ``_bm25_score``); refuses
    a pin that does not match ``corpus_version`` on EITHER table."""
    from aoseventstreamer_spark.tablelog import TableLog

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    app = _lex_app_id(corpus_ident, text_col, id_col)
    pt = TableLog(spark, f"{index_path}/postings")
    dt = TableLog(spark, f"{index_path}/doclen")
    for name, tl in (("postings", pt), ("doclen", dt)):
        pinned = tl.last_txn_version(app) if tl.latest_version() > 0 else -1
        if pinned != corpus_version:
            raise StaleLexicalIndexError(
                f"lexical index {name} at {index_path} pinned to corpus "
                f"version {pinned}, query is against {corpus_version}"
            )
    terms = [t.lower() for t in query_terms]
    # the terms' buckets (one tiny local job), pushed as a where=
    # conjunct so the manifest prunes postings FILES before any scan
    buckets = sorted(
        {
            int(r["b"])
            for r in spark.createDataFrame(
                [(t,) for t in terms], "token string"
            )
            .select(
                F.pmod(F.xxhash64("token"), F.lit(_N_TOKEN_BUCKETS))
                .cast("int")
                .alias("b")
            )
            .distinct()
            .collect()
        }
    )
    tf = (
        pt.read(where=[("tok_bucket", "in", buckets)])
        .filter(F.col("token").isin(terms))
        .drop("tok_bucket")
    )
    return _bm25_score(tf, dt.read(), k1, b, id_col)
