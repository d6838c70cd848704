"""Lexical retrieval + sequence packing: blocked prefix-sum
equivalence, BM25 determinism and ranking sanity, vocab ordering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import lexical as LX
from aoseventstreamer_spark.operators import packing as PK


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "training data for the model needs deduplication"),
        (3, "model training training training data"),
        (4, "completely unrelated text about weather and rain"),
        (5, ""),
        (6, "data"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_pack_sequences_block_size_invariant(spark, docs):
    """The blocked two-phase prefix sum must equal the naive global
    running sum for ANY block size — including block 1 (every doc its
    own block) and a block larger than the corpus (single block,
    phase 2 degenerate)."""
    toks = docs.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("tok")
    )
    outs = [
        sorted(
            map(tuple, PK.pack_sequences(toks, budget=7, block_size=bs).collect())
        )
        for bs in (1, 2, 500, 10**9)
    ]
    assert outs[0] == outs[1] == outs[2] == outs[3]
    by_id = {r[0]: r for r in outs[0]}
    # offsets are the exclusive running sum in id order
    running = 0
    for did in sorted(by_id):
        _, tok, offset, first, last = by_id[did]
        assert offset == running
        running += tok
        assert first == offset // 7
        assert last == (offset + max(tok, 1) - 1) // 7


def test_pack_sequences_rejects_bad_budget(spark, docs):
    toks = docs.select("doc_id", F.lit(1).cast("long").alias("tok"))
    with pytest.raises(ValueError, match="budget"):
        PK.pack_sequences(toks, budget=0)


def test_bm25_ranks_term_heavy_doc_first(docs):
    scores = {r.doc_id: r.score for r in LX.bm25_scores(docs, ["training", "data"]).collect()}
    assert set(scores) == {2, 3, 6}  # docs containing a query term
    assert scores[3] > scores[2]  # 3 repeats 'training' 3x
    assert all(s > 0 for s in scores.values())


def test_bm25_deterministic_across_runs(docs):
    a = sorted(map(tuple, LX.bm25_scores(docs, ["training", "data"]).collect()))
    b = sorted(map(tuple, LX.bm25_scores(docs, ["data", "training"]).collect()))
    assert a == b  # term order in the query bag is irrelevant


def test_bm25_rejects_empty_query(docs):
    with pytest.raises(ValueError, match="non-empty"):
        LX.bm25_scores(docs, [])


def test_vocab_topk_deterministic_ties(docs):
    rows = LX.vocab_topk(docs, k=5).collect()
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
    # descending occurrences; ties broken by token ascending
    for a, b in zip(rows, rows[1:]):
        assert (a.n_occurrences, b.token) >= (b.n_occurrences, a.token) or (
            a.n_occurrences > b.n_occurrences
        )
    top = rows[0]
    assert top.token in ("the", "training")  # 'the' x3 + 'training' x4


def test_pretokenize_pieces_reconstruct_text(spark):
    """Pre-token pieces must concatenate back to the original text
    (nothing dropped, nothing duplicated) — the property that makes the
    count a structural lower bound on BPE tokens."""
    from aoseventstreamer_spark.operators.text import pretokenize

    texts = [
        "Hello world, it's a test!",
        "def f(x): return x*2  # comment",
        "  leading and trailing  ",
        "unicode: café naïve 北京 42",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    rows = df.select("id", "text", pretokenize("text").alias("p")).collect()
    for r in rows:
        assert "".join(r.p) == r.text


def test_lexical_index_persisted_equals_per_call(spark, tmp_path):
    from aoseventstreamer_spark.operators import lexical as LX
    from aoseventstreamer_spark.tablelog import TableLog

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i % 7} " * (1 + i % 3)) for i in range(40)],
        "doc_id long, text string",
    )
    corpus = TableLog(spark, str(tmp_path / "corpus"))
    corpus.append(docs)
    v = corpus.latest_version()
    idx = str(tmp_path / "lexidx")
    LX.build_lexical_index(
        spark, corpus.read(version=v), idx,
        corpus_ident="c", corpus_version=v,
    )
    terms = ["alpha", "doc1", "doc2"]
    got = sorted(
        tuple(r)
        for r in LX.bm25_from_index(
            spark, idx, terms, corpus_ident="c", corpus_version=v
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in LX.bm25_scores(corpus.read(version=v), terms).collect()
    )
    assert got == want and len(got) > 0


def test_lexical_index_stale_pin_refuses(spark, tmp_path):
    import pytest as _pytest

    from aoseventstreamer_spark.operators import lexical as LX
    from aoseventstreamer_spark.tablelog import TableLog

    docs = spark.createDataFrame(
        [(i, "alpha beta") for i in range(10)], "doc_id long, text string"
    )
    corpus = TableLog(spark, str(tmp_path / "corpus"))
    corpus.append(docs)
    v = corpus.latest_version()
    idx = str(tmp_path / "lexidx")
    LX.build_lexical_index(
        spark, corpus.read(version=v), idx,
        corpus_ident="c", corpus_version=v,
    )
    corpus.append(
        spark.createDataFrame(
            [(100, "alpha alpha")], "doc_id long, text string"
        )
    )
    with _pytest.raises(LX.StaleLexicalIndexError, match="pinned to corpus"):
        LX.bm25_from_index(
            spark, idx, ["alpha"], corpus_ident="c",
            corpus_version=corpus.latest_version(),
        )


def test_lexical_index_prunes_postings_partitions(spark, tmp_path):
    """The token-bucket hive layout must let a term query scan a
    strict subset of the postings files (manifest-stats pruning via
    the where= IN-filter), not the whole index."""
    from pyspark.sql import functions as F

    from aoseventstreamer_spark.operators import lexical as LX
    from aoseventstreamer_spark.tablelog import TableLog

    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{j}" for j in range(i, i + 30))) for i in range(200)],
        "doc_id long, text string",
    )
    corpus = TableLog(spark, str(tmp_path / "corpus"))
    corpus.append(docs)
    v = corpus.latest_version()
    idx = str(tmp_path / "lexidx")
    LX.build_lexical_index(
        spark, corpus.read(version=v), idx,
        corpus_ident="c", corpus_version=v,
    )
    pt = TableLog(spark, f"{idx}/postings")
    all_files = len(pt.read().inputFiles())
    terms = ["tok3", "tok7"]
    buckets = sorted(
        {
            int(r["b"])
            for r in spark.createDataFrame([(t,) for t in terms], "token string")
            .select(
                F.pmod(F.xxhash64("token"), F.lit(LX._N_TOKEN_BUCKETS))
                .cast("int").alias("b")
            ).collect()
        }
    )
    pruned = len(
        pt.read(where=[("tok_bucket", "in", buckets)]).inputFiles()
    )
    assert 0 < pruned < all_files
    # and the pruned read still answers identically
    got = sorted(
        tuple(r)
        for r in LX.bm25_from_index(
            spark, idx, terms, corpus_ident="c", corpus_version=v
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in LX.bm25_scores(corpus.read(version=v), terms).collect()
    )
    assert got == want and got


def test_rrf_fuse_semantics(spark):
    """RRF: a doc in both legs sums both reciprocals; single-leg docs
    contribute once; ordering is (rrf_u desc, id asc); leg_top
    truncation applies before ranking contributions."""
    from pyspark.sql import functions as F

    from aoseventstreamer_spark.operators.fusion import RRF_UNIT, rrf_fuse

    a = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0)], "doc_id long, s double"
    )
    b = spark.createDataFrame(
        [(2, 100), (4, 90)], "doc_id long, d long"
    )
    got = {
        r["doc_id"]: (r["rrf_u"], r["n_legs"])
        for r in rrf_fuse(
            [
                (a, [F.desc("s"), F.asc("doc_id")]),
                (b, [F.desc("d"), F.asc("doc_id")]),
            ],
            leg_top=2,  # doc 3 (rank 3 in leg a) must be truncated out
        ).collect()
    }
    r1 = RRF_UNIT // 61
    r2 = RRF_UNIT // 62
    assert got == {
        2: (r2 + r1, 2),  # rank 2 in leg a + rank 1 in leg b
        1: (r1, 1),
        4: (r2, 1),
    }
