"""BPE training/encoding (operators/bpe.py) against the worked
example of the BPE paper (Sennrich et al. 2016): vocabulary
{low:5, lower:2, newest:6, widest:3} learns es, est, lo, low — and
'lowest' then encodes as [low, est]."""

from __future__ import annotations

from aoseventstreamer_spark.operators import bpe as B


def _corpus(spark):
    rows = (
        [(i, "low") for i in range(5)]
        + [(10 + i, "lower") for i in range(2)]
        + [(20 + i, "newest") for i in range(6)]
        + [(30 + i, "widest") for i in range(3)]
    )
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_train_learns_paper_merges(spark):
    merges = B.train_bpe(_corpus(spark), num_merges=4)
    # (e,s)=9 ties (s,t)=9 -> lexicographic; then (es,t)=9;
    # (l,o)=7 ties (o,w)=7 -> lexicographic; then (lo,w)=7
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]


def test_encode_compositional_generalization(spark):
    corpus = _corpus(spark)
    merges = B.train_bpe(corpus, num_merges=4)
    unseen = spark.createDataFrame([(0, "lowest")], ["doc_id", "text"])
    [r] = B.bpe_token_count(unseen, merges).collect()
    # 'lowest' was never in the corpus but encodes as [low, est]
    assert r.n_tokens == 2
    # corpus words after 4 merges: low=1, lower=3 (low,e,r),
    # newest=4 (n,e,w,est), widest=4 (w,i,d,est)
    got = {x.doc_id: x.n_tokens for x in B.bpe_token_count(corpus, merges).collect()}
    assert got[0] == 1 and got[10] == 3 and got[20] == 4 and got[30] == 4


def test_exhausted_pairs_stop_early(spark):
    docs = spark.createDataFrame([(0, "ab")], ["doc_id", "text"])
    merges = B.train_bpe(docs, num_merges=100)
    assert merges == [("a", "b")]
    [r] = B.bpe_token_count(docs, merges).collect()
    assert r.n_tokens == 1


def test_python_pretokenizer_matches_spark(spark):
    """The encode path pre-tokenizes in Python (workers); training
    counts pieces with the Spark regexp. The two patterns must split
    identically or token counts drift from the learned statistics."""
    from aoseventstreamer_spark.operators.text import pretokenize

    texts = [
        "Hello, world!  It's 2026: naïve café #42 __init__ a-b",
        "  leading and trailing  ",
        "",
        "数字123 and UNITS-99%",
        # category-No/Nl numerics: Java \pN matches them, \pL does not
        "km² and ½ cup and Ⅻ12 mixed",
        # NBSP: punctuation to Java's ASCII \s, whitespace to Python's
        "a\xa0b c",
        "it's 'l odd' trailing'",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    spark_pieces = {
        r.i: r.p for r in df.select("i", pretokenize("text").alias("p")).collect()
    }
    for i, t in enumerate(texts):
        py = B.py_pretokenize(t)
        assert py == spark_pieces[i], (t, py, spark_pieces[i])
