"""Bigram-LM perplexity scoring (operators/lm.py) against
hand-computed values — seen, unseen-bigram and unseen-context
smoothing paths, plus the short-doc exclusion."""

from __future__ import annotations

import math

from aoseventstreamer_spark.operators import lm as LM


def test_perplexity_hand_computed(spark):
    train = spark.createDataFrame(
        [(0, "a b a b"), (1, "b c")], ["doc_id", "text"]
    )
    # c2: (a,b)=2 (b,a)=1 (b,c)=1 ; c1: a=2 b=2 ; V=3
    docs = spark.createDataFrame(
        [(10, "a b c d"), (11, "a"), (12, "")], ["doc_id", "text"]
    )
    rows = {
        r.doc_id: r
        for r in LM.perplexity_scores(docs, train=train).collect()
    }
    # docs 11 (one token) and 12 (empty) have no bigrams -> excluded
    assert set(rows) == {10}
    r = rows[10]
    assert r.n_bigrams == 3
    # P(ab)=(2+1)/(2+3), P(bc)=(1+1)/(2+3), P(cd unseen ctx)=(0+1)/(0+3)
    lp_u = [
        round(math.log(3 / 5) * 1_000_000),
        round(math.log(2 / 5) * 1_000_000),
        round(math.log(1 / 3) * 1_000_000),
    ]
    nll_u = -sum(lp_u)
    expected = round(math.exp((nll_u // 3) / 1_000_000), 4)
    assert r.ppl == expected


def test_self_trained_corpus_ranks_repetition_low(spark):
    """A doc made of the corpus' dominant pattern scores lower ppl
    than one of corpus-unseen tokens (the CCNet filtering premise)."""
    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows += [(100, "zq xv wk jj pq mz")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    ppl = {r.doc_id: r.ppl for r in LM.perplexity_scores(docs).collect()}
    assert ppl[0] < ppl[100]


def test_vocab_pruned_unk_hand_computed(spark):
    """vocab_size=2 over 'a b a b a c': vocab {a, b} (count desc, token
    asc), c collapses to <unk>; mapped alphabet size V=3. Scoring 'c b'
    gives the unseen-context bigram (<unk>, b): P = (0+1)/(0+3)."""
    train = spark.createDataFrame([(0, "a b a b a c")], ["doc_id", "text"])
    docs = spark.createDataFrame([(10, "c b")], ["doc_id", "text"])
    [r] = LM.perplexity_scores(docs, train=train, vocab_size=2).collect()
    assert r.n_bigrams == 1
    lp_u = round(math.log(1 / 3) * 1_000_000)
    assert r.ppl == round(math.exp(-lp_u / 1_000_000), 4)

    # seen path under the same pruned model: 'a b' -> (a,b), c2=2, c1=3
    [s] = LM.perplexity_scores(
        spark.createDataFrame([(11, "a b")], ["doc_id", "text"]),
        train=train, vocab_size=2,
    ).collect()
    lp_s = round(math.log((2 + 1) / (3 + 3)) * 1_000_000)
    assert s.ppl == round(math.exp(-lp_s / 1_000_000), 4)
