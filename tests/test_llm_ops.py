"""Unit tests for the hash-sketch operators that the DuckDB oracle
can't express (MinHash/LSH, SimHash, hyperplane ANN): verified against
small pure-Python oracles and structural invariants on real testdata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import dedup as D
from aoseventstreamer_spark.operators import similarity as SIM
from aoseventstreamer_spark.session import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_exact_dedup_finds_identical_docs(spark):
    rows = [(1, "hello world"), (2, "Hello   World"), (3, "different text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.keeper: r.n_docs for r in D.exact_dedup(df).collect()}
    # normalization (lower + whitespace collapse) merges 1 and 2
    assert out == {1: 2, 3: 1}


def test_word_shingles_golden(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    got = df.select(D.word_shingles("text", 3).alias("s")).first()["s"]
    assert sorted(got) == ["a b c", "b c d"]


def test_minhash_identical_docs_same_signature(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"),
         (3, "totally unrelated words here now")],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: tuple(r.sig) for r in D.minhash_docs(df).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]
    assert len(sigs[1]) == 16


def test_lsh_pairs_catch_duplicates_not_strangers(spark):
    base = "many shared words in this long common document body " * 3
    rows = [(1, base), (2, base), (3, "zebra xylophone quartz jackdaw vow")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.doc_a, r.doc_b) for r in D.minhash_dedup_pairs(df).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_matches_python_oracle(spark):
    text = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    sig = D.minhash_docs(df, num_hashes=4, shingle_k=3).first()["sig"]
    # python oracle: same shingles, same xxhash64 via Spark itself on
    # exploded shingles (validates the fold, not the hash function)
    toks = text.split()
    shingles = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    sh_df = spark.createDataFrame([(s,) for s in shingles], "s string")
    expected = [
        sh_df.select(F.min(F.xxhash64(F.lit(j), F.xxhash64(F.col("s"))))).first()[0]
        for j in range(4)
    ]
    assert list(sig) == expected


def test_simhash_properties(spark):
    rows = [(1, "the quick brown fox"), (2, "the quick brown fox"),
            (3, "a completely different sentence")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.simhash for r in D.simhash_docs(df).collect()}
    assert out[1] == out[2]
    assert len(out[1]) == 16 and all(c in "0123456789abcdef" for c in out[1])
    assert out[1] != out[3]


def test_simhash_matches_python_oracle(spark):
    """Cross-check the bit assembly against a pure-Python vote count
    (token hashes sourced from Spark's own xxhash64)."""
    text = "alpha beta beta gamma"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = D.simhash_docs(df).first()["simhash"]

    toks = text.lower().split()
    hdf = spark.createDataFrame([(t,) for t in toks], "tok string")
    hashes = [r.h for r in hdf.select(F.xxhash64("tok").alias("h")).collect()]
    votes = [0] * 64
    for h in hashes:
        for i in range(64):
            votes[i] += 1 if (h >> i) & 1 else -1
    bits = [1 if v > 0 else 0 for v in votes]
    expected = "".join(
        format(bits[n * 4] * 8 + bits[n * 4 + 1] * 4 + bits[n * 4 + 2] * 2 + bits[n * 4 + 3], "x")
        for n in range(16)
    )
    assert got == expected


def test_ngram_jaccard_golden(spark):
    rows = [(1, "abcd"), (2, "abcd"), (3, "wxyz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.jaccard for r in D.ngram_jaccard_pairs(df).collect()}
    assert got[(1, 2)] == 1.0
    assert got[(1, 3)] == 0.0


def test_cosine_topk_against_numpy(spark, emb):
    import numpy as np

    sub = emb.filter(F.col("vec_id") < 40)
    got = SIM.brute_force_topk(sub, sub.filter(F.col("vec_id") < 3), k=2).collect()

    rows = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in sub.collect()}
    for qid in range(3):
        q = rows[qid]
        sims = {
            cid: float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
            for cid, v in rows.items()
            if cid != qid
        }
        expect = sorted(sims, key=lambda c: (-sims[c], c))[:2]
        mine = [r.neighbor_id for r in sorted(got, key=lambda r: r.sim, reverse=True) if r.query_id == qid]
        assert mine == expect


def test_ivf_with_full_probe_equals_brute_force(spark, emb):
    """Probing every cluster makes IVF exact — it must reproduce the
    brute-force top-k identically."""
    queries = emb.filter(F.col("vec_id") < 5)
    bf = {(r.query_id, r.neighbor_id) for r in SIM.brute_force_topk(emb, queries, k=3).collect()}
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in SIM.ivf_topk(emb, queries, k=3, n_clusters=8, n_probe=8).collect()
    }
    assert ivf == bf


def test_ivf_partial_probe_recall(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    bf = {(r.query_id, r.neighbor_id) for r in SIM.brute_force_topk(emb, queries, k=3).collect()}
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in SIM.ivf_topk(emb, queries, k=3, n_clusters=8, n_probe=4).collect()
    }
    recall = len(ivf & bf) / len(bf)
    assert recall >= 0.3  # random uniform vectors cluster weakly; sanity floor


def test_lsh_ann_returns_plausible_neighbors(spark, emb):
    """ANN must return same-bucket items with valid cosine range and
    reasonable recall vs brute force on the small set."""
    queries = emb.filter(F.col("vec_id") < 5)
    ann = SIM.lsh_ann_topk(emb, queries, k=3).collect()
    assert all(-1.0001 <= r.sim <= 1.0001 for r in ann)
    assert all(r.query_id != r.neighbor_id for r in ann)


def test_near_dup_pairs_symmetric_bounded(spark, emb):
    pairs = SIM.cosine_near_dup_pairs(emb.limit(200), threshold=0.5).collect()
    assert all(r.id_a < r.id_b for r in pairs)
    assert all(r.sim >= 0.5 for r in pairs)


def test_multiprobe_lsh_raises_recall_without_more_tables(spark, emb):
    """Margin-aware multiprobe (r4 verdict stretch item): per table,
    also probe the buckets across the query's lowest-|margin|
    hyperplanes. Measured at sf0.1 (RESULTS.md): recall@5 0.516 ->
    0.912 with 2 probes at 4 planes x 4 tables, runtime flat. Here:
    recall must improve monotonically vs probe-free on the fixture,
    probes=0 must be byte-identical to the historical behavior (same
    candidate set as the join strategy), and the join strategy must
    reject n_probes (probe selection needs query margins, which live
    in the fused closure)."""
    import pytest

    queries = emb.filter(F.col("vec_id") < 20)
    bf = {}
    for r in SIM.brute_force_topk(emb, queries, k=5).collect():
        bf.setdefault(r.query_id, set()).add(r.neighbor_id)
    total = sum(len(v) for v in bf.values())

    def recall(n_probes):
        got = {}
        rows = SIM.lsh_ann_topk(
            emb, queries, k=5, n_planes=4, n_tables=4, n_probes=n_probes
        ).collect()
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(len(bf[q] & got.get(q, set())) for q in bf) / total

    r0, r2 = recall(0), recall(2)
    assert r2 >= r0
    assert r2 >= 0.6  # 0.912 measured at sf0.1; generous floor for sf0.001

    with pytest.raises(ValueError, match="n_probes"):
        SIM.lsh_ann_topk(emb, queries, n_probes=2, strategy="join")


def test_portable_ivf_structure_and_determinism(spark, emb):
    """portable_ivf_pairs (r7): probe lists bounded by n_probe, pairs
    only inside probed clusters, no self-pairs, integer evidence
    consistent with the quantized vectors, and bit-identical across
    two runs (the cross-engine contract's precondition)."""
    queries = emb.filter(F.col("vec_id") < 10)
    out = SIM.portable_ivf_pairs(emb, queries, n_clusters=8, n_probe=2)
    rows = out.collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        assert r.query_id != r.cand_id
        assert 1 <= r.probe_rank <= 2
        assert r.qnormsq > 0 and r.cnormsq > 0
        by_q.setdefault(r.query_id, set()).add(r.cluster)
    assert all(len(cl) <= 2 for cl in by_q.values())
    rows2 = SIM.portable_ivf_pairs(emb, queries, n_clusters=8, n_probe=2).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_portable_ivf_full_probe_covers_brute_force(spark, emb):
    """With n_probe == n_clusters every list is probed, so the pair
    set must be ALL (query, candidate) pairs — the IVF recall contract
    degrades to exhaustive exactly like ivf_topk does."""
    queries = emb.filter(F.col("vec_id") < 3)
    n_cand = emb.count()
    out = SIM.portable_ivf_pairs(
        emb, queries, n_clusters=4, n_probe=4
    )
    got = out.groupBy("query_id").count().collect()
    assert {r["count"] for r in got} == {n_cand - 1}  # all but self


def test_portable_ivf_empty_cluster_keeps_centroid(spark):
    """Two identical seed vectors: the duplicate's cluster empties on
    the first assignment (tie -> smaller id) and must keep its seed
    centroid instead of crashing or emitting nulls."""
    rows = [(i, [float((i * 7 + d) % 5 - 2) for d in range(8)]) for i in range(6)]
    rows.append((6, rows[0][1]))  # exact duplicate vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = SIM.portable_ivf_pairs(
        df, df.filter(F.col("vec_id") < 2),
        n_clusters=4, rounds=2, n_probe=2, dim=8,
    ).collect()
    assert out  # survives and pairs something


def test_portable_pq_structure_and_duplicate_is_nearest(spark):
    """portable_pq_topk (r7): codes bounded by the codebook size,
    ranks dense 1..k, deterministic across runs; an exact duplicate of
    the query vector encodes to the query's own codes, so its ADC
    distance is the attainable minimum."""
    rows = [
        (i, [float(((i * 13 + d * 7) % 11) - 5) / 5.0 for d in range(16)])
        for i in range(40)
    ]
    rows.append((100, rows[2][1]))  # exact duplicate of vec_id=2
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 2)
    out = SIM.portable_pq_topk(
        df, q, m_subspaces=4, n_clusters=4, k=10, dim=16
    ).collect()
    assert out
    assert sorted(r.rnk for r in out) == list(range(1, len(out) + 1))
    for r in out:
        for m in range(4):
            assert 0 <= r[f"code_{m}"] < 4
        assert r.cand_id != 2
    dup = next(r for r in out if r.cand_id == 100)
    assert dup.adc_dist == min(r.adc_dist for r in out)
    out2 = SIM.portable_pq_topk(
        df, q, m_subspaces=4, n_clusters=4, k=10, dim=16
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_zero_norm_vectors_never_rank_as_neighbors(spark):
    """r9 fresh-eyes regression: a zero vector's cosine is 0/0 = NaN,
    and NaN is the LARGEST double under Spark's desc ordering — before
    the fix, one all-zero embedding surfaced as EVERY query's top
    neighbor in the float top-k paths. Zero-norm rows must be excluded
    on both sides of brute-force, LSH (both strategies), and IVF."""
    from aoseventstreamer_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_ann_topk,
    )

    rows = [(i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(8)])
            for i in range(30)]
    rows.append((99, [0.0] * 8))  # the zero vector
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for out in (
        brute_force_topk(emb, emb, k=3),
        lsh_ann_topk(emb, emb, k=3, n_planes=2, n_tables=2, strategy="fused"),
        lsh_ann_topk(emb, emb, k=3, n_planes=2, n_tables=2, strategy="join"),
        ivf_topk(emb, emb, k=3, n_clusters=2, n_probe=2),
    ):
        pdf = out.toPandas()
        assert 99 not in set(pdf["neighbor_id"]), "zero vec ranked as neighbor"
        assert 99 not in set(pdf["query_id"])
        assert not pdf["sim"].isna().any()
