"""Product-quantization operator tests (operators/pq.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import pq as PQ
from aoseventstreamer_spark.operators.similarity import brute_force_topk
from aoseventstreamer_spark.session import load_table

DIM = 64


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def books(emb):
    return PQ.train_pq_codebooks(emb, dim=DIM, m=16, k=64)


def test_codebook_shape(books):
    assert len(books) == 16
    assert all(len(cb) == 64 for cb in books)
    assert all(len(c) == DIM // 16 for cb in books for c in cb)


def test_codes_in_range(emb, books):
    codes = PQ.pq_encode(emb, books, DIM).collect()
    n = emb.count()
    assert len(codes) == n
    for r in codes:
        assert len(r.codes) == 16
        assert all(0 <= c < 64 for c in r.codes)


def test_encoding_matches_driver_side_argmin(emb, books):
    """The Arrow encoder must agree with a plain numpy recompute."""
    import numpy as np

    rows = emb.filter(F.col("vec_id") < 50).select("vec_id", "embedding").collect()
    got = {
        r.cand_id: list(r.codes)
        for r in PQ.pq_encode(emb.filter(F.col("vec_id") < 50), books, DIM).collect()
    }
    m, kk = len(books), len(books[0])
    d_sub = DIM // m
    for r in rows:
        v = np.array(r.embedding, dtype=float)
        v = v / np.linalg.norm(v)
        want = []
        for sub in range(m):
            s = v[sub * d_sub : (sub + 1) * d_sub]
            d2 = [sum((s[i] - c[i]) ** 2 for i in range(d_sub)) for c in books[sub]]
            want.append(int(min(range(kk), key=lambda j: d2[j])))
        assert got[r.vec_id] == want


def test_adc_equals_exact_on_codeword_vectors(spark):
    """When every distinct normalized subvector IS a centroid, ADC is
    EXACT: sim == true cosine. Vectors are built from constant-norm
    subvector alphabets so per-vector L2 normalization cannot multiply
    the subvector vocabulary, and k=3 over 4 vectors makes the
    neighbor set trivially all-others (no tie hazards) — the assertion
    is about the VALUES."""
    import itertools

    alphabet = [[3.0, 4.0], [5.0, 0.0]]  # both norm 5
    base = [a + b for a, b in itertools.product(alphabet, alphabet)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(base)], "vec_id long, embedding array<double>"
    )
    books = PQ.train_pq_codebooks(df, dim=4, m=2, k=8)
    got = PQ.pq_topk(df, df, books, dim=4, k=3).collect()
    exact = brute_force_topk(df, df, k=3).collect()
    got_m = {(r.query_id, r.neighbor_id): r.sim for r in got}
    exact_m = {(r.query_id, r.neighbor_id): r.sim for r in exact}
    assert set(got_m) == set(exact_m)  # 4 queries x all 3 others
    for key, sim in exact_m.items():
        assert math.isclose(got_m[key], sim, abs_tol=2e-4), key


def test_recall_vs_brute_force(emb, books):
    """PQ top-3 must recover a solid fraction of the true top-3 on the
    fixture vectors (m=4, k=16 on 64-dim is a coarse code — exact
    agreement is not expected, a recall floor is)."""
    queries = emb.filter(F.col("vec_id") < 10)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=3).collect()
    }
    top3 = {
        (r.query_id, r.neighbor_id)
        for r in PQ.pq_topk(emb, queries, books, dim=DIM, k=3).collect()
    }
    top10 = {
        (r.query_id, r.neighbor_id)
        for r in PQ.pq_topk(emb, queries, books, dim=DIM, k=10).collect()
    }
    assert len(truth & top3) / len(truth) >= 0.3
    # standard ANN metric: true top-3 recovered within ADC top-10
    assert len(truth & top10) / len(truth) >= 0.6


def test_ivf_pq_routing_subset_of_flat(emb, books):
    """IVF-routed PQ scores a subset of lists; with n_probe equal to
    n_clusters it must return exactly the flat-PQ result."""
    queries = emb.filter(F.col("vec_id") < 10)
    flat = {
        (r.query_id, r.neighbor_id, r.sim)
        for r in PQ.pq_topk(emb, queries, books, dim=DIM, k=3).collect()
    }
    routed_full = {
        (r.query_id, r.neighbor_id, r.sim)
        for r in PQ.pq_topk(
            emb, queries, books, dim=DIM, k=3, n_clusters=8, n_probe=8
        ).collect()
    }
    assert routed_full == flat
    # pruned probe returns k rows per query and stays plausible
    routed = PQ.pq_topk(emb, queries, books, dim=DIM, k=3, n_clusters=8, n_probe=2)
    per_q = routed.groupBy("query_id").count().collect()
    assert all(r["count"] <= 3 for r in per_q)
    assert len(per_q) == 10


def test_scoring_stays_jvm_side(emb, books):
    """Encoding is the sanctioned Arrow kernel; the ADC scoring join
    itself must contain no Python-evaluating nodes beyond it."""
    from aoseventstreamer_spark.plans.inspect import formatted_plan

    plan = formatted_plan(
        PQ.pq_topk(emb, emb.filter(F.col("vec_id") < 10), books, dim=DIM, k=3)
    )
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    # the only Arrow stages are the candidate encoder and the per-query
    # LUT kernel; the per-candidate ADC gather itself is JVM expressions
    import re

    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) <= 2
