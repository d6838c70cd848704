"""CurationPipeline: composition, per-step counts, near-dup step."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.curation import CurationPipeline
from aoseventstreamer_spark.queries import QUERIES
from aoseventstreamer_spark.session import load_table


def test_pipeline_equals_manual_composition(spark, sf_dir):
    from aoseventstreamer_spark.operators import dedup as D
    from aoseventstreamer_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents")
    pipe = CurationPipeline(
        [("lang", {"keep": ["en"]}), ("min_words", {"n": 20}),
         ("exact_dedup", {})]
    )
    got = sorted(r.doc_id for r in pipe.apply(docs).collect())
    manual = docs.filter(TX.lang_id("text").isin(["en"])).filter(
        TX.word_count("text") >= 20
    )
    keepers = D.exact_dedup(manual).select(F.col("keeper").alias("doc_id"))
    expect = sorted(
        r.doc_id for r in manual.join(keepers, "doc_id", "left_semi").collect()
    )
    assert got == expect and got


def test_pipeline_counts_are_monotone_and_measured_in_one_action(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pipe = CurationPipeline(
        [("lang", {"keep": ["en"]}), ("quality", {"min_score": 0.5}),
         ("exact_dedup", {}), ("weighted_sample", {"weight_col": "n_chars"})]
    )
    out = pipe.apply(docs, observe=True)
    n_final = out.count()  # the ONE action; counts ride it
    counts = pipe.counts()
    vals = list(counts.values())
    assert vals[0] == docs.count()
    assert all(a >= b for a, b in zip(vals, vals[1:]))  # filters only shrink
    assert vals[-1] == n_final


def test_pipeline_near_dedup_drops_verified_duplicates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # plant a near-duplicate of doc 0 with a huge id
    clone = docs.filter(F.col("doc_id") == 0).select(
        F.lit(10_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        "lang", "source", "n_chars",
    )
    planted = docs.unionByName(clone)
    pipe = CurationPipeline([("near_dedup", {"threshold": 0.4})])
    kept = {r.doc_id for r in pipe.apply(planted).select("doc_id").collect()}
    assert 0 in kept          # the original survives
    assert 10_000_000 not in kept  # the planted clone is pruned
    # idempotent: nothing else to drop on a second pass
    kept_df = planted.join(
        spark.createDataFrame([(i,) for i in kept], "doc_id long"),
        "doc_id", "left_semi",
    )
    again = {r.doc_id for r in pipe.apply(kept_df).select("doc_id").collect()}
    assert again == kept


def test_unknown_step_and_bad_params_raise(spark, sf_dir):
    import pytest

    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="unknown curation step"):
        CurationPipeline([("frobnicate", {})]).apply(docs)
    with pytest.raises(ValueError, match="unused params"):
        CurationPipeline([("lang", {"keep": ["en"], "oops": 1})]).apply(docs)


def test_registered_capstone_matches_pipeline(spark, sf_dir):
    rows = QUERIES["q_curation_pipeline"](spark, sf_dir).collect()
    assert rows and all(r.lang == "en" or r.lang is not None for r in rows)


def test_salted_sampling_steps_compose_independently(spark, sf_dir):
    """Two 50% samples with DIFFERENT salts keep ~25%; with the same
    salt they are perfectly correlated and keep 50% (the review
    finding this guards against)."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    same = CurationPipeline(
        [("hash_sample", {"rate_pct": 50}), ("hash_sample", {"rate_pct": 50})]
    ).apply(docs).count()
    salted = CurationPipeline(
        [("hash_sample", {"rate_pct": 50}),
         ("hash_sample", {"rate_pct": 50, "salt": 1})]
    ).apply(docs).count()
    assert abs(same / n - 0.5) < 0.1          # correlated: min(p, p) = p
    assert abs(salted / n - 0.25) < 0.1       # decorrelated: p * p


def test_perplexity_step_filters_and_composes(spark, sf_dir):
    """The perplexity gate keeps exactly the docs scoring <= max_ppl
    under the self-trained model (and drops sub-2-token docs), and
    composes with the other steps in one plan."""
    from aoseventstreamer_spark.operators import lm as LM

    import math

    docs = load_table(spark, sf_dir, "documents")
    rows = LM.perplexity_scores(docs).collect()
    cutoff = sorted(r.ppl for r in rows)[len(rows) // 2]
    kept = CurationPipeline([("perplexity", {"max_ppl": cutoff})]).apply(docs)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    # the gate compares the EXACT integer avg micro-nats against
    # floor(ln(max_ppl)*1e6) — the display ppl is derived, so the
    # expected set is stated over avg_nll_u, not the rounded float
    max_nll_u = math.floor(math.log(cutoff) * 1_000_000)
    assert kept_ids == {r.doc_id for r in rows if r.avg_nll_u <= max_nll_u}

    tiny = spark.createDataFrame([(1, "solo"), (2, "two tokens")], ["doc_id", "text"])
    kept2 = CurationPipeline([("perplexity", {"max_ppl": 1e9})]).apply(tiny)
    assert {r.doc_id for r in kept2.collect()} == {2}  # 1-token doc dropped


def test_materialize_step_is_transparent_and_releasable(spark, sf_dir):
    """``materialize`` changes the result in no way — it only persists
    the frame at its recipe position (so a multi-consumer step like
    self-trained perplexity reads the upstream chain once). release()
    drops the cached blocks and is idempotent."""
    docs = load_table(spark, sf_dir, "documents")
    recipe_tail = [("perplexity", {"max_ppl": 29.5})]
    head = [("lang", {"keep": ["en"]}), ("exact_dedup", {})]
    plain = CurationPipeline(head + recipe_tail)
    cached = CurationPipeline(head + [("materialize", {})] + recipe_tail)
    a = {r.doc_id for r in plain.apply(docs).select("doc_id").collect()}
    b = {r.doc_id for r in cached.apply(docs).select("doc_id").collect()}
    assert a == b and a
    assert cached._cached and cached._cached[0].is_cached
    cached.release()
    assert not cached._cached
    cached.release()  # idempotent


def test_registered_full_capstone(spark, sf_dir):
    """The 6-step capstone runs and its pre-sample survivor set is a
    strict subset of the 4-step one's (the near-dup + perplexity gates
    only ever remove docs). The sampled outputs are NOT compared —
    the weighted draw normalizes by each pipeline's own max weight."""
    assert QUERIES["q_curation_full"](spark, sf_dir).count() > 0
    docs = load_table(spark, sf_dir, "documents")
    common = [("lang", {"keep": ["en"]}), ("quality", {"min_score": 0.5}),
              ("exact_dedup", {})]
    base = {r.doc_id for r in CurationPipeline(common).apply(docs).collect()}
    full = {
        r.doc_id
        for r in CurationPipeline(
            common
            + [("near_dedup", {"threshold": 0.4, "portable": True}),
               ("perplexity", {"max_ppl": 29.5})]
        ).apply(docs).collect()
    }
    assert full and full < base


def test_dsir_step_gates_on_target_likeness(spark):
    from aoseventstreamer_spark.operators.curation import CurationPipeline

    rows = []
    for i in range(20):
        if i % 2 == 0:
            rows.append((i, "alpha beta alpha beta gamma alpha", "tgt"))
        else:
            rows.append((i, "delta epsilon delta epsilon zeta delta", "web"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    out = CurationPipeline(
        [("dsir", {"target_filter": F.col("source") == "tgt", "min_logw": 0.0})]
    ).apply(docs)
    assert sorted(r.doc_id for r in out.collect()) == list(range(0, 20, 2))
    # survivors keep the full input schema (semi-join, not projection)
    assert set(out.columns) == {"doc_id", "text", "source"}

    top = CurationPipeline(
        [("dsir", {"target_filter": F.col("source") == "tgt", "top_k": 5})]
    ).apply(docs)
    assert top.count() == 5

    with pytest.raises(ValueError, match="exactly one"):
        CurationPipeline([("dsir", {"target_filter": F.lit(True)})]).apply(docs)
    with pytest.raises(ValueError, match="unused params"):
        CurationPipeline(
            [("dsir", {"target_filter": F.lit(True), "top_k": 3, "typo": 1})]
        ).apply(docs).collect()
