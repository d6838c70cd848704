"""Composable corpus-curation pipeline: the operators of the dedup/
quality/sampling packs chained into ONE lazy DataFrame plan.

A real pretraining-data pipeline is not a bag of queries — it is a
recipe: language filter → quality gate → exact dedup → near-dup
prune → length-weighted sample. This module expresses the recipe as
declarative steps over a documents frame, composing into a single
Spark plan (Catalyst sees the whole chain: filters merge into the
scan, the dedup anti-joins see only survivors, nothing materializes
between steps), with an optional per-step retained-count report via
``Observation`` (counts ride the one real action — no extra passes).

Deterministic end to end: the sampling steps use the same
multiplicative-hash draw as queries/corpus_pack.py, so a re-run (or a
rerun after a crash) selects the identical corpus.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import dedup as D
from aoseventstreamer_spark.operators import text as TX
from aoseventstreamer_spark.operators.sampling import M32 as _M32
from aoseventstreamer_spark.operators.sampling import uniform_draw


@dataclass
class CurationPipeline:
    """Recipe of (step, params) pairs applied in order.

    Steps (all operate on a frame with ``doc_id`` + ``text``):

    - ``("lang", {"keep": ["en"]})`` — n-gram language gate
    - ``("quality", {"min_score": 0.5})`` — composite quality gate
    - ``("min_words", {"n": 5})`` / ``("max_words", {"n": 100000})``
    - ``("exact_dedup", {})`` — normalized-hash, keep lowest doc_id
    - ``("near_dedup", {"threshold": 0.4})`` — minhash/LSH candidates
      verified by n-gram Jaccard; drops the higher doc_id of each
      verified pair (greedy, idempotent)
    - ``("perplexity", {"max_ppl": 500.0})`` — CCNet-style bigram-LM
      gate: keep docs whose perplexity under a model trained on the
      CURRENT surviving frame (or a ``train`` reference frame) is at
      most max_ppl. Docs with < 2 tokens have no score and are
      dropped — a sub-2-token doc carries no trainable signal anyway
    - ``("dsir", {"target_filter": <Column>, "min_logw": 0.0})`` or
      ``{"target_filter": <Column>, "top_k": 10000}`` — DSIR
      importance gate (operators/selection.py): keep docs at least
      ``min_logw`` nats more target-like than raw, or Gumbel-resample
      the best ``top_k``. The target subset is marked by the filter
      Column ON THE CURRENT FRAME; exactly one of min_logw/top_k
    - ``("weighted_sample", {"weight_col": "n_chars"})`` —
      deterministic Bernoulli, P = w / max(w)
    - ``("hash_sample", {"rate_pct": 10})`` — deterministic uniform
    - ``("materialize", {})`` — persist the frame AT THIS POINT in the
      recipe (MEMORY_AND_DISK). Place it before a step that consumes
      its input more than once — ``perplexity`` with ``train=None``
      derives the model's c2/c1/vocab aggregates AND the scoring pass
      from the same frame, so everything upstream (e.g. a near-dedup
      chain) would otherwise be recomputed per consumer. Results are
      identical either way; call ``release()`` when done with the
      output to drop the cached blocks

    ``apply(docs, observe=True)`` returns the surviving frame;
    ``counts()`` (after the caller runs an action) returns the
    per-step retained counts measured DURING that action.
    """

    steps: list[tuple[str, dict]]
    _obs: list[tuple[str, Observation]] = field(default_factory=list, repr=False)
    _cached: list[DataFrame] = field(default_factory=list, repr=False)

    def apply(self, docs: DataFrame, observe: bool = False) -> DataFrame:
        df = docs
        self.release()  # a re-apply must not leak the prior run's cache
        self._obs = []
        if observe:
            df = self._tap(df, "input")
        for i, (step, params) in enumerate(self.steps):
            df = self._apply_step(df, step, dict(params))
            if observe:
                df = self._tap(df, f"{i}:{step}")
        return df

    def release(self) -> None:
        """Unpersist every frame cached by ``materialize`` steps in the
        most recent ``apply`` (safe to call repeatedly / before any
        action — unpersist on an unmaterialized frame is a no-op)."""
        while self._cached:
            self._cached.pop().unpersist()

    def counts(self) -> dict[str, int]:
        """Per-step retained counts; call after an action on apply()'s
        result (Observation blocks until its metrics arrive)."""
        return {name: int(o.get["rows"]) for name, o in self._obs}

    def _tap(self, df: DataFrame, name: str) -> DataFrame:
        obs = Observation(f"curation_{len(self._obs)}_{name}")
        self._obs.append((name, obs))
        return df.observe(obs, F.count(F.lit(1)).alias("rows"))

    def _apply_step(self, df: DataFrame, step: str, p: dict) -> DataFrame:
        if step == "lang":
            keep = p.pop("keep")
            out = df.filter(TX.lang_id("text").isin(keep))
        elif step == "quality":
            min_score = p.pop("min_score")
            out = df.filter(
                TX.quality_score("text", TX.word_count("text")) >= min_score
            )
        elif step == "min_words":
            out = df.filter(TX.word_count("text") >= p.pop("n"))
        elif step == "max_words":
            out = df.filter(TX.word_count("text") <= p.pop("n"))
        elif step == "exact_dedup":
            keepers = D.exact_dedup(df).select(
                F.col("keeper").alias("doc_id")
            )
            out = df.join(keepers, "doc_id", "left_semi")
        elif step == "near_dedup":
            import inspect

            threshold = p.pop("threshold", 0.4)
            # validate forwarded kwargs against the operators' real
            # signatures (verified_near_dup_pairs's explicit params
            # plus what its **minhash_kwargs forwards on to
            # minhash_dedup_pairs) so a typo'd key gets the same
            # friendly per-step error as every other step, not a
            # TypeError deep inside minhash_dedup_pairs
            allowed = (
                set(inspect.signature(D.verified_near_dup_pairs).parameters)
                | set(inspect.signature(D.minhash_dedup_pairs).parameters)
            ) - {"df", "threshold", "minhash_kwargs"}
            unknown = set(p) - allowed
            if unknown:
                raise ValueError(
                    f"unused params for step {step}: {sorted(unknown)}"
                )
            pairs = D.verified_near_dup_pairs(df, threshold=threshold, **p)
            p = {}
            losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
            out = df.join(losers, "doc_id", "left_anti")
        elif step == "perplexity":
            from aoseventstreamer_spark.operators import lm as LM

            max_ppl = p.pop("max_ppl")
            train = p.pop("train", None)
            model = p.pop("model", None)  # pre-built PerplexityModel
            # gate on the exact integer avg micro-nats, not the derived
            # float ppl: ppl <= max_ppl  <=>  avg_nll_u <= ln(max_ppl)*1e6
            # (floor at integer micro-nats; same constant in the oracle)
            import math

            max_nll_u = math.floor(math.log(max_ppl) * 1_000_000)
            keep = (
                LM.perplexity_scores(df, train=train, model=model)
                .filter(F.col("avg_nll_u") <= F.lit(max_nll_u))
                .select("doc_id")
            )
            out = df.join(keep, "doc_id", "left_semi")
        elif step == "dsir":
            from aoseventstreamer_spark.operators import selection as SEL

            target = p.pop("target_filter")
            min_logw = p.pop("min_logw", None)
            top_k = p.pop("top_k", None)
            buckets = p.pop("buckets", 4096)
            if (min_logw is None) == (top_k is None):
                raise ValueError(
                    "dsir step needs exactly one of min_logw / top_k"
                )
            if min_logw is not None:
                # threshold on the exact integer micro-nat sum — the
                # same quantity the oracle reproduces
                keep = (
                    SEL.dsir_log_weights(df, target, buckets=buckets)
                    .filter(F.col("logw_u") >= int(round(min_logw * 1_000_000)))
                    .select("doc_id")
                )
            else:
                keep = SEL.dsir_select(df, top_k, target, buckets=buckets).select(
                    "doc_id"
                )
            out = df.join(keep, "doc_id", "left_semi")
        elif step == "weighted_sample":
            w = F.col(p.pop("weight_col"))
            # per-step salt decorrelates composed sampling steps: two
            # Bernoulli steps on the SAME unsalted draw keep min(p1,p2)
            # of the corpus (perfectly correlated), not p1*p2
            draw = uniform_draw("doc_id", salt=p.pop("salt", 0))
            mx = df.agg(F.max(w).alias("m"))
            out = (
                df.crossJoin(F.broadcast(mx))
                .filter(draw * F.col("m") < w * F.lit(_M32))
                .drop("m")
            )
        elif step == "hash_sample":
            rate = p.pop("rate_pct")
            draw = uniform_draw("doc_id", salt=p.pop("salt", 0))
            out = df.filter(draw * 100 < F.lit(rate * _M32))
        elif step == "materialize":
            from pyspark import StorageLevel

            out = df.persist(StorageLevel.MEMORY_AND_DISK)
            self._cached.append(out)
        else:
            raise ValueError(f"unknown curation step: {step}")
        if p:
            raise ValueError(f"unused params for step {step}: {sorted(p)}")
        return out
