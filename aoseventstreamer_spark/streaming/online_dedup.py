"""Online (ingestion-time) near-duplicate filtering.

Batch dedup (operators/dedup.py) sweeps a corpus that already exists;
a crawl pipeline wants the other mode: documents arrive continuously,
and each new document must be admitted or rejected AGAINST EVERYTHING
SEEN SO FAR without rescanning the corpus. The classic design (every
production crawl dedup since Broder) is a persistent store of LSH band
hashes: a newcomer is a duplicate iff one of its bands collides with a
stored band.

Spark mapping:

- The signature store is a parquet table of (band_id, band_hash,
  doc_id), appended per micro-batch and REPLACED per batch id — at-
  least-once replay of a batch overwrites its own partition instead of
  poisoning the store (idempotent, same trick as the exactly-once
  parquet sink in streaming/joins.py).
- Admission = left-anti equi-join of the newcomer's bands against the
  store — the same join shape as the batch LSH path, so it scales the
  same way (band hashes are uniform; the store carries a few longs per
  admitted doc, not the text).
- Intra-batch collisions resolve deterministically: within each band
  bucket the smallest doc_id wins; a doc is dropped if ANY of its
  bands has a smaller colliding doc in the same batch. (Banding
  without verification trades a tunable false-positive rate for never
  rescanning — exactly the LSH contract; tighten bands/rows for
  precision.)

At 100 TB the store is ~(bands x 16 bytes) per admitted doc — orders
of magnitude smaller than the corpus — and can be bucketed by
band_hash so the admission join is co-located.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.dedup import _banded, minhash_docs

_BANDS_SCHEMA = "band_id int, band_hash long, doc_id long"


class OnlineDeduper:
    """Persistent LSH-band store + per-batch admission filter.

    ``process_batch(batch_df, batch_id)`` returns the admitted subset
    of the batch and records the admitted docs' bands under the batch
    id (replayed batches overwrite their own output — idempotent)."""

    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        num_hashes: int = 16,
        bands: int = 8,
        shingle_k: int = 3,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        if num_hashes % bands != 0:
            raise ValueError(
                f"bands ({bands}) must evenly divide num_hashes ({num_hashes})"
            )
        self.spark = spark
        self.store = os.path.join(state_root, "band_store")
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = num_hashes // bands
        self.shingle_k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def _bands_of(self, df: DataFrame) -> DataFrame:
        sigs = minhash_docs(
            df,
            text_col=self.text_col,
            id_col=self.id_col,
            num_hashes=self.num_hashes,
            shingle_k=self.shingle_k,
        )
        return _banded(sigs, self.bands, self.rows_per_band, self.id_col).select(
            "band_id", "band_hash", F.col(self.id_col).alias("doc_id")
        )

    def _store_df(self, exclude_batch: int) -> DataFrame:
        """Band store EXCLUDING the given batch's own partition: under
        at-least-once replay the batch must not collide with its own
        earlier write (the partition filter prunes it at file-listing
        level, and the rewrite below then overwrites it)."""
        # existence is checked explicitly (like demux's manifest) so a
        # REAL read failure — corrupt footer, permissions — still fails
        # the batch loudly; a bare except here would silently admit
        # every known duplicate by treating the store as empty
        if not os.path.isdir(self.store):
            return self.spark.createDataFrame([], _BANDS_SCHEMA)
        # batch_id is a partition column of the stored layout
        return (
            self.spark.read.schema(_BANDS_SCHEMA + ", batch_id int")
            .parquet(self.store)
            .filter(F.col("batch_id") != exclude_batch)
            .select("band_id", "band_hash", "doc_id")
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        """Admit the novel documents of one micro-batch.

        Two-stage filter, both plain joins:
        1. store collision  → drop (seen in an earlier batch);
        2. intra-batch collision → smallest doc_id per band bucket
           wins.
        Admitted docs' bands land in ``band_store/batch_id=<n>/``
        via dynamic partition overwrite (replay-safe)."""
        bands = self._bands_of(batch_df).cache()
        try:
            store = self._store_df(exclude_batch=int(batch_id))
            if dict(batch_df.dtypes).get(self.id_col) != "bigint":
                raise TypeError(
                    f"id_col {self.id_col!r} must be bigint (the band store "
                    "schema is fixed); map your id to a long first"
                )
            # stage 1: any band seen before disqualifies the doc
            hit_store = (
                bands.join(store, on=["band_id", "band_hash"], how="left_semi")
                .select("doc_id")
                .distinct()
            )
            fresh = bands.join(hit_store, on="doc_id", how="left_anti")
            # stage 2: within the batch, smallest doc per bucket wins
            bucket_min = fresh.groupBy("band_id", "band_hash").agg(
                F.min("doc_id").alias("min_doc")
            )
            losers = (
                fresh.join(bucket_min, on=["band_id", "band_hash"])
                .filter(F.col("doc_id") > F.col("min_doc"))
                .select("doc_id")
                .distinct()
            )
            # cached: the store write below AND the caller's sink write
            # both consume it — without the cache the whole admission
            # pipeline (incl. the join against the ever-growing store)
            # would execute twice per batch. Left cached (a tiny id
            # frame per batch); Spark's LRU evicts old ones.
            admitted_ids = (
                fresh.select("doc_id")
                .distinct()
                .join(losers, on="doc_id", how="left_anti")
            ).cache()
            admitted = batch_df.join(
                admitted_ids.withColumnRenamed("doc_id", self.id_col),
                on=self.id_col,
                how="left_semi",
            )
            # record admitted bands, keyed by batch for replay-idempotence
            (
                bands.join(admitted_ids, on="doc_id", how="left_semi")
                .withColumn("batch_id", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(self.store)
            )
            return admitted
        finally:
            bands.unpersist()

    def run(
        self,
        stream: DataFrame,
        checkpoint: str,
        sink_path: str,
        trigger: dict | None = None,
    ):
        """foreachBatch wrapper: admitted docs append to
        ``sink_path`` (batch-id-keyed overwrite → idempotent under
        replay, same contract as exactly_once_parquet_sink)."""

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            admitted = self.process_batch(batch_df, batch_id)
            (
                admitted.withColumn("__batch_id", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .partitionBy("__batch_id")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(sink_path)
            )

        return (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint)
            .trigger(**(trigger or {"processingTime": "250 milliseconds"}))
            .start()
        )


# Steps a per-batch gate may use: they depend only on the row itself
# (or on a FIXED reference frame), never on the accumulating stream —
# corpus-wide steps (exact_dedup, near_dedup, weighted_sample) would
# silently compute against one micro-batch instead of everything seen,
# which is exactly the bug class this allowlist exists to refuse.
# near-dup across batches is the OnlineDeduper's job; perplexity is
# admitted ONLY with an explicit pre-trained reference frame.
_STATELESS_STEPS = {"lang", "quality", "min_words", "max_words", "hash_sample"}


class OnlineCurator:
    """Ingest-time curation: stateless quality gates, then persistent
    near-dup admission — the streaming form of CurationPipeline.

    ``steps`` uses CurationPipeline's step vocabulary, restricted to
    per-row gates (see _STATELESS_STEPS); ``("perplexity", {...})`` is
    allowed iff the params carry a ``train`` reference DataFrame (a
    FROZEN quality model — CCNet scores a crawl against wikipedia, not
    against itself). The reference LM is trained ONCE at construction
    and its model tables persisted, so per-batch gating is a broadcast
    join against cached counts — never a re-scan of the reference
    corpus. Everything surviving the gates goes through the
    OnlineDeduper's band-store admission, inheriting its replay
    idempotence.

    With ``observe=True``, ``counts`` after each batch reports
    (arrived, gated, admitted): arrived/gated ride the admission
    action as Observation metrics (no extra pass over the gate chain);
    admitted is one count on the deduper's already-cached id frame.
    Default off — a hot 250 ms-trigger loop should not pay even that."""

    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        steps: list[tuple[str, dict]],
        observe: bool = False,
        **dedup_kwargs,
    ):
        from aoseventstreamer_spark.operators import lm as LM
        from aoseventstreamer_spark.operators.curation import CurationPipeline

        frozen_steps: list[tuple[str, dict]] = []
        self._models: list[LM.PerplexityModel] = []
        for step, params in steps:
            if step == "perplexity":
                params = dict(params)
                train = params.pop("train", None)
                if train is None:
                    raise ValueError(
                        "online perplexity gating needs a pre-trained reference "
                        "frame: pass ('perplexity', {'max_ppl': ..., 'train': ref_df})"
                    )
                model = LM.train_bigram_model(
                    train, vocab_size=params.pop("vocab_size", None)
                ).persist()
                self._models.append(model)
                params["model"] = model
            elif step not in _STATELESS_STEPS:
                raise ValueError(
                    f"step {step!r} is not per-row-stateless; online near-dup "
                    "is handled by the band store, corpus-wide steps belong in "
                    "the batch CurationPipeline"
                )
            frozen_steps.append((step, params))
        self._pipe = CurationPipeline(frozen_steps)
        self._observe = observe
        self._deduper = OnlineDeduper(spark, state_root, **dedup_kwargs)
        self.counts: dict[str, int] = {}

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        gated = self._pipe.apply(batch_df, observe=self._observe)
        admitted = self._deduper.process_batch(gated, batch_id)
        if self._observe:
            # the deduper's store write was the action the Observation
            # metrics rode on; admitted_ids is cached inside it
            try:
                piped = self._pipe.counts()
                arrived, gated_n = piped["input"], list(piped.values())[-1]
            except Exception:
                # when a batch admits NOTHING, AQE's empty-relation
                # propagation replaces the store-write plan with an
                # empty relation, pruning the CollectMetrics nodes —
                # the metrics never fire and retrieval raises. Pay two
                # explicit counts for that (rare) batch instead.
                arrived, gated_n = batch_df.count(), gated.count()
            self.counts = {
                "arrived": arrived,
                "gated": gated_n,
                "admitted": admitted.count(),
            }
        return admitted

    def close(self) -> None:
        """Release the persisted reference-model frames."""
        for m in self._models:
            m.unpersist()
