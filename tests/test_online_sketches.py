"""Streaming maintenance of the probabilistic sketches: per-batch
partials via IncrementalRollup (streaming/rollup.py) must merge to the
same cells/registers/bits as a one-shot batch build, and redelivered
batches must not change them (the sketches' merge ops — SUM, MAX,
DISTINCT — compose with the rollup's batch-id idempotence)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import bloom, cms, hll
from aoseventstreamer_spark.streaming.rollup import IncrementalRollup


def _batches(spark):
    b0 = spark.createDataFrame(
        [(i, f"tok{i % 13}") for i in range(120)], "i long, tok string"
    )
    b1 = spark.createDataFrame(
        [(i, f"tok{i % 17}") for i in range(120, 260)], "i long, tok string"
    )
    return b0, b1


def test_streaming_cms_partials_equal_batch_build(spark, tmp_path):
    b0, b1 = _batches(spark)
    r = IncrementalRollup(
        spark,
        str(tmp_path / "cms"),
        keys=["row_i", "pos"],
        aggs={"cnt": F.sum("w").cast("long")},
    )
    r.process_batch(cms.cms_cells(b0, "tok", 16, 4), 0)
    r.process_batch(cms.cms_cells(b1, "tok", 16, 4), 1)
    got = sorted(map(tuple, r.current().collect()))
    want = sorted(map(tuple, cms.cms_build(b0.unionAll(b1), "tok", 16, 4).collect()))
    assert got == want


def test_streaming_hll_partials_equal_batch_build(spark, tmp_path):
    b0, b1 = _batches(spark)
    r = IncrementalRollup(
        spark,
        str(tmp_path / "hll"),
        keys=["bucket"],
        aggs={"max_rho": F.max("rho")},
        merge_fns={"max_rho": "max"},
    )
    r.process_batch(hll.hll_rhos(b0, "tok", 5), 0)
    r.process_batch(hll.hll_rhos(b1, "tok", 5), 1)
    # redelivery of batch 1 (at-least-once) must be a no-op
    r.process_batch(hll.hll_rhos(b1, "tok", 5), 1)
    got = sorted(map(tuple, r.current().collect()))
    want = sorted(map(tuple, hll.hll_sketch(b0.unionAll(b1), "tok", 5).collect()))
    assert got == want


def test_streaming_bloom_partials_equal_batch_build(spark, tmp_path):
    b0, b1 = _batches(spark)
    r = IncrementalRollup(
        spark,
        str(tmp_path / "bloom"),
        keys=["pos"],
        aggs={"n": F.count(F.lit(1)).cast("long")},
    )
    r.process_batch(bloom.bloom_positions(b0.select("tok"), "tok", 256, 3), 0)
    r.process_batch(bloom.bloom_positions(b1.select("tok"), "tok", 256, 3), 1)
    got = sorted(x.pos for x in r.current().select("pos").collect())
    want = sorted(
        x.pos for x in bloom.bloom_build(b0.unionAll(b1), "tok", 256, 3).collect()
    )
    assert got == want
