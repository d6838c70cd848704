"""Source/sink roundtrips: every supported format preserves the routed
event log; the streaming sink + source pair moves data end-to-end."""

from __future__ import annotations

import pytest

from aoseventstreamer_spark import schemas, sources
from aoseventstreamer_spark.operators.routing import route_emits


@pytest.fixture(scope="module")
def routed(spark):
    raw = spark.createDataFrame(
        [
            {
                "emit_id": i,
                "token": "t",
                "event_resource": schemas.RESOURCE_COLLECTION,
                "resource_id": f"c{i}",
                "event_type": schemas.EVENT_TYPE_ALL,
                "relations": [
                    {"project": f"p{i % 2}", "collection": None,
                     "shared_object": None, "object_groups": []}
                ],
            }
            for i in range(10)
        ],
        schemas.RAW_EMITS_SCHEMA,
    )
    return route_emits(raw, secret="t").cache()


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_batch_roundtrip(spark, tmp_path, routed, fmt):
    path = str(tmp_path / fmt)
    sources.write_batch(routed, path, fmt=fmt, mode="overwrite")
    back = sources.read_batch(spark, path, fmt=fmt, schema=schemas.ROUTED_EVENTS_SCHEMA)
    assert back.count() == routed.count()
    assert sorted(r.subject for r in back.collect()) == sorted(
        r.subject for r in routed.collect()
    )


def test_schema_required_for_text_formats(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        sources.read_batch(spark, str(tmp_path), fmt="csv")
    with pytest.raises(ValueError, match="unsupported"):
        sources.read_batch(spark, str(tmp_path), fmt="avro")


def test_partitioned_write(spark, tmp_path, routed):
    path = str(tmp_path / "part")
    sources.write_batch(
        routed, path, mode="overwrite", partition_by=("project_id",)
    )
    dirs = {p.name for p in (tmp_path / "part").iterdir() if p.is_dir()}
    assert {"project_id=p0", "project_id=p1"} <= dirs


def test_stream_source_to_sink(spark, tmp_path, routed):
    src = str(tmp_path / "in")
    dst = str(tmp_path / "out")
    sources.write_batch(routed, src, mode="overwrite")
    stream = sources.read_stream(spark, src, schemas.ROUTED_EVENTS_SCHEMA)
    q = sources.write_stream(
        stream, dst, checkpoint=str(tmp_path / "ckpt"), trigger={"availableNow": True}
    )
    q.awaitTermination(120)
    assert spark.read.parquet(dst).count() == routed.count()


def test_compaction_consolidates_small_files(spark, tmp_path, routed):
    """Many appends -> many small files; compaction rewrites to ~1 file
    per partition dir with identical contents."""
    import glob

    from aoseventstreamer_spark.operators.maintenance import compact_event_log

    src = str(tmp_path / "frag")
    for _ in range(6):  # six appends -> many files per partition
        sources.write_batch(routed, src, partition_by=("project_id",))
    files_before = glob.glob(f"{src}/project_id=p0/*.parquet")
    assert len(files_before) >= 6

    dst = str(tmp_path / "compact")
    rows, parts = compact_event_log(spark, src, dst)
    assert rows == routed.count() * 6 and parts == 2
    files_after = glob.glob(f"{dst}/project_id=p0/*.parquet")
    assert len(files_after) <= 2
    assert spark.read.parquet(dst).count() == rows


def test_rate_source_continuous_routing(spark, tmp_path):
    """Continuous pipeline: rate source -> synthesized emits -> full
    routing -> delivery; proves the write path runs as a stream."""
    import time

    from pyspark.sql import functions as F

    from aoseventstreamer_spark.operators.routing import subjects_for_relation

    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", "200").load()
    )
    raw = rate.select(
        F.col("value").alias("emit_id"),
        F.lit(1).cast("int").alias("event_resource"),
        F.concat(F.lit("p"), F.col("value") % 5).alias("resource_id"),
        F.struct(
            F.concat(F.lit("p"), F.col("value") % 5).cast("string").alias("project"),
            F.lit(None).cast("string").alias("collection"),
            F.lit(None).cast("string").alias("shared_object"),
            F.array().cast("array<struct<shared_object_group_id:string>>").alias("object_groups"),
        ).alias("relation"),
    )
    routed_stream = raw.select(
        "emit_id",
        F.inline(
            subjects_for_relation(
                F.col("event_resource"), F.col("resource_id"), F.col("relation")
            )
        ),
    )
    got = []
    q = (
        routed_stream.writeStream.foreachBatch(lambda df, bid: got.append(df.count()))
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    time.sleep(8)
    q.stop()
    assert sum(got) > 100  # events flowed continuously
