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
