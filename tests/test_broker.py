"""Broker (Kafka) source/sink abstraction: the wire adapters must
roundtrip routed events exactly (key = subject, value = reference
protobuf bytes, seq/ts from offset/timestamp), and the streaming read
path must deliver the identical ROUTED_EVENTS_SCHEMA when any
wire-shaped source is injected (no broker runs in CI — the Kafka scan
and the injected frame share the decode plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aoseventstreamer_spark import schemas
from aoseventstreamer_spark.operators.routing import route_emits
from aoseventstreamer_spark.sources import io as IO


def _routed(spark, n=8):
    raw = spark.createDataFrame(
        [
            {
                "emit_id": i,
                "token": "t",
                "event_resource": schemas.RESOURCE_COLLECTION,
                "resource_id": f"c{i}",
                "event_type": schemas.EVENT_TYPE_ALL,
                "relations": [
                    {
                        "project": f"p{i % 2}",
                        "collection": None,
                        "shared_object": None,
                        "object_groups": [],
                    }
                ],
            }
            for i in range(n)
        ],
        schemas.RAW_EMITS_SCHEMA,
    )
    return route_emits(raw, secret="t")


def test_broker_records_roundtrip_exact(spark):
    routed = _routed(spark)
    wire = IO.to_broker_records(routed).select(
        "key",
        "value",
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
    )
    back = IO.from_broker_records(wire)
    assert [f.name for f in back.schema.fields] == [
        f.name for f in schemas.ROUTED_EVENTS_SCHEMA.fields
    ]
    a = {
        (r.subject, r.project_id, r.collection_id, r.kind, r.shared_id,
         r.leaf_id, r.resource, r.updated_type, r.resource_id)
        for r in routed.collect()
    }
    b = {
        (r.subject, r.project_id, r.collection_id, r.kind, r.shared_id,
         r.leaf_id, r.resource, r.updated_type, r.resource_id)
        for r in back.collect()
    }
    assert a == b
    # seq comes from the broker offset, not the routing pipeline
    offsets = {r.offset for r in wire.select("offset").collect()}
    assert {r.seq for r in back.collect()} == offsets


def test_broker_stream_injected_source(spark, tmp_path):
    """read_broker_stream with an injected wire-shaped STREAMING source
    (rate source → wire columns) delivers decoded routed events through
    the same foreachBatch/checkpoint contract as the file path."""
    from aoseventstreamer_spark.functions import payload as P
    from aoseventstreamer_spark.functions import subjects as S

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "50")
        .option("numPartitions", "2")
        .load()
    )
    wire = rate.select(
        F.encode(
            S.publish_subject_col(
                [F.lit("p1"), F.concat(F.lit("c"), F.col("value"))]
            ),
            "UTF-8",
        ).alias("key"),
        P.encode_notification(
            F.lit(schemas.RESOURCE_COLLECTION).cast("int"),
            F.lit(schemas.EVENT_TYPE_ALL).cast("int"),
            F.concat(F.lit("c"), F.col("value")),
        ).alias("value"),
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("value").alias("offset"),
        F.col("timestamp"),
    )
    decoded = IO.read_broker_stream(
        spark, topic="events", bootstrap_servers="unused:9092", injected=wire
    )
    assert decoded.isStreaming
    assert [f.name for f in decoded.schema.fields] == [
        f.name for f in schemas.ROUTED_EVENTS_SCHEMA.fields
    ]
    got: list = []

    def deliver(batch_df, batch_id):
        got.extend(batch_df.collect())

    q = (
        decoded.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        while time.time() < deadline and len(got) < 5:
            time.sleep(0.25)
    finally:
        q.stop()
    assert len(got) >= 5
    r = next(x for x in got if x.seq is not None)
    assert r.project_id == "p1"
    assert r.resource == schemas.RESOURCE_COLLECTION
    assert r.resource_id == f"c{r.seq}"  # offset == rate value by construction
    assert r.subject.startswith("UPDATES.STORAGE._.p1._.c")


def test_write_broker_stream_wires_kafka_sink(spark, tmp_path):
    """Without a broker (or the Kafka connector jars) the sink start
    must fail with the Kafka data source missing / connection error —
    proving the wiring targets format('kafka') and not a silent no-op."""
    routed = _routed(spark)
    mem = spark.readStream.format("rate").load().select(
        F.lit("s._").alias("subject"),
        F.lit(1).cast("int").alias("resource"),
        F.lit(1).cast("int").alias("updated_type"),
        F.lit("r").alias("resource_id"),
    )
    with pytest.raises(Exception) as exc:
        q = IO.write_broker_stream(
            mem,
            topic="events",
            bootstrap_servers="localhost:9092",
            checkpoint=str(tmp_path / "ck2"),
        )
        q.awaitTermination(10)
        q.stop()
    msg = str(exc.value).lower()
    assert "kafka" in msg
