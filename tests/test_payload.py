"""Wire-format tests: the Catalyst protobuf codec must produce
byte-exact prost-compatible encodings of EventNotificationMessage
(golden bytes hand-derived from the proto3 spec) and roundtrip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aoseventstreamer_spark.functions import payload as P


def _encode_df(spark, rows):
    df = spark.createDataFrame(rows, "resource int, updated_type int, resource_id string")
    return df.select(
        "resource", "updated_type", "resource_id",
        P.encode_notification("resource", "updated_type", "resource_id").alias("payload"),
    )


def test_golden_bytes(spark):
    # proto3: {resource:1, updated_type:6, resource_id:"res_1"}
    #   -> 08 01 | 10 06 | 1A 05 'res_1'
    out = _encode_df(spark, [(1, 6, "res_1")]).first()["payload"]
    assert out.hex() == "0801" + "1006" + "1a05" + b"res_1".hex()


def test_proto3_defaults_omitted(spark):
    # zero ints and empty strings are not written at all
    assert _encode_df(spark, [(0, 0, "")]).first()["payload"] == b""
    assert _encode_df(spark, [(0, 6, "")]).first()["payload"].hex() == "1006"
    assert _encode_df(spark, [(3, 0, "x")]).first()["payload"].hex() == "0803" + "1a01" + b"x".hex()


def test_two_byte_varint_length(spark):
    rid = "a" * 130  # length 130 -> varint 0x82 0x01
    out = _encode_df(spark, [(1, 6, rid)]).first()["payload"]
    assert out.hex() == "0801" + "1006" + "1a" + "8201" + rid.encode().hex()


@pytest.mark.parametrize(
    "row",
    [(1, 6, "res_1"), (4, 6, "og-uuid-123"), (0, 0, ""), (2, 0, "c1"),
     (5, 3, "x" * 200)],
)
def test_roundtrip(spark, row):
    df = _encode_df(spark, [row])
    back = df.select(P.decode_notification("payload").alias("m")).first()["m"]
    assert (back.resource, back.updated_type, back.resource_id) == row


def test_roundtrip_bulk_on_routed_log(spark):
    """Encode+decode the full routed fan-out of real emits — every
    payload must survive the wire."""
    from aoseventstreamer_spark import schemas
    from aoseventstreamer_spark.operators.routing import route_emits
    from aoseventstreamer_spark.session import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").limit(300)
    raw = ev.select(
        F.col("event_id").alias("emit_id"), F.lit("t").alias("token"),
        ((F.col("event_id") % 4) + 1).cast("int").alias("event_resource"),
        F.concat(F.lit("res_"), F.col("event_id")).alias("resource_id"),
        F.lit(schemas.EVENT_TYPE_ALL).alias("event_type"),
        F.array(F.struct(
            F.concat(F.lit("p"), F.col("user_id")).cast("string").alias("project"),
            F.col("event_type").cast("string").alias("collection"),
            F.lit("so").alias("shared_object"),
            F.array().cast("array<struct<shared_object_group_id:string>>").alias("object_groups"),
        )).alias("relations"),
    )
    routed = route_emits(raw, secret="t")
    coded = routed.select(
        "resource", "updated_type", "resource_id",
        P.decode_notification(
            P.encode_notification("resource", "updated_type", "resource_id")
        ).alias("m"),
    )
    bad = coded.filter(
        (F.col("m.resource") != F.col("resource"))
        | (F.col("m.updated_type") != F.col("updated_type"))
        | (F.col("m.resource_id") != F.col("resource_id"))
    ).count()
    assert bad == 0


from hypothesis import given, settings
from hypothesis import strategies as st


def _py_encode(resource: int, updated: int, rid: str) -> bytes:
    def varint(v: int) -> bytes:
        out = b""
        while True:
            if v < 128:
                return out + bytes([v])
            out += bytes([(v % 128) + 128])
            v //= 128

    out = b""
    if resource:
        out += b"\x08" + varint(resource)
    if updated:
        out += b"\x10" + varint(updated)
    if rid:
        rb = rid.encode()
        out += b"\x1a" + varint(len(rb)) + rb
    return out


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=16383),
            st.integers(min_value=0, max_value=16383),
            st.text(
                alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
                max_size=300,
            ),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=30, deadline=None)
def test_codec_fuzz_matches_python_proto3(spark, data):
    df = spark.createDataFrame(data, "resource int, updated_type int, resource_id string")
    rows = df.select(
        "resource", "updated_type", "resource_id",
        P.encode_notification("resource", "updated_type", "resource_id").alias("p"),
    ).collect()
    for r in rows:
        assert bytes(r.p) == _py_encode(r.resource, r.updated_type, r.resource_id)
    back = df.select(
        "resource", "updated_type", "resource_id",
        P.decode_notification(
            P.encode_notification("resource", "updated_type", "resource_id")
        ).alias("m"),
    ).collect()
    for r in back:
        assert (r.m.resource, r.m.updated_type, r.m.resource_id) == (
            r.resource, r.updated_type, r.resource_id,
        )
