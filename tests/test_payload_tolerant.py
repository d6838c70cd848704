"""Tolerant protobuf decode: prost (public_event_server.rs:424-431)
accepts fields in any order, skips unknown fields, and reads full-width
varints. ``with_decoded_notification`` must match that behavior on
foreign payloads; the fast positional decoder must handle full-width
varints on self-produced (tag-ordered) payloads.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aoseventstreamer_spark.functions import payload as P


def _varint(v: int) -> bytes:
    out = b""
    while True:
        if v < 128:
            return out + bytes([v])
        out += bytes([(v % 128) + 128])
        v //= 128


def _field(no: int, wire: int, body: bytes) -> bytes:
    return _varint((no << 3) | wire) + body


def _decode_df(spark, payloads: list[bytes]):
    df = spark.createDataFrame([(i, p) for i, p in enumerate(payloads)], "i int, payload binary")
    return (
        P.with_decoded_notification(df, "payload", "m")
        .orderBy("i")
        .select("m.resource", "m.updated_type", "m.resource_id")
        .collect()
    )


def test_out_of_order_fields(spark):
    # 3, 1, 2 order — positionally invalid, must still decode
    wire = (
        _field(3, 2, _varint(5) + b"res_9")
        + _field(1, 0, _varint(4))
        + _field(2, 0, _varint(6))
    )
    [(r, u, rid)] = _decode_df(spark, [wire])
    assert (r, u, rid) == (4, 6, "res_9")


def test_unknown_fields_are_skipped(spark):
    wire = (
        _field(4, 0, _varint(300))  # unknown varint field 4
        + _field(1, 0, _varint(2))
        + _field(5, 2, _varint(3) + b"abc")  # unknown bytes field
        + _field(2, 0, _varint(6))
        + _field(6, 1, bytes(8))  # unknown fixed64
        + _field(3, 2, _varint(2) + b"ok")
        + _field(7, 5, bytes(4))  # unknown fixed32
    )
    [(r, u, rid)] = _decode_df(spark, [wire])
    assert (r, u, rid) == (2, 6, "ok")


def test_multibyte_tag_unknown_field(spark):
    # field 1000 -> tag varint is 2 bytes
    wire = _field(1000, 0, _varint(7)) + _field(1, 0, _varint(3))
    [(r, u, rid)] = _decode_df(spark, [wire])
    assert (r, u, rid) == (3, 0, "")


def test_last_occurrence_wins(spark):
    wire = (
        _field(1, 0, _varint(1))
        + _field(3, 2, _varint(1) + b"a")
        + _field(1, 0, _varint(5))
        + _field(3, 2, _varint(1) + b"b")
    )
    [(r, u, rid)] = _decode_df(spark, [wire])
    assert (r, u, rid) == (5, 0, "b")


def test_full_width_varints(spark):
    big = (1 << 28) + 17  # needs a 5-byte varint
    wire = _field(1, 0, _varint(big)) + _field(2, 0, _varint(1 << 21))
    [(r, u, rid)] = _decode_df(spark, [wire])
    assert (r, u) == (big, 1 << 21)


def test_empty_and_null_payloads(spark):
    df = spark.createDataFrame([(0, b""), (1, None)], "i int, payload binary")
    rows = (
        P.with_decoded_notification(df, "payload", "m")
        .orderBy("i")
        .select("m.resource", "m.updated_type", "m.resource_id")
        .collect()
    )
    assert [tuple(r) for r in rows] == [(0, 0, ""), (0, 0, "")]


def test_group_wire_type_stops_walk_keeping_prior_fields(spark):
    wire = _field(1, 0, _varint(9)) + _field(8, 3, b"") + _field(2, 0, _varint(4))
    [(r, u, rid)] = _decode_df(spark, [wire])
    assert r == 9
    assert u == 0  # after the group tag the walk stops


def test_positional_decoder_full_varint_length(spark):
    # resource_id longer than 16383 bytes -> 3-byte length varint; the
    # fast positional decoder must handle it (round 1 capped at 2 bytes)
    rid = "x" * 20000
    df = spark.createDataFrame([(1, 6, rid)], "resource int, updated_type int, resource_id string")
    back = df.select(
        P.decode_notification(
            P.encode_notification("resource", "updated_type", "resource_id")
        ).alias("m")
    ).first()["m"]
    assert (back.resource, back.updated_type, back.resource_id) == (1, 6, rid)


def test_encode_full_varint_bytes(spark):
    big = (1 << 30) + 5
    df = spark.createDataFrame([(big,)], "resource int")
    out = df.select(
        P.encode_notification("resource", F.lit(0), F.lit("")).alias("p")
    ).first()["p"]
    assert bytes(out) == _field(1, 0, _varint(big))


@given(
    messages=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 31) - 1),
            st.integers(min_value=0, max_value=(1 << 31) - 1),
            st.text(
                alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
                max_size=60,
            ),
            st.randoms(use_true_random=False),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=20, deadline=None)
def test_tolerant_fuzz_shuffled_fields_with_unknowns(spark, messages):
    """Random messages, shuffled field order, interleaved unknown
    fields — tolerant decode must recover exactly the known fields."""
    payloads, expected = [], []
    for res, upd, rid, rng in messages:
        fields = []
        if res:
            fields.append(_field(1, 0, _varint(res)))
        if upd:
            fields.append(_field(2, 0, _varint(upd)))
        if rid:
            rb = rid.encode()
            fields.append(_field(3, 2, _varint(len(rb)) + rb))
        # up to 3 unknown fields of random wire types
        for _ in range(rng.randint(0, 3)):
            no = rng.randint(4, 200)
            wt = rng.choice([0, 1, 2, 5])
            body = {
                0: _varint(rng.randint(0, 1 << 40)),
                1: bytes(8),
                2: _varint(4) + b"zzzz",
                5: bytes(4),
            }[wt]
            fields.append(_field(no, wt, body))
        rng.shuffle(fields)
        payloads.append(b"".join(fields))
        expected.append((res, upd, rid))
    got = [tuple(r) for r in _decode_df(spark, payloads)]
    assert got == expected


def test_tolerant_matches_positional_on_selfproduced(spark):
    """On tag-ordered self-produced payloads both decoders agree."""
    rows = [(i % 6, (i * 7) % 9, f"res_{i}" * (i % 4)) for i in range(64)]
    df = spark.createDataFrame(rows, "resource int, updated_type int, resource_id string")
    enc = df.select(
        "resource", "updated_type", "resource_id",
        P.encode_notification("resource", "updated_type", "resource_id").alias("payload"),
    )
    both = P.with_decoded_notification(enc, "payload", "tol").select(
        "resource", "updated_type", "resource_id",
        "tol", P.decode_notification("payload").alias("fast"),
    )
    bad = both.filter(
        (F.col("tol.resource") != F.col("fast.resource"))
        | (F.col("tol.updated_type") != F.col("fast.updated_type"))
        | (F.col("tol.resource_id") != F.col("fast.resource_id"))
        | (F.col("fast.resource") != F.col("resource"))
        | (F.col("fast.updated_type") != F.col("updated_type"))
        | (F.col("fast.resource_id") != F.col("resource_id"))
    ).count()
    assert bad == 0


def test_tolerant_plan_has_no_python_eval(spark):
    df = spark.createDataFrame([(b"\x08\x01",)], "payload binary")
    plan = P.with_decoded_notification(df, "payload", "m")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
