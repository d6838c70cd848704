"""Wire-format parity: EventNotificationMessage protobuf encode/decode
as pure Catalyst expressions.

The reference publishes each event as a protobuf-encoded
``EventNotificationMessage { resource: i32 = 1, updated_type: i32 = 2,
resource_id: string = 3 }`` (built at natsio.rs:67-74, decoded at
public_event_server.rs:424-431). Spark's from_protobuf/to_protobuf
needs compiled descriptor files (no protoc in this environment), but
this message is simple enough to codec directly:

    field 1 varint  -> 0x08 <resource>
    field 2 varint  -> 0x10 <updated_type>
    field 3 bytes   -> 0x1A <len> <utf-8 resource_id>

Proto3 semantics are honored: zero-valued ints and empty strings are
omitted entirely. Varints are supported to 2 bytes (values < 16384 —
the enum ranges in the reference are < 10; id lengths < 16384 cover
any realistic resource id). Everything is concat/unhex/conv column
expressions — no UDF, so encode/decode stay in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _byte(val: Column) -> Column:
    """One byte (binary) from an int column in [0, 255]."""
    return F.unhex(F.format_string("%02X", val.cast("int")))


def _varint(val: Column) -> Column:
    """Protobuf varint (binary), 1-2 bytes: values < 16384."""
    v = val.cast("int")
    lo = F.pmod(v, 128)
    hi = (v / 128).cast("int")
    return F.when(v < 128, _byte(v)).otherwise(
        F.concat(_byte(lo + 128), _byte(hi))
    )


def _empty_binary() -> Column:
    return F.unhex(F.lit(""))


def encode_notification(
    resource: Column | str, updated_type: Column | str, resource_id: Column | str
) -> Column:
    """Encode to the reference's wire bytes (natsio.rs:67-74)."""
    r = F.col(resource) if isinstance(resource, str) else resource
    u = F.col(updated_type) if isinstance(updated_type, str) else updated_type
    rid = F.col(resource_id) if isinstance(resource_id, str) else resource_id

    f1 = F.when(r.cast("int") != 0, F.concat(F.unhex(F.lit("08")), _varint(r))).otherwise(
        _empty_binary()
    )
    f2 = F.when(u.cast("int") != 0, F.concat(F.unhex(F.lit("10")), _varint(u))).otherwise(
        _empty_binary()
    )
    rid_bytes = F.encode(rid, "UTF-8")
    f3 = F.when(
        F.length(rid_bytes) > 0,
        F.concat(F.unhex(F.lit("1A")), _varint(F.length(rid_bytes)), rid_bytes),
    ).otherwise(_empty_binary())
    return F.concat(f1, f2, f3)


def _byte_at(payload: Column, pos: Column) -> Column:
    """Int value of the byte at 1-based position pos."""
    return F.conv(F.hex(F.substring(payload, pos, 1)), 16, 10).cast("int")


def decode_notification(payload: Column | str) -> Column:
    """Decode the wire bytes back to a struct
    ``(resource int, updated_type int, resource_id string)`` —
    operator #20 (public_event_server.rs:421-432).

    Walks the three optional fields positionally (they are written in
    tag order by both this encoder and prost). Missing fields decode
    to proto3 defaults (0 / '').
    """
    p = F.col(payload) if isinstance(payload, str) else payload

    def varint_at(pos: Column) -> tuple[Column, Column]:
        b0 = _byte_at(p, pos)
        b1 = _byte_at(p, pos + 1)
        value = F.when(b0 < 128, b0).otherwise((b0 - 128) + b1 * 128)
        width = F.when(b0 < 128, 1).otherwise(2)
        return value, width

    one = F.lit(1)
    # field 1 (tag 0x08)
    has1 = (F.length(p) >= 2) & (_byte_at(p, one) == 0x08)
    v1, w1 = varint_at(one + 1)
    resource = F.when(has1, v1).otherwise(0)
    after1 = F.when(has1, one + 1 + w1).otherwise(one)
    # field 2 (tag 0x10)
    has2 = (F.length(p) >= after1 + 1) & (_byte_at(p, after1) == 0x10)
    v2, w2 = varint_at(after1 + 1)
    updated = F.when(has2, v2).otherwise(0)
    after2 = F.when(has2, after1 + 1 + w2).otherwise(after1)
    # field 3 (tag 0x1A, length-delimited)
    has3 = (F.length(p) >= after2 + 1) & (_byte_at(p, after2) == 0x1A)
    ln, lw = varint_at(after2 + 1)
    rid = F.when(
        has3, F.decode(F.substring(p, after2 + 1 + lw, ln), "UTF-8")
    ).otherwise(F.lit(""))

    return F.struct(
        resource.cast("int").alias("resource"),
        updated.cast("int").alias("updated_type"),
        rid.alias("resource_id"),
    )
