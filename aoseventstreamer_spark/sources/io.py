"""Source/sink layer (reference operators #1/#10/#16 generalized).

The reference's only I/O is gRPC-in → NATS subject-publish → gRPC-out.
The engine generalizes both ends to the formats a Spark deployment
actually meets: parquet (canonical event log), csv/json (interchange),
and a file-based streaming source/sink pair. Everything funnels
through declared schemas — no inference in production paths — so
plans stay stable and pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BATCH_FORMATS = {"parquet", "csv", "json", "orc", "tablelog"}


def _ensure_tablelog(spark: SparkSession) -> None:
    from aoseventstreamer_spark.sources.tablelog_source import (
        register_tablelog_source,
    )

    register_tablelog_source(spark)


def read_batch(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    **options,
) -> DataFrame:
    if fmt not in _BATCH_FORMATS:
        raise ValueError(f"unsupported source format: {fmt}")
    if fmt == "tablelog":
        # snapshot-isolated manifest read; schema comes from the log
        _ensure_tablelog(spark)
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(f"{fmt} sources require an explicit schema (no inference)")
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path)


def write_batch(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "append",
    partition_by: tuple[str, ...] | None = None,
    **options,
) -> None:
    if fmt not in _BATCH_FORMATS:
        raise ValueError(f"unsupported sink format: {fmt}")
    if fmt == "tablelog":
        # transactional sink: append commits one snapshot; overwrite
        # swaps the whole live file set in ONE commit (no directory
        # overwrite, no reader-visible empty window)
        from aoseventstreamer_spark.tablelog import TableLog

        log = TableLog(df.sparkSession, path)
        pby = list(partition_by) if partition_by else None
        if mode == "append":
            log.append(df, partition_by=pby)
        elif mode == "overwrite":
            log.overwrite(df, partition_by=pby)
        else:
            raise ValueError(f"tablelog sink supports append/overwrite, not {mode}")
        return
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).save(path)


def read_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    fmt: str = "parquet",
    max_files_per_trigger: int = 64,
    **options,
) -> DataFrame:
    """Streaming source (the event-log tail). For FILE formats an
    explicit schema is mandatory (streaming sources cannot infer) and
    offsets are file paths — compacting consumed regions re-delivers
    them (operators/compaction.py docstring). ``fmt="tablelog"``
    streams snapshot diffs instead: schema comes from the manifest,
    offsets are snapshot versions, and OPTIMIZE commits are invisible
    to the tail (sources/tablelog_source.py)."""
    if fmt == "tablelog":
        _ensure_tablelog(spark)
        reader = spark.readStream.format(fmt)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.options(**options).load(path)
    if schema is None:
        raise ValueError(f"{fmt} streaming sources require an explicit schema")
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .options(**options)
        .load(path)
    )


def write_stream(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    trigger: dict | None = None,
    partition_by: tuple[str, ...] | None = None,
    txn_app: str | None = None,
):
    """Append-mode streaming sink with checkpointed progress.

    ``fmt="tablelog"`` is the EXACTLY-ONCE sink: each micro-batch
    commits one snapshot stamped with ``(txn_app, batchId)``
    (tablelog.append's idempotent-writer contract), so the batch a
    restart replays — Structured Streaming re-runs any batch whose
    sink side-effect may or may not have happened — is recognized by
    its stamp and skipped instead of appended twice. ``txn_app``
    defaults to a checkpoint-derived id (unique per query); pass it
    explicitly when two queries share a checkpoint layout. File
    formats stay at-least-once-file / exactly-once-row only via
    Spark's own _spark_metadata, which tablelog replaces."""
    if fmt == "tablelog":
        from aoseventstreamer_spark.tablelog import TableLog

        app = txn_app or f"tablelog-sink:{checkpoint.rstrip('/')}"
        pby = list(partition_by) if partition_by else None
        # ONE TableLog across batches: its optimistic commit base
        # (last committed version) then skips the per-batch head
        # resolution — on an object-store log that is 3 fewer
        # round-trips per micro-batch; a concurrent writer just costs
        # one CAS loss + re-resolve
        log = TableLog(df.sparkSession, path)

        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            log.append(
                batch_df, partition_by=pby, txn_app=app, txn_version=batch_id
            )

        writer = (
            df.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
        )
        writer = writer.trigger(
            **(trigger or {"processingTime": "250 milliseconds"})
        )
        return writer.start()
    writer = (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer = writer.trigger(**(trigger or {"processingTime": "250 milliseconds"}))
    return writer.start()


# ---------------------------------------------------------------------------
# Broker (Kafka) source/sink — the reference's actual substrate shape.
#
# The reference sits on a message broker (NATS JetStream,
# /root/reference/src/stream_handler/natsio.rs:24-58: one stream,
# durable filtered consumers); the engine's canonical deployment
# equivalently tails a Kafka topic. The wire mapping mirrors
# natsio.rs:67-74 exactly: record KEY = the routing subject (what the
# broker filters/partitions on), record VALUE = the protobuf-encoded
# EventNotificationMessage. Offsets/timestamps supply the seq/ts the
# reference leaves unset (public_event_server.rs:427-429).
#
# The adapters are pure DataFrame transforms, so the full encode →
# wire → decode contract is testable with ANY source shaped like the
# Kafka wire schema (the unit tests inject a rate-source-derived
# frame); read_broker_stream/write_broker_stream only glue them to
# ``format("kafka")`` plus the same checkpoint semantics as the file
# path. Connection options (see docs/SCALE.md): kafka.bootstrap.servers,
# subscribe, startingOffsets, maxOffsetsPerTrigger, kafka.security.*.
# ---------------------------------------------------------------------------

#: What ``format("kafka")`` yields (and what to_broker_records must
#: produce for the sink, key/value only).
BROKER_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)


def to_broker_records(df: DataFrame) -> DataFrame:
    """Routed events → broker records: key = subject (UTF-8), value =
    reference-wire protobuf bytes (natsio.rs:67-74). Pure projection —
    whole-stage codegen, no Python."""
    from aoseventstreamer_spark.functions import payload as P

    return df.select(
        F.encode(F.col("subject"), "UTF-8").alias("key"),
        P.encode_notification("resource", "updated_type", "resource_id").alias(
            "value"
        ),
    )


def from_broker_records(df: DataFrame) -> DataFrame:
    """Broker records → ROUTED_EVENTS_SCHEMA: subject from the key,
    hierarchy components re-derived from the subject grammar
    (subjects.parse_subject_col), event fields decoded from the
    protobuf value, seq/ts from the broker's offset/timestamp —
    exactly how a reference consumer reconstructs an event."""
    from aoseventstreamer_spark import schemas
    from aoseventstreamer_spark.functions import payload as P
    from aoseventstreamer_spark.functions import subjects as S

    subject = F.col("key").cast("string")
    parts = S.parse_subject_col(subject)
    msg = P.decode_notification(F.col("value"))
    out = df.select(
        subject.alias("subject"),
        parts["project_id"].alias("project_id"),
        parts["collection_id"].alias("collection_id"),
        parts["kind"].alias("kind"),
        parts["shared_id"].alias("shared_id"),
        parts["leaf_id"].alias("leaf_id"),
        msg["resource"].alias("resource"),
        msg["updated_type"].alias("updated_type"),
        msg["resource_id"].alias("resource_id"),
        F.col("offset").alias("seq"),
        F.col("timestamp").alias("ts"),
    )
    # exact declared types, independent of the wire frame's casts
    return out.select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in schemas.ROUTED_EVENTS_SCHEMA.fields
        ]
    )


def read_broker_stream(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str,
    starting_offsets: str = "earliest",
    injected: DataFrame | None = None,
    **options,
) -> DataFrame:
    """Streaming read of routed events from a Kafka topic — the broker
    counterpart of ``read_stream`` over the file log; downstream code
    (stream groups, demux, engine facade) sees the identical
    ROUTED_EVENTS_SCHEMA either way, and the caller's writeStream
    checkpoint provides the durable-consumer semantics.

    ``starting_offsets='earliest'`` is the default deliberately: it is
    the reference's replay-from-start contract (natsio.rs:176-182 —
    a new consumer receives the full retained history).

    ``injected`` substitutes any frame in BROKER_WIRE_SCHEMA for the
    Kafka scan (no broker runs in CI) — the decode contract is
    identical; only the physical source differs."""
    if injected is not None:
        wire = injected
    else:
        wire = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .options(**options)
            .load()
        )
    return from_broker_records(wire)


def write_broker_stream(
    df: DataFrame,
    topic: str,
    bootstrap_servers: str,
    checkpoint: str,
    trigger: dict | None = None,
    **options,
):
    """Streaming publish of routed events to a Kafka topic — the fan-out
    write (natsio.rs:131-147) with the same checkpoint semantics as the
    file sink: the committed offset is the ack; a failed batch replays
    (at-least-once, matching the reference's swallow-and-redeliver)."""
    writer = (
        to_broker_records(df)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .options(**options)
    )
    return writer.trigger(
        **(trigger or {"processingTime": "250 milliseconds"})
    ).start()


def read_json_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """Ingest JSON-lines with corrupt-record quarantine: returns
    (good, quarantined). Malformed lines land — raw and intact — in
    the quarantine frame instead of failing the job or silently
    dropping (at 100 TB some records are ALWAYS malformed; losing them
    silently corrupts downstream counts, failing the job loses the
    day). PERMISSIVE mode keeps the scan a single pass: parse errors
    populate the corrupt column, and the split is two filters over one
    cached read.

    Implemented as a text scan + ``from_json`` rather than the JSON
    datasource's corrupt-column mode: the datasource forbids filtering
    on its corrupt column straight off the scan (Spark requires
    caching the parent, which then stays pinned for the session),
    whereas ``from_json``'s output is an ordinary struct column — one
    pass, two narrow filters, nothing cached. The corrupt-capture
    field declared inside the from_json schema catches BOTH unparseable
    lines and type mismatches (a string where a long is declared)."""
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    raw = spark.read.text(path).select(F.col("value").alias("raw"))
    parsed = raw.withColumn(
        "__rec",
        F.from_json(
            F.col("raw"),
            full_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ),
    )
    ok = F.col("__rec").isNotNull() & F.col(f"__rec.{corrupt_col}").isNull()
    good = parsed.filter(ok).select("__rec.*").drop(corrupt_col)
    bad = parsed.filter(~ok).select("raw")
    return good, bad


_MEDIA_EXT_KIND = {
    "png": "image", "jpg": "image", "jpeg": "image", "gif": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "mov": "video", "webm": "video", "mkv": "video",
    "avi": "video",
}


def read_binary_media(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
    stream: bool = False,
) -> DataFrame:
    """Ingest raw media blobs via Spark's built-in ``binaryFile``
    source — how image/audio/video actually enters a 100 TB pipeline
    (object-store prefixes of loose files, not parquet). Emits the
    repo's media-frame shape: (media_id, kind, payload, path,
    n_bytes, mod_time), ready for sniff_media / extract_video_meta /
    the decode operators (operators/multimodal.py).

    - media_id = xxhash64(path): deterministic, join-stable across
      reruns, independent of listing order.
    - kind derives from the file extension (unknown → 'binary');
      it is a routing hint only — sniff_media types by CONTENT.
    - payload bytes go executor-side only (binaryFile reads on the
      workers; nothing passes through the driver).
    - ``stream=True`` returns the streaming flavor (binaryFile is a
      file-stream source): same schema, maxFilesPerTrigger et al. via
      the normal writeStream trigger controls.

    Scale notes: binaryFile caps single files at
    spark.sql.sources.binaryFile.maxLength (int32 max) — larger blobs
    belong in chunked storage anyway; pathGlobFilter prunes at LISTING
    time, before any read."""
    opts = {"recursiveFileLookup": str(recursive).lower()}
    if glob:
        opts["pathGlobFilter"] = glob
    reader = (
        spark.readStream if stream else spark.read
    ).format("binaryFile").options(**opts)
    if stream:
        # streaming file sources require a declared schema; binaryFile's
        # is fixed by the format
        reader = reader.schema(
            T.StructType(
                [
                    T.StructField("path", T.StringType()),
                    T.StructField("modificationTime", T.TimestampType()),
                    T.StructField("length", T.LongType()),
                    T.StructField("content", T.BinaryType()),
                ]
            )
        )
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    kind_map = F.create_map(
        *[F.lit(x) for kv in _MEDIA_EXT_KIND.items() for x in kv]
    )
    return raw.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        F.coalesce(kind_map[ext], F.lit("binary")).alias("kind"),
        F.col("content").alias("payload"),
        F.col("path"),
        F.col("length").alias("n_bytes"),
        F.col("modificationTime").alias("mod_time"),
    )
