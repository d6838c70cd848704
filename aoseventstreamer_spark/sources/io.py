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

_BATCH_FORMATS = {"parquet", "csv", "json", "orc"}


def read_batch(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    **options,
) -> DataFrame:
    if fmt not in _BATCH_FORMATS:
        raise ValueError(f"unsupported source format: {fmt}")
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
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).save(path)


def read_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int = 64,
    **options,
) -> DataFrame:
    """File-based streaming source (the event-log tail). An explicit
    schema is mandatory: streaming sources cannot infer."""
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
):
    """Append-mode streaming file sink with checkpointed progress."""
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
