"""SparkSession factory with scale-appropriate defaults.

Local testing runs on local[N]; the config below is chosen so the same
plans hold on a large cluster: AQE for runtime re-planning (skew joins,
coalescing post-shuffle partitions), broadcast threshold for dimension
joins, UTC session timezone so results are engine-portable, and Arrow
for any Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_memory() -> str:
    """Half of detected physical RAM, clamped to [2g, 32g]. The 32g
    ceiling is what the 128 GiB dev box needs for the 500k-doc probes;
    the half-RAM rule keeps the local-mode JVM from being OOM-killed
    (or swapping) on smaller hosts. SPARK_DRIVER_MEMORY overrides."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    total_gib = int(line.split()[1]) / (1024 * 1024)
                    return f"{max(2, min(32, int(total_gib // 2)))}g"
    except OSError:
        pass
    return "8g"


def get_spark(
    app_name: str = "aoseventstreamer-spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    # make the package importable on Python workers regardless of cwd
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    current = os.environ.get("PYTHONPATH", "")
    if pkg_root not in current.split(os.pathsep):
        os.environ["PYTHONPATH"] = pkg_root + os.pathsep + current if current else pkg_root
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE coalescing sizes post-shuffle partitions by BYTES; its
        # default 1m floor serializes small-but-CPU-dense stages (the
        # LSH band buckets explode into C(b,2) pairs, window frames
        # sort, exact percentiles merge — high compute per shuffled
        # byte) onto one task. A 64k floor keeps those stages parallel
        # and is a no-op wherever partitions exceed 1 MiB — i.e. on
        # every data-proportional stage at cluster scale. Override via
        # SPARK_GRAFT_AQE_MIN_PARTITION for clusters whose small-stage
        # task overhead dominates (guide §2.2: prefer fewer, larger
        # partitions once data is the cost).
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Shuffle codec (guide §2.3 "measure both"): zstd halves shuffle
        # bytes on the gram/minhash/span workloads (measured 1.9-2.2x
        # at a 200k-doc amplification, tools/shuffle_codec_probe.py)
        # but local wall time is a wash-to-loss — local[N] shuffles
        # through the page cache, so the byte saving buys nothing and
        # the extra compression CPU shows. Default stays lz4 for local
        # parity with the driver's bench; on a real cluster whose
        # shuffles cross NICs, set SPARK_GRAFT_SHUFFLE_CODEC=zstd —
        # there the ~2x byte cut is network time (guide §1.3 napkin
        # math: shuffle crosses the network once).
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_SHUFFLE_CODEC", "lz4"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # InferFiltersFromGenerate synthesizes `size(e) > 0 AND
        # isnotnull(e)` below every explode/inline — re-evaluating the
        # generator input expression once for the filter and once for
        # the generate (guide §4.4's duplicated-expression trap, in
        # optimizer-rule form). Every exploded array in this engine is
        # COMPUTED in the same stage (shingles, tokens, bands, LSH
        # buckets, routing relations), so the filter can never prune
        # I/O or a shuffle — it only doubles the per-row construction
        # cost of the routing fan-out and the dedup family at any
        # scale. Measured: q_route_emits 0.44 s → 0.33 s at sf0.1;
        # the duplicated work is per-row, so the saving is
        # proportional at 100 TB.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # local mode: the driver heap IS the executor heap for all N
        # task threads. 8g starved 32 threads' hash aggregations at the
        # 500k-doc probe scale (AGGREGATE_OUT_OF_MEMORY) on a 128 GiB
        # box; size for the machine (≤ half physical RAM, capped at
        # 32g so smaller hosts aren't OOM-killed), overridable via env
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY") or _default_driver_memory())
        # Spark's codegen source formatter runs loop-regexes over the
        # generated-Java string; on a wide plan (the protobuf decode +
        # subject parse stream) that string exceeds 1 MiB and the
        # default 1 MiB thread stack dies with StackOverflowError in
        # java.util.regex on the stream-execution thread (observed once
        # under full-box contention). 16 MiB stacks are virtual-only
        # cost and remove the failure mode on both driver and executors.
        .config("spark.driver.extraJavaOptions", "-Xss16m")
        .config("spark.executor.extraJavaOptions", "-Xss16m")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one of the driver-generated parquet tables.

    The generated ``events.parquet`` stores ``ts`` as parquet
    TIMESTAMP(NANOS), which Spark 4 rejects unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is set — we set it at
    session level (works on driver-owned sessions too) and convert the
    resulting nano LongType back to a microsecond timestamp with
    integer ``div`` (a double division would lose microsecond
    precision at 1.7e18 ns).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # timestamp semantics must be engine-portable even on a
    # driver-owned session whose default timezone isn't UTC
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def ensure_parallelism(df, min_partitions: int | None = None, key: str | None = None):
    """Spread per-row compute across the cluster when the scan under-splits.

    A single small parquet file (often one row-group) arrives as ONE
    input partition, so a compute-heavy pipeline (shingling, hashing,
    vector math) runs on one core no matter how wide the cluster is.
    At real scale this never triggers — 100 TB of parquet yields ~10^5
    splits, ``getNumPartitions() >= min_partitions`` and the DataFrame
    is returned untouched, so there is no shuffle on the scale path.
    Streaming DataFrames are returned as-is (no RDD introspection).

    ``key``: when the caller's downstream pipeline aggregates by a
    (near-)unique column, pass it so the forced exchange does double
    duty (guide §2.4 "two operations keyed the same way share one
    exchange"): hash-partitioning by ``key`` lets the later
    groupBy(key) reuse the partitioning instead of paying a second
    exchange, and — unlike round-robin — needs no local pre-sort of
    the input (keyless ``repartition(n)`` sorts every partition first
    so retried tasks re-deal rows identically, SPARK-23207). Only pass
    near-unique keys: a low-cardinality key would funnel the compute
    into few partitions, which is the opposite of what this helper is
    for.
    """
    if df.isStreaming:
        return df
    spark = df.sparkSession
    if min_partitions is None:
        min_partitions = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_partitions:
        if key is not None:
            return df.repartition(min_partitions, key)
        return df.repartition(min_partitions)
    return df
