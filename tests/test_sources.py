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


def test_json_quarantine_splits_good_and_bad(spark, tmp_path):
    """Malformed JSON lines must land intact in quarantine — neither
    failing the read nor silently vanishing; good rows parse fully."""
    from pyspark.sql import types as T

    from aoseventstreamer_spark.sources.io import read_json_quarantine

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"event_id": 1, "event_type": "click"}\n'
        "this is not json at all\n"
        '{"event_id": 2, "event_type": "view"}\n'
        '{"event_id": "NOT_A_NUMBER", "event_type": "view"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    good, bad = read_json_quarantine(spark, str(p), schema)
    good_rows = {(r.event_id, r.event_type) for r in good.collect()}
    bad_rows = [r.raw for r in bad.collect()]
    assert good_rows == {(1, "click"), (2, "view")}
    assert len(bad_rows) == 2
    assert "this is not json at all" in bad_rows
    assert any("NOT_A_NUMBER" in b for b in bad_rows)


def test_optimize_zorder_compacts_and_prunes(spark, tmp_path):
    """The OPTIMIZE-ZORDER rewrite keeps directory partitioning AND
    gives footer-stat locality on the clustered columns within each
    partition."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from aoseventstreamer_spark.operators.maintenance import optimize_zorder
    from aoseventstreamer_spark.session import load_table

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ev = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "project_id", (F.col("user_id") % 3).cast("string")
    )
    # many small appends -> many small files (8 appends x 8 tasks)
    for i in range(8):
        ev.filter(F.col("event_id") % 8 == i).repartition(8).write.mode(
            "append"
        ).partitionBy("project_id").parquet(src)
    # cluster on the two CONTINUOUS dimensions (z-order needs domain
    # cardinality to trade between columns; a 5-distinct-value column
    # has nothing to prune)
    rows, parts = optimize_zorder(
        spark, src, dst, cluster_cols=["value", "event_id"], files_per_partition=16
    )
    assert rows == ev.count() and parts == 3
    back = spark.read.parquet(dst)
    assert back.count() == rows  # lossless
    n_src_files = len(glob.glob(src + "/*/*.parquet"))
    n_dst_files = len(glob.glob(dst + "/*/*.parquet"))
    assert n_dst_files < n_src_files / 3  # consolidated (16/dir target)
    # within one partition dir, each clustered column's footer ranges
    # must be prunable: a 25%-of-domain point query (inside the lower
    # z-quadrant on that axis) skips at least half the files
    files = glob.glob(dst + "/project_id=0/*.parquet")
    assert len(files) >= 2
    for col in ("value", "event_id"):
        ranges = []
        for f in files:
            meta = pq.ParquetFile(f).metadata
            idx = meta.schema.names.index(col)
            st = meta.row_group(0).column(idx).statistics
            mn, mx = st.min, st.max
            for rg in range(1, meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                mn, mx = min(mn, st.min), max(mx, st.max)
            ranges.append((mn, mx))
        lo = min(mn for mn, _ in ranges)
        hi = max(mx for _, mx in ranges)
        q = lo + 0.25 * (hi - lo)
        overlapping = [r for r in ranges if r[0] <= q <= r[1]]
        assert len(overlapping) <= max(1, len(ranges) // 2), (col, ranges)


def test_read_binary_media_batch_and_sniff(spark, tmp_path):
    """binaryFile ingest end-to-end on REAL encoder-built blobs: the
    loose-file object-store shape → media frame → content-based
    sniffing recovers what each file actually is, regardless of the
    extension-derived kind hint."""
    import numpy as np

    from aoseventstreamer_spark.functions.mp4 import encode_mp4
    from aoseventstreamer_spark.functions.png import encode_png
    from aoseventstreamer_spark.operators.multimodal import sniff_media
    from aoseventstreamer_spark.sources.io import read_binary_media

    root = tmp_path / "blobs"
    (root / "sub").mkdir(parents=True)
    from aoseventstreamer_spark.functions.audio import encode_flac, encode_mp3

    img = np.zeros((5, 7, 3), dtype=np.uint8)
    (root / "a.png").write_bytes(encode_png(img))
    (root / "sub" / "b.mp4").write_bytes(encode_mp4(640, 360, 1500))
    (root / "sub" / "noise.txt").write_bytes(b"not media")
    (root / "c.flac").write_bytes(encode_flac(48000, 2, 16, 96000))
    (root / "sub" / "d.mp3").write_bytes(
        encode_mp3(5, bitrate_idx=9, samplerate_idx=0)
    )

    media = read_binary_media(spark, str(root))
    rows = {r.path.rsplit("/", 1)[-1]: r for r in media.collect()}
    assert set(rows) == {"a.png", "b.mp4", "noise.txt", "c.flac", "d.mp3"}
    assert rows["a.png"].kind == "image"
    assert rows["b.mp4"].kind == "video"
    assert rows["c.flac"].kind == "audio"
    assert rows["d.mp3"].kind == "audio"
    assert rows["noise.txt"].kind == "binary"
    assert rows["b.mp4"].n_bytes == len(rows["b.mp4"].payload)
    # ids deterministic across re-list
    again = {r.path: r.media_id for r in read_binary_media(spark, str(root)).collect()}
    assert all(again[r.path] == r.media_id for r in rows.values())

    sniffed = {
        r.media_id: r for r in sniff_media(media.select("media_id", "payload")).collect()
    }
    assert sniffed[rows["a.png"].media_id].mime == "image/png"
    assert (sniffed[rows["a.png"].media_id].width,
            sniffed[rows["a.png"].media_id].height) == (7, 5)
    mp4_row = sniffed[rows["b.mp4"].media_id]
    assert (mp4_row.mime, mp4_row.width, mp4_row.height, mp4_row.duration_ms) == (
        "video/mp4", 640, 360, 1500,
    )
    assert sniffed[rows["noise.txt"].media_id].mime is None
    flac_row = sniffed[rows["c.flac"].media_id]
    assert (flac_row.mime, flac_row.duration_ms) == ("audio/flac", 2000)
    mp3_row = sniffed[rows["d.mp3"].media_id]
    assert (mp3_row.mime, mp3_row.duration_ms) == (
        "audio/mpeg", 5 * 1152 * 1000 // 44100,
    )

    # glob prunes at listing time
    only_png = read_binary_media(spark, str(root), glob="*.png")
    assert [r.kind for r in only_png.collect()] == ["image"]


def test_read_binary_media_streaming(spark, tmp_path):
    """The streaming flavor: same schema, availableNow drains the
    directory; a later drop is picked up from the same checkpoint."""
    from aoseventstreamer_spark.functions.mp4 import encode_mp4
    from aoseventstreamer_spark.sources.io import read_binary_media

    root = tmp_path / "stream_blobs"
    root.mkdir()
    (root / "v1.mp4").write_bytes(encode_mp4(320, 240, 1000))
    out: list = []
    stream = read_binary_media(spark, str(root), stream=True)
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: out.extend(df.select("kind", "n_bytes").collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    (root / "v2.mp4").write_bytes(encode_mp4(640, 480, 2000))
    q = (
        read_binary_media(spark, str(root), stream=True)
        .writeStream.foreachBatch(
            lambda df, bid: out.extend(df.select("kind", "n_bytes").collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(out) == 2 and all(r.kind == "video" for r in out)
