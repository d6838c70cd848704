"""Regression tests for the round-7 ADVICE findings:

1. (medium) flat-layout (rel='') crash recovery: the root swap's bak
   dir is a SIBLING of the log root, but recover_compaction early-
   returned when the root itself was missing — exactly the state a
   crash between the two renames leaves — so the documented auto-
   recovery contract failed for flat logs.
2. (medium) a log mixing root-level data files with partition
   subdirectories: compacting rel='' renamed the whole base (subdir
   partitions travelled into bak), the straggler loop skips
   directories, and delete(bak) then destroyed every partition's
   data. compact_event_log must refuse the root rewrite there.
3. (low) the two-rename swap has a reader-visible gap — documented in
   the module docstring (no behavior change; asserted on the doc).
4. (low) DemuxRunner's concurrent-delivery contract is now in the
   constructor docstring, not only an inline comment.
5. (low) bloom_semi_reduce used a literal 'bloom' internal column; a
   probe frame already owning 'bloom' was silently dropped.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import compaction as C
from aoseventstreamer_spark.operators.bloom import bloom_semi_reduce


def _write_flat(spark, path, n_files=8):
    spark.range(200).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    ).repartition(n_files).write.mode("overwrite").parquet(path)


def test_flat_layout_interrupted_root_swap_recovers(spark, tmp_path):
    """Simulate the crash window: live root renamed to sibling bak,
    tmp never installed. recover_compaction must restore the root."""
    path = str(tmp_path / "flatlog")
    _write_flat(spark, path)
    before = spark.read.parquet(path).groupBy().sum("v").collect()[0][0]
    fs, jpath, jvm = C._fs(spark, path)
    Path = jvm.org.apache.hadoop.fs.Path
    assert fs.rename(jpath, Path(path + C._BAK_SUFFIX))
    assert not fs.exists(jpath)
    actions = C.recover_compaction(spark, path)
    assert any("restored interrupted root swap" in a for a in actions)
    assert spark.read.parquet(path).groupBy().sum("v").collect()[0][0] == before


def test_flat_layout_completed_root_swap_cleans_bak(spark, tmp_path):
    """Crash AFTER the swap completed (bak not yet deleted): recovery
    must drop the sibling bak and keep the live root."""
    path = str(tmp_path / "flatlog2")
    _write_flat(spark, path)
    fs, jpath, jvm = C._fs(spark, path)
    Path = jvm.org.apache.hadoop.fs.Path
    bak = Path(path + C._BAK_SUFFIX)
    fs.mkdirs(bak)
    tmp = Path(path + C._TMP_SUFFIX)
    fs.mkdirs(tmp)
    actions = C.recover_compaction(spark, path)
    assert any("deleted completed-swap bak" in a for a in actions)
    assert any("deleted stale tmp" in a for a in actions)
    assert not fs.exists(bak) and not fs.exists(tmp) and fs.exists(jpath)


def test_flat_recovery_runs_inside_compact(spark, tmp_path):
    """End-to-end: interrupted root swap, then a plain compact call
    must auto-heal (not fail in listFiles) and produce identical rows."""
    path = str(tmp_path / "flatlog3")
    _write_flat(spark, path, n_files=12)
    before = sorted(
        tuple(r) for r in spark.read.parquet(path).collect()
    )
    fs, jpath, jvm = C._fs(spark, path)
    Path = jvm.org.apache.hadoop.fs.Path
    assert fs.rename(jpath, Path(path + C._BAK_SUFFIX))
    rep = C.compact_event_log(
        spark, path, target_file_bytes=1 << 30, small_file_bytes=1 << 30,
        min_files=2,
    )
    assert rep.filter("compacted").count() == 1
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after == before


def test_mixed_layout_root_refused(spark, tmp_path):
    """Root-level files + partition subdirs: the rel='' rewrite must
    be refused; partition data must survive a full compact run."""
    path = str(tmp_path / "mixed")
    # partitioned body
    spark.range(100).select(
        F.col("id"), (F.col("id") % 3).alias("p")
    ).repartition(6).write.partitionBy("p").mode("overwrite").parquet(path)
    # plus stray root-level data files (malformed but observed layout)
    spark.range(50).select(F.col("id")).repartition(6).write.mode(
        "append"
    ).parquet(path)
    part_rows = sum(
        r[0]
        for r in spark.read.parquet(f"{path}/p=0", f"{path}/p=1", f"{path}/p=2")
        .groupBy().count().collect()
    )
    assert part_rows == 100
    rep = C.compact_event_log(
        spark, path, target_file_bytes=1 << 30, small_file_bytes=1 << 30,
        min_files=2,
    ).collect()
    root_row = [r for r in rep if r.partition == "<root>"]
    assert root_row and root_row[0].compacted is False
    # every partition's rows survived
    assert (
        spark.read.parquet(f"{path}/p=0", f"{path}/p=1", f"{path}/p=2")
        .count()
        == 100
    )


def test_reader_window_documented():
    assert "reader" in C.__doc__.lower() and "window" in C.__doc__.lower()


def test_demux_concurrency_contract_in_constructor_doc():
    from aoseventstreamer_spark.streaming.demux import DemuxRunner

    doc = DemuxRunner.__init__.__doc__ or ""
    assert "thread-safe" in doc and "deliver_concurrency=1" in doc


def test_bloom_semi_reduce_preserves_probe_bloom_column(spark):
    probe = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("b"), F.col("id")).alias("bloom")
    )
    build = spark.range(0, 100, 2).select(F.col("id").alias("k"))
    out = bloom_semi_reduce(probe, build, "k")
    assert "bloom" in out.columns
    rows = out.collect()
    # no false negatives: every even key survives, with its own column
    got = {r.k for r in rows}
    assert set(range(0, 100, 2)) <= got
    assert all(r.bloom == f"b{r.k}" for r in rows)


def test_bloom_semi_reduce_rejects_internal_name_collision(spark):
    probe = spark.range(4).select(
        F.col("id").alias("k"), F.lit(0).alias("__bloom_bits")
    )
    build = spark.range(4).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="__bloom_bits"):
        bloom_semi_reduce(probe, build, "k")
