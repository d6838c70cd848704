"""Metadata-only aggregation over the tablelog manifest: COUNT(*) and
MIN/MAX answered from per-file stats with zero scan (the Delta/Iceberg
metadata-only query). The contract under test: a non-None answer is
always EXACT (equal to the scan), and anything not provable returns
None instead of a wrong number."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from aoseventstreamer_spark.tablelog import TableLog, _file_all_match


def _mk(spark, tmp_path, name="t"):
    log = TableLog(spark, str(tmp_path / name))
    # three files with disjoint id ranges and a constant-per-file tag
    for i, tag in enumerate(["a", "b", "c"]):
        log.append(
            spark.range(i * 100, (i + 1) * 100)
            .select(
                "id",
                F.lit(tag).alias("tag"),
                F.when(F.col("id") % 10 == 0, None)
                .otherwise(F.col("id") * 2)
                .alias("v"),
            )
            .coalesce(1)
        )
    return log


def test_unfiltered_count_is_exact(spark, tmp_path):
    log = _mk(spark, tmp_path)
    assert log.metadata_count() == 300 == log.read().count()


def test_file_aligned_equality_count(spark, tmp_path):
    log = _mk(spark, tmp_path)
    # tag is constant per file: min==max proves ALL rows match
    assert log.metadata_count(where=[("tag", "=", "b")]) == 100
    assert log.metadata_count(where=[("tag", "=", "zzz")]) == 0
    # disjoint id ranges: a range covering whole files is provable
    assert log.metadata_count(where=[("id", "<", 200)]) == 200
    assert log.metadata_count(where=[("id", ">=", 100)]) == 200
    assert (
        log.metadata_count(where=[("id", ">=", 100), ("tag", "=", "b")])
        == 100
    )


def test_partial_file_returns_none_not_wrong(spark, tmp_path):
    log = _mk(spark, tmp_path)
    # cuts through the middle of file 0: not provable from stats
    got = log.metadata_count(where=[("id", "<", 50)])
    assert got is None
    assert log.read(where=[("id", "<", 50)]).count() == 50


def test_null_predicates(spark, tmp_path):
    log = _mk(spark, tmp_path)
    # v is null on every 10th id — not provable either way per file
    assert log.metadata_count(where=[("v", "isnull")]) is None
    # but id has no nulls at all: notnull proves ALL per file
    assert log.metadata_count(where=[("id", "notnull")]) == 300


def test_count_tracks_dml(spark, tmp_path):
    log = _mk(spark, tmp_path)
    log.delete_where([("tag", "=", "b")])
    assert log.metadata_count() == 200 == log.read().count()
    assert log.metadata_count(where=[("tag", "=", "b")]) == 0


def test_count_without_stats_returns_none(spark, tmp_path):
    log = TableLog(spark, str(tmp_path / "nostats"), stats_columns=[])
    log.append(spark.range(10).coalesce(1))
    assert log.metadata_count() is None  # no num_rows recorded


def test_min_max_from_metadata(spark, tmp_path):
    log = _mk(spark, tmp_path)
    assert log.metadata_min_max("id") == (0, 299)
    assert log.metadata_min_max("tag") == ("a", "c")
    # v: every file has non-null rows, bounds present → provable
    assert log.metadata_min_max("v") == (2, 598)


def test_min_max_decodes_dates(spark, tmp_path):
    log = TableLog(spark, str(tmp_path / "dates"))
    log.append(
        spark.range(5)
        .select(
            F.date_add(F.lit("2024-03-01").cast("date"), F.col("id").cast("int"))
            .alias("d")
        )
        .coalesce(1)
    )
    assert log.metadata_min_max("d") == (
        datetime.date(2024, 3, 1),
        datetime.date(2024, 3, 5),
    )


def test_all_match_startswith_prefix_rule():
    stats = {
        "num_rows": 4,
        "min": {"s": "proj.a"},
        "max": {"s": "proj.z"},
        "null_count": {"s": 0},
    }
    assert _file_all_match(stats, "s", "startswith", "proj.")
    assert not _file_all_match(stats, "s", "startswith", "proj.a")
    stats["null_count"]["s"] = 1
    assert not _file_all_match(stats, "s", "startswith", "proj.")


# ---------- manifest log retention ----------


def test_expire_manifests_keeps_replayable_window(spark, tmp_path):
    from aoseventstreamer_spark.tablelog import TableLog

    log = TableLog(spark, str(tmp_path / "exp"), checkpoint_interval=10)
    for i in range(25):
        log.append(spark.range(i * 10, (i + 1) * 10).coalesce(1))
    head = log.latest_version()
    assert head == 25
    expired = log.expire_manifests(retain_versions=5)
    # newest checkpoint <= 21 is version 20; everything below goes
    assert expired == list(range(1, 20))
    assert log._list_versions()[0] == 20
    # head reads and retained time travel replay from the checkpoint
    assert log.read().count() == 250
    assert log.read(version=21).count() == 210
    assert log.read(version=20).count() == 200
    # expired history fails LOUDLY, never an empty table
    import pytest as _pytest

    with _pytest.raises(ValueError, match="retained log"):
        log.read(version=5)
    with _pytest.raises(ValueError, match="retained log"):
        log.restore(5)
    with _pytest.raises(ValueError, match="retained log"):
        log.read_changes(3)
    # read_changes within the window still works
    assert log.read_changes(20).count() == 50
    # appends keep working and the next expiry advances the anchor
    log.append(spark.range(1000, 1010).coalesce(1))
    assert log.read().count() == 260


def test_expire_manifests_noop_without_checkpoint_below_cutoff(spark, tmp_path):
    from aoseventstreamer_spark.tablelog import TableLog

    log = TableLog(spark, str(tmp_path / "exp2"), checkpoint_interval=10)
    for i in range(5):
        log.append(spark.range(i * 10, (i + 1) * 10).coalesce(1))
    # no checkpoint exists at or below the cutoff: nothing deleted
    assert log.expire_manifests(retain_versions=2) == []
    assert log._list_versions()[0] == 1
    assert log.read(version=1).count() == 10


def test_native_source_refuses_expired_snapshot(spark, tmp_path):
    from aoseventstreamer_spark.sources.tablelog_source import (
        register_tablelog_source,
    )
    from aoseventstreamer_spark.tablelog import TableLog

    register_tablelog_source(spark)
    log = TableLog(spark, str(tmp_path / "nsx"), checkpoint_interval=5)
    for i in range(12):
        log.append(spark.range(i * 10, (i + 1) * 10).coalesce(1))
    log.expire_manifests(retain_versions=3)
    assert log._list_versions()[0] == 10
    native = (
        spark.read.format("tablelog")
        .option("snapshotVersion", "4")
        .load(log.path)
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="retained log"):
        native.count()
    ok = (
        spark.read.format("tablelog")
        .option("snapshotVersion", "10")
        .load(log.path)
    )
    assert ok.count() == 100


# ---------- column migrations (honest full rewrites) ----------


def test_rename_column_roundtrip(spark, tmp_path):
    from aoseventstreamer_spark.tablelog import TableLog

    log = TableLog(spark, str(tmp_path / "rn"))
    df = spark.range(50).select(
        "id", (F.col("id") % 2).alias("p"), (F.col("id") * 3).alias("x")
    )
    log.append(df, partition_by=["p"])
    v0 = log.latest_version()
    log.rename_column("x", "value")
    out = log.read()
    assert set(out.columns) == {"id", "p", "value"}
    assert sorted(r.value for r in out.collect()) == sorted(
        i * 3 for i in range(50)
    )
    # time travel still sees the OLD name
    assert set(log.read(version=v0).columns) == {"id", "p", "x"}
    # partition-column rename moves the hive dirs too
    log.rename_column("p", "bucket")
    assert all("bucket=" in e["path"] for e in log.snapshot_files())
    assert log.read().filter(F.col("bucket") == 1).count() == 25
    # appends follow the new layout/schema
    log.append(
        spark.range(50, 60).select(
            "id", (F.col("id") % 2).alias("bucket"),
            (F.col("id") * 3).alias("value"),
        ),
        partition_by=["bucket"],
    )
    assert log.read().count() == 60


def test_drop_column_and_constraint_refusal(spark, tmp_path):
    import pytest as _pytest

    from aoseventstreamer_spark.tablelog import TableLog

    log = TableLog(spark, str(tmp_path / "dc"))
    log.append(
        spark.range(20).select("id", (F.col("id") * 2).alias("x")).coalesce(1)
    )
    log.add_constraint("pos", "x >= 0")
    with _pytest.raises(ValueError, match="CHECK constraints"):
        log.rename_column("x", "y")
    with _pytest.raises(ValueError, match="CHECK constraints"):
        log.drop_column("x")
    log.drop_constraint("pos")
    log.drop_column("x")
    assert log.read().columns == ["id"]
    assert log.read().count() == 20
    with _pytest.raises(ValueError, match="only column"):
        log.drop_column("id")


def test_not_equal_clause(spark, tmp_path):
    """!= across the whole clause surface: row filter, file pruning
    (a constant no-null file prunes; anything else survives), and
    metadata_count all-match (range excludes the literal)."""
    from aoseventstreamer_spark.tablelog import TableLog

    log = TableLog(spark, str(tmp_path / "ne"))
    # file A: constant tag 'a' (prunable for != 'a'); B: mixed
    log.append(
        spark.range(10).select("id", F.lit("a").alias("tag")).coalesce(1)
    )
    log.append(
        spark.range(10, 20).select(
            "id", F.when(F.col("id") < 15, "a").otherwise("b").alias("tag")
        ).coalesce(1)
    )
    got = log.read(where=[("tag", "!=", "a")])
    assert sorted(r.id for r in got.collect()) == list(range(15, 20))
    kept, total = log.pruned_files([("tag", "!=", "a")])
    assert total == 2 and len(kept) == 1  # constant-'a' file pruned
    # SQL semantics: NULL never matches !=
    log2 = TableLog(spark, str(tmp_path / "nn"))
    log2.append(
        spark.range(6).select(
            "id", F.when(F.col("id") < 3, F.col("id")).alias("m")
        ).coalesce(1)
    )
    assert log2.read(where=[("m", "!=", 1)]).count() == 2  # 0 and 2
    res = log2.delete_where([("m", "!=", 1)])
    assert res["rows_deleted"] == 2
    assert log2.read().count() == 4  # nulls and the ==1 row survive
    # metadata_count: all-match when the file range excludes the value
    log3 = TableLog(spark, str(tmp_path / "nm"))
    log3.append(spark.range(0, 50).select("id").coalesce(1))
    log3.append(spark.range(100, 150).select("id").coalesce(1))
    assert log3.metadata_count(where=[("id", "!=", 75)]) == 100
    assert log3.metadata_count(where=[("id", "!=", 10)]) is None


def test_or_groups_in_where(spark, tmp_path):
    """A conjunct may be a LIST of clauses = their OR: row filter,
    file skipping (dropped only when every branch is provably empty),
    metadata_count (ALL when some branch all-matches per file), and
    DML all accept the same grammar."""
    from aoseventstreamer_spark.tablelog import TableLog

    log = TableLog(spark, str(tmp_path / "or"))
    for lo, hi, tag in [(0, 50, "a"), (100, 150, "b"), (200, 250, "c")]:
        log.append(
            spark.range(lo, hi).select(
                "id", F.lit(tag).alias("tag")
            ).coalesce(1)
        )
    disj = [[("id", "<", 50), ("id", ">=", 200)]]
    got = log.read(where=disj)
    assert sorted(r.id for r in got.collect()) == list(range(0, 50)) + list(
        range(200, 250)
    )
    kept, total = log.pruned_files(disj)
    assert total == 3 and len(kept) == 2  # the middle file pruned
    # metadata-only: both surviving files all-match one branch each
    assert log.metadata_count(where=disj) == 100
    # mixed with a conjunct; and an OR that cuts mid-file is UNKNOWN
    assert log.metadata_count(
        where=[[("tag", "=", "a"), ("tag", "=", "c")], ("id", ">=", 0)]
    ) == 100
    assert (
        log.metadata_count(where=[[("id", "<", 25), ("id", ">=", 200)]])
        is None
    )
    # DML through the same grammar
    res = log.delete_where([[("tag", "=", "a"), ("tag", "=", "c")]])
    assert res["rows_deleted"] == 100
    assert log.read().count() == 50
    assert {r.tag for r in log.read().select("tag").distinct().collect()} == {
        "b"
    }
