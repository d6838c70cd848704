"""tablelog round-8b surface: RESTORE, CHECK constraints, and the
rebase-aware optimistic-concurrency commit (``_commit_or_rebase``).

The concurrency tests pin down a real hazard the pre-fix code had:
DML/OPTIMIZE derived their rewrite at one snapshot but committed
without ``expected_version``, so a commit landing in between was
silently overwritten — a concurrent OPTIMIZE compacting the same
files would resurrect a DELETE's removed rows (the compacted group
still contains them) while the DELETE's survivor rewrite duplicated
the rest. The fix classifies a lost race: disjoint commits rebase
(metadata-only retry), same-file commits force a full re-derive."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aoseventstreamer_spark.tablelog import (
    CommitConflict,
    ConcurrentModification,
    ConstraintViolation,
    TableLog,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _ranged(spark, path, n_appends=3, rows_per=40, **kw):
    log = TableLog(spark, path, **kw)
    for i in range(n_appends):
        log.append(
            spark.range(i * rows_per, (i + 1) * rows_per)
            .select("id", (F.col("id") % 5).alias("v"))
            .coalesce(1)
        )
    return log


# ---------- RESTORE ----------


def test_restore_rolls_back_dml(spark, tmp_path):
    log = _ranged(spark, str(tmp_path / "r"))
    v0 = log.latest_version()
    before = _rows(log.read())
    log.delete_where([("v", "=", 2)])
    log.update_where([("v", "=", 3)], {"v": "v * 10"})
    assert _rows(log.read()) != before
    res = log.restore(v0)
    assert res["restored_version"] == v0
    assert res["version"] == log.latest_version()
    # rolled back bit-exactly, as one NEW commit (history preserved)
    assert _rows(log.read()) == before
    ops = [
        r["operation"]
        for r in log.history().orderBy("version").collect()
    ]
    assert ops[-1] == "RESTORE" and "DELETE" in ops and "UPDATE" in ops
    # time travel to the in-between (post-DELETE) version still works
    vd = v0 + 1
    assert len(_rows(log.read(version=vd))) == len(
        [t for t in before if t[1] != 2]
    )


def test_restore_moves_only_rewritten_files(spark, tmp_path):
    log = _ranged(spark, str(tmp_path / "m"))
    v0 = log.latest_version()
    # the delete touches exactly one of the three files
    log.delete_where([("id", "=", 5)])
    res = log.restore(v0)
    # diff-based: only the file DELETE rewrote moves back, plus the
    # survivor file it added goes away
    assert res["files_added"] == 1 and res["files_removed"] == 1


def test_restore_roundtrip_forward(spark, tmp_path):
    log = _ranged(spark, str(tmp_path / "f"))
    v0 = log.latest_version()
    log.delete_where([("v", "=", 0)])
    v_del = log.latest_version()
    after_delete = _rows(log.read())
    log.restore(v0)
    # a restore can itself be rolled forward again
    log.restore(v_del)
    assert _rows(log.read()) == after_delete


def test_restore_noop_and_bounds(spark, tmp_path):
    log = _ranged(spark, str(tmp_path / "n"))
    head = log.latest_version()
    res = log.restore(head)
    assert res["files_added"] == 0 and res["version"] == head
    with pytest.raises(ValueError, match="table is at"):
        log.restore(head + 5)


def test_restore_refused_past_vacuum(spark, tmp_path):
    log = _ranged(spark, str(tmp_path / "v"))
    v0 = log.latest_version()
    log.delete_where([("v", "=", 1)])
    # sweep the pre-delete files immediately (retain head only)
    log.vacuum(retain_versions=1, min_age_seconds=0.0)
    with pytest.raises(ValueError, match="VACUUM"):
        log.restore(v0)


def test_restore_appears_in_cdf_as_row_deltas(spark, tmp_path):
    log = _ranged(spark, str(tmp_path / "c"), n_appends=1)
    v0 = log.latest_version()
    log.delete_where([("id", "=", 7)])
    v_del = log.latest_version()
    log.restore(v0)
    v_res = log.latest_version()
    ch = log.read_changes(v_del, v_res)
    # survivors cancel: the restore surfaces ONLY row 7 coming back
    assert _rows(ch.select("id", "v", "_change_type")) == [
        (7, 2, "insert")
    ]


# ---------- CHECK constraints ----------


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    log = _ranged(spark, str(tmp_path / "a"))
    log.add_constraint("v_range", "v BETWEEN 0 AND 4")
    assert log.constraints() == {"v_range": "v BETWEEN 0 AND 4"}
    with pytest.raises(ConstraintViolation) as ei:
        log.add_constraint("impossible", "id >= 40")
    assert ei.value.violations == {"impossible": 40}
    # idempotent re-add is a no-op; conflicting redefinition refused
    v = log.latest_version()
    assert log.add_constraint("v_range", "v BETWEEN 0 AND 4") == v
    with pytest.raises(ValueError, match="already exists"):
        log.add_constraint("v_range", "v >= 0")


def test_append_enforces_constraints(spark, tmp_path):
    log = _ranged(spark, str(tmp_path / "e"))
    log.add_constraint("v_nonneg", "v >= 0")
    v = log.latest_version()
    before = _rows(log.read())
    bad = spark.createDataFrame([(999, -1)], "id long, v long").coalesce(1)
    with pytest.raises(ConstraintViolation) as ei:
        log.append(bad)
    assert ei.value.violations == {"v_nonneg": 1}
    # table unchanged, no version burned
    assert log.latest_version() == v
    assert _rows(log.read()) == before
    # a valid append still goes through
    log.append(spark.createDataFrame([(999, 1)], "id long, v long").coalesce(1))
    assert log.read().count() == len(before) + 1


def test_constraint_null_passes_sql_semantics(spark, tmp_path):
    log = TableLog(spark, str(tmp_path / "nl"))
    log.append(
        spark.createDataFrame([(1, 10)], "id long, v long").coalesce(1)
    )
    log.add_constraint("v_big", "v > 5")
    # NULL is unknown, and SQL CHECK passes unknown
    log.append(
        spark.createDataFrame(
            [(2, None)], "id long, v long"
        ).coalesce(1)
    )
    assert log.read().count() == 2
    # NOT NULL is the explicit spelling — the NULL row now violates
    with pytest.raises(ConstraintViolation):
        log.add_constraint("v_notnull", "v IS NOT NULL")


def test_update_and_merge_enforce_constraints(spark, tmp_path):
    log = _ranged(spark, str(tmp_path / "u"), n_appends=1)
    log.add_constraint("v_nonneg", "v >= 0")
    before = _rows(log.read())
    with pytest.raises(ConstraintViolation):
        log.update_where([("v", "=", 2)], {"v": "-1"})
    assert _rows(log.read()) == before
    src = spark.createDataFrame([(0, -7)], "id long, v long")
    with pytest.raises(ConstraintViolation):
        log.merge_into(src, on=["id"])
    assert _rows(log.read()) == before
    # compliant update passes
    log.update_where([("v", "=", 2)], {"v": "4"})
    assert log.read().filter("v = 2").count() == 0


def test_drop_constraint_reopens_writes(spark, tmp_path):
    log = _ranged(spark, str(tmp_path / "d"), n_appends=1)
    log.add_constraint("v_nonneg", "v >= 0")
    bad = spark.createDataFrame([(99, -1)], "id long, v long").coalesce(1)
    with pytest.raises(ConstraintViolation):
        log.append(bad)
    log.drop_constraint("v_nonneg")
    assert log.constraints() == {}
    log.append(bad)
    assert log.read().filter("v = -1").count() == 1
    # dropping an unknown name is a no-op
    v = log.latest_version()
    assert log.drop_constraint("nope") == v


def test_constraints_survive_checkpoint_replay(spark, tmp_path):
    # checkpoint_interval=3: the constraint commit is followed by
    # enough appends that replay starts AT a checkpoint manifest — the
    # re-embedded map must still be visible to a fresh handle
    log = TableLog(spark, str(tmp_path / "k"), checkpoint_interval=3)
    log.append(spark.range(5).select("id", F.lit(1).alias("v")).coalesce(1))
    log.add_constraint("v_pos", "v > 0")
    for i in range(6):
        log.append(
            spark.range(5).select("id", F.lit(2 + i).alias("v")).coalesce(1)
        )
    fresh = TableLog(spark, str(tmp_path / "k"), checkpoint_interval=3)
    assert fresh.constraints() == {"v_pos": "v > 0"}
    with pytest.raises(ConstraintViolation):
        fresh.append(
            spark.createDataFrame([(1, 0)], "id long, v long").coalesce(1)
        )


# ---------- optimistic concurrency ----------


def test_rebase_over_disjoint_commits(spark, tmp_path):
    path = str(tmp_path / "rb")
    log = _ranged(spark, path)
    base = log.latest_version()
    files = [e["path"] for e in log.snapshot_files(base)]
    # a concurrent writer appends AFTER we resolved our snapshot
    other = TableLog(spark, path)
    other.append(
        spark.range(1000, 1010)
        .select("id", F.lit(9).alias("v"))
        .coalesce(1)
    )
    # our commit removes a file the append did not touch → rebases,
    # no ConcurrentModification, lands after the append
    v = log._commit_or_rebase(
        base, added=[], removed=[files[0]], data_change=True
    )
    assert v == base + 2
    live = {e["path"] for e in log.snapshot_files()}
    assert files[0] not in live and len(live) == 3  # 2 old + appended


def test_conflict_on_same_file(spark, tmp_path):
    path = str(tmp_path / "cf")
    log = _ranged(spark, path)
    base = log.latest_version()
    files = [e["path"] for e in log.snapshot_files(base)]
    # the concurrent writer REWRITES (removes) a file we also remove
    other = TableLog(spark, path)
    other.commit(added=[], removed=[files[1]], data_change=True)
    with pytest.raises(ConcurrentModification, match="touched by"):
        log._commit_or_rebase(
            base, added=[], removed=[files[1]], data_change=True
        )


def test_conflict_on_concurrent_constraint_change(spark, tmp_path):
    path = str(tmp_path / "cc")
    log = _ranged(spark, path)
    base = log.latest_version()
    files = [e["path"] for e in log.snapshot_files(base)]
    other = TableLog(spark, path)
    other.add_constraint("v_range", "v BETWEEN 0 AND 4")
    # our write was validated under the OLD constraint set → re-derive
    with pytest.raises(ConcurrentModification, match="constraints"):
        log._commit_or_rebase(
            base, added=[], removed=[files[0]], data_change=True
        )


class _RacingLog(TableLog):
    """Injects a concurrent commit exactly in the lost-update window:
    after the DML derived its snapshot and wrote its rewrite, before
    its commit."""

    def __init__(self, spark, path, race):
        super().__init__(spark, path)
        self._race = race
        self.rewrites = 0

    def _write_rewrite(self, df, pcols):
        added = super()._write_rewrite(df, pcols)
        self.rewrites += 1
        if self._race is not None:
            race, self._race = self._race, None
            race()
        return added


def test_delete_rederives_across_concurrent_optimize(spark, tmp_path):
    """The round-8 regression: OPTIMIZE compacts the table while a
    DELETE is mid-flight. Pre-fix, the DELETE's commit silently rebased
    onto the optimize — removing files the optimize had already
    replaced and re-adding its stale survivor rewrite, so the deleted
    rows came back through the compacted group AND the survivors were
    duplicated. Post-fix the DELETE re-derives and the final table is
    exactly (all rows) minus (deleted rows), once each."""
    path = str(tmp_path / "race")
    _ranged(spark, path, n_appends=4, rows_per=25)
    other = TableLog(spark, path)
    log = _RacingLog(spark, path, race=lambda: other.optimize(min_files=1))
    res = log.delete_where([("v", "=", 3)])
    assert res["rows_deleted"] == 20
    # the re-derive actually happened (two rewrite rounds)
    assert log.rewrites == 2
    df = log.read()
    assert df.filter("v = 3").count() == 0
    # no duplicated survivors: every remaining id exactly once
    assert df.count() == 80 and df.select("id").distinct().count() == 80
    ops = [r["operation"] for r in log.history().orderBy("version").collect()]
    assert ops[-2:] == ["OPTIMIZE", "DELETE"]


def test_update_rederives_across_concurrent_delete(spark, tmp_path):
    path = str(tmp_path / "race2")
    _ranged(spark, path, n_appends=2, rows_per=25)
    other = TableLog(spark, path)
    log = _RacingLog(
        spark, path, race=lambda: other.delete_where([("v", "=", 1)])
    )
    log.update_where([("v", "=", 2)], {"v": "20"})
    df = log.read()
    # both effects present, serialized delete-then-update
    assert df.filter("v = 1").count() == 0
    assert df.filter("v = 2").count() == 0
    assert df.filter("v = 20").count() == 10
    assert df.count() == 40


def test_read_pins_snapshot_once(spark, tmp_path):
    """read() must resolve latest_version exactly once — schema and
    file-set resolution re-resolving independently would let a commit
    landing in between hand back one snapshot's schema with another's
    files (round-8 self-review finding)."""

    class _Counting(TableLog):
        calls = 0

        def latest_version(self):
            _Counting.calls += 1
            return super().latest_version()

    log = _ranged(spark, str(tmp_path / "pin"), n_appends=1)
    clog = _Counting(spark, str(tmp_path / "pin"))
    _Counting.calls = 0
    clog.read().count()
    assert _Counting.calls == 1
    _Counting.calls = 0
    clog.read(where=[("v", "=", 1)]).count()
    assert _Counting.calls == 1
