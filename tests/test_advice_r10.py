"""Regression tests for the round-9 ADVICE findings (fixed round 10):

1. (high) HadoopLogStore.write_atomic serialized commits through
   Hadoop ``createNewFile``, whose default implementation on
   RawLocalFileSystem is a NON-atomic exists-then-create — two
   same-version committers could both acquire the lock, both pass the
   exists(dst) check, and the second rename silently overwrote the
   first manifest (a lost commit; observed as an intermittent
   test_parquet_mode_concurrent_appends failure). On ``file:`` paths
   the lock now routes through the same ``O_CREAT|O_EXCL`` open
   ``PythonFSLogStore`` uses (one lock file, one atomic primitive for
   both committer families); ``createNewFile`` remains only for HDFS,
   where it is namenode-atomic.
2. (low) resolve_state's last-resort fallback replayed the full
   version list when every parquet checkpoint sidecar was unreadable;
   after expire_manifests the retained manifests carry no 'full'
   embed, so the fold silently started from an EMPTY base at
   vs[0] > 1 and returned a wrong, near-empty live set. It now raises
   ValueError ('no replayable checkpoint anchor'), mirroring the
   'predates the retained log' refusal.
3. (low) _HIVE_ESCAPE omitted '^', which Spark's
   ExternalCatalogUtils.charToEscape does escape — native-writer hive
   dir names for partition values containing '^' differed byte-wise
   from Spark-written layouts. '^' is now in the escape set.
"""

from __future__ import annotations

import json
import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from aoseventstreamer_spark.logstore import (
    CommitConflict,
    HadoopLogStore,
    PythonFSLogStore,
    _acquire_excl_lock,
    checkpoint_name,
    checkpoint_versions,
)
from aoseventstreamer_spark.tablelog import TableLog


# ---------------------------------------------------------------- 1


def test_excl_lock_times_out_while_held(tmp_path):
    lock = str(tmp_path / ".commit.lock")
    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.close(fd)
    with pytest.raises(CommitConflict):
        _acquire_excl_lock(lock, timeout=0.2)


def test_excl_lock_steals_stale_lock(tmp_path):
    lock = str(tmp_path / ".commit.lock")
    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.close(fd)
    old = time.time() - 120.0  # past _LOCK_STALE_SECONDS=60
    os.utime(lock, (old, old))
    _acquire_excl_lock(lock, timeout=2.0)  # must steal, not raise
    assert os.path.exists(lock)  # re-created by the stealer


def test_hadoop_logstore_routes_local_lock_through_o_excl(spark, tmp_path):
    """On a file: path the JVM store must take the O_EXCL lock (the
    createNewFile default impl is exists-then-create on local FS), so
    a lock file held by a PYTHON committer blocks the JVM committer —
    proof both families serialize on one primitive."""
    store = HadoopLogStore(spark, str(tmp_path / "t"))
    assert store._local_log_dir is not None  # local scheme detected
    os.makedirs(store._local_log_dir, exist_ok=True)
    lock = os.path.join(store._local_log_dir, ".commit.lock")
    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.close(fd)
    done: list[int] = []

    def commit():
        store.write_atomic(1, {"actions": [], "v": 1})
        done.append(1)

    t = threading.Thread(target=commit)
    t.start()
    time.sleep(0.3)
    assert not done  # blocked behind the Python-held O_EXCL lock
    os.unlink(lock)  # release
    t.join(timeout=10)
    assert done and store.exists(1)


def test_mixed_family_same_version_race_exactly_one_winner(spark, tmp_path):
    """8 threads, alternating HadoopLogStore / PythonFSLogStore on one
    table dir, all committing version 1: exactly one manifest must
    land and the others must see CommitConflict."""
    path = str(tmp_path / "t")
    stores = [
        HadoopLogStore(spark, path) if i % 2 == 0 else PythonFSLogStore(path)
        for i in range(8)
    ]
    wins, losses = [], []
    barrier = threading.Barrier(len(stores))

    def run(i):
        barrier.wait()
        try:
            stores[i].write_atomic(1, {"actions": [], "writer": i})
            wins.append(i)
        except CommitConflict:
            losses.append(i)

    ts = [threading.Thread(target=run, args=(i,)) for i in range(len(stores))]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=60)
    assert len(wins) == 1 and len(losses) == len(stores) - 1
    # the surviving manifest is the winner's, not a silent overwrite
    assert stores[0].read(1)["writer"] == wins[0]


# ---------------------------------------------------------------- 2


def test_resolve_state_refuses_unanchored_replay(spark, tmp_path):
    """Parquet-mode table, history expired, every checkpoint sidecar
    destroyed: reads must raise (no replayable anchor), never return
    a near-empty live set."""
    path = str(tmp_path / "t")
    log = TableLog(
        spark, path, checkpoint_interval=3, checkpoint_format="parquet"
    )
    for i in range(8):  # versions 1..8; checkpoints at 3 and 6
        log.append(spark.range(5).select((F.col("id") + i * 5).alias("id")))
    assert log.expire_manifests(retain_versions=3)  # drops < anchor 6
    full = log._replay(log.latest_version())[0]
    n_live = len(full)
    assert n_live > 0
    # destroy every parquet sidecar (simulate torn/corrupt objects)
    for v in checkpoint_versions(log._log):
        log._log.delete_aux(checkpoint_name(v))
    log2 = TableLog(
        spark, path, checkpoint_interval=3, checkpoint_format="parquet"
    )
    with pytest.raises(ValueError, match="no replayable checkpoint anchor"):
        log2._replay(log2.latest_version())


def test_resolve_state_fallback_still_replays_from_version_one(
    spark, tmp_path
):
    """Same sabotage but with NO expiry: the log still starts at
    version 1, so the unseeded fold from empty is CORRECT and must
    succeed (the refusal is only for truncated logs)."""
    path = str(tmp_path / "t")
    log = TableLog(
        spark, path, checkpoint_interval=3, checkpoint_format="parquet"
    )
    for i in range(7):
        log.append(spark.range(4).select((F.col("id") + i * 4).alias("id")))
    expected = {p for p in log._replay(log.latest_version())[0]}
    for v in checkpoint_versions(log._log):
        log._log.delete_aux(checkpoint_name(v))
    log2 = TableLog(
        spark, path, checkpoint_interval=3, checkpoint_format="parquet"
    )
    got = set(log2._replay(log2.latest_version())[0])
    assert got == expected


# ---------------------------------------------------------------- 3


def test_hive_escape_matches_spark_charToEscape_for_caret():
    from aoseventstreamer_spark.sources.tablelog_source import (
        _escape_hive,
        _unescape_hive,
    )

    assert _escape_hive("a^b") == "a%5Eb"
    assert _unescape_hive("a%5Eb") == "a^b"


def test_native_writer_caret_partition_matches_spark_layout(spark, tmp_path):
    """A partition value containing '^' must land in a directory name
    byte-identical to what Spark's own hive-layout writer produces."""
    df = spark.createDataFrame([("x^y", 1), ("plain", 2)], ["k", "v"])
    spark_dir = str(tmp_path / "spark")
    df.write.partitionBy("k").parquet(spark_dir)
    spark_dirs = sorted(
        d for d in os.listdir(spark_dir) if d.startswith("k=")
    )
    from aoseventstreamer_spark.sources.tablelog_source import _hive_dir

    ours = sorted(_hive_dir(["k"], (k,)) for k in ("x^y", "plain"))
    assert ours == spark_dirs
