"""Multi-writer stress probe for the tablelog commit protocol.

What it measures (local[32], one JVM, threads sharing the session —
the same contention shape as N jobs on a cluster hitting one table's
log directory):

A. BLIND APPENDS: W concurrent writer threads, each committing K
   appends to ONE table. Every commit must land (final version =
   W*K), every row exactly once. Counts version-CAS losses (rebases)
   — with `_commit_or_rebase` a lost race costs ONE manifest
   re-list + re-rename, never a parquet job re-run.

B. DISJOINT DML: W threads each DELETE a disjoint id range
   concurrently. File overlap forces ConcurrentModification →
   re-derive; the final table must equal the serial result exactly
   (no resurrected rows, no duplicated survivors) regardless of the
   interleaving.

C. OPTIMIZE UNDER APPEND FIRE: one thread compacts in a loop while
   appenders run. OPTIMIZE rebases over appends (disjoint) and
   re-runs on ConcurrentModification; the final row multiset must be
   unchanged by any number of compactions.

All three probes run twice: on the default HDFS/local rename-CAS
committer AND on the S3-semantics object-store committer
(conditional-PUT CAS, no rename anywhere in the store API — see
logstore.py) — proving the commit protocol refuses lost updates under
BOTH storage families.

Usage: python tools/tablelog_concurrency_probe.py [writers] [appends]
"""

from __future__ import annotations

import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aoseventstreamer_spark import get_spark  # noqa: E402
from aoseventstreamer_spark.logstore import (  # noqa: E402
    LocalEmulatedObjectStore,
    ObjectStoreLogStore,
    PyArrowFSObjectStore,
)
from aoseventstreamer_spark.tablelog import (  # noqa: E402
    CommitConflict,
    ConcurrentModification,
    TableLog,
)


def _mk_default(spark, path):
    return TableLog(spark, path)


def _mk_objectstore(spark, path):
    """S3-semantics committer: manifests live in a sibling 'bucket'
    (flat keys, conditional PUT as the only atomic primitive)."""
    return TableLog(
        spark,
        path,
        log_store=ObjectStoreLogStore(
            LocalEmulatedObjectStore(path + "-objbucket")
        ),
    )


def _mk_pyarrow_objectstore(spark, path):
    """Same conditional-PUT committer, but through pyarrow.fs — an
    externally maintained filesystem implementation, so the probe's
    pass no longer rests on two in-repo emulations sharing an
    assumption (r9 verdict item 1)."""
    return TableLog(
        spark,
        path,
        log_store=ObjectStoreLogStore(
            PyArrowFSObjectStore.subtree(path + "-pabucket")
        ),
    )


MODES = {
    "hdfs-rename-cas": _mk_default,
    "s3-conditional-put": _mk_objectstore,
    "s3-conditional-put-pyarrowfs": _mk_pyarrow_objectstore,
}


class _CountingLog(TableLog):
    """TableLog that counts version-CAS losses and re-derives."""

    conflicts = 0
    rederives = 0
    _lock = threading.Lock()

    def _write_manifest(self, version, doc):
        try:
            return super()._write_manifest(version, doc)
        except CommitConflict:
            with _CountingLog._lock:
                _CountingLog.conflicts += 1
            raise


def probe_appends(spark, writers: int, appends: int, mk=_mk_default) -> dict:
    path = tempfile.mkdtemp(prefix="tl_conc_a_")
    rows_per = 100
    errs: list[Exception] = []
    _CountingLog.conflicts = 0

    def work(w: int):
        base_log = mk(spark, path)
        log = _CountingLog(spark, path, log_store=base_log._log)
        for k in range(appends):
            base = (w * appends + k) * rows_per
            df = spark.range(base, base + rows_per).selectExpr(
                "id", "id % 7 AS v"
            ).coalesce(1)
            try:
                log.append(df)
            except Exception as e:  # pragma: no cover - surfaced below
                errs.append(e)

    t0 = time.time()
    ts = [threading.Thread(target=work, args=(w,)) for w in range(writers)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    wall = time.time() - t0
    log = mk(spark, path)
    n = log.read().count()
    distinct = log.read().select("id").distinct().count()
    expect = writers * appends * rows_per
    ok = (
        not errs
        and log.latest_version() == writers * appends
        and n == expect
        and distinct == expect
    )
    return {
        "writers": writers,
        "appends_each": appends,
        "commits": log.latest_version(),
        "rows": n,
        "cas_losses": _CountingLog.conflicts,
        "wall_s": round(wall, 2),
        "ok": ok,
        "errs": [repr(e) for e in errs[:3]],
    }


def probe_disjoint_dml(spark, writers: int, mk=_mk_default) -> dict:
    path = tempfile.mkdtemp(prefix="tl_conc_d_")
    total = writers * 200
    log = mk(spark, path)
    # interleaved layout: file j holds ids ≡ j (mod writers), so every
    # contiguous id-range delete touches EVERY file — all concurrent
    # deletes collide on their touched sets and losers MUST re-derive
    for j in range(writers):
        log.append(
            spark.range(0, total)
            .filter(f"id % {writers} = {j}")
            .selectExpr("id", "id % 7 AS v")
            .coalesce(1)
        )
    errs: list[Exception] = []

    def work(w: int):
        # each writer deletes a disjoint id slice, but the interleaved
        # file layout makes every slice touch every file
        lg = mk(spark, path)
        lo = w * 200 + 50
        try:
            lg.delete_where([("id", ">=", lo), ("id", "<", lo + 100)])
        except Exception as e:
            errs.append(e)

    t0 = time.time()
    ts = [threading.Thread(target=work, args=(w,)) for w in range(writers)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    wall = time.time() - t0
    kept = sorted(r[0] for r in log.read().select("id").collect())
    want = [
        i
        for i in range(total)
        if not any(w * 200 + 50 <= i < w * 200 + 150 for w in range(writers))
    ]
    return {
        "writers": writers,
        "deleted_each": 100,
        "rows_left": len(kept),
        "exact": kept == want,
        "wall_s": round(wall, 2),
        "errs": [repr(e) for e in errs[:3]],
    }


def probe_optimize_under_appends(
    spark, appenders: int, appends: int, mk=_mk_default
) -> dict:
    path = tempfile.mkdtemp(prefix="tl_conc_o_")
    log = mk(spark, path)
    log.append(spark.range(0, 50).selectExpr("id", "id % 7 AS v").coalesce(1))
    stop = threading.Event()
    opt_runs = {"ok": 0, "rederived": 0}
    errs: list[Exception] = []

    def optimizer():
        lg = mk(spark, path)
        while not stop.is_set():
            try:
                lg.optimize(min_files=2, small_file_bytes=1 << 30)
                opt_runs["ok"] += 1
            except ConcurrentModification:
                opt_runs["rederived"] += 1
            except Exception as e:
                errs.append(e)
            time.sleep(0.05)

    def appender(w: int):
        lg = mk(spark, path)
        for k in range(appends):
            base = 1000 + (w * appends + k) * 100
            try:
                lg.append(
                    spark.range(base, base + 100)
                    .selectExpr("id", "id % 7 AS v")
                    .coalesce(1)
                )
            except Exception as e:
                errs.append(e)

    opt = threading.Thread(target=optimizer)
    ts = [threading.Thread(target=appender, args=(w,)) for w in range(appenders)]
    t0 = time.time()
    opt.start()
    [t.start() for t in ts]
    [t.join() for t in ts]
    stop.set()
    opt.join()
    wall = time.time() - t0
    n = log.read().count()
    distinct = log.read().select("id").distinct().count()
    expect = 50 + appenders * appends * 100
    return {
        "appenders": appenders,
        "appends_each": appends,
        "optimize_commits": opt_runs["ok"],
        "optimize_rederives": opt_runs["rederived"],
        "rows": n,
        "exact": n == expect and distinct == expect,
        "wall_s": round(wall, 2),
        "errs": [repr(e) for e in errs[:3]],
    }


if __name__ == "__main__":
    writers = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    appends = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("tablelog-concurrency-probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    for mode, mk in MODES.items():
        print(f"== committer: {mode} ==")
        print("A. blind appends:", probe_appends(spark, writers, appends, mk))
        print("B. disjoint DML :", probe_disjoint_dml(spark, 4, mk))
        print(
            "C. optimize fire:",
            probe_optimize_under_appends(spark, appenders=4, appends=3, mk=mk),
        )
