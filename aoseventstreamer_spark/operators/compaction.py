"""Event-log compaction: OPTIMIZE-style small-file rewrite.

The engine's write path is built around 250 ms micro-batch triggers
(streaming/groups.py — the reference's pull-expiry cadence,
natsio.rs:195-210), and an emit storm on one project therefore
produces thousands of tiny parquet files in that project's partition
(docs/SCALE.md "Write path"). Small files poison the read path at
scale twice over: listing cost grows linearly with file count, and
each file becomes its own (tiny) scan split, so a 1000-executor stage
degenerates into open/footer/close overhead.

``compact_event_log`` is the standard maintenance job that fixes this:

- LIST files per leaf partition (Hadoop FileSystem API — works on any
  Hadoop-compatible store, not just local disk; hidden/_SUCCESS files
  ignored);
- SELECT partitions breaching the small-file predicate (more than
  ``min_files`` files AND mean file size under ``small_file_bytes``);
- REWRITE each selected partition with a partition-pruned scan
  coalesced to ceil(bytes / target_file_bytes) output files — rows
  are copied verbatim (no sort, no schema change), so the rewrite is
  row-identical by construction and cheap (one narrow scan+write per
  partition, no shuffle: coalesce, never repartition);
- ATOMIC SWAP: the rewrite lands in a hidden ``.compact-tmp`` sibling,
  the live dir is renamed to ``.compact-bak``, tmp renamed live, bak
  deleted — a crash at any point leaves either the old or the new
  data recoverable, and ``recover_compaction`` (run automatically at
  the start of every compact) rolls an interrupted swap back/forward.
  "Atomic" here means crash-atomic for WRITERS, not invisible to
  READERS: between the two renames the partition directory briefly
  does not exist, so a concurrent batch reader that lists during that
  window errors or silently misses that partition's rows (streams are
  covered by ``min_age_seconds``; batch readers are not). A reader-
  invisible OPTIMIZE needs the snapshot layer (``tablelog``), whose
  manifest commit decouples file layout from what readers list;
- IDEMPOTENT: a re-run sees big files and selects nothing.

Relation to ``operators/maintenance.compact_event_log``: that one is
the COPY-based full rewrite (all partitions, new location — a
migration shape); this one is the routine in-place OPTIMIZE that
touches only the partitions whose file profile actually breaches the
threshold.

Scale notes: partition rewrites are independent narrow jobs, submitted
concurrently from a bounded driver thread pool (Spark's scheduler
interleaves them); the listing is one RemoteIterator walk, not a
recursive getContentSummary per partition. On an object store without
atomic rename, point the log at a table format (Delta/Iceberg) whose
OPTIMIZE subsumes this job — this operator models the HDFS-semantics
swap the reference deployment shape implies.
"""

from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_TMP_SUFFIX = ".compact-tmp"
_BAK_SUFFIX = ".compact-bak"

REPORT_SCHEMA = T.StructType(
    [
        T.StructField("partition", T.StringType()),
        T.StructField("files_before", T.IntegerType()),
        T.StructField("bytes_before", T.LongType()),
        T.StructField("files_after", T.IntegerType()),
        T.StructField("compacted", T.BooleanType()),
    ]
)


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def _is_hidden(name: str) -> bool:
    return name.startswith("_") or name.startswith(".")


def _walk_leaf_partitions(fs, jpath, jvm) -> dict[str, list]:
    """{relative partition dir ('' for flat) -> [FileStatus of data
    files]} via one recursive listing."""
    base = jpath.toUri().getPath().rstrip("/")
    out: dict[str, list] = {}
    it = fs.listFiles(jpath, True)  # recursive RemoteIterator
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        name = p.getName()
        if _is_hidden(name):
            continue
        parent = p.getParent().toUri().getPath().rstrip("/")
        rel = parent[len(base):].strip("/")
        if any(_is_hidden(seg) for seg in rel.split("/") if seg):
            continue  # files under .compact-tmp/.compact-bak leftovers
        out.setdefault(rel, []).append(st)
    return out


def recover_compaction(spark: SparkSession, path: str) -> list[str]:
    """Roll back/forward any swap a crash interrupted. For each
    ``<dir>.compact-bak``: if the live dir exists the swap completed
    (delete the bak); if not, the crash hit between the two renames —
    restore the bak to live. Stray ``.compact-tmp`` dirs are deleted
    (the rewrite will simply run again). Returns the actions taken.

    The flat layout (rel='') swaps the LOG ROOT itself, so its
    bak/tmp dirs are SIBLINGS of ``path`` — checked first, before the
    exists(path) early-return: a crash mid-root-swap leaves the root
    missing entirely and only the sibling bak can restore it."""
    fs, jpath, jvm = _fs(spark, path)
    actions: list[str] = []
    Path = jvm.org.apache.hadoop.fs.Path
    base = jpath.toUri().getPath().rstrip("/")
    # root-swap (flat layout) recovery: siblings of the log root
    sib_bak = Path(base + _BAK_SUFFIX)
    sib_tmp = Path(base + _TMP_SUFFIX)
    if fs.exists(sib_bak):
        if fs.exists(jpath):
            fs.delete(sib_bak, True)
            actions.append(f"deleted completed-swap bak {base}{_BAK_SUFFIX}")
        else:
            fs.rename(sib_bak, jpath)
            actions.append(f"restored interrupted root swap {base}{_BAK_SUFFIX}")
    if fs.exists(sib_tmp):
        fs.delete(sib_tmp, True)
        actions.append(f"deleted stale tmp {base}{_TMP_SUFFIX}")
    if not fs.exists(jpath):
        return actions
    stack = [jpath]
    while stack:
        d = stack.pop()
        for st in fs.listStatus(d):
            if not st.isDirectory():
                continue
            p = st.getPath()
            name = p.getName()
            s = p.toUri().getPath()
            if name.endswith(_BAK_SUFFIX):
                live = Path(s[: -len(_BAK_SUFFIX)])
                if fs.exists(live):
                    fs.delete(p, True)
                    actions.append(f"deleted completed-swap bak {s}")
                else:
                    fs.rename(p, live)
                    actions.append(f"restored interrupted swap {s}")
            elif name.endswith(_TMP_SUFFIX):
                fs.delete(p, True)
                actions.append(f"deleted stale tmp {s}")
            elif not _is_hidden(name):
                stack.append(p)
    return actions


def compact_event_log(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    small_file_bytes: int = 32 * 1024 * 1024,
    min_files: int = 4,
    max_concurrency: int = 4,
    min_age_seconds: float | None = None,
) -> DataFrame:
    """Compact small-file partitions of a parquet event log in place.
    Returns the per-partition report (REPORT_SCHEMA); ``compacted``
    False rows were inspected and left untouched. See module
    docstring for the selection predicate and swap protocol.

    ``min_age_seconds`` restricts eligibility to partitions whose
    NEWEST data file is at least that old — two reasons to set it on a
    live log: (1) a partition still receiving appends would be
    re-listed and re-compacted every run; (2) **file-source streaming
    readers checkpoint file PATHS, so compacting a region a stream has
    already consumed makes the rewritten files look NEW on restart and
    the stream re-delivers those rows**
    (tests/test_compaction.py::test_compaction_makes_live_file_stream_redeliver
    demonstrates it). At-least-once consumers (the engine's delivery
    contract — chunk replay is already legal) tolerate that; exactly-
    once readers must only tail regions compaction will never touch
    (set min_age_seconds beyond the stream's lag) or read through a
    table format (Delta/Iceberg) whose snapshot isolation decouples
    file layout from read progress."""
    recover_compaction(spark, path)
    import time as _time

    now = _time.time()
    fs, jpath, jvm = _fs(spark, path)
    Path = jvm.org.apache.hadoop.fs.Path
    base = jpath.toUri().getPath().rstrip("/")
    parts = _walk_leaf_partitions(fs, jpath, jvm)

    def work(item):
        rel, statuses = item
        n = len(statuses)
        total = sum(st.getLen() for st in statuses)
        too_young = min_age_seconds is not None and any(
            st.getModificationTime() / 1000.0 > now - min_age_seconds
            for st in statuses
        )
        if (
            too_young
            or n <= min_files
            or (total // max(n, 1)) >= small_file_bytes
        ):
            return (rel or "<root>", n, total, n, False)
        part_dir = f"{base}/{rel}" if rel else base
        if not rel:
            # MIXED layout guard: compacting rel='' swaps the LOG ROOT,
            # so any partition subdirectory would travel into bak with
            # the rename, be skipped by the straggler loop (files only),
            # and then be deleted with bak — silent loss of every
            # partitioned row. Root-level files coexisting with
            # partition dirs is a malformed layout anyway; refuse to
            # touch it rather than guess.
            has_subdirs = any(
                st.isDirectory()
                and not _is_hidden(st.getPath().getName())
                for st in fs.listStatus(Path(part_dir))
            )
            if has_subdirs:
                return ("<root>", n, total, n, False)
        tmp_dir = part_dir + _TMP_SUFFIX
        bak_dir = part_dir + _BAK_SUFFIX
        n_out = max(1, math.ceil(total / target_file_bytes))
        # read EXACTLY the listed files, not the directory: a writer
        # appending between the listing and this read would otherwise
        # slip its rows into the rewrite while its file also survives
        # the straggler reconciliation below — duplicating them. With
        # the pinned list, rewrite rows == listed rows, and any file
        # that appeared later is moved over verbatim. Partition values
        # live in the DIR NAME, so rows are copied without touching
        # partition columns.
        listed = {st.getPath().getName() for st in statuses}
        file_paths = [st.getPath().toUri().getPath() for st in statuses]
        (
            spark.read.parquet(*file_paths)
            .coalesce(n_out)
            .write.mode("overwrite")
            .parquet(tmp_dir)
        )
        if not fs.rename(Path(part_dir), Path(bak_dir)):
            raise IOError(f"compaction swap failed renaming {part_dir}")
        if not fs.rename(Path(tmp_dir), Path(part_dir)):
            # roll back so the log stays readable
            fs.rename(Path(bak_dir), Path(part_dir))
            raise IOError(f"compaction swap failed installing {tmp_dir}")
        # straggler reconciliation: files that landed in the live dir
        # AFTER the listing travelled into bak with the rename — move
        # them into the compacted dir (part filenames carry job UUIDs,
        # so collisions can't happen) before dropping bak
        for st in fs.listStatus(Path(bak_dir)):
            name = st.getPath().getName()
            if st.isDirectory() or _is_hidden(name) or name in listed:
                continue
            if not fs.rename(st.getPath(), Path(f"{part_dir}/{name}")):
                raise IOError(
                    f"failed to preserve straggler {name} in {part_dir}"
                )
        fs.delete(Path(bak_dir), True)
        n_after = sum(
            1
            for st in fs.listStatus(Path(part_dir))
            if not st.isDirectory() and not _is_hidden(st.getPath().getName())
        )
        return (rel or "<root>", n, total, n_after, True)

    items = sorted(parts.items())
    if max_concurrency > 1 and len(items) > 1:
        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            rows = list(pool.map(work, items))
    else:
        rows = [work(i) for i in items]
    return spark.createDataFrame(rows, REPORT_SCHEMA)
