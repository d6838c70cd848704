"""E2E streaming tests mirroring the reference e2e flow
(/root/reference/src/e2e/tests.rs:108-277): emit BEFORE the group is
created and still receive it (replay-from-start); a chunk whose deliver
fails is redelivered after restart (at-least-once)."""

from __future__ import annotations

import pytest

from aoseventstreamer_spark import schemas
from aoseventstreamer_spark.functions import subjects as S
from aoseventstreamer_spark.operators.routing import route_emits, write_event_log
from aoseventstreamer_spark.streaming.groups import (
    StreamGroupManager,
    compile_query_subject,
    subject_filter,
)


def _emit_rows(start_id: int, project: str, n: int):
    return [
        {
            "emit_id": start_id + i,
            "token": "t",
            "event_resource": schemas.RESOURCE_COLLECTION,
            "resource_id": f"c{i}",
            "event_type": schemas.EVENT_TYPE_ALL,
            "relations": [
                {"project": project, "collection": None, "shared_object": None,
                 "object_groups": []}
            ],
        }
        for i in range(n)
    ]


@pytest.fixture()
def log_dir(tmp_path):
    return str(tmp_path / "events")


def _route_and_write(spark, rows, path):
    raw = spark.createDataFrame(rows, schemas.RAW_EMITS_SCHEMA)
    routed = route_emits(raw, secret="t")
    # align to the declared streaming schema (ts is null for these)
    write_event_log(routed, path, partition_by=None)


def test_replay_from_start_and_filter(spark, tmp_path, log_dir):
    # 1. emit BEFORE any group exists (tests.rs:154-170)
    _route_and_write(spark, _emit_rows(0, "p1", 6) + _emit_rows(100, "p2", 4), log_dir)

    mgr = StreamGroupManager(spark, log_dir, str(tmp_path / "state"))
    group = mgr.create_stream_group(
        schemas.RESOURCE_PROJECT, "p1", include_subresources=True
    )
    assert group.filter_subject == "UPDATES.STORAGE._.p1.>"

    delivered: dict[int, int] = {}

    def deliver(chunk_id: int, df) -> None:
        delivered[chunk_id] = df.count()
        subjects = [r.subject for r in df.select("subject").collect()]
        assert all(s.startswith("UPDATES.STORAGE._.p1.") for s in subjects)

    q = mgr.read_available(group.id, deliver)
    q.awaitTermination(120)
    # full history replayed, p2 filtered out broker-side
    assert sum(delivered.values()) == 6


def test_at_least_once_redelivery(spark, tmp_path, log_dir):
    _route_and_write(spark, _emit_rows(0, "p1", 5), log_dir)
    mgr = StreamGroupManager(spark, log_dir, str(tmp_path / "state"))
    group = mgr.create_stream_group(
        schemas.RESOURCE_PROJECT, "p1", include_subresources=True
    )

    seen: list[int] = []

    def failing_deliver(chunk_id: int, df) -> None:
        seen.append(df.count())
        raise RuntimeError("client crashed before ack")

    q = mgr.read_available(group.id, failing_deliver)
    with pytest.raises(Exception):
        q.awaitTermination(120)
    assert sum(seen) > 0  # the chunk WAS handed over, but never acked

    ok: list[int] = []
    q2 = mgr.read_available(group.id, lambda cid, df: ok.append(df.count()))
    q2.awaitTermination(120)
    # unacked chunk redelivered in full after restart
    assert sum(ok) == 5


def test_group_registry_roundtrip(spark, tmp_path, log_dir):
    _route_and_write(spark, _emit_rows(0, "p1", 1), log_dir)
    mgr = StreamGroupManager(spark, log_dir, str(tmp_path / "state"))
    g = mgr.create_stream_group(
        schemas.RESOURCE_COLLECTION,
        "c9",
        include_subresources=False,
        hierarchy={"project_id": "p1"},
    )
    got = mgr.get_stream_group(g.id)
    assert got.filter_subject == "UPDATES.STORAGE._.p1._.c9._"
    assert got.resource_type == schemas.RESOURCE_COLLECTION
    with pytest.raises(KeyError):
        mgr.get_stream_group("nope")


def test_compile_query_subject_all_levels():
    h = {"project_id": "p", "collection_id": "c", "shared_id": "s"}
    assert compile_query_subject(schemas.RESOURCE_PROJECT, "p", False) == \
        "UPDATES.STORAGE._.p._"
    assert compile_query_subject(schemas.RESOURCE_COLLECTION, "c", True, h) == \
        "UPDATES.STORAGE._.p._.c.>"
    # levels the reference left as todo!() — grammar-defined, we support them
    assert compile_query_subject(schemas.RESOURCE_OBJECT, "o", False, h) == \
        "UPDATES.STORAGE._.p._.c._.OBJECT._.s._.o._"
    assert compile_query_subject(schemas.RESOURCE_OBJECT_GROUP, "og", True, h) == \
        "UPDATES.STORAGE._.p._.c._.OBJECTGROUP._.s._.og.>"
    with pytest.raises(ValueError):
        compile_query_subject(schemas.RESOURCE_ALL, "x", False)


def test_subject_filter_modes(spark):
    df = spark.createDataFrame(
        [(S.project_subject("p1"),), (S.collection_subject("p1", "c1"),),
         (S.project_subject("p2"),)],
        "subject string",
    )
    assert df.filter(subject_filter("UPDATES.STORAGE._.p1.>")).count() == 2
    assert df.filter(subject_filter("UPDATES.STORAGE._.p1._")).count() == 1


def test_demux_one_scan_many_groups(spark, tmp_path, log_dir):
    """DemuxRunner: a single scan delivers per-group filtered chunks
    identical to what per-group queries would deliver."""
    from aoseventstreamer_spark.streaming.demux import DemuxRunner

    _route_and_write(
        spark,
        _emit_rows(0, "p1", 4) + _emit_rows(100, "p2", 3) + _emit_rows(200, "p3", 2),
        log_dir,
    )
    runner = DemuxRunner(spark, log_dir, str(tmp_path / "demux_ckpt"))
    got: dict[str, int] = {"g1": 0, "g2": 0, "g3": 0}
    runner.register("g1", "UPDATES.STORAGE._.p1.>", lambda cid, df: got.__setitem__("g1", got["g1"] + df.count()))
    runner.register("g2", "UPDATES.STORAGE._.p2.>", lambda cid, df: got.__setitem__("g2", got["g2"] + df.count()))
    # exact-level group: matches nothing (all events are collection-level)
    runner.register("g3", "UPDATES.STORAGE._.p3._", lambda cid, df: got.__setitem__("g3", got["g3"] + df.count()))

    q = runner.start(trigger={"availableNow": True})
    q.awaitTermination(120)
    assert got == {"g1": 4, "g2": 3, "g3": 0}


def test_demux_failed_group_replays_batch(spark, tmp_path, log_dir):
    """If any group's deliver fails, the shared checkpoint does not
    commit and the whole batch replays (coarsened at-least-once)."""
    from aoseventstreamer_spark.streaming.demux import DemuxRunner

    _route_and_write(spark, _emit_rows(0, "p1", 3), log_dir)
    ck = str(tmp_path / "ck2")

    r1 = DemuxRunner(spark, log_dir, ck)
    r1.register("ok", "UPDATES.STORAGE._.p1.>", lambda cid, df: df.count())
    def boom(cid, df):
        raise RuntimeError("subscriber crashed")
    r1.register("bad", "UPDATES.STORAGE._.p1.>", boom)
    q1 = r1.start(trigger={"availableNow": True})
    with pytest.raises(Exception):
        q1.awaitTermination(120)

    r2 = DemuxRunner(spark, log_dir, ck)
    counts = []
    r2.register("ok", "UPDATES.STORAGE._.p1.>", lambda cid, df: counts.append(df.count()))
    q2 = r2.start(trigger={"availableNow": True})
    q2.awaitTermination(120)
    assert sum(counts) == 3  # full batch redelivered after the failure


def test_demux_single_pass_matches_per_group_filters(spark, tmp_path, log_dir):
    """The one-pass candidate-key join must deliver exactly what N
    per-group predicate filters would, across levels and filter modes
    (VERDICT r1 #2) — and idle groups must get a driver-local empty
    frame (no per-group job)."""
    from aoseventstreamer_spark.streaming.demux import DemuxRunner
    from aoseventstreamer_spark.operators.routing import route_emits

    # events across 10 projects, collection-level + project-level mix
    rows = []
    for i in range(10):
        rows += _emit_rows(i * 100, f"p{i}", 3)
        rows.append({
            "emit_id": i * 100 + 50, "token": "t",
            "event_resource": schemas.RESOURCE_PROJECT,
            "resource_id": f"p{i}", "event_type": schemas.EVENT_TYPE_ALL,
            "relations": [{"project": f"p{i}", "collection": None,
                           "shared_object": None, "object_groups": []}],
        })
    _route_and_write(spark, rows, log_dir)

    # 100 groups: subtree + exact at project level, exact at collection
    # level, plus many groups matching nothing
    specs = []
    for i in range(10):
        specs.append((f"sub{i}", f"UPDATES.STORAGE._.p{i}.>"))
        specs.append((f"ex{i}", f"UPDATES.STORAGE._.p{i}._"))
        specs.append((f"col{i}", f"UPDATES.STORAGE._.p{i}._.c0._"))
    for i in range(70):
        specs.append((f"idle{i}", f"UPDATES.STORAGE._.absent{i}.>"))

    got: dict[str, list[str]] = {gid: [] for gid, _ in specs}
    local_empties: list[bool] = []
    runner = DemuxRunner(spark, log_dir, str(tmp_path / "ck_sp"))
    for gid, fs in specs:
        def deliver(cid, df, gid=gid):
            if gid.startswith("idle"):
                # idle groups must all receive THE shared empty frame —
                # identity proves no per-group plan/job was built
                local_empties.append(df is runner.empty_frame)
            got[gid].extend(r.subject for r in df.select("subject").collect())
        runner.register(gid, fs, deliver)
    q = runner.start(trigger={"availableNow": True})
    q.awaitTermination(240)

    log = spark.read.schema(schemas.ROUTED_EVENTS_SCHEMA).parquet(log_dir)
    from aoseventstreamer_spark.streaming.groups import subject_filter
    for gid, fs in specs:
        expected = sorted(
            r.subject for r in log.filter(subject_filter(fs)).select("subject").collect()
        )
        assert sorted(got[gid]) == expected, (gid, fs)
    assert local_empties and all(local_empties)


def test_demux_deliveries_overlap_within_batch(spark, tmp_path, log_dir):
    """r7: per-group deliveries in one batch run concurrently from the
    bounded driver pool — 16 sleeping subscribers must finish in far
    less than 16 serial sleeps, and deliver_concurrency=1 must keep
    the strict serial order for callers that need it."""
    import threading
    import time as _time

    from aoseventstreamer_spark.streaming.demux import DemuxRunner

    _route_and_write(spark, _emit_rows(0, "p1", 2), log_dir)
    runner = DemuxRunner(spark, log_dir, str(tmp_path / "ck_ov"))
    in_flight, peak = [0], [0]
    lock = threading.Lock()

    def deliver(cid, df):
        with lock:
            in_flight[0] += 1
            peak[0] = max(peak[0], in_flight[0])
        _time.sleep(0.3)
        df.count()
        with lock:
            in_flight[0] -= 1

    for i in range(16):
        runner.register(f"g{i}", "UPDATES.STORAGE._.p1.>", deliver)
    t0 = _time.time()
    q = runner.start(trigger={"availableNow": True})
    q.awaitTermination(120)
    wall = _time.time() - t0
    assert peak[0] > 1  # genuinely overlapped
    assert wall < 16 * 0.3  # strictly better than serial sleeps

    # serial mode: no overlap ever
    runner1 = DemuxRunner(
        spark, log_dir, str(tmp_path / "ck_ov1"), deliver_concurrency=1
    )
    peak[0] = in_flight[0] = 0
    for i in range(4):
        runner1.register(f"s{i}", "UPDATES.STORAGE._.p1.>", deliver)
    q = runner1.start(trigger={"availableNow": True})
    q.awaitTermination(120)
    assert peak[0] == 1


def test_demux_rejects_non_canonical_filter(spark, tmp_path, log_dir):
    from aoseventstreamer_spark.streaming.demux import DemuxRunner

    runner = DemuxRunner(spark, log_dir, str(tmp_path / "ck_nc"))
    for bad in ["UPDATES.STORAGE._.p1", "garbage.>", "UPDATES.STORAGE._..>",
                "UPDATES.STORAGE._.p._.c._.WRONG._.s._.o.>"]:
        with pytest.raises(ValueError, match="canonical"):
            runner.register("g", bad, lambda cid, df: None)


def test_event_type_filters_delivery(spark, tmp_path, log_dir):
    """A group created with a specific event_type must receive only
    matching events (the reference persists but ignores it — lifted)."""
    rows = []
    for i, et in enumerate([1, 2, 1]):
        rows.append({
            "emit_id": i, "token": "t",
            "event_resource": schemas.RESOURCE_COLLECTION,
            "resource_id": f"c{i}", "event_type": et,
            "relations": [{"project": "p1", "collection": None,
                           "shared_object": None, "object_groups": []}],
        })
    _route_and_write(spark, rows, log_dir)
    mgr = StreamGroupManager(spark, log_dir, str(tmp_path / "state"))
    g = mgr.create_stream_group(
        schemas.RESOURCE_PROJECT, "p1", include_subresources=True, event_type=1
    )
    got = []
    q = mgr.read_available(g.id, lambda cid, df: got.extend(r.updated_type for r in df.collect()))
    q.awaitTermination(120)
    assert got == [1, 1]  # event_type 2 excluded


def test_unknown_group_before_any_created(spark, tmp_path, log_dir):
    mgr = StreamGroupManager(spark, log_dir, str(tmp_path / "fresh_state"))
    with pytest.raises(KeyError):  # not AnalysisException/PATH_NOT_FOUND
        mgr.get_stream_group("nope")


def test_project_of_query_subject():
    """Every query subject fixes the project (first id token,
    utils.rs:16-32) — the extractor must recover it at every level and
    refuse malformed subjects."""
    assert S.project_of_query_subject("UPDATES.STORAGE._.p1.>") == "p1"
    assert S.project_of_query_subject("UPDATES.STORAGE._.p1._") == "p1"
    assert S.project_of_query_subject("UPDATES.STORAGE._.p1._.c1._") == "p1"
    assert S.project_of_query_subject("UPDATES.STORAGE._.p1._.c1.>") == "p1"
    assert (
        S.project_of_query_subject(
            "UPDATES.STORAGE._.p._.c._.OBJECT._.s._.o._"
        )
        == "p"
    )
    assert (
        S.project_of_query_subject(
            "UPDATES.STORAGE._.p._.c._.OBJECTGROUP._.s._.og.>"
        )
        == "p"
    )
    assert S.project_of_query_subject("garbage") is None
    assert S.project_of_query_subject("UPDATES.STORAGE._") is None
    assert S.project_of_query_subject("WRONG.PREFIX._.p1.>") is None


def test_group_stream_partition_pruned(spark, tmp_path, log_dir):
    """A project-scoped group over a project-partitioned log must scan
    only its project's partition (VERDICT r1 #3): the per-batch plan
    shows the derived project_id predicate under PartitionFilters."""
    rows = _emit_rows(0, "p1", 3) + _emit_rows(100, "p2", 4)
    raw = spark.createDataFrame(rows, schemas.RAW_EMITS_SCHEMA)
    write_event_log(route_emits(raw, secret="t"), log_dir)  # partitioned by project_id

    mgr = StreamGroupManager(spark, log_dir, str(tmp_path / "state"))
    g = mgr.create_stream_group(
        schemas.RESOURCE_PROJECT, "p1", include_subresources=True
    )
    counts = []

    def deliver(cid, df):
        counts.append(df.count())

    q = mgr.read_available(g.id, deliver)
    q.awaitTermination(120)
    assert sum(counts) == 3
    # the scan lives in the streaming query's incremental plan (the
    # foreachBatch df is an RDD-wrapped view and never shows it)
    plan = q._jsq.explainInternal(True)
    scan_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scan_lines, "no file scan with partition filters in the incremental plan"
    assert any("project_id" in l and "p1" in l for l in scan_lines), scan_lines


def test_demux_rejects_late_registration_and_history_gap(spark, tmp_path, log_dir):
    from aoseventstreamer_spark.streaming.demux import DemuxRunner

    _route_and_write(spark, _emit_rows(0, "p1", 2), log_dir)
    ck = str(tmp_path / "ckg")
    r1 = DemuxRunner(spark, log_dir, ck)
    r1.register("a", "UPDATES.STORAGE._.p1.>", lambda cid, df: df.count())
    q = r1.start(trigger={"availableNow": True})
    with pytest.raises(RuntimeError, match="already started"):
        r1.register("late", "UPDATES.STORAGE._.p1.>", lambda cid, df: None)
    q.awaitTermination(120)

    # restart with a NEW group on the same checkpoint: loud, not silent
    r2 = DemuxRunner(spark, log_dir, ck)
    r2.register("a", "UPDATES.STORAGE._.p1.>", lambda cid, df: None)
    r2.register("b", "UPDATES.STORAGE._.p1.>", lambda cid, df: None)
    with pytest.raises(ValueError, match="miss all previously committed"):
        r2.start(trigger={"availableNow": True})
    # explicit opt-in works
    r3 = DemuxRunner(spark, log_dir, ck)
    r3.register("a", "UPDATES.STORAGE._.p1.>", lambda cid, df: None)
    r3.register("b", "UPDATES.STORAGE._.p1.>", lambda cid, df: None)
    q3 = r3.start(trigger={"availableNow": True}, allow_missed_history=True)
    q3.awaitTermination(120)


def test_shared_group_load_balances_without_overlap(spark, tmp_path, log_dir):
    """Reference parity: ONE stream group's message set shared across N
    attached clients (handler.rs:21-33 — the durable consumer
    load-balances; no client sees a message another already consumed).
    Done-criterion: union of received == the batch, intersection == empty,
    ack stays chunk-granular (a failing client redelivers to ALL)."""
    _route_and_write(spark, _emit_rows(0, "p1", 12), log_dir)
    mgr = StreamGroupManager(spark, log_dir, str(tmp_path / "state"))
    g = mgr.create_stream_group(
        schemas.RESOURCE_PROJECT, "p1", include_subresources=True
    )

    got: dict[int, list[tuple[str, int]]] = {0: [], 1: []}

    def mk(i):
        def deliver(cid, df):
            got[i].extend(
                (r.subject, r.seq) for r in df.select("subject", "seq").collect()
            )
        return deliver

    q = mgr.read_available_shared(g.id, [mk(0), mk(1)])
    q.awaitTermination(120)

    a, b = set(got[0]), set(got[1])
    assert a & b == set(), "a message was delivered to two clients"
    assert len(a | b) == 12, "union of clients' messages != the message set"
    # both clients actually participated (xxhash64 split is deterministic
    # but spread over 12 ids; an empty side would mean broken balancing)
    assert a and b

    # chunk-granular ack: client 1 crashes -> offset not committed ->
    # the WHOLE chunk (both slices) is redelivered on reattach
    mgr2 = StreamGroupManager(spark, log_dir, str(tmp_path / "state"))

    def crash(cid, df):
        df.count()
        raise RuntimeError("client crashed before ack")

    g2 = mgr2.create_stream_group(
        schemas.RESOURCE_PROJECT, "p1", include_subresources=True
    )
    ok: list[tuple[str, int]] = []
    q2 = mgr2.read_available_shared(g2.id, [lambda c, d: None, crash])
    with pytest.raises(Exception):
        q2.awaitTermination(120)

    q3 = mgr2.read_available_shared(
        g2.id,
        [
            lambda c, d: ok.extend(
                (r.subject, r.seq) for r in d.select("subject", "seq").collect()
            )
        ]
        * 2,
    )
    q3.awaitTermination(120)
    assert len(set(ok)) == 12, "unacked chunk must redeliver to all clients"


# ---------- stream groups over the tablelog format (VERDICT r7 item 6) ----------


def _routed(spark, rows):
    raw = spark.createDataFrame(rows, schemas.RAW_EMITS_SCHEMA)
    return route_emits(raw, secret="t")


def test_stream_group_tablelog_replay_and_filter(spark, tmp_path):
    """Parity through the format: a tablelog-backed group replays the
    full retained history and applies the broker-side subject filter
    exactly as the file-source path does."""
    from aoseventstreamer_spark.tablelog import TableLog

    log_dir = str(tmp_path / "tl_events")
    log = TableLog(spark, log_dir)
    log.append(_routed(spark, _emit_rows(0, "p1", 6) + _emit_rows(100, "p2", 4)))

    mgr = StreamGroupManager(
        spark, log_dir, str(tmp_path / "state"), log_format="tablelog"
    )
    group = mgr.create_stream_group(
        schemas.RESOURCE_PROJECT, "p1", include_subresources=True
    )
    got: list[tuple[str, int]] = []

    def deliver(chunk_id: int, df) -> None:
        got.extend((r.subject, r.seq) for r in df.select("subject", "seq").collect())

    q = mgr.read_available(group.id, deliver)
    q.awaitTermination(120)
    assert len(got) == 6 and len(set(got)) == 6
    assert all(s.startswith("UPDATES.STORAGE._.p1.") for s, _ in got)


def test_stream_group_tablelog_exactly_once_across_optimize(spark, tmp_path):
    """THE item-6 demo: kill the group's tail, OPTIMIZE the consumed
    region (many small appends -> few files), restart on the SAME
    checkpoint -> ZERO duplicate chunks; rows appended after the
    restart arrive exactly once. Contrast: the parquet file-source
    path re-delivers the compacted region
    (tests/test_compaction.py::test_compaction_makes_live_file_stream_redeliver)."""
    from aoseventstreamer_spark.tablelog import TableLog

    log_dir = str(tmp_path / "tl_events2")
    log = TableLog(spark, log_dir)
    # 6 separate appends = 6+ small files: a real compaction target
    for i in range(6):
        log.append(_routed(spark, _emit_rows(i * 10, "p1", 2)))

    mgr = StreamGroupManager(
        spark, log_dir, str(tmp_path / "state2"), log_format="tablelog"
    )
    group = mgr.create_stream_group(
        schemas.RESOURCE_PROJECT, "p1", include_subresources=True
    )
    delivered: list[tuple[str, int]] = []

    def deliver(chunk_id: int, df) -> None:
        delivered.extend(
            (r.subject, r.seq) for r in df.select("subject", "seq").collect()
        )

    q = mgr.read_available(group.id, deliver)
    q.awaitTermination(120)
    assert len(delivered) == 12 and len(set(delivered)) == 12
    baseline = set(delivered)

    # kill (query already terminated); OPTIMIZE the consumed region
    stats = log.optimize(small_file_bytes=64 * 1024 * 1024, min_files=1)
    assert stats["files_removed"] > stats["files_added"] > 0

    # restart on the SAME group checkpoint: the layout-only commit is
    # data_change=False -> the tail skips it entirely
    q = mgr.read_available(group.id, deliver)
    q.awaitTermination(120)
    assert set(delivered) == baseline and len(delivered) == 12, (
        "compaction must be invisible to a tablelog-backed stream group"
    )

    # new data after the restart arrives exactly once
    log.append(_routed(spark, _emit_rows(900, "p1", 3)))
    q = mgr.read_available(group.id, deliver)
    q.awaitTermination(120)
    assert len(delivered) == 15 and len(set(delivered)) == 15


def test_demux_tablelog_exactly_once_across_optimize(spark, tmp_path):
    """DemuxRunner(log_format='tablelog'): the fleet's shared
    checkpoint carries a snapshot VERSION, so kill -> OPTIMIZE the
    consumed region -> restart re-delivers NOTHING (the file-source
    path-checkpoint hazard inverted for the whole fleet at once)."""
    from aoseventstreamer_spark.streaming.demux import DemuxRunner
    from aoseventstreamer_spark.tablelog import TableLog

    tbl = str(tmp_path / "tl_log")
    log = TableLog(spark, tbl)

    def append_routed(rows):
        raw = spark.createDataFrame(rows, schemas.RAW_EMITS_SCHEMA)
        routed = route_emits(raw, secret="t")
        log.append(
            routed.select(*[f.name for f in schemas.ROUTED_EVENTS_SCHEMA.fields])
        )

    append_routed(_emit_rows(0, "p1", 4) + _emit_rows(100, "p2", 3))
    got: dict[str, int] = {"g1": 0, "g2": 0}

    def mk_runner():
        runner = DemuxRunner(
            spark, tbl, str(tmp_path / "ck"), log_format="tablelog"
        )
        runner.register(
            "g1", "UPDATES.STORAGE._.p1.>",
            lambda cid, df: got.__setitem__("g1", got["g1"] + df.count()),
        )
        runner.register(
            "g2", "UPDATES.STORAGE._.p2.>",
            lambda cid, df: got.__setitem__("g2", got["g2"] + df.count()),
        )
        return runner

    q = mk_runner().start(trigger={"availableNow": True})
    q.awaitTermination(120)
    assert got == {"g1": 4, "g2": 3}
    # compact the CONSUMED region, then restart the fleet
    res = log.optimize(min_files=1, small_file_bytes=1 << 30)
    assert res["files_removed"] >= 1
    q = mk_runner().start(trigger={"availableNow": True})
    q.awaitTermination(120)
    assert got == {"g1": 4, "g2": 3}  # zero re-delivery
    # new appends still flow
    append_routed(_emit_rows(200, "p1", 2))
    q = mk_runner().start(trigger={"availableNow": True})
    q.awaitTermination(120)
    assert got == {"g1": 6, "g2": 3}
