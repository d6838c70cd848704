"""Event-analytics extension invariants (value parity vs DuckDB is
covered by tools/parity.py / the driver)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from aoseventstreamer_spark.plans import broadcast_join_count
from aoseventstreamer_spark.queries import QUERIES
from aoseventstreamer_spark.session import load_table


def test_transition_matrix_is_row_stochastic_and_complete(spark, sf_dir):
    rows = QUERIES["q_path_transitions"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # each user contributes (events - 1) transitions
    assert sum(r.n for r in rows) == n_events - n_users
    by_from = defaultdict(float)
    for r in rows:
        by_from[r.from_type] += r.p
    assert all(abs(v - 1.0) < 1e-4 for v in by_from.values())


def test_anomaly_flags_match_float_zscore(spark, sf_dir):
    """The integer form must agree with the plain float 2-sigma rule
    (no boundary case sits exactly on the threshold in the fixture,
    and off-boundary the two are mathematically identical)."""
    rows = QUERIES["q_anomaly_zscore"](spark, sf_dir).collect()
    per_type = defaultdict(list)
    for r in rows:
        per_type[r.event_type].append(r)
    assert per_type
    for typ, days in per_type.items():
        n = len(days)
        s = sum(d.cnt for d in days)
        ss = sum(d.cnt * d.cnt for d in days)
        mean = s / n
        var = ss / n - mean * mean
        for d in days:
            want = (d.cnt - mean) ** 2 > 4 * var
            assert d.is_anomaly == want, (typ, d.day)


def test_anomaly_stats_broadcast(spark, sf_dir):
    assert broadcast_join_count(QUERIES["q_anomaly_zscore"](spark, sf_dir)) >= 1


def test_cooccurrence_is_upper_triangle(spark, sf_dir):
    rows = QUERIES["q_event_cooccurrence"](spark, sf_dir).collect()
    assert rows
    assert all(r.type_a < r.type_b for r in rows)
    # with 5 types, at most C(5,2) pairs
    assert len(rows) <= 10


def test_deciles_cover_all_users_evenly(spark, sf_dir):
    rows = QUERIES["q_user_value_deciles"](spark, sf_dir).collect()
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows) == n_users
    sizes = [r.n_users for r in rows]
    assert max(sizes) - min(sizes) <= 1  # NTILE's even-split contract
    # deciles ordered by value: min of decile d+1 >= max of decile d
    ordered = sorted(rows, key=lambda r: r.decile)
    for lo, hi in zip(ordered, ordered[1:]):
        assert hi.min_value >= lo.max_value


def test_pagerank_matches_integer_brute_force(spark, sf_dir):
    """Pure-Python replay of the integer recurrence — any shuffle-order
    or engine effect would break exact equality."""
    from collections import defaultdict

    ev = sorted(
        load_table(spark, sf_dir, "events").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    edges = defaultdict(int)
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r.event_type)
    for seq in by_user.values():
        for a, b in zip(seq, seq[1:]):
            edges[(a, b)] += 1
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    TOTAL = 10**12
    out_w = defaultdict(int)
    for (a, _), w in edges.items():
        out_w[a] += w
    rank = {v: TOTAL // n for v in nodes}
    for _ in range(5):
        contrib = defaultdict(int)
        for (a, b), w in edges.items():
            contrib[b] += (rank[a] * w) // out_w[a]
        rank = {
            v: (TOTAL * 15) // (100 * n) + (85 * contrib[v]) // 100
            for v in nodes
        }
    got = {r.node: r.rank for r in QUERIES["q_pagerank"](spark, sf_dir).collect()}
    assert got == rank
    # mass conservation up to floor loss
    assert 0 <= TOTAL - sum(got.values()) < 10**6


def test_pagerank_generic_edges_and_dangling(spark):
    """Tiny hand graph incl. a dangling node: its mass is dropped (the
    documented simplification) but it still RECEIVES rank."""
    from aoseventstreamer_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string"
    )  # c is dangling
    rows = {r.node: r.rank for r in pagerank(edges, iters=3).collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["c"] > rows["b"] > 0
    assert sum(rows.values()) <= 10**12


def test_pagerank_builds_edge_pipeline_once(spark):
    """The r11 duplicate-pass fix: with cache_edges=True the node list
    is derived from the persisted out-weighted edge table, never by
    re-executing the caller's (often expensive) edge pipeline per
    union leg. An accumulator inside an opaque per-row kernel counts
    TRUE executions of the edge source: this shape pays 2 (the out_w
    aggregate and the broadcast-join side of e_out's one
    materialization — an opaque source can't share that exchange),
    where the old shape measured 6 on this same test (extra passes for
    the node-list legs and n_frame). On the parquet-backed q_pagerank
    the same fix measured 200k -> 100k events scan records per
    build — 2 full passes down to 1 (the scan exchange IS shared
    there)."""
    from aoseventstreamer_spark.operators.graph import pagerank

    acc = spark.sparkContext.accumulator(0)

    def counting(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    base = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "a")],
        "src string, dst string",
    ).repartition(1)
    edges = base.mapInPandas(counting, "src string, dst string")

    handles: list = []
    ranks = pagerank(edges, iters=2, cache_edges=True, cache_handles=handles)
    rows = {r.node: r.rank for r in ranks.collect()}
    assert set(rows) == {"a", "b", "c"}
    # one materialization of e_out (<= 2 source executions); the old
    # shape measured 6x here
    assert acc.value <= 8, f"edge pipeline executed {acc.value // 4}x"
    for h in handles:
        h.unpersist()


def test_pagerank_broadcast_iterations_are_exchange_free(spark):
    """r12 optimization gate: with cache_edges + broadcast_ranks (the
    q_pagerank shape) the persisted edge table is pre-partitioned by
    dst ONCE, so every iteration's contrib groupBy("dst") reuses the
    cached partitioning — the recurring per-iteration plan must carry
    NO hash exchange (ranks enter by broadcast, contrib leaves by
    broadcast). The one-time dst repartition lives inside the
    InMemoryRelation build subtree, which the renderer re-prints at
    every cache read and is therefore stripped before counting."""
    from aoseventstreamer_spark.operators.graph import pagerank
    from aoseventstreamer_spark.plans import strip_cached_children

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "a"), ("b", "a")],
        "src string, dst string",
    )
    handles: list = []
    ranks = pagerank(
        edges, iters=3, cache_edges=True, broadcast_ranks=True,
        cache_handles=handles,
    )
    full = ranks._jdf.queryExecution().executedPlan().toString()
    recurring = strip_cached_children(full)
    assert "Exchange hashpartitioning" not in recurring, recurring
    # the one-time build DOES carry the dst partitioning the loop reuses
    assert "hashpartitioning(dst" in full, full
    rows = {r.node: r.rank for r in ranks.collect()}
    assert set(rows) == {"a", "b", "c"}
    for h in handles:
        h.unpersist()


def test_pagerank_null_endpoints_dropped_consistently(spark):
    """r12 advice fix: null src/dst edges are filtered UP FRONT, so the
    cached and uncached node lists (and the oracle SQL, which applies
    the same WHERE) agree on every input class — previously the
    e_out-derived node list silently dropped the dst nodes of null-src
    edges while the raw-frame path kept them."""
    from aoseventstreamer_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), (None, "d", 1), ("c", None, 1),
         ("d", "a", 1)],
        "src string, dst string, w long",
    )
    variants = [
        pagerank(edges, iters=3, weight_col="w", cache_edges=True),
        pagerank(edges, iters=3, weight_col="w", cache_edges=False),
        pagerank(edges, iters=3, weight_col="w", cache_edges=True,
                 broadcast_ranks=True),
    ]
    results = [{r.node: r.rank for r in v.collect()} for v in variants]
    assert results[0] == results[1] == results[2], results
    assert None not in results[0]
    assert set(results[0]) == {"a", "b", "c", "d"}
