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
