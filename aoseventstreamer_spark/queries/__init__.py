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


# Populate the registries.
from aoseventstreamer_spark.queries import analytics_ext, coverage_ext, llm, relational, routing_queries, temporal_ext  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLE_SQL", "query", "t", "cents", "sum_value_2dp", "avg_value_4dp"]
