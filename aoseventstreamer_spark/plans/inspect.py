"""Physical-plan inspection helpers.

The engine's 100 TB acceptance criteria (SURVEY.md §4/§6) are plan
properties, not timings: subject predicates must reach the parquet
scan as PushedFilters, dimension joins must broadcast, hot paths must
stay inside WholeStageCodegen, and narrow pipelines must not shuffle.
These helpers turn those criteria into assertions usable from tests.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, pattern: str) -> bool:
    """True if the scan's PushedFilters line matches ``pattern`` (regex)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and re.search(pattern, line):
            return True
    return False


def shuffle_count(df: DataFrame) -> int:
    """Number of exchange (shuffle) operators in the physical plan.
    AQE may later coalesce them, but a plan with 0 exchanges is
    guaranteed narrow."""
    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.MULTILINE))


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", formatted_plan(df)))


def codegen_stage_count(df: DataFrame) -> int:
    return len(set(re.findall(r"codegen id : (\d+)", formatted_plan(df))))
