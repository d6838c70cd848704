"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (subtree subscription +
aggregation) at sf0.001; ``queries()`` / ``oracle_sql()`` expose the
full declared surface from aoseventstreamer_spark.queries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)
# Python WORKERS (mapInPandas etc.) don't inherit the driver's sys.path
# mutations — only PYTHONPATH. Export it so closures that reference
# package modules unpickle on workers regardless of the launch cwd.
os.environ["PYTHONPATH"] = _REPO_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")

from aoseventstreamer_spark import queries as Q  # noqa: E402
from aoseventstreamer_spark.functions import subjects as S  # noqa: E402
from aoseventstreamer_spark.session import load_table  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.1): all events under project '7'
    (subtree subscription, the reference's one true query operator),
    grouped by event_type and counted."""
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    subj = ev.select(
        "event_id",
        "event_type",
        S.collection_subject_col(
            F.col("user_id").cast("string"), F.col("event_type")
        ).alias("subject"),
    )
    matched = subj.filter(S.subtree_predicate("subject", S.base_subject(["7"], False)))
    return matched.groupBy("event_type").agg(F.count("*").alias("cnt"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLE_SQL)
