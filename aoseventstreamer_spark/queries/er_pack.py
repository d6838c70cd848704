"""Entity resolution & mergeable-sketch rollups.

Fuzzy matching (blocked edit-distance join) is the record-linkage
primitive every catalog/crawl dedup eventually needs beyond exact and
shingle similarity; sketch rollups (HLL partial aggregates that UNION
instead of recount) are how 100 TB systems answer distinct-count
questions from pre-aggregated daily tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aoseventstreamer_spark.queries import query, t

_FUZZY_CAP = 2000  # bounded input set, constant across SFs (see docstring)


@query(
    "q_fuzzy_match",
    oracle=f"""
    WITH p AS (
      SELECT p_partkey, p_name,
             string_split(p_name, ' ')[len(string_split(p_name, ' '))] AS blk
      FROM part WHERE p_partkey < {_FUZZY_CAP}
    )
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM p a JOIN p b
      ON a.blk = b.blk AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
      AND a.p_name <> b.p_name
    """,
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join (record linkage): candidate pairs share a
    blocking key (the name's last token — the "entity type" noun),
    then exact Levenshtein filters the block. Edit distance is an
    integer, so the oracle is hash-exact — no float anywhere.

    Input is capped at p_partkey < 2000 (constant work across SFs,
    like q_ngram_jaccard): the verify stage of entity resolution runs
    on BLOCKED candidates by design. The scale story is the blocking
    discipline itself — pairs exist only within a block, the join is
    an equi-join on the block key, and production systems simply use
    finer keys (token + length band + prefix) to keep blocks bounded;
    the levenshtein evaluation is codegen'd JVM, no UDF."""
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < _FUZZY_CAP)
        .select(
            "p_partkey",
            "p_name",
            F.element_at(F.split("p_name", " "), -1).alias("blk"),
        )
    )
    a, b = p.alias("a"), p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter((dist <= 2) & (F.col("a.p_name") != F.col("b.p_name")))
        .select(
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.cast("int").alias("dist"),
        )
    )


@query("q_hll_rollup")  # rows-only: DataSketches HLL binaries are engine-specific
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-day HLL sketches of distinct
    users, then a UNION of the daily sketches answers the
    whole-period distinct count WITHOUT rescanning the log — the
    pre-aggregated-sketch-table pattern every 100 TB warehouse uses
    (a day's raw events compress to one ~KB sketch; month-level
    questions merge 30 sketches instead of re-reading 3 TB).

    Returns one row: days merged, merged-union estimate, direct
    single-pass estimate, and the exact distinct count. The test
    asserts the estimates agree with each other and sit within HLL
    error bounds of the exact answer."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    merged = daily.agg(
        F.count("*").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_estimate"),
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias(
            "direct_estimate"
        ),
        F.count_distinct("user_id").alias("exact_distinct"),
    )
    return merged.crossJoin(direct)
