"""MERGE-style upsert transforms (SCD type 1 and type 2).

A mutable "current state" view over an append-only event log is the
other half of the reference's data model: the log records changes
(EmitEvent is literally a resource-change feed,
internal_event_server.rs:18-66); consumers routinely need latest-wins
state or full change history. Without a table format, MERGE INTO is
expressed as pure DataFrame algebra producing the NEXT table state —
write it with an overwrite/compaction-style rewrite
(operators/maintenance.py) or feed it to foreachBatch for streaming
upserts.

Scale shape: one shuffle on the merge key for the anti-join/union
(updates are deduped with a map-side-combinable max aggregation
first); at 100 TB partition the state table by a stable key prefix so
the rewrite touches only affected partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _latest_per_key(updates: DataFrame, keys: list[str], order_by: list[str]) -> DataFrame:
    """Last update per key, deterministically (order_by then the full
    tuple of remaining columns never ties for real change feeds; the
    caller supplies a unique tiebreaker column in order_by)."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str] | str,
    order_by: list[str] | str,
) -> DataFrame:
    """SCD type 1 (latest wins): the next state of ``target`` after
    applying ``updates`` — matched keys replaced by their latest
    update, unmatched target rows kept, brand-new keys inserted.
    Column sets must match (enforced)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            f"column mismatch: target {sorted(target.columns)} vs "
            f"updates {sorted(updates.columns)}"
        )
    latest = _latest_per_key(updates, keys, order_by)
    untouched = target.join(latest.select(*keys), on=keys, how="left_anti")
    return untouched.unionByName(latest.select(*target.columns))


def merge_scd2(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str] | str,
    order_by: str,
    current_flag: str = "is_current",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """SCD type 2 (keep history): matched CURRENT rows are closed
    (``valid_to`` = the update's ``order_by`` value, flag cleared) and
    the latest update per key is appended as the new current row with
    an open ``valid_to``. ``target`` must already carry the three
    bookkeeping columns; ``updates`` carries the data columns +
    ``order_by``."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    latest = _latest_per_key(updates, keys, [order_by])

    # ordering guard: an update takes effect only if it is STRICTLY
    # newer than the key's current row. This makes the merge
    # idempotent under at-least-once replay (re-applying a batch whose
    # version == the current valid_from is a no-op instead of
    # appending a zero-length history row) and immune to stale
    # stragglers (a late update older than the current row would
    # otherwise close it BACKWARDS, valid_to < valid_from, and install
    # the stale row as current).
    cur = target.filter(F.col(current_flag)).select(
        *keys, F.col(valid_from).alias("__cur_from")
    )
    latest = (
        latest.join(cur, on=keys, how="left")
        .filter(F.col("__cur_from").isNull() | (F.col(order_by) > F.col("__cur_from")))
        .drop("__cur_from")
    )

    new_rows = (
        latest.withColumn(valid_from, F.col(order_by))
        .withColumn(valid_to, F.lit(None).cast(latest.schema[order_by].dataType))
        .withColumn(current_flag, F.lit(True))
        .select(*target.columns)
    )
    closing = latest.select(*keys, F.col(order_by).alias("__close_at"))
    # no broadcast hint: the update batch is not guaranteed small at
    # the 100 TB state sizes this targets — AQE broadcasts when it is
    closed = (
        target.join(closing, on=keys, how="left")
        .withColumn(
            valid_to,
            F.when(
                F.col(current_flag) & F.col("__close_at").isNotNull(),
                F.col("__close_at"),
            ).otherwise(F.col(valid_to)),
        )
        .withColumn(
            current_flag,
            F.when(F.col("__close_at").isNotNull(), F.lit(False)).otherwise(
                F.col(current_flag)
            ),
        )
        .drop("__close_at")
    )
    return closed.unionByName(new_rows)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """Corpus-version diff: classify every key across two snapshots as
    ``added`` / ``removed`` / ``changed`` (unchanged rows are dropped —
    at snapshot scale they are the overwhelming majority and carrying
    them would make the diff as large as the corpus).

    Change detection compares an md5 fingerprint of the concatenated
    ``compare_cols`` (null-tagged, unit-separated) instead of the
    columns themselves, so wide rows diff by exchanging 16-byte
    hashes, not payloads. One full-outer shuffle join on the key — the
    minimal cost of any diff; at 100 TB co-partition both snapshots on
    the key (bucketed writes) and the join is shuffle-free.

    Returns (key, status) with status in {'added','removed','changed'}.
    """
    def fp(df: DataFrame) -> DataFrame:
        tagged = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in compare_cols
        ]
        return df.select(F.col(key), F.md5(F.concat_ws("\x1f", *tagged)).alias("__fp"))

    o = fp(old).withColumnRenamed("__fp", "__fp_old")
    n = fp(new).withColumnRenamed("__fp", "__fp_new")
    return (
        o.join(n, key, "full_outer")
        .withColumn(
            "status",
            F.when(F.col("__fp_old").isNull(), F.lit("added"))
            .when(F.col("__fp_new").isNull(), F.lit("removed"))
            .when(F.col("__fp_old") != F.col("__fp_new"), F.lit("changed")),
        )
        .filter(F.col("status").isNotNull())
        .select(key, "status")
    )


def incremental_admit(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Ingest-time exact-dedup admission for a NEW batch against an
    EXISTING corpus (the batch-mode sibling of
    streaming/online_dedup.OnlineDeduper's exact tier): admit each
    batch document unless its text fingerprint already exists in the
    corpus OR an earlier (smaller-id) batch document claims it —
    min-id-wins within the batch, matching operators/dedup.exact_dedup.

    Scale shape: the corpus side is reduced to DISTINCT fingerprints
    before the join (16-byte md5 rows, aggregated map-side), then one
    left-anti equi-join on the fingerprint plus one within-batch
    min-id aggregation — no corpus rewrite, no pairwise term. At
    100 TB keep the corpus fingerprint table materialized and bucketed
    on the fingerprint (or front it with a bloom filter, see
    tests/test_plans.py's runtime bloom gate) so per-batch admission
    never rescans the text.

    Returns the admitted batch rows (id, fingerprint).
    """
    fp = F.md5(F.col(text_col))
    seen = corpus.select(fp.alias("fp")).distinct()
    cand = batch.select(F.col(id_col), fp.alias("fp"))
    fresh = cand.join(seen, "fp", "left_anti")
    keeper = fresh.groupBy("fp").agg(F.min(id_col).alias(id_col))
    return keeper.select(id_col, "fp")
