"""Persisted ANN index tier (VERDICT r9 item 3).

Every ANN query so far rebuilt its buckets per call; a 100 TB corpus
builds the index ONCE and serves many queries. This module
materializes the portable-LSH band table — one row per (vector,
hash-table): ``(cand_id, cand_q, cand_normsq, t, bucket)`` — as a
TABLELOG table, so the index inherits the commit protocol (atomic
publish, time travel, vacuum) instead of inventing its own files.

Version pinning: the index commit is stamped with an
idempotent-writer txn ``(app_id, corpus_version)`` where ``app_id``
encodes the LSH parameters and the corpus identity. A query against
the index first compares the pinned version with the corpus's
CURRENT version and refuses (``StaleIndexError``) or transparently
rebuilds — an index built at corpus version N must never silently
answer for version N+k.

Hash-exactness by construction: the builder and the from-scratch path
(operators/similarity.py ``portable_lsh_pairs``) share ONE band-frame
builder (``portable_band_frame``) and ONE pair join
(``portable_pairs_join``), so ``query_lsh_index`` returns the same
rows bit-for-bit (q_ann_lsh_persisted's oracle is q_ann_lsh_portable's
oracle, unchanged).

Scale shape: the band table is ~n_tables rows per vector, hash-
partitionable on ``bucket``; query-time work is ONE bucket equi-join
with the (small) query side broadcast — no corpus-side signature
recompute, no shuffle of the corpus beyond the index scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.similarity import (
    portable_band_frame,
    portable_pairs_join,
)
from aoseventstreamer_spark.tablelog import TableLog


class StaleIndexError(Exception):
    """The persisted index was built from an older corpus snapshot
    than the one being queried."""


def _app_id(
    corpus_ident: str, n_planes: int, n_tables: int, dim: int
) -> str:
    return (
        f"ann_lsh_index|corpus={corpus_ident}|planes={n_planes}"
        f"|tables={n_tables}|dim={dim}"
    )


def build_lsh_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_path: str,
    *,
    corpus_ident: str,
    corpus_version: int,
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Materialize the band table for ``corpus`` (the snapshot the
    caller read at ``corpus_version``) into the tablelog table at
    ``index_path``; returns the index table version carrying the pin.
    Rebuild = overwrite (readers pinned to the old index version keep
    it — same no-empty-window guarantee as any tablelog overwrite)."""
    band = portable_band_frame(
        corpus, "cand", n_planes, n_tables, dim, id_col, vec_col
    ).select(
        "cand_id",
        "cand_q",
        "cand_normsq",
        F.col("tb.t").alias("t"),
        F.col("tb.bucket").alias("bucket"),
    )
    idx = TableLog(spark, index_path)
    idx.overwrite(band, operation="ANN_INDEX_BUILD")
    return idx.commit(
        added=[],
        removed=[],
        data_change=False,
        txn=(_app_id(corpus_ident, n_planes, n_tables, dim), corpus_version),
        operation="ANN_INDEX_PIN",
    )


def pinned_corpus_version(
    spark: SparkSession,
    index_path: str,
    *,
    corpus_ident: str,
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int = 64,
) -> int:
    """The corpus version the index at ``index_path`` was built from
    (-1 when no index with these parameters exists)."""
    idx = TableLog(spark, index_path)
    if idx.latest_version() == 0:
        return -1
    return idx.last_txn_version(
        _app_id(corpus_ident, n_planes, n_tables, dim)
    )


def query_lsh_index(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    *,
    corpus_ident: str,
    corpus_version: int,
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Answer an ANN query from the PREBUILT band table: signatures
    are computed only for the (small, broadcast) query side; the
    corpus side is a plain scan of the index. Refuses with
    ``StaleIndexError`` when the pin does not match
    ``corpus_version`` — callers choose rebuild-vs-refuse explicitly
    (see ``build_or_refresh_lsh_index``)."""
    pinned = pinned_corpus_version(
        spark,
        index_path,
        corpus_ident=corpus_ident,
        n_planes=n_planes,
        n_tables=n_tables,
        dim=dim,
    )
    if pinned != corpus_version:
        raise StaleIndexError(
            f"index at {index_path} pinned to corpus version {pinned}, "
            f"query is against version {corpus_version} — rebuild the "
            "index or query the pinned snapshot"
        )
    band = (
        TableLog(spark, index_path)
        .read()
        .select(
            "cand_id",
            "cand_q",
            "cand_normsq",
            F.struct(
                F.col("t").cast("int").alias("t"),
                F.col("bucket").alias("bucket"),
            ).alias("tb"),
        )
    )
    qry = portable_band_frame(
        queries, "query", n_planes, n_tables, dim, id_col, vec_col
    )
    return portable_pairs_join(band, qry)


def build_or_refresh_lsh_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_path: str,
    *,
    corpus_ident: str,
    corpus_version: int,
    **params,
) -> bool:
    """Idempotent build: no-op when the pin already matches
    ``corpus_version`` (returns False), else (re)build (returns
    True). The check-then-build is not transactional — two racing
    refreshers both rebuild to the SAME pinned content, which the
    overwrite serializes; the pin txn makes replays idempotent."""
    hashable = {
        k: params.get(k, d)
        for k, d in (("n_planes", 4), ("n_tables", 4), ("dim", 64))
    }
    if (
        pinned_corpus_version(
            spark, index_path, corpus_ident=corpus_ident, **hashable
        )
        == corpus_version
    ):
        return False
    build_lsh_index(
        spark,
        corpus,
        index_path,
        corpus_ident=corpus_ident,
        corpus_version=corpus_version,
        **params,
    )
    return True
