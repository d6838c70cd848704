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
    _ivf_assign,
    _lloyd_rounds,
    int_dot,
    ivf_probe_join,
    portable_band_frame,
    portable_pairs_join,
    pq_adc_rank,
    quantize_vec,
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


def refresh_lsh_index_incremental(
    spark: SparkSession,
    corpus_log: "TableLog",
    index_path: str,
    *,
    corpus_ident: str,
    to_version: int | None = None,
    max_delete_ids: int = 100_000,
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Advance the LSH index from its pinned corpus version to
    ``to_version`` by CHANGE DATA FEED instead of a full rebuild —
    the 100 TB shape: a daily 0.1% corpus append costs O(delta) band
    rows, not a corpus re-hash. EXACT for LSH because band rows are
    per-vector independent (no trained state): delete the removed
    ids' bands, append the inserted ids' bands, re-pin — the result
    is the same multiset a from-scratch build at ``to_version``
    produces (asserted in tests/test_ann_index.py). IVF/PQ have no
    exact incremental path (their centroids/codebooks are trained on
    the corpus — new vectors would be coded against stale training),
    so those tiers rebuild; that asymmetry is the documented reason
    LSH is the default index family for append-heavy corpora.

    Returns "noop" | "incremental" | "full" (full when no index
    exists yet, the CDF window expired, or the delete set exceeds
    ``max_delete_ids`` — the IN-list delete is driver-sized, and a
    delta that deletes more than that deserves a rebuild anyway)."""
    to = (
        corpus_log.latest_version() if to_version is None else to_version
    )
    pinned = pinned_corpus_version(
        spark,
        index_path,
        corpus_ident=corpus_ident,
        n_planes=n_planes,
        n_tables=n_tables,
        dim=dim,
    )
    if pinned == to:
        return "noop"

    def full() -> str:
        build_lsh_index(
            spark,
            corpus_log.read(version=to),
            index_path,
            corpus_ident=corpus_ident,
            corpus_version=to,
            n_planes=n_planes,
            n_tables=n_tables,
            dim=dim,
            id_col=id_col,
            vec_col=vec_col,
        )
        return "full"

    if pinned < 1:
        return full()
    try:
        changes = corpus_log.read_changes(pinned, to)
    except ValueError:
        return full()  # CDF window expired: give up delta, not truth
    idx = TableLog(spark, index_path)
    deleted = (
        changes.filter(F.col("_change_type") == "delete")
        .select(F.col(id_col))
        .distinct()
    )
    del_ids = [r[0] for r in deleted.limit(max_delete_ids + 1).collect()]
    if len(del_ids) > max_delete_ids:
        return full()
    if del_ids:
        idx.delete_where([("cand_id", "in", del_ids)])
    inserted = changes.filter(F.col("_change_type") == "insert").select(
        id_col, vec_col
    )
    band = portable_band_frame(
        inserted, "cand", n_planes, n_tables, dim, id_col, vec_col
    ).select(
        "cand_id",
        "cand_q",
        "cand_normsq",
        F.col("tb.t").alias("t"),
        F.col("tb.bucket").alias("bucket"),
    )
    idx.append(band)
    idx.commit(
        added=[],
        removed=[],
        data_change=False,
        txn=(_app_id(corpus_ident, n_planes, n_tables, dim), to),
        operation="ANN_INDEX_PIN",
    )
    return "incremental"


def fold_cdf_batch_into_lsh_index(
    spark: SparkSession,
    corpus_path: str,
    index_path: str,
    batch_df: DataFrame,
    batch_id: int,
    *,
    corpus_ident: str,
    max_delete_ids: int = 100_000,
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """One CDF micro-batch folded into the LSH index — the body of
    ``attach_lsh_index_maintenance``'s foreachBatch, module-level so
    the replay path is DIRECTLY testable: calling it twice with the
    same batch must change nothing the second time except re-advancing
    a lagging pin (the crash-between-commits recovery).

    Idempotence rests on the ``(maint app, max _commit_version)``
    stamp carried by the band append — the CORPUS version, not the
    stream's ``batch_id``. Batch ids restart at 0 for every new
    checkpoint directory, so a batch-id stamp from an earlier
    maintenance stream would make a re-attached stream skip folding
    REAL new changes while still advancing the pin — an index that
    claims a corpus version it does not contain (r11 fresh-eyes
    finding, regression-tested in test_ann_index.py). Corpus versions
    are monotone across streams, checkpoints, and the batch refresher,
    so the stamp survives all of them. Rows whose ``_commit_version``
    is ≤ the current pin are additionally filtered out before folding:
    a resumed old checkpoint can deliver versions the BATCH refresher
    already folded, and re-banding them would duplicate index rows.
    The delete half is naturally idempotent (deleting absent ids is a
    no-op).

    Transient-read caveat (documented, not a bug): the fold is
    delete-commit → append-commit → pin-commit, so a reader hitting
    the index BETWEEN those commits can see a state slightly ahead of
    the pin (deletes land first). Readers needing strict snapshot
    isolation should read the index table at a pinned tablelog
    snapshot version rather than latest; the pin refusal in
    ``query_lsh_index`` bounds the staleness either way."""
    app = _app_id(corpus_ident, n_planes, n_tables, dim)
    maint_app = app + "|maint"
    idx = TableLog(spark, index_path)
    batch_df.persist()
    try:
        max_v = batch_df.agg(
            F.max("_commit_version").alias("v")
        ).collect()[0]["v"]
        if max_v is None:
            return  # layout-only range: nothing to fold or pin
        max_v = int(max_v)
        if idx.last_txn_version(maint_app) >= max_v:
            # replayed range: bands landed; re-advance the pin if
            # the crash hit between the two commits
            if idx.last_txn_version(app) < max_v:
                idx.commit(
                    added=[], removed=[], data_change=False,
                    txn=(app, max_v), operation="ANN_INDEX_PIN",
                )
            return
        # drop rows already folded (pin = corpus version the index
        # holds); a resumed stale checkpoint may re-deliver them
        pinned = idx.last_txn_version(app)
        fresh = batch_df.filter(F.col("_commit_version") > F.lit(pinned))
        deleted = (
            fresh.filter(F.col("_change_type") == "delete")
            .select(F.col(id_col))
            .distinct()
        )
        del_ids = [
            r[0] for r in deleted.limit(max_delete_ids + 1).collect()
        ]
        if len(del_ids) > max_delete_ids:
            build_lsh_index(
                spark,
                TableLog(spark, corpus_path).read(version=max_v),
                index_path,
                corpus_ident=corpus_ident,
                corpus_version=max_v,
                n_planes=n_planes,
                n_tables=n_tables,
                dim=dim,
                id_col=id_col,
                vec_col=vec_col,
            )
            # stamp the maint range too so a replay of this batch is a
            # clean skip instead of an empty re-fold
            idx2 = TableLog(spark, index_path)
            idx2.commit(
                added=[], removed=[], data_change=False,
                txn=(maint_app, max_v), operation="ANN_INDEX_PIN",
            )
            return
        if del_ids:
            idx.delete_where([("cand_id", "in", del_ids)])
        band = portable_band_frame(
            fresh.filter(F.col("_change_type") == "insert").select(
                id_col, vec_col
            ),
            "cand",
            n_planes,
            n_tables,
            dim,
            id_col,
            vec_col,
        ).select(
            "cand_id",
            "cand_q",
            "cand_normsq",
            F.col("tb.t").alias("t"),
            F.col("tb.bucket").alias("bucket"),
        )
        idx.append(band, txn_app=maint_app, txn_version=max_v)
        idx.commit(
            added=[], removed=[], data_change=False,
            txn=(app, max_v), operation="ANN_INDEX_PIN",
        )
    finally:
        batch_df.unpersist()


def attach_lsh_index_maintenance(
    spark: SparkSession,
    corpus_path: str,
    index_path: str,
    checkpoint: str,
    *,
    corpus_ident: str,
    max_delete_ids: int = 100_000,
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger: dict | None = None,
):
    """CONTINUOUS index maintenance: tail the corpus tablelog's
    change-data-feed stream and fold every micro-batch into the LSH
    index as an incremental band update, so the index follows the
    corpus without anyone scheduling rebuilds — the serving shape at
    100 TB (the batch `refresh_lsh_index_incremental` is its
    run-once sibling).

    Exactly-once under replay: the band APPEND carries an
    idempotent-writer stamp ``(maintenance app, batch_id)`` — a
    redelivered batch sees its own stamp and skips straight to
    re-advancing the PIN commit if the crash landed between the two
    (bands updated, pin not yet moved). A delete set over
    ``max_delete_ids`` falls back to a full rebuild of the
    batch-end snapshot inside the batch. Readers are never wrong
    during lag: the pin trails the corpus head and
    ``query_lsh_index`` refuses a version the index has not reached.
    """
    from aoseventstreamer_spark.sources.tablelog_source import (
        register_tablelog_source,
    )

    register_tablelog_source(spark)
    start = pinned_corpus_version(
        spark,
        index_path,
        corpus_ident=corpus_ident,
        n_planes=n_planes,
        n_tables=n_tables,
        dim=dim,
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        fold_cdf_batch_into_lsh_index(
            spark,
            corpus_path,
            index_path,
            batch_df,
            batch_id,
            corpus_ident=corpus_ident,
            max_delete_ids=max_delete_ids,
            n_planes=n_planes,
            n_tables=n_tables,
            dim=dim,
            id_col=id_col,
            vec_col=vec_col,
        )

    stream = (
        spark.readStream.format("tablelog")
        .option("readChangeFeed", "true")
        .option("startingVersion", str(max(start, 0)))
        .load(corpus_path)
    )
    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"processingTime": "10 seconds"}))
        .start()
    )


# --------------------------------------------------------------------
# IVF tier: persisted coarse-quantizer assignments + centroids
# --------------------------------------------------------------------


def _ivf_app_id(
    corpus_ident: str, n_clusters: int, rounds: int, dim: int
) -> str:
    return (
        f"ann_ivf_index|corpus={corpus_ident}|k={n_clusters}"
        f"|rounds={rounds}|dim={dim}"
    )


def build_ivf_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_path: str,
    *,
    corpus_ident: str,
    corpus_version: int,
    n_clusters: int = 8,
    rounds: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the portable-IVF coarse quantizer: the ASSIGNMENTS
    table (cand_id, qv, cnormsq, cluster — the expensive Lloyd output
    over the whole corpus) and the CENTROIDS table (cluster, cv —
    K·dim ints, the driver-bounded state), both under ``index_path``
    and both pinned to ``corpus_version``. Query-time work is then a
    driver-side probe-list pick plus one cluster equi-join — no Lloyd
    rounds, no corpus re-scan beyond the index."""
    cand = corpus.select(
        F.col(id_col).alias("cand_id"), quantize_vec(vec_col).alias("qv")
    ).where(F.size("qv") == dim)
    cents = _lloyd_rounds(cand, "cand_id", n_clusters, rounds, dim)
    assigned = _ivf_assign(cand, cents).withColumn(
        "cnormsq", int_dot(F.col("qv"), F.col("qv"))
    )
    app = _ivf_app_id(corpus_ident, n_clusters, rounds, dim)
    at = TableLog(spark, f"{index_path}/assignments")
    at.overwrite(assigned, operation="ANN_IVF_BUILD")
    at.commit(
        added=[], removed=[], data_change=False,
        txn=(app, corpus_version), operation="ANN_INDEX_PIN",
    )
    ct = TableLog(spark, f"{index_path}/centroids")
    ct.overwrite(
        spark.createDataFrame(
            [(int(c), [int(x) for x in v]) for c, v in sorted(cents.items())],
            "cluster int, cv array<long>",
        ),
        operation="ANN_IVF_BUILD",
    )
    ct.commit(
        added=[], removed=[], data_change=False,
        txn=(app, corpus_version), operation="ANN_INDEX_PIN",
    )


def query_ivf_index(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    *,
    corpus_ident: str,
    corpus_version: int,
    n_clusters: int = 8,
    rounds: int = 2,
    n_probe: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """portable_ivf_pairs answered from the prebuilt assignments +
    centroids (hash-identical by shared ``ivf_probe_join``). BOTH
    tables must carry the pin — centroids and assignments are written
    in separate commits, so a crash between them must read as stale,
    not as a half-index."""
    app = _ivf_app_id(corpus_ident, n_clusters, rounds, dim)
    at = TableLog(spark, f"{index_path}/assignments")
    ct = TableLog(spark, f"{index_path}/centroids")
    for name, tl in (("assignments", at), ("centroids", ct)):
        pinned = (
            tl.last_txn_version(app) if tl.latest_version() > 0 else -1
        )
        if pinned != corpus_version:
            raise StaleIndexError(
                f"IVF index {name} at {index_path} pinned to corpus "
                f"version {pinned}, query is against {corpus_version}"
            )
    cents = {
        int(r["cluster"]): [int(x) for x in r["cv"]]
        for r in ct.read().collect()
    }
    qry = queries.select(
        F.col(id_col).alias("query_id"), quantize_vec(vec_col).alias("qv")
    ).where(F.size("qv") == dim)
    return ivf_probe_join(at.read(), cents, qry, n_probe)


# --------------------------------------------------------------------
# PQ tier: persisted codes + per-subspace codebooks
# --------------------------------------------------------------------


def _pq_app_id(
    corpus_ident: str, m_subspaces: int, n_clusters: int, rounds: int,
    dim: int,
) -> str:
    return (
        f"ann_pq_index|corpus={corpus_ident}|m={m_subspaces}"
        f"|k={n_clusters}|rounds={rounds}|dim={dim}"
    )


def build_pq_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_path: str,
    *,
    corpus_ident: str,
    corpus_version: int,
    m_subspaces: int = 4,
    n_clusters: int = 8,
    rounds: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the portable-PQ state: the CODES table (cand_id,
    code_0..code_{m-1} — m small ints per vector, the PQ bandwidth
    win made durable) and the CODEBOOKS table (m, cluster, cv — the
    m·K·(dim/m) ints of driver-bounded training state), both pinned
    to ``corpus_version``. Query time is then an ADC table build over
    the stored codebooks plus one broadcast join against codes — no
    Lloyd training, no full-vector corpus scan."""
    if dim % m_subspaces != 0:
        raise ValueError(f"dim {dim} not divisible by m {m_subspaces}")
    sub = dim // m_subspaces
    cand = corpus.select(
        F.col(id_col).alias("cand_id"), quantize_vec(vec_col).alias("full")
    ).where(F.size("full") == dim)
    codebooks: list[dict[int, list[int]]] = []
    for m in range(m_subspaces):
        sliced = cand.select(
            "cand_id", F.slice(F.col("full"), m * sub + 1, sub).alias("qv")
        )
        codebooks.append(
            _lloyd_rounds(sliced, "cand_id", n_clusters, rounds, sub)
        )
    encoded = cand
    for m in range(m_subspaces):
        encoded = _ivf_assign(
            encoded.withColumn(
                "qv", F.slice(F.col("full"), m * sub + 1, sub)
            ),
            codebooks[m],
            out=f"code_{m}",
        )
    encoded = encoded.select(
        "cand_id", *[F.col(f"code_{m}") for m in range(m_subspaces)]
    )
    app = _pq_app_id(corpus_ident, m_subspaces, n_clusters, rounds, dim)
    codes_t = TableLog(spark, f"{index_path}/codes")
    codes_t.overwrite(encoded, operation="ANN_PQ_BUILD")
    codes_t.commit(
        added=[], removed=[], data_change=False,
        txn=(app, corpus_version), operation="ANN_INDEX_PIN",
    )
    books_t = TableLog(spark, f"{index_path}/codebooks")
    books_t.overwrite(
        spark.createDataFrame(
            [
                (m, int(c), [int(x) for x in v])
                for m, cb in enumerate(codebooks)
                for c, v in sorted(cb.items())
            ],
            "m int, cluster int, cv array<long>",
        ),
        operation="ANN_PQ_BUILD",
    )
    books_t.commit(
        added=[], removed=[], data_change=False,
        txn=(app, corpus_version), operation="ANN_INDEX_PIN",
    )


def query_pq_index(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    *,
    corpus_ident: str,
    corpus_version: int,
    m_subspaces: int = 4,
    n_clusters: int = 8,
    rounds: int = 2,
    k: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """portable_pq_topk answered from the prebuilt codes + codebooks
    (hash-identical by shared ``pq_adc_rank``); both tables must
    carry the pin (a crash between the two build commits reads as
    stale, never as a half-index)."""
    sub = dim // m_subspaces
    app = _pq_app_id(corpus_ident, m_subspaces, n_clusters, rounds, dim)
    codes_t = TableLog(spark, f"{index_path}/codes")
    books_t = TableLog(spark, f"{index_path}/codebooks")
    for name, tl in (("codes", codes_t), ("codebooks", books_t)):
        pinned = (
            tl.last_txn_version(app) if tl.latest_version() > 0 else -1
        )
        if pinned != corpus_version:
            raise StaleIndexError(
                f"PQ index {name} at {index_path} pinned to corpus "
                f"version {pinned}, query is against {corpus_version}"
            )
    codebooks: list[dict[int, list[int]]] = [
        {} for _ in range(m_subspaces)
    ]
    for r in books_t.read().collect():
        codebooks[int(r["m"])][int(r["cluster"])] = [int(x) for x in r["cv"]]
    qry = queries.select(
        F.col(id_col).alias("query_id"), quantize_vec(vec_col).alias("full")
    ).where(F.size("full") == dim)
    return pq_adc_rank(
        codes_t.read(), qry, codebooks, n_clusters, k, sub
    )
