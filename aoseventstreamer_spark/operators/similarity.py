"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB design requires:

- brute-force cosine top-k: correct baseline. The query side is tiny
  and broadcast; the candidate side streams through one scan; dot
  products are zip_with/aggregate folds (JVM, no Python). Top-k is a
  per-query window — shuffle keyed by query_id, never a global sort.
- LSH-bucketed ANN: random-hyperplane signatures bucket both sides;
  candidates come from an equi-join on the bucket key, so cost is
  O(n · bucket_size), not O(n · q). Recall is tunable via n_planes /
  n_tables.

Hyperplanes have two derivation paths:

- **literal planes (the scale path, used by the bulk operators)**: the
  plane matrix is generated driver-side from a fixed seed and embedded
  as array literals — the per-row cost is a pure multiply-add fold,
  with no per-row hash evaluation. This is the Spark analogue of
  broadcasting a projection matrix.
- **per-row derivation (fallback)**: when the vector dimension is not
  known at plan-build time, plane components are hash-derived
  (xxhash64) per row, sized from the data itself so a wrong dim can
  never silently collapse every row into one bucket.

r9 fresh-eyes review (rounds 4-5 rotation): (1) FIXED — zero-norm
vectors produced NaN cosine, and NaN is the LARGEST double under
Spark's desc ordering, so one all-zero embedding surfaced as every
query's top neighbor in brute-force/LSH/IVF top-k; zero-norm rows are
now excluded on both sides like dim-mismatched rows (near-dup pair
paths were already safe: `sim >= threshold` is false for NaN).
(2) Checked, sound: fused/join bucket formulas match (tested), fused
per-partition pair dedup is globally correct (each candidate row in
one partition), multiprobe XOR never touches the table prefix
(flipped bits < n_planes), `cosine_near_dup_pairs(n_planes=None)`
pays one corpus count() by documented design.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double_vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double fold (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k of each query vector against all candidates.

    Pre-computes norms once per side, broadcasts the query side, and
    keeps the entire scoring loop in codegen'd array expressions.

    ``exclude_self`` drops candidates whose id EQUALS the query id —
    right for self-search (queries drawn from the candidate table, as
    every registered query here does); pass False when the two sides
    use unrelated id spaces, or a legitimate neighbor that happens to
    share the query's id number would silently lose its slot.
    """
    from ..session import ensure_parallelism

    embeddings = ensure_parallelism(embeddings)
    # zero-norm vectors are EXCLUDED like dim-mismatched ones: their
    # cosine is 0/0 = NaN, and NaN is the LARGEST double under Spark's
    # desc ordering — one all-zero embedding would otherwise surface
    # as every query's top neighbor (r9 fresh-eyes finding)
    cand = (
        embeddings.select(
            F.col(id_col).alias("cand_id"),
            as_double_vec(vec_col).alias("cand_vec"),
        )
        .withColumn("cand_norm", l2_norm(F.col("cand_vec")))
        .filter(F.col("cand_norm") > 0)
    )
    qry = (
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double_vec(vec_col).alias("query_vec"),
        )
        .withColumn("query_norm", l2_norm(F.col("query_vec")))
        .filter(F.col("query_norm") > 0)
    )

    join_cond = (
        F.col("query_id") != F.col("cand_id") if exclude_self else F.lit(True)
    )
    scored = (
        cand.join(F.broadcast(qry), join_cond)
        .withColumn(
            "sim",
            dot(F.col("query_vec"), F.col("cand_vec"))
            / (F.col("query_norm") * F.col("cand_norm")),
        )
        .select("query_id", "cand_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            F.col("cand_id").alias("neighbor_id"),
            F.round("sim", 4).alias("sim"),
        )
    )


@lru_cache(maxsize=None)
def _plane_values(plane: int, dim: int) -> tuple[float, ...]:
    """Deterministic pseudo-random hyperplane components in [-1, 1),
    generated driver-side (numpy's legacy RandomState is bit-stable
    across platforms and versions by contract)."""
    import numpy as np

    rs = np.random.RandomState(0xA05 + plane)
    return tuple(float(x) for x in rs.uniform(-1.0, 1.0, size=dim))


def _hyperplane(plane: int, vec: Column, dim: int | None = None) -> Column:
    """Hyperplane column. With ``dim`` (the scale path) the plane is an
    array LITERAL — evaluated once at plan build, broadcast with the
    plan, per-row cost zero. Without ``dim``, components are
    hash-derived per row, sized from the data itself, so a mismatched
    dim can never null out the dot products and silently collapse
    every row into one bucket."""
    if dim is not None:
        return F.array(*[F.lit(v) for v in _plane_values(plane, dim)])
    return F.transform(
        F.sequence(F.lit(0), F.size(vec) - 1),
        lambda i: (F.pmod(F.xxhash64(F.lit(plane), i), F.lit(20001)) - 10000) / 10000.0,
    )


def lsh_bucket(vec: Column, n_planes: int, table: int = 0, dim: int | None = None) -> Column:
    """Random-hyperplane signature: one sign bit per plane,
    concatenated into a string bucket key (prefixed by the table index
    so different tables never collide)."""
    bits = [
        F.when(
            dot(vec, _hyperplane(table * n_planes + p, vec, dim)) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for p in range(n_planes)
    ]
    return F.concat(F.lit(f"{table}:"), *bits)


def lsh_buckets(vec: Column, n_planes: int, n_tables: int, dim: int | None = None) -> Column:
    """Multi-table LSH (the textbook AND/OR construction): n_planes
    sign bits ANDed within a table, n_tables tables ORed by taking the
    union of candidates. Raises recall P(match) = 1-(1-p^planes)^tables
    without scoring more than the bucket slices."""
    return F.array(*[lsh_bucket(vec, n_planes, t, dim) for t in range(n_tables)])


def _probe_dim(df: DataFrame, vec_col: str) -> int | None:
    """Vector dimension from the first NON-NULL row (cheap driver-side
    probe); None only when no row has a vector — callers then return
    empty. Probing an unfiltered first() would misread a leading null
    vector as 'empty input' and silently drop the whole dataset."""
    row = (
        df.select(F.size(as_double_vec(vec_col)).alias("d"))
        .filter(F.col("d").isNotNull())
        .first()
    )
    return None if row is None or row["d"] is None else int(row["d"])


def _packed_buckets_udf(n_planes: int, n_tables: int, dim: int):
    """Arrow-vectorized bucket kernel: one BLAS matmul per batch
    computes every sign bit of every table, packed into longs
    (table << n_planes | bits) — integer join keys, no string
    concatenation. This is the one place the engine uses Python
    (embedding similarity, per the design stance): per-element
    higher-order-function folds are interpreted expression-tree walks,
    ~10-100x slower than one Arrow-batched matmul, and the plane
    matrix rides inside the serialized closure exactly like a
    broadcast variable."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [_plane_values(t * n_planes + p, dim) for t in range(n_tables) for p in range(n_planes)]
    )  # (n_tables*n_planes, dim)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    @pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        import numpy as _np
        import pandas as _pd

        if len(v) == 0:
            return _pd.Series([], dtype=object)
        m = _np.vstack(v.to_numpy())  # (n, dim)
        signs = (m @ planes.T) >= 0  # (n, n_tables*n_planes)
        cols = [
            (signs[:, t * n_planes : (t + 1) * n_planes] @ weights) | (t << n_planes)
            for t in range(n_tables)
        ]
        return _pd.Series(list(_np.stack(cols, axis=1)))

    return buckets


def _cosine_udf():
    """Arrow-vectorized cosine between two array<double> columns."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as _np
        import pandas as _pd

        if len(a) == 0:
            return _pd.Series([], dtype=float)
        ma, mb = _np.vstack(a.to_numpy()), _np.vstack(b.to_numpy())
        num = _np.einsum("ij,ij->i", ma, mb)
        den = _np.linalg.norm(ma, axis=1) * _np.linalg.norm(mb, axis=1)
        return _pd.Series(num / den)

    return cos


def lsh_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    strategy: str = "fused",
    n_probes: int = 0,
) -> DataFrame:
    """Approximate NN: score only candidates sharing one of the query's
    hyperplane-sign buckets (multi-table OR for recall).

    ``n_probes`` > 0 enables margin-aware multiprobe (fused strategy):
    per table, the query additionally probes the ``n_probes`` buckets
    reached by flipping its lowest-|margin| sign bits — recall rises
    steeply (measured on the fixture: see RESULTS.md) without growing
    the candidate-side index or adding tables. Probe selection needs
    the query-side margins, which live in the fused kernel's closure
    by construction, so it is a fused-only feature.

    Two physical strategies with IDENTICAL output:

    - ``"fused"`` (default): the query side — the broadcast side by
      contract in ANN top-k — is materialized driver-side ONCE, its
      buckets computed with the same plane matrix, and the whole
      bucket→match→cosine pipeline runs as a SINGLE mapInPandas pass
      over the candidate partitions (one matmul for the signs, one
      hash-merge against the in-closure query bucket table, one
      einsum for the cosines). Per-partition pair dedup is globally
      correct because each candidate row lives in exactly one
      partition. One Python stage, zero joins, no pre-score
      dropDuplicates exchange — the only shuffle left is the final
      per-query top-k window over the (small) matched pairs. At scale
      this is the textbook shape: queries ride with the closure like
      a broadcast variable while 100 TB of candidates stream by.
    - ``"join"``: both sides bucket via the Arrow kernel and meet in a
      bucket equi-join. Use when the query side is itself too large to
      broadcast (then neither side fits in a closure and the shuffle
      join is the right plan). Construction stays fully lazy.

    Rows whose vector length differs from the (declared or probed)
    dimension are excluded — with a fixed-size plane matrix they would
    all collapse into one bucket and cross-match each other (and would
    break the batch matmul).

    Pass ``dim`` (the declared vector dimension) on the scale path: it
    skips the driver-side one-row probe job (the fused strategy still
    runs one tiny job to collect the query side — that job IS the
    broadcast)."""
    from ..session import ensure_parallelism

    if strategy not in ("fused", "join"):
        raise ValueError(f"unknown strategy: {strategy!r} (use 'fused' or 'join')")
    if dim is None:
        dim = _probe_dim(embeddings, vec_col)
    if dim is None:  # empty input
        spark = embeddings.sparkSession
        return spark.createDataFrame([], "query_id long, neighbor_id long, sim double")

    if n_probes and strategy != "fused":
        raise ValueError("n_probes requires strategy='fused'")
    if strategy == "fused":
        scored = _fused_bucket_score(
            embeddings, queries, n_planes, n_tables, id_col, vec_col, dim,
            n_probes=n_probes,
        )
        if scored is None:  # no valid query vectors
            spark = embeddings.sparkSession
            return spark.createDataFrame(
                [], "query_id long, neighbor_id long, sim double"
            )
    else:
        buckets = _packed_buckets_udf(n_planes, n_tables, dim)
        # zero-norm exclusion: same rationale as brute_force_topk
        # (NaN sim would win the desc top-k window)
        cand = (
            ensure_parallelism(embeddings)
            .select(
                F.col(id_col).alias("cand_id"), as_double_vec(vec_col).alias("cand_vec")
            )
            .filter(
                (F.size("cand_vec") == F.lit(dim))
                & (l2_norm(F.col("cand_vec")) > 0)
            )
            .withColumn("bucket", F.explode(buckets(F.col("cand_vec"))))
        )
        qry = (
            queries.select(
                F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("query_vec")
            )
            .filter(
                (F.size("query_vec") == F.lit(dim))
                & (l2_norm(F.col("query_vec")) > 0)
            )
            .withColumn("bucket", F.explode(buckets(F.col("query_vec"))))
        )
        cos = _cosine_udf()
        scored = (
            cand.join(F.broadcast(qry), on="bucket")
            .filter(F.col("query_id") != F.col("cand_id"))
            .dropDuplicates(["query_id", "cand_id"])
            .withColumn("sim", cos(F.col("query_vec"), F.col("cand_vec")))
            .select("query_id", "cand_id", "sim")
        )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            F.col("cand_id").alias("neighbor_id"),
            F.round("sim", 4).alias("sim"),
        )
    )


def _fused_bucket_score(
    embeddings: DataFrame,
    queries: DataFrame,
    n_planes: int,
    n_tables: int,
    id_col: str,
    vec_col: str,
    dim: int,
    n_probes: int = 0,
) -> DataFrame | None:
    """One-pass bucket+match+cosine kernel over candidate partitions
    (see lsh_ann_topk ``strategy='fused'``). Returns the scored
    (query_id, cand_id, sim) pairs, or None when the query side has no
    valid vectors. The query side is collected driver-side — it is the
    broadcast side by contract and rides inside the serialized closure
    exactly like a broadcast variable."""
    import numpy as np

    q_pdf = (
        queries.select(
            F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("query_vec")
        )
        .filter(F.size("query_vec") == F.lit(dim))
        .toPandas()
    )
    if len(q_pdf) == 0:
        return None
    q_ids = q_pdf["query_id"].to_numpy()
    q_mat = np.vstack(q_pdf["query_vec"].to_numpy())  # (nq, dim)
    q_norm = np.linalg.norm(q_mat, axis=1)
    nz = q_norm > 0  # zero-norm queries: cosine is NaN — exclude
    if not nz.all():
        q_ids, q_mat, q_norm = q_ids[nz], q_mat[nz], q_norm[nz]
        if len(q_ids) == 0:
            return None

    planes = np.array(
        [
            _plane_values(t * n_planes + p, dim)
            for t in range(n_tables)
            for p in range(n_planes)
        ]
    )  # (n_tables*n_planes, dim)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    def packed(m: "np.ndarray") -> "np.ndarray":
        """(n, n_tables) packed bucket keys — same formula as
        _packed_buckets_udf, so fused ≡ join output."""
        signs = (m @ planes.T) >= 0
        return np.stack(
            [
                (signs[:, t * n_planes : (t + 1) * n_planes] @ weights)
                | (t << n_planes)
                for t in range(n_tables)
            ],
            axis=1,
        )

    q_keys = packed(q_mat)  # (nq, n_tables)
    bucket_keys = [q_keys.ravel()]
    bucket_qis = [np.repeat(np.arange(len(q_ids)), n_tables)]
    if n_probes > 0:
        # margin-aware multiprobe (Lv et al. 2007): within each table,
        # also probe the buckets obtained by flipping the sign bits the
        # query is CLOSEST to (smallest |dot| margin) — those are the
        # planes most likely to have split a true neighbor away. Each
        # probe flips exactly one bit, so recall rises without more
        # tables (no growth of the candidate-side index); the key's
        # table prefix (t << n_planes) is untouched because flipped
        # bits are always < n_planes.
        margins = np.abs(q_mat @ planes.T)  # (nq, n_tables*n_planes)
        m = min(n_probes, n_planes)
        qi_base = np.arange(len(q_ids))
        for t in range(n_tables):
            mt = margins[:, t * n_planes : (t + 1) * n_planes]
            order = np.argsort(mt, axis=1, kind="stable")[:, :m]  # (nq, m)
            for j in range(m):
                bucket_keys.append(q_keys[:, t] ^ (1 << order[:, j]).astype(np.int64))
                bucket_qis.append(qi_base)
    q_bucket_tbl = pd.DataFrame(
        {
            "bucket": np.concatenate(bucket_keys),
            "qi": np.concatenate(bucket_qis),
        }
    ).drop_duplicates()

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.vstack(pdf["cand_vec"].to_numpy())  # (n, dim)
            # one (n, dim) @ (dim, tables*planes) matmul + hash merge
            c_keys = packed(m)  # (n, n_tables)
            cand_tbl = pd.DataFrame(
                {
                    "bucket": c_keys.ravel(),
                    "ci": np.repeat(np.arange(len(pdf)), n_tables),
                }
            )
            pairs = (
                cand_tbl.merge(q_bucket_tbl, on="bucket")[["qi", "ci"]]
                .drop_duplicates()
            )
            if len(pairs) == 0:
                continue
            qi = pairs["qi"].to_numpy()
            ci = pairs["ci"].to_numpy()
            cand_ids = pdf["cand_id"].to_numpy()[ci]
            keep = q_ids[qi] != cand_ids  # exclude self-matches
            if not keep.any():
                continue
            qi, ci, cand_ids = qi[keep], ci[keep], cand_ids[keep]
            mc = m[ci]
            c_norm = np.linalg.norm(mc, axis=1)
            nz_c = c_norm > 0  # zero-norm candidates: NaN sim — drop
            if not nz_c.all():
                qi, ci, cand_ids, mc, c_norm = (
                    qi[nz_c], ci[nz_c], cand_ids[nz_c], mc[nz_c], c_norm[nz_c]
                )
                if len(qi) == 0:
                    continue
            sims = np.einsum("ij,ij->i", q_mat[qi], mc) / (
                q_norm[qi] * c_norm
            )
            yield pd.DataFrame(
                {"query_id": q_ids[qi], "cand_id": cand_ids, "sim": sims}
            )

    # NO ensure_parallelism here, deliberately: parquet scans already
    # split by maxPartitionBytes (a single 100 TB table arrives as
    # ~10^5 splits), so the kernel parallelizes with the scan at any
    # real scale; repartitioning an under-split FIXTURE file into N
    # partitions costs a shuffle plus N Python round-trips that dwarf
    # the one matmul the kernel runs (measured 1.9 s → 0.4 s at sf0.1)
    cand = embeddings.select(
        F.col(id_col).alias("cand_id"), as_double_vec(vec_col).alias("cand_vec")
    ).filter(F.size("cand_vec") == F.lit(dim))
    return cand.mapInPandas(score, "query_id long, cand_id long, sim double")


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN: a KMeans coarse quantizer partitions
    the candidates into n_clusters lists; each query scores only the
    n_probe nearest lists.

    Scale shape: KMeans training is distributed MLlib; the probe
    assignment is a broadcast join against the (tiny) centroid table;
    candidate scoring is an equi-join on cluster id. With
    n_probe == n_clusters this is EXACTLY brute force (tested), so
    recall degrades smoothly and measurably as n_probe shrinks.

    An r12 experiment replaced the MLlib fit with the portable-Lloyd
    core (VERDICT r12 item 6's hypothesis: MLlib's ~20-stage job
    chain dominates at small SF). MEASURED SLOWER and reverted:
    isolated A/B cold 10.6 vs 10.2 s (wash), warm 3.5 vs 4.3 s
    (worse) — the integer-HOF assignment is interpreted per element
    while MLlib's transform is JVM-native, and the fit's job chain
    amortizes across the session. q_ann_ivf_portable remains the
    deterministic twin for engines that need replayability.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    cand = embeddings.select(
        F.col(id_col).alias("cand_id"), as_double_vec(vec_col).alias("cand_vec")
    )
    with_features = cand.withColumn("features", array_to_vector("cand_vec"))
    model = KMeans(k=n_clusters, seed=42, maxIter=10).fit(with_features)
    assigned = (
        model.transform(with_features)
        .select("cand_id", "cand_vec", F.col("prediction").alias("cluster"))
        .withColumn("cand_norm", l2_norm(F.col("cand_vec")))
        .filter(F.col("cand_norm") > 0)  # NaN sim wins desc — exclude
    )

    spark = embeddings.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster int, centroid array<double>",
    )

    qry = (
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double_vec(vec_col).alias("query_vec"),
        )
        .withColumn("query_norm", l2_norm(F.col("query_vec")))
        .filter(F.col("query_norm") > 0)
    )
    # nearest n_probe centroids per query (centroid table is tiny)
    q_cluster = (
        qry.crossJoin(F.broadcast(centroids))
        .withColumn(
            "dist2",
            F.aggregate(
                F.zip_with(
                    F.col("query_vec"), F.col("centroid"), lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("dist2"), F.col("cluster"))
            ),
        )
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "query_vec", "query_norm", "cluster")
    )

    scored = (
        assigned.join(F.broadcast(q_cluster), on="cluster")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn(
            "sim",
            dot(F.col("query_vec"), F.col("cand_vec"))
            / (F.col("query_norm") * F.col("cand_norm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            F.col("cand_id").alias("neighbor_id"),
            F.round("sim", 4).alias("sim"),
        )
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int | None = None,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    cache_handles: list | None = None,
    target_bucket_rows: int = 128,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via multi-table LSH
    bucketing: only same-bucket pairs are scored; pairs matching in
    several tables are deduped before scoring. Arrow-vectorized bucket
    and cosine kernels; rows with a mismatched vector length are
    excluded (see lsh_ann_topk). Pass ``dim`` to skip the driver-side
    probe job (see lsh_ann_topk).

    ``n_planes=None`` (default) SCALES the signature width with the
    corpus: ceil(log2(n / target_bucket_rows)) planes, so expected
    bucket population stays ~target_bucket_rows at every SF and
    in-bucket pair work stays LINEAR in n. The r8 sf1 probe measured
    the old fixed 4-plane default (16 buckets/table) at 35× the sf0.1
    wall for 10× the rows — textbook quadratic in-bucket blowup; the
    count job this costs is one narrow pass. Pass an explicit
    ``n_planes`` to pin the structure (tests; recall studies).

    Caching: the bucketed side is ``.persist()``-ed (MEMORY_AND_DISK)
    because the self-join references it twice and the Arrow bucket
    kernel is the dominant cost. The cache lives until Spark's
    ContextCleaner collects it; pass ``cache_handles`` (a list) to
    receive the persisted frame and ``unpersist()`` it deterministically
    after the consuming action."""
    import math

    from ..session import ensure_parallelism

    if dim is None:
        dim = _probe_dim(embeddings, vec_col)
    if dim is None:  # empty input
        spark = embeddings.sparkSession
        return spark.createDataFrame([], "id_a long, id_b long, sim double")
    if n_planes is None:
        n = embeddings.count()
        n_planes = max(4, math.ceil(math.log2(max(n, 1) / target_bucket_rows)))
    buckets = _packed_buckets_udf(n_planes, n_tables, dim)
    vecs = (
        ensure_parallelism(embeddings, key=id_col)
        .select(F.col(id_col).alias("id"), as_double_vec(vec_col).alias("vec"))
        .filter(F.size("vec") == F.lit(dim))
    )
    side = (
        vecs.withColumn("bucket", F.explode(buckets(F.col("vec"))))
        # ids only past this point: the candidate join and the
        # multi-table dedup shuffle must move 16-byte pair rows, not
        # two 64-double vectors per candidate (measured 4.3 MB of
        # input ballooning into a 217 MB shuffle). Vectors are
        # re-attached once, AFTER dedup, by id.
        .select("id", "bucket")
        # persisted: the self-join below references this frame twice,
        # and without the cache the Arrow bucket kernel — the dominant
        # cost — would run over the full corpus once per branch
        .persist()
    )
    if cache_handles is not None:
        cache_handles.append(side)
    cos = _cosine_udf()
    a, b = side.alias("a"), side.alias("b")
    pairs = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.join(vecs.select(F.col("id").alias("id_a"), F.col("vec").alias("va")), "id_a")
        .join(vecs.select(F.col("id").alias("id_b"), F.col("vec").alias("vb")), "id_b")
        .withColumn("sim", cos(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 4).alias("sim"))
    )


def semantic_dedup(
    embeddings: DataFrame,
    tau: float = 0.30,
    n_clusters: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): partition the corpus into clusters, then within
    each cluster drop every item whose cosine similarity to a
    LOWER-id cluster member reaches ``tau`` (greedy keep-lowest-id —
    idempotent: re-running on the survivors removes nothing).

    ``cluster_col=None`` trains a distributed MLlib KMeans coarse
    quantizer (the SemDeDup recipe; engine-specific, so rows-only in
    the driver harness). Passing an existing column (e.g. ``label``)
    makes the whole operator deterministic and SQL-expressible — that
    variant is oracle-checked as ``q_semantic_dedup``.

    The threshold compare goes through integer 1e-4 units
    (``round(sim*10000) >= round(tau*10000)``) so engines that produce
    the identical rounded double agree on every boundary pair.

    Scale shape: pairwise work is quadratic ONLY within a cluster, so
    per-cluster population must stay bounded as the corpus grows.
    ``n_clusters=None`` (default) follows the paper's recipe and sets
    k = max(16, ceil(sqrt(N))) — in-cluster pair work then grows
    ~N^1.5 overall instead of N² (the r8 sf1 probe measured the old
    fixed k=16 at 28× the sf0.1 wall for 10× the rows). Pair
    generation is an equi-join on cluster id — never all-pairs across
    the corpus. Returns the KEPT rows as (id, cluster).
    """
    base = embeddings.select(
        F.col(id_col).alias("id"), as_double_vec(vec_col).alias("vec"),
        *([F.col(cluster_col).alias("cluster")] if cluster_col else []),
    )
    if cluster_col is None:
        import math

        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        if n_clusters is None:
            n_clusters = max(16, math.ceil(math.sqrt(embeddings.count())))
        # an r12 experiment swapped this MLlib fit for the portable
        # Lloyd core — measured SLOWER (isolated A/B cold+warms
        # 6.9/3.5/3.2 s MLlib vs 11.1/5.4/4.9 s portable at sf0.1:
        # k ~ sqrt(N) clusters make the interpreted HOF assignment
        # K·dim·N element ops, while MLlib's transform is JVM-native)
        # and reverted.
        feat = base.withColumn("features", array_to_vector("vec"))
        model = KMeans(k=n_clusters, seed=42, maxIter=10).fit(feat)
        base = model.transform(feat).select(
            "id", "vec", F.col("prediction").alias("cluster")
        )
    base = base.withColumn("norm", l2_norm(F.col("vec")))
    a, b = base.alias("a"), base.alias("b")
    tau_units = int(round(tau * 10000))
    dup_ids = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .withColumn(
            "sim_units",
            F.round(
                dot(F.col("a.vec"), F.col("b.vec"))
                / (F.col("a.norm") * F.col("b.norm"))
                * 10000
            ).cast("long"),
        )
        .filter(F.col("sim_units") >= F.lit(tau_units))
        .select(F.col("b.id").alias("id"))
        .distinct()
    )
    return base.join(dup_ids, "id", "left_anti").select("id", "cluster")


# --------------------------------------------------------------------------
# Engine-portable integer LSH — the hash-exact variant of the ANN
# candidate structure (the same discipline operators/hll.py applies to
# cardinality: the STRUCTURE is value-verified cross-engine, floats are
# derived display values).
# --------------------------------------------------------------------------

Q_SCALE = 1 << 20  # embedding quantization: floor(x * 2^20)
W_SPAN = 1 << 20  # plane weights in [-2^20, 2^20]


def _int_plane(table: int, plane: int, dim: int) -> list[int]:
    """md5-derived integer hyperplane, reproducible in ANSI SQL:
    w[d] = md5_long('ann:t:p:d') % (2S+1) - S."""
    import hashlib

    s = W_SPAN
    return [
        int(hashlib.md5(f"ann:{table}:{plane}:{d}".encode()).hexdigest()[:15], 16)
        % (2 * s + 1)
        - s
        for d in range(dim)
    ]


def quantize_vec(col: Column | str, scale: int = Q_SCALE) -> Column:
    """floor(x * 2^20) per component as BIGINT — floor, not round: a
    float32 times a power of two is exact in double, so a .5 tie is
    possible and the two engines round ties differently; floor is
    unambiguous. Every downstream sum stays under 2^53, so even an
    engine that folds in double is exact."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.floor(x.cast("double") * scale).cast("long"))


def int_dot(a: Column, b: Column) -> Column:
    """Exact int64 dot product (zip_with + fold, JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def portable_lsh_pairs(
    embeddings: DataFrame,
    queries: DataFrame,
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table random-hyperplane LSH over INTEGER-quantized
    embeddings: every sign bit, bucket id, and the per-pair integer
    dot/norm evidence is exact int64 arithmetic a DuckDB oracle
    replays bit-for-bit — the first hash-exact member of the ANN
    family (q_ann_lsh et al. stay rows-only: their xxhash64/float
    planes are engine-specific).

    Returns one row per colliding (query, candidate) pair:
    (query_id, cand_id, n_tables_hit, dot_scaled, qnormsq, cnormsq) —
    dot_scaled/Q_SCALE² and the norms reconstruct cosine as a derived
    float; ranking by cross-multiplied integers needs no float at all.

    Scale shape: same as lsh_ann_topk — bucket equi-join, query side
    broadcast, candidates never pair outside a shared bucket."""
    cand = portable_band_frame(
        embeddings, "cand", n_planes, n_tables, dim, id_col, vec_col
    )
    qry = portable_band_frame(
        queries, "query", n_planes, n_tables, dim, id_col, vec_col
    )
    return portable_pairs_join(cand, qry)


def _portable_sig(
    qv: Column, n_planes: int, n_tables: int, dim: int
) -> Column:
    """array<struct<t,bucket>> of the n_tables portable LSH cells for
    one quantized vector — md5-derived integer planes, exact int64."""
    cells = []
    for t in range(n_tables):
        bucket = F.lit(0)
        for p in range(n_planes):
            w = F.array(*[F.lit(v) for v in _int_plane(t, p, dim)])
            bit = (int_dot(qv, w) >= 0).cast("int")
            bucket = bucket + bit * (1 << p)
        cells.append(
            F.struct(F.lit(t).alias("t"), bucket.cast("long").alias("bucket"))
        )
    return F.array(*cells)


def portable_band_frame(
    df: DataFrame,
    prefix: str,
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One row per (vector, table): ({prefix}_id, {prefix}_q,
    {prefix}_normsq, tb=struct<t,bucket>). SHARED by the from-scratch
    join (portable_lsh_pairs) and the persisted index builder
    (operators/ann_index.py) so the two paths are hash-identical by
    construction, not by parallel maintenance."""
    q = df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        quantize_vec(vec_col).alias(f"{prefix}_q"),
    ).where(F.size(f"{prefix}_q") == dim)
    return q.withColumn(
        f"{prefix}_normsq", int_dot(F.col(f"{prefix}_q"), F.col(f"{prefix}_q"))
    ).withColumn(
        "tb", F.explode(_portable_sig(F.col(f"{prefix}_q"), n_planes, n_tables, dim))
    )


def portable_pairs_join(cand: DataFrame, qry: DataFrame) -> DataFrame:
    """Bucket equi-join + per-pair integer evidence over two band
    frames (cand_* big side, query_* broadcast side)."""
    pairs = cand.join(
        F.broadcast(qry),
        (cand["tb"] == qry["tb"]) & (F.col("query_id") != F.col("cand_id")),
    )
    return (
        pairs.groupBy("query_id", "cand_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tables_hit"),
            F.first(int_dot(F.col("query_q"), F.col("cand_q"))).alias("dot_scaled"),
            F.first("query_normsq").alias("qnormsq"),
            F.first("cand_normsq").alias("cnormsq"),
        )
    )


# --------------------------------------------------------------------------
# Engine-portable integer IVF — the same discipline extended to the
# coarse-quantizer family (VERDICT r6 item 5): md5-derived seeding,
# fixed Lloyd rounds in exact int64 arithmetic, portable floor
# division — so assignments and probe lists hash-compare in DuckDB the
# way portable_lsh_pairs' buckets do. q_ann_ivf (MLlib KMeans, float)
# stays the production path; this is its cross-engine-verifiable twin.
# --------------------------------------------------------------------------


def _floordiv_py(a: int, n: int) -> int:
    """Python // is true floor division — the reference semantics the
    SQL formula (a - ((a % n + n) % n)) / n reproduces on engines
    whose integer division truncates (Spark div) or floors (DuckDB //):
    the pmod subtraction makes the numerator exactly divisible, so the
    rounding mode stops mattering."""
    return a // n


def _ivf_dist2(qq: Column, qv: Column, cv: list[int]) -> Column:
    """Exact integer squared distance via qq - 2*q·c + c·c with the
    centroid folded in as literals (c·c precomputed in Python)."""
    carr = F.array(*[F.lit(int(v)).cast("long") for v in cv])
    cc = sum(int(v) * int(v) for v in cv)
    return qq - 2 * int_dot(qv, carr) + F.lit(cc).cast("long")


def _int_dot_sql(a_sql: str, b_sql: str) -> str:
    """SQL-string twin of int_dot — identical expression after parsing.

    Centroid expressions embed K × dim literal nodes; building them
    through the Column API costs one py4j round trip per node
    (measured: ~2 s of pure DRIVER time per _ivf_assign build, paid
    once per Lloyd round per subspace). One F.expr parse builds the
    same tree JVM-side in a single call."""
    return (
        f"aggregate(zip_with({a_sql}, {b_sql}, (x, y) -> x * y), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def _dist2_sql(qv_sql: str, cv: list[int]) -> str:
    """SQL-string twin of _ivf_dist2 (qq inlined per cell, exactly as
    the Column form embeds it)."""
    carr = "array(" + ",".join(f"{int(v)}L" for v in cv) + ")"
    cc = sum(int(v) * int(v) for v in cv)
    qq = _int_dot_sql(qv_sql, qv_sql)
    return f"({qq} - 2 * {_int_dot_sql(qv_sql, carr)} + {cc}L)"


def _cent_lits_sql(cents: dict[int, list[int]]) -> str:
    """The centroid table as ONE literal array<struct<cv,cc,cluster>>
    in cluster-id order — K·dim data literals constructed once, walked
    by a single transform lambda (below), instead of K separately
    codegen'd distance expressions. cc = c·c is folded in per cell so
    the lambda does one dot product, not two."""
    return "array(" + ",".join(
        f"named_struct("
        f"'cv', array({','.join(str(int(v)) + 'L' for v in cv)}), "
        f"'cc', {sum(int(v) * int(v) for v in cv)}L, "
        f"'cluster', CAST({int(cid)} AS INT))"
        for cid, cv in sorted(cents.items())
    ) + ")"


def _rel_cells_sql(vec_sql: str, cents: dict[int, list[int]]) -> str:
    """array<struct<d2,cluster>> of per-centroid distances with the
    row-constant q·q term DROPPED: d2_rel = c·c - 2·q·c. Subtracting
    the same integer from every cell preserves the (d2, cluster)
    lexicographic order exactly, so argmin/sort consumers (cluster
    assignment, probe-list selection) are value-identical while the
    plan sheds K copies of the q·q aggregate. Consumers that expose
    the distance VALUE must use _dist2_sql instead."""
    return (
        f"transform({_cent_lits_sql(cents)}, cell -> named_struct("
        f"'d2', cell.cc - 2 * {_int_dot_sql(vec_sql, 'cell.cv')}, "
        f"'cluster', cell.cluster))"
    )


def _ivf_assign(
    df: DataFrame, cents: dict[int, list[int]], vec: str = "qv",
    out: str = "cluster",
) -> DataFrame:
    """Nearest-centroid assignment, tie → smaller cluster id. The
    (dist2, cluster) structs compare lexicographically, so array_min
    IS the argmin with the tie rule — one narrow projection, no
    shuffle, no UDF. Built as one SQL parse (see _int_dot_sql) over
    one literal centroid array walked by a single lambda
    (_rel_cells_sql): codegen compiles ONE distance loop instead of K
    unrolled copies, and the row-constant q·q term is dropped (argmin
    is translation-invariant), shrinking the plan from O(K·dim) code
    to O(dim) code + O(K·dim) data literals."""
    return df.withColumn(
        out, F.expr(f"array_min({_rel_cells_sql(vec, cents)}).cluster")
    )


def _lloyd_rounds(
    df: DataFrame,
    id_name: str,
    n_clusters: int,
    rounds: int,
    dim: int,
    vec: str = "qv",
) -> dict[int, list[int]]:
    """The shared portable-Lloyd core (IVF coarse quantizer AND each
    PQ subspace codebook): md5-seeded initial centroids (the
    n_clusters smallest (md5_long(id), id) vectors — TakeOrdered, no
    global-window shuffle), ``rounds`` exact-int64 assignment/update
    iterations with Python ``//`` floor division (reproduced in SQL by
    the pmod formula), emptied clusters keeping their centroid.
    Returns {cluster -> centroid ints}; per round the corpus incurs
    one narrow assignment pass + one (cluster, dim)-keyed partial-agg
    shuffle collected as K·dim rows."""
    from .dedup import md5_long

    seed_rows = (
        df.select(
            id_name, vec, md5_long(F.col(id_name).cast("string")).alias("h")
        )
        .orderBy("h", id_name)
        .limit(n_clusters)
        .collect()
    )
    cents: dict[int, list[int]] = {
        i: [int(v) for v in r[vec]] for i, r in enumerate(seed_rows)
    }
    for _ in range(rounds):
        assigned = _ivf_assign(df, cents, vec=vec)
        sums = (
            assigned.select("cluster", F.posexplode(vec).alias("d", "v"))
            .groupBy("cluster", "d")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cluster: dict[int, dict[int, int]] = {}
        for r in sums:
            by_cluster.setdefault(r.cluster, {})[r.d] = _floordiv_py(
                int(r.s), int(r.n)
            )
        cents = {
            c: [by_cluster[c][d] for d in range(dim)]
            if c in by_cluster
            else cents[c]
            for c in range(n_clusters)
        }
    return cents


def portable_ivf_pairs(
    embeddings: DataFrame,
    queries: DataFrame,
    n_clusters: int = 8,
    rounds: int = 2,
    n_probe: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Integer IVF over quantized embeddings, exact cross-engine:

    - seeds = the n_clusters vectors with smallest
      (md5_long(id), id) — data-dependent yet reproducible in ANSI SQL
      (TakeOrdered on the Spark side, never a global-window shuffle);
    - ``rounds`` Lloyd iterations: exact int64 assignment
      (dist² = qq - 2q·c + cc, tie → smaller cluster), centroid update
      by PORTABLE floor division of per-dim sums (pmod-adjusted, so
      truncating and flooring engines agree on negatives); an emptied
      cluster keeps its previous centroid;
    - queries probe the ``n_probe`` nearest final centroids; candidates
      join on their final cluster (equi-join — a candidate is scored
      only when its list is probed, the IVF contract).

    Returns (query_id, cand_id, cluster, probe_rank, dot_scaled,
    qnormsq, cnormsq) — all integers, replayed bit-for-bit by
    portable_ivf_oracle_sql. Scale shape: per round one narrow
    assignment pass + one (cluster, dim)-keyed partial-agg shuffle
    whose result is K·dim rows (driver-collected — bounded by the
    cluster count, never the corpus); the probe join broadcasts the
    query side like every ANN family member."""

    def prep(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            quantize_vec(vec_col).alias("qv"),
        ).where(F.size("qv") == dim)

    # NOT spread: an r12 A/B measured the keyed spread ~1 s SLOWER per
    # warm invocation here — the Lloyd protocol runs several actions
    # (seed + per-round collects + final), each re-paying the forced
    # exchange, while the K=8 interpreted distance work it would
    # parallelize is ~0.3 s single-core at this SF (and data-
    # proportional scans split naturally at scale).
    cand = prep(embeddings, "cand")
    cents = _lloyd_rounds(cand, "cand_id", n_clusters, rounds, dim)

    assigned = _ivf_assign(cand, cents).withColumn(
        "cnormsq", int_dot(F.col("qv"), F.col("qv"))
    )

    qry = prep(queries, "query")
    return ivf_probe_join(assigned, cents, qry, n_probe)


def ivf_probe_join(
    assigned: DataFrame,
    cents: dict[int, list[int]],
    qry: DataFrame,
    n_probe: int,
) -> DataFrame:
    """Probe-list selection + candidate equi-join over an ALREADY
    ASSIGNED corpus frame (cand_id, qv, cnormsq, cluster) and the
    final centroids. SHARED by the from-scratch path above and the
    persisted-index query path (operators/ann_index.py), so both are
    hash-identical by construction."""
    qq = int_dot(F.col("qv"), F.col("qv"))
    # one SQL parse instead of K × dim py4j Column calls (_int_dot_sql);
    # q·q dropped from the sort key — constant per row, so the probe
    # ORDER (all this slice/sort exposes) is unchanged (_rel_cells_sql)
    probe_cells = F.expr(_rel_cells_sql("qv", cents))
    probed = (
        qry.withColumn("qnormsq", qq)
        .withColumn(
            "pc", F.slice(F.sort_array(probe_cells), 1, n_probe)
        )
        .select(
            "query_id",
            F.col("qv").alias("query_qv"),
            "qnormsq",
            F.posexplode("pc").alias("p", "cell"),
        )
        .select(
            "query_id", "query_qv", "qnormsq",
            (F.col("p") + 1).cast("int").alias("probe_rank"),
            F.col("cell.cluster").alias("cluster"),
        )
    )
    return (
        assigned.join(F.broadcast(probed), "cluster")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            "cluster",
            "probe_rank",
            int_dot(F.col("query_qv"), F.col("qv")).alias("dot_scaled"),
            "qnormsq",
            "cnormsq",
        )
    )


def portable_ivf_oracle_sql(
    n_clusters: int = 8,
    rounds: int = 2,
    n_probe: int = 2,
    dim: int = 64,
    query_pred: str = "vec_id < 10",
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB SQL replaying portable_ivf_pairs EXACTLY: same md5
    seeding, the same unrolled Lloyd rounds with the same pmod floor
    division, same tie rules — (cluster, probe list, integer evidence)
    value-hash identically across engines."""
    md5h = (
        f"CAST(('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 15)) AS BIGINT)"
    )

    def dist(qv: str, cv: str) -> str:
        return (
            f"(CAST(list_dot_product({qv}, {qv}) AS BIGINT)"
            f" - 2 * CAST(list_dot_product({qv}, {cv}) AS BIGINT)"
            f" + CAST(list_dot_product({cv}, {cv}) AS BIGINT))"
        )

    ctes = [
        f"""q AS (
      SELECT {id_col} AS vec_id,
             list_transform({vec_col},
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * {Q_SCALE}) AS BIGINT)) AS qv
      FROM {table} WHERE len({vec_col}) = {dim}
    )""",
        f"""c0 AS (
      SELECT rn - 1 AS cluster, qv AS cv FROM (
        SELECT qv, row_number() OVER (ORDER BY {md5h}, {id_col}) AS rn
        FROM q
      ) WHERE rn <= {n_clusters}
    )""",
    ]
    prev = "c0"
    for r in range(1, rounds + 1):
        ctes.append(
            f"""a{r} AS (
      SELECT vec_id, cluster FROM (
        SELECT q.vec_id, c.cluster,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {dist('q.qv', 'c.cv')}, c.cluster) AS rn
        FROM q, {prev} c
      ) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""m{r} AS (
      SELECT cluster, list(fd ORDER BY d) AS cv FROM (
        SELECT cluster, d,
               (s - (((s % n) + n) % n)) // n AS fd
        FROM (
          SELECT a1.cluster, g.d,
                 CAST(SUM(q.qv[g.d + 1]) AS BIGINT) AS s,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM a{r} a1 JOIN q USING (vec_id), range(0, {dim}) g(d)
          GROUP BY a1.cluster, g.d
        )
      ) GROUP BY cluster
    )"""
        )
        ctes.append(
            f"""c{r} AS (
      SELECT p.cluster, COALESCE(m.cv, p.cv) AS cv
      FROM {prev} p LEFT JOIN m{r} m USING (cluster)
    )"""
        )
        prev = f"c{r}"
    ctes.append(
        f"""af AS (
      SELECT vec_id, cluster,
             CAST(list_dot_product(qv, qv) AS BIGINT) AS cnormsq, qv
      FROM (
        SELECT q.vec_id, c.cluster, q.qv,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {dist('q.qv', 'c.cv')}, c.cluster) AS rn
        FROM q, {prev} c
      ) WHERE rn = 1
    )"""
    )
    ctes.append(
        f"""probe AS (
      SELECT vec_id AS query_id, cluster, CAST(rn AS INT) AS probe_rank,
             qv AS query_qv,
             CAST(list_dot_product(qv, qv) AS BIGINT) AS qnormsq
      FROM (
        SELECT q.vec_id, c.cluster, q.qv,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {dist('q.qv', 'c.cv')}, c.cluster) AS rn
        FROM q, {prev} c WHERE q.{query_pred.replace(id_col, 'vec_id')}
      ) WHERE rn <= {n_probe}
    )"""
    )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT p.query_id, a.vec_id AS cand_id,
           CAST(a.cluster AS INT) AS cluster, p.probe_rank,
           CAST(list_dot_product(p.query_qv, a.qv) AS BIGINT) AS dot_scaled,
           p.qnormsq, a.cnormsq
    FROM probe p JOIN af a ON a.cluster = p.cluster
    WHERE a.vec_id <> p.query_id
    """


# --------------------------------------------------------------------------
# Engine-portable integer PQ — ADC scoring over integer codebooks: the
# compressed-corpus scale path (operators/pq.py) made cross-engine
# hash-exact the way portable_ivf_pairs did for the coarse quantizer.
# --------------------------------------------------------------------------


def portable_pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    m_subspaces: int = 4,
    n_clusters: int = 8,
    rounds: int = 2,
    k: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product quantization with integer codebooks, exact cross-engine:
    the vector splits into ``m_subspaces`` slices; each slice gets its
    own md5-seeded portable-Lloyd codebook (the _lloyd_rounds core the
    IVF coarse quantizer uses); every candidate encodes to one code id
    per subspace (argmin, tie → smaller id); a query scores a candidate
    by ADC — the sum of its slice-to-centroid distances looked up by
    the candidate's codes — all int64, so the top-k table (codes, ADC
    distance, rank) replays bit-for-bit in DuckDB
    (portable_pq_oracle_sql).

    Scale shape: candidates carry m small ints through the scoring
    join instead of ``dim`` floats (the PQ bandwidth win); the query
    side folds its per-subspace distance TABLES (m·K ints per query)
    in as broadcast literals, so scoring is m element_at lookups per
    (query, candidate) — JVM-side, no shuffle beyond the final rank
    window over the top-k frontier. q_ann_pq (MLlib float codebooks)
    stays the production path."""
    if dim % m_subspaces != 0:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    sub = dim // m_subspaces

    # not spread — same A/B rationale as portable_ivf_pairs
    cand = embeddings.select(
        F.col(id_col).alias("cand_id"), quantize_vec(vec_col).alias("full")
    ).where(F.size("full") == dim)
    qry = queries.select(
        F.col(id_col).alias("query_id"), quantize_vec(vec_col).alias("full")
    ).where(F.size("full") == dim)

    def slice_m(m: int) -> Column:
        return F.slice(F.col("full"), m * sub + 1, sub)

    # the m subspace trainings are independent job chains over small
    # frames — submit them concurrently so the scheduler back-fills
    # idle executors between each chain's driver rounds (guide §2.6);
    # per-subspace results are unchanged (own slice, own seeds)
    from concurrent.futures import ThreadPoolExecutor

    def train(m: int) -> dict[int, list[int]]:
        sliced = cand.select("cand_id", slice_m(m).alias("qv"))
        return _lloyd_rounds(sliced, "cand_id", n_clusters, rounds, sub)

    with ThreadPoolExecutor(max_workers=m_subspaces) as pool:
        codebooks: list[dict[int, list[int]]] = list(
            pool.map(train, range(m_subspaces))
        )

    encoded = cand
    for m in range(m_subspaces):
        encoded = _ivf_assign(
            encoded.withColumn("qv", slice_m(m)), codebooks[m],
            out=f"code_{m}",
        )
    encoded = encoded.select(
        "cand_id", *[F.col(f"code_{m}") for m in range(m_subspaces)]
    )
    return pq_adc_rank(encoded, qry, codebooks, n_clusters, k, sub)


def pq_adc_rank(
    encoded: DataFrame,
    qry: DataFrame,
    codebooks: list[dict[int, list[int]]],
    n_clusters: int,
    k: int,
    sub: int,
) -> DataFrame:
    """ADC scoring + deterministic top-k over an ALREADY ENCODED
    corpus frame (cand_id, code_0..code_{m-1}) and queries carrying
    their quantized full vector (query_id, full). SHARED by
    portable_pq_topk and the persisted-index query path
    (operators/ann_index.py) — hash-identical by construction.

    Per-query ADC lookup tables: dist2(query slice, centroid c) for
    every (subspace, c) — arrays ordered by cluster id so the
    candidate's code indexes them directly."""
    m_subspaces = len(codebooks)
    qtabs = qry
    adc = F.lit(0).cast("long")
    for m in range(m_subspaces):
        # the ADC entries expose the distance VALUE (adc_dist is an
        # output column), so q·q stays — but hoisted into ONE column
        # per subspace (with the slice) instead of re-inlined into
        # every one of the K cells, and the codebook is one literal
        # array walked by a single lambda (one codegen'd dot-product
        # loop instead of K unrolled copies). Same integer ops per
        # entry → bit-identical table values.
        sl, qq = f"_sl_{m}", f"_qq_{m}"
        qtabs = qtabs.withColumn(
            sl, F.expr(f"slice(full, {m * sub + 1}, {sub})")
        ).withColumn(qq, F.expr(_int_dot_sql(sl, sl)))
        cents_m = {c: codebooks[m][c] for c in range(n_clusters)}
        tab = F.expr(
            f"transform({_cent_lits_sql(cents_m)}, "
            f"cell -> {qq} - 2 * {_int_dot_sql(sl, 'cell.cv')} + cell.cc)"
        )
        qtabs = qtabs.withColumn(f"tab_{m}", tab).drop(sl, qq)
        adc = adc + F.element_at(f"tab_{m}", F.col(f"code_{m}") + 1)
    qtabs = qtabs.drop("full")

    scored = (
        encoded.join(F.broadcast(qtabs), F.col("query_id") != F.col("cand_id"))
        .withColumn("adc_dist", adc)
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "cand_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "cand_id",
            *[F.col(f"code_{m}") for m in range(m_subspaces)],
            "adc_dist",
            "rnk",
        )
    )


def portable_pq_oracle_sql(
    m_subspaces: int = 4,
    n_clusters: int = 8,
    rounds: int = 2,
    k: int = 5,
    dim: int = 64,
    query_pred: str = "vec_id < 10",
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB SQL replaying portable_pq_topk EXACTLY: per-subspace
    unrolled Lloyd codebooks (same seeding/floor-division/tie rules as
    the IVF oracle), argmin codes, ADC = sum of slice-to-centroid
    distances by code, deterministic (adc, cand_id) ranking."""
    sub = dim // m_subspaces
    md5h = (
        f"CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    )

    def dist(qv: str, cv: str) -> str:
        return (
            f"(CAST(list_dot_product({qv}, {qv}) AS BIGINT)"
            f" - 2 * CAST(list_dot_product({qv}, {cv}) AS BIGINT)"
            f" + CAST(list_dot_product({cv}, {cv}) AS BIGINT))"
        )

    ctes = [
        f"""q AS (
      SELECT {id_col} AS vec_id,
             list_transform({vec_col},
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * {Q_SCALE}) AS BIGINT)) AS qv
      FROM {table} WHERE len({vec_col}) = {dim}
    )"""
    ]
    for m in range(m_subspaces):
        ctes.append(
            f"""s{m} AS (
      SELECT vec_id, list_slice(qv, {m * sub + 1}, {(m + 1) * sub}) AS qv
      FROM q
    )"""
        )
        ctes.append(
            f"""c{m}_0 AS (
      SELECT rn - 1 AS cluster, qv AS cv FROM (
        SELECT qv, row_number() OVER (ORDER BY {md5h}, vec_id) AS rn
        FROM s{m}
      ) WHERE rn <= {n_clusters}
    )"""
        )
        prev = f"c{m}_0"
        for r in range(1, rounds + 1):
            ctes.append(
                f"""a{m}_{r} AS (
      SELECT vec_id, cluster FROM (
        SELECT s.vec_id, c.cluster,
               row_number() OVER (PARTITION BY s.vec_id
                 ORDER BY {dist('s.qv', 'c.cv')}, c.cluster) AS rn
        FROM s{m} s, {prev} c
      ) WHERE rn = 1
    )"""
            )
            ctes.append(
                f"""m{m}_{r} AS (
      SELECT cluster, list(fd ORDER BY d) AS cv FROM (
        SELECT cluster, d,
               (s - (((s % n) + n) % n)) // n AS fd
        FROM (
          SELECT a.cluster, g.d,
                 CAST(SUM(s.qv[g.d + 1]) AS BIGINT) AS s,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM a{m}_{r} a JOIN s{m} s USING (vec_id), range(0, {sub}) g(d)
          GROUP BY a.cluster, g.d
        )
      ) GROUP BY cluster
    )"""
            )
            ctes.append(
                f"""c{m}_{r} AS (
      SELECT p.cluster, COALESCE(mm.cv, p.cv) AS cv
      FROM {prev} p LEFT JOIN m{m}_{r} mm USING (cluster)
    )"""
            )
            prev = f"c{m}_{r}"
        ctes.append(
            f"""f{m} AS (
      SELECT vec_id, cluster AS code FROM (
        SELECT s.vec_id, c.cluster,
               row_number() OVER (PARTITION BY s.vec_id
                 ORDER BY {dist('s.qv', 'c.cv')}, c.cluster) AS rn
        FROM s{m} s, {prev} c
      ) WHERE rn = 1
    )"""
        )
    final_c = [f"c{m}_{rounds}" for m in range(m_subspaces)]
    adc_terms = " + ".join(
        dist(f"qs{m}.qv", f"cb{m}.cv") for m in range(m_subspaces)
    )
    code_joins = "\n      ".join(
        f"JOIN f{m} ON f{m}.vec_id = cand.vec_id\n"
        f"      JOIN {final_c[m]} cb{m} ON cb{m}.cluster = f{m}.code\n"
        f"      JOIN s{m} qs{m} ON qs{m}.vec_id = qq.vec_id"
        for m in range(m_subspaces)
    )
    code_cols = ", ".join(
        f"CAST(f{m}.code AS INT) AS code_{m}" for m in range(m_subspaces)
    )
    ctes.append(
        f"""scored AS (
      SELECT qq.vec_id AS query_id, cand.vec_id AS cand_id,
             {code_cols},
             CAST({adc_terms} AS BIGINT) AS adc_dist
      FROM (SELECT vec_id FROM q WHERE {query_pred}) qq
      CROSS JOIN (SELECT vec_id FROM q) cand
      {code_joins}
      WHERE cand.vec_id <> qq.vec_id
    )"""
    )
    body = ",\n    ".join(ctes)
    code_out = ", ".join(f"code_{m}" for m in range(m_subspaces))
    return f"""
    WITH {body}
    SELECT query_id, cand_id, {code_out}, adc_dist, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_dist, cand_id) AS rnk
      FROM scored
    ) WHERE rnk <= {k}
    """
