"""Product quantization (PQ / IVF-PQ) for embedding search at scale.

At 100 TB, even the LSH and IVF paths (similarity.py) still carry the
raw float vectors through the scoring join. PQ removes that cost: each
D-dim vector is split into M subspaces and each subvector is replaced
by the id of its nearest codebook centroid — D*4 bytes become M bytes
(64x compression for D=64, M=4, float32: 256 B -> 4 B). Scoring uses asymmetric
distance computation (ADC): the query stays full-precision, a per-query
lookup table of subspace distances is built ONCE (M*K doubles), and a
candidate's approximate distance is M table gathers — no float-vector
math per candidate at all.

Spark mapping (every stage is the shape it must be at scale):

- **codebook training**: M independent MLlib KMeans fits over the
  subvector slices — distributed, and (as every production PQ system
  does) trainable on a deterministic sample of the corpus.
- **encoding**: one Arrow-vectorized kernel per batch (one BLAS matmul
  per subspace) — the same sanctioned Python surface as the LSH bucket
  kernel; output is a plain ``array<int>`` column any sink can store.
- **LUT build + ADC scoring**: pure JVM array expressions
  (``element_at`` gathers inside a fold) — the per-candidate hot loop
  is codegen'd, no Python anywhere.
- **routing**: optional IVF coarse quantizer (same KMeans machinery as
  ivf_topk) restricts scoring to ``n_probe`` cluster lists via an
  equi-join on the cluster id.

Vectors are L2-normalized first, so squared-L2 ADC ranking equals
cosine ranking (||a-b||^2 = 2 - 2*cos on the unit sphere), and the
reported ``sim`` is directly comparable with the exact/LSH/IVF paths.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.similarity import as_double_vec, l2_norm


def _normalize(vec: Column) -> Column:
    # guard the all-zero vector: non-ANSI x/0 is NULL and would abort
    # KMeans training; dividing by 1 leaves it a valid zero vector
    # (cosine 0 against everything) instead
    n = F.greatest(l2_norm(vec), F.lit(1e-300))
    return F.transform(vec, lambda x: x / n)


def train_pq_codebooks(
    embeddings: DataFrame,
    dim: int,
    m: int = 16,
    k: int = 64,
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
    seed: int = 42,
    max_iter: int = 8,
) -> list[list[list[float]]]:
    """Train M subspace codebooks (K centroids each) with distributed
    MLlib KMeans over L2-normalized vectors. Returns a plain nested
    list (m x k x dim/m) — small enough to ride in closures/broadcasts
    (m*k*dim doubles, e.g. 4*16*64/4 = 4 KB for the fixtures).

    ``sample_fraction`` trains on a deterministic sample — at corpus
    scale codebooks are always trained on a sample; the encoder still
    sees every row."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    base = embeddings.select(as_double_vec(vec_col).alias("v")).filter(
        F.size("v") == F.lit(dim)
    )
    if sample_fraction is not None:
        base = base.sample(fraction=sample_fraction, seed=seed)
    base = base.select(_normalize(F.col("v")).alias("v"))

    # The m fits are independent jobs over small frames, and each one
    # alone cannot fill the cluster (an MLlib fit is a chain of short
    # barrier stages with driver rounds between them). Submitting them
    # from a thread pool lets the scheduler back-fill idle executors
    # with the next subspace's stages (guide §2.6); results are
    # unchanged — each fit keeps its own data, seed and partitioning.
    def fit(sub: int) -> list[list[float]]:
        subvec = base.select(
            array_to_vector(F.slice("v", sub * d_sub + 1, d_sub)).alias("features")
        )
        model = KMeans(k=k, seed=seed + sub, maxIter=max_iter).fit(subvec)
        return [[float(x) for x in c] for c in model.clusterCenters()]

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(m, 8)) as pool:
        codebooks = list(pool.map(fit, range(m)))
    return codebooks


def _encode_udf(codebooks: list[list[list[float]]], dim: int):
    """Arrow-vectorized PQ encoder: per batch, one (n x d_sub) @
    (d_sub x k) matmul per subspace; argmin over centroids gives the
    code. The codebook rides inside the closure like a broadcast
    variable (a few KB)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    m = len(codebooks)
    d_sub = dim // m
    books = [np.array(cb) for cb in codebooks]  # each (k, d_sub)
    book_sq = [np.sum(b * b, axis=1) for b in books]

    @pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        import numpy as _np
        import pandas as _pd

        if len(v) == 0:
            return _pd.Series([], dtype=object)
        mat = _np.vstack(v.to_numpy())  # (n, dim)
        norms = _np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0  # zero vectors stay zero, not NaN
        mat = mat / norms
        codes = []
        for sub in range(m):
            s = mat[:, sub * d_sub : (sub + 1) * d_sub]  # (n, d_sub)
            # ||s - c||^2 = ||c||^2 - 2 s.c  (+ ||s||^2, constant per row)
            d2 = book_sq[sub][None, :] - 2.0 * (s @ books[sub].T)
            codes.append(_np.argmin(d2, axis=1).astype(_np.int32))
        return _pd.Series(list(_np.stack(codes, axis=1)))

    return encode


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — the stored form of the corpus: M small
    ints per vector instead of D floats. Rows whose vector length
    differs from ``dim`` are excluded (they cannot be sliced)."""
    enc = _encode_udf(codebooks, dim)
    return (
        embeddings.select(
            F.col(id_col).alias("cand_id"), as_double_vec(vec_col).alias("v")
        )
        .filter(F.size("v") == F.lit(dim))
        .select("cand_id", enc(F.col("v")).alias("codes"))
    )


def _lut_udf(codebooks: list[list[list[float]]], dim: int):
    """Per-query ADC lookup table LUT[sub*k + j] = ||q_sub - c_sub_j||^2
    over the normalized query, as an Arrow kernel (one matmul per
    subspace per batch). A pure-expression version of this table is
    m*k aggregate folds — a ~1000-node tree whose ANALYSIS cost alone
    was measured at ~12 s flat (tools/ann_scale.py) — while the query
    side is a handful of rows; the sanctioned Arrow surface is the
    right tool. Scoring downstream remains JVM-side gathers."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    m = len(codebooks)
    d_sub = dim // m
    books = [np.array(cb) for cb in codebooks]  # (k, d_sub) each
    book_sq = [np.sum(b * b, axis=1) for b in books]

    @pandas_udf("array<double>")
    def lut(v: pd.Series) -> pd.Series:
        import numpy as _np
        import pandas as _pd

        if len(v) == 0:
            return _pd.Series([], dtype=object)
        mat = _np.vstack(v.to_numpy())
        norms = _np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0  # zero vectors stay zero, not NaN
        mat = mat / norms
        parts = []
        for sub in range(m):
            s = mat[:, sub * d_sub : (sub + 1) * d_sub]
            # ||s - c||^2 = ||s||^2 + ||c||^2 - 2 s.c, exact per cell
            d2 = (
                _np.sum(s * s, axis=1)[:, None]
                + book_sq[sub][None, :]
                - 2.0 * (s @ books[sub].T)
            )
            parts.append(d2)
        return _pd.Series(list(_np.hstack(parts)))

    return lut


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    dim: int,
    k: int = 3,
    n_clusters: int | None = None,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k by PQ/ADC. Candidates carry only their
    codes through the scoring join; each query broadcasts its LUT; the
    per-candidate cost is M ``element_at`` gathers inside codegen.

    With ``n_clusters`` set, an IVF coarse quantizer (full-dim KMeans)
    routes each query to its ``n_probe`` nearest cluster lists and the
    scoring join becomes an equi-join on the cluster id — the 100 TB
    shape: without it the (tiny) query side broadcasts and every
    candidate partition streams through one scan.

    Returned ``sim`` is the ADC cosine estimate 1 - adist/2 (exact
    cosine of query vs the candidate's reconstructed codeword)."""
    from ..session import ensure_parallelism

    n_codebook = len(codebooks[0])
    cand_codes = pq_encode(
        ensure_parallelism(embeddings), codebooks, dim, id_col, vec_col
    )
    lut = _lut_udf(codebooks, dim)
    qry = (
        queries.select(
            F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("qv")
        )
        .filter(F.size("qv") == F.lit(dim))
        .select("query_id", lut(F.col("qv")).alias("lut"))
    )

    if n_clusters is not None:

        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        base = embeddings.select(
            F.col(id_col).alias("cand_id"), as_double_vec(vec_col).alias("v")
        ).filter(F.size("v") == F.lit(dim))
        feats = base.select(
            "cand_id", array_to_vector(_normalize(F.col("v"))).alias("features")
        )
        coarse = KMeans(k=n_clusters, seed=7, maxIter=10).fit(feats)
        assigned = coarse.transform(feats).select(
            "cand_id", F.col("prediction").alias("cluster")
        )
        cand_codes = cand_codes.join(assigned, on="cand_id")
        spark = embeddings.sparkSession
        centroids = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(coarse.clusterCenters())],
            "cluster int, centroid array<double>",
        )
        q_full = queries.select(
            F.col(id_col).alias("query_id"), _normalize(as_double_vec(vec_col)).alias("qn")
        ).filter(F.size("qn") == F.lit(dim))
        probes = (
            q_full.crossJoin(F.broadcast(centroids))
            .withColumn(
                "dist2",
                F.aggregate(
                    F.zip_with(F.col("qn"), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
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
            .select("query_id", "cluster")
        )
        qry = qry.join(probes, on="query_id")
        scored = cand_codes.join(F.broadcast(qry), on="cluster")
    else:
        scored = cand_codes.crossJoin(F.broadcast(qry))

    # ADC: adist = sum over subspaces of LUT[sub*k + code], written as
    # a STATIC chain of element_at adds (m is a plan-time constant).
    # The lambda form (zip_with + aggregate fold) is a HigherOrderFunction
    # — interpreted row-at-a-time, outside whole-stage codegen — and
    # measured 40+ s over the 200k-candidate probe where this codegen
    # chain takes ~2 s.
    adist = None
    for sub in range(len(codebooks)):
        term = F.element_at(
            F.col("lut"),
            (F.lit(sub * n_codebook) + F.element_at("codes", sub + 1) + 1).cast(
                "int"
            ),
        )
        adist = term if adist is None else adist + term
    w = Window.partitionBy("query_id").orderBy(F.col("adist"), F.col("cand_id"))
    return (
        scored.filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("adist", adist)
        # project to the 3 scalar columns BEFORE the top-k window: the
        # scored frame still carries the per-query LUT (m*k doubles,
        # ~8 KiB a row) and letting it ride the window exchange turned
        # a 48 MiB shuffle into ~16 GiB at the 200k-candidate probe
        # (measured 52 s -> 4 s). No pair dedup is needed in either
        # path: a cross join cannot duplicate, and in the IVF path a
        # query's probes are distinct clusters while each candidate
        # lives in exactly one cluster.
        .select("query_id", "cand_id", "adist")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            F.col("cand_id").alias("neighbor_id"),
            F.round(1 - F.col("adist") / 2, 4).alias("sim"),
        )
    )
