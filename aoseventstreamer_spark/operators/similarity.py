"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB design requires:

- brute-force cosine top-k: correct baseline. The query side is tiny
  and broadcast; the candidate side streams through one scan; dot
  products are zip_with/aggregate folds (JVM, no Python). Top-k is a
  per-query window — shuffle keyed by query_id, never a global sort.
- LSH-bucketed ANN: random-hyperplane signatures bucket both sides;
  candidates come from an equi-join on the bucket key, so cost is
  O(n · bucket_size), not O(n · q). Recall is tunable via n_planes /
  n_tables. Hyperplanes are derived deterministically from xxhash64
  so both sides agree without shipping a model.
"""

from __future__ import annotations

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
) -> DataFrame:
    """Exact cosine top-k of each query vector against all candidates.

    Pre-computes norms once per side, broadcasts the query side, and
    keeps the entire scoring loop in codegen'd array expressions.
    """
    cand = embeddings.select(
        F.col(id_col).alias("cand_id"),
        as_double_vec(vec_col).alias("cand_vec"),
    ).withColumn("cand_norm", l2_norm(F.col("cand_vec")))
    qry = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_vec(vec_col).alias("query_vec"),
    ).withColumn("query_norm", l2_norm(F.col("query_vec")))

    scored = (
        cand.join(F.broadcast(qry), F.col("query_id") != F.col("cand_id"))
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


def _hyperplane(plane: int, vec: Column) -> Column:
    """Deterministic pseudo-random hyperplane sized to the actual
    vector (component i of plane p is hash-derived in [-1, 1)). Sizing
    from the data — not a dim parameter — means a mismatched dim can
    never null out the dot products and silently collapse every row
    into one bucket."""
    return F.transform(
        F.sequence(F.lit(0), F.size(vec) - 1),
        lambda i: (F.pmod(F.xxhash64(F.lit(plane), i), F.lit(20001)) - 10000) / 10000.0,
    )


def lsh_bucket(vec: Column, n_planes: int, table: int = 0) -> Column:
    """Random-hyperplane signature: one sign bit per plane,
    concatenated into a string bucket key (prefixed by the table index
    so different tables never collide)."""
    bits = [
        F.when(dot(vec, _hyperplane(table * n_planes + p, vec)) >= 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for p in range(n_planes)
    ]
    return F.concat(F.lit(f"{table}:"), *bits)


def lsh_buckets(vec: Column, n_planes: int, n_tables: int) -> Column:
    """Multi-table LSH (the textbook AND/OR construction): n_planes
    sign bits ANDed within a table, n_tables tables ORed by taking the
    union of candidates. Raises recall P(match) = 1-(1-p^planes)^tables
    without scoring more than the bucket slices."""
    return F.array(*[lsh_bucket(vec, n_planes, t) for t in range(n_tables)])


def lsh_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate NN: score only candidates sharing one of the query's
    hyperplane-sign buckets (multi-table OR for recall). The join is an
    equi-join on the bucket key — the scale path when the candidate set
    no longer broadcasts."""
    cand = (
        embeddings.select(
            F.col(id_col).alias("cand_id"), as_double_vec(vec_col).alias("cand_vec")
        )
        .withColumn("bucket", F.explode(lsh_buckets(F.col("cand_vec"), n_planes, n_tables)))
        .withColumn("cand_norm", l2_norm(F.col("cand_vec")))
    )
    qry = (
        queries.select(
            F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("query_vec")
        )
        .withColumn("bucket", F.explode(lsh_buckets(F.col("query_vec"), n_planes, n_tables)))
        .withColumn("query_norm", l2_norm(F.col("query_vec")))
    )
    scored = (
        cand.join(F.broadcast(qry), on="bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .dropDuplicates(["query_id", "cand_id"])
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
    )

    spark = embeddings.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster int, centroid array<double>",
    )

    qry = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("query_vec")
    ).withColumn("query_norm", l2_norm(F.col("query_vec")))
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
    n_planes: int = 4,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via multi-table LSH
    bucketing: only same-bucket pairs are scored; pairs matching in
    several tables are deduped before scoring."""
    side = embeddings.select(
        F.col(id_col).alias("id"), as_double_vec(vec_col).alias("vec")
    ).withColumn(
        "bucket", F.explode(lsh_buckets(F.col("vec"), n_planes, n_tables))
    ).withColumn("norm", l2_norm(F.col("vec")))
    a, b = side.alias("a"), side.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.vec").alias("va"), F.col("b.vec").alias("vb"),
            F.col("a.norm").alias("na"), F.col("b.norm").alias("nb"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("sim", dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 4).alias("sim"))
    )
