"""Corpus-curation pack: substring-level dup measurement, semantic
dedup, deterministic weighted/reservoir sampling, BPE pair mining,
URL canonicalization, and Z-order layout keys.

These close out the dedup/sampling/layout corners of a pretraining
pipeline: how much of each document is boilerplate already seen
elsewhere, which near-semantic duplicates to drop, how to downsample
with document-length-proportional probabilities WITHOUT an RNG (so
the sample is reproducible and cross-engine checkable), which token
pairs a BPE tokenizer would merge first, and how to lay files out so
multi-column scans prune.

Determinism convention: where a sampling step needs a uniform draw we
use the Knuth multiplicative hash ``(id * 2654435761) % 2**32`` — a
pure BIGINT expression both engines evaluate identically, standing in
for rand() (which would be neither reproducible nor comparable).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import similarity as SIM
from aoseventstreamer_spark.queries import query, t

from aoseventstreamer_spark.operators.sampling import M32 as _M32  # noqa: E402
from aoseventstreamer_spark.operators.sampling import uniform_draw as _h  # noqa: E402
from aoseventstreamer_spark.operators.sampling import DRAW_SQL as _H_SQL  # noqa: E402


@query(
    "q_substring_dup_fraction",
    oracle="""
    WITH g AS (
      SELECT doc_id, sg.s FROM (
        SELECT doc_id, list_distinct(list_transform(
                 generate_series(1, len(string_split(text, ' ')) - 4),
                 i -> array_to_string(list_slice(string_split(text, ' '), i, i+4), ' ')
               )) AS grams
        FROM documents), UNNEST(grams) AS sg(s)
    ), own AS (
      SELECT s, MIN(doc_id) AS first_doc FROM g GROUP BY s
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN own.first_doc < g.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_grams
    FROM g JOIN own ON g.s = own.s
    GROUP BY g.doc_id
    """,
)
def q_substring_dup_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication measurement (the decision input for
    ExactSubstr-style dedup): for every document, how many of its
    distinct word-5-grams already occur in an EARLIER document (min
    doc_id owns each gram). Counts are reported as exact BIGINTs;
    callers derive the dup fraction.

    Scale shape: one shuffle keyed on the gram with map-side partial
    min/agg; the join back is gram-keyed equi-join. Nothing is
    all-pairs and nothing is global-sorted — this is how substring
    contamination is measured over a 100 TB corpus (the gram space
    shards evenly; skew would only come from a single gram repeated in
    millions of docs, which the map-side distinct-per-doc already caps
    at one row per (gram, doc)). This oracle-checked form keeps exact
    gram STRINGS; the production path hashes each gram to a long
    inside the scan (operators/dedup.substring_dup_counts,
    hashed=True — smaller shuffle keys, measured win at 29M grams; split on text's single
    spaces here matches the oracle, the operator trims+splits \\s+)."""
    from aoseventstreamer_spark.operators.dedup import substring_dup_counts

    docs = t(spark, sf_dir, "documents")
    return substring_dup_counts(docs, hashed=False)


@query(
    "q_semantic_dedup",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x)))
               AS norm
      FROM embeddings
    ), dup AS (
      SELECT DISTINCT b.vec_id AS id
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE CAST(ROUND(list_dot_product(a.v, b.v) / (a.norm * b.norm) * 10000)
                 AS BIGINT) >= 3000
    )
    SELECT e.vec_id AS id, CAST(e.label AS INT) AS cluster
    FROM e LEFT JOIN dup ON e.vec_id = dup.id
    WHERE dup.id IS NULL
    """,
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with a precomputed partition column (``label``) so the
    whole operator is deterministic and oracle-checked: within each
    cluster, drop every vector whose cosine similarity to a lower-id
    member rounds to >= 0.3000 (threshold compared in integer 1e-4
    units — see operators/similarity.semantic_dedup). The KMeans
    variant of the same operator is q_semdedup_kmeans."""
    emb = t(spark, sf_dir, "embeddings")
    return SIM.semantic_dedup(emb, tau=0.30, cluster_col="label").withColumn(
        "cluster", F.col("cluster").cast("int")
    )


@query("q_semdedup_kmeans")  # rows-only: KMeans centroids are engine-specific
def q_semdedup_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup proper (arXiv:2303.09540): MLlib KMeans coarse
    clusters + within-cluster greedy cosine prune. Rows-only in the
    driver harness (centroids are engine-specific); the prune step is
    unit-tested against a pandas brute-force oracle given the same
    cluster assignment (tests/test_corpus_pack.py). k follows the
    paper's ~sqrt(N) default, so in-cluster pair work scales ~N^1.5
    (the r8 sf1 probe caught the old fixed k=16 at 28x for 10x
    rows)."""
    emb = t(spark, sf_dir, "embeddings")
    return SIM.semantic_dedup(emb, tau=0.30)


@query(
    "q_weighted_sample",
    oracle=f"""
    WITH mx AS (SELECT MAX(n_chars) AS m FROM documents)
    SELECT doc_id, n_chars,
           CAST({_H_SQL.format(c='doc_id')} AS BIGINT) AS draw
    FROM documents, mx
    WHERE {_H_SQL.format(c='doc_id')} * mx.m < n_chars * 4294967296
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted Bernoulli sampling: keep each document
    with probability n_chars / max(n_chars), using the multiplicative
    hash of doc_id as the uniform draw — reproducible (re-runs select
    the identical sample; rand() would not) and exact (the accept test
    ``draw * max < n_chars * 2**32`` is pure BIGINT arithmetic, no
    float boundary).

    Scale shape: the max aggregate is one map-side-combined pass
    producing a 1-row frame that BROADCASTS into the filter — the scan
    side is a narrow zero-shuffle map over the corpus. Length-
    proportional sampling over 100 TB = 2 scans, no shuffle."""
    docs = t(spark, sf_dir, "documents")
    mx = docs.agg(F.max("n_chars").alias("m"))
    return (
        docs.crossJoin(F.broadcast(mx))
        .filter(_h("doc_id") * F.col("m") < F.col("n_chars") * F.lit(_M32))
        .select("doc_id", "n_chars", _h("doc_id").alias("draw"))
    )


@query(
    "q_reservoir_sample",
    oracle=f"""
    SELECT source, doc_id, CAST({_H_SQL.format(c='doc_id')} AS BIGINT) AS priority
    FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY {_H_SQL.format(c='doc_id')}, doc_id) AS rn
      FROM documents)
    WHERE rn <= 10
    """,
)
def q_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size uniform sample per stratum (reservoir-sampling
    semantics, k=10 per source) via hash priority: the k docs with the
    smallest deterministic draw win. Equivalent to a per-group
    reservoir pass but expressible as a window top-k, so Spark runs it
    as a rank-limited sort within each source partition — at scale
    this is the standard 'sample k per shard' job: one shuffle on
    source, no global sort, no RNG state."""
    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(_h("doc_id"), F.col("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("source", "doc_id", _h("doc_id").alias("priority"))
    )


@query(
    "q_bpe_pairs",
    oracle="""
    WITH tok AS (SELECT string_split(text, ' ') AS ts FROM documents),
    p AS (
      SELECT pr.s FROM (
        SELECT list_transform(generate_series(1, len(ts) - 1),
                              i -> ts[i] || ' ' || ts[i+1]) AS pairs
        FROM tok), UNNEST(pairs) AS pr(s)
    )
    SELECT s AS pair, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM p GROUP BY s
    ORDER BY cnt DESC, pair
    LIMIT 50
    """,
)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-candidate mining: global counts of adjacent token
    pairs, top-50 (count desc, pair asc — deterministic tie-break).
    This is one iteration of the byte-pair-encoding training loop, the
    shape a distributed tokenizer trainer runs repeatedly.

    Scale shape: the pair fan-out is a narrow 1→(n-1) transform inside
    the scan stage; counting is a map-side-combined hash aggregate on
    the pair string; top-50 is TakeOrderedAndProject (per-partition
    heaps + driver merge of 50-row heads — no global sort)."""
    docs = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    pairs = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(2))),
    )
    # guard: a 1-token doc makes sequence(1, 0) DESCEND and
    # slice(pos=0) throw; the oracle's generate_series(1, 0) is empty
    pairs = F.when(n >= 2, pairs).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(50)
    )


@query(
    "q_url_dedup",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || upper(source) || '.example.com/page/'
               || CAST(doc_id % 50 AS VARCHAR)
               || CASE WHEN doc_id % 3 = 0
                       THEN '?utm_source=x&sid=' || CAST(doc_id AS VARCHAR)
                       ELSE '' END AS url
      FROM documents
    )
    SELECT lower(split_part(url, '?', 1)) AS canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_variants,
           MIN(doc_id) AS keep_doc,
           CAST(SUM(CASE WHEN url LIKE '%?%' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_tracked
    FROM u
    GROUP BY canonical_url
    """,
)
def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup (crawl-frontier hygiene): build
    the document's URL (synthesized deterministically from source +
    doc_id since the fixture has no URL column — same construction on
    both engines), canonicalize by lower-casing and stripping the
    query string (where the tracking params live), and collapse to one
    row per canonical URL keeping the lowest doc_id.

    Scale shape: canonicalization is a zero-shuffle codegen'd string
    map; the collapse is one hash aggregate keyed on the canonical
    URL. This is the first dedup pass every crawl pipeline runs —
    cheaper than any content hash because it needs no document
    bytes."""
    docs = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.upper("source"),
        F.lit(".example.com/page/"),
        (F.col("doc_id") % 50).cast("string"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("?utm_source=x&sid="), F.col("doc_id").cast("string")),
        ).otherwise(F.lit("")),
    )
    return (
        docs.select("doc_id", url.alias("url"))
        .groupBy(F.lower(F.expr("split_part(url, '?', 1)")).alias("canonical_url"))
        .agg(
            F.count("*").alias("n_variants"),
            F.min("doc_id").alias("keep_doc"),
            F.sum(F.col("url").contains("?").cast("long")).alias("n_tracked"),
        )
    )


def _morton_sql(x: str, y: str, bits: int = 8) -> str:
    """Interleaved-bit (Z-order) key as pure integer arithmetic —
    identical in Spark SQL and DuckDB."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x}) >> {i}) & 1) * {4**i}")
        terms.append(f"((({y}) >> {i}) & 1) * {2 * 4**i}")
    return " + ".join(terms)


@query(
    "q_zorder_key",
    oracle=f"""
    SELECT event_id,
           user_id % 256 AS x,
           CAST(FLOOR(value) AS BIGINT) % 256 AS y,
           CAST({_morton_sql('user_id % 256', 'CAST(FLOOR(value) AS BIGINT) % 256')}
                AS BIGINT) AS zkey
    FROM events
    """,
)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key: interleave the low 8 bits of two
    scan dimensions into one sort key. Writing files ordered by zkey
    gives BOTH columns locality, so parquet min/max row-group stats
    prune scans filtered on either dimension — the standard multi-
    column clustering trick (Delta/Iceberg Z-ORDER) expressed as a
    pure-arithmetic codegen'd expression: zero shuffle to compute, and
    usable directly as a repartitionByRange key at write time (see
    operators/layout.cluster_write). Oracle-exact because bit
    interleaving is integer arithmetic on both engines."""
    from aoseventstreamer_spark.operators.layout import zorder_key

    ev = t(spark, sf_dir, "events")
    # FLOOR (not a bare cast) on both sides: DuckDB's double→BIGINT
    # cast rounds while Spark's truncates; floor makes them agree.
    # The Spark side reuses layout.zorder_key — the SAME expression
    # cluster_write orders files by — so the oracle hash-checks the
    # actual production key (bit i of column j lands at i*n+j; with
    # n=2 that is _morton_sql's x-even / y-odd layout).
    x = F.col("user_id") % 256
    y = F.floor("value").cast("long") % 256
    return ev.select(
        "event_id",
        x.alias("x"),
        y.alias("y"),
        zorder_key([x, y], bits=8).alias("zkey"),
    )


@query(
    "q_epoch_shuffle",
    oracle=f"""
    SELECT doc_id,
           CAST({_H_SQL.format(c='doc_id')} % 16 AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (
                  PARTITION BY {_H_SQL.format(c='doc_id')} % 16
                  ORDER BY {_H_SQL.format(c='doc_id')} // 16, doc_id)
                AS BIGINT) AS position
    FROM documents
    """,
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: the between-epochs reshuffle of a
    pretraining corpus as a manifest (doc -> shard, position). The
    hash draw picks the shard (mod 16) and the within-shard order
    (quotient, so shard and order bits are independent); no RNG, so
    epoch N's layout is reproducible from the seed alone — rerunning
    a crashed epoch regenerates the identical order.

    Scale shape: one shuffle on the shard key; within-shard ordering
    sorts each shard independently (16-way parallel). No global sort:
    a 100 TB corpus reshuffles at the speed of one keyed exchange."""
    docs = t(spark, sf_dir, "documents")
    h = _h("doc_id")
    w = Window.partitionBy(h % 16).orderBy(
        F.floor(h / 16).cast("long"), F.col("doc_id")
    )
    return docs.select(
        "doc_id",
        (h % 16).cast("long").alias("shard"),
        F.row_number().over(w).cast("long").alias("position"),
    )


@query(
    "q_curation_pipeline",
    oracle="""
    WITH langed AS (
      SELECT * FROM documents
      WHERE CASE
        WHEN position(' the ' IN ' ' || lower(text) || ' ') > 0
             OR position(' and ' IN ' ' || lower(text) || ' ') > 0
             OR position(' of ' IN ' ' || lower(text) || ' ') > 0 THEN 'en'
        WHEN position(' der ' IN ' ' || lower(text) || ' ') > 0
             OR position(' und ' IN ' ' || lower(text) || ' ') > 0
             OR position(' die ' IN ' ' || lower(text) || ' ') > 0 THEN 'de'
        WHEN position(' le ' IN ' ' || lower(text) || ' ') > 0
             OR position(' la ' IN ' ' || lower(text) || ' ') > 0
             OR position(' et ' IN ' ' || lower(text) || ' ') > 0 THEN 'fr'
        WHEN position(' el ' IN ' ' || lower(text) || ' ') > 0
             OR position(' los ' IN ' ' || lower(text) || ' ') > 0
             OR position(' que ' IN ' ' || lower(text) || ' ') > 0 THEN 'es'
        ELSE 'und' END = 'en'
    ), gated AS (
      SELECT * FROM langed
      WHERE 0.5 * LEAST(1.0, length(text)/500.0)
          + 0.4 * LEAST(1.0, CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)/80.0)
          + 0.1 * (1.0 - CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS BIGINT)
                         / GREATEST(length(text), 1)) >= 0.5
    ), deduped AS (
      SELECT g.* FROM gated g JOIN (
        SELECT MIN(doc_id) AS doc_id
        FROM gated
        GROUP BY sha256(lower(regexp_replace(text, '\\s+', ' ', 'g')))
      ) k ON g.doc_id = k.doc_id
    ), mx AS (SELECT MAX(n_chars) AS m FROM deduped)
    SELECT doc_id, lang, source, n_chars
    FROM deduped, mx
    WHERE ((doc_id) * 2654435761) % 4294967296 * mx.m < n_chars * 4294967296
    """,
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone: a four-step curation recipe — English-only gate,
    composite quality gate (>= 0.5), exact dedup (keep lowest id),
    length-weighted deterministic sampling — composed by
    operators/curation.CurationPipeline into ONE Spark plan and
    hash-checked against a DuckDB oracle that chains the identical
    CTEs. Every step is deterministic, so the full pipeline is
    reproducible and cross-engine exact: the property a production
    curation run needs to be auditable. (The near-dup/minhash step is
    exercised in tests instead — its hashes are engine-specific.)"""
    from aoseventstreamer_spark.operators.curation import CurationPipeline

    docs = t(spark, sf_dir, "documents")
    pipe = CurationPipeline(
        [
            ("lang", {"keep": ["en"]}),
            ("quality", {"min_score": 0.5}),
            ("exact_dedup", {}),
            ("weighted_sample", {"weight_col": "n_chars"}),
        ]
    )
    return pipe.apply(docs).select("doc_id", "lang", "source", "n_chars")


def _curation_full_oracle() -> str:
    from aoseventstreamer_spark.operators.dedup import (
        verified_near_dup_oracle_sql,
    )
    from aoseventstreamer_spark.operators.lm import perplexity_oracle_sql

    near_dup = verified_near_dup_oracle_sql(table="deduped")
    ppl = perplexity_oracle_sql(table="nd")
    draw = _H_SQL.format(c="doc_id")
    return f"""
    WITH langed AS (
      SELECT * FROM documents
      WHERE CASE
        WHEN position(' the ' IN ' ' || lower(text) || ' ') > 0
             OR position(' and ' IN ' ' || lower(text) || ' ') > 0
             OR position(' of ' IN ' ' || lower(text) || ' ') > 0 THEN 'en'
        WHEN position(' der ' IN ' ' || lower(text) || ' ') > 0
             OR position(' und ' IN ' ' || lower(text) || ' ') > 0
             OR position(' die ' IN ' ' || lower(text) || ' ') > 0 THEN 'de'
        WHEN position(' le ' IN ' ' || lower(text) || ' ') > 0
             OR position(' la ' IN ' ' || lower(text) || ' ') > 0
             OR position(' et ' IN ' ' || lower(text) || ' ') > 0 THEN 'fr'
        WHEN position(' el ' IN ' ' || lower(text) || ' ') > 0
             OR position(' los ' IN ' ' || lower(text) || ' ') > 0
             OR position(' que ' IN ' ' || lower(text) || ' ') > 0 THEN 'es'
        ELSE 'und' END = 'en'
    ), gated AS (
      SELECT * FROM langed
      WHERE 0.5 * LEAST(1.0, length(text)/500.0)
          + 0.4 * LEAST(1.0, CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)/80.0)
          + 0.1 * (1.0 - CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS BIGINT)
                         / GREATEST(length(text), 1)) >= 0.5
    ), deduped AS (
      SELECT g.* FROM gated g JOIN (
        SELECT MIN(doc_id) AS doc_id FROM gated
        GROUP BY sha256(lower(regexp_replace(text, '\\s+', ' ', 'g')))
      ) k ON g.doc_id = k.doc_id
    ), losers AS (
      SELECT DISTINCT doc_b AS doc_id FROM ({near_dup}) v
    ), nd AS (
      SELECT * FROM deduped
      WHERE doc_id NOT IN (SELECT doc_id FROM losers)
    ), keep_ppl AS (
      -- ppl <= 29.5 stated in exact integer micro-nats:
      -- avg_nll_u <= floor(ln(29.5) * 1e6), same constant as the
      -- CurationPipeline perplexity step computes
      SELECT doc_id FROM ({ppl}) p
      WHERE avg_nll_u <= {math.floor(math.log(29.5) * 1_000_000)}
    ), survived AS (
      SELECT nd.* FROM nd JOIN keep_ppl USING (doc_id)
    ), mx AS (SELECT MAX(n_chars) AS m FROM survived)
    SELECT doc_id, lang, source, n_chars
    FROM survived, mx
    WHERE {draw} * mx.m < n_chars * 4294967296
    """


@query("q_curation_full", oracle=_curation_full_oracle())
def q_curation_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE production curation recipe, hash-exact end to end:
    English gate -> composite quality gate -> exact dedup -> verified
    near-dup prune (portable md5 LSH + n-gram-Jaccard >= 0.4) ->
    CCNet-style self-trained bigram-LM perplexity gate (ppl <= 29.5,
    the fixture median) -> length-weighted deterministic sample. Six
    steps, ONE Spark plan, and a DuckDB oracle chaining the identical
    CTEs — extends q_curation_pipeline, whose near-dup step predated
    the portable hash form and was test-only."""
    from aoseventstreamer_spark.operators.curation import CurationPipeline

    docs = t(spark, sf_dir, "documents")
    pipe = CurationPipeline(
        [
            ("lang", {"keep": ["en"]}),
            ("quality", {"min_score": 0.5}),
            ("exact_dedup", {}),
            # near_dedup reads its input twice (pair mine + anti-join)
            # and perplexity five times (c2/c1/vocab aggregates,
            # scoring, semi-join) — without these cache points every
            # consumer re-runs the whole upstream chain from the scan
            # (results identical either way; see the materialize step
            # docs in operators/curation.py)
            ("materialize", {}),
            ("near_dedup", {"threshold": 0.4, "portable": True}),
            ("materialize", {}),
            ("perplexity", {"max_ppl": 29.5}),
            ("weighted_sample", {"weight_col": "n_chars"}),
        ]
    )
    return pipe.apply(docs).select("doc_id", "lang", "source", "n_chars")


@query(
    "q_train_val_test",
    oracle="""
    SELECT doc_id,
           CASE
             WHEN draw * 10 < 4294967296 * 8 THEN 'train'
             WHEN draw * 10 < 4294967296 * 9 THEN 'val'
             ELSE 'test'
           END AS split
    FROM (
      SELECT doc_id,
             CAST(('0x' || substr(md5(trim(regexp_replace(lower(text),
                     '[^a-z0-9]+', ' ', 'g'))), 1, 15)) AS BIGINT)
               % 4294967296 AS draw
      FROM documents
    )
    """,
)
def q_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-safe 80/10/10 train/val/test assignment: the split draw
    hashes the normalized-content FINGERPRINT, not the row id, so
    exact duplicates always land in the same split — the standard
    guard against train->eval leakage (splitting on doc_id would put
    two copies of one document on both sides). Deterministic, no RNG,
    zero shuffles (pure per-row expressions), cross-engine exact.
    Thresholds compare via integer cross-multiplication (draw*10 <
    M32*8), never float rates."""
    from aoseventstreamer_spark.operators.text import fingerprint

    draw = F.conv(F.substring(fingerprint("text"), 1, 15), 16, 10).cast("long") % _M32
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(draw * 10 < _M32 * 8, "train")
        .when(draw * 10 < _M32 * 9, "val")
        .otherwise("test")
        .alias("split"),
    )


def _hilbert_oracle() -> str:
    from aoseventstreamer_spark.operators.layout import hilbert_oracle_sql

    return hilbert_oracle_sql(
        table="events",
        x_sql="user_id % 256",
        y_sql="CAST(FLOOR(value) AS BIGINT) % 256",
        select_sql="event_id",
        bits=8,
    )


@query("q_hilbert_key", oracle=_hilbert_oracle())
def q_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering key over the same two scan dimensions
    as q_zorder_key: consecutive keys are always ONE grid step apart
    (no Morton diagonal jumps), so per-file min/max envelopes stay
    tighter at the same file count — fewer false-positive file reads
    under range filters. Spark unrolls the published xy2d per-level
    state updates as chained projections; the oracle replays the
    identical levels as chained CTEs generated from the same spec
    (operators/layout.py)."""
    from aoseventstreamer_spark.operators.layout import with_hilbert_key

    ev = t(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id") % 256).alias("__x"),
        (F.floor("value").cast("long") % 256).alias("__y"),
    )
    return with_hilbert_key(ev, "__x", "__y", bits=8).select("event_id", "hkey")


_MIX_WEIGHTS = {"src0": 5, "src1": 3, "src2": 2, "src3": 1, "src4": 1}
_MIX_W = sum(_MIX_WEIGHTS.values())
_MIX_VALUES = ", ".join(f"('{s}', {w})" for s, w in sorted(_MIX_WEIGHTS.items()))


@query(
    "q_target_mix",
    oracle=f"""
    WITH wts(source, w) AS (VALUES {_MIX_VALUES}),
    counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    avail AS (SELECT w.source, c.n, w.w FROM wts w JOIN counts c USING (source)),
    budget AS (SELECT MIN(n * {_MIX_W} // w) AS b FROM avail),
    quota AS (SELECT source, (b * w) // {_MIX_W} AS k FROM avail, budget),
    ranked AS (SELECT source, doc_id,
                      CAST(ROW_NUMBER() OVER (
                        PARTITION BY source
                        ORDER BY {_H_SQL.format(c='doc_id')}, doc_id) AS BIGINT) AS rn
               FROM documents)
    SELECT r.source, r.doc_id, r.rn
    FROM ranked r JOIN quota q USING (source)
    WHERE r.rn <= q.k
    """,
)
def q_target_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-proportion domain mixing (operators/sampling.domain_mix):
    downsample sources to an exact 5:3:2:1:1 retained ratio, sized by
    the scarcest source — the published pretraining-recipe step (fixed
    per-domain sampling proportions a la GPT-3 §2.2 / Gopher A1) as an
    exact integer allocation instead of rand() draws. The oracle
    replays the identical BIGINT quota arithmetic and hash-rank
    selection as chained CTEs; `div`-vs-`//` agree because every
    operand is non-negative."""
    from aoseventstreamer_spark.operators.sampling import domain_mix

    return domain_mix(t(spark, sf_dir, "documents"), _MIX_WEIGHTS)


@query(
    "q_temperature_mix",
    oracle=f"""
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source
    ), p AS (
      SELECT source, n, CAST(ROUND(POWER(n, 0.5) * 1000000) AS BIGINT) AS p_u
      FROM counts
    ), mx AS (SELECT MAX(p_u) AS pmax FROM p),
    ps AS (
      -- overflow guard replayed from sampling.temperature_mix:
      -- g = ceil(pmax / (2^62 // total)); g = 1 at any sane scale
      SELECT source, n,
             p_u // (pmax // {(1 << 62) // 300}
                     + CASE WHEN pmax % {(1 << 62) // 300} > 0 THEN 1 ELSE 0 END)
               AS p_s
      FROM p, mx
    ), tot AS (SELECT SUM(p_s) AS sp FROM ps),
    quota AS (
      SELECT source, LEAST((300 * p_s) // sp, n) AS k FROM ps, tot
    ), ranked AS (
      SELECT source, doc_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {_H_SQL.format(c='doc_id')}, doc_id) AS BIGINT) AS rn
      FROM documents
    )
    SELECT r.source, r.doc_id, r.rn
    FROM ranked r JOIN quota q USING (source)
    WHERE r.rn <= q.k
    """,
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain mixing
    (operators/sampling.temperature_mix): retain ~300 docs with
    per-source quotas ∝ N_s^0.5 — the mBERT/XLM-R/mT5 rebalancing
    rule (alpha=0.5 up-weights scarce sources). One float op per
    SOURCE (micro-unit-rounded N^alpha), all allocation BIGINT, row
    selection by hash-rank prefix — idempotent and hash-exact."""
    from aoseventstreamer_spark.operators.sampling import temperature_mix

    return temperature_mix(t(spark, sf_dir, "documents"), total=300, alpha=0.5)
