"""Training-data pipeline pack 2: packing, contamination, scrubbing,
resampling, domain mixing.

These are the operations a pretraining-data pipeline runs between
"crawl" and "tokenizer": pack documents into fixed context windows,
check the corpus against held-out benchmark text, scrub sensitive
spans, oversample high-quality documents, and rebalance the domain
mix. Each is expressed with built-in expressions only (codegen'd,
no Python in the hot path) and carries a DuckDB oracle.

Scale notes are per-query; the common theme: everything keys its
shuffle on doc_id/source/shingle — never a global sort, never a
driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aoseventstreamer_spark.queries import query, t

_PACK = 128  # context-window token budget for q_seq_packing


@query(
    "q_seq_packing",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ), off AS (
      SELECT doc_id, source, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM tok
    )
    SELECT doc_id, source, n_tok,
           cum - n_tok AS start_offset,
           (cum - n_tok) // {_PACK} AS first_window,
           (cum - 1) // {_PACK} AS last_window,
           (cum - 1) // {_PACK} - (cum - n_tok) // {_PACK} + 1 AS n_windows
    FROM off
    """,
)
def q_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-cut sequence packing manifest (the GPT-style
    pretraining layout): documents are concatenated per source shard
    in doc_id order and cut into fixed 128-token context windows;
    each doc reports its token offset and the window span it lands
    in. The running offset is a cumulative sum PARTITIONED BY source
    — per-shard packing, so there is no global-order bottleneck: one
    shuffle on source, and each shard's prefix sum is independent,
    exactly how a 100 TB corpus is packed in practice."""
    docs = t(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off = docs.select("doc_id", "source", n_tok.alias("n_tok")).withColumn(
        "cum", F.sum("n_tok").over(w)
    )
    start = F.col("cum") - F.col("n_tok")
    first_w = F.expr(f"(cum - n_tok) div {_PACK}")
    last_w = F.expr(f"(cum - 1) div {_PACK}")
    return off.select(
        "doc_id",
        "source",
        "n_tok",
        start.alias("start_offset"),
        first_w.alias("first_window"),
        last_w.alias("last_window"),
        (last_w - first_w + 1).alias("n_windows"),
    )


@query(
    "q_contamination",
    oracle="""
    WITH sh AS (
      SELECT doc_id, source, sg.s
      FROM (SELECT doc_id, source,
                   list_distinct(list_transform(
                     generate_series(1, len(string_split(text,' ')) - 4),
                     i -> array_to_string(list_slice(string_split(text,' '), i, i+4), ' ')
                   )) AS grams
            FROM documents),
           UNNEST(grams) AS sg(s)
    )
    SELECT c.doc_id, COUNT(DISTINCT c.s) AS n_shared_shingles,
           COUNT(DISTINCT b.doc_id) AS n_bench_docs
    FROM sh c JOIN sh b ON c.s = b.s
    WHERE c.source <> 'src0' AND b.source = 'src0'
    GROUP BY c.doc_id
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: word-5-gram overlap between the
    corpus and a held-out benchmark set (source 'src0' stands in for
    the eval suite). Distinct shingles per doc explode and equi-join
    on the shingle string — the 100 TB shape: the benchmark side is
    tiny and broadcasts, the corpus side streams through map tasks;
    no all-pairs comparison anywhere. Docs sharing ≥1 shingle with
    any benchmark doc surface with their overlap counts (training
    sets are decontaminated by anti-joining this result)."""
    from aoseventstreamer_spark.session import ensure_parallelism

    # spread the gram explode when the scan under-splits (each side's
    # source filter still pushes below the keyed repartition)
    docs = ensure_parallelism(t(spark, sf_dir, "documents"), key="doc_id")
    toks = F.split("text", " ")
    n = F.size(toks)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n - 4),
            lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(5))),
        )
    )
    # guard: <5-token docs make sequence(1, n-4) DESCEND through 0
    # and slice(pos=0) throw; generate_series is empty there
    grams = F.when(n >= 5, grams).otherwise(F.array().cast("array<string>"))
    sh = docs.select("doc_id", "source", F.explode(grams).alias("s"))
    bench = sh.filter(F.col("source") == "src0").select(
        F.col("doc_id").alias("bench_doc"), "s"
    )
    corpus = sh.filter(F.col("source") != "src0")
    return (
        corpus.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("s").alias("n_shared_shingles"),
            F.count_distinct("bench_doc").alias("n_bench_docs"),
        )
    )


@query(
    "q_pii_scrub",
    oracle="""
    SELECT event_id,
           regexp_replace(props, '[0-9]+', '#', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS INT) AS n_spans,
           CAST(len(props) - len(regexp_replace(props, '[0-9]+', '', 'g')) AS INT)
             AS n_chars_removed
    FROM events
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style span scrubbing: mask every digit run in the raw
    payload and report span/char counts per record (the audit trail a
    redaction pass must emit). regexp_replace/extract_all are
    codegen'd JVM expressions — a pure narrow map over the scan, zero
    shuffles at any scale. The pattern is deliberately engine-
    portable (character classes only, no lookaround)."""
    ev = t(spark, sf_dir, "events")
    digits = r"[0-9]+"
    return ev.select(
        "event_id",
        F.regexp_replace("props", digits, "#").alias("scrubbed"),
        F.size(F.regexp_extract_all("props", F.lit(digits), 0)).alias("n_spans"),
        (
            F.length("props") - F.length(F.regexp_replace("props", digits, ""))
        ).cast("int").alias("n_chars_removed"),
    )


@query(
    "q_resample_quality",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CASE WHEN len(string_split(text, ' ')) >= 60 THEN 3
                  WHEN len(string_split(text, ' ')) >= 30 THEN 2
                  ELSE 1 END AS weight
      FROM documents
    )
    SELECT doc_id, lang, n_tok, weight, CAST(c.i AS INT) AS copy_idx
    FROM scored, UNNEST(generate_series(1, weight)) AS c(i)
    """,
)
def q_resample_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality-weighted oversampling: longer (higher-
    signal) documents are replicated up to 3x, each copy tagged with
    its index — the epoch-mixing trick used when high-quality sources
    are scarce. explode(sequence(1, w)) is a narrow 1→N fan-out; no
    shuffle, no RNG (reproducible across runs and engines by
    construction)."""
    docs = t(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("long")
    weight = (
        F.when(n_tok >= 60, 3).when(n_tok >= 30, 2).otherwise(1)
    )
    scored = docs.select(
        "doc_id", "lang", n_tok.alias("n_tok"), weight.alias("weight")
    )
    return scored.select(
        "doc_id",
        "lang",
        "n_tok",
        "weight",
        F.explode(F.sequence(F.lit(1), F.col("weight"))).alias("copy_idx"),
    )


@query(
    "q_domain_mix",
    oracle="""
    WITH per_src AS (
      SELECT source, COUNT(*) AS n_docs,
             SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS n_tokens
      FROM documents GROUP BY source
    ), tot AS (
      SELECT SUM(n_tokens) AS total_tokens,
             COUNT(*) AS n_sources
      FROM per_src
    )
    SELECT source, n_docs, n_tokens,
           CAST(ROUND(n_tokens * 1000000.0 / total_tokens) AS BIGINT) / 1000000.0
             AS actual_share,
           CAST(ROUND(total_tokens * 1000000.0 / (n_sources * n_tokens)) AS BIGINT)
             / 1000000.0 AS uniform_weight
    FROM per_src, tot
    """,
)
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix rebalancing table: per-source token share and the
    sampling weight that would flatten the mix to uniform (the knob
    pretraining runs tune when a crawl over-represents one domain).
    One shuffle on source; the corpus total is a 1-row broadcast
    cross join; shares round through scale-0 integers so both
    engines agree to 6 dp."""
    docs = t(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("long")
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum(n_tok).alias("n_tokens")
    )
    tot = per_src.agg(
        F.sum("n_tokens").alias("total_tokens"), F.count("*").alias("n_sources")
    )
    return per_src.join(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        (
            F.round(F.col("n_tokens") * 1000000.0 / F.col("total_tokens")).cast("long")
            / 1000000.0
        ).alias("actual_share"),
        (
            F.round(
                F.col("total_tokens") * 1000000.0 / (F.col("n_sources") * F.col("n_tokens"))
            ).cast("long")
            / 1000000.0
        ).alias("uniform_weight"),
    )


_LB_BATCH = 8  # sequences per batch in the length-bucketed manifest


@query(
    "q_length_buckets",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT)
               AS n_tok
      FROM documents
    ), ranked AS (
      SELECT doc_id, source, n_tok,
             (ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY n_tok DESC, doc_id ASC) - 1)
               // {_LB_BATCH} AS batch_id
      FROM tok
    )
    SELECT doc_id, source, n_tok, batch_id,
           MAX(n_tok) OVER (PARTITION BY source, batch_id) - n_tok AS pad
    FROM ranked
    """,
)
def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch manifest: within each source shard, sort
    documents by token count (desc, id-tiebreak) and cut into
    fixed-size batches — the standard padding-minimization batching
    for training/inference (similar-length sequences share a batch,
    so pad-to-max waste collapses; the ``pad`` column makes the
    saving auditable). Per-shard windows only — one shuffle on
    source, no global sort; at 100 TB shards are the parallel unit
    exactly as in q_seq_packing."""
    from aoseventstreamer_spark.operators.text import whitespace_tokens

    docs = t(spark, sf_dir, "documents")
    n_tok = F.size(whitespace_tokens("text")).cast("long")
    ranked = docs.select("doc_id", "source", n_tok.alias("n_tok")).withColumn(
        "batch_id", F.expr(f"(row_number() OVER (PARTITION BY source ORDER BY n_tok DESC, doc_id ASC) - 1) div {_LB_BATCH}")
    )
    w_b = Window.partitionBy("source", "batch_id")
    return ranked.select(
        "doc_id",
        "source",
        "n_tok",
        "batch_id",
        (F.max("n_tok").over(w_b) - F.col("n_tok")).alias("pad"),
    )
