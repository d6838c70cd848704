"""Span-level dedup + probabilistic-sketch pack.

``q_span_dup_spans`` / ``q_span_dedup_cut`` are the ExactSubstr pass
(Lee et al. 2021) re-expressed distributed (``operators/spans.py``);
``q_bloom_admit`` is incremental-admission membership with a
DataFrame-native Bloom filter (``operators/bloom.py``);
``q_heavy_hitters_cms`` audits a count-min sketch against exact
counts (``operators/cms.py``). All are integer/string-exact — no
floats anywhere — so the DuckDB oracles are hash-exact, *including
the Bloom filter's false positives and the sketch's overcounts* (the
bit/cell positions are md5-derived identically on both engines).

Fixture parameters: W=8 token windows (docs are 10-100 tokens;
production uses the paper's 50), m=4096 bits / k=3 hashes (the
~450-text corpus sets ~28% of the bits → a measurable-but-small
false-positive rate at sf0.01, exercising the interesting path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import bloom, cms, spans
from aoseventstreamer_spark.queries import query, t

_W = 8  # fixture window width (tokens)

# Shared oracle CTE chain: rolling windows → non-first duplicate
# occurrences → gaps-and-islands span merge. {w} = window width.
_SPAN_CTES = f"""
    tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    win AS (
      SELECT doc_id, g.i AS pos,
             array_to_string(list_slice(toks, g.i, g.i + {_W - 1}), ' ') AS gram
      FROM tok, UNNEST(generate_series(1, len(toks) - {_W - 1})) AS g(i)
      WHERE len(toks) >= {_W}
    ),
    marked AS (
      SELECT doc_id, pos,
             doc_id * 1048576 + pos AS okey,
             MIN(doc_id * 1048576 + pos) OVER (PARTITION BY gram) AS first_okey,
             COUNT(*) OVER (PARTITION BY gram) AS c
      FROM win
    ),
    occ AS (SELECT doc_id, pos FROM marked WHERE c > 1 AND okey <> first_okey),
    o2 AS (
      SELECT doc_id, pos,
             LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM occ
    ),
    isl AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN prev IS NULL OR pos - prev > {_W} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING)
               AS island
      FROM o2
    )
"""


@query(
    "q_span_dup_spans",
    oracle=f"""
    WITH {_SPAN_CTES}
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + {_W - 1} AS BIGINT) AS span_end,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(MAX(pos) + {_W - 1} - MIN(pos) + 1 AS BIGINT) AS n_tokens
    FROM isl GROUP BY doc_id, island
    """,
)
def q_span_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-span inventory: for every doc, the maximal token
    spans whose every W-gram also occurs earlier in the corpus
    (corpus-global first occurrence kept). Two shuffles total — one on
    the gram, one on doc_id — regardless of corpus size; the string
    gram key here is the oracle-parity form, ``gram_key='xxhash64'``
    is the production shuffle (equality unit-tested)."""
    docs = t(spark, sf_dir, "documents")
    occ = spans.duplicate_occurrences(docs, _W, gram_key="string")
    return spans.merged_spans(occ, _W)


@query(
    "q_span_dedup_cut",
    oracle=f"""
    WITH {_SPAN_CTES},
    sp AS (
      SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + {_W - 1} AS span_end
      FROM isl GROUP BY doc_id, island
    ),
    cut AS (
      SELECT tk.doc_id, g.i AS i, tk.toks[g.i] AS tokn,
             EXISTS(SELECT 1 FROM sp s WHERE s.doc_id = tk.doc_id
                    AND g.i BETWEEN s.span_start AND s.span_end) AS dropped
      FROM tok tk, UNNEST(generate_series(1, len(tk.toks))) AS g(i)
    )
    SELECT doc_id,
           COALESCE(string_agg(tokn, ' ' ORDER BY i)
                      FILTER (WHERE NOT dropped), '') AS clean_text,
           CAST(COUNT(*) FILTER (WHERE dropped) AS BIGINT) AS n_tokens_cut
    FROM cut GROUP BY doc_id
    """,
)
def q_span_dedup_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ExactSubstr pass: every doc rebuilt with its
    duplicated spans removed (one canonical copy survives corpus-wide).
    The rebuild is array-native — spans collect per doc and the clean
    text is a higher-order filter over the token array, so no
    per-token rows ever shuffle."""
    docs = t(spark, sf_dir, "documents")
    return spans.exact_substring_dedup(docs, _W, gram_key="string")


_M, _K = 4096, 3


@query(
    "q_bloom_admit",
    oracle=f"""
    WITH corpus AS (SELECT DISTINCT text FROM documents WHERE source <> 'src0'),
    cb AS (SELECT {bloom.H1_SQL.format(c="text")} AS h1,
                  {bloom.H2_SQL.format(c="text")} AS h2 FROM corpus),
    bits AS (SELECT DISTINCT (h1 + g.i * h2) % {_M} AS pos
             FROM cb, UNNEST(generate_series(0, {_K - 1})) AS g(i)),
    batch AS (SELECT doc_id, text FROM documents WHERE source = 'src0'),
    bp AS (SELECT b.doc_id,
                  ({bloom.H1_SQL.format(c="b.text")}
                   + g.i * {bloom.H2_SQL.format(c="b.text")}) % {_M} AS pos
           FROM batch b, UNNEST(generate_series(0, {_K - 1})) AS g(i)),
    flags AS (SELECT bp.doc_id, COUNT(bits.pos) = {_K} AS maybe_seen
              FROM bp LEFT JOIN bits USING (pos) GROUP BY bp.doc_id)
    SELECT f.doc_id, f.maybe_seen,
           EXISTS(SELECT 1 FROM corpus c WHERE c.text = b.text) AS exact_seen,
           (f.maybe_seen AND NOT
            EXISTS(SELECT 1 FROM corpus c WHERE c.text = b.text))
             AS false_positive
    FROM flags f JOIN batch b USING (doc_id)
    """,
)
def q_bloom_admit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental admission: a Bloom filter built over the historical
    corpus (every source but src0) classifies the incoming src0 batch.
    ``maybe_seen=false`` rows are definitely new (no false negatives)
    and skip the exact check; the exact verdict and the filter's
    false positives are emitted for audit. The filter is ≤ m rows of
    one BIGINT — broadcast to the probe join; at 100 TB the history
    side never rescans, only its bit positions do."""
    docs = t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("source") != "src0").select("text").distinct()
    bits = bloom.bloom_build(corpus, "text", _M, _K)
    batch = docs.where(F.col("source") == "src0").select("doc_id", "text")
    adm = bloom.bloom_admit(batch, bits, "text", _M, _K)
    seen = corpus.withColumn("_s", F.lit(1))
    return (
        adm.join(F.broadcast(seen), "text", "left")
        .select(
            "doc_id",
            "maybe_seen",
            F.col("_s").isNotNull().alias("exact_seen"),
            (F.col("maybe_seen") & F.col("_s").isNull()).alias("false_positive"),
        )
    )


_CM, _CD = 32, 4  # fixture: width < vocabulary, so collisions (and the
# sketch's one-sided overcounts) actually occur and are value-compared


@query(
    "q_heavy_hitters_cms",
    oracle=f"""
    WITH tk AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
    counts AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_count
               FROM tk GROUP BY tok),
    hx AS (SELECT tok, exact_count,
                  CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h1,
                  CAST(('0x' || substr(md5(tok), 16, 15)) AS BIGINT) AS h2
           FROM counts),
    cms AS (SELECT g.i AS row_i, (h1 + g.i * h2) % {_CM} AS pos,
                   CAST(SUM(exact_count) AS BIGINT) AS cnt
            FROM hx, UNNEST(generate_series(0, {_CD - 1})) AS g(i)
            GROUP BY 1, 2),
    top AS (SELECT tok, exact_count, h1, h2 FROM hx
            ORDER BY exact_count DESC, tok LIMIT 20),
    probes AS (SELECT t.tok, t.exact_count, g.i AS row_i,
                      (t.h1 + g.i * t.h2) % {_CM} AS pos
               FROM top t, UNNEST(generate_series(0, {_CD - 1})) AS g(i))
    SELECT p.tok, p.exact_count,
           CAST(MIN(c.cnt) AS BIGINT) AS est_count,
           CAST(MIN(c.cnt) - p.exact_count AS BIGINT) AS overcount
    FROM probes p JOIN cms c USING (row_i, pos)
    GROUP BY p.tok, p.exact_count
    """,
)
def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters through a count-min sketch: token frequencies are
    folded into a depth×width cell table (bounded state regardless of
    vocabulary size, mergeable across shards by cell-wise add), then
    the exact top-20 tokens are point-queried against it. The output
    value-compares est vs exact — the sketch's one-sided overcounts
    are themselves deterministic under the portable md5 double-hash,
    so even THEY hash-match the oracle. At 100 TB the exact count
    side of this audit disappears and only the sketch (and its εN
    guarantee) remains; here the exact side is the point."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    counts = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    sk = cms.cms_build(counts, "tok", _CM, _CD, weight_col="exact_count")
    top = counts.orderBy(F.desc("exact_count"), "tok").limit(20)
    est = cms.cms_estimate(sk, top, "tok", _CM, _CD)
    return est.select(
        "tok",
        "exact_count",
        "est_count",
        (F.col("est_count") - F.col("exact_count")).alias("overcount"),
    )


_HP = 6  # HLL precision: m = 64 registers (fixture-sized)
_HLL_CTES = f"""
    hh AS (SELECT CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
           FROM documents),
    br AS (SELECT h % {1 << _HP} AS bucket, h // {1 << _HP} AS r FROM hh),
    rr AS (SELECT bucket,
                  CASE WHEN r = 0 THEN {60 - _HP + 1}
                       ELSE CAST(ROUND(log2(r & (-r))) AS BIGINT) + 1
                  END AS rho
           FROM br),
    sk AS (SELECT bucket, MAX(rho) AS max_rho FROM rr GROUP BY bucket)
"""


@query(
    "q_hll_sketch",
    oracle=f"""
    WITH {_HLL_CTES}
    SELECT bucket, max_rho FROM sk
    """,
)
def q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL registers themselves, value-compared: bucket → max
    trailing-zero rank under the portable md5 hash. Spark's built-in
    approx_count_distinct (HLL++) can only ever be rows-only audited;
    this sketch is bit-for-bit reproducible in ANSI SQL, mergeable by
    register-wise MAX, and 2^p rows regardless of input size."""
    from aoseventstreamer_spark.operators import hll

    docs = t(spark, sf_dir, "documents")
    return hll.hll_sketch(docs.select("text"), "text", _HP)


@query(
    "q_hll_summary",
    oracle=f"""
    WITH {_HLL_CTES},
    agg AS (SELECT COUNT(*) AS n_used,
                   CAST(SUM(CAST(1 AS BIGINT) << CAST({62 - _HP} - max_rho AS INT))
                        AS BIGINT) AS di
            FROM sk)
    SELECT CAST({1 << _HP} AS INT) AS n_registers,
           di + ({1 << _HP} - n_used) * (CAST(1 AS BIGINT) << {62 - _HP})
             AS denom_scaled,
           (SELECT CAST(COUNT(DISTINCT text) AS BIGINT) FROM documents)
             AS exact_distinct
    FROM agg
    """,
)
def q_hll_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL audit row: the exact integer fixed-point denominator
    Σ 2^(S-max_rho) (the entire information content of the estimate —
    the float estimate itself is a derived display value, excluded
    from comparison per the repo's exp()/libm discipline) next to the
    true distinct count."""
    from aoseventstreamer_spark.operators import hll

    docs = t(spark, sf_dir, "documents")
    sk = hll.hll_sketch(docs.select("text"), "text", _HP)
    summary = hll.hll_estimate(sk, _HP).select("n_registers", "denom_scaled")
    exact = docs.agg(
        F.count_distinct("text").cast("long").alias("exact_distinct")
    )
    return summary.crossJoin(exact)


_KMV_K = 32  # < the 150-user fixture sets, so the estimation path runs
_KMV_H = "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)"


@query(
    "q_kmv_sketch",
    oracle=f"""
    WITH uh AS (SELECT DISTINCT event_type, {_KMV_H} AS h FROM events),
    rk AS (SELECT event_type, h,
                  CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h)
                       AS BIGINT) AS rank
           FROM uh)
    SELECT event_type, rank, h FROM rk WHERE rank <= {_KMV_K}
    """,
)
def q_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type KMV sketch of the distinct user set: the k
    smallest md5-derived user hashes, value-compared rank by rank.
    The rank filter compiles to WindowGroupLimit, so each mapper
    forwards at most k rows per group below the shuffle — the build
    moves O(groups · k) rows at any user population."""
    from aoseventstreamer_spark.operators import kmv

    ev = t(spark, sf_dir, "events")
    return kmv.kmv_sketch(ev, "user_id", _KMV_K, group_cols=["event_type"])


@query(
    "q_kmv_set_ops",
    oracle=f"""
    WITH ha AS (SELECT DISTINCT {_KMV_H} AS h FROM events
                WHERE event_type = 'click'),
    hb AS (SELECT DISTINCT {_KMV_H} AS h FROM events
           WHERE event_type = 'purchase'),
    ska AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
                           FROM ha) WHERE rn <= {_KMV_K}),
    skb AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
                           FROM hb) WHERE rn <= {_KMV_K}),
    u AS (SELECT DISTINCT h FROM (SELECT h FROM ska UNION ALL
                                  SELECT h FROM skb)),
    comb AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
                            FROM u) WHERE rn <= {_KMV_K}),
    st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_used, MAX(h) AS tau
           FROM comb),
    mt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_match FROM comb
           WHERE h IN (SELECT h FROM ska) AND h IN (SELECT h FROM skb)),
    ea AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    eb AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    eu AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_union
           FROM (SELECT user_id FROM ea UNION SELECT user_id FROM eb)),
    ei AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersect FROM ea
           WHERE user_id IN (SELECT user_id FROM eb))
    SELECT st.n_used, st.tau, mt.n_match, eu.exact_union, ei.exact_intersect
    FROM st, mt, eu, ei
    """,
)
def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set algebra — the capability HLL registers lack: the
    click-user and purchase-user sketches combine into a union sketch
    whose (n_used, tau) estimate |A ∪ B| and whose both-sides match
    count estimates the Jaccard, hence |A ∩ B| ≈ (n_match/k)·|A ∪ B|
    (Beyer et al. 2007). Compared columns are the exact integers the
    estimates derive from (the repo's derived-float discipline) next
    to the true union/intersection counts for the audit; set ops touch
    only sketch rows (≤ k each side), never the key populations."""
    from aoseventstreamer_spark.operators import kmv

    ev = t(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click")
    b = ev.where(F.col("event_type") == "purchase")
    ska = kmv.kmv_sketch(a, "user_id", _KMV_K)
    skb = kmv.kmv_sketch(b, "user_id", _KMV_K)
    ops = kmv.kmv_set_ops(ska, skb, _KMV_K)
    ua = a.select("user_id").distinct()
    ub = b.select("user_id").distinct()
    exact_u = ua.unionByName(ub).distinct().agg(
        F.count(F.lit(1)).alias("exact_union")
    )
    exact_i = ua.join(ub, "user_id", "semi").agg(
        F.count(F.lit(1)).alias("exact_intersect")
    )
    return ops.crossJoin(exact_u).crossJoin(exact_i)
