"""Event-analytics + training-data-pipeline pack (round 3).

Event analytics (the engine's identity — the reference IS an event
streamer): funnel steps, retention cohorts, gap-based sessionization,
date-spine gap filling, deterministic stratified sampling, null
semantics, skew-safe two-phase aggregation.

Training-data ops: Gopher-style quality filtering, fixed-window
document chunking, per-source hash dedup, per-label embedding
centroids, map/struct/posexplode scalar coverage.

All hash-exact vs DuckDB. Cross-engine exactness: ratios that feed a
ROUND go through the scale-0 integer-tie trick (see
queries/__init__.py SQL_AVG_4DP note); boolean quality flags compare
integers, never rounded doubles; time arithmetic is integer epoch
microseconds on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aoseventstreamer_spark.queries import cents, query, sum_value_2dp, t

# ------------------------------------------------------------------ funnel


@query(
    "q_funnel_steps",
    oracle="""
    WITH s AS (SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS s_ts
               FROM events WHERE event_type = 'signup' GROUP BY user_id),
    v AS (SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS v_ts
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'view' AND CAST(e.ts AS TIMESTAMP) > s.s_ts
          GROUP BY e.user_id),
    p AS (SELECT DISTINCT e.user_id
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > v.v_ts)
    SELECT (SELECT COUNT(*) FROM s) AS n_signup,
           (SELECT COUNT(*) FROM v) AS n_view_after,
           (SELECT COUNT(*) FROM p) AS n_purchase_after
    """,
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-step ordered funnel (signup → later view → later purchase).
    Each step is a groupBy + broadcastable join on user_id — the same
    shuffle key throughout, so AQE reuses one partitioning; no window
    over the full event stream is needed."""
    ev = t(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .select("user_id")
        .distinct()
    )
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(v.agg(F.count("*").alias("n_view_after")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after")))
    )


@query(
    "q_retention_cohorts",
    oracle="""
    WITH firsts AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
                    FROM events GROUP BY user_id),
    active AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
    SELECT f.cohort_day, date_diff('day', f.cohort_day, a.day) AS day_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM firsts f JOIN active a ON f.user_id = a.user_id
    WHERE date_diff('day', f.cohort_day, a.day) <= 7
    GROUP BY f.cohort_day, day_offset
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted at
    each day offset ≤ 7. Both aggregations shuffle on user_id, then one
    shuffle on (cohort_day, offset) whose cardinality is tiny."""
    ev = t(spark, sf_dir, "events").withColumn("day", F.col("ts").cast("date"))
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = ev.select("user_id", "day").distinct()
    return (
        active.join(firsts, "user_id")
        .withColumn("day_offset", F.datediff("day", "cohort_day").cast("long"))
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@query(
    "q_sessionize_gap",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                       > 1800000000
                  OR LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
             THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    sessed AS (
      SELECT user_id, us,
             SUM(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(us) AS start_us, MAX(us) AS end_us
    FROM sessed GROUP BY user_id, session_id
    """,
)
def q_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running
    sum — the window-function counterpart of q_session_window's
    session_window operator. One shuffle on user_id serves both
    windows (same partitioning)."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        # ts is TIMESTAMP_NTZ; the session tz is pinned to UTC so the
        # cast is the identity mapping and unix_micros matches
        # DuckDB's epoch_us on the same naive value
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    marked = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("us").over(w).isNull() | (F.col("us") - F.lag("us").over(w) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    sessed = marked.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessed.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
    )


@query(
    "q_date_spine_gapfill",
    oracle="""
    WITH b AS (SELECT MIN(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS t0,
                      MAX(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS t1
               FROM events WHERE event_type = 'purchase' AND value > 150),
    spine AS (SELECT g AS hour FROM b, UNNEST(generate_series(b.t0, b.t1, INTERVAL 1 HOUR)) t(g)),
    hourly AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, COUNT(*) AS n
               FROM events WHERE event_type = 'purchase' AND value > 150 GROUP BY 1)
    SELECT spine.hour, COALESCE(hourly.n, 0) AS n_events
    FROM spine LEFT JOIN hourly ON spine.hour = hourly.hour
    """,
)
def q_date_spine_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: an hourly spine generated from the
    data's own bounds (sequence + explode, no driver action), left
    join, zero-fill. The spine side is a single-row aggregate exploded
    — trivially broadcastable."""
    ev = t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 150)
    )
    hours = ev.select(F.date_trunc("hour", "ts").alias("hour"))
    bounds = hours.agg(F.min("hour").alias("t0"), F.max("hour").alias("t1"))
    spine = bounds.select(
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    hourly = hours.groupBy("hour").agg(F.count("*").alias("n"))
    return spine.join(hourly, "hour", "left").select(
        "hour", F.coalesce("n", F.lit(0)).alias("n_events")
    )


# ------------------------------------------------- sampling / skew / nulls


@query(
    "q_stratified_sample",
    oracle="""
    SELECT event_type, COUNT(*) AS n_sampled,
           ROUND(SUM(CAST(ROUND(value*100) AS BIGINT))/100.0, 2) AS sum_value
    FROM events
    WHERE (event_id * 2654435761) % 1000 <
          CASE event_type WHEN 'click' THEN 500 WHEN 'view' THEN 250
                          WHEN 'purchase' THEN 1000 WHEN 'signup' THEN 100
                          ELSE 50 END
    GROUP BY event_type
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-stratum rates applied via
    a multiplicative-hash mod on the row key — reproducible across
    engines and runs (unlike rand()-based sampleBy), no shuffle to
    sample (the filter is embarrassingly parallel), one tiny agg
    exchange after."""
    ev = t(spark, sf_dir, "events")
    rate = (
        F.when(F.col("event_type") == "click", 500)
        .when(F.col("event_type") == "view", 250)
        .when(F.col("event_type") == "purchase", 1000)
        .when(F.col("event_type") == "signup", 100)
        .otherwise(50)
    )
    return (
        ev.filter(F.pmod(F.col("event_id") * 2654435761, F.lit(1000)) < rate)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_sampled"), sum_value_2dp("value", "sum_value"))
    )


@query(
    "q_skewed_agg_two_phase",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           ROUND(SUM(CAST(ROUND(value*100) AS BIGINT))/100.0, 2) AS sum_value,
           ROUND(MAX(CAST(ROUND(value*100) AS BIGINT))/100.0, 2) AS max_value
    FROM events GROUP BY event_type
    """,
)
def q_skewed_agg_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (operators/skew.py): partial agg
    on (key, salt) then final on key — result provably identical to the
    direct groupBy, which is exactly what the oracle checks. The shape
    that survives one key owning double-digit percent of 100 TB."""
    from aoseventstreamer_spark.operators.skew import two_phase_agg

    ev = t(spark, sf_dir, "events").withColumn("vc", cents("value"))
    out = two_phase_agg(
        ev, "event_type", {"n": "count(*)", "_sum_vc": "sum(vc)", "_max_vc": "max(vc)"}
    )
    return out.select(
        "event_type",
        "n",
        F.round(F.col("_sum_vc") / 100.0, 2).alias("sum_value"),
        F.round(F.col("_max_vc") / 100.0, 2).alias("max_value"),
    )


@query(
    "q_null_semantics",
    oracle="""
    SELECT event_id,
           NULLIF(event_type, 'error') AS maybe_type,
           NULLIF(event_type, 'error') IS NOT DISTINCT FROM 'click' AS nullsafe_click,
           NULLIF(event_type, 'error') IS DISTINCT FROM 'click' AS distinct_click,
           NULLIF(event_type, 'error') IS NULL AS was_error,
           COALESCE(NULLIF(event_type, 'error'), 'redacted') AS filled
    FROM events
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic surface: null-safe equality (<=>), IS
    DISTINCT FROM, IS NULL, COALESCE over an induced-null column."""
    ev = t(spark, sf_dir, "events")
    x = F.nullif("event_type", F.lit("error"))
    return ev.select(
        "event_id",
        x.alias("maybe_type"),
        x.eqNullSafe(F.lit("click")).alias("nullsafe_click"),
        (~x.eqNullSafe(F.lit("click"))).alias("distinct_click"),
        x.isNull().alias("was_error"),
        F.coalesce(x, F.lit("redacted")).alias("filled"),
    )


@query(
    "q_merge_upsert",
    oracle="""
    WITH tgt AS (
      SELECT user_id, value, ts FROM (
        SELECT user_id, value, CAST(ts AS TIMESTAMP) AS ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15'
      ) WHERE rn = 1
    ), upd AS (
      SELECT user_id, value, ts FROM (
        SELECT user_id, value, CAST(ts AS TIMESTAMP) AS ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15'
      ) WHERE rn = 1
    )
    SELECT COALESCE(u.user_id, t.user_id) AS user_id,
           CASE WHEN u.user_id IS NOT NULL THEN u.value ELSE t.value END AS value,
           CASE WHEN u.user_id IS NOT NULL THEN u.ts ELSE t.ts END AS ts
    FROM tgt t FULL OUTER JOIN upd u ON t.user_id = u.user_id
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO as DataFrame algebra (operators/merge.py SCD1): a
    latest-per-user state table built from the first half of the log,
    upserted with the second half — matched keys replaced, new keys
    inserted, untouched keys kept. The oracle states the same
    contract as a FULL OUTER JOIN whose matched rows take the UPDATE
    row wholesale (CASE on the update key, not per-column COALESCE —
    SCD1 replaces the row, so a NULL in the update's value column
    must WIN, not fall back to the stale target value)."""
    from aoseventstreamer_spark.operators.merge import merge_upsert

    ev = t(spark, sf_dir, "events").select(
        "user_id", "value", F.col("ts").cast("timestamp").alias("ts"), "event_id"
    )
    cut = F.lit("2024-01-15").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())

    def latest(df):
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "value", "ts", "event_id")
        )

    target = latest(ev.filter(F.col("ts") < cut))
    updates = ev.filter(F.col("ts") >= cut)
    return merge_upsert(
        target, updates, keys="user_id", order_by=["ts", "event_id"]
    ).drop("event_id")


# ----------------------------------------------------- scalar coverage


@query(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_value,
           CAST(len(json_keys(props)) + 1 AS INTEGER) AS merged_n_keys
    FROM events
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type surface: parse props into map<string,int>, then
    map_keys / size / element_at / map_concat — all built-in
    expressions (the oracle computes the same facts via JSON)."""
    ev = t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    merged = F.map_concat(m, F.create_map(F.lit("__src"), F.lit(0)))
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_csv"),
        F.element_at(m, "k").alias("k_value"),
        F.size(F.map_keys(merged)).alias("merged_n_keys"),
    )


@query(
    "q_struct_funcs",
    oracle="""
    SELECT event_id, user_id AS uid, value * 2 AS v2, 'tagged' AS tag,
           user_id % 5 = 0 AS vip
    FROM events
    """,
)
def q_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + nested field access: the values flow
    through two levels of struct before being flattened, which is what
    the oracle verifies arrives unchanged."""
    ev = t(spark, sf_dir, "events")
    inner = F.struct(F.col("user_id"), F.col("value"))
    nested = F.struct(
        inner.alias("inner"), F.lit("tagged").alias("tag"),
        (F.col("user_id") % 5 == 0).alias("vip"),
    )
    return ev.select("event_id", nested.alias("n")).select(
        "event_id",
        F.col("n.inner.user_id").alias("uid"),
        (F.col("n.inner.value") * 2).alias("v2"),
        F.col("n.tag").alias("tag"),
        F.col("n.vip").alias("vip"),
    )


@query(
    "q_posexplode_tokens",
    oracle="""
    SELECT doc_id, i - 1 AS pos, toks[i] AS tok
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < 20),
         UNNEST(generate_series(1, len(toks))) AS t(i)
    """,
)
def q_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (UNNEST WITH ORDINALITY): token stream with
    positions — the primitive under n-gram/windowed text ops."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    ).withColumn("pos", F.col("pos").cast("long"))


@query(
    "q_variant_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k,
           CAST(len(json_keys(props)) AS INTEGER) AS n_fields,
           json_extract(props, '$.missing') IS NULL AS missing_is_null
    FROM events
    """,
)
def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse once into a
    variant, then typed `variant_get` extraction — the
    shredding-friendly representation for open JSON schemas (vs the
    fixed map of q_map_funcs). Oracle states the same facts via JSON."""
    ev = t(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k"),
        F.size(F.json_object_keys("props")).alias("n_fields"),
        F.try_variant_get(v, "$.missing", "string").isNull().alias("missing_is_null"),
    )


# -------------------------------------------------- training-data ops


@query(
    "q_quality_filter_suite",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             list_sum(list_transform(string_split(text, ' '),
                      x -> CAST(len(x) AS BIGINT))) AS sum_len,
             CAST(len(list_filter(string_split(text, ' '),
                      x -> x IN ('the', 'a', 'of', 'to', 'and'))) AS BIGINT) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_words,
           CAST(ROUND(sum_len * 10000.0 / n_words) AS BIGINT) / 10000.0 AS mean_word_len,
           CAST(ROUND(n_stop * 10000.0 / n_words) AS BIGINT) / 10000.0 AS stop_frac,
           n_words BETWEEN 40 AND 10000 AS len_ok,
           (sum_len >= 3 * n_words AND sum_len <= 8 * n_words) AS word_len_ok,
           n_stop * 20 >= n_words AS stop_ok,
           (n_words BETWEEN 40 AND 10000 AND sum_len >= 3 * n_words
            AND sum_len <= 8 * n_words AND n_stop * 20 >= n_words) AS passes
    FROM m
    """,
)
def q_quality_filter_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality rules (word count bounds, mean
    word length band, stopword fraction floor). All flags compare
    INTEGERS (sum_len vs 3n/8n, 20·stops vs n) so no float rounding
    can flip a boolean; the reported ratios use the scale-0 integer
    rounding trick. Pure codegen'd expressions — the 100 TB cost is
    the scan."""
    docs = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sum_len = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_stop = F.size(
        F.filter(toks, lambda x: x.isin("the", "a", "of", "to", "and"))
    ).cast("long")
    n_words = F.size(toks).cast("long")
    m = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        sum_len.alias("sum_len"),
        n_stop.alias("n_stop"),
    )
    len_ok = F.col("n_words").between(40, 10000)
    wl_ok = (F.col("sum_len") >= 3 * F.col("n_words")) & (
        F.col("sum_len") <= 8 * F.col("n_words")
    )
    stop_ok = F.col("n_stop") * 20 >= F.col("n_words")
    return m.select(
        "doc_id",
        "n_words",
        (F.round(F.col("sum_len") * 10000.0 / F.col("n_words")).cast("long") / 10000.0).alias(
            "mean_word_len"
        ),
        (F.round(F.col("n_stop") * 10000.0 / F.col("n_words")).cast("long") / 10000.0).alias(
            "stop_frac"
        ),
        len_ok.alias("len_ok"),
        wl_ok.alias("word_len_ok"),
        stop_ok.alias("stop_ok"),
        (len_ok & wl_ok & stop_ok).alias("passes"),
    )


@query(
    "q_doc_chunks",
    oracle="""
    SELECT doc_id, CAST((i - 1) / 12 AS BIGINT) AS chunk_idx,
           array_to_string(list_slice(toks, i, i + 15), ' ') AS chunk
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < 100),
         UNNEST(generate_series(1, len(toks) - 15, 12)) AS t(i)
    """,
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window training chunks: 16-token windows, stride 12
    (overlap 4), full windows only. sequence + slice built-ins — the
    1→N fan-out is an explode, so chunking 100 TB is scan + narrow
    explode, no shuffle at all."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split("text", " ")
    with_toks = docs.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") >= 16
    )
    starts = F.sequence(F.lit(1), F.size("toks") - 15, F.lit(12))
    return (
        with_toks.select("doc_id", F.explode(starts).alias("i"), "toks")
        .select(
            "doc_id",
            ((F.col("i") - 1) / 12).cast("long").alias("chunk_idx"),
            F.concat_ws(" ", F.slice("toks", F.col("i"), F.lit(16))).alias("chunk"),
        )
    )


@query(
    "q_doc_source_dedup",
    oracle="""
    SELECT source, COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_unique,
           COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dupes
    FROM documents GROUP BY source
    """,
)
def q_doc_source_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-dup audit on a cross-engine-stable hash (md5
    over UTF-8 bytes): the shape of a per-shard dedup report at crawl
    scale — one shuffle on source, distinct-count of fixed-width
    hashes instead of full texts."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select("source", F.md5(F.col("text").cast("binary")).alias("h"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("h").alias("n_unique"),
            (F.count("*") - F.count_distinct("h")).alias("n_dupes"),
        )
    )


@query(
    "q_repetition_stats",
    oracle="""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS nd
      FROM documents
    ), bg AS (
      SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS big
      FROM base, UNNEST(generate_series(1, n - 1)) t(i)
      WHERE n >= 2
    ), top AS (
      SELECT doc_id, MAX(c) AS top_n
      FROM (SELECT doc_id, big, COUNT(*) AS c FROM bg GROUP BY doc_id, big)
      GROUP BY doc_id
    )
    SELECT base.doc_id, n AS n_tokens, nd AS n_distinct,
           CAST(ROUND((n - nd) * 10000.0 / n) AS BIGINT) / 10000.0 AS dup_token_frac,
           COALESCE(top_n, 0) AS top_bigram_n,
           COALESCE(top_n, 0) * 5 <= GREATEST(n - 1, 1) AS repetition_ok
    FROM base LEFT JOIN top USING (doc_id)
    """,
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition rules: within-document duplicate-token
    fraction and top-bigram dominance (boilerplate/spam both spike
    them). The bigram multiplicity goes explode → count → max — two
    shuffles both keyed by doc_id, so the exchange is reused; the flag
    compares integers (5·top ≤ n-1 ⇔ top ≤ 20%)."""
    docs = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    base = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.size(toks).cast("long").alias("n"),
        F.size(F.array_distinct(toks)).cast("long").alias("nd"),
    )
    bigrams = (
        base.filter(F.col("n") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), (F.col("n") - 1).cast("int")),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("toks", i.cast("int")),
                        F.element_at("toks", (i + 1).cast("int")),
                    ),
                )
            ).alias("big"),
        )
    )
    top = (
        bigrams.groupBy("doc_id", "big")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_n"))
    )
    return base.join(top, "doc_id", "left").select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        F.col("nd").alias("n_distinct"),
        (F.round((F.col("n") - F.col("nd")) * 10000.0 / F.col("n")).cast("long") / 10000.0)
        .alias("dup_token_frac"),
        F.coalesce("top_n", F.lit(0)).alias("top_bigram_n"),
        (F.coalesce("top_n", F.lit(0)) * 5 <= F.greatest(F.col("n") - 1, F.lit(1)))
        .alias("repetition_ok"),
    )


@query(
    "q_common_token_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t.tok
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           UNNEST(toks) AS t(tok)
    ), vocab AS (
      SELECT tok, COUNT(*) AS cf FROM tok GROUP BY tok
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(ROUND(SUM(cf) * 10000.0 / COUNT(*)) AS BIGINT) / 10000.0
             AS mean_corpus_freq,
           MIN(cf) AS rarest_freq
    FROM tok JOIN vocab USING (tok)
    GROUP BY doc_id
    """,
)
def q_common_token_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics join-back (the shape under TF-IDF / unigram
    LM quality scoring): build the vocabulary frequency table from the
    corpus itself, broadcast it back onto the token stream, and score
    each document by mean corpus frequency + rarest token. Vocab
    tables are tiny relative to the corpus (Heaps' law), so the join
    back is a broadcast, never a shuffle of the token stream."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count("*").alias("cf"))
    return (
        tok.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (F.round(F.sum("cf") * 10000.0 / F.count("*")).cast("long") / 10000.0)
            .alias("mean_corpus_freq"),
            F.min("cf").alias("rarest_freq"),
        )
    )


def _jaccard_edges_verify_set(docs):
    """All-pairs char-3-gram Jaccard >= 0.65 edges over the bounded
    verify set (docs already filtered to doc_id < 200): shared by the
    three cluster queries below. Grams are hashed to 8-byte longs
    before the pair join — set SIZES are all Jaccard needs, and
    array_intersect over longs beats string compares ~4x (same trick
    as verified_near_dup_pairs, operators/dedup.py); the oracle keeps
    string lists, equal short of a 2^-64 xxhash64 collision."""
    from aoseventstreamer_spark.operators.dedup import ngram_set
    from aoseventstreamer_spark.session import ensure_parallelism

    g = docs.select(
        "doc_id",
        F.transform(ngram_set("text", 3), lambda s: F.xxhash64(s)).alias("grams"),
    )
    # the pair join is a nested-loop whose streamed side inherits the
    # scan's partitioning: an under-split fixture scan ran ALL the
    # quadratic array_intersect work on one core (guide §2.5). Keyed
    # spread = no round-robin pre-sort, no-op on well-split scans.
    g = ensure_parallelism(g, key="doc_id")
    a, b = g.alias("a"), g.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.col("a.grams")) + F.size(F.col("b.grams")) - inter
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            inter.alias("i"),
            union.alias("u"),
        )
        .filter(F.col("i") * 20 >= 13 * F.col("u"))
        .select("doc_a", "doc_b")
    )


@query(
    "q_dedup_components",
    oracle="""
    WITH RECURSIVE g AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(text) - 2),
                                          i -> substr(text, i, 3))) AS grams
      FROM documents WHERE doc_id < 200
    ), e AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM g a JOIN g b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.grams, b.grams)) * 20 >=
            13 * (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
    ), sym AS MATERIALIZED (
      SELECT doc_a AS node, doc_b AS nbr FROM e
      UNION SELECT doc_b, doc_a FROM e
    ), reach(node, r) AS (
      SELECT node, node FROM (SELECT DISTINCT node FROM sym)
      UNION
      SELECT s.node, r.r FROM sym s JOIN reach r ON s.nbr = r.node
    ), comp AS (
      SELECT node, MIN(r) AS component FROM reach GROUP BY node
    )
    SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component,
           d.doc_id = COALESCE(c.component, d.doc_id) AS is_keeper
    FROM (SELECT doc_id FROM documents WHERE doc_id < 200) d
    LEFT JOIN comp c ON d.doc_id = c.node
    """,
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS, not just pairs: char-3-gram Jaccard ≥ 0.65
    edges (integer-compared, engine-portable) resolved to connected
    components by iterative min-label propagation
    (operators/components.py), then keep-one-per-cluster. The oracle
    computes the same transitive closure with a recursive CTE. The
    all-pairs edge build is bounded to the doc_id < 200 verify set —
    at scale the edges come from LSH (q_near_dup_verified), and only
    the component resolution runs on the full pair list."""
    from aoseventstreamer_spark.operators.components import dedup_components

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dedup_components(docs, _jaccard_edges_verify_set(docs))


@query(
    "q_embed_centroids",
    oracle="""
    SELECT label, i - 1 AS pos,
           CAST(ROUND(SUM(CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT))
                      * 1.0 / COUNT(*)) AS BIGINT) AS centroid_micro
    FROM (SELECT label, embedding FROM embeddings),
         UNNEST(generate_series(1, len(embedding))) AS t(i)
    GROUP BY label, pos
    """,
)
def q_embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (the building block of IVF
    training, cluster summaries, and class prototypes): posexplode to
    (label, dim) and average. Shuffle carries (label × dim) partial
    sums — map-side combined, independent of row count.

    Cross-engine exactness: each element is quantized to integer
    micro-units FIRST (identical doubles → identical integers on both
    engines), summed exactly, and the mean is rounded at scale 0 —
    float summation order can therefore never flip a digit, and
    -0.0 cannot appear (sf0.001 exposed both failure modes of the
    naive ROUND(AVG(float), 4))."""
    emb = t(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label",
            F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
                "pos", "val"
            ),
        )
        .withColumn("pos", F.col("pos").cast("long"))
        .withColumn("q", F.round(F.col("val") * 1000000).cast("long"))
        .groupBy("label", "pos")
        .agg(
            F.round(F.sum("q") * 1.0 / F.count("*")).cast("long").alias("centroid_micro")
        )
    )


@query(
    "q_dedup_keep_best",
    oracle="""
    WITH RECURSIVE g AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(text) - 2),
                                          i -> substr(text, i, 3))) AS grams
      FROM documents WHERE doc_id < 200
    ), e AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM g a JOIN g b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.grams, b.grams)) * 20 >=
            13 * (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
    ), sym AS MATERIALIZED (
      SELECT doc_a AS node, doc_b AS nbr FROM e
      UNION SELECT doc_b, doc_a FROM e
    ), reach(node, r) AS (
      SELECT node, node FROM (SELECT DISTINCT node FROM sym)
      UNION
      SELECT s.node, r.r FROM sym s JOIN reach r ON s.nbr = r.node
    ), comp AS (
      SELECT node, MIN(r) AS component FROM reach GROUP BY node
    ), labeled AS (
      SELECT d.doc_id, d.n_chars,
             COALESCE(c.component, d.doc_id) AS component
      FROM (SELECT doc_id, n_chars FROM documents WHERE doc_id < 200) d
      LEFT JOIN comp c ON d.doc_id = c.node
    )
    SELECT doc_id, component, n_chars,
           ROW_NUMBER() OVER (PARTITION BY component
                              ORDER BY n_chars DESC, doc_id ASC) = 1 AS is_keeper
    FROM labeled
    """,
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster dedup keeping the BEST doc per near-dup cluster
    (operators/components.keep_best_per_component): same 3-gram
    Jaccard ≥ 0.65 clusters as q_dedup_components, but the keeper is
    the component's longest document (n_chars argmax, RefinedWeb-style
    'keep the copy worth training on'), ties on ascending id. The
    oracle extends the recursive-CTE closure with the identical
    argmax window."""
    from aoseventstreamer_spark.operators.components import keep_best_per_component

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return keep_best_per_component(
        docs, _jaccard_edges_verify_set(docs), quality_col="n_chars"
    )


@query(
    "q_split_cluster_safe",
    oracle="""
    WITH RECURSIVE g AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(text) - 2),
                                          i -> substr(text, i, 3))) AS grams
      FROM documents WHERE doc_id < 200
    ), e AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM g a JOIN g b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.grams, b.grams)) * 20 >=
            13 * (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
    ), sym AS MATERIALIZED (
      SELECT doc_a AS node, doc_b AS nbr FROM e
      UNION SELECT doc_b, doc_a FROM e
    ), reach(node, r) AS (
      SELECT node, node FROM (SELECT DISTINCT node FROM sym)
      UNION
      SELECT s.node, r.r FROM sym s JOIN reach r ON s.nbr = r.node
    ), comp AS (
      SELECT node, MIN(r) AS component FROM reach GROUP BY node
    ), labeled AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
      FROM (SELECT doc_id FROM documents WHERE doc_id < 200) d
      LEFT JOIN comp c ON d.doc_id = c.node
    )
    SELECT doc_id, component,
           CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id, component,
             CAST(('0x' || substr(md5('split:' || CAST(component AS VARCHAR)), 1, 15))
                  AS BIGINT) % 100 AS h
      FROM labeled
    )
    """,
)
def q_split_cluster_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-DUP-safe train/val/test split: the split key is the
    near-dup CLUSTER label, not the document — every member of a
    near-dup cluster lands in the same split, so paraphrased copies
    can never leak train→test (the guarantee q_train_val_test's exact
    fingerprint can't give; same 3-gram Jaccard ≥ 0.65 clusters as
    q_dedup_components). 80/10/10 by md5-derived hash of the
    component id — deterministic, engine-portable, and stable under
    corpus growth (adding docs can merge clusters but never
    reassigns an unchanged cluster's split)."""
    from aoseventstreamer_spark.operators.components import connected_components
    from aoseventstreamer_spark.operators.dedup import md5_long

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    comp = connected_components(_jaccard_edges_verify_set(docs)).withColumnRenamed(
        "node", "doc_id"
    )
    labeled = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
        )
    )
    h = md5_long(F.concat(F.lit("split:"), F.col("component").cast("string"))) % 100
    return labeled.select(
        "doc_id",
        "component",
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test").alias("split"),
    )


def _near_dup_cluster_full_oracle() -> str:
    from aoseventstreamer_spark.operators.dedup import verified_near_dup_oracle_sql

    v = verified_near_dup_oracle_sql()
    return f"""
    WITH RECURSIVE v AS MATERIALIZED ({v}),
    sym AS MATERIALIZED (
      SELECT doc_a AS node, doc_b AS nbr FROM v
      UNION SELECT doc_b, doc_a FROM v
    ), reach(node, r) AS (
      SELECT node, node FROM (SELECT DISTINCT node FROM sym)
      UNION
      SELECT s.node, r.r FROM sym s JOIN reach r ON s.nbr = r.node
    ), comp AS (
      SELECT node, MIN(r) AS component FROM reach GROUP BY node
    ), labeled AS (
      SELECT d.doc_id, d.n_chars, COALESCE(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    )
    SELECT doc_id, component, n_chars,
           ROW_NUMBER() OVER (PARTITION BY component
                              ORDER BY n_chars DESC, doc_id ASC) = 1 AS is_keeper
    FROM labeled
    """


@query("q_near_dup_cluster_full", oracle=_near_dup_cluster_full_oracle())
def q_near_dup_cluster_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE production near-dup clustering path, end to end over the
    WHOLE corpus: portable minhash-LSH candidate generation -> exact
    n-gram-Jaccard verification of candidates only
    (operators/dedup.verified_near_dup_pairs) -> connected-component
    resolution -> keep-best-per-cluster (n_chars argmax). This is the
    composition the bounded all-pairs queries (q_dedup_components /
    q_dedup_keep_best, doc_id < 200) stand in for at verify scale —
    here the edge list is banded LSH, never O(n^2), so the same plan
    runs at 100 TB. The oracle chains the minhash-band CTE replay
    into the recursive-CTE closure and the identical argmax window,
    hash-exact."""
    from aoseventstreamer_spark.operators.components import keep_best_per_component
    from aoseventstreamer_spark.operators import dedup as D

    docs = t(spark, sf_dir, "documents")
    edges = D.verified_near_dup_pairs(docs, threshold=0.4, portable=True).select(
        "doc_a", "doc_b"
    )
    return keep_best_per_component(docs, edges, quality_col="n_chars")
