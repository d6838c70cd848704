"""Plan-quality regression tests: the 100 TB acceptance criteria as
assertions (SURVEY.md §4/§6). These fail if a future change silently
turns a broadcast join into a shuffle join, breaks predicate pushdown,
or adds a shuffle to a narrow pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aoseventstreamer_spark import schemas
from aoseventstreamer_spark.functions import subjects as S
from aoseventstreamer_spark.operators.routing import route_emits
from aoseventstreamer_spark.plans import (
    broadcast_join_count,
    has_pushed_filter,
    shuffle_count,
)
from aoseventstreamer_spark.queries import QUERIES
from aoseventstreamer_spark.session import load_table


@pytest.fixture(scope="module")
def event_log(spark, tmp_path_factory):
    """A routed parquet event log to scan-test against."""
    path = str(tmp_path_factory.mktemp("plans") / "event_log")
    raw = spark.createDataFrame(
        [
            {
                "emit_id": i,
                "token": "t",
                "event_resource": schemas.RESOURCE_COLLECTION,
                "resource_id": f"c{i}",
                "event_type": schemas.EVENT_TYPE_ALL,
                "relations": [
                    {"project": f"p{i % 3}", "collection": None,
                     "shared_object": None, "object_groups": []}
                ],
            }
            for i in range(30)
        ],
        schemas.RAW_EMITS_SCHEMA,
    )
    route_emits(raw, secret="t").write.mode("overwrite").parquet(path)
    return path


def test_subtree_predicate_pushes_down(spark, event_log):
    log = spark.read.parquet(event_log)
    df = log.filter(S.subtree_predicate("subject", S.base_subject(["p1"], False)))
    assert has_pushed_filter(df, r"StringStartsWith\(subject")


def test_exact_predicate_pushes_down(spark, event_log):
    log = spark.read.parquet(event_log)
    df = log.filter(
        S.exact_level_predicate("subject", S.base_subject(["p1", "c1"], False))
    )
    assert has_pushed_filter(df, r"EqualTo\(subject")


def test_routing_pipeline_is_narrow(spark):
    """The full emit→route pipeline must plan without any shuffle:
    filter/explode/dispatch are all narrow transformations."""
    raw = spark.createDataFrame([], schemas.RAW_EMITS_SCHEMA)
    routed = route_emits(raw, secret="t")
    assert shuffle_count(routed) == 0


def test_hierarchy_join_broadcasts(spark, sf_dir):
    # AQE's formatted explain repeats the plan (initial+final), so
    # assert presence of broadcasts and absence of any shuffle join.
    from aoseventstreamer_spark.plans.inspect import formatted_plan

    df = QUERIES["q_join_hierarchy"](spark, sf_dir)
    assert broadcast_join_count(df) >= 2  # nation and region both broadcast
    assert "SortMergeJoin" not in formatted_plan(df)


def test_semi_and_anti_join_broadcast(spark, sf_dir):
    from aoseventstreamer_spark.plans.inspect import formatted_plan

    for name in ("q_semi_authz", "q_anti_unauthorized"):
        df = QUERIES[name](spark, sf_dir)
        assert broadcast_join_count(df) >= 1
        assert "SortMergeJoin" not in formatted_plan(df)


def test_topk_global_uses_take_ordered(spark, sf_dir):
    from aoseventstreamer_spark.plans.inspect import formatted_plan

    plan = formatted_plan(QUERIES["q_topk_global"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # no full global sort


def test_column_pruning_reaches_scan(spark, sf_dir):
    from aoseventstreamer_spark.plans.inspect import formatted_plan

    df = QUERIES["q_project_event_fields"](spark, sf_dir)
    plan = formatted_plan(df)
    scan = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "value" not in scan and "props" not in scan  # unused columns pruned


def test_filter_pushdown_on_compound_query(spark, sf_dir):
    df = QUERIES["q_filter_compound"](spark, sf_dir)
    assert has_pushed_filter(df, r"GreaterThan\(value,100")
    assert has_pushed_filter(df, r"In\(event_type")


def test_events_scan_prunes_partitions_when_partitioned(spark, tmp_path):
    """partitionBy(project_id) layout: exact-project predicates prune
    at the file-listing level (partition filter, not a data filter)."""
    from aoseventstreamer_spark.plans.inspect import formatted_plan

    ev = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "project_id", F.col("user_id").cast("string")
    )
    path = str(tmp_path / "partitioned")
    ev.write.partitionBy("project_id").parquet(path)
    df = spark.read.parquet(path).filter(F.col("project_id") == "7")
    plan = formatted_plan(df)
    scan = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "project_id" in scan


def test_every_query_plans_jvm_side(spark, sf_dir):
    """Full-surface structural check: all 72 queries must analyze
    successfully, and none may fall back to row-at-a-time Python
    execution — the only Python-executing plans allowed are the
    multimodal mapInPandas queries (Arrow-batched by design)."""
    from aoseventstreamer_spark.plans.inspect import formatted_plan
    from aoseventstreamer_spark.queries import QUERIES

    python_ok = {
        "q_multimodal_features",
        "q_multimodal_frames",
        "q_media_sniff",
        "q_video_meta",  # MP4 encode/parse plumbing (functions/mp4.py)
        "q_audio_meta",  # FLAC/MP3 encode/parse plumbing (functions/audio.py)
        "q_audio_features",  # WAV encode/decode plumbing (PCM evidence)
        "q_video_frames",  # MJPEG-AVI encode/decode plumbing (functions/avi.py)
        "q_media_catalog",  # mixed-container build + sniff plumbing
        "q_image_features",  # PNG/GIF encode/decode plumbing (pixel evidence)
        "q_video_samples",  # MP4 stbl walk + JPEG decode plumbing
        # fused ANN: single Arrow-batched mapInPandas kernel
        # (bucket+match+cosine in one pass), by design
        "q_ann_lsh",
    }
    # embedding similarity is the one surface allowed to use
    # Arrow-vectorized pandas_udf kernels (design stance, SURVEY §7.0)
    # ... plus BPE encoding, whose merge loop is inherently
    # per-piece iterative (Arrow-batched with per-worker caching)
    arrow_ok = {"q_ann_lsh", "q_embed_near_dup", "q_ann_pq", "q_bpe_token_count"}
    offenders = {}
    for name, fn in QUERIES.items():
        plan = formatted_plan(fn(spark, sf_dir))
        if "BatchEvalPython" in plan:
            offenders[name] = "BatchEvalPython (row-at-a-time UDF)"
        elif "MapInPandas" in plan and name not in python_ok:
            offenders[name] = "unexpected MapInPandas"
        elif "ArrowEvalPython" in plan and name not in arrow_ok:
            offenders[name] = "unexpected ArrowEvalPython (pandas_udf)"
    assert not offenders, offenders


def test_tpch_q3_plan_broadcasts_and_takeordered(spark, sf_dir):
    """Q3's dimension sides broadcast (customer is filtered tiny) and
    the ORDER BY ... LIMIT 10 is TakeOrderedAndProject, never a global
    sort of the aggregate output."""
    from aoseventstreamer_spark.plans.inspect import formatted_plan

    df = QUERIES["q_tpch_q3"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert has_pushed_filter(df, r"EqualTo\(c_mktsegment,BUILDING\)")
    assert has_pushed_filter(df, r"LessThan\(o_orderdate")


def test_tpch_q1_q6_pushdown_and_partial_agg(spark, sf_dir):
    """Q1/Q6: date predicates reach the parquet scan; aggregation is
    partial (map-side combine) before the exchange."""
    from aoseventstreamer_spark.plans.inspect import formatted_plan

    q1 = QUERIES["q_tpch_q1"](spark, sf_dir)
    assert has_pushed_filter(q1, r"LessThanOrEqual\(l_shipdate")
    assert "partial_" in formatted_plan(q1)
    q6 = QUERIES["q_tpch_q6"](spark, sf_dir)
    assert has_pushed_filter(q6, r"GreaterThanOrEqual\(l_shipdate")
    assert "partial_" in formatted_plan(q6)


def test_corpus_score_vocab_broadcasts(spark, sf_dir):
    """The vocabulary join-back must broadcast the (tiny) vocab side,
    never shuffle the token stream for the join."""
    df = QUERIES["q_common_token_score"](spark, sf_dir)
    assert broadcast_join_count(df) >= 1


def test_runtime_bloom_filter_injects_on_selective_fact_join(spark, sf_dir):
    """Catalyst's runtime bloom-filter join: a selective filter on the
    creation side injects a bloom_filter_agg that pre-prunes the big
    probe side before the shuffle — the scale lever for fact-fact
    joins where one side is filtered hard. Thresholds are lowered here
    because the fixture is tiny; at 100 TB the defaults trigger it."""
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """Spark's runtime row-level filtering: a selective dim-side filter
    on a shuffle join injects a bloom filter (bloom_filter_agg on the
    creation side, might_contain on the fact scan) so fact rows that
    cannot join are dropped BEFORE the exchange. At 100 TB the
    application-side threshold (10 GB default) is met naturally; the
    fixture lowers it to 0 to exercise the injection. Conf-scoped."""
    from aoseventstreamer_spark.session import load_table

    tuned = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("q"))
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dsir_select_plans_take_ordered_and_broadcast_model(spark, sf_dir):
    """The DSIR resample's corpus-wide top-k must be
    TakeOrderedAndProject (per-partition heaps), and the O(buckets)
    model must reach the feature stream via broadcast — never a
    shuffle of the exploded features for the model join."""
    from aoseventstreamer_spark.plans.inspect import (
        broadcast_join_count,
        formatted_plan,
    )

    df = QUERIES["q_dsir_select"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert broadcast_join_count(df) >= 1
    assert "SortMergeJoin" not in plan


def test_nb_classify_model_joins_broadcast(spark, sf_dir):
    """NB scoring: the (classes x vocab) model and the class/vocab
    stats frames all broadcast against the exploded token stream; the
    per-doc argmax is a WindowGroupLimit (rank<=1 pushed into the
    shuffle), not a full window materialization."""
    from aoseventstreamer_spark.plans.inspect import (
        broadcast_join_count,
        formatted_plan,
    )

    df = QUERIES["q_nb_classify"](spark, sf_dir)
    plan = formatted_plan(df)
    assert broadcast_join_count(df) >= 2
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan


def test_scoped_filter_rewrites_subtree_query_to_partition_filter(spark, tmp_path):
    """SURVEY §4's one custom-rule candidate, now a facade-free
    rewrite (subjects.scoped_filter): a raw subtree query issued
    directly on a partitioned log read — NOT through
    engine.query_events — must (a) populate the scan's
    PartitionFilters with the derived project_id equality and (b)
    still push the subject predicate down as StringStartsWith."""
    from aoseventstreamer_spark.functions import subjects as S
    from aoseventstreamer_spark.plans.inspect import formatted_plan

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id",
        S.base_subject_col([F.lit("p7"), F.lit("c1")]).alias("subject"),
        F.concat(F.lit("p"), (F.col("user_id") % 10).cast("string")).alias(
            "project_id"
        ),
    )
    path = str(tmp_path / "partitioned_log")
    ev.write.partitionBy("project_id").parquet(path)

    raw = spark.read.parquet(path)  # no facade
    subject = S.query(S.base_subject(["p7"], is_object_group=False), True)
    df = S.scoped_filter(raw, subject)
    plan = formatted_plan(df)
    part = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "project_id" in part and "p7" in part
    assert "StartsWith" in plan  # subject predicate reached the scan

    # frames WITHOUT the partition column degrade to the subject filter
    bare = raw.drop("project_id")
    assert S.scoped_filter(bare, subject).columns == bare.columns


def test_dq_checks_is_one_scan_regardless_of_check_count(spark, sf_dir):
    """The validation suite's scale contract: all six constraints fold
    into ONE aggregate over ONE scan of orders (plus the broadcast
    customer dim) — adding a check must never add a scan."""
    plan = (
        QUERIES["q_dq_checks"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("orders.parquet") == 1
    assert broadcast_join_count(QUERIES["q_dq_checks"](spark, sf_dir)) >= 1
    assert "SortMergeJoin" not in plan


def test_winsorize_broadcasts_percentile_frame(spark, sf_dir):
    """The per-group [p05,p95] frame is |groups| rows — it must come
    back as a broadcast join, never a fact-side shuffle."""
    df = QUERIES["q_winsorize"](spark, sf_dir)
    assert broadcast_join_count(df) >= 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan


def test_interval_join_binned_has_no_nested_loop(spark, sf_dir):
    plan = (
        QUERIES["q_interval_join_binned"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_near_dup_verified_plan_is_slim(spark, sf_dir):
    """VERDICT r5 item 2: the two-phase near-dup pipeline used to
    re-execute shingle→minhash→band per plan reference (10 parquet
    scans / 26 static exchanges for a 25-row answer). With the banded
    frame and the candidate set pinned (localCheckpoint) and the tiny
    pair skeleton broadcast-by-contract, the final plan must scan the
    corpus at most twice (LSH once inside the pin, grams once here),
    shuffle at most 6 times, and never SortMerge the corpus against
    the pair skeleton."""
    from aoseventstreamer_spark.plans.inspect import formatted_plan

    from aoseventstreamer_spark.plans import shuffle_count

    df = QUERIES["q_near_dup_verified"](spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("Scan parquet") <= 2, plan
    assert plan.count("SortMergeJoin") == 0, plan
    assert shuffle_count(df) <= 6, plan


def test_rrf_fuse_legs_are_bounded_before_ranking(spark, sf_dir):
    """VERDICT r10 item 1: each fusion leg must be truncated by a
    TakeOrderedAndProject (orderBy+limit: parallel per-partition
    top-k heaps) BEFORE its rank window, and no unpartitioned window
    anywhere in the plan may sit on an unbounded corpus frame. The
    round-10 rank-then-filter form left the bound to the optimizer
    (LimitPushDownThroughWindow); the rewrite makes it structural."""
    from aoseventstreamer_spark.plans.inspect import (
        unbounded_global_window_sites,
    )

    spark.catalog.clearCache()  # see test_hybrid_ann_semantic_leg_...
    for qname in ("q_hybrid_rrf", "q_hybrid_rrf_persisted",
                  "q_hybrid_rrf_ann"):
        df = QUERIES[qname](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # one TakeOrdered per leg (bm25 + semantic) at minimum; the
        # fused-top window is fed by the bounded union so a third may
        # appear above it
        assert plan.count("TakeOrderedAndProject") >= 2, (qname, plan)
        assert unbounded_global_window_sites(df) == [], qname


def test_hybrid_ann_semantic_leg_is_probe_bounded(spark, sf_dir):
    """VERDICT r10 item 3: q_hybrid_rrf_ann's semantic leg must be
    served from the IVF probe — candidate dot products happen ABOVE a
    cluster equi-join against the broadcast probe list, never as a
    corpus-wide cross join the way the exhaustive recall-ceiling
    variants (q_hybrid_rrf/_persisted) do."""
    # a prior test (the parity sweep runs every query in this session)
    # may have left persisted frames whose logical plans overlap this
    # query's subtrees; CacheManager would then swap FileScans for
    # InMemoryTableScans and the scan-line assertions below would read
    # the wrong plan shape
    spark.catalog.clearCache()
    df = QUERIES["q_hybrid_rrf_ann"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # every raw-corpus embeddings scan must be the 1-row query-vector
    # read (vec_id = 0 pushed); candidates come from the persisted
    # assignments table via the cluster equi-join
    emb_scans = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "embeddings.parquet" in ln
    ]
    assert emb_scans, plan  # the query vector is read from the corpus
    for ln in emb_scans:
        assert "= 0)" in ln, f"full-corpus embeddings scan:\n{ln}"
    # the probe join itself: assignments joined on cluster
    assert "BroadcastHashJoin [cluster" in plan, plan
    # and the postings scan is pruned by the query-term IN-list
    posting_scans = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "postings" in ln
    ]
    assert posting_scans and all("token" in ln and " IN " in ln for ln in posting_scans), plan


def test_dedup_signature_agg_reuses_parallelism_exchange(spark, sf_dir):
    """r11 optimization gate: when ensure_parallelism must repartition
    an under-split documents scan, it hash-partitions by the doc id so
    the signature groupBy reuses that exchange — the minhash and
    simhash pipelines must each show exactly ONE exchange feeding the
    signature aggregation (keyed, not round-robin), not a round-robin
    spread followed by a second agg shuffle."""
    from aoseventstreamer_spark.plans.inspect import formatted_plan

    simhash = QUERIES["q_doc_simhash"](spark, sf_dir)
    plan = formatted_plan(simhash)
    assert "RoundRobinPartitioning" not in plan, plan
    assert "hashpartitioning(doc_id" in plan, plan
    assert shuffle_count(simhash) == 1, plan

    minhash = QUERIES["q_doc_minhash_band"](spark, sf_dir)
    plan = formatted_plan(minhash)
    assert "RoundRobinPartitioning" not in plan, plan
    # doc_id-keyed spread + band-bucket groupBy + pair distinct
    assert shuffle_count(minhash) == 3, plan


def test_explodes_do_not_reevaluate_generator_inputs(spark, sf_dir):
    """r11 optimization gate: InferFiltersFromGenerate is excluded at
    session level — a synthesized `size(relations) > 0` filter would
    re-evaluate the whole relation-array construction once per row
    below the routing fan-out (and the shingle/token explodes of the
    dedup family). The routing pipeline must stay filter-free below
    its Generate nodes."""
    from aoseventstreamer_spark.plans.inspect import formatted_plan

    df = QUERIES["q_route_emits"](spark, sf_dir)
    plan = formatted_plan(df)
    # the only Filter permitted is none at all: the token check is
    # constant-folded and no size() filter may be inferred
    assert ") Filter" not in plan, plan


def test_embed_near_dup_pair_shuffle_carries_ids_only(spark, sf_dir):
    """r11 optimization gate: cosine_near_dup_pairs must dedup
    candidate pairs on ids alone and re-attach vectors afterwards —
    the multi-table dedup aggregate dragging both 64-double vectors
    through its exchange was a measured 50x shuffle blowup (4.3 MB of
    embeddings -> 217 MB shuffled). The pair-dedup HashAggregate must
    therefore carry no vector columns (no first(va)/first(vb))."""
    from aoseventstreamer_spark.plans.inspect import formatted_plan

    df = QUERIES["q_embed_near_dup"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "first(va" not in plan, plan
    assert "first(vb" not in plan, plan
    assert "hashpartitioning(id_a" in plan, plan


def test_ivf_assign_sql_build_matches_column_build(spark):
    """r11 optimization gate: _ivf_assign builds its argmin expression
    as ONE SQL parse (the Column API paid a py4j round trip per literal
    node — ~2 s of driver time per Lloyd round). The parsed expression
    must stay value-identical to the Column construction it replaced."""
    from aoseventstreamer_spark.operators.similarity import (
        _ivf_assign,
        _ivf_dist2,
        int_dot,
    )

    df = spark.createDataFrame(
        [(1, [3, -2, 5]), (2, [0, 0, 1]), (3, [-4, 4, -4])], "id long, qv array<bigint>"
    )
    cents = {0: [1, 1, 1], 1: [-3, 3, -3], 2: [3, -2, 5]}
    new = {r["id"]: r["cluster"] for r in _ivf_assign(df, cents).collect()}

    qq = int_dot(F.col("qv"), F.col("qv"))
    cells = [
        F.struct(
            _ivf_dist2(qq, F.col("qv"), cv).alias("d2"),
            F.lit(cid).cast("int").alias("cluster"),
        )
        for cid, cv in sorted(cents.items())
    ]
    legacy = {
        r["id"]: r["cluster"]
        for r in df.withColumn(
            "cluster", F.array_min(F.array(*cells))["cluster"]
        ).collect()
    }
    assert new == legacy


def test_span_gram_construction_is_spread(spark, sf_dir):
    """r11 optimization gate: token_windows must spread an under-split
    scan with the doc-id-keyed exchange (no round-robin pre-sort)
    before the CPU-dense rolling-window construction."""
    from aoseventstreamer_spark.plans.inspect import formatted_plan

    df = QUERIES["q_span_dup_spans"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "RoundRobinPartitioning" not in plan, plan
    assert "hashpartitioning(doc_id" in plan, plan
