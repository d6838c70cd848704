"""Corpus-curation pack: brute-force Python oracles and plan-shape
assertions (value parity vs DuckDB is covered by tools/parity.py /
the driver)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import similarity as SIM
from aoseventstreamer_spark.plans import (
    broadcast_join_count,
    formatted_plan,
    shuffle_count,
)
from aoseventstreamer_spark.queries import QUERIES
from aoseventstreamer_spark.session import load_table

KNUTH, M32 = 2654435761, 2**32


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").collect()


def test_substring_dup_fraction_matches_brute_force(spark, sf_dir):
    docs = sorted(_docs(spark, sf_dir), key=lambda r: r.doc_id)
    first = {}
    expect = {}
    for r in docs:
        toks = r.text.split(" ")
        grams = {" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)}
        dup = sum(1 for g in grams if first.setdefault(g, r.doc_id) < r.doc_id)
        if grams:
            expect[r.doc_id] = (len(grams), dup)
    got = {
        r.doc_id: (r.n_grams, r.n_dup_grams)
        for r in QUERIES["q_substring_dup_fraction"](spark, sf_dir).collect()
    }
    assert got == expect
    assert any(v[1] > 0 for v in expect.values()), "fixture has no dup grams"


def test_substring_dup_fraction_plan_is_gram_keyed(spark, sf_dir):
    df = QUERIES["q_substring_dup_fraction"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Python" not in plan  # built-ins only
    # gram-min, join-back, final doc agg: bounded shuffle count
    assert shuffle_count(df) <= 4


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


def test_semantic_dedup_exact_matches_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").collect()
    by_label = defaultdict(list)
    for r in sorted(emb, key=lambda r: r.vec_id):
        by_label[r.label].append(r)
    expect = set()
    for label, rows in by_label.items():
        for i, b in enumerate(rows):
            dup = any(
                round(_cos(a.embedding, b.embedding) * 10000) >= 3000
                for a in rows[:i]
            )
            if not dup:
                expect.add((b.vec_id, label))
    got = {
        (r.id, r.cluster)
        for r in QUERIES["q_semantic_dedup"](spark, sf_dir).collect()
    }
    assert got == expect
    assert len(got) < len(emb), "threshold pruned nothing"


def test_semdedup_kmeans_prune_is_valid_and_idempotent(spark, sf_dir):
    """Without pinning the (engine-specific) centroids: every kept
    pair within a cluster must be below threshold, and re-running on
    the survivors must keep everything."""
    emb = load_table(spark, sf_dir, "embeddings")
    kept = QUERIES["q_semdedup_kmeans"](spark, sf_dir)
    kept_rows = kept.join(
        emb, kept.id == emb.vec_id
    ).select("id", "cluster", "embedding").collect()
    assert 0 < len(kept_rows) < emb.count()
    by_cluster = defaultdict(list)
    for r in kept_rows:
        by_cluster[r.cluster].append(r)
    for rows in by_cluster.values():
        rows.sort(key=lambda r: r.id)
        for i, b in enumerate(rows):
            for a in rows[:i]:
                assert round(_cos(a.embedding, b.embedding) * 10000) < 3000
    # idempotence on the exact (label-partition) variant: survivors
    # of a semantic_dedup pass survive a second pass unchanged
    once = SIM.semantic_dedup(emb, tau=0.30, cluster_col="label")
    emb2 = emb.join(once.select(F.col("id").alias("vec_id")), "vec_id")
    twice = SIM.semantic_dedup(emb2, tau=0.30, cluster_col="label")
    assert sorted(r.id for r in twice.collect()) == sorted(
        r.id for r in once.collect()
    )


def test_weighted_sample_matches_brute_force(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    mx = max(r.n_chars for r in docs)
    expect = {
        r.doc_id
        for r in docs
        if (r.doc_id * KNUTH) % M32 * mx < r.n_chars * M32
    }
    got = {r.doc_id for r in QUERIES["q_weighted_sample"](spark, sf_dir).collect()}
    assert got == expect
    assert 0 < len(got) < len(docs)


def test_weighted_sample_plan_broadcasts_scalar_no_extra_shuffle(spark, sf_dir):
    df = QUERIES["q_weighted_sample"](spark, sf_dir)
    assert broadcast_join_count(df) >= 1
    # the only exchange is the 1-row max aggregate's (plus its
    # broadcast); the corpus side must not shuffle
    assert shuffle_count(df) <= 1


def test_reservoir_sample_matches_brute_force(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    by_src = defaultdict(list)
    for r in docs:
        by_src[r.source].append(r)
    expect = set()
    for src, rows in by_src.items():
        rows.sort(key=lambda r: ((r.doc_id * KNUTH) % M32, r.doc_id))
        expect |= {(src, r.doc_id) for r in rows[:10]}
    got = {
        (r.source, r.doc_id)
        for r in QUERIES["q_reservoir_sample"](spark, sf_dir).collect()
    }
    assert got == expect
    n_src = len(by_src)
    assert len(got) == sum(min(10, len(v)) for v in by_src.values()) >= n_src


def test_bpe_pairs_matches_brute_force(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    cnt = Counter()
    for r in docs:
        toks = r.text.split(" ")
        for i in range(len(toks) - 1):
            cnt[toks[i] + " " + toks[i + 1]] += 1
    expect = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = [
        (r.pair, r.cnt)
        for r in QUERIES["q_bpe_pairs"](spark, sf_dir)
        .orderBy(F.col("cnt").desc(), "pair")
        .collect()
    ]
    assert got == expect


def test_bpe_pairs_uses_take_ordered(spark, sf_dir):
    plan = formatted_plan(QUERIES["q_bpe_pairs"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_url_dedup_matches_brute_force(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    agg = {}
    for r in docs:
        url = (
            f"https://{r.source.upper()}.example.com/page/{r.doc_id % 50}"
            + (f"?utm_source=x&sid={r.doc_id}" if r.doc_id % 3 == 0 else "")
        )
        canon = url.split("?")[0].lower()
        n, keep, tracked = agg.get(canon, (0, None, 0))
        agg[canon] = (
            n + 1,
            r.doc_id if keep is None else min(keep, r.doc_id),
            tracked + ("?" in url),
        )
    got = {
        r.canonical_url: (r.n_variants, r.keep_doc, r.n_tracked)
        for r in QUERIES["q_url_dedup"](spark, sf_dir).collect()
    }
    assert got == agg
    assert any(v[0] > 1 for v in agg.values()), "no URL collapsed"


def test_zorder_key_matches_brute_force(spark, sf_dir):
    rows = QUERIES["q_zorder_key"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        z = 0
        for i in range(8):
            z += ((r.x >> i) & 1) * 4**i + ((r.y >> i) & 1) * 2 * 4**i
        assert r.zkey == z


def test_zorder_key_zero_shuffle(spark, sf_dir):
    df = QUERIES["q_zorder_key"](spark, sf_dir)
    assert shuffle_count(df) == 0
    assert "Python" not in formatted_plan(df)


def test_epoch_shuffle_matches_brute_force(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    by_shard = defaultdict(list)
    for r in docs:
        h = (r.doc_id * KNUTH) % M32
        by_shard[h % 16].append((h // 16, r.doc_id))
    expect = {}
    for shard, rows in by_shard.items():
        rows.sort()
        for pos, (_, doc_id) in enumerate(rows, start=1):
            expect[doc_id] = (shard, pos)
    got = {
        r.doc_id: (r.shard, r.position)
        for r in QUERIES["q_epoch_shuffle"](spark, sf_dir).collect()
    }
    assert got == expect
    # every shard's positions are 1..len (a valid dense order)
    assert len({v for v in got.values()}) == len(got)


def test_lateral_topn_decorrelates_to_window(spark, sf_dir):
    """The lateral ORDER BY..LIMIT must NOT execute as a per-nation
    nested-loop rescan: Catalyst decorrelates it into a rank window
    (or equivalent join) — no CartesianProduct in the plan."""
    df = QUERIES["q_lateral_topn"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    rows = df.collect()
    # top-2 per nation, acctbal descending
    by_nation = defaultdict(list)
    for r in rows:
        by_nation[r.n_name].append(r.c_acctbal)
    assert all(len(v) <= 2 and v == sorted(v, reverse=True) for v in by_nation.values())


def test_recursive_cte_fixpoint(spark, sf_dir):
    rows = sorted(
        (r.day_n, r.running)
        for r in QUERIES["q_recursive_cte"](spark, sf_dir).collect()
    )
    expect = []
    running = 0
    for n in range(1, 31):
        running += n
        expect.append((n, running))
    assert rows == expect


def test_substring_dup_hashed_path_matches_exact(spark, sf_dir):
    """The scale path (gram→xxhash64 long before the shuffle) must
    produce identical counts to the exact-string path on the fixture
    (collisions are ~2^-65 per pair; none here)."""
    from aoseventstreamer_spark.operators.dedup import substring_dup_counts

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        r.doc_id: (r.n_grams, r.n_dup_grams)
        for r in substring_dup_counts(docs, hashed=False).collect()
    }
    hashed = {
        r.doc_id: (r.n_grams, r.n_dup_grams)
        for r in substring_dup_counts(docs, hashed=True).collect()
    }
    assert exact == hashed


def test_short_docs_do_not_crash_gram_ops(spark):
    """Review regression: 1-token and 4-token documents must yield
    zero gram/pair rows (matching generate_series semantics), not a
    descending F.sequence + slice(0) SparkRuntimeException."""
    from aoseventstreamer_spark.operators.dedup import substring_dup_counts

    docs = spark.createDataFrame(
        [(1, "solo", 4, "srcA"), (2, "a b c d", 7, "srcA"),
         (3, "one two three four five six", 27, "srcB")],
        "doc_id long, text string, n_chars long, source string",
    )
    sub = substring_dup_counts(docs, hashed=False).collect()
    assert {r.doc_id for r in sub} == {3}  # only the >=5-token doc
    docs.createOrReplaceTempView("__short_docs")
    # run the registered q_bpe_pairs logic against the tiny frame via
    # the same expression path (pair fan-out with the guard)
    from pyspark.sql import functions as F2

    toks = F2.split("text", " ")
    n = F2.size(toks)
    pairs = F2.when(
        n >= 2,
        F2.transform(
            F2.sequence(F2.lit(1), n - 1),
            lambda i: F2.concat_ws(" ", F2.slice(toks, i, F2.lit(2))),
        ),
    ).otherwise(F2.array().cast("array<string>"))
    got = docs.select(F2.explode(pairs).alias("p")).collect()
    assert len(got) == 3 + 5  # 4-token doc: 3 pairs; 6-token doc: 5


def test_train_val_test_dedup_safe(spark):
    """Exact duplicates (even with different whitespace/punctuation)
    are assigned to the SAME split — the leakage guard the query
    exists for."""
    docs = spark.createDataFrame(
        [(1, "The cat sat."), (2, "the   cat sat"), (3, "something else")],
        ["doc_id", "text"],
    )
    from aoseventstreamer_spark.operators.text import fingerprint
    from pyspark.sql import functions as F
    from aoseventstreamer_spark.operators.sampling import M32

    draw = (
        F.conv(F.substring(fingerprint("text"), 1, 15), 16, 10).cast("long") % M32
    )
    out = docs.select(
        "doc_id",
        F.when(draw * 10 < M32 * 8, "train")
        .when(draw * 10 < M32 * 9, "val")
        .otherwise("test")
        .alias("split"),
    ).collect()
    by_id = {r.doc_id: r.split for r in out}
    assert by_id[1] == by_id[2]  # normalization-equal docs stay together


def test_domain_mix_exact_quotas_and_ratio(spark, sf_dir):
    """domain_mix keeps exactly B*w div W rows per source (B sized by
    the scarcest source), the kept set is the hash-rank prefix within
    each source, and re-running selects the identical rows."""
    import pytest
    from pyspark.sql import functions as F

    from aoseventstreamer_spark.operators.sampling import domain_mix, uniform_draw
    from aoseventstreamer_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    weights = {"src0": 5, "src1": 3, "src2": 2, "src3": 1, "src4": 1}
    out = domain_mix(docs, weights)
    got = {(r.source, r.doc_id) for r in out.collect()}

    # independently derive the expected allocation in Python
    counts = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    W = sum(weights.values())
    budget = min(counts[s] * W // w for s, w in weights.items())
    quotas = {s: budget * w // W for s, w in weights.items()}
    draws = {
        (r.source, r.doc_id): r.d
        for r in docs.select(
            "source", "doc_id", uniform_draw("doc_id").alias("d")
        ).collect()
        if r.source in weights
    }
    expect = set()
    for s, k in quotas.items():
        ranked = sorted(
            (d for d in draws if d[0] == s), key=lambda t: (draws[t], t[1])
        )
        expect |= set(ranked[:k])
    assert got == expect
    # per-source retained counts realize the 5:3:2:1:1 allocation
    per = {s: sum(1 for x in got if x[0] == s) for s in weights}
    assert per == quotas and sum(per.values()) > 0
    # unweighted sources are dropped entirely
    assert {s for s, _ in got} == set(weights)
    # determinism: a second run returns the identical set
    assert {(r.source, r.doc_id) for r in domain_mix(docs, weights).collect()} == got

    # infeasible mix (weighted source absent) fails loudly, not empty
    with pytest.raises(Exception, match="absent from corpus"):
        domain_mix(docs, {"src0": 1, "no_such_source": 1}).collect()
    with pytest.raises(ValueError, match="positive"):
        domain_mix(docs, {"src0": 0})
    with pytest.raises(ValueError, match="at least one"):
        domain_mix(docs, {})


def test_temperature_mix_alpha_extremes(spark):
    from aoseventstreamer_spark.operators.sampling import temperature_mix

    rows = [(i, "srcA" if i < 90 else "srcB") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")

    # alpha=1: proportional quotas (90:10 of total 50 -> 45:5)
    prop = temperature_mix(docs, total=50, alpha=1.0)
    by_src = {r.source: r.cnt for r in
              prop.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert by_src == {"srcA": 45, "srcB": 5}

    # alpha=0: uniform per-source quotas, capped at availability
    unif = temperature_mix(docs, total=40, alpha=0.0)
    by_src = {r.source: r.cnt for r in
              unif.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert by_src == {"srcA": 20, "srcB": 10}  # srcB capped at its 10 docs

    # deterministic: identical selection on re-run
    a = sorted(map(tuple, temperature_mix(docs, 50, 0.5).collect()))
    b = sorted(map(tuple, temperature_mix(docs, 50, 0.5).collect()))
    assert a == b


def test_temperature_mix_huge_total_no_overflow(spark):
    """Regression for the r4 advice: total * p_u used to wrap int64
    once total * N^alpha * 1e6 crossed 2^63 (negative quota -> empty
    selection in non-ANSI Spark, a raise in DuckDB). The adaptive
    downscale (g = ceil(pmax / (2^62 div total))) must keep the
    allocation pure-BIGINT and match a pure-Python replay."""
    from aoseventstreamer_spark.operators.sampling import temperature_mix

    rows = [(i, f"s{i % 3}") for i in range(60)]
    sdf = spark.createDataFrame(rows, "doc_id long, source string")
    total = 1 << 50
    got = temperature_mix(sdf, total, 0.5).collect()
    assert len(got) == 60  # quota >> n: every source taken whole

    # pure-python replay of the scaled BIGINT allocation
    n_by = {"s0": 20, "s1": 20, "s2": 20}
    p_u = {s: round((n ** 0.5) * 1_000_000) for s, n in n_by.items()}
    cap = (1 << 62) // total
    pmax = max(p_u.values())
    g = pmax // cap + (1 if pmax % cap else 0)
    assert g > 1  # the guard regime is actually exercised
    p_s = {s: v // g for s, v in p_u.items()}
    sp = sum(p_s.values())
    by_src = {}
    for r in got:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    for s, n in n_by.items():
        assert total * p_s[s] <= 1 << 62  # product provably in range
        assert by_src[s] == min(total * p_s[s] // sp, n)
