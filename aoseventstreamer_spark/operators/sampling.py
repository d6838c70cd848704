"""Deterministic sampling primitives shared by the query pack
(queries/corpus_pack.py) and the recipe layer (operators/curation.py).

The uniform draw is the Knuth multiplicative hash — a pure BIGINT
expression both Spark and DuckDB evaluate identically, standing in
for rand() (which would be neither reproducible nor cross-engine
comparable). ``salt`` decorrelates draws when several sampling steps
compose in one pipeline: without it, two Bernoulli steps keyed on the
same id keep exactly min(p1, p2) of the corpus (perfectly correlated
draws) instead of p1*p2.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KNUTH = 2654435761
M32 = 2**32


def uniform_draw(col: Column | str, salt: int = 0) -> Column:
    """Deterministic uniform-ish draw in [0, 2**32) from a BIGINT id.

    ``salt=0`` is the multiplicative hash — a pure BIGINT expression
    with an exact DuckDB equivalent (``DRAW_SQL``), used by every
    oracle-checked sampling query. ``salt!=0`` switches to
    xxhash64(id, salt): an AFFINE salt (adding before the multiply)
    would only rotate the draw interval, leaving two salted Bernoulli
    steps exactly interval-overlap correlated instead of independent
    (measured: two 50% steps kept 11.8%, the golden-ratio overlap,
    not 25%) — real independence needs a real hash. The salted form
    is engine-specific and therefore not oracle-comparable; it stays
    deterministic and replay-stable.

    The salt=0 multiply is computed limb-split (16-bit halves of
    ``id mod 2**32``) so no intermediate exceeds ~5.7e18: a naive
    ``(id * KNUTH) % 2**32`` overflows int64 once ids pass ~3.47e9 —
    Spark's non-ANSI wrap then yields NEGATIVE draws (``%`` follows
    the dividend sign) and every Bernoulli filter silently accepts
    all rows, while DuckDB raises an overflow error — exactly the
    billion-doc scale this function targets. The limb form is exact
    for EVERY int64 id (negatives included, via pmod) and bit-equal
    to the naive form on ids in [0, 2**31), so existing oracle
    hashes are unchanged.
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt != 0:
        return F.pmod(F.xxhash64(c, F.lit(salt)), F.lit(M32))
    x = F.pmod(c, F.lit(M32))
    lo, hi = F.pmod(x, F.lit(65536)), F.shiftright(x, 16)
    return F.pmod(
        lo * KNUTH + F.pmod(hi * KNUTH, F.lit(65536)) * F.lit(65536), F.lit(M32)
    )


# Exact DuckDB equivalent of the salt=0 draw, valid for all int64 ids
# (the leading double-pmod handles negative ids; every later operand is
# non-negative so plain % suffices).
DRAW_SQL = (
    "(("
    "  ((((({c}) % 4294967296 + 4294967296) % 4294967296) % 65536) * 2654435761)"
    "  + (((((({c}) % 4294967296 + 4294967296) % 4294967296) // 65536)"
    "       * 2654435761) % 65536) * 65536"
    ") % 4294967296)"
)


def domain_mix(
    docs,
    weights: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
):
    """Deterministic target-proportion domain mixing: downsample each
    source so the RETAINED corpus matches the integer weight ratio
    ``weights`` exactly, keeping as many rows as the scarcest source
    allows (the standard 'data recipe' step in published pretraining
    mixes — fixed sampling proportions per domain, e.g. GPT-3 §2.2 /
    Gopher table A1 — expressed as an exact integer allocation instead
    of rand() draws).

    With W = sum(weights) and N_s rows available per source, the
    budget is B = min_s(N_s * W div w_s) — the largest total size
    whose per-source quota k_s = B * w_s div W never exceeds N_s (all
    BIGINT arithmetic, so Spark and an oracle engine agree bit-for-bit;
    div truncation equals floor on these non-negative operands).
    Within a source, the quota picks the k_s rows with the smallest
    (uniform_draw(id), id) — a deterministic uniform subsample,
    idempotent under re-runs and crash-replays.

    Sources absent from ``weights`` are dropped (weight 0); a weighted
    source missing from the corpus makes the mix infeasible and raises.

    Scale shape: one map-side-combined count per source (tiny output),
    driver-free quota derivation (min-aggregate joined back by
    broadcast), then ONE shuffle partitioned by source for the
    rank-within-source filter — the same per-stratum top-k shape as
    reservoir sampling. A 100 TB corpus with a handful of domains is
    skewed by construction; the rank sort is per-partition on a long
    key, and AQE skew-split applies to the exchange. Rows:
    (source, id, rn) with rn <= quota.
    """
    if not weights:
        raise ValueError("domain_mix needs at least one weighted source")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("domain_mix weights must be positive integers")
    from pyspark.sql import Window

    spark = docs.sparkSession
    W = int(sum(weights.values()))
    wdf = spark.createDataFrame(
        [(s, int(w)) for s, w in sorted(weights.items())], f"{source_col} string, w long"
    )
    counts = docs.groupBy(source_col).count().withColumnRenamed("count", "n")
    # left join from the weight table keeps every WEIGHTED source; one
    # with no corpus rows (n null) makes the mix infeasible — fail the
    # job loudly at execution time (lazy, in-plan) rather than zeroing
    # every quota. counts is post-aggregation (one row per distinct
    # source), so it is the broadcastable side.
    avail = wdf.join(F.broadcast(counts), source_col, "left").withColumn(
        "n",
        F.when(
            F.col("n").isNull(),
            F.raise_error(
                F.concat(
                    F.lit("domain_mix: weighted source absent from corpus: "),
                    F.col(source_col),
                )
            ).cast("long"),
        ).otherwise(F.col("n")),
    )
    budget = avail.agg(F.min(F.expr(f"n * {W} div w")).alias("b"))
    quota = (
        avail.crossJoin(F.broadcast(budget))
        .select(source_col, F.expr(f"b * w div {W}").alias("k"))
    )
    rn_w = Window.partitionBy(source_col).orderBy(
        uniform_draw(id_col), F.col(id_col)
    )
    return (
        docs.join(F.broadcast(quota), source_col)
        .withColumn("rn", F.row_number().over(rn_w).cast("long"))
        .filter(F.col("rn") <= F.col("k"))
        .select(source_col, id_col, "rn")
    )


def temperature_mix(
    docs,
    total: int,
    alpha: float,
    source_col: str = "source",
    id_col: str = "doc_id",
):
    """Temperature-based domain mixing: retain ~``total`` documents
    with per-source quotas proportional to ``N_s^alpha`` — the
    multilingual rebalancing rule of mBERT/XLM-R/mT5 (alpha < 1
    up-weights scarce domains relative to their natural share;
    alpha=1 is proportional, alpha=0 uniform). Complements
    ``domain_mix`` (exact target ratios) for the case where the
    recipe is a temperature, not a ratio table.

    Determinism discipline: the only float op is one
    ``round(N^alpha * 1e6)`` per SOURCE (micro-units; engines agree
    short of a representability tie on a handful of values), then all
    allocation is BIGINT: ``k_s = least(total * p_s(s) div Σp_s,
    N_s)`` — the cap makes infeasible totals degrade gracefully to
    taking a scarce source whole (quota-capped subsampling, no
    replacement; epoch-level oversampling is ``epoch_shuffle``'s
    job). Row selection is the same hash-rank prefix as
    ``domain_mix``: smallest (uniform_draw(id), id) per source —
    idempotent under re-runs.

    Overflow guard (the limb-split-uniform_draw lesson applied to the
    quota product): ``total * p_u`` silently wraps in non-ANSI Spark
    once ``N_s^alpha * 1e6 * total`` crosses 2^63 (e.g. N_s ~ 1e10,
    alpha 0.5, total ~ 1e8), while DuckDB raises — so ``p_u`` is
    first downscaled by ``g = ceil(pmax / L)`` with ``L = 2^62 div
    total`` (a plan-time literal), guaranteeing ``total * p_s <=
    total * L <= 2^62``. ``g == 1`` whenever ``pmax * total < 2^62``
    — every realistic configuration — where quotas are bit-identical
    to the unscaled formula; beyond that the allocation loses at most
    ``g`` micro-units of weight resolution per source,
    deterministically and identically in the DuckDB oracle (which
    replays the same ``g``).

    Scale shape: one map-side-combined count per source, a broadcast
    quota join, one shuffle for the per-source rank. Returns
    (source, id, rn), rn <= k_s.
    """
    if total <= 0:
        raise ValueError("temperature_mix total must be positive")
    if not (0.0 <= alpha <= 1.0):
        raise ValueError("temperature_mix alpha must be in [0, 1]")
    from pyspark.sql import Window

    if total >= 1 << 62:
        raise ValueError("temperature_mix total must be < 2^62")
    counts = docs.groupBy(source_col).count().withColumnRenamed("count", "n")
    p = counts.withColumn(
        "p_u", F.round(F.pow(F.col("n").cast("double"), F.lit(float(alpha))) * 1_000_000).cast("long")
    )
    cap = (1 << 62) // int(total)  # p_s <= cap keeps total * p_s <= 2^62
    mx = p.agg(F.max("p_u").alias("pmax"))
    ps = (
        p.crossJoin(F.broadcast(mx))
        .withColumn(
            "g",
            F.expr(
                f"pmax div {cap} + (CASE WHEN pmax % {cap} > 0 THEN 1 ELSE 0 END)"
            ),
        )
        .select(source_col, "n", F.expr("p_u div g").alias("p_s"))
    )
    tot = ps.agg(F.sum("p_s").alias("sp"))
    quota = (
        ps.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            F.least(F.expr(f"{int(total)} * p_s div sp"), F.col("n")).alias("k"),
        )
    )
    rn_w = Window.partitionBy(source_col).orderBy(uniform_draw(id_col), F.col(id_col))
    return (
        docs.join(F.broadcast(quota), source_col)
        .withColumn("rn", F.row_number().over(rn_w).cast("long"))
        .filter(F.col("rn") <= F.col("k"))
        .select(source_col, id_col, "rn")
    )
