"""Entity-resolution & sketch-rollup pack: brute-force and bound
checks (DuckDB value parity runs in tools/parity.py / the driver)."""

from __future__ import annotations

from aoseventstreamer_spark.queries import QUERIES
from aoseventstreamer_spark.session import load_table


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_match_matches_brute_force(spark, sf_dir):
    parts = [
        (r.p_partkey, r.p_name)
        for r in load_table(spark, sf_dir, "part").collect()
        if r.p_partkey < 2000
    ]
    expect = set()
    by_blk = {}
    for k, name in parts:
        by_blk.setdefault(name.split(" ")[-1], []).append((k, name))
    for rows in by_blk.values():
        for i, (ka, na) in enumerate(rows):
            for kb, nb in rows[i + 1 :]:
                lo, hi = (ka, na), (kb, nb)
                if ka > kb:
                    lo, hi = hi, lo
                if na != nb and _lev(lo[1], hi[1]) <= 2:
                    expect.add((lo[0], hi[0], _lev(lo[1], hi[1])))
    got = {
        (r.key_a, r.key_b, r.dist)
        for r in QUERIES["q_fuzzy_match"](spark, sf_dir).collect()
    }
    assert got == expect
    assert expect, "fixture produced no fuzzy matches"


def test_fuzzy_match_no_python_nodes(spark, sf_dir):
    from aoseventstreamer_spark.plans import formatted_plan

    assert "Python" not in formatted_plan(QUERIES["q_fuzzy_match"](spark, sf_dir))


def test_hll_rollup_merge_agrees_with_direct(spark, sf_dir):
    row = QUERIES["q_hll_rollup"](spark, sf_dir).collect()[0]
    assert row.n_days >= 1
    exact = row.exact_distinct
    # lgK=12 → relative standard error ~1.6%; allow 4 sigma
    assert abs(row.direct_estimate - exact) / exact < 0.07
    assert abs(row.merged_estimate - exact) / exact < 0.07
    # merging per-day sketches must agree with the single-pass sketch
    assert abs(row.merged_estimate - row.direct_estimate) / exact < 0.05
