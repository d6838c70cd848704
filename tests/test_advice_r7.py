"""Regression tests for the round-6 ADVICE findings (all in
operators/dedup.py + functions/jpeg.py):

1. (medium) q_near_dup_verified's oracle was uncapped while the Spark
   side defaulted max_bucket_size=1000 — an overflowing bucket at a
   larger SF would silently drop pairs on the Spark side only. The
   oracle now models the cap; these tests force an overflow with a
   tiny cap and assert cross-engine pair equality.
2. (medium) the pinned-path broadcast hint was justified by the
   per-bucket C(cap, 2) bound only; it is now gated on the MEASURED
   pair count from the checkpointed skeleton.
3. (low) lsh_bucket_overflow banded with xxhash64 regardless of the
   pipeline's portable flag, auditing the wrong buckets.
4. (low) a duplicated id in one bucket produced a degenerate (x, x)
   self-pair under the groupBy pair generation.
5. (low) 12-bit encode at quality 100 could hit AC size 15 and raise
   a raw KeyError from the flat Huffman table lookup.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from aoseventstreamer_spark.operators import dedup as D


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ten documents sharing one identical text: every band agrees, so the
# (band, hash) buckets hold all ten and a cap of 4 must truncate
_CLONES = [(i, "the same boilerplate text repeated verbatim everywhere")
           for i in range(10)]
_CLONES += [(100, "an unrelated singleton document body")]


def test_capped_oracle_matches_spark_on_overflowing_bucket(spark):
    cap = 4
    df = _docs(spark, _CLONES)
    got = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_dedup_pairs(
            df, portable=True, max_bucket_size=cap
        ).collect()
    }
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    want = {
        tuple(r)
        for r in con.execute(
            D.minhash_band_oracle_sql(max_bucket_size=cap)
        ).fetchall()
    }
    con.close()
    # the cap keeps ids 0..3 per bucket -> C(4,2) = 6 pairs, identically
    # on both engines
    assert got == want == {(a, b) for a in range(4) for b in range(a + 1, 4)}


def test_verified_oracle_default_cap_matches_spark_default(spark):
    # verified_near_dup_pairs defaults max_bucket_size=1000 and its
    # oracle now defaults the same — on a corpus with an overflowing
    # bucket at cap=3 the pair sets must still agree when both sides
    # are told the same cap
    df = _docs(spark, _CLONES)
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in D.verified_near_dup_pairs(
            df, threshold=0.4, portable=True, max_bucket_size=3
        ).collect()
    }
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    want = {
        tuple(r)
        for r in con.execute(
            D.verified_near_dup_oracle_sql(threshold=0.4, max_bucket_size=3)
        ).fetchall()
    }
    con.close()
    assert got == want
    assert {(a, b) for a, b, _ in got} == {(0, 1), (0, 2), (1, 2)}


def test_verified_oracle_signature_default_is_spark_default():
    import inspect

    spark_default = inspect.signature(
        D.verified_near_dup_pairs
    ).parameters["max_bucket_size"].default
    oracle_default = inspect.signature(
        D.verified_near_dup_oracle_sql
    ).parameters["max_bucket_size"].default
    assert spark_default == oracle_default == 1000


def test_broadcast_hint_withheld_above_pair_limit(spark):
    df = _docs(spark, _CLONES)
    # limit 0 -> measured count always exceeds it -> no hint anywhere
    plan = D.verified_near_dup_pairs(
        df, threshold=0.4, portable=True, broadcast_pair_limit=0
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" not in plan.lower()
    # generous limit -> hint granted (the measured-count fast path)
    plan = D.verified_near_dup_pairs(
        df, threshold=0.4, portable=True, broadcast_pair_limit=10**6
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" in plan.lower()


def test_bucket_overflow_audit_honors_portable_flag(spark):
    df = _docs(spark, _CLONES)
    sigs = D.minhash_docs(df, portable=True)
    audited = D.lsh_bucket_overflow(sigs, max_bucket_size=4, portable=True)
    rows = audited.collect()
    # ten clones agree on every one of the 4 bands -> 4 overflowing
    # buckets of size 10, 6 dropped each
    assert len(rows) == 4
    assert all(r.bucket_size == 10 and r.n_dropped == 6 for r in rows)
    # the truncated pair set + the audit together account for the
    # uncapped pair set's members
    capped = D.lsh_candidate_pairs(sigs, max_bucket_size=4, portable=True)
    assert capped.count() == 6


def test_duplicate_id_yields_no_self_pair(spark):
    rows = [(1, "a full length document body here"),
            (1, "a full length document body here"),
            (2, "a full length document body here")]
    df = _docs(spark, rows)
    pairs = {(r.doc_a, r.doc_b) for r in D.minhash_dedup_pairs(df).collect()}
    assert (1, 1) not in pairs
    assert pairs == {(1, 2)}


def test_12bit_encode_survives_quality_100_max_amplitude():
    from aoseventstreamer_spark.functions import jpeg as J

    # checkerboard of min/max 12-bit samples maximizes AC energy; at
    # quality 100 every qt entry is 1, so a coefficient can round to
    # 16384 (size 15) — previously a raw KeyError from HUFF_AC_12
    yy, xx = np.mgrid[0:16, 0:16]
    img = (((yy + xx) % 2) * 4095).astype(np.uint16)
    blob = J.encode_jpeg(img, quality=100, precision=12)
    decoded = J.decode_jpeg(blob)
    assert decoded.shape[:2] == (16, 16)
    # the clamp costs amplitude on exactly the overflowing coefficient;
    # the roundtrip must still be a recognizable checkerboard
    px = decoded.astype(np.int64)
    if px.ndim == 3:
        px = px[:, :, 0]
    hi = px[(yy + xx) % 2 == 1].mean()
    lo = px[(yy + xx) % 2 == 0].mean()
    assert hi - lo > 2000


def test_8bit_progressive_encode_survives_quality_100_max_amplitude():
    from aoseventstreamer_spark.functions import jpeg as J

    yy, xx = np.mgrid[0:16, 0:16]
    img = (((yy + xx) % 2) * 255).astype(np.uint8)
    blob = J.encode_jpeg_progressive(img, quality=100)
    decoded = J.decode_jpeg(blob)
    assert decoded.shape[:2] == (16, 16)
