"""Full-registry oracle parity as a CI gate (VERDICT r9 item 7).

The driver's correctness window samples 50 of the registry's queries;
``tools/parity.py`` covers all of them but only when run by hand (the
seal ritual). This file turns the full sweep into ONE pytest marker —
``pytest -m parity`` — so a regression in any query OUTSIDE the
driver window fails CI, not just the ritual. Runs at sf0.001 (the
small fixture) with the exact canonicalization tools/parity.py uses;
queries without a declared oracle get the same rows-only check the
driver applies (must execute and return a stable frame).
"""

from __future__ import annotations

import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from tools.parity import TABLES, rows_to_multiset  # noqa: E402

_QUERIES = E.queries()
_ORACLES = E.oracle_sql()


def _check_one(name, spark, sf_dir, con) -> str | None:
    """One query's parity verdict (None = OK) — the exact checks of
    test_query_matches_oracle, factored so the pooled default-suite
    gate and the parametrized reseal sweep can't drift apart."""
    try:
        sdf = _QUERIES[name](spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as e:  # noqa: BLE001 - gate must report, not die
        return f"{name}: SPARK ERROR {type(e).__name__}: {str(e).splitlines()[0][:160]}"
    if name not in _ORACLES:
        return None if scols else f"{name}: empty schema"
    try:
        rel = con.sql(_ORACLES[name])
        dcols = rel.columns
        drows = rel.fetchall()
    except Exception as e:  # noqa: BLE001
        return f"{name}: DUCKDB ERROR {type(e).__name__}: {str(e).splitlines()[0][:160]}"
    if len(srows) != len(drows):
        return f"{name}: rowcount spark={len(srows)} duck={len(drows)}"
    if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
        return f"{name}: columns spark={sorted(scols)} duck={sorted(dcols)}"
    sm = rows_to_multiset(scols, srows)
    dm = rows_to_multiset(dcols, drows)
    if sm != dm:
        diffs = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
        return f"{name}: value mismatch; first diffs: {diffs}"
    return None


def test_full_registry_parity_pooled(spark, sf_dir):
    """The DEFAULT-SUITE full-registry oracle gate (VERDICT r11 item 1):
    the parametrized ``-m parity`` sweep below runs one query per test
    and serially dominates the driver's pytest budget (the r11 verify
    run was truncated mid-suite), so the default run does the SAME 224
    checks through a thread pool — concurrent query jobs back-fill the
    scheduler (guide §2.6) and one DuckDB connection per worker thread
    replays the oracles. The parametrized sweep stays available for
    per-query granularity in reseals (``-m parity`` or the full
    ``-m "slow or not slow"`` run)."""
    from concurrent.futures import ThreadPoolExecutor

    import duckdb

    def check(name: str) -> str | None:
        con = duckdb.connect()
        try:
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')"
                )
            return _check_one(name, spark, sf_dir, con)
        finally:
            con.close()

    # STATEFUL queries (tablelog DML / IVM / persisted-index
    # build-on-miss) mutate shared warehouse or temp-dir state during
    # the build, which the serial sweep never races — keep them serial;
    # everything else (pure reads over the fixture parquet) pools.
    stateful = re.compile(r"tablelog|ivm|persisted|snapshot|incremental")
    pooled = [n for n in sorted(_QUERIES) if not stateful.search(n)]
    serial = [n for n in sorted(_QUERIES) if stateful.search(n)]
    with ThreadPoolExecutor(max_workers=8) as pool:
        errs = [e for e in pool.map(check, pooled) if e]
    errs += [e for e in map(check, serial) if e]
    assert not errs, "\n".join(errs)


@pytest.fixture(scope="module")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parity
@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    """Per-query granular sweep for reseals (``-m parity``); the
    default suite runs the identical checks pooled (above) so the
    driver's budgeted pytest run finishes."""
    err = _check_one(name, spark, sf_dir, duck)
    assert err is None, err
