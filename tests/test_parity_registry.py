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
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from tools.parity import TABLES, rows_to_multiset  # noqa: E402

pytestmark = pytest.mark.parity

_QUERIES = E.queries()
_ORACLES = E.oracle_sql()


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


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = _QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if name not in _ORACLES:
        # rows-only by declared design (native sketches, engine-
        # specific ANN): the gate is "executes, stable schema"
        assert scols, name
        return
    rel = duck.sql(_ORACLES[name])
    dcols = rel.columns
    drows = rel.fetchall()
    assert len(srows) == len(drows), (
        f"{name}: rowcount spark={len(srows)} duck={len(drows)}"
    )
    assert sorted(c.lower() for c in scols) == sorted(
        c.lower() for c in dcols
    ), f"{name}: columns spark={sorted(scols)} duck={sorted(dcols)}"
    sm = rows_to_multiset(scols, srows)
    dm = rows_to_multiset(dcols, drows)
    if sm != dm:
        diffs = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
        pytest.fail(f"{name}: value mismatch; first diffs: {diffs}")
