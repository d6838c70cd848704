"""Local replica of the driver's correctness gate: run every declared
query in Spark AND its DuckDB oracle, compare row count, sorted column
names, and an order-insensitive canonicalized value multiset.

Usage: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    """Canonicalize a value the way a cross-engine hasher plausibly
    would; exact — no tolerance."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def rows_to_multiset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from aoseventstreamer_spark.session import get_spark

    spark = get_spark("parity", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            results[name] = f"SPARK ERROR: {type(e).__name__}: {str(e).splitlines()[0][:200]}"
            continue
        if name not in oracles:
            results[name] = f"rows-only: {len(srows)} rows ({time.time()-t0:.1f}s)"
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            results[name] = f"DUCKDB ERROR: {type(e).__name__}: {str(e).splitlines()[0][:200]}"
            continue

        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            sm = rows_to_multiset(scols, srows)
            dm = rows_to_multiset(dcols, drows)
            if sm != dm:
                diffs = [
                    (a, b) for a, b in zip(sm, dm) if a != b
                ][:3]
                extra = len([1 for a, b in zip(sm, dm) if a != b])
                problems.append(f"values: {extra} differing rows; first: {diffs}")
        results[name] = (
            f"OK ({len(srows)} rows, {time.time()-t0:.1f}s)"
            if not problems
            else "MISMATCH: " + "; ".join(problems)
        )

    width = max(len(n) for n in results)
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "rows-only")))
    for name, verdict in sorted(results.items()):
        print(f"{name:<{width}}  {verdict}")
    print(f"\n{n_ok}/{len(results)} passing")
    spark.stop()


if __name__ == "__main__":
    main()
