"""Skew-handling utilities: salted joins and salted aggregation.

AQE's skew-join handles most runtime skew; these are for the cases a
planner can't fix — a join key where one value holds a double-digit
percentage of a 100 TB fact table. Salting fans one hot key across
``n_salts`` reducers: the fact side gets a uniform pseudo-random salt,
the dimension side is exploded across every salt value (dimension rows
are duplicated n_salts times — cheap for the small side by definition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _salt_col(df: DataFrame, n_salts: int) -> Column:
    # deterministic per row content (hash over all columns) — avoids
    # rand()'s re-execution hazards under task retries
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def _guard_salt_free(*dfs: DataFrame) -> None:
    # same collision contract as bloom_semi_reduce's __bloom_bits: an
    # input that already carries the internal column would silently
    # join/group on the wrong thing
    for df in dfs:
        if _SALT in df.columns:
            raise ValueError(
                f"input already has a column named {_SALT!r}; rename it"
            )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on column ``on`` with the hot-key
    shuffle spread over n_salts partitions per key. Result is identical
    to ``large.join(small, on, how)``.

    Only inner and left joins are supported: for right/full outer the
    exploded small side would surface each unmatched small row once
    per salt value (n_salts duplicates), so those modes are rejected
    rather than silently wrong."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    _guard_salt_free(large, small)
    salted_large = large.withColumn(_SALT, _salt_col(large, n_salts))
    salted_small = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_large.join(salted_small, on=[on, _SALT], how=how)
    return out.drop(_SALT)


def two_phase_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe aggregation: partial agg on (key, salt), final agg on
    key. ``aggs`` maps output column -> 'sum(col)' / 'count(*)' /
    'min(col)' / 'max(col)' (the re-aggregatable functions)."""
    _guard_salt_free(df)
    salted = df.withColumn(_SALT, _salt_col(df, n_salts))

    partial_exprs, final_exprs = [], []
    for out_name, spec in aggs.items():
        fn, _, col = spec.rstrip(")").partition("(")
        fn = fn.lower()
        if fn == "count":
            # count(*) counts rows; count(col) must skip nulls
            partial_exprs.append(
                (F.count("*") if col in ("*", "") else F.count(col)).alias(out_name)
            )
            final_exprs.append(F.sum(out_name).alias(out_name))
        elif fn in ("sum", "min", "max"):
            partial_exprs.append(getattr(F, fn)(col).alias(out_name))
            final_exprs.append(getattr(F, fn)(out_name).alias(out_name))
        else:
            raise ValueError(f"non-re-aggregatable function: {fn}")

    partial = salted.groupBy(key, _SALT).agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)
