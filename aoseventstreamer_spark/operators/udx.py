"""User-defined extension points: Python UDTF + grouped pandas UDAF.

The engine's design stance (SURVEY §7.0) is built-ins first — every
hot-path operator is Catalyst-visible, and `tests/test_plans.py`
enforces that no registered query falls back to row-at-a-time Python.
These wrappers exist because a real deployment still needs an escape
hatch for logic Spark genuinely cannot express, and the capability
matrix (§2.B UDF/UDAF/UDTF row) should demonstrate the supported
shapes rather than leave them implied:

- **UDTF** (1 row → N rows with driver-visible schema): the Spark 4
  Python UDTF surface. The example is deliberately one a production
  pipeline would NOT use a UDTF for (tokenization is `posexplode` +
  `split`, see q_posexplode_tokens) — tests assert the UDTF output
  EQUALS the built-in plan's output, documenting both the mechanism
  and the preferred alternative.
- **UDAF** via ``applyInPandas`` (whole-group pandas function,
  Arrow-batched): the shape for per-group logic that needs a real
  dataframe library (sklearn-style fits, scipy stats) rather than an
  aggregate expression.
- **Cogrouped applyInPandas** (two frames aligned per key, each
  arriving as its own pandas frame): the shape for per-key logic over
  TWO datasets that a join would force into one wide row-set first —
  e.g. aligning a user's click and purchase timelines. The example is
  again one a production pipeline has a built-in path for (the as-of
  join, operators/asof.py) and the test asserts equality with it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize_udtf():
    """Python UDTF splitting text into (pos, tok) rows — the
    demonstration counterpart of the built-in posexplode path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string")
    class Tokenize:
        def eval(self, text: str):
            for i, t in enumerate((text or "").split()):
                yield i, t

    return Tokenize


def tokenize_with_udtf(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Apply the tokenize UDTF with a lateral join, keeping the id."""
    Tokenize = tokenize_udtf()
    return df.lateralJoin(
        Tokenize(F.col(text_col).outer()).alias("t")
    ).select(id_col, "t.pos", "t.tok")


def grouped_weighted_stats(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    weight_col: str = "user_id",
) -> DataFrame:
    """Per-group weighted mean + weighted variance via applyInPandas —
    the grouped-UDAF shape (whole group arrives as one pandas frame,
    Arrow-batched; output schema declared up front). The key column's
    type is DERIVED from the input (hardcoding it would make any
    non-string key an Arrow type mismatch at execution)."""
    key_type = df.schema[key_col].dataType.simpleString()
    schema = f"{key_col} {key_type}, w_mean double, w_var double, n long"

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        w = pdf[weight_col].to_numpy(dtype=float) + 1.0  # strictly positive
        v = pdf[value_col].to_numpy(dtype=float)
        mean = float(np.average(v, weights=w))
        var = float(np.average((v - mean) ** 2, weights=w))
        return pd.DataFrame(
            {key_col: [pdf[key_col].iloc[0]], "w_mean": [round(mean, 6)],
             "w_var": [round(var, 6)], "n": [len(pdf)]}
        )

    return df.groupBy(key_col).applyInPandas(stats, schema=schema)


def cogrouped_asof(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """As-of alignment via ``cogroup().applyInPandas``: for every left
    row, the greatest right ``ts`` ≤ it and that row's value — the
    same contract as operators/asof.as_of_join (inner, ties take the
    max value at the tie timestamp), computed per key with pandas
    ``merge_asof`` on the two Arrow-shipped group frames.

    This is the COGROUP demonstration piece: each key's two sides
    arrive as separate pandas frames after one shuffle per input
    (no pre-join), which is the right escape hatch when the per-key
    logic needs both sides as FRAMES (sequence alignment, per-user
    reconciliation) rather than a row product. The built-in as-of
    composition stays the production path — `tests/test_udx.py`
    asserts this function EQUALS it row-for-row."""
    key_type = left.schema[key_col].dataType.simpleString()
    schema = (
        f"event_id long, {key_col} {key_type}, ts timestamp,"
        " asof_ts timestamp, asof_value double"
    )

    def align(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty or rpdf.empty:  # inner semantics: no match side
            return pd.DataFrame(
                columns=["event_id", key_col, "ts", "asof_ts", "asof_value"]
            )
        lp = lpdf.sort_values(ts_col)
        # ties: keep the max value at each right timestamp (the as-of
        # join's deterministic tie rule), then merge_asof backward
        rp = (
            rpdf.groupby(ts_col, as_index=False)[val_col]
            .max()
            .sort_values(ts_col)
        )
        out = pd.merge_asof(
            lp,
            rp.rename(columns={ts_col: "asof_ts", val_col: "asof_value"}),
            left_on=ts_col,
            right_on="asof_ts",
            direction="backward",
        )
        out = out.dropna(subset=["asof_value"])  # inner semantics
        return out[["event_id", key_col, ts_col, "asof_ts", "asof_value"]].rename(
            columns={ts_col: "ts"}
        )

    return (
        left.groupBy(key_col)
        .cogroup(right.groupBy(key_col))
        .applyInPandas(align, schema=schema)
    )
