"""Cross-document exact-substring (span-level) deduplication.

Doc-level near-dup (``operators/dedup.py``) removes whole documents;
this module removes *duplicated passages inside otherwise-unique
documents* — the ExactSubstr semantics of Lee et al. 2021
("Deduplicating Training Data Makes Language Models Better"): any
W-token window whose text occurs at more than one (doc, pos) location
in the corpus is a duplicate; every occurrence except the corpus-global
first is cut, and overlapping/adjacent cut windows merge into maximal
spans. (The paper builds a suffix array; the distributed re-expression
below — rolling windows → group on the window key → non-first
occurrences → per-doc island merge — computes the same fixed-W spans
with two shuffles and no suffix structure, which is the shape that
survives 100 TB.)

Reference scope: no reference analog (LLM-pipeline mandate; the
reference at /root/reference is an event-streaming engine,
src/server/*.rs — its query surface is covered elsewhere).

Scale design
------------
- Tokenize once; W-token windows are array expressions over the token
  array (codegen'd), exploded to (doc, pos, key) rows — a narrow map.
- Duplicate detection is ONE shuffle: a window function over
  ``PARTITION BY key`` (count + min occurrence key) — no self-join.
  (A groupBy+join-back formulation would add map-side combine at the
  cost of a second shuffle; the window form wins while window groups
  stay small, which fixed-W grams guarantee.)
- ``gram_key="xxhash64"`` (production default) shuffles an 8-byte key
  instead of a W-token string — the shuffle shrinks ~10×; string keys
  are kept for cross-engine oracle parity, and ``"md5"`` gives a
  portable 60-bit hash (collision odds 2^-60 per pair, the repo-wide
  accepted trade).
- Span merge is a per-doc gaps-and-islands window (shuffle keyed on
  doc_id — uniformly distributed); with fixed W the running-max span
  end reduces to ``lag(pos)``, so the state per row is O(1).
- The cut never explodes tokens to rows: spans collect per doc
  (few per doc by construction) and the clean text is rebuilt with
  array higher-order functions — zero extra shuffles beyond the
  span join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators.dedup import md5_long

# Occurrence key packs (doc_id, pos) into one BIGINT so "corpus-global
# first occurrence" is a plain MIN on both engines. 2^20 positions per
# doc (docs are tokenized text; 1M tokens/doc headroom) × 2^43 docs.
POS_SHIFT = 1 << 20


def token_windows(
    docs: DataFrame,
    w: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_key: str = "string",
) -> DataFrame:
    """(id, pos, key) — one row per W-token rolling window, pos 1-based.

    ``gram_key``: "string" (oracle-portable), "md5" (portable 60-bit
    hash), or "xxhash64" (production: cheapest, Spark-only).
    """
    from ..session import ensure_parallelism

    # the rolling-window construction (slice+concat per gram) is the
    # CPU-dense stage of every span query; on an under-split scan it
    # would run single-task (measured 2.1 s on one core at sf0.1
    # feeding a 10.6 MB shuffle). Keyed spread; no-op at scale.
    docs = ensure_parallelism(docs, key=id_col)
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    grams = F.when(
        n >= w,
        F.transform(
            F.sequence(F.lit(1), n - w + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(w))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    win = docs.select(id_col, F.posexplode(grams).alias("pos0", "gram"))
    if gram_key == "string":
        key: Column = F.col("gram")
    elif gram_key == "md5":
        key = md5_long("gram")
    elif gram_key == "xxhash64":
        key = F.xxhash64("gram")
    else:
        raise ValueError(f"unknown gram_key: {gram_key!r}")
    return win.select(
        id_col,
        (F.col("pos0") + 1).cast("long").alias("pos"),
        key.alias("key"),
    )


def duplicate_occurrences(
    docs: DataFrame,
    w: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_key: str = "string",
) -> DataFrame:
    """(id, pos) of every duplicated window occurrence EXCEPT the
    corpus-global first (min packed (doc_id, pos)) — the copy that is
    kept. One shuffle, keyed on the window key."""
    win = token_windows(docs, w, id_col, text_col, gram_key)
    okey = F.col(id_col) * POS_SHIFT + F.col("pos")
    wk = Window.partitionBy("key")
    return (
        win.select(
            id_col,
            "pos",
            okey.alias("okey"),
            F.min(okey).over(wk).alias("first_okey"),
            F.count(F.lit(1)).over(wk).alias("c"),
        )
        .where((F.col("c") > 1) & (F.col("okey") != F.col("first_okey")))
        .select(id_col, "pos")
    )


def merged_spans(
    occurrences: DataFrame, w: int, id_col: str = "doc_id"
) -> DataFrame:
    """Merge each doc's duplicate windows [pos, pos+w-1] into maximal
    spans (gaps-and-islands; windows merge when they overlap or touch,
    i.e. the pos gap is ≤ w). Emits (id, span_start, span_end,
    n_windows, n_tokens)."""
    wd = Window.partitionBy(id_col).orderBy("pos")
    prev = F.lag("pos").over(wd)
    new_island = (prev.isNull() | (F.col("pos") - prev > w)).cast("long")
    run = wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    isl = occurrences.select(
        id_col, "pos", F.sum(new_island).over(run).alias("island")
    )
    return isl.groupBy(id_col, "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (w - 1)).alias("span_end"),
        F.count(F.lit(1)).alias("n_windows"),
        (F.max("pos") + (w - 1) - F.min("pos") + 1).alias("n_tokens"),
    ).drop("island")


def cut_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rebuild each doc with its duplicate spans removed. Spans are
    disjoint by construction, so the cut-token count is the plain sum
    of span positions. Array-native: no per-token explode, one join
    (doc → its few spans) and higher-order filters."""
    sp = spans.groupBy(id_col).agg(
        F.flatten(
            F.collect_list(F.sequence("span_start", "span_end"))
        ).alias("cut_pos")
    )
    toks = F.split(F.col(text_col), " ")
    cut = F.coalesce(F.col("cut_pos"), F.array().cast("array<bigint>"))
    keep = F.filter(
        toks, lambda tok, i: ~F.array_contains(cut, (i + 1).cast("long"))
    )
    return (
        docs.join(sp, id_col, "left")
        .select(
            id_col,
            F.concat_ws(" ", keep).alias("clean_text"),
            F.size(cut).cast("long").alias("n_tokens_cut"),
        )
    )


def exact_substring_dedup(
    docs: DataFrame,
    w: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_key: str = "xxhash64",
) -> DataFrame:
    """End-to-end ExactSubstr pass: duplicate windows → merged spans →
    cleaned corpus. Returns (id, clean_text, n_tokens_cut)."""
    occ = duplicate_occurrences(docs, w, id_col, text_col, gram_key)
    spans = merged_spans(occ, w, id_col)
    return cut_spans(docs, spans, id_col, text_col)
