"""BPE tokenizer training + encoding on Spark.

Public algorithms: Sennrich et al. 2016 (learn merges by repeatedly
fusing the most frequent adjacent symbol pair) and the GPT-2
``encoder.py`` encode loop (apply learned merges lowest-rank-first
inside each pre-token piece).

Architecture — the same split the HuggingFace tokenizers trainer uses:

- The corpus-sized work is ONE distributed aggregation:
  ``piece_counts`` explodes GPT-2-style pre-token pieces
  (operators/text.pretokenize) and hash-aggregates their frequencies
  (map-side combine; the shuffle carries unique pieces, not tokens).
- The merge loop then runs over the COMPACT piece-frequency table on
  the driver. Unique pieces grow sublinearly in corpus size (Heaps'
  law), and ``max_pieces`` caps the table deterministically (count
  desc, piece asc) — rare pieces contribute ~nothing to pair counts,
  which is why every production trainer prunes them. So at 100 TB the
  driver holds ~1e5 (piece, count) rows, never the corpus.
- Encoding distributes again: an Arrow-batched Pandas UDF applies the
  (broadcast-by-closure) merge ranks per piece with an LRU cache —
  corpus token counts without the corpus ever visiting the driver.

Training is NOT SQL-expressible (each merge depends on a global
argmax over the previous state), so the registered queries are
rows-only; correctness is pinned by unit tests against the worked
example in the BPE paper (tests/test_bpe.py).
"""

from __future__ import annotations

import re
from collections import defaultdict
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import pretokenize

# Worker-side equivalent of text.PRETOKEN_PATTERN. Python's re cannot
# express Java's \pL / \pN / ASCII-\s exactly: [^\W\d_] also matches
# category-No/Nl numerics (², ½, Ⅻ) that Java sends to the \pN branch,
# and Python \s is unicode-wide where Java's default \s is ASCII-only
# (NBSP is punctuation to Java). So: an exact regex FAST PATH for
# ASCII-only text (where the classes coincide) and a unicodedata
# category scanner replaying the Java alternation order for the rest.
_ASCII_PRETOKEN = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+"
    r"| ?[^ \t\n\x0b\f\rA-Za-z0-9]+|[ \t\n\x0b\f\r]+"
)
_JAVA_WS = frozenset(" \t\n\x0b\x0c\r")
_CONTRACTIONS = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")


def py_pretokenize(text: str) -> list[str]:
    """Split exactly like Spark's regexp_extract_all(PRETOKEN_PATTERN):
    contraction literals, optional-space-prefixed letter (\\pL+) /
    numeric (\\pN+) / other runs, ASCII-whitespace runs — alternation
    tried in that order at every position, Java semantics bit-for-bit
    (asserted against the JVM in tests/test_bpe.py incl. No/Nl
    numerics and NBSP)."""
    if text.isascii():
        return _ASCII_PRETOKEN.findall(text)
    import unicodedata

    cat = unicodedata.category
    pieces: list[str] = []
    i, n = 0, len(text)
    while i < n:
        for con in _CONTRACTIONS:
            if text.startswith(con, i):
                pieces.append(con)
                i += len(con)
                break
        else:
            k = i + 1 if text[i] == " " else i
            c0 = cat(text[k])[0] if k < n else ""
            if c0 in ("L", "N"):
                e = k
                while e < n and cat(text[e])[0] == c0:
                    e += 1
                pieces.append(text[i:e])
                i = e
            elif k < n and text[k] not in _JAVA_WS:
                e = k
                while (
                    e < n and text[e] not in _JAVA_WS and cat(text[e])[0] not in ("L", "N")
                ):
                    e += 1
                pieces.append(text[i:e])
                i = e
            else:
                # optional-space branches found nothing: whitespace run
                e = i
                while e < n and text[e] in _JAVA_WS:
                    e += 1
                pieces.append(text[i:e])
                i = e
    return pieces


def piece_counts(
    docs: DataFrame, text_col: str = "text", max_pieces: int | None = None
) -> DataFrame:
    """(piece, cnt) frequency table of GPT-2-style pre-token pieces.
    With ``max_pieces``, keeps the top slice deterministically
    (cnt desc, piece asc) — a global TakeOrdered, no full sort."""
    counts = (
        docs.select(F.explode(pretokenize(text_col)).alias("piece"))
        .groupBy("piece")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    if max_pieces is not None:
        counts = counts.orderBy(F.desc("cnt"), F.asc("piece")).limit(max_pieces)
    return counts


def train_bpe(
    docs: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    max_pieces: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list [(left, right), ...] (rank = position).

    Ties break (count desc, pair asc) so training is deterministic
    across partitionings and engines. Symbols are characters (not
    bytes) of each pre-token piece; pieces carry their leading space,
    so no end-of-word marker is needed (the GPT-2 convention).

    Driver cost: O(unique_pieces) once to build the pair index, then
    per merge only the pieces CONTAINING the merged pair are rewritten
    (inverted index), the standard trainer optimization."""
    rows = piece_counts(docs, text_col, max_pieces).collect()
    pieces: dict[tuple[str, ...], int] = {
        tuple(r.piece): r.cnt for r in rows if len(r.piece) > 0
    }

    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    where: dict[tuple[str, str], set[tuple[str, ...]]] = defaultdict(set)
    for sym, cnt in pieces.items():
        for a, b in zip(sym, sym[1:]):
            pair_counts[(a, b)] += cnt
            where[(a, b)].add(sym)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        for sym in list(where.get(best, ())):
            cnt = pieces.pop(sym, None)
            if cnt is None:
                continue
            # un-count the old symbol sequence
            for p in zip(sym, sym[1:]):
                pair_counts[p] -= cnt
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                where[p].discard(sym)
            # rewrite: collapse every (best) occurrence left-to-right
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new = tuple(out)
            pieces[new] = pieces.get(new, 0) + cnt
            for p in zip(new, new[1:]):
                pair_counts[p] += cnt
                where[p].add(new)
        # fully spent pairs may linger at 0 from the add-back path
        pair_counts.pop(best, None)
        where.pop(best, None)
    return merges


def merges_df(spark: SparkSession, merges: list[tuple[str, str]]) -> DataFrame:
    """The learned merge table as a DataFrame (rank, left, right)."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    )


def _encode_piece_fn(ranks: dict[tuple[str, str], int]):
    """GPT-2 encode: repeatedly merge the lowest-rank adjacent pair."""

    @lru_cache(maxsize=65536)
    def encode(piece: str) -> int:
        sym = list(piece)
        while len(sym) > 1:
            best_rank, best_i = None, None
            for i, p in enumerate(zip(sym, sym[1:])):
                r = ranks.get(p)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
        return len(sym)

    return encode


def bpe_token_count(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens) under the learned merges — the REAL token count
    the chars/4 and pre-token estimates approximate. Arrow-batched
    Pandas UDF; the merge table ships once per worker via the closure
    and each worker caches encoded pieces (web text repeats pieces
    heavily, so the cache hit rate is high)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    state: dict = {}  # per-worker-process: keeps the piece cache warm across batches

    @F.pandas_udf("long")
    def n_tokens(texts):
        import pandas as pd

        encode = state.setdefault("enc", _encode_piece_fn(ranks))
        return pd.Series(
            [sum(encode(p) for p in py_pretokenize(t or "")) for t in texts],
            dtype="int64",
        )

    return docs.select(F.col(id_col), n_tokens(F.col(text_col)).alias("n_tokens"))
