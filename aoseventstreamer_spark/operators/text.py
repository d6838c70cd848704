"""Text-analysis column expressions for document pipelines: language
ID (stopword heuristic), quality scoring, token counting, and document
fingerprinting. All built-in expressions — identical SQL is runnable by
the DuckDB oracle, and at scale everything stays in codegen.

r9 fresh-eyes review: checked, sound. One convention worth knowing:
``split('', '\\s+')`` yields [''] (one empty-string token) in BOTH
Spark and DuckDB, so an empty document carries a single '' token
through vocab/LM/simhash on both engines identically — a quirk, not a
divergence. lang_id's when-chain priority (en before de/fr/es) is the
tie-break and is mirrored by its oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def word_count(text: Column | str) -> Column:
    """Whitespace-delimited token count (BIGINT on both engines)."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(r"\S+"), F.lit(0))).cast("long")


def letter_count(text: Column | str) -> Column:
    return F.length(F.regexp_replace(_c(text), r"[^A-Za-z]", "")).cast("long")


def punct_count(text: Column | str) -> Column:
    return F.length(F.regexp_replace(_c(text), r"[^.,!?;:]", "")).cast("long")


def whitespace_tokens(text: Column | str) -> Column:
    """THE shared whitespace tokenization — split(trim(lower(x)), \\s+)
    — used by lexical (BM25/vocab), lm (bigram LM) and dedup (simhash).
    Every DuckDB oracle replays it as
    regexp_split_to_array(trim(lower(x)), '\\s+'); keeping one copy
    means a tweak here can't silently desynchronize the operators from
    each other while their individual oracles still pass."""
    return F.split(F.trim(F.lower(_c(text))), r"\s+")


def bpe_token_estimate(text: Column | str) -> Column:
    """BPE-ish token estimate: chars/4, the standard quick heuristic.
    See ``pretoken_count`` for the structurally faithful upgrade."""
    return F.ceil(F.length(_c(text)) / 4.0).cast("long")


# GPT-2-style pre-tokenization pattern (published in openai/gpt-2
# encoder.py), minus the `\s+(?!\S)` lookahead alternative — RE2-based
# engines (DuckDB) don't support lookahead, and dropping it only
# changes how runs of trailing whitespace group, not counts of real
# text pieces. Unicode classes \pL/\pN parse identically in Java regex
# and RE2.
PRETOKEN_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?\pL+| ?\pN+| ?[^\s\pL\pN]+|\s+"


def pretokenize(text: Column | str) -> Column:
    """GPT-2-style pre-token pieces (array<string>): contractions,
    space-prefixed letter runs, digit runs, punctuation runs,
    whitespace runs — the split a real BPE applies its merges INSIDE.
    Piece count is therefore a structural lower bound on the true BPE
    token count (merges only ever split pieces further), much closer
    than chars/4 for code and punctuation-heavy text."""
    return F.regexp_extract_all(_c(text), F.lit(PRETOKEN_PATTERN), F.lit(0))


def pretoken_count(text: Column | str) -> Column:
    """Count of GPT-2-style pre-token pieces (BIGINT, cross-engine)."""
    return F.size(pretokenize(text)).cast("long")


_STOPWORDS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " los ", " que "],
}


def lang_id(text: Column | str) -> Column:
    """N-gram/stopword language heuristic. Deterministic and cheap; a
    real pipeline swaps in fastText behind the same column contract."""
    c = F.concat(F.lit(" "), F.lower(_c(text)), F.lit(" "))
    expr = None
    for lang, words in _STOPWORDS.items():
        hit = None
        for w in words:
            h = F.instr(c, w) > 0
            hit = h if hit is None else (hit | h)
        expr = F.when(hit, lang) if expr is None else expr.when(hit, lang)
    return expr.otherwise("und")


def quality_score(text: Column | str, n_words: Column) -> Column:
    """Length/word/punctuation quality blend in [0,1] — the standard
    cheap pre-filter shape for training-data curation."""
    c = _c(text)
    length = F.length(c)
    len_score = F.least(F.lit(1.0), length / 500.0)
    word_score = F.least(F.lit(1.0), n_words / 80.0)
    punct_ratio = punct_count(c) / F.greatest(length, F.lit(1))
    return F.round(0.5 * len_score + 0.4 * word_score + 0.1 * (1.0 - punct_ratio), 4)


def fingerprint(text: Column | str) -> Column:
    """Normalization-invariant document fingerprint: md5 over
    lowercased text with non-alphanumerics collapsed."""
    normalized = F.regexp_replace(F.lower(_c(text)), r"[^a-z0-9]+", " ")
    return F.md5(F.trim(normalized))
