"""Deterministic sampling primitives shared by the query pack
(queries/corpus_pack.py) and the recipe layer (operators/curation.py).

The uniform draw is the Knuth multiplicative hash — a pure BIGINT
expression both Spark and DuckDB evaluate identically, standing in
for rand() (which would be neither reproducible nor cross-engine
comparable). ``salt`` decorrelates draws when several sampling steps
compose in one pipeline: without it, two Bernoulli steps keyed on the
same id keep exactly min(p1, p2) of the corpus (perfectly correlated
draws) instead of p1*p2.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KNUTH = 2654435761
M32 = 2**32


def uniform_draw(col: Column | str, salt: int = 0) -> Column:
    """Deterministic uniform-ish draw in [0, 2**32) from a BIGINT id.

    ``salt=0`` is the multiplicative hash — a pure BIGINT expression
    with an exact DuckDB equivalent (``DRAW_SQL``), used by every
    oracle-checked sampling query. ``salt!=0`` switches to
    xxhash64(id, salt): an AFFINE salt (adding before the multiply)
    would only rotate the draw interval, leaving two salted Bernoulli
    steps exactly interval-overlap correlated instead of independent
    (measured: two 50% steps kept 11.8%, the golden-ratio overlap,
    not 25%) — real independence needs a real hash. The salted form
    is engine-specific and therefore not oracle-comparable; it stays
    deterministic and replay-stable.

    The salt=0 multiply is computed limb-split (16-bit halves of
    ``id mod 2**32``) so no intermediate exceeds ~5.7e18: a naive
    ``(id * KNUTH) % 2**32`` overflows int64 once ids pass ~3.47e9 —
    Spark's non-ANSI wrap then yields NEGATIVE draws (``%`` follows
    the dividend sign) and every Bernoulli filter silently accepts
    all rows, while DuckDB raises an overflow error — exactly the
    billion-doc scale this function targets. The limb form is exact
    for EVERY int64 id (negatives included, via pmod) and bit-equal
    to the naive form on ids in [0, 2**31), so existing oracle
    hashes are unchanged.
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt != 0:
        return F.pmod(F.xxhash64(c, F.lit(salt)), F.lit(M32))
    x = F.pmod(c, F.lit(M32))
    lo, hi = F.pmod(x, F.lit(65536)), F.shiftright(x, 16)
    return F.pmod(
        lo * KNUTH + F.pmod(hi * KNUTH, F.lit(65536)) * F.lit(65536), F.lit(M32)
    )


# Exact DuckDB equivalent of the salt=0 draw, valid for all int64 ids
# (the leading double-pmod handles negative ids; every later operand is
# non-negative so plain % suffices).
DRAW_SQL = (
    "(("
    "  ((((({c}) % 4294967296 + 4294967296) % 4294967296) % 65536) * 2654435761)"
    "  + (((((({c}) % 4294967296 + 4294967296) % 4294967296) // 65536)"
    "       * 2654435761) % 65536) * 65536"
    ") % 4294967296)"
)
