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
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt == 0:
        return (c * KNUTH) % F.lit(M32)
    return F.pmod(F.xxhash64(c, F.lit(salt)), F.lit(M32))


DRAW_SQL = "(({c}) * 2654435761) % 4294967296"  # the salt=0 form
