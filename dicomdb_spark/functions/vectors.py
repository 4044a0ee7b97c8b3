"""Vector math over array<float|double> embedding columns.

Built on ``F.zip_with`` + ``F.aggregate`` — JVM-side, no Python, no
UDF.  Both fold left over the array in element order, so results are
bitwise-deterministic and match an oracle computing the same
left-to-right sum in double precision.

For 100 TB-scale similarity search, see ``llm.similarity``: these
per-pair kernels get used inside a bucketed (LSH) join so the
quadratic brute-force never materializes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢbᵢ, left-to-right double fold."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2(a: Column | str) -> Column:
    """‖a‖₂ (double)."""
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either norm is zero."""
    d = dot(a, b)
    na, nb = norm2(a), norm2(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))
