"""Vector math as pure Column expressions (higher-order functions).

The reference's only distance is cosine, fixed at collection creation
(reference index.py:434) and consumed by top-k retrieval (reference
ask.py:200-203).  Spark has no cosine builtin, but ``zip_with`` +
``aggregate`` keep the whole computation inside Catalyst/codegen — no Python
round-trip, no UDF.  This is the hot inner loop of every similarity operator
in the engine, so it must stay JVM-side.

Precision discipline (SURVEY §7.3): all arithmetic is promoted to DOUBLE
before the fold so results are bit-identical with the DuckDB oracle's
left-to-right list folds; scores are rounded to 6 dp at the query boundary.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return col.cast("double")


def dot_product(a: Column, b: Column) -> Column:
    """sum_i a[i]*b[i], computed as a left fold in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _as_double(x) * _as_double(y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: _as_double(x) * _as_double(x)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def l2_normalize(a: Column) -> Column:
    """Unit-length copy of the vector (array<double>).

    Pre-normalizing at write time turns cosine into a plain dot product
    (SURVEY §4.3.1) — cheaper per comparison and numerically friendlier.
    Zero vectors (the reference's error sentinel, index.py:138) normalize to
    zero vectors rather than NaN.
    """
    norm = l2_norm(a)
    return F.when(norm == 0.0, F.transform(a, lambda x: _as_double(x) * 0.0)).otherwise(
        F.transform(a, lambda x: _as_double(x) / norm)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """cosine(a, b) in double precision; 0.0 when either norm is 0."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_product(a, b) / denom)


def literal_vector(values: Sequence[float]) -> Column:
    """A literal array<double> column (e.g. a broadcastable query vector)."""
    return F.array(*[F.lit(float(v)) for v in values])


# --- deterministic fixtures shared with the DuckDB oracle -------------------
#
# The oracle comparison needs the *same* query vector on both sides.  We
# generate it with a plain integer LCG (no RNG library, no float parsing
# ambiguity): every value is a small exact decimal, so the literal text
# interpolated into the oracle SQL parses to the identical double.


def fixed_query_vector(dim: int = 64, seed: int = 7) -> list[float]:
    """Deterministic pseudo-random vector with exactly-representable values."""
    state = seed
    out = []
    for _ in range(dim):
        state = (state * 1103515245 + 12345) % (2**31)
        # keep 6 decimal digits -> exact decimal literal in both engines
        out.append(round((state / (2**31)) - 0.5, 6))
    return out


def vector_sql_literal(values: Sequence[float]) -> str:
    """DuckDB list literal with the same exact decimals."""
    return "[" + ", ".join(f"{v!r}" for v in values) + "]"
