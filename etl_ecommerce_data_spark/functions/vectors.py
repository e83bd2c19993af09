"""Vector math over ``array<float>`` embedding columns.

Pure higher-order-function expressions (``zip_with`` + ``aggregate``) — no
UDF, no Python: the dot product compiles to a JVM loop inside whole-stage
codegen. Elements are cast to double *before* the fold so the accumulation is
a deterministic left-to-right IEEE-double sum; the DuckDB oracle computes the
same fold via ``list_reduce``/``list_dot_product`` (validated bit-exact in
tests before any oracle relies on it).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold of elementwise products, in double."""
    prods = F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe on zero vectors (returns NULL rather than
    NaN so filters drop them)."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(None))


def cosine_from_parts(d: Column, na: Column, nb: Column) -> Column:
    """Cosine from a precomputed dot product and the two precomputed norms —
    the SAME IEEE operations in the same order as ``cosine``, so results are
    bit-identical; but the norms fold once per VECTOR instead of once per
    PAIR (a 3×-fold → 1×-fold reduction on pair-heavy paths)."""
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(None))

