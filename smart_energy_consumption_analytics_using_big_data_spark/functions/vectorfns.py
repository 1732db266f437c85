"""Vector math over plain ARRAY<FLOAT/DOUBLE> columns.

Extension scope (SURVEY.md SS7): similarity search over the
`embeddings` table. Uses zip_with/aggregate higher-order functions -
JVM-side, no Python serialization, usable at any scale. Accumulation is
sequential over the array, so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns in double precision."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    """L2 norm of an array column."""
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))
