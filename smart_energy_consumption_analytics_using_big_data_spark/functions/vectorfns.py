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


def cosine_to_literal_arrow(query_vec: list[float], round_to: int = 6):
    """Arrow-native cosine against a broadcast literal query vector —
    Spark 4.1's @arrow_udf surface: the batch arrives as a pyarrow
    ListArray and is scored with ONE numpy matrix-vector product per
    batch (no pandas object boxing — the difference from pandas_udf,
    whose Series-of-lists path materializes a Python list per row).

    The JVM zip_with/aggregate `cosine` stays the default for oracled
    queries (portable, codegen-able); this is the measured vectorized
    alternative for wide embedding columns. Returns a 1-arg UDF.
    """
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.functions import arrow_udf

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    def _cos(a):
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        x = np.asarray(a.flatten(), dtype=np.float64).reshape(-1, len(q))
        num = x @ q
        den = np.sqrt((x * x).sum(axis=1)) * qn
        out = np.where(den == 0.0, np.nan, num / np.where(den == 0.0, 1.0, den))
        return pa.array(np.round(out, round_to), type=pa.float64())

    # this module postpones annotation evaluation (PEP 563), which
    # would hand arrow_udf's type-hint inspection strings instead of
    # types — attach the real objects explicitly.
    _cos.__annotations__ = {"a": pa.Array, "return": pa.Array}
    return arrow_udf(_cos, "double")
