"""Dense-vector math over ``array<float>`` columns, JVM-side.

Used by the similarity-search operators. Arithmetic is done in double
(floats upcast exactly) with left-to-right accumulation, which matches
DuckDB's ``list_dot_product`` on ``DOUBLE[]`` bit-for-bit — so cosine
scores can be hash-compared against the oracle.

``F.aggregate``/``F.zip_with`` run inside codegen; no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns, accumulated in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs (ANSI-safe, no div/0)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)
