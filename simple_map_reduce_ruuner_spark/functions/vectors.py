"""Dense-vector math over ``array<float>`` columns, JVM-side.

Used by the similarity-search operators. Arithmetic is done in double
(floats upcast exactly) with left-to-right accumulation, which matches
DuckDB's ``list_dot_product`` on ``DOUBLE[]`` bit-for-bit — so cosine
scores can be hash-compared against the oracle.

Two tiers, same bit-exact results:

- ``dot``/``l2_norm``/``cosine``: ``F.aggregate``/``F.zip_with`` folds.
  General (any array length) but higher-order functions are evaluated
  INTERPRETED — per element, outside whole-stage codegen — so they cost
  real CPU on corpus-sized scans (the r7 100× sweep measured the IVF
  centroid crossJoin×HOF at 100 s of a 118 s run).
- ``unrolled_dot``/``unrolled_sq_norm``/``unrolled_cosine``/
  ``unrolled_dist2``: the same computation unrolled over a FIXED
  dimension into one left-associated arithmetic chain, which codegens.
  The chain replays the fold's exact operation sequence —
  ``((0.0 + t0) + t1) + …`` — so every intermediate IEEE rounding is
  identical to the fold's and to DuckDB's ``list_sum`` over the same
  list; swapping tiers can never flip a hashed digit. Use on every
  fixed-DIM hot path (the embeddings table is DIM=64 throughout).
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


# ---- fixed-dimension unrolled tier (codegen; see module docstring) ----


def unrolled_dot(a: Column, b: Column, dim: int) -> Column:
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + a[i].cast("double") * b[i].cast("double")
    return acc


def unrolled_sq_norm(a: Column, dim: int) -> Column:
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + a[i].cast("double") * a[i].cast("double")
    return acc


def unrolled_l2_norm(a: Column, dim: int) -> Column:
    return F.sqrt(unrolled_sq_norm(a, dim))


def unrolled_cosine(a: Column, b: Column, dim: int) -> Column:
    denom = unrolled_l2_norm(a, dim) * unrolled_l2_norm(b, dim)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(
        unrolled_dot(a, b, dim) / denom
    )


def unrolled_dist2(a: Column, b: Column, dim: int, integer: bool = False) -> Column:
    """Squared L2 over a fixed dim; ``integer=True`` keeps the exact
    BIGINT arithmetic of the quantized k-means path (integer sums are
    order-insensitive, so parity there is unconditional)."""
    if integer:
        acc = F.lit(0).cast("long")
        for i in range(dim):
            acc = acc + (a[i] - b[i]) * (a[i] - b[i])
        return acc
    acc = F.lit(0.0)
    for i in range(dim):
        d = a[i].cast("double") - b[i].cast("double")
        acc = acc + d * d
    return acc
