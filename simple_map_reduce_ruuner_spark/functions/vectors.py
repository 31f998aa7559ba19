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
- ``unrolled_l2_norm``/``unrolled_dist2``/``with_unrolled_cosine``:
  the same computation unrolled over a FIXED
  dimension into one left-associated arithmetic chain, which codegens.
  The chain replays the fold's exact operation sequence —
  ``((0.0 + t0) + t1) + …`` — so every intermediate IEEE rounding is
  identical to the fold's and to DuckDB's ``list_sum`` over the same
  list; swapping tiers can never flip a hashed digit. Use on every
  fixed-DIM hot path (the embeddings table is DIM=64 throughout).

The unrolled tier takes SQL FRAGMENTS (column names or any parenthesized
expression), not Column objects, and assembles the whole chain as ONE
``F.expr`` string: building the same tree through the Column API costs
~3 Py4J round-trips per term — ~200 driver↔JVM hops, ≈0.8 s of
DataFrame-CONSTRUCTION latency per kernel (measured; ann queries build
several, turning a 0.15 s query into a 3 s one) — while one ``F.expr``
is a single hop and the parse is sub-millisecond. The parsed tree is
operator-for-operator the tree the Column loop built (SQL ``+`` is
left-associative, ``*`` binds tighter), so results are bit-identical.
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
#
# ``a``/``b`` are SQL fragments (column names), not Columns — see the
# module docstring for why construction goes through one F.expr.

_ZERO_D = "CAST(0 AS DOUBLE)"


def _dot_sql(a: str, b: str, dim: int) -> str:
    terms = " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
        for i in range(dim)
    )
    return f"({_ZERO_D} + {terms})"


def unrolled_l2_norm(a: str, dim: int) -> Column:
    return F.expr(f"SQRT{_dot_sql(a, a, dim)}")


def with_unrolled_cosine(df, a: str, b: str, dim: int, out: str):
    """``df`` plus a cosine column ``out``, with dot and the two norms
    projected as (dropped) intermediate columns instead of one giant
    CASE expression.

    Same values as :func:`unrolled_cosine` — the intermediates hold the
    exact IEEE doubles the inlined subtrees produced, and dividing them
    is the same final operation — but each chain becomes its own
    generated method, small enough for HotSpot to JIT (a single 3×dim
    expression compiles fine in Janino yet exceeds the JVM's
    huge-method bytecode limit, silently falling back to bytecode
    interpretation). Measured on a 1M-pair scoring stage: fold 24 s,
    one-expression 15 s, this split 9.7 s. The norm columns are
    referenced twice (zero-guard + denominator), so CollapseProject
    keeps them materialized rather than re-inlining."""
    dot_c, na, nb = f"__{out}_dot", f"__{out}_na", f"__{out}_nb"
    return (
        df.withColumn(dot_c, F.expr(_dot_sql(a, b, dim)))
        .withColumn(na, F.expr(f"SQRT{_dot_sql(a, a, dim)}"))
        .withColumn(nb, F.expr(f"SQRT{_dot_sql(b, b, dim)}"))
        .withColumn(
            out,
            F.expr(
                f"CASE WHEN ({na} * {nb}) = {_ZERO_D} THEN {_ZERO_D} "
                f"ELSE {dot_c} / ({na} * {nb}) END"
            ),
        )
        .drop(dot_c, na, nb)
    )


def unrolled_dist2(a: str, b: str, dim: int) -> Column:
    """Squared L2 over a fixed dim, accumulated in double.

    (A former ``integer=True`` branch served the quantized k-means
    path; that path moved to the exact int64 Arrow kernel in
    operators/clustering.py and the branch was removed with it.)"""
    terms = " + ".join(
        f"(CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE)) * "
        f"(CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        for i in range(dim)
    )
    return F.expr(f"{_ZERO_D} + {terms}")
