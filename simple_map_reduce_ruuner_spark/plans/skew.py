"""Skew mitigation by key salting.

AQE's skew-join handles most hot keys automatically (enabled in the
session factory); these utilities are the manual form for the cases AQE
can't see — skewed *aggregation* keys, and joins where the skew is known
ahead of planning. Both are algebraic rewrites (two-phase aggregation /
small-side replication), so results are exactly equal to the unsalted
form — asserted in tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a salted first phase.

    Phase 1 groups by (key, salt) — a hot key spreads over ``n_salts``
    reducers; phase 2 re-merges per key. Supports the algebraic
    aggregates whose partials merge by sum/min/max (``count``/``sum``/
    ``min``/``max``), i.e. the same class the reference's
    chunk-partial → global-final contract supports (SURVEY.md §1.4).

    ``agg_exprs``: output column → "fn(input)" e.g. {"cnt": "count(*)",
    "total": "sum(value)"}.
    """
    remerge = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    salted = df.withColumn(
        "__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts))
    )
    phase1 = salted.groupBy(*key_cols, "__salt").agg(
        *[F.expr(expr).alias(out) for out, expr in agg_exprs.items()]
    )
    finals = []
    for out, expr in agg_exprs.items():
        fn = expr.split("(", 1)[0].strip().lower()
        if fn not in remerge:
            raise ValueError(f"non-algebraic aggregate not salt-able: {expr}")
        # DISTINCT partials do NOT re-merge by sum: a value seen under
        # two salts would be counted twice — reject, don't silently
        # inflate (review-found guard bypass)
        if "distinct" in expr.lower():
            raise ValueError(
                f"DISTINCT aggregate not salt-able (partials overlap): {expr}"
            )
        finals.append(getattr(F, remerge[fn])(out).alias(out))
    return phase1.groupBy(*key_cols).agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Inner equi-join with a salted key: the big (skewed) side gets a
    deterministic salt in [0, n_salts); the small side is replicated
    n_salts times. A hot key's rows land on n_salts reducers instead of
    one. Costs n_salts× the small side — use only when the small side is
    modest and the skew is real.
    """
    big_salted = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[c for c in big.columns]), F.lit(n_salts)),
    )
    small_rep = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast(big_salted.schema["__salt"].dataType))
    joined = big_salted.join(small_rep, [key, "__salt"])
    return joined.drop("__salt")
