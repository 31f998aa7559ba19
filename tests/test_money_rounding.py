"""Pin the money-rounding contract: round the exact DECIMAL sum first,
cast to double second.

The reverse order (cast → round) is engine-divergent at exact half-cent
sums: a decimal total of 137947.485000 casts to the double
137947.48499999999…, whose SHORTEST decimal repr is "137947.485" —
Spark's round(double, 2) rounds that string (HALF_UP → .49) while
DuckDB rounds the binary value (→ .48). volume_shipping hit exactly
this at sf0.001 (supplier NATION_12 → customer NATION_23, ship year
2000). These tests keep the idiom from regressing.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.operators.relational import as_money, dsum

# (terms, expected_2dp): each term is exactly representable at 4 decimal
# digits AND the list sums to a half-cent tie in exact decimal arithmetic.
TIE_CASES = [
    ([33824.0944, 42613.56, 61509.8306], 137947.49),  # the observed tie
    ([0.005], 0.01),
    ([-0.005], -0.01),
    ([1.115, 2.22], 3.34),  # 3.335 → away from zero on both engines
]


@pytest.mark.parametrize("terms,expected", TIE_CASES)
def test_as_money_rounds_half_cent_ties_away_from_zero(spark, terms, expected):
    df = spark.createDataFrame([(t,) for t in terms], "v double")
    got = df.agg(as_money(dsum(F.col("v"))).alias("m")).collect()[0]["m"]
    assert got == expected


@pytest.mark.parametrize("terms,expected", TIE_CASES)
def test_duckdb_decimal_round_matches(terms, expected):
    values = ", ".join(f"({t!r})" for t in terms)
    got = duckdb.sql(
        f"SELECT CAST(ROUND(SUM(CAST(v AS DECIMAL(30,6))), 2) AS DOUBLE) "
        f"FROM (VALUES {values}) t(v)"
    ).fetchone()[0]
    assert got == expected


def test_cast_then_round_diverges_on_ties(spark):
    """Documents WHY the order matters: the retired cast-then-round idiom
    disagrees between the engines on the observed tie sum."""
    duck = duckdb.sql(
        "SELECT ROUND(CAST(CAST(137947.485 AS DECIMAL(30,6)) AS DOUBLE), 2)"
    ).fetchone()[0]
    spark_val = (
        spark.range(1)
        .select(
            F.round(
                F.lit("137947.485").cast("decimal(30,6)").cast("double"), 2
            ).alias("m")
        )
        .collect()[0]["m"]
    )
    assert duck == 137947.48 and spark_val == 137947.49
