"""Approximate and exact-distinct aggregates.

The reference computes exact distinct counts by materializing sets
(finding_peek_numbers/reducer.cpp:16) — fine at 86k keys, fatal at 100 TB.
The scale path is HyperLogLog (``approx_count_distinct``), which shuffles
fixed-size sketches instead of sets.

- exact_distinct_users  — exact countDistinct (oracle-checked anchor).
- approx_distinct_users — HLL twin. No DuckDB oracle: sketch internals
  differ across engines by design; tests assert relative error < 5%
  against the exact anchor instead (the driver records rows-only).
- value_percentiles     — exact interpolated percentiles (both engines
  implement the same type-7 linear interpolation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.registry import Query
from simple_map_reduce_ruuner_spark.sources.tables import load_table


def exact_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


EXACT_DISTINCT_USERS_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch aggregation — constant memory per group at any scale."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx")
    )


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pct = F.percentile("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return ev.groupBy("event_type").agg(
        F.round(pct.getItem(0), 6).alias("p50"),
        F.round(pct.getItem(1), 6).alias("p90"),
        F.round(pct.getItem(2), 6).alias("p99"),
    )


VALUE_PERCENTILES_SQL = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.9), 6) AS p90,
       ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
"""


def approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna sketch percentiles — the 100 TB path.

    ``value_percentiles`` (exact ``F.percentile``) buffers every value per
    group in executor memory; this twin shuffles bounded GK sketches
    instead (state is O(1/accuracy), not O(rows)). No cross-engine oracle:
    DuckDB's approx_quantile is a t-digest with different error behavior,
    so tests assert relative error vs the exact anchor (<1% at
    accuracy=10000) and the driver records a rows-only check — same
    anchor+sketch pattern as exact/approx_distinct_users.
    """
    ev = load_table(spark, sf_dir, "events")
    pct = F.percentile_approx(
        "value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), F.lit(10000)
    )
    return ev.groupBy("event_type").agg(
        F.round(pct.getItem(0), 6).alias("p50"),
        F.round(pct.getItem(1), 6).alias("p90"),
        F.round(pct.getItem(2), 6).alias("p99"),
    )


# Rows-only sketch queries are registered with oracle=None (the driver
# records a weaker rows-only check for them); their bounded-error
# evidence vs the exact anchors is measured per round into
# APPROX_BOUNDS.json (tools/approx_bounds.py) and asserted by
# tests/test_approx_and_stubs.py. Gate ordering is the registry-wide
# least-recently-verified sweep (registry.all_queries).
QUERIES: dict[str, Query] = {
    "exact_distinct_users": Query(
        exact_distinct_users, EXACT_DISTINCT_USERS_SQL, "exact distinct counts"
    ),
    "value_percentiles": Query(
        value_percentiles, VALUE_PERCENTILES_SQL, "exact interpolated percentiles"
    ),
    "approx_distinct_users": Query(
        approx_distinct_users,
        None,  # sketch internals are engine-specific; rows-only check
        "HyperLogLog distinct counts (scale path)",
    ),
    "approx_percentiles": Query(
        approx_percentiles,
        None,  # GK sketch vs t-digest: engine-specific; rows-only check
        "Greenwald-Khanna percentile sketch (scale path)",
    ),
}
