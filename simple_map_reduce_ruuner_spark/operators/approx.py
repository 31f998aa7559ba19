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


def approx_distinct_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic, hash-checkable bound report for the HLL sketch.

    The sketch value itself is engine-specific (no cross-engine oracle),
    but the CLAIM "Spark's HLL at rsd=0.02 lands within 5% of the exact
    count on this data" is deterministic: fixed input + fixed sketch
    implementation => fixed booleans. The oracle computes the exact side
    and asserts the bound holds (TRUE per group); a sketch drifting out
    of bound flips the boolean and fails the hash. Measured headroom:
    max relative error 0.008 across sf0.01/sf0.1/10x (APPROX_BOUNDS.json)
    vs the 0.05 bound.

    Reference parity: the reference materializes exact distinct sets
    (finding_peek_numbers/reducer.cpp:16); this reports how close the
    O(1)-memory scale path gets to that exact semantics.
    """
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("appx"),
    )
    within = F.abs(F.col("appx") - F.col("n_users_exact")) <= (
        0.05 * F.col("n_users_exact")
    )
    return agg.select(
        "event_type", "n_users_exact", within.alias("within_bound")
    )


APPROX_DISTINCT_BOUNDS_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users_exact,
       TRUE AS within_bound
FROM events GROUP BY event_type
"""


GK_ACCURACY = 10000
QUANTILE_POINTS = [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]


def approx_percentile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic rank-space bound report for the GK percentile sketch.

    GK guarantees RANK error <= 1/accuracy, not value error, so the bound
    test is in rank space (mirrors tests/test_approx_and_stubs.py and
    APPROX_BOUNDS.json): the sketch's answer v for quantile q must satisfy
    cdf_left(v) - eps <= q <= cdf_right(v) + eps with
    eps = 1/accuracy + 2/n (the 2/n slack absorbs discrete-cdf edges).
    The 15-row sketch side is broadcast; the only shuffle is the per-group
    count aggregation — one pass over events at any scale.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    pct = F.percentile_approx(
        "value",
        F.array(*[F.lit(q) for _, q in QUANTILE_POINTS]),
        F.lit(GK_ACCURACY),
    )
    sketch = ev.groupBy("event_type").agg(pct.alias("vs"))
    points = sketch.select(
        "event_type",
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(l) for l, _ in QUANTILE_POINTS]).alias("q"),
                F.array(*[F.lit(q) for _, q in QUANTILE_POINTS]).alias("qv"),
                F.col("vs").alias("v"),
            )
        ).alias("z"),
    ).select("event_type", "z.q", "z.qv", "z.v")
    agg = (
        ev.join(F.broadcast(points), "event_type")
        .groupBy("event_type", "q", "qv")
        .agg(
            F.count("value").alias("n_events"),
            F.sum((F.col("value") < F.col("v")).cast("long")).alias("lt"),
            F.sum((F.col("value") <= F.col("v")).cast("long")).alias("le"),
        )
    )
    n = F.col("n_events")
    eps = 1.0 / GK_ACCURACY + 2.0 / n
    within = (F.col("qv") >= F.col("lt") / n - eps) & (
        F.col("qv") <= F.col("le") / n + eps
    )
    return agg.select(
        "event_type", "q", "n_events", within.alias("within_bound")
    )


APPROX_PERCENTILE_BOUNDS_SQL = """
SELECT event_type, q, n_events, TRUE AS within_bound
FROM (SELECT event_type, count(value) AS n_events FROM events GROUP BY event_type)
CROSS JOIN (VALUES ('p50'), ('p90'), ('p99')) t(q)
"""


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
    "approx_distinct_bounds": Query(
        approx_distinct_bounds,
        APPROX_DISTINCT_BOUNDS_SQL,
        "HLL sketch error-bound report (hash-checkable twin of the rows-only sketch)",
    ),
    "approx_percentile_bounds": Query(
        approx_percentile_bounds,
        APPROX_PERCENTILE_BOUNDS_SQL,
        "GK sketch rank-error-bound report (hash-checkable twin of the rows-only sketch)",
    ),
}
