"""Time-series resampling: dense daily spine + zero-fill + forward fill.

The feature-pipeline staple the relational surface doesn't cover
elsewhere: events are sparse in time, training features need a dense
regular grid. ``events_daily_fill`` computes per-user daily aggregates,
generates each user's full [first_day, last_day] spine with
``sequence()`` + ``explode`` (no cross join against a global calendar —
each user only materializes their own span), left-joins the actuals,
zero-fills counts, and forward-fills the last known value with a
``last(ignorenulls)`` running window.

Scale shape: one shuffle for the daily aggregate (partial/final), one
for the span, one window partitioned by user. Spine size is
O(users x avg span days) — rows are 4 small columns, never events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.operators.relational import dsum, dsum_sql
from simple_map_reduce_ruuner_spark.registry import Query
from simple_map_reduce_ruuner_spark.sources.tables import load_table


def events_daily_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(dsum(F.col("value")).cast("double"), 2).alias("day_value"),
    )
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = spans.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    filled = spine.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # day emitted as timestamp_ntz: the repo-wide normalization for
    # calendar outputs (DATE round-trips as midnight timestamps through
    # Arrow/pandas; see date_arithmetic)
    return filled.select(
        "user_id",
        F.col("day").cast("timestamp_ntz").alias("day"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.last("day_value", ignorenulls=True).over(w).alias("ffill_value"),
    )


EVENTS_DAILY_FILL_SQL = f"""
WITH daily AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           count(*) AS n,
           ROUND(CAST({dsum_sql("value")} AS DOUBLE), 2) AS day_value
    FROM events GROUP BY 1, 2
),
spans AS (
    SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
),
spine AS (
    SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
    FROM spans
)
SELECT s.user_id, CAST(s.day AS TIMESTAMP) AS day,
       CAST(coalesce(d.n, 0) AS BIGINT) AS n_events,
       last_value(d.day_value IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value
FROM spine s
LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
"""


QUERIES: dict[str, Query] = {
    "events_daily_fill": Query(
        events_daily_fill,
        EVENTS_DAILY_FILL_SQL,
        "daily resample: dense per-user spine, zero-fill counts, forward-fill values",
        new_in_round=1,
    ),
}
