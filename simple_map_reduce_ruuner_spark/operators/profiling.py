"""Data-profiling and history-reconstruction operators.

Neither exists in the reference (its 4 workloads are token counts,
interval peaks, and a grouped HAVING — exampleCodes/*); both are staples
of a warehouse/training-data pipeline:

- ``table_profile``     — per-column quality metrics (row/null/distinct
  counts, min/max) for a whole table from ONE scan, the Deequ/Great-
  Expectations-style profiling report. The shape is stack-then-group:
  unpivot each row into (column, value) pairs so ONE aggregation tree
  profiles every column, instead of N per-column scans or a
  multi-countDistinct Expand plan.
- ``user_type_islands`` — gaps-and-islands: collapse each user's
  event stream into maximal runs of the same event_type with validity
  bounds — the SCD-type-2 history build (and the batch shape of
  "session-by-state-change"). The island id is the classic difference
  of two row_numbers over the SAME sort, so one exchange + one sort
  serves both.

Scale notes: ``table_profile``'s unpivot multiplies rows by the column
count, but the pairs aggregate partial→final with map-side combine, so
the shuffle carries at most |distinct values per column| rows — at
100 TB you'd profile column groups in one pass each rather than widen
the explode factor. ``user_type_islands`` shuffles events once on
``user_id``; the follow-up run-aggregate combines runs map-side because
rows of one run are contiguous within the partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from simple_map_reduce_ruuner_spark.registry import Query
from simple_map_reduce_ruuner_spark.sources.tables import load_table

# Profiled columns and their engine-identical stringifications. Doubles
# go through DECIMAL(12,2) (cent precision is exact in both engines —
# the as_money discipline, relational.py:38); timestamps through an
# explicit second-precision format so neither engine appends fractional
# digits.
_PROFILE_COLS: dict[str, tuple[str, str]] = {
    # Key columns are zero-padded (lpad) so lexicographic min/max on the
    # canonical string IS numeric min/max — an unpadded CAST would report
    # artifacts like min='1000000' > max='999996' (advice r5). Width 12
    # covers int keys up to 1e12-1; keys are positive so padding '0' is
    # order-preserving.
    "o_orderkey": (
        "lpad(CAST(o_orderkey AS STRING), 12, '0')",
        "lpad(CAST(o_orderkey AS VARCHAR), 12, '0')",
    ),
    "o_custkey": (
        "lpad(CAST(o_custkey AS STRING), 12, '0')",
        "lpad(CAST(o_custkey AS VARCHAR), 12, '0')",
    ),
    "o_orderstatus": ("o_orderstatus", "o_orderstatus"),
    "o_orderpriority": ("o_orderpriority", "o_orderpriority"),
    "o_orderdate": (
        "date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss')",
        "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')",
    ),
    # DECIMAL(12,2) renders at most 10 integer digits + '.' + 2, so a
    # 13-wide zero pad makes lexicographic order numeric here too
    # (prices are non-negative).
    "o_totalprice": (
        "lpad(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS STRING), 13, '0')",
        "lpad(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), 13, '0')",
    ),
}


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(column_name, n_rows, n_nulls, n_distinct, min_value, max_value):
    one-scan profiling report over the orders table.

    Metrics are computed on the stringified values (documented contract:
    min/max are lexicographic on the canonical string form — and every
    numeric column's stringification in ``_PROFILE_COLS`` is zero-padded
    to a fixed width precisely so that lexicographic order coincides
    with numeric order; ISO timestamps are order-preserving as-is). The distinct count is
    the two-level rewrite — groupBy (column, value) then (column) — so
    the plan is two plain hash aggregates, not the Expand plan Spark
    emits for countDistinct mixed with other aggregates.
    """
    orders = load_table(spark, sf_dir, "orders")
    pairs = orders.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("column_name"),
                        F.expr(spark_expr).alias("value"),
                    )
                    for name, (spark_expr, _) in _PROFILE_COLS.items()
                ]
            )
        ).alias("p")
    ).select("p.column_name", "p.value")
    per_value = pairs.groupBy("column_name", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_value.groupBy("column_name").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n_nulls"),
        F.count(F.when(F.col("value").isNotNull(), 1)).cast("long").alias(
            "n_distinct"
        ),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def _table_profile_sql() -> str:
    arms = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS column_name, {duck_expr} AS value FROM orders"
        for name, (_, duck_expr) in _PROFILE_COLS.items()
    )
    return f"""
WITH pairs AS (
{arms}
),
per_value AS (
    SELECT column_name, value, count(*) AS cnt
    FROM pairs GROUP BY 1, 2
)
SELECT column_name,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN value IS NULL THEN cnt ELSE 0 END) AS BIGINT)
           AS n_nulls,
       CAST(count(CASE WHEN value IS NOT NULL THEN 1 END) AS BIGINT)
           AS n_distinct,
       min(value) AS min_value,
       max(value) AS max_value
FROM per_value
GROUP BY column_name
"""


def user_type_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, event_type, valid_from, valid_to, n_events): maximal
    runs of consecutive same-type events per user — the SCD2 history
    build via gaps-and-islands.

    island = row_number over the user's full stream minus row_number
    within (user, type), ordered by (ts, event_id — the unique id makes
    equal-timestamp order deterministic). hash(user_id) satisfies BOTH
    windows' clustering (a subset of (user_id, event_type)), so the
    plan is ONE exchange with two in-partition sorts — no second
    shuffle. Runs are contiguous within a partition, so the closing
    aggregate combines map-side before its (tiny) exchange.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    order = [F.col("ts"), F.col("event_id")]
    w_all = Window.partitionBy("user_id").orderBy(*order)
    w_type = Window.partitionBy("user_id", "event_type").orderBy(*order)
    runs = ev.select(
        "user_id",
        "event_type",
        "ts",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias(
            "island"
        ),
    )
    return (
        runs.groupBy("user_id", "event_type", "island")
        .agg(
            F.min("ts").alias("valid_from"),
            F.max("ts").alias("valid_to"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .drop("island")
    )


USER_TYPE_ISLANDS_SQL = """
WITH runs AS (
    SELECT user_id, event_type, ts,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS island
    FROM events
)
SELECT user_id, event_type,
       min(ts) AS valid_from,
       max(ts) AS valid_to,
       CAST(count(*) AS BIGINT) AS n_events
FROM runs
GROUP BY user_id, event_type, island
"""


QUERIES: dict[str, Query] = {
    "table_profile": Query(
        table_profile,
        _table_profile_sql(),
        "one-scan per-column profiling report (stack-then-group)",
    ),
    "user_type_islands": Query(
        user_type_islands,
        USER_TYPE_ISLANDS_SQL,
        "gaps-and-islands SCD2 run collapse over event streams",
    ),
}
