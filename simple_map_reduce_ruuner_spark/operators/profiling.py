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

# Profiled columns as TYPED (string_expr, numeric_expr) pairs per
# engine — a numeric column profiles through its DOUBLE value (min/max
# are numeric order, the production shape), a string/temporal column
# through an engine-identical canonical string (timestamps get an
# explicit second-precision format so neither engine appends fractional
# digits). Exactly one side of each pair is non-NULL, which is what
# lets one unpivoted aggregation tree carry both types without a
# sum-type column. (The r2–r6 form zero-padded everything into strings
# so lexicographic == numeric order; besides being a representational
# wart, lpad silently TRUNCATES once a key outgrows the pad width —
# advice r6 — corrupting min/max identically in both engines. The
# typed form has no width cliff: int keys are exact in a double
# through 2^53, far past any TPC-H scale, and doubles are compared
# natively.)
_NUM = "CAST({c} AS DOUBLE)"
_PROFILE_COLS: dict[str, dict[str, str | None]] = {
    "o_orderkey": {"spark_num": _NUM, "duck_num": _NUM},
    "o_custkey": {"spark_num": _NUM, "duck_num": _NUM},
    "o_orderstatus": {"spark_str": "{c}", "duck_str": "{c}"},
    "o_orderpriority": {"spark_str": "{c}", "duck_str": "{c}"},
    "o_orderdate": {
        "spark_str": "date_format({c}, 'yyyy-MM-dd HH:mm:ss')",
        "duck_str": "strftime({c}, '%Y-%m-%d %H:%M:%S')",
    },
    "o_totalprice": {"spark_num": _NUM, "duck_num": _NUM},
}


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(column_name, n_rows, n_nulls, n_distinct, min_numeric,
    max_numeric, min_string, max_string): one-scan TYPED profiling
    report over the orders table — numeric columns fill the numeric
    min/max (DOUBLE, NULL string side), string/temporal columns the
    string min/max (canonical form, NULL numeric side).

    The unpivot stacks each row into (column, value_str, value_num)
    pairs so ONE aggregation tree profiles every column; the distinct
    count is the two-level rewrite — groupBy (column, values) then
    (column) — so the plan is two plain hash aggregates, not the
    Expand plan Spark emits for countDistinct mixed with other
    aggregates. A cell is null iff both typed sides are null (each
    source column populates exactly one side).
    """
    orders = load_table(spark, sf_dir, "orders")
    pairs = orders.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("column_name"),
                        F.expr(
                            spec.get("spark_str", "CAST(NULL AS STRING)").format(c=name)
                        ).alias("value_str"),
                        F.expr(
                            spec.get("spark_num", "CAST(NULL AS DOUBLE)").format(c=name)
                        ).alias("value_num"),
                    )
                    for name, spec in _PROFILE_COLS.items()
                ]
            )
        ).alias("p")
    ).select("p.column_name", "p.value_str", "p.value_num")
    per_value = pairs.groupBy("column_name", "value_str", "value_num").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    is_null = F.col("value_str").isNull() & F.col("value_num").isNull()
    return per_value.groupBy("column_name").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.sum(F.when(is_null, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n_nulls"),
        F.count(F.when(~is_null, 1)).cast("long").alias("n_distinct"),
        F.min("value_num").alias("min_numeric"),
        F.max("value_num").alias("max_numeric"),
        F.min("value_str").alias("min_string"),
        F.max("value_str").alias("max_string"),
    )


def _table_profile_sql() -> str:
    arms = "\nUNION ALL\n".join(
        "SELECT '{n}' AS column_name, {s} AS value_str, {v} AS value_num"
        " FROM orders".format(
            n=name,
            s=spec.get("duck_str", "CAST(NULL AS VARCHAR)").format(c=name),
            v=spec.get("duck_num", "CAST(NULL AS DOUBLE)").format(c=name),
        )
        for name, spec in _PROFILE_COLS.items()
    )
    return f"""
WITH pairs AS (
{arms}
),
per_value AS (
    SELECT column_name, value_str, value_num, count(*) AS cnt
    FROM pairs GROUP BY 1, 2, 3
)
SELECT column_name,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN value_str IS NULL AND value_num IS NULL
                     THEN cnt ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(count(CASE WHEN value_str IS NOT NULL OR value_num IS NOT NULL
                       THEN 1 END) AS BIGINT) AS n_distinct,
       min(value_num) AS min_numeric,
       max(value_num) AS max_numeric,
       min(value_str) AS min_string,
       max(value_str) AS max_string
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
        "one-scan typed per-column profiling report (stack-then-group)",
    ),
    "user_type_islands": Query(
        user_type_islands,
        USER_TYPE_ISLANDS_SQL,
        "gaps-and-islands SCD2 run collapse over event streams",
    ),
}
