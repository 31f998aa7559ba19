"""Cogrouped-map coverage: ``groupBy().cogroup().applyInPandas``.

The one grouped-Python API the engine didn't yet exercise (pipe /
pandas_udf / mapInPandas / grouped applyInPandas / stateful
applyInPandasWithState / UDTF are covered elsewhere — SURVEY.md §2.C
"UDF/UDAF/UDTF"). Cogroup is the escape hatch for per-key algorithms
over TWO tables at once — custom as-of merges, per-entity
reconciliation, sequence alignment — where a join would materialize
pairs the algorithm never needs.

``user_order_context`` (the demonstration): every event annotated with
the user's most recent order at-or-before the event — the classic
feature-lookup as-of merge, done per user with ``pd.merge_asof`` inside
the cogroup. The JVM twin of this shape is ``error_asof_signup``
(relational.py — union + last_value window), which remains the
production path; the cogroup form exists because real pipelines need
the API for merges pandas can express and SQL cannot. The DuckDB
oracle is an ASOF LEFT JOIN over the same tie-free inputs.

Scale: both sides hash-shuffle once on the user key; each group is
processed in one Arrow batch, so per-user data must fit an executor —
the same bound every grouped-map operator carries (documented, and the
reason the JVM window twin is the default). Orders are pre-collapsed
to one row per (user, date) with an exact arg-max BEFORE the
cogroup (MAX orderkey per date), which both shrinks the Python-side
input and removes as-of tie ambiguity between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.registry import Query
from simple_map_reduce_ruuner_spark.sources.tables import load_table

_OUT_SCHEMA = (
    "event_id long, user_id long, ts timestamp_ntz, "
    "last_orderkey long, last_orderdate timestamp_ntz"
)


def user_order_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("odate"),
        )
        .agg(F.max("o_orderkey").alias("okey"))
    )

    # closure, not module-level: cogroup fns ship to executor workers,
    # which don't share the driver's sys.path (see verify skill notes)
    def merge(ev_pdf, ord_pdf):
        import pandas as pd

        out_cols = {
            "event_id": "int64",
            "user_id": "int64",
            "ts": "datetime64[ns]",
            "last_orderkey": "float64",
            "last_orderdate": "datetime64[ns]",
        }
        if len(ev_pdf) == 0:
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in out_cols.items()})
        ev_pdf = ev_pdf.sort_values("ts", kind="mergesort")
        if len(ord_pdf) == 0:
            ev_pdf["last_orderkey"] = pd.NA
            ev_pdf["last_orderdate"] = pd.NaT
            return ev_pdf[list(out_cols)]
        ord_pdf = ord_pdf.sort_values("odate", kind="mergesort")
        merged = pd.merge_asof(
            ev_pdf,
            ord_pdf[["odate", "okey"]],
            left_on="ts",
            right_on="odate",
            direction="backward",
        )
        merged = merged.rename(
            columns={"okey": "last_orderkey", "odate": "last_orderdate"}
        )
        return merged[list(out_cols)]

    return (
        ev.groupBy("user_id")
        .cogroup(orders.groupBy("user_id"))
        .applyInPandas(merge, _OUT_SCHEMA)
    )


USER_ORDER_CONTEXT_SQL = """
WITH ord2 AS (
    SELECT o_custkey AS user_id, o_orderdate AS odate,
           max(o_orderkey) AS okey
    FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts,
       o.okey AS last_orderkey,
       o.odate AS last_orderdate
FROM events e
ASOF LEFT JOIN ord2 o
  ON e.user_id = o.user_id AND o.odate <= e.ts
"""


QUERIES: dict[str, Query] = {
    "user_order_context": Query(
        user_order_context,
        USER_ORDER_CONTEXT_SQL,
        "cogroup applyInPandas as-of merge: latest order per event",
    ),
}
