"""Relational batch 4: JSON extraction, statistical moments, arg-max
aggregates, FILTER-style conditional aggregation, UNPIVOT, array
aggregation, and calendar heatmaps (SURVEY.md §2.C scalar-function /
aggregation coverage; absent in the reference, whose only aggregation
surface is user map/reduce programs).

Determinism rules (repo-wide, see tfidf_scores / value_anomalies):
money is summed as integer cents or exact decimals, double arithmetic
appears only in final single-step expressions over exact inputs, and
every aggregate with a potential tie (arg-max) carries an explicit
lexicographic tiebreak so both engines pick the same row.

Scale: every query is one partial/final aggregation keyed by a
low-cardinality group column — map-side combine collapses the input
before the shuffle, so the shuffled volume is O(groups × partitions),
independent of table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.registry import Query
from simple_map_reduce_ruuner_spark.sources.tables import load_table

#: money as exact integer cents — double in, exact int64 out
_CENTS = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"
BIG_ORDER_PRICE = 150_000.0


def props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_events, n_with_k, sum_k, min_k, max_k, avg_k):
    JSON field extraction (`props` → `$.k`) feeding a grouped agg —
    the semi-structured-column surface (get_json_object stays JVM-side;
    unparseable/missing keys aggregate as NULL).
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .select(
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_with_k").cast("long").alias("n_with_k"),
            F.col("sum_k").cast("long").alias("sum_k"),
            F.col("min_k").cast("long").alias("min_k"),
            F.col("max_k").cast("long").alias("max_k"),
            F.round(F.col("sum_k").cast("double") / F.col("n_with_k"), 6).alias(
                "avg_k"
            ),
        )
    )


PROPS_JSON_STATS_SQL = """
WITH ex AS (
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(k) AS BIGINT) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k,
       ROUND(CAST(SUM(k) AS DOUBLE) / count(k), 6) AS avg_k
FROM ex GROUP BY event_type
"""


def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_returnflag, n, stddev_qty, stddev_price, covar, corr):
    second-moment statistics computed from EXACT decimal power sums.

    Built-in stddev/corr are Welford-merged doubles whose last digits
    depend on partition merge order — unusable for cross-engine hash
    equality. Instead Σx, Σx², Σy, Σy², Σxy accumulate as exact
    DECIMAL(38,4) (partial/final, map-side combine), and the closed-form
    moment formulas run once per group in double over those exact inputs
    — deterministic and identical in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum((x * x).cast("decimal(38,4)")).alias("sxx"),
        F.sum(y).alias("sy"),
        F.sum((y * y).cast("decimal(38,4)")).alias("syy"),
        F.sum((x * y).cast("decimal(38,4)")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    return agg.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 6).alias("stddev_qty"),
        F.round(F.sqrt((syy - sy * sy / n) / (n - 1)), 6).alias("stddev_price"),
        F.round((sxy - sx * sy / n) / (n - 1), 6).alias("covar"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("corr"),
    )


STATS_MOMENTS_SQL = """
WITH m AS (
    SELECT l_returnflag, count(*) AS n,
           SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
           SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS sxx,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
           SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS syy,
           SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS sxy
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       ROUND(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)), 6) AS stddev_qty,
       ROUND(sqrt((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)), 6) AS stddev_price,
       ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1), 6) AS covar,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr
FROM m
"""


def order_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderpriority, n_orders, max_price, max_orderkey, min_price,
    min_orderkey): arg-max/arg-min per group with a deterministic
    (price, orderkey) lexicographic tiebreak — struct MIN/MAX compiles
    to a plain partial/final agg, no window or sort.
    """
    o = load_table(spark, sf_dir, "orders")
    pk = F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
    agg = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max(pk).alias("mx"),
        F.min(pk).alias("mn"),
    )
    return agg.select(
        "o_orderpriority",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("mx.p").alias("max_price"),
        F.col("mx.k").cast("long").alias("max_orderkey"),
        F.col("mn.p").alias("min_price"),
        F.col("mn.k").cast("long").alias("min_orderkey"),
    )


ORDER_EXTREMES_SQL = """
WITH agg AS (
    SELECT o_orderpriority, count(*) AS n_orders,
           max({'p': o_totalprice, 'k': o_orderkey}) AS mx,
           min({'p': o_totalprice, 'k': o_orderkey}) AS mn
    FROM orders GROUP BY 1
)
SELECT o_orderpriority, CAST(n_orders AS BIGINT) AS n_orders,
       mx.p AS max_price, CAST(mx.k AS BIGINT) AS max_orderkey,
       mn.p AS min_price, CAST(mn.k AS BIGINT) AS min_orderkey
FROM agg
"""


def conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderstatus, n_orders, n_big, all_positive, any_urgent,
    urgent_cents): FILTER-clause-style conditional aggregation —
    count_if / bool_and / bool_or plus a guarded integer-cents sum.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr(_CENTS)
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_if(F.col("o_totalprice") > BIG_ORDER_PRICE).alias("n_big"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", cents).otherwise(0)
            ).alias("urgent_cents"),
        )
        .select(
            "o_orderstatus",
            F.col("n_orders").cast("long").alias("n_orders"),
            F.col("n_big").cast("long").alias("n_big"),
            "all_positive",
            "any_urgent",
            F.col("urgent_cents").cast("long").alias("urgent_cents"),
        )
    )


CONDITIONAL_AGGREGATES_SQL = f"""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(*) FILTER (WHERE o_totalprice > {BIG_ORDER_PRICE}) AS BIGINT) AS n_big,
       bool_and(o_totalprice > 0) AS all_positive,
       bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN {_CENTS} ELSE 0 END)
            AS BIGINT) AS urgent_cents
FROM orders GROUP BY o_orderstatus
"""


def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderstatus, metric, value): wide per-status metrics melted to
    long form via the native UNPIVOT operator. All metrics are exact
    int64 (counts / integer cents) so the melted value column is
    type-stable across engines.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr(_CENTS)
    wide = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(cents).cast("long").alias("total_cents"),
        F.max(cents).cast("long").alias("max_cents"),
    )
    return wide.unpivot(
        ["o_orderstatus"], ["n_orders", "total_cents", "max_cents"], "metric", "value"
    )


UNPIVOT_ORDER_METRICS_SQL = f"""
WITH wide AS (
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM({_CENTS}) AS BIGINT) AS total_cents,
           CAST(MAX({_CENTS}) AS BIGINT) AS max_cents
    FROM orders GROUP BY 1
)
SELECT o_orderstatus, metric, value
FROM wide UNPIVOT (value FOR metric IN (n_orders, total_cents, max_cents))
"""


MIN_ORDERS_FOR_PROFILE = 3


def array_price_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_custkey, n_orders, top3_sum_cents, top5_csv): per-customer
    order-price profile via array aggregation — collect, sort
    descending, slice, fold — serialized to scalars (CSV string /
    integer sum) so the output is hashable by the driver canonicalizer.

    collect_list here is per-customer (bounded by a customer's order
    count), not a global collect; the fold over the sliced array is a
    JVM-side higher-order function.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr(_CENTS)
    g = (
        o.select("o_custkey", cents.alias("cents"))
        .groupBy("o_custkey")
        .agg(F.collect_list("cents").alias("l"), F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= MIN_ORDERS_FOR_PROFILE)
    )
    desc = F.reverse(F.array_sort("l"))
    top3_sum = F.aggregate(
        F.slice(desc, 1, 3), F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    return g.select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("n_orders").cast("long").alias("n_orders"),
        top3_sum.alias("top3_sum_cents"),
        F.concat_ws(",", F.slice(desc, 1, 5)).alias("top5_csv"),
    )


ARRAY_PRICE_PROFILE_SQL = f"""
WITH g AS (
    SELECT o_custkey, list_sort(list({_CENTS}), 'DESC') AS l,
           count(*) AS n_orders
    FROM orders GROUP BY o_custkey
    HAVING count(*) >= {MIN_ORDERS_FOR_PROFILE}
)
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(list_aggregate(l[1:3], 'sum') AS BIGINT) AS top3_sum_cents,
       array_to_string(l[1:5], ',') AS top5_csv
FROM g
"""


def orders_per_dow_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(isodow, month, n_orders, n_customers, revenue_cents): calendar
    heatmap cells — ISO day-of-week × month grouped counts/distincts.
    Spark's weekday() is 0=Monday; +1 aligns it with ISO 1=Monday so
    both engines emit the same axis.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            (F.weekday("o_orderdate") + 1).alias("isodow"),
            F.month("o_orderdate").alias("month"),
            "o_custkey",
            F.expr(_CENTS).alias("cents"),
        )
        .groupBy("isodow", "month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_distinct("o_custkey").alias("n_customers"),
            F.sum("cents").alias("revenue_cents"),
        )
        .select(
            F.col("isodow").cast("long").alias("isodow"),
            F.col("month").cast("long").alias("month"),
            F.col("n_orders").cast("long").alias("n_orders"),
            F.col("n_customers").cast("long").alias("n_customers"),
            F.col("revenue_cents").cast("long").alias("revenue_cents"),
        )
    )


ORDERS_PER_DOW_HEATMAP_SQL = f"""
SELECT CAST(isodow(o_orderdate) AS BIGINT) AS isodow,
       CAST(month(o_orderdate) AS BIGINT) AS month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(SUM({_CENTS}) AS BIGINT) AS revenue_cents
FROM orders GROUP BY 1, 2
"""


QUERIES: dict[str, Query] = {
    "props_json_stats": Query(
        props_json_stats, PROPS_JSON_STATS_SQL, "JSON field extraction + grouped agg"
    ),
    "stats_moments": Query(
        stats_moments,
        STATS_MOMENTS_SQL,
        "stddev/covar/corr from exact decimal power sums",
    ),
    "order_extremes": Query(
        order_extremes,
        ORDER_EXTREMES_SQL,
        "arg-max/arg-min per group with deterministic tiebreak",
    ),
    "conditional_aggregates": Query(
        conditional_aggregates,
        CONDITIONAL_AGGREGATES_SQL,
        "count_if / bool_and / bool_or / guarded sums",
    ),
    "unpivot_order_metrics": Query(
        unpivot_order_metrics, UNPIVOT_ORDER_METRICS_SQL, "wide→long UNPIVOT"
    ),
    "array_price_profile": Query(
        array_price_profile,
        ARRAY_PRICE_PROFILE_SQL,
        "array agg: collect/sort/slice/fold, serialized output",
    ),
    "orders_per_dow_heatmap": Query(
        orders_per_dow_heatmap,
        ORDERS_PER_DOW_HEATMAP_SQL,
        "ISO dow × month calendar heatmap",
    ),
}
