"""Third relational batch: multi-table top-k, decorrelated subqueries,
percent-of-total reporting.

Classic warehouse shapes the reference engine's users would expect from
any analytics engine (SURVEY.md §2.C — categories absent in the 4-workload
reference, provided by this engine):

- ``shipping_priority`` — the TPC-H Q3 shape: 3-way join with filters on
  every input, revenue aggregate per order, top-10. Filters sit on the
  scans (pushed down), the aggregate runs partial→final, and the top-10
  is ``TakeOrderedAndProject`` (a k-row heap per partition + driver
  merge), never a global sort — the plan survives a 100× scale-up.
- ``orders_above_customer_avg`` — the canonical *decorrelation*: a
  correlated scalar subquery (each order vs its customer's average)
  rewritten as aggregate-then-join, which is what a 100 TB plan needs
  (one shuffle per side on the join key instead of a per-row subquery).
  The predicate is evaluated in exact decimal cross-multiplied form
  (``5 * price * cnt > 6 * sum``  ⇔  ``price > 1.2 * avg``) so the
  boundary never depends on double rounding or engine-specific AVG.
- ``nation_revenue_share`` — percent-of-total report. The window that
  computes the total runs over the *25-row aggregate*, not the fact
  table: the single-partition window exchange everyone fears is fine
  when its input is one row per nation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.operators.relational import as_money, dsum, dsum_sql
from simple_map_reduce_ruuner_spark.registry import Query
from simple_map_reduce_ruuner_spark.sources.tables import load_table

SEGMENT = "BUILDING"
CUTOFF = "1998-06-01 00:00:00"
TOP_N = 10


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-revenue per order for one market segment,
    top-10 by revenue. Segment filter prunes customer before the join;
    date filters reach both scans."""
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == SEGMENT
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(CUTOFF).cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(CUTOFF).cast("timestamp_ntz")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(as_money(dsum(revenue)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(TOP_N)
    )


SHIPPING_PRIORITY_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(ROUND({dsum_sql('l_extendedprice * (1 - l_discount)')}, 2) AS DOUBLE)
           AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
WHERE c_mktsegment = '{SEGMENT}'
  AND o_orderdate < TIMESTAMP '{CUTOFF}'
  AND l_shipdate  > TIMESTAMP '{CUTOFF}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT {TOP_N}
"""


def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders priced >1.2× their customer's average order — the correlated
    scalar subquery, decorrelated to aggregate-then-join.

    Exactness: prices are scaled to integer micros (an exact IEEE double
    product + half-up round, identical in both engines), so with
    s = SUM(price_micro) and n = COUNT per customer the predicate
    ``price > 1.2 * s/n``  ⇔  ``5*price_micro*n > 6*s`` is pure BIGINT
    arithmetic — every boundary row agrees across engines. (Decimal
    cross-multiplication would exceed Spark's precision-38 cap and round.)
    """
    orders = load_table(spark, sf_dir, "orders")
    micro = F.round(F.col("o_totalprice") * 1_000_000).cast("long")
    per_cust = orders.select("o_custkey", micro.alias("pm")).groupBy("o_custkey").agg(
        F.sum("pm").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        orders.join(per_cust.withColumnRenamed("o_custkey", "ck"),
                    orders.o_custkey == F.col("ck"))
        .filter(5 * micro * F.col("n") > 6 * F.col("s"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.col("n").cast("long").alias("cust_orders"),
        )
    )


ORDERS_ABOVE_CUSTOMER_AVG_SQL = """
WITH per_cust AS (
    SELECT o_custkey AS ck,
           SUM(CAST(round(o_totalprice * 1000000) AS BIGINT)) AS s,
           count(*) AS n
    FROM orders
    GROUP BY o_custkey
)
SELECT o_orderkey, o_custkey, o_totalprice, CAST(n AS BIGINT) AS cust_orders
FROM orders
JOIN per_cust ON o_custkey = ck
WHERE 5 * CAST(round(o_totalprice * 1000000) AS BIGINT) * n > 6 * s
"""


def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation plus its percent of corpus-wide revenue.

    The percent-of-total window runs over the post-aggregate (one row per
    nation), so its single-partition exchange moves ~25 rows regardless
    of fact-table size. Both engines divide the same exact decimal sums
    cast to double, so the shares are bit-identical.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_nation = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(dsum(revenue).alias("rev_dec"))
    )
    total = F.sum("rev_dec").over(Window.partitionBy())
    return per_nation.select(
        "n_name",
        as_money(F.col("rev_dec")).alias("revenue"),
        F.round(F.col("rev_dec").cast("double") / total.cast("double") * 100, 6)
        .alias("share_pct"),
    )


NATION_REVENUE_SHARE_SQL = f"""
WITH per_nation AS (
    SELECT n_name, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS rev_dec
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
)
SELECT n_name,
       CAST(ROUND(rev_dec, 2) AS DOUBLE) AS revenue,
       ROUND(CAST(rev_dec AS DOUBLE) / CAST(sum(rev_dec) OVER () AS DOUBLE) * 100,
             6) AS share_pct
FROM per_nation
"""


QUERIES: dict[str, Query] = {
    "shipping_priority": Query(
        shipping_priority,
        SHIPPING_PRIORITY_SQL,
        "TPC-H Q3 shape: filtered 3-way join, revenue agg, top-10 heap",
    ),
    "orders_above_customer_avg": Query(
        orders_above_customer_avg,
        ORDERS_ABOVE_CUSTOMER_AVG_SQL,
        "correlated scalar subquery decorrelated to aggregate-then-join",
    ),
    "nation_revenue_share": Query(
        nation_revenue_share,
        NATION_REVENUE_SHARE_SQL,
        "percent-of-total report; window runs over the 25-row aggregate",
    ),
}
