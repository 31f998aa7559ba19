"""Sixth relational batch: the three TPC-H subquery/argmax shapes the
relational6 batch left out, each chosen for a DIFFERENT decorrelation
pattern (none of which the reference's 4 workloads touch —
exampleCodes/* are token counts, interval peaks, and a grouped HAVING):

- ``small_quantity_order_revenue`` — Q17 shape: a correlated scalar
  subquery (per-part average quantity) decorrelated into a window
  aggregate, so the fact table is exchanged ONCE on ``l_partkey``
  instead of scanned twice for an aggregate + self-join.
- ``monthly_top_supplier``        — Q15 shape: argmax-per-group via a
  single ``max(struct(...))`` aggregate instead of a rank window over
  the full aggregate or a max-join-back, with an explicit deterministic
  tie-break (revenue, then supplier key).
- ``lone_late_suppliers``         — Q21 shape: the classic
  EXISTS + NOT-EXISTS double correlated subquery collapsed into ONE
  grouped pass over the fact join — per-order conditional distinct
  counts replace two extra fact self-joins.

Scale notes: each query shuffles the fact table exactly once on its
natural key (``l_partkey`` / ``(month, suppkey)`` / ``l_orderkey``); the
post-aggregate sides are dimension-bounded (|part|, |month×supplier|,
|supplier|) and the supplier name lookup broadcasts. Money math follows
the engine-wide exact-decimal discipline (relational.py:29): sums in
DECIMAL(30,6), rounded before any double cast; Q17's divide-by-7 is done
in exact integer cents (integer division is engine-identical, unlike
decimal division whose result scale/rounding differs between Spark and
DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from simple_map_reduce_ruuner_spark.operators.relational import (
    as_money,
    dsum,
    dsum_sql,
)
from simple_map_reduce_ruuner_spark.registry import Query
from simple_map_reduce_ruuner_spark.sources.tables import load_table

# Q17's "small" threshold: lines below this fraction of the part's
# average quantity. TPC-H uses 0.2 on a 50-value quantity domain; this
# dataset's quantities are narrower, so 0.5 keeps the filter selective
# but non-degenerate (~25 % of lines at sf0.001).
SMALL_QTY_FRACTION = 0.5

# Q21's lateness threshold in days between order date and ship date.
LATE_DAYS = 60


def small_quantity_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1 row (avg_yearly): yearly revenue lost to small-quantity orders.

    TPC-H Q17's correlated scalar subquery
    ``l_quantity < k * (SELECT avg(l_quantity) FROM lineitem li2 WHERE
    li2.l_partkey = l.l_partkey)`` decorrelated as a window average:
    one exchange on ``l_partkey``, the per-part average computed in
    place, no second fact scan. (The aggregate-then-rejoin alternative
    also shuffles the fact once — Catalyst reuses the exchange — but
    pays an extra join stage; the window form is strictly less work
    when, as here, every surviving row needs the per-group scalar.)

    The ÷7 is exact-integer: prices have cent precision, so the decimal
    sum ×100 is an integral cents total; BIGINT ``div 7`` then /100.0
    is bit-identical across engines, unlike decimal division.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part_avg = F.avg("l_quantity").over(Window.partitionBy("l_partkey"))
    small = li.withColumn("part_avg", part_avg).where(
        F.col("l_quantity") < SMALL_QTY_FRACTION * F.col("part_avg")
    )
    return small.agg(
        F.expr(
            "CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) * 100 "
            "AS BIGINT) div 7 AS BIGINT) AS DOUBLE) / 100.0"
        ).cast("double").alias("avg_yearly")
    )


SMALL_QUANTITY_ORDER_REVENUE_SQL = f"""
WITH w AS (
    SELECT l_extendedprice,
           l_quantity,
           avg(l_quantity) OVER (PARTITION BY l_partkey) AS part_avg
    FROM lineitem
)
SELECT CAST(CAST({dsum_sql('l_extendedprice')} * 100 AS BIGINT) // 7 AS DOUBLE)
           / 100.0 AS avg_yearly
FROM w
WHERE l_quantity < {SMALL_QTY_FRACTION} * part_avg
"""


def monthly_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ship_month, top_suppkey, revenue): each month's highest-revenue
    supplier — TPC-H Q15's argmax without the max-join-back.

    Q15 materializes a revenue view, takes ``max(total_revenue)`` in a
    scalar subquery, and joins the view to itself on equality. One
    ``max(struct(revenue, suppkey))`` per month replaces that second
    pass: the struct comparison is lexicographic, so ties on revenue
    break deterministically toward the larger supplier key (the oracle
    mirrors this with an ORDER BY revenue DESC, suppkey DESC rank).
    Exchanges: fact on (month, suppkey) for the partial/final aggregate,
    then |month×supplier| rows on month — dimension-bounded.
    """
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ship_month = (
        F.year("l_shipdate") * 100 + F.month("l_shipdate")
    ).cast("long")
    per_supp = (
        li.groupBy(ship_month.alias("ship_month"), "l_suppkey")
        .agg(dsum(revenue).alias("rev_dec"))
    )
    best = per_supp.groupBy("ship_month").agg(
        F.max(F.struct("rev_dec", "l_suppkey")).alias("best")
    )
    return best.select(
        "ship_month",
        F.col("best.l_suppkey").alias("top_suppkey"),
        as_money(F.col("best.rev_dec")).alias("revenue"),
    )


MONTHLY_TOP_SUPPLIER_SQL = f"""
WITH rev AS (
    SELECT CAST(extract(year FROM l_shipdate) * 100
                + extract(month FROM l_shipdate) AS BIGINT) AS ship_month,
           l_suppkey,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS rev_dec
    FROM lineitem
    GROUP BY 1, 2
)
SELECT ship_month,
       l_suppkey AS top_suppkey,
       CAST(ROUND(rev_dec, 2) AS DOUBLE) AS revenue
FROM rev
QUALIFY row_number() OVER (
    PARTITION BY ship_month ORDER BY rev_dec DESC, l_suppkey DESC
) = 1
"""


def lone_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(s_name, numwait): per supplier, how many multi-supplier orders
    they alone shipped late (> LATE_DAYS after the order date) —
    TPC-H Q21's EXISTS + NOT EXISTS pair in one grouped pass.

    Q21's textbook plan joins the fact to itself twice (one semi for
    "another supplier participated", one anti for "no OTHER supplier was
    late"). Both collapse into per-order conditional aggregates over the
    single lineitem⋈orders join. A first cut used two ``countDistinct``
    in one groupBy — Spark planned that as Expand×3 (every joined row
    tripled into the shuffle) plus an extra 4-column-key exchange. The
    two-level form here is the classic distinct rewrite: dedupe to
    (order, supplier, was_late) pairs first (map-side partial combine
    does most of it pre-shuffle), then plain COUNT/SUM/MAX per order —
    no Expand, and the second shuffle carries pair-level rows, a
    |suppliers-per-order| fraction of the fact. The supplier-name
    lookup broadcasts.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        # one order-keyed shuffle up front (guide §2.4): the pair and
        # per-order aggregates below then satisfy their distributions
        # from this partitioning (subset rule) instead of re-shuffling
        # twice; when orders is too big to broadcast, the join's own
        # ClusteredDistribution(l_orderkey) is satisfied by the same
        # exchange, so the repartition is never an extra pass at scale
        .repartition(F.col("l_orderkey"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    is_late = (F.datediff("l_shipdate", "o_orderdate") > LATE_DAYS).cast("int")
    per_pair = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(is_late).alias("is_late"))
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("is_late").alias("n_late"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    lone = per_order.where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    return (
        lone.groupBy("late_supp")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .join(F.broadcast(supplier), F.col("late_supp") == supplier.s_suppkey)
        .select("s_name", "numwait")
    )


LONE_LATE_SUPPLIERS_SQL = f"""
WITH per_order AS (
    SELECT l_orderkey,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT CASE
               WHEN datediff('day', o_orderdate, l_shipdate) > {LATE_DAYS}
               THEN l_suppkey END) AS n_late,
           max(CASE
               WHEN datediff('day', o_orderdate, l_shipdate) > {LATE_DAYS}
               THEN l_suppkey END) AS late_supp
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_orderkey
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_order JOIN supplier ON late_supp = s_suppkey
WHERE n_supp >= 2 AND n_late = 1
GROUP BY s_name
"""


QUERIES: dict[str, Query] = {
    "small_quantity_order_revenue": Query(
        small_quantity_order_revenue,
        SMALL_QUANTITY_ORDER_REVENUE_SQL,
        "Q17 shape: correlated scalar subquery as a window aggregate",
    ),
    "monthly_top_supplier": Query(
        monthly_top_supplier,
        MONTHLY_TOP_SUPPLIER_SQL,
        "Q15 shape: argmax per group via max(struct), deterministic ties",
    ),
    "lone_late_suppliers": Query(
        lone_late_suppliers,
        LONE_LATE_SUPPLIERS_SQL,
        "Q21 shape: EXISTS+NOT EXISTS pair as one grouped conditional pass",
    ),
}
