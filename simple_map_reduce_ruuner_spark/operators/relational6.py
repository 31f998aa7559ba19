"""Fifth relational batch: the remaining TPC-H-shaped multi-join
analytics, adapted to this dataset's reduced schema (no partsupp, no
commit/receipt dates — see TESTDATA.md).

The reference ships none of these (its 4 workloads are token counts,
interval peaks, and a grouped HAVING — exampleCodes/*); they widen the
engine's join/aggregate surface along SURVEY.md §2.C with the classic
decision-support plans a warehouse user expects:

- ``volume_shipping``        — Q7 shape: double-dimension star (supplier
  nation × customer nation) with revenue by year. One fact shuffle for
  the orders join; every dimension broadcasts.
- ``regional_market_share``  — Q8 shape: per-year share of global
  revenue delivered by suppliers of one region. Numerator and
  denominator are conditional aggregates over ONE fact pass — no
  self-join of the fact table for a ratio.
- ``product_profit``         — Q9 shape: profit by supplier nation ×
  year with a synthetic supply cost (10 % of retail price — the dataset
  has no partsupp table to price from).
- ``customer_order_distribution`` — Q13 shape: LEFT join preserving
  order-less customers, then a distribution over the per-customer count.
- ``promo_revenue_share``    — Q14 shape: monthly CASE-WHEN conditional
  aggregate ratio after a broadcast part join.
- ``part_supplier_counts``   — Q16 shape: COUNT(DISTINCT supplier) per
  part attribute triple, with a NOT-IN-subquery supplier exclusion
  (rewritten to a broadcast anti-join).
- ``large_quantity_orders``  — Q18 shape: HAVING over a fact aggregate,
  then join the survivors (a tiny set — broadcast) back to the
  dimensions.
- ``idle_rich_customers``    — Q22 shape: scalar-subquery threshold
  (1-row broadcast) + anti-join against a filtered fact.

Scale notes: every query here shuffles the fact table at most once on
its natural key; dims (region/nation/customer/supplier/part ≤ ~1/5000 of
lineitem rows) broadcast; ratios divide exact decimal sums cast to
double, so both engines emit bit-identical shares (the
``nation_revenue_share`` idiom, relational3.py:125).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.operators.relational import (
    as_money,
    dsum,
    dsum_sql,
)
from simple_map_reduce_ruuner_spark.registry import Query
from simple_map_reduce_ruuner_spark.sources.tables import load_table

LARGE_ORDER_QTY = 250
SHARE_REGION = "ASIA"
EXCLUDE_REGION = "AFRICA"


def _supplier_nation(
    spark: SparkSession, sf_dir: str, with_region: bool = False
) -> DataFrame:
    """(s_suppkey, supp_nation[, supp_region]): supplier → nation (and
    optionally region) names, a ≤10k-row broadcast side at any SF.

    region is opt-in: it's an inner join Catalyst cannot eliminate
    (join-elimination needs declared FKs), so queries that only group by
    nation would otherwise drag a dead broadcast join through the plan.
    """
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    joined = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    )
    cols = ["s_suppkey", F.col("n_name").alias("supp_nation")]
    if with_region:
        region = load_table(spark, sf_dir, "region")
        joined = joined.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        )
        cols.append(F.col("r_name").alias("supp_region"))
    return joined.select(*cols)


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(supp_nation, cust_nation, l_year, revenue): cross-border trade
    volume — revenue between each ordered nation pair, per ship year.

    Plan: lineitem ⋈ orders is the only fact-fact shuffle; the supplier
    and customer dims broadcast FLAT (key → nationkey, no pre-joined
    name lookup to build first), the fact aggregates on INT nation keys
    (narrower group-by exchange than the 25-char names — guide §2.3),
    and the name join runs on the |nation|² × years aggregate instead
    of per fact row. n_name is unique per nationkey, so the pre-agg
    int-key inequality filter and post-agg name attach are exact
    (full-row-compare receipt at sf0.1: 4200 rows identical).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_key = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            "s_nationkey",
            "c_nationkey",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(revenue).alias("rev_dec"))
    )
    n_s = nation.select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    n_c = nation.select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("cust_nation"),
    )
    return (
        per_key.join(F.broadcast(n_s), "s_nationkey")
        .join(F.broadcast(n_c), "c_nationkey")
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            as_money(F.col("rev_dec")).alias("revenue"),
        )
    )


VOLUME_SHIPPING_SQL = f"""
SELECT n_s.n_name AS supp_nation,
       n_c.n_name AS cust_nation,
       CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(ROUND({dsum_sql('l_extendedprice * (1 - l_discount)')}, 2) AS DOUBLE)
           AS revenue
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation n_s ON s_nationkey = n_s.n_nationkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation n_c ON c_nationkey = n_c.n_nationkey
WHERE n_s.n_name <> n_c.n_name
GROUP BY 1, 2, 3
"""


def regional_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_year, region_revenue, total_revenue, mkt_share): per order
    year, the share of global revenue shipped by {SHARE_REGION}-based
    suppliers.

    Q8's ratio is computed as two conditional aggregates over a single
    fact pass (SUM(CASE WHEN supplier-region matches)) — never as a
    numerator-query / denominator-query self-join. One fact shuffle
    (orders join), one group-by-year exchange, broadcast supplier map.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = _supplier_nation(spark, sf_dir, with_region=True)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    in_region = F.when(F.col("supp_region") == SHARE_REGION, revenue).otherwise(
        F.lit(0.0)
    )
    per_year = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            dsum(in_region).alias("region_dec"),
            dsum(revenue).alias("total_dec"),
        )
    )
    return per_year.select(
        "o_year",
        as_money(F.col("region_dec")).alias("region_revenue"),
        as_money(F.col("total_dec")).alias("total_revenue"),
        F.round(
            F.col("region_dec").cast("double") / F.col("total_dec").cast("double"),
            6,
        ).alias("mkt_share"),
    )


REGIONAL_MARKET_SHARE_SQL = f"""
WITH per_year AS (
    SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
           {dsum_sql(f"CASE WHEN r_name = '{SHARE_REGION}' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS region_dec,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_dec
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY 1
)
SELECT o_year,
       CAST(ROUND(region_dec, 2) AS DOUBLE) AS region_revenue,
       CAST(ROUND(total_dec, 2) AS DOUBLE) AS total_revenue,
       ROUND(CAST(region_dec AS DOUBLE) / CAST(total_dec AS DOUBLE), 6) AS mkt_share
FROM per_year
"""


def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(supp_nation, o_year, profit): Q9-shape profit by supplier nation
    and order year for widget parts.

    The dataset has no partsupp, so supply cost is synthesized as 10 %
    of p_retailprice per unit — the POINT of the query is the plan
    (fact ⋈ fact shuffle + two broadcast dims + filtered part scan with
    the LIKE pushed down), not the cost model. amount stays in exact
    decimal until the final round.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supp = _supplier_nation(spark, sf_dir)
    widget = part.where(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.lit(0.1) * F.col("l_quantity")
    return (
        li.join(F.broadcast(widget), li.l_partkey == widget.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("supp_nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(as_money(dsum(amount)).alias("profit"))
    )


PRODUCT_PROFIT_SQL = f"""
SELECT n_name AS supp_nation,
       CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(ROUND({dsum_sql('l_extendedprice * (1 - l_discount) - p_retailprice * 0.1 * l_quantity')}, 2) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_count, custdist): how many customers placed exactly N
    non-trivial orders (Q13), zero included.

    The LEFT join keeps order-less customers (c_count 0 bucket); the
    priority filter lives in the join condition, not a WHERE, so it
    cannot silently turn the outer join inner. Two exchanges: the outer
    join's (broadcast customer would also work, but Q13's point is the
    outer-join-then-double-aggregate shape) and the tiny final histogram.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
WITH per_cust AS (
    SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
    FROM customer
    LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
    GROUP BY 1
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY 1
"""


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_month, promo_revenue, total_revenue, promo_share): Q14 —
    monthly share of revenue from PROMO-type parts.

    Broadcast part join; CASE-WHEN conditional aggregate; one fact pass,
    one group-by-month exchange. The ratio divides the exact decimal
    sums cast to double.

    Groups on INT (year, month) and formats the "yyyy-MM" label on the
    |months|-sized aggregate instead of date_format-ing every fact row
    into a string group key (guide §2.3: per-row formatter work and the
    7-char key both move past the agg; lpad(year,4)||'-'||lpad(month,2)
    is exactly date_format('yyyy-MM')'s output, so the label is
    byte-identical).
    Measured 1.66 → 1.30 s at sf0.1 (5 interleaved reps), rows identical.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    per_month = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.year("l_shipdate").alias("_y"), F.month("l_shipdate").alias("_m")
        )
        .agg(dsum(promo).alias("promo_dec"), dsum(revenue).alias("total_dec"))
    )
    return per_month.select(
        F.concat_ws(
            "-",
            F.lpad(F.col("_y").cast("string"), 4, "0"),
            F.lpad(F.col("_m").cast("string"), 2, "0"),
        ).alias("o_month"),
        as_money(F.col("promo_dec")).alias("promo_revenue"),
        as_money(F.col("total_dec")).alias("total_revenue"),
        F.round(
            F.col("promo_dec").cast("double") / F.col("total_dec").cast("double"),
            6,
        ).alias("promo_share"),
    )


PROMO_REVENUE_SHARE_SQL = f"""
WITH per_month AS (
    SELECT strftime(l_shipdate, '%Y-%m') AS o_month,
           {dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS promo_dec,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_dec
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    GROUP BY 1
)
SELECT o_month,
       CAST(ROUND(promo_dec, 2) AS DOUBLE) AS promo_revenue,
       CAST(ROUND(total_dec, 2) AS DOUBLE) AS total_revenue,
       ROUND(CAST(promo_dec AS DOUBLE) / CAST(total_dec AS DOUBLE), 6) AS promo_share
FROM per_month
"""


def part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p_brand, p_type, p_size, supplier_cnt): distinct suppliers able
    to ship each part attribute triple (Q16), excluding suppliers based
    in {EXCLUDE_REGION}.

    partsupp doesn't exist here, so the part↔supplier relation is
    derived from lineitem. The NOT-IN subquery of Q16 is expressed as a
    broadcast LEFT ANTI join (null-safe, unlike a naive NOT IN with
    nulls).

    The (brand, type, size) group key is dictionary-encoded to an INT
    gid on the tiny part dim before the fact ever shuffles (gid = MIN
    p_partkey per triple — a partkey belongs to exactly one triple, so
    triple↔gid is a bijection and grouping by gid IS grouping by the
    triple; labels re-attach by gid join on the |triples|-sized
    aggregate). One upfront hash partition on gid then makes BOTH
    levels of the distinct count partition-local — HashPartitioning(gid)
    satisfies ClusteredDistribution({gid, suppkey}) by the subset
    rule — so the fact path pays exactly one exchange of two BIGINTs
    instead of a two-phase distinct aggregate whose exchange carries
    the 25-char p_type strings. In this corpus (l_partkey, l_suppkey)
    pairs are ~unique (dedup factor 1.02 at sf0.1), so the map-side
    partial dedup the old plan bought with those string exchanges
    removed ~nothing; on a corpus where pairs repeat heavily (classic
    partsupp-derived TPC-H: ~7 lines per pair), re-insert a
    (gid, suppkey) partial aggregate before the repartition to shrink
    the exchange — the int keys stay. (Full-row-compare receipt:
    1745/6988 rows identical at sf0.01/sf0.1; 1.15 → 0.93 s median over
    5 interleaved reps at sf0.1.)
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    excluded = _supplier_nation(spark, sf_dir, with_region=True).where(
        F.col("supp_region") == EXCLUDE_REGION
    ).select("s_suppkey")
    gid_map = part.groupBy("p_brand", "p_type", "p_size").agg(
        F.min("p_partkey").alias("gid")
    )
    dim = part.join(gid_map, ["p_brand", "p_type", "p_size"]).select(
        "p_partkey", "gid"
    )
    labels = gid_map.select("gid", "p_brand", "p_type", "p_size")
    per_gid = (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(excluded), li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(F.broadcast(dim), F.col("l_partkey") == dim.p_partkey)
        .select("gid", "l_suppkey")
        .repartition("gid")
        .groupBy("gid", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("_dup"))
        .groupBy("gid")
        .agg(F.count(F.lit(1)).cast("long").alias("supplier_cnt"))
    )
    return per_gid.join(F.broadcast(labels), "gid").select(
        "p_brand", "p_type", "p_size", "supplier_cnt"
    )


PART_SUPPLIER_COUNTS_SQL = f"""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = '{EXCLUDE_REGION}'
)
GROUP BY 1, 2, 3
"""


def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
    sum_qty): orders whose total line quantity exceeds
    {LARGE_ORDER_QTY} (Q18), with their customer.

    The HAVING aggregate runs on the fact table first; the survivor set
    (p99 of per-order quantity sits near 270, so ~1 % of orders) is
    joined back via broadcast — orders/customer never shuffle against
    lineitem. At 100 TB the survivors remain tiny relative to the fact,
    which is exactly why the aggregate-then-broadcast-back shape wins
    over join-then-aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(as_money(dsum(F.col("l_quantity"))).alias("sum_qty"))
        .where(F.col("sum_qty") > LARGE_ORDER_QTY)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice").cast("double"), 2).alias("o_totalprice"),
            "sum_qty",
        )
    )


LARGE_QUANTITY_ORDERS_SQL = f"""
WITH big AS (
    SELECT l_orderkey,
           CAST(ROUND({dsum_sql('l_quantity')}, 2) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY 1
    HAVING CAST(ROUND({dsum_sql('l_quantity')}, 2) AS DOUBLE) > {LARGE_ORDER_QTY}
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       ROUND(CAST(o_totalprice AS DOUBLE), 2) AS o_totalprice,
       sum_qty
FROM orders
JOIN big      ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_name, numcust, totacctbal): per nation, customers whose
    balance beats the positive-balance average but who never placed an
    URGENT order (Q22 shape).

    The scalar subquery is a 1-row aggregate broadcast as a cross join
    (Spark plans it as BroadcastNestedLoopJoin over one row — free);
    the "no urgent orders" NOT EXISTS is a LEFT ANTI join on the
    filtered orders, whose priority predicate pushes to the scan.

    The above-average threshold is an exact decimal cross-multiply
    (``balance × n > Σbalance``), never a float AVG — a double average's
    partial-merge order is partitioning-dependent, so a balance within
    one ulp of the mean could flip between engines/runs (review-found;
    the same rule every other boundary in the repo follows).
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    bal_dec = F.col("c_acctbal").cast("decimal(12,2)")
    avg_bal = customer.where(F.col("c_acctbal") > 0).agg(
        dsum(F.col("c_acctbal")).alias("s_bal"),
        F.count(F.lit(1)).alias("n_bal"),
    )
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        customer.join(F.broadcast(avg_bal))
        .where(bal_dec * F.col("n_bal") > F.col("s_bal"))
        .join(F.broadcast(urgent), customer.c_custkey == urgent.o_custkey, "left_anti")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            as_money(dsum(F.col("c_acctbal"))).alias("totacctbal"),
        )
    )


IDLE_RICH_CUSTOMERS_SQL = f"""
SELECT n_name,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(ROUND({dsum_sql('c_acctbal')}, 2) AS DOUBLE) AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(c_acctbal AS DECIMAL(12,2))
          * (SELECT count(*) FROM customer WHERE c_acctbal > 0)
      > (SELECT {dsum_sql('c_acctbal')} FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY 1
"""


QUERIES: dict[str, Query] = {
    "volume_shipping": Query(
        volume_shipping,
        VOLUME_SHIPPING_SQL,
        "Q7 shape: nation-pair trade revenue by year, dims broadcast",
    ),
    "regional_market_share": Query(
        regional_market_share,
        REGIONAL_MARKET_SHARE_SQL,
        "Q8 shape: yearly region market share via conditional aggregates",
    ),
    "product_profit": Query(
        product_profit,
        PRODUCT_PROFIT_SQL,
        "Q9 shape: profit by supplier nation x year, synthetic cost",
    ),
    "customer_order_distribution": Query(
        customer_order_distribution,
        CUSTOMER_ORDER_DISTRIBUTION_SQL,
        "Q13 shape: left-join order-count distribution incl. zero bucket",
    ),
    "promo_revenue_share": Query(
        promo_revenue_share,
        PROMO_REVENUE_SHARE_SQL,
        "Q14 shape: monthly promo revenue share, CASE-WHEN conditional agg",
    ),
    "part_supplier_counts": Query(
        part_supplier_counts,
        PART_SUPPLIER_COUNTS_SQL,
        "Q16 shape: distinct-supplier counts with NOT-IN as anti-join",
    ),
    "large_quantity_orders": Query(
        large_quantity_orders,
        LARGE_QUANTITY_ORDERS_SQL,
        "Q18 shape: fact HAVING then broadcast survivors back to dims",
    ),
    "idle_rich_customers": Query(
        idle_rich_customers,
        IDLE_RICH_CUSTOMERS_SQL,
        "Q22 shape: scalar-subquery threshold + anti-join on filtered fact",
    ),
}
