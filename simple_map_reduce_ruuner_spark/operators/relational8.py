"""Seventh relational batch: the remaining classic TPC-H query shapes
(Q2 / Q4 / Q6 / Q10 / Q11 / Q19 / Q20 analogs), adapted to this star
schema (which has no partsupp / l_shipmode / l_commitdate — supply-cost
shapes are re-derived from lineitem unit prices). None of these touch
the reference's four workloads (exampleCodes/* are token counts,
interval peaks, and a grouped HAVING); they complete the subquery /
pushdown taxonomy the relational6/7 batches started:

- ``regional_min_cost_supplier`` — Q2: correlated MIN subquery
  (cheapest supplier per part within a region) as a two-level
  aggregate + ``min(struct)`` argmin; no join-back, no second fact scan.
- ``order_priority_late_counts`` — Q4: EXISTS with a correlated
  non-equi predicate as a left-semi join (equi key + residual).
- ``forecast_revenue_delta``     — Q6: pure scan-filter-aggregate; the
  canonical parquet predicate-pushdown probe (no join, no shuffle
  beyond the single-row final agg).
- ``returned_item_losses``       — Q10: fact⋈dim⋈dim + grouped sum +
  total-order top-k with deterministic ties.
- ``important_part_value``       — Q11: HAVING against a scalar
  aggregate of the aggregate itself (group value > fraction of total),
  via a broadcast single-row cross join — no window over all groups.
- ``special_brand_revenue``      — Q19: OR-of-ANDs join predicate;
  the part-only disjunct residue is pre-applied to the build side so
  the join stays a broadcast equi-join with a residual filter, never a
  BroadcastNestedLoopJoin.
- ``red_part_heavy_suppliers``   — Q20: nested aggregate-filtered semi
  chain (suppliers whose yearly shipped quantity of a part family
  exceeds a threshold).

Scale notes: every query exchanges the fact table at most once on its
natural aggregate key; dimension sides broadcast (region/nation/
supplier always; part only after its selective filter). Money math
follows the engine-wide exact-decimal discipline (relational.py:29).
Unit prices (Q2) divide per ROW (``l_extendedprice / l_quantity`` in
IEEE doubles — bit-identical across engines) and aggregate with
MIN/argmin, never with an engine-divergent decimal division.
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

# Q2 analog: region and part family under supply-cost scrutiny.
Q2_REGION = "ASIA"
Q2_PART_TYPE = "STANDARD"

# Q4 analog: the audited quarter and the lateness threshold (days
# between order date and the line's ship date).
Q4_QUARTER = ("1996-07-01", "1996-10-01")
Q4_LATE_DAYS = 30

# Q6 analog: the forecast year and discount/quantity band.
Q6_YEAR = ("1997-01-01", "1998-01-01")
Q6_DISC_LO, Q6_DISC_HI = 0.05, 0.07
Q6_MAX_QTY = 24

# Q10 analog: the quarter whose returned items are charged back.
Q10_QUARTER = ("1997-01-01", "1997-04-01")
Q10_TOP_K = 20

# Q11 analog: a part is "important" if it carries more than
# Q11_NUM/Q11_DEN times the AVERAGE part's revenue. TPC-H thresholds on
# a fixed fraction of the total (0.0001/sf) and has to re-scale it per
# sf by hand; thresholding on the average is scale-free — a first cut
# with a fixed 1/2000-of-total bar passed all parts at sf0.001 (200
# parts, avg share 1/200) and ZERO parts at sf0.1 (20k parts, avg
# share 1/20k), both degenerate.
Q11_NUM, Q11_DEN = 3, 2  # value > 1.5 × average part value

# Q19 analog: three (brand, size-band, quantity-band) disjuncts.
Q19_ARMS = (
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#34", 1, 15, 20, 30),
)

# Q20 analog: part-name family, shipped year, and the quantity bar a
# supplier must clear. Per-supplier yearly family volume is ~285 at
# every sf (both fact and supplier scale linearly), so an absolute bar
# of 300 stays selective-but-nonempty from sf0.001 to sf0.1 and beyond.
Q20_NAME_PREFIX = "red "
Q20_YEAR = ("1997-01-01", "1998-01-01")
Q20_MIN_QTY = 300.0


def _ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp")


def regional_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p_partkey, p_name, s_name, unit_cost): for every STANDARD-type
    part, the ASIA supplier with the lowest observed unit price.

    TPC-H Q2's correlated ``MIN(ps_supplycost)`` subquery, re-derived
    from lineitem (no partsupp in this schema): unit cost is the
    per-row ``l_extendedprice / l_quantity`` (IEEE-exact in both
    engines), MIN'd per (part, supplier), then argmin'd per part via
    ``min(struct(cost, suppkey))`` — lexicographic struct comparison
    breaks cost ties toward the smaller supplier key, mirrored in the
    oracle's ``ORDER BY cost, suppkey`` rank. One fact exchange on
    (partkey, suppkey); the region-filtered supplier dim broadcasts
    into the fact scan so non-ASIA rows die before the shuffle; the
    part filter applies AFTER the argmin on dimension-bounded rows
    (|part| per group), where it joins the part dim on the shuffle-free
    aggregate output.
    """
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == Q2_REGION
    )
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    asia_supp = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit"),
    )
    per_pair = (
        li.join(F.broadcast(asia_supp), li.l_suppkey == asia_supp.s_suppkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("unit").alias("min_unit"))
    )
    best = per_pair.groupBy("l_partkey").agg(
        F.min(F.struct("min_unit", "l_suppkey")).alias("best")
    )
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_type") == Q2_PART_TYPE
    )
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .join(
            F.broadcast(asia_supp),
            F.col("best.l_suppkey") == asia_supp.s_suppkey,
        )
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("best.min_unit").alias("unit_cost"),
        )
    )


REGIONAL_MIN_COST_SUPPLIER_SQL = f"""
WITH asia_supp AS (
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = '{Q2_REGION}'
), per_pair AS (
    SELECT l_partkey, l_suppkey,
           min(l_extendedprice / l_quantity) AS min_unit
    FROM lineitem JOIN asia_supp ON l_suppkey = s_suppkey
    GROUP BY 1, 2
), best AS (
    SELECT l_partkey, l_suppkey, min_unit,
           row_number() OVER (
               PARTITION BY l_partkey ORDER BY min_unit, l_suppkey
           ) AS rn
    FROM per_pair
)
SELECT p_partkey, p_name, s_name, min_unit AS unit_cost
FROM best
JOIN part ON l_partkey = p_partkey
JOIN asia_supp ON best.l_suppkey = s_suppkey
WHERE rn = 1 AND p_type = '{Q2_PART_TYPE}'
"""


def order_priority_late_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderpriority, order_count): orders placed in the audited
    quarter that had at least one line shipped more than Q4_LATE_DAYS
    after the order date — TPC-H Q4's correlated EXISTS.

    The EXISTS becomes a LEFT SEMI join whose condition is the equi key
    plus the correlated date residual: Spark keeps the hash join on
    ``l_orderkey = o_orderkey`` and evaluates the datediff as a join
    residual, so there is exactly one fact exchange and no
    deduplication step (semi joins emit each order at most once by
    construction). The quarter filter is pushed into the orders scan.
    """
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts(Q4_QUARTER[0]))
        & (F.col("o_orderdate") < _ts(Q4_QUARTER[1]))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (F.datediff(li.l_shipdate, orders.o_orderdate) > Q4_LATE_DAYS),
        "leftsemi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORDER_PRIORITY_LATE_COUNTS_SQL = f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_QUARTER[0]}'
  AND o_orderdate <  TIMESTAMP '{Q4_QUARTER[1]}'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND datediff('day', o_orderdate, l_shipdate) > {Q4_LATE_DAYS}
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1 row (revenue_delta): revenue that would have been kept had
    mid-band discounts on small lines been dropped — TPC-H Q6.

    Deliberately the simplest plan in the registry: parquet scan with
    ALL three predicates pushed to the reader (timestamp range,
    discount range, quantity bound — verify via PushedFilters), a
    two-column ReadSchema, a map-side partial sum, and a single-row
    exchange. At 100 TB this is the query whose cost is purely I/O —
    row-group statistics skip everything outside the ship-date year.
    """
    li = load_table(spark, sf_dir, "lineitem")
    picked = li.where(
        (F.col("l_shipdate") >= _ts(Q6_YEAR[0]))
        & (F.col("l_shipdate") < _ts(Q6_YEAR[1]))
        & (F.col("l_discount") >= Q6_DISC_LO)
        & (F.col("l_discount") <= Q6_DISC_HI)
        & (F.col("l_quantity") < Q6_MAX_QTY)
    )
    return picked.agg(
        as_money(
            dsum(F.col("l_extendedprice") * F.col("l_discount"))
        ).alias("revenue_delta")
    )


FORECAST_REVENUE_DELTA_SQL = f"""
SELECT CAST(ROUND({dsum_sql('l_extendedprice * l_discount')}, 2) AS DOUBLE)
           AS revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_YEAR[0]}'
  AND l_shipdate <  TIMESTAMP '{Q6_YEAR[1]}'
  AND l_discount BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
  AND l_quantity < {Q6_MAX_QTY}
"""


def returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 (c_custkey, c_name, n_name, revenue): customers who
    returned the most revenue on orders from the audited quarter —
    TPC-H Q10.

    Plan: the return-flag filter reaches the fact scan; orders carry
    the quarter filter before the join so the o⋈l hash join probes a
    quarter-sized build; customer joins on the grouped output's key
    (post-aggregate, |customer|-bounded) and nation broadcasts. The
    top-k is a TakeOrderedAndProject (never a global sort) with ties
    broken by customer key.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts(Q10_QUARTER[0]))
        & (F.col("o_orderdate") < _ts(Q10_QUARTER[1]))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(dsum(revenue).alias("rev_dec"))
    )
    return (
        per_cust.join(customer, per_cust.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            as_money(F.col("rev_dec")).alias("revenue"),
            F.col("rev_dec"),
        )
        .orderBy(F.col("rev_dec").desc(), F.col("c_custkey"))
        .limit(Q10_TOP_K)
        .drop("rev_dec")
    )


RETURNED_ITEM_LOSSES_SQL = f"""
SELECT c_custkey, c_name, n_name,
       CAST(ROUND({dsum_sql('l_extendedprice * (1 - l_discount)')}, 2)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{Q10_QUARTER[0]}'
  AND o_orderdate <  TIMESTAMP '{Q10_QUARTER[1]}'
GROUP BY c_custkey, c_name, n_name
ORDER BY {dsum_sql('l_extendedprice * (1 - l_discount)')} DESC, c_custkey
LIMIT {Q10_TOP_K}
"""


def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_partkey, part_value): parts whose revenue exceeds 1.5× the
    average part's — TPC-H Q11's HAVING-against-a-scalar-subquery.

    The scalar (total, part count) is an aggregate OF the per-part
    aggregate, so it is computed from the grouped result (|part| rows),
    never by a second fact scan; it comes back as a broadcast
    single-row cross join. The threshold comparison stays in exact
    decimal/integer cross-multiplication
    (``value × n × DEN > total × NUM``) — no engine-divergent decimal
    division. One fact exchange on ``l_partkey``.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        dsum(F.col("l_extendedprice")).alias("val_dec")
    )
    total = per_part.agg(
        F.sum("val_dec").alias("total_dec"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("val_dec") * F.col("n_parts") * Q11_DEN
            > F.col("total_dec") * Q11_NUM
        )
        .select("l_partkey", as_money(F.col("val_dec")).alias("part_value"))
    )


IMPORTANT_PART_VALUE_SQL = f"""
WITH per_part AS (
    SELECT l_partkey, {dsum_sql('l_extendedprice')} AS val_dec
    FROM lineitem GROUP BY l_partkey
), scalar AS (
    SELECT sum(val_dec) AS total_dec, count(*) AS n_parts FROM per_part
)
SELECT l_partkey, CAST(ROUND(val_dec, 2) AS DOUBLE) AS part_value
FROM per_part, scalar
WHERE val_dec * n_parts * {Q11_DEN} > total_dec * {Q11_NUM}
"""


def special_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1 row (promo_rev): revenue from three (brand, size, quantity)
    market baskets — TPC-H Q19's OR-of-ANDs join predicate.

    The disjunction mixes part-side and fact-side columns, which naive
    planning turns into a nested-loop join. Here the part-only residue
    of each arm (brand + size band) pre-filters the build side — at
    scale that is the difference between broadcasting 3 brands' worth
    of parts and broadcasting the part table — and the join itself
    stays an equi-join on ``l_partkey`` with the full disjunction as a
    residual. The quantity bound common to all arms
    (``l_quantity <= max hi``) is pushed to the fact scan.
    """
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    part_arms = [
        (F.col("p_brand") == b) & F.col("p_size").between(slo, shi)
        for b, slo, shi, _, _ in Q19_ARMS
    ]
    full_arms = [
        (F.col("p_brand") == b)
        & F.col("p_size").between(slo, shi)
        & F.col("l_quantity").between(qlo, qhi)
        for b, slo, shi, qlo, qhi in Q19_ARMS
    ]
    part_side = part.where(
        part_arms[0] | part_arms[1] | part_arms[2]
    ).select("p_partkey", "p_brand", "p_size")
    max_qty = max(qhi for *_, qhi in Q19_ARMS)
    picked = li.where(F.col("l_quantity") <= max_qty).join(
        F.broadcast(part_side),
        (F.col("l_partkey") == F.col("p_partkey"))
        & (full_arms[0] | full_arms[1] | full_arms[2]),
    )
    return picked.agg(
        as_money(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("promo_rev")
    )


def _q19_arm_sql(arm: tuple[str, int, int, int, int]) -> str:
    b, slo, shi, qlo, qhi = arm
    return (
        f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi} "
        f"AND l_quantity BETWEEN {qlo} AND {qhi})"
    )


SPECIAL_BRAND_REVENUE_SQL = f"""
SELECT CAST(ROUND({dsum_sql('l_extendedprice * (1 - l_discount)')}, 2)
            AS DOUBLE) AS promo_rev
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {_q19_arm_sql(Q19_ARMS[0])}
   OR {_q19_arm_sql(Q19_ARMS[1])}
   OR {_q19_arm_sql(Q19_ARMS[2])}
"""


def red_part_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(s_name, red_qty): suppliers who shipped more than Q20_MIN_QTY
    units of red-named parts in the audited year — TPC-H Q20's nested
    aggregate-filtered IN chain.

    Chain: the part-name family filter broadcasts (a few % of the part
    dim) into the year-filtered fact scan; one exchange on
    ``l_suppkey`` aggregates shipped quantity; the HAVING bar trims to
    a supplier subset; the supplier-name join broadcasts that subset's
    dim. No correlated re-scan: TPC-H's per-(part,supplier) availqty
    comparison needs partsupp, which this schema lacks — the per-
    supplier absolute bar keeps the same nested IN(GROUP BY .. HAVING)
    shape.
    """
    part_red = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").startswith(Q20_NAME_PREFIX))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts(Q20_YEAR[0]))
        & (F.col("l_shipdate") < _ts(Q20_YEAR[1]))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    heavy = (
        li.join(F.broadcast(part_red), li.l_partkey == part_red.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("red_qty"))
        .where(F.col("red_qty") > Q20_MIN_QTY)
    )
    return heavy.join(
        F.broadcast(supplier), heavy.l_suppkey == supplier.s_suppkey
    ).select("s_name", "red_qty")


RED_PART_HEAVY_SUPPLIERS_SQL = f"""
SELECT s_name, red_qty
FROM (
    SELECT l_suppkey, sum(l_quantity) AS red_qty
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '{Q20_NAME_PREFIX}%'
      AND l_shipdate >= TIMESTAMP '{Q20_YEAR[0]}'
      AND l_shipdate <  TIMESTAMP '{Q20_YEAR[1]}'
    GROUP BY l_suppkey
    HAVING sum(l_quantity) > {Q20_MIN_QTY}
) JOIN supplier ON l_suppkey = s_suppkey
"""


QUERIES: dict[str, Query] = {
    "regional_min_cost_supplier": Query(
        regional_min_cost_supplier,
        REGIONAL_MIN_COST_SUPPLIER_SQL,
        "Q2 shape: correlated MIN subquery as two-level argmin aggregate",
    ),
    "order_priority_late_counts": Query(
        order_priority_late_counts,
        ORDER_PRIORITY_LATE_COUNTS_SQL,
        "Q4 shape: correlated EXISTS as left-semi join with residual",
    ),
    "forecast_revenue_delta": Query(
        forecast_revenue_delta,
        FORECAST_REVENUE_DELTA_SQL,
        "Q6 shape: pure scan-filter-aggregate pushdown probe",
    ),
    "returned_item_losses": Query(
        returned_item_losses,
        RETURNED_ITEM_LOSSES_SQL,
        "Q10 shape: fact-dim joins + grouped sum + deterministic top-k",
    ),
    "important_part_value": Query(
        important_part_value,
        IMPORTANT_PART_VALUE_SQL,
        "Q11 shape: HAVING vs scalar aggregate of the aggregate",
    ),
    "special_brand_revenue": Query(
        special_brand_revenue,
        SPECIAL_BRAND_REVENUE_SQL,
        "Q19 shape: OR-of-ANDs kept as equi-join + residual",
    ),
    "red_part_heavy_suppliers": Query(
        red_part_heavy_suppliers,
        RED_PART_HEAVY_SUPPLIERS_SQL,
        "Q20 shape: nested aggregate-filtered IN chain",
    ),
}
