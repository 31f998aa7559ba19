"""Graph analytics over the relational tables: fixed-iteration PageRank.

Second member of the iterative-algorithm class next to
``neardup_clusters`` (dedup.py): the customer–supplier graph (an edge
per distinct (customer, supplier) trading pair from orders ⋈ lineitem,
undirected so no node is a sink) ranked with 5 synchronous PageRank
iterations at damping 0.85.

Exactness design — the whole computation is BIGINT fixed-point
("femto-rank", 1e-15 units): per-edge contribution is integer division
``rank div outdeg``, the per-node sum is an exact integer sum, and the
damping update is ``(85 * s) div 100 + (15 * 10^15) div (100 * N)``.
No floating point anywhere, so partial-aggregation order cannot perturb
a digit and the DuckDB oracle (the same five iterations unrolled as
CTEs) matches bit-for-bit. The deterministic truncation loses ≤1e-15
of mass per edge — irrelevant to ranking and identical in both engines.

Scale shape: each iteration is one hash shuffle of (node, contribution)
partials keyed by destination — O(edges) per iteration, map-side
combined. The 5 iterations compose into one lazy DAG here; at 100 TB
checkpoint per iteration exactly as ``neardup_clusters`` does
(localCheckpoint truncates lineage), and broadcast the out-degree table
if the node set fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.registry import Query
from simple_map_reduce_ruuner_spark.sources.tables import load_table

PR_ITERS = 5
SCALE_FEMTO = 10**15  # rank unit = 1e-15
DAMP_NUM, DAMP_DEN = 85, 100  # d = 0.85


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected bipartite trading edges: customer node 2k, supplier
    node 2k+1; one edge pair per distinct trading relationship."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    rev = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    return fwd.unionAll(rev)


def pagerank_trading(spark: SparkSession, sf_dir: str) -> DataFrame:
    # materialize the edge set once (localCheckpoint, same pattern as
    # neardup_clusters): every iteration joins against edges, and the
    # checkpoint guarantees the orders ⋈ lineitem ⋈ distinct subtree runs
    # once with bounded lineage instead of relying on exchange reuse
    edges = _edges(spark, sf_dir).localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = deg.select(F.col("src").alias("node"), "outdeg")
    n_nodes = nodes.select(F.count(F.lit(1)).alias("n"))

    # every node appears as src (undirected), so nodes == full node set
    ranks = nodes.join(F.broadcast(n_nodes)).select(
        "node",
        "outdeg",
        F.col("n"),
        F.expr(f"{SCALE_FEMTO} div n").alias("r"),
    )
    for _ in range(PR_ITERS):
        contrib = (
            ranks.join(edges, ranks.node == edges.src)
            .select("dst", F.expr("r div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(F.broadcast(n_nodes))
            .join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                "outdeg",
                "n",
                (
                    F.expr(f"({DAMP_NUM} * coalesce(s, 0)) div {DAMP_DEN}")
                    + F.expr(
                        f"({DAMP_DEN - DAMP_NUM} * {SCALE_FEMTO}) div ({DAMP_DEN} * n)"
                    )
                ).alias("r"),
            )
        )
    return ranks.select(
        F.col("node").cast("long").alias("node"),
        F.when(F.col("node") % 2 == 0, "customer").otherwise("supplier").alias(
            "node_type"
        ),
        F.expr("node div 2").cast("long").alias("entity_key"),
        F.col("outdeg").cast("long").alias("degree"),
        F.col("r").cast("long").alias("rank_femto"),
    )


def _pagerank_sql() -> str:
    base = f"""
WITH pairs AS (
    SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
    SELECT c AS src, s AS dst FROM pairs
    UNION ALL
    SELECT s AS src, c AS dst FROM pairs
),
deg AS (
    SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY src
),
nn AS (SELECT count(*) AS n FROM deg),
r0 AS (
    SELECT node, outdeg, n, {SCALE_FEMTO} // n AS r FROM deg, nn
)"""
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        base += f""",
c{i} AS (
    SELECT e.dst, SUM(p.r // p.outdeg) AS s
    FROM {prev} p JOIN edges e ON e.src = p.node
    GROUP BY e.dst
),
r{i} AS (
    SELECT d.node, d.outdeg, nn.n,
           ({DAMP_NUM} * coalesce(c{i}.s, 0)) // {DAMP_DEN}
               + ({DAMP_DEN - DAMP_NUM} * {SCALE_FEMTO}) // ({DAMP_DEN} * nn.n)
               AS r
    FROM deg d CROSS JOIN nn LEFT JOIN c{i} ON c{i}.dst = d.node
)"""
        prev = f"r{i}"
    base += f"""
SELECT CAST(node AS BIGINT) AS node,
       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
       CAST(node // 2 AS BIGINT) AS entity_key,
       CAST(outdeg AS BIGINT) AS degree,
       CAST(r AS BIGINT) AS rank_femto
FROM {prev}
"""
    return base


PAGERANK_TRADING_SQL = _pagerank_sql()


QUERIES: dict[str, Query] = {
    "pagerank_trading": Query(
        pagerank_trading,
        PAGERANK_TRADING_SQL,
        "5-iteration fixed-point PageRank on the customer-supplier graph",
    ),
}
