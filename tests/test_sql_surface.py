"""Spark 4 SQL-surface coverage: pipe syntax and parameterized queries.

These are syntax/API features (the execution plans are identical to the
classic formulations), so they are pinned by equivalence tests rather
than registry entries — a registry twin would re-verify the same plan
under a different spelling.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.operators import relational
from simple_map_reduce_ruuner_spark.sources.tables import load_table


def test_pipe_syntax_equals_dataframe_plan(spark, sf_dir):
    """SQL pipe syntax (|>) spelling of the Q1-shape pricing summary
    must produce the same rows AND the same physical plan family as the
    DataFrame API version."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_pipe")
    piped = spark.sql(
        """
        FROM li_pipe
        |> WHERE l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'
        |> AGGREGATE
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,6))), 2) AS DOUBLE)
                 AS sum_qty,
             CAST(count(*) AS BIGINT) AS count_order
           GROUP BY l_returnflag, l_linestatus
        """
    )
    li = load_table(spark, sf_dir, "lineitem")
    classic = (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(relational.dsum(F.col("l_quantity")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )
    key = lambda r: (r["l_returnflag"], r["l_linestatus"])  # noqa: E731
    assert sorted(piped.collect(), key=key) == sorted(classic.collect(), key=key)
    plan = piped._jdf.queryExecution().executedPlan().toString()
    # same plan family: pruned scan + partial/final hash aggregate
    assert "HashAggregate" in plan and "partial_sum" in plan
    assert "PushedFilters" in plan


def test_parameterized_sql_named_and_positional(spark, sf_dir):
    """spark.sql(args=...) — named and positional parameter binding must
    behave like inlined literals (and still push the predicate down)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_param")
    named = spark.sql(
        "SELECT count(*) AS n FROM ord_param WHERE o_orderpriority = :prio",
        args={"prio": "1-URGENT"},
    )
    positional = spark.sql(
        "SELECT count(*) AS n FROM ord_param WHERE o_orderpriority = ?",
        args=["1-URGENT"],
    )
    inlined = spark.sql(
        "SELECT count(*) AS n FROM ord_param WHERE o_orderpriority = '1-URGENT'"
    )
    want = inlined.collect()[0]["n"]
    assert named.collect()[0]["n"] == want
    assert positional.collect()[0]["n"] == want
    assert want > 0
    plan = named._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderpriority" in plan


def test_pandas_on_spark_api_matches_native(spark, sf_dir):
    """pyspark.pandas (the drop-in pandas API): a groupby-agg written in
    pandas idiom must distribute through the same engine and agree with
    the native DataFrame result — the migration surface for pandas-first
    users of the reference's workloads."""
    import warnings

    import pyspark.pandas as ps
    from pyspark.sql import functions as F

    from simple_map_reduce_ruuner_spark.sources.tables import load_table

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        psdf = ps.read_parquet(f"{sf_dir}/orders.parquet")
        got = (
            psdf.groupby("o_orderstatus")["o_totalprice"]
            .count()
            .sort_index()
            .to_pandas()
            .to_dict()
        )
    native = {
        r.o_orderstatus: r.n
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == native and len(got) == 3


def test_part_tree_revenue_matches_python_walk(spark, sf_dir):
    """part_tree_revenue's oracle is the SAME SQL text on both engines
    (dialect-shared recursion), so engine agreement alone cannot catch a
    wrong formulation — this check re-derives the rollup independently:
    exact-cent leaf sums in Python big-ints walked up the digit tree."""
    import pyarrow.parquet as pq

    from simple_map_reduce_ruuner_spark.operators.sql4 import part_tree_revenue

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_extendedprice"]
    )
    leaf_cents: dict[int, int] = {}
    for pk, price in zip(
        t["l_partkey"].to_pylist(), t["l_extendedprice"].to_pylist()
    ):
        leaf_cents[pk] = leaf_cents.get(pk, 0) + round(price * 100)
    rolled: dict[int, list] = {}
    for pk, cents in leaf_cents.items():
        node = pk
        while True:
            agg = rolled.setdefault(node, [0, 0])
            agg[0] += 1
            agg[1] += cents
            if node < 10:
                break
            node //= 10
    got = {
        r.node: (r.n_parts, r.subtree_revenue)
        for r in part_tree_revenue(spark, sf_dir).collect()
    }
    expected = {
        node: (n, cents / 100) for node, (n, cents) in rolled.items()
    }
    assert got == expected


def test_part_hierarchy_rollup_matches_digit_arithmetic(spark, sf_dir):
    """Same dialect-shared-oracle caveat as the tree rollup: verify the
    structural walk against plain digit arithmetic (root = leading
    digit, depth = digits − 1)."""
    from simple_map_reduce_ruuner_spark.operators.sql4 import (
        part_hierarchy_rollup,
    )

    rows = part_hierarchy_rollup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        s = str(r.p_partkey)
        assert (r.root, r.depth) == (int(s[0]), len(s) - 1), r
