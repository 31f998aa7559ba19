"""Range-clustered layout: plan shape + the skipping property itself.

The write must cost exactly one exchange (RangePartitioning) with local
sorts, and the files it produces must carry pairwise-disjoint footer
ranges — the property a 100 TB scan uses to open only the files whose
range intersects the predicate."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.plans.layout import (
    key_ranges,
    range_clustered_plan,
    ranges_disjoint,
    write_range_clustered,
)
from simple_map_reduce_ruuner_spark.sources.tables import load_table

N_FILES = 8


def test_range_cluster_plan_one_exchange_no_global_sort(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    plan = (
        range_clustered_plan(orders, "o_orderdate", N_FILES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" in plan.lower()
    # the sort is per-partition (global=false in the Sort operator)
    assert "Sort [o_orderdate" in plan and "false, 0" in plan, plan[:1500]


def test_range_cluster_files_have_disjoint_ranges(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_by_date")
    write_range_clustered(orders, out, "o_orderdate", N_FILES)

    ranges = key_ranges(out, "o_orderdate")
    assert len(ranges) >= 2  # actually split across files
    assert ranges_disjoint(ranges), ranges

    # row preservation
    n = spark.read.parquet(out).count()
    assert n == orders.count()


def test_arrival_order_layout_does_not_skip(spark, sf_dir, tmp_path):
    """Control: the same data round-robin-partitioned (arrival-order
    proxy) gives every file a near-global range — no skipping possible.
    This is the negative that makes the positive test meaningful."""
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_roundrobin")
    orders.repartition(N_FILES).write.mode("overwrite").parquet(out)

    ranges = key_ranges(out, "o_orderdate")
    assert len(ranges) >= 2
    assert not ranges_disjoint(ranges), ranges


def test_point_filter_prunes_to_boundary_files(spark, sf_dir, tmp_path):
    """A tight date predicate over the clustered layout must touch only
    the files whose footer range intersects it."""
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_pruned")
    write_range_clustered(orders, out, "o_orderdate", N_FILES)

    ranges = key_ranges(out, "o_orderdate")
    lo = min(r[0] for r in ranges)
    intersecting = sum(1 for r in ranges if r[0] <= lo <= r[1])
    assert intersecting == 1  # a min-key point predicate maps to ONE file

    got = (
        spark.read.parquet(out)
        .where(F.col("o_orderdate") == F.lit(lo))
        .count()
    )
    want = orders.where(F.col("o_orderdate") == F.lit(lo)).count()
    assert got == want and got > 0


def test_zorder_gives_both_dimensions_locality(spark, sf_dir, tmp_path):
    """Z-ordered files must each cover a small slice of BOTH columns;
    the single-key control gives the second column no locality at all."""
    from simple_map_reduce_ruuner_spark.plans.layout import write_zordered

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_day", F.datediff("o_orderdate", F.lit("1995-01-01").cast("timestamp"))
    )

    zpath = str(tmp_path / "orders_z")
    write_zordered(orders, zpath, "o_custkey", "o_day", 16)

    def span_fracs(path, col):
        rs = key_ranges(path, col)
        glo = min(r[0] for r in rs)
        ghi = max(r[1] for r in rs)
        width = (ghi - glo) or 1
        return sorted((hi - lo) / width for lo, hi in rs)

    z_cust = span_fracs(zpath, "o_custkey")
    z_day = span_fracs(zpath, "o_day")

    def median(xs):
        return xs[len(xs) // 2]

    # each file covers a narrow slice of BOTH dimensions
    assert median(z_cust) <= 0.5, z_cust
    assert median(z_day) <= 0.5, z_day

    # row preservation
    assert spark.read.parquet(zpath).count() == orders.count()

    # control: range-cluster by custkey only → o_day has no locality
    cpath = str(tmp_path / "orders_cust_only")
    write_range_clustered(orders, cpath, "o_custkey", 16)
    c_day = span_fracs(cpath, "o_day")
    assert median(c_day) >= 0.8, c_day
