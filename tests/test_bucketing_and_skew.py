"""Bucketed joins eliminate the per-query exchange; salted rewrites are
result-identical to their unsalted forms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.plans.bucketing import (
    read_table,
    write_bucketed_table,
)
from simple_map_reduce_ruuner_spark.plans.skew import salted_aggregate, salted_join
from simple_map_reduce_ruuner_spark.sources.tables import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")

    write_bucketed_table(
        li, "li_bkt", ["l_orderkey"], 8,
        sort_keys=["l_orderkey"], path=str(tmp_path / "li_bkt"),
    )
    write_bucketed_table(
        orders, "ord_bkt", ["o_orderkey"], 8,
        sort_keys=["o_orderkey"], path=str(tmp_path / "ord_bkt"),
    )

    # disable broadcast so the join must consider partitioning
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bkt = read_table(spark, "li_bkt").join(
            read_table(spark, "ord_bkt"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan_bkt = bkt._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan_bkt, plan_bkt

        plain = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        plan_plain = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan_plain

        # identical results either way
        assert bkt.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS ord_bkt")


def test_salted_aggregate_equals_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    salted = salted_aggregate(
        ev, ["event_type"], {"cnt": "count(*)", "mx": "max(value)"}, n_salts=8
    )
    got = {(r.event_type, r.cnt, r.mx) for r in salted.collect()}
    plain = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("value").alias("mx")
    )
    expected = {(r.event_type, r.cnt, r.mx) for r in plain.collect()}
    assert got == expected


def test_salted_join_equals_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    salted = salted_join(orders, customer.select("custkey", "c_name"), "custkey", 8)
    plain = orders.join(customer.select("custkey", "c_name"), "custkey")
    got = {(r.o_orderkey, r.c_name) for r in salted.select("o_orderkey", "c_name").collect()}
    expected = {
        (r.o_orderkey, r.c_name) for r in plain.select("o_orderkey", "c_name").collect()
    }
    assert got == expected


def test_salted_aggregate_rejects_non_algebraic(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_aggregate(ev, ["event_type"], {"a": "avg(value)"})


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's runtime skew-join split — the automatic complement to the
    manual salting above. A 90%-hot key would pin one reducer in a plain
    sort-merge join; with skew-join enabled AQE splits the oversized
    partition at runtime (SortMergeJoin(skew=true) + AQEShuffleRead
    skewed in the final plan). Thresholds are lowered so the split fires
    at test scale; production keeps the defaults."""
    from pyspark.sql import functions as F

    conf = spark.conf
    keys = [
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.shuffle.partitions",
    ]
    saved = {k: conf.get(k, None) for k in keys}
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.shuffle.partitions", "8")

        big = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        small = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        joined = big.join(small, "k")
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
