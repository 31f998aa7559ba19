#!/usr/bin/env python
"""Measure what bucketing buys on the repeated fact⋈fact join
(lineitem ⋈ orders on orderkey) at sf0.1 — r11 verdict item 3 turns
SCALE.md's "bucketBy would remove the per-query exchange" sentence into
a number.

Method: write orders+lineitem ONCE as bucketed+sorted external tables
(32 buckets on the join key, the write cost is reported — at 100 TB it
amortizes over every subsequent join), then run the same join+aggregate
through (a) the plain parquet scan path and (b) the bucketed tables,
interleaved A,B,A,B for REPS timed reps each through the noop sink.
autoBroadcastJoinThreshold is disabled: at sf0.1 orders would broadcast
and hide the shuffle, but at 100 TB neither side broadcasts — the SMJ
with per-query exchanges IS the production plan being bucketed away.
Exchange counts for both plans are recorded so the artifact carries the
plan proof next to the timing.

Writes BUCKETED_JOIN_r12.json at the repo root.
"""
from __future__ import annotations

import json
import os
import pathlib
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, SparkSession, functions as F

from simple_map_reduce_ruuner_spark.plans.bucketing import write_bucketed_table
from simple_map_reduce_ruuner_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 5
N_BUCKETS = 32


def _join_agg(li: DataFrame, orders: DataFrame) -> DataFrame:
    """The repeated-join shape: fact⋈fact on orderkey, then a tiny
    post-join rollup so the noop sink sees few rows and the measured
    work is the join itself."""
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .appName("bucketed-join-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderpriority"
    )

    tmp = tempfile.mkdtemp(prefix="smrr-bucketed-")
    t0 = time.monotonic()
    write_bucketed_table(
        li, "li_bkt_probe", ["l_orderkey"], N_BUCKETS,
        sort_keys=["l_orderkey"], path=f"{tmp}/li",
    )
    write_bucketed_table(
        orders, "ord_bkt_probe", ["o_orderkey"], N_BUCKETS,
        sort_keys=["o_orderkey"], path=f"{tmp}/ord",
    )
    write_sec = round(time.monotonic() - t0, 3)

    paths = {
        "plain": lambda: _join_agg(li, orders),
        "bucketed": lambda: _join_agg(
            spark.table("li_bkt_probe"), spark.table("ord_bkt_probe")
        ),
    }
    exchanges = {
        k: fn()._jdf.queryExecution().executedPlan().toString().count("Exchange")
        for k, fn in paths.items()
    }

    for fn in paths.values():  # codegen warmup, untimed
        fn().write.format("noop").mode("overwrite").save()

    traces: dict[str, list[float]] = {k: [] for k in paths}
    for _ in range(REPS):
        for k, fn in paths.items():
            t = time.monotonic()
            fn().write.format("noop").mode("overwrite").save()
            traces[k].append(round(time.monotonic() - t, 3))

    med = {k: sorted(v)[len(v) // 2] for k, v in traces.items()}
    doc = {
        "sf_dir": SF_DIR,
        "n_buckets": N_BUCKETS,
        "reps": REPS,
        "bucketed_write_sec_once": write_sec,
        "exchanges": exchanges,
        "traces": traces,
        "medians": med,
        "bucketed_over_plain": round(med["bucketed"] / med["plain"], 3),
        "note": (
            "broadcast disabled so the sf0.1 plan matches the 100 TB SMJ "
            "shape; the one-time bucketed write amortizes across every "
            "repeated join on the key"
        ),
    }
    spark.sql("DROP TABLE IF EXISTS li_bkt_probe")
    spark.sql("DROP TABLE IF EXISTS ord_bkt_probe")
    print(json.dumps(doc))
    with open(REPO / "BUCKETED_JOIN_r12.json", "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
