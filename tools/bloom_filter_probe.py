#!/usr/bin/env python
"""Measure Spark's runtime bloom-filter join pruning (AQE injected
filter) on the selective-dim SMJ shape — the 100 TB lever SCALE.md's
skew/AQE section hadn't evidenced yet.

Shape: lineitem ⋈ orders(orderkey) with a selective filter on orders
(~URGENT + one quarter ≈ a few % of orders survive). Broadcast is
DISABLED (threshold -1): at 100 TB neither side broadcasts, and the
point of the runtime bloom filter is exactly this regime — Spark
builds a bloom filter from the filtered build side and applies it to
the probe side BEFORE the shuffle, cutting shuffle write/read by the
join selectivity.

The stock thresholds are sized for clusters
(applicationSideScanSizeThreshold = 10 GB), so the probe lowers them to
fire at the local 20x dataset — the same emulate-the-regime move as the
skew-split probe (SKEW_SPLIT_r13.json), documented rather than hidden.
A/B arms are interleaved, toggling ONLY
spark.sql.optimizer.runtime.bloomFilter.enabled; row counts asserted
equal; the ON arm's final plan must contain might_contain (the applied
filter) and bloom_filter_agg (the build).

Usage: python tools/bloom_filter_probe.py [--out BLOOM_FILTER_r13.json]
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

SMALL = "/root/testdata/sf0.1"
PROBE_DIR = REPO / ".scaledata" / "tpch20"
K = 20
REPS = 4


def ensure_data() -> None:
    import pyarrow.parquet as pq

    from make_scale_data import _replica

    PROBE_DIR.mkdir(parents=True, exist_ok=True)
    for table in ("lineitem", "orders"):
        dst = PROBE_DIR / f"{table}.parquet"
        if dst.exists():
            print(f"{dst} present, reusing")
            continue
        src = pq.read_table(os.path.join(SMALL, f"{table}.parquet"))
        with pq.ParquetWriter(dst, src.schema) as writer:
            for i in range(K):
                writer.write_table(_replica(table, src, i))
        print(f"wrote {dst}: {src.num_rows} -> {src.num_rows * K} rows")


def main() -> int:
    args = sys.argv[1:]
    out_name = (
        args[args.index("--out") + 1]
        if "--out" in args
        else "BLOOM_FILTER_r13.json"
    )
    ensure_data()

    from pyspark.sql import functions as F

    from simple_map_reduce_ruuner_spark.session import get_spark

    spark = get_spark(app_name="smrr-bloom-probe")
    spark.sparkContext.setLogLevel("ERROR")
    conf = spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    # fire at local scale: the stock application-side threshold (10 GB)
    # is a cluster number; the mechanism under test is unchanged
    conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "10MB",
    )
    conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "100MB",
    )

    li = spark.read.parquet(str(PROBE_DIR / "lineitem.parquet"))
    orders = spark.read.parquet(str(PROBE_DIR / "orders.parquet"))

    def query():
        sel = orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("1997-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-04-01"))
        )
        return (
            li.join(sel, li.l_orderkey == sel.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("l_extendedprice").alias("rev"),
            )
        )

    def shuffle_metrics(df) -> list[dict]:
        """Per-Exchange records/bytes from the executed plan's
        SQLMetrics (AQE query stages unwrapped)."""
        rows: list[dict] = []

        def walk(node):
            name = node.nodeName()
            if name == "AdaptiveSparkPlan":
                walk(node.executedPlan())
                return
            if "QueryStage" in name:
                walk(node.plan())
                return
            if "Exchange" in name:
                mets = {}
                it = node.metrics().iterator()
                while it.hasNext():
                    kv = it.next()
                    mets[kv._1()] = kv._2().value()
                rows.append(
                    {
                        "records": mets.get("shuffleRecordsWritten"),
                        "bytes": mets.get("dataSize"),
                    }
                )
            ch = node.children().iterator()
            while ch.hasNext():
                walk(ch.next())

        walk(df._jdf.queryExecution().executedPlan())
        return rows

    def run(enabled: bool) -> tuple[float, int, list[dict]]:
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", str(enabled).lower()
        )
        df = query()
        t0 = time.perf_counter()
        rows = df.collect()
        dt = time.perf_counter() - t0
        return dt, sum(r["n"] for r in rows), shuffle_metrics(df)

    run(True)  # warm codegen/page cache
    run(False)

    on_times, off_times, counts = [], [], set()
    on_shuffle = off_shuffle = None
    for _ in range(REPS):  # interleaved A/B
        t, n, on_shuffle = run(True)
        on_times.append(round(t, 3))
        counts.add(n)
        t, n, off_shuffle = run(False)
        off_times.append(round(t, 3))
        counts.add(n)
    assert len(counts) == 1, counts
    probe_on = max(m["records"] for m in on_shuffle)
    probe_off = max(m["records"] for m in off_shuffle)

    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    plan_on = query()._jdf.queryExecution().executedPlan().toString()
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    plan_off = query()._jdf.queryExecution().executedPlan().toString()

    evidence = {
        "on_has_might_contain": "might_contain" in plan_on,
        "on_has_bloom_agg": "bloom_filter_agg" in plan_on,
        "off_has_might_contain": "might_contain" in plan_off,
    }
    med = lambda xs: sorted(xs)[len(xs) // 2]
    doc = {
        "data_dir": str(PROBE_DIR),
        "scale_vs_sf01": K,
        "join_rows": counts.pop(),
        "reps": REPS,
        "on_times": on_times,
        "off_times": off_times,
        "median_on": med(on_times),
        "median_off": med(off_times),
        "speedup": round(med(off_times) / med(on_times), 2),
        "shuffle_exchanges_on": on_shuffle,
        "shuffle_exchanges_off": off_shuffle,
        "probe_side_shuffle_records_on": probe_on,
        "probe_side_shuffle_records_off": probe_off,
        "shuffle_records_pruned_x": round(probe_off / max(probe_on, 1), 1),
        "plan_evidence": evidence,
        "thresholds_adjusted": {
            "applicationSideScanSizeThreshold": "10MB (LOWERED from stock 10GB)",
            "creationSideThreshold": "100MB (RAISED from stock 10MB so the"
            " filtered build side still qualifies to create the filter)",
        },
        "note": (
            "broadcast disabled (-1) to force the 100 TB SMJ shape; "
            "bloom filter prunes probe-side rows BEFORE the shuffle, "
            "so the win scales with join selectivity and shuffle cost"
        ),
    }
    print(json.dumps(doc, indent=2))
    assert evidence["on_has_might_contain"], "bloom filter did not fire"
    assert not evidence["off_has_might_contain"]
    (REPO / out_name).write_text(json.dumps(doc, indent=2) + "\n")
    print("wrote", REPO / out_name)
    return 0


if __name__ == "__main__":
    sys.exit(main())
