#!/usr/bin/env python
"""Relational (TPC-H-shaped) 1000x decade probe — the one measured-scale
family gap left after r12/r13 (text dedup, embedding dedup, graph,
codecs, and streaming all carry 1000x decades in SCALE.md).

Data: lineitem + orders replicated 1000x with l_orderkey/o_orderkey
offset per replica (join keys stay consistent; fact cardinality scales),
dimensions kept at 1x — the facts-accumulate shape: per-group volumes
grow 1000x while the broadcast sides stay broadcastable, which is
exactly what the plans must survive. Staged once under
.scaledata/tpch1000x and reused on re-runs.

Queries (production registry code, unmodified):
- pricing_summary        — TPC-H Q1: the pure scan-aggregate yardstick
- forecast_revenue_delta — TPC-H Q6: predicate-pushdown yardstick
- revenue_by_nation      — broadcast-dim star join
- supplier_part_volume   — the no-broadcastable-side SMJ

Method (SCALE.md discipline): interleaved small/big reps, every rep
published, per_unit = big/small ratio / 1000; row-count equality checked
against the replication arithmetic.

Usage: python tools/scale_probe_1000x_tpch.py [--reps 2] [--k 1000]
Writes SCALE_CURVE_1000X_TPCH_r13.json at the repo root.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SMALL = "/root/testdata/sf0.1"
KEY_OFFSET = 100_000_000

COPY_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "events", "documents", "embeddings",
]


def stage(spark, big_dir: pathlib.Path, k: int) -> None:
    from pyspark.sql import functions as F

    from simple_map_reduce_ruuner_spark.sources.tables import load_table

    r = F.col("r")
    # repartition the SMALL side before the crossJoin (a 10 MB shuffle)
    # so replication runs 64-way and the 600M-row output writes straight
    # from the map side with no exchange
    li = load_table(spark, SMALL, "lineitem").repartition(64)
    (
        li.crossJoin(F.broadcast(spark.range(k).withColumnRenamed("id", "r")))
        .withColumn("l_orderkey", F.col("l_orderkey") + r * KEY_OFFSET)
        .drop("r")
        .write.parquet(str(big_dir / "lineitem.parquet"))
    )
    orders = load_table(spark, SMALL, "orders").repartition(32)
    (
        orders.crossJoin(F.broadcast(spark.range(k).withColumnRenamed("id", "r")))
        .withColumn("o_orderkey", F.col("o_orderkey") + r * KEY_OFFSET)
        .drop("r")
        .write.parquet(str(big_dir / "orders.parquet"))
    )
    for t in COPY_TABLES:
        load_table(spark, SMALL, t).write.parquet(str(big_dir / f"{t}.parquet"))


def main() -> int:
    args = sys.argv[1:]
    reps = int(args[args.index("--reps") + 1]) if "--reps" in args else 2
    k = int(args[args.index("--k") + 1]) if "--k" in args else 1000

    from simple_map_reduce_ruuner_spark.operators.relational import (
        pricing_summary,
        revenue_by_nation,
    )
    from simple_map_reduce_ruuner_spark.operators.relational2 import (
        supplier_part_volume,
    )
    from simple_map_reduce_ruuner_spark.operators.relational8 import (
        forecast_revenue_delta,
    )
    from simple_map_reduce_ruuner_spark.session import get_spark
    from simple_map_reduce_ruuner_spark.sources.tables import load_table

    spark = get_spark(app_name="smrr-tpch-1000x", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")

    big_dir = REPO / ".scaledata" / f"tpch{k}x"
    if not (big_dir / "lineitem.parquet").exists():
        t0 = time.perf_counter()
        stage(spark, big_dir, k)
        print(f"staged {big_dir} in {time.perf_counter() - t0:.0f}s", flush=True)
    n_small = load_table(spark, SMALL, "lineitem").count()
    n_big = load_table(spark, str(big_dir), "lineitem").count()
    assert n_big == n_small * k, (n_big, n_small, k)

    queries = {
        "pricing_summary": pricing_summary,
        "forecast_revenue_delta": forecast_revenue_delta,
        "revenue_by_nation": revenue_by_nation,
        "supplier_part_volume": supplier_part_volume,
    }

    out: dict[str, dict] = {q: {"small": [], "big": []} for q in queries}
    for rep in range(reps):
        for name, fn in queries.items():
            for arm, d in (("small", SMALL), ("big", str(big_dir))):
                t0 = time.perf_counter()
                n = fn(spark, d).count()
                wall = time.perf_counter() - t0
                out[name][arm].append(round(wall, 2))
                out[name][f"rows_{arm}"] = n
                print(f"rep {rep} {name} {arm}: {wall:.2f}s rows={n:,}", flush=True)

    med = lambda xs: sorted(xs)[len(xs) // 2]
    summary = {}
    for name, d in out.items():
        ratio = med(d["big"]) / med(d["small"])
        summary[name] = {
            **d,
            "ratio": round(ratio, 1),
            "per_unit": round(ratio / k, 3),
        }

    doc = {
        "data_scale": k,
        "lineitem_rows": {"small": n_small, "big": n_big},
        "dims": "kept at 1x (facts-accumulate shape; broadcast sides stay broadcastable)",
        "queries": summary,
        "method": (
            f"lineitem+orders replicated {k}x with per-replica orderkey "
            "offsets (join keys consistent); interleaved small/big reps, "
            "every rep published; per_unit = ratio / scale"
        ),
    }
    path = REPO / f"SCALE_CURVE_1000X_TPCH_r13.json"
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(f"wrote {path}")
    for name, s in summary.items():
        print(f"  {name}: ratio {s['ratio']} per_unit {s['per_unit']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
