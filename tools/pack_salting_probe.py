#!/usr/bin/env python
"""Measure salted vs unsalted sequence packing at sf0.1 and 10x
(r11 verdict item 7: SCALE.md's packing row moves from recipe to
measurement).

The unsalted packer's sort partition is per-LANGUAGE: at 10x each lang
partition holds ~12.5k docs and keeps growing linearly with the corpus
— the one unbounded piece of the training-assembly suite. The salted
twin bounds every sort partition at S=256 docs regardless of scale.
Interleaved cold-ish reps (noop sink, codegen pre-warmed); every rep
published.

Writes PACK_SALTING_r12.json at the repo root.
"""
from __future__ import annotations

import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SMALL = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG = str(REPO / ".scaledata" / "sf1")
WARM = "/root/testdata/sf0.001"
REPS = 4


def main() -> None:
    from pyspark.sql import SparkSession

    from simple_map_reduce_ruuner_spark.operators.training import (
        sequence_pack_bins,
        sequence_pack_bins_salted,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .appName("pack-salting-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    shapes = {"plain": sequence_pack_bins, "salted": sequence_pack_bins_salted}
    for fn in shapes.values():  # codegen warmup
        fn(spark, WARM).write.format("noop").mode("overwrite").save()

    out = {}
    for scale, d in (("sf0.1", SMALL), ("10x", BIG)):
        traces = {k: [] for k in shapes}
        for _ in range(REPS):
            for k, fn in shapes.items():
                t0 = time.monotonic()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                traces[k].append(round(time.monotonic() - t0, 3))
        med = {k: sorted(v)[len(v) // 2] for k, v in traces.items()}
        out[scale] = {
            "traces": traces,
            "medians": med,
            "salted_over_plain": round(med["salted"] / med["plain"], 3),
        }
        print(scale, out[scale], flush=True)

    doc = {
        "small_dir": SMALL,
        "big_dir": BIG,
        "reps": REPS,
        "scales": out,
        "note": (
            "single-node local[32]: the salted win here is parallelism "
            "(many bounded sort partitions vs one per lang); at 100 TB "
            "the unsalted form is not merely slow but un-runnable — a "
            "per-lang partition exceeds executor memory — so the salted "
            "twin is the production path and this row is its cost/parity "
            "check at small scale"
        ),
    }
    with open(REPO / "PACK_SALTING_r12.json", "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print("wrote PACK_SALTING_r12.json")
    spark.stop()


if __name__ == "__main__":
    main()
