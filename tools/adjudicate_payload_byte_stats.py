#!/usr/bin/env python
"""Isolated interleaved 8-rep adjudication for `payload_byte_stats`
(BENCH_r11 vs_r01 plain = 1.99, the closest row to the 2x gate).

Method (the one that closed window_showcase / embedding_norms in r11):
one fresh plain SparkSession, both the CURRENT query shape (vectorized
numpy kernel, commit c05b7f8) and the R01-ERA shape (per-row Python
`sum(b)`/`max(b)` over each payload, commit 07d21d5) executed
alternately A,B,A,B,... for 8 timed reps each at sf0.1 through the same
noop sink bench.py uses, after one sf0.001 codegen warmup per shape.
Interleaving means any machine-wide slowdown (CPU steal) hits both
shapes equally; the paired medians isolate the code delta.

Run on a QUIET machine. Prints a JSON line with both traces.
"""
from __future__ import annotations

import json
import os
import sys
import time
from typing import Iterator

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from simple_map_reduce_ruuner_spark.operators.multimodal import (
    _with_payload,
    payload_byte_stats,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"
REPS = 8


def payload_byte_stats_r01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim r01-era kernel (git show 07d21d5:operators/multimodal.py):
    per-row Python sum/max over each payload's bytes."""
    df = _with_payload(spark, sf_dir)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n = payloads.map(len)
            tot = payloads.map(lambda b: sum(b))
            mx = payloads.map(lambda b: max(b) if len(b) else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("int64"),
                    "sum_bytes": tot.astype("int64"),
                    "max_byte": mx.astype("int64"),
                }
            )

    out = df.mapInPandas(
        stats, "doc_id long, n_bytes long, sum_bytes long, max_byte long"
    )
    return out.withColumn(
        "mean_byte",
        F.round(
            F.when(F.col("n_bytes") == 0, F.lit(0.0)).otherwise(
                F.col("sum_bytes") / F.col("n_bytes")
            ),
            6,
        ),
    )


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .appName("adjudicate-payload-byte-stats")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    shapes = {"current": payload_byte_stats, "r01": payload_byte_stats_r01}
    for fn in shapes.values():  # codegen warmup, untimed
        fn(spark, WARM_DIR).write.format("noop").mode("overwrite").save()

    traces: dict[str, list[float]] = {k: [] for k in shapes}
    for _ in range(REPS):
        for key, fn in shapes.items():
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            traces[key].append(round(time.monotonic() - t0, 3))

    med = {
        k: sorted(v)[len(v) // 2 - 1 : len(v) // 2 + 1] for k, v in traces.items()
    }
    medians = {k: round(sum(v) / 2, 3) for k, v in med.items()}
    doc = {
        "query": "payload_byte_stats",
        "sf_dir": SF_DIR,
        "reps": REPS,
        "traces": traces,
        "medians": medians,
        "current_over_r01": round(medians["current"] / medians["r01"], 3),
    }
    print(json.dumps(doc))
    spark.stop()


if __name__ == "__main__":
    main()
