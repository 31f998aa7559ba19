#!/usr/bin/env python
"""Streaming 1000x decade probe (r13 verdict item 6): stateful tumbling
aggregation on RocksDB across 1x/10x/100x/1000x event counts, publishing
state size vs the watermark horizon.

Data shape: replica r of the sf0.1 events table shifts ts by
r * (span + 1 h) and offsets event ids — the time RANGE scales with the
data, which is the real streaming shape (a day of 1000x traffic is a
longer/denser stream, not the same 10 minutes replayed 1000 times).
Batch-replica tables (.scaledata) deliberately do NOT shift ts, so this
probe stages its own input. Files are range-partitioned on ts and given
strictly increasing mtimes so the file source replays them in event-time
order; the advancing watermark then expires windows as it goes — final
state row count must stay ~flat across decades while input grows 1000x.

Bound claim being tested: state = O(windows inside the watermark horizon
x event_types), NOT O(input rows). An unbounded aggregation would hold
every window ever seen (~29k windows/decade at 1000x vs the horizon's
handful).

Usage: python tools/stream_scale_probe.py [--decades 1,10,100,1000]
Writes STREAM_SCALE_1000X_r13.json at the repo root.
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.1"
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
# decade -> (n source files, files per trigger) => ~4-5 micro-batches
FILES = {1: (4, 1), 10: (8, 2), 100: (12, 3), 1000: (20, 5)}


def main() -> int:
    args = sys.argv[1:]
    decades = (
        [int(x) for x in args[args.index("--decades") + 1].split(",")]
        if "--decades" in args
        else [1, 10, 100, 1000]
    )

    from pyspark.sql import functions as F

    from simple_map_reduce_ruuner_spark.session import get_spark
    from simple_map_reduce_ruuner_spark.sources.tables import load_table
    from simple_map_reduce_ruuner_spark.streaming.windows import (
        stream_tumbling_counts,
    )

    spark = get_spark(
        app_name="smrr-stream-scale", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)

    ev = load_table(spark, SF_DIR, "events")
    base_rows = ev.count()
    bounds = ev.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    span_sec = int((bounds.hi - bounds.lo).total_seconds()) + 3600

    results = {}
    for k in decades:
        n_files, per_trigger = FILES[k]
        work = pathlib.Path(tempfile.mkdtemp(prefix=f"stream_scale_{k}x_"))
        src = work / "src"
        t_stage = time.perf_counter()
        scaled = (
            ev.crossJoin(F.broadcast(spark.range(k).withColumnRenamed("id", "r")))
            .withColumn("ts", F.col("ts") + (F.col("r") * span_sec).cast("long").cast("interval second"))
            .withColumn("event_id", F.col("event_id") + F.col("r") * F.lit(100_000_000))
            .withColumn("user_id", F.col("user_id") + F.col("r") * F.lit(100_000_000))
            .drop("r")
        )
        scaled.repartitionByRange(n_files, "ts").write.parquet(str(src))
        parts = sorted(src.glob("part-*.parquet"))
        assert len(parts) == n_files, (k, len(parts))
        flat = work / "flat"
        flat.mkdir()
        now = time.time()
        for i, p in enumerate(parts):  # strictly increasing mtimes, range order
            dst = flat / f"{i:04d}.parquet"
            p.rename(dst)
            os.utime(dst, (now + i, now + i))
        stage_sec = time.perf_counter() - t_stage

        ckpt = work / "ckpt"
        t0 = time.perf_counter()
        q = (
            stream_tumbling_counts(
                spark,
                str(flat),
                watermark="10 minutes",
                reader_options={"maxFilesPerTrigger": str(per_trigger)},
            )
            .writeStream.foreachBatch(
                lambda b, i: b.write.format("noop").mode("overwrite").save()
            )
            .outputMode("update")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(3600), f"{k}x did not finish in 3600s"
            wall = time.perf_counter() - t0
            progresses = q.recentProgress
        finally:
            if q.isActive:
                q.stop()
        n_rows = base_rows * k
        batches = len([p for p in progresses if p["numInputRows"] > 0])
        state = {}
        for p in reversed(progresses):
            ops = p.get("stateOperators") or []
            if ops:
                state = {
                    "state_rows": sum(o.get("numRowsTotal") or 0 for o in ops),
                    "state_memory_bytes": sum(
                        o.get("memoryUsedBytes") or 0 for o in ops
                    ),
                    "rocksdb_sst_bytes": sum(
                        (o.get("customMetrics") or {}).get("rocksdbSstFileSize") or 0
                        for o in ops
                    ),
                }
                break
        results[f"{k}x"] = {
            "input_rows": n_rows,
            "wall_sec": round(wall, 1),
            "rows_per_sec": round(n_rows / wall),
            "micro_batches": batches,
            "stage_sec": round(stage_sec, 1),
            **state,
        }
        print(f"{k}x: {results[f'{k}x']}", flush=True)
        shutil.rmtree(work, ignore_errors=True)

    ks = [k for k in decades if f"{k}x" in results]
    doc = {
        "query": "stream_tumbling_counts (watermarked tumbling agg, update mode)",
        "state_store_provider": "RocksDB",
        "base_sf_dir": SF_DIR,
        "base_rows": base_rows,
        "time_shift_per_replica_sec": span_sec,
        "decades": results,
        "state_growth_vs_input_growth": {
            "input_ratio": ks[-1] // ks[0],
            "state_rows_ratio": round(
                results[f"{ks[-1]}x"]["state_rows"]
                / max(1, results[f"{ks[0]}x"]["state_rows"]),
                2,
            ),
        },
        "method": (
            "time-shifted key-offset replicas (range scales with data), "
            "range-partitioned source files replayed in event-time order "
            "via strictly increasing mtimes + maxFilesPerTrigger, cold "
            "RocksDB checkpoint per decade, foreachBatch noop sink; state "
            "figures from the last progress with stateOperators"
        ),
    }
    path = REPO / "STREAM_SCALE_1000X_r13.json"
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
