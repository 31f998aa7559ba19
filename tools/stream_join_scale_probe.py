#!/usr/bin/env python
"""Stream-stream interval join decade probe (r13 verdict item 7).

`stream_clicks_before_errors` (streaming/joins.py) buffers BOTH sides
in the state store; the watermark + the 10-minute range condition is
what lets Spark prune a click once it can no longer match any future
error. That retention bound is the classic 100 TB streaming risk — an
unpruned stream-stream join holds every row ever seen. This probe
makes the bound measured, not claimed, the same way the r13 stateful-
aggregation decade did (STREAM_SCALE_1000X_r13.json):

- time-shifted key-offset replicas: replica r shifts ts by
  r*(span+1h) and offsets user/event ids, so the time RANGE scales
  with the data (event density per hour stays constant) and no joins
  cross replicas;
- range-partitioned source files with strictly increasing mtimes so
  the file source replays event-time order and the watermark advances
  (random arrival would buffer everything — a property of staging,
  not of the join);
- cold RocksDB checkpoint per run; join OUTPUT counted in foreachBatch
  and cross-checked against the BATCH inner join over the same staged
  parquet (the stream/batch equivalence contract from
  tests/test_streaming.py, held at every decade).

Two arms per decade where tractable: a THROUGHPUT arm (~4-5 micro-
batches, rows/s) and a HORIZON arm holding rows-per-micro-batch at the
1x level. Peak join state is f(rows-per-batch + watermark-horizon
rows) because an availableNow micro-batch admits its whole input
before the watermark advances — so the throughput arm's peak tracks
batch sizing (a trigger-interval choice at a real deployment, not a
function of corpus size), and the horizon arm is the apples-to-apples
flat-peak evidence. Final state after the stream drains is the pure
watermark bound in both arms.

Usage: python tools/stream_join_scale_probe.py [--decades 1,10,100,1000]
Writes STREAM_JOIN_SCALE_1000X_r14.json at the repo root.
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
ARMS = {
    1: [("throughput", 4, 1), ("horizon", 4, 1)],
    10: [("throughput", 8, 2), ("horizon", 40, 1)],
    100: [("throughput", 12, 3)],
    1000: [("throughput", 20, 5)],
}


def run_one(spark, ev, base_rows, span_sec, k, arm, n_files, per_trigger, results):
    from pyspark.sql import functions as F

    from simple_map_reduce_ruuner_spark.streaming.joins import (
        stream_clicks_before_errors,
    )

    work = pathlib.Path(tempfile.mkdtemp(prefix=f"stream_join_{k}x_{arm}_"))
    src = work / "src"
    t_stage = time.perf_counter()
    scaled = (
        ev.crossJoin(F.broadcast(spark.range(k).withColumnRenamed("id", "r")))
        .withColumn(
            "ts",
            F.col("ts")
            + (F.col("r") * span_sec).cast("long").cast("interval second"),
        )
        .withColumn(
            "event_id", F.col("event_id") + F.col("r") * F.lit(100_000_000)
        )
        .withColumn(
            "user_id", F.col("user_id") + F.col("r") * F.lit(100_000_000)
        )
        .drop("r")
    )
    scaled.repartitionByRange(n_files, "ts").write.parquet(str(src))
    parts = sorted(src.glob("part-*.parquet"))
    assert len(parts) == n_files, (k, arm, len(parts))
    flat = work / "flat"
    flat.mkdir()
    now = time.time()
    for i, p in enumerate(parts):
        dst = flat / f"{i:04d}.parquet"
        p.rename(dst)
        os.utime(dst, (now + i, now + i))
    stage_sec = time.perf_counter() - t_stage

    # batch anchor: the same inner range join over the staged files
    st = spark.read.parquet(str(flat))
    errors_b = st.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"),
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
    )
    clicks_b = st.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    batch_matches = errors_b.join(
        clicks_b,
        (F.col("e_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("error_ts"))
        & (
            F.col("click_ts")
            >= F.col("error_ts") - F.expr("INTERVAL 10 MINUTES")
        ),
    ).count()

    out_count = {"n": 0}

    def sink(b, _i, _c=out_count):
        _c["n"] += b.count()

    ckpt = work / "ckpt"
    t0 = time.perf_counter()
    q = (
        stream_clicks_before_errors(
            spark,
            str(flat),
            reader_options={"maxFilesPerTrigger": str(per_trigger)},
        )
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(3600), f"{k}x/{arm} did not finish in 3600s"
        wall = time.perf_counter() - t0
        progresses = q.recentProgress
    finally:
        if q.isActive:
            q.stop()
    n_rows = base_rows * k
    batches = len([p for p in progresses if p["numInputRows"] > 0])
    state: dict = {}
    peak_state_rows = 0
    for p in progresses:
        ops = p.get("stateOperators") or []
        if ops:
            rows = sum(o.get("numRowsTotal") or 0 for o in ops)
            peak_state_rows = max(peak_state_rows, rows)
    for p in reversed(progresses):
        ops = p.get("stateOperators") or []
        if ops:
            state = {
                "state_rows_final": sum(
                    o.get("numRowsTotal") or 0 for o in ops
                ),
                "state_rows_peak": peak_state_rows,
                "state_memory_bytes": sum(
                    o.get("memoryUsedBytes") or 0 for o in ops
                ),
            }
            break
    results[f"{k}x_{arm}"] = {
        "input_rows": n_rows,
        "rows_per_micro_batch": n_rows // max(1, (n_files // per_trigger)),
        "join_output_rows": out_count["n"],
        "batch_join_rows": batch_matches,
        "stream_equals_batch": out_count["n"] == batch_matches,
        "wall_sec": round(wall, 1),
        "rows_per_sec": round(n_rows / wall),
        "micro_batches": batches,
        "stage_sec": round(stage_sec, 1),
        **state,
    }
    print(f"{k}x/{arm}: {results[f'{k}x_{arm}']}", flush=True)
    shutil.rmtree(work, ignore_errors=True)


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

    spark = get_spark(
        app_name="smrr-stream-join-scale",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)

    ev = load_table(spark, SF_DIR, "events")
    base_rows = ev.count()
    bounds = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    span_sec = int((bounds.hi - bounds.lo).total_seconds()) + 3600

    results: dict = {}
    for k in decades:
        for arm, n_files, per_trigger in ARMS[k]:
            run_one(
                spark, ev, base_rows, span_sec, k, arm, n_files,
                per_trigger, results,
            )

    doc = {
        "query": "stream_clicks_before_errors (watermarked stream-stream "
        "interval join, append mode)",
        "state_store_provider": "RocksDB",
        "base_sf_dir": SF_DIR,
        "base_rows": base_rows,
        "time_shift_per_replica_sec": span_sec,
        "runs": results,
        "bound_claims": {
            "final_state_is_watermark_bound": sorted(
                {
                    name: r["state_rows_final"]
                    for name, r in results.items()
                }.items()
            ),
            "horizon_arm_peak_vs_input": {
                name: r["state_rows_peak"]
                for name, r in results.items()
                if name.endswith("_horizon")
            },
        },
        "method": (
            "same staging recipe as STREAM_SCALE_1000X_r13: time-shifted "
            "key-offset replicas, event-time file order, cold RocksDB "
            "checkpoint per run; join output counted in foreachBatch and "
            "cross-checked against the batch inner join per run; horizon "
            "arm holds rows-per-micro-batch at the 1x level so peak state "
            "is compared apples-to-apples"
        ),
    }
    path = REPO / "STREAM_JOIN_SCALE_1000X_r14.json"
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
