#!/usr/bin/env python
"""Structured Streaming throughput probe — the one §2.C category with
correctness pins but no scale row until r11.

Replays the 10x events table (.scaledata/sf1, 10x sf0.1's rows) through
four streaming operators on the RocksDB state-store provider (the
production 100 TB state configuration), with the source staged as
multiple files and maxFilesPerTrigger so the run exercises REAL
multi-micro-batch state carry, not one degenerate batch:

- stream_tumbling_counts    — watermarked tumbling-window agg
- stream_session_windows    — session-window merge (heaviest state shape)
- stream_user_totals        — applyInPandasWithState arbitrary state
- stream_clicks_before_errors — watermark-bounded stream-stream interval
                              join (r12; both sides buffered in RocksDB)

Each rep records wall seconds, input rows/sec, micro-batch count, and
the state-store size straight from the query progress (stateOperators:
numRowsTotal, stateMemory / RocksDB custom metrics). Same method
discipline as the batch curves: every rep published, cold checkpoints
per rep (state rebuilt from zero — throughput includes state writes).

Usage: python tools/stream_throughput_probe.py [--reps 2]
Writes STREAM_THROUGHPUT_r12.json at the repo root.
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

BIG = REPO / ".scaledata" / "sf1"
N_SOURCE_FILES = 8
FILES_PER_TRIGGER = 2  # -> 4 micro-batches per run

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def main() -> int:
    args = sys.argv[1:]
    reps = int(args[args.index("--reps") + 1]) if "--reps" in args else 2
    assert BIG.is_dir(), f"{BIG} missing — run tools/make_scale_data.py first"

    from simple_map_reduce_ruuner_spark.session import get_spark
    from simple_map_reduce_ruuner_spark.sources.tables import load_table
    from simple_map_reduce_ruuner_spark.streaming.joins import (
        stream_clicks_before_errors,
    )
    from simple_map_reduce_ruuner_spark.streaming.stateful import (
        stream_running_user_totals,
    )
    from simple_map_reduce_ruuner_spark.streaming.windows import (
        EVENTS_DDL,
        stream_session_windows,
        stream_tumbling_counts,
    )

    spark = get_spark(
        app_name="smrr-stream-probe", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)

    work = pathlib.Path(tempfile.mkdtemp(prefix="stream_probe_"))
    src_dir = work / "events_src"
    ev = load_table(spark, str(BIG), "events")
    n_rows = ev.count()
    ev.repartition(N_SOURCE_FILES).write.parquet(str(src_dir))
    print(f"staged {n_rows:,} events into {N_SOURCE_FILES} files at {src_dir}")

    # maxFilesPerTrigger is a SOURCE option — it must reach the
    # readStream builder (on the sink it is silently ignored and the
    # whole input collapses into one micro-batch, which would make this
    # a batch benchmark in disguise)
    opts = {"maxFilesPerTrigger": str(FILES_PER_TRIGGER)}
    # (builder, sink output mode): session-window aggregation does not
    # support update mode — complete is its contract (same as the test
    # suite); the other two emit per-key updates.
    streams = {
        "stream_tumbling_counts": (
            lambda: stream_tumbling_counts(
                spark, str(src_dir), watermark="10 minutes", reader_options=opts
            ),
            "update",
        ),
        "stream_session_windows": (
            lambda: stream_session_windows(
                spark, str(src_dir), watermark="10 minutes", reader_options=opts
            ),
            "complete",
        ),
        "stream_user_totals": (
            lambda: stream_running_user_totals(
                spark, str(src_dir), EVENTS_DDL, reader_options=opts
            ),
            "update",
        ),
        # r12 (verdict item 5): the watermark-bounded stream-stream
        # interval join — both sides buffer in RocksDB, the range
        # condition + watermark prune click state older than the join
        # horizon; append mode emits matches as they finalize.
        "stream_clicks_before_errors": (
            lambda: stream_clicks_before_errors(
                spark, str(src_dir), watermark="10 minutes", reader_options=opts
            ),
            "append",
        ),
    }

    def run_once(name: str, build, mode: str, rep: int) -> dict:
        ckpt = work / f"ckpt_{name}_{rep}"  # cold state per rep
        t0 = time.perf_counter()
        q = (
            build()
            .writeStream.foreachBatch(
                lambda b, i: b.write.format("noop").mode("overwrite").save()
            )
            .outputMode(mode)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(1800)
            assert finished, f"{name} rep {rep}: stream did not finish in 1800s"
            wall = time.perf_counter() - t0
            progresses = q.recentProgress
        finally:
            if q.isActive:
                q.stop()
        batches = len([p for p in progresses if p["numInputRows"] > 0])
        state = {}
        for p in reversed(progresses):  # last progress with state info
            ops = p.get("stateOperators") or []
            if ops:
                def tot(key, custom=None):
                    vals = [
                        ((o.get("customMetrics") or {}).get(custom) if custom
                         else o.get(key))
                        for o in ops
                    ]
                    vals = [v for v in vals if v is not None]
                    return sum(vals) if vals else None
                state = {
                    "state_rows": tot("numRowsTotal"),
                    "state_memory_bytes": tot("memoryUsedBytes"),
                    # RocksDB-specific: on-disk SST footprint
                    "rocksdb_sst_bytes": tot(None, "rocksdbSstFileSize"),
                    "state_operators": len(ops),
                }
                break
        shutil.rmtree(ckpt, ignore_errors=True)
        return {
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(n_rows / wall),
            "micro_batches": batches,
            **state,
        }

    out: dict[str, list[dict]] = {n: [] for n in streams}
    for rep in range(reps):  # round-robin, same burst discipline as bench
        for name, (build, mode) in streams.items():
            r = run_once(name, build, mode, rep)
            out[name].append(r)
            print(f"rep {rep} {name}: {r}", flush=True)

    doc = {
        "input_rows": n_rows,
        "source_files": N_SOURCE_FILES,
        "max_files_per_trigger": FILES_PER_TRIGGER,
        "state_store_provider": "RocksDB",
        "big_dir": str(BIG),
        "reps": out,
        "best_rows_per_sec": {
            n: max(r["rows_per_sec"] for r in rs) for n, rs in out.items()
        },
        "method": (
            "availableNow file-replay of the 10x events table in 4 "
            "micro-batches (8 staged files, maxFilesPerTrigger=2), "
            "RocksDB state store, COLD checkpoint per rep (throughput "
            "includes state writes), foreachBatch noop sink (no driver "
            "collect), round-robin interleaved reps, every rep published"
        ),
    }
    path = REPO / "STREAM_THROUGHPUT_r12.json"
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(f"wrote {path}")
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
