#!/usr/bin/env python
"""Measure shuffle-partition sensitivity of the heaviest text operator
at the 1000x docs dir, to CALIBRATE plans/sizing.py rather than guess.

r10 observed cdc_chunk_dedup at 216.6 s (32 partitions) vs 454.8 s
(256 partitions) — a 2.1x swing from one knob, but single reps on a VM
with documented 2-10x CPU-steal bursts, so the attribution was open.
This sweep runs N reps per setting with a fixed heap (isolating the
partition knob), publishes every rep, and the chosen sizing heuristic
must land within ~1.3x of the best measured setting.

Usage: python tools/partition_sweep.py [--reps 2] [--parts 32,96,256]
Writes PARTITION_SWEEP_r11.json at the repo root.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BIG = REPO / ".scaledata" / "docs1000"
WARM = "/root/testdata/sf0.001"
QUERY = "cdc_chunk_dedup"


def main() -> int:
    args = sys.argv[1:]
    reps = int(args[args.index("--reps") + 1]) if "--reps" in args else 2
    parts = [
        int(p)
        for p in (
            args[args.index("--parts") + 1] if "--parts" in args else "32,96,256"
        ).split(",")
    ]
    assert BIG.is_dir(), f"{BIG} missing — run tools/scale_probe_1000x_docs.py first"

    # fixed heap across settings so the sweep isolates the partition knob
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "30g")
    from simple_map_reduce_ruuner_spark.registry import all_queries
    from simple_map_reduce_ruuner_spark.session import get_spark
    from simple_map_reduce_ruuner_spark.sources.tables import clear_session_caches

    spark = get_spark(app_name="smrr-partition-sweep", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    fn = all_queries()[QUERY].fn

    # codegen warm-up at tiny scale
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    fn(spark, WARM).write.format("noop").mode("overwrite").save()
    clear_session_caches(WARM)

    out: dict[str, list[float]] = {}
    # interleave settings round-robin so a steal burst cannot poison one
    # setting's whole column (same discipline as bench.py)
    for r in range(reps):
        for p in parts:
            spark.conf.set("spark.sql.shuffle.partitions", str(p))
            clear_session_caches(str(BIG))
            t0 = time.perf_counter()
            fn(spark, str(BIG)).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 1)
            out.setdefault(str(p), []).append(dt)
            print(f"rep {r} parts={p}: {dt}s", flush=True)

    doc = {
        "query": QUERY,
        "big_dir": str(BIG),
        "heap": os.environ["SPARK_GRAFT_DRIVER_MEM"],
        "reps_per_setting": reps,
        "seconds_by_partitions": out,
        "min_by_partitions": {p: min(v) for p, v in out.items()},
        "method": (
            "round-robin interleaved reps, session caches cleared per rep "
            "(COLD full-ladder cost), fixed heap so only the partition "
            "knob varies; every rep published"
        ),
    }
    path = REPO / "PARTITION_SWEEP_r11.json"
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
