#!/usr/bin/env python
"""Isolated per-query micro-bench for optimization work (guide §1).

Times ONLY the named queries (builder + noop-sink execution, the same
timed region as bench.py) for N reps each after one sf0.001 warm-up
pass, printing per-rep seconds and the median. Round-robin order like
bench.py so a machine burst cannot poison one query's whole sample.

Usage: python tools/bench_subset.py q1 q2 ... [--reps 3] [--explain]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_map_reduce_ruuner_spark.registry import all_queries
from simple_map_reduce_ruuner_spark.session import get_spark
from simple_map_reduce_ruuner_spark.sources.tables import clear_session_caches


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", action="store_true",
                    help="dump explain('formatted') to stdout per query")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    spark = get_spark("bench-subset")
    queries = all_queries()
    missing = [n for n in args.names if n not in queries]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    if not args.no_warm:
        for name in args.names:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            queries[name].fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        clear_session_caches(warm_dir)

    samples: dict[str, list[float]] = {n: [] for n in args.names}
    for rep in range(args.reps):
        for name in args.names:
            spark.sparkContext.setJobDescription(f"{name}#r{rep}")
            t0 = time.perf_counter()
            queries[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[name].append(time.perf_counter() - t0)

    out = {}
    for name, ts in samples.items():
        s = sorted(ts)
        mid = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        out[name] = {"median": round(mid, 3), "reps": [round(t, 3) for t in ts]}
        print(f"{name:42s} median={mid:7.3f}  reps={[round(t, 3) for t in ts]}")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
