#!/usr/bin/env python
"""Benchmark harness: run every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print the
full per-query JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>}

followed by a compact one-line summary (same metric/value/unit keys,
plus median/p90 vs_r01 and the top-5 slowest) as the LAST stdout line —
the driver archives only a ~2000-char tail of stdout, so the summary is
what survives in BENCH_r{N}.json; the full document is also written to
BENCH_FULL_LATEST.json beside this script.

Each query executes its full physical plan via a noop sink (no driver-side
collect, so we measure engine throughput, not Arrow transfer). Before the
timed run, the same plan shape is executed once at sf0.001: whole-stage
codegen classes are compiled and cached on that run, so the timed number
measures data-proportional work (scan/shuffle/agg), not Janino compile
latency — the component that actually scales to 100 TB.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from simple_map_reduce_ruuner_spark.registry import all_queries
from simple_map_reduce_ruuner_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark(app_name="smrr-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()

    # Warm-up: JVM classloading + codegen on a trivial plan.
    from simple_map_reduce_ruuner_spark.sources.tables import load_table

    load_table(spark, sf_dir, "lineitem").count()

    # Median-of-N timed passes, ROUND-ROBIN over queries (not N back-to-back
    # runs of the same query): this VM shows 2-10x CPU-steal bursts, and
    # interleaving separates a query's reps in time so one burst can't
    # poison all of them. Median, not mean, discards the outlier rep.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    warm_dir = "/root/testdata/sf0.001"
    names = sorted(queries)
    samples: dict[str, list[float]] = {n: [] for n in names}
    failed: set[str] = set()
    for name in names:  # codegen warm-up pass at tiny scale
        try:
            if os.path.isdir(warm_dir):
                queries[name].fn(spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
        except Exception as exc:
            # warm-up failures are reported but must NOT gate the timed
            # run — a tiny-scale-only edge would otherwise silently drop
            # the query from the benchmarked total (review-found); only
            # failures AT THE BENCHMARKED SCALE exclude a query
            print(f"BENCH WARMUP ERROR {name}: {exc}", file=sys.stderr)
    for _ in range(reps):
        for name in names:
            if name in failed:
                continue
            try:
                t0 = time.perf_counter()
                queries[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples[name].append(time.perf_counter() - t0)
            except Exception as exc:
                failed.add(name)
                print(f"BENCH ERROR {name}: {exc}", file=sys.stderr)

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    timings = {
        n: (round(median(samples[n]), 3) if samples[n] else -1.0) for n in names
    }
    # Per-query rep trace, in execution order. samples[n][0] is the
    # query's FIRST timed execution at this scale (codegen pre-warmed at
    # sf0.001, data/caches cold-ish) — the closest thing a single bench
    # process has to an isolated rep — while the median folds in the
    # warmth later round-robin passes accumulate. Publishing both lets
    # a reader mechanically separate "query regressed" (first AND
    # median high) from "bench-order warmth" (first high, median low):
    # doc_fingerprint spent r7+r8 looking regressed in driver benches
    # at ~0.97 vs_r01 while isolated runs said 0.50 — this column is
    # the receipt that closes that class of question per query.
    rep_trace = {n: [round(x, 3) for x in samples[n]] for n in names}
    first_rep = {n: xs[0] for n, xs in rep_trace.items() if xs}
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # failures must be visible IN the JSON: a fully-failed query would
    # otherwise just shrink the headline total (reads as a speedup), and
    # a partially-failed one would look like a clean run (review-found)
    incomplete = sorted(
        n for n in names if len(samples[n]) < reps or n in failed
    )

    # Noise calibration: per-query max/min rep ratio. This VM shows 2-10x
    # CPU-steal bursts (r03 vs r04 ran identical code ±20%); publishing
    # the observed spread lets a reader separate real regressions from
    # machine noise when comparing rounds.
    spreads = sorted(
        max(xs) / min(xs)
        for xs in samples.values()
        if len(xs) >= 2 and min(xs) > 0
    )
    noise = (
        {
            "median_rep_spread": round(median(spreads), 3),
            "p90_rep_spread": round(spreads[int(0.9 * (len(spreads) - 1))], 3),
        }
        if spreads
        else {}
    )

    # per-query ratio vs the previous round's recorded bench (>1 slower,
    # <1 faster); new queries have no entry
    vs_prev: dict[str, float] = {}
    prev_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_r01.json"
    )
    try:
        with open(prev_path) as fh:
            prev = json.load(fh)["parsed"]["queries"]
        vs_prev = {
            n: round(timings[n] / prev[n], 2)
            for n in names
            if n in prev and prev[n] > 0 and timings[n] > 0
        }
    except Exception:
        pass

    doc = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "first_rep": first_rep,
        "rep_trace": rep_trace,
        "incomplete": incomplete,
        "sf": sf,
        "reps": reps,
        "stat": "median_round_robin",
        "noise": noise,
        "vs_r01": vs_prev,
    }
    print(json.dumps(doc))

    # The driver records only the last ~2000 chars of stdout; the full
    # per-query line above is ~5 KB, so rounds r05-r07 archived a
    # truncated fragment ("parsed": null). Persist the full document to
    # a committed file, and make the LAST stdout line a compact
    # self-contained summary that always fits inside the tail capture.
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL_LATEST.json"
    )
    try:
        with open(full_path, "w") as fh:
            json.dump(doc, fh, indent=1)
            fh.write("\n")
    except OSError as exc:  # read-only checkout: summary line still works
        print(f"BENCH NOTE: could not write {full_path}: {exc}", file=sys.stderr)

    ratios = sorted(vs_prev.values())
    slowest = sorted(
        ((t, n) for n, t in timings.items() if t > 0), reverse=True
    )[:5]
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "reps": reps,
                "queries_n": len(names),
                "median_sec": round(median([t for t in timings.values() if t >= 0]), 3),
                "median_vs_r01": (
                    round(median(ratios), 3) if ratios else None
                ),
                "p90_vs_r01": (
                    round(ratios[int(0.9 * (len(ratios) - 1))], 3)
                    if ratios
                    else None
                ),
                "top5_slowest": {n: t for t, n in slowest},
                # p90 of first-rep/median per query: how much slower a
                # query's first (cold-ish) execution runs vs its
                # round-robin median — the order-warmth signal; the
                # full per-query columns are in BENCH_FULL_LATEST.json
                "first_vs_median_p90": (
                    lambda rs: round(rs[int(0.9 * (len(rs) - 1))], 3)
                    if rs
                    else None
                )(
                    sorted(
                        first_rep[n] / timings[n]
                        for n in first_rep
                        if timings[n] > 0
                    )
                ),
                "incomplete": incomplete,
                "noise": noise,
                "full": "BENCH_FULL_LATEST.json",
            }
        )
    )


if __name__ == "__main__":
    main()
