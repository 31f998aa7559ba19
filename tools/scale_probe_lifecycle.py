#!/usr/bin/env python
"""Scale decades for the r13 corpus-lifecycle operators.

Two arms, matching each operator's natural table:

- documents at 1000x (reuses/creates the `.scaledata/docs1000` dir of
  scale_probe_1000x_docs — key-offset replicas with per-replica
  word-shuffled text): ``incremental_dedup`` (batch-vs-corpus digest
  join; word-shuffling makes ~every replica text distinct, the
  worst case for the corpus index size), ``leakage_safe_split``
  (count-distinct over 8-byte digests), ``mixture_sample_plan``
  (aggregate scan + broadcast-rate Bernoulli pass), and ``pii_scrub``
  (the zero-shuffle regex map).
- events at 100x (`.scaledata/events100`, events-only):
  ``throttle_suppress`` — user_id offsets mean key cardinality scales
  100x while per-key depth stays constant, exactly how a keyed
  state/applyInPandas kernel should grow; the probe shows the Python
  chain kernel rides that shape (group-parallel, O(1) state).

KEY_OFFSET (1e8) is divisible by INCR_MOD (10), so the incoming-batch
residue slice is preserved per replica; the PII fixture residues
(7/11/13) rotate across replicas, which only moves which docs carry
spans — counts stay proportional.

per_unit = ratio/scale (<= 1 linear-or-better), as in
tools/scale_curve.py. >= 2 raw reps published on the big side.

Usage: python tools/scale_probe_lifecycle.py [--out SCALE_LIFECYCLE_r13.json]
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
WARM = "/root/testdata/sf0.001"
DOCS_DIR = REPO / ".scaledata" / "docs1000"
EVENTS_DIR = REPO / ".scaledata" / "events100"
K_DOCS = 1000
K_EVENTS = 100

DOC_QUERIES = [
    "incremental_dedup",
    "leakage_safe_split",
    "mixture_sample_plan",
    "pii_scrub",
]
EVENT_QUERIES = ["throttle_suppress"]


def ensure_dir(dst_dir: pathlib.Path, table: str, k: int) -> None:
    dst = dst_dir / f"{table}.parquet"
    if dst.exists():
        print(f"{dst} present, reusing")
        return
    import pyarrow.parquet as pq

    from make_scale_data import _replica

    dst_dir.mkdir(parents=True, exist_ok=True)
    src = pq.read_table(os.path.join(SMALL, f"{table}.parquet"))
    t0 = time.perf_counter()
    with pq.ParquetWriter(dst, src.schema) as writer:
        for i in range(k):
            writer.write_table(_replica(table, src, i))
    n = pq.ParquetFile(dst).metadata.num_rows
    assert n == src.num_rows * k
    print(f"wrote {dst}: {src.num_rows} -> {n} rows ({time.perf_counter()-t0:.1f}s)")


def main() -> int:
    args = sys.argv[1:]
    out_name = (
        args[args.index("--out") + 1]
        if "--out" in args
        else "SCALE_LIFECYCLE_r13.json"
    )
    ensure_dir(DOCS_DIR, "documents", K_DOCS)
    ensure_dir(EVENTS_DIR, "events", K_EVENTS)

    from simple_map_reduce_ruuner_spark.plans.sizing import (
        apply_dataset_sizing,
        dataset_footprint,
        recommend_driver_mem_gb,
    )
    from simple_map_reduce_ruuner_spark.registry import all_queries
    from simple_map_reduce_ruuner_spark.session import get_spark
    from simple_map_reduce_ruuner_spark.sources.tables import clear_session_caches

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    big_bytes = dataset_footprint(str(DOCS_DIR))["uncompressed_bytes"]
    os.environ.setdefault(
        "SPARK_GRAFT_DRIVER_MEM", f"{recommend_driver_mem_gb(big_bytes, cpus)}g"
    )
    spark = get_spark(app_name="smrr-lifecycle-probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    reg = all_queries()
    sizing: dict[str, dict] = {}

    def run(name: str, sf_dir: str) -> float:
        decisions = apply_dataset_sizing(spark, sf_dir, cpus=cpus)
        sizing[sf_dir] = decisions
        t0 = time.perf_counter()
        reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in DOC_QUERIES + EVENT_QUERIES:  # codegen warm-up
        run(name, WARM)
    clear_session_caches(WARM)

    out = {}
    for name, big_dir, k in [(n, DOCS_DIR, K_DOCS) for n in DOC_QUERIES] + [
        (n, EVENTS_DIR, K_EVENTS) for n in EVENT_QUERIES
    ]:

        def cold(sf_dir: str) -> float:
            clear_session_caches(sf_dir)
            return run(name, sf_dir)

        small_reps = [round(cold(SMALL), 3) for _ in range(2)]
        big_reps = [round(cold(str(big_dir)), 3) for _ in range(2)]
        t_small, t_big = min(small_reps), min(big_reps)
        ratio = round(t_big / t_small, 2)
        out[name] = {
            "sec_small": t_small,
            "sec_big": t_big,
            "reps_small": small_reps,
            "reps_big": big_reps,
            "scale": k,
            "ratio": ratio,
            "per_unit": round(ratio / k, 3),
        }
        print(name, out[name])

    doc = {
        "method": (
            "min over 2 published reps per side, noop sink, codegen "
            "pre-warmed at sf0.001, session caches cleared per rep "
            "(COLD rows); heap + shuffle partitions derived from "
            "parquet footers via plans/sizing.py"
        ),
        "small_dir": SMALL,
        "docs_dir": str(DOCS_DIR),
        "events_dir": str(EVENTS_DIR),
        "sizing": sizing,
        "queries": out,
        "note": (
            "documents replicas are word-shuffled per replica, so "
            "incremental_dedup's corpus index is ~maximal (every text "
            "distinct) — the worst case for index size; events replicas "
            "shift user_id, so throttle keys scale 100x at constant "
            "per-key depth (the keyed-state shape)."
        ),
    }
    (REPO / out_name).write_text(json.dumps(doc, indent=2) + "\n")
    print("wrote", REPO / out_name)
    return 0


if __name__ == "__main__":
    sys.exit(main())
