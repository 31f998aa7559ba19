#!/usr/bin/env python
"""1000x probe for the graph family (verdict r10 item 5).

``pagerank_trading`` is the slowest bench row (4.9 s at sf0.1; 100x
per_unit 0.140) but had no next-decade evidence; this probe generates a
1000x orders+lineitem dir (key-offset replicas via make_scale_data's
_replica — per-replica key spaces keep the graph a union of 1000
components with the ORIGINAL degree distribution, so the iteration
shuffles scale linearly and no synthetic hot key appears) and measures
the checkpointed-edges iteration shape at the next decade.

``supplier_cotrading_pairs`` (heaviest 100x cold row, 123 s) rides the
same orders x lineitem projection; probe it with --cotrading if wall
budget allows.

Physical capacity (heap, shuffle partitions) is DERIVED from the
dataset's parquet footers via plans/sizing.py — nothing hand-picked.
All reps are published raw (>= 2 per side).

~11 GB on disk under .scaledata/ (gitignored).
Usage: python tools/scale_probe_1000x_graph.py [--reps-big 2] [--cotrading]
Writes SCALE_CURVE_1000X_GRAPH_r12.json at the repo root.
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
PROBE_DIR = REPO / ".scaledata" / "graph1000"
K = 1000
TABLES = ("orders", "lineitem")


def ensure_probe_data() -> None:
    import pyarrow.parquet as pq

    from make_scale_data import _replica

    PROBE_DIR.mkdir(parents=True, exist_ok=True)
    for name in TABLES:
        dst = PROBE_DIR / f"{name}.parquet"
        if dst.exists():
            print(f"{dst} present, reusing")
            continue
        src = pq.read_table(os.path.join(SMALL, f"{name}.parquet"))
        t0 = time.perf_counter()
        tmp = dst.with_suffix(".tmp")  # atomic-ish: no half file reused
        with pq.ParquetWriter(tmp, src.schema) as writer:
            for i in range(K):
                writer.write_table(_replica(name, src, i))
        os.rename(tmp, dst)
        n = pq.ParquetFile(dst).metadata.num_rows
        assert n == src.num_rows * K
        print(
            f"wrote {dst}: {src.num_rows} -> {n} rows "
            f"({time.perf_counter() - t0:.1f}s)"
        )


def main() -> int:
    args = sys.argv[1:]
    reps_big = int(
        args[args.index("--reps-big") + 1] if "--reps-big" in args else 2
    )
    # --queries a,b overrides the default target (e.g. a cotrading-only
    # run that doesn't re-pay the ~30-45 min pagerank reps)
    queries = (
        args[args.index("--queries") + 1].split(",")
        if "--queries" in args
        else ["pagerank_trading"]
        + (["supplier_cotrading_pairs"] if "--cotrading" in args else [])
    )
    ensure_probe_data()

    from simple_map_reduce_ruuner_spark.plans.sizing import (
        apply_dataset_sizing,
        dataset_footprint,
        recommend_driver_mem_gb,
    )
    from simple_map_reduce_ruuner_spark.registry import all_queries
    from simple_map_reduce_ruuner_spark.session import get_spark
    from simple_map_reduce_ruuner_spark.sources.tables import (
        clear_session_caches,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    big_bytes = dataset_footprint(str(PROBE_DIR))["uncompressed_bytes"]
    os.environ.setdefault(
        "SPARK_GRAFT_DRIVER_MEM", f"{recommend_driver_mem_gb(big_bytes, cpus)}g"
    )
    spark = get_spark(app_name="smrr-1000x-graph-probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    fns = {n: q.fn for n, q in all_queries().items() if n in queries}
    sizing: dict[str, dict] = {}

    def run(name: str, sf_dir: str) -> float:
        sizing[sf_dir] = apply_dataset_sizing(spark, sf_dir, cpus=cpus)
        t0 = time.perf_counter()
        fns[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in queries:  # codegen warm-up
        run(name, WARM)
    clear_session_caches(WARM)

    out = {}
    for name in queries:
        def cold(sf_dir: str) -> float:
            clear_session_caches(sf_dir)
            return run(name, sf_dir)

        small_reps = [round(cold(SMALL), 3) for _ in range(2)]
        big_reps = [round(cold(str(PROBE_DIR)), 3) for _ in range(reps_big)]
        t_small, t_big = min(small_reps), min(big_reps)
        ratio = round(t_big / t_small, 2)
        out[name] = {
            "sec_small": t_small,
            "sec_big": t_big,
            "reps_small": small_reps,
            "reps_big": big_reps,
            "ratio": ratio,
            "per_unit": round(ratio / K, 3),
        }
        print(name, out[name], flush=True)

    doc = {
        "method": (
            "min over published reps on BOTH sides (2 small, "
            f"{reps_big} big — every raw timing in reps_*), noop sink, "
            "codegen pre-warmed, session caches cleared per rep (COLD); "
            "orders+lineitem-only 1000x dir, key-offset replicas = 1000 "
            "disjoint components preserving the original degree "
            "distribution; heap + shuffle partitions derived from "
            "parquet footers via plans/sizing.py (see `sizing`)"
        ),
        "small_dir": SMALL,
        "big_dir": str(PROBE_DIR),
        "data_scale": K,
        "sizing": sizing,
        "queries": out,
    }
    path = REPO / "SCALE_CURVE_1000X_GRAPH_r12.json"
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
