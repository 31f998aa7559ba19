#!/usr/bin/env python
"""100x decade for the archive-container family (tar / zip / gzip / xz).

These four queries are zero-exchange encode→parse round trips over the
documents table — the only registry family without a measured decade
until now. The probe replicates documents 100x (key-offset + per-replica
word-shuffled text, same scheme as the other .scaledata dirs) and runs
each container query cold at sf0.1 and at 100x. Expected shape: pure
map-only scaling — ratio ≈ 100/cores·(per-doc cost), per_unit « 1.

Usage: python tools/scale_probe_containers.py [--out SCALE_CONTAINERS_r13.json]
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
DOCS_DIR = REPO / ".scaledata" / "docs100"
K = 100
QUERIES = [
    "tar_shard_members",
    "zip_shard_members",
    "gzip_member_stats",
    "xz_block_stats",
]


def ensure_dir() -> None:
    dst = DOCS_DIR / "documents.parquet"
    if dst.exists():
        print(f"{dst} present, reusing")
        return
    import pyarrow.parquet as pq

    from make_scale_data import _replica

    DOCS_DIR.mkdir(parents=True, exist_ok=True)
    src = pq.read_table(os.path.join(SMALL, "documents.parquet"))
    with pq.ParquetWriter(dst, src.schema) as writer:
        for i in range(K):
            writer.write_table(_replica("documents", src, i))
    print(f"wrote {dst}: {src.num_rows} -> {src.num_rows * K} rows")


def main() -> int:
    args = sys.argv[1:]
    out_name = (
        args[args.index("--out") + 1]
        if "--out" in args
        else "SCALE_CONTAINERS_r13.json"
    )
    ensure_dir()

    from simple_map_reduce_ruuner_spark.plans.sizing import apply_dataset_sizing
    from simple_map_reduce_ruuner_spark.registry import all_queries
    from simple_map_reduce_ruuner_spark.session import get_spark
    from simple_map_reduce_ruuner_spark.sources.tables import clear_session_caches

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="smrr-container-probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    reg = all_queries()
    sizing: dict[str, dict] = {}

    def run(name: str, sf_dir: str) -> float:
        sizing[sf_dir] = apply_dataset_sizing(spark, sf_dir, cpus=cpus)
        t0 = time.perf_counter()
        reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in QUERIES:  # codegen/python-worker warm-up
        run(name, WARM)
    clear_session_caches(WARM)

    out = {}
    for name in QUERIES:

        def cold(sf_dir: str) -> float:
            clear_session_caches(sf_dir)
            return run(name, sf_dir)

        small_reps = [round(cold(SMALL), 3) for _ in range(2)]
        big_reps = [round(cold(str(DOCS_DIR)), 3) for _ in range(2)]
        t_small, t_big = min(small_reps), min(big_reps)
        ratio = round(t_big / t_small, 2)
        out[name] = {
            "sec_small": t_small,
            "sec_big": t_big,
            "reps_small": small_reps,
            "reps_big": big_reps,
            "scale": K,
            "ratio": ratio,
            "per_unit": round(ratio / K, 3),
        }
        print(name, out[name])

    doc = {
        "method": (
            "min over 2 published reps per side, noop sink, warm "
            "python workers, session caches cleared per rep; heap + "
            "shuffle partitions derived via plans/sizing.py"
        ),
        "small_dir": SMALL,
        "big_dir": str(DOCS_DIR),
        "data_scale": K,
        "sizing": sizing,
        "queries": out,
        "note": (
            "all four container queries are zero-exchange mapInPandas "
            "encode->parse round trips; the decade measures per-core "
            "container+compression cost, there is no shuffle to scale"
        ),
    }
    (REPO / out_name).write_text(json.dumps(doc, indent=2) + "\n")
    print("wrote", REPO / out_name)
    return 0


if __name__ == "__main__":
    sys.exit(main())
