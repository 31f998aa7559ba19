#!/usr/bin/env python
"""1000x probe for the two N-adaptive embedding operators.

The 10x/100x curves cover the whole registry; this probe answers one
targeted question for the NEXT decade: do the operators whose tuning
parameters re-derive from parquet footers — ``neardup_embedding_lsh_auto``
(bands x bits grow with N) and ``semdedup_pairs_auto`` (K = sqrt(N/2),
Theta(N^1.5) total work) — actually re-tune at 1000x the bench corpus
(2M vectors), or do they fall off a constant cliff?

Only the embeddings table is generated (the probe queries read nothing
else): 1000 key-offset replicas of sf0.1 embeddings with redrawn
vectors, via make_scale_data._replica — the same deterministic scheme
as the 10x/100x dirs, so selectivity scales the same way. ~512 MB on
disk, gitignored like .scaledata/*.

per_unit uses the same definition as tools/scale_curve.py
(ratio/scale, <=1 is linear-or-better). For semdedup_pairs_auto the
EXPECTED asymptote is per_unit ~ sqrt(scale)/overhead-dilution — the
operator is Theta(N^1.5) by design; the probe's pass criterion is
per_unit < 1 at this size (headroom says it should be: 0.129 at 100x,
x sqrt(10) per decade -> ~0.4 at 1000x), with the N^1.5 slope
documented rather than hidden.

Usage: python tools/scale_probe_1000x.py [--out SCALE_CURVE_1000X_EMB_r11.json]
                                         [--reps-big 2]

r11: brought up to the docs/graph probe discipline — heap + shuffle
partitions derived from parquet footers via plans/sizing.py, session
caches cleared per rep (COLD), >= 2 raw big reps published.
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
PROBE_DIR = REPO / ".scaledata" / "emb1000"
K = 1000
PROBE_QUERIES = ["neardup_embedding_lsh_auto", "semdedup_pairs_auto"]


def ensure_probe_data() -> None:
    dst = PROBE_DIR / "embeddings.parquet"
    if dst.exists():
        print(f"{dst} present, reusing")
        return
    import pyarrow as pa
    import pyarrow.parquet as pq

    from make_scale_data import _replica

    PROBE_DIR.mkdir(parents=True, exist_ok=True)
    src = pq.read_table(os.path.join(SMALL, "embeddings.parquet"))
    t0 = time.perf_counter()
    reps = [_replica("embeddings", src, i) for i in range(K)]
    big = pa.concat_tables(reps)
    assert big.schema.equals(src.schema)
    pq.write_table(big, dst)
    print(
        f"wrote {dst}: {src.num_rows} -> {big.num_rows} rows "
        f"({time.perf_counter() - t0:.1f}s)"
    )


def main() -> int:
    args = sys.argv[1:]
    out_name = (
        args[args.index("--out") + 1]
        if "--out" in args
        else "SCALE_CURVE_1000X_EMB_r11.json"
    )
    reps_big = int(
        args[args.index("--reps-big") + 1] if "--reps-big" in args else 2
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
    spark = get_spark(app_name="smrr-1000x-probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    fns = {n: q.fn for n, q in all_queries().items() if n in PROBE_QUERIES}
    sizing: dict[str, dict] = {}

    def run(name: str, sf_dir: str) -> float:
        sizing[sf_dir] = apply_dataset_sizing(spark, sf_dir, cpus=cpus)
        t0 = time.perf_counter()
        fns[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in PROBE_QUERIES:  # codegen warm-up
        run(name, WARM)
    clear_session_caches(WARM)

    out = {}
    for name in PROBE_QUERIES:
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
            "embeddings-only 1000x dir (the probe queries read no other "
            "table); heap + shuffle partitions derived from parquet "
            "footers via plans/sizing.py (see `sizing`)"
        ),
        "sizing": sizing,
        "small_dir": SMALL,
        "big_dir": str(PROBE_DIR),
        "data_scale": K,
        "queries": out,
        "note": (
            "Validates that the footer-derived self-tuning (LSH bands/bits, "
            "k-means K=sqrt(N/2)) re-tunes at the decade beyond the 100x "
            "curve. semdedup_pairs_auto is Theta(N^1.5) BY DESIGN, so its "
            "per_unit grows ~sqrt(10) per decade; pass = per_unit < 1 here, "
            "not flatness."
        ),
    }
    path = REPO / out_name
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
