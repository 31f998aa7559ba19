#!/usr/bin/env python
"""Measured speedup for the numpy PNG backend (r13 verdict item 3).

A/B of decode_image_png under backend="stdlib" vs backend="numpy"
through the full Spark query (encode + decode mapInPandas) at sf0.1
and at the 10x documents replica — the same interleaved-reps /
replica-staging recipe as tools/codec_throughput_probe.py, so the
numbers land beside the existing codec rows. The differential tests
(tests/test_codec_backends.py) pin byte-identical rows; this probe
pins that the vectorized leg is the FASTER one, completing the
wave/audioop pattern for an image codec without needing Pillow.

Writes PNG_NUMPY_BACKEND_r14.json at the repo root.

Usage: python tools/png_numpy_probe.py [reps=5] [K=10]
"""

from __future__ import annotations

import json
import pathlib
import statistics
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

SF01 = "/root/testdata/sf0.1"


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    big = str(REPO / ".scaledata" / f"docs{k}x")
    from codec_throughput_probe import build_docs_replica

    build_docs_replica(k, big)

    from pyspark.sql import SparkSession

    from simple_map_reduce_ruuner_spark.operators.multimodal import (
        decode_image_png,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("png-numpy-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # correctness first: both backends produce identical rows at sf0.1
    std_rows = sorted(
        map(tuple, decode_image_png(spark, SF01, backend="stdlib").collect())
    )
    vec_rows = sorted(
        map(tuple, decode_image_png(spark, SF01, backend="numpy").collect())
    )
    assert std_rows == vec_rows and std_rows, "backend rows diverge"
    print(f"identical rows at sf0.1: {len(std_rows)}")

    results: dict[str, dict] = {}
    for sf_name, sf in (("sf0.1", SF01), (f"{k}x", big)):
        # warm codegen + python workers once per backend
        for backend in ("stdlib", "numpy"):
            decode_image_png(spark, sf, backend=backend).count()
        t = {"stdlib": [], "numpy": []}
        for _ in range(reps):  # interleaved A/B
            for backend in ("stdlib", "numpy"):
                t0 = time.monotonic()
                decode_image_png(spark, sf, backend=backend).count()
                t[backend].append(time.monotonic() - t0)
        med = {b: statistics.median(ts) for b, ts in t.items()}
        mn = {b: min(ts) for b, ts in t.items()}
        results[sf_name] = {
            "stdlib_med_s": round(med["stdlib"], 3),
            "numpy_med_s": round(med["numpy"], 3),
            "stdlib_min_s": round(mn["stdlib"], 3),
            "numpy_min_s": round(mn["numpy"], 3),
            "reps_stdlib": [round(x, 3) for x in t["stdlib"]],
            "reps_numpy": [round(x, 3) for x in t["numpy"]],
            "speedup_median": round(med["stdlib"] / med["numpy"], 2),
            # min/min is the steal-robust ratio on this bursty VM
            "speedup_min": round(mn["stdlib"] / mn["numpy"], 2),
        }
        print(
            f"{sf_name}: stdlib {med['stdlib']:.2f}s numpy "
            f"{med['numpy']:.2f}s speedup {results[sf_name]['speedup_median']}x"
            f" (min/min {results[sf_name]['speedup_min']}x)"
        )

    out = {
        "query": "decode_image_png",
        "backends": ["stdlib", "numpy"],
        "identical_rows_sf01": len(std_rows),
        "reps": reps,
        "k": k,
        "scales": results,
        "note": (
            "rows byte-identical (asserted above + "
            "tests/test_codec_backends.py); numpy leg batches the "
            "unfilter across the Arrow batch (wavefront over scanlines)"
        ),
    }
    path = REPO / "PNG_NUMPY_BACKEND_r14.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
