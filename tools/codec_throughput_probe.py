#!/usr/bin/env python
"""Throughput + scale evidence for the six real media codecs.

The codec queries (PPM/PNG/WAV from r11-r12, JPEG/mu-law/AVI from the
r12 session-2 batch) are zero-exchange single-scan mapInPandas maps
(PLANS.md), so at 100 TB they are embarrassingly parallel: wall time
should scale ~linearly in bytes with NO shuffle term. This probe makes
that claim measured instead of asserted:

1. Builds a documents-ONLY 10x replica of sf0.1 via make_scale_data's
   `_replica` (same recipe as the committed scale curves: doc_id
   offset + per-replica word shuffle, byte statistics preserved).
2. Runs each codec end to end (`.count()` cannot prune through a
   Python map, so the full encode+decode kernel executes) at sf0.1 and
   at 10x, interleaved A/B reps to decorrelate CPU-steal bursts.
3. Reports per-codec medians, the 10x/1x ratio and per-unit (ratio/10),
   plus decoded-payload MB/s at 10x.

Writes CODEC_THROUGHPUT_r12.json at the repo root (10x default); pass
a replica factor K to measure another decade (artifact name then
carries the factor, e.g. CODEC_SCALE_100X_r12.json).

Usage: python tools/codec_throughput_probe.py [reps=3] [K=10] [codecs]
  codecs: optional comma-separated subset (big decades time out the
  full set; the slow/fast extremes bound the family).
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
X10 = str(REPO / ".scaledata" / "docs10x")  # overridden by K argv

CODECS = [
    "decode_image_ppm",
    "decode_image_png",
    "decode_audio_wav",
    "decode_image_jpeg",
    "decode_audio_mulaw",
    "decode_video_avi",
    "decode_image_gif",
]


def build_docs_replica(k: int, big_dir: str) -> None:
    import pyarrow.parquet as pq

    from make_scale_data import _replica
    import pyarrow as pa

    dst = pathlib.Path(big_dir)
    out = dst / "documents.parquet"
    if out.exists():
        print(f"replica exists: {out}")
        return
    dst.mkdir(parents=True, exist_ok=True)
    table = pq.read_table(pathlib.Path(SF01) / "documents.parquet")
    big = pa.concat_tables([_replica("documents", table, i) for i in range(k)])
    pq.write_table(big, out)
    print(f"documents: {table.num_rows} -> {big.num_rows} rows at {out}")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    codecs = sys.argv[3].split(",") if len(sys.argv) > 3 else CODECS
    global X10
    X10 = str(REPO / ".scaledata" / f"docs{k}x")
    build_docs_replica(k, X10)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from simple_map_reduce_ruuner_spark.registry import all_queries

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("codec-throughput")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    qs = all_queries()

    payload_bytes = {
        sf: spark.read.parquet(f"{sf}/documents.parquet")
        .agg(F.sum(F.octet_length("text")))
        .collect()[0][0]
        for sf in (SF01, X10)
    }
    rows = {
        sf: spark.read.parquet(f"{sf}/documents.parquet").count()
        for sf in (SF01, X10)
    }
    print(f"payload bytes: sf0.1={payload_bytes[SF01]:,} 10x={payload_bytes[X10]:,}")

    results: dict[str, dict] = {}
    for name in codecs:
        fn = qs[name].fn
        fn(spark, SF01).count()  # warm codegen + python workers once
        t_small, t_big = [], []
        for _ in range(reps):  # interleaved A/B
            t0 = time.monotonic()
            fn(spark, SF01).count()
            t_small.append(time.monotonic() - t0)
            t0 = time.monotonic()
            fn(spark, X10).count()
            t_big.append(time.monotonic() - t0)
        med_s = statistics.median(t_small)
        med_b = statistics.median(t_big)
        ratio = med_b / med_s
        results[name] = {
            "sf01_med_s": round(med_s, 3),
            "x10_med_s": round(med_b, 3),
            "reps_sf01": [round(t, 3) for t in t_small],
            "reps_x10": [round(t, 3) for t in t_big],
            "ratio_10x": round(ratio, 2),
            "per_unit": round(ratio / k, 3),
            "rows_per_s_10x": int(rows[X10] / med_b),
            "payload_mb_per_s_10x": round(
                payload_bytes[X10] / med_b / 1e6, 1
            ),
        }
        print(f"{name}: sf0.1 {med_s:.2f}s  10x {med_b:.2f}s  "
              f"ratio {ratio:.2f}  {results[name]['rows_per_s_10x']:,} rows/s")

    out = {
        "sf_small": SF01,
        "sf_big": X10,
        "k": k,
        "rows": {"sf01": rows[SF01], "x10": rows[X10]},
        "payload_bytes": {"sf01": payload_bytes[SF01], "x10": payload_bytes[X10]},
        "reps": reps,
        "codecs": results,
    }
    path = REPO / (
        "CODEC_THROUGHPUT_r12.json" if k == 10 else f"CODEC_SCALE_{k}X_r12.json"
    )
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
