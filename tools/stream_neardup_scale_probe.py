#!/usr/bin/env python
"""Streaming LSH near-dup ingest decade probe (r15 verdict item 2).

`stream_neardup_incremental` (streaming/neardup.py) maintains the
(band, band_sig) → min-corpus-doc index as streaming STATE. Unlike the
watermark-bounded join (STREAM_JOIN_SCALE_1000X_r14.json) this state
is SUPPOSED to grow with the corpus — it IS the index the batch job
materializes per run — so the honest claims to measure are different:

- equivalence: rolled-up stream output == the registry batch operator
  `neardup_incremental_lsh` over the same staged corpus, per decade;
- state accounting: final state rows == the batch-computed index size
  (distinct corpus (band, band_sig) groups), EXACTLY — no leak, no
  eviction, nothing retained for incoming-only groups;
- peak == final (nothing transient beyond the index itself);
- throughput of the per-row banding ingest path.

Replicas are doc_id-offset by 100M (≡ 0 mod INCR_MOD, so the
corpus/incoming split is preserved per replica) and TEXT-SALTED with a
per-replica token: unsalted replicas would band identically and the
index would stay flat by duplication, which would read as a bound that
isn't there. Corpus files are staged with strictly earlier mtimes than
incoming files (the batch operator's visibility contract; same staging
discipline as the r13/r14 stream probes).

Usage: python tools/stream_neardup_scale_probe.py [--decades 1,10,100]
Writes STREAM_NEARDUP_SCALE_r15.json at the repo root.
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

SF_DIR = "/root/testdata/sf0.1"
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
DOC_OFFSET = 100_000_000  # ≡ 0 mod INCR_MOD: preserves the slice split
# (n_corpus_files, n_incoming_files, maxFilesPerTrigger)
ARMS = {1: (8, 4, 4), 10: (16, 8, 8), 100: (32, 16, 16)}


def stage(spark, docs, k, work):
    """Salted, offset replicas; corpus files strictly before incoming."""
    from pyspark.sql import functions as F

    n_c, n_i, per_trigger = ARMS[k]
    from simple_map_reduce_ruuner_spark.operators.dedup import (
        INCR_MOD,
        INCR_REM,
    )

    scaled = (
        docs.crossJoin(F.broadcast(spark.range(k).withColumnRenamed("id", "r")))
        .select(
            (F.col("doc_id") + F.col("r") * F.lit(DOC_OFFSET)).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" zreplica"), F.col("r").cast("string")
            ).alias("text"),
        )
    )
    corpus = scaled.where(F.col("doc_id") % INCR_MOD != INCR_REM)
    incoming = scaled.where(F.col("doc_id") % INCR_MOD == INCR_REM)
    flat = work / "docs"
    flat.mkdir()
    now = time.time()
    i = 0
    for df, n_files in ((corpus, n_c), (incoming, n_i)):
        tmp = work / f"stage{i}"
        df.repartition(n_files).write.parquet(str(tmp))
        for p in sorted(tmp.glob("part-*.parquet")):
            dst = flat / f"{i:04d}.parquet"
            p.rename(dst)
            os.utime(dst, (now + i, now + i))
            i += 1
        shutil.rmtree(tmp, ignore_errors=True)
    return flat, per_trigger


def run_one(spark, docs, base_rows, k, results):
    import pandas as pd
    from pyspark.sql import functions as F

    from simple_map_reduce_ruuner_spark.operators.dedup import (
        neardup_incremental_lsh,
    )
    from simple_map_reduce_ruuner_spark.streaming.neardup import (
        DOCS_DDL,
        banded_rows,
        rollup_verdicts,
        stream_neardup_incremental,
    )

    work = pathlib.Path(tempfile.mkdtemp(prefix=f"stream_neardup_{k}x_"))
    t_stage = time.perf_counter()
    flat, per_trigger = stage(spark, docs, k, work)
    stage_sec = time.perf_counter() - t_stage

    # batch anchors over the SAME staged files: the registry operator's
    # verdicts, and the index size the final state must equal
    sf_like = work / "sf"
    sf_like.mkdir()
    (sf_like / "documents.parquet").symlink_to(flat, target_is_directory=True)
    batch_rows = {
        r["doc_id"]: (r["status"], r["match_doc_id"], r["n_band_hits"])
        for r in neardup_incremental_lsh(spark, str(sf_like)).collect()
    }
    staged = spark.read.schema(DOCS_DDL).parquet(str(flat))
    index_size = (
        banded_rows(staged)
        .where(F.col("is_corpus"))
        .select("band", "sig_key")
        .distinct()
        .count()
    )

    captured: list = []
    ckpt = work / "ckpt"
    t0 = time.perf_counter()
    q = (
        stream_neardup_incremental(
            spark,
            str(flat),
            DOCS_DDL,
            {"maxFilesPerTrigger": str(per_trigger)},
        )
        .writeStream.foreachBatch(
            lambda b, _i: captured.append(b.toPandas())
        )
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(3600), f"{k}x did not finish in 3600s"
        wall = time.perf_counter() - t0
        progresses = q.recentProgress
    finally:
        if q.isActive:
            q.stop()

    hits = pd.concat([c for c in captured if len(c)], ignore_index=True)
    stream_rows = {
        r["doc_id"]: (r["status"], r["match_doc_id"], r["n_band_hits"])
        for r in rollup_verdicts(
            spark.createDataFrame(
                hits.astype({"corpus_doc_id": "object"}),
                "doc_id long, band int, corpus_doc_id long",
            )
        ).collect()
    }

    peak_state = 0
    final_state: dict = {}
    for p in progresses:
        ops = p.get("stateOperators") or []
        if ops:
            rows = sum(o.get("numRowsTotal") or 0 for o in ops)
            peak_state = max(peak_state, rows)
            final_state = {
                "state_rows_final": rows,
                "state_memory_bytes": sum(
                    o.get("memoryUsedBytes") or 0 for o in ops
                ),
            }
    n_rows = base_rows * k
    results[f"{k}x"] = {
        "input_docs": n_rows,
        "incoming_docs": len(stream_rows),
        "stream_equals_batch": stream_rows == batch_rows,
        "batch_index_size": index_size,
        "state_rows_peak": peak_state,
        "state_equals_index": final_state.get("state_rows_final") == index_size,
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_rows / wall),
        "micro_batches": len(
            [p for p in progresses if p["numInputRows"] > 0]
        ),
        "stage_sec": round(stage_sec, 1),
        **final_state,
    }
    print(f"{k}x: {results[f'{k}x']}", flush=True)
    shutil.rmtree(work, ignore_errors=True)


def main() -> int:
    args = sys.argv[1:]
    decades = (
        [int(x) for x in args[args.index("--decades") + 1].split(",")]
        if "--decades" in args
        else [1, 10, 100]
    )

    from simple_map_reduce_ruuner_spark.session import get_spark
    from simple_map_reduce_ruuner_spark.sources.tables import load_table

    spark = get_spark(
        app_name="smrr-stream-neardup-scale",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    base_rows = docs.count()

    results: dict = {}
    for k in decades:
        run_one(spark, docs, base_rows, k, results)

    doc = {
        "query": "stream_neardup_incremental (LSH index as streaming state, "
        "append mode) vs batch neardup_incremental_lsh",
        "state_store_provider": "RocksDB",
        "base_sf_dir": SF_DIR,
        "base_docs": base_rows,
        "replica_salt": "doc_id += r*1e8 (slice-preserving); text salted "
        "per replica so the index honestly grows with distinct content",
        "runs": results,
        "claims": {
            "equivalence_all_decades": all(
                r["stream_equals_batch"] for r in results.values()
            ),
            "state_is_exactly_the_index_all_decades": all(
                r["state_equals_index"] for r in results.values()
            ),
        },
    }
    out = REPO / "STREAM_NEARDUP_SCALE_r15.json"
    out.write_text(json.dumps(doc, indent=1) + "\n")
    print(f"wrote {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
