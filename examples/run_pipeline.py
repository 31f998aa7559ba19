#!/usr/bin/env python
"""End-to-end example: drive the engine the way a reference user would.

A Simple-Map-Reduce-Ruuner user submits (data, mapper, reducer) and gets
one output file; this script shows both that exact surface AND the
engine's full curation pipeline on the same session:

1. reference-style job: word_count through run_job (external programs,
   chunked map, single reduce, one text file out);
2. curation: quality filter + dedup + stratified sample over the
   documents table, written as lang-partitioned parquet.

Usage:
    python examples/run_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.engine import job_status, run_job
from simple_map_reduce_ruuner_spark.operators.pipeline import (
    corpus_clean,
    stratified_sample,
)
from simple_map_reduce_ruuner_spark.session import get_spark
from simple_map_reduce_ruuner_spark.sources.tables import load_table

EXAMPLES = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/smrr_pipeline_out"
    spark = get_spark(app_name="smrr-example")
    spark.sparkContext.setLogLevel("ERROR")

    # -- 1. the reference's own surface: external map/reduce job ---------
    data = os.path.join(out_dir, "docs.txt")
    os.makedirs(out_dir, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents")
    with open(data, "w") as fh:
        for r in docs.select("text").toLocalIterator():
            fh.write(r.text + "\n")
    result_file = run_job(
        spark,
        data_path=data,
        mapper_src=os.path.join(EXAMPLES, "wordcount_mapper.py"),
        reducer_src=os.path.join(EXAMPLES, "wordcount_reducer.py"),
        lang="py",
        chunk_mb=1,
        out_path=os.path.join(out_dir, "final_result.out"),
    )
    print(f"[1] reference-style job -> {result_file}  ({job_status(spark)['phase']})")

    # -- 2. curation pipeline over the same corpus ----------------------
    cleaned = corpus_clean(spark, sf_dir)
    sampled = stratified_sample(spark, sf_dir).select("doc_id", "lang")
    final = cleaned.join(sampled, "doc_id").join(
        docs.select("doc_id", "text"), "doc_id"
    )
    out_parquet = os.path.join(out_dir, "curated_corpus")
    final.write.mode("overwrite").partitionBy("lang").parquet(out_parquet)
    kept = spark.read.parquet(out_parquet)
    print(
        f"[2] curated corpus -> {out_parquet}: "
        f"{kept.count()} of {docs.count()} docs kept; per-lang "
        f"{sorted((r.lang, r.n) for r in kept.groupBy('lang').agg(F.count(F.lit(1)).alias('n')).collect())}"
    )


if __name__ == "__main__":
    main()
