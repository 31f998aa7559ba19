#!/usr/bin/env python
"""End-to-end example: assemble a training set from a curated corpus.

The last mile after curation (see run_pipeline.py): decontaminate
against the held-out eval slice, assign reproducible train/val/test
splits, pack documents into fixed token-budget bins, and emit the
vocabulary — the artifacts a pretraining data loader consumes.

1. contamination_check — drop documents sharing an n-gram with the
   eval slice;
2. dataset_split ⋈ sequence_pack_bins — split-labelled, bin-addressed
   manifest written as split-partitioned parquet;
3. vocab_build — top-V vocabulary with stable ids, one parquet file.

Every stage is a verified registry operator; this script only composes
them (the composition itself stays one declarative plan per output).

Usage:
    python examples/run_training_prep.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.operators.mixing import contamination_check
from simple_map_reduce_ruuner_spark.operators.training import (
    dataset_split,
    sequence_pack_bins,
    vocab_build,
)
from simple_map_reduce_ruuner_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/smrr_training_prep"
    spark = get_spark(app_name="smrr-training-prep")
    spark.sparkContext.setLogLevel("WARN")

    contaminated = contamination_check(spark, sf_dir).select("doc_id")
    manifest = (
        dataset_split(spark, sf_dir)
        .join(contaminated, "doc_id", "left_anti")
        .join(sequence_pack_bins(spark, sf_dir), ["doc_id", "lang"])
    )
    manifest.write.mode("overwrite").partitionBy("split").parquet(
        f"{out_dir}/manifest"
    )
    vocab_build(spark, sf_dir).coalesce(1).write.mode("overwrite").parquet(
        f"{out_dir}/vocab"
    )

    m = spark.read.parquet(f"{out_dir}/manifest")
    counts = {
        r["split"]: r["n"]
        for r in m.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    v = spark.read.parquet(f"{out_dir}/vocab").count()
    print(f"manifest rows by split: {counts}")
    print(f"vocabulary size: {v}")
    print(f"outputs under {out_dir}")


if __name__ == "__main__":
    main()
