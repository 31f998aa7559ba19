"""Structured Streaming equivalence: the streaming tumbling-window query
over a file source must produce exactly the batch query's result on the
same snapshot (availableNow trigger), and watermarking must drop
late-beyond-watermark data in update-free append mode."""

from __future__ import annotations

import os
import shutil

from simple_map_reduce_ruuner_spark.sources.tables import load_table
from simple_map_reduce_ruuner_spark.streaming.windows import (
    stream_tumbling_counts,
    tumbling_counts,
)


def test_stream_tumbling_equals_batch(spark, sf_dir, tmp_path):
    # Stage the events snapshot as a stream-source directory with a
    # normalized (ntz) schema — the same rows the batch query reads.
    src_dir = str(tmp_path / "events_stream")
    ckpt = str(tmp_path / "ckpt")
    load_table(spark, sf_dir, "events").coalesce(2).write.parquet(src_dir)

    q = (
        stream_tumbling_counts(spark, src_dir)
        .writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.wstart, r.event_type, r.n, r.sum_value)
        for r in spark.sql("select * from tumbling_test").collect()
    }
    expected = {
        (r.wstart, r.event_type, r.n, r.sum_value)
        for r in tumbling_counts(spark, sf_dir).collect()
    }
    assert got == expected
    shutil.rmtree(src_dir, ignore_errors=True)
