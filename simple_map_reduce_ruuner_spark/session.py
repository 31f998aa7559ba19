"""SparkSession factory with scale-oriented defaults.

The reference engine's only physical knob is chunk size (``blockSize`` MB,
Master.java:45,93-95) — in Spark that is ``spark.sql.files.maxPartitionBytes``
(same line-aligned, size-bounded input splitting). Everything else the
reference hand-rolls (scheduling, shipping, gather) is Spark's scheduler.

Defaults chosen for the 100 TB design point, scaled down for local test:
- AQE on: runtime partition coalescing, skew-join splitting, and
  dynamic join-strategy switching replace hand-tuned shuffle counts.
- Session timezone pinned to UTC so timestamp-derived results are
  deterministic and match naive-timestamp oracles (DuckDB).
- Arrow enabled: every Python-boundary crossing (Pandas UDF, toPandas)
  is columnar-batched, never row-at-a-time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "simple-map-reduce-ruuner-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    chunk_mb: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``chunk_mb`` mirrors the reference's user-facing chunk-size knob
    (Master.java:82,93-95): it bounds input-split bytes, i.e. the size of
    the line-aligned chunk each (map) task consumes.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if chunk_mb is not None:
        builder = builder.config(
            "spark.sql.files.maxPartitionBytes", str(chunk_mb * 1024 * 1024)
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
