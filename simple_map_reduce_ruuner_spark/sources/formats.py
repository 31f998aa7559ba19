"""CSV / JSON / Parquet source-sink round-trips.

The reference ingests only uploaded text (SURVEY.md §2.C "scans/sources:
text upload only") and emits only a single text file. This module is the
engine's typed source/sink surface:

- explicit-schema readers (never infer on the hot path: schema inference
  scans the data once before the real scan — at 100 TB that doubles I/O);
- writers with partitioning hooks (``partition_by``), the unit of
  pruning for downstream consumers.

All formats round-trip the same DataFrame; tests assert scan equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str, header: bool = True
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def read_csv_quarantine(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> DataFrame:
    """PERMISSIVE CSV parse with malformed rows captured in
    ``_corrupt_record`` instead of failing the job — the quarantine
    pattern for dirty inputs: at 100 TB a handful of bad rows must not
    kill a multi-hour job, but they must stay auditable (filter
    ``_corrupt_record IS NOT NULL`` → quarantine sink). Use FAILFAST
    (``spark.read.option("mode", "FAILFAST")``) only when corruption
    should abort."""
    return (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """ORC sink (built into Spark, no extra package): same columnar
    pushdown/pruning properties as parquet for ORC-standardized shops."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 128,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into files of
    roughly ``target_file_mb`` each and return the output file count.

    The operational staple for streaming/incremental sinks — micro-batch
    and per-task writers leave thousands of tiny files, and at 100 TB an
    uncompacted table bottlenecks every subsequent scan on file-open
    overhead and driver-side listing. Sizing comes from the actual input
    bytes (file-system metadata, no Spark job), and the rewrite is one
    round-robin repartition — no shuffle key needed, every output file
    lands within a task.
    """
    import glob as _glob
    import os as _os

    total_bytes = sum(
        _os.path.getsize(f)
        for f in _glob.glob(_os.path.join(src_path, "**", "*.parquet"), recursive=True)
    ) or 1
    n_files = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_path)
    df.repartition(int(n_files)).write.mode("overwrite").parquet(dst_path)
    return int(n_files)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob_filter: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Whole-file multimodal ingest via Spark's ``binaryFile`` source:
    one row per file with (path, modificationTime, length, content) —
    the standard entry point for image/audio corpora before they are
    repacked into parquet binary columns (operators/multimodal.py picks
    up from there).

    ``glob_filter`` (e.g. ``*.jpg``) prunes at FILE LISTING time —
    non-matching files are never opened; ``max_bytes`` pushes a
    ``length`` predicate into the reader so oversized blobs are skipped
    before their content is materialized (binaryFile supports exactly
    this pushdown on the length column). At 100 TB the repack matters:
    millions of loose files pay per-object listing and open costs on
    every scan, so this reader should run ONCE per ingest, writing
    size-bounded parquet (see ``compact_parquet``).
    """
    reader = spark.read.format("binaryFile")
    if glob_filter is not None:
        reader = reader.option("pathGlobFilter", glob_filter)
    df = reader.load(path)
    if max_bytes is not None:
        from pyspark.sql import functions as F

        df = df.where(F.col("length") <= max_bytes)
    return df


def overwrite_partitions_dynamic(df: DataFrame, path: str, partition_col: str) -> None:
    """Incremental backfill primitive: rewrite ONLY the partitions
    present in ``df`` (dynamic partition overwrite), leaving every other
    partition's files untouched.

    This is how a 100 TB rollup absorbs late or corrected data: the
    static ``overwrite`` mode would truncate the whole table, and
    append would duplicate the reprocessed days. ``partitionOverwriteMode
    =dynamic`` scopes the delete-and-replace to exactly the partition
    values the incoming frame contains — O(changed days), not O(table).
    Set per-write via option so the session default stays untouched.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
