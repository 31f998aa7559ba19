"""Bucketed tables: co-located joins without a per-query exchange.

At 100 TB, a repeated fact⋈fact join (lineitem⋈orders on orderkey)
shuffles both inputs on every query. Writing both tables bucketed on the
join key moves that shuffle to write time: Spark records the bucket
spec in the catalog and the join planner reuses the hash-partitioned
layout — `tests/test_bucketing.py` asserts the join plan contains no
Exchange on the bucketed path and one Exchange per side on the
non-bucketed path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_keys: list[str],
    n_buckets: int,
    sort_keys: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist df as a bucketed (and optionally sorted) catalog table.
    Sorting within buckets additionally removes the SMJ's per-task sort.
    ``path`` makes it an external table (warehouse.dir is a static conf,
    so tests point tables at temp dirs this way)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_keys)
    if sort_keys:
        w = w.sortBy(*sort_keys)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
