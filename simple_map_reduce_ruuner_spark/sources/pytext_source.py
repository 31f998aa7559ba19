"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API):
the reference's chunked text intake as a first-class pluggable source.

The reference master shreds an uploaded file into line-aligned chunks of
at most ``chunk_size`` MB and hands one chunk to each worker
(Master.java:226-247 ``shredDateFile``). ``read_text_chunked``
(sources/text.py) maps that onto Spark's built-in text reader via
``maxPartitionBytes``; this module re-expresses the SAME contract
through the official Python DataSource extension point, proving the
engine can host user-defined sources, not just ship built-ins:

- planning happens on the driver: ``ChunkedTextReader.partitions``
  computes byte ranges of ~chunk_mb MB (exactly the reference's shred
  loop, but returning offsets instead of writing chunk files);
- each executor task opens the file independently, seeks to its range,
  aligns to the next newline boundary, and yields its lines — no task
  reads another task's bytes, and no torn lines (the reference
  guarantees the same by growing each chunk to the line end,
  Master.java:234-239).

Usage::

    spark.dataSource.register(ChunkedTextDataSource)
    df = (spark.read.format("smrr_chunked_text")
          .option("path", "/data/corpus.txt")
          .option("chunk_mb", "10").load())

Deployment note: DataSource classes are module-level (the format is
registered by class), so cloudpickle serializes them BY REFERENCE —
executors must be able to import this package (PYTHONPATH or
spark.submit.pyFiles), unlike the repo's closure-pickled UDFs which
ship by value.

Scale note: a pure-Python source runs row-at-a-time through the Python
worker — fine for intake/ingest plumbing and odd formats, but parquet/
text built-ins stay the hot path (JVM, vectorized). That trade is the
point of the demo: the extension API is for formats Spark lacks, not
for replacing what it has.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StringType, StructField, StructType

from simple_map_reduce_ruuner_spark.sources.text import DEFAULT_CHUNK_MB  # Master.java:45


class _ByteRange(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class ChunkedTextReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("smrr_chunked_text requires .option('path', ...)")
        self.chunk_bytes = int(
            float(options.get("chunk_mb", DEFAULT_CHUNK_MB)) * 1024 * 1024
        )

    def partitions(self):
        size = os.path.getsize(self.path)
        if size == 0:
            return [_ByteRange(self.path, 0, 0)]
        starts = list(range(0, size, self.chunk_bytes))
        return [
            _ByteRange(self.path, s, min(s + self.chunk_bytes, size))
            for s in starts
        ]

    def read(self, partition: _ByteRange):
        # Line alignment contract: a task owns every line whose FIRST byte
        # lies in [start, end) — except byte 0's owner, every task skips
        # the (possibly partial) line in progress at its start offset and
        # reads past `end` to finish its final line. Identical coverage
        # rule to both the reference's shred loop and Hadoop TextInputFormat.
        with open(partition.path, "rb") as fh:
            if partition.start > 0:
                fh.seek(partition.start - 1)
                fh.readline()  # consume to the end of the straddling line
            while fh.tell() < partition.end:
                line = fh.readline()
                if not line:
                    break
                yield (line.rstrip(b"\r\n").decode("utf-8", errors="replace"),)


class ChunkedTextDataSource(DataSource):
    @classmethod
    def name(cls):
        return "smrr_chunked_text"

    def schema(self):
        return StructType([StructField("value", StringType(), True)])

    def reader(self, schema):
        return ChunkedTextReader(self.options)
