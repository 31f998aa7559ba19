"""The reference's end-to-end job surface as one call.

A reference "job" is (data file, mapper program, reducer program,
language, chunk MB) submitted over HTTP (Master.java:87-129); the result
is a downloadable text file. :func:`run_job` is that exact surface on
Spark:

    run_job(spark, data_path, mapper_src, reducer_src,
            lang="py"|"cpp", chunk_mb=10, out_path=...)

pipeline: chunked line-aligned text read (A1) → per-chunk external map
(A5, ``RDD.pipe``) → global single reduce (A7+A8, ``coalesce(1).pipe``)
→ single text file (A9). Programs use the stdin/stdout pipe contract
(the reference ships argv files; semantics identical — whole chunk in,
result lines out). C++ sources are compiled like the reference worker
does (Worker.java:146-151).

The one difference from a 100 TB engine: the single global reducer is
kept deliberately for contract fidelity — it is only correct/fast when
mappers emit compact partials (SURVEY.md §1.4), which is also exactly
when the reference itself is correct. Scale users express the reduce as
``groupBy().agg()`` (every registry query).
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession

from simple_map_reduce_ruuner_spark.mapreduce import (
    compile_cpp_program,
    pipe_map_reduce,
)
from simple_map_reduce_ruuner_spark.sources.text import (
    DEFAULT_CHUNK_MB,
    read_text_chunked,
    write_text_single,
)


def _as_command(src_path: str, lang: str) -> str:
    if lang == "py":
        return f"{sys.executable} {src_path}"
    if lang == "cpp":
        return compile_cpp_program(src_path)
    raise ValueError(f"unsupported lang {lang!r}: expected 'py' or 'cpp'")


def run_job(
    spark: SparkSession,
    data_path: str,
    mapper_src: str,
    reducer_src: str,
    lang: str = "py",
    chunk_mb: int = DEFAULT_CHUNK_MB,
    out_path: str | None = None,
    mapper_lang: str | None = None,
    reducer_lang: str | None = None,
) -> DataFrame | str:
    """Run a full reference-style job. Returns the result DataFrame, or
    writes ``out_path`` (the reference's final_result.out) and returns
    its path. ``mapper_lang``/``reducer_lang`` override ``lang`` per
    program (the reference fixes one language per job; we allow mixing).
    """
    mapper_cmd = _as_command(mapper_src, mapper_lang or lang)
    reducer_cmd = _as_command(reducer_src, reducer_lang or lang)
    lines = read_text_chunked(spark, data_path, chunk_mb=chunk_mb)
    result = pipe_map_reduce(lines, mapper_cmd, reducer_cmd)
    if out_path is None:
        return result
    return write_text_single(result, out_path)
