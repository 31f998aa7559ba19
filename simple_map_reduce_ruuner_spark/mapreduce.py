"""Generic external-process map/reduce surface — the reference's product.

The reference's entire user-facing capability (SURVEY.md §2.A A5/A8,
§2.B B14/B15) is: split a text file into line-aligned chunks, run an
arbitrary user *mapper* program over each chunk, concatenate the outputs,
and run an arbitrary user *reducer* program once over the concatenation
(exec contract: Worker.java:134-160 for the map side, Master.java:182-208
for the reduce side). Correct user programs therefore compute
chunk-partial → global-final algebraic aggregations (SURVEY.md §1.4).

Spark-native equivalents provided here:

- :func:`pipe_map_reduce` — exact fidelity. ``RDD.pipe`` execs the user
  command once per partition, streaming the partition's lines to stdin
  and reading result lines from stdout (the reference ships files via
  HTTP + argv instead of stdin/stdout; semantics are identical: a whole
  chunk in, result lines out). The reduce command runs on a single
  coalesced partition, exactly like the reference's one reducer on the
  master. Mapper parallelism scales with partitions; the single reducer
  is the same serial bottleneck the reference has — by design.

- :func:`map_reduce_in_pandas` — idiomatic fidelity. The same
  chunk-partial/global-final contract with Python callables over Arrow
  batches (``mapInPandas``), no process spawn per partition.

At 100 TB: ``pipe`` maps are embarrassingly parallel (one exec per
partition, ~maxPartitionBytes-sized). The global single reduce only works
when the mapped output is small (aggregated partials); that is exactly
the reference's implicit contract, and callers needing distributed
reduction should express it as ``groupBy().agg()`` instead (every named
query in the registry does).
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from simple_map_reduce_ruuner_spark.sources.tables import ckpt


def pipe_map_reduce(
    df: DataFrame,
    mapper_cmd: str,
    reducer_cmd: str,
    input_col: str | None = None,
    num_chunks: int | None = None,
) -> DataFrame:
    """Run external map/reduce programs over a text DataFrame.

    Programs read lines on stdin and write lines to stdout (the pipe
    twin of the reference's ``<prog> <in_file> <out_file>`` contract).

    :param df: input; one text column (or name it via ``input_col``).
    :param mapper_cmd: shell command run once per chunk/partition.
    :param reducer_cmd: shell command run once, globally.
    :param num_chunks: optional repartition before mapping — the
        reference's ``chunk_size`` knob expressed in partition count.
    """
    col = input_col or df.columns[0]
    # NULL text rows must not reach the pipe: RDD.pipe stringifies None
    # into a literal "None" line the mapper would count as real data
    # (review-found; spark.read.text never yields NULLs but parquet
    # sources can).
    lines = (
        df.select(col).rdd.map(lambda r: r[0]).filter(lambda v: v is not None)
    )
    if num_chunks is not None:
        lines = lines.repartition(num_chunks)
    # checkCode=True: a nonzero mapper/reducer exit fails the task — the
    # job-status twin of the reference's "something wrong!" report
    # (Worker.java:154-158); without it pipe swallows failures as empty
    # output.
    from pyspark import StorageLevel

    # MEMORY_AND_DISK, not the default MEMORY_ONLY: if cached map output
    # were evicted under memory pressure, the coalesce(1) reduce task
    # would recompute the evicted blocks inline — silently re-serializing
    # every mapper onto one core (the exact bottleneck the count() below
    # exists to avoid) AND re-executing mapper subprocesses, which for a
    # non-deterministic or side-effecting mapper diverges from the pass
    # that was counted (advice r5). Disk spill keeps the materialized
    # output authoritative.
    mapped = lines.pipe(mapper_cmd, checkCode=True).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # Materialize the map phase BEFORE the single-partition reduce: a
    # bare coalesce(1) is a narrow dependency that would pull every
    # chunk's pipe into ONE task, serializing all mappers on one core
    # (review-found — the exact bottleneck the reference avoids with
    # per-worker dispatch, Master.java:212-224). With the mapped RDD
    # persisted and computed, coalesce(1) just concatenates the cached
    # blocks in partition order — same deterministic line order, but
    # the mapper processes ran one-per-partition in parallel. RDD
    # persistence is ContextCleaner-managed: blocks free once the
    # result drops its lineage reference.
    mapped.count()
    # Global single reduce (reference Master.java:182-208): all mapped
    # partials to one partition, one reducer process.
    reduced = mapped.coalesce(1).pipe(reducer_cmd, checkCode=True)
    spark = df.sparkSession
    return spark.createDataFrame(reduced.map(lambda l: (l,)), "line: string")


def argv_file_command(program_cmd: str, out_dir: str | None = None) -> str:
    """Bridge a ``<prog> <in_file> <out_file>`` program (the reference's
    exec contract, Worker.java:134-160) onto the stdin/stdout pipe surface
    — so the reference's OWN example programs run unmodified.

    Generates a tiny shell shim that spools the partition's stdin to a
    temp file, execs the program with (in, out) argv paths, and emits the
    output file to stdout. The program's own stdout is diverted to stderr
    (reference programs write results only to the out file). Nonzero exit
    propagates so ``pipe(checkCode=True)`` surfaces failures the way the
    reference master reports "something wrong!" (Worker.java:154-158).

    A generated script file (not an inline ``sh -c`` string) because
    ``RDD.pipe`` tokenizes its command on whitespace. On a real cluster
    ship it with ``SparkContext.addFile`` like any user binary.
    """
    import tempfile

    out_dir = out_dir or tempfile.mkdtemp(prefix="smrr_argv_")
    script = os.path.join(out_dir, "argv_shim.sh")
    with open(script, "w") as fh:
        fh.write(
            "#!/bin/sh\n"
            'i=$(mktemp) || exit 1\no=$(mktemp) || exit 1\n'
            'cat > "$i"\n'
            f'{program_cmd} "$i" "$o" 1>&2\n'
            "rc=$?\n"
            '[ "$rc" -eq 0 ] && cat "$o"\n'
            'rm -f "$i" "$o"\n'
            'exit "$rc"\n'
        )
    os.chmod(script, 0o755)
    return f"/bin/sh {script}"


def compile_cpp_program(source_path: str, out_dir: str | None = None) -> str:
    """Compile a user C++ map/reduce program, mirroring the reference
    worker's compile step (``g++ --std=c++11``, Worker.java:146-151).
    Returns the binary path, usable as a ``pipe_map_reduce`` command.

    On a real cluster the binary must be shipped to executors
    (``spark.sparkContext.addFile``) or built on a shared volume; in
    local mode the filesystem is shared.
    """
    import subprocess
    import tempfile

    out_dir = out_dir or tempfile.mkdtemp(prefix="smrr_cpp_")
    binary = os.path.join(out_dir, "program.out")
    subprocess.run(
        ["g++", "--std=c++11", "-O2", "-o", binary, source_path],
        check=True,
        capture_output=True,
    )
    return binary


MapFn = Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]


def map_reduce_in_pandas(
    df: DataFrame,
    mapper: MapFn,
    reducer: MapFn,
    map_schema: str,
    out_schema: str,
) -> DataFrame:
    """Chunk-partial → global-final contract with Python callables.

    ``mapper`` sees each partition as an iterator of Arrow-backed pandas
    batches (= the reference mapper seeing a whole chunk file);
    ``reducer`` sees every mapped row in one partition (= the reference's
    single reducer over the concatenation).
    """
    # localCheckpoint (eager) keeps the map phase parallel: coalescing
    # the un-materialized frame would narrow the mapper into the single
    # reduce task (same defect as pipe_map_reduce's, review-found).
    mapped = ckpt(df.mapInPandas(mapper, schema=map_schema))
    return mapped.coalesce(1).mapInPandas(reducer, schema=out_schema)
