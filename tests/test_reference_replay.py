"""Verbatim replay of the reference's OWN example programs through run_job.

The reference ships four workloads (`exampleCodes/*`), each a
``<prog> <in_file> <out_file>`` mapper+reducer pair. These tests execute
those exact source files UNMODIFIED (``argv_files=True`` bridges the argv
contract onto the pipe surface) through the full distributed pipeline:
chunked read → per-chunk mapper exec → merge → single reducer exec.

Three of the four reference inputs were stripped from the repo
(/root/reference/.MISSING_LARGE_BLOBS), so word_count / char_count /
finding_peek_numbers run on synthesized inputs per FIXTURES.md and are
checked DIFFERENTIALLY against the engine's DataFrame twins — the same
answer must come out of the reference's single-machine programs (run
distributed over chunks) and the declarative Spark plan.
finding_the_suspects still has its committed 123,456-row input + golden
output, so it replays reference-exact end to end.
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.engine import run_job

REF = "/root/reference/exampleCodes"
NAMES = ["akbar", "alireza", "armin", "hooman", "melika", "milad"]


def _ref(path: str) -> str:
    full = f"{REF}/{path}"
    if not os.path.exists(full):
        pytest.skip(f"reference source {path} not present")
    return full


# --------------------------------------------------------------------------
# workload 1: word_count (C++ mapper + C++ reducer)
# --------------------------------------------------------------------------


def _write_words(path: str, n_tokens: int = 300_000) -> None:
    """FIXTURES.md §1: tokens uniform over the name vocabulary, ~10/line.
    ~2 MB so chunk_mb=1 forces several mapper chunks."""
    rng = random.Random(7)
    with open(path, "w") as fh:
        for _ in range(n_tokens // 10):
            fh.write(" ".join(rng.choice(NAMES) for _ in range(10)) + "\n")


def test_replay_word_count_cpp(spark, tmp_path):
    data = str(tmp_path / "words.txt")
    _write_words(data)
    result = run_job(
        spark,
        data_path=data,
        mapper_src=_ref("word_count/mapper.cpp"),
        reducer_src=_ref("word_count/reducer.cpp"),
        lang="cpp",
        chunk_mb=1,
        argv_files=True,
    )
    got = {
        (w, int(c))
        for w, c in (r.line.rsplit(" ", 1) for r in result.collect())
    }

    from simple_map_reduce_ruuner_spark.operators.wordcount import word_count_df

    lines = spark.read.text(data).withColumnRenamed("value", "text")
    expected = {(r.word, r.cnt) for r in word_count_df(lines).collect()}
    assert got == expected
    assert len(got) == len(NAMES)


# --------------------------------------------------------------------------
# workload 2: char_count (python mapper + python reducer)
# --------------------------------------------------------------------------


def test_replay_char_count_py(spark, tmp_path):
    # FIXTURES.md §2: one token per line (the golden output has no space
    # row, so the original input had no intra-line spaces).
    data = str(tmp_path / "chars.txt")
    rng = random.Random(11)
    with open(data, "w") as fh:
        for _ in range(200_000):
            fh.write(rng.choice(NAMES) + "\n")
    result = run_job(
        spark,
        data_path=data,
        mapper_src=_ref("char_count/mapper.py"),
        reducer_src=_ref("char_count/reduce.py"),
        lang="py",
        chunk_mb=1,
        argv_files=True,
    )
    got = {
        (ch, int(c))
        for ch, c in (r.line.rsplit(" ", 1) for r in result.collect())
    }

    from simple_map_reduce_ruuner_spark.operators.wordcount import char_count_df

    lines = spark.read.text(data).withColumnRenamed("value", "text")
    expected = {(r.ch, r.cnt) for r in char_count_df(lines).collect()}
    assert got == expected
    assert len(got) == 13  # letters of the 6-name vocabulary


# --------------------------------------------------------------------------
# workload 3: finding_peek_numbers (C++ mapper + C++ reducer — the
# hardest reference program: per-second distinct sets, chunk-partial
# merge by the reducer's own set union)
# --------------------------------------------------------------------------


def _write_calls(path: str, n_rows: int = 40_000) -> None:
    """FIXTURES.md §3: op number start end; inclusive intervals inside
    0..86399; overlapping intervals for the same (op, number) MUST occur
    (the reference dedups them — the key semantic under test)."""
    rng = random.Random(13)
    ops = ["mci", "mtn", "rtl"]
    with open(path, "w") as fh:
        for _ in range(n_rows):
            op = rng.choice(ops)
            number = f"09{rng.randrange(200):07d}"  # small pool → overlaps
            st = rng.randrange(0, 86_000)
            en = min(st + 1 + int(rng.expovariate(1 / 100)), 86_399)
            fh.write(f"{op} {number} {st} {en}\n")


def test_replay_peek_numbers_cpp(spark, tmp_path):
    data = str(tmp_path / "calls.txt")
    _write_calls(data)
    result = run_job(
        spark,
        data_path=data,
        mapper_src=_ref("finding_peek_numbers/mapper.cpp"),
        reducer_src=_ref("finding_peek_numbers/reducer.cpp"),
        lang="cpp",
        chunk_mb=1,
        argv_files=True,
    )
    got = {}
    for r in result.collect():
        op, peak = r.line.split(": ")
        got[op] = int(peak)

    # DataFrame twin: interval→point expansion (B7), COUNT DISTINCT per
    # (op, second) (B8), MAX over seconds (B9) — the declarative form of
    # the reference's s[86400] set array.
    calls = (
        spark.read.text(data)
        .select(F.split("value", " ").alias("t"))
        .select(
            F.col("t").getItem(0).alias("op"),
            F.col("t").getItem(1).alias("number"),
            F.col("t").getItem(2).cast("int").alias("st"),
            F.col("t").getItem(3).cast("int").alias("en"),
        )
    )
    expected = {
        r.op: r.peak
        for r in (
            calls.select("op", "number", F.explode(F.sequence("st", "en")).alias("sec"))
            .groupBy("op", "sec")
            .agg(F.countDistinct("number").alias("n"))
            .groupBy("op")
            .agg(F.max("n").alias("peak"))
        ).collect()
    }
    assert got == expected
    assert set(got) == {"mci", "mtn", "rtl"}
    # peaks must be genuine (nonzero, below pool size) for the test to
    # have discriminating power
    assert all(0 < p < 200 for p in got.values())


def test_replay_peek_numbers_is_chunk_size_invariant(spark, tmp_path):
    """The reference's one physical knob is chunk_mb (Master.java:45,
    93-95): it changes how many mapper chunks the input splits into, and
    MUST NOT change the answer. peek-numbers is the adversarial case —
    its per-chunk mapper output is per-second SETS whose merge is the
    reducer's own set union, so a broken chunk-partial contract (e.g.
    double-counting a number seen in two chunks) shows up immediately.
    Pins the engine's partial-merge contract across 1 MB (many chunks)
    and the default (one chunk at this size)."""
    data = str(tmp_path / "calls.txt")
    _write_calls(data, n_rows=20_000)

    def peaks_at(chunk_mb: int) -> dict[str, int]:
        result = run_job(
            spark,
            data_path=data,
            mapper_src=_ref("finding_peek_numbers/mapper.cpp"),
            reducer_src=_ref("finding_peek_numbers/reducer.cpp"),
            lang="cpp",
            chunk_mb=chunk_mb,
            argv_files=True,
        )
        out = {}
        for r in result.collect():
            op, peak = r.line.split(": ")
            out[op] = int(peak)
        return out

    from simple_map_reduce_ruuner_spark.engine import DEFAULT_CHUNK_MB

    small = peaks_at(1)
    assert small == peaks_at(DEFAULT_CHUNK_MB)
    assert set(small) == {"mci", "mtn", "rtl"}
    assert all(0 < p < 200 for p in small.values())


# --------------------------------------------------------------------------
# workload 4: finding_the_suspects — reference programs + reference input
# + reference golden output (fully verbatim)
# --------------------------------------------------------------------------


def test_replay_suspects_reference_programs_golden(spark, tmp_path):
    sample = _ref("finding_the_suspects/sample.data")
    out = str(tmp_path / "final_result.out")
    run_job(
        spark,
        data_path=sample,
        mapper_src=_ref("finding_the_suspects/mapper.py"),
        reducer_src=_ref("finding_the_suspects/reducer.py"),
        lang="py",
        chunk_mb=1,
        out_path=out,
        argv_files=True,
    )

    def load(path):
        rows = set()
        with open(path) as fh:
            for line in fh:
                toks = line.split()
                if toks:
                    rows.add((toks[0], frozenset(toks[1:])))
        return rows

    assert load(out) == load(f"{REF}/finding_the_suspects/final_result.out")
