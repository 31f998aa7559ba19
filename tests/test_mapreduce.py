"""Generic map/reduce surface tests, including verbatim replay of the one
reference workload whose input survives in the repo
(exampleCodes/finding_the_suspects: sample.data + golden final_result.out).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.mapreduce import (
    map_reduce_in_pandas,
    pipe_map_reduce,
)
from simple_map_reduce_ruuner_spark.operators.suspects import suspects_df
from simple_map_reduce_ruuner_spark.operators.wordcount import word_count_df
from simple_map_reduce_ruuner_spark.sources.tables import load_table

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
REF_SUSPECTS = "/root/reference/exampleCodes/finding_the_suspects"


def test_pipe_map_reduce_matches_dataframe_wordcount(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    import sys

    mapper = f"{sys.executable} {EXAMPLES}/wordcount_mapper.py"
    reducer = f"{sys.executable} {EXAMPLES}/wordcount_reducer.py"
    piped = pipe_map_reduce(docs.select("text"), mapper, reducer, num_chunks=4)
    got = {
        tuple(line.rsplit(" ", 1)) for line in (r.line for r in piped.collect())
    }
    expected = {
        (r.word, str(r.cnt)) for r in word_count_df(docs).collect()
    }
    assert got == expected


def test_pipe_cpp_mapper(spark, sf_dir, tmp_path):
    """The reference's C++ path (Worker.java:146-153): compile a user C++
    mapper, pipe chunks through the binary, reduce with the Python
    reducer — language-mixing exactly as the reference allows."""
    import sys

    from simple_map_reduce_ruuner_spark.mapreduce import compile_cpp_program

    binary = compile_cpp_program(f"{EXAMPLES}/wordcount_mapper.cpp", str(tmp_path))
    docs = load_table(spark, sf_dir, "documents")
    piped = pipe_map_reduce(
        docs.select("text"),
        binary,
        f"{sys.executable} {EXAMPLES}/wordcount_reducer.py",
        num_chunks=4,
    )
    got = {tuple(line.rsplit(" ", 1)) for line in (r.line for r in piped.collect())}
    expected = {(r.word, str(r.cnt)) for r in word_count_df(docs).collect()}
    assert got == expected


def test_map_reduce_in_pandas_wordcount(spark, sf_dir):
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")

    def mapper(batches):
        from collections import Counter

        counts: Counter = Counter()
        for pdf in batches:
            for text in pdf["text"]:
                counts.update(text.lower().split())
        yield pd.DataFrame(
            {"word": list(counts.keys()), "cnt": list(counts.values())}
        )

    def reducer(batches):
        acc: dict[str, int] = {}
        for pdf in batches:
            for word, cnt in zip(pdf["word"], pdf["cnt"]):
                acc[word] = acc.get(word, 0) + int(cnt)
        yield pd.DataFrame({"word": list(acc.keys()), "cnt": list(acc.values())})

    result = map_reduce_in_pandas(
        docs.select("text"), mapper, reducer, "word string, cnt long", "word string, cnt long"
    )
    got = {(r.word, r.cnt) for r in result.collect()}
    expected = {(r.word, r.cnt) for r in word_count_df(docs).collect()}
    assert got == expected


@pytest.mark.skipif(
    not os.path.exists(f"{REF_SUSPECTS}/sample.data"),
    reason="reference fixture not present",
)
def test_suspects_golden_replay(spark):
    """Replay the reference's own 123,456-row input through our suspects
    operator and compare against its committed golden output
    (final_result.out, 17 groups; row and city order insignificant)."""
    raw = spark.read.text(f"{REF_SUSPECTS}/sample.data")
    parts = F.split(F.col("value"), r"\s+")
    df = raw.select(
        parts.getItem(0).alias("name"),
        parts.getItem(1).alias("family"),
        parts.getItem(2).alias("city"),
        parts.getItem(3).cast("int").alias("year"),
    )
    result = {
        (r.key, frozenset(r.cities)) for r in suspects_df(df).collect()
    }

    golden = set()
    with open(f"{REF_SUSPECTS}/final_result.out") as fh:
        for line in fh:
            toks = line.split()
            if not toks:
                continue
            golden.add((toks[0], frozenset(toks[1:])))

    assert result == golden


def test_char_count_kernel_matches_explode(spark, sf_dir):
    """The Arrow bincount kernel behind the char_count registry query is
    value-identical to the explode/groupBy reference formulation
    (char_count_df) — including newline exclusion, multi-byte chars,
    and empty/null text rows."""
    from simple_map_reduce_ruuner_spark.operators.wordcount import (
        char_count_df,
        char_count_kernel_df,
    )
    from simple_map_reduce_ruuner_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    want = {(r.ch, r.cnt) for r in char_count_df(docs).collect()}
    got = {(r.ch, r.cnt) for r in char_count_kernel_df(docs).collect()}
    assert got == want
    # \U0001F600 exercises the supplementary plane: the kernel counts
    # UTF-32 code points while the explode form relies on Spark/Java
    # split('') not splitting surrogate pairs — the one Unicode regime
    # where the two formulations could plausibly diverge.
    extra = spark.createDataFrame(
        [(1, "a\nb\nß €€ a"), (2, ""), (3, None), (4, "\U0001F600x\U0001F600")],
        "doc_id long, text string",
    )
    want2 = {(r.ch, r.cnt) for r in char_count_df(extra).collect()}
    got2 = {(r.ch, r.cnt) for r in char_count_kernel_df(extra).collect()}
    assert got2 == want2 and ("\n", 2) not in got2 and got2
    assert ("\U0001F600", 2) in got2
