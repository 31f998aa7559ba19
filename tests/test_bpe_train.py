"""bpe_train_merges: the iterative BPE trainer (textlm.py).

Oracle parity at both sfs is covered by the sweep; these pin the two
load-bearing mechanisms the oracle agrees on but doesn't EXPLAIN: the
greedy non-overlap replace semantics both engines must share, and the
consistency of step 1 with the verified one-step statistic."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


def test_replace_is_greedy_left_to_right_in_both_engines(spark):
    """The merge rule rides string replace; BPE's greedy semantics
    ("aaa" + merge (a,a) -> [aa, a], "abab" -> [ab, ab]) hold only if
    both engines substitute non-overlapping occurrences left to right.
    A differential pin, since neither engine documents this promise."""
    cases = [
        ("XaXXaXXaX", "XaXXaX", "XaaX", "XaaXXaX"),
        ("XaXXbXXaXXbX", "XaXXbX", "XabX", "XabXXabX"),
        ("XaXXaXXaXXaX", "XaXXaX", "XaaX", "XaaXXaaX"),
    ]
    for s, find, repl, want in cases:
        got_spark = spark.sql(
            f"SELECT replace('{s}', '{find}', '{repl}') AS r"
        ).collect()[0]["r"]
        got_duck = duckdb.sql(
            f"SELECT replace('{s}', '{find}', '{repl}') AS r"
        ).fetchone()[0]
        assert got_spark == got_duck == want, (s, got_spark, got_duck)


def test_first_merge_agrees_with_bpe_pair_counts(spark, sf_dir):
    """Step 1 of the trainer maximizes exactly the statistic
    bpe_pair_counts publishes (same corpus, same weights) — the two
    operators must name the same pair with the same count."""
    from simple_map_reduce_ruuner_spark.operators.textlm import (
        bpe_pair_counts,
        bpe_train_merges,
    )

    top = (
        bpe_pair_counts(spark, sf_dir)
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(1)
        .collect()[0]
    )
    step1 = (
        bpe_train_merges(spark, sf_dir).where(F.col("step") == 1).collect()[0]
    )
    assert step1["left_sym"] + step1["right_sym"] == top["pair"]
    assert step1["cnt"] == top["cnt"]


def test_merges_are_distinct_and_monotone_enough(spark, sf_dir):
    """k rows, unique (left, right) pairs (a pair, once merged, cannot
    be the argmax again — its count drops to 0), steps 1..k."""
    from simple_map_reduce_ruuner_spark.operators.textlm import (
        BPE_MERGES,
        bpe_train_merges,
    )

    rows = bpe_train_merges(spark, sf_dir).collect()
    assert sorted(r["step"] for r in rows) == list(range(1, BPE_MERGES + 1))
    pairs = {(r["left_sym"], r["right_sym"]) for r in rows}
    assert len(pairs) == len(rows)
