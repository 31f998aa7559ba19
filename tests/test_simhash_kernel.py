"""Parity guard for the zero-shuffle simhash kernel.

dedup._simhash_plan's correctness rests on every token row of a document
staying in ONE partition (narrow lineage from spread_scan's row-granular
repartition through split/explode/project). Any future shuffle inserted
between explode_tokens and the mapInPandas vote fold — a repartition, an
AQE change, a reused helper that aggregates — would silently emit
duplicate doc_id rows with partial simhashes. This mirrors
test_char_count_kernel_matches_explode: the kernel must equal the
retired explode/groupBy formulation, and its doc_id column must be
distinct.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.functions.hashing import hash60
from simple_map_reduce_ruuner_spark.functions.text import explode_tokens
from simple_map_reduce_ruuner_spark.operators.dedup import (
    SIMHASH_BITS,
    _simhash_plan,
)
from simple_map_reduce_ruuner_spark.sources.tables import load_table


def _simhash_explode_reference(docs):
    """The retired r8 bit-position explode/groupBy formulation — two
    shuffles, unconditionally correct under any partitioning, kept here
    as the kernel's parity twin (the DuckDB oracle keeps the same SQL
    shape as SIMHASH_SQL)."""
    hashed = explode_tokens(docs, keep=("doc_id",)).select(
        "doc_id", hash60(F.col("token")).alias("h")
    )
    votes = (
        hashed.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))
            ).alias("bit"),
            "h",
        )
        .withColumn(
            "vote",
            F.when(F.expr("(h >> bit) & 1 = 1"), F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )
        .groupBy("doc_id", "bit")
        .agg(F.sum("vote").alias("vote_sum"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("vote_sum") > 0, F.expr("CAST(1 AS BIGINT) << bit")
            ).otherwise(F.lit(0))
        ).alias("simhash")
    )


def test_simhash_kernel_matches_explode(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    want = {(r.doc_id, r.simhash) for r in _simhash_explode_reference(docs).collect()}
    got_rows = _simhash_plan(spark, sf_dir).collect()
    got = {(r.doc_id, r.simhash) for r in got_rows}
    assert got == want
    # doc_id distinctness == row count: the partition-locality invariant.
    # A shuffle between explode_tokens and the vote fold would split a
    # doc's tokens across partitions and emit duplicate doc_ids here.
    assert len(got_rows) == len({r.doc_id for r in got_rows})
    assert len(got_rows) > 0


def test_simhash_kernel_synthetic_edge_rows(spark):
    """Multi-partition synthetic frame: docs interleaved so runs split
    across Arrow batches, plus empty/null/whitespace-only texts (which
    must vanish — no tokens, no vote) and a repeated-token doc."""
    rows = [
        (1, "alpha beta gamma alpha"),
        (2, ""),
        (3, None),
        (4, "   \t  "),
        (5, "zeta"),
        (6, "alpha beta gamma alpha"),  # duplicate text ⇒ same simhash as 1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(
        4, "doc_id"
    )
    want = {
        (r.doc_id, r.simhash)
        for r in _simhash_explode_reference(docs).collect()
    }
    from simple_map_reduce_ruuner_spark.operators.dedup import _simhash_vote_fold

    # the production kernel on the same frame (bypasses load_table and
    # the session cache)
    hashed = explode_tokens(docs, keep=("doc_id",)).select(
        "doc_id", hash60(F.col("token")).alias("h")
    )
    got_df = hashed.mapInPandas(
        _simhash_vote_fold(), "doc_id long, simhash long"
    )
    got = {(r.doc_id, r.simhash) for r in got_df.collect()}
    assert got == want
    by_id = dict(got)
    assert by_id[1] == by_id[6]
    assert {2, 3, 4} & set(by_id) == set()
