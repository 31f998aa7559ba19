"""Fourth relational batch: interval joins done the distributed way, plus
two index/diagnostic builders a 100 TB pipeline needs.

None of these exist in the reference (its 4 workloads are token counts,
interval peaks, and a grouped HAVING — exampleCodes/*); they extend the
same engine surface along SURVEY.md §2.C:

- ``order_followups_week`` — point-in-interval join (each order against
  the 7-day window opened by an earlier order of the same customer).
  ``clicks_before_errors`` (relational2.py:91) already shows the range-
  as-join-filter shape, which works while the equi key (user) is
  selective; this operator shows the shape that survives when it is NOT:
  the time axis itself is bucketed, each interval explodes into the ≤8
  day-buckets it overlaps, each point maps to its one bucket, and the
  join becomes an equi-join on (key, day) refined by the exact range
  predicate. The day bucket is part of the shuffle key, so one giant
  customer no longer lands on one reducer — the standard production
  rewrite that keeps Spark off BroadcastNestedLoopJoin.
- ``inverted_index`` — bigram phrase → (document frequency, sorted
  posting list), the classic map-reduce index artifact, bounded for
  scale: posting lists are only materialized for terms with df ≤
  POSTING_DF_MAX (heavy terms belong in heavy_hitter_tokens, not an
  index), so no output row can exceed ~df_max ids at any corpus size.
- ``key_skew_profile`` — log2 histogram of per-key row counts for a
  join key: the diagnostic that tells you BEFORE a 100 TB join whether
  salting / AQE skew handling is needed. Two aggregations: one shuffle
  bounded by key cardinality, then a ≤64-bucket rollup. The bucket is
  computed as length(bin(cnt))-1 — exact integer floor(log2), immune to
  float log rounding at power-of-two boundaries on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.operators.relational import (
    as_money,
    dsum,
    dsum_sql,
)
from simple_map_reduce_ruuner_spark.functions.text import word_shingles
from simple_map_reduce_ruuner_spark.registry import Query
from simple_map_reduce_ruuner_spark.sources.tables import load_table, spread_scan

WINDOW_DAYS = 7
POSTING_DF_MIN = 2
POSTING_DF_MAX = 100

from simple_map_reduce_ruuner_spark.functions.text import TOKS_SQL as _TOKS_SQL


def order_followups_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderkey, o_custkey, n_followups, followup_value): orders that
    were followed by more orders from the same customer within 7 days,
    with the follow-on count and spend.

    One customer-keyed shuffle + a 7-day range-frame window (guide
    §2.4): per order, followup count/spend is COUNT/SUM over the frame
    ``[same day, +{WINDOW_DAYS}d)`` in day-ordered customer partitions,
    minus the row itself. The sum stays in exact decimal until the
    final round, so subtracting the row's own price is exact and values
    are identical to the r14 join form (full-compare receipt at sf0.1).

    The r14 shape exploded each order into its ≤8 covered day-buckets
    and equi-joined points on (customer, day); Spark's size estimate is
    blind to the 8× Generate, so it BROADCAST the exploded side — 1.2M
    rows hash-built on the driver at sf0.1 — and at scale the shape is
    two fact shuffles (one 8×-exploded) plus a third for the final
    groupBy. The window form shuffles |orders| rows exactly once.
    Trade, documented: a single pathological customer now lands in one
    window task where the day-bucket join spread it over ~2500 keys per
    year — with bounded orders-per-customer (this schema) the
    single-shuffle form wins at every scale. Equivalence precondition:
    o_orderdate is day-aligned, so the day-granular frame equals the
    timestamp interval predicate — verified 0 non-midnight rows at
    sf0.1 and pinned by the oracle gate (raw-timestamp SQL) at the SFs
    the driver checks.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff("o_orderdate", F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(0, WINDOW_DAYS - 1)
    )
    price_dec = F.col("o_totalprice").cast("decimal(30,6)")
    n_follow = F.count(F.lit(1)).over(w) - 1
    follow_val = F.sum(price_dec).over(w) - price_dec
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            n_follow.cast("long").alias("n_followups"),
            as_money(follow_val).alias("followup_value"),
        )
        .where(F.col("n_followups") >= 1)
    )


ORDER_FOLLOWUPS_WEEK_SQL = f"""
SELECT o.o_orderkey, o.o_custkey,
       CAST(count(*) AS BIGINT) AS n_followups,
       CAST(ROUND({dsum_sql('f.o_totalprice')}, 2) AS DOUBLE) AS followup_value
FROM orders o
JOIN orders f
  ON f.o_custkey = o.o_custkey
 AND f.o_orderdate >= o.o_orderdate
 AND f.o_orderdate < o.o_orderdate + INTERVAL {WINDOW_DAYS} DAY
 AND f.o_orderkey <> o.o_orderkey
GROUP BY 1, 2
"""


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, df, postings): sorted posting list per phrase (word-bigram)
    term — the index behind phrase search.

    Unigrams in this corpus are all near-stopwords (31 tokens, median df
    ~390/500 docs), so the index terms are bigram phrases, whose df
    distribution is index-shaped. Built in two phases so NO aggregation
    buffer ever exceeds df_max ids: phase 1 computes df per term (plain
    partial→final count — constant state) and keeps only terms with df in
    [POSTING_DF_MIN, POSTING_DF_MAX]; phase 2 joins the pairs back to the
    surviving terms and only then collect_sets the postings. Filtering
    AFTER a single collect_set pass would bound the output but still
    build corpus-sized transient sets for stopword phrases — the buffer,
    not the row, is what OOMs at 100 TB. The tokenize+distinct runs once
    per phase (column pruning specializes the two subtrees, so Catalyst
    does not share the exchange): two corpus passes for bounded memory is
    the standard index-build trade; ``.persist()`` the pairs if the
    cluster has cache to spare. The df table broadcasts while it fits
    and degrades to a shuffled term join beyond that. Postings serialize
    as a comma-joined numerically-sorted id string (array outputs don't
    survive the driver's hash compare).
    """
    docs = spread_scan(load_table(spark, sf_dir, "documents"), key="doc_id")
    pairs = docs.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 2)).alias("term")
    ).distinct()
    eligible = (
        pairs.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .where(F.col("df").between(POSTING_DF_MIN, POSTING_DF_MAX))
    )
    return (
        pairs.join(eligible, "term")
        .groupBy("term", "df")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_set("doc_id")),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings"),
        )
        .select("term", "df", "postings")
    )


INVERTED_INDEX_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
pairs AS (
    SELECT DISTINCT doc_id,
           unnest([
               array_to_string(t[i : i + 1], ' ')
               for i in range(1, greatest(len(t) - 1, 1) + 1)
           ]) AS term
    FROM toks
)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
FROM pairs
GROUP BY term
HAVING count(*) BETWEEN {POSTING_DF_MIN} AND {POSTING_DF_MAX}
"""


def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, n_keys, n_rows, min_cnt, max_cnt): log2 histogram of rows
    per o_custkey in orders — the pre-join skew diagnostic.

    bucket = floor(log2(rows per key)) computed as length(bin(cnt))-1:
    exact integer arithmetic, so a key with exactly 2^k rows lands in
    bucket k on both engines (float log2 can return k-ε and misbucket).
    """
    orders = load_table(spark, sf_dir, "orders")
    per_key = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per_key.groupBy(
            (F.length(F.bin(F.col("cnt"))) - 1).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("cnt").cast("long").alias("n_rows"),
            F.min("cnt").cast("long").alias("min_cnt"),
            F.max("cnt").cast("long").alias("max_cnt"),
        )
    )


KEY_SKEW_PROFILE_SQL = """
WITH per_key AS (
    SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1
)
SELECT CAST(length(bin(cnt)) - 1 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(min(cnt) AS BIGINT) AS min_cnt,
       CAST(max(cnt) AS BIGINT) AS max_cnt
FROM per_key
GROUP BY 1
"""


QUERIES: dict[str, Query] = {
    "order_followups_week": Query(
        order_followups_week,
        ORDER_FOLLOWUPS_WEEK_SQL,
        "point-in-interval join as day-bucketed equi-join + exact refine",
    ),
    "inverted_index": Query(
        inverted_index,
        INVERTED_INDEX_SQL,
        "bounded inverted index: phrase term -> df + sorted postings",
    ),
    "key_skew_profile": Query(
        key_skew_profile,
        KEY_SKEW_PROFILE_SQL,
        "log2 rows-per-key histogram (join skew diagnostic)",
    ),
}
