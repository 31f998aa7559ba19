"""Data-mixture and decontamination operators.

The reporting/safety layer of an LLM training-data pipeline, alongside
dedup (operators/dedup.py) and curation (operators/curation.py):

- ``contamination_check`` — benchmark decontamination: flag corpus
  documents sharing a k-word n-gram with a held-out eval slice (the
  standard n-gram-overlap decontamination used for pretraining sets).
  The eval side is broadcast: real benchmark suites are tiny relative
  to the corpus (millions of n-grams vs trillions of tokens), so the
  contamination scan is one broadcast-hash semi-pass over the corpus
  shingles — no shuffle of the corpus. Here the "eval set" is a
  deterministic corpus slice (doc_id % 20 == 0) so the check is
  self-contained and exactly oracle-checkable.
- ``domain_mix_report`` — per (source, lang) document/token totals and
  share of corpus tokens: the mixture report a sampling weight schedule
  is built from. The percent-of-total window runs over the tiny
  (source × lang) aggregate, never the corpus.
- ``heavy_hitter_tokens`` — exact frequency heavy hitters: tokens with
  count > total/K. The corpus total comes from a 1-row scalar aggregate
  cross-joined (broadcast) onto the token counts — no window over the
  full vocabulary, which at corpus scale is itself a billion-row table.
- ``char_entropy`` — per-document Shannon entropy of the character
  distribution (a gibberish/boilerplate quality signal). Two partial→
  final aggregations; entropy = log2(n) - Σ c·log2(c) / n computed from
  exact BIGINT counts, rounded to 4 decimals (double log/summation
  noise is ~1e-13 — far below the rounding quantum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.functions.hashing import hash60, hash60_sql
from simple_map_reduce_ruuner_spark.functions.text import (
    chars,
    explode_tokens,
    tokens,
    word_shingles,
)
from simple_map_reduce_ruuner_spark.registry import Query
from simple_map_reduce_ruuner_spark.sources.tables import load_table, spread_scan

EVAL_MOD = 20  # doc_id % EVAL_MOD == 0 → held-out "benchmark" slice
CONTAM_K = 5  # n-gram width for contamination (8-13 typical; 5 fits fixtures)
HH_K = 50  # heavy hitter threshold: count > total / HH_K

from simple_map_reduce_ruuner_spark.functions.text import TOKS_SQL as _TOKS_SQL


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus docs sharing ≥1 k-gram with the eval slice: doc_id,
    distinct shared shingles, distinct eval docs hit.

    Join key is the 60-bit shingle hash, so the broadcast build side
    carries 8-byte keys, not text.

    No corpus-wide ``.distinct()``: a duplicate (doc, shingle) can only
    arise WITHIN a document, so per-doc ``array_distinct`` before the
    explode dedupes exactly — and the residual case (two different
    shingles of one doc colliding in hash60) is harmless because both
    aggregates are count_distinct and the join side dedupes through
    them too. Deletes the pair-table exchange outright; the only
    shuffle left is the final doc_id groupBy.
    """
    docs = spread_scan(load_table(spark, sf_dir, "documents"), key="doc_id")
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(F.col("text"), CONTAM_K))
        ).alias("shingle"),
    ).select("doc_id", hash60(F.col("shingle")).alias("sh"))
    ev = sh.filter(F.col("doc_id") % EVAL_MOD == 0).select(
        F.col("sh").alias("ev_sh"), F.col("doc_id").alias("eval_doc")
    )
    tr = sh.filter(F.col("doc_id") % EVAL_MOD != 0)
    return (
        tr.join(F.broadcast(ev), tr.sh == ev.ev_sh)
        .groupBy("doc_id")
        .agg(
            F.count_distinct("sh").alias("n_shared_shingles"),
            F.count_distinct("eval_doc").alias("n_eval_docs"),
        )
    )


_CONTAM_SHINGLES_SQL = rf"""
    WITH toks AS (
        SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ),
    shingled AS (
        SELECT doc_id,
               unnest([
                   array_to_string(t[i : i + {CONTAM_K - 1}], ' ')
                   for i in range(1, greatest(len(t) - {CONTAM_K - 1}, 1) + 1)
               ]) AS shingle
        FROM toks
    ),
    sh AS (
        SELECT DISTINCT doc_id, {hash60_sql("shingle")} AS sh FROM shingled
    )
"""

CONTAMINATION_CHECK_SQL = f"""
{_CONTAM_SHINGLES_SQL}
SELECT doc_id,
       count(DISTINCT sh) AS n_shared_shingles,
       count(DISTINCT eval_doc) AS n_eval_docs
FROM (SELECT sh, doc_id FROM sh WHERE doc_id % {EVAL_MOD} <> 0) tr
JOIN (SELECT sh, doc_id AS eval_doc FROM sh WHERE doc_id % {EVAL_MOD} = 0) ev
    USING (sh)
GROUP BY doc_id
"""


def domain_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (source, lang): docs, tokens, and token share of the corpus."""
    docs = spread_scan(load_table(spark, sf_dir, "documents"), key="doc_id")
    per = (
        docs.select("source", "lang", F.size(tokens(F.col("text"))).alias("nt"))
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("nt").alias("n_tokens"))
    )
    total = F.sum("n_tokens").over(Window.partitionBy())
    return per.select(
        "source",
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("n_tokens") / total * 100, 6).alias("token_share_pct"),
    )


DOMAIN_MIX_REPORT_SQL = f"""
WITH per AS (
    SELECT source, lang, count(*) AS n_docs,
           SUM(len({_TOKS_SQL})) AS n_tokens
    FROM documents
    GROUP BY source, lang
)
SELECT source, lang,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER () AS DOUBLE)
                 * 100, 6) AS token_share_pct
FROM per
"""


def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens appearing more often than total/K, with exact ppm.

    ppm uses BIGINT floor division, so the output is integer-exact;
    the 1-row corpus total is broadcast onto the counts.
    """
    docs = spread_scan(load_table(spark, sf_dir, "documents"), key="doc_id")
    counts = (
        explode_tokens(docs)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = docs.select(
        F.sum(F.size(tokens(F.col("text")))).alias("total")
    )
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("cnt") * HH_K > F.col("total"))
        .select(
            "token",
            F.col("cnt").cast("long").alias("cnt"),
            # ppm widens to DECIMAL first: a 100 TB-corpus stop-word
            # passes ~9.2e12 occurrences and cnt*1e6 would overflow
            # int64 (same class as doc_lm_familiarity's r4 fix)
            F.expr("CAST(cnt AS DECIMAL(38,0)) * 1000000 div total")
            .cast("long")
            .alias("ppm"),
        )
    )


HEAVY_HITTER_TOKENS_SQL = f"""
WITH counts AS (
    SELECT t AS token, count(*) AS cnt
    FROM (SELECT unnest({_TOKS_SQL}) AS t FROM documents)
    GROUP BY t
),
total AS (
    SELECT SUM(len({_TOKS_SQL})) AS total FROM documents
)
SELECT token, CAST(cnt AS BIGINT) AS cnt,
       CAST(CAST(cnt AS HUGEINT) * 1000000 // total AS BIGINT) AS ppm
FROM counts, total
WHERE cnt * {HH_K} > total
"""


def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of each document's character distribution."""
    docs = spread_scan(load_table(spark, sf_dir, "documents"), key="doc_id")
    per_char = (
        docs.select("doc_id", F.explode(chars(F.col("text"))).alias("ch"))
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        per_char.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.log2("c")).alias("clog"),
        )
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_chars_counted"),
            F.round(F.log2("n") - F.col("clog") / F.col("n"), 4).alias(
                "entropy_bits"
            ),
        )
    )


CHAR_ENTROPY_SQL = """
WITH per_char AS (
    SELECT doc_id, ch, count(*) AS c
    FROM (
        SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
    )
    WHERE ch <> '' AND ch <> chr(10)
    GROUP BY doc_id, ch
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_chars_counted,
       ROUND(log2(CAST(sum(c) AS DOUBLE))
                 - sum(c * log2(CAST(c AS DOUBLE))) / sum(c), 4)
           AS entropy_bits
FROM per_char
GROUP BY doc_id
"""


def mixture_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan and apply a uniform-over-sources token mixture: per source,
    the exact integer sampling rate (ppm) that downsamples it toward
    total_tokens / n_sources, plus the docs/tokens the deterministic
    hash-Bernoulli pass actually keeps at that rate.

    The production shape is two passes, both cheap: pass 1 is an
    aggregate-only scan (per-source token totals — a few rows), the rate
    table is computed on those few rows and BROADCAST, and pass 2 applies
    ``hash(doc_id) % 1e6 < rate_ppm`` map-side — the corpus itself is
    never shuffled to be sampled, and the decision is reproducible from
    doc_id alone (re-running the plan on the same snapshot keeps exactly
    the same documents, which is what makes the sample auditable).
    Integer-exact throughout: rate_ppm uses DECIMAL/HUGEINT floor
    division (an int64 ``total*1e6`` overflows at corpus scale — same
    class as heavy_hitter_tokens' ppm).
    """
    docs = spread_scan(load_table(spark, sf_dir, "documents"), key="doc_id")
    per_doc = docs.select(
        "source", "doc_id", F.size(tokens(F.col("text"))).alias("nt")
    )
    per_src = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("nt").alias("n_tokens")
    )
    tot = per_src.select(
        F.sum("n_tokens").alias("total"), F.count(F.lit(1)).alias("k")
    )
    rates = per_src.join(F.broadcast(tot)).select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.when(F.col("n_tokens") <= 0, F.lit(1_000_000))
        .otherwise(
            F.least(
                F.lit(1_000_000),
                F.expr(
                    "CAST(CAST(total AS DECIMAL(38,0)) * 1000000"
                    " div (k * n_tokens) AS BIGINT)"
                ),
            )
        )
        .cast("long")
        .alias("rate_ppm"),
    )
    keep = hash60(
        F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))
    ) % 1_000_000 < F.col("rate_ppm")
    kept = (
        per_doc.join(F.broadcast(rates.select("source", "rate_ppm")), "source")
        .filter(keep)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("nt").alias("kept_tokens"),
        )
    )
    return rates.join(kept, "source", "left").select(
        "source",
        "n_docs",
        "n_tokens",
        "rate_ppm",
        F.coalesce(F.col("kept_docs"), F.lit(0)).cast("long").alias("kept_docs"),
        F.coalesce(F.col("kept_tokens"), F.lit(0))
        .cast("long")
        .alias("kept_tokens"),
    )


MIXTURE_SAMPLE_PLAN_SQL = f"""
WITH per_doc AS (
    SELECT source, doc_id, len({_TOKS_SQL}) AS nt FROM documents
),
per_src AS (
    SELECT source, count(*) AS n_docs, SUM(nt) AS n_tokens
    FROM per_doc GROUP BY source
),
tot AS (SELECT SUM(n_tokens) AS total, count(*) AS k FROM per_src),
rates AS (
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(CASE WHEN n_tokens <= 0 THEN 1000000
                ELSE least(1000000,
                     CAST(CAST(total AS HUGEINT) * 1000000
                          // (k * n_tokens) AS BIGINT))
           END AS BIGINT) AS rate_ppm
    FROM per_src, tot
),
kept AS (
    SELECT d.source, count(*) AS kept_docs, SUM(nt) AS kept_tokens
    FROM per_doc d JOIN rates r USING (source)
    WHERE {hash60_sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000000
          < r.rate_ppm
    GROUP BY d.source
)
SELECT r.source, n_docs, n_tokens, rate_ppm,
       CAST(coalesce(kept_docs, 0) AS BIGINT) AS kept_docs,
       CAST(coalesce(kept_tokens, 0) AS BIGINT) AS kept_tokens
FROM rates r LEFT JOIN kept USING (source)
"""


QUERIES: dict[str, Query] = {
    "mixture_sample_plan": Query(
        mixture_sample_plan,
        MIXTURE_SAMPLE_PLAN_SQL,
        "uniform-over-sources mixture: exact ppm rates + deterministic "
        "hash-Bernoulli sample applied map-side",
    ),
    "contamination_check": Query(
        contamination_check,
        CONTAMINATION_CHECK_SQL,
        "n-gram benchmark decontamination via broadcast shingle-hash join",
    ),
    "domain_mix_report": Query(
        domain_mix_report,
        DOMAIN_MIX_REPORT_SQL,
        "per (source, lang) doc/token totals + corpus token share",
    ),
    "heavy_hitter_tokens": Query(
        heavy_hitter_tokens,
        HEAVY_HITTER_TOKENS_SQL,
        "exact heavy hitters (count > total/K) with broadcast scalar total",
    ),
    "char_entropy": Query(
        char_entropy,
        CHAR_ENTROPY_SQL,
        "per-doc character Shannon entropy (quality signal)",
    ),
}
