"""End-to-end training-data curation pipeline — the capstone composition.

A user of the reference runs one workload at a time; a 100 TB training-
data pipeline chains them: quality-filter → exact-dedup → near-dedup →
emit per-document features. ``corpus_clean`` is that chain as ONE
declarative plan, built from the already-verified operators (each
individually oracle-checked), so Catalyst optimizes across stage
boundaries — shared scans are planned once per branch and the whole
pipeline is a single job, not four materialized passes.

Selection semantics (each clause a real curation rule):
- quality ≥ QUALITY_FLOOR (composite heuristic, textstats.quality_score)
- doc is the canonical (min doc_id) copy of its EXACT duplicate group
- doc is the canonical (min doc_id) member of its NEAR-dup cluster
  (banded MinHash-LSH candidates, exact-Jaccard verified — the
  sub-quadratic production path end to end)

Output: (doc_id, quality, n_tokens) for surviving documents.

Scale: every stage is the scale-path variant — no all-pairs anchors in
this plan. The dominant costs are the LSH candidate join and the
iterative cluster loop, both sub-quadratic (SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.operators.dedup import (
    EXACT_DEDUP_SQL,
    NEARDUP_CLUSTERS_SQL,
    exact_dedup,
    neardup_clusters,
)
from simple_map_reduce_ruuner_spark.operators.textstats import (
    QUALITY_SCORE_SQL,
    TOKEN_STATS_SQL,
    quality_score,
    token_stats,
)
from simple_map_reduce_ruuner_spark.registry import Query
from simple_map_reduce_ruuner_spark.sources.tables import load_table

QUALITY_FLOOR = 0.5


def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    quality = quality_score(spark, sf_dir)
    exact = exact_dedup(spark, sf_dir)
    clusters = neardup_clusters(spark, sf_dir)
    stats = token_stats(spark, sf_dir)
    return (
        clusters.where(F.col("doc_id") == F.col("cluster_id"))
        .select("doc_id")
        .join(exact.select(F.col("keep_doc_id").alias("doc_id")), "doc_id")
        .join(quality.where(F.col("quality") >= QUALITY_FLOOR), "doc_id")
        .join(stats.select("doc_id", "n_tokens"), "doc_id")
        .select("doc_id", "quality", "n_tokens")
    )


CORPUS_CLEAN_SQL = f"""
WITH quality AS ({QUALITY_SCORE_SQL.strip()}),
exact AS ({EXACT_DEDUP_SQL.strip()}),
clusters AS ({NEARDUP_CLUSTERS_SQL.strip()}),
stats AS ({TOKEN_STATS_SQL.strip()})
SELECT q.doc_id, q.quality, s.n_tokens
FROM quality q
JOIN clusters c ON c.doc_id = q.doc_id AND c.cluster_id = q.doc_id
JOIN exact e ON e.keep_doc_id = q.doc_id
JOIN stats s ON s.doc_id = q.doc_id
WHERE q.quality >= {QUALITY_FLOOR}
"""


# --------------------------------------------------------------------------
# Deterministic stratified sampling — rebalance over-represented strata
# --------------------------------------------------------------------------

# keep-percentage per language: downsample dominant English, keep the rest
SAMPLE_RATES = {"en": 40, "de": 100, "es": 100, "fr": 100, "zh": 100}
DEFAULT_RATE = 100


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic downsampling: keep a document iff
    ``hash(doc_id) mod 100 < rate(lang)``.

    The standard rebalancing step of a training-data pipeline (cap the
    over-represented language/source), built on the portable md5 hash
    instead of ``rand()``: the sample is REPRODUCIBLE across runs,
    engines, and partitionings — which is what makes sampled corpora
    auditable — and therefore has an exact DuckDB oracle. Pure map-side
    filter: no shuffle at any scale, pushdown-friendly.
    """
    from simple_map_reduce_ruuner_spark.functions.hashing import hash60

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    rate_map = F.create_map(
        *[F.lit(x) for kv in SAMPLE_RATES.items() for x in kv]
    )
    rate = F.coalesce(rate_map.getItem(F.col("lang")), F.lit(DEFAULT_RATE))
    bucket = F.pmod(
        hash60(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))),
        F.lit(100),
    )
    return docs.where(bucket < rate).select(
        "doc_id", "lang", "source", bucket.cast("long").alias("sample_bucket")
    )


def _rate_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {rate}" for lang, rate in SAMPLE_RATES.items()
    )
    return f"CASE lang {whens} ELSE {DEFAULT_RATE} END"


def _stratified_sample_sql() -> str:
    from simple_map_reduce_ruuner_spark.functions.hashing import hash60_sql

    seed_expr = "'sample:' || doc_id"
    bucket = f"({hash60_sql(seed_expr)}) % 100"
    return f"""
SELECT doc_id, lang, source, CAST({bucket} AS BIGINT) AS sample_bucket
FROM documents
WHERE {bucket} < {_rate_case_sql()}
"""


STRATIFIED_SAMPLE_SQL = _stratified_sample_sql()


# --------------------------------------------------------------------------
# Per-source quality cap — keep only the best K documents of each source
# --------------------------------------------------------------------------

SOURCE_CAP_K = 15


def source_quality_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K documents per source by quality (ties broken by doc_id):
    the per-provider budget cap of a curation pipeline. One shuffle on
    source, bounded per-group state (rank ≤ K) — survives any corpus
    size as long as sources are numerous relative to documents-per-
    source (true by construction for crawl data)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    q = quality_score(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        docs.join(q, "doc_id")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= SOURCE_CAP_K)
        .select("source", "doc_id", "quality", F.col("rank").cast("long").alias("rank"))
    )


SOURCE_QUALITY_CAP_SQL = f"""
WITH q AS ({QUALITY_SCORE_SQL.strip()}),
ranked AS (
    SELECT d.source, d.doc_id, q.quality,
           row_number() OVER (PARTITION BY d.source
                              ORDER BY q.quality DESC, d.doc_id ASC) AS rank
    FROM documents d JOIN q ON q.doc_id = d.doc_id
)
SELECT source, doc_id, quality, rank
FROM ranked WHERE rank <= {SOURCE_CAP_K}
"""


QUERIES: dict[str, Query] = {
    "corpus_clean": Query(
        corpus_clean,
        CORPUS_CLEAN_SQL,
        "full curation pipeline: quality filter + exact & near dedup + stats",
    ),
    "stratified_sample": Query(
        stratified_sample,
        STRATIFIED_SAMPLE_SQL,
        "deterministic per-language downsampling (reproducible, no shuffle)",
    ),
    "source_quality_cap": Query(
        source_quality_cap,
        SOURCE_QUALITY_CAP_SQL,
        "top-K docs per source by quality (per-provider budget cap)",
    ),
}
