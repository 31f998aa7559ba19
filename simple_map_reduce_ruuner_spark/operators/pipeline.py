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


QUERIES: dict[str, Query] = {
    "corpus_clean": Query(
        corpus_clean,
        CORPUS_CLEAN_SQL,
        "full curation pipeline: quality filter + exact & near dedup + stats",
        new_in_round=1,
    ),
}
