"""Embedding clustering for curation: a deterministic Lloyd (k-means)
step in exact integer arithmetic, and the SemDeDup recipe built on it —
cluster the corpus, then search for near-duplicate pairs only WITHIN
clusters (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication"). Complements the
hyperplane-LSH near-dup path (dedup.neardup_embedding_lsh): LSH buckets
by random projections, SemDeDup buckets by data-driven centroids —
different recall profiles, same no-all-pairs scale discipline.

The reference has no vector operators at all (its four workloads are
text counts and interval peaks); this extends the north-star similarity
family (similarity.py), whose IVF routing uses fixed seed vectors as
centroid stand-ins — here the centroids are actually TRAINED (one Lloyd
update) before use.

Determinism-for-oracle design (the reason everything is integer):
float k-means is engine-divergent at every step (sum order, float
means, distance ties). Instead every embedding is quantized once —
``floor(value × 1000)`` per dimension, exact in both engines — and all
distances/means stay in BIGINT: squared-L2 sums are exact, the Lloyd
mean is an exact truncating division (Spark ``div`` ≡ DuckDB ``//`` —
BOTH truncate toward zero; DuckDB's ``//`` is NOT Python floor
division, measured ``-7 // 2 = -3``, so a floor-division first cut
diverged on every cluster with a negative coordinate sum), and argmin
ties break on (dist2, cid). The DuckDB oracle replays the identical
algorithm in long (vec, dim) form.

Scale notes: K centroids broadcast (K × dim longs); each assignment is
one pass over the vectors (no shuffle — the crossJoin's build side is
the broadcast centroid table); the Lloyd update shuffles (cid, dim)
partial sums — K × dim rows, corpus-size independent. The SemDeDup
pair join shuffles vectors once on cid; in production K grows with N
so cluster size stays ~10³ and the within-cluster quadratic term stays
linear overall (hot clusters split by AQE skew handling). K = 16 here
is sized for the 500-2000-vector test corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.registry import Query
from simple_map_reduce_ruuner_spark.sources.tables import load_table

K = 16  # clusters = seed vectors vec_id < K
QSCALE = 1000  # quantization: floor(x * QSCALE) per dimension
DIM = 64
# SemDeDup near-dup bar on quantized squared L2 (~p1-p5 of the
# within-cluster pair distribution at every sf — non-degenerate, small).
DIST2_MAX = 1_400_000


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, q): embeddings quantized to exact BIGINT coordinates."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * QSCALE).cast("long"),
        ).alias("q"),
    )


def _dist2(a: str, b: str) -> Column:
    """Exact integer squared-L2 between two quantized vector columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, q, cid, dist2): nearest centroid per vector, ties to the
    smaller cid (min(struct) lexicographic — mirrored by the oracle's
    ORDER BY dist2, cid rank)."""
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id", "q", "cid", _dist2("q", "c").alias("dist2")
    )
    best = scored.groupBy("vec_id", "q").agg(
        F.min(F.struct("dist2", "cid")).alias("best")
    )
    return best.select(
        "vec_id",
        "q",
        F.col("best.cid").alias("cid"),
        F.col("best.dist2").alias("dist2"),
    )


# Exact truncating integer mean (Spark `div` ≡ DuckDB `//`, both
# truncate toward zero — DuckDB's `//` is NOT Python floor division).
_INT_MEAN = "CAST(sum({v}) div count(*) AS BIGINT)"


def _update(assigned: DataFrame) -> DataFrame:
    """(cid, c): Lloyd update — per-(cluster, dim) exact truncating mean,
    re-assembled into centroid arrays ordered by dimension."""
    dims = assigned.select(
        "cid", F.posexplode("q").alias("dim", "val")
    )
    means = dims.groupBy("cid", "dim").agg(
        F.expr(_INT_MEAN.format(v="val")).alias("cval")
    )
    return means.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cval"))),
            lambda s: s["cval"],
        ).alias("c")
    )


def _two_round_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    qv = _quantized(spark, sf_dir)
    seeds = qv.where(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("c")
    )
    first = _assign(qv, seeds)
    trained = _update(first)
    return _assign(qv, trained)


def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cluster_id, n_vectors, mean_dist2): cluster census after one
    full Lloyd iteration (seed-assign → centroid update → re-assign)
    over the quantized corpus. mean_dist2 is the exact truncating mean of
    squared distances — the within-cluster tightness signal that
    drives K selection in a real curation run.
    """
    a2 = _two_round_assignment(spark, sf_dir)
    return a2.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.expr(_INT_MEAN.format(v="dist2")).alias("mean_dist2"),
    )


_DIMS_CTE = f"""
dims AS (
    SELECT vec_id, i AS dim,
           CAST(floor(CAST(embedding[i] AS DOUBLE) * {QSCALE}) AS BIGINT) AS q
    FROM embeddings, range(1, {DIM + 1}) t(i)
), seeds AS (
    SELECT vec_id AS cid, dim, q FROM dims WHERE vec_id < {K}
), a1 AS (
    SELECT d.vec_id, s.cid, sum((d.q - s.q) * (d.q - s.q)) AS dist2
    FROM dims d JOIN seeds s USING (dim)
    GROUP BY 1, 2
), b1 AS (
    SELECT vec_id, cid FROM a1
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) = 1
), c2 AS (
    SELECT b.cid, d.dim, sum(d.q) // count(*) AS q
    FROM b1 b JOIN dims d USING (vec_id)
    GROUP BY 1, 2
), a2 AS (
    SELECT d.vec_id, c.cid, sum((d.q - c.q) * (d.q - c.q)) AS dist2
    FROM dims d JOIN c2 c USING (dim)
    GROUP BY 1, 2
), b2 AS (
    SELECT vec_id, cid, dist2 FROM a2
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) = 1
)"""


KMEANS_CLUSTERS_SQL = f"""
WITH {_DIMS_CTE}
SELECT CAST(cid AS BIGINT) AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(dist2) // count(*) AS BIGINT) AS mean_dist2
FROM b2
GROUP BY 1
"""


def semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_a, vec_b, dist2): semantically-near pairs found ONLY within
    trained k-means clusters — the SemDeDup candidate generation. The
    all-pairs comparison never happens: vectors shuffle once on their
    cluster id and pair up inside the cluster, so total pair work is
    Σ|cluster|², held ~linear by scaling K with corpus size.
    """
    a2 = _two_round_assignment(spark, sf_dir)
    left = a2.select("cid", F.col("vec_id").alias("vec_a"), F.col("q").alias("qa"))
    right = a2.select("cid", F.col("vec_id").alias("vec_b"), F.col("q").alias("qb"))
    pairs = left.join(right, "cid").where(F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.select("vec_a", "vec_b", _dist2("qa", "qb").alias("dist2"))
        .where(F.col("dist2") <= DIST2_MAX)
    )


SEMDEDUP_PAIRS_SQL = f"""
WITH {_DIMS_CTE}, pd AS (
    SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
           sum((dx.q - dy.q) * (dx.q - dy.q)) AS dist2
    FROM b2 x
    JOIN b2 y ON x.cid = y.cid AND x.vec_id < y.vec_id
    JOIN dims dx ON dx.vec_id = x.vec_id
    JOIN dims dy ON dy.vec_id = y.vec_id AND dy.dim = dx.dim
    GROUP BY 1, 2
)
SELECT vec_a, vec_b, CAST(dist2 AS BIGINT) AS dist2
FROM pd
WHERE dist2 <= {DIST2_MAX}
"""


QUERIES: dict[str, Query] = {
    "kmeans_clusters": Query(
        kmeans_clusters,
        KMEANS_CLUSTERS_SQL,
        "one exact-integer Lloyd iteration: cluster census + tightness",
    ),
    "semdedup_pairs": Query(
        semdedup_pairs,
        SEMDEDUP_PAIRS_SQL,
        "SemDeDup: near-dup pairs within trained k-means clusters only",
    ),
}
