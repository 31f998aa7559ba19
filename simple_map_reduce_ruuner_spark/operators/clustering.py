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

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.operators import dedup as _dedup
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


# vectors per assignment cogroup task — bounds per-task memory
# (group matrix ≤ _ASSIGN_GROUP_ROWS × DIM int64 ≈ 26 MB)
_ASSIGN_GROUP_ROWS = 50_000
# cap on numpy scratch elements per chunked matmul (≈ 64 MB of int64),
# same contract as dedup._SCORE_CHUNK_ELEMS
_CHUNK_ELEMS = 8_000_000


def _assign(spark: SparkSession, vecs: DataFrame, cents: DataFrame, n_groups: int) -> DataFrame:
    """(vec_id, q, cid, dist2): nearest centroid per vector, ties to the
    smaller cid — exactly min over lexicographic (dist2, cid), mirrored
    by the oracle's ORDER BY dist2, cid rank.

    Arrow cogroup kernel, not a crossJoin×expression plan: the N×K
    distance evaluation is the hot loop, and any 64-term arithmetic
    chain Catalyst inlines into the consuming stage's generated method
    blows past HotSpot's ~8 KB JIT bytecode limit, silently running the
    whole loop as interpreted bytecode (Spark only falls back to
    non-codegen above 64 KB) — jstack'd as single tasks burning 950 s
    inside hashAgg_doAggregateWithKeys on the 100× semdedup sweep, for
    BOTH the (a−b)² chain and a chunked-struct variant (CollapseProject
    + SimplifyExtractValueOps re-inline the chunks). numpy int64 ops
    are exact (no IEEE rounding anywhere: |dist2| ≤ DIM·(2·QSCALE·|x|)²
    ≪ 2⁶³), so values are unconditionally identical to the SQL
    formulation the oracle keeps.

    Distribution contract: vectors are salted into ``n_groups`` cogroup
    tasks of ≤ _ASSIGN_GROUP_ROWS rows (derived from the parquet
    footer, zero Spark jobs); the K centroid rows are replicated to
    every group via a K×n_groups crossJoin (tiny — centroids are always
    small data, the same shape MLlib's KMeans broadcasts per
    iteration). Everything stays lazy: no driver collect, no
    construction-time job. Per-task scratch for the distance matrix is
    chunk-capped at _CHUNK_ELEMS regardless of K."""
    import numpy as np
    import pandas as pd

    chunk_elems = _CHUNK_ELEMS
    out_schema = "vec_id long, q array<long>, cid long, dist2 long"

    def assign_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame(
                {"vec_id": [], "q": [], "cid": [], "dist2": []}
            ).astype({"vec_id": "int64", "cid": "int64", "dist2": "int64"})
        Q = np.stack([np.asarray(x, dtype=np.int64) for x in left["q"]])
        C = np.stack([np.asarray(x, dtype=np.int64) for x in right["c"]])
        cids = right["cid"].to_numpy(dtype=np.int64)
        qn = (Q * Q).sum(axis=1)
        cn = (C * C).sum(axis=1)
        n, k = len(Q), len(C)
        step = max(1, chunk_elems // max(k, 1))
        cid_out = np.empty(n, dtype=np.int64)
        d_out = np.empty(n, dtype=np.int64)
        for lo in range(0, n, step):
            hi = min(lo + step, n)
            # |a|² + |b|² − 2·a·b: exact int64, identical to (a−b)²
            D = qn[lo:hi, None] + cn[None, :] - 2 * (Q[lo:hi] @ C.T)
            # lexicographic (dist2, cid) min via one packed key —
            # cid < 2²⁴ (K = √(N/2) would need N > 2⁴⁹ to exceed it)
            # and dist2 < 2³⁹ (shift headroom: 39 + 24 = 63 bits).
            # Today's margin is wide — measured dist2 < 2²⁷ at
            # QSCALE=1000, DIM=64 on [-0.53, 0.46] embeddings — but a
            # QSCALE/DIM/embedding-scale change could silently corrupt
            # BOTH lanes, so refuse loudly instead (cheap: D is already
            # materialized for this chunk).
            if D.max(initial=0) >= (1 << 39):
                raise ValueError(
                    "packed (dist2, cid) argmin needs dist2 < 2^39; got "
                    f"max dist2 = {int(D.max())}. Lower QSCALE or widen "
                    "the packing in clustering._assign."
                )
            packed = (D << 24) + cids[None, :]
            best = packed.min(axis=1)
            cid_out[lo:hi] = best & ((1 << 24) - 1)
            d_out[lo:hi] = best >> 24
        return pd.DataFrame(
            {
                "vec_id": left["vec_id"].to_numpy(dtype=np.int64),
                "q": left["q"],
                "cid": cid_out,
                "dist2": d_out,
            }
        )

    vg = vecs.withColumn(
        "g", F.pmod(F.col("vec_id"), F.lit(n_groups)).cast("int")
    )
    cg = cents.crossJoin(
        spark.range(n_groups).select(F.col("id").cast("int").alias("g"))
    )
    return (
        vg.groupby("g")
        .cogroup(cg.groupby("g"))
        .applyInPandas(assign_group, out_schema)
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


def _two_round_assignment(
    spark: SparkSession, sf_dir: str, k: int = K
) -> DataFrame:
    from math import ceil

    from simple_map_reduce_ruuner_spark.operators.dedup import (
        _parquet_row_count,
    )

    n_vecs = _parquet_row_count(os.path.join(sf_dir, "embeddings.parquet"))
    n_groups = max(1, ceil(n_vecs / _ASSIGN_GROUP_ROWS))
    qv = _quantized(spark, sf_dir)
    seeds = qv.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("c")
    )
    first = _assign(spark, qv, seeds, n_groups)
    trained = _update(first)
    return _assign(spark, qv, trained, n_groups)


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


def _pipeline_cte(k: int) -> str:
    """The full quantize → seed-assign → Lloyd-update → re-assign
    pipeline as a DuckDB WITH-fragment ending in ``b2(vec_id, cid,
    dist2)``, parameterized by the cluster count so the N-adaptive
    SemDeDup twin can generate its oracle for the gate N."""
    return f"""
dims AS (
    SELECT vec_id, i AS dim,
           CAST(floor(CAST(embedding[i] AS DOUBLE) * {QSCALE}) AS BIGINT) AS q
    FROM embeddings, range(1, {DIM + 1}) t(i)
), seeds AS (
    SELECT vec_id AS cid, dim, q FROM dims WHERE vec_id < {k}
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


_DIMS_CTE = _pipeline_cte(K)


KMEANS_CLUSTERS_SQL = f"""
WITH {_DIMS_CTE}
SELECT CAST(cid AS BIGINT) AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(dist2) // count(*) AS BIGINT) AS mean_dist2
FROM b2
GROUP BY 1
"""


# Fixed-K fence: at K=16 the within-cluster pair stage is N²/(2·16) —
# fine through the 10× sweep's 20 k vectors, quadratic death beyond it.
# Same enforced-contract pattern as dedup.MAX_ALLPAIRS_DOCS /
# MAX_BROADCAST_VECTORS: refuse from footer metadata, point at the
# N-adaptive twin.
MAX_FIXED_K_VECTORS = 100_000


def _k_auto(n_vecs: int) -> int:
    """√N-adaptive cluster count, floored at the fixed K.

    SemDeDup's two stages pull K in opposite directions: assignment
    costs N·K distance evaluations, within-cluster pairing costs
    ~N²/(2K). K = √(N/2) balances them at Θ(N^1.5) total — the
    standard choice when cluster count must grow with corpus size.
    The floor keeps K == 16 at every driver-gate size (N ≤ 512), so
    the adaptive twin is value-identical to the fixed form exactly
    where the gate hash-compares both."""
    from math import isqrt

    return max(K, isqrt(n_vecs // 2))


def _semdedup(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """Within-cluster pair scoring as ONE Arrow kernel per cluster
    (applyInPandas over the cluster id), not a cid self-join: the join
    materializes and shuffles every candidate pair with BOTH quantized
    arrays attached (~1 KB/row — tens of GB at the 100× sweep) and
    evaluates a 64-term chain per pair inside a fused generated method
    (the huge-method JIT fallback — see :func:`_assign`). Here the only
    exchange is the N-row assignment keyed on cid, and the quadratic
    work is exact int64 numpy arithmetic with the same chunk-capped
    scratch contract as dedup._score_within_buckets (a HOT cluster of
    near-identical vectors gets O(n) rows in one group; chunking keeps
    per-task scratch ≤ _CHUNK_ELEMS regardless)."""
    import numpy as np
    import pandas as pd

    dist2_max = DIST2_MAX
    chunk_elems = _CHUNK_ELEMS

    def pair_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {"vec_a": [], "vec_b": [], "dist2": []}
            ).astype({"vec_a": "int64", "vec_b": "int64", "dist2": "int64"})
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        Q = np.stack([np.asarray(x, dtype=np.int64) for x in pdf["q"]])
        qn = (Q * Q).sum(axis=1)
        step = max(1, chunk_elems // n)
        parts = []
        for lo in range(0, n, step):
            hi = min(lo + step, n)
            # |a|² + |b|² − 2·a·b: exact int64, identical to Σ(a−b)²
            D = qn[lo:hi, None] + qn[None, :] - 2 * (Q[lo:hi] @ Q.T)
            ii, jj = np.nonzero(
                (D <= dist2_max) & (ids[lo:hi, None] < ids[None, :])
            )
            parts.append((ids[lo + ii], ids[jj], D[ii, jj]))
        return pd.DataFrame(
            {
                "vec_a": np.concatenate([p[0] for p in parts]),
                "vec_b": np.concatenate([p[1] for p in parts]),
                "dist2": np.concatenate([p[2] for p in parts]),
            }
        )

    a2 = _two_round_assignment(spark, sf_dir, k).select("cid", "vec_id", "q")
    return a2.groupBy("cid").applyInPandas(
        pair_cluster, "vec_a long, vec_b long, dist2 long"
    )


def semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_a, vec_b, dist2): semantically-near pairs found ONLY within
    trained k-means clusters — the SemDeDup candidate generation. The
    all-pairs comparison never happens: vectors shuffle once on their
    cluster id and pair up inside the cluster.

    FIXED K=16 — the oracle-exact contrast anchor. With K constant the
    pair stage is N²/32 (measured 250 s at the 10× sweep's 20 k
    vectors), so inputs beyond MAX_FIXED_K_VECTORS refuse and point at
    :func:`semdedup_pairs_auto`, whose √N cluster count holds total
    work at Θ(N^1.5).
    """
    from simple_map_reduce_ruuner_spark.operators.dedup import (
        _parquet_row_count,
    )

    n_vecs = _parquet_row_count(os.path.join(sf_dir, "embeddings.parquet"))
    if n_vecs > MAX_FIXED_K_VECTORS:
        raise ValueError(
            f"semdedup_pairs keeps the cluster count FIXED at K={K} and "
            f"its input has {n_vecs} vectors (> {MAX_FIXED_K_VECTORS}), "
            f"making the within-cluster pair stage quadratic. Use "
            f"semdedup_pairs_auto, which grows K as √N and stays "
            f"sub-quadratic."
        )
    return _semdedup(spark, sf_dir, K)


def semdedup_pairs_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the √N-adaptive cluster count (see :func:`_k_auto`)
    — the 100 TB scale path. K comes from the input's parquet footer
    (zero Spark jobs), so the same callable self-tunes at every scale;
    at driver-gate sizes K floors to 16 and the result is value-
    identical to :func:`semdedup_pairs` (parity-tested at two sizes in
    tests/test_scale_guards.py)."""
    from simple_map_reduce_ruuner_spark.operators.dedup import (
        _parquet_row_count,
    )

    n_vecs = _parquet_row_count(os.path.join(sf_dir, "embeddings.parquet"))
    return _semdedup(spark, sf_dir, _k_auto(n_vecs))


def _semdedup_sql(k: int) -> str:
    return f"""
WITH {_pipeline_cte(k)}, pd AS (
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


SEMDEDUP_PAIRS_SQL = _semdedup_sql(K)


def semdedup_pairs_auto_sql(n_vecs: int) -> str:
    """DuckDB oracle for :func:`semdedup_pairs_auto` at a GIVEN table
    size — K must be pinned to the N the gate runs at because the
    operator derives it from the input file's footer (same generated-
    oracle pattern as dedup.neardup_embedding_lsh_auto_sql)."""
    return _semdedup_sql(_k_auto(n_vecs))


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
    "semdedup_pairs_auto": Query(
        semdedup_pairs_auto,
        # K depends on the gate table's N → oracle generated for it,
        # same pattern as dedup's neardup_embedding_lsh_auto entry
        semdedup_pairs_auto_sql(_dedup._gate_embeddings_n()),
        "SemDeDup with √N-adaptive cluster count (the 100 TB scale "
        "path; oracle generated for the sf0.01 gate N)",
    ),
}
