"""Deduplication operators for LLM-scale data pipelines.

Not present in the reference (SURVEY.md §2.C) — these are the north-star
extensions, built Spark-first:

- exact_dedup        — hash-groupBy on normalized text; one shuffle on a
                       64-bit digest, never on the full text.
- neardup_jaccard    — exact k-shingle Jaccard over candidate pairs that
                       share ≥1 shingle (inverted-index join). Exact but
                       super-linear in shared-shingle volume: the
                       *correctness anchor* for the LSH variant.
- neardup_minhash_lsh— MinHash signatures + banded LSH bucketing
                       (Broder 1997; Leskovec et al., "Mining of Massive
                       Datasets" ch. 3). Sub-quadratic: candidates only
                       within equal (band, band-signature) buckets. This
                       is the 100 TB path.
- simhash64          — 64-bit SimHash fingerprint per document
                       (Charikar 2002): near-dup docs differ in few bits.

Every hash is the md5-derived 60-bit portable hash (functions/hashing.py)
so the DuckDB oracles compute bit-identical signatures.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from simple_map_reduce_ruuner_spark.functions.hashing import (
    hash60,
    hash60_sql,
    minhash_perm,
    minhash_perm_sql,
)
from simple_map_reduce_ruuner_spark.functions.text import (
    explode_tokens,
    norm_text,
    word_shingles,
)
from simple_map_reduce_ruuner_spark.registry import Query
from simple_map_reduce_ruuner_spark.sources.tables import (
    ckpt,
    load_table,
    register_cache_clear_hook,
    session_cache,
    spread_scan,
)

SHINGLE_K = 3
JACCARD_THRESHOLD = 0.20

# Hard ceiling for the exact-Jaccard ANCHOR's input: its inverted-index
# self-join is worst-case quadratic in documents sharing a hot shingle,
# so past this it refuses and points at the sub-quadratic LSH-verified
# twin — same enforced-contract pattern as MAX_BROADCAST_VECTORS.
MAX_ALLPAIRS_DOCS = 1_000_000
N_PERMS = 16
N_BANDS = 4  # 4 rows/band: P(candidate) = 1-(1-j^4)^4, ~0.5 at j≈0.45


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per distinct normalized text: canonical (min) doc_id and
    duplicate count. Grouping key is a 60-bit digest of the normalized
    text, so the shuffle carries 8-byte keys, not documents."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", hash60(norm_text(F.col("text"))).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


from simple_map_reduce_ruuner_spark.functions.text import (
    NORM_TEXT_SQL as _NORM_TEXT_SQL,
)

EXACT_DEDUP_SQL = f"""
SELECT {hash60_sql(_NORM_TEXT_SQL)} AS text_hash,
       min(doc_id) AS keep_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Shingles (shared by jaccard / minhash / oracle SQL)
# --------------------------------------------------------------------------


def _doc_shingle_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sharr) — the DISTINCT k-word shingles of each document
    as a per-doc array.

    ``array_distinct`` dedups within the row, so the corpus-wide
    ``.distinct()`` shuffle the old exploded form needed is gone — the
    (doc_id, shingle) set is identical (shingles are only ever compared
    within/joined across docs, and duplicates only arise within a doc).
    Kept as the ARRAY (not exploded) so callers can lazily checkpoint
    the compact per-doc rows and read both ``size(sharr)`` (the exact
    distinct-shingle count, no aggregation needed) and the exploded
    form off the materialized blocks — the interpreted shingle
    transform then runs exactly once per document no matter how many
    times the plan references it (CollapseProject would otherwise
    re-inline the HOF into every consuming expression).

    spread_scan: the shingle transform is interpreted (HOF), so the
    under-split local scan would serialize it on one core."""
    docs = spread_scan(load_table(spark, sf_dir, "documents"), key="doc_id")
    return docs.select(
        "doc_id",
        F.array_distinct(word_shingles(F.col("text"), SHINGLE_K)).alias(
            "sharr"
        ),
    )


# DuckDB twin of functions.text.word_shingles (k=3): token array from
# lowercased regex split, windows of 3 joined by spaces, min one window.
_SHINGLES_SQL = r"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS t
    FROM documents
),
shingled AS (
    SELECT doc_id,
           unnest([
               array_to_string(t[i : i + 2], ' ')
               for i in range(1, greatest(len(t) - 2, 1) + 1)
           ]) AS shingle
    FROM toks
)
SELECT DISTINCT doc_id, shingle FROM shingled
"""


# --------------------------------------------------------------------------
# Exact near-dup: k-shingle Jaccard via inverted-index self-join
# --------------------------------------------------------------------------


def neardup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs (doc_a < doc_b) with shingle-set Jaccard ≥ threshold.

    Candidate generation joins on the shingle (inverted index) so only
    pairs sharing ≥1 shingle are scored — exact, and already far better
    than cross-join, but worst-case quadratic in hot shingles. Use the
    MinHash-LSH variant at scale; this one is its correctness anchor,
    and that contract is ENFORCED: above MAX_ALLPAIRS_DOCS it raises
    and directs callers to ``neardup_lsh_verified`` (banded candidate
    prefilter, sub-quadratic). The check reads parquet footer row
    counts — zero Spark jobs.
    """
    n_docs = _parquet_row_count(os.path.join(sf_dir, "documents.parquet"))
    if n_docs > MAX_ALLPAIRS_DOCS:
        raise ValueError(
            f"neardup_jaccard is the exact all-pairs ANCHOR and its input "
            f"has {n_docs} documents (> {MAX_ALLPAIRS_DOCS}). Use "
            f"neardup_lsh_verified, which scores only banded-MinHash "
            f"candidate pairs and stays sub-quadratic."
        )
    # localCheckpoint, NOT .cache(): CacheManager entries outlive the
    # returned DataFrame (nothing ever unpersisted them — review-found
    # storage-pool leak across gate+bench reps), while checkpoint blocks
    # are reference-counted and freed by the ContextCleaner once the
    # result is consumed. eager=False keeps construction job-free; the
    # first action materializes the compact per-doc arrays once and
    # both join sides explode off the blocks. Carrying size(sharr)
    # through the pair join (two extra ints per candidate row) replaces
    # the old sizes groupBy AND its two post-agg joins — the r9 rework
    # that took this query from six exchanges to two (isolated sf0.1
    # reps: 2.8/2.5/2.3 s before → 2.3/1.8/1.6/1.4 s after; the old
    # form had drifted to vs_r01 1.31, the only tracked ratio rising
    # two rounds straight).
    arr = ckpt(_doc_shingle_arrays(spark, sf_dir), eager=False)
    sh = arr.select(
        "doc_id",
        F.size("sharr").alias("n_shingles"),
        F.explode("sharr").alias("shingle"),
    )
    a = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n_shingles").alias("size_a"),
        "shingle",
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n_shingles").alias("size_b"),
        "shingle",
    )
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            # constant per doc — max() just carries it through the agg
            F.max("size_a").alias("size_a"),
            F.max("size_b").alias("size_b"),
        )
    )
    raw_jaccard = F.col("n_common") / (
        F.col("size_a") + F.col("size_b") - F.col("n_common")
    )
    return (
        # filter on the RAW ratio (like the oracle), round only for output —
        # filtering on the rounded value would disagree at the boundary
        inter.where(raw_jaccard >= JACCARD_THRESHOLD).select(
            "doc_a", "doc_b", F.round(raw_jaccard, 6).alias("jaccard")
        )
    )


NEARDUP_JACCARD_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}
"""


# --------------------------------------------------------------------------
# MinHash signatures + banded LSH candidates
# --------------------------------------------------------------------------


# The LSH dedup pipeline is a chain of shared subtrees, each consumed
# by several registry queries: distinct shingle hashes feed
# minhash_signatures, neardup_minhash_lsh, and the lsh_verified scorer;
# the candidate pairs feed lsh_verified, neardup_editdist, and
# neardup_shared_span; the verified pairs feed neardup_clusters, which
# feeds corpus_clean. Before r9 each of those seven queries recomputed
# its whole chain from the corpus (100× curve: 325 s family total).
# Session-scoped lazy checkpoints at every level (sources.tables.
# session_cache — the co-trading/simhash pattern) make the first
# EXECUTED query of the family materialize each subtree it touches once
# per session+dataset; the rest ride the blocks.
_SHINGLE_HASH_CACHE: dict[tuple[str, str], DataFrame] = {}
_LSH_CAND_CACHE: dict[tuple[str, str], DataFrame] = {}
_LSH_VERIFIED_CACHE: dict[tuple[str, str], DataFrame] = {}
_CLUSTERS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _doc_shingle_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_cache(
        _SHINGLE_HASH_CACHE,
        spark,
        sf_dir,
        lambda: _doc_shingle_hashes_plan(spark, sf_dir),
    )


def _doc_shingle_hashes_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, h): distinct 60-bit shingle hashes per document.

    Shingles are hashed BEFORE the distinct: dedup shuffles 8-byte
    hashes instead of shingle strings. The distinct hash multiset equals
    the hash multiset of distinct shingles (up to 60-bit collisions,
    which the oracle's md5 reproduces identically). Shared subtree of
    MinHash signature building AND LSH-verify scoring; the session
    cache stores the post-distinct rows (~16 B/shingle), so sibling
    queries skip the corpus re-shingle AND its shuffle entirely.
    """
    docs = spread_scan(load_table(spark, sf_dir, "documents"), key="doc_id")
    return (
        docs.select(
            "doc_id",
            F.explode(word_shingles(F.col("text"), SHINGLE_K)).alias("shingle"),
        )
        .select("doc_id", hash60(F.col("shingle")).alias("h"))
        .distinct()
    )


def _minhash_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, h0..h15): one MIN aggregate per permutation, computed in a
    SINGLE pass — no row multiplication. The shuffle carries one
    16-column row per document; partial aggregation runs map-side. This
    is the plan that survives 100×: the explode formulation multiplies
    the shingle table by N_PERMS before shuffling.
    """
    hashed = _doc_shingle_hashes(spark, sf_dir)
    h = F.col("h")
    return hashed.groupBy("doc_id").agg(
        *[F.min(minhash_perm(h, i)).alias(f"h{i}") for i in range(N_PERMS)]
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, perm, minhash): N_PERMS-permutation MinHash signature.

    Wide single-pass aggregation, then an unpivot to the long shape —
    the unpivot touches one row per doc, not one per shingle.
    """
    wide = _minhash_wide(spark, sf_dir)
    stack_expr = ", ".join(f"{i}, h{i}" for i in range(N_PERMS))
    return wide.select(
        "doc_id",
        F.expr(f"stack({N_PERMS}, {stack_expr}) AS (perm, minhash)"),
    )


def _minhash_sql() -> str:
    perm_exprs = ", ".join(
        f"({minhash_perm_sql(hash60_sql('shingle'), i)}) AS h{i}"
        for i in range(N_PERMS)
    )
    unpivots = " UNION ALL ".join(
        f"SELECT doc_id, {i} AS perm, min(h{i}) AS minhash FROM hashed GROUP BY doc_id"
        for i in range(N_PERMS)
    )
    return f"""
WITH sh AS ({_SHINGLES_SQL}),
hashed AS (SELECT doc_id, {perm_exprs} FROM sh)
{unpivots}
"""


MINHASH_SIGNATURES_SQL = _minhash_sql()


def neardup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs, session-cached (see _LSH_CAND_CACHE block):
    consumed by neardup_lsh_verified, neardup_editdist, and
    neardup_shared_span besides its own registry entry."""
    return session_cache(
        _LSH_CAND_CACHE, spark, sf_dir, lambda: _neardup_minhash_lsh_plan(spark, sf_dir)
    )


def _neardup_minhash_lsh_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs from banded MinHash-LSH.

    Signature is split into N_BANDS bands of N_PERMS/N_BANDS values; a
    pair is a candidate iff it agrees on *all* values of ≥1 band. The
    band groupBy keys are (band, h0..h3) — the shuffle is signatures,
    not documents, and candidate scoring touches only bucket-mates:
    the sub-quadratic path that survives 100 TB.
    """
    wide = _minhash_wide(spark, sf_dir)
    rows_per_band = N_PERMS // N_BANDS
    # bands assemble directly from the wide min columns (one row per doc);
    # no collect_list, no per-perm rows
    band_rows = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.array(
                    *[
                        F.col(f"h{band * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ]
                ).alias("band_sig"),
            )
            for band in range(N_BANDS)
        ]
    )
    banded = wide.select("doc_id", F.explode(band_rows).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.band_sig").alias("band_sig")
    )
    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "band_sig")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "band_sig")
    return (
        a.join(b, ["band", "band_sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def _lsh_sql() -> str:
    rows_per_band = N_PERMS // N_BANDS
    return f"""
WITH sig AS ({_minhash_sql()}),
banded AS (
    SELECT doc_id, CAST(floor(perm / {rows_per_band}) AS INTEGER) AS band,
           list(minhash ORDER BY perm) AS band_sig
    FROM sig GROUP BY 1, 2
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a
JOIN banded b ON a.band = b.band AND a.band_sig = b.band_sig
             AND a.doc_id < b.doc_id
"""


NEARDUP_MINHASH_LSH_SQL = _lsh_sql()


def neardup_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified pairs, session-cached (see _LSH_VERIFIED_CACHE block):
    consumed by neardup_clusters besides its own registry entry."""
    return session_cache(
        _LSH_VERIFIED_CACHE,
        spark,
        sf_dir,
        lambda: _neardup_lsh_verified_plan(spark, sf_dir),
    )


def _neardup_lsh_verified_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates verified with EXACT Jaccard — the production
    near-dedup pipeline: sub-quadratic candidate generation (banded
    MinHash-LSH), then exact shingle-set scoring of candidates only.

    The verify join is keyed (doc, shingle-hash) against the candidate
    list, so scoring cost is O(candidate pairs × shingles/doc), never the
    inverted-index worst case of the ``neardup_jaccard`` anchor. Verify
    consumes the SAME distinct (doc_id, hash) subtree the MinHash
    signatures are built from: 8-byte join keys instead of shingle
    strings, and the identical subplan lets Spark reuse the exchange
    rather than re-shingling the corpus. Jaccard over hashed shingle
    sets equals Jaccard over the shingle sets themselves up to 60-bit
    collisions, which the oracle's identical md5 hashing reproduces
    bit-for-bit. Output shape matches the anchor; at 100 TB only this
    path runs.
    """
    cand = neardup_minhash_lsh(spark, sf_dir)
    sh = _doc_shingle_hashes(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))

    sa = sh.select(F.col("doc_id").alias("doc_a"), "h")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    raw_jaccard = F.col("n_common") / (
        F.col("size_a") + F.col("size_b") - F.col("n_common")
    )
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .where(raw_jaccard >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(raw_jaccard, 6).alias("jaccard"))
    )


NEARDUP_LSH_VERIFIED_SQL = f"""
WITH sh0 AS ({_SHINGLES_SQL}),
sh AS (SELECT DISTINCT doc_id, {hash60_sql("shingle")} AS h FROM sh0),
cand AS ({NEARDUP_MINHASH_LSH_SQL.strip()}),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS n_common
    FROM cand c
    JOIN sh a ON a.doc_id = c.doc_a
    JOIN sh b ON b.doc_id = c.doc_b AND b.h = a.h
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}
"""


# --------------------------------------------------------------------------
# SimHash (Charikar 2002): 64-bit fingerprint; near-dups differ in few bits
# --------------------------------------------------------------------------

SIMHASH_BITS = 60  # our portable hash has 60 usable bits


# simhash signatures are consumed twice per session (the `simhash`
# registry query and `simhash_band_pairs`, textlm.py) — same
# keyed-lazy-checkpoint sharing as graph._COTRADING_CACHE: whichever
# query EXECUTES first materializes the (doc_id, simhash) blocks
# (n_docs × 16 B — tiny), the sibling rides them. eager=False keeps
# construction job-free for EXPLAIN/plan tests/registry sweeps.
_SIMHASH_CACHE: dict[tuple[str, str], DataFrame] = {}


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_cache(
        _SIMHASH_CACHE, spark, sf_dir, lambda: _simhash_plan(spark, sf_dir)
    )


simhash.__doc__ = """(doc_id, simhash): per-bit majority vote over token
    hashes — session-cached checkpoint of :func:`_simhash_plan`."""


def _simhash_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash): per-bit majority vote over token hashes.

    ZERO-shuffle formulation: tokenize + the md5-derived 60-bit hash
    stay JVM-side (one codegen span, bit-identical to the oracle), and
    the 60-bit vote fold runs as an exact int64 Arrow kernel directly
    on each scan partition's token rows — no exchange anywhere in the
    plan. The partition-local fold is TOTAL because the lineage from
    the row-granular scan (spread_scan's repartition moves whole rows)
    through split/explode/WHERE/project is narrow: every token row of a
    document lives in the partition that held the document row, so each
    doc_id's votes are summed exactly once, in one task. Evolution:
    r8's bit-position explode pushed ~6 B (doc, bit, vote) rows through
    two hash shuffles (70 s at 100×); the first kernel form collapsed
    to per-(doc, h) counts but still paid a groupBy shuffle plus a
    repartition("doc_id") of the vocab-bounded rows (47 s at 100×);
    this form deletes both exchanges and folds raw token rows — the
    ×60 vote matrix is three vectorized int64 numpy ops either way,
    and integer sums are order-insensitive, so every formulation is
    unconditionally value-identical (the oracle keeps the explode SQL).
    A wide-column SQL aggregate variant was also rejected earlier: 60
    SUM buffers inline into one generated hashAgg method — the HotSpot
    huge-method JIT fallback semdedup was jstack'd hitting.

    The reassembly is total: a doc whose votes are all negative emits
    simhash 0 rather than vanishing — np.where keeps the row with no
    set bits, and every doc with ≥1 token reaches the fold, so doc
    coverage is exactly the explode form's.

    Measured 100× (SCALE_CURVE_100X_r09.json; cold session, the row
    carries the signature-checkpoint materialization): r8 explode
    70.3 s → two-shuffle kernel 47.4 s → this form 6.5 s, with
    simhash_band_pairs riding the shared signatures 62.8 → 17.6 s —
    family total 110 → 24 s.
    """
    docs = spread_scan(load_table(spark, sf_dir, "documents"), key="doc_id")
    hashed = explode_tokens(docs, keep=("doc_id",)).select(
        "doc_id", hash60(F.col("token")).alias("h")
    )
    return hashed.mapInPandas(_simhash_vote_fold(), "doc_id long, simhash long")


def _simhash_vote_fold():
    """The partition-local 60-bit vote-fold kernel behind
    :func:`_simhash_plan` — exposed as a factory so
    tests/test_simhash_kernel.py can drive the exact production code
    path on synthetic frames."""
    import numpy as np
    import pandas as pd

    n_bits = SIMHASH_BITS

    def vote_fold(batches):
        shifts = np.arange(n_bits, dtype=np.int64)
        run_ids, run_votes = [], []
        for b in batches:
            ids = b["doc_id"].to_numpy(dtype=np.int64)
            if not len(ids):
                continue
            h = b["h"].to_numpy(dtype=np.int64)
            # Tokens arrive in row order, so each doc is ONE contiguous
            # run per batch (a doc split across batches yields two runs
            # — merged by the final groupby). Segment-summing the
            # (rows × 60) bit matrix with reduceat beats a 61-column
            # pandas groupby over token rows by the sort/hash it skips:
            # votes_j = 2·(set bits at j) − tokens, exact int64.
            starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
            lens = np.diff(np.r_[starts, len(ids)])
            bits = (h[:, None] >> shifts[None, :]) & np.int64(1)
            sums = np.add.reduceat(bits, starts, axis=0)
            run_ids.append(ids[starts])
            run_votes.append(2 * sums - lens[:, None])
        if not run_ids:
            return
        # one runs-sized (≈ docs-per-partition) collapse, never token-sized
        g = pd.DataFrame(np.vstack(run_votes))
        g.insert(0, "doc_id", np.concatenate(run_ids))
        g = g.groupby("doc_id", as_index=False).sum()
        v = g.iloc[:, 1:].to_numpy(dtype=np.int64)
        sim = np.where(v > 0, np.int64(1) << shifts[None, :], np.int64(0)).sum(
            axis=1
        )
        yield pd.DataFrame({"doc_id": g["doc_id"], "simhash": sim})

    return vote_fold


SIMHASH_SQL = f"""
WITH toks AS (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS token
    FROM documents
),
hashed AS (SELECT doc_id, {hash60_sql("token")} AS h FROM toks),
votes AS (
    SELECT doc_id, bit,
           SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote_sum
    FROM hashed, (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS bit)
    GROUP BY doc_id, bit
)
SELECT doc_id,
       CAST(SUM(CASE WHEN vote_sum > 0 THEN 1::BIGINT << bit ELSE 0 END)
            AS BIGINT) AS simhash
FROM votes
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# Near-dup clustering: connected components over the Jaccard pair graph
# --------------------------------------------------------------------------


DEFAULT_CLUSTER_MAX_ITER = 25


def neardup_clusters(
    spark: SparkSession, sf_dir: str, max_iter: int | None = None
) -> DataFrame:
    """Session-cached (default max_iter only; see _CLUSTERS_CACHE
    block): the fixpoint loop below runs EAGERLY at call time, so
    without the memo corpus_clean re-runs the whole iteration. The
    result is already a localCheckpoint — memoized as-is
    (checkpoint=False). Only the ``max_iter=None`` default path is
    memoized (a single DEFAULT_CLUSTER_MAX_ITER constant, so the memo
    guard can't drift from the default); an explicit budget always
    computes fresh."""
    if max_iter is not None:
        return _neardup_clusters_fixpoint(spark, sf_dir, max_iter)
    return session_cache(
        _CLUSTERS_CACHE,
        spark,
        sf_dir,
        lambda: _neardup_clusters_fixpoint(
            spark, sf_dir, DEFAULT_CLUSTER_MAX_ITER
        ),
        checkpoint=False,
    )


def _neardup_clusters_fixpoint(
    spark: SparkSession, sf_dir: str, max_iter: int
) -> DataFrame:
    """(doc_id, cluster_id): connected components of the near-dup graph,
    cluster_id = min doc_id in the component; singletons keep their own id.

    Iterative min-label propagation — the canonical Pregel-style loop on
    DataFrames: each round, every node takes the min of its own label and
    its neighbors' labels; converged when no label changes. Rounds =
    graph diameter (tiny for dup clusters). ``localCheckpoint`` truncates
    lineage each round so plans don't grow unboundedly — the standard
    guard for iterative DataFrame algorithms at scale.

    Edges come from the PRODUCTION pipeline (``neardup_lsh_verified``:
    banded LSH candidates, exact-Jaccard-verified within buckets), not
    from the quadratic ``neardup_jaccard`` anchor — the whole clustering
    path is sub-quadratic and survives 100 TB.

    The DuckDB oracle computes the same fixpoint with a recursive CTE
    (transitive closure + min) over the same verified-LSH edge set,
    feasible because the pair graph is small at oracle scale.
    """
    pairs = neardup_lsh_verified(spark, sf_dir).select("doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # checkpoint AFTER repartition+sort on the per-round join key:
    # localCheckpoint preserves physical partitioning and ordering, so
    # every round's edges⋈labels sort-merge join reads the cached edge
    # blocks in place — no |E|-sized exchange OR sort per iteration
    # (same discipline as pagerank_trading's edge checkpoint).
    edges = ckpt(
        pairs.unionAll(
            pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
        .withColumnsRenamed({"doc_a": "src", "doc_b": "dst"})
        .repartition("dst")
        .sortWithinPartitions("dst")
    )

    labels = ckpt(
        docs.select("doc_id", F.col("doc_id").alias("label"))
        .repartition("doc_id")
        .sortWithinPartitions("doc_id")
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = ckpt(
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("nmin", "label")).alias("label"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # a component whose diameter exceeds max_iter hops would return
        # SPLIT clusters with no signal (review-found) — corpus_clean
        # would then keep extra "canonical" duplicates. Fail loudly;
        # callers with genuinely deep chains pass a larger max_iter.
        raise RuntimeError(
            f"neardup_clusters did not converge in {max_iter} iterations "
            f"({changed} labels still changing) — raise max_iter"
        )
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


def _clusters_sql() -> str:
    pairs_sql = NEARDUP_LSH_VERIFIED_SQL.strip()
    return f"""
WITH RECURSIVE
pairs AS (SELECT doc_a, doc_b FROM ({pairs_sql})),
sym AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(a, b) AS (
    SELECT doc_id AS a, doc_id AS b FROM documents
    UNION
    SELECT a, b FROM sym
    UNION
    SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
)
SELECT a AS doc_id, min(b) AS cluster_id
FROM reach GROUP BY a
"""


NEARDUP_CLUSTERS_SQL = _clusters_sql()


# --------------------------------------------------------------------------
# Embedding-cosine near-dup: semantic duplicates via the embeddings table
# --------------------------------------------------------------------------

COSINE_DUP_THRESHOLD = 0.45

# Hard ceiling for the anchor's broadcast build side: ~1 GiB of float64 at
# 64 dims. Above this the anchor refuses and points at the LSH path — the
# broadcast contract is enforced, not aspirational.
MAX_BROADCAST_VECTORS = 2_000_000

# (applicationId, parquet fingerprint) -> Broadcast[(ids, matrix, norms)];
# see neardup_embedding. At most one live entry per SparkContext.
_EMB_BUILD_CACHE: dict[tuple, object] = {}


def _clear_emb_build_cache(sf_dir: str | None) -> None:
    """clear_session_caches() hook: the broadcast cache is keyed by
    (app, parquet file fingerprint) rather than (app, sf_dir), and its
    values need an explicit Broadcast.unpersist — the generic dict
    sweep can't do either."""
    real = os.path.realpath(sf_dir) + os.sep if sf_dir is not None else None
    victims = [
        k
        for k in _EMB_BUILD_CACHE
        if real is None
        or any(os.path.realpath(f).startswith(real) for f, _, _ in k[1])
    ]
    for k in victims:
        try:
            _EMB_BUILD_CACHE.pop(k).unpersist()
        except Exception:
            pass  # context already stopped; nothing to free


register_cache_clear_hook(_clear_emb_build_cache)


def _parquet_file_stats(path: str) -> tuple[tuple[str, int, int], ...]:
    """(file, size, mtime_ns) fingerprint of a parquet file/directory —
    the cache key for anything derived from its on-disk content."""
    import glob as _glob
    import os as _os

    files = (
        sorted(_glob.glob(_os.path.join(path, "*.parquet")))
        if _os.path.isdir(path)
        else [path]
    )
    out = []
    for f in files:
        st = _os.stat(f)
        out.append((f, st.st_size, st.st_mtime_ns))
    return tuple(out)


_ROW_COUNT_CACHE: dict[tuple, int] = {}


def _parquet_row_count(path: str) -> int:
    """Total rows from parquet footer metadata (file or directory of part
    files) — no data read, no Spark job. Cached per (file, size, mtime)
    fingerprint so repeated calls (bench reps, gate + bench in one
    session) stat the files but re-read no footers."""
    import pyarrow.parquet as pq

    key = _parquet_file_stats(path)
    if key not in _ROW_COUNT_CACHE:
        _ROW_COUNT_CACHE[key] = sum(
            pq.ParquetFile(f).metadata.num_rows for f, _, _ in key
        )
    return _ROW_COUNT_CACHE[key]


def neardup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of vectors with cosine ≥ threshold — semantic near-dedup.

    All-pairs scoring is dense linear algebra, exactly the case where the
    built-in operators can't compete: the Catalyst higher-order-function
    formulation (zip_with + aggregate per pair) measured 31 s at sf0.1;
    this Arrow-batched numpy kernel (one BLAS matmul per partition
    against a broadcast matrix) does the identical math in ~1 s.
    Divergence from the oracle's sequential-sum dot products is ≤3e-16
    (measured), far below the 1e-6 output rounding — verified value-equal
    vs DuckDB at sf0.01.

    Scale shape: one side streams through mapInPandas partition-by-
    partition; the other side is a broadcast matrix — the vector analog
    of a broadcast hash join, valid ONLY while the build side fits in
    memory. That contract is enforced: > MAX_BROADCAST_VECTORS raises and
    directs callers to ``neardup_embedding_lsh`` (bucketed, no broadcast
    of the full table).
    """
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # Enforce the broadcast contract from parquet FOOTER metadata — zero
    # Spark jobs, O(file count) driver work at any scale (a limit-probe
    # measured +0.9s at sf0.1 because GlobalLimit funnels the collect
    # through one partition; a count() scans the table).
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    n_vecs = _parquet_row_count(emb_path)
    if n_vecs > MAX_BROADCAST_VECTORS:
        raise ValueError(
            f"neardup_embedding is the broadcast all-pairs ANCHOR and its "
            f"build side has {n_vecs} vectors (> {MAX_BROADCAST_VECTORS}). "
            f"Use neardup_embedding_lsh, which prefilters candidate pairs "
            f"by shared hyperplane-LSH band and never collects the table."
        )
    if n_vecs == 0:  # empty table: np.stack([]) raises
        return emb.sparkSession.createDataFrame(
            [], "vec_a long, vec_b long, cos_sim double"
        )
    # Build side cached per (SparkContext, file fingerprint): the vector
    # analog of reusing a broadcast hash-join build side across queries in
    # one session. Repeated calls (bench reps, gate+bench) pay only the
    # streaming-side matmul job; a changed file or restarted context
    # rebuilds and unpersists the evicted broadcast. Measured at sf0.1:
    # the collect+broadcast rebuild is ~0.2-1.4 s of a ~0.6 s query.
    key = (spark.sparkContext.applicationId, _parquet_file_stats(emb_path))
    bc = _EMB_BUILD_CACHE.get(key)
    if bc is None:
        side = emb.toPandas()  # parallel Arrow collect (size-checked above)
        ids_b = side["vec_id"].to_numpy(dtype=np.int64)
        M_b = np.stack([np.asarray(e, dtype=np.float64) for e in side["embedding"]])
        n_b = np.sqrt((M_b * M_b).sum(axis=1))
        bc = spark.sparkContext.broadcast((ids_b, M_b, n_b))
        for old_key in [k for k in _EMB_BUILD_CACHE if k[0] == key[0]]:
            try:
                _EMB_BUILD_CACHE.pop(old_key).unpersist()
            except Exception:
                pass  # context already stopped; nothing to free
        _EMB_BUILD_CACHE[key] = bc
    threshold = COSINE_DUP_THRESHOLD

    def score(batches):
        ids2, M2, n2 = bc.value
        for pdf in batches:
            if not len(pdf):  # empty Arrow batch: np.stack([]) raises
                continue
            ida = pdf["vec_id"].to_numpy(dtype=np.int64)
            Ma = np.stack([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
            na = np.sqrt((Ma * Ma).sum(axis=1))
            denom = np.outer(na, n2)
            with np.errstate(divide="ignore", invalid="ignore"):
                S = np.where(denom == 0.0, 0.0, (Ma @ M2.T) / denom)
            ii, jj = np.nonzero((S >= threshold) & (ida[:, None] < ids2[None, :]))
            yield pd.DataFrame(
                {
                    "vec_a": ida[ii],
                    "vec_b": ids2[jj],
                    "cos_sim": np.round(S[ii, jj], 6),
                }
            )

    return emb.mapInPandas(score, "vec_a long, vec_b long, cos_sim double")


NEARDUP_EMBEDDING_SQL = f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS emb,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
    FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) >= {COSINE_DUP_THRESHOLD}
"""


def neardup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via banded hyperplane-LSH prefilter —
    the 100 TB path for semantic dedup.

    The 8-bit rh_lsh bucket (similarity.py) is split into two 4-bit
    bands; a pair is a candidate iff it agrees on at least one band
    (OR-construction, same banding idea as MinHash-LSH). Candidate
    generation is a self-join keyed by (band, sub-bucket): each vector
    shuffles twice by a tiny key, scoring touches only band-mates —
    never all pairs, and nothing is collected to the driver; at ~N²/16
    expected candidates per band the in-bucket scoring work is bounded
    by the same banding that bounds the candidates.

    Deterministic end-to-end (md5-derived hyperplanes), so the
    *approximate* operator still has an exact DuckDB oracle — the
    approximation lives in recall vs the ``neardup_embedding`` anchor,
    which pytest bounds (planted duplicate pairs agree on a band with
    high probability at cosine ≥ ~0.9).

    Scoring history (each step measured, see SCALE.md): per-pair
    zip_with/aggregate 11.9 s at sf0.1 → Arrow row-wise einsum over the
    joined candidate pairs ~3 s → since r7 the bucket-LOCAL matmul tail
    (:func:`_score_within_buckets`), which drops the candidate-pair
    join/DISTINCT shuffle entirely — same anchor-identical float64
    math, pairs computed inside their (band, sub) group.

    PARAMETER caveat (measured by tools/scale_curve.py): the banding
    here is FIXED (2 bands × 4 bits = 16 sub-buckets/band) for oracle
    parity, so expected candidates are ~N²/32 — sub-quadratic only by
    a constant (measured 175× growth on 100× data). That contract is
    ENFORCED like the other anchors: above MAX_FIXED_BAND_VECTORS it
    refuses and directs callers to :func:`neardup_embedding_lsh_auto`,
    which widens the codes with N so candidate counts stay ~linear.
    The check reads parquet footer row counts — zero Spark jobs.
    """
    from simple_map_reduce_ruuner_spark.operators.similarity import rh_lsh_buckets

    n_vecs = _parquet_row_count(os.path.join(sf_dir, "embeddings.parquet"))
    if n_vecs > MAX_FIXED_BAND_VECTORS:
        raise ValueError(
            f"neardup_embedding_lsh uses FIXED 2x4-bit banding (~N²/32 "
            f"candidates — quadratic by constant) and its input has "
            f"{n_vecs} vectors (> {MAX_FIXED_BAND_VECTORS}). Use "
            f"neardup_embedding_lsh_auto, which sizes bands x bits from "
            f"N so candidate counts stay ~linear."
        )
    banded = _banded(rh_lsh_buckets(spark, sf_dir), bands=2, bits=4)
    return _score_within_buckets(spark, sf_dir, banded)


def _banded(buckets: DataFrame, bands: int, bits: int) -> DataFrame:
    """(vec_id, band, sub): split an int64 sign-bitmap bucket into
    ``bands`` contiguous ``bits``-wide band codes (OR-construction)."""
    mask = (1 << bits) - 1
    return buckets.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("bucket"), i * bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("sub"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("b"),
    ).select("vec_id", F.col("b.band").alias("band"), F.col("b.sub").alias("sub"))


# N-adaptive LSH sizing targets. Mean band-bucket occupancy ~N/2^bits;
# TARGET_BUCKET_ROWS holds expected candidates per band to ~N·target/2.
# Band count is then chosen so a PLANTED duplicate (cosine ≥ 0.9, the
# semantic-dedup regime) is recalled with probability ≥ RECALL_TARGET:
# P(pair shares ≥1 band) = 1 − (1 − p^bits)^bands, p = 1 − θ/π.
TARGET_BUCKET_ROWS = 64
RECALL_COSINE = 0.90
RECALL_TARGET = 0.80

# Hard ceiling for the FIXED-banding variant: its 2×4-bit code space is
# constant, so candidates grow ~N²/32 regardless of input — past this it
# refuses and points at the N-adaptive twin (same enforced-contract
# pattern as MAX_ALLPAIRS_DOCS / MAX_BROADCAST_VECTORS). Sized so the
# 10× scale sweep (20 k vectors, measured 2.3× growth) still admits the
# contrast while the 100× regime (200 k, measured 175×) is fenced.
MAX_FIXED_BAND_VECTORS = 100_000


def _auto_lsh_params(n_vecs: int) -> tuple[int, int]:
    """(bands, bits) sized for ``n_vecs``: bits grows as log2(N) so
    per-band candidate counts stay ~linear, and bands compensates the
    per-band recall loss so P(recall a RECALL_COSINE pair) ≥
    RECALL_TARGET by the closed form 1 − (1 − p^bits)^bands. bands
    itself then grows like (N/target)^ρ with ρ = ln(1/p)/ln 2 ≈ 0.22
    at the 0.9 regime — total work ~N^(1+ρ), the genuine hyperplane-
    LSH exponent (sub-quadratic by construction, vs the fixed-parameter
    variant's N²/32). Pure arithmetic — unit-tested against the
    recall bound."""
    import math

    bits = min(
        62, max(4, math.ceil(math.log2(max(n_vecs, 1) / TARGET_BUCKET_ROWS)))
    )
    p = 1.0 - math.acos(RECALL_COSINE) / math.pi
    miss = 1.0 - p**bits
    bands = 2 if miss <= 0.0 else max(
        2, math.ceil(math.log(1.0 - RECALL_TARGET) / math.log(miss))
    )
    return bands, bits


# Per-chunk scratch budget for the bucket-local matmul: chunk×n float64
# elements (~64 MB at 8 M) — bounds a skewed bucket's task memory.
_SCORE_CHUNK_ELEMS = 8_000_000


def _score_within_buckets(
    spark: SparkSession, sf_dir: str, banded: DataFrame
) -> DataFrame:
    """Bucket-local all-pairs scoring: join each vector's embedding to
    its (band, sub) code rows ONCE (N×bands rows), then compute every
    band-mate pair inside its bucket with one BLAS matmul per group and
    dedup the (tiny) thresholded output across bands.

    This is the scale tail for wide-banded LSH: the candidate-join
    formulation (the r7-interim tail, since removed) materializes and shuffles
    every candidate pair twice (pair list + two embedding joins) — at
    the 100× sweep's 200 k vectors that is ~48 M pairs ≈ 50 GB of
    joined doubles (240 s measured); here the shuffle carries only the
    N×bands coded vectors (~1 GB) and the quadratic work happens as
    in-bucket arithmetic, which is exactly where LSH sizing already
    bounds it (TARGET_BUCKET_ROWS). Same float64 matmul math as the
    anchor kernel, so values are oracle-identical (parity-tested at
    two sizes). A pair sharing several bands is scored once per band;
    the closing dedup groups on the PAIR KEY (max over the — in
    practice identical — per-band scores), not on the float, so a
    last-ulp BLAS blocking difference between different-sized buckets
    can never leak a duplicate pair row.

    Memory contract: bucket sizing (TARGET_BUCKET_ROWS) bounds the mean
    group, but a HOT bucket of near-identical vectors — exactly the
    shape of heavy-duplicate dedup inputs — can put O(N) rows in one
    group, and a single n×n score matrix would then be O(N²) bytes in
    one task. The matmul therefore runs in row CHUNKS against the full
    bucket matrix: per-chunk scratch is chunk×n ≤ _SCORE_CHUNK_ELEMS
    float64s (~64 MB) no matter how skewed the buckets are, while the
    bucket matrix itself stays O(n·d). Chunking never changes values —
    each cosine is still one k=64 dot product; only the blocking of the
    output matrix differs."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    coded = banded.join(emb, "vec_id")
    threshold = COSINE_DUP_THRESHOLD
    chunk_elems = _SCORE_CHUNK_ELEMS

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {"vec_a": [], "vec_b": [], "cos_sim": []}
            ).astype({"vec_a": "int64", "vec_b": "int64", "cos_sim": "float64"})
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        M = np.stack([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
        nrm = np.sqrt((M * M).sum(axis=1))
        step = max(1, chunk_elems // n)
        parts = []
        with np.errstate(divide="ignore", invalid="ignore"):
            for lo in range(0, n, step):
                hi = min(lo + step, n)
                denom = np.outer(nrm[lo:hi], nrm)
                S = np.where(denom == 0.0, 0.0, (M[lo:hi] @ M.T) / denom)
                ii, jj = np.nonzero(
                    (S >= threshold) & (ids[lo:hi, None] < ids[None, :])
                )
                parts.append((ids[lo + ii], ids[jj], np.round(S[ii, jj], 6)))
        return pd.DataFrame(
            {
                "vec_a": np.concatenate([p[0] for p in parts]),
                "vec_b": np.concatenate([p[1] for p in parts]),
                "cos_sim": np.concatenate([p[2] for p in parts]),
            }
        )

    pairs = coded.groupBy("band", "sub").applyInPandas(
        score_bucket, "vec_a long, vec_b long, cos_sim double"
    )
    return pairs.groupBy("vec_a", "vec_b").agg(
        F.max("cos_sim").alias("cos_sim")
    )


def neardup_embedding_lsh_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via N-ADAPTIVE banded hyperplane-LSH —
    the actual 100 TB path for semantic dedup.

    tools/scale_curve.py caught the fixed-parameter variant growing
    68.9× on 10× data (expected candidates N²/32 — quadratic in all but
    name). The scaling law is classic b×r LSH: to keep candidates
    linear the band width must grow with log2(N), and the band COUNT
    must grow with it to hold recall at the duplicate threshold. This
    variant reads N from parquet footers (zero Spark jobs, same
    mechanism as the anchor guards), sizes (bands, bits) via
    :func:`_auto_lsh_params`, and computes per-band codes with
    `similarity.banded_codes_of` (same deterministic exact-integer
    hyperplane matrix; per-band aggregates, so the plane budget is not
    capped by one int64 bitmap) feeding the anchor-identical scoring
    kernel.

    Still deterministic for a given input FILE (params depend only on
    the footer row count), but the params — hence the candidate set —
    change with N, so this operator's oracle story is recall-vs-anchor
    (tests/test_scale_guards.py pins subset-exactness and planted-dup
    recall) rather than one static SQL string; register it with a
    size-pinned oracle only for a fixed-sf gate.
    """
    n_vecs = _parquet_row_count(os.path.join(sf_dir, "embeddings.parquet"))
    bands, bits = _auto_lsh_params(n_vecs)
    from simple_map_reduce_ruuner_spark.operators.similarity import banded_codes_of

    return _score_within_buckets(
        spark, sf_dir, banded_codes_of(spark, sf_dir, bands, bits)
    )


def neardup_embedding_lsh_auto_sql(n_vecs: int) -> str:
    """DuckDB oracle for :func:`neardup_embedding_lsh_auto` at a GIVEN
    table size — the (bands, bits) parameterization must be pinned to
    the N the gate runs at (the driver gates at sf0.01), because the
    operator derives it from the input file's footer. Generated, not
    static, so registering it means calling this with that N
    (oracle-parity-tested at sf0.001 AND sf0.01 in
    tests/test_scale_guards.py)."""
    from simple_map_reduce_ruuner_spark.operators.similarity import (
        banded_codes_sql,
    )

    bands, bits = _auto_lsh_params(n_vecs)
    return f"""
WITH {banded_codes_sql(bands, bits)},
cand AS (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.sub = b.sub AND a.vec_id < b.vec_id
),
e AS (
    SELECT vec_id, embedding::DOUBLE[] AS emb,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
    FROM embeddings
)
SELECT vec_a, vec_b,
       ROUND(CASE WHEN ea.nrm * eb.nrm = 0 THEN 0.0
                  ELSE list_dot_product(ea.emb, eb.emb) / (ea.nrm * eb.nrm)
             END, 6) AS cos_sim
FROM cand
JOIN e ea ON ea.vec_id = vec_a
JOIN e eb ON eb.vec_id = vec_b
WHERE CASE WHEN ea.nrm * eb.nrm = 0 THEN 0.0
           ELSE list_dot_product(ea.emb, eb.emb) / (ea.nrm * eb.nrm)
      END >= {COSINE_DUP_THRESHOLD}
"""


def _gate_embeddings_n(default: int = 500) -> int:
    """Embeddings row count at the DRIVER GATE size (sf0.01 — the one
    scale the registry oracle is compared at, see TESTDATA.md): the
    N-adaptive operator derives (bands, bits) from its input's footer,
    so its static registry oracle must be generated for that same N.
    Read from the gate table's footer when present (zero Spark jobs);
    the fallback is the committed sf0.01 count, so building the
    registry never fails on a machine without the testdata tree."""
    try:
        return _parquet_row_count("/root/testdata/sf0.01/embeddings.parquet")
    except OSError:
        return default


def _neardup_embedding_lsh_sql() -> str:
    from simple_map_reduce_ruuner_spark.operators.similarity import RH_LSH_BUCKETS_SQL

    return f"""
WITH buckets AS ({RH_LSH_BUCKETS_SQL}),
banded AS (
    SELECT vec_id, 0 AS band, bucket & 15 AS sub FROM buckets
    UNION ALL
    SELECT vec_id, 1 AS band, bucket >> 4 AS sub FROM buckets
),
cand AS (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.sub = b.sub AND a.vec_id < b.vec_id
),
e AS (
    SELECT vec_id, embedding::DOUBLE[] AS emb,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
    FROM embeddings
)
SELECT vec_a, vec_b,
       ROUND(CASE WHEN ea.nrm * eb.nrm = 0 THEN 0.0
                  ELSE list_dot_product(ea.emb, eb.emb) / (ea.nrm * eb.nrm)
             END, 6) AS cos_sim
FROM cand
JOIN e ea ON ea.vec_id = vec_a
JOIN e eb ON eb.vec_id = vec_b
WHERE CASE WHEN ea.nrm * eb.nrm = 0 THEN 0.0
           ELSE list_dot_product(ea.emb, eb.emb) / (ea.nrm * eb.nrm)
      END >= {COSINE_DUP_THRESHOLD}
"""


NEARDUP_EMBEDDING_LSH_SQL = _neardup_embedding_lsh_sql()




def neardup_shared_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, max_run, lcs_tokens): longest shared token span per
    LSH candidate pair — substring-level duplication, the signal behind
    substring dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better": verbatim spans matter, not just
    whole-document similarity).

    A run of R consecutive positions where both documents' k-shingles
    agree certifies a common token substring of R + k - 1 tokens.
    Distributed shape: positional shingle hashes join only the LSH
    candidate pairs (never all pairs), then the classic gaps-and-islands
    trick finds maximal runs — matches on one alignment share
    pa - pb (the diagonal), and within a diagonal consecutive pa values
    share pa - row_number(); window partitions are per (pair, diagonal),
    bounded by document length. Everything is candidate-bounded: the
    corpus-wide positional table shuffles once per side, keyed by doc.
    """
    pos_sh = (
        spread_scan(load_table(spark, sf_dir, "documents"), key="doc_id")
        .select(
            "doc_id",
            F.posexplode(word_shingles(F.col("text"), SHINGLE_K)).alias(
                "pos", "shingle"
            ),
        )
        .select("doc_id", "pos", hash60(F.col("shingle")).alias("h"))
    )
    cand = neardup_minhash_lsh(spark, sf_dir)
    a = pos_sh.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa"), "h"
    )
    b = pos_sh.select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"), "h"
    )
    m = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "h"])
        .select("doc_a", "doc_b", "pa", (F.col("pa") - F.col("pb")).alias("diag"))
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = (
        m.withColumn("island", F.col("pa") - F.row_number().over(w))
        .groupBy("doc_a", "doc_b", "diag", "island")
        .agg(F.count(F.lit(1)).alias("run"))
    )
    return runs.groupBy("doc_a", "doc_b").agg(
        F.max("run").cast("long").alias("max_run"),
        (F.max("run") + SHINGLE_K - 1).cast("long").alias("lcs_tokens"),
    )


def _shared_span_sql() -> str:
    return f"""
WITH cand AS ({NEARDUP_MINHASH_LSH_SQL.strip()}),
toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS t
    FROM documents
),
pos_sh AS (
    SELECT doc_id,
           unnest([
               {{'pos': i, 'sh': array_to_string(t[i : i + {SHINGLE_K - 1}], ' ')}}
               for i in range(1, greatest(len(t) - {SHINGLE_K - 1}, 1) + 1)
           ], recursive := true)
    FROM toks
),
hashed AS (SELECT doc_id, pos, {hash60_sql('sh')} AS h FROM pos_sh),
m AS (
    SELECT c.doc_a, c.doc_b, a.pos AS pa, a.pos - b.pos AS diag
    FROM cand c
    JOIN hashed a ON a.doc_id = c.doc_a
    JOIN hashed b ON b.doc_id = c.doc_b AND b.h = a.h
),
isl AS (
    SELECT doc_a, doc_b, diag, pa,
           pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa)
               AS island
    FROM m
),
runs AS (
    SELECT doc_a, doc_b, count(*) AS run
    FROM isl GROUP BY doc_a, doc_b, diag, island
)
SELECT doc_a, doc_b,
       CAST(max(run) AS BIGINT) AS max_run,
       CAST(max(run) + {SHINGLE_K} - 1 AS BIGINT) AS lcs_tokens
FROM runs GROUP BY 1, 2
"""


NEARDUP_SHARED_SPAN_SQL = _shared_span_sql()


# --------------------------------------------------------------------------
# Incremental dedup (incoming batch vs existing corpus)
# --------------------------------------------------------------------------

# Incoming-batch slice: doc_id % INCR_MOD == INCR_REM plays the freshly
# crawled batch; everything else is the already-ingested corpus. Same
# self-contained-fixture pattern as mixing.EVAL_MOD.
INCR_MOD = 10
INCR_REM = 7


def incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedupe an incoming batch against the existing corpus: each incoming
    doc is classified ``dup_of_corpus`` (normalized text already ingested),
    ``dup_in_batch`` (first seen earlier in this same batch), or ``new``,
    with the matching doc_id where one exists.

    This is the continuously-ingested-crawl shape: at 100 TB you never
    re-dedupe the whole corpus per batch — you maintain a persistent
    (text_hash → min doc_id) index and anti/left-join each incoming batch
    against it. Here the "index" is built inline from the corpus slice by
    the same ``groupBy(hash).min(doc_id)`` that would maintain it
    incrementally; the join then carries 8-byte digests, not documents,
    and is hash-partitioned on the digest. Batch-internal first-seen uses
    a window over the (small) batch only — the corpus is never windowed.
    """
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id", hash60(norm_text(F.col("text"))).alias("h")
    )
    incoming = hashed.filter(F.col("doc_id") % INCR_MOD == INCR_REM)
    corpus_index = (
        hashed.filter(F.col("doc_id") % INCR_MOD != INCR_REM)
        .groupBy("h")
        .agg(F.min("doc_id").alias("corpus_doc_id"))
    )
    batch_w = Window.partitionBy("h")
    inc = incoming.withColumn("batch_min", F.min("doc_id").over(batch_w))
    joined = inc.join(corpus_index, "h", "left")
    is_corpus_dup = F.col("corpus_doc_id").isNotNull()
    is_batch_dup = F.col("batch_min") < F.col("doc_id")
    return joined.select(
        "doc_id",
        F.when(is_corpus_dup, F.lit("dup_of_corpus"))
        .when(is_batch_dup, F.lit("dup_in_batch"))
        .otherwise(F.lit("new"))
        .alias("status"),
        F.when(is_corpus_dup, F.col("corpus_doc_id"))
        .when(is_batch_dup, F.col("batch_min"))
        .cast("long")
        .alias("match_doc_id"),
    )


INCREMENTAL_DEDUP_SQL = f"""
WITH hashed AS (
    SELECT doc_id, {hash60_sql(_NORM_TEXT_SQL)} AS h FROM documents
),
corpus AS (
    SELECT h, min(doc_id) AS corpus_doc_id
    FROM hashed WHERE doc_id % {INCR_MOD} <> {INCR_REM}
    GROUP BY h
),
b AS (
    SELECT doc_id, h, min(doc_id) OVER (PARTITION BY h) AS batch_min
    FROM hashed WHERE doc_id % {INCR_MOD} = {INCR_REM}
)
SELECT b.doc_id,
       CASE WHEN c.corpus_doc_id IS NOT NULL THEN 'dup_of_corpus'
            WHEN b.batch_min < b.doc_id THEN 'dup_in_batch'
            ELSE 'new' END AS status,
       CAST(CASE WHEN c.corpus_doc_id IS NOT NULL THEN c.corpus_doc_id
                 WHEN b.batch_min < b.doc_id THEN b.batch_min
            END AS BIGINT) AS match_doc_id
FROM b LEFT JOIN corpus c USING (h)
"""


QUERIES: dict[str, Query] = {
    "incremental_dedup": Query(
        incremental_dedup,
        INCREMENTAL_DEDUP_SQL,
        "incoming-batch vs corpus-index dedup (continuous-ingest shape)",
    ),
    "exact_dedup": Query(exact_dedup, EXACT_DEDUP_SQL, "hash-groupBy exact dedup"),
    "neardup_embedding": Query(
        neardup_embedding,
        NEARDUP_EMBEDDING_SQL,
        "embedding-cosine near-dup pairs (exact anchor for LSH prefilter)",
    ),
    "neardup_clusters": Query(
        neardup_clusters,
        NEARDUP_CLUSTERS_SQL,
        "connected-component dup clusters (iterative label propagation)",
    ),
    "neardup_jaccard": Query(
        neardup_jaccard,
        NEARDUP_JACCARD_SQL,
        "exact k-shingle Jaccard pairs (inverted-index join)",
    ),
    "minhash_signatures": Query(
        minhash_signatures,
        MINHASH_SIGNATURES_SQL,
        "portable 16-permutation MinHash signatures",
    ),
    "neardup_minhash_lsh": Query(
        neardup_minhash_lsh,
        NEARDUP_MINHASH_LSH_SQL,
        "banded MinHash-LSH candidate pairs (sub-quadratic near-dedup)",
    ),
    "simhash": Query(simhash, SIMHASH_SQL, "60-bit SimHash fingerprints"),
    "neardup_lsh_verified": Query(
        neardup_lsh_verified,
        NEARDUP_LSH_VERIFIED_SQL,
        "LSH candidates + exact Jaccard verify (production near-dedup)",
    ),
    "neardup_shared_span": Query(
        neardup_shared_span,
        NEARDUP_SHARED_SPAN_SQL,
        "longest shared token span per LSH candidate (substring dedup signal)",
    ),
    "neardup_embedding_lsh": Query(
        neardup_embedding_lsh,
        NEARDUP_EMBEDDING_LSH_SQL,
        "banded hyperplane-LSH embedding near-dup (fixed-band contrast; "
        "guarded past MAX_FIXED_BAND_VECTORS)",
    ),
    "neardup_embedding_lsh_auto": Query(
        neardup_embedding_lsh_auto,
        neardup_embedding_lsh_auto_sql(_gate_embeddings_n()),
        "N-adaptive banded hyperplane-LSH embedding near-dup (the 100 TB "
        "scale path; oracle generated for the sf0.01 gate N)",
    ),
}


def neardup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dup twin of :func:`incremental_dedup`: classify each incoming
    doc (doc_id % INCR_MOD == INCR_REM, the same batch slice) against
    the corpus by banded MinHash-LSH instead of the exact hash — the
    continuous-ingest near-dup shape. At 100 TB you never re-band the
    corpus per batch: you maintain a persistent (band, band_sig) →
    min doc_id index and LEFT-join each incoming batch's bands against
    it. Here the index is built inline from the corpus slice by the
    same groupBy that would maintain it incrementally; the join carries
    band signatures (4 ints), never documents or shingles, and no
    corpus×corpus pair is ever formed.

    Emits one row per incoming doc: status ('neardup_of_corpus' |
    'novel'), the minimum matching corpus doc over all bands, and how
    many of the N_BANDS bands hit (a crude confidence).
    """
    wide = _minhash_wide(spark, sf_dir)
    rows_per_band = N_PERMS // N_BANDS
    band_rows = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.array(
                    *[
                        F.col(f"h{band * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ]
                ).alias("band_sig"),
            )
            for band in range(N_BANDS)
        ]
    )
    banded = wide.select("doc_id", F.explode(band_rows).alias("b")).select(
        "doc_id",
        F.col("b.band").alias("band"),
        F.col("b.band_sig").alias("band_sig"),
    )
    is_incoming = F.col("doc_id") % INCR_MOD == INCR_REM
    corpus_index = (
        banded.filter(~is_incoming)
        .groupBy("band", "band_sig")
        .agg(F.min("doc_id").alias("corpus_doc_id"))
    )
    incoming = banded.filter(is_incoming)
    hits = incoming.join(corpus_index, ["band", "band_sig"], "left")
    per_doc = hits.groupBy("doc_id").agg(
        F.min("corpus_doc_id").alias("match_doc_id"),
        F.count("corpus_doc_id").cast("long").alias("n_band_hits"),
    )
    return per_doc.select(
        "doc_id",
        F.when(
            F.col("match_doc_id").isNotNull(), F.lit("neardup_of_corpus")
        )
        .otherwise(F.lit("novel"))
        .alias("status"),
        F.col("match_doc_id").cast("long").alias("match_doc_id"),
        "n_band_hits",
    )


def _incremental_lsh_sql() -> str:
    rows_per_band = N_PERMS // N_BANDS
    return f"""
WITH sig AS ({_minhash_sql()}),
banded AS (
    SELECT doc_id, CAST(floor(perm / {rows_per_band}) AS INTEGER) AS band,
           list(minhash ORDER BY perm) AS band_sig
    FROM sig GROUP BY 1, 2
),
corpus AS (
    SELECT band, band_sig, min(doc_id) AS corpus_doc_id
    FROM banded WHERE doc_id % {INCR_MOD} <> {INCR_REM}
    GROUP BY 1, 2
),
hits AS (
    SELECT b.doc_id, c.corpus_doc_id
    FROM banded b
    LEFT JOIN corpus c ON c.band = b.band AND c.band_sig = b.band_sig
    WHERE b.doc_id % {INCR_MOD} = {INCR_REM}
)
SELECT doc_id,
       CASE WHEN min(corpus_doc_id) IS NOT NULL THEN 'neardup_of_corpus'
            ELSE 'novel' END AS status,
       CAST(min(corpus_doc_id) AS BIGINT) AS match_doc_id,
       CAST(count(corpus_doc_id) AS BIGINT) AS n_band_hits
FROM hits
GROUP BY doc_id
"""


NEARDUP_INCREMENTAL_LSH_SQL = _incremental_lsh_sql()

QUERIES["neardup_incremental_lsh"] = Query(
    neardup_incremental_lsh,
    NEARDUP_INCREMENTAL_LSH_SQL,
    "incoming-batch vs corpus banded-LSH near-dup (continuous-ingest "
    "shape; index join carries band signatures only)",
)


def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_unique, n_dupes, dup_rate_milli): per-source
    exact-duplicate rate — the curation dashboard number that decides
    which upstream feed gets throttled or re-crawled. Complements
    :func:`exact_dedup` (which lists the groups) with the per-feed
    rollup an operator actually watches.

    Same 8-byte digest discipline: the shuffle carries (source,
    text_hash) pairs, never documents; one partial→final
    count-distinct-shaped aggregate bounded by |source| × |distinct
    texts per source|. A doc duplicated ACROSS sources counts against
    each source that carries it (per-feed accountability, matching how
    incremental_dedup attributes batch dupes); all integers exact.
    """
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select(
        "source", hash60(norm_text(F.col("text"))).alias("text_hash")
    )
    return (
        hashed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("text_hash").alias("n_unique"),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_unique").cast("long").alias("n_unique"),
            (F.col("n_docs") - F.col("n_unique")).cast("long").alias("n_dupes"),
            F.expr("(n_docs - n_unique) * 1000 div n_docs")
            .cast("long")
            .alias("dup_rate_milli"),
        )
    )


DEDUP_RATE_BY_SOURCE_SQL = f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT {hash60_sql(_NORM_TEXT_SQL)}) AS BIGINT)
           AS n_unique,
       CAST(count(*) - count(DISTINCT {hash60_sql(_NORM_TEXT_SQL)})
            AS BIGINT) AS n_dupes,
       CAST((count(*) - count(DISTINCT {hash60_sql(_NORM_TEXT_SQL)}))
            * 1000 // count(*) AS BIGINT) AS dup_rate_milli
FROM documents
GROUP BY source
"""

QUERIES["dedup_rate_by_source"] = Query(
    dedup_rate_by_source,
    DEDUP_RATE_BY_SOURCE_SQL,
    "per-source exact-duplicate rate off the 60-bit digest: the "
    "curation feed-health rollup (exact integers, digest-keyed shuffle)",
)


def source_overlap_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source_a, source_b, n_agree_perms, jaccard_est_milli): estimated
    shingle-set Jaccard between every pair of ingest feeds, read off the
    MinHash signatures — the corpus-level overlap matrix a curation
    pipeline consults before mixing feeds (two feeds at high overlap are
    the same crawl twice; ``dedup_rate_by_source`` sees WITHIN-feed
    copies, this sees BETWEEN-feed redundancy).

    The signature of a feed is the permutation-wise MIN over its docs'
    signatures — min distributes over union, so this IS the MinHash
    signature of the union of the feed's shingle sets, and the
    fraction of agreeing permutations estimates the union-level Jaccard
    (±1/sqrt(16) ≈ 0.25 per pair; the committed-bounds discipline for
    sketch queries — the estimate is deterministic and the oracle
    replays it exactly, so the gate checks it bit-for-bit).

    Scale shape: rides the session-cached (doc_id, shingle-hash) table
    (the lsh_pipeline family — one corpus shingle pass per session no
    matter how many dedup queries run); the per-source aggregate is one
    partial/final MIN over 16 columns keyed by source, output
    |sources| rows; the pair matrix is a broadcast self-join of that
    |sources|-bounded table (190 pairs at 20 feeds) — corpus×corpus
    never forms.
    """
    wide = _minhash_wide(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    # ckpt: the self-join's broadcast side cannot reuse the stream
    # side's exchange, so without it the corpus-sized MIN aggregation
    # runs twice per invocation (review-found); the checkpoint holds
    # |sources| x 16 longs.
    sig = ckpt(
        wide.join(docs, "doc_id")
        .groupBy("source")
        .agg(*[F.min(f"h{i}").alias(f"h{i}") for i in range(N_PERMS)]),
        eager=False,
    )
    a = sig.alias("a")
    b = sig.alias("b")
    agree = sum(
        F.when(F.col(f"a.h{i}") == F.col(f"b.h{i}"), 1).otherwise(0)
        for i in range(N_PERMS)
    )
    return (
        a.crossJoin(F.broadcast(b))
        .where(F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            agree.cast("long").alias("n_agree_perms"),
        )
        # integer div, not float-divide-then-cast: the truncation must
        # be the same operation in both engines by construction, not by
        # small-operand coincidence (review-found; the module's
        # pure-integer discipline)
        .withColumn(
            "jaccard_est_milli",
            F.expr(f"n_agree_perms * 1000 div {N_PERMS}"),
        )
    )


def _source_overlap_sql() -> str:
    perm_exprs = ", ".join(
        f"({minhash_perm_sql(hash60_sql('shingle'), i)}) AS h{i}"
        for i in range(N_PERMS)
    )
    mins = ", ".join(f"min(h{i}) AS h{i}" for i in range(N_PERMS))
    agree = " + ".join(
        f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)" for i in range(N_PERMS)
    )
    return f"""
WITH sh AS ({_SHINGLES_SQL}),
hashed AS (SELECT doc_id, {perm_exprs} FROM sh),
sig AS (
    SELECT d.source, {mins}
    FROM hashed h JOIN documents d USING (doc_id)
    GROUP BY d.source
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST({agree} AS BIGINT) AS n_agree_perms,
       CAST(CAST({agree} AS BIGINT) * 1000 // {N_PERMS} AS BIGINT)
           AS jaccard_est_milli
FROM sig a JOIN sig b ON a.source < b.source
"""


SOURCE_OVERLAP_MINHASH_SQL = _source_overlap_sql()

QUERIES["source_overlap_minhash"] = Query(
    source_overlap_minhash,
    SOURCE_OVERLAP_MINHASH_SQL,
    "between-feed shingle-Jaccard estimate from per-source MinHash "
    "(min over docs = signature of the union); |sources|-bounded matrix",
)
