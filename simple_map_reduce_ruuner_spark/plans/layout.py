"""Range-clustered file layout: the write-side half of data skipping.

Parquet scans skip whole files and row groups using footer min/max
statistics — but only if the writer clustered the data so those ranges
are NARROW and DISJOINT. A table written in arrival order has every
file spanning the whole key domain (min/max ≈ global min/max), so a
selective filter still opens every file. At 100 TB that difference is
"scan 1 file" vs "scan 10,000 files" for the same query.

``write_range_clustered`` produces that layout with exactly one
exchange and NO global sort:

- ``repartitionByRange(n, key)`` samples the key distribution
  (RangePartitioning) and routes each row to the partition owning its
  key range — this is the only shuffle, and it is also the skew-safe
  way to get equal-sized output files from a non-uniform key;
- ``sortWithinPartitions(key)`` orders rows inside each partition with
  a per-task local sort (no merge step, no single-reducer bottleneck),
  which tightens ROW-GROUP-level statistics inside each file.

The result: file-level ranges are pairwise disjoint (proved from the
parquet footers by ``key_ranges``/``ranges_disjoint``, asserted in
``tests/test_layout.py``) and any equality/range predicate on the
cluster key prunes to the few files whose range intersects it.

This composes with, not replaces, bucketing (bucketing.py): bucket by
the JOIN key to pre-pay join shuffles, range-cluster by the FILTER key
(usually time) to pre-pay scan pruning. For multi-key skipping, the
same write pattern applies to an interleaved key (Z-order); single-key
range clustering is the common case and needs no custom expression.

The reference has no write-side layout control at all — its sink is a
single concatenated text file (Master.java:172-178).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_range_clustered(
    df: DataFrame, path: str, key: str, n_files: int
) -> None:
    """Write ``df`` as ~``n_files`` parquet files range-clustered on
    ``key``: one RangePartitioning exchange, per-task local sorts, no
    global sort."""
    (
        df.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )


def range_clustered_plan(df: DataFrame, key: str, n_files: int):
    """The read-side plan of the write above (for plan-shape tests):
    exactly one rangepartitioning exchange and a non-global sort."""
    return df.repartitionByRange(n_files, key).sortWithinPartitions(key)


def key_ranges(path: str, key: str) -> list[tuple]:
    """(min, max) of ``key`` per parquet file under ``path``, straight
    from the footer statistics — the exact metadata a scan planner uses
    to skip files. Driver-side O(file count) footer reads: a diagnostic
    for tests/audits, not a query-path operation."""
    import pyarrow.parquet as pq
    import pathlib

    out = []
    for f in sorted(pathlib.Path(path).glob("*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        idx = md.schema.names.index(key)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out.append((lo, hi))
    return out


def ranges_disjoint(ranges: list[tuple]) -> bool:
    """True iff the per-file key ranges never overlap — the property
    that makes a point predicate prune to exactly one file. Ranges are
    CLOSED intervals (parquet footer min/max), so a shared boundary
    value (prev.max == next.min) IS an overlap: that key would live in
    two files and a point lookup would open both — strict < required
    (a <= here let the regression the check exists for pass silently,
    review-found)."""
    ordered = sorted(ranges)
    return all(prev[1] < nxt[0] for prev, nxt in zip(ordered, ordered[1:]))


# --------------------------------------------------------------------------
# Z-order: multi-dimensional range clustering
# --------------------------------------------------------------------------

ZORDER_BITS = 16


def zorder_key(a, b, a_min, a_max, b_min, b_max):
    """Column: bit-interleaved (Morton) key of two numeric columns, each
    first normalized to a 16-bit rank via exact integer scaling against
    the given bounds.

    Range-clustering by ONE key gives that key disjoint file ranges but
    leaves every other column spanning the full domain per file.
    Interleaving the bits of two normalized keys makes file locality
    2-dimensional: each of N files covers ~1/sqrt(N) of EACH dimension,
    so selective predicates on either column (or both) skip files.
    The normalization divides integers then floors — exact for any
    realistic domain (integer doubles are exact below 2^53, and the
    quotient's distance to the floor boundary exceeds its ulp), and the
    key never leaves Spark, so no cross-engine concern applies.

    ``a``/``b`` must already be numeric (cast timestamps to epoch units
    first); bounds usually come from a 1-row min/max aggregate the
    caller broadcasts.
    """
    from pyspark.sql import functions as F

    def norm(col, lo, hi):
        span = (hi - lo) + F.lit(1)
        scaled = ((col - lo) * F.lit(1 << ZORDER_BITS)) / span
        return F.floor(scaled).cast("long")

    an, bn = norm(a, a_min, a_max), norm(b, b_min, b_max)
    from functools import reduce

    terms = []
    for i in range(ZORDER_BITS):
        bit_a = F.shiftright(an, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(bn, i).bitwiseAND(F.lit(1))
        terms.append(F.shiftleft(bit_a, 2 * i + 1))
        terms.append(F.shiftleft(bit_b, 2 * i))
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def write_zordered(df, path, col_a, col_b, n_files):
    """Write ``df`` as ~``n_files`` parquet files clustered on the
    Z-order key of two numeric columns: one min/max aggregate (1 row,
    broadcast via cross join), one RangePartitioning exchange on the
    Morton key, per-task local sorts. The key itself is not persisted —
    it exists only to route and order rows."""
    from pyspark.sql import functions as F

    bounds = df.agg(
        F.min(col_a).alias("_amin"),
        F.max(col_a).alias("_amax"),
        F.min(col_b).alias("_bmin"),
        F.max(col_b).alias("_bmax"),
    )
    keyed = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_zkey",
        zorder_key(
            F.col(col_a),
            F.col(col_b),
            F.col("_amin"),
            F.col("_amax"),
            F.col("_bmin"),
            F.col("_bmax"),
        ),
    )
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", "_amin", "_amax", "_bmin", "_bmax")
        .write.mode("overwrite")
        .parquet(path)
    )
