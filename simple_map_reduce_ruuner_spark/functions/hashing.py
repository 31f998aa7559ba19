"""Engine-portable deterministic hashing.

The near-dedup / fingerprinting operators need hash functions that are
bit-identical between the Spark implementation and the DuckDB correctness
oracle. Spark's ``xxhash64``/``hash`` have no DuckDB twin, so we derive a
60-bit integer hash from ``md5`` (both engines produce identical md5 hex):

    Spark : conv(substring(md5(s), 1, 15), 16, 10)::bigint
    DuckDB: ('0x' || substr(md5(s), 1, 15))::bigint

15 hex digits = 60 bits, always non-negative, no bigint overflow.

MinHash permutations are the classic universal-hash family
h_i(x) = (a_i * x + b_i) mod p with p = 2^31 - 1 (Broder 1997, "On the
resemblance and containment of documents"). Coefficients are small
deterministic constants so a_i * (x mod p) stays far below 2^63 (ANSI-safe
in Spark 4 and overflow-safe in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31 - 1; h mod p then a*h+b fits comfortably in int64.
MINHASH_PRIME = 2_147_483_647

# Deterministic permutation coefficients (a_i, b_i), i = 0..15.
# a must be non-zero mod p; values are arbitrary odd constants.
MINHASH_COEFFS = [
    (1_000_003, 12_345),
    (999_983, 54_321),
    (998_244_353 % MINHASH_PRIME, 7),
    (774_001, 88_811),
    (37, 101_111),
    (613_651_349 % MINHASH_PRIME, 991),
    (2_654_435_761 % MINHASH_PRIME, 40_503),
    (97, 1_234_567),
    (193_877_777 % MINHASH_PRIME, 3),
    (15_485_863, 777_777),
    (32_452_843, 111),
    (49_979_687, 2_222_222),
    (67_867_967, 13),
    (86_028_121, 404_040),
    (104_395_301, 5_555),
    (122_949_823, 909_091),
]


def hash60(col: Column) -> Column:
    """60-bit non-negative integer hash of a string column (md5-derived,
    bit-identical to the DuckDB formulation in ``HASH60_SQL``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


#: Template with ``{expr}`` placeholder, for oracle SQL composition.
HASH60_SQL = "(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def hash60_sql(expr: str) -> str:
    """DuckDB SQL text computing the same value as :func:`hash60`
    (single source: the HASH60_SQL template)."""
    return HASH60_SQL.format(expr=expr)


def minhash_perm(hash_col: Column, i: int) -> Column:
    """i-th MinHash permutation of a 60-bit hash column (Spark side)."""
    a, b = MINHASH_COEFFS[i]
    return (F.lit(a) * (hash_col % MINHASH_PRIME) + F.lit(b)) % MINHASH_PRIME


def minhash_perm_sql(hash_expr: str, i: int) -> str:
    """DuckDB SQL text computing the same value as :func:`minhash_perm`."""
    a, b = MINHASH_COEFFS[i]
    return f"(({a} * (({hash_expr}) % {MINHASH_PRIME}) + {b}) % {MINHASH_PRIME})"
