"""Portable deterministic hashing (identical in Spark SQL and DuckDB).

Everything that needs a content hash at scale (exact dedup, MinHash,
SimHash, fingerprints) builds on a single 60-bit base hash derived from
md5: the first 15 hex chars of md5(utf8(s)) parsed as an integer. Both
engines compute md5 over the same UTF-8 bytes, so the value is identical
everywhere — unlike xxhash64/murmur3 whose seeds/variants differ between
Spark and DuckDB. 15 hex chars = 60 bits < 2^63, so it always fits a
signed BIGINT in both engines.

The hash family used for MinHash is the classic universal family
h_i(x) = (a_i * (H(x) mod P) + b_i) mod P with P = 2^31 - 1 (Mersenne).
All intermediates stay < 2^62, so 64-bit integer arithmetic never
overflows in either engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: modulus for the MinHash universal hash family.
MERSENNE_P = (1 << 31) - 1

# Fixed (a, b) parameter pairs for the MinHash family — arbitrary odd
# constants < P, chosen once; identical constants are injected into the
# DuckDB oracle SQL so both engines compute the same signatures.
MINHASH_PARAMS: list[tuple[int, int]] = [
    (1103515245, 12345),
    (214013, 2531011),
    (134775813, 1),
    (22695477, 1),
    (1664525, 1013904223),
    (69069, 362437),
    (1103527591, 29573),
    (2147483629, 2038074743),
    (997, 997991),
    (100003, 30000001),
    (65537, 257),
    (2027, 20261),
    (48271, 11),
    (16807, 7),
    (62089911, 3),
    (279470273, 101),
]
N_MINHASH = len(MINHASH_PARAMS)


def portable_hash64(col: Column) -> Column:
    """60-bit content hash of a string column; equals the DuckDB expression
    produced by :func:`portable_hash64_sql` for the same input bytes."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def portable_hash64_sql(expr: str) -> str:
    """DuckDB SQL fragment computing the same 60-bit hash as
    :func:`portable_hash64`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_expr(hash_col: Column, a: int, b: int) -> Column:
    """One MinHash family member applied to a pre-hashed 60-bit value."""
    return (F.lit(a) * (hash_col % MERSENNE_P) + F.lit(b)) % MERSENNE_P


def minhash_expr_sql(hash_expr: str, a: int, b: int) -> str:
    return f"(({a} * (({hash_expr}) % {MERSENNE_P}) + {b}) % {MERSENNE_P})"
