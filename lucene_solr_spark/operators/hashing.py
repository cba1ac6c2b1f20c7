"""Cross-engine-portable deterministic hashing primitives.

Everything downstream of dedup/LSH needs hashes that are (a) computed
JVM-side (no Python in the hot path) and (b) reproducible in ANSI SQL so
the DuckDB oracle can verify results value-for-value. Spark's hash()/
xxhash64() are not portable, so we standardize on a 60-bit integer
derived from md5 (available and bit-identical in every engine):

    h60(s) = int(hex(md5(utf8(s)))[0:15], 16)        in [0, 2^60)

Independent hash families (for MinHash permutations / LSH bands) come
from domain separation — h60(i || '|' || s) — rather than arithmetic
(a*h+b) mod p permutations, because 64-bit mulmod overflows portable SQL
integer arithmetic. md5 is overkill cryptographically but it is the one
hash every engine agrees on byte-for-byte.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["h60", "h60_seeded", "h60_py", "H60_SQL", "h60_sql"]


def h60_py(s: str) -> int:
    """Driver-side replica of h60() — e.g. for partition pruning without
    running a Spark job."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def h60(col: Column | str) -> Column:
    """60-bit portable hash of a string column (JVM-native)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def h60_seeded(seed: int, col: Column | str) -> Column:
    """Member ``seed`` of an independent hash family (domain separation)."""
    c = F.col(col) if isinstance(col, str) else col
    return h60(F.concat(F.lit(f"{seed}|"), c.cast("string")))


def h60_sql(expr: str) -> str:
    """DuckDB SQL replica of h60() over an arbitrary string expression."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def h60_seeded_sql(seed: int, expr: str) -> str:
    return h60_sql(f"concat('{seed}|', {expr})")


H60_SQL = h60_sql  # legacy alias
