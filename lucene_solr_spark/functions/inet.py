"""InetAddressPoint / InetAddressRange — IP-address point queries.

Reference: lucene/misc/src/java/org/apache/lucene/document/
InetAddressPoint.java (+ InetAddressRange.java):

- Every address is stored in its 16-byte IPv6 form; IPv4 maps through
  the RFC 4291 prefix ``::ffff:a.b.c.d`` (IPV4_PREFIX, :53-59).
- Queries compare the 16 bytes UNSIGNED lexicographically
  (the BKD byte order): exact, range [lower, upper] inclusive, CIDR
  prefix — network/prefixLength expands to the range
  [addr & mask, addr | ~mask] (newPrefixQuery:186-204), and set
  membership.

This rebuild encodes the 16 bytes as a 32-char lowercase hex STRING —
byte-wise unsigned order == string order — with the encode expressed
as the SAME printf over the dotted-quad arithmetic on Spark and the
SQL oracle, so range predicates push down to the scan as plain string
comparisons (min/max column stats and partition pruning apply, the
BKD-range analog).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "IPV4_PREFIX_HEX",
    "ipv4_encode_col",
    "ipv4_encode_sql",
    "ipv4_encode",
    "cidr_bounds",
]

# RFC 4291 IPv4-mapped prefix ::ffff:0:0 — InetAddressPoint.java:59.
IPV4_PREFIX_HEX = "00000000000000000000ffff"


def _v4_num_expr(col_sql: str) -> str:
    """dotted-quad string -> 32-bit integer, shared SQL text."""
    return (
        f"(CAST(split_part({col_sql}, '.', 1) AS BIGINT) * 16777216"
        f" + CAST(split_part({col_sql}, '.', 2) AS BIGINT) * 65536"
        f" + CAST(split_part({col_sql}, '.', 3) AS BIGINT) * 256"
        f" + CAST(split_part({col_sql}, '.', 4) AS BIGINT))"
    )


def ipv4_encode_sql(col_sql: str) -> str:
    """SQL text (valid on Spark AND DuckDB) producing the 32-hex-char
    encoded form of a dotted-quad IPv4 string expression."""
    return (
        f"('{IPV4_PREFIX_HEX}' || printf('%08x', {_v4_num_expr(col_sql)}))"
    )


def ipv4_encode_col(col_sql: str) -> Column:
    return F.expr(ipv4_encode_sql(col_sql))


def ipv4_encode(addr: str) -> str:
    """Driver-side encode of an IPv4 literal."""
    o = [int(x) for x in addr.split(".")]
    if len(o) != 4 or any(not 0 <= x <= 255 for x in o):
        raise ValueError(f"bad IPv4 address {addr!r}")
    n = (o[0] << 24) | (o[1] << 16) | (o[2] << 8) | o[3]
    return IPV4_PREFIX_HEX + format(n, "08x")


def cidr_bounds(network: str, prefix_length: int) -> tuple:
    """(lo_hex, hi_hex) for newPrefixQuery(network/prefixLength) —
    the [addr & mask, addr | ~mask] range over the 128-bit space
    (InetAddressPoint.newPrefixQuery:186-204; an IPv4 prefixLength p
    is the 128-bit prefix p+96)."""
    if not 0 <= prefix_length <= 32:
        raise ValueError("IPv4 prefixLength must be in [0, 32]")
    o = [int(x) for x in network.split(".")]
    n = (o[0] << 24) | (o[1] << 16) | (o[2] << 8) | o[3]
    mask = ((1 << 32) - 1) ^ ((1 << (32 - prefix_length)) - 1)
    lo = n & mask
    hi = n | (~mask & ((1 << 32) - 1))
    return (
        IPV4_PREFIX_HEX + format(lo, "08x"),
        IPV4_PREFIX_HEX + format(hi, "08x"),
    )
