"""InetAddressPoint analog (functions/inet.py): encode order, CIDR
mask expansion vs the stdlib ipaddress module, and Spark/driver encode
agreement.

Reference semantics: lucene/misc/src/java/org/apache/lucene/document/
InetAddressPoint.java — 16-byte IPv6-mapped form compared unsigned
lexicographically; newPrefixQuery expands network/prefix to the range
[addr & mask, addr | ~mask] (:186-204).
"""

import ipaddress

from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_spark.functions.inet import (
    IPV4_PREFIX_HEX,
    cidr_bounds,
    ipv4_encode,
)

octet = st.integers(0, 255)
addr4 = st.tuples(octet, octet, octet, octet).map(
    lambda t: ".".join(map(str, t))
)


@given(addr4)
def test_encode_matches_rfc4291_mapped_bytes(a):
    got = ipv4_encode(a)
    want = ipaddress.IPv6Address(f"::ffff:{a}").packed.hex()
    assert got == want
    assert got.startswith(IPV4_PREFIX_HEX) and len(got) == 32


@given(addr4, addr4)
def test_encode_preserves_unsigned_byte_order(a, b):
    # string order of the hex form == unsigned order of the 16 bytes
    na = int(ipaddress.IPv4Address(a))
    nb = int(ipaddress.IPv4Address(b))
    assert (ipv4_encode(a) < ipv4_encode(b)) == (na < nb)


@given(addr4, st.integers(0, 32))
def test_cidr_bounds_match_ipaddress_network(a, p):
    lo, hi = cidr_bounds(a, p)
    net = ipaddress.ip_network(f"{a}/{p}", strict=False)
    assert lo == ipv4_encode(str(net.network_address))
    assert hi == ipv4_encode(str(net.broadcast_address))


@given(addr4, addr4, st.integers(0, 32))
def test_membership_equals_ipaddress_contains(x, net, p):
    lo, hi = cidr_bounds(net, p)
    inside = ipaddress.IPv4Address(x) in ipaddress.ip_network(
        f"{net}/{p}", strict=False
    )
    assert (lo <= ipv4_encode(x) <= hi) == inside


@settings(deadline=None, max_examples=10)
@given(st.lists(addr4, min_size=1, max_size=8, unique=True))
def test_spark_encode_matches_driver_encode(spark, addrs):
    from pyspark.sql import functions as F

    from lucene_solr_spark.functions.inet import ipv4_encode_col

    df = spark.createDataFrame([(a,) for a in addrs], "ip string")
    got = {
        r["ip"]: r["hex"]
        for r in df.select(
            "ip", ipv4_encode_col("ip").alias("hex")
        ).collect()
    }
    assert got == {a: ipv4_encode(a) for a in addrs}
