"""MinHashFilter — the reference's per-stream MinHash fingerprint
filter (lucene/analysis/common/src/java/org/apache/lucene/analysis/
minhash/MinHashFilter.java), bit-exact.

Each input token (usually a shingle) is hashed with
MurmurHash3_x64_128 over its UTF-16LE bytes; ``hash_count`` rehash
variants are derived by ``combineOrdered`` with the murmur hash of
the variant index; the 2^32 hash ring is split into ``bucket_count``
buckets by the top 32 bits of val2 and each bucket keeps the
``hash_set_size`` smallest (unsigned (val2, val1)) hashes; with
``with_rotation`` empty buckets borrow the next non-empty bucket's
minimum. Emitted terms are the reference's exact UTF-16 code-unit
encoding of the 128-bit values (MinHashFilter.java:178-200) — the
same degenerate-string fingerprints a Lucene index would contain.

This is the index-time twin of the LLM-pipeline MinHash-LSH dedup in
operators/dedup.py (which uses its own 60-bit hashing tuned for the
banded join); this filter exists for drop-in parity with reference
analysis chains. JUnit vectors replayed in tests/test_minhashfilter.py.
At 100 TB: narrow Arrow map per document, no shuffle.
"""

from __future__ import annotations

import bisect
from typing import List, Optional, Sequence, Tuple

__all__ = ["murmurhash3_x64_128", "min_hash_filter"]

_M = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M
    k ^= k >> 33
    return k


def murmurhash3_x64_128(key: bytes, seed: int = 0) -> Tuple[int, int]:
    """MinHashFilter.murmurhash3_x64_128 (unsigned (val1, val2))."""
    ln = len(key)
    h1 = seed & 0xFFFFFFFF
    h2 = seed & 0xFFFFFFFF
    rounded = ln & ~0xF
    for i in range(0, rounded, 16):
        k1 = int.from_bytes(key[i:i + 8], "little")
        k2 = int.from_bytes(key[i + 8:i + 16], "little")
        k1 = (k1 * _C1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M
        h1 = (h1 * 5 + 0x52DCE729) & _M
        k2 = (k2 * _C2) & _M
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M
        h2 = (h2 * 5 + 0x38495AB5) & _M

    tail = ln & 15
    k1 = 0
    k2 = 0
    if tail >= 9:
        for i in range(tail - 1, 8 - 1, -1):
            k2 |= (key[rounded + i] & 0xFF) << ((i - 8) * 8)
        k2 = (k2 * _C2) & _M
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M
        h2 ^= k2
    if tail >= 1:
        for i in range(min(tail, 8) - 1, -1, -1):
            if i == 7:
                # case 8 sign-extends key[roundedEnd+7] (no & 0xff)
                b = key[rounded + 7]
                b = b - 256 if b > 127 else b
                k1 = (b << 56) & _M
            else:
                k1 |= (key[rounded + i] & 0xFF) << (i * 8)
        k1 = (k1 * _C1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M
        h1 ^= k1

    h1 ^= ln
    h2 ^= ln
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    return h1, h2


def _get_bytes(i: int) -> bytes:
    return bytes(((i >> 24) & 0xFF, (i >> 16) & 0xFF, (i >> 8) & 0xFF,
                  i & 0xFF))


_INT_HASH_CACHE: List[Tuple[int, int]] = [
    murmurhash3_x64_128(_get_bytes(i)) for i in range(512)
]


def _chars16(x: int, n: int) -> List[str]:
    """Top n UTF-16 code units of a 64-bit value, high first."""
    return [chr((x >> (48 - 16 * k)) & 0xFFFF) for k in range(n)]


def min_hash_filter(tokens: Sequence[str], hash_count: int = 1,
                    bucket_count: int = 512, hash_set_size: int = 1,
                    with_rotation: Optional[bool] = None) -> List[str]:
    """MinHashFilter.incrementToken over a whole token stream: returns
    the emitted fingerprint terms in stream order (hash variant →
    bucket → ascending hash)."""
    if hash_count <= 0 or bucket_count <= 0 or hash_set_size <= 0:
        raise ValueError("hashCount, bucketCount and hashSetSize must "
                         "be greater than zero")
    if with_rotation is None:
        with_rotation = bucket_count > 1  # factory default
    bucket_size = (1 << 32) // bucket_count
    if (1 << 32) % bucket_count != 0:
        bucket_size += 1

    # minHashSets[hash][bucket] = sorted set of (val2, val1), capped
    sets: List[List[List[Tuple[int, int]]]] = [
        [[] for _ in range(bucket_count)] for _ in range(hash_count)]

    def add(s: List[Tuple[int, int]], item: Tuple[int, int]) -> None:
        if len(s) >= hash_set_size:
            if item >= s[-1]:
                return
            s.pop()
        if item not in s:
            bisect.insort(s, item)

    for tok in tokens:
        b = tok.encode("utf-16-le")
        v1, v2 = murmurhash3_x64_128(b)
        for i in range(hash_count):
            ih = (_INT_HASH_CACHE[i] if i < 512
                  else murmurhash3_x64_128(_get_bytes(i)))
            rv1 = (v1 * 37 + ih[0]) & _M
            rv2 = (v2 * 37 + ih[1]) & _M
            add(sets[i][(rv2 >> 32) // bucket_size], (rv2, rv1))

    if not any(s for hs in sets for s in hs):
        return []

    if with_rotation and hash_set_size == 1:
        for hs in sets:
            for j in range(bucket_count):
                if not hs[j]:
                    for off in range(1, bucket_count):
                        src = hs[(j + off) % bucket_count]
                        if src:
                            hs[j] = [src[0]]
                            break

    out: List[str] = []
    for i in range(hash_count):
        for j in range(bucket_count):
            for (rv2, rv1) in sets[i][j]:
                chars: List[str] = []
                if hash_count > 1:
                    chars.append(chr((i >> 16) & 0xFFFF))
                    chars.append(chr(i & 0xFFFF))
                chars += _chars16(rv2, 4)
                chars += _chars16(rv1, 2 if hash_count > 1 else 4)
                out.append("".join(chars))
    return out


# --------------------------------------------------- Spark gate surface

#: gate configurations: (hash_count, bucket_count, hash_set_size, rot)
CONFIGS = {
    "default": (1, 512, 1, True),
    "multi_hash": (10, 1, 1, False),
    "bucketed_rot": (10, 10, 1, True),
    "set_sized": (3, 4, 5, False),
}


def minhash_udf(case_col, tokens_col):
    """Arrow-batched dispatcher for the driver gate: run the named
    CONFIGS entry and hex-encode each fingerprint's UTF-16 code units
    (the raw terms are degenerate strings that cannot ride Arrow)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _mh_pd(cases, streams):
        out = []
        for cs, st in zip(cases, streams):
            if st is None:
                out.append(None)
                continue
            toks = [t for t in st.split("\x1f") if t != ""]
            hc, bc, hss, rot = CONFIGS[cs]
            fps = min_hash_filter(toks, hc, bc, hss, rot)
            out.append("\x1f".join(
                "".join("%04x" % ord(c) for c in t) for t in fps))
        return pd.Series(out)

    return _mh_pd(case_col, tokens_col)
