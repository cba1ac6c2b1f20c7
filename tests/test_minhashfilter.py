"""MinHashFilter — reference JUnit vectors replayed
(lucene/analysis/common/src/test/org/apache/lucene/analysis/minhash/
MinHashFilterTest.java). Expected terms are spelled as char-code
arrays: the raw Java literals contain singleton-decomposition CJK
compatibility ideographs (e.g. U+FA85) that any NFC-normalizing
copy would silently rewrite."""

import pytest

from lucene_solr_spark.analysis.minhashfilter import (
    _get_bytes,
    min_hash_filter,
    murmurhash3_x64_128,
)

_M = 1 << 64


def _signed(x):
    return x - _M if x >= (_M >> 1) else x


def _s(*codes):
    return "".join(map(chr, codes))


WOOF5 = "woof woof woof woof woof"
WOOF4PUFF = "woof woof woof woof puff"
# hash of WOOF5 rehashed with int-hash 0, as UTF-16 code units
HASH_WOOF5 = _s(0x2101, 0xD33D, 0xFA85, 0x8059,
                0x219D, 0xA1C1, 0xD671, 0x676F)


def test_int_hash():
    v1, v2 = murmurhash3_x64_128(_get_bytes(0))
    assert _signed(v1) == -3485513579396041028
    assert _signed(v2) == 6383328099726337777


def test_string_hash():
    v1, v2 = murmurhash3_x64_128(WOOF5.encode("utf-16-le"))
    assert _signed(v1) == 7638079586852243959
    assert _signed(v2) == 4378804943379391304


def test_token_stream_single_input():
    assert min_hash_filter([WOOF5], 1, 100, 1, False) == [HASH_WOOF5]
    assert min_hash_filter([WOOF5], 2, 1, 1, False) == [
        _s(0, 0, 8449, 54077, 64133, 32857, 8605, 41409),
        _s(0, 1, 16887, 58164, 39536, 14926, 6529, 17276)]


def test_token_stream1():
    toks = min_hash_filter([WOOF5, WOOF4PUFF], 1, 100, 1, False)
    assert toks == [
        HASH_WOOF5,
        _s(36347, 63457, 43013, 56843, 52284, 34231, 57934, 42302)]


def test_token_stream_counts():
    two = [WOOF5, WOOF4PUFF]
    assert len(min_hash_filter(two, 100, 1, 1, False)) == 100
    assert len(min_hash_filter(two, 10, 1, 10, False)) == 20
    assert len(min_hash_filter(two, 10, 10, 1, False)) == 20
    assert len(min_hash_filter(two, 10, 10, 1, True)) == 100


def test_empty_and_validation():
    assert min_hash_filter([], 1, 512, 1, True) == []
    with pytest.raises(ValueError):
        min_hash_filter(["x"], 0, 1, 1)


def test_fixed_size_set_order():
    # testHashNotRepeated / testHashOrder: 10k distinct int hashes
    # through a capacity-500 set keep the 500 unsigned-smallest
    import bisect
    cap = 500
    s = []
    for i in range(10000):
        item = tuple(reversed(murmurhash3_x64_128(_get_bytes(i))))
        if len(s) >= cap:
            if item >= s[-1]:
                continue
            s.pop()
        if item not in s:
            bisect.insort(s, item)
    assert len(s) == cap
    assert s == sorted(s)
