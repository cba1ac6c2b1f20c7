"""SmallFloat quantization vs a literal scalar re-derivation of the
reference math (SmallFloat.java:101-169)."""

import numpy as np
import pytest

from lucene_solr_spark.functions import smallfloat as sf


def ref_long_to_int4(i: int) -> int:
    assert i >= 0
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    return encoded | ((shift + 1) << 3)


def ref_int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    return bits if shift == -1 else (bits | 0x08) << shift


NUM_FREE = 255 - ref_long_to_int4(2**31 - 1)


def ref_int_to_byte4(i: int) -> int:
    assert i >= 0
    if i < NUM_FREE:
        return i
    return NUM_FREE + ref_long_to_int4(i - NUM_FREE)


def ref_byte4_to_int(b: int) -> int:
    b &= 0xFF
    if b < NUM_FREE:
        return b
    return NUM_FREE + ref_int4_to_long(b - NUM_FREE)


def test_constants():
    assert sf.NUM_FREE_VALUES == NUM_FREE == 24
    assert sf.MAX_INT4 == ref_long_to_int4(2**31 - 1)


@pytest.mark.parametrize("hi", [2**12])
def test_int4_roundtrip_small_range(hi):
    xs = np.arange(hi)
    enc = sf.long_to_int4(xs)
    ref = np.array([ref_long_to_int4(int(x)) for x in xs])
    np.testing.assert_array_equal(enc, ref)
    dec = sf.int4_to_long(enc)
    refdec = np.array([ref_int4_to_long(int(e)) for e in enc])
    np.testing.assert_array_equal(dec, refdec)


def test_byte4_full_int_sample():
    xs = np.unique(
        np.concatenate(
            [
                np.arange(0, 4096),
                2 ** np.arange(12, 31),
                2 ** np.arange(12, 31) - 1,
                2 ** np.arange(12, 31) + 1,
                np.array([2**31 - 1]),
            ]
        )
    )
    enc = sf.int_to_byte4(xs)
    ref = np.array([ref_int_to_byte4(int(x)) for x in xs])
    np.testing.assert_array_equal(enc, ref)
    assert enc.min() >= 0 and enc.max() <= 255


def test_byte4_decode_all_bytes():
    bs = np.arange(256)
    dec = sf.byte4_to_int(bs)
    ref = np.array([ref_byte4_to_int(int(b)) for b in bs])
    np.testing.assert_array_equal(dec, ref)
    # monotone non-decreasing decode
    assert np.all(np.diff(dec) >= 0)


def test_exact_below_40():
    """Decoded lengths <= 39 are exact (BM25Similarity.java:243-247)."""
    xs = np.arange(0, 40)
    assert np.array_equal(sf.byte4_to_int(sf.int_to_byte4(xs)), xs)
    assert not np.array_equal(sf.byte4_to_int(sf.int_to_byte4([41])), [41])


def test_encode_decode_is_bucket_lower_bound():
    xs = np.arange(0, 200000)
    dec = sf.byte4_to_int(sf.int_to_byte4(xs))
    assert np.all(dec <= xs)
    # re-encoding the decoded value gives the same byte (stable buckets)
    np.testing.assert_array_equal(sf.int_to_byte4(dec), sf.int_to_byte4(xs))


def test_length_table():
    assert sf.LENGTH_TABLE.dtype == np.float32
    assert sf.LENGTH_TABLE[0] == 0.0
    assert len(sf.LENGTH_TABLE) == 256
