"""SmallFloat: lossy byte encodings of positive integers (norms).

Re-implements, in vectorized numpy, the norm quantization the reference
uses for BM25 document lengths:

- ``long_to_int4`` / ``int4_to_long``: float-like order-preserving code
  with a 3-bit mantissa + shift (reference:
  lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:101-138).
- ``int_to_byte4`` / ``byte4_to_int``: builds on int4 and spends the free
  byte values on exact small numbers (SmallFloat.java:139-169). Values
  ``0..23`` are exact; decoded lengths <= 39 are exact, above that
  approximate (BM25Similarity.java:243-247).

All functions accept scalars or numpy arrays of non-negative ints and are
elementwise; they back the Arrow UDFs in index/builder.py and the pure
oracle in search/bruteforce.py.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "long_to_int4",
    "int4_to_long",
    "int_to_byte4",
    "byte4_to_int",
    "NUM_FREE_VALUES",
    "MAX_INT4",
    "LENGTH_TABLE",
]


def _bit_length(x: np.ndarray) -> np.ndarray:
    """Elementwise bit_length for int64 values in [0, 2**53).

    frexp is exact below 2**53 (doc lengths / int32 domain), and returns
    exponent e with x = m * 2**e, 0.5 <= m < 1 — i.e. e == bit_length.
    """
    _, e = np.frexp(x.astype(np.float64))
    return e.astype(np.int64)


def long_to_int4(x) -> np.ndarray:
    """Order-preserving 4-significant-bit code for non-negative ints."""
    x = np.asarray(x, dtype=np.int64)
    if np.any(x < 0):
        raise ValueError("long_to_int4 only supports non-negative values")
    num_bits = _bit_length(x)
    shift = np.maximum(num_bits - 4, 0)
    mantissa = (x >> shift) & 0x07  # drop the implicit leading 1 bit
    normal = mantissa | ((shift + 1) << 3)
    return np.where(num_bits < 4, x, normal)


def int4_to_long(i) -> np.ndarray:
    """Inverse of long_to_int4 (lower bound of the encoded bucket)."""
    i = np.asarray(i, dtype=np.int64)
    bits = i & 0x07
    shift = (i >> 3) - 1
    return np.where(shift < 0, bits, (bits | 0x08) << np.maximum(shift, 0))


MAX_INT4 = int(long_to_int4(np.int64(2**31 - 1)))
NUM_FREE_VALUES = 255 - MAX_INT4  # == 24: bytes 0..23 encode 0..23 exactly


def int_to_byte4(x) -> np.ndarray:
    """Encode a non-negative int32 into one byte (returned as int64 0..255)."""
    x = np.asarray(x, dtype=np.int64)
    if np.any(x < 0):
        raise ValueError("int_to_byte4 only supports non-negative values")
    shifted = long_to_int4(np.maximum(x - NUM_FREE_VALUES, 0))
    return np.where(x < NUM_FREE_VALUES, x, NUM_FREE_VALUES + shifted)


def byte4_to_int(b) -> np.ndarray:
    """Decode a byte (0..255, or a signed byte) back to its int lower bound."""
    b = np.asarray(b, dtype=np.int64) & 0xFF
    decoded = NUM_FREE_VALUES + int4_to_long(np.maximum(b - NUM_FREE_VALUES, 0))
    return np.where(b < NUM_FREE_VALUES, b, decoded)


# Decoded document length per norm byte, as float32 — mirrors the
# reference's LENGTH_TABLE (BM25Similarity.java:160-168).
LENGTH_TABLE = byte4_to_int(np.arange(256)).astype(np.float32)
