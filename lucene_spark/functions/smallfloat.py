"""Lucene SmallFloat norm quantization, re-expressed in Python/numpy.

Semantics match the reference's ``core/util/SmallFloat.java`` (longToInt4:103,
int4ToLong:127, intToByte4:147, byte4ToInt:159): a float-like encoding of
positive ints that keeps 4 significant mantissa bits, preserves ordering, and
encodes small values (< NUM_FREE_VALUES = 40) exactly. BM25 norms are
``intToByte4(doc_len)`` (``BM25Similarity.java:132-142``).

Everything here is pure integer math — no float rounding concerns.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "long_to_int4",
    "int4_to_long",
    "int_to_byte4",
    "byte4_to_int",
    "LENGTH_TABLE",
    "int_to_byte4_np",
    "NUM_FREE_VALUES",
]


def long_to_int4(i: int) -> int:
    """Order-preserving 4-significant-bit encoding of a non-negative int."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i  # subnormal: exact
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07  # drop implicit MSB
    return encoded | ((shift + 1) << 3)


def int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


MAX_INT4 = long_to_int4(2**31 - 1)
NUM_FREE_VALUES = 255 - MAX_INT4  # == 40 (values < 40 encode exactly)


def int_to_byte4(i: int) -> int:
    """Encode a non-negative int to an unsigned byte 0..255 (monotone)."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return (NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)) & 0xFF


def byte4_to_int(b: int) -> int:
    """Decode an unsigned byte 0..255 back to the (truncated) int."""
    i = b & 0xFF
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + int4_to_long(i - NUM_FREE_VALUES)


# 256-entry decode table: LENGTH_TABLE[norm_byte] = decoded doc length.
# Mirrors BM25Similarity.LENGTH_TABLE (BM25Similarity.java:122-129).
LENGTH_TABLE = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)

# Vectorized encoder: int_to_byte4 is monotone, so encoding an array of doc
# lengths is a right-closed searchsorted over the decode table.
# LENGTH_TABLE is strictly increasing, and int_to_byte4(x) == the largest b
# with LENGTH_TABLE[b] <= x (truncating encode).


def int_to_byte4_np(arr: np.ndarray) -> np.ndarray:
    """Vectorized ``int_to_byte4`` over a non-negative int array -> uint8."""
    if arr.size and arr.min() < 0:
        raise ValueError("Only supports positive values")
    idx = np.searchsorted(LENGTH_TABLE, arr, side="right") - 1
    return idx.astype(np.uint8)
