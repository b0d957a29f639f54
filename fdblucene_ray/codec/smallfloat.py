"""Lossy small-int norm codec (Lucene ``SmallFloat.intToByte4`` semantics).

The reference stores per-doc norms as the similarity-encoded document
length (``("nv", field, docID) -> long``, DATA.md:37); Lucene 8 encodes
the length with a lossy 4-bit-mantissa byte (SmallFloat.intToByte4).
Replicating this *lossy* encoding is required for BM25 score-identity
with Lucene semantics (SURVEY.md §7 "hard parts" (a)).

Implemented from the published encoding definition: values below
NUM_FREE_VALUES are exact; larger values keep the top 4 significant
bits (floor), i.e. decode(encode(x)) is the largest representable
value <= x.
"""

from __future__ import annotations

import numpy as np


def _long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError("negative")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    encoded |= (shift + 1) << 3
    return encoded


def _int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = _long_to_int4(2**31 - 1)
NUM_FREE_VALUES = 255 - _MAX_INT4


def int_to_byte4(i: int) -> int:
    """Encode a non-negative int into [0, 255], lossy above NUM_FREE_VALUES."""
    if i < 0:
        raise ValueError("negative")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + _long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + _int4_to_long(b - NUM_FREE_VALUES)


# Precomputed tables for vectorized use in map_batches.
DECODE_TABLE = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)
# DECODE_TABLE is strictly increasing -> encode via searchsorted (floor).
assert np.all(np.diff(DECODE_TABLE) > 0)


def encode_lengths(lengths: np.ndarray) -> np.ndarray:
    """Vectorized int_to_byte4 over an array of non-negative doc lengths."""
    clipped = np.minimum(lengths, DECODE_TABLE[-1])
    return (np.searchsorted(DECODE_TABLE, clipped, side="right") - 1).astype(np.uint8)


def decode_norms(norms: np.ndarray) -> np.ndarray:
    """Vectorized byte4_to_int."""
    return DECODE_TABLE[norms]
