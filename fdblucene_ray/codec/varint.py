"""Vectorized LEB128 varint codec over numpy arrays.

Byte-level analog of the reference's big-endian int/long codecs
(FDBUtil.java:32-62) applied to posting compression: the north-star
format is delta+varint posting lists. Both encode and decode are
vectorized (a short loop over byte positions, never over values).
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def varint_encode(values: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative ints as a varint byte stream."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # exact byte width per value: 1 + number of thresholds <= value
    nb = np.ones(v.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nb += (v >= t).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(nb)[:-1]))
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    max_nb = int(nb.max())
    for k in range(max_nb):
        mask = nb > k
        chunk = (v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nb[mask] - 1 > k).astype(np.uint8) << np.uint8(7)
        out[starts[mask] + k] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf, count: int) -> np.ndarray:
    """Decode exactly ``count`` varints from ``buf`` (bytes/memoryview).

    Returns a uint64 array of length ``count``. Raises if the stream is
    malformed or shorter than ``count`` values.
    """
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    ends = np.flatnonzero(b < 0x80)
    if ends.size < count:
        raise ValueError("varint stream truncated")
    ends = ends[:count]
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    widths = ends - starts + 1
    vals = np.zeros(count, dtype=np.uint64)
    for k in range(int(widths.max())):
        mask = widths > k
        vals[mask] |= (b[starts[mask] + k] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(
            7 * k
        )
    return vals


def varint_stream_len(values: np.ndarray) -> int:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nb = np.ones(v.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nb += (v >= t).astype(np.int64)
    return int(nb.sum())
