"""In-flight wire formats for the build/merge shuffle's run cells.

A run row carries one term's postings from one tokenizer batch (or one
merge slab) as packed binary cells. Two formats, chosen by the build's
``wire`` knob:

- ``"raw"`` (default): docs as little-endian int64, tfs as int32 —
  zero-copy numpy views on both ends. Fastest on a single node, where
  the exchange moves through shared memory and bytes are nearly free
  (measured ~20% faster than varint at 32 CPUs locally).
- ``"varint"``: docs as per-run delta varints (first doc coded as the
  gap from the run's ``min_doc`` column, i.e. 0), tfs as raw varints —
  ~2-3 bytes per posting instead of 12, reusing the vectorized LEB128
  kernels of the at-rest codec (codec/varint.py). The choice for real
  multi-node clusters, where the exchange crosses the NETWORK and
  3-4x fewer bytes is 3-4x less NIC time; costs one encode pass per
  batch and one decode pass per partition.

The format is transient (never at rest): producers are
TokenizeToPostings / DecodeSegmentPostings, the only consumer is
``write_segment_runs``. ``norms`` (1 byte/posting) and ``pos`` cells
stay raw in both formats. Identity between the two paths is pinned by
test (same manifest modulo names, same query results).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fdblucene_ray.codec.varint import varint_decode, varint_encode

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def _varint_widths(v: np.ndarray) -> np.ndarray:
    nb = np.ones(v.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nb += (v >= t).astype(np.int64)
    return nb


def _packed_cells(u8: np.ndarray, starts: np.ndarray, ends: np.ndarray):
    """Zero-copy pa.binary array whose cell i is u8[starts[i]:ends[i]]
    (cells back-to-back)."""
    n = len(starts)
    if n == 0:
        return pa.array([], pa.binary())
    offsets = np.empty(n + 1, dtype=np.int32)
    offsets[:-1] = starts
    offsets[-1] = ends[-1] if n else 0
    return pa.Array.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(u8.tobytes())],
    )


def _pack_varint(vals: np.ndarray, starts: np.ndarray, ends: np.ndarray):
    stream = varint_encode(vals)
    if len(vals) == 0:
        return _packed_cells(np.empty(0, np.uint8), starts * 0, ends * 0)
    w = _varint_widths(np.ascontiguousarray(vals, np.uint64))
    off = np.concatenate(([0], np.cumsum(w))).astype(np.int64)
    return _packed_cells(np.frombuffer(stream, np.uint8), off[starts], off[ends])


def pack_doc_cells(d: np.ndarray, starts: np.ndarray, ends: np.ndarray):
    """Docs cells: per-run delta varints. ``d`` must be ascending within
    each run and d[start] must equal the run's min_doc column (so the
    first gap is 0)."""
    deltas = np.empty(len(d), np.uint64)
    if len(d):
        diffs = np.diff(np.ascontiguousarray(d, np.int64))
        deltas[1:] = diffs.astype(np.uint64)
        deltas[starts] = 0
        # a negative within-run gap would wrap the unsigned delta and
        # silently corrupt postings downstream — refuse loudly
        if len(diffs):
            bad = diffs < 0
            bad[starts[1:] - 1] = False  # run boundaries may go backwards
            if bad.any():
                raise ValueError("doc ids not ascending within a run")
    return _pack_varint(deltas, starts, ends)


def pack_val_cells(v: np.ndarray, starts: np.ndarray, ends: np.ndarray):
    """Value cells (tfs / doc lengths): raw varints, no delta."""
    return _pack_varint(np.ascontiguousarray(v, np.uint64), starts, ends)


def unpack_doc_cells(
    stream_u8: np.ndarray, n_per_run: np.ndarray, min_docs: np.ndarray
) -> np.ndarray:
    """Concatenated docs cells (run order) -> flat int64 doc ids."""
    n_per_run = np.asarray(n_per_run, np.int64)
    total = int(n_per_run.sum())
    if total == 0:
        return np.empty(0, np.int64)
    deltas = varint_decode(stream_u8, total).astype(np.int64)
    out = np.cumsum(deltas)
    run_starts = np.concatenate(([0], np.cumsum(n_per_run[:-1])))
    # reset the cumulative chain at each run start, then rebase on
    # min_doc (empty runs collapse onto the next run's start; unique
    # dedups them, and the written corr value is identical)
    corr = np.zeros(total, np.int64)
    rs = np.unique(run_starts[1:]) if len(n_per_run) > 1 else run_starts[:0]
    rs = rs[(rs > 0) & (rs < total)]
    corr[rs] = out[rs - 1]
    np.maximum.accumulate(corr, out=corr)
    return out - corr + np.repeat(np.asarray(min_docs, np.int64), n_per_run)


def unpack_val_cells(stream_u8: np.ndarray, total: int) -> np.ndarray:
    """Concatenated value cells -> flat uint64 values."""
    if total == 0:
        return np.empty(0, np.uint64)
    return varint_decode(stream_u8, total)


# ---------------------------------------------------------------- dispatch


def pack_docs(d, starts, ends, wire: str):
    if wire == "varint":
        return pack_doc_cells(d, starts, ends)
    u8 = np.ascontiguousarray(d, "<i8").view(np.uint8)
    return _packed_cells(u8, np.asarray(starts) * 8, np.asarray(ends) * 8)


def pack_vals(v, starts, ends, wire: str):
    if wire == "varint":
        return pack_val_cells(v, starts, ends)
    u8 = np.ascontiguousarray(v, "<i4").view(np.uint8)
    return _packed_cells(u8, np.asarray(starts) * 4, np.asarray(ends) * 4)


def unpack_docs(stream_u8, n_per_run, min_docs, wire: str) -> np.ndarray:
    if wire == "varint":
        return unpack_doc_cells(stream_u8, n_per_run, min_docs)
    return np.ascontiguousarray(stream_u8).view("<i8").astype(np.int64, copy=False)


def unpack_vals(stream_u8, total: int, wire: str) -> np.ndarray:
    if wire == "varint":
        return unpack_val_cells(stream_u8, total)
    return np.ascontiguousarray(stream_u8).view("<i4").astype(np.uint64)
