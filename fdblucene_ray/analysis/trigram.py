"""Character-trigram signatures for index-accelerated substring search
(the Lucene NGramTokenizer pattern: decompose text into overlapping
char n-grams, index them as terms, answer ``*infix*`` queries by
intersecting n-gram postings and verifying the few candidates — the
standard way wildcards-with-leading-`*` stop being term-dict scans).

Normalization: lowercase, every byte outside ``[a-z0-9]`` maps to
``_`` (so trigrams are valid tokens of the ``simple`` analyzer and the
signature survives being indexed as an ordinary text field). The
candidate set is a SUPERSET of true matches — normalization is a
per-byte function, so any occurrence of the needle in the text yields
exactly the needle's normalized trigrams — and the verify stage does
exact substring matching against the raw text.

Everything is numpy over the Arrow string buffers: one 256-byte LUT
pass, one sliding-window view, one per-doc unique — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_LUT = np.full(256, ord("_"), np.uint8)
for _c in b"abcdefghijklmnopqrstuvwxyz0123456789":
    _LUT[_c] = _c


def _string_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(offsets[int64, len+1], data[uint8]) of a string array,
    adjusted for a non-zero array offset. Handles both string (int32
    offsets) and large_string (int64 offsets) — reading a
    large_string buffer as int32 silently misparses every offset and
    corrupts trigram signatures with false-negative substring
    candidates."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off_dtype = (
        np.int64
        if pa.types.is_large_string(arr.type)
        or pa.types.is_large_binary(arr.type)
        else np.int32
    )
    start = arr.offset
    off = np.frombuffer(arr.buffers()[1], off_dtype)[
        start : start + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    return off, data


def trigram_keys(text: str) -> np.ndarray:
    """Sorted unique uint32 trigram keys of one (needle) string."""
    b = _LUT[np.frombuffer(text.lower().encode("utf-8"), np.uint8)]
    if len(b) < 3:
        return np.empty(0, np.uint32)
    w = np.lib.stride_tricks.sliding_window_view(b, 3).astype(np.uint32)
    return np.unique((w[:, 0] << 16) | (w[:, 1] << 8) | w[:, 2])


def key_to_term(key: int) -> str:
    return bytes(
        [(key >> 16) & 0xFF, (key >> 8) & 0xFF, key & 0xFF]
    ).decode("ascii")


def trigram_signature(text_col) -> pa.Array:
    """Per-row space-joined UNIQUE normalized trigrams of a string
    column (tf is irrelevant for substring candidacy, so the signature
    dedupes — a smaller index). Rows shorter than 3 bytes get ''."""
    col = text_col
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    low = pc.utf8_lower(col)
    off, data = _string_buffers(low)
    base, end = off[0], off[-1]
    n = len(off) - 1
    if end - base < 3 or n == 0:
        return pa.array([""] * n, pa.string())
    mapped = _LUT[data[base:end]]
    w = np.lib.stride_tricks.sliding_window_view(mapped, 3).astype(
        np.uint32
    )
    keys = (w[:, 0] << 16) | (w[:, 1] << 8) | w[:, 2]
    starts = np.arange(len(keys), dtype=np.int64) + base
    doc = np.searchsorted(off, starts, "right") - 1
    valid = starts + 3 <= off[doc + 1]
    doc, keys = doc[valid], keys[valid]
    # per-doc unique trigrams
    pair = np.unique(doc.astype(np.uint64) * np.uint64(1 << 24) + keys)
    pdoc = (pair >> np.uint64(24)).astype(np.int64)
    pkey = (pair & np.uint64((1 << 24) - 1)).astype(np.uint32)
    # decode the (small, alphabet-bounded) set of distinct trigrams once
    ukeys, inv = np.unique(pkey, return_inverse=True)
    uterms = pa.array([key_to_term(int(k)) for k in ukeys], pa.string())
    flat = uterms.take(pa.array(inv))
    counts = np.bincount(pdoc, minlength=n)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    la = pa.ListArray.from_arrays(pa.array(offsets), flat)
    return pc.binary_join(la.cast(pa.list_(pa.string())), " ")


def add_trigram_column(
    batch: pa.Table, *, text_col: str = "text", out_col: str = "trigrams"
) -> pa.Table:
    """map_batches preprocess: append the trigram-signature column."""
    return batch.append_column(out_col, trigram_signature(batch[text_col]))
