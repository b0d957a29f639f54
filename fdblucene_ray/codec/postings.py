"""Block posting-list codec: delta+varint doc ids, varint tfs, raw norms,
fixed-size blocks with skip pointers and per-block max-score metadata.

This is the at-rest analog of the reference's postings key family
(``("pm", field, term, docID) -> freq``, DATA.md:53, ascending docID
order) re-expressed as an immutable compressed blob per term:

    [block0: docs_varints | tfs_varints | norms_raw][block1: ...]

plus a packed skip table (one entry per block) carrying
``(last_doc, offset, docs_len, tfs_len, max_tf, min_norm)``.
``max_tf``/``min_norm`` are the block-max impact metadata used by
block-max WAND: the BM25 block score upper bound is reached at the
block's maximum tf and minimum encoded length.

Norms ride inside the posting (an "impact"): storing the 1-byte norm
next to each (doc, tf) removes the query-time norms-sidecar lookup
entirely — the right trade at 10^12-doc scale where a random
norms fetch per posting would dominate.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from fdblucene_ray.codec.varint import varint_decode, varint_encode

BLOCK_SIZE = 128

SKIP_DTYPE = np.dtype(
    [
        ("last_doc", "<i8"),
        ("offset", "<i8"),
        ("docs_len", "<u4"),
        ("tfs_len", "<u4"),
        ("max_tf", "<u4"),
        ("min_norm", "u1"),
    ]
)


@dataclass
class EncodedPostings:
    blob: bytes  # concatenated blocks
    skips: bytes  # packed SKIP_DTYPE array, one entry per block
    n_docs: int


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    norms: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> EncodedPostings:
    """Encode one term's postings (sorted ascending unique doc_ids)."""
    n = len(doc_ids)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint32)
    norms = np.ascontiguousarray(norms, dtype=np.uint8)
    n_blocks = (n + block_size - 1) // block_size
    skips = np.zeros(n_blocks, dtype=SKIP_DTYPE)
    parts: list[bytes] = []
    offset = 0
    # deltas: first doc of a block is delta-coded against the previous
    # block's last doc (first block against -1), so every block decodes
    # independently given its skip entry.
    deltas = np.empty(n, dtype=np.uint64)
    if n:
        deltas[0] = np.uint64(doc_ids[0] + 1)
        deltas[1:] = np.diff(doc_ids).astype(np.uint64)
    for bi in range(n_blocks):
        lo, hi = bi * block_size, min((bi + 1) * block_size, n)
        d = deltas[lo:hi].copy()
        if bi > 0:
            # rebase the block-leading delta on the previous block's last doc
            d[0] = np.uint64(doc_ids[lo] - doc_ids[lo - 1])
        docs_b = varint_encode(d)
        tfs_b = varint_encode(tfs[lo:hi])
        norms_b = norms[lo:hi].tobytes()
        skips[bi] = (
            doc_ids[hi - 1],
            offset,
            len(docs_b),
            len(tfs_b),
            int(tfs[lo:hi].max()),
            int(norms[lo:hi].min()),
        )
        parts.append(docs_b)
        parts.append(tfs_b)
        parts.append(norms_b)
        offset += len(docs_b) + len(tfs_b) + (hi - lo)
    return EncodedPostings(b"".join(parts), skips.tobytes(), n)


def read_skips(skips_buf) -> np.ndarray:
    return np.frombuffer(skips_buf, dtype=SKIP_DTYPE)


def decode_block(
    blob,
    skips: np.ndarray,
    bi: int,
    n_docs: int,
    block_size: int = BLOCK_SIZE,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode block ``bi`` -> (doc_ids, tfs, norms)."""
    s = skips[bi]
    lo = bi * block_size
    count = min(block_size, n_docs - lo)
    off = int(s["offset"])
    dl, tl = int(s["docs_len"]), int(s["tfs_len"])
    deltas = varint_decode(memoryview(blob)[off : off + dl], count)
    tfs = varint_decode(memoryview(blob)[off + dl : off + dl + tl], count).astype(np.uint32)
    norms = np.frombuffer(blob, dtype=np.uint8, count=count, offset=off + dl + tl)
    base = np.int64(skips[bi - 1]["last_doc"]) if bi > 0 else np.int64(-1)
    docs = np.cumsum(deltas.astype(np.int64)) + base
    return docs, tfs, norms


def decode_all(
    blob, skips: np.ndarray, n_docs: int, block_size: int = BLOCK_SIZE
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a full posting list (exhaustive scoring / merge path)."""
    if n_docs == 0:
        e = np.empty(0)
        return e.astype(np.int64), e.astype(np.uint32), e.astype(np.uint8)
    out_d, out_t, out_n = [], [], []
    for bi in range(len(skips)):
        d, t, nn = decode_block(blob, skips, bi, n_docs, block_size)
        out_d.append(d)
        out_t.append(t)
        out_n.append(nn)
    return np.concatenate(out_d), np.concatenate(out_t), np.concatenate(out_n)
