"""Block posting-list codec: delta+varint doc ids, varint tfs, raw norms,
fixed-size blocks with skip pointers and per-block max-score metadata.

At-rest analog of the reference's postings key family
(``("pm", field, term, docID) -> freq``, DATA.md:53, ascending docID
order) as an immutable compressed blob per term:

    [docs varints (all blocks)] [tfs varints (all blocks)] [norms raw]

plus a packed skip table (one entry per 128-posting block) carrying
``(last_doc, doc_off, tf_off, docs_len, tfs_len, max_tf, min_norm)``
with offsets relative to the term blob. ``max_tf``/``min_norm`` are the
block-max impact metadata for WAND: a block's BM25 upper bound is
reached at its max tf and min encoded length. Norms ride inside the
posting blob (impacts) so queries never touch a norms sidecar.

Encoding is BULK-VECTORIZED across a whole shuffle partition
(``encode_partition``): one varint pass over every delta in the
partition, reduceat for per-block maxima — no per-block numpy calls
(a per-term/per-block encode loop costs ~60us of numpy dispatch per
call and dominated the build at ~70k calls per partition).

The first doc of each block is delta-coded against the previous
block's last doc (first block against -1), so any block decodes
independently given its skip entry — the skip-advance property.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from fdblucene_ray.codec.varint import varint_decode, varint_encode

BLOCK_SIZE = 128

SKIP_DTYPE = np.dtype(
    [
        ("last_doc", "<i8"),
        ("doc_off", "<i8"),  # offset of block's doc varints, relative to term blob
        ("tf_off", "<i8"),  # offset of block's tf varints, relative to term blob
        ("pos_off", "<i8"),  # offset of block's position varints (0-len if none)
        ("docs_len", "<u4"),
        ("tfs_len", "<u4"),
        ("pos_len", "<u4"),
        ("max_tf", "<u4"),
        ("min_norm", "u1"),
    ]
)


def _varint_widths(v: np.ndarray) -> np.ndarray:
    nb = np.ones(v.shape, dtype=np.int64)
    for k in range(1, 10):
        nb += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    return nb


# ---- pluggable integer-stream codecs (U3 codec SPI) ----
# "varint": LEB128 (compact, the default); "fixed": little-endian u32
# (larger at rest, branch-free decode — a realistic alternative when
# decode CPU dominates, e.g. merge-heavy maintenance tiers).


def _fixed_encode(v: np.ndarray) -> bytes:
    return np.ascontiguousarray(v.astype("<u4")).tobytes()


def _fixed_widths(v: np.ndarray) -> np.ndarray:
    return np.full(v.shape, 4, np.int64)


def _fixed_decode(buf, count: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, np.uint64)
    arr = buf if isinstance(buf, np.ndarray) else np.frombuffer(buf, np.uint8)
    return np.ascontiguousarray(arr[: count * 4]).view("<u4").astype(np.uint64)


# "pfor": frame-of-reference bit packing per posting block (the
# PForDelta family — Zukowski et al. ICDE'06; Lucene's own
# Lucene84/90 postings pack each 128-int block at the block's max bit
# width, exceptions dropped, which is exactly this form). Each chunk
# is self-describing — [width u8][count u32le][ceil(count*width/8)
# payload bytes] — so any concatenation of chunks decodes from just
# the total count (the bulk gather-then-decode paths need that).
# Chunks are CO-TERMINOUS with posting blocks: encode_partition hands
# the block boundaries in, so a skip entry's byte span is a whole
# chunk and block decode stays one slice.

_FOR_HDR = 5


def _bit_widths(maxs: np.ndarray) -> np.ndarray:
    """Exact per-chunk bit width (0 for all-zero chunks); integer
    compares, no float log rounding."""
    w = np.zeros(maxs.shape, np.int64)
    for k in range(64):
        w += (maxs >= (np.uint64(1) << np.uint64(k))).astype(np.int64)
    return w


def _concat_index(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Flat gather index for concatenating ranges [starts, starts+lens)."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    base = np.concatenate(([0], np.cumsum(lens[:-1])))
    return np.repeat(starts, lens) + (
        np.arange(total, dtype=np.int64) - np.repeat(base, lens)
    )


def _for_encode_chunks(
    v: np.ndarray, bounds: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Bit-pack ``v`` in chunks delimited by ``bounds`` (monotone,
    covering [0, len(v)]; empty chunks emit nothing). Vectorized by
    width GROUP, not per chunk — all chunks sharing a bit width pack in
    one unpackbits/packbits pass. Returns (bytes, per-bound offsets)."""
    v = np.ascontiguousarray(v, np.uint64)
    bounds = np.asarray(bounds, np.int64)
    starts, ends = bounds[:-1], bounds[1:]
    cnt = ends - starts
    nz = cnt > 0
    C = len(starts)
    maxs = np.zeros(C, np.uint64)
    if len(v) and nz.any():
        # consecutive non-empty chunks tile the value space, so each
        # reduceat segment ends exactly at the chunk's end
        maxs[nz] = np.maximum.reduceat(v, starts[nz])
    widths = np.where(nz, _bit_widths(maxs), 0)
    payload_bytes = (cnt * widths + 7) // 8
    chunk_bytes = np.where(nz, _FOR_HDR + payload_bytes, 0)
    off = np.concatenate(([0], np.cumsum(chunk_bytes)))
    out = np.zeros(int(off[-1]), np.uint8)
    if nz.any():
        hp = off[:-1][nz]
        cn = cnt[nz]
        out[hp] = widths[nz]
        out[hp + 1] = cn & 0xFF
        out[hp + 2] = (cn >> 8) & 0xFF
        out[hp + 3] = (cn >> 16) & 0xFF
        out[hp + 4] = (cn >> 24) & 0xFF
    for b in np.unique(widths[nz & (widths > 0)]):
        sel = nz & (widths == b)
        c_st, c_cnt = starts[sel], cnt[sel]
        vals = v[_concat_index(c_st, c_cnt)]
        b = int(b)
        bits = np.unpackbits(
            vals.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1
        )[:, 64 - b :]
        pad_bits = ((c_cnt * b + 7) // 8) * 8
        bit_start = np.concatenate(([0], np.cumsum(pad_bits)))
        bitbuf = np.zeros(int(bit_start[-1]), np.uint8)
        vbase = np.concatenate(([0], np.cumsum(c_cnt[:-1])))
        val_in_chunk = (
            np.arange(int(c_cnt.sum()), dtype=np.int64)
            - np.repeat(vbase, c_cnt)
        )
        dst0 = np.repeat(bit_start[:-1], c_cnt) + val_in_chunk * b
        bitbuf[(dst0[:, None] + np.arange(b)).ravel()] = bits.ravel()
        payload = np.packbits(bitbuf)
        pbytes = (c_cnt * b + 7) // 8
        out[_concat_index(off[:-1][sel] + _FOR_HDR, pbytes)] = payload[
            _concat_index(bit_start[:-1] // 8, pbytes)
        ]
    return out.tobytes(), off


def _for_decode(buf, count: int) -> np.ndarray:
    """Decode ``count`` values from a chain of self-describing FOR
    chunks. Header walk is a cheap Python loop over CHUNKS (~count/128);
    bit unpacking is grouped by width and fully vectorized."""
    if count == 0:
        return np.empty(0, np.uint64)
    arr = buf if isinstance(buf, np.ndarray) else np.frombuffer(buf, np.uint8)
    pos = 0
    got = 0
    hdrs: list[tuple[int, int, int, int]] = []
    while got < count:
        b = int(arr[pos])
        cn = (
            int(arr[pos + 1])
            | int(arr[pos + 2]) << 8
            | int(arr[pos + 3]) << 16
            | int(arr[pos + 4]) << 24
        )
        hdrs.append((pos + _FOR_HDR, b, cn, got))
        pos += _FOR_HDR + (cn * b + 7) // 8
        got += cn
    if got != count:
        raise ValueError(f"FOR chunk chain holds {got} values, need {count}")
    out = np.empty(count, np.uint64)
    by_width: dict[int, list[tuple[int, int, int, int]]] = {}
    for h in hdrs:
        by_width.setdefault(h[1], []).append(h)
    for b, hs in by_width.items():
        ogs = np.array([h[3] for h in hs], np.int64)
        cnts = np.array([h[2] for h in hs], np.int64)
        if b == 0:
            out[_concat_index(ogs, cnts)] = 0
            continue
        pstarts = np.array([h[0] for h in hs], np.int64)
        plens = (cnts * b + 7) // 8
        payload = arr[_concat_index(pstarts, plens)]
        bit_start = np.concatenate(([0], np.cumsum(plens * 8)))
        vbase = np.concatenate(([0], np.cumsum(cnts[:-1])))
        n_vals = int(cnts.sum())
        val_in_chunk = (
            np.arange(n_vals, dtype=np.int64) - np.repeat(vbase, cnts)
        )
        src0 = np.repeat(bit_start[:-1], cnts) + val_in_chunk * b
        if b <= 56:
            # fast path: each value's b bits live inside the 8-byte
            # window starting at its start byte — one gather of 8
            # bytes per value, big-endian view, shift + mask
            pad = np.concatenate((payload, np.zeros(8, np.uint8)))
            byte0 = src0 >> 3
            win = pad[byte0[:, None] + np.arange(8)]
            w64 = win.reshape(-1, 8).copy().view(">u8").ravel().astype(np.uint64)
            shift = (np.uint64(64 - b) - (src0 & 7).astype(np.uint64))
            mask = np.uint64((1 << b) - 1)
            vals = (w64 >> shift) & mask
        else:
            bits = np.unpackbits(payload)
            vb = bits[src0[:, None] + np.arange(b)].astype(np.uint64)
            weights = np.uint64(1) << np.arange(
                b - 1, -1, -1, dtype=np.uint64
            )
            vals = (vb * weights).sum(axis=1, dtype=np.uint64)
        out[np.repeat(ogs, cnts) + val_in_chunk] = vals
    return out


_STREAMS = {
    "varint": (varint_encode, _varint_widths, varint_decode),
    "fixed": (_fixed_encode, _fixed_widths, _fixed_decode),
    "pfor": (None, None, _for_decode),
}

# streams whose encoder packs whole BLOCKS (needs the block bounds)
# rather than independent per-value codes
_CHUNKED_STREAMS = {"pfor": _for_encode_chunks}


@dataclass
class PartitionPostings:
    """Bulk-encoded postings for one sorted partition of terms."""

    blob: bytes  # concatenation of per-term blobs, in term order
    skips: bytes  # concatenation of per-term packed skip arrays
    post_offset: np.ndarray  # per-term offset into blob
    post_len: np.ndarray  # per-term blob length
    skip_offset: np.ndarray  # per-term offset into skips
    n_blocks: np.ndarray  # per-term block count
    df: np.ndarray  # per-term posting count
    ttf: np.ndarray  # per-term sum of tf


def encode_partition(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    norms: np.ndarray,
    term_starts: np.ndarray,
    block_size: int = BLOCK_SIZE,
    positions: np.ndarray | None = None,
    pos_counts: np.ndarray | None = None,
    streams: str = "varint",
) -> PartitionPostings:
    """Encode a partition's postings, sorted by (term, doc_id) with
    ``term_starts`` marking each term's first row. Fully vectorized.

    ``positions``: optional flat token-position array (DATA.md:54 "pp"
    family analog), ordered per (term, doc, occurrence); delta-varint
    coded per posting into a fourth per-term region
    ``[docs][tfs][norms][pos]``. ``pos_counts`` gives per-posting
    position counts (default: tfs) — 0 for postings of fields indexed
    without positions, letting positional and non-positional terms share
    one partition.
    """
    n = len(doc_ids)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint32)
    norms = np.ascontiguousarray(norms, dtype=np.uint8)
    term_starts = np.ascontiguousarray(term_starts, dtype=np.int64)
    T = len(term_starts)
    if n == 0 or T == 0:
        e = np.empty(0, np.int64)
        return PartitionPostings(b"", b"", e, e, e, e, e, e)
    term_ends = np.concatenate((term_starts[1:], [n]))
    lens = term_ends - term_starts

    # deltas: plain diff everywhere; each term's first doc is coded +1
    # against base -1 (block-leading deltas equal the plain diff because
    # the decode base is the previous block's last doc = previous posting)
    deltas = np.empty(n, np.uint64)
    if n > 1:
        deltas[1:] = np.diff(doc_ids).astype(np.uint64)
    deltas[term_starts] = (doc_ids[term_starts] + 1).astype(np.uint64)

    # global block index (needed up front: chunked codecs pack whole
    # blocks, so their chunk bounds ARE the block starts)
    nb_per_term = (lens + block_size - 1) // block_size
    total_blocks = int(nb_per_term.sum())
    term_of_block = np.repeat(np.arange(T), nb_per_term)
    first_block = np.concatenate(([0], np.cumsum(nb_per_term[:-1])))
    block_j = np.arange(total_blocks) - first_block[term_of_block]
    lo = term_starts[term_of_block] + block_j * block_size
    hi = np.minimum(lo + block_size, term_ends[term_of_block])

    chunk_enc = _CHUNKED_STREAMS.get(streams)
    tf64 = tfs.astype(np.uint64)
    if chunk_enc is not None:
        # block-packed streams: offsets are exact at block/term
        # boundaries (the only indices consulted below); interior
        # indices inherit their chunk's start offset via the repeat
        dbounds = np.concatenate((lo, [n]))
        dcnt = np.diff(dbounds)
        docs_stream, off_c = chunk_enc(deltas, dbounds)
        off_docs = np.concatenate(
            (np.repeat(off_c[:-1], dcnt), [off_c[-1]])
        )
        tfs_stream, off_c = chunk_enc(tf64, dbounds)
        off_tfs = np.concatenate(
            (np.repeat(off_c[:-1], dcnt), [off_c[-1]])
        )
    else:
        enc, widths, _ = _STREAMS[streams]
        docs_stream = enc(deltas)
        tfs_stream = enc(tf64)
        off_docs = np.concatenate(([0], np.cumsum(widths(deltas))))
        off_tfs = np.concatenate(([0], np.cumsum(widths(tf64))))

    # optional position streams: per-posting delta coding (first pos
    # absolute, then gaps), one varint pass over the whole partition
    if positions is not None:
        pos = np.ascontiguousarray(positions, dtype=np.int64)
        pc_ = tf64.astype(np.int64) if pos_counts is None else np.asarray(pos_counts, np.int64)
        ps = np.concatenate(([0], np.cumsum(pc_)))  # n+1
        pdeltas = np.empty(len(pos), np.uint64)
        if len(pos) > 1:
            pdeltas[1:] = np.diff(pos).astype(np.uint64)
        pdeltas[ps[:-1]] = pos[ps[:-1]].astype(np.uint64)
        if chunk_enc is not None:
            pbounds = np.concatenate((ps[lo], [len(pos)]))
            pcnt = np.diff(pbounds)
            pos_stream, off_c = chunk_enc(pdeltas, pbounds)
            off_pos = np.concatenate(
                (np.repeat(off_c[:-1], pcnt), [off_c[-1]])
            )
        else:
            pos_stream = enc(pdeltas)
            off_pos = np.concatenate(([0], np.cumsum(widths(pdeltas))))
        # per-term byte spans of the pos region
        p_term_lo = off_pos[ps[term_starts]]
        p_term_hi = off_pos[ps[term_ends]]
        p_total = p_term_hi - p_term_lo
    else:
        pos_stream = b""
        p_total = np.zeros(T, np.int64)

    # per-term region sizes
    d_total = off_docs[term_ends] - off_docs[term_starts]
    t_total = off_tfs[term_ends] - off_tfs[term_starts]
    post_len = d_total + t_total + lens + p_total
    post_offset = np.concatenate(([0], np.cumsum(post_len[:-1])))

    skips = np.zeros(total_blocks, SKIP_DTYPE)
    skips["last_doc"] = doc_ids[hi - 1]
    ts = term_starts[term_of_block]
    skips["doc_off"] = off_docs[lo] - off_docs[ts]
    skips["tf_off"] = d_total[term_of_block] + (off_tfs[lo] - off_tfs[ts])
    skips["docs_len"] = (off_docs[hi] - off_docs[lo]).astype(np.uint32)
    skips["tfs_len"] = (off_tfs[hi] - off_tfs[lo]).astype(np.uint32)
    if positions is not None:
        base = (d_total + t_total + lens)[term_of_block]
        skips["pos_off"] = base + (off_pos[ps[lo]] - off_pos[ps[ts]])
        skips["pos_len"] = (off_pos[ps[hi]] - off_pos[ps[lo]]).astype(np.uint32)
    skips["max_tf"] = np.maximum.reduceat(tfs, lo)
    skips["min_norm"] = np.minimum.reduceat(norms, lo)

    # assemble the partition blob: per term [docs][tfs][norms][pos]
    parts: list[bytes | memoryview] = []
    dv = memoryview(docs_stream)
    tv = memoryview(tfs_stream)
    nv = memoryview(norms.tobytes())
    pv = memoryview(pos_stream) if positions is not None else None
    for t in range(T):
        parts.append(dv[off_docs[term_starts[t]] : off_docs[term_ends[t]]])
        parts.append(tv[off_tfs[term_starts[t]] : off_tfs[term_ends[t]]])
        parts.append(nv[term_starts[t] : term_ends[t]])
        if pv is not None:
            parts.append(pv[p_term_lo[t] : p_term_hi[t]])
    blob = b"".join(parts)

    skip_offset = first_block * SKIP_DTYPE.itemsize
    return PartitionPostings(
        blob=blob,
        skips=skips.tobytes(),
        post_offset=post_offset,
        post_len=post_len,
        skip_offset=skip_offset,
        n_blocks=nb_per_term,
        df=lens,
        ttf=np.add.reduceat(tf64, term_starts).astype(np.int64),
    )


@dataclass
class EncodedPostings:
    blob: bytes
    skips: bytes
    n_docs: int


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    norms: np.ndarray,
    block_size: int = BLOCK_SIZE,
    positions: np.ndarray | None = None,
    streams: str = "varint",
) -> EncodedPostings:
    """Encode one term's postings (sorted ascending unique doc_ids)."""
    pp = encode_partition(
        np.asarray(doc_ids), np.asarray(tfs), np.asarray(norms),
        np.zeros(1 if len(doc_ids) else 0, np.int64), block_size, positions,
        streams=streams,
    )
    return EncodedPostings(pp.blob, pp.skips, len(doc_ids))


def read_skips(skips_buf) -> np.ndarray:
    return np.frombuffer(skips_buf, dtype=SKIP_DTYPE)


def decode_block(
    blob,
    skips: np.ndarray,
    bi: int,
    n_docs: int,
    block_size: int = BLOCK_SIZE,
    streams: str = "varint",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode block ``bi`` of one term's blob -> (doc_ids, tfs, norms)."""
    dec = _STREAMS[streams][2]
    s = skips[bi]
    lo = bi * block_size
    count = min(block_size, n_docs - lo)
    mv = memoryview(blob)
    doff, toff = int(s["doc_off"]), int(s["tf_off"])
    deltas = dec(mv[doff : doff + int(s["docs_len"])], count)
    tfs = dec(mv[toff : toff + int(s["tfs_len"])], count).astype(np.uint32)
    norms_region = int(skips[-1]["tf_off"]) + int(skips[-1]["tfs_len"])
    norms = np.frombuffer(mv[norms_region + lo : norms_region + lo + count], np.uint8)
    base = np.int64(skips[bi - 1]["last_doc"]) if bi > 0 else np.int64(-1)
    docs = np.cumsum(deltas.astype(np.int64)) + base
    return docs, tfs, norms


def _expand_position_deltas(pdeltas: np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Per-posting delta decode: cumsum with resets at posting starts."""
    out = np.cumsum(pdeltas.astype(np.int64))
    starts = np.concatenate(([0], np.cumsum(tfs.astype(np.int64))))[:-1]
    # subtract the running total accumulated before each posting
    corr = np.zeros(len(pdeltas), np.int64)
    corr[starts[1:]] = out[starts[1:] - 1]
    np.maximum.accumulate(corr, out=corr)
    return out - corr


def decode_block_positions(
    blob, skips: np.ndarray, bi: int, n_docs: int, block_size: int = BLOCK_SIZE,
    streams: str = "varint",
) -> tuple[np.ndarray, np.ndarray]:
    """Positions of block ``bi`` -> (flat_positions, per-posting tfs)."""
    dec = _STREAMS[streams][2]
    s = skips[bi]
    lo = bi * block_size
    count = min(block_size, n_docs - lo)
    mv = memoryview(blob)
    toff = int(s["tf_off"])
    tfs = dec(mv[toff : toff + int(s["tfs_len"])], count).astype(np.int64)
    total = int(tfs.sum())
    poff = int(s["pos_off"])
    plen = int(s["pos_len"])
    if plen == 0:
        raise ValueError("positions were not indexed for this term")
    pdeltas = dec(mv[poff : poff + plen], total)
    return _expand_position_deltas(pdeltas, tfs), tfs


def decode_all_positions(
    blob, skips: np.ndarray, n_docs: int, block_size: int = BLOCK_SIZE,
    streams: str = "varint",
) -> tuple[np.ndarray, np.ndarray]:
    """Full position stream of a term -> (flat_positions, per-posting tfs)
    aligned with decode_all's doc order."""
    parts_p, parts_t = [], []
    for bi in range(len(skips)):
        p, t = decode_block_positions(blob, skips, bi, n_docs, block_size, streams)
        parts_p.append(p)
        parts_t.append(t)
    if not parts_p:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(parts_p), np.concatenate(parts_t)


def _gather_ranges(buf_u8, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Concatenate buf_u8[starts[i]:ends[i]] for all i (vectorized gather)."""
    starts = np.asarray(starts, np.int64)
    lens = (np.asarray(ends, np.int64) - starts)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.uint8)
    dst = np.concatenate(([0], np.cumsum(lens[:-1])))
    idx = np.repeat(starts, lens) + (
        np.arange(total, dtype=np.int64) - np.repeat(dst, lens)
    )
    return np.asarray(buf_u8)[idx]


def _reset_cumsum(deltas: np.ndarray, group_starts: np.ndarray) -> np.ndarray:
    """cumsum(deltas) restarting at each group start (vectorized)."""
    out = np.cumsum(deltas.astype(np.int64))
    corr = np.zeros(len(deltas), np.int64)
    gs = group_starts[group_starts > 0]
    corr[gs] = out[gs - 1]
    np.maximum.accumulate(corr, out=corr)
    return out - corr


def bulk_decode_segment(
    blob_u8,
    skips_all: np.ndarray,
    post_offset: np.ndarray,
    skip_offset: np.ndarray,
    n_blocks: np.ndarray,
    df: np.ndarray,
    streams: str = "varint",
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode EVERY term's postings of one segment in a handful of
    vectorized passes -> (docs, tfs, norms, term_starts), flat arrays in
    term order. The merge/compact scale path: region boundaries come
    from the segment-wide skip array (one ``np.frombuffer``), regions
    are gathered into one stream per kind, and each stream decodes with
    ONE varint pass — no per-term Python/Arrow objects.
    """
    itemsize = SKIP_DTYPE.itemsize
    po = np.asarray(post_offset, np.int64)
    dfv = np.asarray(df, np.int64)
    T = len(po)
    if T == 0 or dfv.sum() == 0:
        e = np.empty(0, np.int64)
        return e, np.empty(0, np.uint32), np.empty(0, np.uint8), e
    first_blk = (np.asarray(skip_offset, np.int64) // itemsize)
    last_blk = first_blk + np.asarray(n_blocks, np.int64) - 1
    d_total = skips_all["tf_off"][first_blk].astype(np.int64)
    t_end = (
        skips_all["tf_off"][last_blk] + skips_all["tfs_len"][last_blk]
    ).astype(np.int64)
    docs_stream = _gather_ranges(blob_u8, po, po + d_total)
    tfs_stream = _gather_ranges(blob_u8, po + d_total, po + t_end)
    norms = _gather_ranges(blob_u8, po + t_end, po + t_end + dfv).copy()
    total = int(dfv.sum())
    term_starts = np.concatenate(([0], np.cumsum(dfv[:-1])))
    dec = _STREAMS[streams][2]
    deltas = dec(docs_stream, total)
    docs = _reset_cumsum(deltas, term_starts) - 1
    tfs = dec(tfs_stream, total).astype(np.uint32)
    return docs, tfs, norms, term_starts


def bulk_decode_segment_positions(
    blob_u8,
    skips_all: np.ndarray,
    post_offset: np.ndarray,
    post_len: np.ndarray,
    skip_offset: np.ndarray,
    n_blocks: np.ndarray,
    df: np.ndarray,
    tfs: np.ndarray,
    term_starts: np.ndarray,
    streams: str = "varint",
) -> tuple[np.ndarray, np.ndarray]:
    """Positions companion to ``bulk_decode_segment``:
    -> (flat_positions, per-posting position counts). Non-positional
    terms contribute zero-count postings; positional terms' streams are
    gathered and decoded in one varint pass."""
    itemsize = SKIP_DTYPE.itemsize
    po = np.asarray(post_offset, np.int64)
    dfv = np.asarray(df, np.int64)
    first_blk = (np.asarray(skip_offset, np.int64) // itemsize)
    last_blk = first_blk + np.asarray(n_blocks, np.int64) - 1
    t_end = (
        skips_all["tf_off"][last_blk] + skips_all["tfs_len"][last_blk]
    ).astype(np.int64)
    p_total = np.asarray(post_len, np.int64) - (t_end + dfv)
    positional = p_total > 0
    pos_stream = _gather_ranges(
        blob_u8, (po + t_end + dfv)[positional], (po + np.asarray(post_len, np.int64))[positional]
    )
    # per-posting counts: tf where the term is positional, else 0
    pos_counts = np.where(
        np.repeat(positional, dfv), tfs.astype(np.int64), 0
    )
    n_pos = int(pos_counts.sum())
    if n_pos == 0:
        return np.empty(0, np.int64), pos_counts
    pdeltas = _STREAMS[streams][2](pos_stream, n_pos)
    posting_starts = np.concatenate(([0], np.cumsum(pos_counts[:-1])))
    # restart the delta chain at each POSTING with >= 1 position
    flat = _reset_cumsum(pdeltas, np.unique(posting_starts[pos_counts > 0]))
    return flat, pos_counts


def decode_all(
    blob, skips: np.ndarray, n_docs: int, block_size: int = BLOCK_SIZE,
    streams: str = "varint",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a full posting list (exhaustive scoring / merge path) —
    one varint pass per stream, not per block."""
    if n_docs == 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.uint32),
            np.empty(0, np.uint8),
        )
    dec = _STREAMS[streams][2]
    mv = memoryview(blob)
    s0 = skips[0]
    slast = skips[-1]
    docs_end = int(slast["doc_off"]) + int(slast["docs_len"])
    tfs_end = int(slast["tf_off"]) + int(slast["tfs_len"])
    deltas = dec(mv[int(s0["doc_off"]) : docs_end], n_docs)
    tfs = dec(mv[int(s0["tf_off"]) : tfs_end], n_docs).astype(np.uint32)
    norms_region = int(slast["tf_off"]) + int(slast["tfs_len"])
    norms = np.frombuffer(mv[norms_region : norms_region + n_docs], np.uint8).copy()
    docs = np.cumsum(deltas.astype(np.int64)) - 1
    return docs, tfs, norms
