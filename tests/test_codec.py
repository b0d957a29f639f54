"""Codec round-trip + boundary tests.

Models the reference's test strategy (SURVEY.md §5): boundary sizes
around the block size (BoundaryTest.java:44-59) and seeded randomized
cases (FDBIndexInputTest.java:111-129).
"""

import numpy as np
import pytest

from fdblucene_ray.codec import (
    byte4_to_int,
    decode_all,
    decode_block,
    decode_norms,
    encode_lengths,
    encode_postings,
    int_to_byte4,
    read_skips,
    varint_decode,
    varint_encode,
)

B = 128  # default block size


class TestVarint:
    def test_boundaries(self):
        v = np.array(
            [0, 1, 127, 128, 129, 16383, 16384, 2**21 - 1, 2**21, 2**62],
            dtype=np.uint64,
        )
        assert np.array_equal(varint_decode(varint_encode(v), len(v)), v)

    def test_empty(self):
        assert varint_encode(np.empty(0, np.uint64)) == b""
        assert len(varint_decode(b"", 0)) == 0

    @pytest.mark.parametrize("seed", range(5))
    def test_random(self, seed):
        rng = np.random.default_rng(seed)
        # mixed magnitudes
        v = (rng.integers(0, 2**60, 2000).astype(np.uint64)
             >> rng.integers(0, 60, 2000).astype(np.uint64))
        assert np.array_equal(varint_decode(varint_encode(v), len(v)), v)

    def test_truncated_raises(self):
        v = np.array([300, 300], dtype=np.uint64)
        enc = varint_encode(v)
        with pytest.raises(ValueError):
            varint_decode(enc[:-1], 2)


class TestSmallFloat:
    def test_exact_below_free(self):
        for i in range(24):
            assert int_to_byte4(i) == i
            assert byte4_to_int(i) == i

    def test_lossy_floor(self):
        for i in [0, 1, 23, 24, 25, 100, 1000, 65537, 10**9]:
            d = byte4_to_int(int_to_byte4(i))
            assert d <= i
            # next representable value is > i
            if int_to_byte4(i) < 255:
                assert byte4_to_int(int_to_byte4(i) + 1) > i

    def test_monotone(self):
        prev = -1
        for b in range(256):
            v = byte4_to_int(b)
            assert v > prev
            prev = v

    def test_vectorized_matches_scalar(self):
        lens = np.arange(0, 200000, 13)
        enc = encode_lengths(lens)
        for ln, e in zip(lens[::37], enc[::37]):
            assert int_to_byte4(int(ln)) == int(e)
        dec = decode_norms(enc)
        assert np.all(dec <= lens)


class TestPostings:
    @pytest.mark.parametrize(
        "n", [0, 1, B - 1, B, B + 1, 3 * B - 1, 3 * B, 3 * B + 1, 1000]
    )
    def test_roundtrip_boundaries(self, n):
        rng = np.random.default_rng(n)
        docs = np.sort(rng.choice(10**8, size=n, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 500, n).astype(np.uint32)
        norms = rng.integers(0, 256, n).astype(np.uint8)
        ep = encode_postings(docs, tfs, norms)
        sk = read_skips(ep.skips)
        d, t, nn = decode_all(ep.blob, sk, ep.n_docs)
        assert np.array_equal(d, docs)
        assert np.array_equal(t, tfs)
        assert np.array_equal(nn, norms)

    def test_block_independence(self):
        """Each block decodes alone given only its skip entry + predecessor
        last_doc — the property skip-based advance relies on."""
        rng = np.random.default_rng(7)
        n = 5 * B + 17
        docs = np.sort(rng.choice(10**7, size=n, replace=False)).astype(np.int64)
        tfs = np.ones(n, dtype=np.uint32)
        norms = np.zeros(n, dtype=np.uint8)
        ep = encode_postings(docs, tfs, norms)
        sk = read_skips(ep.skips)
        for bi in range(len(sk)):
            d, _, _ = decode_block(ep.blob, sk, bi, n)
            lo, hi = bi * B, min((bi + 1) * B, n)
            assert np.array_equal(d, docs[lo:hi])
            assert int(sk[bi]["last_doc"]) == docs[hi - 1]

    def test_skip_metadata(self):
        docs = np.arange(0, 1000, dtype=np.int64)
        tfs = (docs % 9 + 1).astype(np.uint32)
        norms = (docs % 200).astype(np.uint8)
        ep = encode_postings(docs, tfs, norms)
        sk = read_skips(ep.skips)
        for bi in range(len(sk)):
            lo, hi = bi * B, min((bi + 1) * B, 1000)
            assert int(sk[bi]["max_tf"]) == int(tfs[lo:hi].max())
            assert int(sk[bi]["min_norm"]) == int(norms[lo:hi].min())

    @pytest.mark.parametrize("block_size", [32, 128, 256])
    def test_param_block_sizes(self, block_size):
        rng = np.random.default_rng(block_size)
        n = 777
        docs = np.sort(rng.choice(10**6, size=n, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 9, n).astype(np.uint32)
        norms = rng.integers(0, 250, n).astype(np.uint8)
        ep = encode_postings(docs, tfs, norms, block_size)
        d, t, nn = decode_all(ep.blob, read_skips(ep.skips), n, block_size)
        assert np.array_equal(d, docs)
        assert np.array_equal(t, tfs)
        assert np.array_equal(nn, norms)


class TestFixedBlockCodec:
    """Second production codec (U3 codec SPI): fixed-width u32 streams
    sharing the block/skip/impact layout. Every decode surface must
    round-trip and agree with the varint codec's results."""

    def _codec(self):
        from fdblucene_ray.codec.registry import get_codec

        return get_codec("fixed-block")

    @pytest.mark.parametrize("n", [0, 1, B - 1, B, B + 1, 3 * B + 1, 1000])
    def test_roundtrip_boundaries(self, n):
        c = self._codec()
        rng = np.random.default_rng(n)
        docs = np.sort(rng.choice(10**8, size=n, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 500, n).astype(np.uint32)
        norms = rng.integers(0, 256, n).astype(np.uint8)
        starts = np.zeros(1 if n else 0, np.int64)
        pp = c.encode_partition(docs, tfs, norms, starts)
        sk = read_skips(pp.skips)
        d, t, nn = c.decode_all(pp.blob, sk, n)
        assert np.array_equal(d, docs)
        assert np.array_equal(t, tfs)
        assert np.array_equal(nn, norms)
        # block decode agrees too
        for bi in range(len(sk)):
            db, tb, nb = c.decode_block(pp.blob, sk, bi, n)
            lo, hi = bi * B, min((bi + 1) * B, n)
            assert np.array_equal(db, docs[lo:hi])
            assert np.array_equal(tb, tfs[lo:hi])
            assert np.array_equal(nb, norms[lo:hi])

    def test_positions_roundtrip(self):
        c = self._codec()
        rng = np.random.default_rng(9)
        n = 2 * B + 11
        docs = np.sort(rng.choice(10**6, size=n, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 5, n).astype(np.uint32)
        norms = rng.integers(0, 200, n).astype(np.uint8)
        pos = np.concatenate(
            [np.sort(rng.choice(500, size=int(t), replace=False)) for t in tfs]
        ).astype(np.int64)
        pp = c.encode_partition(docs, tfs, norms, np.zeros(1, np.int64),
                                positions=pos)
        sk = read_skips(pp.skips)
        flat, ptfs = c.decode_all_positions(pp.blob, sk, n)
        assert np.array_equal(flat, pos)
        assert np.array_equal(ptfs, tfs.astype(ptfs.dtype))

    def test_bulk_decode_matches_varint(self):
        """Both codecs bulk-decode a multi-term partition to identical
        logical postings (merge-path parity)."""
        from fdblucene_ray.codec.registry import get_codec

        rng = np.random.default_rng(21)
        T, per = 37, 61
        docs = np.concatenate(
            [np.sort(rng.choice(10**6, size=per, replace=False)) for _ in range(T)]
        ).astype(np.int64)
        tfs = rng.integers(1, 30, T * per).astype(np.uint32)
        norms = rng.integers(0, 255, T * per).astype(np.uint8)
        starts = (np.arange(T) * per).astype(np.int64)
        outs = []
        for name in ("varint-block", "fixed-block"):
            c = get_codec(name)
            pp = c.encode_partition(docs, tfs, norms, starts)
            sk = np.frombuffer(pp.skips, dtype=np.dtype(read_skips(pp.skips).dtype))
            blob_u8 = np.frombuffer(pp.blob, np.uint8)
            outs.append(
                c.bulk_decode_segment(
                    blob_u8, sk, pp.post_offset, pp.skip_offset, pp.n_blocks, pp.df
                )
            )
        for a, b in zip(*outs):
            assert np.array_equal(a, b)
        assert np.array_equal(outs[0][0], docs)

    def test_fixed_larger_at_rest(self):
        """The tradeoff is real: fixed-block trades size for decode CPU."""
        from fdblucene_ray.codec.registry import get_codec

        docs = np.arange(0, 5000, dtype=np.int64)  # tiny deltas
        tfs = np.ones(5000, np.uint32)
        norms = np.zeros(5000, np.uint8)
        starts = np.zeros(1, np.int64)
        v = get_codec("varint-block").encode_partition(docs, tfs, norms, starts)
        f = get_codec("fixed-block").encode_partition(docs, tfs, norms, starts)
        assert len(f.blob) > 2 * len(v.blob)


class TestForBlockCodec:
    """Third production codec (U3 codec SPI): frame-of-reference bit
    packing per posting block (PForDelta family / Lucene84 PackedInts
    form). Chunks are self-describing, so every decode surface —
    single block, whole term, bulk gathered segment — must round-trip
    and agree with the varint codec."""

    def _codec(self):
        from fdblucene_ray.codec.registry import get_codec

        return get_codec("for-block")

    @pytest.mark.parametrize("n", [0, 1, B - 1, B, B + 1, 3 * B + 1, 1000])
    def test_roundtrip_boundaries(self, n):
        c = self._codec()
        rng = np.random.default_rng(n)
        docs = np.sort(rng.choice(10**8, size=n, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 500, n).astype(np.uint32)
        norms = rng.integers(0, 256, n).astype(np.uint8)
        starts = np.zeros(1 if n else 0, np.int64)
        pp = c.encode_partition(docs, tfs, norms, starts)
        sk = read_skips(pp.skips)
        d, t, nn = c.decode_all(pp.blob, sk, n)
        assert np.array_equal(d, docs)
        assert np.array_equal(t, tfs)
        assert np.array_equal(nn, norms)
        for bi in range(len(sk)):
            db, tb, nb = c.decode_block(pp.blob, sk, bi, n)
            lo, hi = bi * B, min((bi + 1) * B, n)
            assert np.array_equal(db, docs[lo:hi])
            assert np.array_equal(tb, tfs[lo:hi])
            assert np.array_equal(nb, norms[lo:hi])

    def test_positions_roundtrip_with_nonpositional_term(self):
        """A non-positional TERM (pos_counts 0 — the codec contract
        for fields indexed without positions) leaves its blocks with
        NO position chunks; the self-describing chain must still bulk
        decode the surrounding positional terms."""
        c = self._codec()
        rng = np.random.default_rng(9)
        per = B + 11
        n = 3 * per
        docs = np.concatenate(
            [np.sort(rng.choice(10**6, size=per, replace=False))
             for _ in range(3)]
        ).astype(np.int64)
        tfs = rng.integers(1, 5, n).astype(np.uint32)
        norms = rng.integers(0, 200, n).astype(np.uint8)
        pos_counts = tfs.astype(np.int64).copy()
        pos_counts[per : 2 * per] = 0  # middle term: no positions
        pos = np.concatenate(
            [np.sort(rng.choice(500, size=int(t), replace=False))
             for t in pos_counts]
        ).astype(np.int64)
        pp = c.encode_partition(
            docs, tfs, norms,
            (np.arange(3) * per).astype(np.int64),
            positions=pos, pos_counts=pos_counts,
        )
        sk = read_skips(pp.skips)
        blob_u8 = np.frombuffer(pp.blob, np.uint8)
        d, t, nn, ts = c.bulk_decode_segment(
            blob_u8, read_skips(pp.skips), pp.post_offset,
            pp.skip_offset, pp.n_blocks, pp.df,
        )
        flat, pcs = c.bulk_decode_segment_positions(
            blob_u8, sk, pp.post_offset, pp.post_len, pp.skip_offset,
            pp.n_blocks, pp.df, t, ts,
        )
        assert np.array_equal(flat, pos)
        assert np.array_equal(pcs, pos_counts)

    def test_wide_values_and_zero_chunks(self):
        """Width-0 chunks (all-zero values) and near-64-bit values both
        survive: exact integer widths, no float log rounding."""
        from fdblucene_ray.codec.postings import _for_decode, _for_encode_chunks

        v = np.array(
            [0, 0, 0, 1, (1 << 53) + 1, (1 << 63) - 1, 2**64 - 1, 0],
            np.uint64,
        )
        bounds = np.array([0, 3, 3, 8], np.int64)  # incl. an empty chunk
        buf, off = _for_encode_chunks(v, bounds)
        assert off[1] == off[2]  # empty chunk occupies zero bytes
        out = _for_decode(np.frombuffer(buf, np.uint8), len(v))
        assert np.array_equal(out, v)

    def test_bulk_decode_matches_varint(self):
        from fdblucene_ray.codec.registry import get_codec

        rng = np.random.default_rng(21)
        T, per = 37, 61
        docs = np.concatenate(
            [np.sort(rng.choice(10**6, size=per, replace=False)) for _ in range(T)]
        ).astype(np.int64)
        tfs = rng.integers(1, 30, T * per).astype(np.uint32)
        norms = rng.integers(0, 255, T * per).astype(np.uint8)
        starts = (np.arange(T) * per).astype(np.int64)
        outs = []
        for name in ("varint-block", "for-block"):
            c = get_codec(name)
            pp = c.encode_partition(docs, tfs, norms, starts)
            sk = read_skips(pp.skips)
            blob_u8 = np.frombuffer(pp.blob, np.uint8)
            outs.append(
                c.bulk_decode_segment(
                    blob_u8, sk, pp.post_offset, pp.skip_offset, pp.n_blocks, pp.df
                )
            )
        for a, b in zip(*outs):
            assert np.array_equal(a, b)
        assert np.array_equal(outs[0][0], docs)

    def test_denser_than_varint_on_small_gaps(self):
        """The point of FOR: dense posting lists (small uniform deltas)
        pack below one byte per value; varint's floor is one byte."""
        from fdblucene_ray.codec.registry import get_codec

        docs = np.arange(0, 50_000, dtype=np.int64)  # delta 1 everywhere
        tfs = np.ones(50_000, np.uint32)
        norms = np.zeros(50_000, np.uint8)
        starts = np.zeros(1, np.int64)
        v = get_codec("varint-block").encode_partition(docs, tfs, norms, starts)
        f = get_codec("for-block").encode_partition(docs, tfs, norms, starts)
        assert len(f.blob) < 0.5 * len(v.blob)


class TestForBlockProperties:
    """Hypothesis round-trips for the FOR chunk coder: arbitrary u64
    values under arbitrary chunk bounds."""

    def test_property_roundtrip(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from fdblucene_ray.codec.postings import (
            _for_decode,
            _for_encode_chunks,
        )

        @settings(max_examples=200, deadline=None)
        @given(
            vals=st.lists(
                st.integers(min_value=0, max_value=2**64 - 1),
                max_size=400,
            ),
            cuts=st.lists(st.integers(min_value=0, max_value=400),
                          max_size=8),
            data=st.data(),
        )
        def run(vals, cuts, data):
            v = np.array(vals, np.uint64)
            inner = sorted(c for c in cuts if c <= len(v))
            bounds = np.array([0] + inner + [len(v)], np.int64)
            buf, off = _for_encode_chunks(v, bounds)
            assert off[-1] == len(buf)
            out = _for_decode(np.frombuffer(buf, np.uint8), len(v))
            assert np.array_equal(out, v)
            # offsets are monotone and empty chunks occupy zero bytes
            assert (np.diff(off) >= 0).all()

        run()
