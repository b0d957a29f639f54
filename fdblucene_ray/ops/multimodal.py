"""Multimodal column plumbing: opaque binary payloads through actor-pool
decode / feature-extract stages.

Image/audio/video are treated as opaque ``binary`` columns with typed
metadata, exactly as a 100 TB multimodal pipeline would carry them. The
actual codec libraries (PIL/ffmpeg/librosa) are NOT in this container,
so the decode kernel is STUBBED: ``DecodeStub`` produces a deterministic
fake "decoded" feature purely from the payload bytes (documented, and
guarded so a real decoder can be slotted in via ``decoder=``). The
Ray-side plumbing — schema handling, small-batch sizing for large
payloads, actor-pool signature, output layout — is real and tested.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import ray.data

FEATURE_DIM = 8


def _fake_decode(payloads: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic stand-in for a media decoder: per payload returns
    (byte_length, crc32, FEATURE_DIM float32 feature from byte stats).

    Receives the WHOLE batch and works off the Arrow binary column's
    buffers: lengths via ``pc.binary_length``, features via one
    ``np.add.reduceat`` over the shared values buffer — no per-row
    ``.as_py()`` materialization. The crc loop slices memoryviews of
    the same buffer (a real decoder slot would be batched the same
    way)."""
    import pyarrow.compute as pc

    n = len(payloads)
    lens = pc.binary_length(payloads).fill_null(0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    if pa.types.is_large_binary(payloads.type):
        odtype, osize = np.int64, 8
    else:
        odtype, osize = np.int32, 4
    offsets = np.frombuffer(
        payloads.buffers()[1], dtype=odtype, count=n + 1,
        offset=payloads.offset * osize,
    ).astype(np.int64)
    values = np.frombuffer(payloads.buffers()[2], dtype=np.uint8)[
        : offsets[-1]
    ]  # trim so reduceat's final segment ends at the last cell

    # features: FEATURE_DIM equal-ish chunk means per payload, one
    # reduceat over the flat buffer (np.array_split boundary math:
    # the first L % D chunks get one extra byte)
    D = FEATURE_DIM
    j = np.arange(D)
    div, rem = lens // D, lens % D
    chunk_len = div[:, None] + (j[None, :] < rem[:, None])
    bounds = offsets[:-1, None] + np.concatenate(
        (np.zeros((n, 1), np.int64), np.cumsum(chunk_len, axis=1)[:, :-1]), axis=1
    )
    flat_bounds = bounds.reshape(-1)
    if len(values):
        sums = np.add.reduceat(
            values.astype(np.float64), np.minimum(flat_bounds, len(values) - 1)
        ).reshape(n, D)
    else:
        sums = np.zeros((n, D))
    cl = chunk_len.astype(np.float64)
    feats = np.where(cl > 0, sums / np.maximum(cl, 1), 0.0).astype(np.float32)
    feats[lens == 0] = 0.0

    mv = memoryview(values)
    crcs = np.fromiter(
        (zlib.crc32(mv[offsets[i] : offsets[i + 1]]) for i in range(n)),
        np.int64,
        n,
    )
    return lens, crcs, feats


class MediaDecode:
    """Actor-pool map_batches stage for binary media columns.

    A real deployment passes ``decoder=`` (called once per batch with a
    list of bytes); model/codec setup belongs in ``__init__`` (once per
    actor). Use a SMALL batch_size (payloads are large): batch_size x
    concurrency x payload must fit the worker heap.
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id",
                 decoder=None):
        self.payload_col, self.id_col = payload_col, id_col
        if decoder == "stub" or decoder is None:
            self.decoder = None  # deterministic fake (no media libs here)
        else:  # pragma: no cover - real decoders unavailable in this env
            raise NotImplementedError(
                "real media decoders (PIL/ffmpeg) are not available in this "
                "environment; pass decoder=None for the deterministic stub"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        lens, crcs, feats = _fake_decode(payloads)
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "n_bytes": pa.array(lens),
                "payload_crc": pa.array(crcs),
                "feature": pa.array(
                    [row.tolist() for row in feats], pa.list_(pa.float32(), FEATURE_DIM)
                ),
            }
        )


def decode_media(
    ds: ray.data.Dataset,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    *,
    batch_size: int = 64,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    return ds.map_batches(
        MediaDecode,
        fn_constructor_kwargs=dict(payload_col=payload_col, id_col=id_col),
        batch_format="pyarrow",
        batch_size=batch_size,  # small on purpose: payloads are wide
        concurrency=concurrency,
    )


class MediaResize:
    """Actor-pool resize stage. The image codec is STUBBED (no PIL in
    this env): the fake 'resize' deterministically downsamples the raw
    byte stream to ``target_w * target_h`` bytes via strided selection —
    the schema, payload-shrinking behavior, actor signature and
    small-batch sizing are the real plumbing a PIL decoder slots into
    (``resizer=`` in __init__, once per actor)."""

    def __init__(self, target_w: int, target_h: int,
                 payload_col: str = "payload", id_col: str = "doc_id",
                 resizer=None):
        if resizer is not None:  # pragma: no cover
            raise NotImplementedError(
                "real image codecs (PIL) are not available in this "
                "environment; the deterministic stub is the default"
            )
        self.n_out = target_w * target_h
        self.target_w, self.target_h = target_w, target_h
        self.payload_col, self.id_col = payload_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        payloads = batch[self.payload_col]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        lens = pc.binary_length(payloads).fill_null(0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        odt = np.int64 if pa.types.is_large_binary(payloads.type) else np.int32
        osz = 8 if odt is np.int64 else 4
        offsets = np.frombuffer(
            payloads.buffers()[1], dtype=odt, count=len(payloads) + 1,
            offset=payloads.offset * osz,
        ).astype(np.int64)
        values = np.frombuffer(payloads.buffers()[2], dtype=np.uint8)
        # strided byte selection per payload (offset arithmetic per row,
        # one vectorized gather for the bytes)
        n = len(lens)
        out_lens = np.minimum(lens, self.n_out)
        dst = np.concatenate(([0], np.cumsum(out_lens)))
        sel = np.empty(int(out_lens.sum()), np.int64)
        for i in range(n):
            m = int(out_lens[i])
            if m == 0:
                continue
            sel[dst[i] : dst[i] + m] = offsets[i] + (
                np.arange(m, dtype=np.int64) * lens[i] // m
            )
        resized = values[sel]
        cells = pa.Array.from_buffers(
            pa.binary(), n,
            [None,
             pa.py_buffer(np.concatenate(([0], np.cumsum(out_lens))).astype(np.int32).tobytes()),
             pa.py_buffer(resized.tobytes())],
        )
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "payload": cells,
                "width": pa.array(np.full(n, self.target_w, np.int32)),
                "height": pa.array(np.full(n, self.target_h, np.int32)),
            }
        )


class FrameSample:
    """Video frame-sampling stage: each input payload EXPANDS to
    ``n_frames`` rows (frame_idx, frame payload) — the one-row-to-many
    flat_map shape a real ffmpeg sampler needs. The frame extraction is
    a stub (equal byte slices of the payload); the row-expansion
    plumbing, schema and per-frame ids are real."""

    def __init__(self, n_frames: int = 4, payload_col: str = "payload",
                 id_col: str = "doc_id", sampler=None):
        if sampler is not None:  # pragma: no cover
            raise NotImplementedError(
                "real video codecs (ffmpeg) are not available in this "
                "environment; the deterministic stub is the default"
            )
        self.n_frames = n_frames
        self.payload_col, self.id_col = payload_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Whole-batch frame slicing off the Arrow binary buffers:
        per-frame (start, end) spans from offset arithmetic, ONE gather
        for the bytes, output cells built directly from buffers — no
        per-row ``.as_py()`` materialization."""
        import pyarrow.compute as pc

        pcol = batch[self.payload_col]
        if isinstance(pcol, pa.ChunkedArray):
            pcol = pcol.combine_chunks()
        n = len(pcol)
        F = self.n_frames
        lens = pc.binary_length(pcol).fill_null(0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        odt = np.int64 if pa.types.is_large_binary(pcol.type) else np.int32
        osz = 8 if odt is np.int64 else 4
        if n:
            offsets = np.frombuffer(
                pcol.buffers()[1], dtype=odt, count=n + 1,
                offset=pcol.offset * osz,
            ).astype(np.int64)
            values = np.frombuffer(pcol.buffers()[2], dtype=np.uint8)
        else:
            offsets = np.zeros(1, np.int64)
            values = np.empty(0, np.uint8)

        # frame j of payload i spans [j*step_i, (j+1)*step_i) clamped to
        # len_i, step_i = max(1, len_i // F) — same slices the scalar
        # form `b[j*step:(j+1)*step]` yields
        step = np.maximum(lens // F, 1)  # (n,)
        j = np.arange(F, dtype=np.int64)  # (F,)
        starts = np.minimum(j[None, :] * step[:, None], lens[:, None])
        ends = np.minimum(starts + step[:, None], lens[:, None])
        flat_starts = (offsets[:-1, None] + starts).ravel()
        flat_lens = (ends - starts).ravel()
        total = int(flat_lens.sum())
        dst = np.concatenate(([0], np.cumsum(flat_lens)))
        idx = np.repeat(flat_starts, flat_lens) + (
            np.arange(total, dtype=np.int64) - np.repeat(dst[:-1], flat_lens)
        )
        frame_cells = pa.Array.from_buffers(
            pa.binary(), n * F,
            [None,
             pa.py_buffer(dst.astype(np.int32).tobytes()),
             pa.py_buffer(values[idx].tobytes())],
        )
        dids = batch[self.id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(dids, F), pa.int64()),
                "frame_idx": pa.array(np.tile(j, n).astype(np.int32)),
                "frame": frame_cells,
            }
        )


def resize_media(ds, target_w: int, target_h: int, **kw) -> ray.data.Dataset:
    return ds.map_batches(
        MediaResize,
        fn_constructor_kwargs=dict(target_w=target_w, target_h=target_h, **kw),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 8),
    )


def sample_frames(ds, n_frames: int = 4, **kw) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs=dict(n_frames=n_frames, **kw),
        batch_format="pyarrow",
        batch_size=16,  # row expansion: keep output blocks bounded
        concurrency=(1, 8),
    )


# ----------------------------------------------------- media dedup
#
# Exact: content-digest groupby over the BINARY payload column — the
# media twin of ops.dedup.exact_dedup (text never re-encoded; only
# 16-byte digests + ids cross the exchange). Near: sign-hash buckets
# over the decoded feature vector (the perceptual-hash shape: with a
# real decoder the feature is the image/audio embedding; here it is
# the documented deterministic fake), cosine-verified within buckets.


class _MediaDigest:
    """(digest, doc_id, n_bytes) per payload. blake2b-128 over
    memoryview slices of the shared Arrow buffer (per-row C calls, no
    .as_py() copies) — the same cost class as any real media hash."""

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id"):
        self.payload_col, self.id_col = payload_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        payloads = batch[self.payload_col]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        if pa.types.is_large_binary(payloads.type):
            odtype, osize = np.int64, 8
        else:
            odtype, osize = np.int32, 4
        n = len(payloads)
        offsets = np.frombuffer(
            payloads.buffers()[1], dtype=odtype, count=n + 1,
            offset=payloads.offset * osize,
        ).astype(np.int64)
        values = memoryview(payloads.buffers()[2])
        digs = [
            hashlib.blake2b(
                values[offsets[i]:offsets[i + 1]], digest_size=16
            ).digest()
            for i in range(n)
        ]
        lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
        return pa.table(
            {
                "digest": pa.array(digs, pa.binary(16)),
                "doc_id": batch[self.id_col],
                "n_bytes": pa.array(lens),
            }
        )


def media_dedup_exact(
    ds: ray.data.Dataset,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Exact byte-identical media dedup: one digest pass, one hash
    AGGREGATE over 16-byte digests (keeper = min doc_id; n_bytes is
    identical within a digest group so Min is exact). Returns one row
    per distinct payload: (doc_id, dup_count, n_bytes). Pure
    map-side-combining aggregation — no per-digest Python call."""
    from ray.data.aggregate import Count, Min

    digs = ds.map_batches(
        _MediaDigest,
        fn_constructor_kwargs=dict(payload_col=payload_col, id_col=id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    agg = digs.groupby("digest").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Count(alias_name="dup_count"),
        Min("n_bytes", alias_name="n_bytes"),
    )

    def drop_key(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "dup_count": t["dup_count"].cast(pa.int64()),
                "n_bytes": t["n_bytes"].cast(pa.int64()),
            }
        )

    return agg.map_batches(drop_key, batch_format="pyarrow")


def media_near_dups(
    ds: ray.data.Dataset,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    *,
    threshold: float = 0.98,
) -> "pa.Table":
    """Perceptual near-dup pairs: decode features (actor pool), bucket
    by the sign pattern of the feature vector (2^FEATURE_DIM buckets —
    near-identical media agree on every sign with high probability),
    exact-cosine verify within buckets. Returns (a, b, sim) pairs,
    a < b, sim >= threshold."""
    from fdblucene_ray.ops.similarity import _BucketPairs

    decoded = decode_media(ds, payload_col, id_col)

    def bucketize(batch: pa.Table) -> pa.Table:
        feats = batch["feature"]
        if isinstance(feats, pa.ChunkedArray):
            feats = feats.combine_chunks()
        m = np.asarray(feats.flatten().to_numpy(zero_copy_only=False),
                       np.float64).reshape(-1, FEATURE_DIM)
        centered = m - m.mean(axis=1, keepdims=True)
        weights = 1 << np.arange(FEATURE_DIM, dtype=np.int64)
        bucket = ((centered > 0).astype(np.int64) @ weights).astype(np.int32)
        return pa.table(
            {
                "vec_id": batch["doc_id"],
                "embedding": feats,
                "bucket": pa.array(bucket),
            }
        )

    bucketed = decoded.map_batches(
        bucketize, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = bucketed.groupby("bucket").map_groups(
        _BucketPairs(threshold, "embedding", "vec_id"),
        batch_format="pyarrow",
    )
    df = pairs.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)
