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
    (byte_length, crc32, FEATURE_DIM float32 feature from byte stats)."""
    lens = np.empty(len(payloads), np.int64)
    crcs = np.empty(len(payloads), np.int64)
    feats = np.empty((len(payloads), FEATURE_DIM), np.float32)
    for i, v in enumerate(payloads):
        b = v.as_py() or b""
        lens[i] = len(b)
        crcs[i] = zlib.crc32(b)
        arr = np.frombuffer(b, np.uint8)
        if len(arr) == 0:
            feats[i] = 0.0
        else:
            chunks = np.array_split(arr.astype(np.float32), FEATURE_DIM)
            feats[i] = [c.mean() if len(c) else 0.0 for c in chunks]
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
