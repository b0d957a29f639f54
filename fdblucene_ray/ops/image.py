"""A REAL image codec for the multimodal path: PPM (P6) in pure numpy.

The container has no PIL/ffmpeg, so `ops/multimodal.py` stubs its
decoder. PPM "P6" (Netpbm — public, trivially simple: ASCII header
`P6\\n{w} {h}\\n{maxval}\\n` + raw RGB bytes) needs no codec library, so
this module provides an actual end-to-end image pipeline — decode →
nearest-neighbor resize → grid features → 64-bit average hash — with
the same actor-pool/batch shape a PIL/JPEG decoder slots into.

Per-image work (header parse, frombuffer reshape) is inherently
per-row — exactly like a real decoder — but every pixel operation is a
numpy kernel, and the stage runs as an actor-pool ``map_batches`` with
small batches (payloads are wide).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _splitmix(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x += _GOLD
    x ^= x >> np.uint64(30)
    x *= _M1
    x ^= x >> np.uint64(27)
    x *= _M2
    x ^= x >> np.uint64(31)
    return x


def synth_ppm(doc_id: int) -> bytes:
    """Deterministic P6 image for a doc id: size 16..40 px per side and
    a per-pixel pattern derived from splitmix64 — a pure function of
    the id, so tests and reruns are byte-identical."""
    h1 = int(_splitmix(np.array([doc_id], np.uint64))[0])
    w = 16 + (h1 & 0x0F)
    h = 16 + ((h1 >> 4) & 0x1F) % 25
    yy, xx = np.mgrid[0:h, 0:w]
    base = (doc_id * 37) & 0xFF
    r = (base + xx * 3 + yy * 7) % 256
    g = (base + xx * 5 + yy * 2) % 256
    b = (base + xx + yy * 11) % 256
    px = np.stack((r, g, b), axis=-1).astype(np.uint8)
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Parse one P6 payload -> (h, w, 3) uint8 array. Raises ValueError
    on malformed input (truncated pixels, wrong magic)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 ppm")
    # header = 3 whitespace-separated ASCII ints, then EXACTLY ONE
    # whitespace byte before the raw pixels (the classic PPM parsing
    # trap: a generic whitespace split would also eat pixel bytes that
    # happen to be 0x20/0x0A)
    pos = 2
    vals = []
    for _ in range(3):
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if start == pos:
            raise ValueError("truncated ppm header")
        vals.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    need = w * h * 3
    raw = payload[pos : pos + need]
    if len(raw) < need:
        raise ValueError("truncated ppm pixels")
    return np.frombuffer(raw, np.uint8).reshape(h, w, 3)


def resize_nn(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via index maps (pure numpy)."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return img[yi][:, xi]


def average_hash(img: np.ndarray) -> int:
    """64-bit aHash: 8x8 grayscale, bit = pixel > mean (classic
    perceptual hash; near-duplicate images differ in few bits)."""
    g = resize_nn(img, 8, 8).astype(np.float64).mean(axis=2)
    bits = (g > g.mean()).ravel()
    return int(np.packbits(bits).view(">u8")[0])


def grid_features(img: np.ndarray, grid: int = 4) -> np.ndarray:
    """(grid*grid*3,) float32 mean-pool features (the embedding stand-in
    a real vision model would produce)."""
    h, w = img.shape[:2]
    ys = (np.arange(grid + 1) * h) // grid
    xs = (np.arange(grid + 1) * w) // grid
    out = np.empty((grid, grid, 3), np.float64)
    c = np.cumsum(np.cumsum(img.astype(np.float64), axis=0), axis=1)
    cpad = np.zeros((h + 1, w + 1, 3))
    cpad[1:, 1:] = c
    for i in range(grid):
        for j in range(grid):
            y0, y1, x0, x1 = ys[i], ys[i + 1], xs[j], xs[j + 1]
            s = cpad[y1, x1] - cpad[y0, x1] - cpad[y1, x0] + cpad[y0, x0]
            out[i, j] = s / max(1, (y1 - y0) * (x1 - x0))
    return out.astype(np.float32).ravel()


class PpmDecode:
    """Actor-pool decode stage (the REAL-codec twin of
    multimodal.MediaDecode): per image -> (w, h, mean intensity, aHash,
    grid features). Per-row decode like any real codec; numpy pixels."""

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id",
                 grid: int = 4):
        self.payload_col, self.id_col, self.grid = payload_col, id_col, grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        ws, hs, means, hashes, feats = [], [], [], [], []
        for pay in payloads:
            img = decode_ppm(pay.as_py())
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            means.append(float(img.mean()))
            hashes.append(average_hash(img))
            feats.append(grid_features(img, self.grid))
        d = self.grid * self.grid * 3
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "mean_px": pa.array(np.round(np.array(means), 4)),
                "ahash": pa.array(np.array(hashes, np.uint64).view(np.int64)),
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32(), d)
                ),
            }
        )


def decode_images(
    ds: ray.data.Dataset,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    *,
    batch_size: int = 64,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    return ds.map_batches(
        PpmDecode,
        fn_constructor_kwargs=dict(payload_col=payload_col, id_col=id_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_images_ds(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    """Attach a deterministic PPM payload per row (test/bench input)."""

    def attach(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch[id_col],
                "payload": pa.array([synth_ppm(int(i)) for i in ids],
                                    pa.binary()),
            }
        )

    return ds.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)


def image_near_dups(
    ds: ray.data.Dataset,
    max_hamming: int = 6,
    *,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> pa.Table:
    """Perceptual near-duplicate images: decode -> 64-bit aHash ->
    the SAME 4-way band blocking + popcount verify as text simhash
    (ops/dedup.py machinery, fingerprint column renamed) — only the
    verified pair set reaches the driver. Returns (a, b, hamming)."""
    from fdblucene_ray.ops.dedup import simhash_near_pairs_from_fingerprints

    def fp(batch: pa.Table) -> pa.Table:
        payloads = batch[payload_col]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        hashes = np.array(
            [average_hash(decode_ppm(p.as_py())) for p in payloads],
            np.uint64,
        )
        return pa.table(
            {
                "doc_id": batch[id_col],
                "simhash": pa.array(hashes.view(np.int64)),
            }
        )

    fps = ds.map_batches(fp, batch_format="pyarrow")
    return simhash_near_pairs_from_fingerprints(fps, max_hamming)
