"""Audio column ops with a REAL codec: WAV/PCM16 is a pure-bytes
format (RIFF chunk walk + int16 frombuffer), so unlike the guarded
image/video decoders that need external libs, the audio path decodes
actual bytes end-to-end in this container.

- ``synth_wav_batch`` — deterministic per-doc test signals (pure sine,
  frequency/amplitude derived from doc_id, integer cycles so spectral
  ground truth is exact), encoded as real RIFF/WAVE/PCM16 files.
- ``decode_wav`` — spec-compliant chunk walker (tolerates extra
  chunks, validates fmt), returns (sample_rate, channels, int16 array).
- ``audio_features`` — map_batches stage: RMS, zero-crossing count,
  FFT peak frequency, spectral centroid per payload. DSP is numpy
  (rfft over the batch's equal-length signals is ONE vectorized call).
- ``audio_fingerprints`` — 64-bit scale-invariant spectral sign
  fingerprint (magnitude vs per-doc median), feeding the shared
  simhash band machinery for near-duplicate pairs (same shape as
  image aHash near-dup).

Scale shape: payloads never shuffle — decode/feature stages are
map-only; only 8-byte fingerprints enter the banded exchange.

Reference tie-in: the multimodal-columns family of the round brief;
storage-wise a payload is an opaque binary stored field (S16).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray.data

from fdblucene_ray.ops.hashing import round_half_away

SR = 8192
N_SAMPLES = 1024  # 2^10 -> FFT bins are exact multiples of SR/N = 8 Hz


def synth_wav(doc_id: int, *, sr: int = SR, n: int = N_SAMPLES) -> bytes:
    """One deterministic PCM16 mono WAV: a pure sine at
    ``8 * (16 + doc_id % 32)`` Hz (an integer number of cycles in
    ``n`` samples) with amplitude ``0.3 + (doc_id % 5) * 0.1``.
    Quantization uses round-half-away so a SQL oracle's round()
    reproduces the int16 stream bit-exactly."""
    k = 16 + (doc_id % 32)
    amp = 0.3 + (doc_id % 5) * 0.1
    t = np.arange(n, dtype=np.float64)
    x = amp * 32767.0 * np.sin((2.0 * np.pi * k) * t / n)
    pcm = round_half_away(x, 0).astype(np.int16)
    data = pcm.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def synth_wav_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    idn = ids.to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(idn),
            "payload": pa.array(
                [synth_wav(int(d)) for d in idn], pa.binary()
            ),
        }
    )


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, n_channels, int16 samples) from a RIFF/WAVE/PCM16
    payload — a real chunk walk: fmt must precede data, unknown chunks
    skip by their declared size (word-aligned), truncation is loud."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sr = nch = bits = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, nch, sr, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV: fmt={fmt} bits={bits}")
        elif cid == b"data":
            if sr is None:
                raise ValueError("data chunk before fmt")
            if len(body) < size:
                raise ValueError("truncated data chunk")
            samples = np.frombuffer(body, "<i2")
            return int(sr), int(nch), samples
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk")


class AudioFeatures:
    """map_batches stage: decode WAV payloads and emit per-doc DSP
    features. Signals of one batch share a length here (the synth
    fixture), so the FFT is ONE vectorized rfft over the stacked
    matrix; variable-length corpora fall back to per-row transforms
    with identical outputs."""

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id"):
        self.payload_col, self.id_col = payload_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        pay = batch[self.payload_col]
        if isinstance(pay, pa.ChunkedArray):
            pay = pay.combine_chunks()
        decoded = []
        for p in pay:
            sr, nch, pcm = decode_wav(p.as_py())
            if nch > 1:
                # downmix interleaved channels to mono (mean) so the
                # DSP sees one coherent signal, not channel zigzag
                usable = (len(pcm) // nch) * nch
                pcm = (
                    pcm[:usable]
                    .reshape(-1, nch)
                    .mean(axis=1)
                    .astype(np.float64)
                )
            decoded.append((sr, nch, pcm))
        n = len(decoded)
        srs = np.array([d[0] for d in decoded], np.int64)
        lens = np.array([len(d[2]) for d in decoded], np.int64)
        rms = np.empty(n)
        zcr = np.empty(n, np.int64)
        peak = np.empty(n, np.int64)
        centroid = np.empty(n)
        if n and (lens == lens[0]).all():
            X = np.stack([d[2] for d in decoded]).astype(np.float64) / 32768.0
            rms[:] = np.sqrt((X * X).mean(axis=1))
            s = np.sign(X)
            zcr[:] = ((s[:, 1:] * s[:, :-1]) < 0).sum(axis=1)
            mag = np.abs(np.fft.rfft(X, axis=1))
            mag[:, 0] = 0.0  # DC is not a pitch
            bins = np.argmax(mag, axis=1)
            peak[:] = bins * srs // lens
            freqs = np.arange(mag.shape[1], dtype=np.float64)
            denom = mag.sum(axis=1)
            denom[denom == 0] = 1.0
            centroid[:] = (mag * freqs).sum(axis=1) / denom * (
                srs / lens
            )
        else:
            for i, (sr, _, pcm) in enumerate(decoded):
                x = pcm.astype(np.float64) / 32768.0
                rms[i] = np.sqrt((x * x).mean()) if len(x) else 0.0
                sgn = np.sign(x)
                zcr[i] = int(((sgn[1:] * sgn[:-1]) < 0).sum())
                mag = np.abs(np.fft.rfft(x)) if len(x) else np.zeros(1)
                mag[0] = 0.0
                b = int(np.argmax(mag))
                peak[i] = b * sr // max(len(x), 1)
                fr = np.arange(len(mag), dtype=np.float64)
                dn = mag.sum() or 1.0
                centroid[i] = float(
                    (mag * fr).sum() / dn * (sr / max(len(x), 1))
                )
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "sr": pa.array(srs),
                "n_samples": pa.array(lens),
                "rms": pa.array(round_half_away(rms, 4)),
                "zcr": pa.array(zcr),
                "peak_freq_hz": pa.array(peak),
                "centroid_hz": pa.array(round_half_away(centroid, 2)),
            }
        )


def audio_features(
    ds: ray.data.Dataset, payload_col: str = "payload",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    return ds.map_batches(
        AudioFeatures(payload_col, id_col), batch_format="pyarrow"
    )


class AudioFingerprint:
    """64-bit scale-invariant spectral fingerprint: a bit per non-DC
    FFT bin (first 64) set where the magnitude exceeds HALF THE PEAK —
    amplitude scaling cancels (ratio to the peak), the noise floor
    stays below the threshold, so re-levelled copies of a signal
    collide and different pitches do not."""

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id"):
        self.payload_col, self.id_col = payload_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        pay = batch[self.payload_col]
        if isinstance(pay, pa.ChunkedArray):
            pay = pay.combine_chunks()
        out = np.empty(len(pay), np.uint64)
        for i, p in enumerate(pay):
            _, nch, pcm = decode_wav(p.as_py())
            if nch > 1:
                usable = (len(pcm) // nch) * nch
                pcm = pcm[:usable].reshape(-1, nch).mean(axis=1)
            mag = np.abs(np.fft.rfft(pcm.astype(np.float64)))[1:65]
            if len(mag) < 64:
                mag = np.pad(mag, (0, 64 - len(mag)))
            peak = mag.max() or 1.0
            bits = (mag > 0.5 * peak).astype(np.uint64)
            out[i] = np.bitwise_or.reduce(
                bits << np.arange(64, dtype=np.uint64)
            )
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "simhash": pa.array(out.view(np.int64)),
            }
        )


def audio_near_dup_pairs(
    ds: ray.data.Dataset,
    *,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 4,
) -> pa.Table:
    """Near-duplicate audio pairs: spectral fingerprints through the
    SAME banded simhash machinery image aHash uses — only 8-byte
    fingerprints shuffle; verification is vectorized popcount."""
    from fdblucene_ray.ops.dedup import simhash_near_pairs_from_fingerprints

    fp = ds.map_batches(
        AudioFingerprint(payload_col, id_col), batch_format="pyarrow"
    )
    return simhash_near_pairs_from_fingerprints(fp, max_hamming=max_hamming)
