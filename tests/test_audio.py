"""Real WAV/PCM16 codec + DSP features (ops/audio.py): decode
round-trip, chunk-walker robustness, closed-form feature oracles on
pure sines, and planted near-duplicate ground truth."""

import struct

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fdblucene_ray.ops.audio import (
    N_SAMPLES,
    SR,
    AudioFeatures,
    AudioFingerprint,
    audio_near_dup_pairs,
    decode_wav,
    synth_wav,
    synth_wav_batch,
)


class TestCodec:
    def test_roundtrip(self):
        sr, nch, pcm = decode_wav(synth_wav(7))
        assert (sr, nch, len(pcm)) == (SR, 1, N_SAMPLES)
        k, amp = 16 + 7 % 32, 0.3 + (7 % 5) * 0.1
        t = np.arange(N_SAMPLES)
        expect = amp * 32767 * np.sin((2 * np.pi * k) * t / N_SAMPLES)
        assert np.abs(pcm - expect).max() <= 0.5 + 1e-9

    def test_extra_chunk_skipped(self):
        raw = synth_wav(0)
        # splice an unknown word-aligned chunk between fmt and data
        fmt_end = 12 + 8 + 16
        extra = b"LIST" + struct.pack("<I", 6) + b"junk12"
        patched = (
            raw[:4]
            + struct.pack("<I", len(raw) - 8 + len(extra))
            + raw[8:fmt_end]
            + extra
            + raw[fmt_end:]
        )
        sr, _, pcm = decode_wav(patched)
        assert sr == SR and np.array_equal(pcm, decode_wav(raw)[2])

    def test_bad_payloads_loud(self):
        with pytest.raises(ValueError):
            decode_wav(b"not a wav at all")
        raw = synth_wav(0)
        with pytest.raises(ValueError):
            decode_wav(raw[: len(raw) // 2])  # truncated data
        # 8-bit fmt rejected
        bad = bytearray(raw)
        bad[12 + 8 + 14 : 12 + 8 + 16] = struct.pack("<H", 8)
        with pytest.raises(ValueError):
            decode_wav(bytes(bad))


class TestFeatures:
    def _features(self, ids):
        t = pa.table({"doc_id": pa.array(ids, pa.int64())})
        ds = ray.data.from_arrow(t).map_batches(
            synth_wav_batch, batch_format="pyarrow"
        )
        return {
            r["doc_id"]: r
            for r in ds.map_batches(
                AudioFeatures(), batch_format="pyarrow"
            ).take_all()
        }

    def test_closed_form_oracles(self, ray_session):
        feats = self._features([0, 3, 17, 40])
        for d, r in feats.items():
            k = 16 + d % 32
            amp = 0.3 + (d % 5) * 0.1
            # RMS of an integer-cycle sine = amp / sqrt(2), up to int16
            # quantization (|err| <= 0.5/32768 per sample)
            assert r["rms"] == pytest.approx(amp / np.sqrt(2), abs=2e-4)
            # a k-cycle sine crosses zero 2k times, but a crossing that
            # lands EXACTLY on a sample (t = m*1024/(2k) integer) gives
            # a 0 sign product, not a negative one — gcd(2k, 1024) of
            # the 2k crossings land on integer samples, so the exact
            # count is 2k - gcd(2k, 1024) (the SQL twin agrees)
            import math

            assert r["zcr"] == 2 * k - math.gcd(2 * k, 1024)
            assert r["peak_freq_hz"] == 8 * k
            assert r["centroid_hz"] == pytest.approx(8 * k, rel=0.02)

    def test_variable_length_path(self, ray_session):
        # concatenate two synth signals -> one longer payload; the
        # per-row fallback path must agree with the closed forms
        raw = decode_wav(synth_wav(1))[2]
        data = np.concatenate([raw, raw]).astype("<i2").tobytes()
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, SR, SR * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data))
        )
        short = synth_wav(1)
        t = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "payload": pa.array([hdr + data, short], pa.binary()),
            }
        )
        rows = {
            r["doc_id"]: r
            for r in ray.data.from_arrow(t)
            .map_batches(AudioFeatures(), batch_format="pyarrow")
            .take_all()
        }
        assert rows[0]["n_samples"] == 2 * N_SAMPLES
        assert rows[0]["peak_freq_hz"] == rows[1]["peak_freq_hz"]
        assert rows[0]["rms"] == pytest.approx(rows[1]["rms"], abs=1e-4)


class TestNearDup:
    def test_scale_invariance_and_planted_pairs(self, ray_session):
        # doc ids chosen so 0/32 share a frequency (amp differs),
        # 1 and 2 are other pitches
        t = pa.table({"doc_id": pa.array([0, 32, 1, 2], pa.int64())})
        ds = ray.data.from_arrow(t).map_batches(
            synth_wav_batch, batch_format="pyarrow"
        )
        fps = {
            r["doc_id"]: r["simhash"]
            for r in ds.map_batches(
                AudioFingerprint(), batch_format="pyarrow"
            ).take_all()
        }
        assert fps[0] == fps[32]  # same pitch, different volume
        assert fps[0] != fps[1] and fps[1] != fps[2]
        pairs = audio_near_dup_pairs(ds, max_hamming=0).to_pylist()
        assert [(p["a"], p["b"]) for p in pairs] == [(0, 32)]


def test_stereo_downmix(ray_session):
    """A stereo payload (both channels the mono signal) downmixes to
    the mono features exactly; n_samples reports frames, not
    interleaved samples."""
    mono = decode_wav(synth_wav(3))[2]
    inter = np.empty(2 * len(mono), "<i2")
    inter[0::2] = mono
    inter[1::2] = mono
    data = inter.tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, SR, SR * 4, 4, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array([hdr + data, synth_wav(3)], pa.binary()),
        }
    )
    rows = {
        r["doc_id"]: r
        for r in ray.data.from_arrow(t)
        .map_batches(AudioFeatures(), batch_format="pyarrow")
        .take_all()
    }
    st, mo = rows[0], rows[1]
    assert st["n_samples"] == mo["n_samples"] == N_SAMPLES
    for m in ("rms", "zcr", "peak_freq_hz", "centroid_hz"):
        assert st[m] == mo[m], m
