"""Multimodal binary-payload plumbing: the decode stage is a documented
stub (no media libs in this env) but must be batch-wise (buffer math,
no per-row .as_py()) and byte-exact deterministic."""

import zlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fdblucene_ray.ops.multimodal import FEATURE_DIM, MediaDecode, _fake_decode, decode_media


def _ref_decode(blobs):
    """Row-wise reference implementation (the original loop semantics)."""
    lens, crcs, feats = [], [], []
    for b in blobs:
        lens.append(len(b))
        crcs.append(zlib.crc32(b))
        arr = np.frombuffer(b, np.uint8)
        if len(arr) == 0:
            feats.append([0.0] * FEATURE_DIM)
        else:
            chunks = np.array_split(arr.astype(np.float32), FEATURE_DIM)
            feats.append([float(c.mean()) if len(c) else 0.0 for c in chunks])
    return lens, crcs, feats


class TestFakeDecode:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_rowwise_reference(self, seed):
        rng = np.random.default_rng(seed)
        blobs = [
            rng.integers(0, 256, size=int(n), dtype=np.uint8).tobytes()
            for n in rng.integers(0, 300, size=40)
        ] + [b"", b"x", b"ab"]
        arr = pa.array(blobs, pa.binary())
        lens, crcs, feats = _fake_decode(arr)
        rl, rc, rf = _ref_decode(blobs)
        assert lens.tolist() == rl
        assert crcs.tolist() == rc
        np.testing.assert_allclose(feats, np.array(rf, np.float32), rtol=1e-5)

    def test_sliced_array(self):
        """Buffer math must respect the array offset of a slice."""
        blobs = [b"abcdef", b"0123456789", b"zz", b"qqqq"]
        arr = pa.array(blobs, pa.binary())
        sl = arr.slice(1, 2)
        lens, crcs, _ = _fake_decode(sl)
        assert lens.tolist() == [10, 2]
        assert crcs.tolist() == [zlib.crc32(b"0123456789"), zlib.crc32(b"zz")]


class TestDecodePipeline:
    def test_actor_pool_stage(self, ray_session):
        blobs = [bytes([i] * (i + 1)) for i in range(50)]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(50), pa.int64()),
                    "payload": pa.array(blobs, pa.binary()),
                }
            )
        )
        out = decode_media(ds, batch_size=8).to_pandas().sort_values("doc_id")
        assert out["n_bytes"].tolist() == [i + 1 for i in range(50)]
        assert out["payload_crc"].tolist() == [zlib.crc32(b) for b in blobs]
        assert all(len(f) == FEATURE_DIM for f in out["feature"])

    def test_real_decoder_guard(self):
        with pytest.raises(NotImplementedError, match="not available"):
            MediaDecode(decoder="pil")


class TestResizeAndFrames:
    def test_resize_shrinks_payloads(self, ray_session):
        from fdblucene_ray.ops.multimodal import resize_media

        blobs = [bytes(range(256)) * 4, b"tiny", bytes(100)]
        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(range(3), pa.int64()),
                      "payload": pa.array(blobs, pa.binary())})
        )
        out = resize_media(ds, 8, 8).to_pandas().sort_values("doc_id")
        assert out["width"].tolist() == [8, 8, 8]
        lens = [len(p) for p in out["payload"]]
        assert lens == [64, 4, 64]  # capped at input length
        # deterministic strided selection
        out2 = resize_media(ds, 8, 8).to_pandas().sort_values("doc_id")
        assert list(out["payload"]) == list(out2["payload"])

    def test_frame_sample_expands_rows(self, ray_session):
        from fdblucene_ray.ops.multimodal import sample_frames

        blobs = [bytes(range(64)), bytes(range(32))]
        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([7, 9], pa.int64()),
                      "payload": pa.array(blobs, pa.binary())})
        )
        out = sample_frames(ds, n_frames=4).to_pandas()
        assert len(out) == 8  # 2 docs x 4 frames
        d7 = out[out.doc_id == 7].sort_values("frame_idx")
        assert d7["frame_idx"].tolist() == [0, 1, 2, 3]
        assert list(d7["frame"])[0] == bytes(range(16))

    def test_real_codec_guards(self):
        from fdblucene_ray.ops.multimodal import FrameSample, MediaResize

        with pytest.raises(NotImplementedError):
            MediaResize(8, 8, resizer="pil")
        with pytest.raises(NotImplementedError):
            FrameSample(sampler="ffmpeg")


class TestMediaDedup:
    def test_exact_digest_groupby(self, ray_session):
        import numpy as np

        from fdblucene_ray.ops.multimodal import media_dedup_exact

        rng = np.random.default_rng(3)
        blobs = [rng.bytes(200 + i) for i in range(20)]
        blobs += [blobs[2], blobs[2], blobs[7]]  # exact dups -> 22,21? keep order
        t = pa.table(
            {
                "doc_id": pa.array(range(len(blobs)), pa.int64()),
                "payload": pa.array(blobs, pa.binary()),
            }
        )
        out = (
            media_dedup_exact(ray.data.from_arrow(t))
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert len(out) == 20  # 3 dup rows collapse onto keepers
        assert out[out.doc_id == 2]["dup_count"].iloc[0] == 3
        assert out[out.doc_id == 7]["dup_count"].iloc[0] == 2
        assert set(out["doc_id"]) == set(range(20))
        assert (out[out.doc_id == 2]["n_bytes"] == 202).all()

    def test_near_dups_via_feature_buckets(self, ray_session):
        import numpy as np

        from fdblucene_ray.ops.multimodal import media_near_dups

        rng = np.random.default_rng(5)
        blobs = [rng.bytes(400) for _ in range(15)]
        # near dup: same payload with ONE byte changed — fake-decode
        # features (chunk means) barely move, cosine stays ~1
        near = bytearray(blobs[4])
        near[10] ^= 0x01
        blobs.append(bytes(near))  # id 15 ~ id 4
        t = pa.table(
            {
                "doc_id": pa.array(range(len(blobs)), pa.int64()),
                "payload": pa.array(blobs, pa.binary()),
            }
        )
        pairs = media_near_dups(
            ray.data.from_arrow(t), threshold=0.999
        ).to_pandas()
        got = set(zip(pairs["a"], pairs["b"]))
        assert (4, 15) in got
