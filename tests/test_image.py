"""Real PPM decode path (ops/image.py) vs byte-level reference."""

import numpy as np
import pyarrow as pa
import ray.data

from fdblucene_ray.ops.image import (
    PpmDecode,
    average_hash,
    decode_images,
    decode_ppm,
    grid_features,
    resize_nn,
    synth_images_ds,
    synth_ppm,
)


def _ref_decode(payload: bytes):
    """Independent reference: regex header parse (the trailing \\s
    consumes exactly one whitespace before raw pixels), pixels with
    plain Python ints."""
    import re

    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload)
    assert m, "bad ppm header"
    w, h, mx = int(m.group(1)), int(m.group(2)), int(m.group(3))
    raw = payload[m.end(): m.end() + w * h * 3]
    px = [[[raw[(y * w + x) * 3 + c] for c in range(3)]
           for x in range(w)] for y in range(h)]
    return w, h, px


def test_decode_matches_reference():
    for did in [0, 7, 123, 4999]:
        pay = synth_ppm(did)
        img = decode_ppm(pay)
        w, h, px = _ref_decode(pay)
        assert img.shape == (h, w, 3)
        assert img.tolist() == px


def test_decode_rejects_malformed():
    import pytest

    with pytest.raises(ValueError):
        decode_ppm(b"P5\n2 2\n255\n" + b"\0" * 12)
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n4 4\n255\n" + b"\0" * 5)  # truncated pixels


def test_resize_and_ahash_properties():
    img = decode_ppm(synth_ppm(42))
    small = resize_nn(img, 8, 8)
    assert small.shape == (8, 8, 3)
    hsh = average_hash(img)
    assert 0 <= hsh < 2 ** 64
    # aHash is resolution-robust: the same image upscaled 2x hashes equal
    big = resize_nn(img, img.shape[1] * 2, img.shape[0] * 2)
    assert average_hash(big) == hsh


def test_grid_features_match_bruteforce():
    img = decode_ppm(synth_ppm(9))
    f = grid_features(img, grid=2).reshape(2, 2, 3)
    h, w = img.shape[:2]
    for i in range(2):
        for j in range(2):
            blk = img[i * h // 2:(i + 1) * h // 2,
                      j * w // 2:(j + 1) * w // 2].astype(np.float64)
            np.testing.assert_allclose(
                f[i, j], blk.mean(axis=(0, 1)), rtol=1e-6
            )


def test_actor_pool_pipeline_end_to_end():
    ids = pa.table({"doc_id": pa.array(range(40), pa.int64())})
    ds = synth_images_ds(ray.data.from_arrow(ids).repartition(3))
    out = decode_images(ds, batch_size=16).to_pandas().sort_values("doc_id")
    assert len(out) == 40
    ref = PpmDecode()(
        pa.table({"doc_id": pa.array([5], pa.int64()),
                  "payload": pa.array([synth_ppm(5)], pa.binary())})
    )
    row = out[out["doc_id"] == 5].iloc[0]
    assert row["ahash"] == ref["ahash"][0].as_py()
    assert row["w"] == ref["w"][0].as_py()
    assert abs(row["mean_px"] - ref["mean_px"][0].as_py()) < 1e-9


def test_image_near_dups_matches_bruteforce():
    from fdblucene_ray.ops.image import image_near_dups

    n = 120
    hashes = [average_hash(decode_ppm(synth_ppm(i))) for i in range(n)]
    expect = []
    for i in range(n):
        for j in range(i + 1, n):
            d = bin(hashes[i] ^ hashes[j]).count("1")
            if d <= 2:
                expect.append((i, j, d))
    ids = pa.table({"doc_id": pa.array(range(n), pa.int64())})
    ds = synth_images_ds(ray.data.from_arrow(ids).repartition(3))
    got = image_near_dups(ds, max_hamming=2)
    rows = sorted(zip(got["a"].to_pylist(), got["b"].to_pylist(),
                      got["hamming"].to_pylist()))
    # banding guarantees FULL recall for hamming <= 3 (pigeonhole on
    # 4x16-bit quarters), so this is exact equality, not recall >= x
    assert rows == sorted(expect)
