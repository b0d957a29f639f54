"""CheckIndex analog (index/check.py): clean indexes verify ok at both
levels; planted corruptions (CRC flip, meta drift, posting tampering)
are detected and attributed."""

import os
from dataclasses import replace

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.check import _check_one, check_index
from fdblucene_ray.index.manifest import load_manifest

WORDS = ["merge", "scan", "stream", "join", "batch", "hash", "row",
         "window", "data", "spark"]


@pytest.fixture(scope="module")
def ix(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("chk")
    rng = np.random.default_rng(17)
    texts = [
        " ".join(rng.choice(WORDS, size=rng.integers(4, 20)))
        for _ in range(250)
    ]
    src = str(tmp / "c.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(250), pa.int64()),
                "text": pa.array(texts),
            }
        ),
        src,
    )
    path = str(tmp / "ix")
    build_index(
        src, path,
        fields={"text": {"column": "text", "analyzer": "simple",
                         "positions": True}},
        num_partitions=4,
    )
    return path


class TestCheckIndex:
    def test_clean_index_ok_full(self, ix):
        out = check_index(ix, level="full")
        assert out.num_rows >= 1
        assert set(out["status"].to_pylist()) == {"ok"}
        assert all(s == "" for s in out["issues"].to_pylist())
        # totals agree with the manifest
        m = load_manifest(ix)
        assert sum(out["n_postings"].to_pylist()) == sum(
            s.n_postings for s in m.segments
        )

    def test_clean_index_ok_fast(self, ix):
        out = check_index(ix, level="fast")
        assert set(out["status"].to_pylist()) == {"ok"}

    def test_crc_corruption_detected(self, ix):
        m = load_manifest(ix)
        seg = m.segments[0]
        p = os.path.join(ix, "segments", seg.name, "postings.bin")
        with open(p, "r+b") as fh:
            fh.seek(5)
            b = fh.read(1)
            fh.seek(5)
            fh.write(bytes([b[0] ^ 0xFF]))
        try:
            row = _check_one(ix, m, seg, "fast")
            assert row["status"] == "corrupt"
            assert "CRC" in row["issues"]
        finally:
            with open(p, "r+b") as fh:
                fh.seek(5)
                fh.write(b)
        # restored: clean again
        assert _check_one(ix, m, seg, "full")["status"] == "ok"

    def test_meta_drift_detected(self, ix):
        m = load_manifest(ix)
        seg = m.segments[0]
        bad = replace(seg, n_terms=seg.n_terms + 3)
        row = _check_one(ix, m, bad, "fast")
        assert row["status"] == "corrupt"
        assert "n_terms" in row["issues"]
        bad2 = replace(seg, n_postings=seg.n_postings + 1)
        row2 = _check_one(ix, m, bad2, "fast")
        assert "sum(df)" in row2["issues"]

    def test_envelope_violation_detected(self, ix):
        m = load_manifest(ix)
        seg = m.segments[0]
        bad = replace(seg, doc_id_max=0, doc_id_min=0)
        row = _check_one(ix, m, bad, "full")
        assert row["status"] == "corrupt"
        assert "envelope" in row["issues"]

    def test_empty_index_dir(self, tmp_path, ray_session):
        # manifest with zero segments: empty report, not an error
        from fdblucene_ray.index.manifest import Manifest, publish_manifest

        d = str(tmp_path / "empty_ix")
        os.makedirs(os.path.join(d, "segments"), exist_ok=True)
        publish_manifest(d, Manifest(analyzers={}, block_size=128))
        out = check_index(d)
        assert out.num_rows == 0


def test_sidecar_rows_reported(tmp_path, ray_session):
    """check_index validates the tombstone + dv sidecars the manifest
    references: present-and-sorted -> ok; a deleted generation file ->
    corrupt."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fdblucene_ray.index.build import build_index
    from fdblucene_ray.index.check import check_index
    from fdblucene_ray.index.delete import delete_docs
    from fdblucene_ray.index.docvalues import update_numeric_docvalues
    from fdblucene_ray.index.manifest import load_manifest

    t = pa.table({"doc_id": pa.array(range(20), pa.int64()),
                  "text": pa.array([f"data merge t{i}" for i in range(20)]),
                  "n_chars": pa.array([10 + i for i in range(20)], pa.int64())})
    src = str(tmp_path / "c.parquet")
    pq.write_table(t, src)
    ix = str(tmp_path / "ix")
    build_index(src, ix,
                fields={"text": {"column": "text", "analyzer": "simple"}},
                num_partitions=3, batch_size=8)
    delete_docs(ix, [4, 9])
    update_numeric_docvalues(ix, "n_chars", {1: 5.0, 6: 7.0})
    rep = check_index(ix, level="fast").to_pylist()
    by = {r["segment"]: r for r in rep}
    assert by["(tombstones)"]["status"] == "ok"
    assert by["(tombstones)"]["n_postings"] == 2
    assert by["(dv:n_chars)"]["status"] == "ok"
    assert by["(dv:n_chars)"]["n_postings"] == 2
    # a vanished generation file reports corrupt
    m = load_manifest(ix)
    os.remove(os.path.join(ix, "dv_updates",
                           m.extra["dv_files"]["n_chars"]))
    rep2 = check_index(ix, level="fast").to_pylist()
    by2 = {r["segment"]: r for r in rep2}
    assert by2["(dv:n_chars)"]["status"] == "corrupt"
