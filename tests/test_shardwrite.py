"""Resumable shard-level transform + write (pipelines/shardwrite.py):
finished shards are skipped without re-reading input; edited input
invalidates only its own shard; output appears atomically."""

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.pipelines.shardwrite import (
    read_sharded,
    shard_out_dir,
    transform_sharded,
)


def _write_shard(path, ids):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([f"doc {i}" for i in ids]),
            }
        ),
        path,
    )


@pytest.fixture()
def shards(tmp_path, ray_session):
    paths = []
    for s in range(3):
        p = str(tmp_path / f"in-{s}.parquet")
        _write_shard(p, range(s * 10, s * 10 + 10))
        paths.append(p)
    return paths, str(tmp_path / "out")


def _upper(ds):
    return ds.map_batches(
        lambda b: b.set_column(
            1, "text", pc.utf8_upper(b["text"])
        ),
        batch_format="pyarrow",
    )


class TestTransformSharded:
    def test_writes_then_skips(self, shards):
        paths, out = shards
        r1 = transform_sharded(paths, out, _upper)
        assert r1["written"] == [0, 1, 2] and r1["rows"] == 30
        r2 = transform_sharded(paths, out, _upper)
        assert r2["skipped"] == [0, 1, 2] and r2["written"] == []
        assert r2["rows"] == 30
        got = read_sharded(out).take_all()
        assert len(got) == 30
        assert all(r["text"].isupper() for r in got)

    def test_edited_input_invalidates_one_shard(self, shards):
        paths, out = shards
        transform_sharded(paths, out, _upper)
        os.utime(paths[1])  # mtime bump = new signature, same size
        r = transform_sharded(paths, out, _upper)
        assert r["written"] == [1] and r["skipped"] == [0, 2]

    def test_half_written_shard_not_visible(self, shards):
        paths, out = shards
        transform_sharded(paths[:2], out, _upper)
        # simulate a crash: shard dir exists but no marker
        sdir = shard_out_dir(out, 1)
        os.remove(os.path.join(sdir, "_DONE.json"))
        assert read_sharded(out).count() == 10  # only shard 0 visible
        r = transform_sharded(paths[:2], out, _upper)
        assert r["written"] == [1]
        assert read_sharded(out).count() == 20

    def test_marker_records_signature_and_rows(self, shards):
        paths, out = shards
        transform_sharded(paths[:1], out, _upper)
        with open(os.path.join(shard_out_dir(out, 0), "_DONE.json")) as fh:
            rec = json.load(fh)
        assert rec["rows"] == 10 and rec["shard"] == 0
        assert isinstance(rec["signature"], str) and rec["signature"]
