"""Resumable partitioned corpus export (fdblucene_ray/ops/export.py):
shard planning, atomic publish, skip-finished resume, round-trip."""

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fdblucene_ray.ops.export import (
    _plan_shards,
    export_corpus,
    read_exported,
)


def _write_corpus(tmp_path, n_files=3, rows_per=70, row_group=25):
    paths = []
    base = 0
    for i in range(n_files):
        p = str(tmp_path / f"in-{i}.parquet")
        ids = np.arange(base, base + rows_per, dtype=np.int64)
        pq.write_table(
            pa.table({"doc_id": ids,
                      "text": pa.array([f"doc {j} text" for j in ids])}),
            p, row_group_size=row_group,
        )
        paths.append(p)
        base += rows_per
    return paths


# transforms are built as CLOSURES so Ray cloudpickles them by value —
# module-level test functions pickle by reference and test modules are
# not importable inside Ray workers


def _make_identity():
    return lambda t: t


def _make_evens():
    import pyarrow.compute as pc

    return lambda t: t.filter(
        pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0)
    )


class TestPlan:
    def test_slices_cover_and_cross_files(self, tmp_path):
        paths = _write_corpus(tmp_path)  # 210 rows total
        shards = _plan_shards(paths, 100)
        assert [s["shard"] for s in shards] == [0, 1, 2]
        total = sum(
            p["hi"] - p["lo"] for s in shards for p in s["parts"]
        )
        assert total == 210
        # shard 0 covers file0 (70) + 30 of file1
        assert len(shards[0]["parts"]) == 2
        assert shards[0]["parts"][1]["hi"] == 30

    def test_exact_multiple(self, tmp_path):
        paths = _write_corpus(tmp_path, n_files=1, rows_per=100)
        shards = _plan_shards(paths, 50)
        assert len(shards) == 2


class TestExport:
    def test_roundtrip_and_manifest(self, ray_session, tmp_path):
        paths = _write_corpus(tmp_path)
        out = str(tmp_path / "out")
        man = export_corpus(paths, out, _make_evens(), shard_rows=100).to_pandas()
        assert man["shard"].tolist() == [0, 1, 2]
        assert man["n_in"].tolist() == [100, 100, 10]
        assert man["n_out"].sum() == 105
        assert not man["resumed"].any()
        got = read_exported(out).to_pandas().sort_values("doc_id")
        assert got["doc_id"].tolist() == [i for i in range(210) if i % 2 == 0]
        # every shard carries its atomic completion marker
        for i in range(3):
            assert os.path.exists(os.path.join(out, f"shard={i}", "_SUCCESS"))

    def test_resume_skips_finished_shards(self, ray_session, tmp_path):
        paths = _write_corpus(tmp_path)
        out = str(tmp_path / "out2")
        export_corpus(paths, out, _make_identity(), shard_rows=100)
        # tamper-proof check: delete shard 1, poison shard 0's data to
        # prove finished shards are not re-read or re-written
        import shutil

        shutil.rmtree(os.path.join(out, "shard=1"))
        probe = os.path.join(out, "shard=0", "probe")
        open(probe, "w").write("x")
        man = export_corpus(
            paths, out, _make_identity(), shard_rows=100
        ).to_pandas()
        assert man["resumed"].tolist() == [True, False, True]
        assert os.path.exists(probe)  # shard 0 untouched
        assert os.path.exists(os.path.join(out, "shard=1", "_SUCCESS"))
        # manifest counts identical to a fresh run
        assert man["n_in"].tolist() == [100, 100, 10]
        got = read_exported(out).to_pandas()
        assert len(got) == 210

    def test_columns_pruned_at_read(self, ray_session, tmp_path):
        paths = _write_corpus(tmp_path, n_files=1, rows_per=40)
        extra = pq.read_table(paths[0]).append_column(
            "heavy", pa.array([b"x" * 100] * 40, pa.binary())
        )
        pq.write_table(extra, paths[0])
        out = str(tmp_path / "out3")

        def check_cols(t: pa.Table) -> pa.Table:
            assert t.column_names == ["doc_id"]
            return t

        man = export_corpus(
            paths, out, check_cols, shard_rows=100, columns=["doc_id"]
        ).to_pandas()
        assert man["n_out"].tolist() == [40]
