"""Commit points: retained manifests, point-in-time Searcher, GC that
respects snapshots (Lucene segments_N / IndexCommit / deletion-policy
analogs, FDBDirectory.java:351-365 commit primitive)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.delete import delete_docs, gc_tombstones
from fdblucene_ray.index.manifest import (
    drop_segments,
    gc_index,
    list_commits,
    load_manifest,
    prune_commits,
)
from fdblucene_ray.index.search import Searcher


@pytest.fixture()
def committed_ix(tmp_path, ray_session):
    texts = [f"common w{i % 7} filler{i}" for i in range(60)]
    t = pa.table(
        {"doc_id": pa.array(range(60), pa.int64()), "text": pa.array(texts)}
    )
    src = str(tmp_path / "c.parquet")
    pq.write_table(t, src)
    ix = str(tmp_path / "ix")
    build_index(src, ix,
                fields={"text": {"column": "text", "analyzer": "simple"}},
                num_partitions=3, batch_size=32)
    return ix


class TestCommitPoints:
    def test_point_in_time_reads(self, committed_ix):
        ix = committed_ix
        v0 = load_manifest(ix).version
        base = {d for d, _ in Searcher(ix).search("common", k=100)}
        assert len(base) == 60

        delete_docs(ix, [0, 1, 2])
        delete_docs(ix, [3, 4])
        assert list_commits(ix) == [v0, v0 + 1, v0 + 2]

        # live excludes all 5; each commit pins ITS tombstone snapshot
        live = {d for d, _ in Searcher(ix).search("common", k=100)}
        assert live == base - {0, 1, 2, 3, 4}
        s0 = Searcher(ix, version=v0)
        assert {d for d, _ in s0.search("common", k=100)} == base
        s1 = Searcher(ix, version=v0 + 1)
        assert {d for d, _ in s1.search("common", k=100)} == base - {0, 1, 2}

    def test_gc_respects_commits_until_pruned(self, committed_ix):
        ix = committed_ix
        v0 = load_manifest(ix).version
        m = load_manifest(ix)
        victim = m.segments[0].name
        drop_segments(ix, [victim])

        # the dropped segment is still referenced by commit v0
        assert gc_index(ix, dry_run=True) == []
        assert os.path.isdir(os.path.join(ix, "segments", victim))
        old_docs = {d for d, _ in Searcher(ix, version=v0).search("common", k=100)}
        assert len(old_docs) == 60

        pruned = prune_commits(ix, keep_last=1)
        assert v0 in pruned
        removed = gc_index(ix)
        assert victim in removed
        with pytest.raises(FileNotFoundError, match="commit point"):
            Searcher(ix, version=v0)
        # live searcher unaffected (no deletes in this fixture instance)
        live = {d for d, _ in Searcher(ix).search("common", k=100)}
        assert len(live) == 60

    def test_tombstone_gc_respects_commits(self, committed_ix):
        ix = committed_ix
        delete_docs(ix, [10])
        delete_docs(ix, [11])
        # both tombstone files referenced by retained commits -> kept
        assert gc_tombstones(ix, dry_run=True) == []
        prune_commits(ix, keep_last=1)
        swept = gc_tombstones(ix)
        assert len(swept) == 1  # the v+1 snapshot; live file kept

    def test_missing_commit_error_lists_retained(self, committed_ix):
        with pytest.raises(FileNotFoundError, match="retained"):
            Searcher(committed_ix, version=999)


class TestDiffCommits:
    def test_delete_diff_counts(self, tmp_path, ray_session):
        import numpy as np
        import pyarrow.parquet as pq

        from fdblucene_ray.index.build import build_index
        from fdblucene_ray.index.delete import delete_docs, diff_commits
        from fdblucene_ray.index.manifest import list_commits

        src = str(tmp_path / "c.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(60), pa.int64()),
                    "text": pa.array([f"w{i % 9} common" for i in range(60)]),
                }
            ),
            src,
        )
        ix = str(tmp_path / "ix")
        build_index(src, ix,
                    fields={"text": {"column": "text", "analyzer": "simple"}},
                    num_partitions=2)
        v0 = list_commits(ix)[-1]
        delete_docs(ix, [3, 5, 9])
        delete_docs(ix, [9, 11])  # overlap -> union semantics
        v2 = list_commits(ix)[-1]
        d = diff_commits(ix, v0, v2)
        assert d["segments_added"] == [] and d["segments_removed"] == []
        assert d["n_postings_delta"] == 0
        assert d["tombstones_added"] == 4  # {3,5,9,11}
        assert d["tombstones_removed"] == 0
        # reverse direction flips the tombstone delta
        rd = diff_commits(ix, v2, v0)
        assert rd["tombstones_added"] == 0 and rd["tombstones_removed"] == 4


class TestExportCommit:
    def test_clone_at_pre_delete_commit(self, tmp_path, ray_session):
        import pyarrow.parquet as pq

        from fdblucene_ray.index.build import build_index
        from fdblucene_ray.index.delete import delete_docs
        from fdblucene_ray.index.manifest import export_commit, list_commits
        from fdblucene_ray.index.search import Searcher

        src = str(tmp_path / "c.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(80), pa.int64()),
                    "text": pa.array(
                        [f"alpha w{i % 7} beta" for i in range(80)]
                    ),
                }
            ),
            src,
        )
        ix = str(tmp_path / "ix")
        build_index(src, ix,
                    fields={"text": {"column": "text", "analyzer": "simple"}},
                    num_partitions=2)
        v0 = list_commits(ix)[-1]
        pre = Searcher(ix).search("alpha", k=100, mode="exhaustive")
        delete_docs(ix, list(range(0, 80, 2)))
        # clone the PRE-delete commit: full results, no tombstones
        out0 = str(tmp_path / "clone0")
        export_commit(ix, out0, version=v0)
        s0 = Searcher(out0)
        assert s0.num_deleted == 0
        assert s0.search("alpha", k=100, mode="exhaustive") == pre
        assert list_commits(out0) == [0]
        # clone the LIVE (post-delete) state: tombstones carried
        out1 = str(tmp_path / "clone1")
        export_commit(ix, out1)
        s1 = Searcher(out1)
        assert s1.num_deleted == 40
        assert s1.search("alpha", k=100, mode="exhaustive") == Searcher(
            ix
        ).search("alpha", k=100, mode="exhaustive")
