"""Doc-level delete (tombstones), purge-at-merge, and the compaction
maintenance loop (round-1 VERDICT missing #1/#2; reference Writer
approach README.md:34-38, DATA.md:14-17)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.delete import (
    delete_by_term,
    delete_docs,
    gc_tombstones,
    load_tombstones,
)
from fdblucene_ray.index.manifest import load_manifest
from fdblucene_ray.index.merge import (
    compact_index,
    maintain_index,
    merge_segments_inplace,
    plan_tiered,
)
from fdblucene_ray.index.search import Searcher
from fdblucene_ray.oracle import OracleIndex

TEXTS = [
    f"data merge {'join ' * (i % 4)}window batch value stream t{i:03d}"
    for i in range(60)
]
DELETED = [3, 7, 20, 21, 40, 59]
LIVE = [i for i in range(60) if i not in DELETED]


def _write_corpus(d, texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "tag": pa.array([f"g{i % 3}" for i in ids], pa.string()),
        }
    )
    p = str(d / "c.parquet")
    pq.write_table(t, p)
    return p


FIELDS = {
    "text": {"column": "text", "analyzer": "simple", "positions": True},
    "tag": {"column": "tag", "analyzer": "keyword"},
}


@pytest.fixture(scope="module")
def deleted_ix(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("del")
    src = _write_corpus(d, TEXTS)
    ix = str(d / "ix")
    build_index(src, ix, fields=FIELDS, num_partitions=6, batch_size=16)
    delete_docs(ix, DELETED)
    oracle = OracleIndex("simple")
    for i, t in enumerate(TEXTS):
        oracle.add(i, t)
    return ix, oracle


def _oracle_filtered(oracle, query, k, operator="or"):
    """Oracle ranking over the FULL corpus (stats include deleted — the
    Lucene liveDocs semantics) with deleted docs dropped post-hoc."""
    full = oracle.search(query, k=10**9, operator=operator)
    return [h for h in full if h[0] not in set(DELETED)][:k]


class TestTombstoneFiltering:
    def test_search_excludes_deleted_scores_unchanged(self, deleted_ix):
        ix, oracle = deleted_ix
        s = Searcher(ix)
        assert s.num_deleted == len(DELETED)
        for q, op in [("data", "or"), ("data merge", "or"), ("join window", "and")]:
            for mode in ("wand", "exhaustive"):
                got = s.search(q, 10, operator=op, mode=mode)
                exp = _oracle_filtered(oracle, q, 10, op)
                assert [d for d, _ in got] == [d for d, _ in exp], (q, op, mode)
                for (_, a), (_, b) in zip(got, exp):
                    assert a == pytest.approx(b, rel=1e-12)
                assert not set(d for d, _ in got) & set(DELETED)

    def test_stats_still_include_deleted(self, deleted_ix):
        """Lucene semantics: deletes leave docCount/df untouched."""
        ix, oracle = deleted_ix
        s = Searcher(ix)
        assert s.num_docs("text") == oracle.dc  # full corpus
        assert s.term_stats("text", "data")[0] == oracle.df("data")

    def test_count_boolean_phrase_exclude_deleted(self, deleted_ix):
        ix, oracle = deleted_ix
        s = Searcher(ix)
        assert s.count("data") == len(LIVE)
        hits = s.search_boolean(must=["data"], should=["merge"], k=100)
        assert not set(d for d, _ in hits) & set(DELETED)
        ph = dict(s.phrase_freqs("data merge"))
        assert set(ph) == set(LIVE)
        single = dict(s.phrase_freqs("data"))
        assert set(single) == set(LIVE)

    def test_delete_is_idempotent_union(self, deleted_ix, tmp_path):
        ix, _ = deleted_ix
        before = load_tombstones(ix)
        m = delete_docs(ix, DELETED[:2])  # already deleted
        after = load_tombstones(ix, m)
        assert np.array_equal(before, after)


class TestPurgeAtMerge:
    def test_full_compaction_purges_exactly(self, deleted_ix, tmp_path, ray_session):
        """Compacted-with-tombstones index == fresh build on the live
        corpus: stats exact (via doclens) and scores identical."""
        ix, _ = deleted_ix
        out = str(tmp_path / "compacted")
        compact_index(ix, out, num_partitions=4)
        sc = Searcher(out)
        assert sc.num_deleted == 0

        fresh_src = _write_corpus(tmp_path, [TEXTS[i] for i in LIVE])
        fix = str(tmp_path / "fresh")
        build_index(fresh_src, fix, fields=FIELDS, num_partitions=4,
                    batch_size=16)
        sf = Searcher(fix)
        assert sc.field_stats("text") == sf.field_stats("text")
        assert sc.term_stats("text", "data") == sf.term_stats("text", "data")
        # scores identical; fresh ids are dense 0..len(LIVE)-1 so the
        # compacted hit ids map through LIVE[...]
        got = sc.search("data merge", 10)
        exp = sf.search("data merge", 10)
        assert [d for d, _ in got] == [LIVE[d] for d, _ in exp]
        for (_, a), (_, b) in zip(got, exp):
            assert a == pytest.approx(b, rel=1e-12)

    def test_partial_merge_keeps_tombstones(self, deleted_ix, tmp_path_factory, ray_session):
        d = tmp_path_factory.mktemp("partial")
        src = _write_corpus(d, TEXTS)
        ix = str(d / "ix")
        build_index(src, ix, fields=FIELDS, num_partitions=6, batch_size=16)
        delete_docs(ix, DELETED)
        s0 = Searcher(ix)
        before = s0.search("data merge", 10)
        names = [s.name for s in s0.manifest.segments][:3]
        merge_segments_inplace(ix, names, num_partitions=1)
        s1 = Searcher(ix)
        assert s1.num_deleted == len(DELETED)  # carried forward
        assert s1.search("data merge", 10) == before
        assert len(s1.manifest.segments) == len(s0.manifest.segments) - 3 + 1


class TestMaintenance:
    def test_maintain_converges_and_preserves_results(
        self, tmp_path, ray_session
    ):
        """N incremental appends -> bounded segment count, results
        unchanged (VERDICT next #3 done-criterion)."""
        from fdblucene_ray.index.build import build_sharded

        paths = []
        for si in range(4):
            texts = [f"data shard{si} common t{si}_{j}" for j in range(20)]
            t = pa.table({"text": pa.array(texts, pa.string())})
            p = str(tmp_path / f"s{si}.parquet")
            pq.write_table(t, p)
            paths.append(p)
        ix = str(tmp_path / "ix")
        build_sharded(
            [[p] for p in paths], ix,
            fields={"text": {"column": "text", "analyzer": "simple"}},
            num_partitions_per_shard=4, batch_size=16,
        )
        s0 = Searcher(ix)
        n_before = len(s0.manifest.segments)
        before = s0.search("data common", 10)
        stats_before = s0.field_stats("text")

        m = maintain_index(ix, tier_factor=4, min_merge=4, out_partitions=1)
        assert len(m.segments) < n_before
        assert not plan_tiered(m, tier_factor=4, min_merge=4)
        s1 = Searcher(ix)
        assert s1.search("data common", 10) == before
        assert s1.field_stats("text") == stats_before
        # orphaned segment dirs swept
        import os
        on_disk = set(os.listdir(os.path.join(ix, "segments")))
        assert on_disk == {s.name for s in m.segments}


class TestDeleteByTerm:
    def test_delete_by_keyword_term(self, tmp_path, ray_session):
        src = _write_corpus(tmp_path, TEXTS)
        ix = str(tmp_path / "ix")
        build_index(src, ix, fields=FIELDS, num_partitions=4, batch_size=16)
        delete_by_term(ix, "tag", "g1")
        s = Searcher(ix)
        expect_deleted = {i for i in range(60) if i % 3 == 1}
        assert set(s.tombstones.tolist()) == expect_deleted
        hits = s.search("data", 100)
        assert not set(d for d, _ in hits) & expect_deleted

    def test_gc_tombstones(self, tmp_path, ray_session):
        src = _write_corpus(tmp_path, TEXTS[:10])
        ix = str(tmp_path / "ix")
        build_index(src, ix, fields=FIELDS, num_partitions=2, batch_size=8)
        delete_docs(ix, [1])
        delete_docs(ix, [2])
        # superseded tombstone file is pinned by its commit point until
        # the deletion policy prunes it
        assert gc_tombstones(ix, dry_run=True) == []
        from fdblucene_ray.index.manifest import prune_commits

        prune_commits(ix, keep_last=1)
        removed = gc_tombstones(ix)
        assert len(removed) == 1  # the superseded v1 file
        assert len(load_tombstones(ix)) == 2


class TestUpdateDocuments:
    def test_update_replaces_matching_docs(self, tmp_path, ray_session):
        """updateDocument(Term, doc) analog: old versions hidden and
        replacements visible in ONE new manifest version."""
        from fdblucene_ray.index.delete import update_documents
        from fdblucene_ray.index.manifest import load_manifest

        src = _write_corpus(tmp_path, TEXTS)
        ix = str(tmp_path / "ix")
        build_index(src, ix, fields=FIELDS, num_partitions=4, batch_size=16)
        v0 = load_manifest(ix).version
        old_g1 = {i for i in range(60) if i % 3 == 1}

        # replacement docs: all carry the marker term "updatedmarker"
        repl = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(
                    ["updatedmarker fresh data", "updatedmarker merge row"],
                    pa.string(),
                ),
                "tag": pa.array(["g1", "g1"], pa.string()),
            }
        )
        rp = str(tmp_path / "repl.parquet")
        pq.write_table(repl, rp)
        m2 = update_documents(ix, "tag", "g1", rp, fields=FIELDS,
                              num_partitions=2)
        assert m2.version == v0 + 1

        s = Searcher(ix)
        # every old g1 doc is tombstoned; replacements got fresh ids
        assert old_g1 <= set(s.tombstones.tolist())
        hits = s.search("updatedmarker", 10)
        assert len(hits) == 2
        new_ids = {d for d, _ in hits}
        assert all(d > max(old_g1) for d in new_ids)
        # old g1 docs never surface in any query
        assert not set(d for d, _ in s.search("data", 200)) & old_g1
        # keyword lookup on the updated tag returns ONLY replacements
        docs = set(s.multiterm_docs("tag", ["g1"]).tolist())
        assert docs == new_ids

    def test_update_rejects_mismatched_fields(self, tmp_path, ray_session):
        from fdblucene_ray.index.delete import update_documents

        src = _write_corpus(tmp_path, TEXTS[:10])
        ix = str(tmp_path / "ix")
        build_index(src, ix, fields=FIELDS, num_partitions=2, batch_size=8)
        bad = {"text": {"column": "text", "analyzer": "lucene"}}
        with pytest.raises(ValueError, match="analyzers"):
            update_documents(ix, "tag", "g1", src, fields=bad)
