"""Manifest CAS fence (FDBLock.java:41-61 analog): a losing concurrent
writer gets a clean conflict, never a silent clobber."""

import os

import pytest

from fdblucene_ray.index.manifest import (
    Manifest,
    ManifestConflictError,
    ManifestLockHeldError,
    load_manifest,
    manifest_path,
    publish_manifest,
)


def _mk(version, tag):
    return Manifest(
        analyzers={"text": "simple"}, block_size=128, segments=[],
        version=version, extra={"tag": tag},
    )


class TestManifestFence:
    def test_two_writer_race_loser_conflicts(self, tmp_path):
        d = str(tmp_path / "ix")
        publish_manifest(d, _mk(0, "base"))
        # both writers read version 0 and prepare version 1
        publish_manifest(d, _mk(1, "writer-A"), expected_version=0)
        with pytest.raises(ManifestConflictError):
            publish_manifest(d, _mk(1, "writer-B"), expected_version=0)
        assert load_manifest(d).extra["tag"] == "writer-A"  # no clobber

    def test_cas_against_missing_manifest(self, tmp_path):
        d = str(tmp_path / "ix")
        with pytest.raises(ManifestConflictError):
            publish_manifest(d, _mk(0, "x"), expected_version=0)
        publish_manifest(d, _mk(0, "x"), expected_version=-1)  # create

    def test_held_lock_times_out(self, tmp_path):
        d = str(tmp_path / "ix")
        publish_manifest(d, _mk(0, "base"))
        lock = manifest_path(d) + ".lock"
        with open(lock, "w") as f:
            f.write("crashed-holder")
        with pytest.raises(ManifestLockHeldError):
            publish_manifest(d, _mk(1, "y"), expected_version=0,
                             lock_timeout_s=0.1)
        os.remove(lock)
        publish_manifest(d, _mk(1, "y"), expected_version=0)
        assert load_manifest(d).version == 1

    def test_stale_foreign_lock_not_removed(self, tmp_path):
        """uuid fencing: a timeout loser never deletes a lock it does
        not own."""
        d = str(tmp_path / "ix")
        publish_manifest(d, _mk(0, "base"))
        lock = manifest_path(d) + ".lock"
        with open(lock, "w") as f:
            f.write("other-writer-uuid")
        with pytest.raises(ManifestLockHeldError):
            publish_manifest(d, _mk(1, "z"), expected_version=0,
                             lock_timeout_s=0.05)
        assert os.path.exists(lock)
        with open(lock) as f:
            assert f.read() == "other-writer-uuid"

    def test_delete_uses_fence(self, tmp_path, ray_session, monkeypatch):
        """delete_docs is a fenced RMW: a writer that commits between
        delete's manifest read and its publish makes delete conflict
        rather than clobber."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        import fdblucene_ray.index.delete as delete_mod
        from fdblucene_ray.index.build import build_index

        src = str(tmp_path / "c.parquet")
        pq.write_table(pa.table({"text": pa.array(["a b", "b c"])}), src)
        ix = str(tmp_path / "ix")
        build_index(src, ix,
                    fields={"text": {"column": "text", "analyzer": "simple"}},
                    num_partitions=2)

        real_load = delete_mod.load_manifest
        raced = {"done": False}

        def racing_load(index_dir):
            m = real_load(index_dir)
            if not raced["done"]:
                raced["done"] = True
                publish_manifest(
                    index_dir,
                    Manifest(analyzers=m.analyzers, block_size=m.block_size,
                             segments=m.segments, version=m.version + 1,
                             extra=m.extra),
                )
            return m

        monkeypatch.setattr(delete_mod, "load_manifest", racing_load)
        with pytest.raises(ManifestConflictError):
            delete_mod.delete_docs(ix, [0])


class TestCodecRegistry:
    """U3 codec-SPI analog: named codec recorded in the manifest,
    resolved through the registry, unknown names fail loudly."""

    def test_default_codec_recorded_and_resolves(self, tmp_path, ray_session):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from fdblucene_ray.codec.registry import DEFAULT_CODEC, get_codec
        from fdblucene_ray.index.build import build_index

        src = str(tmp_path / "c.parquet")
        pq.write_table(pa.table({"text": pa.array(["a b", "b c"])}), src)
        m = build_index(src, str(tmp_path / "ix"),
                        fields={"text": {"column": "text", "analyzer": "simple"}},
                        num_partitions=2)
        assert m.codec == DEFAULT_CODEC
        assert get_codec(m.codec).name == DEFAULT_CODEC

    def test_unknown_codec_rejected_at_build(self, tmp_path, ray_session):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from fdblucene_ray.index.build import build_index

        src = str(tmp_path / "c.parquet")
        pq.write_table(pa.table({"text": pa.array(["a b"])}), src)
        with pytest.raises(ValueError, match="unknown postings codec"):
            build_index(src, str(tmp_path / "ix"),
                        fields={"text": {"column": "text", "analyzer": "simple"}},
                        num_partitions=2, codec="pfor-delta")

    def test_unknown_codec_rejected_at_open(self, tmp_path, ray_session):
        import json
        import pyarrow as pa
        import pyarrow.parquet as pq

        from fdblucene_ray.index.build import build_index
        from fdblucene_ray.index.search import Searcher

        src = str(tmp_path / "c.parquet")
        pq.write_table(pa.table({"text": pa.array(["a b"])}), src)
        ix = str(tmp_path / "ix")
        build_index(src, ix,
                    fields={"text": {"column": "text", "analyzer": "simple"}},
                    num_partitions=2)
        mp = os.path.join(ix, "manifest.json")
        d = json.load(open(mp))
        d["codec"] = "pfor-delta"
        json.dump(d, open(mp, "w"))
        with pytest.raises(ValueError, match="unknown postings codec"):
            Searcher(ix)

    def test_fixed_block_end_to_end_parity(self, tmp_path, ray_session):
        """Build the same corpus under both codecs: identical search
        results (scores to 1e-12), phrase matches, and compaction output
        — full read/write dispatch through the registry (U3)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from fdblucene_ray.index.build import build_index
        from fdblucene_ray.index.merge import compact_index
        from fdblucene_ray.index.search import Searcher

        rng = __import__("numpy").random.default_rng(5)
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
        texts = [
            " ".join(rng.choice(words, size=rng.integers(3, 30)))
            for _ in range(400)
        ]
        src = str(tmp_path / "c.parquet")
        pq.write_table(pa.table({"text": pa.array(texts)}), src)
        fields = {"text": {"column": "text", "analyzer": "simple",
                           "positions": True}}

        results = {}
        for codec in ("varint-block", "fixed-block", "for-block"):
            ix = str(tmp_path / f"ix-{codec}")
            m = build_index(src, ix, fields=fields, num_partitions=4,
                            codec=codec)
            assert m.codec == codec
            s = Searcher(ix)
            results[codec] = {
                "or": s.search("alpha gamma", k=20),
                "and": s.search("alpha gamma", k=20, operator="and"),
                "phrase": s.phrase_freqs("alpha beta"),
            }
            # compaction keeps the codec and the results
            names = [seg.name for seg in m.segments]
            if len(names) >= 2:
                m2 = compact_index(ix, ix, num_partitions=2)
                assert m2.codec == codec
                s2 = Searcher(ix)
                assert s2.search("alpha gamma", k=20) == results[codec]["or"]
        v = results["varint-block"]
        for other in ("fixed-block", "for-block"):
            f = results[other]
            assert [d for d, _ in v["or"]] == [d for d, _ in f["or"]]
            for (d1, s1), (d2, s2) in zip(v["or"], f["or"]):
                assert abs(s1 - s2) < 1e-12
            assert v["and"] == f["and"]
            assert v["phrase"] == f["phrase"]
