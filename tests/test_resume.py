"""Checkpoint / resume / lineage semantics (north_rule requirement).

The reference's commit model: nothing is visible before the atomic
segments-file publish, and anything unpublished is re-creatable
(README.md:71-86). Here: lineage records + idempotent deterministic
builds make re-runs no-ops and shard builds skip finished input.
"""

import json
import os

import pyarrow.parquet as pq
import pytest

from fdblucene_ray.index.build import build_index, build_sharded
from fdblucene_ray.index.manifest import load_manifest
from fdblucene_ray.index.search import Searcher
from fdblucene_ray.sources.webpages import generate_webpages


@pytest.fixture(scope="module")
def shard_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    paths = []
    for i in range(3):
        p = str(d / f"shard{i}.parquet")
        pq.write_table(generate_webpages(i * 200, 200), p)
        paths.append(p)
    return paths


def test_sharded_build_matches_monolithic(shard_files, tmp_path, ray_session):
    ix_s = str(tmp_path / "sharded")
    ix_m = str(tmp_path / "mono")
    fields = {"text": {"column": "text", "analyzer": "lucene"}}
    ms = build_sharded(
        [[p] for p in shard_files], ix_s, fields=fields,
        num_partitions_per_shard=3,
    )
    build_index(shard_files, ix_m, fields=fields, num_partitions=3)
    ss, sm = Searcher(ix_s), Searcher(ix_m)
    assert ss.num_docs("text") == sm.num_docs("text") == 600
    assert ss.field_stats("text") == sm.field_stats("text")
    for q in ["hello everybody", "term1 term7", "running"]:
        assert ss.search(q, 10) == sm.search(q, 10), q


def test_sharded_resume_skips_done_shards(shard_files, tmp_path, ray_session):
    ix = str(tmp_path / "resume")
    fields = {"text": {"column": "text", "analyzer": "lucene"}}
    m1 = build_sharded([[p] for p in shard_files], ix, fields=fields,
                       num_partitions_per_shard=3)
    # count shard done-records
    done = []
    for root, _, files in os.walk(os.path.join(ix, "lineage")):
        done.extend(f for f in files if f == "_shard_done.json")
    assert len(done) == 3
    # poison one done-record's mtime marker then re-run: nothing rebuilt,
    # manifest version bumps, same segments
    m2 = build_sharded([[p] for p in shard_files], ix, fields=fields,
                       num_partitions_per_shard=3)
    assert [s.name for s in m2.segments] == [s.name for s in m1.segments]
    assert m2.version == m1.version + 1


def test_incremental_shard_append(shard_files, tmp_path, ray_session):
    """Near-real-time refresh analog: add a shard, re-run, only the new
    shard builds; doc count grows."""
    ix = str(tmp_path / "incr")
    fields = {"text": {"column": "text", "analyzer": "lucene"}}
    build_sharded([[shard_files[0]]], ix, fields=fields, num_partitions_per_shard=3)
    n1 = Searcher(ix).num_docs("text")
    m2 = build_sharded(
        [[shard_files[0]], [shard_files[1]]], ix, fields=fields,
        num_partitions_per_shard=3,
    )
    s = Searcher(ix)
    assert s.num_docs("text") == n1 + 200


def test_lineage_records_written(tmp_path, ray_session):
    p = str(tmp_path / "c.parquet")
    pq.write_table(generate_webpages(0, 100), p)
    ix = str(tmp_path / "ix")
    m = build_index(p, ix, num_partitions=4)
    sig = m.extra["signature"]
    ldir = os.path.join(ix, "lineage", sig)
    recs = sorted(os.listdir(ldir))
    assert recs  # one per non-empty partition
    r = json.load(open(os.path.join(ldir, recs[0])))
    assert {"meta", "wall_s", "rows"} <= set(r)
    assert r["meta"]["name"].startswith("seg-")


def test_deterministic_rebuild_identical_manifest(tmp_path, ray_session):
    """Determinism check (BASELINE.md §3): two fresh builds of the same
    input produce identical manifests modulo timing fields."""
    p = str(tmp_path / "c.parquet")
    pq.write_table(generate_webpages(0, 150), p)
    m = []
    for tag in ["a", "b"]:
        ix = str(tmp_path / tag)
        man = build_index(p, ix, num_partitions=4).to_json()
        man["extra"].pop("built_at_unix")
        m.append(man)
    assert m[0] == m[1]

def test_gc_and_drop_segments(tmp_path, ray_session):
    """S11 delete analog: drop a segment from the manifest, then GC
    sweeps the orphaned directory; uncommitted dirs are swept too."""
    import shutil

    from fdblucene_ray.index.manifest import (
        drop_segments,
        gc_index,
        prune_commits,
    )

    p = str(tmp_path / "c.parquet")
    pq.write_table(generate_webpages(0, 100), p)
    ix = str(tmp_path / "ix")
    m = build_index(p, ix, num_partitions=4)
    seg_dir = os.path.join(ix, "segments")
    # plant an orphan (aborted-run leftover)
    shutil.copytree(
        os.path.join(seg_dir, m.segments[0].name),
        os.path.join(seg_dir, "seg-orphan-zzz"),
    )
    removed = gc_index(ix)
    assert removed == ["seg-orphan-zzz"]
    # drop a live segment -> next GC removes its files
    victim = m.segments[0].name
    m2 = drop_segments(ix, [victim])
    assert victim not in {s.name for s in m2.segments}
    # the pre-drop commit point still pins the victim; prune, then sweep
    assert victim not in gc_index(ix, dry_run=True)
    prune_commits(ix, keep_last=1)
    assert victim in gc_index(ix)
    from fdblucene_ray.index.search import Searcher

    s = Searcher(ix)  # remaining segments still searchable
    assert len(s.readers) == len(m.segments) - 1
    assert sum(seg.n_postings for seg in m2.segments) < sum(
        seg.n_postings for seg in m.segments
    )
    assert s.search("hello", 5, mode="exhaustive") is not None


def test_manifest_identical_across_batch_and_parallelism_shapes(tmp_path, ray_session):
    """BASELINE.md §3.4: the published manifest must be byte-identical
    (modulo timing fields) across executor shapes (actor-pool sizes,
    scheduling) — segment content is a pure function of the PLAN
    (input, num_partitions, block_size, batch_size, salting params),
    never of task scheduling. batch_size is a plan parameter because
    auto-salting keys off within-batch doc frequency."""
    p = str(tmp_path / "c.parquet")
    pq.write_table(generate_webpages(0, 400), p)
    manifests = []
    for tag, conc in [("a", (1, 2)), ("b", (2, 4))]:
        ix = str(tmp_path / tag)
        man = build_index(
            p, ix, num_partitions=6, batch_size=128,
            tokenize_concurrency=conc,
        ).to_json()
        man["extra"].pop("built_at_unix")
        manifests.append(man)
    assert manifests[0] == manifests[1]
    # and the segment files themselves are byte-identical
    import hashlib

    def digest(ix):
        h = hashlib.sha256()
        seg_root = os.path.join(ix, "segments")
        for name in sorted(os.listdir(seg_root)):
            for f in ["terms.parquet", "postings.bin", "skips.bin"]:
                fp = os.path.join(seg_root, name, f)
                if f != "terms.parquet":  # parquet embeds writer metadata
                    h.update(open(fp, "rb").read())
        return h.hexdigest()

    assert digest(str(tmp_path / "a")) == digest(str(tmp_path / "b"))


def test_concurrent_shards_match_sequential(shard_files, tmp_path, ray_session):
    """concurrent_shards only changes SCHEDULING: segment names,
    manifest and search results are identical to the sequential build
    (determinism is what makes crash-resume safe under concurrency)."""
    fields = {"text": {"column": "text", "analyzer": "lucene"}}
    ix_seq = str(tmp_path / "seq")
    ix_con = str(tmp_path / "con")
    m_seq = build_sharded([[p] for p in shard_files], ix_seq, fields=fields,
                          num_partitions_per_shard=3)
    m_con = build_sharded([[p] for p in shard_files], ix_con, fields=fields,
                          num_partitions_per_shard=3, concurrent_shards=3)
    assert [s.name for s in m_con.segments] == \
        [s.name for s in m_seq.segments]
    ss, sc = Searcher(ix_seq), Searcher(ix_con)
    assert sc.field_stats("text") == ss.field_stats("text")
    for q in ["hello everybody", "term1 term7"]:
        assert sc.search(q, 10) == ss.search(q, 10), q


def test_concurrent_resume_skips_finished_shard(shard_files, tmp_path,
                                                ray_session):
    """Crash mid-ingest: shard 0 finished (done-record on disk), the
    driver died before shards 1-2. The concurrent re-run must SKIP
    shard 0's input entirely (done-record untouched) and complete the
    rest."""
    ix = str(tmp_path / "crash")
    fields = {"text": {"column": "text", "analyzer": "lucene"}}
    # phase 1 = the pre-crash run: only shard 0 completed. Passing the
    # full 3-shard layout keeps shard 0's doc_base/signature identical
    # to the final run's; monkeypatched build_index raises after it.
    import fdblucene_ray.index.build as b

    real_build = b.build_index
    calls = []

    def crash_after_first(source, index_dir, **kw):
        calls.append(source)
        if len(calls) > 1:
            raise RuntimeError("simulated driver crash")
        return real_build(source, index_dir, **kw)

    b.build_index = crash_after_first
    try:
        with pytest.raises(RuntimeError, match="simulated"):
            build_sharded([[p] for p in shard_files], ix, fields=fields,
                          num_partitions_per_shard=3)
    finally:
        b.build_index = real_build
    done0 = None
    for root, _, files in os.walk(os.path.join(ix, "lineage")):
        for f in files:
            if f == "_shard_done.json":
                done0 = os.path.join(root, f)
    assert done0 is not None  # exactly the finished shard's record
    mtime0 = os.stat(done0).st_mtime_ns

    m = build_sharded([[p] for p in shard_files], ix, fields=fields,
                      num_partitions_per_shard=3, concurrent_shards=3)
    assert os.stat(done0).st_mtime_ns == mtime0  # shard 0 never re-ran
    assert Searcher(ix).num_docs("text") == 600
    assert len({s.name for s in m.segments}) == len(m.segments)
