"""SegmentStore (U1 storage SPI): push/pull an index through a store
and get identical search results; CAS semantics at the store manifest.

Models the reference's Directory portability (FDBDirectory.java:52 —
the same Lucene index runs on FDB or local disk); here the same index
runs from a local dir, a LocalFSStore, or any pyarrow.fs filesystem.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.manifest import ManifestConflictError, load_manifest
from fdblucene_ray.index.search import Searcher
from fdblucene_ray.index.store import (
    LocalFSStore,
    PyArrowFSStore,
    SegmentStore,
    pull_index,
    push_index,
)

WORDS = ["merge", "scan", "stream", "join", "batch", "hash", "row", "window"]


@pytest.fixture(scope="module")
def built_ix(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("store")
    rng = np.random.default_rng(4)
    texts = [" ".join(rng.choice(WORDS, size=rng.integers(2, 10)))
             for _ in range(200)]
    src = str(tmp / "c.parquet")
    pq.write_table(pa.table({"text": pa.array(texts)}), src)
    ix = str(tmp / "ix")
    build_index(src, ix,
                fields={"text": {"column": "text", "analyzer": "simple"}},
                num_partitions=4)
    from fdblucene_ray.index.delete import delete_docs

    delete_docs(ix, [0, 1])  # exercise the tombstone sidecar sync
    return ix


def _stores(tmp_path):
    import pyarrow.fs as pafs

    return [
        LocalFSStore(str(tmp_path / "local-store")),
        PyArrowFSStore(pafs.LocalFileSystem(), str(tmp_path / "pafs-store")),
    ]


class TestPushPull:
    @pytest.mark.parametrize("kind", ["local", "pyarrowfs"])
    def test_roundtrip_identical_results(self, built_ix, tmp_path, kind):
        import pyarrow.fs as pafs

        store = (
            LocalFSStore(str(tmp_path / "st"))
            if kind == "local"
            else PyArrowFSStore(pafs.LocalFileSystem(), str(tmp_path / "st"))
        )
        assert isinstance(store, SegmentStore)
        n = push_index(built_ix, store)
        assert n > 0
        cache = str(tmp_path / "cache")
        m = pull_index(store, cache, verify=True)
        assert m.version == load_manifest(built_ix).version
        a = Searcher(built_ix)
        b = Searcher(cache)
        assert a.search("merge scan", 20) == b.search("merge scan", 20)
        assert set(a.tombstones) == set(b.tombstones)

    def test_push_is_incremental(self, built_ix, tmp_path):
        store = LocalFSStore(str(tmp_path / "st"))
        n1 = push_index(built_ix, store)
        n2 = push_index(built_ix, store)  # segments immutable: all skipped
        assert n1 > 0 and n2 == 0

    def test_pull_is_incremental(self, built_ix, tmp_path):
        store = LocalFSStore(str(tmp_path / "st"))
        push_index(built_ix, store)
        cache = str(tmp_path / "cache")
        pull_index(store, cache)
        seg = os.path.join(cache, "segments",
                           load_manifest(cache).segments[0].name)
        marker = os.path.join(seg, "terms.parquet")
        t0 = os.path.getmtime(marker)
        pull_index(store, cache)  # second pull must not re-download
        assert os.path.getmtime(marker) == t0

    def test_put_manifest_cas_conflict(self, built_ix, tmp_path):
        store = LocalFSStore(str(tmp_path / "st"))
        push_index(built_ix, store)
        m = store.get_manifest()
        # a racing writer moved the store version
        from dataclasses import replace

        store.put_manifest(replace(m, version=m.version + 1))
        with pytest.raises(ManifestConflictError):
            push_index(built_ix, store, expected_version=m.version)

    def test_pull_empty_store_raises(self, tmp_path):
        store = LocalFSStore(str(tmp_path / "st"))
        with pytest.raises(FileNotFoundError):
            pull_index(store, str(tmp_path / "cache"))


class TestCommitReplication:
    def test_push_pull_with_commits(self, built_ix, tmp_path, ray_session):
        """include_commits replicates commit points: the pulled cache
        answers point-in-time reads identically to the source."""
        from fdblucene_ray.index.manifest import list_commits

        store = LocalFSStore(str(tmp_path / "cstore"))
        push_index(built_ix, store, include_commits=True)
        cache = str(tmp_path / "ccache")
        pull_index(store, cache, include_commits=True, verify=True)
        assert list_commits(cache) == list_commits(built_ix)
        v0 = list_commits(built_ix)[0]
        src_old = Searcher(built_ix, version=v0)
        dst_old = Searcher(cache, version=v0)
        q = src_old.search("the", 50)
        assert q == dst_old.search("the", 50)
        # live view matches too (tombstones applied)
        assert Searcher(built_ix).search("the", 50) == \
            Searcher(cache).search("the", 50)

    def test_default_push_skips_commits(self, built_ix, tmp_path):
        """include_commits=False replicates NO historical commit
        points — only the CAS protocol's own commit object for the
        version being published."""
        from fdblucene_ray.index.store import _commit_rel

        store = LocalFSStore(str(tmp_path / "nstore"))
        push_index(built_ix, store)
        v = store.get_manifest().version
        assert store.list_files("commits") == [_commit_rel(v)]


class FakeS3Store:
    """In-memory object store with S3 API semantics — the contract
    double for ``PutObject If-None-Match: *`` conditional writes
    (strongly consistent, atomic whole-object visibility, flat
    keyspace, no rename). ``put_if_absent`` arbitrates under one lock
    exactly the way S3's conditional put arbitrates server-side, so
    the commit protocol (``_cas_put_manifest``) must pass against it
    byte-for-byte as against LocalFS."""

    def __init__(self):
        import threading

        self._objects: dict[str, bytes] = {}
        self._lock = threading.Lock()

    def list_files(self, prefix: str = "") -> list[str]:
        with self._lock:
            return sorted(
                k for k in self._objects if k.startswith(prefix)
            )

    def get(self, rel: str) -> bytes:
        with self._lock:
            return self._objects[rel]

    def put(self, rel: str, data: bytes) -> None:
        with self._lock:
            self._objects[rel] = bytes(data)

    def put_if_absent(self, rel: str, data: bytes) -> bool:
        with self._lock:  # S3: PutObject If-None-Match: *
            if rel in self._objects:
                return False
            self._objects[rel] = bytes(data)
            return True

    def delete(self, rel: str) -> None:
        with self._lock:
            self._objects.pop(rel, None)

    def exists(self, rel: str) -> bool:
        with self._lock:
            return rel in self._objects

    def get_manifest(self):
        from fdblucene_ray.index.store import _resolve_manifest

        return _resolve_manifest(self)

    def put_manifest(self, manifest, *, expected_version=None) -> None:
        from fdblucene_ray.index.store import _cas_put_manifest

        _cas_put_manifest(self, manifest, expected_version)


def _race_two_writers(store, built_ix):
    """Shared body: push, then two threads CAS the same version."""
    import threading
    from dataclasses import replace

    push_index(built_ix, store)
    m = store.get_manifest()
    base_v = m.version
    results: list = [None, None]
    barrier = threading.Barrier(2)

    def writer(i):
        nxt = replace(m, version=base_v + 1,
                      extra={**m.extra, "writer": i})
        try:
            barrier.wait()
            store.put_manifest(nxt, expected_version=base_v)
            results[i] = "won"
        except ManifestConflictError:
            results[i] = "lost"

    ts = [threading.Thread(target=writer, args=(i,)) for i in (0, 1)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return results, base_v


class TestFakeS3Contract:
    """The S3-semantics contract suite: every conditional-put commit
    property holds against the in-memory S3 double exactly as against
    LocalFS (VERDICT r4 #5)."""

    def test_two_writer_race(self, built_ix, ray_session):
        for _ in range(5):  # arbitration, not scheduling luck
            store = FakeS3Store()
            results, base_v = _race_two_writers(store, built_ix)
            assert sorted(results) == ["lost", "won"]
            cur = store.get_manifest()
            assert cur.version == base_v + 1
            assert cur.extra["writer"] == results.index("won")

    def test_put_if_absent_is_exclusive(self):
        store = FakeS3Store()
        assert store.put_if_absent("x/y.bin", b"a") is True
        assert store.put_if_absent("x/y.bin", b"b") is False
        assert store.get("x/y.bin") == b"a"

    def test_commit_objects_are_authoritative(self, built_ix, ray_session):
        from dataclasses import replace

        from fdblucene_ray.index.store import _commit_rel, _manifest_bytes

        store = FakeS3Store()
        push_index(built_ix, store)
        m = store.get_manifest()
        nxt = replace(m, version=m.version + 1)
        # writer crash between commit-object put and pointer refresh
        assert store.put_if_absent(
            _commit_rel(nxt.version), _manifest_bytes(nxt)
        )
        assert store.get_manifest().version == nxt.version

    def test_push_pull_roundtrip_identical_results(
        self, built_ix, tmp_path, ray_session
    ):
        store = FakeS3Store()
        push_index(built_ix, store)
        dest = str(tmp_path / "from-s3")
        pull_index(store, dest)
        a = Searcher(built_ix).search_terms(["merge"], 10, mode="wand")
        b = Searcher(dest).search_terms(["merge"], 10, mode="wand")
        assert a == b

    def test_idempotent_republish_same_bytes_ok(
        self, built_ix, ray_session
    ):
        """Re-publishing the SAME manifest version with identical
        bytes (resume) is accepted; different bytes under the same
        version raise (lost the publish race)."""
        from dataclasses import replace

        store = FakeS3Store()
        push_index(built_ix, store)
        m = store.get_manifest()
        nxt = replace(m, version=m.version + 1)
        store.put_manifest(nxt, expected_version=m.version)
        # resume: same version, same bytes — fine
        store.put_manifest(nxt, expected_version=m.version + 1)
        other = replace(
            m, version=m.version + 1, extra={**m.extra, "x": 1}
        )
        with pytest.raises(ManifestConflictError):
            store.put_manifest(other, expected_version=m.version + 1)


class TestConditionalPutCommit:
    """Object-store CAS commit: the conditional put of the IMMUTABLE
    version-named commit object is the whole fence (the FDB
    transactional-rename analog, FDBDirectory.java:351-365, off-POSIX).
    Two writers racing the same expected version: exactly one wins."""

    def test_two_writer_race_pyarrowfs(self, built_ix, tmp_path):
        import threading
        from dataclasses import replace

        import pyarrow.fs as pafs

        store = PyArrowFSStore(pafs.LocalFileSystem(), str(tmp_path / "race"))
        push_index(built_ix, store)
        m = store.get_manifest()
        base_v = m.version
        results: list = [None, None]
        barrier = threading.Barrier(2)

        def writer(i):
            nxt = replace(m, version=base_v + 1,
                          extra={**m.extra, "writer": i})
            try:
                barrier.wait()
                store.put_manifest(nxt, expected_version=base_v)
                results[i] = "won"
            except ManifestConflictError:
                results[i] = "lost"

        ts = [threading.Thread(target=writer, args=(i,)) for i in (0, 1)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert sorted(results) == ["lost", "won"]
        # the committed manifest is exactly the winner's
        cur = store.get_manifest()
        assert cur.version == base_v + 1
        assert cur.extra["writer"] == results.index("won")

    def test_put_if_absent_is_exclusive(self, tmp_path):
        import pyarrow.fs as pafs

        store = PyArrowFSStore(pafs.LocalFileSystem(), str(tmp_path / "pia"))
        assert store.put_if_absent("x/y.bin", b"a") is True
        assert store.put_if_absent("x/y.bin", b"b") is False
        assert store.get("x/y.bin") == b"a"

    def test_commit_objects_are_authoritative(self, built_ix, tmp_path):
        """get_manifest resolves via the immutable commit objects even
        when the mutable pointer lags (e.g. a writer crashed between
        the commit-object put and the pointer refresh)."""
        from dataclasses import replace

        store = LocalFSStore(str(tmp_path / "auth"))
        push_index(built_ix, store)
        m = store.get_manifest()
        nxt = replace(m, version=m.version + 1)
        # simulate the crash: commit object lands, pointer never moves
        import json as _json

        from fdblucene_ray.index.store import _commit_rel, _manifest_bytes

        assert store.put_if_absent(_commit_rel(nxt.version),
                                   _manifest_bytes(nxt))
        assert store.get_manifest().version == nxt.version


class TestTornCommitObjects:
    def test_resolver_skips_torn_top_commit(self, built_ix, tmp_path):
        """A commit object that EXISTS but is unreadable (a writer
        mid-publish on a backend without atomic object visibility) must
        not crash get_manifest — the previous commit is authoritative
        until the new object is durably complete."""
        import os

        store = LocalFSStore(str(tmp_path / "torn"))
        push_index(built_ix, store)
        m = store.get_manifest()
        torn = os.path.join(
            str(tmp_path / "torn"), "commits",
            f"manifest_{m.version + 1:09d}.json",
        )
        open(torn, "wb").close()  # zero-byte in-flight commit object
        cur = store.get_manifest()
        assert cur is not None and cur.version == m.version

    def test_atomic_create_no_partial_visibility(self, tmp_path):
        """put_if_absent publishes full contents atomically (hard-link
        of a fully written temp file) and leaves no temp debris."""
        import os

        store = LocalFSStore(str(tmp_path / "atomic"))
        assert store.put_if_absent("c/obj.json", b"x" * 4096) is True
        assert store.get("c/obj.json") == b"x" * 4096
        assert store.put_if_absent("c/obj.json", b"other") is False
        assert store.get("c/obj.json") == b"x" * 4096
        files = os.listdir(os.path.join(str(tmp_path / "atomic"), "c"))
        assert files == ["obj.json"]
