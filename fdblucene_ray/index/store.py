"""SegmentStore — the storage SPI (SURVEY.md §2.10 U1, the Directory
analog: FDBDirectory.java:52 implements Lucene's pluggable storage; the
whole of the reference's Layer A is that adapter).

This engine's durable unit is bigger than Lucene's file — an immutable
SEGMENT DIRECTORY (terms.parquet + postings.bin + skips.bin + meta +
sidecars) plus one mutable MANIFEST pointer. That shape maps cleanly
onto any object store:

- segments are immutable and content-named — uploads are idempotent
  blind puts, downloads cache locally forever (the JCS block-cache
  analog at file granularity, README.md:96-102);
- the manifest swap is the ONLY point needing coordination: versioned
  compare-and-swap (``put_manifest(expected_version=...)``) — on a
  filesystem an exclusive lock + read-back, on S3 a conditional put /
  ETag match, on FDB the reference's own insert-if-absent lock
  (FDBLock.java:41-61).

Two implementations ship:

- ``LocalFSStore`` — plain directory tree (also the NFS case);
- ``PyArrowFSStore`` — any ``pyarrow.fs.FileSystem`` (S3FileSystem,
  GcsFileSystem, HadoopFileSystem, LocalFileSystem); tested against
  LocalFileSystem here (no network in CI), S3 differs only in the
  constructor.

``push_index`` / ``pull_index`` sync an index between a local working
dir (where build/search run at memory-map speed) and a store;
both are incremental by segment name (segments are immutable, so name
equality is sufficient; ``verify=True`` additionally CRC-checks).
At 100 TB the push happens once per build partition (each EncodeGroup
task could push its own segment) and readers pull only the segments a
query touches.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Iterable, Protocol, runtime_checkable

from fdblucene_ray.index.manifest import (
    MANIFEST_NAME,
    Manifest,
    ManifestConflictError,
)

SEGMENTS = "segments"
TOMBSTONES = "tombstones"
DV_UPDATES = "dv_updates"


@runtime_checkable
class SegmentStore(Protocol):
    """Byte-level contract every backing store implements."""

    def list_files(self, prefix: str = "") -> list[str]:
        """Relative paths of every stored file under ``prefix``."""
        ...

    def get(self, rel: str) -> bytes: ...

    def put(self, rel: str, data: bytes) -> None: ...

    def put_if_absent(self, rel: str, data: bytes) -> bool:
        """Insert-if-absent — the conditional-put primitive every CAS
        commit reduces to (FDBLock.java:41-61 is the reference's FDB
        version; S3 exposes it as ``PutObject If-None-Match:*``).
        Returns False (writing nothing) when ``rel`` already exists."""
        ...

    def delete(self, rel: str) -> None: ...

    def exists(self, rel: str) -> bool: ...

    def get_manifest(self) -> Manifest | None: ...

    def put_manifest(
        self, manifest: Manifest, *, expected_version: int | None = None
    ) -> None:
        """Publish the manifest; with ``expected_version`` the put is a
        compare-and-swap that raises ManifestConflictError when the
        stored version moved (lost race)."""
        ...


class LocalFSStore:
    """Directory-tree store (local disk / NFS)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _p(self, rel: str) -> str:
        return os.path.join(self.root, rel)

    def list_files(self, prefix: str = "") -> list[str]:
        out = []
        base = self._p(prefix) if prefix else self.root
        if not os.path.isdir(base):
            return out
        for dirpath, _, files in os.walk(base):
            for f in files:
                out.append(
                    os.path.relpath(os.path.join(dirpath, f), self.root)
                )
        return sorted(out)

    def get(self, rel: str) -> bytes:
        with open(self._p(rel), "rb") as fh:
            return fh.read()

    def put(self, rel: str, data: bytes) -> None:
        p = self._p(rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, p)

    def put_if_absent(self, rel: str, data: bytes) -> bool:
        p = self._p(rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        return _atomic_create(p, data)

    def delete(self, rel: str) -> None:
        try:
            os.remove(self._p(rel))
        except FileNotFoundError:
            pass

    def exists(self, rel: str) -> bool:
        return os.path.exists(self._p(rel))

    def get_manifest(self) -> Manifest | None:
        return _resolve_manifest(self)

    def put_manifest(
        self, manifest: Manifest, *, expected_version: int | None = None
    ) -> None:
        _cas_put_manifest(self, manifest, expected_version)


class PyArrowFSStore:
    """Store over any ``pyarrow.fs.FileSystem`` — pass
    ``pyarrow.fs.S3FileSystem(...)`` / ``GcsFileSystem`` for object
    storage; tests use ``LocalFileSystem``.

    The commit protocol needs ONE conditional primitive:
    ``put_if_absent`` on the immutable, version-named commit object
    (``commits/manifest_{v}.json``) — never a conditional overwrite of
    a mutable pointer. On LocalFileSystem that's ``O_CREAT|O_EXCL``
    (genuinely atomic, which is what the two-writer race test
    exercises); on real S3 it is ``PutObject If-None-Match: *``
    (conditional writes are native S3 API) — subclass and override
    ``put_if_absent`` with the boto3 call since pyarrow's FileSystem
    facade doesn't expose request headers. The generic fallback here
    is exists-then-write: the arbitration window collapses onto the
    version-object name, so two racing writers can only both succeed
    if the backend has no atomic create at all AND both check within
    the same round-trip — the documented residual for backends without
    any conditional primitive."""

    def __init__(self, fs, root: str):
        import pyarrow.fs as pafs

        self.fs = fs
        self.root = root.rstrip("/")
        self._pafs = pafs
        fs.create_dir(self.root, recursive=True)

    def _p(self, rel: str) -> str:
        return f"{self.root}/{rel}" if rel else self.root

    def list_files(self, prefix: str = "") -> list[str]:
        sel = self._pafs.FileSelector(
            self._p(prefix), recursive=True, allow_not_found=True
        )
        out = [
            fi.path[len(self.root) + 1 :]
            for fi in self.fs.get_file_info(sel)
            if fi.type == self._pafs.FileType.File
        ]
        return sorted(out)

    def get(self, rel: str) -> bytes:
        with self.fs.open_input_file(self._p(rel)) as fh:
            return fh.read()

    def put(self, rel: str, data: bytes) -> None:
        parent = os.path.dirname(self._p(rel))
        if parent:
            self.fs.create_dir(parent, recursive=True)
        with self.fs.open_output_stream(self._p(rel)) as fh:
            fh.write(data)

    def put_if_absent(self, rel: str, data: bytes) -> bool:
        # LocalFileSystem gets a genuinely-atomic create; other
        # backends fall back to exists-then-write (see class docstring
        # — real S3 overrides this with If-None-Match)
        p = self._p(rel)
        if isinstance(self.fs, self._pafs.LocalFileSystem):
            os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
            return _atomic_create(p, data)
        if self.exists(rel):
            return False
        self.put(rel, data)
        return True

    def delete(self, rel: str) -> None:
        try:
            self.fs.delete_file(self._p(rel))
        except FileNotFoundError:
            pass

    def exists(self, rel: str) -> bool:
        fi = self.fs.get_file_info(self._p(rel))
        return fi.type != self._pafs.FileType.NotFound

    def get_manifest(self) -> Manifest | None:
        return _resolve_manifest(self)

    def put_manifest(
        self, manifest: Manifest, *, expected_version: int | None = None
    ) -> None:
        _cas_put_manifest(self, manifest, expected_version)


def _atomic_create(path: str, data: bytes) -> bool:
    """Insert-if-absent with ATOMIC content visibility: the bytes are
    fully written to a private temp file first, then published with
    ``os.link`` (fails iff the target exists; a reader that can see the
    name sees the complete contents). A bare O_CREAT|O_EXCL create
    followed by write() has a torn window — a concurrent
    ``get_manifest`` could read an empty commit object mid-publish
    (observed as a two-writer race flake)."""
    import uuid

    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "wb") as f:
        f.write(data)
    try:
        os.link(tmp, path)
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


def _manifest_bytes(m: Manifest) -> bytes:
    return json.dumps(m.to_json(), indent=1, sort_keys=True).encode()


_COMMITS = "commits"


def _commit_rel(version: int) -> str:
    return f"{_COMMITS}/manifest_{version:09d}.json"


def _resolve_manifest(store) -> Manifest | None:
    """Current manifest = the HIGHEST-versioned immutable commit object
    (authoritative — each was insert-if-absent'ed exactly once), or the
    mutable pointer when it is newer (legacy stores / unconditional
    puts that never wrote a commit object)."""
    best: Manifest | None = None
    vers = []
    for rel in store.list_files(_COMMITS):
        base = os.path.basename(rel)
        if base.startswith("manifest_") and base.endswith(".json"):
            try:
                vers.append(int(base[len("manifest_"):-len(".json")]))
            except ValueError:
                continue
    for v in sorted(vers, reverse=True):
        try:
            best = Manifest.from_json(json.loads(store.get(_commit_rel(v))))
            break
        except (ValueError, KeyError, FileNotFoundError):
            # torn/in-flight commit object on a backend without atomic
            # object visibility: the writer has not durably published v
            # yet, so the previous commit is the correct resolution
            continue
    if store.exists(MANIFEST_NAME):
        try:
            ptr = Manifest.from_json(json.loads(store.get(MANIFEST_NAME)))
        except (ValueError, KeyError):
            # torn pointer: a generic-FS put truncates in place, so a
            # concurrent reader can catch it mid-write — the immutable
            # commit objects are the authority, the pointer is only a
            # read optimization
            ptr = None
        if ptr is not None and (best is None or ptr.version > best.version):
            best = ptr
    return best


def _cas_put_manifest(
    store, manifest: Manifest, expected_version: int | None
) -> None:
    """Object-store commit = conditional put of an IMMUTABLE
    version-named object — the FDB transactional-rename analog
    (FDBDirectory.java:351-365) without POSIX: two writers racing the
    same expected_version target the SAME object name, and
    ``put_if_absent`` admits exactly one. The mutable ``manifest.json``
    is only a read-optimization pointer, refreshed after the commit
    object lands; readers resolve via the commit objects first."""
    if expected_version is None:
        store.put(MANIFEST_NAME, _manifest_bytes(manifest))
        return
    cur = store.get_manifest()
    curv = -1 if cur is None else cur.version
    if curv != expected_version:
        raise ManifestConflictError(
            f"store manifest moved to v{curv}, expected v{expected_version}"
        )
    if manifest.version < expected_version:
        raise ValueError(
            f"CAS commit must not rewind the version: new "
            f"v{manifest.version} < expected v{expected_version}"
        )
    blob = _manifest_bytes(manifest)
    if not store.put_if_absent(_commit_rel(manifest.version), blob):
        # idempotent re-publish (resume / same-version re-push /
        # replicated commit point) is fine; a DIFFERENT manifest under
        # the same version lost a race
        if store.get(_commit_rel(manifest.version)) != blob:
            raise ManifestConflictError(
                f"commit object for v{manifest.version} already exists "
                "(lost the publish race)"
            )
    store.put(MANIFEST_NAME, blob)


def _segment_files(index_dir: str, names: Iterable[str]) -> list[str]:
    out = []
    for name in names:
        seg = os.path.join(index_dir, SEGMENTS, name)
        for f in sorted(os.listdir(seg)):
            out.append(os.path.join(SEGMENTS, name, f))
    return out


def push_index(index_dir: str, store: SegmentStore, *,
               expected_version: int | None = None,
               include_commits: bool = False) -> int:
    """Upload the live manifest's segments + tombstones, then CAS-swap
    the store manifest. Incremental: a segment directory whose files
    already exist in the store is skipped (segments are immutable and
    deterministically named). ``include_commits`` replicates retained
    commit points too (their manifests + every segment/tombstone they
    pin), so point-in-time readers work against a pulled cache.
    Returns the number of files uploaded."""
    from fdblucene_ray.index.manifest import list_commits, load_manifest

    m = load_manifest(index_dir)
    uploaded = 0
    seg_names = {s.name for s in m.segments}
    tomb_files = {m.extra.get("tombstone_file")} - {None}
    dv_files = set(m.extra.get("dv_files", {}).values())
    commit_rels: list[str] = []
    if include_commits:
        for v in list_commits(index_dir):
            try:
                cm = load_manifest(index_dir, v)
            except FileNotFoundError:  # pragma: no cover
                continue
            seg_names |= {s.name for s in cm.segments}
            tf_ = cm.extra.get("tombstone_file")
            if tf_:
                tomb_files.add(tf_)
            dv_files |= set(cm.extra.get("dv_files", {}).values())
            rel = os.path.join("commits", f"manifest_{v:09d}.json")
            if os.path.exists(os.path.join(index_dir, rel)):
                commit_rels.append(rel)
    for rel in _segment_files(index_dir, sorted(seg_names)):
        if store.exists(rel):
            continue
        with open(os.path.join(index_dir, rel), "rb") as fh:
            store.put(rel, fh.read())
        uploaded += 1
    for tf in sorted(tomb_files):
        rel = os.path.join(TOMBSTONES, tf)
        if not store.exists(rel):
            with open(os.path.join(index_dir, rel), "rb") as fh:
                store.put(rel, fh.read())
            uploaded += 1
    # doc-values update generations ride replication like tombstones:
    # the manifest names them, so a replica without them is torn
    for df in sorted(dv_files):
        rel = os.path.join(DV_UPDATES, df)
        if not store.exists(rel):
            with open(os.path.join(index_dir, rel), "rb") as fh:
                store.put(rel, fh.read())
            uploaded += 1
    for rel in commit_rels:
        if not store.exists(rel):
            with open(os.path.join(index_dir, rel), "rb") as fh:
                store.put(rel, fh.read())
            uploaded += 1
    # sorted/binary doc-values sidecars the manifest names travel too
    for rel in _dv_sidecar_files(index_dir, m.extra):
        if not store.exists(rel):
            with open(os.path.join(index_dir, rel), "rb") as fh:
                store.put(rel, fh.read())
            uploaded += 1
    if expected_version is None:
        cur = store.get_manifest()
        expected_version = -1 if cur is None else cur.version
    store.put_manifest(m, expected_version=expected_version)
    return uploaded


def pull_index(store: SegmentStore, cache_dir: str, *,
               verify: bool = False,
               include_commits: bool = False) -> Manifest:
    """Materialize the store's current manifest into a local cache dir
    (search/merge then run on local memory-maps). Incremental by
    segment name; ``verify=True`` CRC-checks every pulled segment.
    ``include_commits`` also pulls replicated commit points (their
    manifests + pinned segments/tombstones) so ``Searcher(version=)``
    works on the cache. Returns the pinned manifest written to the
    cache."""
    from fdblucene_ray.index.manifest import Manifest as _M
    from fdblucene_ray.index.manifest import publish_manifest
    from fdblucene_ray.index.segment import SegmentReader

    m = store.get_manifest()
    if m is None:
        raise FileNotFoundError("store has no manifest")
    os.makedirs(cache_dir, exist_ok=True)
    extra_segs: list = []
    extra_tombs: set[str] = set()
    extra_dvs: set[str] = set()
    if include_commits:
        for rel in store.list_files("commits"):
            base = os.path.basename(rel)
            # ignore stray/partial files (e.g. a crashed upload's .tmp)
            if not (base.startswith("manifest_") and base.endswith(".json")):
                continue
            dst = os.path.join(cache_dir, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            blob = store.get(rel)
            if not os.path.exists(dst):
                with open(dst, "wb") as fh:
                    fh.write(blob)
            cm = _M.from_json(json.loads(blob))
            extra_segs.extend(cm.segments)
            tf_ = cm.extra.get("tombstone_file")
            if tf_:
                extra_tombs.add(tf_)
            extra_dvs |= set(cm.extra.get("dv_files", {}).values())
    seen = set()
    for seg in list(m.segments) + extra_segs:
        if seg.name in seen:
            continue
        seen.add(seg.name)
        dst = os.path.join(cache_dir, SEGMENTS, seg.name)
        if os.path.isdir(dst):
            continue
        tmp = dst + ".tmp-pull"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        prefix = f"{SEGMENTS}/{seg.name}/"
        for rel in store.list_files(os.path.join(SEGMENTS, seg.name)):
            assert rel.startswith(prefix)
            with open(os.path.join(tmp, rel[len(prefix):]), "wb") as fh:
                fh.write(store.get(rel))
        os.rename(tmp, dst)
        if verify:
            SegmentReader(cache_dir, seg, codec=m.codec).verify()
    tf = m.extra.get("tombstone_file")
    for tf_ in sorted(({tf} - {None}) | extra_tombs):
        rel = os.path.join(TOMBSTONES, tf_)
        dst = os.path.join(cache_dir, rel)
        if not os.path.exists(dst):
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            with open(dst, "wb") as fh:
                fh.write(store.get(rel))
    dv_pull = set(m.extra.get("dv_files", {}).values()) | extra_dvs
    for df in sorted(dv_pull):
        rel = os.path.join(DV_UPDATES, df)
        dst = os.path.join(cache_dir, rel)
        if not os.path.exists(dst):
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            with open(dst, "wb") as fh:
                fh.write(store.get(rel))
    for key, dirname in (("dv_sorted", "dv_sorted"), ("dv_binary", "dv_binary")):
        for f in sorted(m.extra.get(key, {})):
            for rel in store.list_files(os.path.join(dirname, f)):
                dst = os.path.join(cache_dir, rel)
                if not os.path.exists(dst):
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    with open(dst, "wb") as fh:
                        fh.write(store.get(rel))
    publish_manifest(cache_dir, m)
    return m


def _dv_sidecar_files(index_dir: str, extra: dict) -> list[str]:
    """Relative paths of every sorted/binary doc-values sidecar file
    the manifest's extra references."""
    rels: list[str] = []
    for key, dirname in (("dv_sorted", "dv_sorted"), ("dv_binary", "dv_binary")):
        for f in sorted(extra.get(key, {})):
            root = os.path.join(index_dir, dirname, f)
            for dirpath, _dirs, files in os.walk(root):
                for fn in sorted(files):
                    full = os.path.join(dirpath, fn)
                    rels.append(os.path.relpath(full, index_dir))
    return rels
