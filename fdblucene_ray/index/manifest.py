"""Index manifest: the commit point of a build.

The reference publishes an index state by atomically renaming the
Lucene segments file inside one FDB transaction
(FDBDirectory.java:351-365 — "rename" is the single linearization
point). Here the analog is a JSON manifest listing the live segments
plus aggregated collection statistics, published by writing
``manifest.json.tmp`` and ``os.replace``-ing it over ``manifest.json``
(atomic on POSIX; on an object store this maps to a conditional put).

Per-partition lineage records (``lineage/{signature}/part-N.json``)
are written *before* a partition's segment is eligible for the
manifest, making builds resumable: a re-run with the same input
signature skips partitions whose lineage + files verify
(north_rule checkpoint-resumability; reference analog: uncommitted
files are invisible until the segments-file rename, README.md:71-86).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any

MANIFEST_NAME = "manifest.json"
FORMAT_VERSION = 1


class ManifestConflictError(RuntimeError):
    """A fenced publish lost the race: the live manifest version moved
    past ``expected_version`` (another writer committed first). The
    analog of the reference's FDBLock fencing — insert-if-absent lock
    record + uuid fence (FDBLock.java:41-61, 94-109) — where the loser
    gets a clean conflict instead of silently clobbering."""


class ManifestLockHeldError(RuntimeError):
    """The publish lock could not be acquired within the timeout."""


@dataclass
class SegmentMeta:
    name: str
    n_terms: int
    n_postings: int
    # per-field stats: field -> {"dc": docs-with-tokens, "sum_dl": total tokens,
    #                            "sdf": postings count}
    field_stats: dict[str, dict[str, int]]
    postings_crc: int
    skips_crc: int
    doc_id_min: int
    doc_id_max: int

    def to_json(self) -> dict[str, Any]:
        return dict(self.__dict__)

    @staticmethod
    def from_json(d: dict[str, Any]) -> "SegmentMeta":
        return SegmentMeta(**d)


@dataclass
class Manifest:
    analyzers: dict[str, str]  # field -> analyzer name
    block_size: int
    segments: list[SegmentMeta] = field(default_factory=list)
    version: int = 0
    extra: dict[str, Any] = field(default_factory=dict)
    # postings codec name (U3 codec-SPI analog): resolved through
    # codec/registry.py on open; unknown names fail loudly
    codec: str = "varint-block"

    def field_totals(self) -> dict[str, dict[str, int]]:
        """Collection-wide per-field stats, summed across live segments
        (Lucene semantics: collection statistics aggregate over segments,
        SURVEY.md §2.5 A2/A3) plus any merge-carried base stats
        (``extra["base_field_stats"]`` — a merge sums its sources' dc and
        sum_dl instead of re-tokenizing, see index/merge.py)."""
        out: dict[str, dict[str, int]] = {}
        for seg in self.segments:
            for f, st in seg.field_stats.items():
                acc = out.setdefault(f, {"dc": 0, "sum_dl": 0, "sdf": 0})
                for k in acc:
                    acc[k] += st.get(k, 0)
        for f, st in self.extra.get("base_field_stats", {}).items():
            acc = out.setdefault(f, {"dc": 0, "sum_dl": 0, "sdf": 0})
            for k in acc:
                acc[k] += st.get(k, 0)
        return out

    def to_json(self) -> dict[str, Any]:
        return {
            "format_version": FORMAT_VERSION,
            "version": self.version,
            "analyzers": self.analyzers,
            "block_size": self.block_size,
            "codec": self.codec,
            "segments": [s.to_json() for s in self.segments],
            "extra": self.extra,
        }

    @staticmethod
    def from_json(d: dict[str, Any]) -> "Manifest":
        return Manifest(
            analyzers=d["analyzers"],
            block_size=d["block_size"],
            segments=[SegmentMeta.from_json(s) for s in d["segments"]],
            version=d.get("version", 0),
            extra=d.get("extra", {}),
            codec=d.get("codec", "varint-block"),
        )


def manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, MANIFEST_NAME)


COMMITS_DIR = "commits"


def commit_path(index_dir: str, version: int) -> str:
    return os.path.join(index_dir, COMMITS_DIR, f"manifest_{version:09d}.json")


def load_manifest(index_dir: str, version: int | None = None) -> Manifest:
    """Live manifest, or — with ``version`` — a retained COMMIT POINT
    (Lucene ``segments_N`` / ``DirectoryReader.open(IndexCommit)``
    analog): every publish also persists ``commits/manifest_N.json``,
    so readers can pin a point-in-time snapshot until it is pruned
    (``prune_commits``) and swept (``gc_index``)."""
    if version is None:
        with open(manifest_path(index_dir)) as f:
            return Manifest.from_json(json.load(f))
    p = commit_path(index_dir, version)
    try:
        with open(p) as f:
            return Manifest.from_json(json.load(f))
    except FileNotFoundError:
        live = load_manifest(index_dir)
        if live.version == version:
            return live
        raise FileNotFoundError(
            f"commit point {version} not found at {p} (pruned, or the "
            f"index predates commit retention); live version is "
            f"{live.version}, retained: {list_commits(index_dir)}"
        ) from None


def list_commits(index_dir: str) -> list[int]:
    """Retained commit-point versions, ascending (the live version is
    always included)."""
    d = os.path.join(index_dir, COMMITS_DIR)
    versions = set()
    if os.path.isdir(d):
        for f in os.listdir(d):
            if f.startswith("manifest_") and f.endswith(".json"):
                versions.add(int(f[len("manifest_"):-len(".json")]))
    try:
        versions.add(load_manifest(index_dir).version)
    except FileNotFoundError:
        pass
    return sorted(versions)


def prune_commits(index_dir: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` commit points (the live
    version is never dropped). Returns pruned versions; run
    ``gc_index`` afterwards to sweep segments only they referenced —
    the IndexDeletionPolicy analog (default Lucene keeps only the last
    commit; a snapshot policy keeps more)."""
    live = load_manifest(index_dir).version
    keep = set(list_commits(index_dir)[-max(1, keep_last):]) | {live}
    pruned = []
    for v in list_commits(index_dir):
        if v not in keep:
            try:
                os.remove(commit_path(index_dir, v))
                pruned.append(v)
            except OSError:  # pragma: no cover
                pass
    return pruned


def publish_manifest(
    index_dir: str,
    manifest: Manifest,
    *,
    expected_version: int | None = None,
    lock_timeout_s: float = 10.0,
) -> None:
    """Atomic manifest swap — the engine's ``rename`` commit.

    With ``expected_version`` the publish is a compare-and-swap: the
    live manifest's version must still equal it under an exclusive
    publish lock, else ``ManifestConflictError``. Every read-modify-
    write publisher (delete, in-place merge, drop) passes the version
    it read, so two concurrent writers on one index_dir can no longer
    silently clobber each other (FDBLock.java:41-61 analog; on an
    object store this maps to a conditional put / ETag match).
    """
    os.makedirs(index_dir, exist_ok=True)
    if expected_version is None:
        _write_manifest(index_dir, manifest)
        return
    import time as _time
    import uuid as _uuid

    lock = manifest_path(index_dir) + ".lock"
    fence = _uuid.uuid4().hex
    deadline = _time.monotonic() + lock_timeout_s
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, fence.encode())
            os.close(fd)
            break
        except FileExistsError:
            if _time.monotonic() >= deadline:
                raise ManifestLockHeldError(
                    f"publish lock {lock} held past {lock_timeout_s}s; "
                    "remove it manually if the holder crashed"
                )
            _time.sleep(0.02)
    try:
        current = -1
        if os.path.exists(manifest_path(index_dir)):
            current = load_manifest(index_dir).version
        if current != expected_version:
            raise ManifestConflictError(
                f"manifest version moved: expected {expected_version}, "
                f"live is {current} — reload and retry"
            )
        _write_manifest(index_dir, manifest)
    finally:
        # uuid fence: only remove the lock we created (a crashed-holder
        # manual cleanup plus our timeout window could have replaced it)
        try:
            with open(lock) as f:
                if f.read() == fence:
                    os.remove(lock)
        except OSError:  # pragma: no cover
            pass


def _write_manifest(index_dir: str, manifest: Manifest) -> None:
    tmp = manifest_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest.to_json(), f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    # retain the commit point FIRST, then swap the live pointer — a
    # crash in between leaves an extra commit file, never a live
    # manifest without its commit copy
    cpath = commit_path(index_dir, manifest.version)
    os.makedirs(os.path.dirname(cpath), exist_ok=True)
    ctmp = cpath + ".tmp"
    with open(ctmp, "w") as f:
        json.dump(manifest.to_json(), f, indent=1, sort_keys=True)
    os.replace(ctmp, cpath)
    os.replace(tmp, manifest_path(index_dir))


def gc_index(index_dir: str, *, dry_run: bool = False) -> list[str]:
    """Remove segment directories not referenced by the live manifest
    OR any retained commit point — the sweep phase of the reference's
    delete tolerance (D4: uncommitted writes never become visible,
    FDBIndexOutput.java:182-189; here, orphaned segment dirs from
    crashed/aborted runs are GC'd, and point-in-time commits keep their
    segments alive until ``prune_commits``). Lineage records of other
    signatures are kept (they enable resume)."""
    import shutil

    live = {s.name for s in load_manifest(index_dir).segments}
    for v in list_commits(index_dir):
        try:
            live |= {s.name for s in load_manifest(index_dir, v).segments}
        except FileNotFoundError:  # pragma: no cover - pruned mid-scan
            pass
    seg_root = os.path.join(index_dir, "segments")
    removed = []
    if os.path.isdir(seg_root):
        for name in sorted(os.listdir(seg_root)):
            if name not in live:
                removed.append(name)
                if not dry_run:
                    shutil.rmtree(os.path.join(seg_root, name), ignore_errors=True)
    return removed


def drop_segments(index_dir: str, names: list[str]) -> "Manifest":
    """Publish a new manifest without ``names`` (deleteFile analog, S11);
    the dropped segment dirs become garbage for gc_index."""
    m = load_manifest(index_dir)
    keep = [s for s in m.segments if s.name not in set(names)]
    m2 = Manifest(
        analyzers=m.analyzers, block_size=m.block_size, segments=keep,
        version=m.version + 1, extra=m.extra, codec=m.codec,
    )
    publish_manifest(index_dir, m2, expected_version=m.version)
    return m2


def lineage_dir(index_dir: str, signature: str) -> str:
    return os.path.join(index_dir, "lineage", signature)


def lineage_path(index_dir: str, signature: str, part: int) -> str:
    return os.path.join(lineage_dir(index_dir, signature), f"part-{part:05d}.json")


def write_lineage(index_dir: str, signature: str, part: int, record: dict) -> None:
    d = lineage_dir(index_dir, signature)
    os.makedirs(d, exist_ok=True)
    tmp = lineage_path(index_dir, signature, part) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f, sort_keys=True)
    os.replace(tmp, lineage_path(index_dir, signature, part))


def read_lineage(index_dir: str, signature: str, part: int) -> dict | None:
    p = lineage_path(index_dir, signature, part)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None


def export_commit(index_dir: str, out_dir: str, version: int | None = None) -> "Manifest":
    """Clone an index AT A COMMIT POINT into a fresh directory — the
    snapshot-export/backup tool (Lucene SnapshotDeletionPolicy + copy
    semantics): only the segments (and tombstone sidecar) the chosen
    manifest references are copied; the clone's live manifest IS that
    commit, with history reset to a single commit point. Pure file
    copies — postings are immutable so no re-encode happens; at object-
    store scale the copies become server-side puts (index/store.py)."""
    import shutil

    m = load_manifest(index_dir, version)
    os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)
    for s in m.segments:
        src = os.path.join(index_dir, "segments", s.name)
        dst = os.path.join(out_dir, "segments", s.name)
        if not os.path.exists(dst):
            tmp = dst + ".tmp-export"
            shutil.copytree(src, tmp)
            os.replace(tmp, dst)
    tf = (m.extra or {}).get("tombstone_file")
    if tf:
        sdir = os.path.join(out_dir, "tombstones")
        os.makedirs(sdir, exist_ok=True)
        shutil.copy2(
            os.path.join(index_dir, "tombstones", tf),
            os.path.join(sdir, tf),
        )
    # doc-values update generations the manifest references travel too
    for df in sorted((m.extra or {}).get("dv_files", {}).values()):
        ddir = os.path.join(out_dir, "dv_updates")
        os.makedirs(ddir, exist_ok=True)
        dst = os.path.join(ddir, df)
        if not os.path.exists(dst):
            shutil.copy2(os.path.join(index_dir, "dv_updates", df), dst)
    # sorted/binary doc-values sidecar dirs too
    for key in ("dv_sorted", "dv_binary"):
        for f in sorted((m.extra or {}).get(key, {})):
            src = os.path.join(index_dir, key, f)
            dst = os.path.join(out_dir, key, f)
            if os.path.isdir(src) and not os.path.exists(dst):
                tmp = dst + ".tmp-export"
                shutil.rmtree(tmp, ignore_errors=True)
                shutil.copytree(src, tmp)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.replace(tmp, dst)
    clone = Manifest(
        analyzers=m.analyzers, block_size=m.block_size,
        segments=m.segments, version=0, extra=m.extra, codec=m.codec,
    )
    publish_manifest(out_dir, clone)
    return clone
