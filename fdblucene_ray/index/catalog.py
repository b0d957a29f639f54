"""Multi-index catalog — the reference's deployment shape.

fdblucene serves MANY Lucene directories on one FoundationDB cluster
(one per Cloudant database/search view; ``FDBDirectory.open(subspace)``
carves a keyspace per index). The Ray-native analog: a catalog root
directory with one immutable-segment index per name, plus the
management verbs an operator needs — create/open/list/drop/gc — and
cross-index search (per-index top-k, or a federated MultiReader view
when doc-id spaces are disjoint).

Everything here is metadata orchestration over the existing engine:
creation delegates to ``build_index`` (same streaming pipeline), reads
pin manifest snapshots, and ``drop`` is an atomic rename into a
trash dir followed by deferred deletion (so an in-flight Searcher
holding file handles never sees files vanish mid-read — the analog of
the reference's transactional directory deletion).
"""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa

from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.manifest import gc_index, list_commits, load_manifest
from fdblucene_ray.index.search import Searcher

_TRASH = "_trash"


class Catalog:
    """A named-index catalog rooted at one directory."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str) -> str:
        if not name or name.startswith("_") or "/" in name or "\x00" in name:
            raise ValueError(f"invalid index name: {name!r}")
        return os.path.join(self.root, name)

    # ---- lifecycle ----
    def create(self, name: str, source, **build_kw) -> str:
        """Build (or incrementally rebuild at a new version) the named
        index from a parquet source. Returns the index dir."""
        path = self._path(name)
        build_index(source, path, **build_kw)
        return path

    def exists(self, name: str) -> bool:
        try:
            path = self._path(name)
        except ValueError:
            return False
        return os.path.exists(os.path.join(path, "manifest.json")) or (
            os.path.isdir(os.path.join(path, "commits"))
        )

    def open(self, name: str, version: int | None = None, **kw) -> Searcher:
        if not self.exists(name):
            raise FileNotFoundError(f"no index named {name!r}")
        return Searcher(self._path(name), version=version, **kw)

    def list(self) -> pa.Table:
        """(name, version, n_segments, n_docs) per live index."""
        names, versions, nsegs, ndocs = [], [], [], []
        for n in sorted(os.listdir(self.root)):
            if n.startswith("_") or not os.path.isdir(
                os.path.join(self.root, n)
            ):
                continue
            try:
                m = load_manifest(os.path.join(self.root, n))
            except FileNotFoundError:
                continue
            names.append(n)
            versions.append(int(m.version))
            nsegs.append(len(m.segments))
            tot = m.field_totals()
            ndocs.append(
                int(max((st.get("dc", 0) for st in tot.values()), default=0))
            )
        return pa.table(
            {
                "name": pa.array(names, pa.string()),
                "version": pa.array(versions, pa.int64()),
                "n_segments": pa.array(nsegs, pa.int64()),
                "n_docs": pa.array(ndocs, pa.int64()),
            }
        )

    def drop(self, name: str) -> None:
        """Atomic unlink: rename into the trash dir (one rename — an
        open Searcher keeps reading its mmap'd segments safely), then
        best-effort physical delete."""
        path = self._path(name)
        if not os.path.isdir(path):
            raise FileNotFoundError(f"no index named {name!r}")
        trash = os.path.join(self.root, _TRASH)
        os.makedirs(trash, exist_ok=True)
        dst = os.path.join(trash, f"{name}-{int(time.time() * 1e6)}")
        os.rename(path, dst)
        shutil.rmtree(dst, ignore_errors=True)

    def gc(self, name: str) -> list[str]:
        return gc_index(self._path(name))

    def commits(self, name: str) -> list[int]:
        return list_commits(self._path(name))

    # ---- cross-index search ----
    def search_each(
        self, names: list[str], query: str, k: int = 10, **kw
    ) -> pa.Table:
        """Per-index top-k (the Cloudant shape: each database's index
        answers independently): (name, doc_id, score) rows. Each leg is
        the ordinary block-max WAND path against that index's OWN
        collection statistics."""
        out_n, out_d, out_s = [], [], []
        for n in names:
            s = self.open(n)
            for d, sc in s.search(query, k, **kw):
                out_n.append(n)
                out_d.append(int(d))
                out_s.append(float(sc))
        return pa.table(
            {
                "name": pa.array(out_n, pa.string()),
                "doc_id": pa.array(out_d, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    def open_multi(self, names: list[str], **kw) -> Searcher:
        """Federated MultiReader over the named indexes (requires
        disjoint doc-id spaces — build with doc_base offsets)."""
        return Searcher.multi([self._path(n) for n in names], **kw)
