"""Doc-level delete: tombstones filtered at search, purged at merge.

The reference's Writer approach supports concurrent add/update/delete
(/root/reference/README.md:34-38; sparse-id insert-if-absent,
DATA.md:14-17). The Ray engine's analog is a tombstone sidecar:

- ``delete_docs`` publishes a new manifest version whose
  ``extra["tombstone_file"]`` names a sorted doc_id parquet under
  ``{index_dir}/tombstones/`` (atomic: write + publish, old file kept
  for pinned readers and swept by ``gc_index``);
- ``Searcher`` filters tombstoned docs out of every match stream
  (liveDocs semantics: collection/term statistics still include
  deleted docs until a purge — exactly Lucene's behavior);
- a FULL rewrite (``compact_index`` / ``merge_indexes``) drops the
  tombstoned postings and, via the per-doc ``doclens.parquet`` sidecar,
  subtracts their stats exactly; the merged index starts tombstone-free.

Partial (tiered) merges deliberately do NOT purge: segments are
term-sharded, so one doc's postings span many segments — purging some
would leave half-removed stats. Either a doc is fully present
(tombstone-filtered) or fully gone (full rewrite).

An update is delete(old ids) + append (``build_sharded`` with new
files) — the dense deterministic id scheme replaces the reference's
sparse insert-if-absent ids (SURVEY.md §1.4).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fdblucene_ray.index.manifest import (
    Manifest,
    load_manifest,
    publish_manifest,
)

TOMBSTONES_DIR = "tombstones"


def load_tombstones(index_dir: str, manifest: Manifest | None = None) -> np.ndarray:
    """Sorted int64 doc_id array of the live manifest's tombstone set."""
    m = manifest or load_manifest(index_dir)
    fname = m.extra.get("tombstone_file")
    if not fname:
        return np.empty(0, np.int64)
    t = pq.read_table(os.path.join(index_dir, TOMBSTONES_DIR, fname))
    return t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)


def delete_docs(index_dir: str, doc_ids) -> Manifest:
    """Tombstone ``doc_ids`` (idempotent union with the existing set)
    and publish a new manifest version. Matches become invisible to
    every Searcher opened on the new manifest; stats stay untouched
    until a full rewrite purges (Lucene liveDocs semantics)."""
    m = load_manifest(index_dir)
    prev = load_tombstones(index_dir, m)
    add = np.unique(np.asarray(list(doc_ids), np.int64))
    merged = np.union1d(prev, add)
    fname = f"tomb-v{m.version + 1:06d}.parquet"
    d = os.path.join(index_dir, TOMBSTONES_DIR)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, fname + ".tmp")
    pq.write_table(pa.table({"doc_id": pa.array(merged, pa.int64())}), tmp)
    os.replace(tmp, os.path.join(d, fname))
    m2 = Manifest(
        analyzers=m.analyzers,
        block_size=m.block_size,
        segments=m.segments,
        version=m.version + 1,
        extra={**m.extra, "tombstone_file": fname},
        codec=m.codec,
    )
    # fenced CAS publish: a concurrent writer on the same index_dir gets
    # a clean ManifestConflictError instead of silently clobbering
    publish_manifest(index_dir, m2, expected_version=m.version)
    return m2


def delete_by_term(index_dir: str, field: str, term: str) -> Manifest:
    """``IndexWriter.deleteDocuments(Term)`` analog: tombstone every doc
    whose ``field`` contains ``term`` (exact keyword / analyzed term)."""
    from fdblucene_ray.index.search import Searcher

    s = Searcher(index_dir)
    docs: list[int] = []
    for r in s.readers:
        h = r.postings_handle(field, term)
        if h is not None:
            blob, skips, n = h
            dd, _, _ = r.codec.decode_all(blob, skips, n, s.manifest.block_size)
            docs.extend(dd.tolist())
    if not docs:
        return s.manifest
    return delete_docs(index_dir, docs)


def update_documents(
    index_dir: str,
    field: str,
    term: str,
    source,
    *,
    fields: dict[str, dict] | None = None,
    num_partitions: int | None = None,
    **build_kw,
) -> Manifest:
    """``IndexWriter.updateDocument(Term, doc)`` analog (the Writer
    approach's concurrent add/update path, /root/reference/README.md:34-38;
    sparse-id insert-if-absent DATA.md:14-17): tombstone every doc
    matching ``(field, term)`` and index ``source``'s docs as new
    segments under fresh doc ids — published as ONE new manifest
    version (CAS-fenced), so the replacements become visible in the
    same snapshot that hides the old versions.

    ``fields`` must describe the same analyzer layout as the existing
    index (asserted); new doc ids start after the current maximum, so
    stored-source hydration for updated docs must use the new source.
    """
    from fdblucene_ray.index.build import build_index, default_fields
    from fdblucene_ray.index.search import Searcher

    m = load_manifest(index_dir)
    fields = fields or default_fields()
    got = {f: cfg["analyzer"] for f, cfg in fields.items()}
    if got != m.analyzers:
        raise ValueError(
            f"update fields analyzers {got} != index analyzers {m.analyzers}"
        )
    got_pos = sorted(f for f, cfg in fields.items() if cfg.get("positions"))
    if got_pos != sorted(m.extra.get("positions_fields", [])):
        raise ValueError(
            f"update fields positions {got_pos} != index positions "
            f"{m.extra.get('positions_fields', [])}"
        )

    # old versions of the updated docs (read-only scan, no publish yet)
    s = Searcher(index_dir, m)
    old: list[int] = []
    for r in s.readers:
        h = r.postings_handle(field, term)
        if h is not None:
            blob, skips, n = h
            dd, _, _ = r.codec.decode_all(blob, skips, n, m.block_size)
            old.extend(dd.tolist())

    # replacement segments under fresh ids, NOT published
    base = max((seg.doc_id_max for seg in m.segments), default=-1) + 1
    m_new = build_index(
        source,
        index_dir,
        fields=fields,
        doc_base=base,
        publish=False,
        num_partitions=num_partitions,
        block_size=m.block_size,
        codec=m.codec,
        **build_kw,
    )

    extra = {**m.extra}
    if old:
        prev = load_tombstones(index_dir, m)
        merged = np.union1d(prev, np.unique(np.asarray(old, np.int64)))
        fname = f"tomb-v{m.version + 1:06d}.parquet"
        d = os.path.join(index_dir, TOMBSTONES_DIR)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, fname + ".tmp")
        pq.write_table(pa.table({"doc_id": pa.array(merged, pa.int64())}), tmp)
        os.replace(tmp, os.path.join(d, fname))
        extra["tombstone_file"] = fname

    m2 = Manifest(
        analyzers=m.analyzers,
        block_size=m.block_size,
        segments=sorted(m.segments + m_new.segments, key=lambda x: x.name),
        version=m.version + 1,
        extra=extra,
        codec=m.codec,
    )
    publish_manifest(index_dir, m2, expected_version=m.version)
    return m2


def gc_tombstones(index_dir: str, *, dry_run: bool = False) -> list[str]:
    """Sweep tombstone files not referenced by the live manifest or any
    retained commit point (point-in-time readers pin their manifest's
    tombstone snapshot)."""
    from fdblucene_ray.index.manifest import list_commits

    m = load_manifest(index_dir)
    keep = {m.extra.get("tombstone_file")}
    for v in list_commits(index_dir):
        try:
            keep.add(load_manifest(index_dir, v).extra.get("tombstone_file"))
        except FileNotFoundError:  # pragma: no cover
            pass
    d = os.path.join(index_dir, TOMBSTONES_DIR)
    removed = []
    if os.path.isdir(d):
        for f in sorted(os.listdir(d)):
            if f not in keep:
                removed.append(f)
                if not dry_run:
                    try:
                        os.remove(os.path.join(d, f))
                    except OSError:  # pragma: no cover
                        pass
    return removed


def diff_commits(index_dir: str, v_old: int, v_new: int) -> dict:
    """Commit-point diff — what changed between two retained manifests
    (the snapshot-inspection tool an ops console wants before a
    rollback): segments added/removed, per-commit doc counts, tombstone
    delta. Pure metadata (two manifest JSONs + two tombstone sidecars);
    never touches postings."""
    mo = load_manifest(index_dir, v_old)
    mn = load_manifest(index_dir, v_new)
    so = {s.name for s in mo.segments}
    sn = {s.name for s in mn.segments}
    to = load_tombstones(index_dir, mo)
    tn = load_tombstones(index_dir, mn)
    return {
        "v_old": int(mo.version),
        "v_new": int(mn.version),
        "segments_added": sorted(sn - so),
        "segments_removed": sorted(so - sn),
        "n_postings_delta": int(
            sum(s.n_postings for s in mn.segments)
            - sum(s.n_postings for s in mo.segments)
        ),
        "tombstones_added": int(len(np.setdiff1d(tn, to))),
        "tombstones_removed": int(len(np.setdiff1d(to, tn))),
    }
