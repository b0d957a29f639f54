"""In-place numeric doc-values updates: change a per-doc numeric field
WITHOUT reindexing any postings.

Lucene supports this natively (``IndexWriter.updateNumericDocValue``):
each update batch writes a new doc-values *generation* file next to the
unchanged segment; readers overlay the newest generation over the base
column, and a merge bakes the overlay into the rewritten segment. It is
the canonical "mutable popularity/price field on an immutable index"
feature, and it maps directly onto the reference's KV substrate (a
doc-values update there is one transactional key write,
/root/reference/README.md:34-38 Writer concurrent add/update/delete).

The Ray engine's analog mirrors the tombstone sidecar
(``index/delete.py``):

- ``update_numeric_docvalues`` publishes a new manifest version whose
  ``extra["dv_files"][field]`` names a sorted ``(doc_id, value)``
  parquet generation under ``{index_dir}/dv_updates/``. Each generation
  holds the FULL coalesced overlay (last-write-wins merge with the
  previous generation), so readers open exactly ONE file per field.
- Read side: ``load_dv_overlay`` + ``overlay_values`` patch hydrated
  base values for matched ids; ``Searcher.search_sort_by`` /
  ``search_function_score`` take ``dv_field=`` and apply the overlay
  both on the driver merge and inside the streaming per-batch top-k
  (the overlay is update-sized, broadcast with the match set — the
  corpus itself never rewrites).
- A FULL in-place rewrite (``merge_segments_inplace`` over every live
  segment) folds the overlay into the docstore column and drops the
  sidecar — Lucene's merge-bakes-dv-gen behavior; partial merges carry
  it forward untouched.

Idempotent: publishing the same updates twice produces a generation
with identical content; the second call detects it and skips the
publish (safe under driver retries).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fdblucene_ray.index.manifest import (
    Manifest,
    load_manifest,
    publish_manifest,
)

DV_DIR = "dv_updates"


def load_dv_overlay(
    index_dir: str, field: str, manifest: Manifest | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """(sorted doc_ids, values) of the manifest's overlay for ``field``
    — empty arrays when the field has no pending updates."""
    m = manifest or load_manifest(index_dir)
    fname = m.extra.get("dv_files", {}).get(field)
    if not fname:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    t = pq.read_table(os.path.join(index_dir, DV_DIR, fname))
    return (
        t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
        t["value"].to_numpy(zero_copy_only=False).astype(np.float64),
    )


def overlay_values(
    ids: np.ndarray,
    vals: np.ndarray,
    ov_ids: np.ndarray,
    ov_vals: np.ndarray,
) -> np.ndarray:
    """Return ``vals`` with positions whose ``ids`` appear in the
    (sorted) overlay replaced by the overlay value. Vectorized:
    searchsorted membership, no Python loop."""
    if not len(ov_ids) or not len(ids):
        return vals
    pos = np.searchsorted(ov_ids, ids)
    pos_c = np.minimum(pos, len(ov_ids) - 1)
    hit = ov_ids[pos_c] == ids
    out = vals.astype(np.float64, copy=True)
    out[hit] = ov_vals[pos_c[hit]]
    return out


def update_numeric_docvalues(
    index_dir: str, field: str, updates: dict[int, float]
) -> Manifest:
    """Publish a new doc-values generation for ``field`` holding the
    previous overlay merged with ``updates`` (last write wins). The
    postings, norms and collection statistics are untouched — exactly
    Lucene's updateNumericDocValue contract (scoring via norms keeps
    the ORIGINAL tokenized lengths; only the doc-values column moves).
    """
    if not updates:
        return load_manifest(index_dir)
    m = load_manifest(index_dir)
    prev_ids, prev_vals = load_dv_overlay(index_dir, field, m)
    up_ids = np.fromiter(updates.keys(), np.int64, len(updates))
    up_vals = np.fromiter(
        (updates[int(k)] for k in up_ids), np.float64, len(up_ids)
    )
    order = np.argsort(up_ids, kind="stable")
    up_ids, up_vals = up_ids[order], up_vals[order]
    # last-write-wins coalesce: previous entries not re-updated survive
    keep = ~np.isin(prev_ids, up_ids)
    ids = np.concatenate([prev_ids[keep], up_ids])
    vals = np.concatenate([prev_vals[keep], up_vals])
    order = np.argsort(ids, kind="stable")
    ids, vals = ids[order], vals[order]
    if (
        len(ids) == len(prev_ids)
        and np.array_equal(ids, prev_ids)
        and np.array_equal(vals, prev_vals)
    ):
        return m  # idempotent re-publish of identical content
    # Per-writer unique nonce in BOTH the tmp and the final name. Two
    # racing updaters that read the same base version must never share
    # a path: a shared tmp loses one writer's bytes before publish
    # (observed as FileNotFoundError on os.replace), and a shared FINAL
    # name lets the CAS loser overwrite the winner's already-published
    # generation content — a silent lost update. The manifest names the
    # exact file, so uniqueness is all that's required; the CAS on
    # publish_manifest below arbitrates which generation becomes live.
    nonce = uuid.uuid4().hex[:8]
    fname = f"dv-{field}-v{m.version + 1:06d}-{nonce}.parquet"
    d = os.path.join(index_dir, DV_DIR)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{nonce}-" + fname)
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "value": pa.array(vals)}
        ),
        tmp,
    )
    os.replace(tmp, os.path.join(d, fname))
    dv_files = {**m.extra.get("dv_files", {}), field: fname}
    m2 = Manifest(
        analyzers=m.analyzers,
        block_size=m.block_size,
        segments=m.segments,
        version=m.version + 1,
        extra={**m.extra, "dv_files": dv_files},
        codec=m.codec,
    )
    publish_manifest(index_dir, m2, expected_version=m.version)
    return m2


def fold_dv_into_docstore(index_dir: str, manifest: Manifest) -> dict:
    """Bake every pending overlay whose field matches a docstore column
    into ``{index_dir}/docstore`` (atomic dir swap) and return the
    remaining ``dv_files`` map (fields without a docstore column are
    carried forward). Called by full in-place merges — the Lucene
    merge-folds-dv-generations behavior."""
    import shutil

    dv_files = dict(manifest.extra.get("dv_files", {}))
    store = os.path.join(index_dir, "docstore")
    if not dv_files or not os.path.isdir(store):
        return dv_files
    import pyarrow.dataset as pads

    ds_schema = pads.dataset(store).schema
    foldable = [f for f in dv_files if f in ds_schema.names]
    if not foldable:
        return dv_files
    overlays = {
        f: load_dv_overlay(index_dir, f, manifest) for f in foldable
    }
    # Fold policy for integer docstore columns receiving fractional
    # updates (update_numeric_docvalues accepts dict[int, float]): a
    # default safe cast would raise ArrowInvalid mid-merge. Decide ONCE
    # per field, before touching any file, so every docstore shard gets
    # the same schema: promote the column to float64 iff any overlay
    # value is non-integral; otherwise keep the original type.
    promote = {
        f: pa.types.is_integer(ds_schema.field(f).type)
        and not np.all(np.equal(np.mod(ov_vals, 1.0), 0.0))
        for f, (_ids, ov_vals) in overlays.items()
    }
    tmp = store + ".fold-tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    files = sorted(
        fn for fn in os.listdir(store) if fn.endswith(".parquet")
    )
    for fn in files:
        t = pq.read_table(os.path.join(store, fn))
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        for f, (ov_ids, ov_vals) in overlays.items():
            base = t[f].to_numpy(zero_copy_only=False).astype(np.float64)
            patched = overlay_values(ids, base, ov_ids, ov_vals)
            col_type = (
                pa.float64() if promote[f] else t.schema.field(f).type
            )
            t = t.set_column(
                t.schema.get_field_index(f),
                f,
                pa.array(patched).cast(col_type),
            )
        pq.write_table(t, os.path.join(tmp, fn))
    old = store + ".fold-old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(store, old)
    os.rename(tmp, store)
    shutil.rmtree(old, ignore_errors=True)
    for f in foldable:
        dv_files.pop(f)
    return dv_files


def gc_dv_files(index_dir: str, *, dry_run: bool = False) -> list[str]:
    """Sweep doc-values generations not referenced by the live manifest
    or any retained commit point (mirrors ``gc_tombstones``)."""
    from fdblucene_ray.index.manifest import list_commits

    m = load_manifest(index_dir)
    keep = set(m.extra.get("dv_files", {}).values())
    for v in list_commits(index_dir):
        try:
            keep |= set(
                load_manifest(index_dir, v).extra.get("dv_files", {}).values()
            )
        except FileNotFoundError:  # pragma: no cover
            pass
    d = os.path.join(index_dir, DV_DIR)
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
