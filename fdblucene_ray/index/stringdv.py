"""Sorted / SortedSet / Binary doc values — the reference's three
missing doc-values types (/root/reference/DATA.md:38-42, explicitly
TODO there; Lucene SortedDocValues / SortedSetDocValues /
BinaryDocValues).

Layout (per field, next to the postings):

- ``{index_dir}/dv_sorted/{field}/dict.parquet`` — the GLOBAL sorted
  value dictionary; row i IS ordinal i (UTF-8 byte order == code-point
  order, so numpy/DuckDB binary collation and Lucene BytesRef order
  all agree).
- ``{index_dir}/dv_sorted/{field}/ords/*.parquet`` — (doc_id,
  ord int32) rows sorted by doc_id; SortedSet (``multi=True``) emits
  one row per (doc, distinct value). Query-time lookups for a matched
  id set read ONLY the row groups whose min/max stats can contain the
  ids (same pruning as the stored-field hydrate, J3).
- ``{index_dir}/dv_binary/{field}/*.parquet`` — (doc_id, value binary)
  rows, same pruned-read path.

Scale shape: the build streams the corpus exactly twice (compact
per-batch distinct partials, then a broadcast-dictionary ord
assignment); only the dictionary itself (cardinality-bounded, NOT
corpus-bounded) ever lands on the driver, with a hard cap that fails
loudly rather than OOMing. Ordinal comparisons make DESCENDING string
sort trivial (negate the ordinal) — the exact limitation
``search_sort_multi`` documents for raw string columns.

The manifest records each sidecar under ``extra["dv_sorted"]`` /
``extra["dv_binary"]`` via a CAS publish, so replication/export can
carry them and concurrent writers don't clobber.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from fdblucene_ray.index.manifest import (
    Manifest,
    ManifestConflictError,
    load_manifest,
    publish_manifest,
)

DV_SORTED_DIR = "dv_sorted"
DV_BINARY_DIR = "dv_binary"


def _as_dataset(source, columns):
    if isinstance(source, ray.data.Dataset):
        return source
    return ray.data.read_parquet(source, columns=columns)


def _flatten(batch: pa.Table, id_col: str, column: str, multi: bool):
    """(doc_ids, values) with list columns exploded to one row per
    (doc, DISTINCT value) when multi."""
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    vals = batch[column]
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    idn = ids.to_numpy(zero_copy_only=False).astype(np.int64)
    if not multi:
        return idn, np.asarray(vals.to_pylist(), dtype=object)
    counts = np.asarray(
        pc.list_value_length(vals).to_numpy(zero_copy_only=False), np.int64
    )
    flat = np.asarray(vals.flatten().to_pylist(), dtype=object)
    rep = np.repeat(idn, counts)
    # per-doc distinct: sort by (doc, value) and drop duplicate runs
    order = np.lexsort((flat, rep))
    rep, flat = rep[order], flat[order]
    if len(rep):
        keep = np.r_[True, (rep[1:] != rep[:-1]) | (flat[1:] != flat[:-1])]
        rep, flat = rep[keep], flat[keep]
    return rep, flat


def _publish_extra(index_dir: str, key: str, field: str, meta: dict):
    """CAS-merge one sidecar record into the live manifest."""
    for _ in range(16):
        m = load_manifest(index_dir)
        extra = dict(m.extra)
        extra[key] = {**extra.get(key, {}), field: meta}
        m2 = Manifest(
            analyzers=m.analyzers, block_size=m.block_size,
            segments=m.segments, version=m.version + 1,
            codec=m.codec, extra=extra,
        )
        try:
            publish_manifest(index_dir, m2, expected_version=m.version)
            return m2
        except ManifestConflictError:
            continue
    raise ManifestConflictError(f"could not record {key}[{field}]")


def build_sorted_dv(
    index_dir: str,
    field: str,
    source,
    column: str | None = None,
    *,
    id_col: str = "doc_id",
    multi: bool = False,
    preprocess=None,
    max_dict_size: int = 5_000_000,
) -> Manifest:
    """Build the Sorted (or SortedSet, ``multi=True``) doc-values
    sidecar for ``field`` from a parquet source / Dataset column."""
    column = column or field
    cols = None if preprocess else [id_col, column]
    ds = _as_dataset(source, cols)
    if preprocess:
        ds = ds.map_batches(preprocess, batch_format="pyarrow")

    def uniq(b: pa.Table) -> pa.Table:
        _, vals = _flatten(b, id_col, column, multi)
        u = np.unique(vals)
        return pa.table({"value": pa.array(list(u), pa.string())})

    parts = ds.map_batches(uniq, batch_format="pyarrow").take_all()
    vocab = np.unique(np.asarray([r["value"] for r in parts], dtype=object))
    if len(vocab) > max_dict_size:
        raise ValueError(
            f"sorted-dv dictionary for {field!r} has {len(vocab)} values "
            f"(> max_dict_size={max_dict_size}); a dictionary that large "
            "needs the per-segment-ords + ord-remap merge design"
        )
    d = os.path.join(index_dir, DV_SORTED_DIR, field)
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table({"value": pa.array(list(vocab), pa.string())}),
        os.path.join(d, "dict.parquet"),
    )
    vocab_ref = ray.put(vocab)

    def to_ords(b: pa.Table) -> pa.Table:
        v = ray.get(vocab_ref)
        ids, vals = _flatten(b, id_col, column, multi)
        ords = np.searchsorted(v, vals).astype(np.int32)
        return pa.table(
            {"doc_id": pa.array(ids), "ord": pa.array(ords)}
        )

    ords_dir = os.path.join(d, "ords")
    import shutil

    shutil.rmtree(ords_dir, ignore_errors=True)
    ds.map_batches(to_ords, batch_format="pyarrow").write_parquet(ords_dir)
    return _publish_extra(
        index_dir, "dv_sorted", field,
        {"multi": bool(multi), "cardinality": int(len(vocab))},
    )


def load_sorted_dict(index_dir: str, field: str) -> np.ndarray:
    t = pq.read_table(
        os.path.join(index_dir, DV_SORTED_DIR, field, "dict.parquet")
    )
    return np.asarray(t["value"].to_pylist(), dtype=object)


def sorted_dv_rows(
    index_dir: str, field: str, ids: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, ords) rows for a matched id set, row-group pruned;
    multi-valued fields return several rows per doc."""
    import pyarrow.dataset as pads

    ords_dir = os.path.join(index_dir, DV_SORTED_DIR, field, "ords")
    dataset = pads.dataset(ords_dir, format="parquet")
    t = dataset.to_table(
        filter=pc.field("doc_id").isin(sorted(int(i) for i in ids))
    )
    return (
        t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
        t["ord"].to_numpy(zero_copy_only=False).astype(np.int64),
    )


def build_binary_dv(
    index_dir: str,
    field: str,
    source,
    column: str | None = None,
    *,
    id_col: str = "doc_id",
    preprocess=None,
) -> Manifest:
    """BinaryDocValues sidecar: per-doc opaque bytes, pruned-read by
    doc id at query time (scoring payloads, serialized features)."""
    column = column or field
    cols = None if preprocess else [id_col, column]
    ds = _as_dataset(source, cols)
    if preprocess:
        ds = ds.map_batches(preprocess, batch_format="pyarrow")

    def project(b: pa.Table) -> pa.Table:
        vals = b[column]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        if not pa.types.is_binary(vals.type) and not pa.types.is_large_binary(
            vals.type
        ):
            vals = vals.cast(pa.binary())
        return pa.table(
            {"doc_id": b[id_col].cast(pa.int64()), "value": vals}
        )

    d = os.path.join(index_dir, DV_BINARY_DIR, field)
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    ds.map_batches(project, batch_format="pyarrow").write_parquet(d)
    return _publish_extra(index_dir, "dv_binary", field, {})


def binary_dv_values(
    index_dir: str, field: str, ids: np.ndarray
) -> list[bytes]:
    """Bytes per id, aligned to ``ids`` order; missing ids raise."""
    import pyarrow.dataset as pads

    d = os.path.join(index_dir, DV_BINARY_DIR, field)
    t = pads.dataset(d, format="parquet").to_table(
        filter=pc.field("doc_id").isin(sorted(int(i) for i in ids))
    )
    got_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(got_ids)
    gid = got_ids[order]
    pos = np.searchsorted(gid, np.asarray(ids, np.int64))
    ok = (
        np.zeros(len(ids), bool)
        if not len(gid)
        else gid[np.minimum(pos, len(gid) - 1)] == np.asarray(ids, np.int64)
    )
    if not ok.all():
        missing = np.asarray(ids)[~ok]
        raise ValueError(
            f"binary dv {field!r} missing {len(missing)} doc ids "
            f"(e.g. {missing[:5].tolist()})"
        )
    vals = t["value"].to_pylist()
    return [vals[order[p]] for p in pos]
