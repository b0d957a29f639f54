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
    """(doc_ids, dictionary codes, batch dictionary values) with list
    columns exploded to one row per (doc, DISTINCT value) when multi.
    Fully Arrow/numpy: the values are dictionary-encoded ONCE per
    batch (``pc.dictionary_encode`` — vectorized byte-exact grouping)
    and all per-row work happens on the integer codes; the string
    payload appears only as the batch-local dictionary (unique values,
    typically far smaller than the rows)."""
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    vals = batch[column]
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    idn = ids.to_numpy(zero_copy_only=False).astype(np.int64)
    if multi:
        counts = np.asarray(
            pc.list_value_length(vals).to_numpy(zero_copy_only=False),
            np.int64,
        )
        idn = np.repeat(idn, counts)
        vals = vals.flatten()
    de = vals.dictionary_encode()
    codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dvals = de.dictionary
    if multi and len(idn):
        # per-doc distinct: code equality == value equality, so one
        # integer lexsort + run heads suffice (no object arrays)
        order = np.lexsort((codes, idn))
        idn, codes = idn[order], codes[order]
        keep = np.r_[True, (idn[1:] != idn[:-1]) | (codes[1:] != codes[:-1])]
        idn, codes = idn[keep], codes[keep]
    return idn, codes, dvals


def _sorted_unique(vals: pa.Array) -> pa.Array:
    """UTF-8 byte-order sorted distinct values of a string array
    (byte order == code-point order, matching numpy/DuckDB/Lucene)."""
    u = pc.unique(vals)
    return u.take(pc.array_sort_indices(u))


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
    force_segmented: bool = False,
) -> Manifest:
    """Build the Sorted (or SortedSet, ``multi=True``) doc-values
    sidecar for ``field`` from a parquet source / Dataset column.

    Two build shapes, SAME on-disk artifact (global sorted
    ``dict.parquet`` + ``ords/``; the query path never knows which ran):

    - dictionary fits ``max_dict_size``: the fast path — the vocab
      broadcasts once (``ray.put``) and a second corpus pass assigns
      global ordinals directly.
    - dictionary exceeds the cap (or ``force_segmented``): the
      PER-SEGMENT path (Lucene OrdinalMap analog) — each shard writes
      its own sorted local dictionary + local ords (driver never holds
      any values), a distributed value sort streams the global
      dictionary through the driver one batch at a time into
      ``dict.parquet``, and per-shard remap tasks rewrite local ords
      to global by streaming the global dictionary's row groups
      against their (small) local dict — memory bounded by one row
      group everywhere. See ``merge_sorted_dv_segments``."""
    column = column or field
    cols = None if preprocess else [id_col, column]
    ds = _as_dataset(source, cols)
    if preprocess:
        ds = ds.map_batches(preprocess, batch_format="pyarrow")

    def uniq(b: pa.Table) -> pa.Table:
        _, _, dvals = _flatten(b, id_col, column, multi)
        return pa.table({"value": pc.cast(dvals, pa.string())})

    d = os.path.join(index_dir, DV_SORTED_DIR, field)
    vocab: np.ndarray | None = None
    if not force_segmented:
        # STREAMING vocabulary probe: per-batch uniques accumulate on
        # the driver with periodic compaction and an EARLY ABORT the
        # moment the distinct count provably exceeds the cap — driver
        # memory stays O(max_dict_size) even when the true vocabulary
        # is arbitrarily larger (the case the segmented path exists
        # for; a take_all-first probe would OOM before the check).
        acc: list[np.ndarray] = []
        n_acc = 0
        overflow = False
        for b in ds.map_batches(
            uniq, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            col = b["value"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            acc.append(np.asarray(col.to_pylist(), dtype=object))
            n_acc += len(col)
            if n_acc > 2 * max_dict_size:
                merged = np.unique(np.concatenate(acc))
                acc, n_acc = [merged], len(merged)
                if n_acc > max_dict_size:
                    overflow = True
                    break
        if not overflow:
            vocab = (
                np.unique(np.concatenate(acc))
                if acc
                else np.asarray([], dtype=object)
            )
            if len(vocab) > max_dict_size:
                overflow = True
                vocab = None
        if overflow:
            import logging

            logging.getLogger(__name__).info(
                "sorted-dv dictionary for %r exceeds "
                "max_dict_size=%d: switching to the per-segment "
                "ords + ord-remap merge build",
                field, max_dict_size,
            )
    if vocab is None:
        card = _build_sorted_dv_segmented(
            d, ds, id_col=id_col, column=column, multi=multi
        )
        return _publish_extra(
            index_dir, "dv_sorted", field,
            {"multi": bool(multi), "cardinality": int(card),
             "segmented": True},
        )
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table({"value": pa.array(list(vocab), pa.string())}),
        os.path.join(d, "dict.parquet"),
    )
    vocab_ref = ray.put(vocab)

    def to_ords(b: pa.Table) -> pa.Table:
        v = ray.get(vocab_ref)
        ids, codes, dvals = _flatten(b, id_col, column, multi)
        # global ord of each batch-DICTIONARY value once, then a
        # vectorized gather through the codes
        lut = np.searchsorted(
            v, np.asarray(dvals.to_pylist(), dtype=object)
        ).astype(np.int32)
        return pa.table(
            {"doc_id": pa.array(ids),
             "ord": pa.array(lut[codes] if len(ids) else
                             np.empty(0, np.int32))}
        )

    ords_dir = os.path.join(d, "ords")
    import shutil

    shutil.rmtree(ords_dir, ignore_errors=True)
    ds.map_batches(to_ords, batch_format="pyarrow").write_parquet(ords_dir)
    return _publish_extra(
        index_dir, "dv_sorted", field,
        {"multi": bool(multi), "cardinality": int(len(vocab))},
    )


class _SegmentDVWriter:
    """Per-shard writer for the segmented sorted-dv build: each batch
    becomes one segment directory holding its SORTED local dictionary
    and (doc_id, local ord) rows. Deterministic idempotent names from
    the shard's doc-id span (doc ids are unique across the corpus)."""

    def __init__(self, seg_root: str, id_col: str, column: str,
                 multi: bool):
        self.seg_root = seg_root
        self.id_col, self.column, self.multi = id_col, column, multi

    def __call__(self, batch: pa.Table) -> pa.Table:
        import shutil

        ids, codes, dvals = _flatten(
            batch, self.id_col, self.column, self.multi
        )
        if not len(ids):
            return pa.table({"seg": pa.array([], pa.string())})
        local_sorted = _sorted_unique(pc.cast(dvals, pa.string()))
        # codes index the UNSORTED batch dictionary; local ords index
        # the sorted one — rank of each dictionary entry in sort order
        order = pc.array_sort_indices(dvals).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        remap = np.empty(len(order), np.int32)
        remap[order] = np.arange(len(order), dtype=np.int32)
        name = f"seg-{ids.min()}-{ids.max()}"
        dest = os.path.join(self.seg_root, name)
        if os.path.isdir(dest):  # resumed
            return pa.table({"seg": pa.array([name])})
        tmp = dest + f".tmp-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(
            pa.table({"value": local_sorted}),
            os.path.join(tmp, "dict.parquet"),
        )
        pq.write_table(
            pa.table(
                {"doc_id": pa.array(ids),
                 "ord": pa.array(remap[codes])}
            ),
            os.path.join(tmp, "ords.parquet"),
        )
        try:
            os.rename(tmp, dest)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # racing writer won
        return pa.table({"seg": pa.array([name])})


def _build_sorted_dv_segmented(
    d: str,
    ds: ray.data.Dataset,
    *,
    id_col: str,
    column: str,
    multi: bool,
    dict_row_group: int = 65_536,
) -> int:
    """Segmented build + merge; returns the global cardinality."""
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    seg_root = os.path.join(d, "segments")
    os.makedirs(seg_root, exist_ok=True)
    seg_df = ds.map_batches(
        _SegmentDVWriter(seg_root, id_col, column, multi),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    # an empty corpus yields a columnless frame, not an empty column
    segs = seg_df["seg"].tolist() if "seg" in seg_df.columns else []
    segs = sorted(set(segs))
    if not segs:  # empty corpus: publish a valid empty artifact
        pq.write_table(
            pa.table({"value": pa.array([], pa.string())}),
            os.path.join(d, "dict.parquet"),
        )
        os.makedirs(os.path.join(d, "ords"), exist_ok=True)
        # a zero-row ords FILE, not just an empty dir: a fileless
        # dataset has no schema, so any doc_id filter would fail to
        # bind at query time
        pq.write_table(
            pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "ord": pa.array([], pa.int32())}
            ),
            os.path.join(d, "ords", "empty.parquet"),
        )
        return 0
    return merge_sorted_dv_segments(
        d, segs, dict_row_group=dict_row_group
    )


def merge_sorted_dv_segments(
    d: str, segs: list[str], *, dict_row_group: int = 65_536
) -> int:
    """Ordinal-map merge of per-segment sorted-dv segments (the
    Lucene ``OrdinalMap``/``MergeState`` analog, applied eagerly so the
    query artifact stays one global dict + global ords):

    1. the union of segment dictionaries goes through ONE distributed
       value sort; the driver streams the sorted batches, drops
       adjacent duplicates across batch boundaries, and appends row
       groups to ``dict.parquet`` incrementally (``pq.ParquetWriter``)
       while counting global ordinals — driver memory is one batch,
       never the vocabulary;
    2. one remap task per segment streams the global dictionary's row
       groups against its own (small, sorted) local dict to build the
       local-ord -> global-ord array, then rewrites its ords file with
       global ordinals into ``ords/``.

    Returns the global cardinality."""
    dict_paths = [
        os.path.join(d, "segments", s, "dict.parquet") for s in segs
    ]
    sorted_vals = ray.data.read_parquet(dict_paths).sort("value")
    dict_path = os.path.join(d, "dict.parquet")
    writer = None
    last = None
    card = 0
    try:
        for b in sorted_vals.iter_batches(batch_format="pyarrow"):
            col = b["value"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if not len(col):
                continue
            u = _sorted_unique(col)
            if last is not None and len(u) and u[0].as_py() == last:
                u = u.slice(1)
            if not len(u):
                continue
            last = u[-1].as_py()
            t = pa.table({"value": pc.cast(u, pa.string())})
            if writer is None:
                writer = pq.ParquetWriter(dict_path, t.schema)
            writer.write_table(t, row_group_size=dict_row_group)
            card += len(u)
    finally:
        if writer is not None:
            writer.close()
    if card == 0:  # empty corpus: still leave a valid empty dict
        pq.write_table(
            pa.table({"value": pa.array([], pa.string())}), dict_path
        )

    def remap_one(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq_

        out_rows = []
        for seg in batch["seg"].to_pylist():
            sdir = os.path.join(d, "segments", seg)
            local = pq_.read_table(os.path.join(sdir, "dict.parquet"))[
                "value"
            ]
            if isinstance(local, pa.ChunkedArray):
                local = local.combine_chunks()
            ln = np.asarray(local.to_pylist(), dtype=object)
            g_ord = np.full(len(ln), -1, np.int64)
            pf = pq_.ParquetFile(dict_path)
            base = 0
            for rg in range(pf.num_row_groups):
                gv = pf.read_row_group(rg)["value"]
                if isinstance(gv, pa.ChunkedArray):
                    gv = gv.combine_chunks()
                gn = np.asarray(gv.to_pylist(), dtype=object)
                lo = np.searchsorted(ln, gn[0])
                hi = np.searchsorted(ln, gn[-1], side="right")
                if hi > lo:
                    pos = np.searchsorted(gn, ln[lo:hi])
                    hit = gn[np.minimum(pos, len(gn) - 1)] == ln[lo:hi]
                    g_ord[lo:hi][hit] = base + pos[hit]
                base += len(gn)
            if (g_ord < 0).any():
                missing = ln[g_ord < 0]
                raise ValueError(
                    f"segment {seg}: {len(missing)} values absent from "
                    f"the merged dictionary (e.g. {missing[:3].tolist()})"
                )
            ot = pq_.read_table(os.path.join(sdir, "ords.parquet"))
            lo_ords = ot["ord"].to_numpy(zero_copy_only=False)
            pq_.write_table(
                pa.table(
                    {"doc_id": ot["doc_id"],
                     "ord": pa.array(
                         g_ord[lo_ords].astype(np.int32))}
                ),
                os.path.join(d, "ords", f"{seg}.parquet"),
            )
            out_rows.append(seg)
        return pa.table({"seg": pa.array(out_rows, pa.string())})

    os.makedirs(os.path.join(d, "ords"), exist_ok=True)
    done = (
        ray.data.from_items([{"seg": s} for s in segs])
        .map_batches(remap_one, batch_size=1, batch_format="pyarrow")
        .count()
    )
    assert done == len(segs), (done, len(segs))
    return card


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
