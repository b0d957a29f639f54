"""Segment / index merge — the ``IndexWriter.addIndexes`` analog.

The reference merges foreign sub-indexes by rewriting their segments
with doc ids remapped by a base offset and committing via rename
(SimpleFDBDirectoryTest.java:162-187, SURVEY.md §2.7 D1 / §3.3). Here:

    for each source segment: stream-decode its posting lists
      -> packed RUN rows {part, key, min_doc, n, docs, tfs, norms, pos}
         (the same shape the tokenizer emits; positions carried through;
         built in SLABS of ~1k terms per Arrow table, never one table
         per term)
      -> the same groupby(part) -> EncodeGroup path as a fresh build
      -> new immutable segments + atomically-published manifest.

Per-field collection stats flow through re-emitted sentinel runs whose
cells carry the segment's per-doc exact lengths (doclens.parquet, the
.nvd analog) — so a FULL rewrite purges tombstoned docs' postings AND
their dc/sum_dl contributions exactly, with no re-tokenize.

Maintenance (the merge-policy analog behind the reference's
``IndexWriter.addIndexes``, SimpleFDBDirectoryTest.java:162-187):
``merge_segments_inplace`` rewrites a subset of one index's segments
in place; ``plan_tiered`` picks same-size-tier candidates LSM-style;
``maintain_index`` drives plan -> merge -> publish -> gc to a bounded
segment count. Partial merges keep tombstones (term-sharded segments
mean one doc's postings span many segments — a partial purge would
half-remove stats); only a full rewrite purges.
"""

from __future__ import annotations

import json
import os
import time
import zlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

from fdblucene_ray.codec.postings import SKIP_DTYPE
from fdblucene_ray.index.build import (
    EncodeGroup,
    _GOLDEN,
    _key_hash,
    _packed_binary,
    _shuffle_strategy,
)
from fdblucene_ray.index.delete import gc_tombstones, load_tombstones
from fdblucene_ray.index.wire import pack_docs, pack_vals
from fdblucene_ray.index.manifest import (
    Manifest,
    SegmentMeta,
    gc_index,
    load_manifest,
    prune_commits,
    publish_manifest,
)
from fdblucene_ray.index.segment import DOC_SENTINEL, FIELD_SEP, SegmentReader

_ROWS_PER_YIELD = 200_000
_SLAB_TERMS = 1024
_EMPTY_TOMB = np.empty(0, np.int64)


def _alive(docs: np.ndarray, tomb: np.ndarray) -> np.ndarray | None:
    if len(tomb) == 0 or len(docs) == 0:
        return None
    idx = np.searchsorted(tomb, docs)
    inb = idx < len(tomb)
    dead = np.zeros(len(docs), bool)
    dead[inb] = tomb[idx[inb]] == docs[inb]
    return None if not dead.any() else ~dead


class DecodeSegmentPostings:
    """map_batches stage: (index_dir, segment, base) descriptor rows ->
    packed RUN-row SLABS (one Arrow table per ~1k terms / 200k postings,
    same shape the tokenizer emits, positions included when indexed).
    Bulk construction mirrors TokenizeToPostings' packed-buffer style —
    no per-term Arrow objects (round-1 VERDICT "what's wrong" #2).

    ``tombstones``: {index_dir: sorted doc_id array} — postings and
    doclens of those docs are dropped (exact purge; requires the
    doclens sidecar)."""

    def __init__(
        self,
        num_partitions: int,
        block_size: int,
        tombstones_ref=None,
        slab_terms: int = _SLAB_TERMS,
        wire: str = "raw",
    ):
        self.P = num_partitions
        self.block_size = block_size
        self.slab_terms = slab_terms
        self.wire = wire
        if tombstones_ref is None:
            self.tomb = {}
        elif isinstance(tombstones_ref, dict):
            self.tomb = tombstones_ref
        else:
            self.tomb = ray.get(tombstones_ref)

    def _sentinel_table(self, reader, meta, base, tomb):
        """Re-emit the segment's doc-stat partials as sentinel runs.
        With a doclens sidecar the runs carry exact per-doc lengths
        (minus tombstoned docs) so the merged segments rebuild their
        own doclens + exact (dc, sum_dl); without one (legacy), the
        aggregate-only form is re-emitted and purging is refused."""
        dl = reader.doclens()
        rows: dict[str, list] = {
            "part": [], "key": [], "min_doc": [], "n": [], "sum_tf": [],
            "docs": [], "tfs": [], "norms": [], "pos": [],
        }

        def emit(field, part, min_doc, n, sum_tf, docs_cell, tfs_cell):
            rows["part"].append(part)
            rows["key"].append(field + FIELD_SEP + DOC_SENTINEL)
            rows["min_doc"].append(min_doc)
            rows["n"].append(n)
            rows["sum_tf"].append(sum_tf)
            rows["docs"].append(docs_cell)
            rows["tfs"].append(tfs_cell)
            rows["norms"].append(b"")
            rows["pos"].append(b"")

        salt = np.uint64(abs(int(base))) * _GOLDEN
        if dl is None:
            has_stats = any(
                st.get("dc") or st.get("sum_dl")
                for st in meta.field_stats.values()
            )
            if len(tomb) and has_stats:
                raise ValueError(
                    f"segment {meta.name} holds doc stats but no doclens "
                    "sidecar; cannot purge tombstones exactly — rebuild "
                    "or merge without purge"
                )
            for f, st in meta.field_stats.items():
                if st.get("dc") or st.get("sum_dl"):
                    kh = _key_hash([f + FIELD_SEP + DOC_SENTINEL])[0]
                    with np.errstate(over="ignore"):
                        part = int((kh + salt) % np.uint64(self.P))
                    emit(f, part, int(base), st["dc"], st["sum_dl"], b"", b"")
        else:
            farr = dl["field"]
            docs = dl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            lens = dl["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
            am = _alive(docs, tomb)
            if am is not None:
                farr = farr.combine_chunks().filter(pa.array(am)) if isinstance(
                    farr, pa.ChunkedArray
                ) else farr.filter(pa.array(am))
                docs, lens = docs[am], lens[am]
            if len(docs):
                # doclens is sorted by (field, doc_id): field boundaries
                # via dictionary codes — no O(docs) Python comparison loop
                if isinstance(farr, pa.ChunkedArray):
                    farr = farr.combine_chunks()
                dct = farr.dictionary_encode()
                codes = dct.indices.to_numpy(zero_copy_only=False)
                vocab = dct.dictionary.to_pylist()
                starts = np.concatenate(
                    ([0], np.flatnonzero(np.diff(codes)) + 1, [len(codes)])
                ).astype(np.int64)
                for bi in range(len(starts) - 1):
                    lo, hi = int(starts[bi]), int(starts[bi + 1])
                    f = vocab[int(codes[lo])]
                    kh = _key_hash([f + FIELD_SEP + DOC_SENTINEL])[0]
                    with np.errstate(over="ignore"):
                        part = int((kh + salt) % np.uint64(self.P))
                    sd = np.ascontiguousarray(docs[lo:hi] + base, np.int64)
                    sl = np.ascontiguousarray(lens[lo:hi], np.int64)
                    one = (np.array([0], np.int64), np.array([hi - lo], np.int64))
                    emit(
                        f, part, int(sd[0]), hi - lo, int(lens[lo:hi].sum()),
                        pack_docs(sd, *one, self.wire)[0].as_py(),
                        pack_vals(sl, *one, self.wire)[0].as_py(),
                    )
        if not rows["key"]:
            return None
        return pa.table(
            {
                "part": pa.array(rows["part"], pa.int32()),
                "key": pa.array(rows["key"], pa.string()),
                "min_doc": pa.array(rows["min_doc"], pa.int64()),
                "n": pa.array(rows["n"], pa.int64()),
                "sum_tf": pa.array(rows["sum_tf"], pa.int64()),
                "docs": pa.array(rows["docs"], pa.binary()),
                "tfs": pa.array(rows["tfs"], pa.binary()),
                "norms": pa.array(rows["norms"], pa.binary()),
                "pos": pa.array(rows["pos"], pa.binary()),
            }
        )

    def __call__(self, batch: pa.Table):
        for row in batch.to_pylist():
            idir = row["index_dir"]
            manifest = load_manifest(idir)
            meta = next(s for s in manifest.segments if s.name == row["segment"])
            pos_fields = set(manifest.extra.get("positions_fields", []))
            tomb = self.tomb.get(idir, _EMPTY_TOMB)
            reader = SegmentReader(idir, meta, codec=manifest.codec)
            yield from self._decode_segment(reader, manifest, pos_fields, tomb,
                                            int(row["base"]))
            sent = self._sentinel_table(reader, meta, int(row["base"]), tomb)
            if sent is not None:
                yield sent

    def _decode_segment(self, reader, manifest, pos_fields, tomb, base):
        """Whole-segment bulk decode (one varint pass per stream kind)
        -> slab tables. No per-term numpy/Arrow calls anywhere."""
        from fdblucene_ray.codec.registry import get_codec

        _codec = get_codec(manifest.codec)
        bulk_decode_segment = _codec.bulk_decode_segment
        bulk_decode_segment_positions = _codec.bulk_decode_segment_positions

        terms = reader.terms
        T = terms.num_rows
        if T == 0:
            return
        fields_l = terms["field"].to_pylist()
        tnames = terms["term"].to_pylist()
        po = terms["post_offset"].to_numpy(zero_copy_only=False)
        pl_ = terms["post_len"].to_numpy(zero_copy_only=False)
        so = terms["skip_offset"].to_numpy(zero_copy_only=False)
        nb_ = terms["n_blocks"].to_numpy(zero_copy_only=False)
        df_ = terms["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        blob, skips_blob = reader._blob()
        skips_all = (
            np.frombuffer(np.ascontiguousarray(skips_blob), SKIP_DTYPE)
            if len(skips_blob)
            else np.empty(0, SKIP_DTYPE)
        )

        docs, tfs, norms, term_starts = bulk_decode_segment(
            blob, skips_all, po, so, nb_, df_
        )
        lens = df_.copy()
        flat_pos = pos_counts = None
        if pos_fields:
            flat_pos, pos_counts = bulk_decode_segment_positions(
                blob, skips_all, po, pl_, so, nb_, df_, tfs, term_starts
            )

        am = _alive(docs, tomb)
        if am is not None:
            if pos_counts is not None:
                flat_pos = flat_pos[np.repeat(am, pos_counts)]
                pos_counts = pos_counts[am]
            docs, tfs, norms = docs[am], tfs[am], norms[am]
            lens = np.add.reduceat(am.astype(np.int64), term_starts)
            lens[df_ == 0] = 0  # reduceat quirk on empty groups (none expected)
            term_starts = np.concatenate(([0], np.cumsum(lens[:-1])))

        # per-term position counts + starts (0 for non-positional terms)
        if pos_counts is not None:
            tp_counts = np.add.reduceat(pos_counts, term_starts) if len(pos_counts) else np.zeros(T, np.int64)
            tp_counts[lens == 0] = 0
            tp_starts = np.concatenate(([0], np.cumsum(tp_counts[:-1])))
            pos_u8 = np.ascontiguousarray(flat_pos, "<i4").view(np.uint8)

        nrm_u8 = np.ascontiguousarray(norms, np.uint8)
        sum_tf = (
            np.add.reduceat(tfs.astype(np.int64), term_starts)
            if len(tfs)
            else np.zeros(T, np.int64)
        )
        sum_tf = np.where(lens > 0, sum_tf, 0)
        d64 = docs + base

        nz = np.flatnonzero(lens > 0)
        for lo in range(0, len(nz), self.slab_terms):
            sel = nz[lo : lo + self.slab_terms]
            s0, s1 = term_starts[sel[0]], term_starts[sel[-1]] + lens[sel[-1]]
            rel = term_starts[sel] - s0
            rel_end = rel + lens[sel]
            keys = [fields_l[i] + FIELD_SEP + tnames[i] for i in sel]
            part = (_key_hash(keys) % np.uint64(self.P)).astype(np.int32)
            if pos_counts is not None:
                p0 = tp_starts[sel[0]]
                p1 = tp_starts[sel[-1]] + tp_counts[sel[-1]]
                prel = tp_starts[sel] - p0
                prel_end = prel + tp_counts[sel]
                pos_cells = _packed_binary(
                    pos_u8[p0 * 4 : p1 * 4], prel * 4, prel_end * 4
                )
            else:
                pos_cells = pa.nulls(len(sel), pa.binary())
            yield pa.table(
                {
                    "part": pa.array(part),
                    "key": pa.array(keys, pa.string()),
                    "min_doc": pa.array(d64[term_starts[sel]], pa.int64()),
                    "n": pa.array(lens[sel], pa.int64()),
                    "sum_tf": pa.array(sum_tf[sel], pa.int64()),
                    "docs": pack_docs(d64[s0:s1], rel, rel_end, self.wire),
                    "tfs": pack_vals(
                        tfs[s0:s1], rel, rel_end, self.wire
                    ),
                    "norms": _packed_binary(nrm_u8[s0:s1], rel, rel_end),
                    "pos": pos_cells,
                }
            )


def _decode_segments_task(batch: pa.Table, *, num_partitions, block_size,
                          tombstones_ref=None, wire="raw"):
    """Plain-task wrapper around DecodeSegmentPostings: segment decode
    holds no per-actor state worth amortizing (the tombstone dict is a
    plasma-local ray.get), and a TASK pool avoids paying an actor-pool
    spin-up for what is typically a handful of one-segment tasks."""
    yield from DecodeSegmentPostings(
        num_partitions, block_size, tombstones_ref, wire=wire
    )(batch)


def _run_merge_pipeline(
    items: list[dict],
    out_dir: str,
    sig: str,
    num_partitions: int,
    block_size: int,
    resume: bool,
    tombstones: dict[str, np.ndarray] | None,
    codec: str = "varint-block",
    wire: str = "raw",
) -> list[SegmentMeta]:
    """Shared decode -> shuffle -> encode pipeline; returns new segments."""
    tomb_ref = ray.put(tombstones) if tombstones else None
    ds = ray.data.from_items(items)
    with _shuffle_strategy(num_partitions, dataset=ds):
        lineage_ds = (
            ds.map_batches(
                _decode_segments_task,
                fn_kwargs=dict(
                    num_partitions=num_partitions,
                    block_size=block_size,
                    tombstones_ref=tomb_ref,
                    wire=wire,
                ),
                batch_format="pyarrow",
                batch_size=1,
            )
            .groupby("part", num_partitions=num_partitions)
            .map_groups(
                EncodeGroup(out_dir, sig, block_size, resume, runs=True,
                            codec=codec, wire=wire),
                batch_format="pyarrow",
            )
        )
        records = lineage_ds.take_all()
    return sorted(
        (SegmentMeta.from_json(json.loads(r["segment_meta"])) for r in records),
        key=lambda m: m.name,
    )


def merge_indexes(
    sources: list[tuple[str, int]],
    out_dir: str,
    *,
    num_partitions: int = 16,
    resume: bool = True,
    purge_tombstones: bool = True,
    wire: str = "raw",
) -> Manifest:
    """Merge several indexes into one, remapping doc ids by per-source
    bases (callers guarantee disjoint resulting id ranges). Every source
    is rewritten in full, so each source's tombstones are purged exactly
    (postings dropped + doclens-backed stats subtracted); the output
    index starts tombstone-free."""
    manifests = [load_manifest(d) for d, _ in sources]
    analyzers = manifests[0].analyzers
    block_size = manifests[0].block_size
    codec = manifests[0].codec
    for m in manifests[1:]:
        if m.analyzers != analyzers:
            raise ValueError("cannot merge indexes with different analyzers")
        if m.codec != codec:
            raise ValueError("cannot merge indexes with different codecs")
    positions_fields = sorted(
        {f for m in manifests for f in m.extra.get("positions_fields", [])}
    )

    tombstones: dict[str, np.ndarray] = {}
    if purge_tombstones:
        for (d, _), m in zip(sources, manifests):
            t = load_tombstones(d, m)
            if len(t):
                tombstones[d] = t

    items = []
    for (d, base), m in zip(sources, manifests):
        for seg in m.segments:
            items.append({"index_dir": d, "segment": seg.name, "base": base})
    sig = "merge-" + format(
        zlib.crc32(
            json.dumps(
                [[d, int(b)] for d, b in sources]
                + [sorted((k, len(v)) for k, v in tombstones.items())]
            ).encode()
        ),
        "08x",
    )

    if resume and os.path.exists(os.path.join(out_dir, "manifest.json")):
        prev = load_manifest(out_dir)
        if prev.extra.get("signature") == sig:
            return prev

    segs = _run_merge_pipeline(
        items, out_dir, sig, num_partitions, block_size, resume, tombstones,
        codec=codec, wire=wire,
    )
    version = 0
    if os.path.exists(os.path.join(out_dir, "manifest.json")):
        version = load_manifest(out_dir).version + 1

    # pending doc-values generations ride the merge, remapped to the
    # output id space (base offsets); tombstoned docs' updates drop
    # with their docs. The merged output has no docstore, so the
    # overlay stays a sidecar (a later in-place full merge with a
    # docstore folds it).
    dv_files: dict[str, str] = {}
    dv_fields = sorted(
        {f for m in manifests for f in m.extra.get("dv_files", {})}
    )
    if dv_fields:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from fdblucene_ray.index.docvalues import DV_DIR, load_dv_overlay

        for field in dv_fields:
            parts_ids, parts_vals = [], []
            for (d, base), m in zip(sources, manifests):
                ids, vals = load_dv_overlay(d, field, m)
                if not len(ids):
                    continue
                if purge_tombstones and d in tombstones:
                    keep = ~np.isin(ids, tombstones[d])
                    ids, vals = ids[keep], vals[keep]
                if len(ids):
                    parts_ids.append(ids + np.int64(base))
                    parts_vals.append(vals)
            if not parts_ids:
                continue
            ids = np.concatenate(parts_ids)
            vals = np.concatenate(parts_vals)
            order = np.argsort(ids, kind="stable")
            fname = f"dv-{field}-v{version:06d}.parquet"
            ddir = os.path.join(out_dir, DV_DIR)
            os.makedirs(ddir, exist_ok=True)
            tmp = os.path.join(ddir, fname + ".tmp")
            pq.write_table(
                pa.table(
                    {
                        "doc_id": pa.array(ids[order], pa.int64()),
                        "value": pa.array(vals[order]),
                    }
                ),
                tmp,
            )
            os.replace(tmp, os.path.join(ddir, fname))
            dv_files[field] = fname

    extra = {
        "signature": sig,
        "num_partitions": num_partitions,
        "positions_fields": positions_fields,
        "built_at_unix": int(time.time()),
    }
    if dv_files:
        extra["dv_files"] = dv_files
    manifest = Manifest(
        analyzers=analyzers,
        block_size=block_size,
        segments=segs,
        version=version,
        codec=codec,
        extra=extra,
    )
    publish_manifest(out_dir, manifest)
    return manifest


def compact_index(
    index_dir: str, out_dir: str, num_partitions: int, *, wire: str = "raw"
) -> Manifest:
    """Re-shard an index into ``num_partitions`` segments (full rewrite:
    fewer, larger, still term-sharded segments; tombstones purged)."""
    return merge_indexes(
        [(index_dir, 0)], out_dir, num_partitions=num_partitions, wire=wire
    )


def merge_segments_inplace(
    index_dir: str,
    names: list[str],
    *,
    num_partitions: int = 1,
    resume: bool = True,
    gc: bool = True,
    keep_commits: int | None = 1,
) -> Manifest:
    """Rewrite segments ``names`` of one index into ``num_partitions``
    new segments and atomically publish (other segments untouched).
    The build signature in ``extra`` is preserved — compaction changes
    layout, not corpus identity. Purges tombstones only when ``names``
    covers every live segment (a full rewrite); partial merges carry
    the tombstone set forward (term-sharded segments: a doc's postings
    span segments, partial purge would half-remove it)."""
    m = load_manifest(index_dir)
    live = {s.name for s in m.segments}
    missing = set(names) - live
    if missing:
        raise ValueError(f"segments not in live manifest: {sorted(missing)}")
    full = set(names) == live
    tomb = load_tombstones(index_dir, m) if full else _EMPTY_TOMB
    tombstones = {index_dir: tomb} if len(tomb) else None

    items = [
        {"index_dir": index_dir, "segment": n, "base": 0} for n in sorted(names)
    ]
    sig = "cmp-" + format(
        zlib.crc32(
            json.dumps(
                [sorted(names), m.version, m.extra.get("tombstone_file")]
            ).encode()
        ),
        "08x",
    )
    segs = _run_merge_pipeline(
        items, index_dir, sig, num_partitions, m.block_size, resume, tombstones,
        codec=m.codec,
    )
    keep = [s for s in m.segments if s.name not in set(names)]
    extra = dict(m.extra)
    if full:
        extra.pop("tombstone_file", None)
        # bake pending numeric doc-values generations into the docstore
        # (Lucene: merge folds dv-gen files into the rewritten segment);
        # fields without a docstore column carry forward
        if extra.get("dv_files"):
            from fdblucene_ray.index.docvalues import fold_dv_into_docstore

            remaining = fold_dv_into_docstore(index_dir, m)
            if remaining:
                extra["dv_files"] = remaining
            else:
                extra.pop("dv_files", None)
    m2 = Manifest(
        analyzers=m.analyzers,
        block_size=m.block_size,
        segments=sorted(keep + segs, key=lambda s: s.name),
        version=m.version + 1,
        extra=extra,
        codec=m.codec,
    )
    publish_manifest(index_dir, m2, expected_version=m.version)
    if gc:
        # deletion policy: a merge's GC prunes commit points down to
        # ``keep_commits`` first (Lucene KeepOnlyLastCommitDeletionPolicy
        # default = 1); pass None to retain every commit (snapshot mode —
        # merged-away segments then stay on disk until prune_commits)
        if keep_commits is not None:
            prune_commits(index_dir, keep_last=keep_commits)
        gc_index(index_dir)
        if full:
            gc_tombstones(index_dir)
            from fdblucene_ray.index.docvalues import gc_dv_files

            gc_dv_files(index_dir)
    return m2


def plan_tiered(manifest: Manifest, *, tier_factor: int = 4, min_merge: int = 4):
    """Log-structured merge planning: bucket segments into size tiers
    (by n_postings, tier = log_{factor}); any tier holding >= min_merge
    segments yields one merge candidate list."""
    tiers: dict[int, list[str]] = {}
    for seg in manifest.segments:
        t = 0
        n = max(1, seg.n_postings)
        while n >= tier_factor:
            n //= tier_factor
            t += 1
        tiers.setdefault(t, []).append(seg.name)
    return [names for _, names in sorted(tiers.items()) if len(names) >= min_merge]


def maintain_index(
    index_dir: str,
    *,
    tier_factor: int = 4,
    min_merge: int = 4,
    max_rounds: int = 8,
    out_partitions: int = 1,
) -> Manifest:
    """Merge-policy maintenance loop: plan_tiered -> in-place merge ->
    publish -> gc, until no tier holds >= min_merge segments (or
    max_rounds). Call after ``build_sharded`` appends to keep the
    segment count bounded — the driver analog of Lucene's background
    merge policy behind ``IndexWriter.addIndexes``."""
    m = load_manifest(index_dir)
    for _ in range(max_rounds):
        plans = plan_tiered(m, tier_factor=tier_factor, min_merge=min_merge)
        if not plans:
            break
        for names in plans:
            m = merge_segments_inplace(
                index_dir, names, num_partitions=out_partitions
            )
    return m
