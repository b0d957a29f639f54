"""Segment / index merge — the ``IndexWriter.addIndexes`` analog.

The reference merges foreign sub-indexes by rewriting their segments
with doc ids remapped by a base offset and committing via rename
(SimpleFDBDirectoryTest.java:162-187, SURVEY.md §2.7 D1 / §3.3). Here:

    for each source segment: stream-decode its posting lists
      -> packed RUN rows {part, key, min_doc, n, docs, tfs, norms, pos}
         (the same shape the tokenizer emits; positions carried through)
      -> the same groupby(part) -> EncodeGroup path as a fresh build
      -> new immutable segments + atomically-published manifest.

Per-field collection stats (dc, sum_dl) flow through re-emitted
sentinel runs (no re-tokenize needed — the build stored them exactly);
sdf/df/ttf are recomputed from the merged postings.

``compact_index`` is the log-structured maintenance path: re-shard an
index's own segments into fewer/larger partitions; ``plan_tiered``
picks same-size-tier merge candidates the way LSM engines do.
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

from fdblucene_ray.codec.postings import decode_all
from fdblucene_ray.index.build import EncodeGroup, _GOLDEN, _key_hash
from fdblucene_ray.index.manifest import (
    Manifest,
    SegmentMeta,
    load_manifest,
    publish_manifest,
)
from fdblucene_ray.index.segment import DOC_SENTINEL, FIELD_SEP, SegmentReader

_ROWS_PER_YIELD = 200_000


class DecodeSegmentPostings:
    """map_batches stage: (index_dir, segment, base) descriptor rows ->
    packed RUN rows (one per term, same shape the tokenizer emits, incl.
    positions when indexed), yielded in bounded chunks so huge segments
    stream instead of materializing."""

    def __init__(self, num_partitions: int, block_size: int):
        self.P = num_partitions
        self.block_size = block_size

    def _run_row(self, key, base, d, tf, nb, pos):
        n = len(d)
        cells = {
            "part": pa.array(
                [int(_key_hash([key])[0] % np.uint64(self.P))], pa.int32()
            ),
            "key": pa.array([key], pa.string()),
            "min_doc": pa.array([int(d[0]) + base], pa.int64()),
            "n": pa.array([n], pa.int64()),
            "sum_tf": pa.array([int(tf.sum())], pa.int64()),
            "docs": pa.array(
                [np.ascontiguousarray(d + base, "<i8").tobytes()], pa.binary()
            ),
            "tfs": pa.array(
                [np.ascontiguousarray(tf, "<i4").tobytes()], pa.binary()
            ),
            "norms": pa.array([nb.tobytes()], pa.binary()),
            "pos": pa.array(
                [np.ascontiguousarray(pos, "<i4").tobytes() if pos is not None else None],
                pa.binary(),
            ),
        }
        return pa.table(cells)

    def __call__(self, batch: pa.Table):
        from fdblucene_ray.codec.postings import decode_all_positions

        for row in batch.to_pylist():
            manifest = load_manifest(row["index_dir"])
            meta = next(
                s for s in manifest.segments if s.name == row["segment"]
            )
            pos_fields = set(manifest.extra.get("positions_fields", []))
            reader = SegmentReader(row["index_dir"], meta)
            terms = reader.terms
            fields = terms["field"].to_pylist()
            tnames = terms["term"].to_pylist()
            base = int(row["base"])
            bufs: list[pa.Table] = []
            buffered = 0
            for i in range(terms.num_rows):
                h = reader.postings_handle(fields[i], tnames[i])
                blob, skips, n = h
                d, tf, nb = decode_all(blob, skips, n, manifest.block_size)
                pos = None
                if fields[i] in pos_fields:
                    pos, _ = decode_all_positions(blob, skips, n, manifest.block_size)
                key = fields[i] + FIELD_SEP + tnames[i]
                bufs.append(self._run_row(key, base, d, tf, nb, pos))
                buffered += n
                if buffered >= _ROWS_PER_YIELD:
                    yield pa.concat_tables(bufs)
                    bufs, buffered = [], 0
            # re-emit doc-stat partials as sentinel runs so the merged
            # segments carry their own field stats (dc / sum_dl)
            for f, st in meta.field_stats.items():
                if st.get("dc") or st.get("sum_dl"):
                    skey = f + FIELD_SEP + DOC_SENTINEL
                    kh = _key_hash([skey])[0]
                    salt = np.uint64(abs(base)) * _GOLDEN
                    bufs.append(
                        pa.table(
                            {
                                "part": pa.array(
                                    [int((kh + salt) % np.uint64(self.P))], pa.int32()
                                ),
                                "key": pa.array([skey], pa.string()),
                                "min_doc": pa.array([base], pa.int64()),
                                "n": pa.array([st["dc"]], pa.int64()),
                                "sum_tf": pa.array([st["sum_dl"]], pa.int64()),
                                "docs": pa.array([b""], pa.binary()),
                                "tfs": pa.array([b""], pa.binary()),
                                "norms": pa.array([b""], pa.binary()),
                                "pos": pa.array([b""], pa.binary()),
                            }
                        )
                    )
            if bufs:
                yield pa.concat_tables(bufs)


def merge_indexes(
    sources: list[tuple[str, int]],
    out_dir: str,
    *,
    num_partitions: int = 16,
    resume: bool = True,
) -> Manifest:
    """Merge several indexes into one, remapping doc ids by per-source
    bases (callers guarantee disjoint resulting id ranges)."""
    manifests = [load_manifest(d) for d, _ in sources]
    analyzers = manifests[0].analyzers
    block_size = manifests[0].block_size
    for m in manifests[1:]:
        if m.analyzers != analyzers:
            raise ValueError("cannot merge indexes with different analyzers")
    positions_fields = sorted(
        {f for m in manifests for f in m.extra.get("positions_fields", [])}
    )

    items = []
    for (d, base), m in zip(sources, manifests):
        for seg in m.segments:
            items.append({"index_dir": d, "segment": seg.name, "base": base})
    sig = "merge-" + format(
        zlib.crc32(json.dumps([[d, int(b)] for d, b in sources]).encode()), "08x"
    )

    if resume and os.path.exists(os.path.join(out_dir, "manifest.json")):
        prev = load_manifest(out_dir)
        if prev.extra.get("signature") == sig:
            return prev

    ds = ray.data.from_items(items)
    lineage_ds = (
        ds.map_batches(
            DecodeSegmentPostings,
            fn_constructor_kwargs=dict(
                num_partitions=num_partitions, block_size=block_size
            ),
            batch_format="pyarrow",
            batch_size=1,
            concurrency=(1, max(2, int(ray.cluster_resources().get("CPU", 8)))),
        )
        .groupby("part", num_partitions=num_partitions)
        .map_groups(EncodeGroup(out_dir, sig, block_size, resume, runs=True),
                    batch_format="pyarrow")
    )
    from fdblucene_ray.index.build import _run_with_push_shuffle

    records = _run_with_push_shuffle(lambda: lineage_ds.take_all(), num_partitions)
    segs = sorted(
        (SegmentMeta.from_json(json.loads(r["segment_meta"])) for r in records),
        key=lambda m: m.name,
    )
    # (dc, sum_dl) stats flow through re-emitted sentinel runs, so the
    # merged segments carry their own field stats like a fresh build
    version = 0
    if os.path.exists(os.path.join(out_dir, "manifest.json")):
        version = load_manifest(out_dir).version + 1
    manifest = Manifest(
        analyzers=analyzers,
        block_size=block_size,
        segments=segs,
        version=version,
        extra={
            "signature": sig,
            "num_partitions": num_partitions,
            "positions_fields": positions_fields,
            "built_at_unix": int(time.time()),
        },
    )
    publish_manifest(out_dir, manifest)
    return manifest


def compact_index(index_dir: str, out_dir: str, num_partitions: int) -> Manifest:
    """Re-shard an index into ``num_partitions`` segments (tiered-merge
    maintenance: fewer, larger, still term-sharded segments)."""
    return merge_indexes([(index_dir, 0)], out_dir, num_partitions=num_partitions)


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
