"""Segment / index merge — the ``IndexWriter.addIndexes`` analog.

The reference merges foreign sub-indexes by rewriting their segments
with doc ids remapped by a base offset and committing via rename
(SimpleFDBDirectoryTest.java:162-187, SURVEY.md §2.7 D1 / §3.3). Here:

    for each source segment: stream-decode its posting lists
      -> posting rows {part, key, doc_id + base, tf, norm}
      -> the same groupby(part) -> EncodeGroup path as a fresh build
      -> new immutable segments + atomically-published manifest.

Per-field collection stats (dc, sum_dl) are summed from the source
manifests (no re-tokenize needed — the build stored them exactly);
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
from fdblucene_ray.index.segment import FIELD_SEP, SegmentReader

_ROWS_PER_YIELD = 200_000


class DecodeSegmentPostings:
    """map_batches stage: (index_dir, segment, base) descriptor rows ->
    posting rows, yielded in bounded chunks (streams huge segments)."""

    def __init__(self, num_partitions: int, block_size: int):
        self.P = num_partitions
        self.block_size = block_size

    def __call__(self, batch: pa.Table):
        for row in batch.to_pylist():
            manifest = load_manifest(row["index_dir"])
            meta = next(
                s for s in manifest.segments if s.name == row["segment"]
            )
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
                key = fields[i] + FIELD_SEP + tnames[i]
                kh = _key_hash([key])[0]
                part = np.full(n, int(kh % np.uint64(self.P)), np.int32)
                bufs.append(
                    pa.table(
                        {
                            "part": pa.array(part),
                            "key": pa.array([key] * n, pa.string()),
                            "doc_id": pa.array(d + base, pa.int64()),
                            "tf": pa.array(tf.astype(np.int32)),
                            "norm": pa.array(nb),
                        }
                    )
                )
                buffered += n
                if buffered >= _ROWS_PER_YIELD:
                    yield pa.concat_tables(bufs)
                    bufs, buffered = [], 0
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
    if any(m.extra.get("positions_fields") for m in manifests):
        raise NotImplementedError(
            "merging positional indexes is not supported yet (the merge "
            "path re-emits row-level postings without positions)"
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
        .groupby("part")
        .map_groups(EncodeGroup(out_dir, sig, block_size, resume, runs=False),
                    batch_format="pyarrow")
    )
    from fdblucene_ray.index.build import _run_with_push_shuffle

    records = _run_with_push_shuffle(lambda: lineage_ds.take_all())
    segs = sorted(
        (SegmentMeta.from_json(json.loads(r["segment_meta"])) for r in records),
        key=lambda m: m.name,
    )
    # base (dc, sum_dl) stats come summed from the sources; the merged
    # segments' own field_stats carry only sdf (no sentinels re-emitted)
    base_stats: dict[str, dict[str, int]] = {}
    for m in manifests:
        for f, st in m.field_totals().items():
            acc = base_stats.setdefault(f, {"dc": 0, "sum_dl": 0, "sdf": 0})
            acc["dc"] += st["dc"]
            acc["sum_dl"] += st["sum_dl"]
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
            "base_field_stats": base_stats,
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
