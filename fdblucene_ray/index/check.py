"""CheckIndex analog: distributed index integrity verification.

Lucene ships ``CheckIndex`` (walk every segment, verify checksums, term
dictionary order, posting invariants); the reference inherits it through
the Lucene codec layer and adds its own streaming CRC at write time
(FDBIndexOutput.java:113-115). This is the Ray-native twin: one task per
segment (segments are independent by construction), each task verifying

- blob CRC32s against the manifest (S4/A5 family),
- term dictionary invariants: per-field ascending strictly-unique terms,
  df >= 1, ttf >= df, n_terms / n_postings consistent with SegmentMeta,
- (level="full") a whole-segment bulk decode: docIDs strictly ascending
  within every posting list (K2), doc ids within the segment's
  [doc_id_min, doc_id_max] envelope, tf >= 1, per-term ttf == sum(tf).

Scale shape: the per-segment work is the same bulk-vectorized decode the
merge path uses (codec.bulk_decode_segment — one varint pass per stream
kind), so checking an index costs about as much as compacting it reads,
spread over the cluster. Nothing materializes driver-side except one
status row per segment.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from fdblucene_ray.codec.postings import SKIP_DTYPE
from fdblucene_ray.codec.registry import get_codec
from fdblucene_ray.index.manifest import load_manifest
from fdblucene_ray.index.segment import SegmentReader


def _check_one(index_dir: str, manifest, meta, level: str) -> dict:
    issues: list[str] = []
    reader = SegmentReader(index_dir, meta, codec=manifest.codec)
    # 1) blob CRCs
    try:
        reader.verify()
    except ValueError as e:
        issues.append(str(e))
    # 2) term dictionary invariants
    terms = reader.terms
    T = terms.num_rows
    if T != meta.n_terms:
        issues.append(f"n_terms {T} != meta {meta.n_terms}")
    df = terms["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    ttf = terms["ttf"].to_numpy(zero_copy_only=False).astype(np.int64)
    if (df < 1).any():
        issues.append("df < 1")
    if (ttf < df).any():
        issues.append("ttf < df")
    if int(df.sum()) != meta.n_postings:
        issues.append(f"sum(df) {int(df.sum())} != meta {meta.n_postings}")
    fields = terms["field"]
    if isinstance(fields, pa.ChunkedArray):
        fields = fields.combine_chunks()
    fcodes = fields.dictionary_encode().indices.to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    # vectorized order check: codepoint order == UTF-8 byte order
    tnames = np.asarray(terms["term"].to_pylist(), dtype=object)
    if T > 1:
        same_field = fcodes[1:] == fcodes[:-1]
        bad = same_field & (tnames[1:] <= tnames[:-1])
        if bad.any():
            i = int(np.flatnonzero(bad)[0]) + 1
            issues.append(
                f"terms not strictly ascending at row {i}: "
                f"{tnames[i - 1]!r} >= {tnames[i]!r}"
            )
    # 3) full posting decode
    n_postings = int(df.sum())
    if level == "full" and T and not issues:
        po = terms["post_offset"].to_numpy(zero_copy_only=False)
        so = terms["skip_offset"].to_numpy(zero_copy_only=False)
        nb = terms["n_blocks"].to_numpy(zero_copy_only=False)
        blob, skips_blob = reader._blob()
        skips_all = (
            np.frombuffer(np.ascontiguousarray(skips_blob), SKIP_DTYPE)
            if len(skips_blob)
            else np.empty(0, SKIP_DTYPE)
        )
        codec = get_codec(manifest.codec)
        docs, tfs, _norms, term_starts = codec.bulk_decode_segment(
            blob, skips_all, po, so, nb, df
        )
        if len(docs):
            # strict docID ascent WITHIN each list: every adjacent pair
            # must increase except across term boundaries
            asc = np.ones(len(docs), bool)
            asc[1:] = docs[1:] > docs[:-1]
            asc[term_starts] = True
            if not asc.all():
                issues.append("docIDs not strictly ascending in a list")
            if int(docs.min()) < meta.doc_id_min or int(
                docs.max()
            ) > meta.doc_id_max:
                issues.append("docID outside segment envelope")
            if (tfs < 1).any():
                issues.append("tf < 1")
            sum_tf = np.add.reduceat(tfs.astype(np.int64), term_starts)
            if not np.array_equal(sum_tf, ttf):
                issues.append("per-term ttf != sum(tf)")
    return {
        "segment": meta.name,
        "n_terms": int(T),
        "n_postings": n_postings,
        "status": "ok" if not issues else "corrupt",
        "issues": "; ".join(issues),
    }


def check_index(
    index_dir: str,
    *,
    level: str = "full",
    version: int | None = None,
) -> pa.Table:
    """Verify every segment of an index (optionally a pinned commit
    point). Returns one row per segment: (segment, n_terms, n_postings,
    status, issues). ``level``: "fast" = CRC + dictionary invariants,
    "full" = also bulk-decode every posting list and verify K2
    invariants. Distributed: one Ray task per segment."""
    manifest = load_manifest(index_dir, version)
    if not manifest.segments:
        return pa.table(
            {
                "segment": pa.array([], pa.string()),
                "n_terms": pa.array([], pa.int64()),
                "n_postings": pa.array([], pa.int64()),
                "status": pa.array([], pa.string()),
                "issues": pa.array([], pa.string()),
            }
        )
    names = [m.name for m in manifest.segments]
    metas = {m.name: m for m in manifest.segments}

    def run(batch: pa.Table) -> pa.Table:
        rows = [
            _check_one(index_dir, manifest, metas[n], level)
            for n in batch["name"].to_pylist()
        ]
        return pa.table(
            {
                "segment": pa.array([r["segment"] for r in rows], pa.string()),
                "n_terms": pa.array([r["n_terms"] for r in rows], pa.int64()),
                "n_postings": pa.array(
                    [r["n_postings"] for r in rows], pa.int64()
                ),
                "status": pa.array([r["status"] for r in rows], pa.string()),
                "issues": pa.array([r["issues"] for r in rows], pa.string()),
            }
        )

    ds = ray.data.from_items([{"name": n} for n in names]).repartition(
        min(len(names), 16)
    )
    out = ds.map_batches(run, batch_format="pyarrow").take_all()
    out.extend(_check_sidecars(index_dir, manifest))
    out.sort(key=lambda r: r["segment"])
    return pa.table(
        {
            "segment": pa.array([r["segment"] for r in out], pa.string()),
            "n_terms": pa.array([r["n_terms"] for r in out], pa.int64()),
            "n_postings": pa.array(
                [r["n_postings"] for r in out], pa.int64()
            ),
            "status": pa.array([r["status"] for r in out], pa.string()),
            "issues": pa.array([r["issues"] for r in out], pa.string()),
        }
    )


def _check_sidecars(index_dir: str, manifest) -> list[dict]:
    """Validate manifest-referenced sidecars: the tombstone file and
    every doc-values generation must exist, parse, and hold strictly
    ascending doc ids (last-write-wins coalescing and every overlay
    read path assume sortedness). One pseudo-segment row each."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    rows = []

    def row(name, n, status, issues):
        rows.append(
            {
                "segment": name,
                "n_terms": 0,
                "n_postings": int(n),
                "status": status,
                "issues": issues,
            }
        )

    tf = (manifest.extra or {}).get("tombstone_file")
    if tf:
        p = os.path.join(index_dir, "tombstones", tf)
        try:
            ids = pq.read_table(p)["doc_id"].to_numpy(zero_copy_only=False)
            ok = len(ids) == 0 or bool(np.all(np.diff(ids) > 0))
            row("(tombstones)", len(ids), "ok" if ok else "corrupt",
                "" if ok else "doc ids not strictly ascending")
        except Exception as e:  # missing / unreadable
            row("(tombstones)", 0, "corrupt", f"{type(e).__name__}: {e}")
    for field, fname in sorted(
        (manifest.extra or {}).get("dv_files", {}).items()
    ):
        p = os.path.join(index_dir, "dv_updates", fname)
        try:
            t = pq.read_table(p)
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            ok = len(ids) == 0 or bool(np.all(np.diff(ids) > 0))
            ok = ok and "value" in t.column_names
            row(f"(dv:{field})", len(ids), "ok" if ok else "corrupt",
                "" if ok else "doc ids not strictly ascending")
        except Exception as e:
            row(f"(dv:{field})", 0, "corrupt", f"{type(e).__name__}: {e}")
    return rows
