"""Immutable segment: write a partition of posting rows, read it back.

A segment is the engine's analog of a Lucene segment stored through the
reference's virtual files (FDBDirectory.java:54-89): an immutable,
atomically-published directory

    segments/{name}/
      terms.parquet   # sorted (field, term) dictionary + blob offsets
      postings.bin    # concatenated per-term block-coded posting lists
      skips.bin       # concatenated packed skip tables
      meta.json       # stats + CRC32s (analog of FDBIndexOutput's
                      # streaming CRC, FDBIndexOutput.java:113-115)

Terms are namespaced by field as ``field + '\\x1f' + term`` in the
shuffle; the terms table stores field and term separately. Postings for
one term are sorted by ascending doc_id (the reference's KV-order
invariant, DATA.md:53) and carry the 1-byte norm inline (impact).

Doc-stat sentinel rows (term == DOC_SENTINEL, tf == exact doc length,
norm == encoded length) ride the same shuffle, salted across all
partitions by doc-id chunk; each partition folds them into its
per-field ``(dc, sum_dl)`` partials so the build needs exactly ONE
tokenize pass and ONE shuffle.
"""

from __future__ import annotations

import json
import os
import uuid
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from fdblucene_ray.codec.postings import (
    BLOCK_SIZE,
    SKIP_DTYPE,
    encode_partition,
    read_skips,
)
from fdblucene_ray.index.manifest import SegmentMeta
from fdblucene_ray.index.wire import unpack_docs, unpack_vals

# reserved term for per-doc stat rows; real tokens match [0-9a-z_]+ and
# keyword values containing '\x00'/'\x1f' are rejected at build
# (TokenizeToPostings raises), so no indexed term can collide with the
# sentinel or contain the field separator.
DOC_SENTINEL = "\x00doc"
FIELD_SEP = "\x1f"

TERMS_FILE = "terms.parquet"
TERMS_INDEX_FILE = "terms_index.json"
POSTINGS_FILE = "postings.bin"
SKIPS_FILE = "skips.bin"
META_FILE = "meta.json"
DOCLENS_FILE = "doclens.parquet"  # (field, doc_id, exact dl) — .nvd analog

# terms.parquet row-group size: the unit of lazy term-dictionary I/O.
# A lookup decodes exactly one row group (LRU-cached); the sidecar
# terms_index.json stores each row group's first key — the analog of
# Lucene's sampled term index (and of the reference's page-buffered
# FDBIndexInput reads + JCS block cache, FDBIndexInput.java:113-124,
# README.md:96-102).
TERMS_ROW_GROUP = 4096

POSTING_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("key", pa.string()),  # field \x1f term  (or field \x1f DOC_SENTINEL)
        ("doc_id", pa.int64()),
        ("tf", pa.int32()),
        ("norm", pa.uint8()),
    ]
)


def segments_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "segments")


def segment_path(index_dir: str, name: str) -> str:
    return os.path.join(segments_dir(index_dir), name)


def write_segment(
    index_dir: str,
    name: str,
    table: pa.Table,
    block_size: int = BLOCK_SIZE,
    codec: str = "varint-block",
) -> SegmentMeta:
    """Encode one shuffle partition (posting rows) into a segment.

    ``table`` columns: key, doc_id, tf, norm. Written to a temp dir and
    atomically renamed into place; if the segment already exists (retry
    of an idempotent task — doc ids are deterministic so a re-run is
    byte-identical) the existing one wins.
    """
    # fold out sentinel rows -> per-field (dc, sum_dl). Exact suffix
    # match (not substring): terms cannot contain \x1f or \x00 — the
    # analyzer's token charset is [0-9a-z_] and keyword values with
    # reserved bytes are rejected in TokenizeToPostings — so a key is a
    # sentinel iff it ends with FIELD_SEP + DOC_SENTINEL.
    keys = table["key"]
    is_sent = pc.ends_with(keys, FIELD_SEP + DOC_SENTINEL)
    sent = table.filter(is_sent)
    posts = table.filter(pc.invert(is_sent))

    field_stats: dict[str, dict[str, int]] = {}
    doclens: pa.Table | None = None
    if sent.num_rows:
        sfield = pc.replace_substring(
            sent["key"], FIELD_SEP + DOC_SENTINEL, ""
        )
        agg = (
            pa.table({"field": sfield, "dl": sent["tf"]})
            .group_by("field")
            .aggregate([("dl", "sum"), ("dl", "count")])
        )
        for row in agg.to_pylist():
            field_stats[row["field"]] = {
                "dc": int(row["dl_count"]),
                "sum_dl": int(row["dl_sum"]),
                "sdf": 0,
            }
        # row-level sentinels are per (field, doc): tf == exact dl
        doclens = pa.table(
            {
                "field": sfield,
                "doc_id": sent["doc_id"],
                "dl": sent["tf"].cast(pa.int64()),
            }
        ).sort_by([("field", "ascending"), ("doc_id", "ascending")])

    # sort by (key, doc_id): ascending-docID postings per term (DATA.md:53)
    # and lexicographic term order in the dictionary (DATA.md:47)
    idx = pc.sort_indices(
        posts, sort_keys=[("key", "ascending"), ("doc_id", "ascending")]
    )
    posts = posts.take(idx).combine_chunks()

    key_arr = posts["key"].combine_chunks() if posts.num_rows else pa.array([], pa.string())
    if isinstance(key_arr, pa.ChunkedArray):
        key_arr = key_arr.combine_chunks()
    doc_ids = posts["doc_id"].to_numpy(zero_copy_only=False)
    tfs = posts["tf"].to_numpy(zero_copy_only=False)
    norms = posts["norm"].to_numpy(zero_copy_only=False)

    # term run boundaries: dictionary codes are assigned in first-seen
    # order, which over a sorted column is monotone non-decreasing
    denc = key_arr.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False)
    n_terms = len(denc.dictionary)
    if len(codes):
        bounds = np.flatnonzero(np.diff(codes)) + 1
        starts = np.concatenate(([0], bounds)).astype(np.int64)
    else:
        starts = np.empty(0, np.int64)

    vocab = denc.dictionary.to_pylist()
    return _finalize_segment(
        index_dir, name, vocab, doc_ids, tfs, norms, starts, field_stats,
        block_size, doclens=doclens, codec=codec,
    )


def _concat_binary(arr) -> np.ndarray:
    """uint8 view of the concatenation of a pa.binary column's cells
    (cells live back-to-back in the values buffer, in logical order).
    Handles both binary (int32 offsets) and large_binary (int64) — some
    shuffle implementations round-trip through large types."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.empty(0, np.uint8)
    if pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type):
        odtype, osize = np.int64, 8
    else:
        odtype, osize = np.int32, 4
    offsets = np.frombuffer(
        arr.buffers()[1], dtype=odtype, count=len(arr) + 1, offset=arr.offset * osize
    )
    values = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return values[offsets[0] : offsets[-1]]


def write_segment_runs(
    index_dir: str,
    name: str,
    runs: pa.Table,
    block_size: int = BLOCK_SIZE,
    codec: str = "varint-block",
    wire: str = "raw",
) -> SegmentMeta:
    """Encode one shuffle partition of RUN rows into a segment.

    ``runs`` columns: key, min_doc, n, sum_tf, docs/tfs/norms (binary
    cells packing this batch's postings for the term). Runs of one term
    normally cover disjoint ascending doc ranges (batches are contiguous
    doc ranges), so ordering runs by (key, min_doc) concatenates into
    sorted posting lists; a vectorized monotonicity check catches the
    rare interleaved case and falls back to a per-partition lexsort.
    """
    keys = runs["key"]
    # exact suffix match — see write_segment for why this is exact
    is_sent = pc.ends_with(keys, FIELD_SEP + DOC_SENTINEL)
    sent = runs.filter(is_sent)
    posts = runs.filter(pc.invert(is_sent))

    field_stats: dict[str, dict[str, int]] = {}
    doclens: pa.Table | None = None
    if sent.num_rows:
        sfield = pc.replace_substring(sent["key"], FIELD_SEP + DOC_SENTINEL, "")
        agg = (
            pa.table({"field": sfield, "n": sent["n"], "dl": sent["sum_tf"]})
            .group_by("field")
            .aggregate([("n", "sum"), ("dl", "sum")])
        )
        for row in agg.to_pylist():
            field_stats[row["field"]] = {
                "dc": int(row["n_sum"]),
                "sum_dl": int(row["dl_sum"]),
                "sdf": 0,
            }
        # per-doc exact lengths (packed in the sentinel runs' docs/tfs
        # cells) -> doclens sidecar; empty cells = legacy aggregate-only
        # sentinels (row-level build path writes its own below)
        cell_bytes = pc.binary_length(sent["docs"]).fill_null(0).to_numpy(
            zero_copy_only=False
        )
        if cell_bytes.sum() > 0:
            # wire cells (index/wire.py, format per the build's ``wire``
            # knob); legacy aggregate-only sentinel rows: empty cells, n=0
            n_col = sent["n"].to_numpy(zero_copy_only=False).astype(np.int64)
            n_per = np.where(cell_bytes > 0, n_col, 0)
            dl_docs = unpack_docs(
                _concat_binary(sent["docs"]), n_per,
                sent["min_doc"].to_numpy(zero_copy_only=False), wire,
            )
            dl_lens = unpack_vals(
                _concat_binary(sent["tfs"]), int(n_per.sum()), wire
            ).astype(np.int64)
            fields_rep = sfield.take(
                pa.array(np.repeat(np.arange(sent.num_rows), n_per))
            )
            doclens = pa.table(
                {
                    "field": fields_rep,
                    "doc_id": pa.array(dl_docs, pa.int64()),
                    "dl": pa.array(dl_lens.astype(np.int64), pa.int64()),
                }
            ).sort_by([("field", "ascending"), ("doc_id", "ascending")])

    idx = pc.sort_indices(
        posts, sort_keys=[("key", "ascending"), ("min_doc", "ascending")]
    )
    posts = posts.take(idx).combine_chunks()
    key_arr = posts["key"].combine_chunks() if posts.num_rows else pa.array([], pa.string())
    if isinstance(key_arr, pa.ChunkedArray):
        key_arr = key_arr.combine_chunks()

    n_per_run = posts["n"].to_numpy(zero_copy_only=False).astype(np.int64) if posts.num_rows else np.empty(0, np.int64)
    doc_ids = (
        unpack_docs(
            _concat_binary(posts["docs"]), n_per_run,
            posts["min_doc"].to_numpy(zero_copy_only=False), wire,
        )
        if posts.num_rows
        else np.empty(0, np.int64)
    )
    tfs = (
        unpack_vals(
            _concat_binary(posts["tfs"]), int(n_per_run.sum()), wire
        ).astype(np.int32)
        if posts.num_rows
        else np.empty(0, np.int32)
    )
    norms = (
        _concat_binary(posts["norms"]).copy() if posts.num_rows else np.empty(0, np.uint8)
    )
    run_offsets = np.concatenate(([0], np.cumsum(n_per_run))).astype(np.int64)

    # optional per-run position payloads: a run either packs 4*sum(tf)
    # position bytes or none (field indexed without positions)
    positions = None
    pos_counts = None
    if "pos" in posts.column_names and posts.num_rows:
        pos_col = posts["pos"]
        if isinstance(pos_col, pa.ChunkedArray):
            pos_col = pos_col.combine_chunks()
        cell_bytes = pc.binary_length(pos_col).fill_null(0).to_numpy(
            zero_copy_only=False
        )
        if cell_bytes.sum() > 0:
            positions = _concat_binary(pos_col).view("<i4").astype(np.int64)
            run_positional = cell_bytes > 0
            pos_counts = tfs.astype(np.int64) * np.repeat(
                run_positional.astype(np.int64), n_per_run
            )

    denc = key_arr.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False)
    if len(codes):
        run_bounds = np.concatenate(([0], np.flatnonzero(np.diff(codes)) + 1))
        term_starts = run_offsets[run_bounds]
    else:
        run_bounds = np.empty(0, np.int64)
        term_starts = np.empty(0, np.int64)

    # monotonicity check: doc ids strictly increase within each term
    if len(doc_ids) > 1:
        ok = np.diff(doc_ids) > 0
        ok[term_starts[1:] - 1] = True  # term boundaries may go backwards
        if not ok.all():
            term_of_post = np.repeat(
                np.arange(len(term_starts)),
                np.diff(np.concatenate((term_starts, [len(doc_ids)]))),
            )
            order = np.lexsort((doc_ids, term_of_post))
            if positions is not None:
                from fdblucene_ray.index.build import gather_groups

                positions = gather_groups(positions, pos_counts, order)
                pos_counts = pos_counts[order]
            doc_ids = np.ascontiguousarray(doc_ids[order])
            tfs = np.ascontiguousarray(tfs[order])
            norms = norms[order]

    # dictionary codes are first-seen order == sorted order over the
    # sorted key column; one vocab entry per term (first run of each)
    vocab = [denc.dictionary[int(codes[b])].as_py() for b in run_bounds]
    return _finalize_segment(
        index_dir, name, vocab, doc_ids, tfs, norms, term_starts, field_stats,
        block_size, positions=positions, pos_counts=pos_counts, doclens=doclens,
        codec=codec,
    )


def _finalize_segment(
    index_dir: str,
    name: str,
    vocab: list[str],
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    norms: np.ndarray,
    term_starts: np.ndarray,
    field_stats: dict[str, dict[str, int]],
    block_size: int,
    positions: np.ndarray | None = None,
    pos_counts: np.ndarray | None = None,
    doclens: pa.Table | None = None,
    codec: str = "varint-block",
) -> SegmentMeta:
    """Bulk-encode sorted postings + write the segment files atomically."""
    from fdblucene_ray.codec.registry import get_codec

    pp = get_codec(codec).encode_partition(
        doc_ids, tfs, norms, term_starts, block_size, positions, pos_counts
    )
    n_terms = len(vocab)
    if n_terms != len(pp.df):
        raise ValueError(
            f"vocab/postings desync: {n_terms} terms vs {len(pp.df)} encoded "
            f"({len(doc_ids)} postings) — binary run payload misread?"
        )

    t_field, t_term = [], []
    for ti in range(n_terms):
        f, _, term = vocab[ti].partition(FIELD_SEP)
        t_field.append(f)
        t_term.append(term)
        stats = field_stats.setdefault(f, {"dc": 0, "sum_dl": 0, "sdf": 0})
        stats["sdf"] += int(pp.df[ti])

    terms_table = pa.table(
        {
            "field": pa.array(t_field, pa.string()),
            "term": pa.array(t_term, pa.string()),
            "df": pa.array(pp.df, pa.int64()),
            "ttf": pa.array(pp.ttf, pa.int64()),
            "post_offset": pa.array(pp.post_offset, pa.int64()),
            "post_len": pa.array(pp.post_len, pa.int64()),
            "skip_offset": pa.array(pp.skip_offset, pa.int64()),
            "n_blocks": pa.array(pp.n_blocks.astype(np.int32)),
        }
    )

    post_bytes = pp.blob
    skip_bytes = pp.skips
    meta = SegmentMeta(
        name=name,
        n_terms=n_terms,
        n_postings=int(len(doc_ids)),
        field_stats=field_stats,
        postings_crc=zlib.crc32(post_bytes),
        skips_crc=zlib.crc32(skip_bytes),
        doc_id_min=int(doc_ids.min()) if len(doc_ids) else -1,
        doc_id_max=int(doc_ids.max()) if len(doc_ids) else -1,
    )

    final = segment_path(index_dir, name)
    if os.path.exists(final):
        return meta  # idempotent retry — deterministic content already there
    tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(
        terms_table, os.path.join(tmp, TERMS_FILE), row_group_size=TERMS_ROW_GROUP
    )
    # sampled term index: first (field \x1f term) key of every row group
    first_keys = [
        t_field[i] + FIELD_SEP + t_term[i]
        for i in range(0, n_terms, TERMS_ROW_GROUP)
    ]
    with open(os.path.join(tmp, TERMS_INDEX_FILE), "w") as fh:
        json.dump(
            {"row_group_size": TERMS_ROW_GROUP, "first_keys": first_keys}, fh
        )
    if doclens is not None and doclens.num_rows:
        pq.write_table(doclens, os.path.join(tmp, DOCLENS_FILE))
    with open(os.path.join(tmp, POSTINGS_FILE), "wb") as fh:
        fh.write(post_bytes)
    with open(os.path.join(tmp, SKIPS_FILE), "wb") as fh:
        fh.write(skip_bytes)
    with open(os.path.join(tmp, META_FILE), "w") as fh:
        json.dump(meta.to_json(), fh, sort_keys=True)
    try:
        os.rename(tmp, final)
    except OSError:
        if not os.path.exists(final):  # pragma: no cover
            raise
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return meta


class SegmentReader:
    """Read-side view of one segment. Memory-maps the posting blob
    (zero-copy; the analog of FDBIndexInput's page-buffered random reads,
    FDBIndexInput.java:113-124, minus the coordination — segments are
    immutable so no read-version logic is needed, cf ReadVersionCache)."""

    # decoded terms row groups kept per reader (Lucene term-index +
    # block-cache analog); small because each entry is <= TERMS_ROW_GROUP
    # dictionary rows
    RG_CACHE_MAX = 32

    def __init__(self, index_dir: str, meta: SegmentMeta,
                 codec: str = "varint-block"):
        from fdblucene_ray.codec.registry import get_codec

        self.meta = meta
        self.codec = get_codec(codec)  # decode dispatch (U3 codec SPI)
        self.path = segment_path(index_dir, meta.name)
        self._terms: pa.Table | None = None
        self._postings = None
        self._skips = None
        self._lookup: dict[tuple[str, str], int] | None = None
        self._tindex = None  # (rg_size, first_keys) | False when sidecar absent
        self._pf = None  # open pq.ParquetFile handle for row-group reads
        self._rg_cache: dict[int, tuple[list[str], dict]] = {}
        self.rg_loads = 0  # row groups decoded (bounded-I/O tests/metrics)
        # decoded posting-block LRU shared across queries on this reader
        # (the ST3/JCS block-cache analog, README.md:96-102): hot terms
        # repeated across a query batch decode each block once
        self.block_cache: dict[tuple[int, int], tuple] = {}
        self.block_cache_max = 256
        # full-decode LRU for the vectorized exhaustive path, budgeted
        # in POSTINGS (not entries — list sizes vary wildly)
        self.list_cache: dict[int, tuple] = {}
        self.list_cache_budget = 4_000_000
        self._list_cache_load = 0

    def decode_term_all(self, field: str, term: str, block_size: int):
        """Full (docs, tfs, norms) decode of a term's postings, LRU-
        cached by postings budget — hot query terms repeated across a
        batch decode once per reader."""
        decode_all = self.codec.decode_all

        r = self._term_row(field, term)
        if r is None:
            return None
        off = int(r["post_offset"])
        hit = self.list_cache.get(off)
        if hit is not None:
            self.list_cache[off] = self.list_cache.pop(off)  # LRU bump
            return hit
        blob, skips = self._blob()
        sk = read_skips(
            memoryview(skips)[
                int(r["skip_offset"]) : int(r["skip_offset"])
                + int(r["n_blocks"]) * SKIP_DTYPE.itemsize
            ]
        )
        dec = decode_all(
            memoryview(blob)[off : off + int(r["post_len"])],
            sk,
            int(r["df"]),
            block_size,
        )
        n = len(dec[0])
        if n <= self.list_cache_budget:
            while self._list_cache_load + n > self.list_cache_budget and self.list_cache:
                old = self.list_cache.pop(next(iter(self.list_cache)))
                self._list_cache_load -= len(old[0])
            self.list_cache[off] = dec
            self._list_cache_load += n
        return dec

    @property
    def terms(self) -> pa.Table:
        if self._terms is None:
            self._terms = pq.read_table(os.path.join(self.path, TERMS_FILE))
        return self._terms

    def doclens(self) -> pa.Table | None:
        """Per-doc exact analyzed lengths (field, doc_id, dl) — the
        .nvd norms-file analog; None for legacy segments without the
        sidecar. Used by merge to purge tombstoned docs' collection
        stats exactly."""
        p = os.path.join(self.path, DOCLENS_FILE)
        if not os.path.exists(p):
            return None
        return pq.read_table(p)

    def doclens_for(self, field: str, doc_ids: np.ndarray) -> pa.Table:
        """(doc_id, dl) rows of this segment's doclens sidecar for the
        given (sorted) candidate ids — parquet predicate pushdown prunes
        row groups via min/max stats (sidecar is sorted by
        (field, doc_id)). Empty table when the sidecar is absent."""
        import pyarrow.dataset as pads

        p = os.path.join(self.path, DOCLENS_FILE)
        if not os.path.exists(p) or not len(doc_ids):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "dl": pa.array([], pa.int64())})
        import pyarrow.compute as pc

        t = pads.dataset(p, format="parquet").to_table(
            columns=["doc_id", "dl"],
            filter=(pc.field("field") == field)
            & pc.field("doc_id").isin(pa.array(doc_ids, pa.int64())),
        )
        return t

    def _blob(self):
        if self._postings is None:
            self._postings = np.memmap(
                os.path.join(self.path, POSTINGS_FILE), dtype=np.uint8, mode="r"
            ) if os.path.getsize(os.path.join(self.path, POSTINGS_FILE)) else np.empty(0, np.uint8)
            self._skips = (
                np.memmap(os.path.join(self.path, SKIPS_FILE), dtype=np.uint8, mode="r")
                if os.path.getsize(os.path.join(self.path, SKIPS_FILE))
                else np.empty(0, np.uint8)
            )
        return self._postings, self._skips

    def verify(self) -> None:
        """CRC32 integrity check of the posting + skip blobs against the
        manifest (the analog of Lucene's CodecUtil checksum verification /
        the reference's streaming CRC, FDBIndexOutput.java:113-115).
        Raises ValueError on mismatch."""
        import zlib

        with open(os.path.join(self.path, POSTINGS_FILE), "rb") as fh:
            if zlib.crc32(fh.read()) != self.meta.postings_crc:
                raise ValueError(f"postings CRC mismatch in {self.meta.name}")
        with open(os.path.join(self.path, SKIPS_FILE), "rb") as fh:
            if zlib.crc32(fh.read()) != self.meta.skips_crc:
                raise ValueError(f"skips CRC mismatch in {self.meta.name}")

    def term_index(self, field: str, term: str) -> int | None:
        """Row index of (field, term) in the FULL terms table, or None.
        Materializes the whole dictionary — legacy/debug path only; the
        query path uses the lazy ``_term_row`` instead."""
        if self._lookup is None:
            t = self.terms
            self._lookup = {
                (f, tm): i
                for i, (f, tm) in enumerate(
                    zip(t["field"].to_pylist(), t["term"].to_pylist())
                )
            }
        return self._lookup.get((field, term))

    # ---- lazy term dictionary (ST3 page-cache analog) ----

    def _load_tindex(self):
        if self._tindex is None:
            p = os.path.join(self.path, TERMS_INDEX_FILE)
            if os.path.exists(p):
                with open(p) as fh:
                    d = json.load(fh)
                self._tindex = (int(d["row_group_size"]), d["first_keys"])
            else:
                self._tindex = False  # pre-sidecar segment: full-dict path
        return self._tindex

    def _load_rg(self, rg: int) -> tuple[list[str], dict]:
        """Decode one terms row group -> (sorted keys, column arrays).
        LRU-cached; a term lookup therefore reads a bounded slice of
        terms.parquet no matter how large the dictionary is."""
        hit = self._rg_cache.get(rg)
        if hit is not None:
            return hit
        if self._pf is None:
            self._pf = pq.ParquetFile(os.path.join(self.path, TERMS_FILE))
        t = self._pf.read_row_group(rg)
        self.rg_loads += 1
        fields = t["field"].to_pylist()
        tnames = t["term"].to_pylist()
        keys = [f + FIELD_SEP + tm for f, tm in zip(fields, tnames)]
        cols = {
            c: t[c].to_numpy(zero_copy_only=False)
            for c in ("df", "ttf", "post_offset", "post_len", "skip_offset", "n_blocks")
        }
        if len(self._rg_cache) >= self.RG_CACHE_MAX:
            self._rg_cache.pop(next(iter(self._rg_cache)))
        self._rg_cache[rg] = (keys, cols)
        return keys, cols

    def _term_row(self, field: str, term: str):
        """Lazy dictionary lookup -> column dict row or None. Binary
        search over the sampled first-keys sidecar, then within the one
        decoded row group."""
        import bisect

        idx = self._load_tindex()
        if idx is False:
            i = self.term_index(field, term)
            if i is None:
                return None
            t = self.terms
            return {
                c: t[c][i].as_py()
                for c in ("df", "ttf", "post_offset", "post_len",
                          "skip_offset", "n_blocks")
            }
        rg_size, first_keys = idx
        if not first_keys:
            return None
        key = field + FIELD_SEP + term
        rg = bisect.bisect_right(first_keys, key) - 1
        if rg < 0:
            return None
        keys, cols = self._load_rg(rg)
        j = bisect.bisect_left(keys, key)
        if j >= len(keys) or keys[j] != key:
            return None
        return {c: int(a[j]) for c, a in cols.items()}

    def term_range(self, field: str, lo: str = "", hi: str | None = None):
        """Iterate ``(term, df)`` over the lexicographic term range
        ``[lo, hi)`` of ``field``, reading ONLY the terms.parquet row
        groups that overlap the range (sampled-term-index pruning — the
        TermsEnum.seekCeil analog; a narrow prefix touches O(1) row
        groups no matter the dictionary size). ``hi=None`` means the end
        of the field's terms."""
        import bisect

        key_lo = field + FIELD_SEP + lo
        # FIELD_SEP is \x1f, so field+"\x20" upper-bounds every
        # field+\x1f+term key without bounding any other field
        key_hi = field + FIELD_SEP + hi if hi is not None else field + "\x20"
        idx = self._load_tindex()
        if idx is False:  # pre-sidecar segment: full-table fallback
            t = self.terms
            for f, tm, df in zip(
                t["field"].to_pylist(), t["term"].to_pylist(), t["df"].to_pylist()
            ):
                k = f + FIELD_SEP + tm
                if key_lo <= k < key_hi:
                    yield tm, int(df)
            return
        rg_size, first_keys = idx
        if not first_keys:
            return
        rg_start = max(bisect.bisect_right(first_keys, key_lo) - 1, 0)
        rg_end = max(bisect.bisect_right(first_keys, key_hi) - 1, 0)
        for rg in range(rg_start, rg_end + 1):
            keys, cols = self._load_rg(rg)
            j0 = bisect.bisect_left(keys, key_lo)
            j1 = bisect.bisect_left(keys, key_hi)
            plen = len(field) + 1
            for j in range(j0, j1):
                yield keys[j][plen:], int(cols["df"][j])

    def term_stats(self, field: str, term: str) -> tuple[int, int]:
        """(df, ttf) of the term in this segment (0, 0) if absent."""
        r = self._term_row(field, term)
        if r is None:
            return 0, 0
        return int(r["df"]), int(r["ttf"])

    def postings_handle(self, field: str, term: str):
        """-> (blob_view, skips_array, n_docs) or None."""
        r = self._term_row(field, term)
        if r is None:
            return None
        off = int(r["post_offset"])
        plen = int(r["post_len"])
        soff = int(r["skip_offset"])
        nb = int(r["n_blocks"])
        df = int(r["df"])
        blob, skips = self._blob()
        sk = read_skips(memoryview(skips)[soff : soff + nb * SKIP_DTYPE.itemsize])
        return memoryview(blob)[off : off + plen], sk, df

    def cursor_handle(self, field: str, term: str):
        """postings_handle + the reader's shared decoded-block cache:
        -> (blob_view, skips, n_docs, cache_dict, cache_key) or None.
        ``cache_key`` (the term's blob offset) uniquely identifies the
        term within this segment."""
        r = self._term_row(field, term)
        if r is None:
            return None
        off = int(r["post_offset"])
        plen = int(r["post_len"])
        soff = int(r["skip_offset"])
        nb = int(r["n_blocks"])
        df = int(r["df"])
        blob, skips = self._blob()
        sk = read_skips(memoryview(skips)[soff : soff + nb * SKIP_DTYPE.itemsize])
        return memoryview(blob)[off : off + plen], sk, df, self.block_cache, off
