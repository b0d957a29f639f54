"""Distributed suffix-array exact-substring dedup — the EXACT half of
Lee et al. (ACL'22, "Deduplicating Training Data Makes Language Models
Better") at ARBITRARY match length, in bytes: report every maximal
region of every document that is covered by length-``min_len`` byte
windows occurring in >= ``min_df`` DISTINCT documents. The n-gram
token span scrub (``webtext.exact_dup_spans``) remains the cheap path;
this module is the byte-exact arbitrary-length path.

Why the output is exact: a duplicated substring of length >= L is, by
definition, covered by duplicated L-byte windows at every one of its
start offsets, and conversely the union of duplicated L-windows is the
union of all duplicated substrings of length >= L. So "maximal merged
runs of duplicated L-windows" IS Lee et al.'s removal set, with no
dependence on tokenization.

Distributed shape (partition-bounded — no whole-corpus concatenation or
materialization anywhere):

1. **Per-batch class reduction** (`_SuffixSeeds`): each corpus batch
   concatenates ITS docs only and groups positions into L-gram
   classes — by the O(n) rolling hash (default ``seed_mode="hash"``;
   a collision can only ADD a candidate, which the literal verify
   stage rejects) or by truncated prefix-doubling
   (``seed_mode="suffix_sort"``, `_lgram_classes`: Manber–Myers ranks
   with the sparse-table overlap refinement — EXACT byte-equality
   classes, no collision reliance even in the combiner stats, the
   arbitrary-length/audit path). Per class the batch emits at most
   ONE (class-hash, clamped distinct-doc count) row — a combiner:
   volume is per-DISTINCT-gram, never per position; neither positions
   nor doc ids leave the batch (each doc lives in exactly one batch,
   so clamped counts sum to exact distinct-doc detection).
2. **Hash-partitioned candidate fold**: group the class rows by
   hash(h)%P; a class hash seen in >= min_df distinct docs globally is
   a candidate. (Rolling-hash collisions can only ADD candidates —
   false positives die in step 4 — never lose one.)
3. **Candidate distribution**: the candidate hash set streams back to
   the driver bounded — an exact sorted uint64 array when small, a
   fixed-size Bloom filter above ``broadcast_limit`` (filter FPs also
   die in step 4) — and ships via ``ray.put`` once, read per worker.
4. **Literal re-emit + byte verify**: a second corpus pass recomputes
   every valid position's rolling hash (O(n), no sort) and emits the
   LITERAL L-byte window only for candidate hits — volume proportional
   to actual duplication — then a hash-partitioned fold
   dictionary-encodes the window BYTES and keeps occurrences whose
   window appears in >= min_df distinct docs. Byte-exact from here on.
5. **Maximal merge**: verified (doc_id, pos) rows co-partition with
   the corpus on ONE hash(doc_id)%P exchange (``webtext._spans_scatter``)
   and a vectorized kernel merges each doc's covered positions into
   maximal byte regions, slicing the literal span bytes zero-copy.

Reference parity: fdb-lucene has no character-level dedup; this op is
the Lee et al. ExactSubstr analog the LLM-data tier requires
(cf. google-research/deduplicate-text-datasets' single-machine chunked
suffix array; here chunks are Ray batches and the merge is the
hash-partitioned candidate fold instead of a disk k-way merge).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from fdblucene_ray.ops.hashing import part_of

# odd multiplier -> invertible mod 2^64, so window hashes pop out of
# one prefix-sum (see _window_hashes); the exact constant is arbitrary
_P = np.uint64(0x100000001B3)  # FNV-1a prime
_PINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))


def _lgram_classes(b: np.ndarray, L: int) -> np.ndarray:
    """EXACT equivalence classes of the length-``L`` prefixes of all
    suffixes of byte array ``b``: Manber–Myers prefix doubling, capped
    at L with the sparse-table overlap step (pair ranks at offset
    ``min(k, L-k)`` so the covered window length is min(2k, L), never
    more). Positions whose suffix is shorter than the covered length
    compare via a -1 sentinel (distinct from every real rank), which
    is correct here because callers drop positions with fewer than L
    bytes remaining in their own doc."""
    n = len(b)
    if n == 0:
        return np.empty(0, np.int64)
    rank = b.astype(np.int64)
    k = 1
    while k < L:
        step = min(k, L - k)
        second = np.full(n, -1, np.int64)
        cut = max(n - step, 0)  # step can exceed n on tiny chunks
        second[:cut] = rank[step:]
        order = np.lexsort((second, rank))
        r_s, s_s = rank[order], second[order]
        head = np.empty(n, bool)
        head[0] = True
        head[1:] = (r_s[1:] != r_s[:-1]) | (s_s[1:] != s_s[:-1])
        new_rank = np.empty(n, np.int64)
        new_rank[order] = np.cumsum(head) - 1
        rank = new_rank
        k += step
    return rank


def _window_hashes(b: np.ndarray, L: int) -> np.ndarray:
    """uint64 polynomial hash of EVERY length-``L`` byte window of
    ``b`` in one vectorized pass: h[i] = sum_j b[i+j] * P^(L-1-j)
    (mod 2^64), recovered from a single prefix sum of b[j] * P^(-j)
    because the odd multiplier is invertible mod 2^64. Entries within
    L-1 of the end are garbage — callers mask them (they can never be
    valid window starts)."""
    n = len(b)
    if n == 0:
        return np.empty(0, np.uint64)
    pinv_pows = np.empty(n, np.uint64)
    pinv_pows[0] = 1
    if n > 1:
        pinv_pows[1:] = _PINV
        np.cumprod(pinv_pows, out=pinv_pows)
    pows = np.empty(n, np.uint64)
    pows[0] = 1
    if n > 1:
        pows[1:] = _P
        np.cumprod(pows, out=pows)
    pref = np.zeros(n + 1, np.uint64)
    np.cumsum(b.astype(np.uint64) * pinv_pows, out=pref[1:])
    m = min(L, n)
    # h[i] = (pref[i+L] - pref[i]) * P^(i+L-1)
    out = np.zeros(n, np.uint64)
    valid = n - m + 1
    out[:valid] = (pref[m:] - pref[:valid]) * pows[m - 1] * pows[:valid]
    return out


def _flat_bytes(texts) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 byte stream, per-doc offsets) of a string/binary
    column — zero-copy views of the Arrow buffers."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.cast(texts, pa.binary())
    offs = np.frombuffer(texts.buffers()[1], np.int32)[
        texts.offset : texts.offset + len(texts) + 1
    ].astype(np.int64)
    data = np.frombuffer(texts.buffers()[2], np.uint8)
    flat = data[offs[0] : offs[-1]]
    return flat, offs - offs[0]


def _chunked_from_ranges(
    values: np.ndarray, lens: np.ndarray, type_=pa.binary()
):
    """Build a binary/string column from (flat byte values, per-row
    byte lengths) as a CHUNKED array whose chunks each stay under the
    int32 offset limit — one partition can carry >2 GB of payload
    without overflowing offsets or changing the column type (a
    large_binary fallback would fork the schema across batches)."""
    n = len(lens)
    if n == 0:
        return pa.chunked_array([pa.array([], type_)])
    bounds = np.concatenate(([0], np.cumsum(lens, dtype=np.int64)))
    limit = np.iinfo(np.int32).max
    chunks = []
    row0 = 0
    while row0 < n:
        # widest prefix of rows whose byte span fits int32
        hi = int(
            np.searchsorted(bounds, bounds[row0] + limit, side="right")
        ) - 1
        hi = max(hi, row0 + 1)  # a single row always fits (< 2 GB)
        offs = (bounds[row0 : hi + 1] - bounds[row0]).astype(np.int32)
        chunks.append(
            pa.Array.from_buffers(
                type_, hi - row0,
                [None, pa.py_buffer(offs.tobytes()),
                 pa.py_buffer(
                     values[bounds[row0] : bounds[hi]].tobytes())],
            )
        )
        row0 = hi
    return pa.chunked_array(chunks)


class _SuffixSeeds:
    """Pass-1 combiner: reduce the batch's positions to ONE
    (part, class hash, clamped distinct-doc count) row per L-gram
    class. Positions and doc ids stay in the batch.

    Two class engines, identical FINAL pipeline output (the literal
    verify stage removes any hash collision):

    - ``seed_mode="hash"`` (default): group positions by their O(n)
      rolling window hash — one 1-key lexsort per batch. A collision
      merely merges two classes, which can only ADD a candidate that
      literal verification then rejects; it can never lose one.
    - ``seed_mode="suffix_sort"``: truncated Manber–Myers prefix
      doubling (``_lgram_classes``) — EXACT byte-equality classes, no
      collision reliance even in the combiner stats, at ~log2(L)
      extra lexsorts per batch. The arbitrary-length path and the
      collision-free audit mode."""

    def __init__(self, L: int, min_df: int, num_parts: int,
                 text_col: str, id_col: str,
                 seed_mode: str = "hash"):
        self.L, self.min_df, self.num_parts = L, min_df, num_parts
        self.text_col, self.id_col = text_col, id_col
        self.seed_mode = seed_mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"part": pa.array([], pa.int32()),
             "h": pa.array([], pa.uint64()),
             "cnt": pa.array([], pa.int32())}
        )
        L = self.L
        flat, bounds = _flat_bytes(batch[self.text_col])
        n = len(flat)
        if not n:
            return empty
        lens = bounds[1:] - bounds[:-1]
        h_all = _window_hashes(flat, L)
        doc_end = np.repeat(bounds[1:], lens)
        pos_all = np.arange(n, dtype=np.int64)
        valid = doc_end - pos_all >= L
        vpos = pos_all[valid]
        if not len(vpos):
            return empty
        if self.seed_mode == "suffix_sort":
            vcls = _lgram_classes(flat, L)[valid]
        else:
            vcls = h_all[valid].view(np.int64)
        vdoc = np.repeat(
            np.arange(len(lens), dtype=np.int64), lens
        )[valid]
        order = np.lexsort((vdoc, vcls))
        cs, ds_, ps = vcls[order], vdoc[order], vpos[order]
        head_c = np.empty(len(cs), bool)
        head_c[0] = True
        head_c[1:] = cs[1:] != cs[:-1]
        head_d = head_c.copy()
        head_d[1:] |= ds_[1:] != ds_[:-1]
        # one content hash per class, from a representative position
        h_out = h_all[ps[np.flatnonzero(head_c)]]
        # ONE row per class: its batch-local DISTINCT-doc count,
        # clamped to min_df. Doc ids need not ship at all — every
        # doc lives in exactly one batch, so summing clamped counts
        # per hash across batches counts distinct docs exactly up to
        # the min_df threshold.
        idx_d = np.flatnonzero(head_d)
        grp = np.cumsum(head_c[idx_d]) - 1
        cnt = np.minimum(
            np.bincount(grp), self.min_df
        ).astype(np.int32)
        return pa.table(
            {
                "part": pa.array(
                    part_of(h_out.view(np.int64), self.num_parts)
                ),
                "h": pa.array(h_out),
                "cnt": pa.array(cnt),
            }
        )


def _cand_fold(min_df: int):
    """Per hash partition: a class hash whose clamped per-batch
    distinct-doc counts SUM to >= min_df is a candidate (each doc
    lives in exactly one batch, so the sum counts distinct docs
    exactly up to the threshold)."""

    def fn(group: pa.Table) -> pa.Table:
        h = group["h"].to_numpy(zero_copy_only=False)
        c = group["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table({"h": pa.array([], pa.uint64())})
        if not len(h):
            return empty
        order = np.argsort(h, kind="stable")
        hs, cs = h[order], c[order]
        head_h = np.empty(len(hs), bool)
        head_h[0] = True
        head_h[1:] = hs[1:] != hs[:-1]
        hid = np.cumsum(head_h) - 1
        ndocs = np.bincount(hid, weights=cs)
        win = ndocs >= min_df
        if not win.any():
            return empty
        return pa.table({"h": pa.array(hs[np.flatnonzero(head_h)][win])})

    fn.__name__ = "_cand_fold"
    return fn


# ------------------------------------------------------- bloom filter


def _bloom_params(n_keys: int, bits_per_key: int = 16) -> tuple[int, int]:
    """(#64-bit words, #probes) for ~0.05% FP at 16 bits/key."""
    nbits = max(1 << 16, 1 << int(np.ceil(np.log2(max(n_keys, 1) * bits_per_key))))
    return nbits // 64, 7


def _bloom_probes(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent avalanche-mixed probe bases per key. Raw keys
    MUST NOT seed the double-hash progression directly: with a
    power-of-two bit count, h1 + i*(key*C|1) concentrates one probe
    index on multiples of gcd(1+iC, 2^m) and the per-probe FP rate
    collapses to ~fill instead of fill^k (measured before the fix)."""
    from fdblucene_ray.ops.hashing import splitmix64

    h1 = splitmix64(keys)
    h2 = splitmix64(keys ^ np.uint64(0xA5A5A5A55A5A5A5A)) | np.uint64(1)
    return h1, h2


def _bloom_add(words: np.ndarray, keys: np.ndarray, k: int) -> None:
    nbits = np.uint64(len(words) * 64)
    h1, h2 = _bloom_probes(keys)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % nbits
        np.bitwise_or.at(
            words, (idx >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (idx & np.uint64(63)),
        )


def _bloom_test(words: np.ndarray, keys: np.ndarray, k: int) -> np.ndarray:
    nbits = np.uint64(len(words) * 64)
    h1, h2 = _bloom_probes(keys)
    hit = np.ones(len(keys), bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % nbits
        w = words[(idx >> np.uint64(6)).astype(np.int64)]
        hit &= ((w >> (idx & np.uint64(63))) & np.uint64(1)).astype(bool)
    return hit


class _EmitCandidateWindows:
    """Pass 2: recompute every valid position's window hash (O(n)
    prefix sum — no sort needed this time), test membership against
    the broadcast candidate structure, and emit the LITERAL L-byte
    window for hits only (volume ~ actual duplication + filter FPs)."""

    def __init__(self, L: int, cand_ref, exact: bool, bloom_k: int,
                 num_parts: int, text_col: str, id_col: str):
        self.L, self.cand_ref, self.exact = L, cand_ref, exact
        self.bloom_k, self.num_parts = bloom_k, num_parts
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        from fdblucene_ray.ops.broadcast import cached_state

        empty = pa.table(
            {"part": pa.array([], pa.int32()),
             "gram": pa.array([], pa.binary()),
             "doc_id": pa.array([], pa.int64()),
             "pos": pa.array([], pa.int64())}
        )
        L = self.L
        flat, bounds = _flat_bytes(batch[self.text_col])
        n = len(flat)
        if not n:
            return empty
        cand = cached_state(
            ("suffix_cand", self.cand_ref.hex()),
            lambda: ray.get(self.cand_ref),
        )
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = bounds[1:] - bounds[:-1]
        h_all = _window_hashes(flat, L)
        pos_all = np.arange(n, dtype=np.int64)
        doc_end = np.repeat(bounds[1:], lens)
        valid = doc_end - pos_all >= L
        if self.exact:
            j = np.searchsorted(cand, h_all)
            j[j == len(cand)] = 0
            member = (cand[j] == h_all) if len(cand) else np.zeros(n, bool)
        else:
            member = _bloom_test(cand, h_all, self.bloom_k)
        hits = np.flatnonzero(valid & member)
        if not len(hits):
            return empty
        di = np.repeat(np.arange(len(ids), dtype=np.int64), lens)[hits]
        gidx = hits[:, None] + np.arange(L, dtype=np.int64)
        values = flat[gidx.ravel()]
        # chunked so a heavily-duplicated partition's window payload
        # can exceed the int32 offset limit without schema change
        grams = _chunked_from_ranges(
            values, np.full(len(hits), L, np.int64)
        )
        return pa.table(
            {
                "part": pa.array(
                    part_of(h_all[hits].view(np.int64), self.num_parts)
                ),
                "gram": grams,
                "doc_id": pa.array(ids[di]),
                "pos": pa.array(hits - bounds[di]),
            }
        )


class _MaximalByteSpans:
    """Final kernel (runs inside ``webtext._spans_scatter``): merge a
    doc's verified window starts (sorted + deduped by ``_fold_spans``)
    into maximal covered BYTE regions and slice the literal span
    bytes — region break where the next start exceeds the previous
    start by more than L (coverage gap)."""

    def __init__(self, L: int):
        self.L = L

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "span_start": pa.array([], pa.int64()),
                "span_end": pa.array([], pa.int64()),
                "n_bytes": pa.array([], pa.int64()),
                "span_text": pa.array([], pa.binary()),
            }
        )
        if not batch.num_rows:
            return empty
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, bounds = _flat_bytes(batch["text"])
        sp = batch["spans"]
        if isinstance(sp, pa.ChunkedArray):
            sp = sp.combine_chunks()
        offs = np.frombuffer(sp.buffers()[1], np.int32)[
            sp.offset : sp.offset + len(sp) + 1
        ].astype(np.int64)
        starts = np.frombuffer(
            sp.buffers()[2], "<i8",
            count=int(offs[-1] - offs[0]) // 8, offset=int(offs[0]),
        ).astype(np.int64)
        if not len(starts):
            return empty
        di = np.repeat(
            np.arange(len(ids), dtype=np.int64), (offs[1:] - offs[:-1]) // 8
        )
        L = self.L
        new_region = np.empty(len(starts), bool)
        new_region[0] = True
        new_region[1:] = (di[1:] != di[:-1]) | (
            starts[1:] > starts[:-1] + L
        )
        reg_first = np.flatnonzero(new_region)
        reg_last = np.concatenate((reg_first[1:] - 1, [len(starts) - 1]))
        rdoc = di[reg_first]
        rstart = starts[reg_first]
        rend = starts[reg_last] + L
        lens = rend - rstart
        gstart = bounds[rdoc] + rstart
        offs_out = np.concatenate(([0], np.cumsum(lens)))
        take = (
            np.arange(int(offs_out[-1]), dtype=np.int64)
            - np.repeat(offs_out[:-1], lens)
            + np.repeat(gstart, lens)
        )
        # chunked: a partition with >2 GB of duplicated text neither
        # overflows int32 offsets nor forks the schema to large_binary
        span_text = _chunked_from_ranges(flat[take], lens)
        return pa.table(
            {
                "doc_id": pa.array(ids[rdoc]),
                "span_start": pa.array(rstart),
                "span_end": pa.array(rend),
                "n_bytes": pa.array(lens),
                "span_text": span_text,
            }
        )


def suffix_dup_spans(
    ds: ray.data.Dataset,
    *,
    min_len: int = 40,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 16,
    broadcast_limit: int = 2_000_000,
    seed_mode: str = "hash",
) -> ray.data.Dataset:
    """Maximal exactly-duplicated BYTE regions at arbitrary match
    length >= ``min_len``: one row (doc_id, span_start, span_end,
    n_bytes, span_text[binary]) per maximal region covered by
    ``min_len``-byte windows occurring in >= ``min_df`` distinct docs.
    Literal-byte verified end to end (hash and Bloom false positives
    cannot reach the output; false negatives are impossible — see the
    module docstring's exactness argument)."""
    from fdblucene_ray.ops.webtext import _spans_scatter

    left = ds.select_columns([id_col, text_col])
    if id_col != "doc_id" or text_col != "text":
        left = left.rename_columns({id_col: "doc_id", text_col: "text"})
    verified, num_parts = _suffix_verified_positions(
        left, min_len=min_len, min_df=min_df,
        num_partitions=num_partitions, broadcast_limit=broadcast_limit,
        seed_mode=seed_mode,
    )
    out = _spans_scatter(
        left, verified, _MaximalByteSpans(min_len), num_parts, inner=True
    )
    if id_col != "doc_id":
        out = out.rename_columns({"doc_id": id_col})
    return out


def _suffix_verified_positions(
    left: ray.data.Dataset,
    *,
    min_len: int,
    min_df: int,
    num_partitions: int,
    broadcast_limit: int,
    seed_mode: str = "hash",
    seeds: ray.data.Dataset | None = None,
    num_parts: int | None = None,
) -> tuple[ray.data.Dataset, int]:
    """Shared stages 1-4 of the suffix-dedup pipelines: per-batch
    truncated suffix sorting -> hash-partitioned candidate fold ->
    bounded candidate distribution -> literal window re-emit ->
    byte-exact verify. Returns the verified (doc_id, pos) rows and
    the partition count for the final co-partitioned kernel."""
    import logging

    import ray

    from fdblucene_ray.ops.webtext import _verify_literal

    if num_parts is None:
        num_parts = max(
            num_partitions, int(ray.cluster_resources().get("CPU", 8))
        )
    if seeds is None:
        seeds = left.map_batches(
            _SuffixSeeds(min_len, min_df, num_parts, "text", "doc_id",
                         seed_mode),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    cand = seeds.groupby("part", num_partitions=num_parts).map_groups(
        _cand_fold(min_df), batch_format="pyarrow"
    )
    # bounded candidate distribution: exact sorted array when small,
    # fixed-size Bloom filter beyond broadcast_limit (FPs are removed
    # by the literal verify stage either way). One limited pull
    # decides the path - the common (exact) case executes the
    # candidate pipeline exactly once, never count()+collect twice.
    head = cand.limit(broadcast_limit + 1).to_pandas()
    if len(head) <= broadcast_limit:
        arr = np.sort(
            head["h"].to_numpy()
            if len(head)
            else np.empty(0, np.uint64)
        ).astype(np.uint64)
        cand_ref, exact, bloom_k = ray.put(arr), True, 0
    else:
        n_cand = cand.count()
        words_n, bloom_k = _bloom_params(n_cand)
        words = np.zeros(words_n, np.uint64)
        for b in cand.iter_batches(batch_format="pyarrow"):
            _bloom_add(words, b["h"].to_numpy(zero_copy_only=False), bloom_k)
        logging.getLogger(__name__).info(
            "suffix dedup: %d candidate hashes > broadcast_limit=%d; "
            "using a %d-bit Bloom filter (FPs removed by literal verify)",
            n_cand, broadcast_limit, words_n * 64,
        )
        cand_ref, exact = ray.put(words), False
    lit = left.map_batches(
        _EmitCandidateWindows(
            min_len, cand_ref, exact, bloom_k, num_parts, "text", "doc_id"
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    verified = lit.groupby("part", num_partitions=num_parts).map_groups(
        _verify_literal(min_df), batch_format="pyarrow"
    )
    return verified, num_parts


class _ScrubByteSpans:
    """Final kernel for ``scrub_suffix_spans``: splice OUT every byte
    covered by a duplicated window (coverage = one diff-array pass
    over the batch's flattened bytes) and emit (doc_id, text,
    n_removed). Docs with no duplicated span pass through
    BYTE-IDENTICAL; scrubbed docs are the concatenation of their
    uncovered byte ranges — no separator is inserted, so the result
    is exactly Lee et al.'s remove-the-duplicate-bytes semantics."""

    def __init__(self, L: int):
        self.L = L

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "n_removed": pa.array([], pa.int64()),
            }
        )
        if not batch.num_rows:
            return empty
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.cast(texts, pa.string())
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        has = pc.and_kleene(
            spans.is_valid(), pc.greater(pc.binary_length(spans), 0)
        )
        hasn = has.to_numpy(zero_copy_only=False)
        n_removed = np.zeros(batch.num_rows, np.int64)
        out_text = texts
        idx = np.flatnonzero(hasn)
        if len(idx):
            take = pa.array(idx)
            sp = spans.take(take)
            flat, bounds = _flat_bytes(texts.take(take))
            total = int(bounds[-1])
            offs = np.frombuffer(sp.buffers()[1], np.int32)[
                sp.offset : sp.offset + len(sp) + 1
            ].astype(np.int64)
            starts = np.frombuffer(
                sp.buffers()[2], "<i8",
                count=int(offs[-1] - offs[0]) // 8, offset=int(offs[0]),
            ).astype(np.int64)
            di = np.repeat(
                np.arange(len(idx), dtype=np.int64),
                (offs[1:] - offs[:-1]) // 8,
            )
            lens = bounds[1:] - bounds[:-1]
            ge = bounds[di] + np.minimum(starts + self.L, lens[di])
            gs = np.minimum(bounds[di] + starts, ge)
            # UTF-8 safety: snap removal boundaries OUTWARD to char
            # starts (a character partially covered by a duplicated
            # window is removed whole) so kept pieces are always valid
            # UTF-8 — byte-identical behavior on ASCII. Each doc is
            # valid UTF-8, so its first byte is a char start and the
            # snap never crosses a doc boundary.
            if len(flat):
                cont = (flat & 0xC0) == 0x80
                if cont.any():
                    char_starts = np.flatnonzero(~cont).astype(np.int64)
                    gs = char_starts[
                        np.searchsorted(char_starts, gs, side="right") - 1
                    ]
                    gi = np.searchsorted(char_starts, ge, side="left")
                    ge = np.where(
                        gi < len(char_starts),
                        char_starts[np.minimum(gi, len(char_starts) - 1)],
                        total,
                    )
            cov = (
                np.cumsum(
                    np.bincount(gs, minlength=total + 1)[:total]
                    .astype(np.int64)
                    - np.bincount(ge, minlength=total + 1)[:total]
                )
                > 0
            )
            keep = ~cov
            cum = np.concatenate(([0], np.cumsum(cov)))
            rem = cum[bounds[1:]] - cum[bounds[:-1]]
            n_removed[idx] = rem
            cleaned = _chunked_from_ranges(
                flat[keep], lens - rem, pa.string()
            )
            # untouched rows ride a concat+take scatter; chunked so a
            # partition's kept text can exceed the int32 offset limit
            untouched = texts.filter(pc.invert(has))
            u_chunks = (
                list(untouched.chunks)
                if isinstance(untouched, pa.ChunkedArray)
                else [untouched]
            )
            order = np.concatenate(
                (np.flatnonzero(~hasn), idx)
            ).astype(np.int64)
            inv = np.empty(len(order), np.int64)
            inv[order] = np.arange(len(order))
            merged = pa.chunked_array(
                u_chunks + list(cleaned.chunks), pa.string()
            )
            out_text = merged.take(pa.array(inv))
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "text": out_text,
                "n_removed": pa.array(n_removed),
            }
        )


def scrub_suffix_spans(
    ds: ray.data.Dataset,
    *,
    min_len: int = 40,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 16,
    broadcast_limit: int = 2_000_000,
    seed_mode: str = "hash",
) -> ray.data.Dataset:
    """Lee et al.'s REMOVE half at byte granularity: splice out every
    byte covered by a ``min_len``-byte window duplicated across >=
    ``min_df`` distinct docs, returning (doc_id, text, n_removed).
    Shares the entire candidate/verify machinery with
    ``suffix_dup_spans``; only the final co-partitioned kernel
    differs (outer scatter — docs without duplicates pass through
    byte-identical)."""
    left = ds.select_columns([id_col, text_col])
    if id_col != "doc_id" or text_col != "text":
        left = left.rename_columns({id_col: "doc_id", text_col: "text"})
    from fdblucene_ray.ops.webtext import _spans_scatter

    verified, num_parts = _suffix_verified_positions(
        left, min_len=min_len, min_df=min_df,
        num_partitions=num_partitions, broadcast_limit=broadcast_limit,
        seed_mode=seed_mode,
    )
    out = _spans_scatter(
        left, verified, _ScrubByteSpans(min_len), num_parts, inner=False
    )
    if id_col != "doc_id" or text_col != "text":
        out = out.rename_columns({"doc_id": id_col, "text": text_col})
    return out


# ------------------------------------------------- incremental registry
#
# Streaming analog for the suffix pipelines (the shard-append /
# append_ivf_index contract applied to dedup state): the expensive
# stage — per-batch truncated suffix sorting over the corpus bytes —
# runs ONCE per document batch and persists its combiner output (the
# <= min_df (part, class-hash, doc) rows per distinct gram) as an
# atomic, idempotent registry batch. Appending new documents seeds
# only THEIR bytes; candidate detection folds the union of registry
# batches, so old documents are never suffix-sorted again. The
# literal-verify and span stages still stream the full corpus once
# (any old doc can contain a window newly duplicated by an appended
# one — that pass is unavoidable and cheap: rolling hash + membership,
# no sort).


def build_suffix_registry(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    min_len: int = 40,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 16,
    seed_mode: str = "hash",
) -> bool:
    """Materialize the base registry: per-distinct-gram combiner rows
    under ``{out_dir}/seeds/``. Idempotent (existing registry wins)."""
    import os
    import shutil

    import ray

    meta_path = os.path.join(out_dir, "registry.json")
    if os.path.exists(meta_path):
        import json as _json

        with open(meta_path) as fh:
            if _json.load(fh).get("format") == 2:
                return False
        # older seed-row format: rebuild in place (the registry is
        # derived state — safe to regenerate from the corpus)
        shutil.rmtree(out_dir, ignore_errors=True)
    elif os.path.isdir(os.path.join(out_dir, "seeds")):
        # crashed between the seeds rename and the meta write: the
        # seeds dir is complete (rename follows a finished
        # write_parquet) but unusable without meta — clear and rebuild
        # rather than leaving a bricked registry (single-writer build
        # contract, same as index/sync.py)
        shutil.rmtree(out_dir, ignore_errors=True)
    left = ds.select_columns([id_col, text_col])
    if id_col != "doc_id" or text_col != "text":
        left = left.rename_columns({id_col: "doc_id", text_col: "text"})
    num_parts = max(
        num_partitions, int(ray.cluster_resources().get("CPU", 8))
    )
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, f".tmp-seeds-{os.getpid()}")
    shutil.rmtree(tmp, ignore_errors=True)
    left.map_batches(
        _SuffixSeeds(min_len, min_df, num_parts, "text", "doc_id",
                     seed_mode),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).write_parquet(tmp)
    try:
        os.rename(tmp, os.path.join(out_dir, "seeds"))
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        return False
    import json

    t2 = meta_path + f".tmp-{os.getpid()}"
    with open(t2, "w") as fh:
        json.dump(
            {"format": 2, "min_len": min_len, "min_df": min_df,
             "num_parts": num_parts, "seed_mode": seed_mode}, fh,
        )
    os.replace(t2, meta_path)
    return True


def append_suffix_registry(
    ds: ray.data.Dataset,
    out_dir: str,
    batch_id: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> bool:
    """Seed ONLY the new documents' bytes and publish one atomic
    idempotent ``seeds-append-{batch_id}`` registry batch (same
    contract as ``append_ivf_index``). Returns False if the batch was
    already published. Appended doc ids must be NEW (the usual
    append contract): distinct-doc counting sums clamped per-batch
    counts, which is exact precisely because every doc is seeded in
    exactly one published batch."""
    import json
    import os
    import shutil

    dest = os.path.join(out_dir, f"seeds-append-{batch_id}")
    if os.path.isdir(dest):
        return False
    with open(os.path.join(out_dir, "registry.json")) as fh:
        meta = json.load(fh)
    if meta.get("format") != 2:
        raise ValueError(
            "suffix registry at %r uses an old seed-row format; "
            "rebuild it with build_suffix_registry" % out_dir
        )
    left = ds.select_columns([id_col, text_col])
    if id_col != "doc_id" or text_col != "text":
        left = left.rename_columns({id_col: "doc_id", text_col: "text"})
    tmp = os.path.join(
        out_dir, f".tmp-append-{batch_id}-{os.getpid()}"
    )
    shutil.rmtree(tmp, ignore_errors=True)
    left.map_batches(
        _SuffixSeeds(
            meta["min_len"], meta["min_df"], meta["num_parts"],
            "text", "doc_id", meta.get("seed_mode", "hash"),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).write_parquet(tmp)
    try:
        os.rename(tmp, dest)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # racing writer won
        return False
    return True


def suffix_dup_spans_registry(
    ds: ray.data.Dataset,
    registry_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """``suffix_dup_spans`` over the FULL corpus ``ds`` with stage 1
    served from the persisted registry (base + every published append
    batch): old documents are never suffix-sorted again — candidate
    hashes fold straight from the registry parquet, then the literal
    verify and maximal-merge stages stream the corpus once. Output is
    identical to a fresh ``suffix_dup_spans`` over the same corpus
    (pinned by test)."""
    import glob as _glob
    import json
    import os

    import ray

    from fdblucene_ray.ops.webtext import _spans_scatter

    with open(os.path.join(registry_dir, "registry.json")) as fh:
        meta = json.load(fh)
    if meta.get("format") != 2:
        raise ValueError(
            "suffix registry at %r uses an old seed-row format; "
            "rebuild it with build_suffix_registry" % registry_dir
        )
    min_len, min_df = meta["min_len"], meta["min_df"]
    num_parts = meta["num_parts"]
    dirs = [os.path.join(registry_dir, "seeds")] + sorted(
        _glob.glob(os.path.join(registry_dir, "seeds-append-*"))
    )
    files = [
        f
        for d in dirs
        for f in sorted(_glob.glob(os.path.join(d, "*.parquet")))
    ]
    seeds = ray.data.read_parquet(files)
    left = ds.select_columns([id_col, text_col])
    if id_col != "doc_id" or text_col != "text":
        left = left.rename_columns({id_col: "doc_id", text_col: "text"})
    verified, num_parts = _suffix_verified_positions(
        left, min_len=min_len, min_df=min_df,
        num_partitions=num_parts, broadcast_limit=broadcast_limit,
        seeds=seeds, num_parts=num_parts,
    )
    out = _spans_scatter(
        left, verified, _MaximalByteSpans(min_len), num_parts, inner=True
    )
    if id_col != "doc_id":
        out = out.rename_columns({"doc_id": id_col})
    return out
