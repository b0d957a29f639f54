"""Deduplication operators for large-scale training-data hygiene.

All operate on a ``ray.data.Dataset`` of documents and stream: content
hashing and sketching are vectorized ``map_batches`` stages; the only
all-to-all exchanges are small-key groupbys over hashes/bands (never the
raw text). Reference tie-in: exact name/doc-id dedup in fdblucene is
insert-if-absent (FDBDirectory.java:231-247, DATA.md:17); web-corpus
dedup generalizes it (SURVEY.md §2.7 D3).

- exact_dedup          group by (content-hash, length), keep min doc_id
- minhash_lsh_pairs    shingle -> minhash -> banded LSH -> candidate
                       pairs -> exact-Jaccard verification
- simhash_fingerprints 64-bit simhash per doc (+ near-pair candidates)
- ngram_jaccard_vs     exact n-gram Jaccard of every doc vs one anchor
"""

from __future__ import annotations

import logging
import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

from fdblucene_ray.analysis.analyzer import BatchTokenizer
from fdblucene_ray.ops.hashing import (
    combine,
    content_digest,
    hash_strings,
    part_of,
    round_half_away,
    splitmix64,
)

log = logging.getLogger("fdblucene_ray.dedup")

# shuffle partitions for the pair-verify stage: pairs are hashed onto a
# fixed small key space so the exchange + per-partition vectorized
# verify never makes one Python call per pair
_VERIFY_PARTS = 16

# popcount LUT for 64-bit hamming distance (vectorized byte-wise)
_POP_LUT = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    return _POP_LUT[np.ascontiguousarray(x, "<u8").view(np.uint8).reshape(-1, 8)].sum(
        axis=1
    ).astype(np.int64)

# ---------------------------------------------------------------- exact


class PartialDedup:
    """map_batches combiner: per-batch (hash, len) -> (min id, count)
    partials — the pre-aggregation that keeps the groupby tiny (guide
    pattern: combine inside map_batches, shuffle only partials)."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        h, ln = content_digest(batch[self.text_col])
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        key = (h ^ splitmix64(ln.astype(np.uint64))).astype(np.int64)
        order = np.lexsort((ids, key))
        k, i = key[order], ids[order]
        hh, ll = h[order], ln[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(k)) + 1))
        counts = np.diff(np.concatenate((starts, [len(k)])))
        return pa.table(
            {
                "content_hash": pa.array(hh[starts].astype(np.int64)),
                "content_len": pa.array(ll[starts]),
                "min_id": pa.array(i[starts], pa.int64()),
                "cnt": pa.array(counts, pa.int64()),
            }
        )


class PartialDedupBest:
    """map_batches combiner for quality-aware exact dedup: per-batch
    (hash, len) -> (best score, id of best, count) partials, where
    "best" = max score, ties min id. Same pre-aggregation shape as
    PartialDedup — the shuffle carries one row per distinct content per
    block, never the text."""

    def __init__(self, text_col: str, score_col: str, id_col: str):
        self.text_col, self.score_col, self.id_col = text_col, score_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        h, ln = content_digest(batch[self.text_col])
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sc = batch[self.score_col].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        key = (h ^ splitmix64(ln.astype(np.uint64))).astype(np.int64)
        # within each content run: best (max score, min id) FIRST
        order = np.lexsort((ids, -sc, key))
        k, i, s = key[order], ids[order], sc[order]
        hh, ll = h[order], ln[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(k)) + 1))
        counts = np.diff(np.concatenate((starts, [len(k)])))
        return pa.table(
            {
                "content_hash": pa.array(hh[starts].astype(np.int64)),
                "content_len": pa.array(ll[starts]),
                "best_id": pa.array(i[starts], pa.int64()),
                "best_score": pa.array(s[starts], pa.float64()),
                "cnt": pa.array(counts, pa.int64()),
            }
        )


def exact_dedup_keep_best(
    ds: ray.data.Dataset,
    text_col: str = "text",
    score_col: str = "n_chars",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Exact dedup that keeps the BEST representative per distinct
    content (max ``score_col``, ties min id) instead of the smallest id
    — the form curation pipelines actually want ("among byte-identical
    pages keep the one with the richest metadata / highest quality
    score"). One row per distinct content: (doc_id, score, dup_count).

    Shape: per-batch combiner partials -> hashed-partition exchange ->
    one vectorized lexsort-runs reduce per partition (argmax-by-two-
    keys is not expressible with Ray's column aggregates, so the reduce
    uses the same run-arithmetic idiom as the other dedup family ops —
    one Python call per PARTITION, not per key)."""

    partials = ds.map_batches(
        PartialDedupBest(text_col, score_col, id_col), batch_format="pyarrow"
    )
    num_parts = max(16, int(ray.cluster_resources().get("CPU", 8)))

    def add_part(t: pa.Table) -> pa.Table:
        h = t["content_hash"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_part", pa.array(part_of(h.astype(np.int64), num_parts))
        )

    def reduce_part(group: pa.Table) -> pa.Table:
        h = group["content_hash"].to_numpy(zero_copy_only=False)
        ln = group["content_len"].to_numpy(zero_copy_only=False)
        ids = group["best_id"].to_numpy(zero_copy_only=False)
        sc = group["best_score"].to_numpy(zero_copy_only=False)
        cnt = group["cnt"].to_numpy(zero_copy_only=False)
        key = (h.view(np.uint64) ^ splitmix64(ln.astype(np.uint64))).astype(
            np.int64
        )
        order = np.lexsort((ids, -sc, key))
        k = key[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(k)) + 1))
        seg = np.repeat(
            np.arange(len(starts)),
            np.diff(np.concatenate((starts, [len(k)]))),
        )
        total = np.bincount(seg, weights=cnt[order]).astype(np.int64)
        first = order[starts]
        return pa.table(
            {
                id_col: pa.array(ids[first], pa.int64()),
                "score": pa.array(sc[first], pa.float64()),
                "dup_count": pa.array(total, pa.int64()),
            }
        )

    return (
        partials.map_batches(add_part, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("_part", num_partitions=num_parts)
        .map_groups(reduce_part, batch_format="pyarrow")
    )


def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """One row per distinct content: (doc_id = min id, dup_count).

    Two-phase: per-batch combiners emit one partial row per distinct
    content, then a groupby over the (much smaller) partials. The
    shuffle carries only (hash, len, min_id, cnt) — text never leaves
    the hashing stage (critical at 100 TB).
    """
    partials = ds.map_batches(
        PartialDedup(text_col, id_col), batch_format="pyarrow"
    )
    agg = partials.groupby(["content_hash", "content_len"]).aggregate(
        ray.data.aggregate.Min("min_id", alias_name="keep_id"),
        ray.data.aggregate.Sum("cnt", alias_name="dup_count"),
    )
    return agg.select_columns(["keep_id", "dup_count"]).rename_columns(
        {"keep_id": id_col}
    )


def _seen_content_filter(
    batch: pa.Table, *, keys_ref, text_col: str, bloom: bool
) -> pa.Table:
    """Stateless task filter: drop rows whose content digest is in the
    broadcast key set (exact sorted array or Bloom filter bytes). The
    keys live in the object store once (ray.put by the caller); each
    task's ray.get is a zero-copy plasma read, so tasks get broadcast
    semantics without actor-pool spin-up."""
    obj = ray.get(keys_ref) if not isinstance(
        keys_ref, (np.ndarray, bytes)
    ) else keys_ref
    h, ln = content_digest(batch[text_col])
    key = (h ^ splitmix64(ln.astype(np.uint64))).astype(np.int64)
    if bloom:
        from fdblucene_ray.ops.sketches import BloomFilter

        seen = BloomFilter.from_bytes(obj).contains(key.view(np.uint64))
    elif len(obj):
        keys = np.asarray(obj)  # sorted int64
        pos = np.searchsorted(keys, key)
        pos[pos == len(keys)] = 0
        seen = keys[pos] == key
    else:
        seen = np.zeros(len(key), bool)
    return batch.filter(pa.array(~seen))


def incremental_dedup(
    new_ds: ray.data.Dataset,
    old_ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    bloom_fpr: float | None = None,
) -> ray.data.Dataset:
    """Cross-shard dedup: drop new docs whose exact content already
    exists in a prior corpus, then exact-dedup the survivors — one row
    per kept doc: (doc_id = min new id, dup_count within new). The
    daily-increment shape at 100 TB: the history NEVER re-shuffles.

    Scale shape: the old corpus is reduced to one digest-key partial
    per distinct content inside ``map_batches`` (text never leaves the
    hashing stage), the distinct keys are broadcast once via
    ``ray.put`` (8 bytes per distinct doc; ``bloom_fpr`` compresses to
    ~10 bits/key when history is 10^9+ docs — a Bloom false positive
    drops a genuinely-new doc, never keeps a dup), and the new shard
    streams through a vectorized searchsorted filter."""
    old_partials = old_ds.map_batches(
        PartialDedup(text_col, id_col), batch_format="pyarrow"
    )
    # distinct digest keys only — never content — leave the cluster
    parts = []
    for b in old_partials.select_columns(
        ["content_hash", "content_len"]
    ).iter_batches(batch_format="pyarrow"):
        h = b["content_hash"].to_numpy().astype(np.uint64)
        ln = b["content_len"].to_numpy().astype(np.uint64)
        parts.append((h ^ splitmix64(ln)).astype(np.int64))
    keys = (
        np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    )
    if bloom_fpr is not None:
        from fdblucene_ray.ops.sketches import BloomFilter

        bf = BloomFilter(max(1, len(keys)), fpr=bloom_fpr)
        bf.add(keys.view(np.uint64))
        keys_ref = ray.put(bf.to_bytes())
    else:
        keys_ref = ray.put(keys)
    fresh = new_ds.map_batches(
        _seen_content_filter,
        fn_kwargs=dict(
            keys_ref=keys_ref, text_col=text_col,
            bloom=bloom_fpr is not None,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return exact_dedup(fresh, text_col, id_col)


# ---------------------------------------------------------------- minhash

N_PERM = 64
N_BANDS = 16  # 16 bands x 4 rows
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(n_perm: int = N_PERM) -> tuple[np.ndarray, np.ndarray]:
    seeds = splitmix64(np.arange(1, n_perm + 1, dtype=np.uint64))
    a = (seeds | np.uint64(1)) & _MERSENNE  # odd multipliers
    b = splitmix64(seeds) & _MERSENNE
    return a, b


def _shingle_hashes(tokenizer: BatchTokenizer, texts, n: int, shingle: int):
    """Per-row lists of uint64 shingle hashes -> (flat_hashes, row_offsets)."""
    row_idx, flat = tokenizer.flat_tokens(texts)
    tok_h = hash_strings(flat)
    if shingle > 1 and len(tok_h) >= shingle:
        # h[i] = H(t[i..i+shingle)); windows crossing row boundaries are
        # dropped (rows' tokens are contiguous in flat order)
        m = len(tok_h) - shingle + 1
        h = tok_h[:m].copy()
        for k in range(1, shingle):
            h = combine(h, tok_h[k : k + m])
        valid = row_idx[:m] == row_idx[shingle - 1 : shingle - 1 + m]
        h = h[valid]
        srow = row_idx[:m][valid]
    elif shingle > 1:
        h = np.empty(0, np.uint64)
        srow = np.empty(0, np.int64)
    else:
        h = tok_h
        srow = row_idx
    counts = (
        np.bincount(srow, minlength=n).astype(np.int64)
        if len(srow)
        else np.zeros(n, np.int64)
    )
    offsets = np.concatenate(([0], np.cumsum(counts)))
    return h, srow, offsets, counts


class MinHashBands:
    """map_batches stage: doc -> N_BANDS rows (band_id, band_hash, doc_id).

    Sketching is O(n_shingles * n_perm) vectorized numpy per batch;
    docs with no shingles emit nothing.
    """

    def __init__(self, text_col="text", id_col="doc_id", shingle=3,
                 n_perm=N_PERM, n_bands=N_BANDS, analyzer="simple",
                 num_parts=32):
        self.text_col, self.id_col = text_col, id_col
        self.shingle, self.n_perm, self.n_bands = shingle, n_perm, n_bands
        self.rows_per_band = n_perm // n_bands
        self.tokenizer = BatchTokenizer(analyzer)
        self.a, self.b = _perm_params(n_perm)
        self.num_parts = num_parts

    def signature_matrix(self, texts, n) -> tuple[np.ndarray, np.ndarray]:
        """-> (doc_rows_with_shingles, sig[n_docs_with, n_perm])."""
        h, srow, offsets, counts = _shingle_hashes(
            self.tokenizer, texts, n, self.shingle
        )
        has = np.flatnonzero(counts > 0)
        if len(has) == 0:
            return has, np.empty((0, self.n_perm), np.uint64)
        sig = np.empty((len(has), self.n_perm), np.uint64)
        starts = offsets[has]
        hm = h & _MERSENNE
        for p in range(self.n_perm):
            vals = (self.a[p] * hm + self.b[p]) & _MERSENNE  # 61-bit universal-ish
            sig[:, p] = np.minimum.reduceat(vals, starts)
        return has, sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col]
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        has, sig = self.signature_matrix(texts, len(batch))
        if len(has) == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "band": pa.array([], pa.int32()),
                    "band_hash": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                }
            )
        r = self.rows_per_band
        band_ids = []
        band_hashes = []
        doc_ids = []
        for bi in range(self.n_bands):
            bh = sig[:, bi * r]
            for k in range(1, r):
                bh = combine(bh, sig[:, bi * r + k])
            band_ids.append(np.full(len(has), bi, np.int32))
            band_hashes.append(bh.astype(np.int64))
            doc_ids.append(ids[has])
        band_col = np.concatenate(band_ids)
        hash_col = np.concatenate(band_hashes)
        # shuffle partition of a bucket: hash of (band, band_hash) — the
        # exchange is keyed on partitions (few) rather than buckets
        # (millions), so the pair stage runs once per PARTITION
        part = (
            splitmix64(hash_col.view(np.uint64) + band_col.astype(np.uint64))
            % np.uint64(self.num_parts)
        ).astype(np.int32)
        return pa.table(
            {
                "part": pa.array(part),
                "band": pa.array(band_col),
                "band_hash": pa.array(hash_col),
                "doc_id": pa.array(np.concatenate(doc_ids), pa.int64()),
            }
        )


_BUCKET_CAP = 200


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """Candidate pairs for EVERY LSH bucket hashed into one shuffle
    partition, in one vectorized call (bucket runs found by lexsort;
    the Python loop touches only buckets holding >= 2 distinct docs —
    i.e. only actual duplicate candidates). Hot buckets (near-dup spam)
    are capped at _BUCKET_CAP ids to bound the O(n^2) blowup — NEVER
    silently: the dropped-pair count is logged (no-silent-caps rule)."""
    empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    band = group["band"].to_numpy(zero_copy_only=False).astype(np.int64)
    bh = group["band_hash"].to_numpy(zero_copy_only=False)
    doc = group["doc_id"].to_numpy(zero_copy_only=False)
    if len(doc) < 2:
        return empty
    order = np.lexsort((doc, bh, band))
    b, h, d = band[order], bh[order], doc[order]
    same_bucket = (b[1:] == b[:-1]) & (h[1:] == h[:-1])
    keep = np.concatenate(([True], ~(same_bucket & (d[1:] == d[:-1]))))
    b, h, d = b[keep], h[keep], d[keep]
    starts = np.flatnonzero(
        np.concatenate(([True], (b[1:] != b[:-1]) | (h[1:] != h[:-1])))
    )
    sizes = np.diff(np.concatenate((starts, [len(b)])))
    multi = sizes >= 2
    out_a, out_b = [], []
    for s, k in zip(starts[multi], sizes[multi]):
        ids = d[s : s + k]
        if k > _BUCKET_CAP:
            dropped = k * (k - 1) // 2 - _BUCKET_CAP * (_BUCKET_CAP - 1) // 2
            log.warning(
                "LSH bucket band=%d hash=%d holds %d ids; capped at %d "
                "(%d candidate pairs dropped)",
                b[s], h[s], k, _BUCKET_CAP, dropped,
            )
            ids = ids[:_BUCKET_CAP]
            k = _BUCKET_CAP
        ii, jj = np.triu_indices(k, k=1)
        out_a.append(ids[ii])
        out_b.append(ids[jj])
    if not out_a:
        return empty
    return pa.table(
        {
            "a": pa.array(np.concatenate(out_a), pa.int64()),
            "b": pa.array(np.concatenate(out_b), pa.int64()),
        }
    )


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    threshold: float = 0.8,
    shingle: int = 3,
    analyzer: str = "simple",
) -> pa.Table:
    """Near-duplicate pairs (a < b, jaccard >= threshold), exact-verified.

    Pipeline: sketch (map_batches) -> groupby(part = hash(band, bucket))
    -> vectorized per-partition intra-bucket pairs -> distinct pairs ->
    exact shingle-Jaccard verify. Grouping on the hashed PARTITION (a few
    dozen keys) instead of the bucket (one key per distinct band hash —
    millions at corpus scale) keeps the exchange identical but runs the
    pair stage once per partition rather than once per bucket.
    Verification gathers only candidate docs' shingle sets (tiny vs the
    corpus); at extreme candidate volumes this last join would itself be
    a broadcast-hash map_batches stage over pair partitions.
    """
    num_parts = max(8, int(ray.cluster_resources().get("CPU", 8)))
    bands = ds.map_batches(
        MinHashBands(
            text_col, id_col, shingle=shingle, analyzer=analyzer,
            num_parts=num_parts,
        ),
        batch_format="pyarrow",
    )
    pairs_ds = bands.groupby("part", num_partitions=num_parts).map_groups(
        _bucket_pairs, batch_format="pyarrow"
    )
    pairs = pairs_ds.to_pandas().drop_duplicates()  # candidate PAIR IDS: small
    if not len(pairs):
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    pair_list = [(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])]
    return _verify_pairs_jaccard(
        ds, pair_list, text_col, id_col, shingle, analyzer, threshold
    )


def _tokenizer_cached(analyzer: str) -> BatchTokenizer:
    """Per-worker-process tokenizer cache: lets stateless map_batches
    TASKS reuse the compiled analyzer/stem memo across batches without
    paying actor-pool spin-up per call (tasks >> actors for the short
    verify pass; the cache makes task construction as cheap)."""
    tk = _TOKENIZER_CACHE.get(analyzer)
    if tk is None:
        tk = _TOKENIZER_CACHE[analyzer] = BatchTokenizer(analyzer)
    return tk


_TOKENIZER_CACHE: dict[str, BatchTokenizer] = {}

# above this many candidate pairs the exact-Jaccard verify runs as a
# distributed hashed-partition groupby; below it the (pid, shingles)
# candidate rows — bounded by 2 x pairs — collect to the driver and
# verify vectorized, skipping a whole shuffle round-trip
_DRIVER_VERIFY_MAX_PAIRS = 50_000


def _emit_pair_shingles(
    batch: pa.Table,
    *,
    doc_pairs: dict,
    wanted: np.ndarray,
    text_col: str,
    id_col: str,
    shingle: int,
    analyzer: str,
) -> pa.Table:
    """Stateless task: emit (pid, part, packed shingle set) for every
    candidate doc in the batch (docs outside the pair set are dropped
    before any tokenization)."""
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    mask = np.isin(ids, wanted)
    sel = batch.filter(pa.array(mask))
    if sel.num_rows == 0:
        return pa.table(
            {"pid": pa.array([], pa.int64()),
             "part": pa.array([], pa.int32()),
             "doc_id": pa.array([], pa.int64()),
             "shingles": pa.array([], pa.binary())}
        )
    tk = _tokenizer_cached(analyzer)
    h, srow, offsets, counts = _shingle_hashes(
        tk, sel[text_col], sel.num_rows, shingle
    )
    sids = sel[id_col].to_numpy(zero_copy_only=False)
    pids, dids, cells = [], [], []
    for i in range(sel.num_rows):
        s = np.unique(h[offsets[i] : offsets[i + 1]])
        cell = np.ascontiguousarray(s, "<u8").tobytes()
        for pid in doc_pairs[int(sids[i])]:
            pids.append(pid)
            dids.append(int(sids[i]))
            cells.append(cell)
    pid_arr = np.asarray(pids, np.int64)
    return pa.table(
        {
            "pid": pa.array(pid_arr),
            "part": pa.array(part_of(pid_arr, _VERIFY_PARTS)),
            "doc_id": pa.array(dids, pa.int64()),
            "shingles": pa.array(cells, pa.binary()),
        }
    )


def _verify_pid_runs(
    pid: np.ndarray, sh, pairs_arr: np.ndarray, threshold: float
) -> pa.Table:
    """Verify every complete 2-row pid run: lexsort by pid, exact
    shingle-set Jaccard per pair (the per-pair set intersection is the
    inherent cost; no per-group Ray/Arrow overhead)."""
    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "jaccard": pa.array([], pa.float64())}
    )
    if len(pid) < 2:
        return empty
    order = np.argsort(pid, kind="stable")
    pid = pid[order]
    starts = np.flatnonzero(np.concatenate(([True], pid[1:] != pid[:-1])))
    sizes = np.diff(np.concatenate((starts, [len(pid)])))
    out_a, out_b, out_j = [], [], []
    for s, k in zip(starts, sizes):
        if k != 2:
            continue
        sa = np.frombuffer(sh[int(order[s])].as_py(), "<u8")
        sb = np.frombuffer(sh[int(order[s + 1])].as_py(), "<u8")
        if not len(sa) or not len(sb):
            continue
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        j = inter / (len(sa) + len(sb) - inter)
        if j < threshold:
            continue
        p = int(pid[s])
        out_a.append(int(pairs_arr[p][0]))
        out_b.append(int(pairs_arr[p][1]))
        out_j.append(round(j, 6))
    if not out_a:
        return empty
    return pa.table(
        {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64()),
         "jaccard": pa.array(out_j, pa.float64())}
    )


def _verify_pairs_jaccard(
    ds, pair_list, text_col, id_col, shingle, analyzer, threshold
) -> pa.Table:
    """Exact-Jaccard verification of candidate pairs as a broadcast
    join: the (small) doc->pair mapping ships with stateless emit tasks,
    the corpus streams once emitting (pair_id, packed shingle set) only
    for candidate docs. Small candidate sets (<= _DRIVER_VERIFY_MAX_PAIRS)
    verify driver-side on the collected 2xpairs rows — skipping a
    shuffle whose data would be smaller than its overhead; larger sets
    co-locate pair sides with a hashed-partition groupby so no shingle
    payload ever lands on the driver."""
    doc_pairs: dict[int, list[int]] = {}
    for pid, (a, b) in enumerate(pair_list):
        doc_pairs.setdefault(a, []).append(pid)
        doc_pairs.setdefault(b, []).append(pid)
    wanted = np.fromiter(doc_pairs.keys(), np.int64, len(doc_pairs))
    wanted.sort()
    pairs_arr = np.asarray(pair_list, np.int64)

    emitted = ds.map_batches(
        _emit_pair_shingles,
        fn_kwargs=dict(
            doc_pairs=doc_pairs, wanted=wanted, text_col=text_col,
            id_col=id_col, shingle=shingle, analyzer=analyzer,
        ),
        batch_format="pyarrow",
    )
    if len(pair_list) <= _DRIVER_VERIFY_MAX_PAIRS:
        rows = pa.Table.from_pandas(emitted.to_pandas(), preserve_index=False)
        pid = rows["pid"].to_numpy(zero_copy_only=False)
        sh = rows["shingles"].combine_chunks() if isinstance(
            rows["shingles"], pa.ChunkedArray
        ) else rows["shingles"]
        out = _verify_pid_runs(pid, sh, pairs_arr, threshold)
        df = out.to_pandas()
    else:
        pairs_ref = ray.put(pairs_arr)

        def verify_group(group: pa.Table) -> pa.Table:
            pid = group["pid"].to_numpy(zero_copy_only=False)
            sh = group["shingles"].combine_chunks() if isinstance(
                group["shingles"], pa.ChunkedArray
            ) else group["shingles"]
            return _verify_pid_runs(pid, sh, ray.get(pairs_ref), threshold)

        verify_group.__name__ = "verify_jaccard"
        df = (
            emitted.groupby("part", num_partitions=_VERIFY_PARTS)
            .map_groups(verify_group, batch_format="pyarrow")
            .to_pandas()
        )
    if not len(df):
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    df = df.sort_values(["a", "b"]).reset_index(drop=True)
    return pa.table(
        {
            "a": pa.array(df["a"].to_numpy(np.int64)),
            "b": pa.array(df["b"].to_numpy(np.int64)),
            "jaccard": pa.array(df["jaccard"].to_numpy(np.float64)),
        }
    )

def collect_shingle_sets(ds, wanted, text_col, id_col, *, shingle=3, analyzer="simple"):
    t = ds.map_batches(
        _ShingleSetCollector(set(wanted), text_col, id_col, shingle, analyzer),
        batch_format="pyarrow",
    ).to_pandas()
    return {int(r.doc_id): set(r.shingles) for r in t.itertuples()}


# ---------------------------------------------------------------- simhash


class SimHash:
    """map_batches stage: 64-bit simhash of the token multiset (tf-weighted)."""

    def __init__(self, text_col="text", id_col="doc_id", analyzer="simple"):
        self.text_col, self.id_col = text_col, id_col
        self.tokenizer = BatchTokenizer(analyzer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        row_idx, flat = self.tokenizer.flat_tokens(batch[self.text_col])
        th = hash_strings(flat)
        acc = np.zeros((n, 64), np.int64)
        ones = np.ones(len(th), np.int64)
        for bit in range(64):
            sign = (((th >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) * 2) - 1
            np.add.at(acc[:, bit], row_idx, sign)
        bits = (acc > 0).astype(np.uint64)
        sh = np.zeros(n, np.uint64)
        for bit in range(64):
            sh |= bits[:, bit] << np.uint64(bit)
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "simhash": pa.array(sh.astype(np.int64)),
            }
        )


def simhash_fingerprints(ds, text_col="text", id_col="doc_id", analyzer="simple"):
    return ds.map_batches(SimHash(text_col, id_col, analyzer), batch_format="pyarrow")


def _quarter_bands(num_parts: int = 32):
    """map_batches: 4 rows per fingerprint (quarter_idx, 16-bit quarter,
    doc_id, simhash) — the band-blocking key stream. Two fingerprints
    within hamming<=3 share at least one quarter (pigeonhole). ``part``
    hashes the bucket key so the exchange groups partitions, not
    buckets (same trick as the minhash band path)."""

    def fn(batch: pa.Table) -> pa.Table:
        sh = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(sh)
        qi = np.repeat(np.arange(4, dtype=np.int32), n)
        sh4 = np.tile(sh, 4)
        q = (sh4 >> (np.uint64(16) * qi.astype(np.uint64))) & np.uint64(0xFFFF)
        part = (
            splitmix64(q + (qi.astype(np.uint64) << np.uint64(17)))
            % np.uint64(num_parts)
        ).astype(np.int32)
        return pa.table(
            {
                "part": pa.array(part),
                "qi": pa.array(qi),
                "q": pa.array(q.astype(np.int32)),
                "doc_id": pa.array(np.tile(ids, 4), pa.int64()),
                "simhash": pa.array(sh4.astype(np.int64)),
            }
        )

    fn.__name__ = "_quarter_bands"
    return fn


def _simhash_bucket_pairs(max_hamming: int):
    def fn(group: pa.Table) -> pa.Table:
        """All buckets of one shuffle partition in one vectorized call:
        bucket runs by lexsort on (qi, q, doc); Python loop only over
        buckets holding >= 2 distinct docs."""
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "hamming": pa.array([], pa.int64())}
        )
        qi = group["qi"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = group["q"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        sh = group["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if len(ids) < 2:
            return empty
        order = np.lexsort((ids, q, qi))
        qi, q, ids, sh = qi[order], q[order], ids[order], sh[order]
        same = (qi[1:] == qi[:-1]) & (q[1:] == q[:-1])
        keep = np.concatenate(([True], ~(same & (ids[1:] == ids[:-1]))))
        qi, q, ids, sh = qi[keep], q[keep], ids[keep], sh[keep]
        starts = np.flatnonzero(
            np.concatenate(([True], (qi[1:] != qi[:-1]) | (q[1:] != q[:-1])))
        )
        sizes = np.diff(np.concatenate((starts, [len(qi)])))
        multi = sizes >= 2
        out_a, out_b, out_d = [], [], []
        for s, k in zip(starts[multi], sizes[multi]):
            bid, bsh = ids[s : s + k], sh[s : s + k]
            if k > _BUCKET_CAP:
                dropped = (
                    k * (k - 1) // 2 - _BUCKET_CAP * (_BUCKET_CAP - 1) // 2
                )
                log.warning(
                    "simhash bucket qi=%d q=%d holds %d ids; capped at %d "
                    "(%d candidate pairs dropped)",
                    qi[s], q[s], k, _BUCKET_CAP, dropped,
                )
                bid, bsh = bid[:_BUCKET_CAP], bsh[:_BUCKET_CAP]
                k = _BUCKET_CAP
            ii, jj = np.triu_indices(k, k=1)
            d = _popcount64(bsh[ii] ^ bsh[jj])
            hit = d <= max_hamming
            out_a.append(bid[ii[hit]])
            out_b.append(bid[jj[hit]])
            out_d.append(d[hit])
        if not out_a:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a), pa.int64()),
                "b": pa.array(np.concatenate(out_b), pa.int64()),
                "hamming": pa.array(np.concatenate(out_d), pa.int64()),
            }
        )

    fn.__name__ = "_simhash_bucket_pairs"
    return fn


def simhash_near_pairs(ds, max_hamming=3, **kw) -> pa.Table:
    """Near-pairs (a < b, hamming <= max_hamming) by 4-way band blocking
    on the 64-bit simhash, verified by exact popcount.

    Fully distributed: fingerprints -> 4 quarter-band rows each ->
    groupby(qi, quarter) -> vectorized intra-bucket popcount verify ->
    groupby(a, b) dedup (a pair can surface from up to 4 quarters).
    Nothing but the (small) verified pair set reaches the driver."""
    num_parts = max(8, int(ray.cluster_resources().get("CPU", 8)))
    fp = simhash_fingerprints(ds, **kw)
    bands = fp.map_batches(_quarter_bands(num_parts), batch_format="pyarrow")
    pairs = bands.groupby("part", num_partitions=num_parts).map_groups(
        _simhash_bucket_pairs(max_hamming), batch_format="pyarrow"
    )
    uniq = pairs.groupby(["a", "b"]).min("hamming")
    df = uniq.to_pandas()  # verified pairs: small
    if not len(df):
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "hamming": pa.array([], pa.int64())}
        )
    ham_col = [c for c in df.columns if c.startswith("min")][0]
    df = df.rename(columns={ham_col: "hamming"}).sort_values(["a", "b"])
    return pa.table(
        {
            "a": pa.array(df["a"].to_numpy(np.int64)),
            "b": pa.array(df["b"].to_numpy(np.int64)),
            "hamming": pa.array(df["hamming"].to_numpy(np.int64)),
        }
    )


# ------------------------------------------------------------ keep list


def dedup_components(pairs: pa.Table) -> pa.Table:
    """Connected components over near-duplicate pairs (a, b) — union-
    find with path compression on the (small) verified pair set; the
    pair tables come out of the distributed LSH/banding stages, so this
    driver-side step is O(pairs), not O(corpus).

    Returns (doc_id, keep_id): every doc appearing in a pair mapped to
    its component representative (the component's min doc_id). Docs in
    no pair are implicitly their own representative."""
    a = pairs["a"].to_numpy(zero_copy_only=False)
    b = pairs["b"].to_numpy(zero_copy_only=False)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            # union by min id keeps the representative deterministic
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    docs = sorted(set(a.tolist()) | set(b.tolist()))
    return pa.table(
        {
            "doc_id": pa.array(docs, pa.int64()),
            "keep_id": pa.array([find(d) for d in docs], pa.int64()),
        }
    )


def near_dedup_drop_list(
    pairs: pa.Table, *, scores: dict | None = None
) -> np.ndarray:
    """Doc ids to DROP so each near-duplicate component keeps exactly
    one representative (sorted int64 — broadcast it into a map_batches
    filter to materialize the deduplicated corpus). Default policy:
    min id. With ``scores`` ({doc_id: quality}), keep the MAX-score
    member instead, ties min id — the curation-grade policy ("among
    near-duplicate pages keep the highest-quality one"). The component
    member set is pair-graph-sized (small by construction), so the
    argmax runs driver-side on it."""
    comp = dedup_components(pairs)
    docs = comp["doc_id"].to_numpy(zero_copy_only=False)
    keep = comp["keep_id"].to_numpy(zero_copy_only=False)
    if scores is None:
        return np.sort(docs[docs != keep])
    s = np.array([float(scores[int(d)]) for d in docs], np.float64)
    order = np.lexsort((docs, -s, keep))
    k = keep[order]
    if not len(k):
        return docs[:0].astype(np.int64)
    starts = np.concatenate(([0], np.flatnonzero(np.diff(k)) + 1))
    best_ids = docs[order[starts]]
    return np.sort(np.setdiff1d(docs, best_ids))


def drop_docs(ds: ray.data.Dataset, drop_ids: np.ndarray, id_col: str = "doc_id"):
    """Stream-filter a corpus against a broadcast drop list."""
    ref = ray.put(np.sort(np.asarray(drop_ids, np.int64)))

    class Drop:
        def __init__(self):
            self.drop = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(self.drop, ids)
            inb = idx < len(self.drop)
            dead = np.zeros(len(ids), bool)
            dead[inb] = self.drop[idx[inb]] == ids[inb]
            return batch.filter(pa.array(~dead))

    return ds.map_batches(Drop, batch_format="pyarrow", concurrency=(1, 8))


def near_dedup_corpus(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    threshold: float = 0.8,
    shingle: int = 3,
    analyzer: str = "simple",
    quality_col: str | None = None,
):
    """End-to-end near-dedup: minhash-LSH pairs -> components -> drop
    non-representatives -> deduplicated Dataset (streams; only the pair
    set and drop list touch the driver). With ``quality_col``, each
    component keeps its highest-quality member (ties min id) instead of
    the min id; only the component MEMBERS' (id, quality) rows — a
    pair-graph-sized set — are pulled to the driver via a broadcast
    membership filter."""
    pairs = minhash_lsh_pairs(
        ds, text_col, id_col, threshold=threshold, shingle=shingle,
        analyzer=analyzer,
    )
    scores = None
    if quality_col is not None and pairs.num_rows:
        members = np.unique(
            np.concatenate(
                (
                    pairs["a"].to_numpy(zero_copy_only=False),
                    pairs["b"].to_numpy(zero_copy_only=False),
                )
            )
        ).astype(np.int64)
        ref = ray.put(members)

        def member_rows(batch: pa.Table) -> pa.Table:
            m = ray.get(ref)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(m, ids)
            pos[pos == len(m)] = 0
            hit = (m[pos] == ids) if len(m) else np.zeros(len(ids), bool)
            return pa.table(
                {
                    id_col: batch[id_col].filter(pa.array(hit)),
                    quality_col: batch[quality_col].filter(pa.array(hit)),
                }
            )

        rows = ds.map_batches(member_rows, batch_format="pyarrow").take_all()
        scores = {int(r[id_col]): float(r[quality_col]) for r in rows}
    drop = near_dedup_drop_list(pairs, scores=scores)
    return drop_docs(ds, drop, id_col)


# ---------------------------------------------------------------- n-gram jaccard


def ngram_jaccard_vs_anchor(
    ds, anchor_text: str, text_col="text", id_col="doc_id", shingle=3, analyzer="simple"
):
    """Exact n-gram Jaccard of every doc against one anchor text —
    the anchor's shingle set is broadcast (tiny), the corpus streams."""
    tk = BatchTokenizer(analyzer)
    h, _, off, _ = _shingle_hashes(tk, pa.array([anchor_text]), 1, shingle)
    anchor = np.unique(h)
    anchor_ref = ray.put(anchor)

    class Jac:
        def __init__(self):
            self.anchor = ray.get(anchor_ref)
            self.tk = BatchTokenizer(analyzer)

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = len(batch)
            hh, srow, _, _ = _shingle_hashes(
                self.tk, batch[text_col], n, shingle
            )
            a = self.anchor
            # per-row DISTINCT shingles: one lexsort, run heads mark the
            # first occurrence of each (row, hash) — no per-row unique
            order = np.lexsort((hh, srow))
            hs, rs = hh[order], srow[order]
            head = np.empty(len(hs), bool)
            if len(hs):
                head[0] = True
                head[1:] = (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])
            dh, dr = hs[head], rs[head]
            n_distinct = np.bincount(dr, minlength=n).astype(np.int64)
            if len(a) and len(dh):
                pos = np.searchsorted(a, dh)
                pos[pos == len(a)] = 0
                isin = a[pos] == dh
                n_inter = np.bincount(
                    dr[isin], minlength=n
                ).astype(np.int64)
            else:
                n_inter = np.zeros(n, np.int64)
            union = n_distinct + len(a) - n_inter
            jac = np.divide(
                n_inter, union, out=np.zeros(n, np.float64),
                where=union > 0,
            )
            return pa.table(
                {
                    "doc_id": batch[id_col],
                    "jaccard": pa.array(round_half_away(jac, 6)),
                }
            )

    return ds.map_batches(Jac, batch_format="pyarrow", concurrency=(1, 8))


def simhash_near_pairs_from_fingerprints(fp, max_hamming=3) -> pa.Table:
    """The band-block + verify tail of ``simhash_near_pairs`` for a
    caller-supplied (doc_id, simhash) fingerprint dataset (e.g. image
    aHashes — ops/image.py image_near_dups)."""
    num_parts = max(8, int(ray.cluster_resources().get("CPU", 8)))
    bands = fp.map_batches(_quarter_bands(num_parts), batch_format="pyarrow")
    pairs = bands.groupby("part", num_partitions=num_parts).map_groups(
        _simhash_bucket_pairs(max_hamming), batch_format="pyarrow"
    )
    uniq = pairs.groupby(["a", "b"]).min("hamming")
    df = uniq.to_pandas()  # verified pairs: small
    if not len(df):
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "hamming": pa.array([], pa.int64())}
        )
    ham_col = [c for c in df.columns if c.startswith("min")][0]
    df = df.rename(columns={ham_col: "hamming"}).sort_values(["a", "b"])
    return pa.table(
        {
            "a": pa.array(df["a"].to_numpy(np.int64)),
            "b": pa.array(df["b"].to_numpy(np.int64)),
            "hamming": pa.array(df["hamming"].to_numpy(np.int64)),
        }
    )


# ------------------------------------------------- online near-dup probe


def build_neardup_index(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle: int = 3,
    analyzer: str = "simple",
    num_parts: int = 32,
) -> str:
    """At-rest near-duplicate PROBE index — the online twin of the
    batch minhash pipeline ("is this newly crawled page a near-dup of
    anything already in the corpus?"): band rows written
    hive-partitioned by ``part=K`` (a probe reads ONLY the partitions
    its query bands hash to) plus per-doc minhash signatures
    partitioned by ``sig_part = doc_id % P`` (candidate signatures are
    point-read the same way). Index size is O(docs x n_perm x 8B) —
    bounded, independent of document length."""
    import json as _json

    mh = MinHashBands(text_col, id_col, shingle=shingle, analyzer=analyzer,
                      num_parts=num_parts)
    bands = ds.map_batches(mh, batch_format="pyarrow")
    bands.write_parquet(
        os.path.join(out_dir, "bands"), partition_cols=["part"]
    )

    def sig_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        has, sig = mh.signature_matrix(batch[text_col], len(batch))
        if not len(has):
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "sig_part": pa.array([], pa.int32()),
                 "sig": pa.array([], pa.list_(pa.uint64()))}
            )
        n, p = sig.shape
        return pa.table(
            {
                "doc_id": pa.array(ids[has], pa.int64()),
                "sig_part": pa.array(
                    (ids[has] % num_parts).astype(np.int32)
                ),
                "sig": pa.ListArray.from_arrays(
                    pa.array(np.arange(0, (n + 1) * p, p, dtype=np.int32)),
                    pa.array(sig.ravel(), pa.uint64()),
                ),
            }
        )

    ds.map_batches(sig_rows, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "sigs"), partition_cols=["sig_part"]
    )
    with open(os.path.join(out_dir, "meta.json"), "w") as fh:
        _json.dump(
            {"shingle": shingle, "analyzer": analyzer,
             "n_perm": int(mh.n_perm), "n_bands": int(mh.n_bands),
             "num_parts": num_parts, "text_col": text_col}, fh,
        )
    return out_dir


def probe_neardup(
    index_dir: str, texts: list[str], *, min_est_jaccard: float = 0.5
) -> pa.Table:
    """Probe the near-dup index with NEW documents: returns
    (query_idx, doc_id, est_jaccard) for every indexed doc sharing a
    band bucket with a query, with the jaccard ESTIMATED from matching
    signature slots (Broder). I/O: only the band partitions the query
    bands hash to and only the signature partitions of the candidate
    ids are read — a probe touches O(candidates), never the corpus."""
    import json as _json

    import pyarrow.dataset as pads

    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = _json.load(fh)
    num_parts = meta["num_parts"]
    mh = MinHashBands(
        meta["text_col"], "doc_id", shingle=meta["shingle"],
        analyzer=meta["analyzer"], num_parts=num_parts,
    )
    has, qsig = mh.signature_matrix(pa.array(texts, pa.string()), len(texts))
    if not len(has):
        return pa.table(
            {"query_idx": pa.array([], pa.int64()),
             "doc_id": pa.array([], pa.int64()),
             "est_jaccard": pa.array([], pa.float64())}
        )
    r = mh.rows_per_band
    # query band hashes + their partitions
    want: dict[int, list[tuple[int, int, int]]] = {}
    for qi_pos, qi in enumerate(has):
        for bi in range(mh.n_bands):
            bh = qsig[qi_pos, bi * r]
            for k in range(1, r):
                bh = combine(
                    np.array([bh], np.uint64),
                    np.array([qsig[qi_pos, bi * r + k]], np.uint64),
                )[0]
            bh_i64 = np.int64(np.uint64(bh).astype(np.int64))
            # int() BEFORE the modulo: np.uint64 % python-int silently
            # promotes to float64 and corrupts the partition id
            part = int(
                splitmix64(np.array([np.uint64(bh) + np.uint64(bi)]))[0]
            ) % num_parts
            want.setdefault(part, []).append((int(qi), bi, int(bh_i64)))
    cand: dict[tuple[int, int], None] = {}
    for part, triples in want.items():
        pdir = os.path.join(index_dir, "bands", f"part={part}")
        if not os.path.isdir(pdir):
            continue
        t = pads.dataset(pdir).to_table(columns=["band", "band_hash", "doc_id"])
        band = t["band"].to_numpy(zero_copy_only=False)
        bhash = t["band_hash"].to_numpy(zero_copy_only=False)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        for qi, bi, bh in triples:
            m = (band == bi) & (bhash == bh)
            for d in did[m]:
                cand[(qi, int(d))] = None
    if not cand:
        return pa.table(
            {"query_idx": pa.array([], pa.int64()),
             "doc_id": pa.array([], pa.int64()),
             "est_jaccard": pa.array([], pa.float64())}
        )
    # point-read candidate signatures from their id-hash partitions
    need_ids = sorted({d for _, d in cand})
    cand_ids_set = set(need_ids)
    sig_parts = sorted({d % num_parts for d in need_ids})
    sigs: dict[int, np.ndarray] = {}
    for sp in sig_parts:
        pdir = os.path.join(index_dir, "sigs", f"sig_part={sp}")
        if not os.path.isdir(pdir):
            continue
        t = pads.dataset(pdir).to_table(columns=["doc_id", "sig"])
        for d, s in zip(t["doc_id"].to_pylist(), t["sig"].to_pylist()):
            if d in cand_ids_set:
                sigs[int(d)] = np.asarray(s, np.uint64)
    out_q, out_d, out_j = [], [], []
    pos_of = {int(q): i for i, q in enumerate(has)}
    for (qi, d), _ in sorted(cand.items()):
        s = sigs.get(d)
        if s is None:
            continue
        est = float((qsig[pos_of[qi]] == s).mean())
        if est >= min_est_jaccard:
            out_q.append(qi)
            out_d.append(d)
            out_j.append(round(est, 6))
    return pa.table(
        {
            "query_idx": pa.array(out_q, pa.int64()),
            "doc_id": pa.array(out_d, pa.int64()),
            "est_jaccard": pa.array(out_j, pa.float64()),
        }
    )
