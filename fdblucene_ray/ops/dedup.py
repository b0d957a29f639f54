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

import numpy as np
import pyarrow as pa
import ray
import ray.data

from fdblucene_ray.analysis.analyzer import BatchTokenizer
from fdblucene_ray.ops.hashing import combine, content_digest, hash_strings, splitmix64

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
                 n_perm=N_PERM, n_bands=N_BANDS, analyzer="simple"):
        self.text_col, self.id_col = text_col, id_col
        self.shingle, self.n_perm, self.n_bands = shingle, n_perm, n_bands
        self.rows_per_band = n_perm // n_bands
        self.tokenizer = BatchTokenizer(analyzer)
        self.a, self.b = _perm_params(n_perm)

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
        return pa.table(
            {
                "band": pa.array(np.concatenate(band_ids)),
                "band_hash": pa.array(np.concatenate(band_hashes)),
                "doc_id": pa.array(np.concatenate(doc_ids), pa.int64()),
            }
        )


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """Candidate pairs within one LSH bucket (cap guards skew blowup)."""
    ids = np.unique(group["doc_id"].to_numpy(zero_copy_only=False))
    cap = 200  # a bucket this hot is near-duplicate spam; pairs capped,
    # logged via the pair count rather than exploding O(n^2)
    ids = ids[:cap]
    if len(ids) < 2:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    ii, jj = np.triu_indices(len(ids), k=1)
    return pa.table({"a": pa.array(ids[ii]), "b": pa.array(ids[jj])})


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

    Pipeline: sketch (map_batches) -> groupby(band, band_hash) ->
    intra-bucket pairs -> distinct pairs -> exact shingle-Jaccard verify.
    Verification gathers only candidate docs' shingle sets (tiny vs the
    corpus); at extreme candidate volumes this last join would itself be
    a broadcast-hash map_batches stage over pair partitions.
    """
    bands = ds.map_batches(
        MinHashBands(text_col, id_col, shingle=shingle, analyzer=analyzer),
        batch_format="pyarrow",
    )
    pairs_ds = bands.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pyarrow"
    )
    pairs = pairs_ds.to_pandas().drop_duplicates()  # candidate set: small
    if not len(pairs):
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    cand_ids = set(pairs["a"]) | set(pairs["b"])
    shingles = collect_shingle_sets(
        ds, cand_ids, text_col, id_col, shingle=shingle, analyzer=analyzer
    )
    out_a, out_b, out_j = [], [], []
    for a, b in zip(pairs["a"], pairs["b"]):
        sa, sb = shingles.get(int(a)), shingles.get(int(b))
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out_a.append(int(a))
            out_b.append(int(b))
            out_j.append(round(j, 6))
    order = np.lexsort((out_b, out_a))
    return pa.table(
        {
            "a": pa.array(np.array(out_a, np.int64)[order] if len(out_a) else [], pa.int64()),
            "b": pa.array(np.array(out_b, np.int64)[order] if len(out_b) else [], pa.int64()),
            "jaccard": pa.array(np.array(out_j)[order] if len(out_j) else [], pa.float64()),
        }
    )


class _ShingleSetCollector:
    def __init__(self, wanted: set[int], text_col, id_col, shingle, analyzer):
        self.wanted = wanted
        self.text_col, self.id_col = text_col, id_col
        self.shingle = shingle
        self.tokenizer = BatchTokenizer(analyzer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        mask = np.isin(ids, list(self.wanted))
        sel = batch.filter(pa.array(mask))
        if sel.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "shingles": pa.array([], pa.list_(pa.int64()))})
        h, srow, offsets, counts = _shingle_hashes(
            self.tokenizer, sel[self.text_col], sel.num_rows, self.shingle
        )
        sids = sel[self.id_col].to_numpy(zero_copy_only=False)
        out_ids, out_sets = [], []
        for i in range(sel.num_rows):
            out_ids.append(int(sids[i]))
            out_sets.append(
                np.unique(h[offsets[i] : offsets[i + 1]]).astype(np.int64).tolist()
            )
        return pa.table(
            {"doc_id": pa.array(out_ids, pa.int64()),
             "shingles": pa.array(out_sets, pa.list_(pa.int64()))}
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


def simhash_near_pairs(ds, max_hamming=3, **kw) -> pa.Table:
    """Candidate near-pairs by 4-way band blocking on the 64-bit simhash
    (two fingerprints within hamming<=3 share at least one 16-bit quarter),
    verified by exact popcount."""
    fp = simhash_fingerprints(ds, **kw).to_pandas()
    sh = fp["simhash"].to_numpy().astype(np.uint64)
    ids = fp["doc_id"].to_numpy()
    buckets: dict[tuple[int, int], list[int]] = {}
    for qi in range(4):
        q = ((sh >> np.uint64(16 * qi)) & np.uint64(0xFFFF)).astype(np.int64)
        for i, qq in enumerate(q):
            buckets.setdefault((qi, int(qq)), []).append(i)
    seen = set()
    out_a, out_b, out_d = [], [], []
    for members in buckets.values():
        if len(members) < 2:
            continue
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                key = (min(i, j), max(i, j))
                if key in seen:
                    continue
                seen.add(key)
                d = int(bin(int(sh[i]) ^ int(sh[j])).count("1"))
                if d <= max_hamming:
                    a, b = sorted((int(ids[i]), int(ids[j])))
                    out_a.append(a)
                    out_b.append(b)
                    out_d.append(d)
    order = np.lexsort((out_b, out_a))
    return pa.table(
        {
            "a": pa.array(np.array(out_a, np.int64)[order] if out_a else [], pa.int64()),
            "b": pa.array(np.array(out_b, np.int64)[order] if out_b else [], pa.int64()),
            "hamming": pa.array(np.array(out_d, np.int64)[order] if out_d else [], pa.int64()),
        }
    )


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
            hh, srow, offs, counts = _shingle_hashes(
                self.tk, batch[text_col], len(batch), shingle
            )
            jac = np.zeros(len(batch))
            a = self.anchor
            for i in range(len(batch)):
                s = np.unique(hh[offs[i] : offs[i + 1]])
                if len(s) == 0 and len(a) == 0:
                    continue
                inter = len(np.intersect1d(s, a, assume_unique=True))
                jac[i] = inter / (len(s) + len(a) - inter)
            return pa.table(
                {
                    "doc_id": batch[id_col],
                    "jaccard": pa.array(np.round(jac, 6)),
                }
            )

    return ds.map_batches(Jac, batch_format="pyarrow", concurrency=(1, 8))
