"""Mergeable sketches for corpus-scale approximate statistics.

HyperLogLog (Flajolet et al. 2007, with the HLL++ small-range linear
counting correction from Heule et al. 2013): COUNT DISTINCT over any
column without a shuffle. Each batch folds its values into a
2^p-register sketch (one vectorized pass: splitmix64 hash, leading-zero
rank, per-register max); batches emit ONE register-blob row each, and
the driver folds B tiny blobs with an elementwise max — the classic
mergeable-sketch shape, so the same partials also serve per-partition
or per-day rollups.

At 100 TB this replaces the exact ``groupby(col).count()`` distinct
(an all-to-all shuffle of every distinct value) with a map-only pass
shipping 16 KiB per batch; standard error is ~1.04/sqrt(2^p) (~0.8%
at p=14).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from fdblucene_ray.ops.hashing import hash_strings, splitmix64


def _rank_registers(h: np.ndarray, p: int) -> np.ndarray:
    """Fold 64-bit hashes into 2^p registers: register index = top p
    bits, value = 1 + leading zeros of the remaining 64-p bits
    (capped), per-register maximum."""
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # leading zeros of the 64-bit 'rest' via bit_length: lz = 64 - bl
    # (rest is never 0 thanks to the sentinel low bits above)
    bl = np.zeros(len(rest), np.int64)
    r = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = r >= (np.uint64(1) << np.uint64(shift))
        bl[big] += shift
        r[big] >>= np.uint64(shift)
    bl += 1
    rank = (64 - bl + 1).astype(np.uint8)
    regs = np.zeros(m, np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


class _HLLPartial:
    """map_batches: one register-blob row per batch."""

    def __init__(self, col: str, p: int):
        self.col, self.p = col, p

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            h = hash_strings(col)
        else:
            vals = col.to_numpy(zero_copy_only=False).astype(np.int64)
            h = splitmix64(vals.view(np.uint64))
        regs = _rank_registers(h.astype(np.uint64), self.p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})


def _estimate(regs: np.ndarray) -> float:
    m = len(regs)
    # raw HLL estimate with the standard alpha_m constant
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.float64(2.0) ** -regs.astype(np.float64))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:  # small-range linear counting
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(
    ds: ray.data.Dataset, col: str, *, p: int = 14
) -> tuple[int, np.ndarray]:
    """Approximate COUNT(DISTINCT col): map-only register partials,
    driver folds per-batch blobs with elementwise max. Returns
    (estimate, merged registers) — registers are reusable/mergeable
    (union of datasets = max of their registers)."""
    if not (4 <= p <= 18):
        raise ValueError("p must be in [4, 18]")
    parts = ds.map_batches(
        _HLLPartial(col, p),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    regs = np.zeros(1 << p, np.uint8)
    for r in parts:
        regs = np.maximum(regs, np.frombuffer(r["regs"], np.uint8))
    return int(round(_estimate(regs))), regs


def merge_sketches(sketches: list[np.ndarray]) -> tuple[int, np.ndarray]:
    """Union of sketched sets = elementwise register max."""
    regs = np.maximum.reduce([np.asarray(s, np.uint8) for s in sketches])
    return int(round(_estimate(regs))), regs


# ---------------------------------------------------------- Bloom filter
#
# Membership sketch for broadcast-side compression: a benchmark n-gram
# set of 10^9 hashes costs 8 GB exact but ~1.2 GB as a 1%-FPR Bloom
# filter — the decontamination broadcast at 100 TB. Vectorized
# double-hashing (Kirsch & Mitzenmacher 2006): the k probe positions
# use k INDEPENDENT salted splitmix64 hashes (probe i hashes
# key ^ salt_i) — slightly more hashing than the double-hashing trick
# but keeps the nominal FPR even for small filters, where
# Kirsch-Mitzenmacher's h1+i*h2 mod m measurably over-fires; all adds
# and probes stay pure numpy over the whole value array.


class BloomFilter:
    """Fixed-size bit-array Bloom filter over uint64 keys."""

    def __init__(self, n_items: int, fpr: float = 0.01):
        if not (0 < fpr < 1) or n_items <= 0:
            raise ValueError("need n_items > 0 and 0 < fpr < 1")
        m = int(np.ceil(-n_items * np.log(fpr) / (np.log(2) ** 2)))
        self.m = max(64, m)
        self.k = max(1, min(63, int(round(self.m / n_items * np.log(2)))))
        self.bits = np.zeros((self.m + 7) // 8, np.uint8)

    _SALTS = np.uint64(0x9E3779B97F4A7C15) * (
        np.arange(1, 64, dtype=np.uint64)
    )

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        keys = keys.astype(np.uint64)
        return np.stack(
            [
                (splitmix64(keys ^ self._SALTS[i]) % np.uint64(self.m)).astype(
                    np.int64
                )
                for i in range(self.k)
            ]
        )

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(np.asarray(keys)).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized probe: True = maybe present (FPR-bounded),
        False = definitely absent."""
        keys = np.asarray(keys)
        if not len(keys):
            return np.zeros(0, bool)
        pos = self._positions(keys)  # (k, n)
        set_ = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return set_.all(axis=0)

    def to_bytes(self) -> bytes:
        header = np.array([self.m, self.k], np.int64).tobytes()
        return header + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomFilter":
        m, k = np.frombuffer(blob[:16], np.int64)
        bf = cls.__new__(cls)
        bf.m, bf.k = int(m), int(k)
        bf.bits = np.frombuffer(blob[16:], np.uint8).copy()
        return bf


# ------------------------------------------------------------ Count-Min
#
# Count-Min sketch (Cormode & Muthukrishnan 2005): mergeable frequency
# estimates with one-sided error (estimate >= true count;
# overestimate <= eps * total with probability 1 - delta at
# width = ceil(e / eps), depth = ceil(ln(1 / delta))). Same shape as
# the HLL pass: each batch folds its items into a (depth, width) int64
# grid, batches emit ONE grid row, the driver folds B grids with
# elementwise SUM (counts are additive, unlike HLL's max). Point
# queries take the minimum across rows.


class CountMinSketch:
    """Vectorized CMS over uint64 keys. Rows use independent
    splitmix64-derived hash seeds; ``add``/``estimate`` are one numpy
    pass per row."""

    def __init__(self, width: int = 2048, depth: int = 5):
        self.width, self.depth = int(width), int(depth)
        self.grid = np.zeros((self.depth, self.width), np.int64)
        self._seeds = splitmix64(
            np.arange(1, self.depth + 1, dtype=np.uint64) * np.uint64(0x9E37)
        )

    def _cols(self, keys: np.ndarray) -> np.ndarray:
        k = np.ascontiguousarray(keys, np.uint64)
        return np.stack(
            [
                (splitmix64(k ^ s) % np.uint64(self.width)).astype(np.int64)
                for s in self._seeds
            ]
        )  # (depth, n)

    def add(self, keys: np.ndarray, counts: np.ndarray | None = None) -> None:
        cols = self._cols(keys)
        w = (
            np.ones(cols.shape[1], np.int64)
            if counts is None
            else np.asarray(counts, np.int64)
        )
        for r in range(self.depth):
            np.add.at(self.grid[r], cols[r], w)

    def estimate(self, keys: np.ndarray) -> np.ndarray:
        cols = self._cols(keys)
        est = self.grid[0][cols[0]]
        for r in range(1, self.depth):
            est = np.minimum(est, self.grid[r][cols[r]])
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert self.grid.shape == other.grid.shape
        self.grid += other.grid
        return self


def _cms_partial(batch: pa.Table, *, col: str, width: int, depth: int,
                 analyzer: str | None) -> pa.Table:
    """One (grid-blob, candidate-terms) row per batch: the batch's CMS
    grid plus its locally-frequent terms (the per-batch top candidates
    whose global counts the merged sketch later estimates)."""
    from fdblucene_ray.ops.broadcast import cached_state

    if analyzer is not None:
        from fdblucene_ray.analysis.analyzer import BatchTokenizer

        tk = cached_state(
            ("cms_tokenizer", analyzer), lambda: BatchTokenizer(analyzer)
        )
        _, terms = tk.flat_tokens(batch[col])
    else:
        terms = batch[col]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
    import pyarrow.compute as pc

    vc = pc.value_counts(terms)
    vals = vc.field("values").cast(pa.string())
    cnts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
    keys = hash_strings(vals)
    cms = CountMinSketch(width, depth)
    cms.add(keys, cnts)
    # candidates: this batch's 64 most frequent terms
    top = np.argsort(-cnts, kind="stable")[:64]
    return pa.table(
        {
            "grid": pa.array([cms.grid.tobytes()], pa.binary()),
            "cand": pa.array(
                [[str(vals[int(i)]) for i in top]],
                pa.list_(pa.string()),
            ),
        }
    )


def cms_heavy_hitters(
    ds: ray.data.Dataset,
    col: str = "text",
    k: int = 10,
    *,
    width: int = 2048,
    depth: int = 5,
    analyzer: str | None = "simple",
) -> tuple[pa.Table, CountMinSketch]:
    """Approximate top-k frequent terms: one map-only pass emits a
    per-batch CMS grid + that batch's local top terms; the driver SUMS
    the grids (mergeable) and ranks the candidate union by sketch
    estimate (count desc, term asc). No shuffle touches the token
    stream — B * depth * width * 8 bytes move, independent of corpus
    size. A term in the global top-k is in some batch's local top
    (count >= total/k in at least one batch for skewed tops), the
    standard candidates+sketch heavy-hitters recipe. Returns
    ((term, est) table, merged sketch)."""
    parts = ds.map_batches(
        _cms_partial,
        fn_kwargs=dict(col=col, width=width, depth=depth, analyzer=analyzer),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    cms = CountMinSketch(width, depth)
    cand: set[str] = set()
    for r in parts:
        cms.grid += np.frombuffer(r["grid"], np.int64).reshape(depth, width)
        cand.update(r["cand"])
    terms = sorted(cand)
    est = cms.estimate(hash_strings(pa.array(terms, pa.string())))
    order = np.lexsort((np.array(terms, dtype=object), -est))[:k]
    return (
        pa.table(
            {
                "term": pa.array([terms[int(i)] for i in order], pa.string()),
                "est": pa.array(est[order], pa.int64()),
            }
        ),
        cms,
    )


def _hll_group_partial(
    batch: pa.Table, *, col: str, group_col: str, p: int
) -> pa.Table:
    """One register-blob row per (group, batch): groups sort within the
    batch and each run folds vectorized — facet-cardinality groups mean
    a handful of 2^p blobs per batch, never per-row state."""
    g = batch[group_col]
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    keys = np.asarray(g.to_pylist(), dtype=object)
    col_a = batch[col]
    if isinstance(col_a, pa.ChunkedArray):
        col_a = col_a.combine_chunks()
    if pa.types.is_string(col_a.type) or pa.types.is_large_string(col_a.type):
        h = hash_strings(col_a).astype(np.uint64)
    else:
        vals = col_a.to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(vals.view(np.uint64))
    order = np.argsort(keys, kind="stable")
    ks, hs = keys[order], h[order]
    starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
    ends = np.concatenate((starts[1:], [len(ks)]))
    out_g, out_r = [], []
    for s, e in zip(starts, ends):
        out_g.append(str(ks[s]))
        out_r.append(_rank_registers(hs[s:e], p).tobytes())
    return pa.table(
        {"grp": pa.array(out_g, pa.string()),
         "regs": pa.array(out_r, pa.binary())}
    )


def approx_distinct_by_group(
    ds: ray.data.Dataset, col: str, group_col: str, *, p: int = 12
) -> pa.Table:
    """Approximate COUNT(DISTINCT col) per group: per-(batch, group)
    register partials, driver folds per group with elementwise max —
    the mergeable-sketch shape grouped by a facet-cardinality key (the
    driver holds |groups| x 2^p bytes, never values). Returns
    (grp, approx_n) sorted grp asc."""
    parts = ds.map_batches(
        _hll_group_partial,
        fn_kwargs=dict(col=col, group_col=group_col, p=p),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    folded: dict[str, np.ndarray] = {}
    for r in parts:
        regs = np.frombuffer(r["regs"], np.uint8)
        cur = folded.get(r["grp"])
        folded[r["grp"]] = regs if cur is None else np.maximum(cur, regs)
    grps = sorted(folded)
    return pa.table(
        {
            "grp": pa.array(grps, pa.string()),
            "approx_n": pa.array(
                [int(round(_estimate(folded[g]))) for g in grps], pa.int64()
            ),
        }
    )
