"""Corpus-curation operators for training-data pipelines: benchmark
decontamination, PII scrubbing, and deterministic (plain + stratified)
sampling.

These extend the reference's surface the same way `ops/webtext.py` does
— the reference engine (cloudant-labs/fdblucene, a Lucene storage
adapter) has no curation layer, but a web-scale corpus pipeline needs
one next to the index build. All stages are vectorized ``map_batches``
over zero-copy Arrow batches; each op has a `queries()` entry and a
DuckDB oracle in `pipelines/queries.py`.

Scale notes (100 TB):

- `decontaminate` broadcasts the benchmark's n-gram hash set ONCE via
  ``ray.put`` (eval suites are MBs — tiny next to the corpus) and
  streams the corpus through a membership probe; nothing shuffles and
  the corpus text never leaves its block. This is the standard
  "13-gram overlap" decontamination shape (GPT-3 appendix C / Gopher
  §A.2.2 style), with the n-gram set deduplicated before broadcast.
- `scrub_pii` is pure per-batch RE2 (pyarrow `replace_substring_regex`)
  — embarrassingly parallel, no state, no shuffle.
- `sample_hash` filters on a multiplicative hash of the id column: no
  RNG state, no coordination, resumable and deterministic across
  retries/cluster sizes (the property `random_sample()` can't give).
- `sample_stratified` takes the per-group n smallest hash values via a
  per-batch partial top-n (map-side combine) followed by a groupby over
  the ~|groups| surviving rows — the exchange carries at most
  n_per_group × n_partitions rows, not the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from fdblucene_ray.analysis.analyzer import BatchTokenizer
from fdblucene_ray.ops.hashing import (
    combine,
    hash_strings,
    part_of,
    round_half_away,
)

_SEED = np.uint64(0x243F6A8885A308D3)  # pi fractional bits, fixed seed

# Knuth multiplicative hash — chosen (over splitmix64) because the SQL
# oracle must compute the identical value in DuckDB BIGINT arithmetic:
# (id * 2654435761) % 2^32 stays within int64 for any int32-ish doc_id.
_KNUTH = 2654435761
_MOD32 = 1 << 32


def knuth_hash32(ids: np.ndarray) -> np.ndarray:
    """(id * 2654435761) mod 2^32 — exactly `(doc_id * 2654435761) %
    4294967296` in DuckDB. int64-safe for ids < 2^32."""
    return (ids.astype(np.int64) * _KNUTH) % _MOD32


# ------------------------------------------------------------------ ngrams


def _ngram_hashes(row_idx: np.ndarray, tok_hashes: np.ndarray, n: int):
    """(anchor_row, gram_hash) for every length-``n`` token window that
    stays within one row. Vectorized: n shifted combines, then a mask
    keeping windows whose first and last token share a row."""
    total = len(tok_hashes)
    if total < n:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    m = total - n + 1
    h = np.full(m, _SEED, np.uint64)
    for j in range(n):
        h = combine(h, tok_hashes[j : j + m])
    ok = row_idx[: m] == row_idx[n - 1 :]
    return row_idx[:m][ok], h[ok]


class NgramContamination:
    """Per-batch benchmark-overlap counter. The benchmark n-gram hash
    set is broadcast once (``ray.put``) and shared zero-copy by every
    actor; each batch does one sorted-membership probe (searchsorted).
    """

    def __init__(self, bench_ref, n: int, text_col="text", id_col="doc_id",
                 analyzer: str = "simple", bloom: bool = False):
        obj = ray.get(bench_ref) if not isinstance(
            bench_ref, (np.ndarray, bytes)
        ) else bench_ref
        if bloom:
            # compressed broadcast: ~10 bits/key instead of 64 — the
            # 100-TB knob for benchmark sets too big to ship exact.
            # Probes may FALSELY flag up to fpr of clean grams; a true
            # overlap is never missed (no false negatives).
            from fdblucene_ray.ops.sketches import BloomFilter

            self.bf = BloomFilter.from_bytes(obj)
            self.bench = None
        else:
            self.bf = None
            self.bench = np.asarray(obj)  # sorted uint64
        self.n = n
        self.text_col, self.id_col = text_col, id_col
        self.tokenizer = BatchTokenizer(analyzer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        nrows = len(batch)
        row_idx, flat = self.tokenizer.flat_tokens(batch[self.text_col])
        anchor, grams = _ngram_hashes(row_idx, hash_strings(flat), self.n)
        n_grams = np.bincount(anchor, minlength=nrows).astype(np.int64)
        if len(grams) and self.bf is not None:
            hit = self.bf.contains(grams)
            n_hits = np.bincount(anchor[hit], minlength=nrows).astype(np.int64)
        elif len(grams) and len(self.bench):
            pos = np.searchsorted(self.bench, grams)
            pos[pos == len(self.bench)] = 0
            hit = self.bench[pos] == grams
            n_hits = np.bincount(anchor[hit], minlength=nrows).astype(np.int64)
        else:
            n_hits = np.zeros(nrows, np.int64)
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "n_grams": pa.array(n_grams),
                "n_hits": pa.array(n_hits),
                "contaminated": pa.array((n_hits > 0).astype(np.int64)),
            }
        )



def _ngram_contamination_batch(
    batch, *, bench_ref, n, text_col, id_col, analyzer, bloom
):
    """Task wrapper: per-worker cached NgramContamination keyed by the
    broadcast benchmark set's ObjectRef (zero-copy plasma fetch once
    per worker, no actor-pool spin-up per query)."""
    from fdblucene_ray.ops.broadcast import cached_state

    st = cached_state(
        ("ngram_contam", bench_ref.hex(), n, text_col, id_col, analyzer,
         bloom),
        lambda: NgramContamination(
            bench_ref, n, text_col=text_col, id_col=id_col,
            analyzer=analyzer, bloom=bloom,
        ),
    )
    return st(batch)

def benchmark_ngram_set(texts, n: int, analyzer: str = "simple") -> np.ndarray:
    """Sorted unique n-gram hash array of a (small) benchmark text
    collection — build once on the driver, ``ray.put`` the result."""
    tok = BatchTokenizer(analyzer)
    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(
        list(texts), pa.string()
    )
    row_idx, flat = tok.flat_tokens(arr)
    _, grams = _ngram_hashes(row_idx, hash_strings(flat), n)
    return np.unique(grams)


def decontaminate(
    ds: ray.data.Dataset,
    benchmark_texts,
    *,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "simple",
    bloom_fpr: float | None = None,
) -> ray.data.Dataset:
    """Flag corpus docs sharing any ``n``-gram with the benchmark set
    (train/eval overlap decontamination). Returns one row per corpus doc:
    (doc_id, n_grams, n_hits, contaminated).

    ``bloom_fpr``: broadcast the benchmark set as a Bloom filter
    instead of the exact sorted array — ~10 bits/key at 1% FPR vs 64
    exact, the knob for benchmark sets too large to ship verbatim.
    Bloom mode can over-flag clean docs but never misses a true
    overlap. The fpr is PER PROBED GRAM and amplifies per document
    (~1-(1-fpr)^grams_per_doc), so size it as
    target_doc_fpr / typical_grams_per_doc."""
    bench = benchmark_ngram_set(benchmark_texts, n, analyzer)
    if bloom_fpr is not None:
        from fdblucene_ray.ops.sketches import BloomFilter

        bf = BloomFilter(max(1, len(bench)), fpr=bloom_fpr)
        bf.add(bench)
        bench_ref = ray.put(bf.to_bytes())
    else:
        bench_ref = ray.put(bench)
    return ds.map_batches(
        _ngram_contamination_batch,
        fn_kwargs=dict(
            bench_ref=bench_ref, n=n, text_col=text_col, id_col=id_col,
            analyzer=analyzer, bloom=bloom_fpr is not None,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ------------------------------------------------------------------ PII

# RE2-compatible patterns (pyarrow and DuckDB both use RE2, so the SQL
# oracle runs the *same* engine on the same pattern strings).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\-\. ]{7,}\d", "<PHONE>"),
)


def _scrub_batch(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    counts = {}
    # replacement order is part of the contract (oracle chains identically):
    # email first (contains dots/digits), then IP, then phone.
    for name, pat, repl in PII_PATTERNS:
        counts[name] = pc.count_substring_regex(text, pat)
        text = pc.replace_substring_regex(text, pat, repl)
    return pa.table(
        {
            "doc_id": batch[id_col],
            "text": text,
            **{
                f"n_{name}": counts[name].cast(pa.int64())
                for name, _, _ in PII_PATTERNS
            },
        }
    )


def scrub_pii(
    ds: ray.data.Dataset, *, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Mask emails / IPv4s / phone-like numbers with typed placeholder
    tokens; emits per-doc match counts alongside the scrubbed text."""
    return ds.map_batches(
        _scrub_batch,
        fn_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ------------------------------------------------------------------ sampling


def sample_hash(
    ds: ray.data.Dataset,
    rate: float,
    *,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic ``rate``-fraction sample: keep rows whose Knuth
    multiplicative hash of ``id_col`` falls below rate × 2^32. Unlike
    ``ds.random_sample`` this is reproducible across runs, retries and
    cluster sizes, and composable (a 10% sample of a 50% sample with
    different multipliers stays unbiased)."""
    threshold = int(rate * _MOD32)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(knuth_hash32(ids) < threshold))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


# second mixing round for the seeded shuffle; chosen so the worst-case
# intermediate ((2^32-1) * 1597334677) stays within int64 — the same
# expression is exact in DuckDB BIGINT arithmetic
_SHUF = 1597334677


def shuffle_key(ids: np.ndarray, seed: int) -> np.ndarray:
    """Seeded deterministic shuffle key: two multiplicative rounds of
    knuth_hash32 with the seed folded in between —
    ``(((id*2654435761) % 2^32 + seed) % 2^32) * 1597334677 % 2^32``.
    All intermediates fit int64, so the identical expression runs in
    DuckDB BIGINT (the SQL oracle) and numpy."""
    h = knuth_hash32(ids)
    return ((h + int(seed)) % _MOD32) * _SHUF % _MOD32


def seeded_shuffle(
    ds: ray.data.Dataset,
    seed: int = 0,
    *,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic global training-data shuffle: order the corpus by
    ``shuffle_key(id, seed)`` (ties by id). Unlike ``random_shuffle()``
    this is reproducible across runs, retries and cluster sizes —
    epoch N is ``seeded_shuffle(ds, seed=N)`` and every worker, resume
    and re-run sees the same permutation, which is what makes a
    100-TB training job's data order auditable. The scale path is Ray
    Data's distributed sort (range exchange): rows move once, no
    driver-side materialization."""

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "shuffle_key", pa.array(shuffle_key(ids, seed))
        )

    keyed = ds.map_batches(add_key, batch_format="pyarrow",
                           zero_copy_batch=True)
    return keyed.sort(["shuffle_key", id_col])


def sample_token_budget(
    ds: ray.data.Dataset,
    budget: int,
    seed: int = 0,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> ray.data.Dataset:
    """Deterministic token-budget sample — the mixing step of a training
    run ("give me ~B tokens of this corpus, reproducibly"): take docs in
    seeded-shuffle order until the running whitespace-token total
    reaches ``budget`` (inclusive running sum, i.e. SQL
    ``sum(n_tokens) OVER (ORDER BY key, id) <= budget``). Returns
    (doc_id, n_tokens, cum_tokens) for every selected doc.

    Scale shape: pass 1 keeps only (doc_id, key, n_tokens) — text never
    shuffles; per-bucket totals (the key's top bits, so buckets ARE
    key-ranges) groupby to ``n_buckets`` rows; the driver prefix-sums
    that tiny table and broadcasts the offsets; buckets whose offset
    already exceeds the budget are dropped BEFORE the per-bucket fold,
    so the fold only ever touches the permutation prefix that can still
    fit — at 100 TB with a 1% budget, 99% of the corpus is never
    re-shuffled. Bucket count is a constant (not corpus-growing), so
    the per-bucket ``map_groups`` stays bounded."""
    import pyarrow.compute as pc

    def pass1(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        from fdblucene_ray.ops.webtext import ws_split
        ws = ws_split(text)
        offs = ws.offsets.to_numpy(zero_copy_only=False)
        per_row = np.diff(offs)
        flat = ws.flatten()
        empty = pc.equal(flat, "").to_numpy(zero_copy_only=False)
        row_idx = np.repeat(np.arange(len(batch)), per_row)
        n_empty = np.bincount(row_idx[empty], minlength=len(batch))
        n_tok = (per_row - n_empty).astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        key = shuffle_key(ids, seed)
        bucket = (key * n_buckets) >> 32  # monotonic in key
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "n_tokens": pa.array(n_tok),
                "key": pa.array(key),
                "bucket": pa.array(bucket.astype(np.int64)),
            }
        )

    # materialize the REDUCED (24 bytes/doc) representation once — it
    # feeds both the totals pass and the fold; the corpus itself is
    # read exactly once and never re-tokenized
    keyed = ds.map_batches(pass1, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    totals = keyed.groupby("bucket").sum("n_tokens").take_all()
    totals.sort(key=lambda r: r["bucket"])
    offsets: dict[int, int] = {}
    run = 0
    for r in totals:
        if run <= budget:  # bucket can still contribute
            offsets[int(r["bucket"])] = run
        run += int(r["sum(n_tokens)"])

    def fold(group: pa.Table) -> pa.Table:
        b = int(group["bucket"][0].as_py())
        off = offsets.get(b)
        if off is None:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "cum_tokens": pa.array([], pa.int64())})
        k = group["key"].to_numpy(zero_copy_only=False)
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        nt = group["n_tokens"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, k))
        nt = nt[order]
        cum = off + np.cumsum(nt)
        keep = cum <= budget
        return pa.table(
            {
                "doc_id": pa.array(ids[order][keep].astype(np.int64)),
                "n_tokens": pa.array(nt[keep].astype(np.int64)),
                "cum_tokens": pa.array(cum[keep].astype(np.int64)),
            }
        )

    live = sorted(offsets)
    pruned = keyed.filter(
        expr=f"bucket >= {live[0]} and bucket <= {live[-1]}"
    ) if live else keyed.limit(0)
    return pruned.groupby("bucket").map_groups(
        fold, batch_format="pyarrow"
    )


def sample_stratified(
    ds: ray.data.Dataset,
    group_col: str,
    n_per_group: int,
    *,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-group deterministic top-``n``: within each ``group_col``
    value keep the n rows with the smallest (knuth_hash(id), id). Equals
    SQL ``row_number() OVER (PARTITION BY g ORDER BY h, id) <= n``.

    Shape: a per-batch partial top-n (map-side combine) cuts each block
    to ≤ n×|groups| candidate rows BEFORE the groupby exchange, so the
    shuffle moves candidates only, never the corpus."""

    def partial_topn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        h = knuth_hash32(ids)
        batch = batch.append_column("_h", pa.array(h))
        out = []
        # few groups (langs/sources); per-group argpartition, not a row loop
        groups = pc.unique(batch[group_col])
        for g in groups:
            sub = batch.filter(pc.equal(batch[group_col], g))
            if sub.num_rows > n_per_group:
                sh = sub["_h"].to_numpy(zero_copy_only=False)
                sid = sub[id_col].to_numpy(zero_copy_only=False)
                order = np.lexsort((sid, sh))[:n_per_group]
                sub = sub.take(pa.array(np.sort(order)))
            out.append(sub)
        return pa.concat_tables(out) if out else batch.slice(0, 0)

    def final_topn(group: pa.Table) -> pa.Table:
        """Final top-n for EVERY group hashed into one shuffle
        partition, in one vectorized call: lexsort by (group, _h, id),
        per-run rank from run arithmetic, keep rank < n (one Python
        call per PARTITION — group cardinality is unbounded)."""
        gcol = group[group_col]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        codes = gcol.dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        if not len(codes):
            return group.drop_columns(["_h", "_part"])
        h = group["_h"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h, codes))
        gc = codes[order]
        starts = np.flatnonzero(np.concatenate(([True], gc[1:] != gc[:-1])))
        runlen = np.diff(np.concatenate((starts, [len(gc)])))
        rank = np.arange(len(gc)) - np.repeat(starts, runlen)
        sel = order[rank < n_per_group]
        return group.take(pa.array(np.sort(sel))).drop_columns(
            ["_h", "_part"]
        )

    from fdblucene_ray.ops.hashing import hash_strings

    num_parts = max(16, int(ray.cluster_resources().get("CPU", 8)))

    def add_part(t: pa.Table) -> pa.Table:
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        hp = hash_strings(g.cast(pa.string()))
        return t.append_column(
            "_part", pa.array((hp % np.uint64(num_parts)).astype(np.int32))
        )

    candidates = ds.map_batches(
        partial_topn, batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        candidates.map_batches(add_part, batch_format="pyarrow",
                               zero_copy_batch=True)
        .groupby("_part", num_partitions=num_parts)
        .map_groups(final_topn, batch_format="pyarrow")
    )


def cap_per_group(
    ds: ray.data.Dataset,
    group_col: str,
    n_per_group: int,
    *,
    order_col: str,
    descending: bool = True,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-group cap by a QUALITY column — the domain-balancing op web
    corpora need (e.g. "keep the 100 longest/highest-scored pages per
    host" so no single domain dominates the training mix; C4/Gopher-
    style host caps). Equals SQL ``row_number() OVER (PARTITION BY g
    ORDER BY order_col DESC, id) <= n``.

    Same two-phase shape as ``sample_stratified`` (which caps by a
    deterministic HASH instead of a quality signal): a per-batch
    partial top-n cuts each block to <= n x |groups in block| rows
    before the exchange, then one hashed-partition groupby ranks every
    group of a partition in ONE vectorized call (lexsort + run
    arithmetic — no per-key Python)."""

    sign = -1.0 if descending else 1.0

    def partial_topn(batch: pa.Table) -> pa.Table:
        out = []
        groups = pc.unique(batch[group_col])
        for g in groups:
            sub = batch.filter(pc.equal(batch[group_col], g))
            if sub.num_rows > n_per_group:
                v = sub[order_col].to_numpy(zero_copy_only=False).astype(
                    np.float64
                )
                sid = sub[id_col].to_numpy(zero_copy_only=False)
                order = np.lexsort((sid, sign * v))[:n_per_group]
                sub = sub.take(pa.array(np.sort(order)))
            out.append(sub)
        return pa.concat_tables(out) if out else batch.slice(0, 0)

    def final_topn(group: pa.Table) -> pa.Table:
        gcol = group[group_col]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        codes = gcol.dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        if not len(codes):
            return group.drop_columns(["_part"])
        v = group[order_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, sign * v, codes))
        gc = codes[order]
        starts = np.flatnonzero(np.concatenate(([True], gc[1:] != gc[:-1])))
        runlen = np.diff(np.concatenate((starts, [len(gc)])))
        rank = np.arange(len(gc)) - np.repeat(starts, runlen)
        sel = order[rank < n_per_group]
        return group.take(pa.array(np.sort(sel))).drop_columns(["_part"])

    num_parts = max(16, int(ray.cluster_resources().get("CPU", 8)))

    def add_part(t: pa.Table) -> pa.Table:
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        hp = hash_strings(g.cast(pa.string()))
        return t.append_column(
            "_part", pa.array((hp % np.uint64(num_parts)).astype(np.int32))
        )

    candidates = ds.map_batches(
        partial_topn, batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        candidates.map_batches(add_part, batch_format="pyarrow",
                               zero_copy_batch=True)
        .groupby("_part", num_partitions=num_parts)
        .map_groups(final_topn, batch_format="pyarrow")
    )


def mix_rates(
    ds: ray.data.Dataset,
    group_col: str,
    target_shares: dict[str, float],
) -> pa.Table:
    """Per-group resampling rates that reshape the corpus toward a
    target domain mixture WITHOUT upsampling (static domain-reweighting
    a la The Pile / DoReMi's fixed-weight baseline): given group counts
    n_g and target shares t_g, the largest achievable mixed corpus is
    K = min_g(n_g / t_g); each group keeps rate_g = t_g * K / n_g of
    its rows (the binding group keeps everything). Groups absent from
    ``target_shares`` get rate 0 (dropped).

    One ``groupby(group).count()`` aggregate pass — the result is one
    row per domain, tiny at any corpus size. Returns (group, n, rate)
    sorted by group."""
    counts = ds.groupby(group_col).count().to_pandas()
    cnt = dict(zip(counts[group_col], counts["count()"]))
    k = min(
        cnt[g] / t for g, t in target_shares.items() if t > 0 and g in cnt
    )
    groups = sorted(cnt)
    rates = [
        (target_shares.get(g, 0.0) * k / cnt[g]) if g in target_shares else 0.0
        for g in groups
    ]
    return pa.table(
        {
            "group": pa.array(groups, pa.string()),
            "n": pa.array([int(cnt[g]) for g in groups], pa.int64()),
            "rate": pa.array(rates, pa.float64()),
        }
    )


def sample_to_mix(
    ds: ray.data.Dataset,
    group_col: str,
    target_shares: dict[str, float],
    *,
    id_col: str = "doc_id",
    rates: pa.Table | None = None,
) -> ray.data.Dataset:
    """Deterministic weighted sampling to a target domain mixture: keep
    a row iff knuth_hash(id) < rate(group) * 2^32, with per-group rates
    from ``mix_rates``. The rates table is one row per domain — carried
    in the task closure (broadcast), never shuffled; the corpus streams
    through one vectorized filter. Same reproducibility/composability
    properties as ``sample_hash``."""
    if rates is None:
        rates = mix_rates(ds, group_col, target_shares)
    thr = {
        g: int(r * _MOD32)
        for g, r in zip(rates["group"].to_pylist(), rates["rate"].to_pylist())
    }

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(batch[group_col].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False)
        # |domains| thresholds -> O(uniques) python, O(rows) numpy
        code_thr = np.array(
            [thr.get(v, 0) for v in enc.dictionary.to_pylist()], np.int64
        )
        return batch.filter(pa.array(knuth_hash32(ids) < code_thr[codes]))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


class _DocGramPairs:
    """Per-batch DISTINCT (gram_hash, doc_id) pairs. Each doc is one
    row, so within-batch dedup gives exact per-doc distinct grams."""

    def __init__(self, n: int, text_col: str, id_col: str, analyzer: str):
        self.n = n
        self.text_col, self.id_col = text_col, id_col
        self.tokenizer = BatchTokenizer(analyzer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        row_idx, flat = self.tokenizer.flat_tokens(batch[self.text_col])
        anchor, grams = _ngram_hashes(row_idx, hash_strings(flat), self.n)
        if not len(grams):
            return pa.table(
                {"gram": pa.array([], pa.int64()),
                 "doc_id": pa.array([], pa.int64())}
            )
        g = grams.view(np.int64)
        order = np.lexsort((anchor, g))
        gs, as_ = g[order], anchor[order]
        keep = np.concatenate(
            ([True], (gs[1:] != gs[:-1]) | (as_[1:] != as_[:-1]))
        )
        return pa.table(
            {"gram": pa.array(gs[keep]), "doc_id": pa.array(ids[as_[keep]])}
        )


def _mark_dup_grams(group: pa.Table) -> pa.Table:
    """All grams hashed into one shuffle partition marked in one
    vectorized call: rows are distinct (gram, doc) pairs, so a gram is
    duplicated iff its run length >= 2. One sort finds the runs — no
    per-gram Python call."""
    g = group["gram"].to_numpy(zero_copy_only=False)
    d = group["doc_id"].to_numpy(zero_copy_only=False)
    if not len(g):
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "dup": pa.array([], pa.int64())}
        )
    order = np.argsort(g, kind="stable")
    gs = g[order]
    new = np.empty(len(gs), bool)
    new[0] = True
    new[1:] = gs[1:] != gs[:-1]
    gid = np.cumsum(new) - 1
    runlen = np.bincount(gid)
    return pa.table(
        {
            "doc_id": pa.array(d[order]),
            "dup": pa.array((runlen[gid] >= 2).astype(np.int64)),
        }
    )


def dup_ngram_stats(
    ds: ray.data.Dataset,
    *,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "simple",
) -> ray.data.Dataset:
    """Cross-document duplicated n-gram statistics (the RefinedWeb /
    MassiveText inter-document duplication signal): for every doc with
    >=1 n-gram, the number of DISTINCT n-grams, how many of them occur
    in >=2 distinct documents corpus-wide, and the duplicated fraction.

    Shape at 100 TB: one pass emits map-side-deduped (gram, doc) pairs
    (one row per distinct gram per doc — the inherent size of this
    operation), ONE groupby(gram) marks grams seen in >=2 docs, then a
    small groupby(doc_id) folds the flags into per-doc counts. Text
    never shuffles; only 16-byte pair rows do."""
    from ray.data.aggregate import Count, Sum

    pairs = ds.map_batches(
        _DocGramPairs(n, text_col, id_col, analyzer),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    num_parts = max(16, int(ray.cluster_resources().get("CPU", 8)))

    def add_part(t: pa.Table) -> pa.Table:
        key = t["gram"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array(part_of(key, num_parts)))

    flags = (
        pairs.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part", num_partitions=num_parts)
        .map_groups(_mark_dup_grams, batch_format="pyarrow")
    )
    agg = flags.groupby("doc_id").aggregate(
        Sum("dup", alias_name="n_dup"), Count(alias_name="n_grams")
    )

    def finish(batch: pa.Table) -> pa.Table:
        nd = batch["n_dup"].to_numpy(zero_copy_only=False).astype(np.int64)
        ng = batch["n_grams"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_grams": pa.array(ng),
                "n_dup": pa.array(nd),
                "dup_frac": pa.array(
                    round_half_away(nd / ng, 6).astype(np.float64)
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def weighted_sample(
    ds,
    k: int,
    *,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
) -> pa.Table:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006): item i is selected iff its key ln(u_i)/w_i is among the k
    largest, u_i a seeded md5 uniform — exactly distributed as
    sequential weighted draws, yet embarrassingly parallel and
    deterministic (reruns and the DuckDB twin select byte-identical
    rows). One pass with a per-batch local top-k; the global top-k
    sorts batches×k candidate rows. Rows with weight <= 0 are never
    selected. Columns: (id_col, weight), id asc."""
    import ray.data  # noqa: F401 — ds is a Dataset

    from fdblucene_ray.ops.dsir import md5_uniform

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lnu = np.log(md5_uniform(ids, seed))
        key = np.where(w > 0, lnu / np.maximum(w, 1e-300), -np.inf)
        top = np.argsort(-key, kind="stable")[:k]
        top = top[np.isfinite(key[top])]
        return pa.table(
            {
                id_col: pa.array(ids[top]),
                "weight": pa.array(w[top]),
                "key": pa.array(key[top]),
            }
        )

    cands = ds.map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    top = cands.sort("key", descending=True).limit(k).to_pandas()
    top = top.sort_values(id_col).reset_index(drop=True)
    return pa.table(
        {
            id_col: pa.array(top[id_col].to_numpy(np.int64)),
            "weight": pa.array(top["weight"].to_numpy(np.float64)),
        }
    )
