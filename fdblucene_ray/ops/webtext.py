"""Web-corpus hygiene operators beyond the reference's surface: chunk-level
exact dedup (the CCNet/C4 paragraph-dedup analog), Gopher-style repetition
signals, per-source corpus stats, and text normalization.

All stages are vectorized ``map_batches`` over zero-copy Arrow batches;
the only shuffles are (a) the chunk-hash groupby in ``chunk_dedup`` (the
same one-exchange shape as the index build) and (b) the tiny post-combine
``source_stats`` aggregate. Every op has a DuckDB SQL oracle in
``pipelines/queries.py`` (tokens = whitespace split, exactly
``regexp_split_to_array(text, '\\s+')`` with empties dropped on both
sides).

Scale notes (100 TB): ``chunk_dedup`` ships one 16-byte row per 16-token
chunk through the exchange — ~1/60th of the corpus bytes; duplicate
groups are bounded by the corpus's true duplication rate, and the
per-doc rollup is a hash aggregate with map-side combine. Nothing here
materializes the corpus on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from fdblucene_ray.ops.hashing import (
    combine,
    hash_strings,
    part_of,
    round_half_away,
)

_SEED = np.uint64(0x6A09E667F3BCC908)  # sqrt(2) fractional bits, fixed seed


def ws_split(text: pa.Array) -> pa.ListArray:
    """``\\s+``-split of a string column, fast path: Arrow's
    ``ascii_split_whitespace`` is ~6x faster than the RE2 split and
    agrees with ``\\s+`` everywhere except vertical tab ``\\x0b`` (RE2
    ``\\s`` excludes it); fall back to the regex only when the batch
    actually contains one so SQL-oracle parity holds bit-for-bit."""
    has_vt = pc.any(
        pc.greater(pc.count_substring(text, "\x0b"), 0)
    ).as_py()
    return (
        pc.split_pattern_regex(text, r"\s+")
        if has_vt
        else pc.ascii_split_whitespace(text)
    )


def _ws_tokens(text: pa.ChunkedArray | pa.Array):
    """Whitespace tokens of a string column -> (row_idx, flat tokens,
    per-row counts, within-row ordinal), empties dropped. Mirrors the
    SQL oracle's regexp_split_to_array(text, '\\s+') + tok <> ''."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = len(text)
    ws = ws_split(text)
    per_row = np.diff(ws.offsets.to_numpy(zero_copy_only=False))
    flat = ws.flatten()
    row_idx = np.repeat(np.arange(n, dtype=np.int64), per_row)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if not nonempty.all():
        flat = flat.filter(pa.array(nonempty))
        row_idx = row_idx[nonempty]
    counts = np.bincount(row_idx, minlength=n).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(counts[:-1])))
    ordinal = np.arange(len(row_idx), dtype=np.int64) - starts[row_idx]
    return row_idx, flat, counts, ordinal


class ChunkHashes:
    """Stage 1 of chunk_dedup: one row per non-overlapping ``w``-token
    chunk — (chunk_hash, doc_id, chunk_idx, n_toks). The chunk hash is
    an order-sensitive fold of per-token content hashes (w vector steps
    per batch, no Python row loop)."""

    def __init__(self, w: int = 16, text_col="text", id_col="doc_id"):
        self.w, self.text_col, self.id_col = w, text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        row_idx, flat, counts, ordinal = _ws_tokens(batch[self.text_col])
        tok_h = hash_strings(flat)
        w = self.w
        chunk_idx = ordinal // w
        # chunks are contiguous runs in (row-major, ordinal) order
        key_change = np.empty(len(row_idx), dtype=bool)
        if len(row_idx):
            key_change[0] = True
            key_change[1:] = (row_idx[1:] != row_idx[:-1]) | (
                chunk_idx[1:] != chunk_idx[:-1]
            )
        chunk_start = np.flatnonzero(key_change)
        n_chunks = len(chunk_start)
        lens = np.diff(np.concatenate((chunk_start, [len(row_idx)]))).astype(
            np.int64
        )
        # padded (n_chunks, w) gather + masked sequential fold
        idx = chunk_start[:, None] + np.arange(w, dtype=np.int64)[None, :]
        np.clip(idx, 0, max(len(tok_h) - 1, 0), out=idx)
        mat = (
            tok_h[idx]
            if len(tok_h)
            else np.zeros((n_chunks, w), np.uint64)
        )
        mask = np.arange(w)[None, :] < lens[:, None]
        h = np.full(n_chunks, _SEED, np.uint64)
        for j in range(w):
            m = mask[:, j]
            if not m.any():
                break
            h[m] = combine(h[m], mat[m, j])
        return pa.table(
            {
                "chunk_hash": pa.array(h.view(np.int64)),
                "doc_id": pa.array(
                    doc_ids[row_idx[chunk_start]]
                    if n_chunks
                    else np.empty(0, np.int64)
                ),
                "chunk_idx": pa.array(
                    chunk_idx[chunk_start]
                    if n_chunks
                    else np.empty(0, np.int64)
                ),
                "n_toks": pa.array(lens),
            }
        )


def _mark_dups(group: pa.Table) -> pa.Table:
    """Stage 2: ALL chunk-hash groups hashed into one shuffle partition,
    marked in one vectorized call. Within a hash, the lexicographically
    first (doc_id, chunk_idx) occurrence is the keeper; the rest are
    dups. One lexsort finds the hash runs — no per-key Python."""
    h = group["chunk_hash"].to_numpy(zero_copy_only=False)
    d = group["doc_id"].to_numpy(zero_copy_only=False)
    ci = group["chunk_idx"].to_numpy(zero_copy_only=False)
    n_toks = group["n_toks"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ci, d, h))
    hs = h[order]
    is_dup = np.ones(len(hs), np.int64)
    if len(hs):
        is_dup[0] = 0
        is_dup[1:] = (hs[1:] == hs[:-1]).astype(np.int64)
    nt = n_toks[order]
    return pa.table(
        {
            "doc_id": pa.array(d[order]),
            "n_toks": pa.array(nt),
            "dup": pa.array(is_dup),
            "dup_toks": pa.array(np.where(is_dup > 0, nt, 0).astype(np.int64)),
        }
    )


def chunk_dedup(
    ds: ray.data.Dataset, w: int = 16, text_col="text", id_col="doc_id"
) -> ray.data.Dataset:
    """CCNet-style exact span dedup over non-overlapping w-token chunks.

    Returns per-doc rollup: n_chunks, n_dup_chunks, n_tokens,
    n_dup_tokens, dup_token_frac (6 dp). A chunk occurrence is a dup
    iff an identical chunk exists at a smaller (doc_id, chunk_idx).

    Shape: the shuffle is keyed on ``part = hash(chunk_hash) % P`` (a
    few dozen keys) rather than the raw chunk hash (unbounded at corpus
    scale); equal hashes land in the same partition, and the marking
    pass is one lexsort per PARTITION."""
    from ray.data.aggregate import Count, Sum

    num_parts = max(16, int(ray.cluster_resources().get("CPU", 8)))
    chunks = ds.map_batches(
        ChunkHashes(w, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def add_part(t: pa.Table) -> pa.Table:
        key = t["chunk_hash"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array(part_of(key, num_parts)))

    marked = (
        chunks.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part", num_partitions=num_parts)
        .map_groups(_mark_dups, batch_format="pyarrow")
    )
    agg = marked.groupby("doc_id").aggregate(
        Count(alias_name="n_chunks"),
        Sum("dup", alias_name="n_dup_chunks"),
        Sum("n_toks", alias_name="n_tokens"),
        Sum("dup_toks", alias_name="n_dup_tokens"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        nt = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        dt = t["n_dup_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chunks": t["n_chunks"].cast(pa.int64()),
                "n_dup_chunks": t["n_dup_chunks"].cast(pa.int64()),
                "n_tokens": pa.array(nt),
                "n_dup_tokens": pa.array(dt),
                "dup_token_frac": pa.array(
                    round_half_away(dt / np.maximum(nt, 1), 6)
                ),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


class RepetitionSignals:
    """Gopher-style per-doc repetition features (Rae et al. 2021, Gopher
    §A1.1 'repetitious text' filters, re-derived from the published
    description): fraction of unique tokens, top-bigram fraction,
    top-trigram fraction. Fully vectorized (np.unique over packed
    (row, hash) keys)."""

    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col, self.id_col = text_col, id_col

    @staticmethod
    def _top_count(row, h, n):
        """max multiplicity of any value per row: (row, hash) pairs."""
        if len(row) == 0:
            return np.zeros(n, np.int64)
        key = (row.astype(np.uint64) << np.uint64(1)) * np.uint64(
            0x9E3779B97F4A7C15
        ) ^ h
        order = np.lexsort((key, row))
        r, k = row[order], key[order]
        new = np.empty(len(r), dtype=bool)
        new[0] = True
        new[1:] = (r[1:] != r[:-1]) | (k[1:] != k[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.concatenate((starts, [len(r)])))
        top = np.zeros(n, np.int64)
        np.maximum.at(top, r[starts], cnt)
        return top

    @staticmethod
    def _n_unique(row, h, n):
        if len(row) == 0:
            return np.zeros(n, np.int64)
        key = (row.astype(np.uint64) << np.uint64(1)) * np.uint64(
            0x9E3779B97F4A7C15
        ) ^ h
        order = np.lexsort((key, row))
        r, k = row[order], key[order]
        new = np.empty(len(r), dtype=bool)
        new[0] = True
        new[1:] = (r[1:] != r[:-1]) | (k[1:] != k[:-1])
        return np.bincount(r[new], minlength=n).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        row_idx, flat, counts, _ = _ws_tokens(batch[self.text_col])
        h = hash_strings(flat)
        n_unique = self._n_unique(row_idx, h, n)
        # bigrams / trigrams within a row
        v2 = row_idx[:-1] == row_idx[1:] if len(row_idx) else np.empty(0, bool)
        b_h = combine(h[:-1], h[1:])[v2] if len(h) else np.empty(0, np.uint64)
        b_row = row_idx[:-1][v2] if len(row_idx) else np.empty(0, np.int64)
        v3 = (
            (row_idx[:-2] == row_idx[2:]) if len(row_idx) > 1 else np.empty(0, bool)
        )
        t_h = (
            combine(combine(h[:-2], h[1:-1]), h[2:])[v3]
            if len(h) > 1
            else np.empty(0, np.uint64)
        )
        t_row = row_idx[:-2][v3] if len(row_idx) > 1 else np.empty(0, np.int64)
        top_b = self._top_count(b_row, b_h, n)
        top_t = self._top_count(t_row, t_h, n)
        n_b = np.maximum(counts - 1, 0)
        n_t = np.maximum(counts - 2, 0)
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "n_tokens": pa.array(counts),
                "frac_unique": pa.array(
                    round_half_away(n_unique / np.maximum(counts, 1), 6)
                ),
                "top_bigram_frac": pa.array(
                    round_half_away(top_b / np.maximum(n_b, 1), 6)
                ),
                "top_trigram_frac": pa.array(
                    round_half_away(top_t / np.maximum(n_t, 1), 6)
                ),
            }
        )


def repetition_signals(ds, text_col="text", id_col="doc_id") -> ray.data.Dataset:
    return ds.map_batches(
        RepetitionSignals(text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


class SourcePartials:
    """Map-side combiner for source_stats: one row per (source, lang)
    per batch — the pre-aggregation that keeps the groupby exchange to
    O(#sources × #langs × #batches) rows regardless of corpus size."""

    def __init__(self, id_col="doc_id"):
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "source": batch["source"].to_pandas(),
                "lang": batch["lang"].to_pandas(),
                "n_chars": pc.utf8_length(
                    batch["text"].combine_chunks()
                    if isinstance(batch["text"], pa.ChunkedArray)
                    else batch["text"]
                ).to_numpy(zero_copy_only=False),
            }
        )
        g = (
            df.groupby(["source", "lang"], sort=True)
            .agg(n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "lang": pa.array(g["lang"], pa.string()),
                "n_docs": pa.array(g["n_docs"].to_numpy(np.int64)),
                "sum_chars": pa.array(g["sum_chars"].to_numpy(np.int64)),
            }
        )


def source_stats(ds: ray.data.Dataset) -> pa.Table:
    """Per-source corpus rollup: n_docs, sum/avg text chars, distinct
    langs. Partial-aggregated per batch, shuffled as tiny (source, lang)
    rows, finalized on the (inherently small) aggregate."""
    from ray.data.aggregate import Sum

    partial = ds.map_batches(
        SourcePartials(), batch_format="pyarrow", zero_copy_batch=True
    )
    agg = (
        partial.groupby(["source", "lang"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_chars", alias_name="sum_chars"),
        )
        .to_pandas()  # #sources × #langs rows — tiny by construction
    )
    g = (
        agg.groupby("source", sort=True)
        .agg(
            n_docs=("n_docs", "sum"),
            sum_chars=("sum_chars", "sum"),
            n_langs=("lang", "nunique"),
        )
        .reset_index()
    )
    avg = np.round(
        g["sum_chars"].to_numpy(np.float64)
        / np.maximum(g["n_docs"].to_numpy(np.int64), 1),
        6,
    )
    return pa.table(
        {
            "source": pa.array(g["source"], pa.string()),
            "n_docs": pa.array(g["n_docs"].to_numpy(np.int64)),
            "sum_chars": pa.array(g["sum_chars"].to_numpy(np.int64)),
            "avg_chars": pa.array(avg),
            "n_langs": pa.array(g["n_langs"].to_numpy(np.int64)),
        }
    )


class PairCountPartials:
    """Map-side combiner for corpus-wide adjacent-pair counts (the
    first step of a BPE merge-rule trainer): per batch, one row per
    DISTINCT within-row token pair with its count — the exchange
    carries combined partials, never one row per occurrence."""

    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        row_idx, flat, counts, _ = _ws_tokens(batch[self.text_col])
        if len(row_idx) < 2:
            return pa.table(
                {
                    "left": pa.array([], pa.string()),
                    "right": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        valid = row_idx[:-1] == row_idx[1:]
        h = hash_strings(flat)
        pair_h = combine(h[:-1], h[1:])[valid]
        order = np.argsort(pair_h, kind="stable")
        ph = pair_h[order]
        first = np.flatnonzero(np.concatenate(([True], ph[1:] != ph[:-1])))
        cnt = np.diff(np.concatenate((first, [len(ph)])))
        # one representative occurrence per distinct pair -> the strings
        occ = np.flatnonzero(valid)[order[first]]
        left = flat.take(pa.array(occ))
        right = flat.take(pa.array(occ + 1))
        return pa.table(
            {
                "left": left,
                "right": right,
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )


def bpe_pair_counts(
    ds: ray.data.Dataset,
    top_k: int = 50,
    text_col="text",
    id_col="doc_id",
) -> pa.Table:
    """Corpus-wide top-k adjacent token pairs by count (BPE merge-rule
    candidates): per-batch combined partials -> groupby(left, right)
    sum -> small top-k sort. Ties break by (left, right) asc."""
    from ray.data.aggregate import Sum

    partial = ds.map_batches(
        PairCountPartials(text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    agg = partial.groupby(["left", "right"]).aggregate(
        Sum("cnt", alias_name="cnt")
    )
    # distributed top-k: sort + limit prune blocks before the driver
    # sees anything (the full distinct-pair table never materializes)
    df = (
        agg.sort(["cnt", "left", "right"], descending=[True, False, False])
        .limit(top_k)
        .to_pandas()
    )
    return pa.table(
        {
            "left": pa.array(df["left"], pa.string()),
            "right": pa.array(df["right"], pa.string()),
            "cnt": pa.array(df["cnt"].to_numpy(np.int64)),
        }
    )


class NormalizeText:
    """Whitespace-collapsing lowercase normalization — the cheap
    canonical form used before exact dedup in web pipelines. Mirrors
    the SQL oracle lower(trim(regexp_replace(text,'\\s+',' ','g')))."""

    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        norm = pc.utf8_trim(
            pc.replace_substring_regex(pc.utf8_lower(text), r"\s+", " "), " "
        )
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "norm_text": norm,
                "n_chars_norm": pc.utf8_length(norm).cast(pa.int64()),
            }
        )


def normalize_text(ds, text_col="text", id_col="doc_id") -> ray.data.Dataset:
    return ds.map_batches(
        NormalizeText(text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ------------------------------------------------- duplicated-span scrub
#
# The "remove duplicated substrings" curation step (Lee et al., ACL'22
# "Deduplicating Training Data Makes Language Models Better"): any
# ``n``-token window that occurs in >= ``min_df`` DISTINCT documents is
# scrubbed from every document containing it. Built as three shuffles of
# SMALL rows — text never moves until the final doc_id-partitioned join:
#
#   1. map_batches: (gram_hash, doc_id, pos) per window   [16-24 B rows]
#   2. groupby(gram): keep occurrences of cross-doc grams
#   3. groupby(doc_id): fold a doc's positions into ONE spans row
#   4. ds.join(spans, left_outer, on=doc_id) + vectorized scrub
#
# At 100 TB the spans table is proportional to actual duplication, and
# the join co-partitions corpus and spans by doc_id (hash exchange) —
# no broadcast of an unbounded dup-gram set.


class DupSpanOccurrences:
    """Every ``n``-token window's (gram_hash, doc_id, pos) — pos is the
    window's start ordinal among the row's non-empty whitespace tokens
    (matching the scrubber's ``str.split()`` positions)."""

    def __init__(self, n: int, text_col: str, id_col: str):
        self.n = n
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        row_idx, flat, _, ordinal = _ws_tokens(batch[self.text_col])
        th = hash_strings(flat)
        total, n = len(th), self.n
        empty = pa.table(
            {"gram": pa.array([], pa.int64()),
             "doc_id": pa.array([], pa.int64()),
             "pos": pa.array([], pa.int64())}
        )
        if total < n:
            return empty
        m = total - n + 1
        h = np.full(m, _SEED, np.uint64)
        for j in range(n):
            h = combine(h, th[j : j + m])
        ok = row_idx[:m] == row_idx[n - 1 :]
        if not ok.any():
            return empty
        return pa.table(
            {
                "gram": pa.array(h[ok].view(np.int64)),
                "doc_id": pa.array(ids[row_idx[:m][ok]].astype(np.int64)),
                "pos": pa.array(ordinal[:m][ok]),
            }
        )


def _dup_occurrences(min_df: int):
    """Keep occurrences of grams seen in >= min_df DISTINCT docs. Runs
    once per hashed shuffle PARTITION: one lexsort finds the gram runs,
    distinct-doc counts come from a bincount over run ids — no per-gram
    Python call."""

    def fn(group: pa.Table) -> pa.Table:
        g = group["gram"].to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        p = group["pos"].to_numpy(zero_copy_only=False)
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int64())}
        )
        if not len(g):
            return empty
        order = np.lexsort((d, g))
        gs, ds_, ps = g[order], d[order], p[order]
        new_gram = np.empty(len(gs), bool)
        new_gram[0] = True
        new_gram[1:] = gs[1:] != gs[:-1]
        gid = np.cumsum(new_gram) - 1
        new_doc = new_gram.copy()
        new_doc[1:] |= ds_[1:] != ds_[:-1]
        ndocs = np.bincount(gid[new_doc])
        keep = ndocs[gid] >= min_df
        if not keep.any():
            return empty
        return pa.table(
            {"doc_id": pa.array(ds_[keep]), "pos": pa.array(ps[keep])}
        )

    fn.__name__ = "_dup_occurrences"
    return fn


def _fold_spans(group: pa.Table) -> pa.Table:
    """All docs hashed into one shuffle partition folded in one call:
    lexsort by (doc_id, pos), dedup, then build the packed-bytes spans
    column zero-copy from offsets (spans are little-endian int64 bytes:
    Acero hash joins accept binary payloads but not list<int64>)."""
    d = group["doc_id"].to_numpy(zero_copy_only=False)
    p = group["pos"].to_numpy(zero_copy_only=False)
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "spans": pa.array([], pa.binary())}
    )
    if not len(d):
        return empty
    order = np.lexsort((p, d))
    ds_, ps = d[order], p[order]
    new = np.empty(len(ds_), bool)
    new[0] = True
    new[1:] = (ds_[1:] != ds_[:-1]) | (ps[1:] != ps[:-1])
    ds_, ps = ds_[new], ps[new]
    starts = np.flatnonzero(
        np.concatenate(([True], ds_[1:] != ds_[:-1]))
    ).astype(np.int64)
    bounds = np.concatenate((starts, [len(ds_)]))
    values = np.ascontiguousarray(ps, "<i8").tobytes()
    if bounds[-1] * 8 <= np.iinfo(np.int32).max:
        spans = pa.BinaryArray.from_buffers(
            pa.binary(),
            len(starts),
            [None, pa.py_buffer((bounds * 8).astype(np.int32).tobytes()),
             pa.py_buffer(values)],
        )
    else:  # >256M positions in one partition: slice per doc (rare)
        spans = pa.array(
            [values[bounds[i] * 8 : bounds[i + 1] * 8]
             for i in range(len(starts))],
            pa.binary(),
        )
    return pa.table(
        {"doc_id": pa.array(ds_[starts]), "spans": spans}
    )


# ------------------------------------------- co-partitioned span scatter
#
# The corpus-side "join" of every span pipeline. Ray's JoinOperator is
# NOT used: its per-partition aggregator builds the right side from the
# shards it received, and a sparse right side (zero or few duplicated
# docs) leaves some partitions with only the zero-COLUMN empty blocks a
# sort-groupby emits for group-less partitions — the Acero join then
# raises ``ArrowInvalid: No match ... for key field doc_id`` (empty
# blocks also skip map_batches UDFs, so they cannot be re-typed away).
# Instead both sides ride ONE hash(doc_id)%P exchange as a tagged
# union and the per-partition kernel folds + aligns + scrubs locally.


def _tag_docs_fn(t: pa.Table) -> pa.Table:
    n = len(t)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "text": pc.cast(t["text"], pa.string()),
            "pos": pa.array(np.full(n, -1, np.int64)),
            "kind": pa.array(np.ones(n, np.int8)),
        }
    )


def _tag_rows_fn(t: pa.Table) -> pa.Table:
    n = len(t)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "text": pa.nulls(n, pa.string()),
            "pos": t["pos"],
            "kind": pa.array(np.zeros(n, np.int8)),
        }
    )


def _spans_scatter_kernel(stage_fn, inner: bool):
    """Per hash(doc_id)%P partition: split the tagged union back into
    docs and (doc_id, pos) rows, fold the rows into per-doc packed
    spans (``_fold_spans``, in-memory), align them to the docs with one
    searchsorted, and hand the assembled (doc_id, text, spans) batch to
    ``stage_fn``. ``inner`` keeps only docs that have spans."""

    def fn(group: pa.Table) -> pa.Table:
        kind = group["kind"].to_numpy(zero_copy_only=False)
        dmask = kind == 1
        docs = group.filter(pa.array(dmask)).select(["doc_id", "text"])
        rem = group.filter(pa.array(~dmask)).select(["doc_id", "pos"])
        folded = _fold_spans(rem)
        ids = docs["doc_id"].to_numpy(zero_copy_only=False)
        fid = folded["doc_id"].to_numpy(zero_copy_only=False)
        if len(fid):
            j = np.searchsorted(fid, ids)
            jc = np.minimum(j, len(fid) - 1)
            hit = (j < len(fid)) & (fid[jc] == ids)
        else:
            j = np.zeros(len(ids), np.int64)
            hit = np.zeros(len(ids), bool)
        if inner:
            docs = docs.filter(pa.array(hit))
            spans = folded["spans"].take(pa.array(j[hit], pa.int64()))
        elif len(fid):
            taken = folded["spans"].take(
                pa.array(np.where(hit, j, 0), pa.int64())
            )
            spans = pc.if_else(
                pa.array(hit), taken, pa.scalar(None, pa.binary())
            )
        else:
            spans = pa.nulls(len(ids), pa.binary())
        batch = docs.append_column("spans", spans)
        return stage_fn(batch)

    fn.__name__ = (
        f"spans_scatter_{getattr(stage_fn, '__name__', type(stage_fn).__name__)}"
    )
    return fn


def _spans_scatter(
    left: ray.data.Dataset,
    rows: ray.data.Dataset,
    stage_fn,
    num_parts: int,
    *,
    inner: bool,
) -> ray.data.Dataset:
    """Co-partition the (doc_id, text) corpus with sparse (doc_id, pos)
    rows on ONE hash exchange and run ``stage_fn`` per partition —
    tolerates a rows side that is empty or covers few partitions."""
    tagged = left.map_batches(
        _tag_docs_fn, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        rows.map_batches(
            _tag_rows_fn, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    return (
        tagged.map_batches(_part_by("doc_id", num_parts),
                           batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part", num_partitions=num_parts)
        .map_groups(_spans_scatter_kernel(stage_fn, inner),
                    batch_format="pyarrow")
    )


class ScrubSpans:
    """Remove tokens covered by any duplicated window. Docs with no
    duplicated span keep their text BYTE-IDENTICAL; scrubbed docs are
    re-joined with single spaces (whitespace-normalized by
    construction). Fully vectorized: coverage is one diff-array pass
    over the batch's flattened token stream (doc boundaries clamp the
    windows), the rejoin is Arrow list-filter + ``binary_join``, and
    untouched rows ride a concat+take scatter — no per-doc Python."""

    def __init__(self, n: int, text_col: str, id_col: str):
        self.n = n
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        has = pc.and_kleene(
            spans.is_valid(), pc.greater(pc.binary_length(spans), 0)
        )
        idx = np.flatnonzero(has.to_numpy(zero_copy_only=False))
        n_removed = np.zeros(n_rows, np.int64)
        out_text = pc.cast(texts, pa.string())
        if len(idx):
            take = pa.array(idx)
            sp = spans.take(take)
            # tokens of scrubbed rows only (str.split() semantics via
            # _ws_tokens — identical to DupSpanOccurrences positions);
            # string-cast first: binary_join has no large_string kernel
            _, flat, L, _ = _ws_tokens(out_text.take(take))
            bounds = np.concatenate(([0], np.cumsum(L)))
            total = int(bounds[-1])
            # every row's packed int64 span starts, straight from the
            # binary column's offsets/data buffers (no per-row slices)
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
            ge = bounds[di] + np.minimum(starts + self.n, L[di])
            gs = np.minimum(bounds[di] + starts, ge)
            cov = (
                np.cumsum(
                    np.bincount(gs, minlength=total + 1)[:total]
                    .astype(np.int64)
                    - np.bincount(ge, minlength=total + 1)[:total]
                )
                > 0
            )
            cum = np.concatenate(([0], np.cumsum(cov)))
            rem = cum[bounds[1:]] - cum[bounds[:-1]]
            n_removed[idx] = rem
            scrubbed = pc.binary_join(
                pa.ListArray.from_arrays(
                    pa.array(
                        np.concatenate(([0], np.cumsum(L - rem))),
                        pa.int32(),
                    ),
                    flat.filter(pa.array(~cov)),
                ),
                " ",
            )
            sel = np.arange(n_rows, dtype=np.int64)
            sel[idx] = n_rows + np.arange(len(idx), dtype=np.int64)
            out_text = pa.concat_arrays(
                [out_text, pc.cast(scrubbed, pa.string())]
            ).take(pa.array(sel))
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "text": out_text,
                "n_removed": pa.array(n_removed),
            }
        )


def scrub_duplicated_spans(
    ds: ray.data.Dataset,
    *,
    n: int = 8,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Scrub every ``n``-token window occurring in >= ``min_df``
    distinct docs (Lee et al. ACL'22). Returns (id_col, text_col,
    n_removed); text is unchanged for untouched docs."""
    # normalize to the internal (doc_id, text) names so the spans
    # pipeline, join key and scrubber line up for ANY caller columns;
    # renamed back at the end
    left = ds.select_columns([id_col, text_col])
    if id_col != "doc_id" or text_col != "text":
        left = left.rename_columns({id_col: "doc_id", text_col: "text"})
    occ = left.map_batches(
        DupSpanOccurrences(n, "text", "doc_id"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # both exchanges are keyed on hash(key) % P — a few dozen shuffle
    # keys regardless of gram/doc cardinality; the per-partition calls
    # find key runs with one lexsort each (no per-key Python)
    num_parts = max(
        num_partitions, int(ray.cluster_resources().get("CPU", 8))
    )
    dup_occ = (
        occ.map_batches(_part_by("gram", num_parts), batch_format="pyarrow",
                        zero_copy_batch=True)
        .groupby("part", num_partitions=num_parts)
        .map_groups(_dup_occurrences(min_df), batch_format="pyarrow")
    )
    # corpus + dup occurrences co-partitioned on ONE hash(doc_id)%P
    # exchange (see _spans_scatter: Ray's JoinOperator rejects sparse
    # right sides); the fold + align + scrub all run per partition
    out = _spans_scatter(
        left, dup_occ, ScrubSpans(n, "text", "doc_id"), num_parts,
        inner=False,
    )
    if id_col != "doc_id" or text_col != "text":
        out = out.rename_columns({"doc_id": id_col, "text": text_col})
    return out


# ---------------------------------------------- exact maximal dup spans
#
# The EXACT half of Lee et al. ACL'22 (scrub_duplicated_spans above is
# the hash-approximate scrubber): report every maximal token region
# covered by n-token windows duplicated across >= min_df distinct docs,
# with LITERAL-BYTE verification so a 64-bit hash collision can never
# put a non-duplicated span in the output.
#
# Exactness argument: every n-window inside a truly duplicated region is
# itself duplicated, so the hash candidate pass has no false negatives;
# candidates are then re-grouped by the literal window text (equal
# literals always share a hash, hence a partition — dictionary-encode
# inside the partition distinguishes colliding literals), which kills
# the false positives. The verify exchange ships only candidate window
# text: volume is proportional to actual duplication, not corpus size.


def _part_by(col: str, num_parts: int):
    """Append ``part = hash(col) % num_parts`` — the explicit shuffle
    key used by every span exchange (a few dozen keys regardless of
    gram/doc cardinality)."""

    def add(t: pa.Table) -> pa.Table:
        key = t[col].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array(part_of(key, num_parts)))

    add.__name__ = f"part_by_{col}"
    return add


class _WindowText:
    """Expand (doc_id, text) x (doc_id, packed candidate starts) join
    rows into one (part, gram=literal window text, doc_id, pos) row per
    candidate window — all gathers vectorized over the batch's
    flattened token stream."""

    def __init__(self, n: int, num_parts: int):
        self.n, self.num_parts = n, num_parts

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "part": pa.array([], pa.int32()),
                "gram": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
            }
        )
        if not batch.num_rows:
            return empty
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sp = batch["spans"]
        if isinstance(sp, pa.ChunkedArray):
            sp = sp.combine_chunks()
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        _, flat, L, _ = _ws_tokens(pc.cast(texts, pa.string()))
        bounds = np.concatenate(([0], np.cumsum(L)))
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
        n = self.n
        # the n tokens of every window (windows are full by
        # construction: candidate positions came from full windows)
        gidx = (bounds[di] + starts)[:, None] + np.arange(n, dtype=np.int64)
        toks = flat.take(pa.array(gidx.ravel()))
        grams = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(np.arange(len(starts) + 1, dtype=np.int64) * n,
                         pa.int32()),
                toks,
            ),
            " ",
        )
        gh = hash_strings(grams)
        return pa.table(
            {
                "part": pa.array(part_of(gh.view(np.int64), self.num_parts)),
                "gram": grams,
                "doc_id": pa.array(ids[di]),
                "pos": pa.array(starts),
            }
        )


def _verify_literal(min_df: int):
    """Keep candidate occurrences whose LITERAL window text appears in
    >= min_df distinct docs: dictionary-encode the partition's grams
    (vectorized byte-exact grouping) and reuse the run arithmetic of
    ``_dup_occurrences`` over the integer codes."""

    dup = _dup_occurrences(min_df)

    def fn(group: pa.Table) -> pa.Table:
        g = group["gram"]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        codes = (
            g.dictionary_encode().indices.cast(pa.int64())
            if len(g)
            else pa.array([], pa.int64())
        )
        return dup(
            pa.table(
                {
                    "gram": codes,
                    "doc_id": group["doc_id"],
                    "pos": group["pos"],
                }
            )
        )

    fn.__name__ = "_verify_literal"
    return fn


class _MaximalSpans:
    """Merge a doc's verified window starts into maximal covered
    regions and emit (doc_id, span_start, span_end, n_tokens,
    span_text) — positions arrive sorted+deduped per doc from
    ``_fold_spans``; region breaks where the next start exceeds the
    previous start by more than n (coverage gap)."""

    def __init__(self, n: int):
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "span_start": pa.array([], pa.int64()),
                "span_end": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "span_text": pa.array([], pa.string()),
            }
        )
        if not batch.num_rows:
            return empty
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sp = batch["spans"]
        if isinstance(sp, pa.ChunkedArray):
            sp = sp.combine_chunks()
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        _, flat, L, _ = _ws_tokens(pc.cast(texts, pa.string()))
        bounds = np.concatenate(([0], np.cumsum(L)))
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
        n = self.n
        new_region = np.empty(len(starts), bool)
        new_region[0] = True
        new_region[1:] = (di[1:] != di[:-1]) | (
            starts[1:] > starts[:-1] + n
        )
        reg_first = np.flatnonzero(new_region)
        reg_last = np.concatenate((reg_first[1:] - 1, [len(starts) - 1]))
        rdoc = di[reg_first]
        rstart = starts[reg_first]
        rend = starts[reg_last] + n
        lens = rend - rstart
        gstart = bounds[rdoc] + rstart
        offs_out = np.concatenate(([0], np.cumsum(lens)))
        take = (
            np.arange(int(offs_out[-1]), dtype=np.int64)
            - np.repeat(offs_out[:-1], lens)
            + np.repeat(gstart, lens)
        )
        span_text = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(offs_out, pa.int32()), flat.take(pa.array(take))
            ),
            " ",
        )
        return pa.table(
            {
                "doc_id": pa.array(ids[rdoc]),
                "span_start": pa.array(rstart),
                "span_end": pa.array(rend),
                "n_tokens": pa.array(lens),
                "span_text": pc.cast(span_text, pa.string()),
            }
        )


def exact_dup_spans(
    ds: ray.data.Dataset,
    *,
    n: int = 8,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Maximal EXACTLY-duplicated token regions (Lee et al. ACL'22):
    one row (doc_id, span_start, span_end, n_tokens, span_text) per
    maximal region covered by n-token windows occurring in >= min_df
    distinct docs, literal-byte verified (hash collisions cannot leak
    into the output; see module comment for the exactness argument).

    Shape: hash candidate pass (same exchanges as
    scrub_duplicated_spans) -> co-partitioned docs scatter -> literal
    window re-emit (volume ~ actual duplication) -> byte-exact verify
    -> docs scatter -> vectorized maximal-region merge. Text crosses an
    exchange only as candidate windows. Both corpus-side "joins" ride
    ``_spans_scatter`` (Ray's JoinOperator raises on the sparse/EMPTY
    build side a dup-free corpus produces — found by feeding a
    unique-docs corpus)."""
    left = ds.select_columns([id_col, text_col])
    if id_col != "doc_id" or text_col != "text":
        left = left.rename_columns({id_col: "doc_id", text_col: "text"})
    num_parts = max(
        num_partitions, int(ray.cluster_resources().get("CPU", 8))
    )
    occ = left.map_batches(
        DupSpanOccurrences(n, "text", "doc_id"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cand = (
        occ.map_batches(_part_by("gram", num_parts), batch_format="pyarrow",
                        zero_copy_batch=True)
        .groupby("part", num_partitions=num_parts)
        .map_groups(_dup_occurrences(min_df), batch_format="pyarrow")
    )
    lit = _spans_scatter(
        left, cand, _WindowText(n, num_parts), num_parts, inner=True
    )
    verified = lit.groupby("part", num_partitions=num_parts).map_groups(
        _verify_literal(min_df), batch_format="pyarrow"
    )
    out = _spans_scatter(
        left, verified, _MaximalSpans(n), num_parts, inner=True
    )
    if id_col != "doc_id":
        out = out.rename_columns({"doc_id": id_col})
    return out


# ------------------------------------------------------ URL canonicalize
#
# Canonical-URL dedup — the first hygiene pass of a crawl pipeline:
# the same page is fetched under many URL spellings (tracking params,
# fragments, case, trailing slashes). The canonical KEY is derived with
# RE2 regexes that DuckDB evaluates identically (regexp_replace), so
# the op is SQL-oracle-checkable end to end.

_URL_RULES: tuple[tuple[str, str], ...] = (
    (r"#.*$", ""),                                 # fragment
    # tracking params, ANCHORED to a separator so 'xgclid=' is not a
    # tracking param; the separator is re-emitted and tidied below
    (r"([?&])(utm_[a-z]+|gclid|fbclid)=[^&#]*", r"\1"),
    (r"&&+", "&"),                                 # collapse '&&'
    (r"\?&", "?"),                                 # tidy '?&'
    (r"[?&]+$", ""),                               # dangling '?' / '&'
    (r"/\?", "?"),                                 # slash before query
    (r"/$", ""),                                   # trailing slash
)


def canonical_urls(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized canonical key: lowercase -> strip fragment -> strip
    tracking params -> tidy separators -> strip trailing slash.
    Lowercasing runs FIRST so case-variant tracking params
    ('UTM_SOURCE=') are stripped too. (Lowercasing the whole URL is
    the documented simplification: the key identifies duplicates; the
    original URL column keeps case.)"""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    out = pc.utf8_lower(urls)
    for pat, rep in _URL_RULES:
        out = pc.replace_substring_regex(out, pat, rep)
    return out


def url_dedup(
    ds: ray.data.Dataset, url_col: str = "url", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """One row per canonical URL: (doc_id = smallest id fetched under
    that key, canonical_url, dup_count). Shape: one vectorized map pass
    emitting (canonical key, id) — text/HTML never moves — then one
    hash AGGREGATE over the key (Min + Count with map-side combine; no
    per-key Python call)."""
    from ray.data.aggregate import Count, Min

    def keys(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "canonical_url": canonical_urls(batch[url_col]),
                "doc_id": batch[id_col],
            }
        )

    pairs = ds.map_batches(keys, batch_format="pyarrow", zero_copy_batch=True)
    agg = pairs.groupby("canonical_url").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Count(alias_name="dup_count"),
    )

    def order_cols(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "canonical_url": t["canonical_url"],
                "dup_count": t["dup_count"].cast(pa.int64()),
            }
        )

    return agg.map_batches(order_cols, batch_format="pyarrow")


# host extraction: scheme://HOST[/...] — RE2-safe, one pass
# (pc.extract_regex requires NAMED groups)
_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?P<host>[^/?#]+)"


def url_hosts(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Lowercased host per URL ('' when no scheme://host prefix)."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    low = pc.utf8_lower(urls)
    ex = pc.extract_regex(low, _HOST_RE)
    host = pc.struct_field(ex, "host")
    return pc.fill_null(host, "")


def filter_urls(
    ds: ray.data.Dataset,
    *,
    url_col: str = "url",
    blocked_hosts: list[str] | None = None,
    blocked_patterns: list[str] | None = None,
) -> ray.data.Dataset:
    """URL blocklist filter — the fetch-side curation gate (UT1/adult
    blocklists, spam hosts, tracker paths). Drops rows whose host is in
    ``blocked_hosts`` or whose URL contains any ``blocked_patterns``
    substring.

    Scale shape: the blocklist ships to workers ONCE as a broadcast
    object (``ray.put`` of the hashed host set — real lists are 10^6+
    entries); each batch probes membership with a vectorized
    searchsorted, and pattern checks are RE2 substring scans. Pure
    map-only: no shuffle, text never leaves its block."""
    from fdblucene_ray.ops.broadcast import cached_state
    from fdblucene_ray.ops.hashing import hash_strings

    hosts = sorted(set(blocked_hosts or []))
    host_hashes = np.sort(hash_strings(pa.array(hosts, pa.string())))
    hosts_ref = ray.put(host_hashes)
    patterns = list(blocked_patterns or [])

    def keep(batch: pa.Table) -> pa.Table:
        blocked = cached_state(
            ("url_blocklist", hosts_ref.hex()), lambda: ray.get(hosts_ref)
        )
        host = url_hosts(batch[url_col])
        hh = hash_strings(host)
        pos = np.searchsorted(blocked, hh)
        pos[pos == len(blocked)] = 0
        bad = (
            (blocked[pos] == hh)
            if len(blocked)
            else np.zeros(len(hh), bool)
        )
        low = pc.utf8_lower(
            batch[url_col].combine_chunks()
            if isinstance(batch[url_col], pa.ChunkedArray)
            else batch[url_col]
        )
        for pat in patterns:
            bad |= pc.match_substring(low, pat).to_numpy(
                zero_copy_only=False
            )
        return batch.filter(pa.array(~bad))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


# ASCIIFoldingFilter analog ----------------------------------------------

# pre-translate the common non-decomposable Latin letters the way
# Lucene's ASCIIFoldingFilter maps them (NFKD alone would DROP these)
_FOLD_SPECIALS = str.maketrans(
    {
        "ß": "ss", "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
        "ð": "d", "Ð": "D", "þ": "th", "Þ": "TH",
        "ø": "o", "Ø": "O", "đ": "d", "Đ": "D",
        "ł": "l", "Ł": "L",
    }
)


def fold_to_ascii(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Accent/diacritic folding (Lucene ASCIIFoldingFilter analog):
    á→a, ç→c, ß→ss ... . Vectorized trick: one NUL-joined mega-string
    per batch goes through C-level ``str.translate`` + NFKD + ASCII
    encode-ignore ONCE, then splits back — no per-row Python beyond the
    final split (NUL is normalization-invariant and cannot appear in
    valid text columns). Characters with no ASCII decomposition and no
    special-case mapping are dropped (DuckDB ``strip_accents`` keeps
    them — the SQL twin only plants decomposable accents)."""
    import unicodedata

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    vals = texts.to_pylist()
    big = "\x00".join(v if v is not None else "" for v in vals)
    big = big.translate(_FOLD_SPECIALS)
    big = unicodedata.normalize("NFKD", big)
    big = big.encode("ascii", "ignore").decode("ascii")
    out = big.split("\x00")
    return pa.array(out, pa.string())


def ascii_fold(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(doc_id, folded) per row — the normalization web pipelines run
    before cross-language exact dedup / URL slugging."""

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch[id_col],
                "folded": fold_to_ascii(batch[text_col]),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------- boilerplate stripping


def _sentence_rows(batch: pa.Table, *, text_col, id_col, group_col, sep):
    """Per-doc sentence units: (doc_id, group, ord, sent_hash) for every
    unit of every doc in the batch (hashes only — the text itself never
    leaves the map stage)."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    sents = pc.split_pattern(text, sep)
    offs = sents.offsets.to_numpy(zero_copy_only=False)
    per_row = np.diff(offs)
    row_idx = np.repeat(np.arange(len(batch)), per_row)
    flat = sents.flatten()
    h = hash_strings(flat)
    ord_ = np.arange(len(flat), dtype=np.int64) - np.repeat(
        offs[:-1].astype(np.int64), per_row
    )
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    ids = ids.to_numpy(zero_copy_only=False).astype(np.int64)
    grp = batch[group_col]
    if isinstance(grp, pa.ChunkedArray):
        grp = grp.combine_chunks()
    return ids, row_idx, ord_, h, grp


def strip_boilerplate(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    frac: float = 0.3,
    min_df: int = 2,
    sep: str = ".",
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Host-scoped boilerplate removal — the CCNet / RefinedWeb
    line-dedup stage: a sentence unit (text split on ``sep``) that
    appears in >= max(min_df, ceil(frac * n_docs(group))) DISTINCT docs
    of its group (host/source) is template boilerplate (nav bars,
    footers, cookie banners) and is removed from every doc of that
    group. Output: (doc_id, clean_text [kept units re-joined with
    ``sep``], n_removed [occurrences dropped]).

    Scale shape: stage 1 ships ONLY (group, sent_hash, doc_id) hash
    rows, exchanged on ``hash(group) % P`` so each group's frequency
    math is one vectorized run pass (df via unique-pair run arithmetic;
    per-group doc counts ride the same rows — no separate broadcast of
    an unbounded per-host count map). The frequent set that comes back
    is template-sized (units repeated across >= min_df docs). Stage 2
    re-streams the corpus map-only against the broadcast frequent set
    (sorted uint64 membership via searchsorted; for corpora where even
    the template set outgrows a broadcast, the same rows co-partition
    by group instead — documented alternative, same math)."""
    P = num_parts or max(16, int(ray.cluster_resources().get("CPU", 8)))

    def emit_hash_rows(batch: pa.Table) -> pa.Table:
        ids, row_idx, _, h, grp = _sentence_rows(
            batch, text_col=text_col, id_col=id_col,
            group_col=group_col, sep=sep,
        )
        gh = hash_strings(grp.cast(pa.string()))
        # distinct (doc, sent) within the batch (df counts docs once)
        key = combine(h, ids[row_idx].view(np.uint64))
        _, first = np.unique(key, return_index=True)
        gsel = gh[row_idx[first]]
        return pa.table(
            {
                "part": pa.array((gsel % np.uint64(P)).astype(np.int32)),
                "ghash": pa.array(gsel.view(np.int64)),
                "shash": pa.array(h[first].view(np.int64)),
                "doc_id": pa.array(ids[row_idx[first]]),
            }
        )

    def frequent_units(group: pa.Table) -> pa.Table:
        g = group["ghash"].to_numpy(zero_copy_only=False).view(np.uint64)
        s = group["shash"].to_numpy(zero_copy_only=False).view(np.uint64)
        d = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(g):
            return pa.table({"member": pa.array([], pa.int64())})
        # per-group doc counts: unique (group, doc) pairs per group run
        gd = combine(g, d.view(np.uint64))
        order = np.lexsort((gd, g))
        gs, gds = g[order], gd[order]
        new_g = np.concatenate(([True], gs[1:] != gs[:-1]))
        new_gd = np.concatenate(([True], gds[1:] != gds[:-1]))
        run_id = np.cumsum(new_g) - 1
        ndocs_run = np.bincount(run_id, weights=new_gd)
        thresh_run = np.maximum(min_df, np.ceil(frac * ndocs_run))
        # df per (group, sentence): rows are already (doc-)distinct
        gsk = combine(g, s)
        uk, inv, cnt = np.unique(gsk, return_inverse=True, return_counts=True)
        # map each unique (group, sent) key to its group's threshold
        ug = g[np.unique(gsk, return_index=True)[1]]
        # group run index for each unique key: position of its ghash
        ug_sorted = gs[new_g]
        run_of = np.searchsorted(ug_sorted, ug)
        keep = cnt >= thresh_run[run_of]
        member = combine(
            ug[keep], uk[keep]
        )  # (group, (group,sent)) composite membership token
        return pa.table({"member": pa.array(member.view(np.int64))})

    frequent_units.__name__ = "boilerplate_frequent_units"
    freq_rows = (
        ds.map_batches(
            emit_hash_rows, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("part", num_partitions=P)
        .map_groups(frequent_units, batch_format="pyarrow")
        .take_all()
    )
    members = np.sort(
        np.asarray([r["member"] for r in freq_rows], np.int64).view(
            np.uint64
        )
    )
    member_ref = ray.put(members)

    def scrub(batch: pa.Table) -> pa.Table:
        mem = ray.get(member_ref)
        ids, row_idx, _, h, grp = _sentence_rows(
            batch, text_col=text_col, id_col=id_col,
            group_col=group_col, sep=sep,
        )
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        sents = pc.split_pattern(text, sep)
        flat = sents.flatten()
        gh = hash_strings(grp.cast(pa.string()))[row_idx]
        tok = combine(gh, combine(gh, h))
        if len(mem):
            pos = np.minimum(np.searchsorted(mem, tok), len(mem) - 1)
            drop = mem[pos] == tok
        else:
            drop = np.zeros(len(tok), bool)
        keep = ~drop
        n_removed = np.bincount(
            row_idx[drop], minlength=len(batch)
        ).astype(np.int64)
        kept_flat = flat.filter(pa.array(keep))
        kept_rows = row_idx[keep]
        # rebuild per-doc text: join kept units with sep, in order
        kept_counts = np.bincount(kept_rows, minlength=len(batch))
        offsets = np.concatenate(([0], np.cumsum(kept_counts))).astype(
            np.int32
        )
        la = pa.ListArray.from_arrays(pa.array(offsets), kept_flat)
        clean = pc.binary_join(la.cast(pa.list_(pa.string())), sep)
        ids_col = batch[id_col]
        return pa.table(
            {
                "doc_id": ids_col,
                "clean_text": clean,
                "n_removed": pa.array(n_removed),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)
