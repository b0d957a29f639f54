"""Sentence-level curation: vectorized sentence segmentation and the
C4 three-sentence-span global dedup (Raffel et al. 2020, arXiv
1910.10683 §2.2: "we discard all but one of any three-sentence span
occurring more than once in the data set").

Segmentation rule (deterministic, SQL-mirrorable): a sentence ends
after every maximal run of ``[.!?]``; the trailing remainder without
terminal punctuation is a sentence too. Each sentence is trimmed of
RE2-``\\s`` whitespace (`` \\t\\n\\f\\r`` — NOT ``\\x0b``) and empties
drop. This is byte-exact with the DuckDB oracle's
``regexp_extract_all(text, '[\\s\\S]*?[.!?]+|[^.!?]+$')`` +
``regexp_replace(x, '^\\s+|\\s+$', '', 'g')`` (property-tested in
``tests/test_sentences.py``), so the whole pipeline is SQL-oracled
end-to-end including the cleaned text.

Pipeline shape (same three-small-shuffles skeleton as
``webtext.scrub_duplicated_spans`` — Lee et al.'s token-window scrub):

  1. map_batches: (span_hash, doc_id, pos) per 3-sentence span
     [24 B rows — sentence TEXT never enters the exchange]
  2. groupby(hash(span)%P): keep-first by (doc_id, pos); every other
     occurrence emits its covered sentence ordinals
  3. webtext._spans_scatter: corpus + removal ordinals co-partitioned
     on ONE hash(doc_id)%P exchange; the per-partition kernel folds
     the ordinals (``webtext._fold_spans``), aligns them to the docs,
     and the scrub stage re-joins kept sentences vectorized

At 100 TB the removal table is proportional to actual duplication and
the final join co-partitions corpus and removals by doc_id. Reference
analog: none (the reference indexes text; this is the curation layer
the corpus passes through first) — C4's own implementation hashes
spans exactly as done here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from fdblucene_ray.analysis.trigram import _string_buffers
from fdblucene_ray.ops.hashing import combine, hash_strings
from fdblucene_ray.ops.webtext import (
    _SEED,
    _part_by,
    _spans_scatter,
)

# RE2 \s (the oracle's trim class): space, tab, newline, formfeed,
# carriage return — vertical tab \x0b is NOT in RE2 \s.
_TRIM = " \t\n\f\r"

_PUNCT = np.zeros(256, bool)
_PUNCT[[ord("."), ord("!"), ord("?")]] = True


def _sentence_rows(text):
    """Segment a string column into trimmed non-empty sentences.

    Returns ``(row_of_sent int64[ns], sents StringArray[ns],
    counts int64[nrows])``. Fully vectorized: one boolean pass over the
    batch's raw UTF-8 bytes finds the ``[.!?]``-run ends (safe on
    UTF-8 — continuation bytes are >= 0x80 and never match ASCII
    punctuation), one gather builds the flat sentence buffer.
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    if text.null_count:
        text = pc.fill_null(text, "")
    n = len(text)
    off, data = _string_buffers(text)
    lo = int(off[0])
    seg = data[lo : int(off[-1])]
    offs = (off - lo).astype(np.int64)
    empty_sents = pa.array([], pa.string())
    if not len(seg):
        return (
            np.empty(0, np.int64),
            empty_sents,
            np.zeros(n, np.int64),
        )
    punct = _PUNCT[seg]
    run_end = punct.copy()
    run_end[:-1] &= ~punct[1:]
    # a punct at a row's FINAL byte always ends its run — the global
    # successor test above would otherwise let a run leak into a next
    # row that happens to start with punctuation
    nonempty = offs[1:] > offs[:-1]
    row_last = offs[1:][nonempty] - 1
    run_end[row_last] = punct[row_last]
    bpos = np.flatnonzero(run_end).astype(np.int64) + 1
    row_ends = offs[1:][nonempty]
    # row-end boundaries are added unconditionally; drop punct-run
    # boundaries that coincide with one
    j = np.searchsorted(row_ends, bpos)
    j_c = np.minimum(j, len(row_ends) - 1)
    bpos = bpos[~((j < len(row_ends)) & (row_ends[j_c] == bpos))]
    bounds = np.sort(np.concatenate((bpos, row_ends)))
    row_of_b = np.searchsorted(offs[1:], bounds, side="left").astype(np.int64)
    prev_b = np.concatenate(([np.int64(-1)], bounds[:-1]))
    prev_row = np.concatenate(([np.int64(-1)], row_of_b[:-1]))
    starts = np.where(prev_row == row_of_b, prev_b, offs[:-1][row_of_b])
    lens = bounds - starts
    out_off = np.concatenate(([0], np.cumsum(lens)))
    gather = (
        np.arange(out_off[-1], dtype=np.int64)
        - np.repeat(out_off[:-1], lens)
        + np.repeat(starts, lens)
    )
    values = seg[gather]
    if out_off[-1] <= np.iinfo(np.int32).max:
        sents = pa.Array.from_buffers(
            pa.string(),
            len(bounds),
            [None, pa.py_buffer(out_off.astype(np.int32).tobytes()),
             pa.py_buffer(values.tobytes())],
        )
    else:
        sents = pa.Array.from_buffers(
            pa.large_string(),
            len(bounds),
            [None, pa.py_buffer(out_off.tobytes()),
             pa.py_buffer(values.tobytes())],
        ).cast(pa.string())
    sents = pc.utf8_trim(sents, _TRIM)
    keep = pc.not_equal(sents, "").to_numpy(zero_copy_only=False)
    if not keep.all():
        sents = sents.filter(pa.array(keep))
        row_of_b = row_of_b[keep]
    counts = np.bincount(row_of_b, minlength=n).astype(np.int64)
    return row_of_b, sents, counts


def split_sentences(text) -> pa.ListArray:
    """Sentence list column (trimmed, empties dropped) — the reusable
    segmentation entry point; list layout mirrors the oracle's
    ``list_filter(list_transform(regexp_extract_all(...)))``."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    _, sents, counts = _sentence_rows(text)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    return pa.ListArray.from_arrays(pa.array(offsets), sents)


class SentenceSpanRows:
    """Stage 1: one (gram=span hash, doc_id, pos) row per ``n``
    consecutive-sentence span. The span hash is an order-sensitive fold
    of per-sentence content hashes — a 64-bit stand-in for the literal
    3-sentence key the oracle groups on (collision odds ~m^2/2^65)."""

    def __init__(self, n: int = 3, text_col="text", id_col="doc_id"):
        self.n = n
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        rows, sents, counts = _sentence_rows(batch[self.text_col])
        empty = pa.table(
            {"gram": pa.array([], pa.int64()),
             "doc_id": pa.array([], pa.int64()),
             "pos": pa.array([], pa.int64())}
        )
        sh = hash_strings(sents)
        total, n = len(sh), self.n
        if total < n:
            return empty
        m = total - n + 1
        h = np.full(m, _SEED, np.uint64)
        for j in range(n):
            h = combine(h, sh[j : j + m])
        ok = rows[:m] == rows[n - 1 :]
        if not ok.any():
            return empty
        starts = np.concatenate(([0], np.cumsum(counts[:-1])))
        ordinal = np.arange(total, dtype=np.int64) - starts[rows]
        return pa.table(
            {
                "gram": pa.array(h[ok].view(np.int64)),
                "doc_id": pa.array(ids[rows[:m][ok]].astype(np.int64)),
                "pos": pa.array(ordinal[:m][ok]),
            }
        )


def _span_removals(n: int):
    """Per hash(gram)%P partition: keep the FIRST occurrence of each
    duplicated span (min (doc_id, pos) — C4 keeps one), every other
    occurrence emits its ``n`` covered sentence ordinals. One lexsort
    finds the span runs; no per-key Python."""

    def fn(group: pa.Table) -> pa.Table:
        g = group["gram"].to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        p = group["pos"].to_numpy(zero_copy_only=False)
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "pos": pa.array([], pa.int64())}
        )
        if not len(g):
            return empty
        order = np.lexsort((p, d, g))
        gs, ds_, ps = g[order], d[order], p[order]
        head = np.empty(len(gs), bool)
        head[0] = True
        head[1:] = gs[1:] != gs[:-1]
        gid = np.cumsum(head) - 1
        cnt = np.bincount(gid)
        removal = (cnt[gid] >= 2) & ~head
        if not removal.any():
            return empty
        rd, rp = ds_[removal], ps[removal]
        # expand each removed span to its n covered sentence ordinals;
        # _fold_spans dedups overlaps per doc downstream
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(rd, n)),
                "pos": pa.array(
                    np.repeat(rp, n)
                    + np.tile(np.arange(n, dtype=np.int64), len(rp))
                ),
            }
        )

    fn.__name__ = "_span_removals"
    return fn


class C4SentenceScrub:
    """Final stage after the left-outer removals join: re-segment (the
    segmentation is deterministic and cheaper than shipping sentence
    text through two exchanges), drop removed ordinals, re-join kept
    sentences with single spaces. Every doc's clean_text is the
    sentence re-join (matching the oracle's ``string_agg(sent, ' ')``),
    so untouched docs are whitespace-normalized, not byte-identical."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        rows, sents, counts = _sentence_rows(texts)
        starts = np.concatenate(([0], np.cumsum(counts[:-1])))
        total = len(rows)
        remove = np.zeros(total, bool)
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        has = pc.and_kleene(
            spans.is_valid(), pc.greater(pc.binary_length(spans), 0)
        ).to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(has)
        if len(idx):
            sp = spans.take(pa.array(idx))
            soff, sdata = _string_buffers(sp)
            pos_all = np.frombuffer(
                sdata[int(soff[0]) : int(soff[-1])].tobytes(), "<i8"
            )
            per = (np.diff(soff) // 8).astype(np.int64)
            srow = np.repeat(idx, per)
            ok = pos_all < counts[srow]
            flat_idx = starts[srow[ok]] + pos_all[ok]
            remove[flat_idx] = True
        kept = ~remove
        new_counts = np.bincount(rows[kept], minlength=n_rows)
        new_off = np.concatenate(
            ([0], np.cumsum(new_counts))
        ).astype(np.int32)
        clean = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(new_off), sents.filter(pa.array(kept))
            ),
            " ",
        )
        n_removed = np.bincount(rows[remove], minlength=n_rows)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_sentences": pa.array(counts),
                "n_removed": pa.array(n_removed.astype(np.int64)),
                "clean_text": clean,
            }
        )


def c4_sentence_dedup(
    ds: ray.data.Dataset,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """C4 three-sentence-span global dedup: any ``n``-sentence span
    occurring more than once in the corpus keeps its first occurrence
    (by (doc_id, pos)) and is removed everywhere else. Returns
    (id_col, n_sentences, n_removed, clean_text)."""
    left = ds.select_columns([id_col, text_col])
    if id_col != "doc_id" or text_col != "text":
        left = left.rename_columns({id_col: "doc_id", text_col: "text"})
    occ = left.map_batches(
        SentenceSpanRows(n, "text", "doc_id"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    num_parts = max(
        num_partitions, int(ray.cluster_resources().get("CPU", 8))
    )
    removals = (
        occ.map_batches(_part_by("gram", num_parts), batch_format="pyarrow",
                        zero_copy_batch=True)
        .groupby("part", num_partitions=num_parts)
        .map_groups(_span_removals(n), batch_format="pyarrow")
    )
    # corpus + removal ordinals co-partitioned on ONE hash(doc_id)%P
    # exchange (webtext._spans_scatter — Ray's JoinOperator rejects the
    # sparse/empty right side a dup-free corpus produces); fold + align
    # + scrub run per partition
    out = _spans_scatter(
        left, removals, C4SentenceScrub("text", "doc_id"), num_parts,
        inner=False,
    )
    if id_col != "doc_id":
        out = out.rename_columns({"doc_id": id_col})
    return out
