"""Distributed BPE tokenizer training + application.

The scale-correct decomposition (the reference engine has no tokenizer
trainer; this extends the training-data surface the way ops/webtext.py
does): corpus-scale BPE training does NOT iterate over the corpus —
it iterates over the WORD HISTOGRAM, which is tiny relative to 100 TB
of text (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units", learns merges from a word->count dict).

- ``word_histogram``: one streaming pass — per-batch distinct
  (word, cnt) map-side partials -> ``groupby(word).sum`` -> top-V by
  (count desc, word asc). The only corpus-sized stage; the exchange
  carries combined partials, never one row per occurrence. The V cap
  is an explicit parameter and the dropped tail mass is reported in
  the table metadata (no-silent-caps).
- ``train_bpe``: classic greedy merge loop ON THE HISTOGRAM
  (driver-side; the histogram is a few MB at any corpus scale).
  Deterministic: best pair by (count desc, left asc, right asc).
- ``apply_bpe``: actor-pool ``map_batches`` stage; the merge ranks
  dict is actor state (built once in ``__init__``), and each DISTINCT
  word in a batch is encoded once through a cross-batch cache that
  persists for the actor's lifetime (how production fast-tokenizers
  amortize: word-level memoization), then per-row subword counts are
  scattered back vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from fdblucene_ray.ops.webtext import _ws_tokens

EOW = "</w>"  # end-of-word sentinel symbol (cannot occur in text)


class WordCountPartials:
    """Per-batch distinct (word, cnt) rows — map-side combine."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        _, flat, _, _ = _ws_tokens(batch[self.text_col])
        if not len(flat):
            return pa.table(
                {"word": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        import pyarrow.compute as pc

        vc = pc.value_counts(flat)
        return pa.table(
            {"word": vc.field("values"), "cnt": vc.field("counts")}
        )


def word_histogram(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    top_v: int = 100_000,
) -> pa.Table:
    """Corpus word histogram, top-``top_v`` by (count desc, word asc).
    Returns (word, cnt); the total token count and the kept-mass count
    are attached so callers can see what the cap dropped."""
    from ray.data.aggregate import Sum

    partial = ds.map_batches(
        WordCountPartials(text_col), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    agg = partial.groupby("word").aggregate(Sum("cnt", alias_name="cnt"))
    total = agg.sum("cnt")
    df = (
        agg.sort(["cnt", "word"], descending=[True, False])
        .limit(top_v)
        .to_pandas()
    )
    tbl = pa.table(
        {
            "word": pa.array(df["word"], pa.string()),
            "cnt": pa.array(df["cnt"].to_numpy(np.int64)),
        }
    )
    kept = int(df["cnt"].sum()) if len(df) else 0
    return tbl.replace_schema_metadata(
        {b"total_tokens": str(int(total or 0)).encode(),
         b"kept_tokens": str(kept).encode()}
    )


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (EOW,)


def train_bpe(
    histogram: pa.Table,
    n_merges: int,
) -> pa.Table:
    """Greedy BPE merge learning over a (word, cnt) histogram
    (Sennrich et al. 2016, algorithm 1). Deterministic tie-break:
    (pair count desc, left asc, right asc). Returns
    (rank, left, right) — ``rank`` is merge priority, 0 first.

    Driver-side by design: the histogram is small at any corpus scale,
    and each merge only touches the words containing the merged pair
    (indexed incrementally), so this is O(merges * affected words)."""
    words = histogram["word"].to_pylist()
    counts = histogram["cnt"].to_pylist()
    seqs: list[list[str]] = [list(_word_symbols(w)) for w in words]

    # pair -> total count, and pair -> set of word indexes containing it
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def _add_word_pairs(wi: int, sign: int):
        seq, c = seqs[wi], counts[wi]
        for a, b in zip(seq, seq[1:]):
            p = (a, b)
            pair_counts[p] = pair_counts.get(p, 0) + sign * c
            if sign > 0:
                pair_words.setdefault(p, set()).add(wi)

    for wi in range(len(seqs)):
        _add_word_pairs(wi, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best, best_key = None, None
        for p, c in pair_counts.items():
            if c <= 0:
                continue
            key = (-c, p[0], p[1])
            if best_key is None or key < best_key:
                best, best_key = p, key
        if best is None:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            seq = seqs[wi]
            if len(seq) < 2:
                continue
            _add_word_pairs(wi, -1)
            out, i = [], 0
            while i < len(seq):
                if (
                    i + 1 < len(seq)
                    and seq[i] == best[0]
                    and seq[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[wi] = out
            _add_word_pairs(wi, +1)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
        }
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with the learned merges: repeatedly apply the
    lowest-rank applicable merge (standard BPE inference order)."""
    seq = list(_word_symbols(word))
    while len(seq) > 1:
        best_i, best_r = -1, None
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


class ApplyBPE:
    """Actor-pool stage: (doc_id, text) -> (doc_id, n_words,
    n_subwords). The ranks dict is built once per actor; distinct
    words are encoded once and memoized across ALL batches the actor
    sees (the word-level cache that makes BPE application near-free on
    Zipfian text)."""

    def __init__(self, merges_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        merges = ray.get(merges_ref) if not isinstance(
            merges_ref, pa.Table
        ) else merges_ref
        self.ranks = {
            (l, r): k
            for k, l, r in zip(
                merges["rank"].to_pylist(),
                merges["left"].to_pylist(),
                merges["right"].to_pylist(),
            )
        }
        self.cache: dict[str, int] = {}
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        row_idx, flat, n_words, _ = _ws_tokens(batch[self.text_col])
        n_sub = np.zeros(batch.num_rows, np.int64)
        if len(flat):
            uniq, inv = np.unique(
                np.asarray(flat.to_pylist(), object), return_inverse=True
            )
            lens = np.empty(len(uniq), np.int64)
            for i, w in enumerate(uniq):  # distinct words only, memoized
                n = self.cache.get(w)
                if n is None:
                    n = len(encode_word(w, self.ranks))
                    self.cache[w] = n
                lens[i] = n
            np.add.at(n_sub, row_idx, lens[inv])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(n_words.astype(np.int64)),
                "n_subwords": pa.array(n_sub),
            }
        )


def apply_bpe(
    ds: ray.data.Dataset,
    merges: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: tuple[int, int] | int = (2, 8),
) -> ray.data.Dataset:
    """Tokenize the corpus with learned merges. The merges table ships
    once via ``ray.put`` (broadcast, not per-batch)."""
    ref = ray.put(merges)
    return ds.map_batches(
        ApplyBPE,
        fn_constructor_args=(ref, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
