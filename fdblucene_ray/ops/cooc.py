"""Windowed co-occurrence counts + PMI — the corpus-statistics scan
behind word-embedding training data, collocation mining, and phrase
table induction: count unordered token pairs within a ±window, then
rank the top-K pairs by count with their pointwise mutual information

    pmi(a,b) = ln( (c_ab / N_pairs) / ((c_a / N_tok) * (c_b / N_tok)) )

Scale shape (100 TB):

- ONE vectorized ``map_batches`` pass tokenizes and emits BOTH kinds of
  partial counts as unified (l, r, cnt) rows — pair rows, and unigram
  rows marked with the impossible token ``r = ''`` (the analyzer never
  emits an empty token). Per-batch ``np.unique`` combine first, so the
  exchange carries one row per unique pair per batch, not one per
  window position; text never shuffles.
- ONE groupby over (l, r) sums the partials; totals, the top-K pair
  selection (count desc, pair asc — deterministic), and the ≤2K
  marginal lookups are all vocabulary-sized follow-ups, never corpus
  passes.
- Pair normalization is lexicographic on the ANALYZED string (so the
  SQL twin's least()/greatest() reproduces it exactly).

Reference tie-in: the same posting-style partial/combine shape as the
index build's term stats (index/build.py TokenizeToPostings; A2 df/ttf
analogs in SURVEY.md §2.6) pointed at pair keys instead of terms.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from fdblucene_ray.analysis.analyzer import BatchTokenizer


class _PairPartials:
    """Per-batch (l, r, cnt) partials: token pairs within ``window``
    (unordered, string-lexicographic normalization) plus unigram rows
    flagged by r=''."""

    def __init__(self, analyzer: str, window: int, text_col: str):
        self.tokenizer = BatchTokenizer(analyzer)
        self.window = window
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        row_idx, codes, vocab = self.tokenizer.encoded_tokens(
            batch[self.text_col]
        )
        vocab_np = np.asarray(vocab, dtype=object)
        V = max(1, len(vocab_np))

        ls, rs = [], []
        for d in range(1, self.window + 1):
            if d >= len(codes):
                break
            same = row_idx[:-d] == row_idx[d:]
            ls.append(codes[:-d][same])
            rs.append(codes[d:][same])
        out_l, out_r, out_c = [], [], []
        if ls:
            l = np.concatenate(ls)
            r = np.concatenate(rs)
            # unordered pair: lexicographic order of the analyzed strings
            swap = vocab_np[l] > vocab_np[r]
            lo = np.where(swap, r, l)
            hi = np.where(swap, l, r)
            key, cnt = np.unique(lo.astype(np.int64) * V + hi,
                                 return_counts=True)
            out_l.append(vocab_np[(key // V)])
            out_r.append(vocab_np[(key % V)])
            out_c.append(cnt.astype(np.int64))
        if len(codes):
            ucnt = np.bincount(codes, minlength=len(vocab_np)).astype(np.int64)
            keep = ucnt > 0
            out_l.append(vocab_np[keep])
            out_r.append(np.full(int(keep.sum()), "", dtype=object))
            out_c.append(ucnt[keep])
        if not out_c:
            return pa.table(
                {"l": pa.array([], pa.string()),
                 "r": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "l": pa.array(np.concatenate(out_l).tolist(), pa.string()),
                "r": pa.array(np.concatenate(out_r).tolist(), pa.string()),
                "cnt": pa.array(np.concatenate(out_c)),
            }
        )



def _pair_partials_batch(batch, *, analyzer, window, text_col):
    """Task wrapper: per-worker cached _PairPartials."""
    from fdblucene_ray.ops.broadcast import cached_state

    st = cached_state(
        ("pair_partials", analyzer, window, text_col),
        lambda: _PairPartials(analyzer, window, text_col),
    )
    return st(batch)


def _totals(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    if len(batch):
        is_uni = pc.equal(batch["r"], "").to_numpy(zero_copy_only=False)
        cnt = batch["sum(cnt)"].to_numpy(zero_copy_only=False)
    else:
        is_uni = np.zeros(0, bool)
        cnt = np.zeros(0, np.int64)
    return pa.table(
        {
            "n_tok": pa.array([int(cnt[is_uni].sum())]),
            "n_pair": pa.array([int(cnt[~is_uni].sum())]),
        }
    )


def cooccurrence_pmi(
    ds: ray.data.Dataset,
    window: int = 5,
    top_k: int = 50,
    *,
    analyzer: str = "simple",
    text_col: str = "text",
) -> pa.Table:
    """Top-``top_k`` co-occurring pairs (count desc, pair asc) with
    PMI. Returns a small driver-side Arrow table
    (left, right, cnt, pmi)."""
    import pyarrow.compute as pc

    partials = ds.map_batches(
        _pair_partials_batch,
        fn_kwargs=dict(
            analyzer=analyzer, window=window, text_col=text_col
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    agg = partials.groupby(["l", "r"]).sum("cnt").materialize()

    tot = agg.map_batches(_totals, batch_format="pyarrow")
    n_tok = float(tot.sum("n_tok"))
    n_pair = float(tot.sum("n_pair"))

    def _pairs_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.not_equal(b["r"], ""))

    top = (
        agg.map_batches(_pairs_only, batch_format="pyarrow")
        .sort(["sum(cnt)", "l", "r"], descending=[True, False, False])
        .limit(top_k)
        .take_all()
    )
    needed = sorted({row["l"] for row in top} | {row["r"] for row in top})
    needed_arr = pa.array(needed, pa.string())

    def _marginals(b: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(b["r"], ""),
                       pc.is_in(b["l"], value_set=needed_arr))
        return b.filter(mask)

    uni = {
        row["l"]: row["sum(cnt)"]
        for row in agg.map_batches(_marginals, batch_format="pyarrow")
        .take_all()
    }
    left = [row["l"] for row in top]
    right = [row["r"] for row in top]
    cnt = np.array([row["sum(cnt)"] for row in top], dtype=np.int64)
    ca = np.array([uni[t] for t in left], dtype=np.float64)
    cb = np.array([uni[t] for t in right], dtype=np.float64)
    with np.errstate(divide="ignore"):
        pmi = np.log((cnt / n_pair) / ((ca / n_tok) * (cb / n_tok)))
    return pa.table(
        {
            "left": pa.array(left, pa.string()),
            "right": pa.array(right, pa.string()),
            "cnt": pa.array(cnt),
            "pmi": pa.array(np.round(pmi, 6).astype(np.float64)),
        }
    )
