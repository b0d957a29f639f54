"""Unigram language-model quality scoring — the CCNet-style "perplexity
filter" a web-corpus pipeline runs to rank documents by how typical
their text is of the corpus (or of a trusted reference corpus):

    1. train: corpus unigram counts (map-side partial counts →
       one groupby over the vocabulary → deterministic top-V model)
    2. score: every doc's mean negative-log-likelihood and OOV
       fraction under the broadcast model

Scale shape (100 TB):

- The count pass emits per-batch (term, partial count) rows — one row
  per UNIQUE term per batch (~100× smaller than the token stream), so
  the only wide exchange is a groupby over vocabulary-sized data.
- Model selection (top-V by count, ties broken by term) is a
  vocabulary-sized sort + limit, never a corpus pass.
- The model (V terms + counts + corpus total) is broadcast ONCE via
  ``ray.put``; the score pass is embarrassingly parallel: tokenize,
  one ``pc.index_in`` probe per batch, two bincounts. Text never
  shuffles in either pass.
- OOV smoothing: an out-of-model token scores as count 1 (probability
  1/T) — deterministic and exactly replayable in SQL.

Reference tie-in: the reference has no scoring layer beyond Lucene's
BM25 (SURVEY.md §2.6); this extends the corpus-statistics machinery
(A1-A3 numDocs/df/totals analogs, index/manifest.py field_totals) into
the training-data quality dimension the round brief asks for.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from fdblucene_ray.analysis.analyzer import BatchTokenizer


class _PartialCounts:
    """Per-batch map-side combine: (term, cnt) with one row per unique
    term in the batch."""

    def __init__(self, analyzer: str, text_col: str):
        self.tokenizer = BatchTokenizer(analyzer)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        _, codes, vocab = self.tokenizer.encoded_tokens(batch[self.text_col])
        cnt = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        keep = cnt > 0
        return pa.table(
            {
                "term": pa.array(np.asarray(vocab, dtype=object)[keep].tolist(),
                                 pa.string()),
                "cnt": pa.array(cnt[keep]),
            }
        )


def train_unigram_lm(
    ds: ray.data.Dataset,
    vocab_size: int = 1000,
    *,
    analyzer: str = "simple",
    text_col: str = "text",
) -> dict:
    """-> {"terms": sorted str array, "counts": aligned int64 array,
    "total": int corpus token count}. Model = the ``vocab_size`` most
    frequent terms (count desc, term asc tie-break); ``total`` counts
    ALL corpus tokens, in- or out-of-model."""
    partials = ds.map_batches(
        _partial_counts_batch,
        fn_kwargs=dict(analyzer=analyzer, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    vocab = partials.groupby("term").sum("cnt").materialize()
    total = int(vocab.sum("sum(cnt)"))
    top = vocab.sort(
        ["sum(cnt)", "term"], descending=[True, False]
    ).limit(vocab_size).take_all()
    terms = np.array([r["term"] for r in top], dtype=object)
    counts = np.array([r["sum(cnt)"] for r in top], dtype=np.int64)
    order = np.argsort(terms)
    return {"terms": terms[order], "counts": counts[order], "total": total}


class _ScoreDocs:
    """Broadcast-model scorer: mean NLL + OOV fraction per doc."""

    def __init__(self, model_ref, analyzer: str, text_col: str, id_col: str,
                 keep_cols: tuple = ()):
        self.keep_cols = tuple(keep_cols)
        m = ray.get(model_ref)
        self.terms = pa.array(m["terms"].tolist(), pa.string())
        self.total = float(m["total"])
        # per-model-term NLL; OOV scores as count 1 (add-one floor)
        self.nll = -np.log(m["counts"].astype(np.float64) / self.total)
        self.oov_nll = -np.log(1.0 / self.total)
        self.tokenizer = BatchTokenizer(analyzer)
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        row_idx, flat = self.tokenizer.flat_tokens(batch[self.text_col])
        idx = pc.index_in(flat, value_set=self.terms)
        oov = pc.is_null(idx).to_numpy(zero_copy_only=False)
        idx_f = idx.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        in_model = (
            self.nll[idx_f] if len(self.nll)
            else np.full(len(idx_f), self.oov_nll)
        )
        tok_nll = np.where(oov, self.oov_nll, in_model)
        n_tok = np.bincount(row_idx, minlength=n).astype(np.int64)
        sum_nll = np.bincount(row_idx, weights=tok_nll, minlength=n)
        n_oov = np.bincount(row_idx[oov], minlength=n).astype(np.int64)
        denom = np.maximum(n_tok, 1)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out = {
            "doc_id": pa.array(ids),
            "n_tokens": pa.array(n_tok),
            "mean_nll": pa.array(
                np.round(sum_nll / denom, 6).astype(np.float64)
            ),
            "oov_frac": pa.array(
                np.round(n_oov / denom, 6).astype(np.float64)
            ),
        }
        for c in self.keep_cols:
            out[c] = batch[c]
        return pa.table(out)


def _partial_counts_batch(batch, *, analyzer, text_col):
    """Task wrapper: per-worker cached _PartialCounts (tokenizer memo
    survives across batches/queries without an actor pool)."""
    from fdblucene_ray.ops.broadcast import cached_state

    st = cached_state(
        ("lm_partials", analyzer, text_col),
        lambda: _PartialCounts(analyzer, text_col),
    )
    return st(batch)


def _score_docs_batch(batch, *, model_ref, analyzer, text_col, id_col,
                      keep_cols=()):
    """Task wrapper: per-worker cached _ScoreDocs keyed by the broadcast
    model's ObjectRef (zero-copy plasma fetch once per worker)."""
    from fdblucene_ray.ops.broadcast import cached_state

    st = cached_state(
        ("lm_score", model_ref.hex(), analyzer, text_col, id_col,
         tuple(keep_cols)),
        lambda: _ScoreDocs(model_ref, analyzer, text_col, id_col,
                           keep_cols),
    )
    return st(batch)


def lm_score(
    ds: ray.data.Dataset,
    vocab_size: int = 1000,
    *,
    analyzer: str = "simple",
    text_col: str = "text",
    id_col: str = "doc_id",
    model: dict | None = None,
    keep_cols: tuple = (),
) -> ray.data.Dataset:
    """Score every doc under a corpus-trained (or supplied) unigram LM.
    -> Dataset of (doc_id, n_tokens, mean_nll, oov_frac[, keep_cols])."""
    if model is None:
        model = train_unigram_lm(
            ds, vocab_size, analyzer=analyzer, text_col=text_col
        )
    model_ref = ray.put(model)
    return ds.map_batches(
        _score_docs_batch,
        fn_kwargs=dict(
            model_ref=model_ref, analyzer=analyzer,
            text_col=text_col, id_col=id_col, keep_cols=tuple(keep_cols),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def ppl_buckets(
    ds: ray.data.Dataset,
    *,
    vocab_size: int = 200,
    k: int = 3,
    group_col: str = "source",
    analyzer: str = "simple",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): per
    group, rank docs by LM mean-NLL and split into ``k`` equal-size
    buckets (SQL ``ntile(k)`` semantics, ties doc_id asc) — CCNet's
    head/middle/tail split, the standard web-corpus quality
    stratification. Returns (group, bucket 1..k, n_docs, min_nll,
    max_nll) rows.

    Shape: LM scoring is the lm_score broadcast-model pass; bucketing
    is ONE hashed-partition exchange of the (group, id, nll) triples —
    every group lands whole in one partition, ranked there with a
    single lexsort + ntile run arithmetic (no per-group Python)."""
    import ray as _ray

    from fdblucene_ray.ops.hashing import hash_strings

    scored = lm_score(
        ds, vocab_size, analyzer=analyzer, text_col=text_col,
        id_col=id_col, keep_cols=(group_col,),
    )
    num_parts = max(16, int(_ray.cluster_resources().get("CPU", 8)))

    def add_part(t: pa.Table) -> pa.Table:
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        hp = hash_strings(g.cast(pa.string()))
        return pa.table(
            {
                group_col: g,
                "doc_id": t["doc_id"],
                "mean_nll": t["mean_nll"],
                "_part": pa.array(
                    (hp % np.uint64(num_parts)).astype(np.int32)
                ),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        gcol = group[group_col]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        denc = gcol.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        names = denc.dictionary.to_pylist()
        if not len(codes):
            return pa.table(
                {group_col: pa.array([], pa.string()),
                 "bucket": pa.array([], pa.int64()),
                 "n_docs": pa.array([], pa.int64()),
                 "min_nll": pa.array([], pa.float64()),
                 "max_nll": pa.array([], pa.float64())}
            )
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        nll = group["mean_nll"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, nll, codes))
        gc, nl = codes[order], nll[order]
        starts = np.flatnonzero(np.concatenate(([True], gc[1:] != gc[:-1])))
        runlen = np.diff(np.concatenate((starts, [len(gc)])))
        rank = np.arange(len(gc)) - np.repeat(starts, runlen)
        n = np.repeat(runlen, runlen)
        # ntile(k): first (n % k) buckets get ceil(n/k) rows
        small = n // k
        nbig = n % k
        big = small + 1
        cut = nbig * big
        bucket = np.where(
            rank < cut,
            rank // np.maximum(big, 1),
            nbig + (rank - cut) // np.maximum(small, 1),
        ) + 1  # 1-based like SQL ntile
        # aggregate per (group-run, bucket): contiguous because rows are
        # sorted by (group, nll, id) and bucket is monotone in rank
        key_change = np.concatenate(
            ([True], (gc[1:] != gc[:-1]) | (bucket[1:] != bucket[:-1]))
        )
        bs = np.flatnonzero(key_change)
        be = np.concatenate((bs[1:], [len(gc)]))
        return pa.table(
            {
                group_col: pa.array([names[c] for c in gc[bs]], pa.string()),
                "bucket": pa.array(bucket[bs].astype(np.int64)),
                "n_docs": pa.array((be - bs).astype(np.int64)),
                "min_nll": pa.array(nl[bs], pa.float64()),
                "max_nll": pa.array(nl[be - 1], pa.float64()),
            }
        )

    return (
        scored.map_batches(add_part, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("_part", num_partitions=num_parts)
        .map_groups(fold, batch_format="pyarrow")
    )


# ------------------------------------------------------------- bigram LM


class _BigramPartials:
    """Per-batch map-side combine of bigram counts: (w1, w2, cnt) rows,
    one per unique ADJACENT token pair in the batch (pairs never cross
    row boundaries). Two string columns (not a joined key) so the
    denominator c(w1 ·) can aggregate exactly — '_'-joined keys would
    be ambiguous for tokens that contain '_'."""

    def __init__(self, analyzer: str, text_col: str):
        self.tokenizer = BatchTokenizer(analyzer)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        row_idx, codes, vocab = self.tokenizer.encoded_tokens(
            batch[self.text_col]
        )
        if len(codes) < 2:
            return pa.table(
                {"w1": pa.array([], pa.string()),
                 "w2": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        adj = row_idx[1:] == row_idx[:-1]
        first, second = codes[:-1][adj], codes[1:][adj]
        V = max(1, len(vocab))
        pk = first * V + second
        uniq, cnt = np.unique(pk, return_counts=True)
        vv = np.asarray(vocab, dtype=object)
        return pa.table(
            {
                "w1": pa.array(vv[(uniq // V)].tolist(), pa.string()),
                "w2": pa.array(vv[(uniq % V)].tolist(), pa.string()),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )


def train_bigram_lm(
    ds: ray.data.Dataset,
    model_size: int = 1000,
    *,
    analyzer: str = "simple",
    text_col: str = "text",
) -> dict:
    """Bigram LM with OOV floor: model = the ``model_size`` most
    frequent bigrams (count desc, (w1, w2) asc ties); per-first-word
    denominators c(w1 ·) and the corpus bigram total T come from the
    FULL distributed aggregate (exact, not model-truncated), so
    P(w2|w1) = c12 / c(w1 ·) for in-model bigrams and 1/T for the rest.

    Shape: one tokenize pass with per-batch unique-pair combine, one
    groupby over the (vocabulary²-bounded, Zipf-small in practice)
    bigram table; the denominators aggregate from the SAME table. Only
    the model (M rows) and the model-first-word denominators ship to
    the driver / broadcast."""
    partials = ds.map_batches(
        _bigram_partials_batch,
        fn_kwargs=dict(analyzer=analyzer, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    agg = partials.groupby(["w1", "w2"]).sum("cnt").materialize()
    total = int(agg.sum("sum(cnt)"))
    top = agg.sort(
        ["sum(cnt)", "w1", "w2"], descending=[True, False, False]
    ).limit(model_size).take_all()
    # denominators ONLY for first-words appearing in the model (tiny)
    firsts = sorted({r["w1"] for r in top})
    fset = pa.array(firsts, pa.string())

    def first_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        m = _pc.is_in(t["w1"], value_set=fset)
        sub = t.filter(m)
        return pa.table({"w1": sub["w1"], "c": sub["sum(cnt)"]})

    dens = (
        agg.map_batches(first_partial, batch_format="pyarrow")
        .groupby("w1")
        .sum("c")
        .take_all()
    )
    c1dot = {r["w1"]: int(r["sum(c)"]) for r in dens}
    w1 = np.asarray([r["w1"] for r in top], dtype=object)
    w2 = np.asarray([r["w2"] for r in top], dtype=object)
    c12 = np.asarray([int(r["sum(cnt)"]) for r in top], np.int64)
    return {
        "w1": w1, "w2": w2, "c12": c12,
        "c1dot": np.asarray([c1dot[x] for x in w1], np.int64),
        "total": total,
    }


def _bigram_partials_batch(batch, *, analyzer, text_col):
    from fdblucene_ray.ops.broadcast import cached_state

    st = cached_state(
        ("lm2_partials", analyzer, text_col),
        lambda: _BigramPartials(analyzer, text_col),
    )
    return st(batch)


class _ScoreBigrams:
    """Broadcast-bigram-model scorer: per-doc mean bigram NLL + OOV
    (out-of-model) bigram fraction. Exact model probe: both words map
    into the model's word dictionaries, the pair key searchsorts into
    the sorted packed key array — no hash-collision channel, so the SQL
    twin replays bit-for-bit."""

    def __init__(self, model_ref, analyzer, text_col, id_col):
        m = ray.get(model_ref)
        words = sorted({*m["w1"].tolist(), *m["w2"].tolist()})
        self.words = pa.array(words, pa.string())
        widx = {w: i for i, w in enumerate(words)}
        W = max(1, len(words))
        key = np.array(
            [widx[a] * W + widx[b] for a, b in zip(m["w1"], m["w2"])],
            np.int64,
        )
        order = np.argsort(key)
        self.keys = key[order]
        with np.errstate(divide="ignore"):
            self.nll = -np.log(
                m["c12"].astype(np.float64) / m["c1dot"].astype(np.float64)
            )[order]
        self.W = W
        self.oov_nll = -np.log(1.0 / float(m["total"]))
        self.tokenizer = BatchTokenizer(analyzer)
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        row_idx, codes, vocab = self.tokenizer.encoded_tokens(
            batch[self.text_col]
        )
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        vmap = pc.index_in(
            pa.array(vocab, pa.string()), value_set=self.words
        ).fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        wi = vmap[codes] if len(codes) else np.empty(0, np.int64)
        if len(codes) >= 2:
            adj = row_idx[1:] == row_idx[:-1]
            a, b = wi[:-1][adj], wi[1:][adj]
            prow = row_idx[:-1][adj]
        else:
            a = b = np.empty(0, np.int64)
            prow = np.empty(0, np.int64)
        known = (a >= 0) & (b >= 0)
        key = a * self.W + b
        pos = np.searchsorted(self.keys, key)
        pos[pos == len(self.keys)] = 0
        inm = known & (
            (self.keys[pos] == key) if len(self.keys) else False
        )
        nll = np.where(inm, self.nll[np.clip(pos, 0, max(len(self.keys) - 1, 0))],
                       self.oov_nll)
        n_bg = np.bincount(prow, minlength=n).astype(np.int64)
        sum_nll = np.bincount(prow, weights=nll, minlength=n)
        n_oov = np.bincount(prow[~inm], minlength=n).astype(np.int64)
        denom = np.maximum(n_bg, 1)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_bigrams": pa.array(n_bg),
                "mean_nll": pa.array(
                    np.round(sum_nll / denom, 6).astype(np.float64)
                ),
                "oov_frac": pa.array(
                    np.round(n_oov / denom, 6).astype(np.float64)
                ),
            }
        )


def _score_bigrams_batch(batch, *, model_ref, analyzer, text_col, id_col):
    from fdblucene_ray.ops.broadcast import cached_state

    st = cached_state(
        ("lm2_score", model_ref.hex(), analyzer, text_col, id_col),
        lambda: _ScoreBigrams(model_ref, analyzer, text_col, id_col),
    )
    return st(batch)


def lm_score_bigram(
    ds: ray.data.Dataset,
    model_size: int = 1000,
    *,
    analyzer: str = "simple",
    text_col: str = "text",
    id_col: str = "doc_id",
    model: dict | None = None,
) -> ray.data.Dataset:
    """Bigram-LM scoring (one step toward CCNet's KenLM 5-gram filter):
    -> Dataset of (doc_id, n_bigrams, mean_nll, oov_frac)."""
    if model is None:
        model = train_bigram_lm(
            ds, model_size, analyzer=analyzer, text_col=text_col
        )
    model_ref = ray.put(model)
    return ds.map_batches(
        _score_bigrams_batch,
        fn_kwargs=dict(
            model_ref=model_ref, analyzer=analyzer,
            text_col=text_col, id_col=id_col,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
