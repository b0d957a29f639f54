"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All vectorized map_batches stages over Arrow.

Every numeric output that feeds the DuckDB correctness oracle is
rounded to 6 dp at the edge (both sides round identically, absorbing
any last-ulp float divergence between numpy and DuckDB).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from fdblucene_ray.analysis.analyzer import BatchTokenizer
from fdblucene_ray.analysis.stopwords import ENGLISH_STOPWORDS
from fdblucene_ray.ops.hashing import combine, hash_strings, round_half_away

# deterministic marker-word lists; the SQL oracle embeds the same lists
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "fr": ("le", "la", "les", "et", "est", "une", "que", "pour"),
}
LANG_PRIORITY = ("en", "de", "fr")  # tie-break order (argmax, first wins)


class LangId:
    """Marker-stopword-count language heuristic (n-gram-free variant so
    the rule is exactly replicable in ANSI SQL for the oracle)."""

    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.tokenizer = BatchTokenizer("simple")
        self.sets = {
            lang: pa.array(sorted(words)) for lang, words in LANG_MARKERS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        row_idx, flat = self.tokenizer.flat_tokens(batch[self.text_col])
        counts = {}
        for lang in LANG_PRIORITY:
            isin = pc.is_in(flat, value_set=self.sets[lang]).to_numpy(
                zero_copy_only=False
            )
            counts[lang] = np.bincount(row_idx[isin], minlength=n)
        stacked = np.stack([counts[lang] for lang in LANG_PRIORITY])  # (3, n)
        best = np.argmax(stacked, axis=0)  # first max wins == priority order
        pred = np.array(LANG_PRIORITY, dtype=object)[best]
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "pred_lang": pa.array(pred.tolist(), pa.string()),
                **{
                    f"n_{lang}": pa.array(counts[lang].astype(np.int64))
                    for lang in LANG_PRIORITY
                },
            }
        )


def lang_id(ds: ray.data.Dataset, text_col="text", id_col="doc_id") -> ray.data.Dataset:
    return ds.map_batches(LangId(text_col, id_col), batch_format="pyarrow")


class QualityScore:
    """Per-doc quality features: token count, stopword ratio, punctuation
    ratio, mean token length — the standard cheap web-text filters."""

    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.tokenizer = BatchTokenizer("simple")
        self.stop_arr = pa.array(sorted(ENGLISH_STOPWORDS))

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        text = batch[self.text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        row_idx, flat = self.tokenizer.flat_tokens(text)
        n_tokens = np.bincount(row_idx, minlength=n).astype(np.int64)
        is_stop = pc.is_in(flat, value_set=self.stop_arr).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(row_idx[is_stop], minlength=n).astype(np.int64)
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        sum_tok_len = np.zeros(n, np.int64)
        np.add.at(sum_tok_len, row_idx, tok_len)
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        n_punct = (
            pc.utf8_length(
                pc.replace_substring_regex(text, "[0-9A-Za-z_ ]", "")
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        safe_tokens = np.maximum(n_tokens, 1)
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "n_tokens": pa.array(n_tokens),
                "stop_ratio": pa.array(round_half_away(n_stop / safe_tokens, 6)),
                "punct_ratio": pa.array(
                    round_half_away(n_punct / np.maximum(n_chars, 1), 6)
                ),
                "mean_token_len": pa.array(round_half_away(sum_tok_len / safe_tokens, 6)),
            }
        )


def quality_scores(ds, text_col="text", id_col="doc_id") -> ray.data.Dataset:
    return ds.map_batches(QualityScore(text_col, id_col), batch_format="pyarrow")


class GopherRules:
    """Gopher quality-filter rules (Rae et al. 2021, arXiv:2112.11446
    Appendix A1.1), vectorized: per doc the rule metrics and the final
    keep verdict. Words are non-empty whitespace tokens (the SQL
    oracle's regexp_split + ``<> ''``); lines split on ``\\n``.

    Rules (Gopher defaults, all parameters overridable):
      1. 50 <= word count <= 100000
      2. 3 <= mean word length <= 10
      3. symbol-to-word ratio (# and non-overlapping ...) <= 0.1
      4. fraction of lines starting with a bullet (-, *, •) <= 0.9
      5. fraction of lines ending with ... <= 0.3
      6. fraction of words with >= 1 alphabetic char >= 0.8
      7. >= 2 distinct members of the required-stopword set present
         {the, be, to, of, and, that, have, with}
    """

    REQUIRED_STOPS = ("and", "be", "have", "of", "that", "the", "to", "with")

    def __init__(self, text_col="text", id_col="doc_id", *,
                 min_words=50, max_words=100_000,
                 min_mean_len=3.0, max_mean_len=10.0,
                 max_symbol_ratio=0.1, max_bullet_frac=0.9,
                 max_ellipsis_frac=0.3, min_alpha_frac=0.8,
                 min_req_stops=2):
        self.text_col, self.id_col = text_col, id_col
        self.min_words, self.max_words = min_words, max_words
        self.min_mean_len, self.max_mean_len = min_mean_len, max_mean_len
        self.max_symbol_ratio = max_symbol_ratio
        self.max_bullet_frac = max_bullet_frac
        self.max_ellipsis_frac = max_ellipsis_frac
        self.min_alpha_frac = min_alpha_frac
        self.min_req_stops = min_req_stops
        self.req = np.array(self.REQUIRED_STOPS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from fdblucene_ray.ops.webtext import _ws_tokens

        n = len(batch)
        text = batch[self.text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        row_idx, flat, n_words, _ = _ws_tokens(text)
        safe_w = np.maximum(n_words, 1)
        # rule 2: mean word length
        wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        sum_len = np.zeros(n, np.int64)
        np.add.at(sum_len, row_idx, wlen)
        mean_len = sum_len / safe_w
        # rule 3: symbols (# chars + non-overlapping '...')
        n_hash = pc.count_substring(text, "#").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_ell = pc.count_substring(text, "...").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        symbol_ratio = (n_hash + n_ell) / safe_w
        # rules 4+5: line fractions
        lines = pc.split_pattern(text, "\n")
        per_row_lines = np.diff(lines.offsets.to_numpy(zero_copy_only=False))
        lflat = lines.flatten()
        lrow = np.repeat(np.arange(n, dtype=np.int64), per_row_lines)
        bullet = pc.or_(
            pc.or_(
                pc.starts_with(lflat, "-"), pc.starts_with(lflat, "*")
            ),
            pc.starts_with(lflat, "•"),
        ).to_numpy(zero_copy_only=False)
        ell_end = pc.ends_with(lflat, "...").to_numpy(zero_copy_only=False)
        safe_l = np.maximum(per_row_lines, 1)
        bullet_frac = np.bincount(lrow[bullet], minlength=n) / safe_l
        ellipsis_frac = np.bincount(lrow[ell_end], minlength=n) / safe_l
        # rule 6: words with at least one alphabetic char
        has_alpha = pc.match_substring_regex(flat, "[A-Za-z]").to_numpy(
            zero_copy_only=False
        )
        alpha_frac = np.bincount(row_idx[has_alpha], minlength=n) / safe_w
        # rule 7: distinct required stopwords present
        low = pc.utf8_lower(flat)
        pos = np.searchsorted(self.req, low.to_numpy(zero_copy_only=False))
        pos_c = np.minimum(pos, len(self.req) - 1)
        is_req = self.req[pos_c] == low.to_numpy(zero_copy_only=False)
        key = row_idx[is_req] * len(self.req) + pos_c[is_req]
        n_req = np.bincount(
            np.unique(key) // len(self.req), minlength=n
        ).astype(np.int64)
        keep = (
            (n_words >= self.min_words)
            & (n_words <= self.max_words)
            & (mean_len >= self.min_mean_len)
            & (mean_len <= self.max_mean_len)
            & (symbol_ratio <= self.max_symbol_ratio)
            & (bullet_frac <= self.max_bullet_frac)
            & (ellipsis_frac <= self.max_ellipsis_frac)
            & (alpha_frac >= self.min_alpha_frac)
            & (n_req >= self.min_req_stops)
        )
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "n_words": pa.array(n_words.astype(np.int64)),
                "mean_word_len": pa.array(round_half_away(mean_len, 6)),
                "symbol_ratio": pa.array(round_half_away(symbol_ratio, 6)),
                "bullet_frac": pa.array(round_half_away(bullet_frac, 6)),
                "ellipsis_frac": pa.array(
                    round_half_away(ellipsis_frac, 6)
                ),
                "alpha_frac": pa.array(round_half_away(alpha_frac, 6)),
                "n_req_stops": pa.array(n_req),
                "keep": pa.array(keep),
            }
        )


def gopher_rules(ds, text_col="text", id_col="doc_id", **kw) -> ray.data.Dataset:
    """Gopher quality rules (Rae et al. 2021) — map-only, one streaming
    pass; see :class:`GopherRules`."""
    return ds.map_batches(
        GopherRules(text_col, id_col, **kw), batch_format="pyarrow"
    )


class C4Rules:
    """C4 cleaning heuristics (Raffel et al. 2020, arXiv:1910.10683
    §2.2), line-level + doc-level, vectorized. Per doc:

      - ``n_kept_lines`` / ``clean_text``: keep only lines that end in
        terminal punctuation (. ! ? "), contain >= ``min_line_words``
        words, and contain neither ``javascript`` nor ``{``; kept lines
        re-join with ``\\n``.
      - ``has_lorem`` / ``has_brace`` / ``has_js``: doc-level flags
        ("lorem ipsum" or a curly brace anywhere drops the DOC in C4;
        javascript drops the line).
      - ``keep``: >= ``min_sentences`` kept lines, no lorem ipsum, no
        curly brace.
    """

    TERMINAL = ('.', '!', '?', '"')

    def __init__(self, text_col="text", id_col="doc_id", *,
                 min_line_words=3, min_sentences=3):
        self.text_col, self.id_col = text_col, id_col
        self.min_line_words = min_line_words
        self.min_sentences = min_sentences

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        text = batch[self.text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.cast(text, pa.string())
        lines = pc.split_pattern(text, "\n")
        per_row = np.diff(lines.offsets.to_numpy(zero_copy_only=False))
        lflat = pc.utf8_trim_whitespace(lines.flatten())
        lrow = np.repeat(np.arange(n, dtype=np.int64), per_row)
        term = pc.match_substring_regex(
            lflat, r'[.!?"]$'
        ).to_numpy(zero_copy_only=False)
        low = pc.utf8_lower(lflat)
        js = pc.match_substring(low, "javascript").to_numpy(
            zero_copy_only=False
        )
        brace = pc.match_substring(lflat, "{").to_numpy(
            zero_copy_only=False
        )
        # words per line (non-empty whitespace tokens)
        from fdblucene_ray.ops.webtext import ws_split

        wsplit = ws_split(lflat)
        wp = np.diff(wsplit.offsets.to_numpy(zero_copy_only=False))
        wflat = wsplit.flatten()
        wempty = pc.equal(wflat, "").to_numpy(zero_copy_only=False)
        wlrow = np.repeat(np.arange(len(lflat), dtype=np.int64), wp)
        n_line_words = wp - np.bincount(wlrow[wempty], minlength=len(lflat))
        kept = (
            term & ~js & ~brace & (n_line_words >= self.min_line_words)
        )
        n_kept = np.bincount(lrow[kept], minlength=n).astype(np.int64)
        # doc-level flags
        lorem = pc.match_substring(
            pc.utf8_lower(text), "lorem ipsum"
        ).to_numpy(zero_copy_only=False)
        has_brace = pc.match_substring(text, "{").to_numpy(
            zero_copy_only=False
        )
        has_js = np.zeros(n, bool)
        hit = np.bincount(lrow[js], minlength=n) > 0
        has_js[hit] = True
        # clean_text: kept lines re-joined with \n
        new_off = np.concatenate(
            ([0], np.cumsum(np.bincount(lrow[kept], minlength=n)))
        ).astype(np.int32)
        clean = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(new_off, pa.int32()),
                lflat.filter(pa.array(kept)),
            ),
            "\n",
        )
        keep = (n_kept >= self.min_sentences) & ~lorem & ~has_brace
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "n_lines": pa.array(per_row.astype(np.int64)),
                "n_kept_lines": pa.array(n_kept),
                "has_lorem": pa.array(lorem),
                "has_brace": pa.array(has_brace),
                "has_js": pa.array(has_js),
                "clean_text": clean,
                "keep": pa.array(keep),
            }
        )


def c4_rules(ds, text_col="text", id_col="doc_id", **kw) -> ray.data.Dataset:
    """C4 cleaning heuristics (Raffel et al. 2020) — map-only, one
    streaming pass; see :class:`C4Rules`."""
    return ds.map_batches(
        C4Rules(text_col, id_col, **kw), batch_format="pyarrow"
    )


class TokenCount:
    """Whitespace-ish token count + a BPE-flavored subword count (the
    regex splits words from digit runs and punctuation runs, a crude but
    deterministic stand-in for byte-pair pretokenization)."""

    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from fdblucene_ray.ops.webtext import ws_split

        text = batch[self.text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ws = ws_split(text)
        # count non-empty whitespace tokens: total per row minus empties
        offs = ws.offsets.to_numpy(zero_copy_only=False)
        per_row = np.diff(offs)
        flat = ws.flatten()
        empty = pc.equal(flat, "").to_numpy(zero_copy_only=False)
        row_idx = np.repeat(np.arange(len(batch)), per_row)
        n_empty = np.bincount(row_idx[empty], minlength=len(batch))
        n_ws = per_row - n_empty
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "n_ws_tokens": pa.array(n_ws.astype(np.int64)),
                "n_chars": pc.utf8_length(text).cast(pa.int64()),
            }
        )


def token_counts(ds, text_col="text", id_col="doc_id") -> ray.data.Dataset:
    return ds.map_batches(TokenCount(text_col, id_col), batch_format="pyarrow")


class Winnow:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): k-gram token hashes, sliding window of w, keep each
    window's minimum -> a deterministic sparse fingerprint set."""

    def __init__(self, text_col="text", id_col="doc_id", k=4, w=5):
        self.text_col, self.id_col = text_col, id_col
        self.k, self.w = k, w
        self.tokenizer = BatchTokenizer("simple")

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        row_idx, flat = self.tokenizer.flat_tokens(batch[self.text_col])
        tok_h = hash_strings(flat)
        k = self.k
        if len(tok_h) >= k:
            m = len(tok_h) - k + 1
            kg = tok_h[:m].copy()
            for j in range(1, k):
                kg = combine(kg, tok_h[j : j + m])
            valid = row_idx[:m] == row_idx[k - 1 : k - 1 + m]
            kg = kg[valid]
            krow = row_idx[:m][valid]
        else:
            kg = np.empty(0, np.uint64)
            krow = np.empty(0, np.int64)
        # whole-batch winnowing: ONE sliding-window-minimum pass over the
        # flat kgram stream (windows crossing doc boundaries masked out),
        # one reduceat for short docs, one lexsort dedup — no per-doc loop
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        w = self.w
        counts = np.bincount(krow, minlength=n).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(counts[:-1])))
        if len(kg) >= w:
            sw = np.lib.stride_tricks.sliding_window_view(kg, w)
            in_doc = krow[: len(kg) - w + 1] == krow[w - 1 :]
            mins = sw.min(axis=1)[in_doc]
            mrow = krow[: len(kg) - w + 1][in_doc]
        else:
            mins = np.empty(0, np.uint64)
            mrow = np.empty(0, np.int64)
        # docs with 0 < count < w have no full window: keep their global
        # min. reduceat over ALL non-empty docs (consecutive non-empty
        # starts are adjacent segment boundaries in kg), then select —
        # reducing at only the short docs' starts would span the docs
        # in between.
        nz = np.flatnonzero(counts > 0)
        if len(nz) and len(kg):
            allmins = np.minimum.reduceat(kg, starts[nz])
            is_short = counts[nz] < w
            mins = np.concatenate((mins, allmins[is_short]))
            mrow = np.concatenate((mrow, nz[is_short]))
        # per-doc unique + sort: lexsort on (fingerprint AS SIGNED int64
        # — the output column type — not the unsigned working value, row)
        if len(mins):
            signed = mins.astype(np.int64)
            order = np.lexsort((signed, mrow))
            r, f = mrow[order], signed[order]
            keep = np.concatenate(
                ([True], (r[1:] != r[:-1]) | (f[1:] != f[:-1]))
            )
            r, f = r[keep], f[keep]
        else:
            r = np.empty(0, np.int64)
            f = np.empty(0, np.int64)
        per_doc = np.bincount(r, minlength=n).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(per_doc))).astype(np.int32)
        fps = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(f.astype(np.int64))
        )
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "fingerprints": fps,
                "n_fingerprints": pa.array(per_doc),
            }
        )


def fingerprints(ds, text_col="text", id_col="doc_id", k=4, w=5) -> ray.data.Dataset:
    return ds.map_batches(Winnow(text_col, id_col, k, w), batch_format="pyarrow")


# ------------------------------------------------------- heavy hitters


class _GroupTermPartials:
    """Per-batch (grp, term, cnt) map-side combine: one row per unique
    (group value, term) pair per batch — the exchange carries combined
    counts, never the token stream."""

    def __init__(self, analyzer: str, group_col: str, text_col: str):
        self.tokenizer = BatchTokenizer(analyzer)
        self.group_col, self.text_col = group_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        row_idx, codes, vocab = self.tokenizer.encoded_tokens(
            batch[self.text_col]
        )
        grp = batch[self.group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        gdict = grp.dictionary_encode()
        gcodes = np.asarray(gdict.indices.to_numpy(zero_copy_only=False))
        gvals = np.asarray(
            [v.as_py() for v in gdict.dictionary], dtype=object
        )
        V = max(1, len(vocab))
        key = gcodes[row_idx].astype(np.int64) * V + codes
        uniq, cnt = np.unique(key, return_counts=True)
        vocab_np = np.asarray(vocab, dtype=object)
        return pa.table(
            {
                "grp": pa.array(gvals[(uniq // V)].tolist(), pa.string()),
                "term": pa.array(vocab_np[(uniq % V)].tolist(), pa.string()),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )



def _group_term_partials_batch(batch, *, analyzer, group_col, text_col):
    """Task wrapper: per-worker cached _GroupTermPartials (tokenizer
    built once per worker, no actor-pool spin-up per query)."""
    from fdblucene_ray.ops.broadcast import cached_state

    st = cached_state(
        ("group_term_partials", analyzer, group_col, text_col),
        lambda: _GroupTermPartials(analyzer, group_col, text_col),
    )
    return st(batch)


def _topn_factory(n: int):
    def topn(group: pa.Table) -> pa.Table:
        """Top-n of EVERY group hashed into one shuffle partition, in
        one vectorized call (group cardinality grows with the corpus —
        per-domain, per-language... — so grouping on the raw key would
        make one Python call per group): stable three-pass argsort
        (term asc, cnt desc, grp asc), per-run rank from run
        arithmetic, keep rank < n."""
        cnt = group["sum(cnt)"].to_numpy(zero_copy_only=False)
        terms = np.asarray(group["term"].to_pylist(), dtype=object)
        gcol = group["grp"]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        dct = gcol.dictionary_encode()
        codes = dct.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(codes):
            return pa.table(
                {"grp": pa.array([], pa.string()),
                 "term": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64()),
                 "rank": pa.array([], pa.int64())}
            )
        by_term = np.argsort(terms, kind="stable")
        by_cnt = by_term[np.argsort(-cnt[by_term], kind="stable")]
        order = by_cnt[np.argsort(codes[by_cnt], kind="stable")]
        gc = codes[order]
        starts = np.flatnonzero(np.concatenate(([True], gc[1:] != gc[:-1])))
        runlen = np.diff(np.concatenate((starts, [len(gc)])))
        rank = np.arange(len(gc)) - np.repeat(starts, runlen)
        keep = rank < n
        sel = order[keep]
        return pa.table(
            {
                "grp": dct.dictionary.take(pa.array(gc[keep])).cast(
                    pa.string()
                ),
                "term": pa.array(terms[sel].tolist(), pa.string()),
                "cnt": pa.array(cnt[sel]),
                "rank": pa.array((rank[keep] + 1).astype(np.int64)),
            }
        )

    return topn


def top_terms_per_group(
    ds: ray.data.Dataset,
    group_col: str = "source",
    n: int = 3,
    *,
    analyzer: str = "simple",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-group heavy hitters: the ``n`` most frequent terms of each
    group (count desc, term asc), with rank. Shape: per-batch combined
    (grp, term, cnt) partials -> one groupby sum over |groups|x|vocab|
    keys -> per-group top-n inside map_groups. Columns:
    (grp, term, cnt, rank)."""
    partials = ds.map_batches(
        _group_term_partials_batch,
        fn_kwargs=dict(
            analyzer=analyzer, group_col=group_col, text_col=text_col
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    agg = partials.groupby(["grp", "term"]).sum("cnt")
    from fdblucene_ray.ops.hashing import hash_strings

    num_parts = max(16, int(ray.cluster_resources().get("CPU", 8)))

    def add_part(t: pa.Table) -> pa.Table:
        g = t["grp"]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        h = hash_strings(g)
        return t.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32))
        )

    return (
        agg.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part", num_partitions=num_parts)
        .map_groups(_topn_factory(n), batch_format="pyarrow")
    )


class _SigTermPartials:
    """Per-batch partials for significant-terms: DISTINCT-doc counts
    per term, overall and within the foreground predicate, combined
    map-side (one row per unique term per batch + one sentinel row
    carrying the batch's doc counts). The exchange carries |vocab|-
    bounded count rows, never tokens."""

    _SENTINEL = "\x00docs"

    def __init__(self, analyzer, text_col, fg_col, fg_value):
        self.tokenizer = BatchTokenizer(analyzer)
        self.text_col = text_col
        self.fg_col, self.fg_value = fg_col, fg_value

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        row_idx, codes, vocab = self.tokenizer.encoded_tokens(
            batch[self.text_col]
        )
        fg_rows = pc.equal(batch[self.fg_col], self.fg_value).to_numpy(
            zero_copy_only=False
        )
        V = max(1, len(vocab))
        pair = np.unique(row_idx.astype(np.int64) * V + codes)
        prow, pcode = pair // V, pair % V
        df_all = np.bincount(pcode, minlength=V).astype(np.int64)
        df_fg = np.bincount(
            pcode[fg_rows[prow]], minlength=V
        ).astype(np.int64)
        terms = list(vocab) + [self._SENTINEL]
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "df_all": pa.array(
                    np.concatenate([df_all, [batch.num_rows]])
                ),
                "df_fg": pa.array(
                    np.concatenate([df_fg, [int(fg_rows.sum())]])
                ),
            }
        )



def _sig_term_partials_batch(batch, *, analyzer, text_col, fg_col, fg_value):
    """Task wrapper: per-worker cached _SigTermPartials."""
    from fdblucene_ray.ops.broadcast import cached_state

    st = cached_state(
        ("sig_term_partials", analyzer, text_col, fg_col, fg_value),
        lambda: _SigTermPartials(
            analyzer=analyzer, text_col=text_col,
            fg_col=fg_col, fg_value=fg_value,
        ),
    )
    return st(batch)


def significant_terms(
    ds: ray.data.Dataset,
    fg_col: str,
    fg_value,
    *,
    n: int = 20,
    analyzer: str = "simple",
    text_col: str = "text",
) -> pa.Table:
    """Terms overrepresented in the foreground slice vs the whole
    corpus (Elasticsearch significant_terms / Lucene interesting-terms
    analog), scored with the JLH heuristic
    ``(p_fg - p_bg) * p_fg / p_bg`` over document frequencies.

    Shape (fully distributed — the |vocab|-sized aggregate NEVER lands
    on the driver): ONE streaming pass emits map-side-combined per-term
    df partials (plus a sentinel row carrying doc counts), one
    groupby(term) sum materialized to the object store, the two scalar
    doc totals extracted from the sentinel row, then row-local JLH
    scoring in map_batches and a distributed ``sort().limit(n)``. Only
    the final n rows reach the driver.
    Columns: (term, df_fg, df_all, score)."""
    import pyarrow.compute as pc

    partials = ds.map_batches(
        _sig_term_partials_batch,
        fn_kwargs=dict(
            analyzer=analyzer, text_col=text_col,
            fg_col=fg_col, fg_value=fg_value,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # materialize the aggregate in the OBJECT STORE (distributed blocks,
    # ~20 bytes/term) so the sentinel extraction and the scoring pass
    # don't re-run the shuffle
    agg = partials.groupby("term").sum(["df_all", "df_fg"]).materialize()
    sentinel = _SigTermPartials._SENTINEL

    def only_sentinel(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["term"], sentinel))

    sent_rows = agg.map_batches(
        only_sentinel, batch_format="pyarrow"
    ).take_all()
    n_all = float(sent_rows[0]["sum(df_all)"])
    n_fg = float(sent_rows[0]["sum(df_fg)"])

    def score_rows(t: pa.Table) -> pa.Table:
        terms = t["term"]
        df_all = t["sum(df_all)"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        df_fg = t["sum(df_fg)"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        keep = (df_fg > 0) & ~pc.equal(terms, sentinel).to_numpy(
            zero_copy_only=False
        )
        sel = t.filter(pa.array(keep))
        df_all, df_fg = df_all[keep], df_fg[keep]
        pf, pb = df_fg / n_fg, df_all / n_all
        score = (pf - pb) * pf / pb
        return pa.table(
            {
                "term": sel["term"],
                "df_fg": pa.array(df_fg.astype(np.int64)),
                "df_all": pa.array(df_all.astype(np.int64)),
                "score": pa.array(score),
            }
        )

    top = (
        agg.map_batches(score_rows, batch_format="pyarrow")
        .sort(["score", "term"], descending=[True, False])
        .limit(n)
    )
    t = pa.Table.from_pylist(top.take_all())
    if t.num_rows == 0:
        return pa.table(
            {"term": pa.array([], pa.string()),
             "df_fg": pa.array([], pa.int64()),
             "df_all": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
    return pa.table(
        {
            "term": t["term"].cast(pa.string()),
            "df_fg": t["df_fg"].cast(pa.int64()),
            "df_all": t["df_all"].cast(pa.int64()),
            "score": pa.array(
                round_half_away(
                    t["score"].to_numpy(zero_copy_only=False), 6
                ).astype(np.float64)
            ),
        }
    )


# -------------------------------------------------------- doc keywords


def _tf_rows_batch(batch, *, analyzer, text_col, id_col, num_parts):
    """Per-batch (doc_id, term, tf, part=hash(term)%P) rows plus a df
    partial of 1 per (doc, term) — the map side of both the df
    aggregate and the term-co-located scoring shuffle."""
    from fdblucene_ray.ops.broadcast import cached_state
    from fdblucene_ray.ops.hashing import part_of

    tk = cached_state(
        ("kw_tokenizer", analyzer), lambda: BatchTokenizer(analyzer)
    )
    rows, terms, tfs, _ = tk.term_frequencies(batch[text_col])
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    part = part_of(hash_strings(terms).view(np.int64), num_parts)
    return pa.table(
        {
            "doc_id": pa.array(ids[rows]),
            "term": terms,
            "tf": pa.array(tfs.astype(np.int64)),
            "part": pa.array(part),
        }
    )


def _score_keywords_group(group: pa.Table, *, n_docs: float) -> pa.Table:
    """One shuffle partition: every (doc, term, tf) row scored
    tf-idf = tf * ln(n_docs / df) with df computed from the co-located
    term runs (each term's rows all hash here). Vectorized: one lexsort
    finds term runs; df = docs per run (tf rows are unique per (doc,
    term)). Scores are rounded to 6 dp HERE so the top-n rank order is
    identical to the SQL oracle's round(…, 6) ranking."""
    if group.num_rows == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "term": pa.array([], pa.string()),
             "score": pa.array([], pa.float64())}
        )
    tcol = group["term"]
    if isinstance(tcol, pa.ChunkedArray):
        tcol = tcol.combine_chunks()
    denc = tcol.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # runs only need EQUAL terms adjacent (df is per run); dictionary
    # codes give that without materializing per-row Python strings
    order = np.argsort(codes, kind="stable")
    c_sorted = codes[order]
    starts = np.flatnonzero(
        np.concatenate(([True], c_sorted[1:] != c_sorted[:-1]))
    )
    run_len = np.diff(np.concatenate((starts, [len(c_sorted)])))
    df = np.repeat(run_len, run_len).astype(np.float64)  # rows are unique (doc, term)
    tf = group["tf"].to_numpy(zero_copy_only=False).astype(np.float64)[order]
    score = round_half_away(tf * np.log(n_docs / df), 6)
    ids = group["doc_id"].to_numpy(zero_copy_only=False)[order]
    terms_out = denc.dictionary.take(pa.array(c_sorted, pa.int64()))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "term": terms_out.cast(pa.string()),
            "score": pa.array(score.astype(np.float64)),
        }
    )


def _topn_keywords_group(group: pa.Table, *, top_n: int) -> pa.Table:
    """One doc-hashed partition: per-doc top-n by (score desc, term
    asc) via a single lexsort + run-rank arithmetic."""
    if group.num_rows == 0:
        return group.select(["doc_id", "term", "score"])
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    score = group["score"].to_numpy(zero_copy_only=False)
    tcol = group["term"]
    if isinstance(tcol, pa.ChunkedArray):
        tcol = tcol.combine_chunks()
    denc = tcol.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # the term tie-break must be LEXICOGRAPHIC (oracle ORDER BY term):
    # rank dictionary values once (unique terms, small), then sort rows
    # by the rank — per-row strings never materialize
    dict_order = np.asarray(
        pc.array_sort_indices(denc.dictionary).to_numpy(
            zero_copy_only=False
        ),
        np.int64,
    )
    rank_of_code = np.empty(len(dict_order), np.int64)
    rank_of_code[dict_order] = np.arange(len(dict_order))
    order = np.lexsort((rank_of_code[codes], -score, ids))
    ids, score, codes = ids[order], score[order], codes[order]
    starts = np.flatnonzero(np.concatenate(([True], ids[1:] != ids[:-1])))
    run_len = np.diff(np.concatenate((starts, [len(ids)])))
    rank = np.arange(len(ids)) - np.repeat(starts, run_len)
    keep = rank < top_n
    terms_out = denc.dictionary.take(pa.array(codes[keep], pa.int64()))
    return pa.table(
        {
            "doc_id": pa.array(ids[keep], pa.int64()),
            "term": terms_out.cast(pa.string()),
            "score": pa.array(score[keep], pa.float64()),
        }
    )


def doc_keywords(
    ds: ray.data.Dataset,
    top_n: int = 3,
    *,
    analyzer: str = "simple",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-doc tf-idf keyword extraction (MoreLikeThis interesting-terms
    for EVERY doc): top ``top_n`` terms per doc by tf * ln(n_docs/df),
    ties score desc then term asc. Two hashed-partition exchanges of
    (doc, term, tf) rows — one term-keyed (df computed from co-located
    runs, no |vocab| broadcast or driver pass), one doc-keyed (per-doc
    top-n by run arithmetic). Columns: (doc_id, term, score@6dp)."""
    import ray

    from fdblucene_ray.ops.hashing import part_of

    num_parts = max(16, int(ray.cluster_resources().get("CPU", 8)))
    n_docs = float(ds.count())
    tf_rows = ds.map_batches(
        _tf_rows_batch,
        fn_kwargs=dict(
            analyzer=analyzer, text_col=text_col, id_col=id_col,
            num_parts=num_parts,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    scored = tf_rows.groupby("part", num_partitions=num_parts).map_groups(
        _score_keywords_group, fn_kwargs=dict(n_docs=n_docs),
        batch_format="pyarrow",
    )

    def add_doc_part(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array(part_of(k, num_parts)))

    return (
        scored.map_batches(add_doc_part, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("part", num_partitions=num_parts)
        .map_groups(
            _topn_keywords_group, fn_kwargs=dict(top_n=top_n),
            batch_format="pyarrow",
        )
        .select_columns(["doc_id", "term", "score"])
    )


def _readability_batch(batch: pa.Table, *, text_col: str, id_col: str) -> pa.Table:
    """Flesch reading ease per doc, entirely Arrow kernels: words =
    [0-9a-z_]+ runs, sentences = [.!?]+ runs (min 1), syllables =
    [aeiouy]+ vowel groups of the lowercased text (the standard cheap
    approximation). Rounding half-away at 4 dp matches the SQL twin."""
    from fdblucene_ray.ops.hashing import round_half_away

    txt = batch[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    low = pc.utf8_lower(txt)
    words = pc.count_substring_regex(low, "[0-9a-z_]+").to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    sents = pc.count_substring_regex(txt, "[.!?]+").to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    syll = pc.count_substring_regex(low, "[aeiouy]+").to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    sents = np.maximum(sents, 1.0)
    w = np.maximum(words, 1.0)
    flesch = 206.835 - 1.015 * (w / sents) - 84.6 * (syll / w)
    return pa.table(
        {
            "doc_id": batch[id_col],
            "words": pa.array(words.astype(np.int64)),
            "sentences": pa.array(sents.astype(np.int64)),
            "syllables": pa.array(syll.astype(np.int64)),
            "flesch": pa.array(round_half_away(flesch, 4)),
        }
    )


def readability(ds: ray.data.Dataset, text_col="text", id_col="doc_id") -> ray.data.Dataset:
    """Per-doc Flesch reading-ease signals (single map-only pass)."""
    return ds.map_batches(
        _readability_batch,
        fn_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _report_partials(batch: pa.Table, *, text_col: str, lang_col: str,
                     chars_col: str) -> pa.Table:
    """One row of summable partials per metric per batch — the corpus
    card is ONE pass regardless of how many metrics it carries."""
    txt = batch[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    n_tokens = int(
        pc.sum(
            pc.count_substring_regex(pc.utf8_lower(txt), "[0-9a-z_]+")
        ).as_py()
        or 0
    )
    chars = batch[chars_col].to_numpy(zero_copy_only=False)
    metrics = [
        ("docs", float(batch.num_rows)),
        ("tokens", float(n_tokens)),
        ("chars", float(chars.sum())),
        ("max_chars", float(chars.max()) if len(chars) else 0.0),
    ]
    langs = batch[lang_col]
    if isinstance(langs, pa.ChunkedArray):
        langs = langs.combine_chunks()
    dct = langs.dictionary_encode()
    cnt = np.bincount(
        dct.indices.to_numpy(zero_copy_only=False),
        minlength=len(dct.dictionary),
    )
    for v, c in zip(dct.dictionary.to_pylist(), cnt):
        metrics.append((f"lang:{v}", float(c)))
    return pa.table(
        {
            "metric": pa.array([m for m, _ in metrics]),
            "value": pa.array([v for _, v in metrics]),
        }
    )


def corpus_report(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    lang_col: str = "lang",
    chars_col: str = "n_chars",
) -> pa.Table:
    """Corpus card: docs / tokens / chars / per-lang counts /
    avg_doc_tokens in ONE streaming pass (per-batch summable partials,
    tiny metric-keyed fold; max folded with max). Columns:
    (metric, value@4dp) sorted by metric."""
    parts = ds.map_batches(
        _report_partials,
        fn_kwargs=dict(text_col=text_col, lang_col=lang_col,
                       chars_col=chars_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()  # <= n_metrics rows per batch
    sums: dict[str, float] = {}
    mx: dict[str, float] = {}
    for r in parts:
        m, v = r["metric"], float(r["value"])
        if m.startswith("max_"):
            mx[m] = max(mx.get(m, float("-inf")), v)
        else:
            sums[m] = sums.get(m, 0.0) + v
    out = dict(sums)
    out.update(mx)
    if out.get("docs"):
        out["avg_doc_tokens"] = out["tokens"] / out["docs"]
    names = sorted(out)
    return pa.table(
        {
            "metric": pa.array(names),
            "value": pa.array(round_half_away(
                np.array([out[n] for n in names]), 4)),
        }
    )


# ---------------------------------------------------------- fertility


def token_fertility(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Tokenizer-fertility report per group: docs, total whitespace
    tokens, total chars, chars-per-token — the compression diagnostic
    tokenizer teams run per source/language (high chars/token = the
    tokenizer fragments that slice of the corpus).

    Shape: the TokenCount kernel per batch, then a per-batch partial
    per group (map-side combine) so the groupby moves |groups| rows per
    block, never per-doc rows."""

    counter = TokenCount(text_col, id_col)

    def partial(batch: pa.Table) -> pa.Table:
        counts = counter(batch)
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        codes_arr = g.dictionary_encode()
        codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        groups = codes_arr.dictionary.to_pylist()
        toks = counts["n_ws_tokens"].to_numpy(zero_copy_only=False)
        chars = counts["n_chars"].to_numpy(zero_copy_only=False)
        k = len(groups)
        return pa.table(
            {
                group_col: pa.array(groups, pa.string()),
                "n_docs": pa.array(
                    np.bincount(codes, minlength=k).astype(np.int64)
                ),
                "n_tokens": pa.array(
                    np.bincount(codes, weights=toks, minlength=k).astype(
                        np.int64
                    )
                ),
                "n_chars": pa.array(
                    np.bincount(codes, weights=chars, minlength=k).astype(
                        np.int64
                    )
                ),
            }
        )

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(
        group_col
    ).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_tokens", alias_name="n_tokens"),
        Sum("n_chars", alias_name="n_chars"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        nt = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
        nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        cpt = np.divide(nc, nt, out=np.zeros_like(nc), where=nt > 0)
        return pa.table(
            {
                group_col: t[group_col],
                "n_docs": t["n_docs"].cast(pa.int64()),
                "n_tokens": t["n_tokens"].cast(pa.int64()),
                "n_chars": t["n_chars"].cast(pa.int64()),
                "chars_per_token": pa.array(
                    round_half_away(cpt, 6).astype(np.float64)
                ),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


# -------------------------------------------------------- filter funnel

# (name, SQL-twin-documented predicate); evaluated IN ORDER, a doc is
# charged to its FIRST failing gate (classic C4/Gopher-style funnel)
FUNNEL_STAGES = ("min_chars", "min_tokens", "max_word_len",
                 "distinct_ratio", "pass")


def filter_funnel(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    min_chars: int = 200,
    min_tokens: int = 30,
    max_word_len: int = 25,
    min_distinct_ratio: float = 0.3,
) -> ray.data.Dataset:
    """Quality-gate funnel report: how many docs each curation gate
    rejects, with first-fail attribution — the observability table every
    filtering pipeline publishes next to its output. Gates (C4/Gopher
    heuristics): doc length, whitespace-token count, longest-word
    length, distinct-token ratio.

    One vectorized pass computes every predicate; the exchange carries
    |stages| partial rows per block."""

    def partial(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = len(text)
        chars = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        from fdblucene_ray.ops.webtext import ws_split
        ws = ws_split(text)
        offs = ws.offsets.to_numpy(zero_copy_only=False)
        per_row = np.diff(offs)
        flat = ws.flatten()
        row_idx = np.repeat(np.arange(n), per_row)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        n_toks = np.bincount(row_idx[nonempty], minlength=n).astype(np.int64)
        # longest token per row
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        max_len = np.zeros(n, np.int64)
        np.maximum.at(max_len, row_idx[nonempty], tok_len[nonempty])
        # distinct non-empty tokens per row: lexsort + run starts
        h = hash_strings(flat)[nonempty]
        rid = row_idx[nonempty]
        order = np.lexsort((h, rid))
        rs, hs = rid[order], h[order]
        new_run = np.concatenate(
            ([True], (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1]))
        ) if len(rs) else np.zeros(0, bool)
        n_distinct = np.bincount(rs[new_run], minlength=n).astype(np.int64)
        ratio = np.divide(
            n_distinct.astype(np.float64), n_toks,
            out=np.zeros(n, np.float64), where=n_toks > 0,
        )
        # first-fail stage per doc
        stage = np.full(n, len(FUNNEL_STAGES) - 1, np.int64)  # pass
        fails = [
            chars < min_chars,
            n_toks < min_tokens,
            max_len > max_word_len,
            ratio < min_distinct_ratio,
        ]
        for i in range(len(fails) - 1, -1, -1):
            stage[fails[i]] = i
        counts = np.bincount(stage, minlength=len(FUNNEL_STAGES))
        return pa.table(
            {
                "stage": pa.array(list(FUNNEL_STAGES), pa.string()),
                "n_docs": pa.array(counts.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(
        "stage"
    ).aggregate(Sum("n_docs", alias_name="n_docs"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {"stage": t["stage"], "n_docs": t["n_docs"].cast(pa.int64())}
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


# --------------------------------------------------------- KL divergence


def source_divergence(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    group_col: str = "source",
    analyzer: str = "simple",
) -> pa.Table:
    """Per-group KL divergence from the corpus unigram distribution —
    the distribution-shift diagnostic a mixture pipeline watches
    (which sources' token distributions deviate most from the blend):

        KL(P_g || P) = sum_t p_g(t) * ln(p_g(t) / p(t))

    Shape: one tokenize pass emits per-batch (group, term, c) partials
    (unique terms per group per batch); ONE vocabulary-sized groupby
    builds per-(group, term) counts; corpus per-term counts derive from
    the same table by a second small groupby; the two meet in a Ray
    hash join ON TERM (both sides vocabulary-sized, co-partitioned);
    the KL contribution is row-local and a final |groups|-sized groupby
    sums it. Group/corpus token totals are |groups|+1 scalars. Only
    vocabulary-sized data ever shuffles."""
    import ray as _ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        from fdblucene_ray.ops.broadcast import cached_state

        tk = cached_state(
            ("kl_tok", analyzer), lambda: BatchTokenizer(analyzer)
        )
        row_idx, codes, vocab = tk.encoded_tokens(batch[text_col])
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        genc = g.dictionary_encode()
        gcodes = genc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        gnames = np.asarray(genc.dictionary.to_pylist(), dtype=object)
        V = max(1, len(vocab))
        key = gcodes[row_idx] * V + codes
        uniq, cnt = np.unique(key, return_counts=True)
        vv = np.asarray(vocab, dtype=object)
        return pa.table(
            {
                group_col: pa.array(gnames[(uniq // V)].tolist(), pa.string()),
                "term": pa.array(vv[(uniq % V)].tolist(), pa.string()),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    gt = ds.map_batches(partial, batch_format="pyarrow").groupby(
        [group_col, "term"]
    ).aggregate(Sum("c", alias_name="c")).materialize()
    corpus = gt.groupby("term").aggregate(Sum("c", alias_name="ct"))
    totals = {
        r[group_col]: int(r["n"])
        for r in gt.groupby(group_col).aggregate(
            Sum("c", alias_name="n")
        ).take_all()
    }
    N = float(sum(totals.values()))
    num_parts = max(8, int(_ray.cluster_resources().get("CPU", 8)) // 2)
    joined = gt.join(
        corpus, join_type="inner", num_partitions=num_parts, on=("term",)
    )
    totals_ref = _ray.put(totals)

    def contrib(t: pa.Table) -> pa.Table:
        from fdblucene_ray.ops.broadcast import cached_state

        tot = cached_state(
            ("kl_totals", totals_ref.hex()), lambda: _ray.get(totals_ref)
        )
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        ns = np.array([float(tot[x]) for x in g.to_pylist()], np.float64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        ct = t["ct"].to_numpy(zero_copy_only=False).astype(np.float64)
        pg = c / ns
        p = ct / N
        return pa.table(
            {
                group_col: g,
                "kl": pa.array(pg * np.log(pg / p)),
            }
        )

    agg = joined.map_batches(contrib, batch_format="pyarrow").groupby(
        group_col
    ).aggregate(Sum("kl", alias_name="kl")).take_all()
    agg.sort(key=lambda r: r[group_col])
    return pa.table(
        {
            group_col: pa.array([r[group_col] for r in agg], pa.string()),
            "n_tokens": pa.array(
                [totals[r[group_col]] for r in agg], pa.int64()
            ),
            "kl": pa.array(
                [
                    float(round_half_away(np.array([r["kl"]]), 6)[0])
                    for r in agg
                ],
                pa.float64(),
            ),
        }
    )


# ----------------------------------------------------- compressibility


def compression_ratio(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> ray.data.Dataset:
    """Per-doc zlib compression ratio — the classic cheap junk signal
    (highly compressible text = templated/repetitive boilerplate;
    near-incompressible = random noise; natural prose sits in between).
    Deterministic (fixed level, no dictionary), map-only. The per-row
    zlib call is C; the Python loop is over ROWS of one batch, bounded
    by batch_size, and each iteration is O(doc bytes) compression work
    — the loop overhead is noise next to the deflate cost (documented
    exception to the no-row-loop rule: there is no vectorized deflate)."""
    import zlib

    def fn(batch: pa.Table) -> pa.Table:
        t = batch[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        raw = [v.encode() if v is not None else b"" for v in t.to_pylist()]
        comp = np.array(
            [len(zlib.compress(b, level)) for b in raw], np.float64
        )
        orig = np.array([len(b) for b in raw], np.float64)
        ratio = np.divide(
            comp, orig, out=np.ones_like(comp), where=orig > 0
        )
        from fdblucene_ray.ops.hashing import round_half_away

        return pa.table(
            {
                id_col: batch[id_col],
                "n_bytes": pa.array(orig.astype(np.int64)),
                "c_bytes": pa.array(comp.astype(np.int64)),
                "ratio": pa.array(
                    round_half_away(ratio, 6).astype(np.float64)
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
