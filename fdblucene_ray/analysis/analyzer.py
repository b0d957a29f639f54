"""Analysis chains: the map_batches tokenizer and its row-wise twin.

The reference analyzes ``TextField`` values with Lucene's default
StandardAnalyzer at ``addDocument`` time (SimpleFDBDirectoryTest.java:
202-214) and indexes ``StringField`` verbatim (keyword). The target
analyzer chain (BASELINE.json north_star) is lowercase -> stopword ->
Porter stem over a word tokenizer.

Token definition (both here and in every DuckDB oracle):
``[0-9a-z_]+`` runs over the lowercased text — i.e. split on
``[^0-9a-z_]+`` and drop empties. Chosen over ``\\w`` so Python (unicode
``\\w``) and RE2/DuckDB agree byte-for-byte.

Two implementations, tested identical:

- ``Analyzer.tokens(text)`` — pure-Python row-wise (the oracle path);
- ``tokenize_batch`` — vectorized over an Arrow column:
  ``pc.utf8_lower`` + ``pc.split_pattern_regex``, stopword filter via
  ``pc.is_in``, stemming amortized over *unique* surface forms per batch
  with a per-actor memo cache. No Python loop over rows or tokens.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fdblucene_ray.analysis.porter import porter_stem
from fdblucene_ray.analysis.stopwords import ENGLISH_STOPWORDS

TOKEN_SPLIT_PATTERN = "[^0-9a-z_]+"
# case-inclusive split used by the batch fast path: split the RAW text,
# then lowercase only the (small) token dictionary — one full-data
# utf8_lower pass saved per batch (~20% of tokenize CPU). Equivalent to
# lower-then-split for ASCII, and closer to Lucene, whose
# StandardTokenizer runs BEFORE LowerCaseFilter. (Known deviation: a
# non-ASCII uppercase letter whose lowercase IS ascii — e.g. U+212A
# KELVIN SIGN -> 'k' — splits here but joined a token under
# lower-then-split. No such character appears in ASCII corpora.)
TOKEN_SPLIT_PATTERN_CASED = "[^0-9a-zA-Z_]+"
_TOKEN_RE = re.compile(r"[0-9a-z_]+")


def _token_lut(cased: bool) -> "np.ndarray":
    """256-entry byte translation table: token bytes map to themselves,
    every other byte (incl. all UTF-8 continuation/lead bytes — they
    have the high bit set and are never token chars) maps to space."""
    lut = np.full(256, ord(" "), np.uint8)
    for c in b"0123456789_":
        lut[c] = c
    for c in range(ord("a"), ord("z") + 1):
        lut[c] = c
    if cased:
        for c in range(ord("A"), ord("Z") + 1):
            lut[c] = c
    return lut


_LUT_CASED = _token_lut(True)
_LUT_LOWER = _token_lut(False)


def _fast_token_split(text_col: pa.Array, cased: bool):
    """``split_pattern_regex(text, "[^0-9a-zA-Z_]+")`` twin, ~3x faster:
    one vectorized byte-LUT gather rewrites every delimiter byte to a
    space (position-preserving, so the original offsets buffer is
    reused verbatim), then Arrow's non-regex ``ascii_split_whitespace``
    does the boundary work. Token streams are byte-identical to the
    regex (delimiter RUNS collapse to one separator either way, and
    multibyte UTF-8 sequences become space runs). Returns None when the
    input needs the regex path (nulls, or non-int32-offset layouts)."""
    if text_col.null_count:
        return None
    if not pa.types.is_string(text_col.type):
        return None
    bufs = text_col.buffers()
    off = np.frombuffer(bufs[1], np.int32)[
        text_col.offset : text_col.offset + len(text_col) + 1
    ]
    data = np.frombuffer(bufs[2], np.uint8, count=int(off[-1])) if bufs[2] \
        else np.empty(0, np.uint8)
    lut = _LUT_CASED if cased else _LUT_LOWER
    trans = lut[data]
    new = pa.StringArray.from_buffers(
        len(text_col),
        pa.py_buffer(off.tobytes()) if text_col.offset else bufs[1],
        pa.py_buffer(trans.tobytes()),
    )
    return pc.ascii_split_whitespace(new)


@dataclass(frozen=True)
class Analyzer:
    """An analysis chain. ``name`` is the stable config identifier."""

    name: str
    lowercase: bool = True
    stopwords: frozenset = frozenset()
    stem: Callable[[str], str] | None = None
    # ShingleFilter analog: emit word n-grams joined by '_' INSTEAD of
    # unigrams (Lucene outputUnigrams=false). Only supported without
    # stopwords (Lucene inserts '_' fillers at stopword holes; this
    # chain keeps the SQL-twin-friendly no-holes form).
    shingle: int = 1

    def tokens(self, text: str) -> list[str]:
        """Row-wise analysis (oracle / query parsing path)."""
        if text is None:
            return []
        if self.lowercase:
            text = text.lower()
        toks = _TOKEN_RE.findall(text)
        if self.stopwords:
            toks = [t for t in toks if t not in self.stopwords]
        if self.stem is not None:
            stem = self.stem
            toks = [stem(t) for t in toks]
        if self.shingle > 1:
            n = self.shingle
            toks = [
                "_".join(toks[i : i + n])
                for i in range(len(toks) - n + 1)
            ]
        return toks

    def tokens_with_positions(self, text: str) -> tuple[list[str], list[int]]:
        """(terms, positions) with Lucene StopFilter position-increment
        semantics: a removed stopword leaves a position gap (position =
        index in the PRE-stopword token stream), so phrase matching
        across removed stopwords behaves like Lucene's
        PhraseQuery/StopFilter (the reference's ('pp', ...) positions
        preserve increments)."""
        if text is None:
            return [], []
        if self.lowercase:
            text = text.lower()
        raw = _TOKEN_RE.findall(text)
        toks: list[str] = []
        pos: list[int] = []
        stem = self.stem
        for p, t in enumerate(raw):
            if self.stopwords and t in self.stopwords:
                continue
            toks.append(stem(t) if stem is not None else t)
            pos.append(p)
        if self.shingle > 1:
            # shingle takes the position of its FIRST token (Lucene
            # ShingleFilter posIncrement semantics)
            n = self.shingle
            toks = [
                "_".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            ]
            pos = pos[: max(len(toks), 0)]
        return toks, pos


ANALYZERS: dict[str, Analyzer] = {
    # Lucene-StandardAnalyzer-equivalent chain per BASELINE.json north_star
    "lucene": Analyzer("lucene", stopwords=ENGLISH_STOPWORDS, stem=porter_stem),
    # lowercase + word-split only — every step SQL-expressible (DuckDB oracle)
    "simple": Analyzer("simple"),
    # lowercase + word-split + stopword removal (SQL-expressible)
    "simple_stop": Analyzer("simple_stop", stopwords=ENGLISH_STOPWORDS),
    # word-bigram chain (Lucene ShingleFilter, outputUnigrams=false):
    # lowercase -> word-split -> join adjacent pairs with '_'. Every
    # step SQL-expressible (lead() OVER per-doc token order).
    "shingle2": Analyzer("shingle2", shingle=2),
}


def get_analyzer(name_or_analyzer) -> Analyzer:
    if isinstance(name_or_analyzer, Analyzer):
        return name_or_analyzer
    return ANALYZERS[name_or_analyzer]


class BatchTokenizer:
    """Vectorized tokenizer used inside ``map_batches`` (stateful: holds a
    stem memo cache — pass the class to map_batches for an actor pool, per
    SURVEY.md §2.3 ST-pattern, when stemming is enabled)."""

    def __init__(self, analyzer="lucene"):
        self.analyzer = get_analyzer(analyzer)
        self._stem_cache: dict[str, str] = {}
        self._stop_arr = (
            pa.array(sorted(self.analyzer.stopwords)) if self.analyzer.stopwords else None
        )

    def encoded_tokens(self, text_col, with_positions: bool = False,
                       with_row_lengths: bool = False):
        """Tokenize a string column -> (row_idx, codes, vocab)
        (plus, when ``with_positions``, a per-token int64 position array
        with Lucene position-increment semantics: the position is the
        token's index in the PRE-stopword stream of its row, so removed
        stopwords leave gaps).

        The per-TOKEN work is a handful of Arrow/numpy kernels; stopword
        filtering and stemming run per *unique surface form* only:

            lower -> split -> flatten -> dictionary_encode,
            then keep/stem decisions on the (small) dictionary and a
            vectorized remap of the token code stream.

        ``codes[i]`` indexes ``vocab`` (fully analyzed final terms);
        ``row_idx[i]`` is the input row of token i (original order kept).
        """
        if isinstance(text_col, pa.ChunkedArray):
            text_col = text_col.combine_chunks()
        n = len(text_col)
        # split raw when lowercasing, lower the DICTIONARY below (see
        # TOKEN_SPLIT_PATTERN_CASED) — saves a full-data lower pass
        toks = _fast_token_split(text_col, cased=self.analyzer.lowercase)
        if toks is None:  # nulls / large_string: regex fallback
            toks = pc.split_pattern_regex(
                text_col,
                TOKEN_SPLIT_PATTERN_CASED
                if self.analyzer.lowercase
                else TOKEN_SPLIT_PATTERN,
            )
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        counts = np.diff(offsets)
        row_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        flat = toks.flatten()
        if len(flat) != int(counts.sum()):
            # nulls in the list array would desync flatten(); inputs are
            # non-null text columns, enforce that assumption loudly
            raise ValueError("null text values not supported in tokenize")
        denc = flat.dictionary_encode()
        surface = denc.dictionary
        if self.analyzer.lowercase:
            # lower per unique surface form; case variants that merge
            # ('Data'/'data') are re-deduped by the fmap loop below
            surface = pc.utf8_lower(surface)
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

        # per-unique keep decision (empty-string + stopword)
        nonempty_u = pc.not_equal(surface, "").to_numpy(zero_copy_only=False)
        keep_u = nonempty_u.copy()
        if self._stop_arr is not None:
            keep_u &= pc.invert(
                pc.is_in(surface, value_set=self._stop_arr)
            ).to_numpy(zero_copy_only=False)

        positions = None
        if with_positions:
            # position = rank among the row's NON-EMPTY tokens (empties
            # are split artifacts, not tokens; stopwords ARE tokens and
            # consume a position even though they are dropped below)
            nonempty = nonempty_u[codes]
            if len(nonempty):
                cnz = np.cumsum(nonempty)
                row_first = np.concatenate(([0], np.cumsum(counts[:-1])))
                base_before = cnz[row_first] - nonempty[row_first]
                positions = (cnz - 1) - base_before[row_idx]
            else:
                positions = np.empty(0, np.int64)

        # per-unique stem + dedupe into the final vocabulary
        surf_list = surface.to_pylist()
        stem = self.analyzer.stem
        cache = self._stem_cache
        remap = np.full(len(surf_list), -1, np.int64)
        vocab: list[str] = []
        fmap: dict[str, int] = {}
        for i, s in enumerate(surf_list):
            if not keep_u[i]:
                continue
            if stem is not None:
                t = cache.get(s)
                if t is None:
                    t = stem(s)
                    cache[s] = t
            else:
                t = s
            j = fmap.get(t)
            if j is None:
                j = len(vocab)
                fmap[t] = j
                vocab.append(t)
            remap[i] = j
        keep_mask = keep_u[codes]
        kept_rows = row_idx[keep_mask]
        kept_codes = remap[codes[keep_mask]]
        kept_pos = positions[keep_mask] if with_positions else None
        if self.analyzer.shingle > 1:
            # ShingleFilter (outputUnigrams=false): adjacent kept-token
            # pairs within a row become the emitted terms. Vectorized:
            # pair key = first*|V| + second over the adjacency mask,
            # unique pairs -> bigram dictionary (small), stream remap.
            # doc_lens downstream count EMITTED tokens, so norms/avgdl
            # become shingle counts automatically (Lucene norms count
            # the emitted token stream).
            if self.analyzer.stopwords:
                raise ValueError(
                    "shingle chains require no stopwords (no-filler form)"
                )
            if self.analyzer.shingle != 2:
                raise NotImplementedError(
                    "vectorized path supports shingle=2"
                )
            if with_row_lengths:
                raise ValueError("shingle fields are single-valued")
            adj = (
                (kept_rows[1:] == kept_rows[:-1])
                if len(kept_rows)
                else np.zeros(0, bool)
            )
            first = kept_codes[:-1][adj] if len(kept_codes) else kept_codes
            second = kept_codes[1:][adj] if len(kept_codes) else kept_codes
            V = max(1, len(vocab))
            pk = first * V + second
            uniq, inv = np.unique(pk, return_inverse=True)
            vocab = [
                f"{vocab[int(u) // V]}_{vocab[int(u) % V]}" for u in uniq
            ]
            kept_rows = kept_rows[:-1][adj] if len(kept_rows) else kept_rows
            kept_codes = inv.astype(np.int64)
            if with_positions:
                # a shingle takes its FIRST token's position
                kept_pos = kept_pos[:-1][adj] if len(kept_pos) else kept_pos
        out = [kept_rows, kept_codes, vocab]
        if with_positions:
            out.append(kept_pos)
        if with_row_lengths:
            # per-row count of NON-EMPTY tokens (stopwords included) —
            # the position-stream length a multi-valued field needs to
            # place the next value after a positionIncrementGap
            nonempty = nonempty_u[codes]
            out.append(
                np.bincount(row_idx[nonempty], minlength=n).astype(np.int64)
            )
        return tuple(out)

    def encoded_tokens_multi(self, list_col, *, gap: int = 100,
                             with_positions: bool = False):
        """Multi-valued (list<string>) field tokenization with Lucene
        positionIncrementGap semantics: positions continue across a
        row's values with ``gap`` added at each value boundary, so
        phrase/near queries never match ACROSS values (the Lucene
        TextField default, gap=100 in IndexWriter terms). Returns the
        same tuple shape as ``encoded_tokens`` with row indices mapped
        to the PARENT row."""
        if self.analyzer.shingle > 1:
            raise ValueError("shingle chains are single-valued only")
        if isinstance(list_col, pa.ChunkedArray):
            list_col = list_col.combine_chunks()
        n = len(list_col)
        offsets = list_col.offsets.to_numpy(zero_copy_only=False)
        lo = int(offsets[0])
        value_counts = np.diff(offsets)
        values = list_col.flatten()
        val_parent = np.repeat(np.arange(n, dtype=np.int64), value_counts)
        if not with_positions:
            vrow, codes, vocab = self.encoded_tokens(values)
            return val_parent[vrow], codes, vocab
        vrow, codes, vocab, vpos, vlens = self.encoded_tokens(
            values, with_positions=True, with_row_lengths=True
        )
        # exclusive cumsum of (value position-stream length + gap),
        # restarting at each parent row -> per-value position base
        csum = np.cumsum(vlens + gap)
        excl = np.concatenate(([0], csum[:-1]))
        starts = offsets[:-1] - lo  # first value index per parent
        n_values = len(values)
        if n_values:
            base = excl - np.repeat(excl[starts], value_counts)
        else:
            base = excl
        pos = vpos + base[vrow]
        return val_parent[vrow], codes, vocab, pos

    def term_frequencies_encoded_multi(self, list_col, *, gap: int = 100,
                                       with_positions: bool = False):
        """Multi-valued twin of ``term_frequencies_encoded``: doc_lens
        count emitted tokens across ALL of a row's values (Lucene norms
        over the whole field)."""
        if isinstance(list_col, pa.ChunkedArray):
            list_col = list_col.combine_chunks()
        n = len(list_col)
        out = self.encoded_tokens_multi(
            list_col, gap=gap, with_positions=with_positions
        )
        if not with_positions:
            row_idx, codes, vocab = out
            return self._aggregate_encoded(row_idx, codes, vocab, n)
        row_idx, codes, vocab, tok_pos = out
        return self._aggregate_encoded(row_idx, codes, vocab, n, tok_pos)

    def _aggregate_encoded(self, row_idx, codes, vocab, n, tok_pos=None):
        """(row, code) token stream -> per-(row, term) postings tuple
        (shared by the single- and multi-valued paths)."""
        doc_lens = np.bincount(row_idx, minlength=n).astype(np.int32)
        n_vocab = max(1, len(vocab))
        key = row_idx * n_vocab + codes
        if tok_pos is None:
            uniq, tfs = np.unique(key, return_counts=True)
            return (
                uniq // n_vocab,
                uniq % n_vocab,
                vocab,
                tfs.astype(np.int32),
                doc_lens,
            )
        order = np.argsort(key, kind="stable")
        k = key[order]
        positions = tok_pos[order].astype(np.int32)
        if len(k):
            bounds = np.flatnonzero(np.diff(k)) + 1
            gstarts = np.concatenate(([0], bounds))
            gends = np.concatenate((bounds, [len(k)]))
        else:
            gstarts = gends = np.empty(0, np.int64)
        uniq = k[gstarts] if len(k) else gstarts
        tfs = (gends - gstarts).astype(np.int32)
        return uniq // n_vocab, uniq % n_vocab, vocab, tfs, doc_lens, positions

    def flat_tokens(self, text_col, as_dictionary: bool = False):
        """Tokenize -> (row_idx, terms). ``as_dictionary=True`` returns a
        DictionaryArray (cheapest for downstream hashing); else a plain
        StringArray."""
        row_idx, codes, vocab = self.encoded_tokens(text_col)
        arr = pa.DictionaryArray.from_arrays(
            pa.array(codes.astype(np.int32)), pa.array(vocab, pa.string())
        )
        return row_idx, (arr if as_dictionary else arr.cast(pa.string()))

    def term_frequencies_encoded(self, text_col, with_positions: bool = False):
        """-> (post_rows, post_codes, vocab, post_tfs, doc_lens[, positions])
        — the zero-string-materialization variant the build uses.
        Positions carry Lucene increment semantics (gaps at removed
        stopwords); doc_lens stay the POST-filter token counts (Lucene
        norms count emitted tokens)."""
        n = len(text_col)
        if not with_positions:
            row_idx, codes, vocab = self.encoded_tokens(text_col)
            return self._aggregate_encoded(row_idx, codes, vocab, n)
        row_idx, codes, vocab, tok_pos = self.encoded_tokens(
            text_col, with_positions=True
        )
        return self._aggregate_encoded(row_idx, codes, vocab, n, tok_pos)

    def term_frequencies(self, text_col, with_positions: bool = False):
        """-> per-(row, term) tf plus per-row doc length.

        Returns ``(post_rows, post_terms(pa.Array), post_tfs, doc_lens)``
        — plus, when ``with_positions``, a fifth flat int32 array of
        token positions (position = index in the post-analysis token
        stream of the row), ordered per (row, term) group in occurrence
        order: exactly ``sum(tfs)`` entries (the DATA.md:54 positions).
        """
        out = self.term_frequencies_encoded(text_col, with_positions)
        post_rows, post_codes, vocab, tfs, doc_lens = out[:5]
        post_terms = pa.array(vocab, pa.string()).take(
            pa.array(post_codes, type=pa.int64())
        )
        if with_positions:
            return post_rows, post_terms, tfs, doc_lens, out[5]
        return post_rows, post_terms, tfs, doc_lens
