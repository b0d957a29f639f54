"""Deterministic Common-Crawl-style webpages corpus + HTML→text extraction.

The target input shape (BASELINE.json input_hint) is a Parquet table
``(url, warc_ts, html, text, lang)``. This module synthesizes it
deterministically (pure function of row index, seed fixed — FIXTURES.md
§1) and implements the extraction stage whose per-row invariant is
byte-identical ``extract(html) == text`` per url.

The generator is Zipfian over a synthetic vocabulary so head-term skew
(the reference-scale scenario that mandates salting) is exercised even
at small scale.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

VOCAB_SIZE = 5000
PHRASES = [
    "hello everybody",
    "the quick brown fox jumps over the lazy dog",
    "running runs run runner",
    "to be or not to be that is the question",
]
_LANGS = ["en"] * 18 + ["de", "fr"]

_BODY_RE = re.compile(rb"<body>(.*?)</body>", re.S)


_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _splitmix(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x += _GOLD
    x ^= x >> np.uint64(30)
    x *= _M1
    x ^= x >> np.uint64(27)
    x *= _M2
    x ^= x >> np.uint64(31)
    return x


def generate_webpages(start: int, count: int) -> pa.Table:
    """Rows [start, start+count) of the deterministic webpages table.

    Fully vectorized (the generator must not be the bottleneck when
    synthesizing the >=100k-doc bench corpus): Zipf-ish token ranks via
    splitmix64 inverse-CDF bias, per-row text assembled with Arrow's
    binary_join over a ListArray — no per-token Python.
    """
    ids = np.arange(start, start + count, dtype=np.uint64)
    lens = (3 + _splitmix(ids) % np.uint64(498)).astype(np.int64)

    # flat (doc, position) streams
    row_of_tok = np.repeat(np.arange(count), lens)
    pos = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(lens)[:-1])), lens
    )
    seed = ids[row_of_tok] * np.uint64(1_000_003) + pos.astype(np.uint64)
    u = (_splitmix(seed) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    codes = np.minimum(
        (VOCAB_SIZE * u**3.5).astype(np.int64), VOCAB_SIZE - 1
    )  # heavy head -> Zipf-like skew for salting scenarios

    # extended vocabulary: termK plus the phrase words (so phrase
    # insertion is pure code concatenation — no Python string arrays)
    phrase_words = list(dict.fromkeys(w for p in PHRASES for w in p.split()))
    vocab_strings = [f"term{k}" for k in range(VOCAB_SIZE)] + phrase_words
    word_code = {w: VOCAB_SIZE + i for i, w in enumerate(phrase_words)}

    # sprinkle fixed phrases on every 7th doc so reference-derived
    # queries (q02-q04: "hello", stemming, stopwords) have hits
    extra_rows, extra_codes = [], []
    for i in range(start, start + count):
        if i % 7 == 0:
            for w in PHRASES[i % len(PHRASES)].split():
                extra_rows.append(i - start)
                extra_codes.append(word_code[w])
    if extra_codes:
        codes = np.concatenate((codes, np.array(extra_codes, np.int64)))
        row_of_tok = np.concatenate(
            (row_of_tok, np.array(extra_rows, dtype=np.int64))
        )
        order = np.argsort(row_of_tok, kind="stable")  # phrases at row end
        codes = codes[order]
        row_of_tok = row_of_tok[order]

    counts = np.bincount(row_of_tok, minlength=count)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    flat_pa = pa.DictionaryArray.from_arrays(
        pa.array(codes.astype(np.int32)), pa.array(vocab_strings, pa.string())
    ).cast(pa.string())
    tok_list = pa.ListArray.from_arrays(pa.array(offsets), flat_pa)
    texts = pc.binary_join(tok_list, " ")

    idx = np.arange(start, start + count)
    # per-row f-strings are fine here: O(count), not O(tokens)
    urls = pa.array(
        [f"https://example-{i % 97}.com/p/{i}" for i in range(start, start + count)],
        pa.string(),
    )
    pre = pa.array(
        [
            f"<html><head><title>t{i}</title></head><body>"
            for i in range(start, start + count)
        ],
        pa.string(),
    )
    htmls = pc.binary_join_element_wise(
        pre, texts, pa.scalar("</body></html>"), ""
    ).cast(pa.binary())
    ts = pa.array(1_500_000_000_000_000 + idx * 1_000_000, pa.timestamp("us"))
    langs = pa.array(np.array(_LANGS, dtype=object)[idx % len(_LANGS)], pa.string())
    return pa.table(
        {"url": urls, "warc_ts": ts, "html": htmls, "text": texts, "lang": langs}
    )


def synth_webpages_parquet(
    out_dir: str, n_rows: int, rows_per_file: int = 50_000, row_group_size: int = 10_000
) -> list[str]:
    """Materialize the synthetic corpus once (cached by content key)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for fi, start in enumerate(range(0, n_rows, rows_per_file)):
        count = min(rows_per_file, n_rows - start)
        path = os.path.join(out_dir, f"webpages-{fi:05d}.parquet")
        paths.append(path)
        if os.path.exists(path):
            continue
        t = generate_webpages(start, count)
        tmp = path + ".tmp"
        pq.write_table(t, tmp, row_group_size=row_group_size)
        os.replace(tmp, path)
    return paths


def extract_text(html: bytes) -> bytes:
    """HTML→text extraction for the synthetic wrapper format."""
    m = _BODY_RE.search(html)
    return m.group(1) if m else b""


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """map_batches stage: derive ``text`` from ``html``.

    Vectorized: the wrapper format has fixed delimiters, so extraction is
    a pair of Arrow find+slice kernels — no per-row Python. Appends the
    extracted text as ``text_extracted`` so the invariant
    ``text_extracted == text`` is checkable downstream.
    """
    html = batch["html"]
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    s = html.cast(pa.string())
    # strip everything through <body>, then the closing tags — two RE2
    # passes over the column, no per-row Python
    txt = pc.replace_substring_regex(s, r"(?s)^.*?<body>", "", max_replacements=1)
    txt = pc.replace_substring_regex(txt, r"(?s)</body>.*$", "", max_replacements=1)
    # rows without a body wouldn't have matched: normalize them to ""
    has_body = pc.match_substring(s, "<body>")
    txt = pc.if_else(has_body, txt, "")
    return batch.append_column("text_extracted", txt)
