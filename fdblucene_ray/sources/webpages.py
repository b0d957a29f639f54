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

import hashlib
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


def _hash_u64(x: int) -> int:
    return int.from_bytes(hashlib.blake2b(x.to_bytes(8, "little"), digest_size=8).digest(), "little")


def _zipf_rank(u: float, n: int, s: float = 1.07) -> int:
    """Map uniform u in [0,1) to a Zipf-ish rank in [0, n) (inverse-CDF
    approximation via the power-law tail; deterministic)."""
    # ranks ~ u^{-1/(s-1)} style heavy tail, clamped
    r = int(n * (u ** 3.5))  # cubic bias toward 0 → heavy head
    return min(r, n - 1)


def _doc_tokens(i: int) -> list[str]:
    h = _hash_u64(i)
    length = 3 + (h % 498)
    toks = []
    for j in range(length):
        u = (_hash_u64(i * 1_000_003 + j) % 2**53) / 2**53
        toks.append(f"term{_zipf_rank(u, VOCAB_SIZE)}")
    # sprinkle fixed phrases so reference-derived queries (q02-q04) have hits
    if i % 7 == 0:
        toks.extend(PHRASES[i % len(PHRASES)].split())
    return toks


def generate_webpages(start: int, count: int) -> pa.Table:
    """Rows [start, start+count) of the deterministic webpages table."""
    urls, ts, htmls, texts, langs = [], [], [], [], []
    for i in range(start, start + count):
        text = " ".join(_doc_tokens(i))
        url = f"https://example-{i % 97}.com/p/{i}"
        html = (
            b"<html><head><title>t" + str(i).encode() + b"</title></head><body>"
            + text.encode() + b"</body></html>"
        )
        urls.append(url)
        ts.append(1_500_000_000_000_000 + i * 1_000_000)  # us epoch
        htmls.append(html)
        texts.append(text)
        langs.append(_LANGS[i % len(_LANGS)])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
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
