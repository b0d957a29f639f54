"""Highlighting: char-offset spans + snippets for top-k hits.

The reference stores (startOffset, endOffset, payload) per position
(DATA.md:54). At 100 TB materializing char offsets for every posting
bloats the index for a feature only the top-k hits of a query ever
need, so this engine derives offsets AT HYDRATE TIME instead: the k hit
documents' stored text is re-analyzed row-wise (k docs, not a corpus
pass) with an offset-preserving twin of the analyzer chain. This is an
intentional, documented deviation from the reference's at-rest layout;
the user-facing capability (highlight spans / snippets) is equivalent.

Per-position payloads (the reference's third slot, which the Writer
approach never populates — DATA.md:54 notes the family exists for
Lucene compatibility) and AT-REST offsets are modeled by the optional
term-vectors sidecar (``index/termvectors.py``): doc-major stored
spans + payloads, read per hit with doc_id predicate pushdown.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from fdblucene_ray.analysis.analyzer import _TOKEN_RE, get_analyzer


@dataclass(frozen=True)
class Span:
    start: int  # char offset, inclusive
    end: int  # char offset, exclusive
    term: str  # analyzed term that matched


def token_spans(analyzer, text: str) -> list[tuple[str, int, int]]:
    """(analyzed_term, start, end) per surviving token, in text order.
    The offset-preserving twin of ``Analyzer.tokens``: same lowercase ->
    word-split -> stopword -> stem chain, but via finditer so each
    token keeps its char span in the ORIGINAL text."""
    az = get_analyzer(analyzer)
    if text is None:
        return []
    hay = text.lower() if az.lowercase else text
    out = []
    for m in _TOKEN_RE.finditer(hay):
        tok = m.group()
        if az.stopwords and tok in az.stopwords:
            continue
        term = az.stem(tok) if az.stem is not None else tok
        out.append((term, m.start(), m.end()))
    return out


def highlight_spans(analyzer, text: str, terms) -> list[Span]:
    """Char spans of every occurrence of the query ``terms`` (already
    analyzed) in ``text``, in document order."""
    wanted = set(terms)
    return [
        Span(s, e, t) for t, s, e in token_spans(analyzer, text) if t in wanted
    ]


def make_snippet(
    text: str,
    spans: list[Span],
    *,
    window: int = 60,
    pre: str = "<em>",
    post: str = "</em>",
) -> str:
    """One highlighted snippet around the densest span cluster: the
    window is centered on the first span; all spans inside it are
    wrapped with pre/post tags; ellipses mark truncation."""
    if not spans:
        return text[: 2 * window] + ("..." if len(text) > 2 * window else "")
    lo = max(0, spans[0].start - window)
    hi = min(len(text), spans[0].end + window)
    inside = [sp for sp in spans if sp.start >= lo and sp.end <= hi]
    parts = []
    cur = lo
    for sp in inside:
        parts.append(text[cur : sp.start])
        parts.append(pre + text[sp.start : sp.end] + post)
        cur = sp.end
    parts.append(text[cur:hi])
    body = "".join(parts)
    return ("..." if lo > 0 else "") + body + ("..." if hi < len(text) else "")


def highlight_hits(
    searcher,
    query: str,
    k: int = 10,
    *,
    field: str = "text",
    text_col: str = "text",
    window: int = 60,
) -> list[dict]:
    """Search + hydrate + highlight the top-k hits. Requires the index
    to have been built with ``docstore_cols`` including ``text_col``
    (S16/J3); only the k hit docs are read (predicate pushdown) and
    re-analyzed."""
    from fdblucene_ray.index.build import hydrate

    az_name = searcher.manifest.analyzers.get(field, "lucene")
    terms = searcher.parse(query, field)
    hits = searcher.search(query, k, field=field)
    if not hits:
        return []
    table = hydrate(
        searcher.index_dir, [d for d, _ in hits], columns=["doc_id", text_col]
    )
    texts = dict(zip(table["doc_id"].to_pylist(), table[text_col].to_pylist()))
    out = []
    for doc, score in hits:
        text = texts.get(doc, "")
        spans = highlight_spans(az_name, text, terms)
        out.append(
            {
                "doc_id": doc,
                "score": score,
                "spans": [(sp.start, sp.end) for sp in spans],
                "snippet": make_snippet(text, spans, window=window),
            }
        )
    return out
