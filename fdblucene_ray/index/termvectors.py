"""Term vectors sidecar: per-doc (term, positions, char offsets, optional
payloads) stored as doc_id-keyed parquet.

At-rest analog of the reference's per-position family
``("pp", field, term, docID, position) -> (startOffset, endOffset,
payload)`` (DATA.md:54) — but stored DOC-major (one row per (doc, term)
with list-typed positions/starts/ends), the Lucene *term vectors* layout
rather than the posting-major layout. Rationale, mirroring
``index/highlight.py``: offsets/payloads are a per-hit concern; doc-major
rows + parquet row-group pruning on doc_id read only the hit documents at
query time, while the posting files stay lean for scoring. Payloads (the
reference family's third slot, which the Writer approach itself never
populates) are supported through ``payload_fn`` and stored per position
when provided.

Build: an actor-pool ``map_batches`` stage over the corpus. The span
extraction is per-document ``finditer`` (each document's offsets are an
inherently sequential scan, as in Lucene's per-doc inversion); the loop
is bounded per batch and runs once at build time.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pyarrow as pa
import ray
import ray.data

from fdblucene_ray.index.highlight import Span, token_spans


class TermVectorRows:
    """map_batches callable: docs -> one row per (doc, term) with
    positions / start / end lists (and payloads when ``payload_fn``
    is given: ``payload_fn(term, position) -> bytes``)."""

    def __init__(
        self,
        analyzer: str = "lucene",
        text_col: str = "text",
        id_col: str = "doc_id",
        payload_fn: Callable[[str, int], bytes] | None = None,
    ):
        self.analyzer = analyzer
        self.text_col, self.id_col = text_col, id_col
        self.payload_fn = payload_fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_doc, out_term, out_pos, out_start, out_end, out_pay = (
            [], [], [], [], [], [],
        )
        for doc_id, text in zip(ids, texts):
            spans = token_spans(self.analyzer, text or "")
            per_term: dict[str, list[tuple[int, int, int]]] = {}
            for pos, (term, s, e) in enumerate(spans):
                per_term.setdefault(term, []).append((pos, s, e))
            for term in sorted(per_term):
                occ = per_term[term]
                out_doc.append(doc_id)
                out_term.append(term)
                out_pos.append([p for p, _, _ in occ])
                out_start.append([s for _, s, _ in occ])
                out_end.append([e for _, _, e in occ])
                if self.payload_fn is not None:
                    out_pay.append([self.payload_fn(term, p) for p, _, _ in occ])
        cols = {
            "doc_id": pa.array(out_doc, pa.int64()),
            "term": pa.array(out_term, pa.string()),
            "positions": pa.array(out_pos, pa.list_(pa.int32())),
            "starts": pa.array(out_start, pa.list_(pa.int32())),
            "ends": pa.array(out_end, pa.list_(pa.int32())),
        }
        if self.payload_fn is not None:
            cols["payloads"] = pa.array(out_pay, pa.list_(pa.binary()))
        return pa.table(cols)


def build_term_vectors(
    source,
    tv_dir: str,
    *,
    analyzer: str = "lucene",
    text_col: str = "text",
    id_col: str = "doc_id",
    payload_fn: Callable[[str, int], bytes] | None = None,
    concurrency: int | tuple[int, int] | None = None,
    doc_base: int = 0,
) -> str:
    """Write the term-vectors sidecar for a corpus (parquet paths or a
    Dataset already carrying ``id_col``). Idempotent: written to a temp
    dir and atomically renamed (the S2/S12 temp->rename pattern)."""
    import shutil

    from fdblucene_ray.sources.corpus import read_corpus_with_doc_ids

    if isinstance(source, (str, list, tuple)):
        ds = read_corpus_with_doc_ids(source, columns=[text_col], base=doc_base)
    else:
        ds = source
    if os.path.isdir(tv_dir):
        return tv_dir
    if concurrency is None:
        # leave headroom for read tasks: an actor pool holding every CPU
        # starves the upstream read stage (same sizing rule as the build
        # tokenizer pool, build.py tokenize_concurrency)
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = (1, max(1, (cpus * 2) // 3))
    rows = ds.map_batches(
        TermVectorRows,
        fn_constructor_kwargs=dict(
            analyzer=analyzer,
            text_col=text_col,
            id_col=id_col,
            payload_fn=payload_fn,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
    tmp = tv_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    rows.write_parquet(tmp)
    try:
        os.rename(tmp, tv_dir)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return tv_dir


def read_term_vector(tv_dir: str, doc_id: int, terms=None) -> pa.Table:
    """One doc's term vector (optionally restricted to ``terms``), via
    doc_id predicate pushdown — row groups whose stats exclude the id
    are never read."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    dataset = pads.dataset(tv_dir, format="parquet")
    expr = pc.field("doc_id") == int(doc_id)
    if terms is not None:
        expr = expr & pc.field("term").isin(list(terms))
    return dataset.to_table(filter=expr).sort_by("term")


def spans_from_vector(tv: pa.Table) -> list[Span]:
    """Flatten a term-vector table back to doc-order char spans —
    identical to ``highlight.highlight_spans`` output for the same
    analyzer/terms (tested identity)."""
    spans = []
    for row in tv.to_pylist():
        for s, e in zip(row["starts"], row["ends"]):
            spans.append(Span(s, e, row["term"]))
    spans.sort(key=lambda sp: (sp.start, sp.end))
    return spans


def highlight_from_vectors(tv_dir: str, doc_id: int, terms) -> list[Span]:
    """Highlight spans for one hit doc WITHOUT re-analyzing its text —
    the stored-offsets path (reference parity: offsets read from the
    index, DATA.md:54)."""
    return spans_from_vector(read_term_vector(tv_dir, doc_id, terms))


_PAYLOAD_AGGS = {"avg": np.mean, "max": np.max, "min": np.min, "sum": np.sum}


def payload_score(
    tv_dir: str,
    term: str,
    *,
    agg: str = "avg",
    decoder: Callable[[bytes], float] | None = None,
    doc_ids=None,
    k: int | None = None,
) -> pa.Table:
    """PayloadScoreQuery analog (query-time use of the DATA.md:54
    payload slot): every doc containing ``term`` scored by aggregating
    the decoded per-position payload values at that term's positions.

    ``decoder`` turns one payload cell into a float (default:
    little-endian float32, the PayloadHelper.encodeFloat twin).
    ``doc_ids`` optionally restricts to a candidate set (e.g. hits from
    a BM25 pass) via parquet predicate pushdown — the sidecar is
    doc-major, so hit-time reads stay bounded like doclens lookups.
    Returns (doc_id, score) sorted by score desc, doc_id asc, top-k
    when ``k`` is given."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    if agg not in _PAYLOAD_AGGS:
        raise ValueError(f"agg must be one of {sorted(_PAYLOAD_AGGS)}")
    fn = _PAYLOAD_AGGS[agg]
    if decoder is None:
        decoder = lambda b: float(np.frombuffer(b, "<f4")[0])  # noqa: E731
    dataset = pads.dataset(tv_dir, format="parquet")
    if "payloads" not in dataset.schema.names:
        raise ValueError(f"term-vector sidecar {tv_dir} stores no payloads")
    expr = pc.field("term") == term
    if doc_ids is not None:
        expr = expr & pc.field("doc_id").isin([int(d) for d in doc_ids])
    t = dataset.to_table(filter=expr, columns=["doc_id", "payloads"])
    docs = t["doc_id"].to_numpy(zero_copy_only=False)
    pays = t["payloads"].to_pylist()
    scores = np.asarray(
        [fn([decoder(cell) for cell in row]) for row in pays], np.float64
    )
    order = np.lexsort((docs, -scores))
    if k is not None:
        order = order[:k]
    return pa.table(
        {
            "doc_id": pa.array(docs[order].astype(np.int64)),
            "score": pa.array(scores[order]),
        }
    )
