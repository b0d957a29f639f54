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
