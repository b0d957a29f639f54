"""Flagship pipeline: Common-Crawl-style webpages end to end.

The BASELINE.json input_hint contract in one pipeline:

    Parquet (url, warc_ts, html, text, lang)
      -> deterministic doc ids (row-group bases)
      -> map_batches(extract_text_batch)      html -> text, vectorized
      -> per-row invariant: extracted text is byte-identical to the
         shipped ``text`` column (rows violating it are COUNTED and
         the build fails loudly unless allow_mismatch)
      -> inverted-index build over the EXTRACTED text (lucene chain)
         + keyword url field + doc store for hydration
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.manifest import Manifest
from fdblucene_ray.sources.corpus import corpus_signature, read_corpus_with_doc_ids
from fdblucene_ray.sources.webpages import extract_text_batch


class ExtractAndCheck:
    """map_batches stage: derive text from html and enforce the per-row
    byte-identity invariant (BASELINE.json input_hint)."""

    def __init__(self, strict: bool = True):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = extract_text_batch(batch)
        eq = pc.equal(out["text_extracted"], out["text"])
        bad = out.filter(pc.invert(eq))
        if bad.num_rows and self.strict:
            urls = bad["url"].to_pylist()[:3]
            raise ValueError(
                f"extraction invariant violated for {bad.num_rows} rows "
                f"(e.g. {urls}): extract(html) != text"
            )
        out = out.drop_columns(["html", "text"])
        return out.rename_columns(
            ["text" if c == "text_extracted" else c for c in out.column_names]
        )


def build_webpages_index(
    paths,
    index_dir: str,
    *,
    num_partitions: int | None = None,
    batch_size: int = 2048,
    strict_invariant: bool = True,
    positions: bool = False,
    docstore: bool = True,
    resume: bool = True,
) -> Manifest:
    """Full input_hint pipeline -> published index manifest."""
    fields = {
        "text": {"column": "text", "analyzer": "lucene", "positions": positions},
        "url": {"column": "url", "analyzer": "keyword"},
    }
    sig = corpus_signature(paths, f"webflagship:{positions}:{num_partitions}")
    # paths + preprocess -> the spill exchange runs the whole chain
    # (pruned read -> html extract + invariant -> tokenize -> spill ->
    # encode) inside the tokenizer actors, no Dataset sort shuffle
    manifest = build_index(
        paths,
        index_dir,
        fields=fields,
        preprocess=ExtractAndCheck(strict_invariant),
        read_columns=["url", "html", "text"],
        num_partitions=num_partitions,
        batch_size=batch_size,
        resume=resume,
        signature=sig,
    )
    if docstore:
        # the stored fields are SOURCE columns, so the doc store is a
        # column-pruned re-read of the input parquet — html is never
        # read and extraction never runs a second time (at 100 TB the
        # HTML decode is the expensive stage; it must run exactly once)
        from fdblucene_ray.index.build import _write_docstore

        store_ds = read_corpus_with_doc_ids(
            paths, columns=["url", "warc_ts", "lang"]
        )
        _write_docstore(index_dir, store_ds)
    return manifest
