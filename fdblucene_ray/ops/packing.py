"""Sequence packing — the "concat and chunk" layout step a training
pipeline runs after curation: every document's token stream is laid
into fixed-length training sequences in deterministic doc_id order, and
the op emits one row per (sequence, document) overlap span:

    (seq_id, doc_id, start_in_seq, start_in_doc, n_tokens)

which fully describes where each doc's tokens land (GPT-style packing
with documents split across sequence boundaries, no padding waste).

The hard part at scale is the GLOBAL exclusive prefix sum of per-doc
token counts in doc_id order. Shape (100 TB):

1. ONE vectorized ``map_batches`` pass tokenizes and keeps only
   ``(doc_id, n_tok, bucket)`` — 24 bytes/doc; text never leaves its
   block and is never shuffled.
2. Coarse buckets (``doc_id // bucket_size``): a tiny
   ``groupby(bucket).sum`` produces one row per bucket; the driver
   prefix-sums those B rows (B ~ corpus/1M — KBs even at 100 TB) and
   broadcasts the bucket-offset table via ``ray.put``.
3. ``groupby(bucket).map_groups`` sorts each bucket by doc_id, takes
   the local cumsum + broadcast bucket offset, and emits the span rows
   vectorized (``np.repeat``/``np.arange``) — each bucket's group fits
   comfortably in a worker (bucket_size × 24 bytes).

So the full-text corpus is read once, and the only exchanges are two
narrow shuffles over 3-int rows. The same two-phase partial/fold
pattern as the index build's field stats (index/build.py sentinel
partials; reference analog: the monotonic counter allocation in
FDBDirectory.java:152-171 is the single-writer version of this
"global order without a global lock" problem).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from fdblucene_ray.analysis.analyzer import BatchTokenizer


class _TokenCounts:
    """(doc_id, n_tok, bucket) per doc — stateful actor so the
    tokenizer's compiled machinery is built once."""

    def __init__(self, analyzer: str, bucket_size: int, text_col: str,
                 id_col: str):
        self.tokenizer = BatchTokenizer(analyzer)
        self.bucket_size = bucket_size
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        row_idx, _, _ = self.tokenizer.encoded_tokens(batch[self.text_col])
        n_tok = np.bincount(row_idx, minlength=n).astype(np.int64)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_tok": pa.array(n_tok),
                "bucket": pa.array(ids // self.bucket_size),
            }
        )



def _token_counts_batch(batch, *, analyzer, bucket_size, text_col, id_col):
    """Task wrapper: per-worker cached _TokenCounts."""
    from fdblucene_ray.ops.broadcast import cached_state

    st = cached_state(
        ("token_counts", analyzer, bucket_size, text_col, id_col),
        lambda: _TokenCounts(analyzer, bucket_size, text_col, id_col),
    )
    return st(batch)


def _span_factory(offsets_ref, seq_len: int):
    def emit_spans(group: pa.Table) -> pa.Table:
        bucket_offsets = ray.get(offsets_ref)
        g = group.sort_by([("doc_id", "ascending")])
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        n_tok = g["n_tok"].to_numpy(zero_copy_only=False)
        bucket = int(g["bucket"][0].as_py())
        base = int(bucket_offsets.get(bucket, 0))
        # exclusive local cumsum + global bucket offset
        off = base + np.concatenate(([0], np.cumsum(n_tok)[:-1]))

        keep = n_tok > 0
        ids, n_tok, off = ids[keep], n_tok[keep], off[keep]
        if not len(ids):
            return pa.table(
                {
                    "seq_id": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "start_in_seq": pa.array([], pa.int64()),
                    "start_in_doc": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        first_seq = off // seq_len
        last_seq = (off + n_tok - 1) // seq_len
        n_spans = (last_seq - first_seq + 1).astype(np.int64)
        doc_rep = np.repeat(np.arange(len(ids)), n_spans)
        # span index within each doc's run of sequences
        span_idx = np.arange(len(doc_rep)) - np.repeat(
            np.concatenate(([0], np.cumsum(n_spans)[:-1])), n_spans
        )
        seq = first_seq[doc_rep] + span_idx
        seq_start_tok = seq * seq_len
        lo = np.maximum(off[doc_rep], seq_start_tok)
        hi = np.minimum(off[doc_rep] + n_tok[doc_rep], seq_start_tok + seq_len)
        return pa.table(
            {
                "seq_id": pa.array(seq),
                "doc_id": pa.array(ids[doc_rep]),
                "start_in_seq": pa.array(lo - seq_start_tok),
                "start_in_doc": pa.array(lo - off[doc_rep]),
                "n_tokens": pa.array(hi - lo),
            }
        )

    return emit_spans


def pack_sequences(
    ds: ray.data.Dataset,
    seq_len: int = 128,
    *,
    bucket_size: int = 1000,
    analyzer: str = "simple",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Span layout of the corpus packed into ``seq_len``-token
    sequences in doc_id order. Returns a Dataset of
    (seq_id, doc_id, start_in_seq, start_in_doc, n_tokens)."""
    counts = ds.map_batches(
        _token_counts_batch,
        fn_kwargs=dict(
            analyzer=analyzer, bucket_size=bucket_size,
            text_col=text_col, id_col=id_col,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # counts feeds two consumers (bucket totals + span emission);
    # materialize the 24-byte/doc rows once so the 100-TB text read and
    # tokenize don't re-execute for the second consumer.
    counts = counts.materialize()
    # B bucket rows -> driver prefix sum -> broadcast. At 100 TB with
    # bucket_size=1M this is ~10^5 rows; take_all here is the
    # deliberate small-side materialization, not a corpus collect.
    bucket_sums = counts.groupby("bucket").sum("n_tok").take_all()
    bucket_sums.sort(key=lambda r: r["bucket"])
    offsets, acc = {}, 0
    for row in bucket_sums:
        offsets[row["bucket"]] = acc
        acc += row["sum(n_tok)"]
    offsets_ref = ray.put(offsets)
    return counts.groupby("bucket").map_groups(
        _span_factory(offsets_ref, seq_len), batch_format="pyarrow"
    )


class _ChunkDocs:
    """Per-batch sliding-window chunker: each doc's whitespace tokens
    are cut into windows of ``max_tokens`` starting every ``stride``
    tokens (overlap = max_tokens - stride). Window arithmetic is
    vectorized; only the final chunk-text joins touch Python strings
    (bounded by the emitted chunk count)."""

    def __init__(self, max_tokens: int, stride: int, text_col: str,
                 id_col: str):
        if not (0 < stride <= max_tokens):
            raise ValueError("need 0 < stride <= max_tokens")
        self.max_tokens, self.stride = max_tokens, stride
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from fdblucene_ray.ops.webtext import _ws_tokens

        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        row_idx, flat, counts, _ = _ws_tokens(batch[self.text_col])
        toks = flat.to_pylist()
        row_start = np.concatenate(([0], np.cumsum(counts[:-1])))
        n_chunks = -(-counts // self.stride)  # ceil; 0 tokens -> 0 chunks
        doc_of_chunk = np.repeat(np.arange(len(ids)), n_chunks)
        chunk_idx = np.concatenate(
            [np.arange(c) for c in n_chunks]
        ) if len(doc_of_chunk) else np.empty(0, np.int64)
        start_tok = chunk_idx * self.stride
        n_tok = np.minimum(
            self.max_tokens, counts[doc_of_chunk] - start_tok
        )
        g0 = row_start[doc_of_chunk] + start_tok
        texts = [
            " ".join(toks[a:b])
            for a, b in zip(g0.tolist(), (g0 + n_tok).tolist())
        ]
        return pa.table(
            {
                self.id_col: pa.array(ids[doc_of_chunk].astype(np.int64)),
                "chunk_idx": pa.array(chunk_idx.astype(np.int64)),
                "start_tok": pa.array(start_tok.astype(np.int64)),
                "n_tokens": pa.array(n_tok.astype(np.int64)),
                self.text_col: pa.array(texts, pa.string()),
            }
        )


def chunk_documents(
    ds: "ray.data.Dataset",
    *,
    max_tokens: int = 512,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Per-document sliding-window chunking (the long-document layout
    step for fixed-context training/embedding: windows of
    ``max_tokens`` whitespace tokens every ``stride`` tokens, the tail
    window short). Pure map — no shuffle; rows multiply by the
    overlap factor and stream straight to the consumer/sink."""
    import ray.data  # noqa: F401

    return ds.map_batches(
        _ChunkDocs(max_tokens, stride or max_tokens, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
