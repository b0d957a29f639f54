"""Hybrid retrieval — Reciprocal Rank Fusion of lexical (BM25) and
dense (embedding-cosine) rankings, the standard way modern search
stacks combine an inverted index with an ANN index (Cormack, Clarke &
Buettcher, SIGIR 2009: ``score(d) = sum_i 1/(c + rank_i(d))``).

Ray shape: both legs are existing scale paths — BM25 top-depth from the
inverted index (block-max WAND) and cosine top-depth from the embedding
table (broadcast query matrix, per-batch matmul, ops/similarity.py).
Only the two depth-bounded rank lists meet at the fuse step, which is a
tiny vectorized join — the corpus never moves for the fusion itself.

Reference tie-in: the lexical leg is the reference's Layer-C search
surface (SimpleFDBDirectoryTest.java:149-158); the fusion layer is the
training-data-era extension the round brief's similarity-search family
calls for.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def rrf_fuse(
    rankings: list[list[int]],
    *,
    k: int = 10,
    c: int = 60,
) -> pa.Table:
    """Fuse ranked doc-id lists: ``rrf(d) = sum_i 1/(c + rank_i(d))``
    with 1-based ranks; docs absent from a list contribute nothing for
    it. Returns top-``k`` by (rrf desc, doc_id asc) with one rank
    column per input list (0 = absent).

    Column names: doc_id, rrf, rank_0, rank_1, ... rank_{n-1}.
    """
    all_ids = sorted({d for lst in rankings for d in lst})
    ids = np.asarray(all_ids, np.int64)
    rrf = np.zeros(len(ids), np.float64)
    rank_cols = []
    for lst in rankings:
        ranks = np.zeros(len(ids), np.int64)
        if lst:
            lst_ids = np.asarray(lst, np.int64)
            pos = np.searchsorted(ids, lst_ids)
            ranks[pos] = np.arange(1, len(lst) + 1)
        rank_cols.append(ranks)
        with np.errstate(divide="ignore"):
            contrib = np.where(ranks > 0, 1.0 / (c + ranks), 0.0)
        rrf += contrib
    order = np.lexsort((ids, -rrf))[:k]
    cols = {
        "doc_id": pa.array(ids[order]),
        "rrf": pa.array(np.round(rrf[order], 6)),
    }
    for i, ranks in enumerate(rank_cols):
        cols[f"rank_{i}"] = pa.array(ranks[order])
    return pa.table(cols)


def hybrid_search(
    searcher,
    terms: list[str],
    emb_ds,
    query_vecs: np.ndarray,
    query_id: int = 0,
    *,
    k: int = 10,
    depth: int = 50,
    c: int = 60,
    field: str = "text",
) -> pa.Table:
    """BM25 + cosine hybrid: top-``depth`` from each leg, RRF-fused to
    top-``k``. ``emb_ds`` is a Dataset with (vec_id, embedding) whose
    vec_id shares the doc_id space. Columns:
    (doc_id, rrf, bm25_rank, ann_rank)."""
    from fdblucene_ray.ops.similarity import brute_force_topk

    bm25 = [d for d, _ in searcher.search_terms(terms, depth, field=field)]
    ann_tbl = brute_force_topk(emb_ds, query_vecs, [query_id], k=depth)
    ann = ann_tbl["vec_id"].to_pylist()
    fused = rrf_fuse([bm25, ann], k=k, c=c)
    return fused.rename_columns(["doc_id", "rrf", "bm25_rank", "ann_rank"])
