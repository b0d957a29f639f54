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


def score_fuse(
    legs: list[list[tuple[int, float]]],
    weights: list[float] | None = None,
    *,
    k: int = 10,
    norm: str = "minmax",
) -> pa.Table:
    """Weighted SCORE fusion (the CombSUM family, Fox & Shaw TREC-2):
    each leg's scores are normalized to [0, 1] — ``minmax`` (x-min)/
    (max-min) or ``max`` x/max — then summed with per-leg weights;
    docs absent from a leg contribute 0 for it. Rank-only RRF is
    robust to score-scale mismatch; score fusion preserves WITHIN-leg
    margins — both are standard, this is the margin-preserving one.

    Returns top-``k`` by (fused desc, doc_id asc):
    (doc_id, fused, score_0, score_1, ...)."""
    if weights is None:
        weights = [1.0] * len(legs)
    if len(weights) != len(legs):
        raise ValueError("one weight per leg")
    if norm not in ("minmax", "max"):
        raise ValueError("norm must be 'minmax' or 'max'")
    all_ids = sorted({d for leg in legs for d, _ in leg})
    ids = np.asarray(all_ids, np.int64)
    fused = np.zeros(len(ids), np.float64)
    score_cols = []
    for leg, w in zip(legs, weights):
        col = np.zeros(len(ids), np.float64)
        if leg:
            ld = np.asarray([d for d, _ in leg], np.int64)
            ls = np.asarray([s for _, s in leg], np.float64)
            lo, hi = float(ls.min()), float(ls.max())
            if norm == "minmax":
                span = hi - lo
                ns = (ls - lo) / span if span > 0 else np.ones_like(ls)
            else:
                ns = ls / hi if hi > 0 else np.zeros_like(ls)
            col[np.searchsorted(ids, ld)] = ns
        score_cols.append(col)
        fused += w * col
    order = np.lexsort((ids, -fused))[:k]
    cols = {
        "doc_id": pa.array(ids[order]),
        "fused": pa.array(np.round(fused[order], 6)),
    }
    for i, col in enumerate(score_cols):
        cols[f"score_{i}"] = pa.array(np.round(col[order], 6))
    return pa.table(cols)
