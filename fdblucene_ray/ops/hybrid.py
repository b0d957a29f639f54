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


def mmr_rerank(
    hits: list[tuple[int, float]],
    emb_source,
    k: int = 10,
    *,
    lam: float = 0.7,
    vec_col: str = "embedding",
) -> list[tuple[int, float]]:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): greedily pick argmax of

        lam * rel(d) - (1 - lam) * max_{s in S} cos(d, s)

    over the CANDIDATE hits (a retriever's top-N), diversifying the
    final top-k — the standard redundancy-removal step between
    retrieval and an LLM context window. Ties (score, then doc id)
    are deterministic.

    Scale shape: candidates are top-N (tens to hundreds), so the
    embeddings hydrate row-group-pruned for exactly those ids and the
    greedy loop is k x N dot products on the driver — the corpus is
    never touched beyond the retriever's own pass."""
    from fdblucene_ray.sources.corpus import hydrate_from_source

    if not hits:
        return []
    ids = np.array([d for d, _ in hits], np.int64)
    rel = np.array([s for _, s in hits], np.float64)
    tbl = hydrate_from_source(emb_source, ids.tolist(), columns=[vec_col])
    hid = tbl["doc_id"].to_numpy(zero_copy_only=False)
    arr = tbl[vec_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    V = flat.reshape(len(arr), -1)
    # align to hits order
    order = np.argsort(hid)
    pos = np.searchsorted(hid[order], ids)
    V = V[order][pos]
    norms = np.linalg.norm(V, axis=1)
    norms[norms == 0] = 1.0
    Vn = V / norms[:, None]

    n = len(ids)
    k = min(k, n)
    selected: list[int] = []
    max_sim = np.full(n, -np.inf)
    taken = np.zeros(n, bool)
    for _ in range(k):
        if selected:
            score = lam * rel - (1.0 - lam) * max_sim
        else:
            score = lam * rel
        score = np.where(taken, -np.inf, score)
        best = int(np.lexsort((ids, -score))[0])
        selected.append(best)
        taken[best] = True
        sims = Vn @ Vn[best]
        np.maximum(max_sim, sims, out=max_sim)
    pre = _max_sim_at_selection(selected, len(rel), Vn)
    return [
        (int(ids[i]), float(lam * rel[i] - (1.0 - lam) * pre[j]))
        for j, i in enumerate(selected)
    ]


def _max_sim_at_selection(selected, n, Vn):
    """Replay the max-similarity value each pick saw AT selection time
    (0.0 for the first pick) so the realized MMR score is reportable."""
    out = []
    max_sim = np.full(n, -np.inf)
    for j, i in enumerate(selected):
        out.append(0.0 if j == 0 else float(max_sim[i]))
        np.maximum(max_sim, Vn @ Vn[i], out=max_sim)
    return out
