"""Graph-based ANN: per-partition Vamana graphs over the IVF centroid
layout (DiskANN — Subramanya et al., NeurIPS 2019; Vamana build =
greedy search + RobustPrune with the alpha slack).

This is the fourth ANN scale path beside IVF, sign-LSH and PQ/SQ8
(``ops/similarity.py``), for the regime those don't serve: high-recall
low-latency search where scanning even one IVF partition per probe is
too much I/O. A Vamana graph answers a query by walking O(log n) hops
of R neighbors instead of scoring the whole partition.

Layout (extends ``build_ivf_index``'s hive layout):

    {out_dir}/centroids.npy
    {out_dir}/data/centroid=K/*.parquet    vectors, one dir per centroid
    {out_dir}/graph/centroid=K.parquet     (vec_id, neighbors
                                            list<int64>, is_medoid)

100-TB design: the corpus is centroid-partitioned so each partition is
a shard bounded by ``n_centroids`` (size the centroid count so a
partition's vectors + R int32 edges fit one worker's heap — the same
assumption every DiskANN shard makes). Graphs build one task per
partition with NO shuffle (each builder reads exactly its partition's
files — on a real cluster that read is node-local), and the build is
RESUMABLE: a partition whose graph file already exists is skipped, so
a failed run re-does only missing partitions. Queries open only the
``nprobe`` probed partitions' graph+vector files; per-worker LRU
caching (``ops/broadcast.cached_state``) makes repeated query batches
pay the load once per worker.

Determinism: fixed seeds; every argsort tie-breaks on id, so two
builds of the same input are byte-identical (tested).

Reference analog: none — fdblucene has no vector search; this engine
adds ANN as a first-class index family next to the inverted index.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from fdblucene_ray.ops.broadcast import cached_state
from fdblucene_ray.ops.similarity import (
    _merge_topk,
    _normalize,
    _stack,
    build_ivf_index,
    partition_dirs,
    probed_partition_paths,
)


def _greedy_search(
    vecs_n: np.ndarray,
    adj: np.ndarray,
    entry: int,
    q_n: np.ndarray,
    L: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Beam search (DiskANN GreedySearch): walk the graph from
    ``entry`` keeping the ``L`` best-seen nodes; expand the best
    unexpanded one until the beam is fully expanded. Returns
    (visited node ids in visit order, their sims). Deterministic:
    ties in sim break toward the smaller node id."""
    n = len(vecs_n)
    seen = np.zeros(n, bool)
    expanded = np.zeros(n, bool)
    beam_ids = np.array([entry], np.int64)
    beam_sims = vecs_n[entry] @ q_n
    beam_sims = np.array([beam_sims], np.float64)
    seen[entry] = True
    visited = []
    vis_sims = []
    while True:
        cand = ~expanded[beam_ids]
        if not cand.any():
            break
        ci = np.flatnonzero(cand)[0]  # beam is kept sorted best-first
        u = int(beam_ids[ci])
        expanded[u] = True
        visited.append(u)
        vis_sims.append(beam_sims[ci])
        nbrs = adj[u]
        nbrs = nbrs[nbrs >= 0]
        nbrs = nbrs[~seen[nbrs]]
        if len(nbrs):
            seen[nbrs] = True
            sims = vecs_n[nbrs] @ q_n
            beam_ids = np.concatenate((beam_ids, nbrs))
            beam_sims = np.concatenate((beam_sims, sims))
            # sort best-first, id-ascending on ties; trim to L
            order = np.lexsort((beam_ids, -beam_sims))[:L]
            beam_ids = beam_ids[order]
            beam_sims = beam_sims[order]
    return np.asarray(visited, np.int64), np.asarray(vis_sims, np.float64)


def _lexsort_rows(ids2: np.ndarray, sims2: np.ndarray) -> np.ndarray:
    """Row-wise lexsort order (best sim first, id-ascending ties) for
    a (B, W) beam matrix — two chained STABLE axis argsorts instead of
    a per-row ``np.lexsort`` loop."""
    o1 = np.argsort(ids2, axis=1, kind="stable")
    sims_s = np.take_along_axis(sims2, o1, 1)
    o2 = np.argsort(-sims_s, axis=1, kind="stable")
    return np.take_along_axis(o1, o2, 1)


_PAD = np.int64(1) << 62  # sorts after every real node id


def _greedy_search_batch(
    vecs_n: np.ndarray,
    adj: np.ndarray,
    entry: int,
    Qn: np.ndarray,
    L: int,
) -> list[tuple[np.ndarray, np.ndarray]]:
    """``_greedy_search`` for a BATCH of queries against one
    partition's graph, advancing all beams in lockstep with masked
    numpy ops — one vectorized iteration expands one node per active
    query instead of a Python loop per query. Returns, per query, the
    (visited node ids, sims) arrays; the visited SETS and sims are
    identical to the scalar walk (determinism pytest), visit order is
    not reproduced (no caller depends on it — top-k re-sorts).

    Memory: two (B, n) bool masks per call — size the per-partition
    query batch accordingly (B is tens; n is one IVF partition)."""
    B = len(Qn)
    n = len(vecs_n)
    if not B or not n:
        return [(np.empty(0, np.int64), np.empty(0, np.float64))] * B
    seen = np.zeros((B, n), bool)
    expanded = np.zeros((B, n), bool)
    W = L  # beam capacity
    beam_ids = np.full((B, W), _PAD, np.int64)
    beam_sims = np.full((B, W), -np.inf, np.float64)
    beam_ids[:, 0] = entry
    beam_sims[:, 0] = Qn @ vecs_n[entry]
    seen[:, entry] = True
    visited: list[list[int]] = [[] for _ in range(B)]
    vis_sims: list[list[float]] = [[] for _ in range(B)]
    R = adj.shape[1]
    while True:
        valid = beam_ids < _PAD
        unexp = valid.copy()
        bi = np.clip(beam_ids, 0, n - 1)
        unexp &= ~np.take_along_axis(expanded, bi, 1)
        active = unexp.any(axis=1)
        if not active.any():
            break
        a_idx = np.flatnonzero(active)
        # first unexpanded slot per active beam (beam is best-first)
        slot = np.argmax(unexp[a_idx], axis=1)
        u = beam_ids[a_idx, slot]
        u_sim = beam_sims[a_idx, slot]
        expanded[a_idx, u] = True
        for j, b in enumerate(a_idx):
            visited[b].append(int(u[j]))
            vis_sims[b].append(float(u_sim[j]))
        nbrs = adj[u]  # (A, R)
        ok = nbrs >= 0
        nb = np.clip(nbrs, 0, n - 1)
        ok &= ~seen[a_idx[:, None], nb]
        seen[a_idx[:, None], np.where(ok, nb, 0)] |= ok
        # sims of fresh neighbors; masked slots stay -inf/_PAD
        sims = np.einsum(
            "ard,ad->ar", vecs_n[nb], Qn[a_idx]
        )
        new_ids = np.where(ok, nbrs, _PAD)
        new_sims = np.where(ok, sims, -np.inf)
        cat_ids = np.concatenate((beam_ids[a_idx], new_ids), axis=1)
        cat_sims = np.concatenate((beam_sims[a_idx], new_sims), axis=1)
        order = _lexsort_rows(cat_ids, cat_sims)[:, :W]
        beam_ids[a_idx] = np.take_along_axis(cat_ids, order, 1)
        beam_sims[a_idx] = np.take_along_axis(cat_sims, order, 1)
    return [
        (np.asarray(visited[b], np.int64),
         np.asarray(vis_sims[b], np.float64))
        for b in range(B)
    ]


def _robust_prune(
    p: int,
    cand: np.ndarray,
    vecs_n: np.ndarray,
    R: int,
    alpha: float,
) -> np.ndarray:
    """RobustPrune (DiskANN Algorithm 2) in cosine-distance form
    (d = 1 - sim; monotone with Euclidean on normalized vectors):
    repeatedly keep the candidate closest to ``p`` and drop every
    candidate it alpha-dominates (alpha * d(keep, c) <= d(p, c))."""
    cand = np.unique(cand)
    cand = cand[cand != p]
    if not len(cand):
        return cand
    d_p = 1.0 - vecs_n[cand] @ vecs_n[p]
    order = np.lexsort((cand, d_p))
    cand, d_p = cand[order], d_p[order]
    alive = np.ones(len(cand), bool)
    out = []
    while alive.any() and len(out) < R:
        i = int(np.flatnonzero(alive)[0])
        c = int(cand[i])
        out.append(c)
        alive[i] = False
        rest = np.flatnonzero(alive)
        if not len(rest):
            break
        d_c = 1.0 - vecs_n[cand[rest]] @ vecs_n[c]
        alive[rest[alpha * d_c <= d_p[rest]]] = False
    return np.asarray(out, np.int64)


def build_partition_graph(
    vecs: np.ndarray,
    *,
    R: int = 16,
    L: int = 32,
    alpha: float = 1.2,
    seed: int = 7,
) -> tuple[np.ndarray, int]:
    """Vamana over one partition: random R-regular init, then two
    passes (alpha=1.0 first, then ``alpha`` — the paper's schedule) of
    greedy-search + RobustPrune + reverse-edge insert. Returns
    (adjacency int64 (n, R) padded with -1, medoid index)."""
    vecs_n = _normalize(np.asarray(vecs, np.float64))
    n = len(vecs_n)
    if n == 0:
        return np.empty((0, R), np.int64), 0
    mean = vecs_n.mean(axis=0)
    sims_to_mean = vecs_n @ mean
    medoid = int(np.lexsort((np.arange(n), -sims_to_mean))[0])
    rng = np.random.default_rng(seed)
    adj = np.full((n, R), -1, np.int64)
    if n == 1:
        return adj, medoid
    k0 = min(R, n - 1)
    for i in range(n):
        nbrs = rng.choice(n - 1, size=k0, replace=False)
        nbrs = nbrs + (nbrs >= i)  # skip self
        adj[i, :k0] = np.sort(nbrs)
    order = rng.permutation(n)
    for a in (1.0, alpha):
        for i in order:
            i = int(i)
            visited, _ = _greedy_search(vecs_n, adj, medoid, vecs_n[i], L)
            cur = adj[i][adj[i] >= 0]
            newn = _robust_prune(
                i, np.concatenate((visited, cur)), vecs_n, R, a
            )
            adj[i] = -1
            adj[i, : len(newn)] = newn
            for j in newn:
                j = int(j)
                row = adj[j][adj[j] >= 0]
                if i in row:
                    continue
                if len(row) < R:
                    adj[j, len(row)] = i
                else:
                    pr = _robust_prune(
                        j, np.concatenate((row, [i])), vecs_n, R, a
                    )
                    adj[j] = -1
                    adj[j, : len(pr)] = pr
    return adj, medoid


class _BuildGraphTask:
    """One partition per call: read the partition's vectors (a local
    read on a real cluster), build its Vamana graph, write
    graph/centroid=K.parquet via temp + atomic rename. Skips
    partitions whose graph file already exists (resumable)."""

    def __init__(self, index_dir, vec_col, id_col, R, L, alpha):
        self.index_dir = index_dir
        self.vec_col, self.id_col = vec_col, id_col
        self.R, self.L, self.alpha = R, L, alpha

    def __call__(self, batch: pa.Table) -> pa.Table:
        done = []
        n_vecs = []
        for c in batch["centroid"].to_pylist():
            out_path = os.path.join(
                self.index_dir, "graph", f"centroid={c}.parquet"
            )
            if os.path.exists(out_path):
                done.append(c)
                n_vecs.append(pq.read_metadata(out_path).num_rows)
                continue
            files = [
                f
                for d in partition_dirs(self.index_dir, int(c))
                for f in sorted(glob.glob(os.path.join(d, "*.parquet")))
            ]
            t = pa.concat_tables(
                [pq.read_table(f, columns=[self.id_col, self.vec_col])
                 for f in files]
            )
            # stable global order inside the partition: sort by id so
            # the graph is independent of file/batch layout
            t = t.sort_by(self.id_col)
            vecs = _stack(t[self.vec_col])
            adj, medoid = build_partition_graph(
                vecs, R=self.R, L=self.L, alpha=self.alpha,
                seed=7 + int(c),
            )
            ids = t[self.id_col].to_numpy(zero_copy_only=False)
            flat = adj.ravel()
            valid = flat >= 0
            counts = (adj >= 0).sum(axis=1)
            offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
            nbr_ids = ids[flat[valid]].astype(np.int64)
            neighbors = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(nbr_ids, pa.int64())
            )
            is_med = np.zeros(len(ids), bool)
            is_med[medoid] = True
            gt = pa.table(
                {
                    self.id_col: t[self.id_col],
                    "neighbors": neighbors,
                    "is_medoid": pa.array(is_med),
                }
            )
            os.makedirs(os.path.dirname(out_path), exist_ok=True)
            tmp = out_path + f".tmp-{os.getpid()}"
            pq.write_table(gt, tmp)
            os.replace(tmp, out_path)
            done.append(c)
            n_vecs.append(len(ids))
        return pa.table(
            {"centroid": pa.array(done, pa.int64()),
             "n_vecs": pa.array(n_vecs, pa.int64())}
        )


def build_graph_index(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    n_centroids: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    R: int = 16,
    L_build: int = 32,
    alpha: float = 1.2,
    train: str = "sample",
    sample_rows: int = 2048,
    refresh: bool = False,
) -> np.ndarray:
    """Centroid-partition the corpus (reuses ``build_ivf_index``), then
    build one Vamana graph per partition — one task per partition, no
    shuffle, resumable. With ``refresh=True``, partitions whose data
    files (base or ``append_ivf_index`` batches) are newer than their
    graph are rebuilt — the lazy graph-repair pass after streaming
    appends. Returns the centroids."""
    cents = build_ivf_index(
        ds, out_dir, n_centroids=n_centroids, vec_col=vec_col,
        id_col=id_col, sample_rows=sample_rows, train=train,
    )
    parts = sorted(
        {
            int(d.split("=", 1)[1])
            for root in [os.path.join(out_dir, "data")]
            + glob.glob(os.path.join(out_dir, "data-append-*"))
            for d in os.listdir(root)
            if d.startswith("centroid=")
        }
    )

    def _stale(c: int, gpath: str) -> bool:
        if not refresh:
            return False
        gm = os.path.getmtime(gpath)
        return any(
            os.path.getmtime(f) > gm
            for d in partition_dirs(out_dir, c)
            for f in glob.glob(os.path.join(d, "*.parquet"))
        )

    todo = []
    for c in parts:
        gpath = os.path.join(out_dir, "graph", f"centroid={c}.parquet")
        if not os.path.exists(gpath):
            todo.append({"centroid": c})
        elif _stale(c, gpath):
            os.remove(gpath)
            todo.append({"centroid": c})
    if todo:
        ray.data.from_items(todo).map_batches(
            _BuildGraphTask(out_dir, vec_col, id_col, R, L_build, alpha),
            batch_size=1,
            batch_format="pyarrow",
        ).materialize()
    meta = {"R": R, "L_build": L_build, "alpha": alpha,
            "vec_col": vec_col, "id_col": id_col}
    meta_path = os.path.join(out_dir, "graph_meta.json")
    if not os.path.exists(meta_path):
        tmp = meta_path + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, meta_path)
    return cents


def _load_partition(index_dir: str, c: int, vec_col: str, id_col: str):
    """Worker-side load of one partition's vectors + graph, remapped
    to local indices. Cached per worker keyed by (dir, centroid,
    graph-file mtime) — a refreshed graph (after ``append_ivf_index``
    + ``build_graph_index(refresh=True)``) invalidates the cache
    instead of serving stale neighbors."""
    gpath = os.path.join(index_dir, "graph", f"centroid={c}.parquet")
    gen = os.path.getmtime(gpath)

    def build():
        files = [
            f
            for d in partition_dirs(index_dir, c)
            for f in sorted(glob.glob(os.path.join(d, "*.parquet")))
        ]
        t = pa.concat_tables(
            [pq.read_table(f, columns=[id_col, vec_col]) for f in files]
        ).sort_by(id_col)
        g = pq.read_table(
            os.path.join(index_dir, "graph", f"centroid={c}.parquet")
        )
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs_n = _normalize(_stack(t[vec_col]))
        gids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nbrs = g["neighbors"].combine_chunks()
        offs = nbrs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = nbrs.values.to_numpy(zero_copy_only=False).astype(np.int64)
        # global ids -> local row index (ids are sorted)
        flat_local = np.searchsorted(ids, flat)
        R = int((offs[1:] - offs[:-1]).max()) if len(gids) else 1
        adj = np.full((len(ids), max(R, 1)), -1, np.int64)
        # Place each graph node's edge list at the node's TRUE local
        # row (ids may include appended vectors not yet in the graph —
        # the lazy-refresh window after append_ivf_index — so the k-th
        # smallest graph id is NOT necessarily local row k).
        for gi in range(len(gids)):
            row = flat_local[offs[gi] : offs[gi + 1]]
            adj[np.searchsorted(ids, gids[gi]), : len(row)] = row
        med_mask = g["is_medoid"].to_numpy(zero_copy_only=False)
        med_gid = gids[med_mask][0] if med_mask.any() else gids[0]
        medoid = int(np.searchsorted(ids, med_gid))
        return ids, vecs_n, adj, medoid

    return cached_state(("graphann", index_dir, c, gen), build)


def _graph_search_batch(
    batch: pa.Table,
    *,
    index_dir: str,
    qn: np.ndarray,
    query_ids: np.ndarray,
    k: int,
    L_search: int,
    vec_col: str,
    id_col: str,
) -> pa.Table:
    """One row per (partition, query list) assignment: beam-search each
    query on the partition's graph, emit its top-k candidates."""
    out_q, out_v, out_s = [], [], []
    cents = batch["centroid"].to_pylist()
    qlists = batch["q_idx"].to_pylist()
    for c, q_idx in zip(cents, qlists):
        ids, vecs_n, adj, medoid = _load_partition(
            index_dir, int(c), vec_col, id_col
        )
        if not len(ids):
            continue
        q_idx = np.asarray(q_idx, np.int64)
        # all of this partition's queries advance in ONE lockstep
        # vectorized walk instead of a Python loop per query
        results = _greedy_search_batch(
            vecs_n, adj, medoid, qn[q_idx], L_search
        )
        for qi, (visited, sims) in zip(q_idx, results):
            kk = min(k, len(visited))
            order = np.lexsort((ids[visited], -sims))[:kk]
            out_q.append(np.full(kk, query_ids[qi], np.int64))
            out_v.append(ids[visited[order]])
            out_s.append(sims[order])
    if not out_q:
        return pa.table(
            {"query_id": pa.array([], pa.int64()),
             "vec_id": pa.array([], pa.int64()),
             "sim": pa.array([], pa.float64())}
        )
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "sim": pa.array(np.concatenate(out_s)),
        }
    )


def graph_topk_indexed(
    index_dir: str,
    queries: np.ndarray,
    query_ids,
    k: int = 10,
    *,
    nprobe: int = 2,
    L_search: int = 48,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Approximate top-k over a ``build_graph_index`` layout: each
    query beam-searches the graphs of its ``nprobe`` nearest-centroid
    partitions only; per-partition candidates merge on the driver
    (k rows per query per probe — tiny)."""
    probe, _ = probed_partition_paths(index_dir, queries, nprobe)
    qn = _normalize(np.asarray(queries, np.float64))
    per_part: dict[int, list[int]] = {}
    for qi in range(len(qn)):
        for c in probe[qi]:
            c = int(c)
            if os.path.exists(
                os.path.join(index_dir, "graph", f"centroid={c}.parquet")
            ):
                per_part.setdefault(c, []).append(qi)
    if not per_part:
        return pa.table(
            {"query_id": pa.array([], pa.int64()),
             "vec_id": pa.array([], pa.int64()),
             "sim": pa.array([], pa.float64())}
        )
    items = [
        {"centroid": c, "q_idx": q} for c, q in sorted(per_part.items())
    ]
    cand = ray.data.from_items(items).map_batches(
        _graph_search_batch,
        fn_kwargs=dict(
            index_dir=index_dir, qn=qn,
            query_ids=np.asarray(query_ids, np.int64), k=k,
            L_search=L_search, vec_col=vec_col, id_col=id_col,
        ),
        batch_size=1,
        batch_format="pyarrow",
    )
    return _merge_topk(cand.to_pandas(), k)
