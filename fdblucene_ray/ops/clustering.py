"""Embedding clustering as a first-class training-data op.

Two surfaces:

- ``assign_fixed_centroids`` — L2 argmin assignment against a given
  (small, broadcast) centroid matrix. SQL-expressible: the DuckDB twin
  computes ``list_distance(embedding::DOUBLE[], centroid)`` per
  (vector, centroid) pair and takes the per-vector argmin with the same
  (dist, cid) tie order. Emitting only integer columns (vec_id,
  cluster) keeps the oracle compare exact — no float round-off channel.

- ``kmeans_cluster_sizes`` — full distributed Lloyd's k-means (reuses
  ``similarity.train_centroids_distributed``: per-batch (count, sum)
  partials, K x D driver fold) followed by a streaming assignment pass
  and a facet-cardinality-bounded size aggregate. Non-SQL-expressible
  (iterative); pytest holds the self-consistency oracle (final
  assignment == numpy argmin against the final centroids; sizes sum to
  N).

Scale shape: centroids are K x D floats broadcast once via ``ray.put``;
the corpus streams through ``map_batches`` exactly once per Lloyd's
iteration plus once for assignment; nothing materializes driver-side
except K-sized partials. Reference tie-in: clustering backs the IVF
partitioned ANN layout (ops/similarity.py) — this module exposes it as
a user-facing op (SURVEY.md §2.8 training-data families).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


from contextlib import contextmanager


@contextmanager
def _hash_shuffle(*datasets):
    """Force hash-shuffle on the given datasets' captured DataContexts
    (and the global one) for the scope. Ray's sort-based shuffle emits
    empty blocks with NO schema, which the streaming executor logs as
    'RefBundle with a different schema' warnings on every groupby whose
    output has empty partitions; the hash shuffle path emits typed
    blocks. Each Dataset carries a COPY of the DataContext captured at
    source creation and groupby consults ``dataset.context``, so the
    captured copies must be patched too (see index/build.py
    _shuffle_strategy for the full capture-semantics story)."""
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctxs = [DataContext.get_current()]
    for d in datasets:
        if d is not None and d.context not in ctxs:
            ctxs.append(d.context)
    prev = [c.shuffle_strategy for c in ctxs]
    try:
        for c in ctxs:
            c.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        yield
    finally:
        for c, p in zip(ctxs, prev):
            c.shuffle_strategy = p


def _stack64(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


class _AssignL2:
    """Per-batch L2 argmin against the broadcast centroid matrix.

    dist^2 = ||x||^2 - 2 x.C^T + ||c||^2 (one matmul per batch);
    np.argmin returns the FIRST minimum — the (dist, cid) tie order the
    oracle uses."""

    def __init__(self, centroids_ref, vec_col: str, id_col: str):
        c = (
            ray.get(centroids_ref)
            if not isinstance(centroids_ref, np.ndarray)
            else centroids_ref
        )
        self.c = np.asarray(c, np.float64)
        self.c_norm2 = (self.c * self.c).sum(axis=1)
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = _stack64(batch[self.vec_col])
        d2 = (
            (x * x).sum(axis=1)[:, None]
            - 2.0 * (x @ self.c.T)
            + self.c_norm2[None, :]
        )
        assign = np.argmin(d2, axis=1).astype(np.int32)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "cluster": pa.array(assign),
            }
        )


def assign_fixed_centroids(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Stream (id, cluster) for every vector: nearest centroid by L2.
    The small centroid matrix ships in fn_kwargs to stateless tasks
    (per-worker cached build); huge codebooks would broadcast via
    ray.put + an actor pool."""
    c = np.asarray(centroids, np.float64)

    def assign(batch: pa.Table) -> pa.Table:
        from fdblucene_ray.ops.broadcast import cached_state

        st = cached_state(
            ("assign_l2", c.tobytes()[:64], c.shape, vec_col, id_col),
            lambda: _AssignL2(c, vec_col, id_col),
        )
        return st(batch)

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_cluster_sizes(
    ds: ray.data.Dataset,
    k: int,
    *,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[pa.Table, np.ndarray]:
    """Distributed k-means then streamed assignment; returns
    ((cluster, n) sizes table, final centroid matrix). Uses the
    cosine-normalized trainer shared with the IVF index so cluster
    geometry matches the ANN layout."""
    from fdblucene_ray.ops.similarity import (
        assign_centroid_batch,
        train_centroids_distributed,
    )

    cents = train_centroids_distributed(ds, k, iters=iters, vec_col=vec_col)
    assigned = ds.map_batches(
        assign_centroid_batch,
        fn_kwargs=dict(centroids=cents, vec_col=vec_col),
        batch_format="pyarrow",
    ).select_columns([id_col, "centroid"])

    def _partial_sizes(b: pa.Table) -> pa.Table:
        cent = b["centroid"].to_numpy(zero_copy_only=False)
        counts = np.bincount(cent, minlength=k).astype(np.int64)
        return pa.table(
            {
                "cluster": pa.array(np.arange(k, dtype=np.int32)),
                "n": pa.array(counts),
            }
        )

    partials = assigned.map_batches(
        _partial_sizes, batch_format="pyarrow"
    ).to_pandas()
    sizes = (
        partials.groupby("cluster", as_index=False)["n"].sum().sort_values("cluster")
    )
    table = pa.table(
        {
            "cluster": pa.array(sizes["cluster"].to_numpy(np.int32)),
            "n": pa.array(sizes["n"].to_numpy(np.int64)),
        }
    )
    return table, cents


def _cov_partials_batch(batch: pa.Table, *, vec_col: str) -> pa.Table:
    """One row per batch: flattened (D,) sum and (D*D,) outer-product
    sum plus the row count — the sufficient statistics for PCA. Only
    O(D^2) floats leave the worker per batch."""
    x = _stack64(batch[vec_col])
    return pa.table(
        {
            "n": pa.array([len(x)], pa.int64()),
            "s": pa.array([x.sum(axis=0)], pa.list_(pa.float64())),
            "ss": pa.array([(x.T @ x).ravel()], pa.list_(pa.float64())),
        }
    )


def embedding_pca(
    ds: ray.data.Dataset,
    n_components: int = 8,
    *,
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distributed PCA via covariance sufficient statistics: one
    map-only pass emits per-batch (n, Σx, ΣxxT) partials (O(D²) each),
    the driver folds them and eigendecomposes the D×D covariance —
    the corpus itself never leaves the workers, so this is the same
    shape at 10^12 rows.

    Returns (components[k,D], explained_variance_ratio[k], mean[D]).
    Component signs are fixed (largest-|coef| coordinate positive) so
    results are deterministic across runs and block orders.
    """
    parts = ds.map_batches(
        _cov_partials_batch,
        fn_kwargs=dict(vec_col=vec_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    n = sum(int(r["n"]) for r in parts)
    if n == 0:
        raise ValueError("empty dataset")
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    ss = np.sum([np.asarray(r["ss"]) for r in parts], axis=0)
    d = len(s)
    mean = s / n
    cov = ss.reshape(d, d) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T
    # sign convention: the largest-|coefficient| entry of each
    # component is positive
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    evr = evals[order] / evals.sum()
    return comps, evr, mean


def pca_project(
    ds: ray.data.Dataset,
    components: np.ndarray,
    mean: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Project every vector onto the (broadcast) PCA basis — one
    vectorized map pass; output (id, proj list<double>)."""
    comp_ref = ray.put(np.ascontiguousarray(components))
    mean_ref = ray.put(np.asarray(mean, np.float64))

    def project(batch: pa.Table) -> pa.Table:
        from fdblucene_ray.ops.broadcast import cached_state

        c = cached_state(("pca_c", comp_ref.hex()), lambda: ray.get(comp_ref))
        m = cached_state(("pca_m", mean_ref.hex()), lambda: ray.get(mean_ref))
        x = _stack64(batch[vec_col])
        p = (x - m) @ c.T
        offs = np.arange(0, (len(x) + 1) * c.shape[0], c.shape[0], np.int32)
        return pa.table(
            {
                id_col: batch[id_col],
                "proj": pa.ListArray.from_arrays(
                    pa.array(offs), pa.array(p.ravel())
                ),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------- k-center


def _kcenter_batch_best(batch: pa.Table, *, centers_ref, vec_col, id_col):
    """Per-batch farthest-point candidate: the row maximizing
    min-distance-to-centers (squared L2), ties smallest id. Distances
    use the exact per-row ((x-c)^2).sum form — independent of batch
    boundaries, so results are deterministic across block layouts (and
    bit-identical to a single-machine greedy oracle)."""
    from fdblucene_ray.ops.broadcast import cached_state

    centers = cached_state(
        ("kcenter", centers_ref.hex()), lambda: ray.get(centers_ref)
    )
    X = _stack64(batch[vec_col])
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    if not len(ids):
        return pa.table(
            {"vec_id": pa.array([], pa.int64()),
             "dist": pa.array([], pa.float64()),
             "vec": pa.array([], pa.list_(pa.float64()))}
        )
    d = np.full(len(ids), np.inf)
    for c in centers:
        np.minimum(d, ((X - c) ** 2).sum(axis=1), out=d)
    best = np.lexsort((ids, -d))[0]
    return pa.table(
        {
            "vec_id": pa.array([int(ids[best])], pa.int64()),
            "dist": pa.array([float(d[best])], pa.float64()),
            "vec": pa.array([X[best].tolist()], pa.list_(pa.float64())),
        }
    )


def kcenter_sample(
    ds: ray.data.Dataset,
    k: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Greedy k-center (Gonzalez farthest-point) diversity sample over
    an embedding column — the coreset selector curation pipelines use
    to pick a maximally-spread subset (2-approx to the optimal k-center
    cover). Deterministic: seeds at the smallest id, each round adds
    the point farthest (squared L2) from the chosen set, ties smallest
    id.

    Shape: k streaming passes; each pass broadcasts the current center
    matrix (``ray.put``, k x D doubles — tiny) and reduces each batch
    to ONE candidate row, so the driver sees n_blocks rows per round,
    never the corpus. At extreme k, persist a running min-dist column
    between rounds instead of recomputing against all centers
    (documented scale path; recompute keeps rounds stateless and
    deterministic here).

    Returns (rank, vec_id, dist): dist = distance to the previously
    selected set at selection time (0.0 for the seed)."""

    # seed: smallest id, one streaming pass
    def batch_min(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if not len(ids):
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "vec": pa.array([], pa.list_(pa.float64()))}
            )
        X = _stack64(batch[vec_col])
        i = int(np.argmin(ids))
        return pa.table(
            {
                "vec_id": pa.array([int(ids[i])], pa.int64()),
                "vec": pa.array([X[i].tolist()], pa.list_(pa.float64())),
            }
        )

    rows = ds.map_batches(batch_min, batch_format="pyarrow").take_all()
    seed = min(rows, key=lambda r: r["vec_id"])
    sel_ids = [int(seed["vec_id"])]
    sel_dists = [0.0]
    centers = [np.asarray(seed["vec"], np.float64)]
    for _ in range(k - 1):
        centers_ref = ray.put(np.vstack(centers))
        cands = ds.map_batches(
            _kcenter_batch_best,
            batch_format="pyarrow",
            fn_kwargs={
                "centers_ref": centers_ref,
                "vec_col": vec_col,
                "id_col": id_col,
            },
        ).take_all()
        if not cands:
            break
        best = min(cands, key=lambda r: (-r["dist"], r["vec_id"]))
        if best["dist"] <= 0.0:
            # every remaining point coincides with a center: stop early
            break
        sel_ids.append(int(best["vec_id"]))
        sel_dists.append(float(best["dist"]))
        centers.append(np.asarray(best["vec"], np.float64))
    return pa.table(
        {
            "rank": pa.array(range(len(sel_ids)), pa.int64()),
            "vec_id": pa.array(sel_ids, pa.int64()),
            "dist": pa.array(sel_dists, pa.float64()),
        }
    )


def label_centroid_sums(
    ds: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> ray.data.Dataset:
    """Aggregated long-form per-(label, dim) sufficient statistics
    (label, dim, s, n) — the shared partial behind label_centroids and
    drift metrics; |labels| x D rows total."""

    def partial(batch: pa.Table) -> pa.Table:
        X = _stack64(batch[vec_col])
        lab = batch[label_col]
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        codes_arr = lab.dictionary_encode()
        codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        labels = np.asarray(codes_arr.dictionary.to_pylist())
        L, D = len(labels), X.shape[1] if len(X) else 0
        sums = np.zeros((L, D), np.float64)
        np.add.at(sums, codes, X)
        counts = np.bincount(codes, minlength=L).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(labels, D)),
                "dim": pa.array(np.tile(np.arange(1, D + 1), L), pa.int64()),
                "s": pa.array(sums.ravel(), pa.float64()),
                "n": pa.array(np.repeat(counts, D), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["label", "dim"]
    ).aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))


def label_centroids(
    ds: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> ray.data.Dataset:
    """Mean-pooled centroid per label — the class-prototype computation
    (nearest-class-mean classifiers, SemDeDup-style per-cluster
    anchors, label-conditioned data selection). Returns long-form
    (label, dim, avg) rows.

    Shape: each batch folds its vectors into |labels| x D partial sums
    (one np.add.at) and emits LONG-FORM (label, dim, s, n) rows —
    |labels| x D per batch, independent of batch size — so the groupby
    exchange is tiny and Ray's scalar Sum aggregates apply (no
    list-typed aggregation needed); see label_centroid_sums."""

    agg = label_centroid_sums(ds, vec_col=vec_col, label_col=label_col)

    from fdblucene_ray.ops.hashing import round_half_away

    def finalize(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "label": t["label"],
                "dim": t["dim"].cast(pa.int64()),
                "avg": pa.array(
                    round_half_away(s / n, 6).astype(np.float64)
                ),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def jl_project(
    ds: ray.data.Dataset,
    out_dim: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 0x9E3779B9,
) -> ray.data.Dataset:
    """Johnson-Lindenstrauss random projection with a DETERMINISTIC
    Rademacher matrix (Achlioptas 2003: entries ±1/sqrt(k) from hashed
    (seed, i, j) bits — no RNG state, so any worker regenerates the
    identical matrix from three integers). Distance-preserving
    dimensionality reduction ahead of ANN/clustering at 100 TB: the
    (D x k) matrix is built once per worker (cached) and every batch is
    one matmul. Returns (id, proj list<double>)."""
    from fdblucene_ray.ops.broadcast import cached_state
    from fdblucene_ray.ops.hashing import splitmix64

    def build_matrix(d: int) -> np.ndarray:
        idx = np.arange(d * out_dim, dtype=np.uint64) + (
            np.uint64(seed) << np.uint64(32)
        )
        bits = splitmix64(idx) & np.uint64(1)
        signs = bits.astype(np.float64) * 2.0 - 1.0
        return signs.reshape(d, out_dim) / np.sqrt(out_dim)

    def project(batch: pa.Table) -> pa.Table:
        X = _stack64(batch[vec_col])
        if not len(X):
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "proj": pa.array([], pa.list_(pa.float64()))}
            )
        R = cached_state(
            ("jl", seed, X.shape[1], out_dim),
            lambda: build_matrix(X.shape[1]),
        )
        P = X @ R
        n, k = P.shape
        return pa.table(
            {
                id_col: batch[id_col],
                "proj": pa.ListArray.from_arrays(
                    pa.array(np.arange(0, (n + 1) * k, k, dtype=np.int32)),
                    pa.array(P.ravel(), pa.float64()),
                ),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def cluster_topics(
    docs_ds: ray.data.Dataset,
    labels_ds: ray.data.Dataset,
    *,
    n: int = 5,
    analyzer: str = "simple",
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "cluster",
    label_id_col: str | None = None,
    num_partitions: int | None = None,
) -> pa.Table:
    """Topic labels for document clusters — per-cluster significant
    terms (the 'what is in this cluster' readout an embedding-
    clustered corpus card needs; ES significant_terms-under-terms-agg
    analog, JLH score over DISTINCT-doc term frequencies vs the whole
    labeled corpus).

    Scale shape: per-doc distinct (doc_id, term) rows join their doc's
    label with Ray's native hash join (both sides on doc_id), then ONE
    groupby([label, term]) count aggregates doc frequencies. df_all
    per term is the sum of its per-label counts (labels partition the
    corpus), computed inside a hash(term)-partitioned pass — the
    |vocab|-sized relation never lands on the driver. Label sizes are
    a K-row broadcast. Only the final K x n topic rows return.

    Columns: (cluster, term, df_fg, df_all, score@6dp), ordered
    (cluster, score desc, term)."""
    from fdblucene_ray.analysis.analyzer import BatchTokenizer
    from fdblucene_ray.ops.broadcast import cached_state
    from fdblucene_ray.ops.hashing import hash_strings, round_half_away

    P = num_partitions or max(
        16, int(ray.cluster_resources().get("CPU", 8))
    )

    def distinct_terms(batch: pa.Table) -> pa.Table:
        tok = cached_state(
            ("cluster_topics_tok", analyzer),
            lambda: BatchTokenizer(analyzer),
        )
        row_idx, codes, vocab = tok.encoded_tokens(batch[text_col])
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        V = max(1, len(vocab))
        pair = np.unique(row_idx.astype(np.int64) * V + codes)
        prow, pcode = pair // V, pair % V
        vocab_arr = (
            vocab
            if isinstance(vocab, (pa.Array, pa.ChunkedArray))
            else pa.array(list(vocab), pa.string())
        )
        return pa.table(
            {
                "doc_id": pa.array(ids[prow]),
                "term": vocab_arr.take(pa.array(pcode)).cast(pa.string()),
            }
        )

    tok_rows = docs_ds.map_batches(
        distinct_terms, batch_format="pyarrow", zero_copy_batch=True
    )
    lid = label_id_col or id_col

    empty = pa.table(
        {label_col: pa.array([], pa.int64()),
         "term": pa.array([], pa.string()),
         "df_fg": pa.array([], pa.int64()),
         "df_all": pa.array([], pa.int64()),
         "score": pa.array([], pa.float64())}
    )

    def lab_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t[lid].cast(pa.int64()),
                label_col: t[label_col],
            }
        )

    lab = labels_ds.map_batches(lab_rows, batch_format="pyarrow")

    # label sizes: K rows — per-batch partial counts folded on the
    # driver. No groupby: Ray's Aggregate operator emits one
    # SCHEMALESS empty bundle from its reduce stage, which cascades a
    # "." RefBundle schema downstream and triggers the streaming
    # executor's schema-divergence warning on every subsequent
    # operator (the r3 bench-tail noise). Every wide op in this
    # pipeline therefore uses the repo's hash-part map_groups pattern,
    # whose blocks are always typed.
    def size_partials(t: pa.Table) -> pa.Table:
        labs = t[label_col]
        if isinstance(labs, pa.ChunkedArray):
            labs = labs.combine_chunks()
        uniq, cnt = np.unique(
            labs.to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                label_col: pa.array(uniq),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    sizes: dict = {}
    for r in labels_ds.map_batches(
        size_partials, batch_format="pyarrow"
    ).take_all():
        sizes[r[label_col]] = sizes.get(r[label_col], 0.0) + float(r["cnt"])
    n_all = float(sum(sizes.values()))
    if not sizes:
        return empty

    joined = tok_rows.join(
        lab, join_type="inner", num_partitions=P, on=("doc_id",)
    )

    def add_part(t: pa.Table) -> pa.Table:
        terms = t["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        h = hash_strings(terms)
        return pa.table(
            {
                "term": terms,
                label_col: t[label_col],
                "part": pa.array((h % np.uint64(P)).astype(np.int32)),
            }
        )

    def score_part(group: pa.Table) -> pa.Table:
        # typed empty table: a schemaless empty block makes the
        # streaming executor log a schema-drift warning downstream
        if group.num_rows == 0:
            return empty
        terms = group["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        dct = terms.dictionary_encode()
        codes = dct.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        labs = group[label_col]
        if isinstance(labs, pa.ChunkedArray):
            labs = labs.combine_chunks()
        labs_np = np.asarray(labs.to_pylist(), dtype=object)
        lab_uniq, lab_codes = np.unique(labs_np, return_inverse=True)
        # count distinct-doc rows per (term, label) via run arithmetic
        # — this part holds ALL rows of every term hashed to it, so
        # both df_fg and df_all are exact here
        nl = len(lab_uniq)
        key = codes * nl + lab_codes
        key_uniq, cnt_i = np.unique(key, return_counts=True)
        cnt = cnt_i.astype(np.float64)
        u_term = key_uniq // nl
        u_lab = key_uniq % nl
        df_all_by_code = np.bincount(
            u_term, weights=cnt, minlength=len(dct.dictionary)
        )
        df_all = df_all_by_code[u_term]
        n_fg = np.asarray(
            [sizes[v] for v in lab_uniq[u_lab]], np.float64
        )
        pf = cnt / n_fg
        pb = df_all / n_all
        score = (pf - pb) * pf / pb
        # per-(part, label) top-n: the global per-label top-n is
        # contained in the union of per-part top-n sets — only
        # P x K x n rows ever leave the exchange, and the second
        # groupby(label) shuffle disappears entirely.
        terms_u = np.asarray(
            dct.dictionary.to_pylist(), dtype=object
        )[u_term]
        order = np.lexsort((terms_u, -score, u_lab))
        lab_sorted = u_lab[order]
        run_start = np.r_[
            0, np.nonzero(lab_sorted[1:] != lab_sorted[:-1])[0] + 1
        ]
        rank = np.arange(len(order)) - np.repeat(
            run_start, np.diff(np.r_[run_start, len(order)])
        )
        keep = order[rank < n]
        return pa.table(
            {
                label_col: pa.array(lab_uniq[u_lab[keep]]),
                "term": pa.array(list(terms_u[keep]), pa.string()),
                "df_fg": pa.array(cnt[keep].astype(np.int64)),
                "df_all": pa.array(df_all[keep].astype(np.int64)),
                "score": pa.array(score[keep]),
            }
        )

    score_part.__name__ = "cluster_topics_score"
    scored = (
        joined.map_batches(add_part, batch_format="pyarrow")
        .groupby("part", num_partitions=P)
        .map_groups(score_part, batch_format="pyarrow")
    )
    # P x K x n candidate rows (tiny): per-label top-n on driver
    t = pa.Table.from_pylist(scored.take_all())
    if t.num_rows == 0:
        return empty
    df_c = t.to_pandas().sort_values(
        [label_col, "score", "term"], ascending=[True, False, True]
    )
    df_c = df_c.groupby(label_col, sort=False).head(n)
    t = pa.Table.from_pandas(df_c.reset_index(drop=True), preserve_index=False)
    sc = round_half_away(
        t["score"].to_numpy(zero_copy_only=False).astype(np.float64), 6
    )
    t = t.set_column(
        t.schema.get_field_index("score"), "score", pa.array(sc)
    )
    df = t.to_pandas().sort_values(
        [label_col, "score", "term"], ascending=[True, False, True]
    )
    return pa.Table.from_pandas(df, preserve_index=False)
