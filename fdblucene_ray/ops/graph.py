"""Link-graph ops over a web corpus: PageRank + degree statistics.

A web-scale crawl carries a hyperlink graph; rank/authority signals
(PageRank) and degree statistics are standard curation features
(quality weighting, crawl prioritisation, spam filtering). The corpus
tables here carry no link column, so the graph is derived as a pure
function of ``doc_id`` — an irregular LCG edge set that both the Ray
pipeline and the DuckDB oracle can generate independently:

    deg(src)    = 1 + src mod 13
    dst(src, j) = (src * (48271 + j) + j * 1009) mod n_docs, j = 1..deg

(48271 is the MINSTD multiplier — public domain, Park & Miller 1988.)
The per-slice multiplier ``48271 + j`` is deliberately NOT always
coprime to n_docs, and out-degree varies per vertex — so in-degree is
skewed and PageRank has a non-trivial fixed point (a constant-degree
LCG graph is vertex-transitive: every rank collapses to exactly 1/N).
Self-loops and multi-edges are kept as-is on both sides.

Scale shape (the part that matters at 10^12 docs):

- **Edges are never materialised.** Each iteration regenerates the
  out-edges of a rank batch inside ``map_batches`` (pure numpy from the
  id column) and emits ``(dst, contribution)`` rows — the only data
  that moves is one float per edge per iteration.
- **One hashed-partition exchange per iteration** (`part_of(dst) % P`),
  then a lexsort run-sum inside the single per-partition call — no
  per-vertex Python, no driver-side rank vector, no broadcast of the
  O(V) state. This is the standard "contributions shuffle" PageRank
  (Page et al. 1999; the Pregel/GraphX formulation) expressed as Ray
  Data stages.
- Every vertex also emits a zero self-contribution row so sinks with no
  in-links stay present without a separate outer join against the
  vertex set.

Reference tie-in: ranking signals feed the same index the reference
serves (fdblucene SearchTest's scored retrieval); this is corpus-side
feature extraction, not an index structure.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from fdblucene_ray.ops.hashing import part_of, round_half_away

_MINSTD = 48271
_STEP = 1009
MAX_DEG = 13


def _default_parts(n_rows: int | None = None) -> int:
    """Exchange partition count: scales with the CLUSTER by default,
    dropping for small rank tables (a 5k-row exchange does not need 32
    sort partitions of scheduling overhead) and growing past the CPU
    count when partitions would otherwise exceed ~50M rows (map_groups
    holds one partition in memory)."""
    by_cpu = max(16, int(ray.cluster_resources().get("CPU", 8)))
    if n_rows is None:
        return by_cpu
    small = max(4, min(by_cpu, int(n_rows) // 1000 + 1))
    return max(small, int(n_rows) // 50_000_000)


def synth_out_edges(
    src: np.ndarray, n_docs: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Derived out-edges of ``src``: flat (src_rep, dst, deg_rep) arrays
    with deg(src) = 1 + src % MAX_DEG entries per vertex."""
    src = src.astype(np.int64, copy=False)
    deg = 1 + src % MAX_DEG
    j = np.arange(1, MAX_DEG + 1, dtype=np.int64)
    dst_mat = (src[:, None] * (_MINSTD + j[None, :]) + j[None, :] * _STEP) % np.int64(
        n_docs
    )
    mask = (j[None, :] <= deg[:, None]).ravel()
    src_rep = np.repeat(src, MAX_DEG)[mask]
    deg_rep = np.repeat(deg, MAX_DEG)[mask]
    return src_rep, dst_mat.ravel()[mask], deg_rep


def _expand_contribs(
    batch: pa.Table, *, n_docs: int, id_col: str, num_parts: int
) -> pa.Table:
    src = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    pr = batch["pr"].to_numpy(zero_copy_only=False).astype(np.float64)
    deg = 1 + src % MAX_DEG
    _, dst, _ = synth_out_edges(src, n_docs)
    contrib = np.repeat(pr / deg, deg)
    # zero self-rows keep zero-in-degree vertices in the frontier
    dst = np.concatenate((dst, src))
    contrib = np.concatenate((contrib, np.zeros(len(src))))
    return pa.table(
        {
            "doc_id": pa.array(dst),
            "contrib": pa.array(contrib),
            "part": pa.array(part_of(dst, num_parts)),
        }
    )


def _sum_ranks(
    group: pa.Table, *, n_docs: int, damping: float
) -> pa.Table:
    ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    contrib = group["contrib"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    contrib = contrib[order]
    starts = np.flatnonzero(np.concatenate(([True], ids[1:] != ids[:-1])))
    sums = np.add.reduceat(contrib, starts)
    pr = (1.0 - damping) / n_docs + damping * sums
    return pa.table({"doc_id": pa.array(ids[starts]), "pr": pa.array(pr)})


def pagerank(
    ds: ray.data.Dataset,
    *,
    n_iters: int = 3,
    damping: float = 0.85,
    id_col: str = "doc_id",
    num_parts: int | None = None,
    n_docs: int | None = None,
) -> ray.data.Dataset:
    """PageRank over the derived link graph. Returns (doc_id, pr).

    ``n_iters`` fixed iterations (deterministic, SQL-twinnable); one
    hashed-partition exchange per iteration, rank state never leaves
    the object store.
    """
    if n_docs is None:
        n_docs = ds.count()
    if n_docs == 0:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "pr": pa.array([], pa.float64())})
        )
    num_parts = num_parts or _default_parts(n_docs)

    def init(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(ids),
             "pr": pa.array(np.full(len(ids), 1.0 / n_docs))}
        )

    pr = ds.map_batches(init, batch_format="pyarrow", zero_copy_batch=True)
    for _ in range(n_iters):
        pr = (
            pr.map_batches(
                _expand_contribs,
                fn_kwargs=dict(
                    n_docs=n_docs, id_col="doc_id", num_parts=num_parts,
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby("part", num_partitions=num_parts)
            .map_groups(
                _sum_ranks,
                fn_kwargs=dict(n_docs=n_docs, damping=damping),
                batch_format="pyarrow",
            )
        )
    return pr


def pagerank_top(
    ds: ray.data.Dataset,
    top_n: int = 100,
    *,
    n_iters: int = 3,
    damping: float = 0.85,
    id_col: str = "doc_id",
) -> pa.Table:
    """Top-``top_n`` docs by PageRank, score scaled by n_docs (so values
    are O(1) regardless of corpus size) and rounded half-away at 6dp
    BEFORE the sort — ties then break doc_id asc, matching the SQL twin
    exactly. Columns: (doc_id, score)."""
    n_docs = ds.count()
    if n_docs == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    pr = pagerank(
        ds, n_iters=n_iters, damping=damping, id_col=id_col, n_docs=n_docs,
    )

    def scale(batch: pa.Table) -> pa.Table:
        s = round_half_away(
            batch["pr"].to_numpy(zero_copy_only=False) * n_docs, 6
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "score": pa.array(s)}
        )

    out = (
        pr.map_batches(scale, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(top_n)
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.select(["doc_id", "score"])


def host_rank(
    ds: ray.data.Dataset,
    *,
    host_col: str = "source",
    n_iters: int = 3,
    damping: float = 0.85,
    id_col: str = "doc_id",
) -> pa.Table:
    """Host-level authority (the web-pipeline roll-up of PageRank:
    host-level spam/quality signals aggregate page ranks by site):
    PageRank joined back to the doc→host mapping with Ray Data's
    hash join (both sides partitioned on doc_id), then a small groupby
    over the host cardinality. Columns: (host, n_docs, rank@6dp),
    rank desc, host asc."""
    n_docs = ds.count()
    if n_docs == 0:
        return pa.table({"host": pa.array([], pa.string()),
                         "n_docs": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.float64())})
    pr = pagerank(
        ds.select_columns([id_col]), n_iters=n_iters, damping=damping,
        id_col=id_col, n_docs=n_docs,
    )
    num_parts = _default_parts(n_docs)
    joined = pr.join(
        ds.select_columns([id_col, host_col]),
        join_type="inner",
        num_partitions=num_parts,
        on=("doc_id",),
    )
    agg = joined.groupby(host_col).sum(["pr"]).take_all()
    cnt = {r[host_col]: int(r["count()"]) for r in
           ds.groupby(host_col).count().take_all()}
    rows = sorted(
        ((r[host_col], cnt.get(r[host_col], 0),
          float(r["sum(pr)"]) * n_docs) for r in agg),
        key=lambda x: (-round_half_away(np.array([x[2]]), 6)[0], x[0]),
    )
    return pa.table(
        {
            "host": pa.array([h for h, _, _ in rows], pa.string()),
            "n_docs": pa.array([c for _, c, _ in rows], pa.int64()),
            "rank": pa.array(
                round_half_away(np.array([v for _, _, v in rows]), 6)
            ),
        }
    )


def _expand_contribs_tele(
    batch: pa.Table, *, n_docs: int, id_col: str, num_parts: int, damping: float
) -> pa.Table:
    """Personalized variant of ``_expand_contribs``: the zero self-row
    instead carries the doc's constant teleport mass in a ``tele``
    column, so seed membership survives the exchange without a join."""
    src = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    pr = batch["pr"].to_numpy(zero_copy_only=False).astype(np.float64)
    tele = batch["tele"].to_numpy(zero_copy_only=False).astype(np.float64)
    deg = 1 + src % MAX_DEG
    _, dst, _ = synth_out_edges(src, n_docs)
    contrib = np.repeat(pr / deg, deg)
    dst = np.concatenate((dst, src))
    contrib = np.concatenate((contrib, np.zeros(len(src))))
    tele_col = np.concatenate((np.zeros(len(contrib) - len(src)), tele))
    return pa.table(
        {
            "doc_id": pa.array(dst),
            "contrib": pa.array(contrib),
            "tele": pa.array(tele_col),
            "part": pa.array(part_of(dst, num_parts)),
        }
    )


def _sum_ranks_tele(group: pa.Table, *, damping: float) -> pa.Table:
    ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    contrib = group["contrib"].to_numpy(zero_copy_only=False)
    tele = group["tele"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    ids, contrib, tele = ids[order], contrib[order], tele[order]
    starts = np.flatnonzero(np.concatenate(([True], ids[1:] != ids[:-1])))
    sums = np.add.reduceat(contrib, starts)
    tele_u = np.add.reduceat(tele, starts)  # exactly one self-row per doc
    pr = tele_u + damping * sums
    return pa.table(
        {"doc_id": pa.array(ids[starts]), "pr": pa.array(pr),
         "tele": pa.array(tele_u)}
    )


def trustrank_top(
    ds: ray.data.Dataset,
    top_n: int = 100,
    *,
    seed_col: str,
    seed_val,
    n_iters: int = 3,
    damping: float = 0.85,
    id_col: str = "doc_id",
    num_parts: int | None = None,
) -> pa.Table:
    """TrustRank (Gyöngyi et al., VLDB 2004): PageRank personalized to
    a trusted seed set — teleportation mass (1-d) flows only to docs
    with ``seed_col == seed_val``; rank starts from the seed
    distribution. Same one-exchange-per-iteration shape as
    ``pagerank``; the per-doc teleport constant rides the exchange in a
    ``tele`` column (no O(V) broadcast, no join). Scores scaled by
    n_docs, 6dp, ties doc_id asc. Columns: (doc_id, score)."""
    import pyarrow.compute as pc

    n_docs = ds.count()
    if n_docs == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    num_parts = num_parts or _default_parts(n_docs)
    # count seeds with one cheap aggregate pass
    n_seed = (
        ds.map_batches(
            lambda b: pa.table(
                {"c": pa.array([
                    int(pc.sum(pc.cast(pc.equal(b[seed_col], seed_val),
                                       pa.int64())).as_py() or 0)
                ])}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).sum("c")
    )
    if not n_seed:
        raise ValueError(f"no seed docs with {seed_col} == {seed_val!r}")

    def init(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        is_seed = (
            pc.equal(batch[seed_col], seed_val)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "pr": pa.array(is_seed / n_seed),
                "tele": pa.array((1.0 - damping) * is_seed / n_seed),
            }
        )

    pr = ds.map_batches(init, batch_format="pyarrow", zero_copy_batch=True)
    for _ in range(n_iters):
        pr = (
            pr.map_batches(
                _expand_contribs_tele,
                fn_kwargs=dict(
                    n_docs=n_docs, id_col="doc_id", num_parts=num_parts,
                    damping=damping,
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby("part", num_partitions=num_parts)
            .map_groups(
                _sum_ranks_tele,
                fn_kwargs=dict(damping=damping),
                batch_format="pyarrow",
            )
        )

    def scale(batch: pa.Table) -> pa.Table:
        s = round_half_away(
            batch["pr"].to_numpy(zero_copy_only=False) * n_docs, 6
        )
        return pa.table({"doc_id": batch["doc_id"], "score": pa.array(s)})

    out = (
        pr.map_batches(scale, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(top_n)
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.select(["doc_id", "score"])


def _l2_of(ds: ray.data.Dataset, col: str) -> float:
    """Global L2 norm of a column: per-batch sum-of-squares partials."""
    ss = ds.map_batches(
        lambda b, c=col: pa.table(
            {"ss": pa.array([
                float((b[c].to_numpy(zero_copy_only=False) ** 2).sum())
            ])}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sum("ss")
    return float(np.sqrt(ss)) if ss else 1.0


def hits_top(
    ds: ray.data.Dataset,
    top_n: int = 20,
    *,
    n_iters: int = 2,
    id_col: str = "doc_id",
    num_parts: int | None = None,
) -> pa.Table:
    """HITS hubs & authorities (Kleinberg, JACM 1999) over the derived
    graph, ``n_iters`` fixed iterations with L2 normalization.

    The authority update reuses the forward contributions exchange
    (a[dst] = Σ h[src]); the hub update needs the REVERSE direction
    (h[src] = Σ a[dst]), expressed as a co-partitioned union join:
    regenerated edge rows and the authority table both shuffle on
    hash(dst) % P, each partition matches dst runs with searchsorted,
    and the (src, a) rows exchange once more to sum per src — no O(V)
    broadcast, no reverse-edge materialization. Norms are two-scalar
    map-side aggregates.

    Returns top-``top_n`` per kind: columns (kind 'auth'|'hub', doc_id,
    score@6dp), kind asc, score desc, doc_id asc."""
    n_docs = ds.count()
    if n_docs == 0:
        return pa.table({"kind": pa.array([], pa.string()),
                         "doc_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    num_parts = num_parts or _default_parts(n_docs)

    def init(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(ids),
             "v": pa.array(np.full(len(ids), 1.0 / n_docs))}
        )

    hub = ds.map_batches(init, batch_format="pyarrow", zero_copy_batch=True)
    hub_z = 1.0  # pending L2 divisor of the CURRENT hub table (fused into
    auth_z = 1.0  # the consuming stage instead of a normalization pass)
    auth = None
    for _ in range(n_iters):
        # authority: forward exchange of hub mass (divide by the hub's
        # pending L2 divisor here — no separate normalization pass)
        def fwd(batch: pa.Table, *, z=hub_z) -> pa.Table:
            src = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            hv = batch["v"].to_numpy(zero_copy_only=False) / z
            deg = 1 + src % MAX_DEG
            _, dst, _ = synth_out_edges(src, n_docs)
            return pa.table(
                {
                    "doc_id": pa.array(dst),
                    "c": pa.array(np.repeat(hv, deg)),
                    "part": pa.array(part_of(dst, num_parts)),
                }
            )

        def sum_runs(group: pa.Table) -> pa.Table:
            ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            c = group["c"].to_numpy(zero_copy_only=False)
            o = np.argsort(ids, kind="stable")
            ids, c = ids[o], c[o]
            st = np.flatnonzero(np.concatenate(([True], ids[1:] != ids[:-1])))
            return pa.table(
                {"doc_id": pa.array(ids[st]),
                 "v": pa.array(np.add.reduceat(c, st))}
            )

        auth = (
            hub.map_batches(fwd, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("part", num_partitions=num_parts)
            .map_groups(sum_runs, batch_format="pyarrow")
        ).materialize()
        auth_z = _l2_of(auth, "v")

        # hub: reverse join — edge rows and authority rows co-partition
        # on hash(dst), per-partition searchsorted match, re-key by src
        def edges_by_dst(batch: pa.Table) -> pa.Table:
            src = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            src_rep, dst, _ = synth_out_edges(src, n_docs)
            return pa.table(
                {
                    "doc_id": pa.array(dst),
                    "src": pa.array(src_rep),
                    "v": pa.array(np.zeros(len(dst))),
                    "side": pa.array(np.zeros(len(dst), np.int8)),
                    "part": pa.array(part_of(dst, num_parts)),
                }
            )

        def auth_side(batch: pa.Table, *, z=auth_z) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "doc_id": pa.array(ids),
                    "src": pa.array(np.full(len(ids), -1, np.int64)),
                    "v": pa.array(
                        batch["v"].to_numpy(zero_copy_only=False) / z),
                    "side": pa.array(np.ones(len(ids), np.int8)),
                    "part": pa.array(part_of(ids, num_parts)),
                }
            )

        def match_dst(group: pa.Table) -> pa.Table:
            side = group["side"].to_numpy(zero_copy_only=False)
            ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            srcs = group["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            vs = group["v"].to_numpy(zero_copy_only=False)
            em = side == 0
            e_dst, e_src = ids[em], srcs[em]
            a_ids, a_v = ids[~em], vs[~em]
            o = np.argsort(a_ids, kind="stable")
            a_ids, a_v = a_ids[o], a_v[o]
            ix = np.searchsorted(a_ids, e_dst)
            ok = (ix < len(a_ids))
            ix = np.clip(ix, 0, max(0, len(a_ids) - 1))
            ok &= (a_ids[ix] == e_dst) if len(a_ids) else False
            return pa.table(
                {
                    "doc_id": pa.array(e_src[ok]),
                    "c": pa.array(a_v[ix[ok]] if len(a_ids) else
                                  np.empty(0, np.float64)),
                    "part": pa.array(part_of(e_src[ok], num_parts)),
                }
            )

        edges_ds = ds.map_batches(
            edges_by_dst, batch_format="pyarrow", zero_copy_batch=True
        )
        a_ds = auth.map_batches(
            auth_side, batch_format="pyarrow", zero_copy_batch=True
        )
        hub = (
            edges_ds.union(a_ds)
            .groupby("part", num_partitions=num_parts)
            .map_groups(match_dst, batch_format="pyarrow")
            .groupby("part", num_partitions=num_parts)
            .map_groups(sum_runs, batch_format="pyarrow")
        ).materialize()
        hub_z = _l2_of(hub, "v")

    def top(d: ray.data.Dataset, kind: str, z: float) -> pa.Table:
        def scale(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"doc_id": batch["doc_id"],
                 "score": pa.array(round_half_away(
                     batch["v"].to_numpy(zero_copy_only=False) / z, 6))}
            )

        o = (
            d.map_batches(scale, batch_format="pyarrow", zero_copy_batch=True)
            .sort(["score", "doc_id"], descending=[True, False])
            .limit(top_n)
            .to_pandas()
        )
        return pa.table(
            {
                "kind": pa.array([kind] * len(o)),
                "doc_id": pa.array(o["doc_id"].to_numpy(np.int64)),
                "score": pa.array(o["score"].to_numpy(np.float64)),
            }
        )

    return pa.concat_tables(
        [top(auth, "auth", auth_z), top(hub, "hub", hub_z)]
    )


def anchor_terms(
    ds: ray.data.Dataset,
    *,
    n_tokens: int = 3,
    analyzer: str = "simple",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int | None = None,
) -> pa.Table:
    """Anchor-text aggregation: each link (src→dst) of the derived
    graph carries src's first ``n_tokens`` analyzed tokens as "anchor
    text"; per target doc, the most frequent anchor term (count desc,
    term asc) — the classic web-search ranking feature (anchor terms
    describe the TARGET page).

    Scale shape: anchors are emitted map-side from each rank batch
    (edges regenerated in-map, ≤ deg × n_tokens rows per doc), one
    hashed-partition exchange keyed on hash(dst) % P, per-partition
    top-1 by lexsort run arithmetic. Columns: (doc_id, term, cnt),
    doc_id asc.
    """
    from fdblucene_ray.analysis.analyzer import BatchTokenizer
    from fdblucene_ray.ops.broadcast import cached_state

    n_docs = ds.count()
    if n_docs == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "term": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    num_parts = num_parts or _default_parts(n_docs)

    def expand(batch: pa.Table) -> pa.Table:
        tk = cached_state(
            ("anchor_tok", analyzer), lambda: BatchTokenizer(analyzer)
        )
        row_idx, codes, vocab = tk.encoded_tokens(batch[text_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(codes) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "term": pa.array([], pa.string()),
                 "part": pa.array([], pa.int32())}
            )
        # index of each token within its row -> keep the first n_tokens
        row_starts = np.flatnonzero(
            np.concatenate(([True], row_idx[1:] != row_idx[:-1]))
        )
        within = np.arange(len(row_idx)) - np.repeat(
            row_starts, np.diff(np.concatenate((row_starts, [len(row_idx)])))
        )
        keep = within < n_tokens
        rows_k, codes_k = row_idx[keep], codes[keep]
        src = ids[rows_k]
        deg = 1 + src % MAX_DEG
        src_rep, dst, _ = synth_out_edges(src, n_docs)
        # repeat each kept token's code for its row's out-degree
        code_rep = np.repeat(codes_k, deg)
        vocab_arr = vocab if isinstance(vocab, pa.Array) else pa.array(
            list(vocab), pa.string()
        )
        terms = pa.DictionaryArray.from_arrays(
            pa.array(code_rep.astype(np.int32)), vocab_arr
        ).cast(pa.string())
        return pa.table(
            {
                "doc_id": pa.array(dst),
                "term": terms,
                "part": pa.array(part_of(dst, num_parts)),
            }
        )

    def top1_runs(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        terms = group["term"].to_numpy(zero_copy_only=False)
        order = np.lexsort((terms, ids))
        ids, terms = ids[order], terms[order]
        new = np.concatenate(
            ([True], (ids[1:] != ids[:-1]) | (terms[1:] != terms[:-1]))
        )
        starts = np.flatnonzero(new)
        cnt = np.diff(np.concatenate((starts, [len(ids)])))
        gid, gterm = ids[starts], terms[starts]
        # per doc: max count, tie term asc (already term-asc within doc)
        ord2 = np.lexsort((gterm, -cnt, gid))
        gid2, gterm2, cnt2 = gid[ord2], gterm[ord2], cnt[ord2]
        first = np.flatnonzero(
            np.concatenate(([True], gid2[1:] != gid2[:-1]))
        )
        return pa.table(
            {
                "doc_id": pa.array(gid2[first].astype(np.int64)),
                "term": pa.array(gterm2[first].astype(str)),
                "cnt": pa.array(cnt2[first].astype(np.int64)),
            }
        )

    out = (
        ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part", num_partitions=num_parts)
        .map_groups(top1_runs, batch_format="pyarrow")
        .sort("doc_id")
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.select(["doc_id", "term", "cnt"])


def degree_stats(
    ds: ray.data.Dataset,
    top_n: int = 20,
    *,
    id_col: str = "doc_id",
    num_parts: int | None = None,
) -> pa.Table:
    """Top-``top_n`` docs by in-degree on the derived graph (multi-edges
    counted). One map-side expansion to (dst, 1) rows + one
    hashed-partition exchange with a run-count kernel — in-degree of a
    10^12-vertex graph without a vertex-cardinality groupby.
    Columns: (doc_id, in_deg)."""
    n_docs = ds.count()
    if n_docs == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "in_deg": pa.array([], pa.int64())})
    num_parts = num_parts or _default_parts(n_docs)

    def expand(batch: pa.Table) -> pa.Table:
        src = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        _, dst, _ = synth_out_edges(src, n_docs)
        return pa.table(
            {"doc_id": pa.array(dst),
             "part": pa.array(part_of(dst, num_parts))}
        )

    def count_runs(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        ids = np.sort(ids)
        starts = np.flatnonzero(
            np.concatenate(([True], ids[1:] != ids[:-1]))
        )
        cnt = np.diff(np.concatenate((starts, [len(ids)])))
        return pa.table(
            {"doc_id": pa.array(ids[starts]),
             "in_deg": pa.array(cnt.astype(np.int64))}
        )

    out = (
        ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part", num_partitions=num_parts)
        .map_groups(count_runs, batch_format="pyarrow")
        .sort(["in_deg", "doc_id"], descending=[True, False])
        .limit(top_n)
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.select(["doc_id", "in_deg"])
