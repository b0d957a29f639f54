"""Vamana graph ANN (fdblucene_ray/ops/graphann.py): build invariants,
beam-search recall vs brute force, determinism and resumability."""

import glob
import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fdblucene_ray.ops.graphann import (
    _greedy_search,
    _robust_prune,
    build_graph_index,
    build_partition_graph,
    graph_topk_indexed,
)
from fdblucene_ray.ops.similarity import _normalize, brute_force_topk


def _clustered_vectors(n, dim=16, n_clusters=6, seed=3):
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(n_clusters, dim))
    labels = rng.integers(0, n_clusters, n)
    return cents[labels] + 0.15 * rng.normal(size=(n, dim))


def _ds_from(vecs):
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
                "embedding": pa.array(
                    [v.astype(np.float32) for v in vecs],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )


class TestRobustPrune:
    def test_degree_bound_and_no_self(self):
        rng = np.random.default_rng(0)
        v = _normalize(rng.normal(size=(50, 8)))
        out = _robust_prune(0, np.arange(50), v, R=6, alpha=1.2)
        assert len(out) <= 6
        assert 0 not in out
        assert len(np.unique(out)) == len(out)

    def test_keeps_closest(self):
        # candidate most similar to p always survives the prune
        rng = np.random.default_rng(1)
        v = _normalize(rng.normal(size=(30, 8)))
        sims = v @ v[5]
        sims[5] = -2
        best = int(np.argmax(sims))
        out = _robust_prune(5, np.arange(30), v, R=4, alpha=1.2)
        assert best == out[0]


class TestPartitionGraph:
    def test_connected_to_medoid_and_degree(self):
        vecs = _clustered_vectors(300)
        adj, medoid = build_partition_graph(vecs, R=12, L=24)
        assert adj.shape == (300, 12)
        deg = (adj >= 0).sum(axis=1)
        assert deg.max() <= 12
        assert deg.min() >= 1
        # BFS from medoid reaches (nearly) everything
        seen = np.zeros(300, bool)
        frontier = [medoid]
        seen[medoid] = True
        while frontier:
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w >= 0 and not seen[w]:
                        seen[w] = True
                        nxt.append(int(w))
            frontier = nxt
        assert seen.mean() > 0.99

    def test_deterministic(self):
        vecs = _clustered_vectors(150, seed=9)
        a1, m1 = build_partition_graph(vecs, R=8, L=16, seed=7)
        a2, m2 = build_partition_graph(vecs, R=8, L=16, seed=7)
        assert m1 == m2
        assert np.array_equal(a1, a2)

    def test_tiny_partitions(self):
        for n in (0, 1, 2, 3):
            vecs = _clustered_vectors(max(n, 1))[:n]
            adj, medoid = build_partition_graph(
                vecs.reshape(n, -1) if n else np.empty((0, 4)), R=4, L=8
            )
            assert adj.shape[0] == n


class TestGreedySearch:
    def test_beam_recall_single_partition(self):
        vecs = _clustered_vectors(800, seed=5)
        vecs_n = _normalize(vecs)
        adj, medoid = build_partition_graph(vecs, R=16, L=32)
        rng = np.random.default_rng(11)
        hits = total = 0
        for _ in range(20):
            q = _normalize(rng.normal(size=(1, vecs.shape[1])))[0]
            visited, sims = _greedy_search(vecs_n, adj, medoid, q, L=48)
            got = set(visited[np.argsort(-sims)[:10]].tolist())
            true = set(np.argsort(-(vecs_n @ q))[:10].tolist())
            hits += len(got & true)
            total += 10
        assert hits / total >= 0.9


class TestGraphIndex:
    def test_recall_and_resume(self, ray_session, tmp_path):
        vecs = _clustered_vectors(1200, seed=13)
        ds = _ds_from(vecs)
        out = str(tmp_path / "gidx")
        build_graph_index(ds, out, n_centroids=4, R=16, L_build=32)
        assert os.path.exists(os.path.join(out, "graph_meta.json"))
        gfiles = sorted(glob.glob(os.path.join(out, "graph", "*.parquet")))
        assert len(gfiles) == 4

        rng = np.random.default_rng(21)
        queries = rng.normal(size=(10, vecs.shape[1]))
        qids = np.arange(10)
        got = graph_topk_indexed(
            out, queries, qids, k=10, nprobe=2, L_search=64
        ).to_pandas()
        true = brute_force_topk(
            ds, queries, qids, k=10
        ).to_pandas()
        recall = 0.0
        for qi in range(10):
            g = set(got[got.query_id == qi].vec_id)
            t = set(true[true.query_id == qi].vec_id)
            recall += len(g & t) / len(t)
        assert recall / 10 >= 0.8

        # resumability: delete one graph file; rebuild restores ONLY it
        mtimes = {f: os.path.getmtime(f) for f in gfiles}
        os.remove(gfiles[0])
        build_graph_index(ds, out, n_centroids=4, R=16, L_build=32)
        assert os.path.exists(gfiles[0])
        for f in gfiles[1:]:
            assert os.path.getmtime(f) == mtimes[f]

    def test_full_probe_high_recall(self, ray_session, tmp_path):
        vecs = _clustered_vectors(600, seed=17)
        ds = _ds_from(vecs)
        out = str(tmp_path / "gidx2")
        build_graph_index(ds, out, n_centroids=3, R=16, L_build=32)
        rng = np.random.default_rng(23)
        queries = rng.normal(size=(8, vecs.shape[1]))
        qids = np.arange(8)
        got = graph_topk_indexed(
            out, queries, qids, k=5, nprobe=3, L_search=200
        ).to_pandas()
        true = brute_force_topk(ds, queries, qids, k=5).to_pandas()
        recall = 0.0
        for qi in range(8):
            g = set(got[got.query_id == qi].vec_id)
            t = set(true[true.query_id == qi].vec_id)
            recall += len(g & t) / len(t)
        assert recall / 8 >= 0.95


class TestIvfAppend:
    def test_append_exact_and_idempotent(self, ray_session, tmp_path):
        from fdblucene_ray.ops.similarity import (
            append_ivf_index,
            build_ivf_index,
            ivf_topk_indexed,
        )

        vecs = _clustered_vectors(400, seed=31)
        ds = _ds_from(vecs)
        base = ds.filter(expr="vec_id < 200")
        rest = ds.filter(expr="vec_id >= 200")
        out = str(tmp_path / "ivf")
        build_ivf_index(base, out, n_centroids=4)
        assert append_ivf_index(rest, out, "b1") is True
        assert append_ivf_index(rest, out, "b1") is False  # idempotent
        rng = np.random.default_rng(5)
        q = rng.normal(size=(6, vecs.shape[1]))
        qids = np.arange(6)
        got = ivf_topk_indexed(out, q, qids, k=8, nprobe=4).to_pandas()
        true = brute_force_topk(ds, q, qids, k=8).to_pandas()
        for qi in range(6):
            g = got[got.query_id == qi].vec_id.tolist()
            t = true[true.query_id == qi].vec_id.tolist()
            assert g == t  # full probe over base+append == exact

    def test_append_reaches_appended_ids(self, ray_session, tmp_path):
        from fdblucene_ray.ops.similarity import (
            append_ivf_index,
            build_ivf_index,
            ivf_topk_indexed,
        )

        vecs = _clustered_vectors(300, seed=33)
        ds = _ds_from(vecs)
        out = str(tmp_path / "ivf2")
        build_ivf_index(ds.filter(expr="vec_id < 150"), out, n_centroids=3)
        append_ivf_index(ds.filter(expr="vec_id >= 150"), out, "b1")
        # query AT an appended vector: it must be its own top hit
        q = vecs[250:251]
        got = ivf_topk_indexed(out, q, [0], k=1, nprobe=3).to_pandas()
        assert got.vec_id.tolist() == [250]


class TestGraphRefresh:
    def test_refresh_rebuilds_only_stale_partitions(
        self, ray_session, tmp_path
    ):
        import time

        from fdblucene_ray.ops.similarity import append_ivf_index

        vecs = _clustered_vectors(600, seed=41)
        ds = _ds_from(vecs)
        out = str(tmp_path / "g")
        build_graph_index(
            ds.filter(expr="vec_id < 400"), out, n_centroids=3,
            R=12, L_build=24,
        )
        gfiles = sorted(
            glob.glob(os.path.join(out, "graph", "*.parquet"))
        )
        mtimes = {f: os.path.getmtime(f) for f in gfiles}
        time.sleep(0.05)
        append_ivf_index(ds.filter(expr="vec_id >= 400"), out, "b1")
        build_graph_index(
            ds.filter(expr="vec_id < 400"), out, n_centroids=3,
            R=12, L_build=24, refresh=True,
        )
        rebuilt = [
            f for f in gfiles if os.path.getmtime(f) != mtimes[f]
        ]
        assert rebuilt  # appended partitions' graphs were refreshed
        # appended vector is findable through the refreshed graphs
        q = vecs[550:551]
        got = graph_topk_indexed(
            out, q, [0], k=1, nprobe=3, L_search=64
        ).to_pandas()
        assert got.vec_id.tolist() == [550]

    def test_lazy_refresh_window_keeps_base_graph_aligned(
        self, ray_session, tmp_path
    ):
        """Query DURING the documented lazy-refresh window (after
        append_ivf_index, before build_graph_index(refresh=True)):
        appended vectors sit in the partition data but not in the
        graph, so each graph node's edge list must be placed at the
        node's TRUE local row, not the k-th smallest graph id's row —
        otherwise edges attach to appended vectors and base search
        dead-ends (ADVICE r4 medium)."""
        import time

        from fdblucene_ray.ops.similarity import append_ivf_index

        vecs = _clustered_vectors(400, seed=59)
        ds = _ds_from(vecs)
        out = str(tmp_path / "g3")
        build_graph_index(
            ds.filter(expr="vec_id >= 100"), out, n_centroids=2,
            R=12, L_build=24,
        )
        base_ids = set(range(100, 400))
        time.sleep(0.05)
        # appended ids (0..99) sort BELOW every graph id — the
        # misalignment trigger. NO query before the append: the first
        # _load_partition for this index must happen in-window (the
        # worker cache keys on graph mtime and would otherwise serve
        # the aligned pre-append load, masking the bug).
        append_ivf_index(ds.filter(expr="vec_id < 100"), out, "b1")
        probe_ids = list(range(150, 350, 20))
        q = vecs[probe_ids]
        mid = graph_topk_indexed(
            out, q, np.arange(len(probe_ids)), k=5, nprobe=2,
            L_search=96,
        ).to_pandas()
        # in-window search walks the base graph faithfully: each base
        # vector finds itself, full k per query, base ids only
        for qi, pid in enumerate(probe_ids):
            got = mid[mid.query_id == qi].vec_id.tolist()
            assert got[0] == pid
            assert len(got) == 5
            assert set(got) <= base_ids

    def test_stale_cache_invalidated_same_session(
        self, ray_session, tmp_path
    ):
        """Query BEFORE and AFTER an append+refresh in one session:
        the per-worker partition cache must key on the graph file's
        generation, not serve pre-refresh neighbors."""
        import time

        from fdblucene_ray.ops.similarity import append_ivf_index

        vecs = _clustered_vectors(400, seed=47)
        ds = _ds_from(vecs)
        out = str(tmp_path / "g2")
        build_graph_index(
            ds.filter(expr="vec_id < 300"), out, n_centroids=2,
            R=12, L_build=24,
        )
        q = vecs[350:351]
        pre = graph_topk_indexed(
            out, q, [0], k=1, nprobe=2, L_search=64
        ).to_pandas()
        assert pre.vec_id.tolist() != [350]  # not indexed yet
        time.sleep(0.05)
        append_ivf_index(ds.filter(expr="vec_id >= 300"), out, "b1")
        build_graph_index(
            ds.filter(expr="vec_id < 300"), out, n_centroids=2,
            R=12, L_build=24, refresh=True,
        )
        post = graph_topk_indexed(
            out, q, [0], k=1, nprobe=2, L_search=64
        ).to_pandas()
        assert post.vec_id.tolist() == [350]


class TestLshAppend:
    def test_append_exact_full_probe(self, ray_session, tmp_path):
        from fdblucene_ray.ops.similarity import (
            append_lsh_index,
            build_lsh_index,
            lsh_topk_indexed,
        )

        vecs = _clustered_vectors(300, seed=51)
        ds = _ds_from(vecs)
        out = str(tmp_path / "lsh")
        build_lsh_index(ds.filter(expr="vec_id < 150"), out, n_bits=5)
        assert append_lsh_index(
            ds.filter(expr="vec_id >= 150"), out, "b1"
        ) is True
        assert append_lsh_index(
            ds.filter(expr="vec_id >= 150"), out, "b1"
        ) is False
        rng = np.random.default_rng(3)
        q = rng.normal(size=(5, vecs.shape[1]))
        qids = np.arange(5)
        got = lsh_topk_indexed(out, q, qids, k=8, nprobe=32).to_pandas()
        true = brute_force_topk(ds, q, qids, k=8).to_pandas()
        for qi in range(5):
            assert (
                got[got.query_id == qi].vec_id.tolist()
                == true[true.query_id == qi].vec_id.tolist()
            )


class TestMaxSim:
    def test_matches_dense_numpy(self, ray_session):
        """maxsim_topk == brute-force numpy late interaction on random
        multi-vector docs (uneven bag sizes, batch-layout independent)."""
        from fdblucene_ray.ops.hashing import round_half_away
        from fdblucene_ray.ops.similarity import _normalize, maxsim_topk

        rng = np.random.default_rng(61)
        n_docs, dim = 40, 12
        sizes = rng.integers(1, 6, n_docs)
        docs = np.repeat(np.arange(n_docs, dtype=np.int64), sizes)
        vecs = rng.normal(size=(len(docs), dim))
        q = rng.normal(size=(3, dim))
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc": pa.array(docs),
                    "embedding": pa.array(
                        [v.astype(np.float32) for v in vecs],
                        pa.list_(pa.float32()),
                    ),
                }
            )
        ).repartition(5)  # force docs to split across blocks
        got = maxsim_topk(ds, q, k=10).to_pandas()

        # compare against what the engine actually stored (float32 in
        # the Arrow column), not the pre-cast float64 — a 1e-7 gap
        # could flip the 5-dp rounding at a boundary
        vn = _normalize(vecs.astype(np.float32).astype(np.float64))
        qn = _normalize(q.astype(np.float64))
        sims = vn @ qn.T  # (n_vecs, 3)
        want = np.zeros(n_docs)
        for d in range(n_docs):
            want[d] = sims[docs == d].max(axis=0).sum()
        order = np.lexsort((np.arange(n_docs), -want))[:10]
        assert got["doc"].tolist() == order.tolist()
        assert np.allclose(
            got["score"].to_numpy(),
            round_half_away(want[order], 5),
        )


class TestTuneNprobe:
    def test_monotone_and_exact_at_full(self, ray_session, tmp_path):
        from fdblucene_ray.ops.similarity import (
            build_ivf_index,
            tune_nprobe,
        )

        vecs = _clustered_vectors(500, seed=71)
        ds = _ds_from(vecs)
        out = str(tmp_path / "ivf")
        build_ivf_index(ds, out, n_centroids=8)
        rng = np.random.default_rng(9)
        q = rng.normal(size=(8, vecs.shape[1]))
        # impossible target forces the full curve to n_centroids
        t = tune_nprobe(out, q, k=5, target_recall=1.01).to_pandas()
        assert t["nprobe"].tolist() == [1, 2, 4, 8]
        rec = t["recall"].to_numpy()
        assert (np.diff(rec) >= -1e-9).all()  # recall never drops
        assert rec[-1] == 1.0  # full probe == ground truth
        # a reachable target stops the walk early
        t2 = tune_nprobe(out, q, k=5, target_recall=rec[0]).to_pandas()
        assert len(t2) == 1 and bool(t2["meets_target"][0])

class TestMaxSimRerank:
    def test_rerank_subset_of_maxsim_when_candidates_cover(
        self, ray_session
    ):
        """With n_candidates >= n_docs the two-stage result equals the
        one-stage exact MaxSim (the proxy stage only prunes)."""
        from fdblucene_ray.ops.similarity import maxsim_rerank, maxsim_topk

        rng = np.random.default_rng(81)
        n_docs, dim = 30, 10
        sizes = rng.integers(1, 5, n_docs)
        docs = np.repeat(np.arange(n_docs, dtype=np.int64), sizes)
        vecs = rng.normal(size=(len(docs), dim))
        q = rng.normal(size=(3, dim))
        ds = ray.data.from_arrow(
            pa.table(
                {"doc": pa.array(docs),
                 "embedding": pa.array(
                     [v.astype(np.float32) for v in vecs],
                     pa.list_(pa.float32()))}
            )
        )
        full = maxsim_topk(ds, q, k=10).to_pandas()
        two = maxsim_rerank(ds, q, n_candidates=n_docs, k=10).to_pandas()
        assert full["doc"].tolist() == two["doc"].tolist()
        assert np.allclose(full["score"], two["score"])


class TestBatchedBeamSearch:
    """The lockstep batched beam walk returns the SAME visited sets
    and sims as the scalar reference walk, and amortizes interpreter
    overhead on large query batches."""

    def _graph(self, n=600, dim=16, R=12, seed=23):
        from fdblucene_ray.ops.graphann import _robust_prune

        rng = np.random.default_rng(seed)
        vecs = _normalize(
            _clustered_vectors(n, dim=dim, n_clusters=5, seed=seed)
        )
        adj = np.full((n, R), -1, np.int64)
        for i in range(n):
            cand = rng.integers(0, n, 3 * R)
            kept = _robust_prune(i, cand, vecs, R, 1.2)
            adj[i, : len(kept)] = kept
        return vecs, adj

    def test_batch_equals_scalar(self, ray_session):
        from fdblucene_ray.ops.graphann import (
            _greedy_search,
            _greedy_search_batch,
        )

        vecs, adj = self._graph()
        rng = np.random.default_rng(5)
        Qn = _normalize(rng.normal(size=(24, vecs.shape[1])))
        for L in (8, 32, 64):
            batched = _greedy_search_batch(vecs, adj, 0, Qn, L)
            for qi in range(len(Qn)):
                sv, ss = _greedy_search(vecs, adj, 0, Qn[qi], L)
                bv, bs = batched[qi]
                # visited SETS identical; sims agree to float64
                # rounding (einsum vs matvec differ in the last ulp)
                assert sorted(sv.tolist()) == sorted(bv.tolist()), (
                    qi, L,
                )
                a = np.array(sorted(zip(sv, ss)))
                b = np.array(sorted(zip(bv, bs)))
                assert np.allclose(a, b, atol=1e-10), (qi, L)

    def test_batch_faster_on_512_queries(self, ray_session):
        import time

        from fdblucene_ray.ops.graphann import (
            _greedy_search,
            _greedy_search_batch,
        )

        vecs, adj = self._graph(n=2000)
        rng = np.random.default_rng(9)
        Qn = _normalize(rng.normal(size=(512, vecs.shape[1])))
        L = 32
        _greedy_search_batch(vecs, adj, 0, Qn[:8], L)  # warm
        t0 = time.perf_counter()
        _greedy_search_batch(vecs, adj, 0, Qn, L)
        tb = time.perf_counter() - t0
        t0 = time.perf_counter()
        for q in Qn:
            _greedy_search(vecs, adj, 0, q, L)
        ts = time.perf_counter() - t0
        # generous bar to stay unflaky on a loaded host; typical
        # ratios are far higher
        assert tb < ts, (tb, ts)


class TestMaxSimPlaid:
    """Indexed late-interaction serving (PLAID shape): stage-1
    candidates come from a token-level IVF layout, not a corpus scan."""

    def _fixture(self, n_docs=150, tokens_per_doc=4, dim=16, seed=101):
        rng = np.random.default_rng(seed)
        # clustered TOKEN vectors so the IVF partitions carry signal
        vecs = _clustered_vectors(
            n_docs * tokens_per_doc, dim=dim, n_clusters=8, seed=seed
        )
        docs = np.repeat(
            np.arange(n_docs, dtype=np.int64), tokens_per_doc
        )
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(
                        np.arange(len(vecs), dtype=np.int64)
                    ),
                    "doc": pa.array(docs),
                    "embedding": pa.array(
                        [v.astype(np.float32) for v in vecs],
                        pa.list_(pa.float32()),
                    ),
                }
            )
        ).repartition(6)
        # a multi-token query: perturbed tokens of one mid-corpus doc
        q = vecs[200:204] + 0.05 * rng.normal(size=(4, dim))
        return ds, vecs, q

    def test_full_probe_equals_exact_when_candidates_cover(
        self, ray_session, tmp_path
    ):
        from fdblucene_ray.ops.similarity import (
            build_ivf_index,
            maxsim_rerank_indexed,
            maxsim_topk,
        )

        ds, vecs, q = self._fixture()
        idx = str(tmp_path / "msivf")
        build_ivf_index(ds, idx, n_centroids=8)
        full = maxsim_topk(ds, q, k=10).to_pandas()
        got = maxsim_rerank_indexed(
            ds, idx, q, nprobe=8, per_token=150, k=10
        ).to_pandas()
        assert got["doc"].tolist() == full["doc"].tolist()
        assert np.allclose(got["score"], full["score"])

    def test_candidate_source_pushdown_equals_broadcast_filter(
        self, ray_session, tmp_path
    ):
        """Stage-2 hydration through a caller-supplied pruned source
        (the 100-TB path) returns exactly the broadcast-filter result,
        and the source only ever sees candidate rows."""
        import pyarrow.parquet as pq
        from fdblucene_ray.ops.similarity import (
            build_ivf_index,
            maxsim_rerank_indexed,
        )

        ds, vecs, q = self._fixture()
        idx = str(tmp_path / "msivf3")
        build_ivf_index(ds, idx, n_centroids=8)
        src = str(tmp_path / "corpus.parquet")
        pq.write_table(
            pa.concat_tables(
                [b for b in ds.iter_batches(batch_format="pyarrow")]
            ).sort_by("vec_id"),
            src, row_group_size=64,
        )
        seen_rows = []

        def hydrate(doc_ids):
            import pyarrow.compute as pc_

            out = ray.data.read_parquet(
                src, filter=pc_.field("doc").isin(
                    np.asarray(doc_ids, np.int64).tolist()
                ),
            )
            seen_rows.append(out.count())
            return out

        base = maxsim_rerank_indexed(
            ds, idx, q, nprobe=4, per_token=20, k=10
        ).to_pandas()
        push = maxsim_rerank_indexed(
            ds, idx, q, nprobe=4, per_token=20, k=10,
            candidate_source=hydrate,
        ).to_pandas()
        assert push["doc"].tolist() == base["doc"].tolist()
        assert np.allclose(push["score"], base["score"])
        assert seen_rows and seen_rows[0] < ds.count()  # pruned

    def test_partial_probe_prunes_files_and_keeps_recall(
        self, ray_session, tmp_path
    ):
        """Unprobed centroid=K/ files are NEVER opened: after the
        build, every unprobed partition's parquet files are replaced
        with garbage bytes — any read of them would raise — and the
        indexed serving still answers, with recall >= 0.9 vs exact."""
        import glob as _glob
        import os

        from fdblucene_ray.ops.similarity import (
            build_ivf_index,
            maxsim_rerank_indexed,
            maxsim_topk,
            probed_partition_paths,
        )

        ds, vecs, q = self._fixture()
        idx = str(tmp_path / "msivf2")
        build_ivf_index(ds, idx, n_centroids=8)
        nprobe = 4
        probe, paths = probed_partition_paths(idx, q, nprobe)
        assert probe.shape == (4, nprobe)
        all_parts = sorted(
            _glob.glob(os.path.join(idx, "data", "centroid=*"))
        )
        probed_set = set(paths)
        unprobed = [p for p in all_parts if p not in probed_set]
        assert unprobed  # pruning is real: strictly fewer dirs probed
        for p in unprobed:
            for f in _glob.glob(os.path.join(p, "*.parquet")):
                with open(f, "wb") as fh:
                    fh.write(b"not a parquet file")

        exact = maxsim_topk(ds, q, k=10).to_pandas()
        got = maxsim_rerank_indexed(
            ds, idx, q, nprobe=nprobe, per_token=30, k=10
        ).to_pandas()
        hit = len(set(got["doc"]) & set(exact["doc"])) / 10
        assert hit >= 0.9, hit


class TestVectorIndexFacade:
    def test_build_append_query_tune(self, ray_session, tmp_path):
        from fdblucene_ray.api import VectorIndex

        vecs = _clustered_vectors(400, seed=91)
        ds = _ds_from(vecs)
        vi = VectorIndex.build_graph(
            ds.filter(expr="vec_id < 300"), str(tmp_path / "vi"),
            n_centroids=3, R=12, L_build=24,
        )
        assert vi.append(ds.filter(expr="vec_id >= 300"), "b1") is True
        vi.refresh_graphs(
            ds.filter(expr="vec_id < 300"), n_centroids=3, R=12,
            L_build=24,
        )
        rng = np.random.default_rng(3)
        q = rng.normal(size=(4, vecs.shape[1]))
        ivf = vi.topk(q, np.arange(4), k=5, nprobe=3).to_pandas()
        true = brute_force_topk(ds, q, np.arange(4), k=5).to_pandas()
        assert ivf.vec_id.tolist() == true.vec_id.tolist()  # full probe
        g = vi.graph_topk(q, np.arange(4), k=5, nprobe=3, L_search=64)
        assert g.num_rows == 20
        t = vi.tune(q, k=5, target_recall=1.01).to_pandas()
        assert t["recall"].iloc[-1] == 1.0


class TestVectorIndexLsh:
    def test_lsh_build_append_topk_via_facade(
        self, ray_session, tmp_path
    ):
        from fdblucene_ray.api import VectorIndex

        vecs = _clustered_vectors(300, seed=61)
        ds = _ds_from(vecs)
        vi = VectorIndex.build_lsh(
            ds.filter(expr="vec_id < 200"), str(tmp_path / "l"),
            n_bits=5,
        )
        assert vi.kind == "lsh"
        assert vi.append(ds.filter(expr="vec_id >= 200"), "b1") is True
        assert vi.append(ds.filter(expr="vec_id >= 200"), "b1") is False
        rng = np.random.default_rng(3)
        q = rng.normal(size=(4, vecs.shape[1]))
        got = vi.topk(q, np.arange(4), k=5, nprobe=32).to_pandas()
        true = brute_force_topk(ds, q, np.arange(4), k=5).to_pandas()
        assert got.vec_id.tolist() == true.vec_id.tolist()  # full probe
