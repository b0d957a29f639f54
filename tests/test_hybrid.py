"""Hybrid retrieval (RRF): fusion math vs brute force, and the
engine legs' determinism."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from fdblucene_ray.ops.hybrid import hybrid_search, rrf_fuse


class TestRRF:
    def test_fuse_matches_bruteforce(self):
        rng = np.random.default_rng(5)
        for _ in range(20):
            a = rng.permutation(30)[: rng.integers(1, 15)].tolist()
            b = rng.permutation(30)[: rng.integers(1, 15)].tolist()
            got = rrf_fuse([a, b], k=10, c=60)
            exp = {}
            for lst in (a, b):
                for r, d in enumerate(lst, 1):
                    exp[d] = exp.get(d, 0.0) + 1.0 / (60 + r)
            rows = sorted(exp.items(), key=lambda x: (-x[1], x[0]))[:10]
            assert got["doc_id"].to_pylist() == [d for d, _ in rows]
            for g, (_, s) in zip(got["rrf"].to_pylist(), rows):
                assert g == pytest.approx(round(s, 6), abs=1e-9)

    def test_ranks_reported(self):
        got = rrf_fuse([[5, 3], [3, 9]], k=10)
        by = {d: (r0, r1) for d, r0, r1 in zip(
            got["doc_id"].to_pylist(), got["rank_0"].to_pylist(),
            got["rank_1"].to_pylist())}
        assert by[3] == (2, 1)     # in both lists
        assert by[5] == (1, 0)     # lexical only
        assert by[9] == (0, 2)     # dense only
        # doc 3 (two contributions) outranks single-list docs
        assert got["doc_id"][0].as_py() == 3

    def test_absent_doc_zero_contrib(self):
        got = rrf_fuse([[1], []], k=5)
        assert got["doc_id"].to_pylist() == [1]
        assert got["rrf"][0].as_py() == pytest.approx(round(1 / 61, 6))


def test_hybrid_search_end_to_end(tmp_path, ray_session):
    """Both legs wired: docs about 'data' that are ALSO nearest in
    embedding space rank first."""
    from fdblucene_ray.index.build import build_index
    from fdblucene_ray.index.search import Searcher

    n = 60
    texts = [
        ("data merge " if i % 3 == 0 else "window sort ") + f"w{i}"
        for i in range(n)
    ]
    # embeddings: docs 0..9 near the query direction, others orthogonal
    emb = np.zeros((n, 4), np.float32)
    emb[:, 1] = 1.0
    emb[:10, 0] = 10.0
    t = pa.table(
        {"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts)}
    )
    src = str(tmp_path / "c.parquet")
    pq.write_table(t, src)
    et = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in emb], pa.list_(pa.float32())
            ),
        }
    )
    epath = str(tmp_path / "e.parquet")
    pq.write_table(et, epath)
    ix = str(tmp_path / "ix")
    build_index(src, ix,
                fields={"text": {"column": "text", "analyzer": "simple"}},
                num_partitions=2)
    s = Searcher(ix)
    qv = np.zeros((1, 4), np.float32)
    qv[0, 0] = 1.0
    ds = ray.data.read_parquet(epath)
    out = hybrid_search(s, ["data"], ds, qv, 0, k=5, depth=20)
    assert list(out.column_names) == ["doc_id", "rrf", "bm25_rank", "ann_rank"]
    top = out["doc_id"].to_pylist()
    # doc 0/3/6/9 carry BOTH signals (multiple of 3 => 'data'; <10 => near)
    assert set(top[:4]) == {0, 3, 6, 9}


class TestScoreFuse:
    def test_matches_bruteforce(self):
        from fdblucene_ray.ops.hybrid import score_fuse

        rng = np.random.default_rng(9)
        for _ in range(20):
            legs = []
            for _ in range(2):
                ids = rng.permutation(25)[: rng.integers(2, 12)]
                legs.append([(int(d), float(rng.random() * 7)) for d in ids])
            w = [1.0, 0.5]
            got = score_fuse(legs, w, k=8)
            exp = {}
            for leg, wt in zip(legs, w):
                ss = [s for _, s in leg]
                lo, hi = min(ss), max(ss)
                for d, s in leg:
                    ns = 1.0 if hi == lo else (s - lo) / (hi - lo)
                    exp[d] = exp.get(d, 0.0) + wt * ns
            rows = sorted(exp.items(), key=lambda x: (-x[1], x[0]))[:8]
            assert got["doc_id"].to_pylist() == [d for d, _ in rows]
            for g, (_, s) in zip(got["fused"].to_pylist(), rows):
                assert g == pytest.approx(round(s, 6), abs=1e-9)

    def test_norm_modes_and_errors(self):
        from fdblucene_ray.ops.hybrid import score_fuse

        legs = [[(1, 2.0), (2, 4.0)], [(2, 1.0)]]
        mx = score_fuse(legs, norm="max", k=5)
        by = dict(zip(mx["doc_id"].to_pylist(), mx["fused"].to_pylist()))
        assert by[2] == pytest.approx(2.0)   # 4/4 + 1/1
        assert by[1] == pytest.approx(0.5)   # 2/4
        with pytest.raises(ValueError, match="one weight per leg"):
            score_fuse(legs, [1.0])
        with pytest.raises(ValueError, match="norm"):
            score_fuse(legs, norm="zscore")


class TestMMR:
    def _setup(self, tmp_path, n=40, d=8, seed=21):
        rng = np.random.default_rng(seed)
        V = rng.normal(size=(n, d)).astype(np.float32)
        # make docs 1 and 2 near-identical so diversification matters
        V[2] = V[1] + 0.01 * rng.normal(size=d).astype(np.float32)
        import pyarrow.parquet as pq

        src = str(tmp_path / "emb.parquet")
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array(V.tolist(), pa.list_(pa.float32())),
                }
            ),
            src,
        )
        return V, src

    def _brute(self, hits, V, k, lam):
        ids = np.array([d for d, _ in hits], np.int64)
        rel = np.array([s for _, s in hits], np.float64)
        Vn = V[ids].astype(np.float64)
        Vn /= np.maximum(np.linalg.norm(Vn, axis=1, keepdims=True), 1e-300)
        sel, taken = [], np.zeros(len(ids), bool)
        max_sim = np.full(len(ids), -np.inf)
        for j in range(min(k, len(ids))):
            sc = lam * rel - (0.0 if j == 0 else (1.0 - lam) * max_sim)
            sc = np.where(taken, -np.inf, sc)
            b = int(np.lexsort((ids, -sc))[0])
            sel.append(int(ids[b])); taken[b] = True
            np.maximum(max_sim, Vn @ Vn[b], out=max_sim)
        return sel

    def test_matches_bruteforce_greedy(self, tmp_path, ray_session):
        from fdblucene_ray.ops.hybrid import mmr_rerank

        V, src = self._setup(tmp_path)
        rng = np.random.default_rng(4)
        hits = [(i, float(s)) for i, s in
                zip(range(40), np.sort(rng.uniform(1, 5, 40))[::-1])]
        got = mmr_rerank(hits, src, k=8, lam=0.6)
        want = self._brute(hits, V, 8, 0.6)
        assert [d for d, _ in got] == want

    def test_lambda_one_is_relevance_order(self, tmp_path, ray_session):
        from fdblucene_ray.ops.hybrid import mmr_rerank

        V, src = self._setup(tmp_path)
        hits = [(i, 10.0 - i * 0.1) for i in range(20)]
        got = mmr_rerank(hits, src, k=5, lam=1.0)
        assert [d for d, _ in got] == [0, 1, 2, 3, 4]
        assert [round(s, 9) for _, s in got] == [
            round(10.0 - i * 0.1, 9) for i in range(5)
        ]

    def test_diversification_skips_near_duplicate(self, tmp_path, ray_session):
        from fdblucene_ray.ops.hybrid import mmr_rerank

        V, src = self._setup(tmp_path)
        # relevance order 1, 2, 3... but 2 ~ duplicate of 1
        hits = [(1, 5.0), (2, 4.99), (3, 4.5), (4, 4.4)]
        got = [d for d, _ in mmr_rerank(hits, src, k=3, lam=0.5)]
        assert got[0] == 1
        assert got[1] != 2  # near-dup pushed out of slot 2

    def test_empty_and_short(self, tmp_path, ray_session):
        from fdblucene_ray.ops.hybrid import mmr_rerank

        V, src = self._setup(tmp_path)
        assert mmr_rerank([], src, k=5) == []
        got = mmr_rerank([(7, 2.0)], src, k=5)
        assert [d for d, _ in got] == [7]


class TestSQ8Ann:
    def test_recall_against_exact(self, ray_session):
        rng = np.random.default_rng(31)
        V = rng.normal(size=(400, 24)).astype(np.float32)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(400), pa.int64()),
                    "embedding": pa.array(V.tolist(), pa.list_(pa.float32())),
                }
            )
        ).repartition(4)
        from fdblucene_ray.ops.similarity import brute_force_topk, sq8_topk

        q = V[:3].astype(np.float64)
        exact = brute_force_topk(ds, q, [0, 1, 2], k=10).to_pandas()
        approx = sq8_topk(ds, q, [0, 1, 2], k=10).to_pandas()
        for qi in range(3):
            e = set(exact[exact.query_id == qi].vec_id)
            a = set(approx[approx.query_id == qi].vec_id)
            assert len(e & a) / len(e) >= 0.8, (qi, e, a)
        # the query point itself must survive quantization as rank 1
        for qi in range(3):
            top = approx[approx.query_id == qi].sort_values(
                ["sim", "vec_id"], ascending=[False, True]
            ).vec_id.iloc[0]
            assert top == qi
