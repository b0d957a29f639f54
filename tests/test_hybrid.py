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
