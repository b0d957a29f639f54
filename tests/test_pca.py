"""Distributed PCA (ops/clustering.py embedding_pca) vs exact numpy."""

import numpy as np
import pyarrow as pa
import ray.data

from fdblucene_ray.ops.clustering import embedding_pca, pca_project


def _vectors(n=300, d=16, seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic: a few dominant directions
    basis = rng.normal(size=(d, d))
    scales = np.concatenate((np.array([10.0, 5.0, 2.0]), np.ones(d - 3) * 0.1))
    x = rng.normal(size=(n, d)) * scales @ basis
    return x


def _table(x):
    n, d = x.shape
    offs = np.arange(0, (n + 1) * d, d, np.int32)
    emb = pa.ListArray.from_arrays(pa.array(offs),
                                   pa.array(x.ravel().astype(np.float32)))
    return pa.table({"vec_id": pa.array(range(n), pa.int64()),
                     "embedding": emb})


def test_pca_matches_numpy():
    x = _vectors()
    ds = ray.data.from_arrow(_table(x)).repartition(5)
    comps, evr, mean = embedding_pca(ds, n_components=4)
    xf = x.astype(np.float32).astype(np.float64)  # storage quantization
    m = xf.mean(axis=0)
    cov = (xf - m).T @ (xf - m) / len(xf)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    expect_evr = evals[order] / evals.sum()
    np.testing.assert_allclose(mean, m, atol=1e-9)
    np.testing.assert_allclose(evr, expect_evr, atol=1e-9)
    for i, oi in enumerate(order):
        v = evecs[:, oi]
        j = int(np.argmax(np.abs(comps[i])))
        if v[j] < 0:
            v = -v
        np.testing.assert_allclose(comps[i], v, atol=1e-7)


def test_pca_project_reconstructs_variance():
    x = _vectors()
    ds = ray.data.from_arrow(_table(x)).repartition(5)
    comps, evr, mean = embedding_pca(ds, n_components=3)
    proj = pca_project(ds, comps, mean).to_pandas().sort_values("vec_id")
    p = np.stack(proj["proj"].to_numpy())
    assert p.shape == (len(x), 3)
    xf = x.astype(np.float32).astype(np.float64)
    total_var = ((xf - xf.mean(axis=0)) ** 2).sum(axis=1).mean()
    proj_var = (p ** 2).sum(axis=1).mean()
    # top-3 captured variance ratio must match evr sum
    np.testing.assert_allclose(proj_var / total_var, evr.sum(), atol=1e-9)


class TestLabelCentroids:
    def test_matches_numpy_groupby_mean(self, ray_session):
        rng = np.random.default_rng(3)
        X = rng.normal(size=(120, 5)).astype(np.float32)
        lab = rng.integers(0, 4, 120).astype(np.int32)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "embedding": pa.array(X.tolist(), pa.list_(pa.float32())),
                    "label": pa.array(lab),
                }
            )
        ).repartition(4)
        from fdblucene_ray.ops.clustering import label_centroids

        out = label_centroids(ds).to_pandas()
        for l in range(4):
            want = X[lab == l].astype(np.float64).sum(axis=0) / (lab == l).sum()
            got = out[out.label == l].sort_values("dim")["avg"].to_numpy()
            assert np.allclose(got, np.round(want, 6), atol=1.1e-6)


class TestJLProjection:
    def test_distance_preservation_and_determinism(self, ray_session):
        rng = np.random.default_rng(8)
        X = rng.normal(size=(100, 64)).astype(np.float32)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(100), pa.int64()),
                    "embedding": pa.array(X.tolist(), pa.list_(pa.float32())),
                }
            )
        ).repartition(4)
        from fdblucene_ray.ops.clustering import jl_project

        rows = {r["vec_id"]: np.asarray(r["proj"]) for r in jl_project(ds, 32).take_all()}
        P = np.stack([rows[i] for i in range(100)])
        # deterministic matrix: across block layouts results agree to
        # BLAS dot-order jitter (~1e-15 rel; the MATRIX is identical,
        # only the matmul's internal summation order can differ)
        rows2 = {
            r["vec_id"]: np.asarray(r["proj"])
            for r in jl_project(ds.repartition(9), 32).take_all()
        }
        for i in range(100):
            assert np.allclose(rows[i], rows2[i], rtol=1e-12, atol=1e-12)
        # pairwise distance distortion is bounded (JL with k=32: loose
        # statistical bound; seeded so this never flakes)
        Xd = X.astype(np.float64)
        idx = rng.integers(0, 100, size=(200, 2))
        ratios = []
        for a, b in idx:
            if a == b:
                continue
            d0 = np.linalg.norm(Xd[a] - Xd[b])
            d1 = np.linalg.norm(P[a] - P[b])
            ratios.append(d1 / d0)
        r = np.array(ratios)
        assert 0.5 < r.min() and r.max() < 1.6
        assert abs(r.mean() - 1.0) < 0.1
