"""Geo (LatLonPoint analogs) and embedding-clustering op tests."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from fdblucene_ray.ops.clustering import (
    assign_fixed_centroids,
    kmeans_cluster_sizes,
)
from fdblucene_ray.ops.geo import (
    geo_bbox_counts,
    geo_knn,
    haversine_km,
    synth_latlon,
)


def _events(sf_dir, columns):
    return ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=columns
    )


def _emb(sf_dir):
    return ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )


def test_haversine_known_points():
    # London (51.5074, -0.1278) -> Paris (48.8566, 2.3522) ~ 343-344 km
    d = haversine_km(np.array([51.5074]), np.array([-0.1278]), 48.8566, 2.3522)
    assert 340 < d[0] < 348
    # identical points -> 0
    z = haversine_km(np.array([12.0]), np.array([34.0]), 12.0, 34.0)
    assert z[0] == 0.0


def test_synth_latlon_bounds_and_determinism():
    u = np.arange(10_000, dtype=np.int64)
    lat, lon = synth_latlon(u)
    assert lat.min() >= -60 and lat.max() < 60
    assert lon.min() >= -180 and lon.max() < 180
    lat2, lon2 = synth_latlon(u)
    assert (lat == lat2).all() and (lon == lon2).all()


def test_geo_knn_matches_bruteforce(sf_dir):
    ds = _events(sf_dir, ["event_id", "user_id"])
    got = geo_knn(ds, 12.34, 56.78, 10).to_pandas()
    t = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id"],
    )
    ev = t["event_id"].to_numpy()
    us = t["user_id"].to_numpy()
    lat, lon = synth_latlon(us)
    dist = haversine_km(lat, lon, 12.34, 56.78)
    order = np.lexsort((ev, dist))[:10]
    assert list(got["event_id"]) == [int(e) for e in ev[order]]
    assert np.allclose(
        got["dist_km"].to_numpy(), np.round(dist[order], 4), atol=1e-4
    )
    # sorted ascending
    assert (np.diff(got["dist_km"].to_numpy()) >= 0).all()


def test_geo_bbox_counts_match_bruteforce(sf_dir):
    ds = _events(sf_dir, ["event_id", "user_id", "event_type"])
    got = geo_bbox_counts(ds, 0.0, 30.0, -90.0, 0.0).to_pandas()
    t = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"],
    ).to_pandas()
    lat, lon = synth_latlon(t["user_id"].to_numpy())
    inbox = (lat >= 0) & (lat < 30) & (lon >= -90) & (lon < 0)
    expect = t.loc[inbox].groupby("event_type").size()
    assert dict(zip(got["event_type"], got["n"])) == expect.to_dict()


def test_assign_fixed_centroids_is_argmin(sf_dir):
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    x = np.array([list(v) for v in t["embedding"].to_pylist()], np.float64)
    cents = x[:4]
    got = (
        assign_fixed_centroids(_emb(sf_dir), cents)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    expect = d2.argmin(axis=1)
    vid = t["vec_id"].to_numpy()
    lookup = dict(zip(got["vec_id"], got["cluster"]))
    assert all(lookup[int(v)] == int(e) for v, e in zip(vid, expect))


def test_kmeans_self_consistent(sf_dir):
    ds = _emb(sf_dir)
    sizes, cents = kmeans_cluster_sizes(ds, 4, iters=3)
    df = sizes.to_pandas()
    n_total = pq.read_metadata(
        os.path.join(sf_dir, "embeddings.parquet")
    ).num_rows
    assert df["n"].sum() == n_total
    assert set(df["cluster"]) <= set(range(4))
    # final assignment equals numpy cosine-argmax vs final centroids
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    x = np.array([list(v) for v in t["embedding"].to_pylist()], np.float64)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    assign = (xn @ cents.T).argmax(axis=1)
    expect = np.bincount(assign, minlength=4)
    got = np.zeros(4, np.int64)
    got[df["cluster"].to_numpy()] = df["n"].to_numpy()
    assert (got == expect).all()


class TestPQ:
    def test_pq_recall_on_clustered_data(self):
        import ray.data as rd

        from fdblucene_ray.ops.similarity import pq_topk

        rng = np.random.default_rng(5)
        # 20 well-separated cluster centers, 50 points each, dim 32
        centers = rng.normal(0, 10, (20, 32))
        pts = np.concatenate(
            [c + rng.normal(0, 0.3, (50, 32)) for c in centers]
        )
        t = pa.table(
            {
                "vec_id": pa.array(range(len(pts)), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, p)) for p in pts],
                    pa.list_(pa.float32()),
                ),
            }
        )
        q = pts[[0, 500]]
        got = pq_topk(
            rd.from_arrow(t), q, [0, 1], pq_k=10, m=8, k_codes=16
        ).to_pandas()
        # exact L2 top-10 per query
        for qid, qv in zip([0, 1], q):
            d = ((pts - qv) ** 2).sum(axis=1)
            exact = set(np.argsort(d, kind="stable")[:10].tolist())
            mine = set(
                got.loc[got["query_id"] == qid, "vec_id"].astype(int)
            )
            # clustered data: ADC keeps the query's own cluster together
            assert len(exact & mine) >= 6
            # self-retrieval: the query vector itself is in the corpus
            assert (qid * 500) in mine

    def test_pq_codes_roundtrip_shapes(self):
        from fdblucene_ray.ops.similarity import (
            _pq_encode,
            train_pq_codebooks,
        )

        rng = np.random.default_rng(9)
        x = rng.normal(0, 1, (300, 64))
        cb = train_pq_codebooks(x, m=8, k=16)
        assert cb.shape == (8, 16, 8)
        codes = _pq_encode(x, cb)
        assert codes.shape == (300, 8) and codes.dtype == np.uint8
        assert codes.max() < 16
        # encoding the codebook centroids themselves is exact
        flat = np.concatenate([cb[j] for j in range(8)], axis=1)
        exact_codes = _pq_encode(flat, cb)
        assert (exact_codes == np.arange(16)[:, None]).all()


class TestKCenter:
    def _brute_greedy(self, X, ids, k):
        sel = [int(np.argmin(ids))]
        d = np.full(len(ids), np.inf)
        while len(sel) < k:
            c = X[sel[-1]]
            np.minimum(d, ((X - c) ** 2).sum(axis=1), out=d)
            order = np.lexsort((ids, -d))
            best = order[0]
            if d[best] <= 0.0:
                break
            sel.append(int(best))
        return [int(ids[i]) for i in sel]

    def test_matches_bruteforce_greedy(self, sf_dir, ray_session):
        from fdblucene_ray.ops.clustering import kcenter_sample

        ds = _emb(sf_dir)
        tbl = ds.take_all()
        ids = np.array([r["vec_id"] for r in tbl], np.int64)
        X = np.array([r["embedding"] for r in tbl], np.float64)
        order = np.argsort(ids)
        ids, X = ids[order], X[order]
        want = self._brute_greedy(X, ids, 12)
        got = kcenter_sample(_emb(sf_dir), 12)
        assert got["vec_id"].to_pylist() == want
        assert got["rank"].to_pylist() == list(range(len(want)))
        assert got["dist"][0].as_py() == 0.0
        # selection distances are non-increasing (greedy invariant)
        d = got["dist"].to_pylist()[1:]
        assert all(a >= b for a, b in zip(d, d[1:]))

    def test_duplicate_points_stop_early(self, ray_session):
        from fdblucene_ray.ops.clustering import kcenter_sample

        X = [[0.0, 0.0], [0.0, 0.0], [3.0, 4.0], [3.0, 4.0]]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([5, 6, 7, 8], pa.int64()),
                    "embedding": pa.array(X, pa.list_(pa.float32())),
                }
            )
        )
        out = kcenter_sample(ds, 4)
        # only 2 distinct locations exist: seed 5, then 7 (dist 25)
        assert out["vec_id"].to_pylist() == [5, 7]
        assert out["dist"].to_pylist() == [0.0, 25.0]
