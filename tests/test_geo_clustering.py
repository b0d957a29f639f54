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
