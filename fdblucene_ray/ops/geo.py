"""Geospatial operators (Lucene LatLonPoint analogs) over Ray Data.

Lucene indexes 2-D points and supports distance sort / nearest-k /
bounding-box filters (LatLonPoint.newDistanceQuery, .nearest,
.newBoxQuery); these are the numeric point/range family (SURVEY.md §2
J5) lifted to two dimensions. The synthetic corpus carries no
coordinates, so events get DETERMINISTIC lat/lon derived from user_id
with plain integer arithmetic — the exact same expression is evaluated
by the DuckDB oracle, so the grid is identical on both sides:

    lat = (user_id * 7919   % 12000) / 100.0 -  60.0    # [-60,  60)
    lon = (user_id * 104729 % 36000) / 100.0 - 180.0    # [-180, 180)

Scale shape: knn is per-batch vectorized haversine + per-batch local
top-k (argpartition), then a global sort().limit(k) over only
num_batches * k candidate rows — the corpus itself never sorts. The
bbox count pre-aggregates per batch and shuffles only (event_type, n)
partials.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

EARTH_RADIUS_KM = 6371.0


def synth_latlon(user_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic per-user coordinates on a 0.01-degree grid."""
    u = np.asarray(user_ids, np.int64)
    lat = (u * 7919 % 12000) / 100.0 - 60.0
    lon = (u * 104729 % 36000) / 100.0 - 180.0
    return lat, lon


def haversine_km(
    lat1: np.ndarray, lon1: np.ndarray, lat2: float, lon2: float
) -> np.ndarray:
    """Great-circle distance in km (vectorized, float64)."""
    rlat1 = np.radians(np.asarray(lat1, np.float64))
    rlon1 = np.radians(np.asarray(lon1, np.float64))
    rlat2 = np.radians(np.float64(lat2))
    rlon2 = np.radians(np.float64(lon2))
    s_lat = np.sin((rlat2 - rlat1) / 2.0)
    s_lon = np.sin((rlon2 - rlon1) / 2.0)
    a = s_lat * s_lat + np.cos(rlat1) * np.cos(rlat2) * s_lon * s_lon
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


class _BatchGeoTopK:
    """Per-batch synth-coords + haversine + local top-k candidates."""

    def __init__(self, qlat: float, qlon: float, k: int, id_col: str):
        self.qlat = float(qlat)
        self.qlon = float(qlon)
        self.k = int(k)
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        lat, lon = synth_latlon(users)
        dist = haversine_km(lat, lon, self.qlat, self.qlon)
        if len(dist) > self.k:
            # local top-k: keep the k smallest, ties resolved later by
            # the global (dist, id) sort
            cut = np.argpartition(dist, self.k - 1)[: self.k]
        else:
            cut = np.arange(len(dist))
        return pa.table(
            {
                self.id_col: pa.array(ids[cut], pa.int64()),
                "user_id": pa.array(users[cut], pa.int64()),
                "lat": pa.array(lat[cut], pa.float64()),
                "lon": pa.array(lon[cut], pa.float64()),
                "dist_km": pa.array(dist[cut], pa.float64()),
            }
        )


def geo_knn(
    ds: ray.data.Dataset,
    qlat: float,
    qlon: float,
    k: int = 10,
    *,
    id_col: str = "event_id",
) -> pa.Table:
    """k nearest events to (qlat, qlon) — LatLonPoint.nearest analog.

    Ties at the boundary break by id (matching the oracle's ORDER BY
    dist, id). Only num_batches * k candidate rows reach the global
    sort; dist_km is rounded to 4 dp AFTER selection.
    """
    from fdblucene_ray.ops.hashing import round_half_away

    cands = ds.map_batches(
        _BatchGeoTopK(qlat, qlon, k, id_col), batch_format="pyarrow"
    )
    top = cands.sort(["dist_km", id_col]).limit(k).to_pandas()
    return pa.table(
        {
            id_col: pa.array(top[id_col].to_numpy(np.int64)),
            "user_id": pa.array(top["user_id"].to_numpy(np.int64)),
            "dist_km": pa.array(
                round_half_away(top["dist_km"].to_numpy(np.float64), 4)
            ),
        }
    )


class _BBoxPartial:
    """Per-batch bounding-box filter + event_type count partials."""

    def __init__(self, lat_min, lat_max, lon_min, lon_max):
        self.b = (
            float(lat_min),
            float(lat_max),
            float(lon_min),
            float(lon_max),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat_min, lat_max, lon_min, lon_max = self.b
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        lat, lon = synth_latlon(users)
        mask = (
            (lat >= lat_min)
            & (lat < lat_max)
            & (lon >= lon_min)
            & (lon < lon_max)
        )
        et = batch["event_type"].filter(pa.array(mask))
        if len(et) == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        vc = pc.value_counts(et.combine_chunks())
        return pa.table(
            {
                "event_type": vc.field("values").cast(pa.string()),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )


def geo_bbox_counts(
    ds: ray.data.Dataset,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
) -> pa.Table:
    """Events inside [lat_min,lat_max) x [lon_min,lon_max), counted per
    event_type — LatLonPoint.newBoxQuery + facet. Shuffles only
    (event_type, n) partials (facet-cardinality-bounded)."""
    partials = ds.map_batches(
        _BBoxPartial(lat_min, lat_max, lon_min, lon_max),
        batch_format="pyarrow",
    ).to_pandas()
    agg = (
        partials.groupby("event_type", as_index=False)["n"]
        .sum()
        .sort_values(["n", "event_type"], ascending=[False, True])
    )
    return pa.table(
        {
            "event_type": pa.array(agg["event_type"].astype(str)),
            "n": pa.array(agg["n"].to_numpy(np.int64)),
        }
    )
