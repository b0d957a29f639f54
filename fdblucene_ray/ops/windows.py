"""Windowed aggregates over event streams (training-data telemetry).

The reference is strictly batch (SURVEY.md §2.9 — no windows), so this
is a beyond-reference operator for the 100 TB pipeline: tumbling-window
rollups expressed Ray-Data-first as

    map_batches (vectorized window assignment — pure arithmetic on the
    epoch column, no Python datetime per row)
      -> groupby(key, window_start).aggregate(count/sum/mean)

The window assignment is a deterministic pure function, so the shuffle
keys on (key, window) — hot keys can be salted exactly like index head
terms if one key dominates a window.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def assign_tumbling_window(
    batch: pa.Table, *, ts_col: str, window_s: int
) -> pa.Table:
    """Add ``window_start`` (epoch seconds, floor to the window)."""
    ts = batch[ts_col]
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    if pa.types.is_timestamp(ts.type):
        unit = ts.type.unit
        div = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
        epoch = ts.cast(pa.int64()).to_numpy(zero_copy_only=False) // div
    else:
        epoch = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
    win = (epoch // window_s) * window_s
    return batch.append_column("window_start", pa.array(win, pa.int64()))


def tumbling_window_agg(
    ds: ray.data.Dataset,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_s: int = 3600,
) -> ray.data.Dataset:
    """Per (key, tumbling window): event count, sum and mean of
    ``value_col``. Columns: key_col, window_start, n_events, sum_value,
    mean_value."""
    import ray.data.aggregate as agg

    windowed = ds.map_batches(
        assign_tumbling_window,
        fn_kwargs=dict(ts_col=ts_col, window_s=window_s),
        batch_format="pyarrow",
    )
    out = windowed.groupby([key_col, "window_start"]).aggregate(
        agg.Count(alias_name="n_events"),
        agg.Sum(value_col, alias_name="sum_value"),
        agg.Mean(value_col, alias_name="mean_value"),
    )
    return out


def sessionize(
    ds: ray.data.Dataset,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_s: int = 1800,
) -> ray.data.Dataset:
    """Gap-based sessionization: events of one user belong to the same
    session while consecutive gaps are <= ``gap_s``. The groupby
    co-locates each user's events; the per-group kernel sorts by time
    and splits on gaps (vectorized diff) — the canonical
    ``groupby(key).map_groups`` stateful-within-key Ray shape. Skewed
    users bound the group size; a power-user beyond worker memory would
    be pre-split by (user, coarse time bucket) first.

    Output: (user_id, session_id [0-based per user in time order],
    session_start, session_end, n_events)."""

    def split_sessions(group: pa.Table) -> pa.Table:
        ts = group[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        if pa.types.is_timestamp(ts.type):
            div = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts.type.unit]
            epoch = ts.cast(pa.int64()).to_numpy(zero_copy_only=False) // div
        else:
            epoch = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(epoch, kind="stable")
        e = epoch[order]
        new_sess = np.concatenate(([True], np.diff(e) > gap_s))
        sess_id = np.cumsum(new_sess) - 1
        starts = np.flatnonzero(new_sess)
        ends = np.concatenate((starts[1:], [len(e)]))
        ucol = group[user_col]
        utype = ucol.type if not isinstance(ucol, pa.ChunkedArray) else ucol.chunk(0).type
        uid = ucol[0].as_py()
        return pa.table(
            {
                "user_id": pa.array([uid] * len(starts), utype),
                "session_id": pa.array(np.arange(len(starts)), pa.int64()),
                "session_start": pa.array(e[starts], pa.int64()),
                "session_end": pa.array(e[ends - 1], pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
            }
        )

    split_sessions.__name__ = "split_sessions"
    return ds.groupby(user_col).map_groups(split_sessions, batch_format="pyarrow")


def sliding_window_agg(
    ds: ray.data.Dataset,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_s: int = 3600,
    slide_s: int = 1800,
) -> ray.data.Dataset:
    """Sliding (hopping) windows: each event lands in
    ``window_s // slide_s`` overlapping windows — the assignment stage
    EXPANDS rows (window replication factor is window_s/slide_s, a
    bounded constant), then the same groupby aggregates."""
    if window_s % slide_s:
        raise ValueError("window_s must be a multiple of slide_s")
    k = window_s // slide_s
    import ray.data.aggregate as agg

    def expand(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        if pa.types.is_timestamp(ts.type):
            div = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts.type.unit]
            epoch = ts.cast(pa.int64()).to_numpy(zero_copy_only=False) // div
        else:
            epoch = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(epoch)
        # windows containing t: starts in (t - window_s, t] on the slide grid
        last_start = (epoch // slide_s) * slide_s
        starts = np.repeat(last_start, k) - np.tile(
            np.arange(k, dtype=np.int64) * slide_s, n
        )
        valid = starts > np.repeat(epoch, k) - window_s
        idx = np.repeat(np.arange(n, dtype=np.int64), k)[valid]
        rep = batch.take(pa.array(idx))
        return rep.append_column("window_start", pa.array(starts[valid], pa.int64()))

    windowed = ds.map_batches(expand, batch_format="pyarrow")
    return windowed.groupby([key_col, "window_start"]).aggregate(
        agg.Count(alias_name="n_events"),
        agg.Sum(value_col, alias_name="sum_value"),
        agg.Mean(value_col, alias_name="mean_value"),
    )
