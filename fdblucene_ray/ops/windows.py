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
    session while consecutive gaps are <= ``gap_s``.

    Shape at corpus scale: the shuffle is keyed on ``hash(user) % P``
    (a few dozen partitions — user cardinality grows with the corpus,
    so grouping on the raw user id would make one Python call per
    user); every user hashed into a partition is split in ONE
    vectorized call — lexsort by (user, ts), session breaks where the
    user changes or the gap exceeds ``gap_s``, per-user 0-based session
    ordinals from run arithmetic. Skewed users bound the partition
    size; a power-user beyond worker memory would be pre-split by
    (user, coarse time bucket) first.

    Output: (user_id, session_id [0-based per user in time order],
    session_start, session_end, n_events)."""
    from fdblucene_ray.ops.hashing import hash_strings

    num_parts = max(16, int(ray.cluster_resources().get("CPU", 8)))

    def add_part(t: pa.Table) -> pa.Table:
        u = t[user_col]
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        h = hash_strings(u.cast(pa.string()))
        return t.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32))
        )

    def split_sessions(group: pa.Table) -> pa.Table:
        ts = group[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        if pa.types.is_timestamp(ts.type):
            div = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts.type.unit]
            epoch = ts.cast(pa.int64()).to_numpy(zero_copy_only=False) // div
        else:
            epoch = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        ucol = group[user_col]
        if isinstance(ucol, pa.ChunkedArray):
            ucol = ucol.combine_chunks()
        dct = ucol.dictionary_encode()
        codes = dct.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((epoch, codes))
        c, e = codes[order], epoch[order]
        if not len(c):
            return pa.table(
                {
                    "user_id": pa.array([], ucol.type),
                    "session_id": pa.array([], pa.int64()),
                    "session_start": pa.array([], pa.int64()),
                    "session_end": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        new_user = np.empty(len(c), bool)
        new_user[0] = True
        new_user[1:] = c[1:] != c[:-1]
        new_sess = new_user.copy()
        new_sess[1:] |= np.diff(e) > gap_s
        starts = np.flatnonzero(new_sess)
        ends = np.concatenate((starts[1:], [len(e)]))
        # per-user 0-based session ordinal: session index minus the
        # index of its user's first session (runs in session space)
        su = c[starts]
        ufirst = np.flatnonzero(np.concatenate(([True], su[1:] != su[:-1])))
        runlen = np.diff(np.concatenate((ufirst, [len(su)])))
        sess_id = np.arange(len(su)) - np.repeat(ufirst, runlen)
        return pa.table(
            {
                "user_id": dct.dictionary.take(pa.array(su)),
                "session_id": pa.array(sess_id, pa.int64()),
                "session_start": pa.array(e[starts], pa.int64()),
                "session_end": pa.array(e[ends - 1], pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
            }
        )

    split_sessions.__name__ = "split_sessions"
    return (
        ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part", num_partitions=num_parts)
        .map_groups(split_sessions, batch_format="pyarrow")
    )


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


def funnel_counts(
    ds: ray.data.Dataset,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_parts: int | None = None,
) -> pa.Table:
    """Ordered event-funnel analysis: how many users reach each step of
    ``steps`` with STRICTLY increasing timestamps (the classic
    first-match funnel: t_k = the user's earliest step-k event after
    t_{k-1}).

    Scale shape: ONE hashed-partition exchange on user, then every
    user's funnel evaluated simultaneously with per-run vectorized
    minima (masked ``np.minimum.reduceat`` per step — no per-user
    Python); partitions emit per-step partial counts that sum on the
    driver (len(steps) numbers each). Columns: (step, users),
    funnel order."""
    import ray as _ray

    from fdblucene_ray.ops.hashing import part_of

    num_parts = num_parts or max(
        8, int(_ray.cluster_resources().get("CPU", 8))
    )

    def add_part(t: pa.Table) -> pa.Table:
        k = t[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("part", pa.array(part_of(k, num_parts)))

    INF = np.iinfo(np.int64).max

    def funnel_partition(group: pa.Table) -> pa.Table:
        users = group[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        types = group[type_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, users))
        users, ts, types = users[order], ts[order], types[order]
        starts = np.flatnonzero(
            np.concatenate(([True], users[1:] != users[:-1]))
        )
        run_of_row = np.cumsum(
            np.concatenate(([0], (users[1:] != users[:-1]).astype(np.int64)))
        )
        # all-int64 arithmetic: microsecond timestamps exceed 2^53, so a
        # float64 detour would corrupt the strict > comparisons
        prev = np.full(len(starts), np.iinfo(np.int64).min, np.int64)
        counts = []
        for step in steps:
            m = types == step
            cand = np.where(m & (ts > prev[run_of_row]), ts, INF)
            t_k = np.minimum.reduceat(cand, starts)
            counts.append(int((t_k != INF).sum()))
            prev = t_k  # INF for unreached users propagates: ts > INF never
        return pa.table(
            {
                "step": pa.array(list(steps)),
                "users": pa.array(counts, pa.int64()),
            }
        )

    parts = (
        ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part", num_partitions=num_parts)
        .map_groups(funnel_partition, batch_format="pyarrow")
        .take_all()
    )
    agg = {s: 0 for s in steps}
    for r in parts:
        agg[r["step"]] += int(r["users"])
    return pa.table(
        {
            "step": pa.array(list(steps)),
            "users": pa.array([agg[s] for s in steps], pa.int64()),
        }
    )


def retention_weeks(
    ds: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    num_parts: int | None = None,
) -> pa.Table:
    """Weekly retention cohorts collapsed to offsets: for each user,
    week 0 = their first active week; count distinct users active at
    each week offset. One user-keyed exchange; per-partition distinct
    (user, week) pairs by lexsort runs, offsets bincounted — partitions
    emit O(#offsets) partials. Columns: (week_offset, users)."""
    import ray as _ray

    from fdblucene_ray.ops.hashing import part_of

    num_parts = num_parts or max(
        8, int(_ray.cluster_resources().get("CPU", 8))
    )
    WEEK_US = 604_800 * 1_000_000

    def add_part(t: pa.Table) -> pa.Table:
        k = t[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("part", pa.array(part_of(k, num_parts)))

    def partials(group: pa.Table) -> pa.Table:
        users = group[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        wk = ts // WEEK_US
        order = np.lexsort((wk, users))
        users, wk = users[order], wk[order]
        keep = np.concatenate(
            ([True], (users[1:] != users[:-1]) | (wk[1:] != wk[:-1]))
        )
        users, wk = users[keep], wk[keep]
        starts = np.flatnonzero(
            np.concatenate(([True], users[1:] != users[:-1]))
        )
        run_of_row = np.cumsum(
            np.concatenate(([0], (users[1:] != users[:-1]).astype(np.int64)))
        )
        off = wk - wk[starts][run_of_row]  # per (user,week): week - w0
        cnt = np.bincount(off)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "week_offset": pa.array(nz.astype(np.int64)),
                "users": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    parts = (
        ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part", num_partitions=num_parts)
        .map_groups(partials, batch_format="pyarrow")
        .take_all()
    )
    agg: dict[int, int] = {}
    for r in parts:
        agg[int(r["week_offset"])] = agg.get(int(r["week_offset"]), 0) + int(
            r["users"]
        )
    offs = sorted(agg)
    return pa.table(
        {
            "week_offset": pa.array(offs, pa.int64()),
            "users": pa.array([agg[o] for o in offs], pa.int64()),
        }
    )
