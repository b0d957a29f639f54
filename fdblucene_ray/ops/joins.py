"""As-of join — the classic event-stream operator Ray Data has no
built-in for (the round brief's named example of a custom operator):
each left event is joined to the LATEST right event with
``right.ts <= left.ts`` for the same key (e.g. "purchase joined to the
signup that preceded it").

Ray-Data-first shape (100 TB):

- Both sides are tagged and unioned, then ONE
  ``groupby(key).map_groups`` co-partitions them; within a key the
  match is a vectorized sort + running-maximum forward fill (no Python
  loop over events).
- The shuffle carries only (key, ts, event_id, value, side) — project
  the payload columns you need before calling.
- Skewed keys: a hot key's whole history lands in one group (the
  operator's documented partitioning assumption — same contract as
  sessionize in ops/windows.py). Salt by time range and stitch if one
  key exceeds a worker.

Determinism (for the SQL oracle): among right rows with equal ts the
LARGEST event_id wins; unmatched lefts emit -1 (never NULL, so the
row hash is stable). Ties between a right and a left at the same ts
are INCLUSIVE (the right row at ts == left.ts is visible to it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _epoch_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        div = {"s": 10**6, "ms": 10**3, "us": 1, "ns": 10**-3}[col.type.unit]
        if col.type.unit == "ns":
            return col.cast(pa.int64()).to_numpy(zero_copy_only=False) // 1000
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False) * div
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def _tag(side: int, ts_col: str, id_col: str, value_col: str, key_col: str):
    def tag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch[key_col].cast(pa.int64()),
                "ts_us": pa.array(_epoch_us(batch[ts_col])),
                "event_id": batch[id_col].cast(pa.int64()),
                "value": batch[value_col].cast(pa.float64()),
                "side": pa.array(
                    np.full(len(batch), side, np.int8), pa.int8()
                ),
            }
        )

    return tag


def _match_group(group: pa.Table) -> pa.Table:
    """EVERY key hashed into one shuffle partition matched in ONE
    vectorized call: lexsort by (key, ts, side, event_id), one global
    running-maximum forward fill, and a key-equality guard that
    invalidates a fill crossing a key boundary (sorted by key first, a
    left whose latest fill belongs to the previous key is simply
    unmatched). No per-key Python call — key cardinality grows with
    the corpus."""
    ts = group["ts_us"].to_numpy(zero_copy_only=False)
    eid = group["event_id"].to_numpy(zero_copy_only=False)
    val = group["value"].to_numpy(zero_copy_only=False)
    side = group["side"].to_numpy(zero_copy_only=False)
    keys = group["key"].to_numpy(zero_copy_only=False)
    # rights sort before lefts at equal ts (inclusive match); among
    # equal-ts rights the largest event_id ends up last => wins the
    # running maximum
    order = np.lexsort((eid, side, ts, keys))
    ts, eid, val, side, keys = (
        ts[order], eid[order], val[order], side[order], keys[order]
    )
    is_right = side == 0
    last_right = np.maximum.accumulate(
        np.where(is_right, np.arange(len(ts)), -1)
    )
    lmask = side == 1
    lr = last_right[lmask]
    matched = (lr >= 0) & (keys[np.maximum(lr, 0)] == keys[lmask])
    r_eid = np.where(matched, eid[np.maximum(lr, 0)], -1)
    r_val = np.where(matched, val[np.maximum(lr, 0)], 0.0)
    lag = np.where(matched, ts[lmask] - ts[np.maximum(lr, 0)], -1)
    return pa.table(
        {
            "event_id": pa.array(eid[lmask]),
            "key": pa.array(keys[lmask]),
            "ts_us": pa.array(ts[lmask]),
            "right_event_id": pa.array(r_eid.astype(np.int64)),
            "right_value": pa.array(np.round(r_val, 6).astype(np.float64)),
            "lag_us": pa.array(lag.astype(np.int64)),
        }
    )


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    key_col: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> ray.data.Dataset:
    """For every left row: the latest right row (same key,
    right.ts <= left.ts, ties to larger event_id). Columns:
    (event_id, key, ts_us, right_event_id, right_value, lag_us);
    unmatched -> right_event_id = lag_us = -1, right_value = 0."""
    from fdblucene_ray.ops.hashing import part_of

    num_parts = max(16, int(ray.cluster_resources().get("CPU", 8)))
    tagged = right.map_batches(
        _tag(0, ts_col, id_col, value_col, key_col), batch_format="pyarrow"
    ).union(
        left.map_batches(
            _tag(1, ts_col, id_col, value_col, key_col),
            batch_format="pyarrow",
        )
    )

    def add_part(t: pa.Table) -> pa.Table:
        k = t["key"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array(part_of(k, num_parts)))

    # shuffle keyed on hash(key) % P — a few dozen exchange keys no
    # matter how many join keys the corpus has; equal keys co-locate
    # and the per-partition kernel finds key runs with one lexsort
    return (
        tagged.map_batches(add_part, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("part", num_partitions=num_parts)
        .map_groups(_match_group, batch_format="pyarrow")
    )
