"""Mergeable sketches for corpus-scale approximate statistics.

HyperLogLog (Flajolet et al. 2007, with the HLL++ small-range linear
counting correction from Heule et al. 2013): COUNT DISTINCT over any
column without a shuffle. Each batch folds its values into a
2^p-register sketch (one vectorized pass: splitmix64 hash, leading-zero
rank, per-register max); batches emit ONE register-blob row each, and
the driver folds B tiny blobs with an elementwise max — the classic
mergeable-sketch shape, so the same partials also serve per-partition
or per-day rollups.

At 100 TB this replaces the exact ``groupby(col).count()`` distinct
(an all-to-all shuffle of every distinct value) with a map-only pass
shipping 16 KiB per batch; standard error is ~1.04/sqrt(2^p) (~0.8%
at p=14).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from fdblucene_ray.ops.hashing import hash_strings, splitmix64


def _rank_registers(h: np.ndarray, p: int) -> np.ndarray:
    """Fold 64-bit hashes into 2^p registers: register index = top p
    bits, value = 1 + leading zeros of the remaining 64-p bits
    (capped), per-register maximum."""
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # leading zeros of the 64-bit 'rest' via bit_length: lz = 64 - bl
    # (rest is never 0 thanks to the sentinel low bits above)
    bl = np.zeros(len(rest), np.int64)
    r = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = r >= (np.uint64(1) << np.uint64(shift))
        bl[big] += shift
        r[big] >>= np.uint64(shift)
    bl += 1
    rank = (64 - bl + 1).astype(np.uint8)
    regs = np.zeros(m, np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


class _HLLPartial:
    """map_batches: one register-blob row per batch."""

    def __init__(self, col: str, p: int):
        self.col, self.p = col, p

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            h = hash_strings(col)
        else:
            vals = col.to_numpy(zero_copy_only=False).astype(np.int64)
            h = splitmix64(vals.view(np.uint64))
        regs = _rank_registers(h.astype(np.uint64), self.p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})


def _estimate(regs: np.ndarray) -> float:
    m = len(regs)
    # raw HLL estimate with the standard alpha_m constant
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.float64(2.0) ** -regs.astype(np.float64))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:  # small-range linear counting
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(
    ds: ray.data.Dataset, col: str, *, p: int = 14
) -> tuple[int, np.ndarray]:
    """Approximate COUNT(DISTINCT col): map-only register partials,
    driver folds per-batch blobs with elementwise max. Returns
    (estimate, merged registers) — registers are reusable/mergeable
    (union of datasets = max of their registers)."""
    if not (4 <= p <= 18):
        raise ValueError("p must be in [4, 18]")
    parts = ds.map_batches(
        _HLLPartial(col, p),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    regs = np.zeros(1 << p, np.uint8)
    for r in parts:
        regs = np.maximum(regs, np.frombuffer(r["regs"], np.uint8))
    return int(round(_estimate(regs))), regs


def merge_sketches(sketches: list[np.ndarray]) -> tuple[int, np.ndarray]:
    """Union of sketched sets = elementwise register max."""
    regs = np.maximum.reduce([np.asarray(s, np.uint8) for s in sketches])
    return int(round(_estimate(regs))), regs
