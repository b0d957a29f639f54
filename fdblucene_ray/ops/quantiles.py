"""Per-group quantiles from distributed histograms — the scale-correct
way to get p50/p95/p99 of a numeric column per key at 100 TB: exact
sorting of every group is a shuffle of the full value stream, but a
HISTOGRAM of fixed-width bins is a tiny combinable partial, and a
quantile over BINNED values (reported as the bin's lower bound) is an
exact, deterministic function of the histogram.

    map_batches: per-batch (key, bin, cnt) partials (np.unique combine)
      -> groupby(key, bin).sum       # |keys| x |bins| rows move, not values
      -> groupby(key).map_groups     # cumulative counts -> quantile bins

Quantile definition (lower / "discrete floor"): the q-quantile is the
value whose 1-based rank is ceil(q * n), i.e. the smallest bin whose
cumulative count reaches that rank — replayable in SQL with a window
cumsum. q=0 maps to rank 1.

Tradeoff: the answer is exact for the BINNED distribution; bin_width
sets the resolution (for raw-value-exact quantiles at scale you'd
iterate: re-histogram inside the winning bin — same primitive, log
passes). This mirrors how the engine's norms quantize doc lengths
(codec/smallfloat.py SmallFloat floors) — resolution traded for a
bounded, mergeable representation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _partials(key_col: str, value_col: str, bin_width: float):
    def fn(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        kd = keys.dictionary_encode()
        kcodes = np.asarray(kd.indices.to_numpy(zero_copy_only=False))
        kvals = np.asarray([v.as_py() for v in kd.dictionary], dtype=object)
        vals = batch[value_col].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        bins = np.floor(vals / bin_width).astype(np.int64)
        # combine (key, bin) within the batch
        bmin = bins.min() if len(bins) else 0
        span = int(bins.max() - bmin + 1) if len(bins) else 1
        ck = kcodes.astype(np.int64) * span + (bins - bmin)
        uniq, cnt = np.unique(ck, return_counts=True)
        return pa.table(
            {
                "key": pa.array(kvals[(uniq // span)].tolist(), pa.string()),
                "bin": pa.array((uniq % span) + bmin),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    return fn


def _quantile_factory(qs: list[float], bin_width: float):
    def per_key(group: pa.Table) -> pa.Table:
        bins = group["bin"].to_numpy(zero_copy_only=False)
        cnt = group["sum(cnt)"].to_numpy(zero_copy_only=False)
        order = np.argsort(bins)
        bins, cnt = bins[order], cnt[order]
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        key = group["key"][0].as_py()
        out_q, out_v = [], []
        for q in qs:
            rank = max(1, int(np.ceil(q * n)))
            i = int(np.searchsorted(cum, rank))
            out_q.append(q)
            out_v.append(bins[i] * bin_width)
        return pa.table(
            {
                "key": pa.array([key] * len(qs), pa.string()),
                "q": pa.array(np.round(out_q, 6).astype(np.float64)),
                "value": pa.array(
                    np.round(out_v, 6).astype(np.float64)
                ),
                "n": pa.array(np.full(len(qs), n, np.int64)),
            }
        )

    return per_key


def group_quantiles(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    value_col: str,
    qs: list[float] = (0.5, 0.95, 0.99),
    bin_width: float = 1.0,
) -> ray.data.Dataset:
    """Per-key binned quantiles -> Dataset of (key, q, value, n) where
    value = lower bound of the quantile bin."""
    partials = ds.map_batches(
        _partials(key_col, value_col, bin_width), batch_format="pyarrow"
    )
    hist = partials.groupby(["key", "bin"]).sum("cnt")
    return hist.groupby("key").map_groups(
        _quantile_factory(list(qs), bin_width), batch_format="pyarrow"
    )
