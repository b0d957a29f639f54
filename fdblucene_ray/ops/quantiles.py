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
        """Quantiles of EVERY key hashed into one shuffle partition,
        in one vectorized call (key cardinality grows with the corpus):
        lexsort by (key, bin) finds the histogram runs, within-run
        cumulative counts come from one global cumsum minus run bases,
        and the per-(key, q) quantile bin is a reduceat first-match —
        the only Python loop is over the constant-size ``qs``."""
        bins = group["bin"].to_numpy(zero_copy_only=False)
        cnt = group["sum(cnt)"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        kcol = group["key"]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        dct = kcol.dictionary_encode()
        codes = dct.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table(
            {"key": pa.array([], pa.string()),
             "q": pa.array([], pa.float64()),
             "value": pa.array([], pa.float64()),
             "n": pa.array([], pa.int64())}
        )
        if not len(codes):
            return empty
        order = np.lexsort((bins, codes))
        c, b, ct = codes[order], bins[order], cnt[order]
        starts = np.flatnonzero(np.concatenate(([True], c[1:] != c[:-1])))
        runlen = np.diff(np.concatenate((starts, [len(c)])))
        cum = np.cumsum(ct)
        base = np.concatenate(([0], cum[starts[1:] - 1]))
        cumw = cum - np.repeat(base, runlen)
        n_k = np.add.reduceat(ct, starts)
        run_of = np.repeat(np.arange(len(starts)), runlen)
        pos = np.arange(len(c))
        key_codes = c[starts]
        out = []
        for q in qs:
            rank = np.maximum(1, np.ceil(q * n_k)).astype(np.int64)
            hit = np.where(cumw >= rank[run_of], pos, len(c))
            first = np.minimum.reduceat(hit, starts)
            out.append(
                pa.table(
                    {
                        "key": dct.dictionary.take(
                            pa.array(key_codes)
                        ).cast(pa.string()),
                        "q": pa.array(
                            np.full(len(starts), round(q, 6), np.float64)
                        ),
                        "value": pa.array(
                            np.round(b[first] * bin_width, 6).astype(
                                np.float64
                            )
                        ),
                        "n": pa.array(n_k),
                    }
                )
            )
        return pa.concat_tables(out)

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
    value = lower bound of the quantile bin. The exchange is keyed on
    ``hash(key) % P`` — a few dozen shuffle keys no matter how many
    group keys the corpus has."""
    from fdblucene_ray.ops.hashing import hash_strings

    import ray

    num_parts = max(16, int(ray.cluster_resources().get("CPU", 8)))
    partials = ds.map_batches(
        _partials(key_col, value_col, bin_width), batch_format="pyarrow"
    )
    hist = partials.groupby(["key", "bin"]).sum("cnt")

    def add_part(t: pa.Table) -> pa.Table:
        k = t["key"]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        h = hash_strings(k)
        return t.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32))
        )

    return (
        hist.map_batches(add_part, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("part", num_partitions=num_parts)
        .map_groups(_quantile_factory(list(qs), bin_width),
                    batch_format="pyarrow")
    )
