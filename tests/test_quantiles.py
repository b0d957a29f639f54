"""Histogram quantiles: brute-force binned-quantile oracle on planted
and randomized groups. SQL twin (`group_quantiles`) runs in the
driver gate."""

import math

import numpy as np
import pyarrow as pa
import ray.data

from fdblucene_ray.ops.quantiles import group_quantiles


def _run(keys, vals, qs, w):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(keys, pa.string()),
                "v": pa.array([float(v) for v in vals], pa.float64()),
            }
        )
    )
    t = (
        group_quantiles(ds, key_col="k", value_col="v", qs=qs, bin_width=w)
        .to_pandas()
        .sort_values(["key", "q"])
        .reset_index(drop=True)
    )
    return list(
        t[["key", "q", "value", "n"]].itertuples(index=False, name=None)
    )


def _brute(keys, vals, qs, w):
    groups = {}
    for k, v in zip(keys, vals):
        groups.setdefault(k, []).append(math.floor(v / w))
    out = []
    for k in sorted(groups):
        bins = sorted(groups[k])
        n = len(bins)
        for q in qs:
            rank = max(1, math.ceil(q * n))
            out.append((k, round(q, 6), round(bins[rank - 1] * w, 6), n))
    return out


class TestGroupQuantiles:
    def test_hand_case(self):
        keys = ["a"] * 10
        vals = list(range(10))  # bins 0..9 at w=1
        got = _run(keys, vals, [0.0, 0.5, 1.0], 1.0)
        # rank(0.0)=1 -> bin 0; rank(0.5)=5 -> bin 4; rank(1.0)=10 -> 9
        assert got == [("a", 0.0, 0.0, 10), ("a", 0.5, 4.0, 10),
                       ("a", 1.0, 9.0, 10)]

    def test_randomized_matches_bruteforce(self):
        rng = np.random.default_rng(5)
        keys = [f"g{rng.integers(0, 4)}" for _ in range(400)]
        vals = rng.normal(50, 30, 400)
        qs = [0.25, 0.5, 0.9, 0.99]
        assert _run(keys, vals, qs, 5.0) == _brute(keys, vals, qs, 5.0)

    def test_negative_values_floor_binning(self):
        keys = ["a"] * 4
        vals = [-7.5, -2.5, 2.5, 7.5]  # w=5 -> bins -2, -1, 0, 1
        got = _run(keys, vals, [0.5], 5.0)
        assert got == [("a", 0.5, -5.0, 4)]
