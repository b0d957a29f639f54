"""HyperLogLog approx-distinct: error bounds, mergeability,
determinism, type handling."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fdblucene_ray.ops.sketches import approx_distinct, merge_sketches


class TestHLL:
    def test_error_bound_strings(self, ray_session):
        n = 40_000
        vals = [f"u{i}" for i in range(n)] * 2  # dups must not inflate
        ds = ray.data.from_arrow(pa.table({"u": pa.array(vals)})).repartition(6)
        est, regs = approx_distinct(ds, "u")
        assert abs(est - n) / n < 0.03  # ~3 sigma at p=14
        # deterministic: same data -> same estimate
        est2, _ = approx_distinct(ds, "u")
        assert est2 == est

    def test_small_range_linear_counting(self, ray_session):
        ds = ray.data.from_arrow(
            pa.table({"u": pa.array([f"x{i}" for i in range(50)] * 4)})
        )
        est, _ = approx_distinct(ds, "u")
        assert est == 50  # linear-counting regime is near-exact

    def test_merge_equals_union(self, ray_session):
        a = ray.data.from_arrow(
            pa.table({"k": pa.array(list(range(10_000)), pa.int64())})
        )
        b = ray.data.from_arrow(
            pa.table({"k": pa.array(list(range(5_000, 15_000)), pa.int64())})
        )
        u = ray.data.from_arrow(
            pa.table({"k": pa.array(list(range(15_000)), pa.int64())})
        )
        _, ra = approx_distinct(a, "k", p=12)
        _, rb = approx_distinct(b, "k", p=12)
        em, _ = merge_sketches([ra, rb])
        eu, _ = approx_distinct(u, "k", p=12)
        assert em == eu  # sketch union == sketch of union, exactly

    def test_p_validation(self, ray_session):
        ds = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
        with pytest.raises(ValueError, match="p must"):
            approx_distinct(ds, "k", p=3)
