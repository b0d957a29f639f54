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


class TestBloom:
    def test_no_false_negatives_and_fpr(self):
        from fdblucene_ray.ops.sketches import BloomFilter

        rng = np.random.default_rng(2)
        keys = rng.integers(0, 2**63, 50_000, dtype=np.int64).astype(np.uint64)
        bf = BloomFilter(len(keys), fpr=0.01)
        bf.add(keys)
        assert bf.contains(keys).all()
        probe = rng.integers(0, 2**63, 50_000, dtype=np.int64).astype(np.uint64)
        fresh = probe[~np.isin(probe, keys)]
        assert bf.contains(fresh).mean() < 0.02  # ~2x nominal bound
        # serialize roundtrip preserves membership
        bf2 = BloomFilter.from_bytes(bf.to_bytes())
        assert bf2.contains(keys).all()

    def test_bloom_decontaminate_matches_exact(self, ray_session):
        """Bloom mode finds every contaminated doc the exact mode
        finds (no false negatives); over-flagging stays near the FPR."""
        from fdblucene_ray.ops.curation import decontaminate

        rng = np.random.default_rng(6)
        bench = [" ".join(f"b{int(x)}" for x in rng.integers(0, 30, 20))
                 for _ in range(5)]
        texts = [" ".join(f"c{i}_{j}" for j in range(25)) for i in range(40)]
        texts[3] = texts[3].split(" ", 5)[-1] + " " + bench[0]  # planted
        texts[9] = bench[2]
        t = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                      "text": pa.array(texts)})
        ds = ray.data.from_arrow(t)
        exact = decontaminate(ds, bench, n=8).to_pandas().set_index("doc_id")
        # per-GRAM fpr amplifies per doc (~18 probed grams/doc here),
        # so pick fpr = doc-level target / grams-per-doc
        bloom = decontaminate(ds, bench, n=8, bloom_fpr=1e-4).to_pandas(
        ).set_index("doc_id")
        exact_flagged = set(exact[exact.contaminated == 1].index)
        bloom_flagged = set(bloom[bloom.contaminated == 1].index)
        assert {3, 9} <= exact_flagged
        assert exact_flagged <= bloom_flagged  # no false negatives
        assert len(bloom_flagged - exact_flagged) <= 1  # ~0.2% doc-level


class TestCountMin:
    def test_estimate_overestimates_never_under(self):
        import numpy as np

        from fdblucene_ray.ops.hashing import hash_strings
        from fdblucene_ray.ops.sketches import CountMinSketch

        import pyarrow as pa

        rng = np.random.default_rng(3)
        # zipf-ish counts over 2000 distinct terms
        terms = pa.array([f"t{i}" for i in range(2000)], pa.string())
        counts = (10000 / np.arange(1, 2001)).astype(np.int64) + 1
        keys = hash_strings(terms)
        cms = CountMinSketch(width=1024, depth=5)
        cms.add(keys, counts)
        est = cms.estimate(keys)
        assert (est >= counts).all()
        # eps = e/width; overestimate bounded by eps * total w.h.p.
        slack = est - counts
        assert (slack <= np.e / 1024 * counts.sum() * 3).all()

    def test_merge_equals_single_pass(self):
        import numpy as np

        from fdblucene_ray.ops.hashing import hash_strings
        from fdblucene_ray.ops.sketches import CountMinSketch

        import pyarrow as pa

        a = pa.array(["x", "y", "z"], pa.string())
        k = hash_strings(a)
        c1, c2, cboth = (CountMinSketch(256, 4) for _ in range(3))
        c1.add(k, np.array([1, 2, 3]))
        c2.add(k, np.array([10, 20, 30]))
        cboth.add(k, np.array([11, 22, 33]))
        c1.merge(c2)
        assert (c1.grid == cboth.grid).all()

    def test_heavy_hitters_recall_vs_exact(self, sf_dir):
        import os
        from collections import Counter
        import re

        import pyarrow.parquet as pq
        import ray.data

        from fdblucene_ray.ops.sketches import cms_heavy_hitters

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        table, cms = cms_heavy_hitters(ds, col="text", k=10)
        # exact counts
        t = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["text"]
        )
        exact = Counter()
        for s in t["text"].to_pylist():
            exact.update(x for x in re.split(r"[^0-9a-z_]+", s.lower()) if x)
        got = dict(zip(table["term"].to_pylist(), table["est"].to_pylist()))
        for term, est in got.items():
            assert est >= exact[term]  # one-sided error
        true_top5 = {w for w, _ in exact.most_common(5)}
        assert true_top5 <= set(got)  # recall of the skewed head


class TestGroupedHLL:
    def test_per_group_estimates_within_bound(self, sf_dir):
        import os

        import pyarrow.parquet as pq
        import ray.data

        from fdblucene_ray.ops.sketches import approx_distinct_by_group

        path = os.path.join(sf_dir, "events.parquet")
        ds = ray.data.read_parquet(path, columns=["user_id", "event_type"])
        got = approx_distinct_by_group(ds, "user_id", "event_type", p=12)
        df = got.to_pandas().set_index("grp")["approx_n"]
        exact = (
            pq.read_table(path, columns=["user_id", "event_type"])
            .to_pandas()
            .groupby("event_type")["user_id"]
            .nunique()
        )
        assert set(df.index) == set(exact.index)
        for g, n in exact.items():
            # 1.04/sqrt(2^12) ~ 1.6% std error; allow 6%
            assert abs(df[g] - n) <= max(2, 0.06 * n), (g, df[g], n)

    def test_group_fold_equals_global_on_single_group(self, sf_dir):
        import os

        import ray.data

        from fdblucene_ray.ops.sketches import (
            approx_distinct,
            approx_distinct_by_group,
        )

        path = os.path.join(sf_dir, "events.parquet")
        ds = ray.data.read_parquet(path, columns=["user_id"]).map_batches(
            lambda t: t.append_column(
                "g", __import__("pyarrow").array(["all"] * len(t))
            ),
            batch_format="pyarrow",
        )
        grouped = approx_distinct_by_group(ds, "user_id", "g", p=12)
        est, _ = approx_distinct(
            ray.data.read_parquet(path, columns=["user_id"]), "user_id",
            p=12,
        )
        assert grouped.to_pandas()["approx_n"][0] == est
