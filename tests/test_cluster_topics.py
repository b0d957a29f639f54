"""Per-cluster significant terms (ops/clustering.cluster_topics):
planted distinctive vocabulary per cluster must surface as that
cluster's top topics; JLH values match a brute-force computation."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fdblucene_ray.ops.clustering import cluster_topics


@pytest.fixture(scope="module")
def planted(ray_session):
    # 30 docs in 3 clusters; each cluster has a unique planted word,
    # everyone shares 'common'
    rows = []
    labels = []
    words = {0: "alpha", 1: "bravo", 2: "charlie"}
    for i in range(30):
        c = i % 3
        rows.append((i, f"common {words[c]} filler{i % 5}"))
        labels.append((i, c))
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in rows], pa.int64()),
                "text": pa.array([t for _, t in rows], pa.string()),
            }
        )
    )
    lab = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in labels], pa.int64()),
                "cluster": pa.array([c for _, c in labels], pa.int64()),
            }
        )
    )
    return docs, lab


class TestClusterTopics:
    def test_planted_words_top_per_cluster(self, planted):
        docs, lab = planted
        t = cluster_topics(docs, lab, n=2)
        top = {}
        for row in t.to_pylist():
            top.setdefault(row["cluster"], []).append(row["term"])
        assert top[0][0] == "alpha"
        assert top[1][0] == "bravo"
        assert top[2][0] == "charlie"

    def test_jlh_values_exact(self, planted):
        docs, lab = planted
        t = cluster_topics(docs, lab, n=2)
        row = next(r for r in t.to_pylist() if r["term"] == "alpha")
        # alpha: df_fg=10 of n_fg=10, df_all=10 of n_all=30
        assert row["df_fg"] == 10 and row["df_all"] == 10
        pf, pb = 10 / 10, 10 / 30
        assert row["score"] == pytest.approx((pf - pb) * pf / pb, abs=1e-6)

    def test_common_word_scores_zero(self, planted):
        docs, lab = planted
        t = cluster_topics(docs, lab, n=10)
        for r in t.to_pylist():
            if r["term"] == "common":
                assert r["score"] == pytest.approx(0.0, abs=1e-9)

    def test_empty_inputs(self, ray_session):
        docs = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
        )
        lab = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "cluster": pa.array([], pa.int64())})
        )
        t = cluster_topics(docs, lab, n=3)
        assert t.num_rows == 0
