"""Link-graph ops (ops/graph.py): PageRank + degree stats vs a dense
numpy power-iteration oracle on the same derived edge set."""

import numpy as np
import pyarrow as pa
import ray.data

from fdblucene_ray.ops.graph import (
    MAX_DEG,
    degree_stats,
    pagerank,
    pagerank_top,
    synth_out_edges,
)


def _dense_pagerank(n: int, n_iters: int, damping: float):
    src_rep, dst, deg_rep = synth_out_edges(np.arange(n, dtype=np.int64), n)
    pr = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        nxt = np.zeros(n)
        np.add.at(nxt, dst, pr[src_rep] / deg_rep)
        pr = (1.0 - damping) / n + damping * nxt
    return pr, dst


def _ids_ds(n: int) -> ray.data.Dataset:
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
    return ray.data.from_arrow(t).repartition(4)


def test_edges_shape():
    src = np.arange(40, dtype=np.int64)
    src_rep, dst, deg_rep = synth_out_edges(src, 40)
    deg = 1 + src % MAX_DEG
    assert len(dst) == deg.sum()
    assert np.array_equal(np.bincount(src_rep, minlength=40), deg)
    assert np.array_equal(deg_rep, np.repeat(deg, deg))
    assert dst.min() >= 0 and dst.max() < 40


def test_pagerank_matches_dense_power_iteration():
    n = 400
    expect, _ = _dense_pagerank(n, n_iters=3, damping=0.85)
    # the irregular graph must produce non-degenerate ranks
    assert expect.std() > 1e-5
    got = pagerank(_ids_ds(n), n_iters=3).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert len(got) == n
    assert np.array_equal(got["doc_id"].to_numpy(), np.arange(n))
    np.testing.assert_allclose(got["pr"].to_numpy(), expect, rtol=1e-12)


def test_pagerank_mass_conserved():
    n = 300
    got = pagerank(_ids_ds(n), n_iters=2).to_pandas()
    # every vertex has out-degree >= 1, so total rank mass stays 1
    assert abs(got["pr"].sum() - 1.0) < 1e-9


def test_pagerank_top_ordering_and_scale():
    n = 250
    expect, _ = _dense_pagerank(n, n_iters=3, damping=0.85)
    scaled = np.round(expect * n, 6)
    order = np.lexsort((np.arange(n), -scaled))
    t = pagerank_top(_ids_ds(n), top_n=10, n_iters=3)
    assert t.column_names == ["doc_id", "score"]
    assert t["doc_id"].to_pylist() == list(order[:10])
    np.testing.assert_allclose(
        t["score"].to_numpy(), scaled[order[:10]], atol=1e-9
    )


def test_degree_stats_matches_bincount():
    n = 350
    _, dst = _dense_pagerank(n, n_iters=1, damping=0.85)
    deg = np.bincount(dst, minlength=n)
    order = np.lexsort((np.arange(n), -deg))
    t = degree_stats(_ids_ds(n), top_n=15)
    assert t.column_names == ["doc_id", "in_deg"]
    assert t["doc_id"].to_pylist() == list(order[:15])
    assert t["in_deg"].to_pylist() == [int(deg[i]) for i in order[:15]]


def test_readability_formula_and_edges():
    from fdblucene_ray.ops.textstats import readability

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                ["The cat sat. The dog ran!", "", "word"]
            ),
        }
    )
    out = (
        readability(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["words"]) == [6, 0, 1]
    assert list(out["sentences"]) == [2, 1, 1]
    # 'the cat sat the dog ran' vowel groups: e,a,a,e,o,a = 6
    assert out["syllables"][0] == 6
    f0 = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert abs(out["flesch"][0] - round(f0, 4)) < 1e-9
    # empty doc: words clamped to 1 in the formula, no division error
    assert np.isfinite(out["flesch"][1])


def test_anchor_terms_matches_bruteforce():
    from collections import Counter

    from fdblucene_ray.ops.graph import anchor_terms

    rng = ["alpha beta gamma delta", "beta beta", "", "zeta alpha",
           "gamma gamma epsilon", "delta"]
    n = 60
    texts = [rng[i % len(rng)] for i in range(n)]
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": pa.array(texts)})
    got = anchor_terms(ray.data.from_arrow(t).repartition(3))
    src_rep, dst, _ = synth_out_edges(np.arange(n, dtype=np.int64), n)
    per = {}
    for s, d in zip(src_rep, dst):
        for tok in texts[s].lower().split()[:3]:
            per.setdefault(d, Counter())[tok] += 1
    expect = []
    for d in sorted(per):
        if not per[d]:
            continue
        term, cnt = sorted(per[d].items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expect.append((d, term, cnt))
    rows = list(zip(got["doc_id"].to_pylist(), got["term"].to_pylist(),
                    got["cnt"].to_pylist()))
    assert rows == expect


def test_trustrank_matches_dense_personalized_power_iteration():
    from fdblucene_ray.ops.graph import trustrank_top

    n = 200
    src_rep, dst, deg_rep = synth_out_edges(np.arange(n, dtype=np.int64), n)
    seed = (np.arange(n) % 7 == 0).astype(np.float64)
    v = seed / seed.sum()
    pr = v.copy()
    for _ in range(3):
        nxt = np.zeros(n)
        np.add.at(nxt, dst, pr[src_rep] / deg_rep)
        pr = 0.15 * v + 0.85 * nxt
    scaled = np.round(pr * n, 6)
    order = np.lexsort((np.arange(n), -scaled))
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "source": pa.array(
                ["seed" if s else "other" for s in seed.astype(bool)]
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    got = trustrank_top(ds, 20, seed_col="source", seed_val="seed", n_iters=3)
    assert got["doc_id"].to_pylist() == list(order[:20])
    np.testing.assert_allclose(
        got["score"].to_numpy(), scaled[order[:20]], atol=1e-9
    )
    # non-seed docs with no seed in-links get rank only via paths from
    # seeds; total mass stays 1
    assert abs(pr.sum() - 1.0) < 1e-9


def test_hits_matches_dense():
    from fdblucene_ray.ops.graph import hits_top

    n = 180
    src_rep, dst, _ = synth_out_edges(np.arange(n, dtype=np.int64), n)
    h = np.full(n, 1.0 / n)
    a = None
    for _ in range(2):
        a = np.zeros(n)
        np.add.at(a, dst, h[src_rep])
        a /= np.sqrt((a ** 2).sum())
        h = np.zeros(n)
        np.add.at(h, src_rep, a[dst])
        h /= np.sqrt((h ** 2).sum())
    got = hits_top(_ids_ds(n), top_n=10, n_iters=2)
    for kind, vec in (("auth", a), ("hub", h)):
        sub = got.filter(pa.compute.equal(got["kind"], kind))
        scaled = np.round(vec, 6)
        order = np.lexsort((np.arange(n), -scaled))[:10]
        # drop zero-score docs the engine may omit (no in/out links)
        assert sub["doc_id"].to_pylist() == [
            int(i) for i in order if scaled[i] > 0
        ][: sub.num_rows]
        np.testing.assert_allclose(
            sub["score"].to_numpy(),
            scaled[order[: sub.num_rows]],
            atol=1e-9,
        )


def test_empty_input_guards():
    from fdblucene_ray.ops.graph import (
        degree_stats,
        hits_top,
        pagerank,
        pagerank_top,
        trustrank_top,
    )

    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "source": pa.array([], pa.string())})
    )
    assert pagerank(empty).count() == 0
    assert pagerank_top(empty).num_rows == 0
    assert hits_top(empty).num_rows == 0
    assert degree_stats(empty).num_rows == 0
    assert trustrank_top(empty, seed_col="source", seed_val="x").num_rows == 0
