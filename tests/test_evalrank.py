"""Retrieval-quality evaluation (ops/evalrank.py): the distributed
hash(qid)-partitioned metric pass vs a brute-force per-query Python
oracle, plus edge cases (no relevant, no qrels, graded ties)."""

import math
import random

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fdblucene_ray.ops.evalrank import rank_eval, rank_eval_mean


def brute_force(run_rows, qrel_rows, k):
    """run_rows: (qid, doc, rank); qrel_rows: (qid, doc, rel)."""
    from collections import defaultdict

    rels = defaultdict(dict)
    for q, d, r in qrel_rows:
        rels[q][d] = r
    runs = defaultdict(list)
    for q, d, r in run_rows:
        if 1 <= r <= k:
            runs[q].append((r, d))
    out = {}
    for q, lst in runs.items():
        lst.sort()
        rel_of = rels.get(q, {})
        R = sum(1 for v in rel_of.values() if v > 0)
        Nn = sum(1 for v in rel_of.values() if v == 0)
        gains = sorted((v for v in rel_of.values() if v > 0), reverse=True)
        idcg = sum(
            (2**g - 1) / math.log2(i + 2) for i, g in enumerate(gains[:k])
        )
        dcg = 0.0
        n_hit = 0
        mrr = 0.0
        ap_num = 0.0
        cum = 0
        judged_n = 0
        nonrel_above = 0
        bpref_num = 0.0
        for rank, d in lst:
            rel = rel_of.get(d, 0)
            judged = d in rel_of
            if judged:
                judged_n += 1
            dcg += (2**rel - 1) / math.log2(rank + 1)
            if rel > 0:
                cum += 1
                n_hit += 1
                if mrr == 0.0:
                    mrr = 1.0 / rank
                ap_num += cum / rank
                if min(Nn, R) > 0:
                    bpref_num += 1 - min(nonrel_above, R) / min(Nn, R)
                else:
                    bpref_num += 1.0
            if judged and rel == 0:
                nonrel_above += 1
        out[q] = {
            "n_ret": len(lst),
            "n_rel": R,
            "mrr": mrr,
            "precision": n_hit / k,
            "recall": (n_hit / R) if R else 0.0,
            "ap": (ap_num / min(R, k)) if R else 0.0,
            "ndcg": (dcg / idcg) if idcg > 0 else 0.0,
            "judged": judged_n / len(lst) if lst else 0.0,
            "bpref": (bpref_num / R) if R else 0.0,
        }
    return out


def _to_ds(rows, cols):
    arrs = list(zip(*rows)) if rows else [[] for _ in cols]
    return ray.data.from_arrow(
        pa.table({c: pa.array(list(v), pa.int64()) for c, v in zip(cols, arrs)})
    )


def _run_op(run_rows, qrel_rows, k):
    out = (
        rank_eval(
            _to_ds(run_rows, ["qid", "doc_id", "rank"]),
            _to_ds(qrel_rows, ["qid", "doc_id", "rel"]),
            k=k,
        )
        .to_pandas()
        .set_index("qid")
        .sort_index()
    )
    return out


def _check(run_rows, qrel_rows, k):
    got = _run_op(run_rows, qrel_rows, k)
    want = brute_force(run_rows, qrel_rows, k)
    assert sorted(got.index.tolist()) == sorted(want)
    for q, w in want.items():
        row = got.loc[q]
        assert row["n_ret"] == w["n_ret"]
        assert row["n_rel"] == w["n_rel"]
        for m in ("mrr", "precision", "recall", "ap", "ndcg",
                  "judged", "bpref"):
            assert row[m] == pytest.approx(w[m], abs=1.5e-6), (q, m)


class TestRankEval:
    def test_randomized_vs_brute_force(self, ray_session):
        rng = random.Random(7)
        for trial in range(5):
            nq = rng.randint(3, 12)
            run_rows, qrel_rows = [], []
            for q in range(nq):
                docs = rng.sample(range(1000), rng.randint(1, 20))
                for r, d in enumerate(docs, 1):
                    run_rows.append((q, d, r))
                judged = rng.sample(range(1000), rng.randint(0, 30))
                for d in judged:
                    qrel_rows.append((q, d, rng.randint(0, 3)))
            _check(run_rows, qrel_rows, k=10)

    def test_perfect_run(self, ray_session):
        qrel_rows = [(0, d, 1) for d in range(5)]
        run_rows = [(0, d, d + 1) for d in range(5)]
        got = _run_op(run_rows, qrel_rows, k=10)
        row = got.loc[0]
        assert row["mrr"] == 1.0
        assert row["recall"] == 1.0
        assert row["ap"] == 1.0
        assert row["ndcg"] == 1.0
        assert row["precision"] == 0.5  # 5 relevant of k=10 slots

    def test_no_relevant_and_unjudged_query(self, ray_session):
        # qid 0: judged but nothing relevant; qid 1: never judged
        qrel_rows = [(0, 1, 0), (0, 2, 0)]
        run_rows = [(0, 1, 1), (0, 9, 2), (1, 5, 1)]
        got = _run_op(run_rows, qrel_rows, k=10)
        for q in (0, 1):
            row = got.loc[q]
            assert row["n_rel"] == 0
            for m in ("mrr", "precision", "recall", "ap", "ndcg"):
                assert row[m] == 0.0

    def test_ranks_beyond_k_ignored(self, ray_session):
        qrel_rows = [(0, 7, 2)]
        run_rows = [(0, 1, 1), (0, 7, 11)]  # relevant doc outside top-10
        got = _run_op(run_rows, qrel_rows, k=10)
        row = got.loc[0]
        assert row["n_ret"] == 1
        assert row["recall"] == 0.0 and row["ndcg"] == 0.0

    def test_graded_ties_idcg_stable(self, ray_session):
        # equal-grade docs: ideal ordering among ties must not matter
        qrel_rows = [(0, d, 2) for d in range(4)] + [(0, d, 1) for d in range(4, 8)]
        run_rows = [(0, d, r) for r, d in enumerate([5, 0, 6, 1], 1)]
        _check(run_rows, qrel_rows, k=4)

    def test_mean_summary(self, ray_session):
        qrel_rows = [(0, 1, 1), (1, 2, 1)]
        run_rows = [(0, 1, 1), (1, 9, 1)]
        per_q = rank_eval(
            _to_ds(run_rows, ["qid", "doc_id", "rank"]),
            _to_ds(qrel_rows, ["qid", "doc_id", "rel"]),
            k=10,
        )
        t = rank_eval_mean(per_q)
        assert t["n_queries"][0].as_py() == 2
        assert t["mrr"][0].as_py() == pytest.approx(0.5)
        assert t["map"][0].as_py() == pytest.approx(0.5)
