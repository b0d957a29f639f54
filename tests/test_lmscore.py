"""Unigram-LM scoring: model selection determinism + hand-computed NLL
oracle. The SQL twin (`lm_score`) runs in the driver gate."""

import math

import pytest

import numpy as np
import pyarrow as pa
import ray.data

from fdblucene_ray.ops.lmscore import lm_score, train_unigram_lm


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )


TEXTS = [
    "apple apple apple banana banana cherry",
    "apple banana zebra",          # zebra is OOV at vocab_size=3
    "",                            # empty doc
    "durian durian elder",         # mostly rare
]


class TestTrainUnigramLM:
    def test_counts_and_total(self):
        m = train_unigram_lm(_docs(TEXTS), vocab_size=100)
        d = dict(zip(m["terms"].tolist(), m["counts"].tolist()))
        assert d["apple"] == 4 and d["banana"] == 3 and d["cherry"] == 1
        assert m["total"] == 12
        assert list(m["terms"]) == sorted(m["terms"])  # sorted for lookup

    def test_topv_tie_break_deterministic(self):
        # counts: apple 4, banana 3, then five singletons; top-4 takes
        # the lexicographically-smallest singletons (cherry, durian)
        m = train_unigram_lm(_docs(TEXTS), vocab_size=4)
        assert set(m["terms"]) == {"apple", "banana", "cherry", "durian"}
        assert m["total"] == 12  # total counts ALL tokens, not just model


class TestLmScore:
    def test_matches_hand_computed_nll(self):
        got = {
            r["doc_id"]: r
            for r in lm_score(_docs(TEXTS), vocab_size=100)
            .to_pandas()
            .to_dict("records")
        }
        T = 12.0
        p = {"apple": 4 / T, "banana": 3 / T, "cherry": 1 / T,
             "durian": 2 / T, "elder": 1 / T, "zebra": 1 / T}
        doc0 = -np.mean([math.log(p[t]) for t in
                         "apple apple apple banana banana cherry".split()])
        assert got[0]["mean_nll"] == round(doc0, 6)
        assert got[0]["oov_frac"] == 0.0 and got[0]["n_tokens"] == 6
        assert got[2]["n_tokens"] == 0 and got[2]["mean_nll"] == 0.0

    def test_oov_scores_as_count_one(self):
        got = {
            r["doc_id"]: r
            for r in lm_score(_docs(TEXTS), vocab_size=2)  # apple, banana
            .to_pandas()
            .to_dict("records")
        }
        T = 12.0
        want = -np.mean([math.log(4 / T), math.log(3 / T), math.log(1 / T)])
        assert got[1]["mean_nll"] == round(want, 6)
        assert got[1]["oov_frac"] == round(1 / 3, 6)

    def test_external_model_reuse(self):
        # score a held-out doc under a model trained on TEXTS
        m = train_unigram_lm(_docs(TEXTS), vocab_size=100)
        got = lm_score(
            _docs(["apple unknownword"]), model=m
        ).to_pandas().iloc[0]
        T = 12.0
        want = -np.mean([math.log(4 / T), math.log(1 / T)])
        assert got["mean_nll"] == round(want, 6)
        assert got["oov_frac"] == 0.5


class TestPplBuckets:
    def test_ntile_semantics_match_bruteforce(self, ray_session):
        rng = np.random.default_rng(5)
        texts = [
            " ".join(rng.choice(
                ["a", "b", "c", "d", "e", "rare1", "rare2"],
                size=rng.integers(5, 25),
            ))
            for _ in range(101)  # odd count -> uneven ntile sizes
        ]
        srcs = [f"s{i % 3}" for i in range(101)]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(101), pa.int64()),
                    "text": pa.array(texts),
                    "source": pa.array(srcs, pa.string()),
                }
            )
        ).repartition(4)
        from fdblucene_ray.ops.lmscore import lm_score, ppl_buckets, train_unigram_lm

        model = train_unigram_lm(ds, 5)
        scored = {
            r["doc_id"]: r["mean_nll"]
            for r in lm_score(ds, model=model).take_all()
        }
        out = ppl_buckets(ds, vocab_size=5, k=3).take_all()
        # brute-force ntile per source
        import collections

        bysrc = collections.defaultdict(list)
        for i in range(101):
            bysrc[srcs[i]].append((scored[i], i))
        want = {}
        for s, rows in bysrc.items():
            rows.sort()
            n = len(rows)
            small, nbig = n // 3, n % 3
            sizes = [small + 1] * nbig + [small] * (3 - nbig)
            pos = 0
            for b, sz in enumerate(sizes, start=1):
                chunk = rows[pos : pos + sz]
                pos += sz
                if chunk:
                    want[(s, b)] = (
                        len(chunk),
                        round(min(v for v, _ in chunk), 6),
                        round(max(v for v, _ in chunk), 6),
                    )
        got = {
            (r["source"], r["bucket"]): (
                r["n_docs"], round(r["min_nll"], 6), round(r["max_nll"], 6)
            )
            for r in out
        }
        assert got == want

    def test_tiny_groups_get_one_doc_per_bucket(self, ray_session):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(["a a a", "b b"], pa.string()),
                    "source": pa.array(["x", "x"], pa.string()),
                }
            )
        )
        from fdblucene_ray.ops.lmscore import ppl_buckets

        out = sorted(
            (r["bucket"], r["n_docs"]) for r in ppl_buckets(ds, k=3).take_all()
        )
        assert out == [(1, 1), (2, 1)]  # ntile(3) of 2 rows -> buckets 1,2


class TestBigramLM:
    def test_matches_bruteforce(self, ray_session):
        rng = np.random.default_rng(6)
        texts = [
            " ".join(rng.choice(list("abcdefg"), size=rng.integers(4, 20)))
            for _ in range(80)
        ]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(80), pa.int64()),
                    "text": pa.array(texts),
                }
            )
        ).repartition(4)
        from fdblucene_ray.ops.lmscore import lm_score_bigram, train_bigram_lm

        M = 10
        model = train_bigram_lm(ds, M)
        # brute-force counts
        import collections, math

        cnt2 = collections.Counter()
        for t in texts:
            toks = t.split()
            for a, b in zip(toks, toks[1:]):
                cnt2[(a, b)] += 1
        total = sum(cnt2.values())
        top = sorted(cnt2.items(), key=lambda kv: (-kv[1], kv[0]))[:M]
        model_set = {k for k, _ in top}
        assert set(zip(model["w1"], model["w2"])) == model_set
        c1dot = collections.Counter()
        for (a, _), c in cnt2.items():
            c1dot[a] += c
        got = {
            r["doc_id"]: r
            for r in lm_score_bigram(ds, model=model).take_all()
        }
        for i, t in enumerate(texts):
            toks = t.split()
            pairs = list(zip(toks, toks[1:]))
            nlls = [
                -math.log(cnt2[p] / c1dot[p[0]])
                if p in model_set else -math.log(1.0 / total)
                for p in pairs
            ]
            r = got[i]
            assert r["n_bigrams"] == len(pairs)
            if pairs:
                assert r["mean_nll"] == pytest.approx(
                    round(sum(nlls) / len(pairs), 6), abs=1.1e-6
                )
                oov = sum(1 for p in pairs if p not in model_set)
                assert r["oov_frac"] == round(oov / len(pairs), 6)

    def test_single_token_docs_score_zero(self, ray_session):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(["word", "two words"], pa.string()),
                }
            )
        )
        from fdblucene_ray.ops.lmscore import lm_score_bigram

        got = {r["doc_id"]: r for r in lm_score_bigram(ds, 5).take_all()}
        assert got[0]["n_bigrams"] == 0 and got[0]["mean_nll"] == 0.0
        assert got[1]["n_bigrams"] == 1
