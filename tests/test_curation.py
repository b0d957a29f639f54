"""Curation ops: decontamination, PII scrubbing, deterministic sampling.

Planted-data oracles (pure-Python recomputation) — the SQL twins run in
the driver gate via scripts/check_oracle.py / CORRECTNESS_r{N}.json.
"""

import numpy as np
import pytest
import pyarrow as pa
import ray.data

from fdblucene_ray.ops.curation import (
    benchmark_ngram_set,
    decontaminate,
    knuth_hash32,
    sample_hash,
    sample_stratified,
    scrub_pii,
)


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )


def _by_id(tbl):
    t = tbl.sort_by("doc_id")
    return {r["doc_id"]: r for r in t.to_pylist()}


class TestDecontaminate:
    def test_planted_overlap(self):
        bench = ["the quick brown fox jumps over the lazy dog"]
        corpus = [
            "totally unrelated text with no shared windows here at all",
            "watch the quick brown fox jumps in this leaked eval sentence",
            "quick brown strangers never form the full window",
        ]
        out = _by_id(
            decontaminate(_docs(corpus), bench, n=4)
            .to_pandas()
            .pipe(pa.Table.from_pandas, preserve_index=False)
        )
        assert out[0]["n_hits"] == 0 and out[0]["contaminated"] == 0
        # doc 1 contains "the quick brown fox jumps" -> 2 distinct 4-gram windows
        assert out[1]["n_hits"] == 2 and out[1]["contaminated"] == 1
        assert out[2]["n_hits"] == 0

    def test_window_never_crosses_docs(self):
        # last 2 tokens of doc0 + first 2 of doc1 form a benchmark 4-gram;
        # neither doc alone contains it
        bench = ["alpha beta gamma delta"]
        corpus = ["xx yy alpha beta", "gamma delta zz ww"]
        out = _by_id(
            pa.Table.from_pandas(
                decontaminate(_docs(corpus), bench, n=4).to_pandas(),
                preserve_index=False,
            )
        )
        assert out[0]["n_hits"] == 0 and out[1]["n_hits"] == 0

    def test_ngram_counts(self):
        out = _by_id(
            pa.Table.from_pandas(
                decontaminate(_docs(["one two three four five", "a b"]), ["zz"], n=3)
                .to_pandas(),
                preserve_index=False,
            )
        )
        assert out[0]["n_grams"] == 3  # 5 tokens -> 3 trigrams
        assert out[1]["n_grams"] == 0  # shorter than the window

    def test_benchmark_set_dedup(self):
        s = benchmark_ngram_set(["a b c a b c a b c"], 3)
        assert len(s) == len(np.unique(s))
        assert len(s) == 3  # abc, bca, cab


class TestScrubPii:
    def test_planted_pii(self):
        texts = [
            "mail me at jane.doe+spam@example.co.uk or call +1 555 123 4567",
            "server at 10.0.0.1 and 192.168.1.255 responded",
            "nothing sensitive here",
        ]
        out = _by_id(
            pa.Table.from_pandas(
                scrub_pii(_docs(texts)).to_pandas(), preserve_index=False
            )
        )
        assert out[0]["n_email"] == 1 and out[0]["n_phone"] == 1
        assert "<EMAIL>" in out[0]["text"] and "<PHONE>" in out[0]["text"]
        assert "jane.doe" not in out[0]["text"]
        assert out[1]["n_ip"] == 2 and out[1]["text"].count("<IP>") == 2
        assert out[2]["text"] == "nothing sensitive here"
        assert out[2]["n_email"] == out[2]["n_ip"] == out[2]["n_phone"] == 0

    def test_ip_not_double_counted_as_phone(self):
        out = _by_id(
            pa.Table.from_pandas(
                scrub_pii(_docs(["ping 8.8.8.8 now"])).to_pandas(),
                preserve_index=False,
            )
        )
        assert out[0]["n_ip"] == 1 and out[0]["n_phone"] == 0


class TestSampling:
    def _ids_ds(self, n=2000):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                    "lang": pa.array([("en", "de", "fr")[i % 3] for i in range(n)]),
                }
            )
        )

    def test_hash_sample_deterministic_and_exact(self):
        ds = self._ids_ds()
        a = sorted(sample_hash(ds, 0.2).to_pandas()["doc_id"])
        b = sorted(sample_hash(self._ids_ds(), 0.2).to_pandas()["doc_id"])
        assert a == b
        expect = [
            i for i in range(2000) if knuth_hash32(np.array([i]))[0] < 0.2 * 2**32
        ]
        assert a == expect
        assert 0.1 < len(a) / 2000 < 0.3

    def test_hash_sample_nested(self):
        # a sample at a lower rate is a subset of one at a higher rate
        hi = set(sample_hash(self._ids_ds(), 0.3).to_pandas()["doc_id"])
        lo = set(sample_hash(self._ids_ds(), 0.1).to_pandas()["doc_id"])
        assert lo <= hi

    def test_stratified_matches_bruteforce(self):
        ds = self._ids_ds(500)
        got = (
            sample_stratified(ds, "lang", 15)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        import pandas as pd

        df = pd.DataFrame(
            {
                "doc_id": np.arange(500),
                "lang": [("en", "de", "fr")[i % 3] for i in range(500)],
            }
        )
        df["h"] = knuth_hash32(df["doc_id"].to_numpy())
        expect = (
            df.sort_values(["h", "doc_id"])
            .groupby("lang")
            .head(15)
            .sort_values("doc_id")
            .reset_index(drop=True)[["doc_id", "lang"]]
        )
        assert list(got["doc_id"]) == list(expect["doc_id"])
        assert set(got.groupby("lang").size()) == {15}


class TestCuratePipeline:
    """Composed curation pipeline: planted docs exercising every verdict
    reason, checked against hand-computed expectations."""

    def _run(self, texts, ids=None, bench=None, **kw):
        from fdblucene_ray.pipelines.curate import curate_corpus

        out = curate_corpus(_docs(texts, ids), bench, **kw)
        tbl = pa.Table.from_pandas(out.to_pandas())
        return {r["doc_id"]: r for r in tbl.to_pylist()}

    def test_each_reason_fires_in_precedence_order(self):
        en = "the quick brown fox and the lazy dog were on a hill with some of it"
        texts = [
            en,                                   # 0 keep
            en,                                   # 1 duplicate of 0
            "der hund und die katze sind nicht hier aber das haus ist mit einem",  # 2 language
            "the of and tiny",                    # 3 too_short (<10 toks)
            "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",  # 4 low_quality (0 stopwords)
            "secret bench trigram payload appears here with the usual stop words of it",  # 5 contaminated
        ]
        got = self._run(
            texts,
            bench=["secret bench trigram payload appears"],
            lang="en", min_tokens=10, min_stop_ratio=0.05, ngram=3,
            sample_rate=1.0,
        )
        assert got[0]["reason"] == "keep" and got[0]["keep"] == 1
        assert got[1]["reason"] == "duplicate"
        assert got[2]["reason"] == "language"
        assert got[3]["reason"] == "too_short"
        assert got[4]["reason"] == "low_quality"
        assert got[5]["reason"] == "contaminated"
        assert all(r["keep"] == (r["reason"] == "keep") for r in got.values())

    def test_duplicate_beats_every_other_reason(self):
        # doc 7 is a duplicate AND wrong-language AND short: precedence
        # says duplicate wins; the group winner (min doc_id) is judged
        # on its own merits.
        t = "der hund und"
        got = self._run([t, t], ids=[7, 3], lang="en", sample_rate=1.0)
        assert got[3]["reason"] in ("language", "too_short")  # winner judged
        assert got[7]["reason"] == "duplicate"

    def test_sampling_threshold_matches_knuth_hash(self):
        en = "the quick brown fox and the lazy dog were on a hill with some of it"
        n = 40
        rate = 0.5
        got = self._run([en + f" unique{i}" for i in range(n)],
                        ids=list(range(n)), lang="en", sample_rate=rate)
        thr = int(rate * (1 << 32))
        h = knuth_hash32(np.arange(n))
        for i in range(n):
            want = "sampled_out" if h[i] >= thr else "keep"
            assert got[i]["reason"] == want, (i, got[i], h[i], thr)

    def test_no_benchmark_means_no_contamination(self):
        en = "the quick brown fox and the lazy dog were on a hill with some of it"
        got = self._run([en], bench=None, sample_rate=1.0)
        assert got[0]["reason"] == "keep"


class TestCurateThenIndex:
    def test_search_excludes_non_kept_docs(self, tmp_path):
        import pyarrow.parquet as pq

        from fdblucene_ray.index.build import build_index
        from fdblucene_ray.index.search import Searcher
        from fdblucene_ray.pipelines.curate import curate_corpus

        en = ("the data merge ran on the cluster with some of the "
              "usual settings and it was fine")
        texts = [en, en, "data merge " * 6]  # 1 = duplicate, 2 = no stopwords
        ds = _docs(texts)
        verdicts = {
            r["doc_id"]: r["reason"]
            for r in curate_corpus(ds, None, lang="en", min_tokens=5,
                                   min_stop_ratio=0.05, sample_rate=1.0)
            .to_pandas().to_dict("records")
        }
        assert verdicts == {0: "keep", 1: "duplicate", 2: "low_quality"}

        kept = [i for i, r in verdicts.items() if r == "keep"]
        src = str(tmp_path / "c.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(kept, pa.int64()),
                    "text": pa.array([texts[i] for i in kept]),
                }
            ),
            src,
        )
        ix = str(tmp_path / "ix")
        build_index(
            src, ix,
            fields={"text": {"column": "text", "analyzer": "simple"}},
            num_partitions=2,
        )
        hits = Searcher(ix).search("data merge", 10)
        assert [d for d, _ in hits] == [0]  # dup + low-quality docs absent


class TestMixing:
    def _corpus(self):
        rng = np.random.default_rng(7)
        groups = ["a"] * 120 + ["b"] * 60 + ["c"] * 20
        rng.shuffle(groups)
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(200), pa.int64()),
                    "source": pa.array(groups),
                }
            )
        ), groups

    def test_rates_no_upsampling(self):
        from fdblucene_ray.ops.curation import mix_rates

        ds, _ = self._corpus()
        t = mix_rates(ds, "source", {"a": 0.5, "b": 0.25, "c": 0.25})
        rows = {r["group"]: r for r in t.to_pylist()}
        # K = min(120/0.5, 60/0.25, 20/0.25) = 80
        assert rows["a"]["rate"] == pytest.approx(0.5 * 80 / 120)
        assert rows["b"]["rate"] == pytest.approx(0.25 * 80 / 60)
        assert rows["c"]["rate"] == pytest.approx(1.0)  # binding group
        assert max(r["rate"] for r in rows.values()) <= 1.0

    def test_absent_group_dropped(self):
        from fdblucene_ray.ops.curation import mix_rates, sample_to_mix

        ds, groups = self._corpus()
        t = mix_rates(ds, "source", {"a": 0.6, "b": 0.4})
        rows = {r["group"]: r for r in t.to_pylist()}
        assert rows["c"]["rate"] == 0.0
        kept = sample_to_mix(ds, "source", {"a": 0.6, "b": 0.4}).take_all()
        assert all(r["source"] != "c" for r in kept)

    def test_sample_matches_hash_rule(self):
        from fdblucene_ray.ops.curation import mix_rates, sample_to_mix

        ds, groups = self._corpus()
        targets = {"a": 0.5, "b": 0.3, "c": 0.2}
        rates = {
            r["group"]: r["rate"]
            for r in mix_rates(ds, "source", targets).to_pylist()
        }
        kept = {r["doc_id"] for r in sample_to_mix(ds, "source", targets).take_all()}
        h = knuth_hash32(np.arange(200))
        want = {
            i
            for i in range(200)
            if h[i] < int(rates[groups[i]] * (1 << 32))
        }
        assert kept == want

    def test_mixture_approaches_target(self):
        from fdblucene_ray.ops.curation import sample_to_mix

        ds, _ = self._corpus()
        targets = {"a": 0.5, "b": 0.3, "c": 0.2}
        kept = sample_to_mix(ds, "source", targets).take_all()
        n = len(kept)
        for g, t in targets.items():
            share = sum(1 for r in kept if r["source"] == g) / n
            assert abs(share - t) < 0.12  # hash sampling noise at n~66


class TestDupNgrams:
    def test_planted_cross_doc_duplicates(self):
        from fdblucene_ray.ops.curation import dup_ngram_stats

        texts = [
            "alpha beta gamma delta epsilon",      # shares 3-grams with doc 1
            "alpha beta gamma delta zeta",         # 'alpha beta gamma', 'beta gamma delta' dup
            "one two three four five six",         # unique
            "nine eight seven nine eight seven",   # self-repeat only (within one doc: NOT dup)
        ]
        out = {
            r["doc_id"]: r
            for r in dup_ngram_stats(_docs(texts), n=3).take_all()
        }
        # brute-force oracle
        grams = [
            {" ".join(t.split()[i : i + 3]) for i in range(len(t.split()) - 2)}
            for t in texts
        ]
        for d, gs in enumerate(grams):
            dup = sum(
                1
                for g in gs
                if sum(1 for other in grams if g in other) >= 2
            )
            assert out[d]["n_grams"] == len(gs)
            assert out[d]["n_dup"] == dup
            assert out[d]["dup_frac"] == round(dup / len(gs), 6)
        # within-doc repetition alone is NOT cross-doc duplication
        assert out[3]["n_dup"] == 0

    def test_short_docs_absent(self):
        from fdblucene_ray.ops.curation import dup_ngram_stats

        texts = ["just two", "alpha beta gamma", "alpha beta gamma"]
        out = {r["doc_id"] for r in dup_ngram_stats(_docs(texts), n=3).take_all()}
        assert out == {1, 2}


class TestSeededShuffle:
    def test_permutation_and_determinism(self):
        from fdblucene_ray.ops.curation import seeded_shuffle, shuffle_key

        n = 200
        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(range(n), pa.int64())})
        )
        a = seeded_shuffle(ds, seed=7).to_pandas()
        # a permutation of the input, in shuffle_key order
        assert sorted(a["doc_id"]) == list(range(n))
        keys = a["shuffle_key"].to_numpy()
        assert np.all(np.diff(keys) >= 0)
        np.testing.assert_array_equal(
            keys, shuffle_key(a["doc_id"].to_numpy(), 7)
        )
        # reproducible: a second run is byte-identical
        b = seeded_shuffle(ds, seed=7).to_pandas()
        assert a.equals(b)

    def test_seed_changes_order(self):
        from fdblucene_ray.ops.curation import seeded_shuffle

        n = 200
        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(range(n), pa.int64())})
        )
        a = seeded_shuffle(ds, seed=1).to_pandas()["doc_id"].tolist()
        b = seeded_shuffle(ds, seed=2).to_pandas()["doc_id"].tolist()
        assert a != b  # different epoch, different permutation
        assert sorted(a) == sorted(b) == list(range(n))


class TestIncrementalDedup:
    def _split_corpus(self):
        # history 0-9; increment 10-19 with: 3 docs duplicating history
        # (10, 14, 17), one in-increment dup pair (12 == 15, 12 kept),
        # the rest fresh
        hist = [f"history doc number {i} unique words" for i in range(10)]
        inc = [f"fresh increment doc {i} body" for i in range(10)]
        inc[0] = hist[3]
        inc[4] = hist[7]
        inc[7] = hist[0]
        inc[5] = inc[2]
        return hist, inc

    @pytest.mark.parametrize("bloom_fpr", [None, 1e-6])
    def test_planted_cross_shard_dups(self, bloom_fpr):
        from fdblucene_ray.ops.dedup import incremental_dedup

        hist, inc = self._split_corpus()
        old = _docs(hist)
        new = _docs(inc, ids=list(range(10, 20)))
        out = incremental_dedup(new, old, bloom_fpr=bloom_fpr).to_pandas()
        got = dict(zip(out["doc_id"], out["dup_count"]))
        # docs 10, 14, 17 duplicate history -> dropped entirely;
        # 12 == 15 within the increment -> 12 kept with dup_count 2
        assert set(got) == {11, 12, 13, 16, 18, 19}
        assert got[12] == 2
        assert all(got[d] == 1 for d in (11, 13, 16, 18, 19))

    def test_empty_history_keeps_all(self):
        from fdblucene_ray.ops.dedup import incremental_dedup

        _, inc = self._split_corpus()
        old = _docs([])
        new = _docs(inc, ids=list(range(10, 20)))
        out = incremental_dedup(new, old).to_pandas()
        # only the in-increment dup collapses
        assert len(out) == 9
        assert int(out["dup_count"].sum()) == 10


class TestSampleTokenBudget:
    def test_matches_running_sum_rule(self):
        from fdblucene_ray.ops.curation import (
            sample_token_budget, shuffle_key,
        )

        rng = np.random.default_rng(11)
        n = 300
        texts = [
            " ".join(f"t{j}" for j in range(int(rng.integers(1, 40))))
            for _ in range(n)
        ]
        budget = 1500
        out = sample_token_budget(
            _docs(texts), budget, seed=5
        ).to_pandas().sort_values("doc_id")
        # brute force: running inclusive sum over (key, id) order
        keys = shuffle_key(np.arange(n), 5)
        order = np.lexsort((np.arange(n), keys))
        lens = np.array([len(t.split()) for t in texts])
        cum = np.cumsum(lens[order])
        keep = order[cum <= budget]
        exp = {int(d): (int(lens[d]), int(c))
               for d, c in zip(keep, cum[cum <= budget])}
        got = {int(r.doc_id): (int(r.n_tokens), int(r.cum_tokens))
               for r in out.itertuples()}
        assert got == exp
        assert 0 < len(got) < n  # budget actually bites
        assert max(c for _, c in got.values()) <= budget

    def test_budget_larger_than_corpus_keeps_all(self):
        from fdblucene_ray.ops.curation import sample_token_budget

        texts = [f"a b c doc{i}" for i in range(20)]
        out = sample_token_budget(_docs(texts), 10_000, seed=1).to_pandas()
        assert len(out) == 20
        assert int(out["n_tokens"].sum()) == 80

    def test_zero_budget_empty(self):
        from fdblucene_ray.ops.curation import sample_token_budget

        texts = [f"a b c doc{i}" for i in range(20)]
        out = sample_token_budget(_docs(texts), 0, seed=1).to_pandas()
        assert len(out) == 0


def test_weighted_sample_matches_sequential_oracle():
    """Efraimidis-Spirakis keys reproduce exact sequential weighted
    draws: verify key formula + determinism + weight bias."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from fdblucene_ray.ops.curation import weighted_sample
    from fdblucene_ray.ops.dsir import md5_uniform

    n = 400
    ids = np.arange(n, dtype=np.int64)
    w = (1.0 + (ids % 10) * 50).astype(np.float64)  # heavy tail
    t = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(w)})
    ds = ray.data.from_arrow(t).repartition(4)
    got = weighted_sample(ds, 50, weight_col="n_chars")
    # brute-force: top-50 by ln(u)/w
    key = np.log(md5_uniform(ids, 42)) / w
    expect = np.sort(np.argsort(-key, kind="stable")[:50])
    assert got["doc_id"].to_pylist() == expect.tolist()
    # determinism
    got2 = weighted_sample(ds, 50, weight_col="n_chars")
    assert got.equals(got2)
    # bias: high-weight ids (w=451) should dominate over w=1
    sel = set(got["doc_id"].to_pylist())
    heavy = sum(1 for d in sel if d % 10 == 9)
    light = sum(1 for d in sel if d % 10 == 0)
    assert heavy > light


def test_weighted_sample_zero_weight_never_selected():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from fdblucene_ray.ops.curation import weighted_sample

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(20, dtype=np.int64)),
            "n_chars": pa.array(
                [0.0] * 10 + [5.0] * 10, pa.float64()
            ),
        }
    )
    got = weighted_sample(ray.data.from_arrow(t), 15, weight_col="n_chars")
    assert all(d >= 10 for d in got["doc_id"].to_pylist())
    assert got.num_rows == 10


class TestCapPerGroup:
    def test_matches_window_oracle(self, ray_session):
        rng = np.random.default_rng(7)
        n = 400
        ids = np.arange(n, dtype=np.int64)
        grp = [f"h{int(g)}" for g in rng.integers(0, 7, n)]
        score = rng.integers(10, 5000, n).astype(np.int64)
        # plant score ties inside groups to exercise the id tie-break
        score[50:60] = 777
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids),
                    "host": pa.array(grp, pa.string()),
                    "score": pa.array(score),
                }
            )
        ).repartition(8)
        from fdblucene_ray.ops.curation import cap_per_group

        got = sorted(
            r["doc_id"]
            for r in cap_per_group(
                ds, "host", 4, order_col="score"
            ).take_all()
        )
        # brute-force window oracle
        import collections

        byg = collections.defaultdict(list)
        for i in range(n):
            byg[grp[i]].append(i)
        want = []
        for g, rows in byg.items():
            rows.sort(key=lambda i: (-score[i], i))
            want += rows[:4]
        assert got == sorted(want)

    def test_ascending_and_group_smaller_than_cap(self, ray_session):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                    "host": pa.array(["a", "a", "a", "b"]),
                    "score": pa.array([9, 1, 5, 3], pa.int64()),
                }
            )
        )
        from fdblucene_ray.ops.curation import cap_per_group

        got = sorted(
            r["doc_id"]
            for r in cap_per_group(
                ds, "host", 2, order_col="score", descending=False
            ).take_all()
        )
        assert got == [2, 3, 4]  # a: scores 1,5 -> ids 2,3; b: id 4


class TestDedupKeepBest:
    def test_planted_duplicates_keep_highest_score(self, ray_session):
        texts = (
            ["alpha beta"] * 3 + ["gamma delta"] * 2 + ["unique one"]
        )
        ids = [10, 11, 12, 20, 21, 30]
        score = [5, 9, 9, 4, 2, 7]  # dup scores: best = (9, id 11)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts),
                    "q": pa.array(score, pa.int64()),
                }
            )
        ).repartition(3)
        from fdblucene_ray.ops.dedup import exact_dedup_keep_best

        rows = {
            r["doc_id"]: r
            for r in exact_dedup_keep_best(
                ds, text_col="text", score_col="q"
            ).take_all()
        }
        assert set(rows) == {11, 20, 30}
        assert rows[11]["dup_count"] == 3 and rows[11]["score"] == 9.0
        assert rows[20]["dup_count"] == 2 and rows[20]["score"] == 4.0
        assert rows[30]["dup_count"] == 1

    def test_counts_merge_across_batches(self, ray_session):
        # the same content spread over MANY small blocks: partial
        # combiners each emit one row, the reduce must sum them
        texts = ["same text"] * 64
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(64), pa.int64()),
                    "text": pa.array(texts),
                    "q": pa.array([i % 7 for i in range(64)], pa.int64()),
                }
            )
        ).repartition(16)
        from fdblucene_ray.ops.dedup import exact_dedup_keep_best

        rows = exact_dedup_keep_best(ds, text_col="text", score_col="q").take_all()
        assert len(rows) == 1
        r = rows[0]
        # best score 6 first reached at doc_id 6
        assert r["dup_count"] == 64 and r["score"] == 6.0 and r["doc_id"] == 6
