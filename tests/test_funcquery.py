"""SynonymQuery, FunctionScoreQuery, and sort-by-field (SortField)
analogs — brute-force oracles on a planted corpus. SQL twins
(`ft_synonym`, `ft_function_score`, `ft_sort_by_field`) run in the
driver gate."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.codec.smallfloat import DECODE_TABLE, int_to_byte4
from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.search import Searcher

WORDS = ["merge", "scan", "stream", "join", "batch", "hash", "row",
         "window", "data", "spark"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("fq")
    rng = np.random.default_rng(41)
    texts = [
        " ".join(rng.choice(WORDS, size=rng.integers(3, 15)))
        for _ in range(300)
    ]
    n_chars = [len(t) for t in texts]
    src = str(tmp / "c.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(300), pa.int64()),
                "text": pa.array(texts),
                "n_chars": pa.array(n_chars, pa.int64()),
                # string group column for multi-key sort tests
                "tag": pa.array([f"t{n % 3}" for n in n_chars], pa.string()),
            }
        ),
        src,
    )
    ix = str(tmp / "ix")
    build_index(
        src, ix,
        fields={"text": {"column": "text", "analyzer": "simple"}},
        num_partitions=4,
    )
    return ix, src, texts, n_chars


def _bm25_pseudo_term(texts, members):
    """Brute-force pseudo-term BM25 (tf summed, idf from the union df)
    per doc, via the same lossy norm the engine must reproduce."""
    toks = [t.split() for t in texts]
    dls = [len(tk) for tk in toks]
    dc = len(texts)
    sttf = sum(dls)
    avgdl = sttf / dc
    tf = {
        i: sum(tk.count(m) for m in members)
        for i, tk in enumerate(toks)
        if any(m in tk for m in members)
    }
    df = len(tf)
    idf = math.log(1.0 + (dc - df + 0.5) / (df + 0.5))
    out = {}
    for d, f in tf.items():
        dlq = float(DECODE_TABLE[int_to_byte4(dls[d])])
        out[d] = idf * f / (f + 1.2 * (1 - 0.75 + (0.75 * dlq) / avgdl))
    return out


class TestSynonyms:
    def test_pseudo_term_scoring(self, corpus):
        ix, _, texts, _ = corpus
        s = Searcher(ix)
        want = _bm25_pseudo_term(texts, ["join", "merge"])
        got = s.search_synonyms([["join", "merge"]], k=1 << 31)
        assert len(got) == len(want)
        for d, sc in got:
            assert sc == pytest.approx(want[d], rel=1e-12)

    def test_single_member_equals_term_query(self, corpus):
        ix, _, _, _ = corpus
        s = Searcher(ix)
        assert s.search_synonyms([["scan"]], k=20) == pytest.approx(
            s.search("scan", k=20, mode="exhaustive")
        )

    def test_duplicate_members_collapse(self, corpus):
        ix, _, _, _ = corpus
        s = Searcher(ix)
        a = s.search_synonyms([["join", "merge"]], k=10)
        b = s.search_synonyms([["join", "merge", "join"]], k=10)
        assert a == b

    def test_groups_combine_as_disjunction(self, corpus):
        ix, _, texts, _ = corpus
        s = Searcher(ix)
        g1 = _bm25_pseudo_term(texts, ["join", "merge"])
        g2 = _bm25_pseudo_term(texts, ["scan"])
        want = {d: g1.get(d, 0.0) + g2.get(d, 0.0) for d in set(g1) | set(g2)}
        top = sorted(want.items(), key=lambda x: (-x[1], x[0]))[:10]
        got = s.search_synonyms([["join", "merge"], ["scan"]], k=10)
        assert [d for d, _ in got] == [d for d, _ in top]
        for (d, sc), (_, w) in zip(got, top):
            assert sc == pytest.approx(w, rel=1e-12)

    def test_absent_group_ignored(self, corpus):
        ix, _, _, _ = corpus
        s = Searcher(ix)
        a = s.search_synonyms([["scan"], ["zzzzz"]], k=10)
        assert a == s.search_synonyms([["scan"]], k=10)


class TestFunctionScore:
    def test_boost_reorders_and_scales(self, corpus):
        ix, src, _, n_chars = corpus
        s = Searcher(ix)
        base = dict(s.search("merge scan", k=1 << 31, mode="exhaustive"))
        want = {
            d: sc * (1.0 + 0.5 * math.log(1.0 + n_chars[d]))
            for d, sc in base.items()
        }
        top = sorted(want.items(), key=lambda x: (-x[1], x[0]))[:10]
        got = s.search_function_score(
            "merge scan", k=10, value_source=src, value_col="n_chars",
            weight=0.5,
        )
        assert [d for d, _ in got] == [d for d, _ in top]
        for (d, sc), (_, w) in zip(got, top):
            assert sc == pytest.approx(w, rel=1e-12)

    def test_zero_weight_is_bm25(self, corpus):
        ix, src, _, _ = corpus
        s = Searcher(ix)
        got = s.search_function_score(
            "merge scan", k=10, value_source=src, value_col="n_chars",
            weight=0.0,
        )
        assert got == pytest.approx(s.search("merge scan", k=10, mode="exhaustive"))

    def test_no_matches(self, corpus):
        ix, src, _, _ = corpus
        s = Searcher(ix)
        assert s.search_function_score(
            "zzzzz", value_source=src, value_col="n_chars"
        ) == []


class TestSortByField:
    def test_and_match_sorted_desc(self, corpus):
        ix, src, texts, n_chars = corpus
        s = Searcher(ix)
        match = [
            i for i, t in enumerate(texts)
            if "stream" in t.split() and "batch" in t.split()
        ]
        want = sorted(match, key=lambda d: (-n_chars[d], d))[:5]
        got = s.search_sort_by(
            "stream batch", k=5, operator="and",
            value_source=src, value_col="n_chars",
        )
        assert [d for d, _ in got] == want
        assert [v for _, v in got] == [float(n_chars[d]) for d in want]

    def test_or_match_ascending(self, corpus):
        ix, src, texts, n_chars = corpus
        s = Searcher(ix)
        match = [i for i, t in enumerate(texts) if "spark" in t.split()]
        want = sorted(match, key=lambda d: (n_chars[d], d))[:5]
        got = s.search_sort_by(
            "spark", k=5, descending=False,
            value_source=src, value_col="n_chars",
        )
        assert [d for d, _ in got] == want

    def test_no_matches(self, corpus):
        ix, src, _, _ = corpus
        s = Searcher(ix)
        assert s.search_sort_by(
            "zzzzz", value_source=src, value_col="n_chars"
        ) == []


class TestMinShouldMatch:
    def _per_term(self, s, terms):
        return {t: dict(s.search(t, k=1 << 31, mode="exhaustive")) for t in terms}

    def test_msm_filters_and_scores(self, corpus):
        ix, _, _, _ = corpus
        s = Searcher(ix)
        must, should = ["data"], ["merge", "window", "scan"]
        per = self._per_term(s, must + should)
        want = {}
        for d in per["data"]:
            hits = [t for t in should if d in per[t]]
            if len(hits) >= 2:
                want[d] = per["data"][d] + sum(per[t][d] for t in hits)
        top = sorted(want.items(), key=lambda x: (-x[1], x[0]))[:10]
        for mode in ("vectorized", "cursors"):
            got = s.search_boolean(
                must=must, should=should, k=10, min_should_match=2, mode=mode
            )
            assert [d for d, _ in got] == [d for d, _ in top], mode
            for (d, sc), (_, w) in zip(got, top):
                assert sc == pytest.approx(w, rel=1e-12)

    def test_msm_zero_unchanged(self, corpus):
        ix, _, _, _ = corpus
        s = Searcher(ix)
        a = s.search_boolean(must=["data"], should=["merge"], k=10)
        b = s.search_boolean(
            must=["data"], should=["merge"], k=10, min_should_match=0
        )
        assert a == b

    def test_pure_disjunction_msm(self, corpus):
        ix, _, _, _ = corpus
        s = Searcher(ix)
        should = ["merge", "window", "scan"]
        per = self._per_term(s, should)
        want = {}
        for d in set().union(*[set(v) for v in per.values()]):
            hits = [t for t in should if d in per[t]]
            if len(hits) >= 2:
                want[d] = sum(per[t][d] for t in hits)
        top = sorted(want.items(), key=lambda x: (-x[1], x[0]))[:10]
        for mode in ("vectorized", "cursors"):
            got = s.search_boolean(
                should=should, k=10, min_should_match=2, mode=mode
            )
            assert [d for d, _ in got] == [d for d, _ in top], mode


class TestFeatureQueries:
    """FeatureField saturation, DistanceFeatureQuery and multi-key
    SortField analogs — brute-force oracles on the planted corpus. SQL
    twins (`ft_feature_field`, `ft_distance_feature`, `ft_sort_multi`)
    run in the driver gate."""

    def test_feature_field_saturation(self, corpus):
        ix, src, _, n_chars = corpus
        s = Searcher(ix)
        base = dict(s.search("merge scan", k=1 << 31, mode="exhaustive"))
        want = {
            d: sc + 0.4 * max(n_chars[d], 0) / (max(n_chars[d], 0) + 30.0)
            for d, sc in base.items()
        }
        top = sorted(want.items(), key=lambda x: (-x[1], x[0]))[:10]
        got = s.search_feature_field(
            "merge scan", k=10, value_source=src, value_col="n_chars",
            pivot=30.0, weight=0.4,
        )
        assert [d for d, _ in got] == [d for d, _ in top]
        for (d, sc), (_, w) in zip(got, top):
            assert sc == pytest.approx(w, rel=1e-12)

    def test_feature_field_is_additive_not_multiplicative(self, corpus):
        # a zero-score feature (pivot -> inf limit not hit, but weight 0)
        # leaves the BM25 ranking untouched
        ix, src, _, _ = corpus
        s = Searcher(ix)
        base = s.search("merge scan", k=10, mode="exhaustive")
        got = s.search_feature_field(
            "merge scan", k=10, value_source=src, value_col="n_chars",
            pivot=30.0, weight=0.0,
        )
        assert [d for d, _ in got] == [d for d, _ in base]

    def test_distance_feature(self, corpus):
        ix, src, _, n_chars = corpus
        s = Searcher(ix)
        base = dict(s.search("merge scan", k=1 << 31, mode="exhaustive"))
        want = {
            d: sc + 0.7 * 20.0 / (20.0 + abs(float(n_chars[d]) - 50.0))
            for d, sc in base.items()
        }
        top = sorted(want.items(), key=lambda x: (-x[1], x[0]))[:10]
        got = s.search_distance_feature(
            "merge scan", k=10, value_source=src, value_col="n_chars",
            origin=50.0, pivot=20.0, weight=0.7,
        )
        assert [d for d, _ in got] == [d for d, _ in top]
        for (d, sc), (_, w) in zip(got, top):
            assert sc == pytest.approx(w, rel=1e-12)

    def test_distance_feature_origin_doc_gains_full_weight(self, corpus):
        ix, src, _, n_chars = corpus
        s = Searcher(ix)
        base = dict(s.search("merge", k=1 << 31, mode="exhaustive"))
        d0 = next(iter(base))
        got = dict(
            s.search_distance_feature(
                "merge", k=1 << 31, value_source=src, value_col="n_chars",
                origin=float(n_chars[d0]), pivot=5.0, weight=0.9,
            )
        )
        assert got[d0] == pytest.approx(base[d0] + 0.9, rel=1e-12)

    def test_sort_multi_single_key_equals_sort_by(self, corpus):
        ix, src, _, _ = corpus
        s = Searcher(ix)
        a = s.search_sort_by(
            "merge scan", k=10, value_source=src, value_col="n_chars"
        )
        b = s.search_sort_multi(
            "merge scan", k=10, value_source=src,
            sort_fields=[("n_chars", True)],
        )
        assert [(d, float(v)) for d, v in a] == [
            (int(r[0]), float(r[1])) for r in b
        ]

    def test_sort_multi_two_keys_bruteforce(self, corpus):
        ix, src, texts, n_chars = corpus
        s = Searcher(ix)
        match = sorted(
            d for d, t in enumerate(texts) if "merge" in t.split()
        )
        rows = [(d, f"t{n_chars[d] % 3}", n_chars[d]) for d in match]
        want = sorted(rows, key=lambda r: (r[1], -r[2], r[0]))[:7]
        got = s.search_sort_multi(
            "merge", k=7, value_source=src,
            sort_fields=[("tag", False), ("n_chars", True)],
        )
        assert [(int(r[0]), str(r[1]), int(r[2])) for r in got] == want

    def test_sort_multi_string_desc_rejected(self, corpus):
        ix, src, _, _ = corpus
        s = Searcher(ix)
        with pytest.raises(ValueError, match="descending string"):
            s.search_sort_multi(
                "merge", k=5, value_source=src,
                sort_fields=[("tag", True)],
            )


class TestStatsBy:
    def test_matches_bruteforce(self, corpus):
        ix, src, texts, n_chars = corpus
        s = Searcher(ix)
        match = sorted(
            d for d, t in enumerate(texts)
            if {"merge", "scan"} & set(t.split())
        )
        vals = [n_chars[d] for d in match]
        got = s.stats_by(
            "merge scan", value_source=src, value_col="n_chars"
        )
        assert got["n"] == len(match)
        assert got["min"] == float(min(vals))
        assert got["max"] == float(max(vals))
        assert got["sum"] == float(sum(vals))
        assert got["avg"] == pytest.approx(sum(vals) / len(vals), rel=1e-12)

    def test_no_match_empty_stats(self, corpus):
        ix, src, _, _ = corpus
        s = Searcher(ix)
        got = s.stats_by("zzzzz", value_source=src, value_col="n_chars")
        assert got == {
            "n": 0, "min": None, "max": None, "sum": 0.0, "avg": None
        }


def test_values_for_ids_missing_rows_raise(tmp_path, ray_session):
    """ADVICE r3: a value_source missing some matched ids must raise a
    clear error instead of silently misaligning searchsorted."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fdblucene_ray.index.build import build_index
    from fdblucene_ray.index.search import Searcher

    texts = [f"data point t{i:02d}" for i in range(20)]
    src = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(20), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        src,
    )
    ix = str(tmp_path / "ix")
    build_index(
        src, ix,
        fields={"text": {"column": "text", "analyzer": "simple"}},
        num_partitions=2, batch_size=8,
    )
    # value source covers only half the docs
    vsrc = str(tmp_path / "v.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(0, 20, 2), pa.int64()),
                "pop": pa.array([float(i) for i in range(10)]),
            }
        ),
        vsrc,
    )
    s = Searcher(ix)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="missing pop rows"):
        s.search_feature_field(
            "data", k=5, value_source=vsrc, value_col="pop", pivot=1.0
        )
    with _pytest.raises(ValueError, match="missing pop rows"):
        s.facet_sums(
            "data", "text", value_source=vsrc, value_col="pop"
        )
