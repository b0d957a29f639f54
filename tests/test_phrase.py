"""Positions + phrase queries (DATA.md:54 "pp" family analog)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.search import Searcher
from fdblucene_ray.oracle import OracleIndex

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "quick brown dogs and quick brown foxes",
    "brown quick is not quick brown",
    "a fox a dog a quick brown fox",
    "completely unrelated words here",
    "quick quick quick brown brown",
] * 3 + ["quick brown " * 5]  # doc 18: phrase freq 5


@pytest.fixture(scope="module")
def built(tmp_path_factory, ray_session):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
        }
    )
    d = tmp_path_factory.mktemp("ph")
    src = str(d / "c.parquet")
    pq.write_table(t, src)
    ix = str(d / "ix")
    build_index(
        src, ix,
        fields={"text": {"column": "text", "analyzer": "simple", "positions": True}},
        num_partitions=4, batch_size=5, block_size=8,
    )
    oracle = OracleIndex("simple")
    for i, txt in enumerate(TEXTS):
        oracle.add(i, txt)
    return ix, oracle


class TestPhrase:
    def test_phrase_matches_oracle(self, built):
        ix, oracle = built
        s = Searcher(ix)
        for phrase in [
            "quick brown", "brown fox", "quick brown fox", "the quick",
            "brown quick", "fox dog", "unrelated words here", "quick quick",
        ]:
            got = s.phrase_freqs(phrase)
            exp = oracle.phrase_matches(phrase)
            assert got == exp, phrase

    def test_phrase_scores_match_oracle(self, built):
        ix, oracle = built
        s = Searcher(ix)
        for phrase in ["quick brown", "brown fox", "a quick brown fox"]:
            got = s.search_phrase(phrase, 10)
            exp = oracle.search_phrase(phrase, 10)
            assert [d for d, _ in got] == [d for d, _ in exp], phrase
            for (_, a), (_, b) in zip(got, exp):
                assert a == pytest.approx(b, rel=1e-12)

    def test_phrase_freq_counts(self, built):
        ix, _ = built
        s = Searcher(ix)
        freqs = dict(s.phrase_freqs("quick brown"))
        assert freqs[18] == 5
        assert freqs[1] == 2

    def test_no_match_phrases(self, built):
        ix, _ = built
        s = Searcher(ix)
        assert s.search_phrase("fox jumps dog") == []
        assert s.search_phrase("zzz yyy") == []

    def test_nonpositional_index_raises(self, tmp_path, ray_session):
        t = pa.table(
            {"doc_id": pa.array([0], pa.int64()), "text": pa.array(["a b c"])}
        )
        src = str(tmp_path / "c.parquet")
        pq.write_table(t, src)
        ix = str(tmp_path / "ix")
        build_index(src, ix, fields={"text": {"column": "text", "analyzer": "simple"}},
                    num_partitions=2)
        with pytest.raises(ValueError, match="positions"):
            Searcher(ix).search_phrase("a b")

    def test_single_term_regular_search(self, built):
        ix, oracle = built
        s = Searcher(ix)
        got = s.search_phrase("quick", 10)
        exp = oracle.search("quick", 10)
        assert [d for d, _ in got] == [d for d, _ in exp]

    def test_stopword_position_gaps(self, tmp_path, ray_session):
        """Lucene StopFilter/PhraseQuery semantics: a removed stopword
        leaves a position GAP — "quick fox" must NOT match "quick the
        fox", while the phrase "quick the fox" (hole in the query)
        matches any single token in the gap."""
        texts = [
            "quick the fox",      # 0: quick@0, fox@2
            "quick brown fox",    # 1: quick@0, brown@1, fox@2
            "quick fox runs",     # 2: quick@0, fox@1
            "the quick fox",      # 3: quick@1, fox@2
        ]
        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        src = str(tmp_path / "c.parquet")
        pq.write_table(t, src)
        ix = str(tmp_path / "ix")
        build_index(
            src, ix,
            fields={"text": {"column": "text", "analyzer": "simple_stop",
                             "positions": True}},
            num_partitions=3, batch_size=2,
        )
        s = Searcher(ix)
        oracle = OracleIndex("simple_stop")
        for i, txt in enumerate(texts):
            oracle.add(i, txt)
        # adjacent-phrase query: only docs where quick,fox are CONSECUTIVE
        assert dict(s.phrase_freqs("quick fox")) == {2: 1, 3: 1}
        # query with a mid-phrase stopword: the gap matches any token
        assert dict(s.phrase_freqs("quick the fox")) == {0: 1, 1: 1}
        for phrase in ["quick fox", "quick the fox", "the quick fox"]:
            assert s.phrase_freqs(phrase) == oracle.phrase_matches(phrase), phrase

    def test_mixed_fields_positions_subset(self, tmp_path, ray_session):
        """Positional text field + non-positional keyword field share
        partitions without corrupting either."""
        t = pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(["x y z", "y z x", "z x y", "x x y"]),
                "tag": pa.array(["a", "b", "a", "c"]),
            }
        )
        src = str(tmp_path / "c.parquet")
        pq.write_table(t, src)
        ix = str(tmp_path / "ix")
        build_index(
            src, ix,
            fields={
                "text": {"column": "text", "analyzer": "simple", "positions": True},
                "tag": {"column": "tag", "analyzer": "keyword"},
            },
            num_partitions=3,
        )
        s = Searcher(ix)
        assert dict(s.phrase_freqs("x y")) == {0: 1, 2: 1, 3: 1}
        assert [d for d, _ in s.search("a", field="tag", k=10)] == [0, 2]


class TestProximity:
    """SpanNearQuery analog: minimal-span window matching (+ordered)."""

    def test_near_matches_bruteforce_oracle(self, built):
        ix, oracle = built
        s = Searcher(ix)
        for phrase in ["quick fox", "brown dog", "quick brown fox",
                       "fox dog quick", "unrelated here"]:
            for w in (2, 3, 5, 9):
                got = s.search_near(phrase, w)
                exp = oracle.search_near(phrase, w)
                assert got == exp, (phrase, w)
                got_o = s.search_near(phrase, w, ordered=True)
                exp_o = oracle.search_near(phrase, w, ordered=True)
                assert got_o == exp_o, (phrase, w, "ordered")

    def test_near_window_semantics(self, tmp_path, ray_session):
        texts = ["alpha x beta", "beta alpha", "alpha x y z beta", "alpha"]
        t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        src = str(tmp_path / "c.parquet")
        pq.write_table(t, src)
        ix = str(tmp_path / "ix")
        build_index(src, ix,
                    fields={"text": {"column": "text", "analyzer": "simple",
                                     "positions": True}},
                    num_partitions=2)
        s = Searcher(ix)
        # span: doc0=3, doc1=2, doc2=5; doc3 lacks beta
        assert s.search_near("alpha beta", 2) == [(1, 2)]
        assert s.search_near("alpha beta", 3) == [(0, 3), (1, 2)]
        assert s.search_near("alpha beta", 5) == [(0, 3), (1, 2), (2, 5)]
        # ordered: doc1 has beta BEFORE alpha -> excluded
        assert s.search_near("alpha beta", 5, ordered=True) == [(0, 3), (2, 5)]


class TestMultiField:
    def test_multifield_sums_per_field_bm25(self, tmp_path, ray_session):
        """search_fields == sum of independent per-field oracle scores."""
        texts = ["data merge window", "data data join", "window sort",
                 "merge value data"]
        titles = ["data report", "join summary", "data window", "misc"]
        t = pa.table({
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "title": pa.array(titles, pa.string()),
        })
        src = str(tmp_path / "c.parquet")
        pq.write_table(t, src)
        ix = str(tmp_path / "ix")
        build_index(src, ix,
                    fields={"text": {"column": "text", "analyzer": "simple"},
                            "title": {"column": "title", "analyzer": "simple"}},
                    num_partitions=3)
        s = Searcher(ix)
        o_text, o_title = OracleIndex("simple"), OracleIndex("simple")
        for i in range(4):
            o_text.add(i, texts[i])
            o_title.add(i, titles[i])
        got = s.search_fields("data window", ["text", "title"], k=10)
        exp: dict[int, float] = {}
        for orc in (o_text, o_title):
            for d, sc in orc.search("data window", k=100):
                exp[d] = exp.get(d, 0.0) + sc
        exp_sorted = sorted(exp.items(), key=lambda x: (-x[1], x[0]))
        assert [d for d, _ in got] == [d for d, _ in exp_sorted]
        for (_, a), (_, b) in zip(got, exp_sorted):
            assert a == pytest.approx(b, rel=1e-12)


class TestSloppyPhrase:
    def test_slop_matches_oracle(self, built):
        ix, oracle = built
        s = Searcher(ix)
        for phrase in ["quick brown", "quick fox", "brown dog", "fox dog",
                       "quick brown fox"]:
            for slop in (0, 1, 2, 3):
                got = s.phrase_freqs(phrase, slop=slop)
                exp = oracle.phrase_matches(phrase, slop=slop)
                assert got == exp, (phrase, slop)

    def test_slop_zero_is_exact(self, built):
        ix, _ = built
        s = Searcher(ix)
        assert s.phrase_freqs("quick brown", slop=0) == s.phrase_freqs(
            "quick brown"
        )

    def test_slop_widens_monotonically(self, built):
        ix, _ = built
        s = Searcher(ix)
        prev: set[int] = set()
        for slop in (0, 1, 2, 4, 8):
            docs = {d for d, _ in s.phrase_freqs("quick fox", slop=slop)}
            assert prev <= docs
            prev = docs

    def test_two_term_gap_semantics(self, built, tmp_path):
        # "alpha x beta": gap 1 => slop>=1 matches, slop=0 doesn't
        t = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["alpha x beta", "beta alpha"], pa.string()),
        })
        src = str(tmp_path / "c.parquet")
        pq.write_table(t, src)
        ix = str(tmp_path / "ix")
        build_index(src, ix,
                    fields={"text": {"column": "text", "analyzer": "simple",
                                     "positions": True}},
                    num_partitions=1)
        s = Searcher(ix)
        assert s.phrase_freqs("alpha beta", slop=0) == []
        assert s.phrase_freqs("alpha beta", slop=1) == [(0, 1)]
        # reversed order: expected gap 1, actual -1 -> |−1−1|=2
        assert s.phrase_freqs("alpha beta", slop=2) == [(0, 1), (1, 1)]

    def test_parser_slop_syntax(self, built):
        from fdblucene_ray.analysis.queryparser import parse_query

        pq_ = parse_query('"quick fox"~2 other')
        assert ("should", "text", "quick fox", 2, 1.0) in pq_.phrases
        pq_ = parse_query('+"a b"~3^1.5')
        assert ("must", "text", "a b", 3, 1.5) in pq_.phrases
        # end-to-end: query() with slop syntax equals search_phrase(slop)
        ix, _ = built
        s = Searcher(ix)
        got = s.query('"quick fox"~2', k=30)
        exp = s.search_phrase("quick fox", k=30, slop=2)
        assert [d for d, _ in got] == [d for d, _ in exp]


class TestRescore:
    def test_rescore_combines_and_respects_window(self, built):
        """QueryRescorer analog: final = qw*bm25 + rw*phrase for docs
        INSIDE the first-pass window; docs outside it never appear
        even when they contain the phrase; weights verified against
        the two single-query surfaces."""
        ix, _ = built
        s = Searcher(ix)
        qw, rw = 1.0, 2.0
        window = 5
        first = s.search_terms(s.parse("quick", "text"), window)
        ph = dict(s.search_phrase("quick brown", 1 << 31))

        got = s.rescore("quick", "quick brown", 10, window=window,
                        query_weight=qw, rescore_weight=rw)
        exp = sorted(
            ((d, qw * sc + rw * ph.get(d, 0.0)) for d, sc in first),
            key=lambda x: (-x[1], x[0]),
        )
        assert got == exp[:10]
        # window restriction: phrase-bearing docs outside the window
        # are absent from the result
        in_window = {d for d, _ in first}
        assert all(d in in_window for d, _ in got)
        outside = set(ph) - in_window
        if outside:
            assert not ({d for d, _ in got} & outside)

    def test_rescore_no_phrase_is_first_pass(self, built):
        ix, _ = built
        s = Searcher(ix)
        got = s.rescore("quick", "zzz absent", 5, window=8)
        exp = s.search_terms(s.parse("quick", "text"), 8)[:5]
        assert got == exp

    def test_rescore_empty_first_pass(self, built):
        ix, _ = built
        s = Searcher(ix)
        assert s.rescore("notaterm", "quick brown", 5) == []


class TestSpanNot:
    def test_span_not_matches_bruteforce(self, built):
        ix, _ = built
        s = Searcher(ix)
        for exclude, pre, post in [
            ("fox", 0, 0), ("fox", 2, 1), ("dog", 3, 3), ("quick", 1, 1),
            ("absentterm", 2, 2),
        ]:
            got = s.search_span_not("quick brown", exclude, pre=pre, post=post)
            expect = []
            for i, txt in enumerate(TEXTS):
                toks = [t for t in txt.lower().split() if t]
                starts = [
                    p for p in range(len(toks) - 1)
                    if toks[p] == "quick" and toks[p + 1] == "brown"
                ]
                keep = [
                    st for st in starts
                    if not any(
                        toks[q] == exclude
                        for q in range(max(0, st - pre),
                                       min(len(toks), st + 1 + post + 1))
                    )
                ]
                if keep:
                    expect.append((i, len(keep)))
            assert got == expect, (exclude, pre, post)

    def test_span_not_absent_include(self, built):
        ix, _ = built
        assert Searcher(ix).search_span_not("nosuch words", "fox") == []

    def test_span_not_single_term_include(self, built):
        ix, _ = built
        got = Searcher(ix).search_span_not("fox", "dog", pre=1, post=1)
        expect = []
        for i, txt in enumerate(TEXTS):
            toks = txt.lower().split()
            keep = [
                p for p, t in enumerate(toks)
                if t == "fox" and not any(
                    toks[q] == "dog"
                    for q in range(max(0, p - 1), min(len(toks), p + 2))
                )
            ]
            if keep:
                expect.append((i, len(keep)))
        assert got == expect


class TestSpanOr:
    def test_span_or_matches_bruteforce(self, built):
        ix, _ = built
        s = Searcher(ix)
        got = s.search_span_or(["quick brown", "lazy dog"])
        expect = {}
        for i, txt in enumerate(TEXTS):
            toks = txt.lower().split()
            c = 0
            for a, b in [("quick", "brown"), ("lazy", "dog")]:
                c += sum(
                    1 for p in range(len(toks) - 1)
                    if toks[p] == a and toks[p + 1] == b
                )
            if c:
                expect[i] = c
        assert got == sorted(expect.items())

    def test_span_or_single_term_source(self, built):
        ix, _ = built
        s = Searcher(ix)
        got = s.search_span_or(["fox", "quick brown"])
        expect = {}
        for i, txt in enumerate(TEXTS):
            toks = txt.lower().split()
            c = toks.count("fox") + sum(
                1 for p in range(len(toks) - 1)
                if toks[p] == "quick" and toks[p + 1] == "brown"
            )
            if c:
                expect[i] = c
        assert got == sorted(expect.items())


class TestSynonymMultiword:
    def test_reduces_to_single_word_path(self, built):
        ix, _ = built
        s = Searcher(ix)
        a = s.search_synonyms([["quick", "brown"], ["fox"]], k=10)
        b = s.search_synonyms_multiword([["quick", "brown"], ["fox"]], k=10)
        assert a == b

    def test_phrase_member_adds_phrase_freq(self, built):
        ix, _ = built
        s = Searcher(ix)
        # group = {"quick brown" phrase, "dog"}: per-doc tf must equal
        # phrase_freq + tf(dog); df = union doc count
        got = dict(s.search_synonyms_multiword([["quick brown", "dog"]], k=100))
        pf = dict(s.phrase_freqs("quick brown"))
        dogs = dict(s.phrase_freqs("dog"))
        union = sorted(set(pf) | set(dogs))
        assert sorted(got) == union
        import math

        dc, _, avgdl = s.field_stats("text")
        from fdblucene_ray.index.search import bm25_idf, bm25_norm_cache

        idf = bm25_idf(dc, len(union))
        ncache = bm25_norm_cache(avgdl, s.k1, s.b)
        for d in union:
            tf = pf.get(d, 0) + dogs.get(d, 0)
            norm = None  # fetch via doc_norms path: recompute from tf eq
            # invert: score = idf*tf/(tf+K): check score in (0, idf)
            assert 0 < got[d] < idf
            # exact: K from the quantized doclen of this doc
        # strictest check on one doc with both members present
        both = [d for d in union if d in pf and d in dogs]
        assert both, "fixture must have a doc with both phrase and term"


class TestMultiPhrase:
    def test_multi_phrase_matches_bruteforce(self, built):
        ix, _ = built
        s = Searcher(ix)
        slots = [["quick"], ["brown", "red"]]
        got = s.search_multi_phrase(slots, k=100)
        # brute force anchors
        import math

        from fdblucene_ray.index.search import bm25_idf, bm25_norm_cache
        match_tf = {}
        for i, txt in enumerate(TEXTS):
            toks = txt.lower().split()
            c = sum(
                1 for p in range(len(toks) - 1)
                if toks[p] == "quick" and toks[p + 1] in ("brown", "red")
            )
            if c:
                match_tf[i] = c
        assert sorted(d for d, _ in got) == sorted(match_tf)
        # single-alternative slots must equal plain PhraseQuery
        a = s.search_multi_phrase([["quick"], ["brown"]], k=100)
        b = s.search_phrase("quick brown", k=100)
        assert a == b

    def test_multi_phrase_union_positions(self, built):
        ix, _ = built
        s = Searcher(ix)
        # 'brown quick is not quick brown' (doc 2, 8, 14): slot0 in
        # {brown,quick} slot1 in {quick,brown} matches both orders
        got = dict(
            (d, None) for d, _ in
            s.search_multi_phrase([["brown", "quick"], ["quick", "brown"]],
                                  k=100)
        )
        for i, txt in enumerate(TEXTS):
            toks = txt.lower().split()
            hit = any(
                toks[p] in ("brown", "quick") and toks[p + 1] in ("quick", "brown")
                for p in range(len(toks) - 1)
            )
            assert (i in got) == hit, i


class TestPhrasePrefix:
    def test_phrase_prefix_matches_expanded_multi_phrase(self, built):
        ix, _ = built
        s = Searcher(ix)
        got = s.search_phrase_prefix("quick bro*", k=100)
        exp_terms = [t for t, _ in s.expand_prefix("text", "bro")]
        want = s.search_multi_phrase([["quick"], exp_terms], k=100)
        assert got == want
        # brute force membership
        for i, txt in enumerate(TEXTS):
            toks = txt.lower().split()
            hit = any(
                toks[p] == "quick" and toks[p + 1].startswith("bro")
                for p in range(len(toks) - 1)
            )
            assert (i in dict(got)) == hit, i

    def test_phrase_prefix_no_expansion(self, built):
        ix, _ = built
        assert Searcher(ix).search_phrase_prefix("quick zzz*") == []


class TestNewQueriesRespectDeletes:
    def test_span_and_term_set_skip_tombstoned_docs(self, built, tmp_path):
        import shutil

        from fdblucene_ray.index.delete import delete_docs

        ix, _ = built
        # work on a copy: `built` is module-scoped
        ix2 = str(tmp_path / "ixdel")
        shutil.copytree(ix, ix2)
        s0 = Searcher(ix2)
        before_not = s0.search_span_not("quick brown", "fox")
        before_or = s0.search_span_or(["quick brown", "lazy dog"])
        victims = [before_not[0][0], before_or[-1][0]]
        delete_docs(ix2, victims)
        s = Searcher(ix2)
        assert [d for d, _ in s.search_span_not("quick brown", "fox")] == [
            d for d, _ in before_not if d not in victims
        ]
        assert [d for d, _ in s.search_span_or(["quick brown", "lazy dog"])] == [
            d for d, _ in before_or if d not in victims
        ]
        # multi-phrase and term-set text-field analog
        mp = [d for d, _ in s.search_multi_phrase([["quick"], ["brown"]], k=100)]
        assert set(victims).isdisjoint(mp)


class TestPhrasePrefixLuceneChain:
    """ADVICE r3 regressions: prefix expansions are index-dictionary
    terms and must NOT be re-analyzed (Porter is not idempotent), and
    dropped stopword head tokens must leave position gaps."""

    @pytest.fixture(scope="class")
    def lucene_ix(self, tmp_path_factory, ray_session):
        texts = [
            "the parties agreed on terms",     # agre at pos 1 (parti 0)
            "jakarta the apache server",       # jakarta 0, apach 2
            "jakarta apache server",           # jakarta 0, apach 1
            "parties disagree on terms",
            "agreeable jakarta arrangement",
        ]
        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        d = tmp_path_factory.mktemp("phlc")
        src = str(d / "c.parquet")
        pq.write_table(t, src)
        ix = str(d / "ix")
        build_index(
            src, ix,
            fields={"text": {"column": "text", "analyzer": "lucene",
                             "positions": True}},
            num_partitions=2, batch_size=3, block_size=8,
        )
        return ix

    def test_stemmed_expansion_not_restemmed(self, lucene_ix):
        s = Searcher(lucene_ix)
        # dictionary holds the stemmed 'agre' (from agreed); the old
        # code re-stemmed the expansion agre -> agr and matched nothing
        exps = [t for t, _ in s.expand_prefix("text", "agre")]
        assert "agre" in exps
        got = s.search_phrase_prefix("parties agre*", k=10)
        assert [d for d, _ in got] == [0]

    def test_stopword_head_leaves_position_gap(self, lucene_ix):
        s = Searcher(lucene_ix)
        got = s.search_phrase_prefix("jakarta the ap*", k=10)
        # doc 1 has apache two positions after jakarta (stopword gap);
        # doc 2 has it adjacent — Lucene semantics match only doc 1
        assert [d for d, _ in got] == [1]
        # and the no-stopword phrase still matches only the tight one
        got2 = s.search_phrase_prefix("jakarta ap*", k=10)
        assert [d for d, _ in got2] == [2]

    def test_pre_analyzed_multi_phrase_passthrough(self, lucene_ix):
        s = Searcher(lucene_ix)
        # raw-term path: already-stemmed dictionary terms with explicit
        # offsets behave like the analyzed path on raw text
        raw = s.search_multi_phrase(
            [["parti"], ["agre"]], k=10, pre_analyzed=True
        )
        analyzed = s.search_multi_phrase([["parties"], ["agreed"]], k=10)
        assert raw == analyzed and [d for d, _ in raw] == [0]
