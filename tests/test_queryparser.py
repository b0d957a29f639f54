"""QueryParser analog: grammar + Searcher.query dispatch identities."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.analysis.queryparser import parse_query
from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.search import Searcher

TEXTS = [
    "data merge window batch",
    "data data join stream",
    "window sort filter",
    "merge value data stream",
    "quick brown fox data",
    "brown fox jumps",
]


class TestGrammar:
    def test_occurs_fields_phrases(self):
        pq_ = parse_query('+data -window merge tag:x +title:"a b" "c d"')
        assert pq_.must == [("text", "data", 1.0)]
        assert pq_.must_not == [("text", "window", 1.0)]
        assert pq_.should == [("text", "merge", 1.0), ("tag", "x", 1.0)]
        assert ("must", "title", "a b", 0, 1.0) in pq_.phrases
        assert ("should", "text", "c d", 0, 1.0) in pq_.phrases

    def test_empty(self):
        assert parse_query("").is_empty
        assert parse_query("   ").is_empty


@pytest.fixture(scope="module")
def built(tmp_path_factory, ray_session):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
            "tag": pa.array(["a", "b", "a", "c", "b", "a"], pa.string()),
        }
    )
    d = tmp_path_factory.mktemp("qp")
    src = str(d / "c.parquet")
    pq.write_table(t, src)
    ix = str(d / "ix")
    build_index(
        src, ix,
        fields={
            "text": {"column": "text", "analyzer": "simple", "positions": True},
            "tag": {"column": "tag", "analyzer": "simple"},
        },
        num_partitions=3,
    )
    return ix


class TestQueryDispatch:
    def test_plain_terms_equal_search(self, built):
        s = Searcher(built)
        assert s.query("data merge") == s.search("data merge", 10)

    def test_occurs_equal_boolean(self, built):
        s = Searcher(built)
        got = s.query("+data merge -window")
        exp = s.search_boolean(must=["data"], should=["merge"],
                               must_not=["window"], k=10)
        assert got == exp

    def test_quoted_phrase_equal_search_phrase(self, built):
        s = Searcher(built)
        got = s.query('"brown fox"')
        exp = s.search_phrase("brown fox", 10)
        assert [d for d, _ in got] == [d for d, _ in exp]
        for (_, a), (_, b) in zip(got, exp):
            assert a == pytest.approx(b, rel=1e-12)

    def test_phrase_must_with_term(self, built):
        s = Searcher(built)
        got = s.query('+"brown fox" data')
        # docs 4,5 contain the phrase; doc 4 also has data (extra score)
        assert [d for d, _ in got][0] == 4
        assert set(d for d, _ in got) == {4, 5}

    def test_field_override(self, built):
        s = Searcher(built)
        got = s.query("tag:b")
        assert set(d for d, _ in got) == {1, 4}
        exp = s.search("b", 10, field="tag")
        assert got == exp

    def test_phrase_must_not(self, built):
        s = Searcher(built)
        got = s.query('data -"quick brown"')
        assert 4 not in {d for d, _ in got}
        assert {d for d, _ in got} == {0, 1, 3}

    def test_stopword_only_clause_dropped(self, built):
        s = Searcher(built)
        # 'the' survives in the 'simple' analyzer (no stopwords), so use
        # an absent term instead: SHOULD clause with no matches
        assert s.query("data zzzznothing") == s.search("data zzzznothing", 10)


class TestBoosts:
    def test_grammar(self):
        pq_ = parse_query('data^2 "a b"^1.5 pre*^3 merge~1^2.5 plain')
        assert ("text", "data", 2.0) in pq_.should
        assert ("text", "plain", 1.0) in pq_.should
        assert ("should", "text", "a b", 0, 1.5) in pq_.phrases
        assert ("should", "text", "prefix", "pre", 3.0) in pq_.multiterm
        assert ("should", "text", "fuzzy", ("merge", 1), 2.5) in pq_.multiterm

    def test_boosted_scores_scale(self, built):
        """score(data^2 merge) = 2*contrib(data) + contrib(merge)."""
        s = Searcher(built)
        base_d = dict(s.query("data", k=10))
        base_m = dict(s.query("merge", k=10))
        got = dict(s.query("data^2 merge", k=10))
        docs = set(base_d) | set(base_m)
        assert set(got) == docs
        for d in docs:
            exp = 2.0 * base_d.get(d, 0.0) + base_m.get(d, 0.0)
            assert got[d] == pytest.approx(exp, rel=1e-12), d

    def test_boost_one_is_fast_path_identity(self, built):
        s = Searcher(built)
        assert s.query("data^1 merge") == s.query("data merge")

    def test_boosted_multiterm_constant_score(self, built):
        s = Searcher(built)
        got = dict(s.query("bro*^3"))
        assert got and all(v == 3.0 for v in got.values())


class TestFacets:
    def test_counts_match_bruteforce(self, built):
        import pyarrow.parquet as _pq

        s = Searcher(built)
        # tag is indexed with the 'simple' analyzer here, which for the
        # single-letter values equals keyword semantics
        fc = dict(s.facet_counts("data", "tag"))
        texts, tags = TEXTS, ["a", "b", "a", "c", "b", "a"]
        want = {}
        for t, g in zip(texts, tags):
            if "data" in t.split():
                want[g] = want.get(g, 0) + 1
        assert fc == want

    def test_and_mode_and_min_count(self, built):
        s = Searcher(built)
        fc = dict(s.facet_counts("data merge", "tag", mode="and"))
        texts, tags = TEXTS, ["a", "b", "a", "c", "b", "a"]
        want = {}
        for t, g in zip(texts, tags):
            toks = t.split()
            if "data" in toks and "merge" in toks:
                want[g] = want.get(g, 0) + 1
        assert fc == want
        hi = s.facet_counts("data", "tag", min_count=2)
        assert all(c >= 2 for _, c in hi)


class TestMoreLikeThis:
    def test_mlt_excludes_source_and_matches_manual_query(self, built):
        s = Searcher(built)
        got = s.more_like_this(0, k=10, text=TEXTS[0], max_query_terms=3)
        assert all(d != 0 for d, _ in got)
        # manual twin: top-3 tf*idf terms of doc 0, BM25 OR, drop doc 0
        import math

        dc = s.field_stats("text")[0]
        tf = {}
        for t in TEXTS[0].split():
            tf[t] = tf.get(t, 0) + 1
        ranked = sorted(
            (
                (-f * math.log(1 + (dc - s.term_stats("text", t)[0] + 0.5)
                               / (s.term_stats("text", t)[0] + 0.5)), t)
                for t, f in tf.items()
                if s.term_stats("text", t)[0]
            )
        )
        terms = [t for _, t in ranked[:3]]
        exp = [(d, sc) for d, sc in s.search_terms(terms, 11) if d != 0][:10]
        assert got == exp


class TestSearchAfter:
    def test_pages_tile_the_full_ranking(self, built):
        s = Searcher(built)
        full = s.search("data merge", 100)
        pages, after = [], None
        while True:
            page = (
                s.search("data merge", 2)
                if after is None
                else s.search_after("data merge", after, 2)
            )
            if not page:
                break
            pages.extend(page)
            after = page[-1]
        assert pages == full

    def test_after_mid_tie_breaks_on_doc(self, built):
        s = Searcher(built)
        full = s.search("data", 100)
        for i in range(len(full) - 1):
            nxt = s.search_after("data", full[i], 1)
            assert nxt and nxt[0] == full[i + 1], i


class TestUnifiedParser:
    """ONE grammar for the full Lucene classic surface: the flat syntax
    and the explicit-operator syntax parse and evaluate TOGETHER."""

    def test_flat_queries_match_query_dispatch(self, built):
        """Unified evaluation == the flat parsed path on pure flat
        syntax (same BooleanQuery semantics, same scores)."""
        s = Searcher(built)
        for q in [
            "data merge",
            "+data merge -window",
            '+data "data merge"',
            "data^2 merge",
            "tag:a data",
            "bro*",
            "dta~1",
        ]:
            assert s.search_query(q, k=10) == s.query(q, k=10), q

    def test_expr_queries_match_search_expr(self, built):
        """Unified evaluation == search_expr on explicit-operator
        syntax."""
        s = Searcher(built)
        for q in [
            "(data OR merge) AND stream",
            "data AND NOT window",
            "(data OR brown) AND (fox OR stream)",
        ]:
            assert s.search_query(q, k=10) == s.search_expr(q, k=10), q

    def test_mixed_syntax(self, built):
        """The point of the unified parser: BOTH syntaxes in one
        string. +data (merge OR sort) -window "data merge"^2 ==
        hand-built expectation."""
        s = Searcher(built)
        hits = s.search_query(
            '+data (merge OR stream) -window "data merge"^2', k=10
        )
        # candidates: contain data, not window -> docs 1, 3, 4
        # (doc 0 excluded by -window)
        assert {d for d, _ in hits} == {1, 3, 4}
        # scores: doc 3 has merge+stream extras, doc 4 has neither
        by = {d: sc for d, sc in hits}
        assert by[3] > by[4]

    def test_group_boost_scales_group_scores(self, built):
        s = Searcher(built)
        base = s.search_query("(merge OR stream)", k=10)
        boosted = s.search_query("(merge OR stream)^2", k=10)
        assert [d for d, _ in base] == [d for d, _ in boosted]
        for (_, a), (_, b) in zip(base, boosted):
            assert b == pytest.approx(2 * a, rel=1e-12)

    def test_and_promotes_left_neighbour(self, built):
        """Lucene addClause: 'a AND b c' -> +a +b c."""
        from fdblucene_ray.analysis.queryparser import parse_unified

        node = parse_unified("data AND merge stream")
        occurs = [occ for occ, _ in node[1]]
        assert occurs == ["must", "must", "should"]

    def test_syntax_errors(self):
        from fdblucene_ray.analysis.queryparser import (
            QuerySyntaxError,
            parse_unified,
        )

        for bad in ["(data", "data)", "NOT", "AND data" ]:
            with pytest.raises((QuerySyntaxError, IndexError)):
                parse_unified(bad)


class TestUnifiedParserRandomized:
    """Property-style equivalence: random FLAT queries evaluate
    identically through the unified grammar and the flat parsed path;
    random EXPRESSION queries identically to search_expr (the
    randomized pattern of test_search_properties, applied to the
    parser layer)."""

    def test_random_flat_queries(self, built):
        import numpy as np

        s = Searcher(built)
        rng = np.random.default_rng(41)
        words = ["data", "merge", "window", "stream", "brown", "fox",
                 "sort", "value", "zzz"]
        for _ in range(60):
            n = int(rng.integers(1, 5))
            parts = []
            for _ in range(n):
                w = words[int(rng.integers(0, len(words)))]
                r = rng.random()
                if r < 0.2:
                    parts.append("+" + w)
                elif r < 0.35:
                    parts.append("-" + w)
                elif r < 0.45:
                    parts.append(f"{w}^2")
                elif r < 0.55:
                    w2 = words[int(rng.integers(0, len(words)))]
                    parts.append(f'"{w} {w2}"')
                else:
                    parts.append(w)
            q = " ".join(parts)
            assert s.search_query(q, k=10) == s.query(q, k=10), q

    def test_random_expr_queries(self, built):
        import numpy as np

        s = Searcher(built)
        rng = np.random.default_rng(43)
        words = ["data", "merge", "window", "stream", "brown", "fox"]

        def atom():
            return words[int(rng.integers(0, len(words)))]

        for _ in range(40):
            # random 2-3 clause expressions with optional parens/NOT
            a, b, c = atom(), atom(), atom()
            shape = int(rng.integers(0, 5))
            q = [
                f"{a} AND {b}",
                f"{a} OR {b}",
                f"({a} OR {b}) AND {c}",
                f"{a} AND NOT {b}",
                f"({a} AND {b}) OR ({c} AND NOT {a})",
            ][shape]
            assert s.search_query(q, k=10) == s.search_expr(q, k=10), q
