"""Multi-term queries: PrefixQuery / WildcardQuery / FuzzyQuery analogs
(term-dictionary expansion + constant-score disjunction).

The reference inherits these from Lucene's MultiTermQuery over the
sorted FDB term dictionary (DATA.md:47 lexicographic term order); here
expansion is a bounded range scan over the sampled term index
(segment.py term_range) and matching docs score 1.0 (the
CONSTANT_SCORE_REWRITE default), ties broken doc-id ascending.
"""

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.search import Searcher, _levenshtein_vec

WORDS = [
    "merge", "marge", "merges", "scan", "span", "spark", "stream",
    "street", "strain", "join", "joint", "point", "batch", "match",
    "hash", "cash", "row", "rows", "grow", "window", "widow",
]


def _lev(a: str, b: str) -> int:
    d = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, d[0] = d[0], i
        for j in range(1, len(b) + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
    return d[len(b)]


@pytest.fixture(scope="module")
def corpus_ix(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("mtq")
    rng = np.random.default_rng(11)
    texts = [
        " ".join(rng.choice(WORDS, size=rng.integers(2, 12)))
        for _ in range(300)
    ]
    src = str(tmp / "c.parquet")
    pq.write_table(
        pa.table({"text": pa.array(texts)}), src
    )
    ix = str(tmp / "ix")
    build_index(src, ix,
                fields={"text": {"column": "text", "analyzer": "simple"}},
                num_partitions=4)
    return ix, texts


def _brute_terms(texts, pred):
    vocab = {}
    docs = set()
    for i, t in enumerate(texts):
        toks = [w for w in re.split(r"[^0-9a-z_]+", t.lower()) if w]
        hit = False
        for w in set(toks):
            if pred(w):
                vocab[w] = vocab.get(w, 0) + 1
                hit = True
        if hit:
            docs.add(i)
    return sorted(vocab.items()), sorted(docs)


class TestExpansion:
    def test_prefix(self, corpus_ix):
        ix, texts = corpus_ix
        s = Searcher(ix)
        got = s.expand_prefix("text", "s")
        exp, _ = _brute_terms(texts, lambda w: w.startswith("s"))
        assert got == exp

    def test_prefix_empty_and_missing(self, corpus_ix):
        ix, texts = corpus_ix
        s = Searcher(ix)
        assert s.expand_prefix("text", "zzz") == []
        # empty prefix = whole dictionary
        exp, _ = _brute_terms(texts, lambda w: True)
        assert s.expand_prefix("text", "") == exp

    def test_prefix_max_terms(self, corpus_ix):
        ix, _ = corpus_ix
        s = Searcher(ix)
        with pytest.raises(ValueError, match="expands to"):
            s.expand_prefix("text", "", max_terms=3)

    @pytest.mark.parametrize("pattern", ["s*n", "*ash", "m?rge*", "r?w", "s*"])
    def test_wildcard(self, corpus_ix, pattern):
        ix, texts = corpus_ix
        s = Searcher(ix)
        rx = re.compile(
            "".join(".*" if c == "*" else "." if c == "?" else re.escape(c)
                    for c in pattern) + r"\Z"
        )
        exp, exp_docs = _brute_terms(texts, lambda w: rx.match(w) is not None)
        assert s.expand_wildcard("text", pattern) == exp
        hits = s.search_wildcard(pattern, k=1000)
        assert [d for d, _ in hits] == exp_docs
        assert all(sc == 1.0 for _, sc in hits)

    @pytest.mark.parametrize("term,edits", [("merge", 1), ("scan", 2), ("row", 1)])
    def test_fuzzy(self, corpus_ix, term, edits):
        ix, texts = corpus_ix
        s = Searcher(ix)
        got = s.expand_fuzzy("text", term, max_edits=edits)
        exp, _ = _brute_terms(texts, lambda w: _lev(w, term) <= edits)
        assert [(t, df) for t, df, _ in got] == exp
        for t, _, d in got:
            assert d == _lev(t, term)

    def test_fuzzy_prefix_len(self, corpus_ix):
        ix, texts = corpus_ix
        s = Searcher(ix)
        got = s.expand_fuzzy("text", "merge", max_edits=2, prefix_len=2)
        exp, _ = _brute_terms(
            texts, lambda w: w.startswith("me") and _lev(w, "merge") <= 2
        )
        assert [(t, df) for t, df, _ in got] == exp


class TestBoundedIO:
    def test_prefix_scan_reads_bounded_row_groups(self, tmp_path, ray_session):
        """A narrow prefix over a large dictionary touches O(1) terms
        row groups per segment, not the whole dictionary — the lazy
        term-index property extended to range scans."""
        n = 20_000  # > 4 row groups of 4096 terms in one segment
        texts = [f"t{i:06d}" for i in range(n)]
        src = str(tmp_path / "c.parquet")
        pq.write_table(pa.table({"text": pa.array(texts)}), src)
        ix = str(tmp_path / "ix")
        build_index(src, ix,
                    fields={"text": {"column": "text", "analyzer": "simple"}},
                    num_partitions=1)
        s = Searcher(ix)
        [r] = s.readers
        assert r.meta.n_terms == n
        got = s.expand_prefix("text", "t00001")
        assert len(got) == 10  # t000010..t000019
        assert r.rg_loads <= 2  # narrow range: at most 2 covering row groups
        assert r._terms is None  # never materialized the full dictionary

    def test_range_scan_fallback_without_sidecar(self, tmp_path, ray_session):
        texts = ["alpha beta", "alphabet beat", "gamma"]
        src = str(tmp_path / "c.parquet")
        pq.write_table(pa.table({"text": pa.array(texts)}), src)
        ix = str(tmp_path / "ix")
        build_index(src, ix,
                    fields={"text": {"column": "text", "analyzer": "simple"}},
                    num_partitions=1)
        s = Searcher(ix)
        # simulate a pre-sidecar (legacy) segment
        for r in s.readers:
            os.remove(os.path.join(r.path, "terms_index.json"))
        assert s.expand_prefix("text", "alpha") == [("alpha", 1), ("alphabet", 1)]


class TestLevenshteinVec:
    @pytest.mark.parametrize("seed", range(3))
    def test_matches_scalar(self, seed):
        rng = np.random.default_rng(seed)
        alpha = list("abcdef")
        cands = [
            "".join(rng.choice(alpha, size=rng.integers(1, 11)))
            for _ in range(50)
        ]
        q = "".join(rng.choice(alpha, size=rng.integers(0, 9)))
        got = _levenshtein_vec(cands, q)
        assert list(got) == [_lev(c, q) for c in cands]


class TestQueryParserMultiterm:
    def test_parse_kinds(self):
        from fdblucene_ray.analysis.queryparser import parse_query

        pq = parse_query("pre* w?ld*card merge~ scan~1 +title:abc* -junk~2 plain")
        assert ("should", "text", "prefix", "pre", 1.0) in pq.multiterm
        assert ("should", "text", "wildcard", "w?ld*card", 1.0) in pq.multiterm
        assert ("should", "text", "fuzzy", ("merge", 2), 1.0) in pq.multiterm
        assert ("should", "text", "fuzzy", ("scan", 1), 1.0) in pq.multiterm
        assert ("must", "title", "prefix", "abc", 1.0) in pq.multiterm
        assert ("must_not", "text", "fuzzy", ("junk", 2), 1.0) in pq.multiterm
        assert pq.should == [("text", "plain", 1.0)]

    def test_query_end_to_end(self, corpus_ix):
        """Multi-term clauses combine with BooleanQuery semantics:
        constant-score SHOULD adds 1.0, MUST intersects, MUST_NOT
        excludes."""
        ix, texts = corpus_ix
        s = Searcher(ix)
        # pure prefix SHOULD: same docs as search_prefix
        hits = s.query("str*", k=1000)
        exp = s.search_prefix("str", k=1000)
        assert hits == exp
        # MUST multiterm intersected with MUST_NOT
        hits = s.query("+s*n -span", k=1000)
        rx_docs = set(d for d, _ in s.search_wildcard("s*n", k=10**6))
        span_docs = set(d for d, _ in s.search_wildcard("span", k=10**6))
        assert [d for d, _ in hits] == sorted(rx_docs - span_docs)
        # fuzzy SHOULD combines with a scored term clause
        hits = dict(s.query("merge marge~1", k=1000))
        for d in [i for i, t in enumerate(texts) if "marge" in t.split()
                  or "merge" in t.split()]:
            assert d in hits


class TestTermRange:
    def test_range_expansion(self, corpus_ix):
        ix, texts = corpus_ix
        s = Searcher(ix)
        got = s.expand_term_range("text", "m", "s")
        exp, _ = _brute_terms(texts, lambda w: "m" <= w < "s")
        assert got == exp

    def test_range_bounds_flags(self, corpus_ix):
        ix, texts = corpus_ix
        s = Searcher(ix)
        incl = s.expand_term_range("text", "merge", "scan", include_upper=True)
        excl = s.expand_term_range("text", "merge", "scan")
        assert [t for t, _ in incl] == [t for t, _ in excl] + ["scan"]
        no_lo = s.expand_term_range("text", "merge", "scan",
                                    include_lower=False)
        assert [t for t, _ in no_lo] == [t for t, _ in excl if t != "merge"]
        open_both = s.expand_term_range("text", None, None)
        exp, _ = _brute_terms(texts, lambda w: True)
        assert open_both == exp

    def test_range_docs(self, corpus_ix):
        ix, texts = corpus_ix
        s = Searcher(ix)
        _, exp_docs = _brute_terms(texts, lambda w: "m" <= w < "s")
        hits = s.search_term_range("m", "s", k=1000)
        assert [d for d, _ in hits] == exp_docs


class TestExplain:
    def test_explain_matches_search_score(self, corpus_ix):
        """explain() total is float-identical to the search score of
        the same doc (same accumulation order)."""
        ix, _ = corpus_ix
        s = Searcher(ix)
        hits = s.search("merge stream batch", k=50)
        assert hits
        for d, sc in hits[:10]:
            ex = s.explain("merge stream batch", d)
            assert ex["total"] == sc
            assert not ex["deleted"]
            recon = sum(x["score"] for x in ex["details"])
            assert abs(recon - sc) < 1e-12
            for x in ex["details"]:
                if x["match"]:
                    assert x["score"] == x["idf"] * x["tf"] / (x["tf"] + x["K"])

    def test_explain_non_matching_and_deleted(self, tmp_path, ray_session):
        from fdblucene_ray.index.delete import delete_docs

        src = str(tmp_path / "c.parquet")
        pq.write_table(
            pa.table({"text": pa.array(["merge scan", "scan row", "row"])}), src
        )
        ix = str(tmp_path / "ix")
        build_index(src, ix,
                    fields={"text": {"column": "text", "analyzer": "simple"}},
                    num_partitions=2)
        s = Searcher(ix)
        ex = s.explain("merge", 2)  # doc 2 has no 'merge'
        assert ex["total"] == 0.0 and not ex["details"][0]["match"]
        delete_docs(ix, [0])
        s2 = Searcher(ix)
        ex2 = s2.explain("merge", 0)
        assert ex2["deleted"] and ex2["total"] == 0.0


class TestScoringRewrite:
    def test_scoring_rewrite_matches_or_query(self, corpus_ix):
        """SCORING_BOOLEAN_REWRITE: the expanded set scores exactly like
        the equivalent hand-written OR query."""
        ix, _ = corpus_ix
        s = Searcher(ix)
        terms = [t for t, _ in s.expand_prefix("text", "s")]
        assert s.search_prefix("s", k=20, rewrite="scoring") == \
            s.search_terms(terms, 20)
        # constant rewrite is unaffected
        const = s.search_prefix("s", k=20)
        assert all(sc == 1.0 for _, sc in const)


class TestRegexp:
    def test_expansion_matches_bruteforce(self, corpus_ix):
        ix, texts = corpus_ix
        s = Searcher(ix)
        for pat in [r"s.*", r"s.*a.*", r"[bc].*h", r".*e", r"gr(ou|a)p"]:
            rx = re.compile(f"(?:{pat})\\Z")
            exp_terms, exp_docs = _brute_terms(
                texts, lambda w: rx.match(w) is not None
            )
            got = s.expand_regexp("text", pat)
            assert got == exp_terms, pat
            hits = s.search_regexp(pat, k=1 << 30)
            assert sorted(d for d, _ in hits) == exp_docs, pat

    def test_anchored_whole_term(self, corpus_ix):
        ix, _ = corpus_ix
        s = Searcher(ix)
        # 'scan' exists; pattern 'ca' must NOT match it (whole-term anchor)
        assert all(t != "scan" for t, _ in s.expand_regexp("text", "ca"))

    def test_parser_slash_syntax(self, corpus_ix):
        from fdblucene_ray.analysis.queryparser import parse_query

        pq_ = parse_query("/s.*a.*/ other")
        assert ("should", "text", "regexp", "s.*a.*", 1.0) in pq_.multiterm
        ix, _ = corpus_ix
        s = Searcher(ix)
        got = s.query("/s.*a.*/", k=1 << 30)
        exp = s.search_regexp("s.*a.*", k=1 << 30)
        assert sorted(got) == sorted(exp)

    def test_max_terms_guard(self, corpus_ix):
        ix, _ = corpus_ix
        s = Searcher(ix)
        import pytest as _pt

        with _pt.raises(ValueError):
            s.expand_regexp("text", ".*", max_terms=2)
