"""DisMax scoring, numeric range facets, and field collapsing —
brute-force oracles on a planted corpus. SQL twins (`ft_dismax`,
`ft_facet_ranges`, `ft_collapse`) run in the driver gate."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.search import Searcher

WORDS = ["merge", "scan", "stream", "join", "batch", "hash", "row",
         "window", "data", "spark"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("grp")
    rng = np.random.default_rng(23)
    texts = [
        " ".join(rng.choice(WORDS, size=rng.integers(3, 15)))
        for _ in range(250)
    ]
    sources = [f"s{rng.integers(0, 6)}" for _ in range(250)]
    n_chars = [len(t) for t in texts]
    src = str(tmp / "c.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(250), pa.int64()),
                "text": pa.array(texts),
                "source": pa.array(sources),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        ),
        src,
    )
    ix = str(tmp / "ix")
    build_index(
        src, ix,
        fields={
            "text": {"column": "text", "analyzer": "simple"},
            "source": {"column": "source", "analyzer": "simple"},
        },
        num_partitions=4,
    )
    return ix, src, texts, sources, n_chars


class TestDisMax:
    def test_max_plus_tie_combination(self, corpus):
        ix, src, texts, sources, _ = corpus
        s = Searcher(ix)
        # per-field subtotals from the already-verified search_fields path
        text_hits = dict(s.search_fields("data s3", ["text"], k=1 << 31))
        src_hits = dict(s.search_fields("data s3", ["source"], k=1 << 31))
        want = {}
        for d in set(text_hits) | set(src_hits):
            a, b = text_hits.get(d, 0.0), src_hits.get(d, 0.0)
            want[d] = max(a, b) + 0.25 * (a + b - max(a, b))
        got = s.search_dismax("data s3", ["text", "source"], k=20, tie=0.25)
        expect = sorted(want.items(), key=lambda x: (-x[1], x[0]))[:20]
        assert [d for d, _ in got] == [d for d, _ in expect]
        np.testing.assert_allclose(
            [sc for _, sc in got], [sc for _, sc in expect], rtol=1e-12
        )

    def test_tie_zero_is_pure_max(self, corpus):
        ix, *_ = corpus
        s = Searcher(ix)
        got = s.search_dismax("data", ["text", "source"], k=5, tie=0.0)
        text_only = dict(s.search_fields("data", ["text"], k=1 << 31))
        for d, sc in got:
            assert sc == pytest.approx(max(text_only.get(d, 0.0), 0.0))


class TestFacetRanges:
    def test_counts_match_bruteforce(self, corpus):
        ix, src, texts, _, n_chars = corpus
        s = Searcher(ix)
        ranges = [("lt40", None, 40), ("40_70", 40, 70), ("ge70", 70, None)]
        got = s.facet_ranges(
            "data", ranges, value_source=src, value_col="n_chars"
        )
        match = {i for i, t in enumerate(texts) if "data" in t.split()}
        want = [
            ("lt40", sum(1 for i in match if n_chars[i] < 40)),
            ("40_70", sum(1 for i in match if 40 <= n_chars[i] < 70)),
            ("ge70", sum(1 for i in match if n_chars[i] >= 70)),
        ]
        assert got == want
        assert sum(c for _, c in got) == len(match)

    def test_no_match_returns_zero_buckets(self, corpus):
        ix, src, *_ = corpus
        s = Searcher(ix)
        got = s.facet_ranges(
            "zzzmissing", [("all", None, None)],
            value_source=src, value_col="n_chars",
        )
        assert got == [("all", 0)]


class TestCollapse:
    def test_best_per_group(self, corpus):
        ix, src, texts, sources, _ = corpus
        s = Searcher(ix)
        got = s.search_collapse(
            "data merge", k=10, collapse_col="source", source=src
        )
        hits = s.search("data merge", 1 << 31)
        best = {}
        for d, sc in hits:
            g = sources[d]
            if g not in best:
                best[g] = (d, sc)
        want = sorted(
            ((g, d, sc) for g, (d, sc) in best.items()),
            key=lambda x: (-x[2], x[0]),
        )[:10]
        assert [(g, d) for g, d, _ in got] == [(g, d) for g, d, _ in want]
        # one row per group, groups ordered by their best score
        assert len({g for g, _, _ in got}) == len(got)
        scores = [sc for _, _, sc in got]
        assert scores == sorted(scores, reverse=True)


class TestSuggest:
    def test_ranked_by_distance_then_df(self, corpus, tmp_path):
        # planted dictionary: 'merge' df high, 'marge' dist 1,
        # 'merges' dist 1, 'mergers' dist 2
        texts = (["merge merge alpha"] * 5 + ["marge beta"] * 3
                 + ["merges gamma"] * 4 + ["mergers delta"] * 2)
        src = str(tmp_path / "sg.parquet")
        pq.write_table(
            pa.table({"text": pa.array(texts)}), src
        )
        ix = str(tmp_path / "ix")
        build_index(
            src, ix,
            fields={"text": {"column": "text", "analyzer": "simple"}},
            num_partitions=2,
        )
        s = Searcher(ix)
        got = s.suggest("merge", k=5, max_edits=2, prefix_len=1)
        # dist 0 ('merge') excluded; dist 1 first (merges df=4 beats
        # marge df=3), then dist 2
        assert got == [("merges", 4, 1), ("marge", 3, 1), ("mergers", 2, 2)]

    def test_prefix_len_bounds_candidates(self, corpus):
        ix, *_ = corpus
        s = Searcher(ix)
        for t, _, d in s.suggest("scam", k=10, prefix_len=2):
            assert t.startswith("sc") and 1 <= d <= 2


class TestTopTermsPerGroup:
    def test_matches_bruteforce(self, corpus):
        from collections import Counter

        from fdblucene_ray.ops.textstats import top_terms_per_group

        ix, src, texts, sources, _ = corpus
        import ray.data

        ds = ray.data.read_parquet(src, columns=["source", "text"])
        got = (
            top_terms_per_group(ds, group_col="source", n=3)
            .to_pandas()
            .sort_values(["grp", "rank"])
            .reset_index(drop=True)
        )
        want = []
        for g in sorted(set(sources)):
            c = Counter()
            for t, s_ in zip(texts, sources):
                if s_ == g:
                    c.update(t.split())
            top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
            want += [(g, t, n, i + 1) for i, (t, n) in enumerate(top)]
        assert list(
            got[["grp", "term", "cnt", "rank"]].itertuples(
                index=False, name=None
            )
        ) == want
