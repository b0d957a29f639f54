"""Intervals queries (Lucene o.a.l.queries.intervals analog) vs a
brute-force positional oracle on a randomized corpus."""

import random
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.search import Searcher

VOCAB = ["data", "merge", "sort", "window", "batch", "stream", "index"]


def _toks(s):
    return [t for t in re.split(r"[^0-9a-z_]+", s.lower()) if t]


def _brute_ordered(toks, terms, max_gaps, not_containing=None,
                   containing=None):
    """Greedy-minimal-chain anchors, the documented semantics."""
    pos = {t: [i for i, x in enumerate(toks) if x == t]
           for t in set(terms) | {not_containing, containing} - {None}}
    hits = []
    for s in pos[terms[0]]:
        e = s
        ok = True
        for t in terms[1:]:
            nxt = [p for p in pos[t] if p > e]
            if not nxt:
                ok = False
                break
            e = nxt[0]
        if not ok or e - s - (len(terms) - 1) > max_gaps:
            continue
        if not_containing is not None and any(
            s <= x <= e for x in pos[not_containing]
        ):
            continue
        if containing is not None and not any(
            s <= x <= e for x in pos[containing]
        ):
            continue
        hits.append(s)
    return hits


def _brute_unordered(toks, terms, max_gaps):
    pos = {t: [i for i, x in enumerate(toks) if x == t] for t in set(terms)}
    hits = []
    for p in pos[terms[0]]:
        if all(
            any(abs(q - p) - 1 <= max_gaps and q != p for q in pos[t])
            for t in terms[1:]
        ):
            hits.append(p)
    return hits


@pytest.fixture(scope="module")
def built(tmp_path_factory, ray_session):
    rng = random.Random(42)
    texts = [
        " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 40)))
        for _ in range(60)
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    d = tmp_path_factory.mktemp("iv")
    src = str(d / "c.parquet")
    pq.write_table(t, src)
    ix = str(d / "ix")
    build_index(
        src, ix,
        fields={"text": {"column": "text", "analyzer": "simple",
                         "positions": True}},
        num_partitions=4, batch_size=16, block_size=8,
    )
    return ix, texts


CASES_ORDERED = [
    (["data", "merge"], 0), (["data", "merge"], 2), (["data", "merge"], 10),
    (["merge", "sort", "window"], 4), (["batch", "stream"], 1),
    (["index", "data", "sort"], 8),
]


class TestIntervals:
    def test_ordered_matches_bruteforce(self, built):
        ix, texts = built
        s = Searcher(ix)
        for terms, g in CASES_ORDERED:
            got = s.search_intervals(" ".join(terms), max_gaps=g)
            expect = []
            for i, txt in enumerate(texts):
                hits = _brute_ordered(_toks(txt), terms, g)
                if hits:
                    expect.append((i, len(hits), hits[0]))
            assert got == expect, (terms, g)

    def test_unordered_matches_bruteforce(self, built):
        ix, texts = built
        s = Searcher(ix)
        for terms, g in [(["data", "merge"], 0), (["data", "merge"], 3),
                         (["sort", "window", "batch"], 5)]:
            got = s.search_intervals(
                " ".join(terms), max_gaps=g, ordered=False
            )
            expect = []
            for i, txt in enumerate(texts):
                hits = _brute_unordered(_toks(txt), terms, g)
                if hits:
                    expect.append((i, len(hits), hits[0]))
            assert got == expect, (terms, g)

    def test_not_containing(self, built):
        ix, texts = built
        s = Searcher(ix)
        for terms, g, ex in [(["data", "sort"], 6, "merge"),
                             (["batch", "stream"], 10, "window")]:
            got = s.search_intervals(
                " ".join(terms), max_gaps=g, not_containing=ex
            )
            expect = []
            for i, txt in enumerate(texts):
                hits = _brute_ordered(_toks(txt), terms, g, not_containing=ex)
                if hits:
                    expect.append((i, len(hits), hits[0]))
            assert got == expect, (terms, g, ex)

    def test_containing(self, built):
        ix, texts = built
        s = Searcher(ix)
        for terms, g, inner in [(["data", "sort"], 6, "merge"),
                                (["index", "window"], 12, "batch")]:
            got = s.search_intervals(
                " ".join(terms), max_gaps=g, containing=inner
            )
            expect = []
            for i, txt in enumerate(texts):
                hits = _brute_ordered(_toks(txt), terms, g, containing=inner)
                if hits:
                    expect.append((i, len(hits), hits[0]))
            assert got == expect, (terms, g, inner)

    def test_validation(self, built):
        ix, _ = built
        s = Searcher(ix)
        with pytest.raises(ValueError):
            s.search_intervals("data", max_gaps=1)
        with pytest.raises(ValueError):
            s.search_intervals("data merge", ordered=False,
                               not_containing="sort")

    def test_absent_term_matches_nothing(self, built):
        ix, _ = built
        s = Searcher(ix)
        assert s.search_intervals("data zzzznope", max_gaps=99) == []
        # a containing filter whose inner source is absent matches nothing
        assert s.search_intervals(
            "data merge", max_gaps=99, containing="zzzznope"
        ) == []
