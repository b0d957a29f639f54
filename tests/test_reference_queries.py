"""FIXTURES.md §2 — the reference-derived query set, labeled q01–q20.

Each case mirrors a query/assertion the reference's own tests exercise
(SimpleFDBDirectoryTest.java:145-187, README.md:53-57) over the
deterministic webpages corpus; conformance authority is the pure-Python
oracle (rank + score identity, WAND == exhaustive).
"""

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.index.build import build_index, hydrate
from fdblucene_ray.index.merge import merge_indexes
from fdblucene_ray.index.search import Searcher
from fdblucene_ray.oracle import OracleIndex
from fdblucene_ray.sources.webpages import generate_webpages

N_DOCS = 1500


@pytest.fixture(scope="module")
def fixture_index(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("refq")
    src = str(d / "webpages.parquet")
    t = generate_webpages(0, N_DOCS)
    pq.write_table(t, src, row_group_size=500)
    ix = str(d / "ix")
    build_index(
        src, ix,
        fields={
            "text": {"column": "text", "analyzer": "lucene"},
            "url": {"column": "url", "analyzer": "keyword"},
        },
        num_partitions=6, batch_size=256,
        docstore_cols=["url", "warc_ts", "lang"],
    )
    oracle = OracleIndex("lucene")
    for i, txt in enumerate(t["text"].to_pylist()):
        oracle.add(i, txt)
    return ix, oracle, t, src


def _assert_identity(s, oracle, query, k=10, operator="or"):
    got = s.search(query, k, operator=operator, mode="wand")
    exh = s.search(query, k, operator=operator, mode="exhaustive")
    exp = oracle.search(query, k, operator=operator)
    assert got == exh, (query, "wand != exhaustive")
    assert [d for d, _ in got] == [d for d, _ in exp], query
    for (_, a), (_, b) in zip(got, exp):
        assert a == pytest.approx(b, rel=1e-12), query


class TestReferenceQuerySet:
    def test_q01_keyword_exact_lookup_with_stored_fields(self, fixture_index):
        """TermQuery on the un-analyzed keyword field -> exactly 1 hit,
        stored fields round-trip (SimpleFDBDirectoryTest.java:153-157)."""
        ix, _, t, _ = fixture_index
        s = Searcher(ix)
        url = t["url"][1].as_py()
        hits = s.search(url, k=5, field="url")
        assert len(hits) == 1 and hits[0][0] == 1
        stored = hydrate(ix, [1], columns=["doc_id", "url", "lang"])
        assert stored["url"][0].as_py() == url

    def test_q02_analyzed_phrase_pool_term(self, fixture_index):
        """text:"hello" — docs carrying the 'hello everybody' phrase."""
        ix, oracle, _, _ = fixture_index
        s = Searcher(ix)
        assert s.count("hello") == oracle.count("hello") > 0
        _assert_identity(s, oracle, "hello")

    def test_q03_stemmed_term(self, fixture_index):
        """text:"running" matches run/runs/running via Porter."""
        ix, oracle, _, _ = fixture_index
        s = Searcher(ix)
        assert s.parse("running") == ["run"]
        assert s.count("running") == s.count("runs") == s.count("run") > 0
        _assert_identity(s, oracle, "running")

    def test_q04_stopword_query_zero_hits(self, fixture_index):
        ix, _, _, _ = fixture_index
        assert Searcher(ix).search("the", 10) == []

    @pytest.mark.parametrize(
        "qid,term",
        [  # 2 head, 4 mid, 4 tail of the Zipf vocabulary
            ("q05", "term0"), ("q06", "term1"), ("q07", "term40"),
            ("q08", "term90"), ("q09", "term250"), ("q10", "term600"),
            ("q11", "term2000"), ("q12", "term3500"), ("q13", "term4500"),
            ("q14", "term4999"),
        ],
    )
    def test_q05_to_q14_seeded_zipf_terms(self, fixture_index, qid, term):
        ix, oracle, _, _ = fixture_index
        _assert_identity(Searcher(ix), oracle, term)

    @pytest.mark.parametrize(
        "qid,query",
        [
            ("q15", "term0 term1"),        # head AND head
            ("q16", "term0 term4500"),     # head AND tail
            ("q17", "term4500 term4999"),  # tail AND tail
            ("q18", "term4999 zzznothere"),  # disjoint -> 0 hits
        ],
    )
    def test_q15_to_q18_conjunctions(self, fixture_index, qid, query):
        ix, oracle, _, _ = fixture_index
        s = Searcher(ix)
        _assert_identity(s, oracle, query, operator="and")
        assert s.count(query, operator="and") == oracle.count(query, operator="and")

    def test_q19_merged_index_query(self, fixture_index, tmp_path):
        """addIndexes analog: two sub-indexes merged -> num_docs sums and
        q02 results are identical modulo the doc-id remap
        (SimpleFDBDirectoryTest.java:162-187)."""
        _, _, t, src = fixture_index
        half = N_DOCS // 2
        a, b = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
        pq.write_table(t.slice(0, half), a)
        pq.write_table(t.slice(half), b)
        ixa, ixb = str(tmp_path / "ixa"), str(tmp_path / "ixb")
        ixm = str(tmp_path / "ixm")
        fields = {"text": {"column": "text", "analyzer": "lucene"}}
        build_index(a, ixa, fields=fields, num_partitions=3)
        build_index(b, ixb, fields=fields, num_partitions=3)
        merge_indexes([(ixa, 0), (ixb, half)], ixm, num_partitions=4)
        sm = Searcher(ixm)
        assert sm.num_docs("text") == N_DOCS
        # identical to the monolithic fixture index (ids already aligned)
        s = Searcher(fixture_index[0])
        assert sm.search("hello everybody", 10) == s.search("hello everybody", 10)

    def test_q20_numeric_range_on_warc_ts(self, fixture_index):
        """Numeric range over the warc_ts-derived int64 sidecar vs the
        pyarrow filter oracle (README.md:53-57 FDBNumericPoint range)."""
        import pyarrow.dataset as pads

        ix, _, t, _ = fixture_index
        lo = t["warc_ts"][100].as_py()
        hi = t["warc_ts"][200].as_py()
        store = pads.dataset(f"{ix}/docstore", format="parquet")
        got = store.to_table(
            columns=["doc_id"],
            filter=(pc.field("warc_ts") >= lo) & (pc.field("warc_ts") <= hi),
        )["doc_id"].to_pylist()
        exp = [
            i for i, v in enumerate(t["warc_ts"].to_pylist()) if lo <= v <= hi
        ]
        assert sorted(got) == exp == list(range(100, 201))
