"""End-to-end: distributed build -> search, conformance vs the oracle.

Mirrors the reference's golden e2e (index -> commit -> search -> assert
hits, SimpleFDBDirectoryTest.java:145-159) with the pure-Python oracle
as the conformance authority (SURVEY.md §5.1): top-10 doc ids AND BM25
scores must be identical, and WAND must equal exhaustive evaluation.
"""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.manifest import load_manifest
from fdblucene_ray.index.search import Searcher
from fdblucene_ray.oracle import OracleIndex

SF = "/root/testdata/sf0.001"

QUERY_TERMS = [
    "data", "merge", "the", "join", "window", "nonexistentterm",
    "batch stream", "data merge join", "spark window",
]


@pytest.fixture(scope="module")
def built(tmp_path_factory, ray_session):
    index_dir = str(tmp_path_factory.mktemp("ix"))
    manifest = build_index(
        f"{SF}/documents.parquet",
        index_dir,
        num_partitions=7,
        batch_size=128,
    )
    table = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    # documents.parquet rows get doc_id = row index (single file, base 0)
    oracle = OracleIndex("lucene")
    for i, txt in enumerate(table["text"].to_pylist()):
        oracle.add(i, txt)
    return index_dir, manifest, oracle


class TestBuildStats:
    def test_collection_stats_match_oracle(self, built):
        index_dir, manifest, oracle = built
        s = Searcher(index_dir)
        dc, sum_dl, avgdl = s.field_stats("text")
        assert dc == oracle.dc
        assert sum_dl == oracle.sum_dl
        assert avgdl == pytest.approx(oracle.avgdl)

    def test_term_stats_match_oracle(self, built):
        index_dir, _, oracle = built
        s = Searcher(index_dir)
        for term in ["data", "merg", "join", "window"]:
            df, ttf = s.term_stats("text", term)
            assert df == oracle.df(term), term
            assert ttf == sum(tf for _, tf in oracle.postings.get(term, [])), term

    def test_vocabulary_identical(self, built):
        index_dir, _, oracle = built
        s = Searcher(index_dir)
        engine_terms = set()
        for r in s.readers:
            t = r.terms
            engine_terms.update(
                tm for f, tm in zip(t["field"].to_pylist(), t["term"].to_pylist())
                if f == "text"
            )
        assert engine_terms == set(oracle.postings)

    def test_postings_identical(self, built):
        """Every posting (doc, tf) matches the oracle exactly."""
        from fdblucene_ray.codec.postings import decode_all

        index_dir, manifest, oracle = built
        s = Searcher(index_dir)
        for term in list(oracle.postings)[:50]:
            parts = []
            for r in s.readers:
                h = r.postings_handle("text", term)
                if h:
                    blob, skips, n = h
                    d, t, _ = decode_all(blob, skips, n, manifest.block_size)
                    parts.extend(zip(d.tolist(), t.tolist()))
            assert sorted(parts) == sorted(oracle.postings[term]), term


class TestSearchIdentity:
    @pytest.mark.parametrize("query", QUERY_TERMS)
    @pytest.mark.parametrize("operator", ["or", "and"])
    def test_rank_and_score_identity(self, built, query, operator):
        index_dir, _, oracle = built
        s = Searcher(index_dir)
        expected = oracle.search(query, 10, operator=operator)
        got = s.search(query, 10, operator=operator, mode="exhaustive")
        assert [d for d, _ in got] == [d for d, _ in expected]
        for (d1, s1), (d2, s2) in zip(got, expected):
            assert s1 == pytest.approx(s2, rel=1e-12), (query, d1)

    @pytest.mark.parametrize("query", QUERY_TERMS)
    def test_wand_equals_exhaustive(self, built, query):
        index_dir, _, _ = built
        s = Searcher(index_dir)
        wand = s.search(query, 10, mode="wand")
        exact = s.search(query, 10, mode="exhaustive")
        assert [d for d, _ in wand] == [d for d, _ in exact]
        for (_, s1), (_, s2) in zip(wand, exact):
            assert s1 == s2  # bit-identical accumulation order

    def test_stopword_query_empty(self, built):
        index_dir, _, _ = built
        assert Searcher(index_dir).search("the", 10) == []

    def test_count(self, built):
        index_dir, _, oracle = built
        s = Searcher(index_dir)
        for q in ["data", "data merge", "nonexistentterm"]:
            for op in ["or", "and"]:
                assert s.count(q, operator=op) == oracle.count(q, operator=op), (q, op)


class TestBuildMechanics:
    def test_manifest_roundtrip(self, built):
        index_dir, manifest, _ = built
        loaded = load_manifest(index_dir)
        assert loaded.to_json() == manifest.to_json()

    def test_rebuild_is_noop(self, built, ray_session):
        """Whole-job checkpoint: same signature -> manifest unchanged."""
        index_dir, manifest, _ = built
        m2 = build_index(
            f"{SF}/documents.parquet", index_dir, num_partitions=7, batch_size=128
        )
        assert m2.to_json() == manifest.to_json()

    def test_salted_build_same_results(self, tmp_path, ray_session, built):
        """Head-term salting must not change any search result."""
        _, _, oracle = built
        index_dir = str(tmp_path / "salted")
        build_index(
            f"{SF}/documents.parquet",
            index_dir,
            num_partitions=5,
            batch_size=64,
            head_terms=frozenset(["data", "merg", "join"]),
            salt_chunk=64,
        )
        s = Searcher(index_dir)
        for q in ["data", "data merge join", "window"]:
            got = s.search(q, 10, mode="wand")
            exp = oracle.search(q, 10)
            assert [d for d, _ in got] == [d for d, _ in exp], q
            for (_, a), (_, b) in zip(got, exp):
                assert a == pytest.approx(b, rel=1e-12)


def test_auto_salting_spreads_head_terms(tmp_path, ray_session):
    """A term in every doc auto-salts across partitions (no explicit
    head_terms list) while results stay oracle-identical."""
    import pyarrow as pa

    from fdblucene_ray.sources.webpages import generate_webpages

    texts = ["common " + t for t in pq.read_table(
        f"{SF}/documents.parquet", columns=["text"]
    )["text"].to_pylist()[:300]]
    t = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                  "text": pa.array(texts)})
    src = str(tmp_path / "c.parquet")
    pq.write_table(t, src)
    ix = str(tmp_path / "ix")
    build_index(
        src, ix, fields={"text": {"column": "text", "analyzer": "simple"}},
        num_partitions=8, batch_size=32, salt_chunk=64,
    )
    s = Searcher(ix)
    seg_with_common = sum(
        1 for r in s.readers if r.postings_handle("text", "common") is not None
    )
    assert seg_with_common > 1  # spread across segments
    df, ttf = s.term_stats("text", "common")
    assert df == 300 and ttf == 300
    oracle = OracleIndex("simple")
    for i, txt in enumerate(texts):
        oracle.add(i, txt)
    got = s.search("common data", 10, mode="wand")
    exp = oracle.search("common data", 10)
    assert [d for d, _ in got] == [d for d, _ in exp]


def test_keyword_reserved_bytes_rejected(tmp_path, ray_session):
    """Keyword values containing \\x00 or \\x1f are rejected at build
    (they could masquerade as doc-stat sentinels or desync the
    field\\x1fterm key split)."""
    import pyarrow as pa

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "tag": pa.array(["ok", "\x00doc"], pa.string()),
        }
    )
    src = str(tmp_path / "c.parquet")
    pq.write_table(t, src)
    with pytest.raises(Exception, match="reserved byte"):
        build_index(
            src, str(tmp_path / "ix"),
            fields={"tag": {"column": "tag", "analyzer": "keyword"}},
            num_partitions=2,
        )


class TestWireFormats:
    def test_varint_wire_builds_identical_index(self, ray_session, tmp_path, sf_dir):
        """wire='varint' (the cross-node exchange format) must produce an
        index identical to wire='raw': same stats, same postings, same
        top-k with equal scores."""
        import os

        from fdblucene_ray.index.build import build_index
        from fdblucene_ray.index.search import Searcher

        src = os.path.join(sf_dir, "documents.parquet")
        fields = {"text": {"column": "text", "analyzer": "simple", "positions": True}}
        a = str(tmp_path / "raw")
        b = str(tmp_path / "varint")
        build_index(src, a, fields=fields, num_partitions=4, wire="raw")
        build_index(src, b, fields=fields, num_partitions=4, wire="varint")
        sa, sb = Searcher(a), Searcher(b)
        assert sa.field_stats("text") == sb.field_stats("text")
        for q in ["data", "merge", "window"]:
            assert sa.term_stats("text", q) == sb.term_stats("text", q)
            assert sa.search(q, 10) == sb.search(q, 10)
        assert sa.search_phrase("data merge", 10) == sb.search_phrase("data merge", 10)
        assert sa.search_boolean(must=["data"], should=["merge"], must_not=["window"], k=10) == \
            sb.search_boolean(must=["data"], should=["merge"], must_not=["window"], k=10)

    def test_varint_wire_merge_roundtrip(self, ray_session, tmp_path, sf_dir):
        import os

        from fdblucene_ray.index.build import build_index
        from fdblucene_ray.index.merge import compact_index
        from fdblucene_ray.index.search import Searcher

        src = os.path.join(sf_dir, "documents.parquet")
        ix = str(tmp_path / "ix")
        out = str(tmp_path / "ix_compacted")
        build_index(src, ix, fields={"text": {"column": "text", "analyzer": "simple"}},
                    num_partitions=4, wire="varint")
        before = Searcher(ix).search("data", 10)
        compact_index(ix, out, 2, wire="varint")
        after = Searcher(out).search("data", 10)
        assert before == after
