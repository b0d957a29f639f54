"""Boolean queries (MUST/SHOULD/MUST_NOT) + the flagship webpages pipeline."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.index.build import build_index, hydrate
from fdblucene_ray.index.search import Searcher
from fdblucene_ray.oracle import OracleIndex
from fdblucene_ray.pipelines.flagship import build_webpages_index
from fdblucene_ray.sources.webpages import generate_webpages


@pytest.fixture(scope="module")
def booldex(tmp_path_factory, ray_session):
    rng = np.random.default_rng(11)
    texts = [
        " ".join(f"w{int(x)}" for x in (rng.zipf(1.4, size=int(rng.integers(3, 40))) - 1) % 25)
        for _ in range(300)
    ]
    t = pa.table(
        {"doc_id": pa.array(range(300), pa.int64()), "text": pa.array(texts)}
    )
    d = tmp_path_factory.mktemp("bool")
    src = str(d / "c.parquet")
    pq.write_table(t, src)
    ix = str(d / "ix")
    build_index(src, ix, fields={"text": {"column": "text", "analyzer": "simple"}},
                num_partitions=4, batch_size=64)
    oracle = OracleIndex("simple")
    for i, txt in enumerate(texts):
        oracle.add(i, txt)
    return ix, oracle


class TestBoolean:
    CASES = [
        dict(must=["w0", "w1"]),
        dict(must=["w0"], must_not=["w1"]),
        dict(should=["w3", "w7", "w9"]),
        dict(must=["w0"], should=["w2", "w5"]),
        dict(must=["w0"], should=["w2"], must_not=["w3", "w4"]),
        dict(should=["w1"], must_not=["w1"]),  # everything excluded
        dict(must=["w0", "zzz"]),  # absent MUST -> empty
        dict(must_not=["w0"]),  # no positive clause -> empty
        dict(must=["w0"], filter_terms=["w1"]),  # FILTER: required, unscored
        dict(filter_terms=["w0", "w1"]),  # pure filter -> score 0.0, doc asc
        dict(should=["w2", "w5"], filter_terms=["w0"]),  # SHOULD optional
        dict(filter_terms=["w0"], must_not=["w1"]),
        dict(filter_terms=["zzz"]),  # absent FILTER -> empty
    ]

    @pytest.mark.parametrize("case", CASES)
    def test_matches_oracle(self, booldex, case):
        ix, oracle = booldex
        s = Searcher(ix)
        got = s.search_boolean(**case, k=15)
        exp = oracle.search_boolean(**case, k=15)
        assert [d for d, _ in got] == [d for d, _ in exp], case
        for (_, a), (_, b) in zip(got, exp):
            assert a == pytest.approx(b, rel=1e-12)


class TestFlagship:
    def test_end_to_end(self, tmp_path, ray_session):
        p = str(tmp_path / "web.parquet")
        pq.write_table(generate_webpages(0, 400), p)
        ix = str(tmp_path / "ix")
        manifest = build_webpages_index(p, ix, num_partitions=4, batch_size=128)
        s = Searcher(ix)
        assert s.num_docs("text") == 400
        # text search over EXTRACTED text matches oracle over shipped text
        oracle = OracleIndex("lucene")
        t = pq.read_table(p, columns=["text"])
        for i, txt in enumerate(t["text"].to_pylist()):
            oracle.add(i, txt)
        got = s.search("hello everybody", 10)
        exp = oracle.search("hello everybody", 10)
        assert [d for d, _ in got] == [d for d, _ in exp]
        # keyword lookup + doc-store hydration round trip
        hits = s.search("https://example-7.com/p/7", k=3, field="url")
        assert [d for d, _ in hits] == [7]
        stored = hydrate(ix, [7], columns=["doc_id", "url", "lang"])
        assert stored["url"][0].as_py() == "https://example-7.com/p/7"

    def test_invariant_violation_detected(self, tmp_path, ray_session):
        t = generate_webpages(0, 50).to_pydict()
        t["text"][3] = t["text"][3] + " TAMPERED"
        p = str(tmp_path / "bad.parquet")
        pq.write_table(pa.table(t), p)
        ix = str(tmp_path / "ix")
        with pytest.raises(Exception, match="invariant"):
            build_webpages_index(p, ix, num_partitions=2, batch_size=16)


class TestSearchActorPool:
    def test_batch_query_evaluation(self, booldex, ray_session):
        """ST6: query batches through a searcher actor pool."""
        import ray.data

        from fdblucene_ray.index.search import SearchQueries

        ix, oracle = booldex
        qds = ray.data.from_items(
            [{"qid": i, "query": f"w{i % 5} w{(i + 1) % 5}"} for i in range(20)]
        )
        res = qds.map_batches(
            SearchQueries,
            fn_constructor_kwargs=dict(index_dir=ix, k=5),
            batch_format="pyarrow",
            batch_size=8,
            concurrency=2,
        ).to_pandas()
        assert set(res.columns) == {"qid", "rank", "doc_id", "score"}
        for qid, grp in res.groupby("qid"):
            q = f"w{qid % 5} w{(qid + 1) % 5}"
            exp = oracle.search(q, 5)
            got = grp.sort_values("rank")["doc_id"].tolist()
            assert got == [d for d, _ in exp], q


class TestFacade:
    def test_index_api_round_trip(self, tmp_path, ray_session):
        from fdblucene_ray.api import Index

        p = str(tmp_path / "c.parquet")
        pq.write_table(generate_webpages(0, 120), p)
        ix = Index.build(
            p, str(tmp_path / "ix"),
            fields={"text": {"column": "text", "analyzer": "lucene"},
                    "url": {"column": "url", "analyzer": "keyword"}},
            num_partitions=3, docstore_cols=["url", "lang"],
        )
        assert ix.num_docs == 120
        ix.verify()
        hits = ix.search("hello everybody", 5)
        assert hits
        stored = ix.stored([hits[0][0]], columns=["doc_id", "url"])
        assert stored.num_rows == 1
        assert ix.count("hello") > 0
        assert ix.boolean(must=["hello"], must_not=["everybodi"]) == []
        assert ix.term_stats("hello")[0] > 0
        assert ix.gc() == []
