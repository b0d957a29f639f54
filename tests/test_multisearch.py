"""Federated multi-index search (MultiReader analog): stats aggregate
across indexes so scores are IDENTICAL to one merged index."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.search import Searcher

WORDS = ["data", "merge", "stream", "window", "sort", "batch", "row"]


@pytest.fixture(scope="module")
def corpus3(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("multi")
    rng = np.random.default_rng(23)
    texts = [" ".join(rng.choice(WORDS, size=rng.integers(3, 12)))
             for _ in range(300)]
    t = pa.table(
        {"doc_id": pa.array(range(300), pa.int64()),
         "text": pa.array(texts)}
    )
    fields = {"text": {"column": "text", "analyzer": "simple",
                       "positions": True}}
    full_src = str(tmp / "full.parquet")
    pq.write_table(t, full_src)
    full_ix = str(tmp / "full-ix")
    build_index(full_src, full_ix, fields=fields, num_partitions=4)
    parts = []
    for i, (lo, hi) in enumerate(((0, 100), (100, 220), (220, 300))):
        src = str(tmp / f"p{i}.parquet")
        pq.write_table(t.slice(lo, hi - lo), src)
        ix = str(tmp / f"ix{i}")
        build_index(src, ix, fields=fields, num_partitions=3, doc_base=lo)
        parts.append(ix)
    return full_ix, parts


class TestMultiSearcher:
    def test_scores_identical_to_single_index(self, corpus3):
        full_ix, parts = corpus3
        single = Searcher(full_ix)
        multi = Searcher.multi(parts)
        for q in ["data", "data merge", "window sort batch"]:
            a = single.search(q, 25)
            b = multi.search(q, 25)
            assert a == b, q  # rank AND float-identical scores
        # stats identical
        assert multi.field_stats("text") == single.field_stats("text")
        assert multi.term_stats("text", "data") == \
            single.term_stats("text", "data")

    def test_phrase_and_boolean_surfaces(self, corpus3):
        full_ix, parts = corpus3
        single = Searcher(full_ix)
        multi = Searcher.multi(parts)
        assert multi.search_boolean(
            must=["data"], must_not=["window"], k=50
        ) == single.search_boolean(must=["data"], must_not=["window"], k=50)
        assert multi.phrase_freqs("data merge") == \
            single.phrase_freqs("data merge")

    def test_versions_pin_commit_points(self, corpus3):
        """multi(versions=[...]) = point-in-time federated reads: pin
        part 0 at its pre-delete commit while the others read live."""
        from fdblucene_ray.index.delete import delete_docs
        from fdblucene_ray.index.manifest import load_manifest

        _, parts = corpus3
        before = Searcher.multi(parts).search("data", 300)
        v0 = load_manifest(parts[0]).version
        victims = [d for d, _ in before if d < 100][:3]
        delete_docs(parts[0], victims)

        live = Searcher.multi(parts)
        assert {d for d, _ in live.search("data", 300)} == \
            {d for d, _ in before} - set(victims)
        pinned = Searcher.multi(parts, versions=[v0, None, None])
        assert pinned.search("data", 300) == before  # float-identical

        with pytest.raises(ValueError, match="one version entry"):
            Searcher.multi(parts, versions=[v0])

    def test_mismatched_config_fails_loudly(self, corpus3, tmp_path):
        _, parts = corpus3
        t = pa.table(
            {"doc_id": pa.array([0], pa.int64()),
             "text": pa.array(["data"])}
        )
        src = str(tmp_path / "x.parquet")
        pq.write_table(t, src)
        other = str(tmp_path / "ix-other")
        build_index(
            src, other,
            fields={"text": {"column": "text", "analyzer": "lucene"}},
            num_partitions=2, doc_base=1000,
        )
        with pytest.raises(ValueError, match="analyzer mismatch"):
            Searcher.multi([parts[0], other])
