"""Scatter-gather distributed search (actor-per-doc-shard, DFS
query-then-fetch): global stats injection makes every shard score
exactly as one merged index would, so the merged top-k is
float-identical to Searcher.multi / a single whole-corpus index."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.distributed import DistributedSearcher
from fdblucene_ray.index.search import Searcher

WORDS = ["data", "merge", "stream", "window", "sort", "batch", "row"]


@pytest.fixture(scope="module")
def fleet3(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("scatter")
    rng = np.random.default_rng(41)
    texts = [" ".join(rng.choice(WORDS, size=rng.integers(3, 12)))
             for _ in range(300)]
    # 'zebra' exists ONLY in the last shard: exercises the clause with
    # global df > 0 but zero postings on two of the three shards
    texts[250] = "data zebra merge"
    texts[260] = "zebra stream"
    t = pa.table(
        {"doc_id": pa.array(range(300), pa.int64()),
         "text": pa.array(texts),
         "grp": pa.array([f"g{i % 7}" for i in range(300)])}
    )
    fields = {"text": {"column": "text", "analyzer": "simple",
                       "positions": True}}
    full_src = str(tmp / "full.parquet")
    pq.write_table(t, full_src)
    full_ix = str(tmp / "full-ix")
    build_index(full_src, full_ix, fields=fields, num_partitions=4,
                docstore_cols=["text"])
    parts = []
    for i, (lo, hi) in enumerate(((0, 100), (100, 220), (220, 300))):
        src = str(tmp / f"p{i}.parquet")
        pq.write_table(t.slice(lo, hi - lo), src)
        ix = str(tmp / f"ix{i}")
        build_index(src, ix, fields=fields, num_partitions=3, doc_base=lo,
                    docstore_cols=["text"])
        parts.append(ix)
    fleet = DistributedSearcher(parts, num_cpus_per_shard=0.25)
    yield full_ix, parts, fleet
    fleet.shutdown()


class TestDistributedSearcher:
    def test_scores_identical_to_single_and_multi(self, fleet3):
        full_ix, parts, fleet = fleet3
        single = Searcher(full_ix)
        multi = Searcher.multi(parts)
        for q in ["data", "data merge", "window sort batch"]:
            a = single.search(q, 25)
            assert fleet.search(q, 25) == a, q
            assert multi.search(q, 25) == a, q

    def test_global_stats_match(self, fleet3):
        full_ix, _, fleet = fleet3
        single = Searcher(full_ix)
        assert fleet.num_docs("text") == single.num_docs("text")
        st = fleet.term_stats("text", ["data", "zebra", "qqq"])
        for t in ("data", "zebra", "qqq"):
            assert st[t] == single.term_stats("text", t)

    def test_term_absent_on_some_shards(self, fleet3):
        """zebra lives only in shard 2: shards 0/1 score its clause with
        the injected global df yet contribute no postings — identical
        to the single index for OR and AND."""
        full_ix, _, fleet = fleet3
        single = Searcher(full_ix)
        assert fleet.search("data zebra", 25) == single.search("data zebra", 25)
        assert fleet.search("data zebra", 25, operator="and") == \
            single.search("data zebra", 25, operator="and")

    def test_term_absent_globally(self, fleet3):
        full_ix, _, fleet = fleet3
        single = Searcher(full_ix)
        assert fleet.search("data qqq", 10) == single.search("data qqq", 10)
        assert fleet.search("qqq", 10) == []
        assert fleet.search("data qqq", 10, operator="and") == []

    def test_alternative_similarities(self, fleet3):
        full_ix, _, fleet = fleet3
        single = Searcher(full_ix)
        for sim in ("classic", "lmd", "dfr"):
            assert fleet.search("data merge", 15, similarity=sim) == \
                single.search("data merge", 15, similarity=sim), sim

    def test_phrase_identical(self, fleet3):
        """Distributed PhraseQuery: global summed idf + shard-local
        position matching == the single index, including a phrase whose
        terms all exist globally but co-occur on only one shard."""
        full_ix, _, fleet = fleet3
        single = Searcher(full_ix)
        for ph, slop in (("data merge", 0), ("data zebra", 0),
                         ("merge stream", 2)):
            assert fleet.search_phrase(ph, 25, slop=slop) == \
                single.search_phrase(ph, 25, slop=slop), ph

    def test_boolean_identical(self, fleet3):
        full_ix, _, fleet = fleet3
        single = Searcher(full_ix)
        cases = [
            dict(must=["data"], must_not=["window"]),
            dict(must=["data", "merge"]),
            dict(should=["data", "zebra", "sort"], min_should_match=2),
            dict(should=["merge"], filter_terms=["data"]),
        ]
        for kw in cases:
            assert fleet.search_boolean(k=50, **kw) == \
                single.search_boolean(k=50, **kw), kw

    def test_hydrate_routes_to_owning_shard(self, fleet3):
        full_ix, _, fleet = fleet3
        single = Searcher(full_ix)
        hits = fleet.search("data merge", 5)
        got = fleet.hydrate(hits, columns=["doc_id", "text"])
        from fdblucene_ray.index.build import hydrate

        want = hydrate(full_ix, [d for d, _ in hits], ["doc_id", "text"])
        assert got.sort_by("doc_id").equals(want)

    def test_version_pinning(self, fleet3, tmp_path):
        from fdblucene_ray.index.delete import delete_docs
        from fdblucene_ray.index.manifest import load_manifest

        _, parts, _ = fleet3
        before = DistributedSearcher(parts, num_cpus_per_shard=0.25)
        hits0 = before.search("data", 300)
        before.shutdown()
        v0 = load_manifest(parts[1]).version
        victims = [d for d, _ in hits0 if 100 <= d < 220][:2]
        delete_docs(parts[1], victims)
        # the module fleet pinned its snapshot at init, so earlier
        # tests' actors never see these tombstones
        live = DistributedSearcher(parts, num_cpus_per_shard=0.25)
        assert {d for d, _ in live.search("data", 300)} == \
            {d for d, _ in hits0} - set(victims)
        live.shutdown()
        pinned = DistributedSearcher(parts, versions=[None, v0, None], num_cpus_per_shard=0.25)
        assert pinned.search("data", 300) == hits0
        pinned.shutdown()

    def test_mismatched_config_fails(self, fleet3, tmp_path):
        _, parts, _ = fleet3
        t = pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array(["data"])})
        src = str(tmp_path / "x.parquet")
        pq.write_table(t, src)
        other = str(tmp_path / "ix-other")
        build_index(
            src, other,
            fields={"text": {"column": "text", "analyzer": "lucene"}},
            num_partitions=2, doc_base=1000,
        )
        with pytest.raises(ValueError, match="analyzer mismatch"):
            DistributedSearcher([parts[0], other], num_cpus_per_shard=0.25)


class TestDistributedGrouping:
    def test_grouped_identical_to_single(self, fleet3, tmp_path_factory):
        full_ix, _, fleet = fleet3
        single = Searcher(full_ix)
        # the full source parquet carries the grp column for hydration
        import glob
        import os

        src = glob.glob(
            os.path.join(os.path.dirname(full_ix), "full.parquet")
        )[0]
        for q in ["data", "data merge"]:
            a = single.search_grouped(
                q, group_col="grp", source=src, n_groups=4,
                docs_per_group=3,
            )
            b = fleet.search_grouped(
                q, group_col="grp", source=src, n_groups=4,
                docs_per_group=3,
            )
            assert a == b, q

    def test_grouped_pass2_beats_pass1_local_docs(self, fleet3):
        """A group's 2nd-best doc can live on a different shard than its
        best: the two-pass merge must pick it (pass-1-only merges get
        this wrong). Verified implicitly by equality above; here assert
        every returned group has docs from the GLOBAL order."""
        full_ix, _, fleet = fleet3
        import glob
        import os

        src = glob.glob(
            os.path.join(os.path.dirname(full_ix), "full.parquet")
        )[0]
        rows = fleet.search_grouped(
            "data", group_col="grp", source=src, n_groups=7,
            docs_per_group=2,
        )
        single = Searcher(full_ix)
        expect = single.search_grouped(
            "data", group_col="grp", source=src, n_groups=7,
            docs_per_group=2,
        )
        assert rows == expect
