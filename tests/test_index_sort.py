"""Index-time sort (IndexWriterConfig.setIndexSort analog) +
early-terminating sorted top-k (TopFieldCollector early termination)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.index.build import build_index, hydrate
from fdblucene_ray.index.search import Searcher
from fdblucene_ray.index.sorted import build_sorted_index, sorted_source_dir


def _corpus(n=400, seed=5):
    rng = np.random.default_rng(seed)
    texts, vals = [], []
    for i in range(n):
        toks = [f"w{int(x) % 20}" for x in rng.integers(0, 20, int(rng.integers(4, 30)))]
        if i % 3 == 0:
            toks.append("data")
        texts.append(" ".join(toks))
        vals.append(int(rng.integers(0, 150)))  # many ties
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "n_chars": pa.array(vals, pa.int64()),
        }
    )


@pytest.fixture(scope="module")
def sorted_ix(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("ixsort")
    src = str(d / "docs.parquet")
    t = _corpus()
    pq.write_table(t, src, row_group_size=64)
    ix = str(d / "ix")
    build_sorted_index(
        src, ix, sort_col="n_chars", descending=True,
        fields={"text": {"column": "text", "analyzer": "simple"}},
        num_partitions=8, batch_size=64, block_size=8,
    )
    return ix, src, t


class TestIndexSort:
    def test_doc_order_is_sort_order(self, sorted_ix):
        ix, src, t = sorted_ix
        # the docstore, read in internal-id order, must be sorted by
        # (n_chars desc, orig_doc_id asc)
        n = t.num_rows
        stored = hydrate(ix, list(range(n)),
                         columns=["doc_id", "orig_doc_id", "n_chars"])
        v = stored["n_chars"].to_numpy()
        o = stored["orig_doc_id"].to_numpy()
        keys = list(zip((-v).tolist(), o.tolist()))
        assert keys == sorted(keys)
        # orig ids are a permutation of the input
        assert sorted(o.tolist()) == list(range(n))

    def test_sorted_topk_matches_oracle(self, sorted_ix):
        ix, src, t = sorted_ix
        s = Searcher(ix)
        ids = s.search_sorted_topk("data", k=10)
        stored = hydrate(ix, ids, columns=["doc_id", "orig_doc_id", "n_chars"])
        got = list(zip(stored["orig_doc_id"].to_pylist(),
                       stored["n_chars"].to_pylist()))
        # oracle: original docs containing 'data', by n_chars desc, id asc
        texts = t["text"].to_pylist()
        vals = t["n_chars"].to_pylist()
        matches = [i for i, txt in enumerate(texts) if "data" in txt.split()]
        exp = sorted(matches, key=lambda i: (-vals[i], i))[:10]
        assert got == [(i, vals[i]) for i in exp]

    def test_early_termination_skips_blocks(self, sorted_ix):
        ix, _, _ = sorted_ix
        s = Searcher(ix)
        ids = s.search_sorted_topk("data", k=5)
        assert len(ids) == 5
        st = s.last_stats
        # 'data' appears in ~133 docs -> many blocks at block_size=8;
        # stopping after 5 matches must leave blocks undecoded
        assert 0 < st["blocks_decoded"] < st["total_blocks"]

    def test_and_operator_early_stop(self, sorted_ix):
        ix, src, t = sorted_ix
        s = Searcher(ix)
        ids = s.search_sorted_topk("data w3", k=5, operator="and")
        texts = t["text"].to_pylist()
        vals = t["n_chars"].to_pylist()
        matches = [
            i for i, txt in enumerate(texts)
            if {"data", "w3"} <= set(txt.split())
        ]
        exp = sorted(matches, key=lambda i: (-vals[i], i))[:5]
        stored = hydrate(ix, ids, columns=["doc_id", "orig_doc_id"])
        assert stored["orig_doc_id"].to_pylist() == exp

    def test_unsorted_index_rejected(self, sorted_ix, tmp_path, ray_session):
        _, src, _ = sorted_ix
        ix2 = str(tmp_path / "plain")
        build_index(src, ix2,
                    fields={"text": {"column": "text", "analyzer": "simple"}},
                    num_partitions=4, batch_size=64)
        with pytest.raises(ValueError, match="index_sort"):
            Searcher(ix2).search_sorted_topk("data", k=5)

    def test_resume_skips_sort_and_build(self, sorted_ix):
        ix, src, _ = sorted_ix
        marker = os.path.join(sorted_source_dir(ix), "_SORTED.json")
        before = os.path.getmtime(marker)
        m = build_sorted_index(
            src, ix, sort_col="n_chars", descending=True,
            fields={"text": {"column": "text", "analyzer": "simple"}},
            num_partitions=8, batch_size=64, block_size=8,
        )
        assert m.extra["index_sort"] == {"col": "n_chars", "descending": True}
        assert os.path.getmtime(marker) == before  # sort not redone
