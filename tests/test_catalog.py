"""Catalog: named-index lifecycle (create/list/open/drop/gc), per-index
search independence, and the federated view over disjoint id spaces."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from fdblucene_ray.index.catalog import Catalog
from fdblucene_ray.index.search import Searcher

FIELDS = {"text": {"column": "text", "analyzer": "simple"}}


def _write(tmp, name, ids, texts):
    p = str(tmp / f"{name}.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        p,
    )
    return p


@pytest.fixture(scope="module")
def cat(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("cat")
    c = Catalog(str(tmp / "root"))
    rng = np.random.default_rng(23)
    words = ["merge", "scan", "stream", "join", "batch", "data"]
    a = _write(tmp, "a", range(100),
               [" ".join(rng.choice(words, 8)) for _ in range(100)])
    b = _write(tmp, "b", range(100, 180),
               [" ".join(rng.choice(words, 6)) for _ in range(80)])
    c.create("db_a", a, fields=FIELDS, num_partitions=2)
    # disjoint doc-id space for the federated view (ids are dense
    # from row position; doc_base offsets the second index)
    c.create("db_b", b, fields=FIELDS, num_partitions=2, doc_base=100)
    return c


class TestCatalog:
    def test_list_and_exists(self, cat):
        t = cat.list()
        assert t["name"].to_pylist() == ["db_a", "db_b"]
        assert t["n_docs"].to_pylist() == [100, 80]
        assert cat.exists("db_a") and not cat.exists("nope")
        assert not cat.exists("_trash")

    def test_invalid_names_rejected(self, cat):
        for bad in ["", "_x", "a/b"]:
            with pytest.raises((ValueError, FileNotFoundError)):
                cat.open(bad)

    def test_per_index_search_independent_stats(self, cat):
        each = cat.search_each(["db_a", "db_b"], "data", k=5)
        names = set(each["name"].to_pylist())
        assert names == {"db_a", "db_b"}
        # each leg equals a direct searcher on that index
        sa = cat.open("db_a").search("data", k=5)
        got_a = [
            (d, s)
            for n, d, s in zip(
                each["name"].to_pylist(),
                each["doc_id"].to_pylist(),
                each["score"].to_pylist(),
            )
            if n == "db_a"
        ]
        assert got_a == [(d, float(s)) for d, s in sa]

    def test_federated_multi_over_disjoint_ids(self, cat):
        m = cat.open_multi(["db_a", "db_b"])
        hits = m.search("data", k=200, mode="exhaustive")
        ids = {d for d, _ in hits}
        assert any(d < 100 for d in ids) and any(d >= 100 for d in ids)

    def test_drop_is_atomic_and_open_survives(self, cat, tmp_path):
        # a searcher opened BEFORE drop keeps serving from its snapshot
        p = _write(tmp_path, "c", range(200, 230), ["data point"] * 30)
        cat.create("db_c", p, fields=FIELDS, num_partitions=1)
        s = cat.open("db_c")
        pre = s.search("data", k=5)
        cat.drop("db_c")
        assert not cat.exists("db_c")
        assert "db_c" not in cat.list()["name"].to_pylist()
        # mmap'd segments keep the open reader alive on POSIX
        assert s.search("data", k=5) == pre
        with pytest.raises(FileNotFoundError):
            cat.open("db_c")
