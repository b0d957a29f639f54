"""Sorted / SortedSet / Binary doc values (reference DATA.md:38-42 —
the three doc-values types the reference marks TODO)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.manifest import load_manifest
from fdblucene_ray.index.search import Searcher
from fdblucene_ray.index.stringdv import (
    binary_dv_values,
    build_binary_dv,
    build_sorted_dv,
    load_sorted_dict,
    sorted_dv_rows,
)

N = 60
LANGS = ["en", "de", "fr", "es", "ja"]
FIELDS = {"text": {"column": "text", "analyzer": "simple"}}


def _corpus(d):
    texts = [
        ("data merge " if i % 2 == 0 else "data split ")
        + f"body t{i:03d}"
        for i in range(N)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(N), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([LANGS[i % 5] for i in range(N)], pa.string()),
            "tags": pa.array(
                [[LANGS[i % 5], f"t{i % 3}"] for i in range(N)],
                pa.list_(pa.string()),
            ),
            "payload": pa.array(
                [f"pay-{i:04d}".encode() for i in range(N)], pa.binary()
            ),
        }
    )
    p = str(d / "c.parquet")
    pq.write_table(t, p)
    return p


@pytest.fixture(scope="module")
def dv_ix(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("sdv")
    src = _corpus(d)
    ix = str(d / "ix")
    build_index(src, ix, fields=FIELDS, num_partitions=3, batch_size=16)
    build_sorted_dv(ix, "lang", src)
    build_sorted_dv(ix, "tags", src, multi=True)
    build_binary_dv(ix, "payload", src)
    return ix, src


class TestSortedDV:
    def test_dict_sorted_and_manifest_recorded(self, dv_ix):
        ix, _ = dv_ix
        dct = load_sorted_dict(ix, "lang")
        assert list(dct) == sorted(set(LANGS))
        m = load_manifest(ix)
        assert m.extra["dv_sorted"]["lang"]["cardinality"] == 5
        assert m.extra["dv_sorted"]["tags"]["multi"] is True

    def test_sort_by_keyword_asc_desc(self, dv_ix):
        ix, _ = dv_ix
        s = Searcher(ix)
        # oracle: docs containing 'merge' (even ids) by (lang, doc_id)
        want = sorted(
            ((LANGS[i % 5], i) for i in range(0, N, 2)),
        )[:10]
        got = s.search_sort_by_keyword("merge", k=10, dv_field="lang")
        assert [(v, d) for d, v in got] == want
        want_d = sorted(
            ((LANGS[i % 5], i) for i in range(0, N, 2)),
            key=lambda x: (x[0], -x[1]), reverse=True,
        )
        want_d = sorted(
            ((LANGS[i % 5], i) for i in range(0, N, 2)),
            key=lambda x: ([-ord(c) for c in x[0]], x[1]),
        )[:10]
        got_d = s.search_sort_by_keyword(
            "merge", k=10, dv_field="lang", descending=True
        )
        assert [(v, d) for d, v in got_d] == want_d

    def test_missing_ids_raise(self, dv_ix, tmp_path, ray_session):
        ix, src = dv_ix
        # a dv built over a half-corpus source must raise on full match
        t = pq.read_table(src).slice(0, 10)
        half = str(tmp_path / "half.parquet")
        pq.write_table(t, half)
        build_sorted_dv(ix, "lang_half", half, column="lang")
        s = Searcher(ix)
        with pytest.raises(ValueError, match="missing"):
            s.search_sort_by_keyword("data", k=5, dv_field="lang_half")

    def test_sortedset_facets(self, dv_ix):
        ix, _ = dv_ix
        s = Searcher(ix)
        got = s.facet_counts_sortedset("merge", "tags")
        # brute force over even ids
        from collections import Counter

        c: Counter = Counter()
        for i in range(0, N, 2):
            for v in {LANGS[i % 5], f"t{i % 3}"}:
                c[v] += 1
        want = sorted(c.items(), key=lambda x: (-x[1], x[0]))
        assert got == want

    def test_sortedset_sort_uses_min_ord(self, dv_ix):
        ix, _ = dv_ix
        s = Searcher(ix)
        got = s.search_sort_by_keyword("merge", k=5, dv_field="tags")
        want = sorted(
            (min(LANGS[i % 5], f"t{i % 3}"), i) for i in range(0, N, 2)
        )[:5]
        assert [(v, d) for d, v in got] == want


class TestBinaryDV:
    def test_roundtrip_aligned(self, dv_ix):
        ix, _ = dv_ix
        s = Searcher(ix)
        ids = [7, 3, 59, 0]
        vals = s.binary_dv("payload", ids)
        assert vals == [f"pay-{i:04d}".encode() for i in ids]

    def test_missing_raises(self, dv_ix):
        ix, _ = dv_ix
        with pytest.raises(ValueError, match="missing"):
            binary_dv_values(ix, "payload", np.array([3, 10_000]))


class TestReplication:
    def test_push_pull_carries_sidecars(self, dv_ix, tmp_path):
        from fdblucene_ray.index.store import (
            LocalFSStore,
            pull_index,
            push_index,
        )

        ix, _ = dv_ix
        store = LocalFSStore(str(tmp_path / "store"))
        push_index(ix, store)
        cache = str(tmp_path / "cache")
        pull_index(store, cache)
        s = Searcher(cache)
        got = s.search_sort_by_keyword("merge", k=3, dv_field="lang")
        want = Searcher(ix).search_sort_by_keyword(
            "merge", k=3, dv_field="lang"
        )
        assert got == want
        assert s.binary_dv("payload", [5]) == [b"pay-0005"]

    def test_export_commit_carries_sidecars(self, dv_ix, tmp_path):
        from fdblucene_ray.index.manifest import export_commit

        ix, _ = dv_ix
        out = str(tmp_path / "clone")
        export_commit(ix, out)
        assert os.path.isdir(os.path.join(out, "dv_sorted", "lang"))
        s = Searcher(out)
        assert s.facet_counts_sortedset("merge", "tags") == Searcher(
            ix
        ).facet_counts_sortedset("merge", "tags")
