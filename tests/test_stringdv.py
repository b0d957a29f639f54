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


class TestSegmentedSortedDV:
    """Per-segment ords + ordinal-remap merge (the Lucene OrdinalMap
    analog) — the path that lifts the driver-side dictionary cap."""

    def _big_corpus(self, d, n=3000, n_vals=800):
        # dictionary of n_vals distinct keys, far above the test cap
        t = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(
                    [
                        ("data merge " if i % 2 == 0 else "data split ")
                        + f"body t{i:04d}"
                        for i in range(n)
                    ],
                    pa.string(),
                ),
                "key": pa.array(
                    [f"k-{(i * 37) % n_vals:05d}" for i in range(n)],
                    pa.string(),
                ),
            }
        )
        p = str(d / "big.parquet")
        pq.write_table(t, p)
        return p, t

    def test_over_cap_build_equals_fast_path(
        self, tmp_path, ray_session
    ):
        """A dictionary over max_dict_size auto-switches to the
        segmented build; dict.parquet VALUES and the (doc, ord) rows
        are identical to the fast (broadcast) path's."""
        p, t = self._big_corpus(tmp_path)
        ixa = str(tmp_path / "ixa")
        ixb = str(tmp_path / "ixb")
        for ix in (ixa, ixb):
            build_index(
                p, ix, fields=FIELDS, num_partitions=3, batch_size=256
            )
        build_sorted_dv(ixa, "key", p)  # fast path (cap = 5M)
        m = build_sorted_dv(ixb, "key", p, max_dict_size=100)
        assert m.extra["dv_sorted"]["key"].get("segmented") is True
        da = load_sorted_dict(ixa, "key")
        db = load_sorted_dict(ixb, "key")
        assert list(da) == list(db)
        ids = np.arange(t.num_rows, dtype=np.int64)
        ia, oa = sorted_dv_rows(ixa, "key", ids)
        ib, ob = sorted_dv_rows(ixb, "key", ids)
        za = sorted(zip(ia.tolist(), oa.tolist()))
        zb = sorted(zip(ib.tolist(), ob.tolist()))
        assert za == zb
        # and the ords decode to the source values
        vals = t["key"].to_pylist()
        for did, o in za[:50]:
            assert da[o] == vals[did]

    def test_over_cap_sort_query_green(self, tmp_path, ray_session):
        """search_sort_by_keyword over a segmented-built dv matches
        the brute-force (value, doc) order."""
        p, t = self._big_corpus(tmp_path)
        ix = str(tmp_path / "ix")
        build_index(
            p, ix, fields=FIELDS, num_partitions=3, batch_size=256
        )
        build_sorted_dv(ix, "key", p, max_dict_size=50)
        s = Searcher(ix)
        vals = t["key"].to_pylist()
        want = sorted((vals[i], i) for i in range(0, t.num_rows, 2))[:15]
        got = s.search_sort_by_keyword("merge", k=15, dv_field="key")
        assert [(v, d) for d, v in got] == want

    def test_segmented_multi_and_resume(self, tmp_path, ray_session):
        """SortedSet through the segmented path; re-running the build
        reuses published segment dirs (idempotent names)."""
        import glob

        n = 400
        t = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["data x"] * n, pa.string()),
                "tags": pa.array(
                    [
                        [f"t{(i * 13) % 90:03d}", f"t{(i * 7) % 90:03d}"]
                        for i in range(n)
                    ],
                    pa.list_(pa.string()),
                ),
            }
        )
        p = str(tmp_path / "m.parquet")
        pq.write_table(t, p)
        ix = str(tmp_path / "ix")
        build_index(p, ix, fields=FIELDS, num_partitions=2, batch_size=64)
        build_sorted_dv(ix, "tags", p, multi=True, force_segmented=True)
        dct = load_sorted_dict(ix, "tags")
        want_vocab = sorted(
            {v for row in t["tags"].to_pylist() for v in row}
        )
        assert list(dct) == want_vocab
        ids, ords = sorted_dv_rows(
            ix, "tags", np.arange(n, dtype=np.int64)
        )
        got = sorted(zip(ids.tolist(), [dct[o] for o in ords]))
        want = sorted(
            (i, v)
            for i, row in enumerate(t["tags"].to_pylist())
            for v in set(row)
        )
        assert got == want
        segs = glob.glob(
            os.path.join(ix, "dv_sorted", "tags", "segments", "seg-*")
        )
        assert segs  # per-segment layout exists alongside the merge


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
