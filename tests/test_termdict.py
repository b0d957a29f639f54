"""Lazy term dictionary (ST3 page-cache analog): lookups must read a
bounded slice of terms.parquet, not materialize the whole dictionary
(VERDICT round-1 #1; reference analog FDBIndexInput.java:113-124 page
reads + JCS cache README.md:96-102)."""

import numpy as np
import pyarrow as pa
import pytest

from fdblucene_ray.index.manifest import SegmentMeta
from fdblucene_ray.index.segment import (
    FIELD_SEP,
    TERMS_ROW_GROUP,
    SegmentReader,
    write_segment,
)

N_TERMS = 3 * TERMS_ROW_GROUP + 17  # > 3 row groups


@pytest.fixture(scope="module")
def big_segment(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("termdict"))
    terms = [f"t{i:07d}" for i in range(N_TERMS)]
    t = pa.table(
        {
            "key": pa.array(["text" + FIELD_SEP + tm for tm in terms]),
            "doc_id": pa.array(np.arange(N_TERMS, dtype=np.int64)),
            "tf": pa.array(np.full(N_TERMS, 2, np.int32)),
            "norm": pa.array(np.full(N_TERMS, 7, np.uint8)),
        }
    )
    meta = write_segment(d, "seg-big", t)
    return d, meta, terms


class TestLazyTermDict:
    def test_lookup_reads_one_row_group(self, big_segment):
        d, meta, terms = big_segment
        r = SegmentReader(d, meta)
        df, ttf = r.term_stats("text", terms[5])
        assert (df, ttf) == (1, 2)
        assert r.rg_loads == 1  # exactly one row group decoded
        assert r._terms is None  # full table never materialized

    def test_lookups_across_groups_bounded(self, big_segment):
        d, meta, terms = big_segment
        r = SegmentReader(d, meta)
        probes = [terms[0], terms[N_TERMS // 2], terms[-1], terms[1]]
        for tm in probes:
            h = r.postings_handle("text", tm)
            assert h is not None
        # 4 probes touch at most 3 distinct row groups (first two probes
        # may share none; re-probing a cached group costs no load)
        assert r.rg_loads <= 3
        assert r._terms is None

    def test_absent_terms(self, big_segment):
        d, meta, terms = big_segment
        r = SegmentReader(d, meta)
        assert r.term_stats("text", "aaaa_before_all") == (0, 0)
        assert r.term_stats("text", "zzzz_after_all") == (0, 0)
        assert r.term_stats("other_field", terms[0]) == (0, 0)
        assert r.postings_handle("text", terms[3][:-1] + "x") is None

    def test_matches_full_table_scan(self, big_segment):
        """Lazy lookups agree with the full-dictionary path on a sample."""
        d, meta, terms = big_segment
        lazy = SegmentReader(d, meta)
        full = SegmentReader(d, meta)
        rng = np.random.default_rng(7)
        for i in rng.integers(0, N_TERMS, size=50):
            tm = terms[int(i)]
            j = full.term_index("text", tm)
            assert j is not None
            row = lazy._term_row("text", tm)
            t = full.terms
            for c in ("df", "ttf", "post_offset", "post_len"):
                assert row[c] == t[c][j].as_py(), (tm, c)

    def test_postings_decode_roundtrip(self, big_segment):
        from fdblucene_ray.codec.postings import decode_all

        d, meta, terms = big_segment
        r = SegmentReader(d, meta)
        blob, skips, n = r.postings_handle("text", terms[12345 % N_TERMS])
        docs, tfs, norms = decode_all(blob, skips, n)
        assert docs.tolist() == [12345 % N_TERMS]
        assert tfs.tolist() == [2]
        assert norms.tolist() == [7]
