"""Spill exchange (index/exchange.py) vs the Dataset sort-shuffle path.

The spill exchange replaces the groupby("part") shuffle with direct
per-partition IPC spill files; it must produce an index that answers
every query IDENTICALLY (docids + BM25 scores) to the Dataset path —
the same bar the Dataset path holds against the pure-Python oracle
(reference golden e2e, SimpleFDBDirectoryTest.java:145-159).

Determinism: part assignment (incl. auto head-term salting) is a pure
function of unit/batch boundaries, which run_spill_exchange derives
from TOTAL ROWS only — never cluster size — so two spill builds at
different tokenizer counts yield byte-identical segments (crc check).
"""

import pytest

from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.search import Searcher

SF = "/root/testdata/sf0.001"

QUERIES = [
    ["data"], ["merge"], ["the"], ["data", "merge"],
    ["spark", "window"], ["nonexistentterm"],
]


def _build(tmp_path_factory, tag, **kw):
    d = str(tmp_path_factory.mktemp(tag))
    m = build_index(
        f"{SF}/documents.parquet", d, num_partitions=7, batch_size=128, **kw
    )
    return d, m


@pytest.fixture(scope="module")
def pair(tmp_path_factory, ray_session):
    spill_dir, spill_m = _build(tmp_path_factory, "spill", exchange="spill")
    ds_dir, ds_m = _build(tmp_path_factory, "dataset", exchange="dataset")
    return spill_dir, spill_m, ds_dir, ds_m


def test_spill_build_identical(pair):
    spill_dir, _, ds_dir, _ = pair
    s1, s2 = Searcher(spill_dir), Searcher(ds_dir)
    assert s1.field_stats("text") == s2.field_stats("text")
    for terms in QUERIES:
        for t in terms:
            assert s1.term_stats("text", t) == s2.term_stats("text", t), t
        h1 = s1.search(" ".join(terms), k=10)
        h2 = s2.search(" ".join(terms), k=10)
        assert [(d, round(s, 9)) for d, s in h1] == [
            (d, round(s, 9)) for d, s in h2
        ], terms


def test_spill_deterministic_across_tokenizer_counts(tmp_path_factory, ray_session):
    d1, m1 = _build(tmp_path_factory, "tok2", exchange="spill",
                    tokenize_concurrency=2)
    d2, m2 = _build(tmp_path_factory, "tok4", exchange="spill",
                    tokenize_concurrency=4)
    metas1 = sorted(
        (s.name, s.n_terms, s.n_postings, s.postings_crc, s.skips_crc)
        for s in m1.segments
    )
    metas2 = sorted(
        (s.name, s.n_terms, s.n_postings, s.postings_crc, s.skips_crc)
        for s in m2.segments
    )
    assert metas1 == metas2


def test_spill_resume_skips(tmp_path_factory, ray_session):
    d, m1 = _build(tmp_path_factory, "resume", exchange="spill")
    m2 = build_index(
        f"{SF}/documents.parquet", d, num_partitions=7, batch_size=128,
        exchange="spill",
    )
    assert [s.name for s in m1.segments] == [s.name for s in m2.segments]
    assert m2.version == m1.version  # checkpoint short-circuits, no new commit
