"""Char-trigram substring search (analysis/trigram.py +
Searcher.search_substring): signature correctness, candidate-superset
property, and exact-verify false-positive removal."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.analysis.trigram import (
    add_trigram_column,
    key_to_term,
    trigram_keys,
    trigram_signature,
)
from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.search import Searcher


class TestSignature:
    def test_keys_roundtrip(self):
        ks = trigram_keys("Batch")
        assert [key_to_term(int(k)) for k in ks] == sorted(
            {"bat", "atc", "tch"}
        )

    def test_normalization_maps_nonalnum(self):
        ks = trigram_keys("a-b c")
        assert set(key_to_term(int(k)) for k in ks) == {"a_b", "_b_", "b_c"}

    def test_signature_column_matches_per_row(self):
        texts = ["window batch", "ab", "", "DUP dup"]
        sig = trigram_signature(pa.array(texts)).to_pylist()
        for t, s in zip(texts, sig):
            got = set(s.split(" ")) - {""}
            want = set(key_to_term(int(k)) for k in trigram_keys(t))
            assert got == want, t

    def test_short_rows_empty(self):
        sig = trigram_signature(pa.array(["ab", "x", ""])).to_pylist()
        assert sig == ["", "", ""]


@pytest.fixture(scope="module")
def tri_ix(tmp_path_factory, ray_session):
    from fdblucene_ray.analysis.trigram import add_trigram_column

    d = tmp_path_factory.mktemp("tri")
    texts = [
        "the window slides fast",          # contains 'indo'
        "a windmill and an indoor pool",   # 'indo' inside 'indoor'
        "wind over the doorstep",          # has 'ind' + 'ndo'? no: verify filters
        "completely unrelated text",
        "WINDOW shouting case",            # case-insensitive match
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    src = str(d / "c.parquet")
    pq.write_table(t, src)
    ix = str(d / "ix")
    build_index(
        src, ix, fields={"tri": {"column": "trigrams", "analyzer": "simple"}},
        num_partitions=3, batch_size=4, preprocess=add_trigram_column,
        read_columns=["text"],
    )
    return ix, src


class TestSubstringSearch:
    def test_matches_bruteforce(self, tri_ix):
        ix, src = tri_ix
        s = Searcher(ix)
        texts = pq.read_table(src)["text"].to_pylist()
        for needle in ("indo", "window", "door", "pool", "zzz", "ted tex"):
            got = s.search_substring(needle, 25, source=src)
            want = [
                i for i, t in enumerate(texts) if needle in t.lower()
            ]
            assert got == want, needle

    def test_false_positive_filtered(self, tri_ix):
        # doc 2 has 'wind' and 'door...' -> trigrams of 'indo' may all
        # appear ('ind' in windmill? 'ndo'?) — regardless, verify must
        # keep only true substring matches
        ix, src = tri_ix
        s = Searcher(ix)
        got = s.search_substring("indo", 25, source=src)
        assert 3 not in got and 2 not in got

    def test_short_needle_raises(self, tri_ix):
        ix, src = tri_ix
        s = Searcher(ix)
        with pytest.raises(ValueError):
            s.search_substring("ab", source=src)

    def test_candidates_pruned_by_index(self, tri_ix):
        # the unrelated doc never reaches hydration for 'window'
        ix, src = tri_ix
        s = Searcher(ix)
        from fdblucene_ray.analysis.trigram import trigram_keys as tk
        from fdblucene_ray.index.search import _matching_docs_per_term

        terms = [key_to_term(int(x)) for x in tk("window")]
        cand = None
        for docs in _matching_docs_per_term(s.readers, terms, "tri"):
            docs = np.unique(docs)
            cand = docs if cand is None else np.intersect1d(cand, docs)
        assert 3 not in set(cand.tolist())


class TestSignatureProperties:
    def test_superset_property_random(self):
        """If needle occurs in text, every trigram key of the needle is
        in the text's signature — the invariant candidate pruning
        relies on (verify may remove, never re-add)."""
        import random

        rng = random.Random(11)
        alpha = "abc XY-9 "
        for _ in range(200):
            text = "".join(rng.choice(alpha) for _ in range(rng.randint(3, 60)))
            i = rng.randint(0, len(text) - 3)
            j = rng.randint(i + 3, len(text))
            needle = text[i:j]
            sig = set(
                trigram_signature(pa.array([text])).to_pylist()[0].split(" ")
            )
            need = {key_to_term(int(k)) for k in trigram_keys(needle)}
            assert need <= sig, (text, needle)

    def test_signature_matches_rowwise_reference(self):
        """The buffer-vectorized signature equals a per-row reference
        built from trigram_keys, including multi-chunk arrays with a
        nonzero offset."""
        texts = ["Hello, World", "", "ab", "a b c d", "ZZ-top 99"]
        arr = pa.chunked_array([texts[:2], texts[2:]]).combine_chunks()
        sliced = arr.slice(1)  # nonzero offset path
        sig = trigram_signature(sliced).to_pylist()
        for t, s in zip(texts[1:], sig):
            got = set(s.split(" ")) - {""}
            want = {key_to_term(int(k)) for k in trigram_keys(t)}
            assert got == want, t

    def test_large_string_column(self):
        """large_string (int64 offsets) columns must produce the same
        signatures as string columns — ADVICE r3: reading the offsets
        buffer as int32 silently shifted every row."""
        texts = ["Hello, World", "", "ab", "a b c d", "ZZ-top 99",
                 "substring search target xyzzy"]
        small = pa.array(texts, pa.string())
        large = pa.array(texts, pa.large_string())
        assert trigram_signature(large).to_pylist() == (
            trigram_signature(small).to_pylist()
        )
        # sliced large_string (nonzero offset) too
        assert trigram_signature(large.slice(2)).to_pylist() == (
            trigram_signature(small.slice(2)).to_pylist()
        )
        # chunked large_string through add_trigram_column
        t = pa.table({"text": pa.chunked_array(
            [texts[:3], texts[3:]], pa.large_string())})
        got = add_trigram_column(t)["trigrams"].to_pylist()
        assert got == trigram_signature(small).to_pylist()
