"""Analyzer chain tests: vectorized batch tokenizer == row-wise oracle."""

import numpy as np
import pyarrow as pa
import pytest
from collections import Counter

from fdblucene_ray.analysis import ENGLISH_STOPWORDS, get_analyzer, porter_stem
from fdblucene_ray.analysis.analyzer import BatchTokenizer


class TestPorter:
    # sample pairs from the published algorithm description (full-chain
    # outputs, i.e. including steps 4/5)
    CASES = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "hopping": "hop", "tanned": "tan", "falling": "fall", "filing": "file",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration", "digitizer": "digit",
        "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
        "electrical": "electr", "hopeful": "hope", "goodness": "good",
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "communism": "commun", "activate": "activ",
        "effective": "effect", "rate": "rate", "controll": "control",
        "roll": "roll", "running": "run", "runs": "run", "run": "run",
    }

    def test_cases(self):
        for w, e in self.CASES.items():
            assert porter_stem(w) == e, w

    def test_short_words_unchanged(self):
        for w in ["a", "is", "be", "ox"]:
            assert porter_stem(w) == w


class TestAnalyzers:
    def test_lucene_chain(self):
        az = get_analyzer("lucene")
        assert az.tokens("The quick foxes were RUNNING!") == [
            "quick", "fox", "were", "run",
        ]

    def test_stopwords_removed(self):
        az = get_analyzer("lucene")
        assert az.tokens("the and of a to") == []
        assert "the" in ENGLISH_STOPWORDS

    def test_simple_keeps_stopwords(self):
        az = get_analyzer("simple")
        assert az.tokens("The Cat, and dog_1!") == ["the", "cat", "and", "dog_1"]

    def test_empty_and_punct(self):
        for name in ["lucene", "simple"]:
            az = get_analyzer(name)
            assert az.tokens("") == []
            assert az.tokens("!!! ... ---") == []


@pytest.mark.parametrize("analyzer", ["lucene", "simple", "simple_stop"])
class TestBatchTokenizer:
    TEXTS = [
        "The quick brown foxes were RUNNING, and jumped over 2 lazy dogs!",
        "",
        "the the the",
        "hello everybody hello",
        "x" * 3000,
        "a-b c_d e.f 123 456 the",
    ]

    def test_matches_rowwise(self, analyzer):
        tk = BatchTokenizer(analyzer)
        az = get_analyzer(analyzer)
        col = pa.array(self.TEXTS)
        post_rows, terms, tfs, dls = tk.term_frequencies(col)
        got = {}
        for r, t, c in zip(post_rows, terms.to_pylist(), tfs):
            got[(int(r), t)] = int(c)
        exp = {}
        for i, txt in enumerate(self.TEXTS):
            for term, c in Counter(az.tokens(txt)).items():
                exp[(i, term)] = c
        assert got == exp
        assert list(dls) == [len(az.tokens(t)) for t in self.TEXTS]

    def test_stem_cache_consistency(self, analyzer):
        tk = BatchTokenizer(analyzer)
        col = pa.array(["running runner", "running"])
        r1 = tk.term_frequencies(col)
        r2 = tk.term_frequencies(col)
        assert r1[1].to_pylist() == r2[1].to_pylist()


class TestShingles:
    TEXTS = [
        "The quick brown fox",
        "a",
        "",
        "data data stream data",
        "One-two, three!",
        "x " * 50,  # long repetitive row
    ]

    def test_rowwise_bigrams(self):
        from fdblucene_ray.analysis.analyzer import get_analyzer

        az = get_analyzer("shingle2")
        assert az.tokens("The quick brown fox") == [
            "the_quick", "quick_brown", "brown_fox"
        ]
        assert az.tokens("a") == []
        assert az.tokens("") == []
        toks, pos = az.tokens_with_positions("data data stream data")
        assert toks == ["data_data", "data_stream", "stream_data"]
        assert pos == [0, 1, 2]

    def test_batch_equals_rowwise(self):
        from fdblucene_ray.analysis.analyzer import BatchTokenizer, get_analyzer

        az = get_analyzer("shingle2")
        tk = BatchTokenizer("shingle2")
        col = pa.array(self.TEXTS)
        r, c, vocab, pos = tk.encoded_tokens(col, with_positions=True)
        for i, t in enumerate(self.TEXTS):
            m = r == i
            assert [vocab[j] for j in c[m]] == az.tokens(t), i
            assert list(pos[m]) == az.tokens_with_positions(t)[1], i

    def test_doc_lens_count_emitted_shingles(self):
        from fdblucene_ray.analysis.analyzer import BatchTokenizer, get_analyzer

        az = get_analyzer("shingle2")
        tk = BatchTokenizer("shingle2")
        out = tk.term_frequencies_encoded(pa.array(self.TEXTS))
        assert list(out[4]) == [len(az.tokens(t)) for t in self.TEXTS]

    def test_multi_valued_rejected(self):
        from fdblucene_ray.analysis.analyzer import BatchTokenizer

        tk = BatchTokenizer("shingle2")
        lst = pa.array([["a b", "c d"]], pa.list_(pa.string()))
        import pytest as _pytest

        with _pytest.raises(ValueError, match="single-valued"):
            tk.encoded_tokens_multi(lst)
