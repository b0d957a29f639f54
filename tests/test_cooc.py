"""Windowed co-occurrence + PMI: brute-force oracle on planted docs.
The SQL twin (`cooccurrence`) runs in the driver gate."""

import itertools
import math
from collections import Counter

import pyarrow as pa
import ray.data

from fdblucene_ray.ops.cooc import cooccurrence_pmi


def _docs(texts):
    return ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts)}
        )
    )


def _brute(texts, window, top_k):
    pairs = Counter()
    uni = Counter()
    for txt in texts:
        toks = [t for t in "".join(
            c if c.isalnum() or c == "_" else " " for c in txt.lower()
        ).split() if t]
        uni.update(toks)
        for i, j in itertools.combinations(range(len(toks)), 2):
            if j - i <= window:
                pairs[tuple(sorted((toks[i], toks[j])))] += 1
    n_tok = sum(uni.values())
    n_pair = sum(pairs.values())
    top = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    out = []
    for (l, r), c in top:
        pmi = math.log((c / n_pair) / ((uni[l] / n_tok) * (uni[r] / n_tok)))
        out.append((l, r, c, round(pmi, 6)))
    return out


TEXTS = [
    "the cat sat on the mat",
    "the cat ate the rat near the mat",
    "dogs and cats and dogs again",
    "a b c d e f g h a b",  # window cutoff matters here
    "",
]


class TestCooccurrencePMI:
    def test_matches_bruteforce(self):
        got = cooccurrence_pmi(_docs(TEXTS), window=5, top_k=20)
        rows = list(zip(got["left"].to_pylist(), got["right"].to_pylist(),
                        got["cnt"].to_pylist(), got["pmi"].to_pylist()))
        assert rows == _brute(TEXTS, 5, 20)

    def test_window_limits_pairs(self):
        # "a ... z" 8 apart never pairs at window=5
        got = cooccurrence_pmi(_docs(["a b c d e f g z a"]), window=2,
                               top_k=100)
        pairs = set(zip(got["left"].to_pylist(), got["right"].to_pylist()))
        assert ("a", "z") in pairs          # z at pos 7, a at pos 8: d=1
        assert ("a", "b") in pairs          # d=1 twice
        assert ("a", "d") not in pairs      # closest occurrence d=3 > 2
        rows = list(zip(got["left"].to_pylist(), got["right"].to_pylist(),
                        got["cnt"].to_pylist(), got["pmi"].to_pylist()))
        assert rows == _brute(["a b c d e f g z a"], 2, 100)

    def test_pair_normalization_is_lexicographic(self):
        got = cooccurrence_pmi(_docs(["zeta alpha", "alpha zeta"]),
                               window=1, top_k=10)
        assert got["left"].to_pylist() == ["alpha"]
        assert got["right"].to_pylist() == ["zeta"]
        assert got["cnt"].to_pylist() == [2]

    def test_repeated_token_self_pair(self):
        got = cooccurrence_pmi(_docs(["echo echo echo"]), window=1, top_k=10)
        rows = list(zip(got["left"].to_pylist(), got["right"].to_pylist(),
                        got["cnt"].to_pylist(), got["pmi"].to_pylist()))
        assert rows == _brute(["echo echo echo"], 1, 10)
