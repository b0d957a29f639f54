"""Distributed BPE train/apply vs a naive from-scratch oracle.

The oracle recounts all pairs from the full histogram every iteration
(textbook Sennrich et al. 2016); the engine maintains incremental pair
indexes — identical merge sequences prove the bookkeeping right."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fdblucene_ray.ops.bpe import (
    EOW,
    apply_bpe,
    encode_word,
    train_bpe,
    word_histogram,
)


def naive_train(word_counts: dict[str, int], n_merges: int):
    seqs = {w: tuple(w) + (EOW,) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, seq in seqs.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + word_counts[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] <= 0:
            break
        merges.append(best)
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(seq[i] + seq[i + 1])
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = tuple(out)
        if not any(len(s) > 1 for s in seqs.values()):
            break
    return merges


def naive_encode(word, merges):
    seq = list(tuple(word) + (EOW,))
    for m in merges:  # rank order == application priority for the
        # naive twin only when re-scanned to fixpoint
        pass
    ranks = {m: i for i, m in enumerate(merges)}
    while len(seq) > 1:
        cand = [
            (ranks[(seq[i], seq[i + 1])], i)
            for i in range(len(seq) - 1)
            if (seq[i], seq[i + 1]) in ranks
        ]
        if not cand:
            break
        _, i = min(cand)
        seq[i : i + 2] = [seq[i] + seq[i + 1]]
    return seq


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest wide wide wide",
    "low new wide lowest",
]


@pytest.fixture(scope="module")
def ds(ray_session):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                "text": pa.array(TEXTS),
            }
        )
    )


def _counts():
    wc: dict[str, int] = {}
    for t in TEXTS:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


class TestHistogram:
    def test_matches_python_counts(self, ds):
        h = word_histogram(ds, top_v=1000)
        got = dict(zip(h["word"].to_pylist(), h["cnt"].to_pylist()))
        assert got == _counts()
        md = h.schema.metadata
        assert int(md[b"total_tokens"]) == sum(_counts().values())
        assert md[b"kept_tokens"] == md[b"total_tokens"]

    def test_cap_keeps_heaviest_and_reports(self, ds):
        h = word_histogram(ds, top_v=3)
        full = sorted(_counts().items(), key=lambda kv: (-kv[1], kv[0]))
        assert h["word"].to_pylist() == [w for w, _ in full[:3]]
        md = h.schema.metadata
        assert int(md[b"kept_tokens"]) < int(md[b"total_tokens"])


class TestTrain:
    def test_merge_sequence_matches_naive(self, ds):
        h = word_histogram(ds, top_v=1000)
        got = train_bpe(h, 25)
        want = naive_train(_counts(), 25)
        pairs = list(zip(got["left"].to_pylist(), got["right"].to_pylist()))
        assert pairs == want

    def test_exhaustion_stops_early(self, ds):
        h = word_histogram(ds, top_v=1000)
        got = train_bpe(h, 10_000)
        # every word fully merged -> fewer merges than requested
        assert got.num_rows < 10_000
        ranks = {
            (l, r): k
            for k, l, r in zip(*[got[c].to_pylist() for c in ("rank", "left", "right")])
        }
        for w in _counts():
            assert encode_word(w, ranks) == [w + EOW]


class TestApply:
    def test_subword_counts_match_naive(self, ds):
        h = word_histogram(ds, top_v=1000)
        merges_tbl = train_bpe(h, 8)
        merges = list(
            zip(merges_tbl["left"].to_pylist(), merges_tbl["right"].to_pylist())
        )
        out = {
            r["doc_id"]: r
            for r in apply_bpe(ds, merges_tbl, concurrency=2).take_all()
        }
        for d, t in enumerate(TEXTS):
            words = t.split()
            want = sum(len(naive_encode(w, merges)) for w in words)
            assert out[d]["n_words"] == len(words)
            assert out[d]["n_subwords"] == want

    def test_zero_merges_counts_chars(self, ds):
        empty = pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "left": pa.array([], pa.string()),
                "right": pa.array([], pa.string()),
            }
        )
        out = {r["doc_id"]: r for r in apply_bpe(ds, empty, concurrency=2).take_all()}
        for d, t in enumerate(TEXTS):
            want = sum(len(w) + 1 for w in t.split())  # chars + EOW
            assert out[d]["n_subwords"] == want
