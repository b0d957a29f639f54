"""Sentence segmentation + C4 three-sentence-span dedup
(fdblucene_ray/ops/sentences.py).

The segmentation contract is byte-exactness with the DuckDB oracle's
``regexp_extract_all(text, '[\\s\\S]*?[.!?]+|[^.!?]+$')`` + RE2-``\\s``
trim + empty drop — property-tested here against DuckDB itself, and the
full pipeline against a brute-force Python replay of Raffel et al. 2020
§2.2 ("discard all but one of any three-sentence span occurring more
than once").
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fdblucene_ray.ops.sentences import (
    C4SentenceScrub,
    SentenceSpanRows,
    c4_sentence_dedup,
    split_sentences,
)

_SEG_SQL = r"""
SELECT list_filter(list_transform(
         regexp_extract_all(coalesce(text, ''), '[\s\S]*?[.!?]+|[^.!?]+$'),
         x -> regexp_replace(x, '^\s+|\s+$', '', 'g')),
       x -> x <> '') AS sents
FROM t
"""


def _oracle_sents(rows):
    con = duckdb.connect()
    con.register("t", pa.table({"text": pa.array(rows, pa.string())}))
    return [r[0] for r in con.execute(_SEG_SQL).fetchall()]


def _brute_c4(rows, n=3):
    """Driver-side replay of the C4 rule over segmented docs."""
    sents = _oracle_sents(rows)
    first = {}
    order = []
    for d, ss in enumerate(sents):
        for p in range(max(0, len(ss) - n + 1)):
            key = "\x1f".join(ss[p : p + n])
            order.append((key, d, p))
            first.setdefault(key, (d, p))
    counts = {}
    for key, _, _ in order:
        counts[key] = counts.get(key, 0) + 1
    removed = [set() for _ in rows]
    for key, d, p in order:
        if counts[key] > 1 and (d, p) != first[key]:
            removed[d].update(range(p, p + n))
    out = []
    for d, ss in enumerate(sents):
        kept = [s for i, s in enumerate(ss) if i not in removed[d]]
        out.append(
            (len(ss), sum(1 for i in removed[d] if i < len(ss)),
             " ".join(kept))
        )
    return out


TRICKY = [
    "Hello there. How are you?? Fine!",
    "",
    None,
    "no terminal punctuation at all",
    "a.b.c",
    "  leading ws. trailing ws  ",
    "multi\nline. second sentence",
    "...",
    "!?.!",
    "ends mid. ",
    "\t\n . \n\t",
    "unicode café. über? schön!",
    "…ellipsis char is not ascii. ok",
    "dots..then!!bangs??then tail",
    " . x",
    "x .",
    "\x0bvertical tab is NOT RE2-ws.\x0bok\x0b",
]


class TestSegmentation:
    def test_tricky_vs_duckdb(self):
        got = split_sentences(pa.array(TRICKY, pa.string())).to_pylist()
        assert got == _oracle_sents(TRICKY)

    def test_randomized_vs_duckdb(self):
        rng = np.random.default_rng(7)
        alphabet = list("ab .!?\n\t\r\f\x0bé…。")
        rows = [
            "".join(rng.choice(alphabet, size=rng.integers(0, 60)))
            for _ in range(300)
        ]
        got = split_sentences(pa.array(rows, pa.string())).to_pylist()
        assert got == _oracle_sents(rows)

    def test_large_string_input(self):
        arr = pa.array(TRICKY, pa.large_string()).cast(pa.string())
        # chunked input with a large tail pushing past small offsets
        big = pa.chunked_array([arr, pa.array(["x. " * 500], pa.string())])
        got = split_sentences(big).to_pylist()
        assert got == _oracle_sents(TRICKY + ["x. " * 500])

    def test_empty_batch(self):
        assert split_sentences(pa.array([], pa.string())).to_pylist() == []


class TestSpanRows:
    def test_rows_and_ordinals(self):
        rows = ["s1. s2. s3. s4.", "only one.", "a. b. c."]
        t = pa.table(
            {"doc_id": pa.array([10, 11, 12], pa.int64()),
             "text": pa.array(rows, pa.string())}
        )
        out = SentenceSpanRows(3)(t)
        # doc 10 has 4 sentences -> spans at pos 0,1; doc 12 -> pos 0
        got = sorted(
            zip(out["doc_id"].to_pylist(), out["pos"].to_pylist())
        )
        assert got == [(10, 0), (10, 1), (12, 0)]

    def test_no_cross_doc_spans(self):
        t = pa.table(
            {"doc_id": pa.array([1, 2], pa.int64()),
             "text": pa.array(["a. b.", "c. d."], pa.string())}
        )
        assert SentenceSpanRows(3)(t).num_rows == 0


class TestC4Dedup:
    def _run(self, rows, n=3):
        ds = ray.data.from_arrow(
            pa.table(
                {"doc_id": pa.array(range(len(rows)), pa.int64()),
                 "text": pa.array(rows, pa.string())}
            )
        )
        out = c4_sentence_dedup(ds, n=n).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        return list(
            zip(out["n_sentences"], out["n_removed"], out["clean_text"])
        )

    def test_planted_triplet_keeps_first(self, ray_session):
        span = "Alpha one. Beta two! Gamma three?"
        rows = [
            f"Intro. {span} Outro.",
            f"{span} Different tail.",
            "Unrelated. Doc here. Totally fine.",
            f"Lead in sentence. {span}",
        ]
        got = self._run(rows)
        want = _brute_c4(rows)
        assert [(int(a), int(b), c) for a, b, c in got] == want
        # first occurrence (doc 0) keeps the span, others lose it
        assert "Alpha one." in got[0][2]
        assert "Alpha one." not in got[1][2]
        assert "Alpha one." not in got[3][2]

    def test_no_duplicates_passthrough(self, ray_session):
        rows = [f"Doc {i} first. Doc {i} second. Doc {i} third." for i in range(8)]
        got = self._run(rows)
        want = _brute_c4(rows)
        assert [(int(a), int(b), c) for a, b, c in got] == want
        assert all(b == 0 for _, b, _ in got)

    def test_randomized_vs_brute(self, ray_session):
        rng = np.random.default_rng(42)
        pool = [f"Sentence {i}." for i in range(12)]
        rows = [
            " ".join(rng.choice(pool, size=rng.integers(0, 9)))
            for _ in range(60)
        ]
        got = self._run(rows)
        want = _brute_c4(rows)
        assert [(int(a), int(b), c) for a, b, c in got] == want

    def test_overlapping_removed_spans(self, ray_session):
        # two dup spans sharing sentences in the same doc: ordinal
        # union, not double-count
        rows = [
            "A one. B two. C three. D four.",
            "A one. B two. C three. X tail.",
            "Y head. B two. C three. D four.",
        ]
        got = self._run(rows)
        want = _brute_c4(rows)
        assert [(int(a), int(b), c) for a, b, c in got] == want

    def test_empty_and_null_docs(self, ray_session):
        rows = ["", None, "One. Two. Three.", ""]
        got = self._run(rows)
        want = _brute_c4(rows)
        assert [(int(a), int(b), c) for a, b, c in got] == want


class TestScrubStage:
    def test_spans_column_alignment(self):
        # direct kernel test: remove ordinals {1} from doc 0 only
        spans = pa.array(
            [np.array([1], "<i8").tobytes(), None], pa.binary()
        )
        batch = pa.table(
            {"doc_id": pa.array([5, 6], pa.int64()),
             "text": pa.array(["K0. R1. K2.", "A. B."], pa.string()),
             "spans": spans}
        )
        out = C4SentenceScrub("text", "doc_id")(batch)
        assert out["clean_text"].to_pylist() == ["K0. K2.", "A. B."]
        assert out["n_removed"].to_pylist() == [1, 0]
        assert out["n_sentences"].to_pylist() == [3, 2]

    def test_out_of_range_ordinals_ignored(self):
        spans = pa.array([np.array([7], "<i8").tobytes()], pa.binary())
        batch = pa.table(
            {"doc_id": pa.array([1], pa.int64()),
             "text": pa.array(["A. B."], pa.string()),
             "spans": spans}
        )
        out = C4SentenceScrub("text", "doc_id")(batch)
        assert out["clean_text"].to_pylist() == ["A. B."]
        assert out["n_removed"].to_pylist() == [0]


class TestSegmentationProperties:
    def test_property_vs_duckdb(self):
        """Hypothesis: segmentation is byte-exact with the oracle regex
        on arbitrary short strings over a punctuation-heavy alphabet."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        alphabet = "ab .!?\n\t\r\f\x0bé…。\"'"

        @settings(max_examples=150, deadline=None)
        @given(st.lists(st.text(alphabet=alphabet, max_size=40),
                        max_size=12))
        def run(rows):
            got = split_sentences(
                pa.array(rows, pa.string())
            ).to_pylist()
            assert got == _oracle_sents(rows)

        run()
