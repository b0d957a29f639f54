"""Highlighting (offsets derived at hydrate time — the engine's answer
to DATA.md:54 (startOffset, endOffset)) and source-parquet hydration."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.highlight import (
    highlight_hits,
    highlight_spans,
    make_snippet,
    token_spans,
)
from fdblucene_ray.index.search import Searcher

TEXTS = [
    "Data merging is fun; the DATA pipeline merges data fast.",
    "Nothing relevant in this one at all.",
    "merge Merge MERGE",
]


class TestTokenSpans:
    def test_spans_point_into_original_text(self):
        text = TEXTS[0]
        for term, s, e in token_spans("simple", text):
            assert text[s:e].lower() == term

    def test_stopword_chain_drops_but_keeps_offsets(self):
        text = "the quick fox"
        spans = token_spans("simple_stop", text)
        assert [t for t, _, _ in spans] == ["quick", "fox"]
        assert text[spans[0][1] : spans[0][2]] == "quick"

    def test_stemmed_terms_match_surface_spans(self):
        text = "merging merges merged"
        spans = token_spans("lucene", text)
        assert {t for t, _, _ in spans} == {"merg"}
        assert [text[s:e] for _, s, e in spans] == [
            "merging", "merges", "merged"
        ]


class TestHighlight:
    def test_spans_and_snippet(self):
        text = TEXTS[0]
        spans = highlight_spans("simple", text, ["data"])
        assert [text[sp.start : sp.end].lower() for sp in spans] == [
            "data", "data", "data"
        ]
        snip = make_snippet(text, spans, window=30)
        assert "<em>Data</em>" in snip

    def test_end_to_end_with_docstore(self, tmp_path, ray_session):
        t = pa.table(
            {"text": pa.array(TEXTS, pa.string())}
        )
        src = str(tmp_path / "c.parquet")
        pq.write_table(t, src)
        ix = str(tmp_path / "ix")
        build_index(
            src, ix,
            fields={"text": {"column": "text", "analyzer": "simple"}},
            num_partitions=2, docstore_cols=["text"],
        )
        s = Searcher(ix)
        hits = highlight_hits(s, "data merge", k=3)
        assert {h["doc_id"] for h in hits} == {0, 2}  # doc 1 matches nothing
        by_doc = {h["doc_id"]: h for h in hits}
        assert "<em>" in by_doc[0]["snippet"]
        text = TEXTS[0]
        for a, b in by_doc[0]["spans"]:
            assert text[a:b].lower() in ("data", "merge")
        assert by_doc[2]["snippet"] == "<em>merge</em> <em>Merge</em> <em>MERGE</em>"


class TestHydrateFromSource:
    def test_reads_only_needed_row_groups(self, tmp_path):
        from fdblucene_ray.sources.corpus import hydrate_from_source

        t = pa.table(
            {
                "text": pa.array([f"doc {i}" for i in range(100)]),
                "n": pa.array(range(100), pa.int64()),
            }
        )
        src = str(tmp_path / "c.parquet")
        pq.write_table(t, src, row_group_size=10)
        out = hydrate_from_source(src, [3, 41, 42, 99], columns=["text", "n"])
        assert out["doc_id"].to_pylist() == [3, 41, 42, 99]
        assert out["n"].to_pylist() == [3, 41, 42, 99]
        assert out["text"].to_pylist()[0] == "doc 3"

    def test_empty_and_out_of_range(self, tmp_path):
        from fdblucene_ray.sources.corpus import hydrate_from_source

        t = pa.table({"text": pa.array(["a", "b"])})
        src = str(tmp_path / "c.parquet")
        pq.write_table(t, src)
        assert hydrate_from_source(src, []).num_rows == 0
        assert hydrate_from_source(src, [5]).num_rows == 0
