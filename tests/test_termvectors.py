"""Term-vectors sidecar: stored offsets/payloads (DATA.md:54 analog).

Strong oracle: spans reconstructed from the STORED vectors must be
identical to re-analysis via the offset-preserving tokenizer twin
(highlight.token_spans) — same terms, same char spans, same order.
"""

import pyarrow as pa
import pytest
import ray.data

from fdblucene_ray.index.highlight import highlight_spans, token_spans
from fdblucene_ray.index.termvectors import (
    build_term_vectors,
    highlight_from_vectors,
    read_term_vector,
    spans_from_vector,
)

CORPUS = [
    "The quick brown fox jumps over the lazy dog",
    "Stemming stems stemmed stemmer; the dog jumped!",
    "",
    "punctuation... and-hyphens under_scores 123 mix3d",
    "repeat repeat repeat the repeat",
]


def _corpus_ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(CORPUS)), pa.int64()),
                "text": pa.array(CORPUS, pa.string()),
            }
        )
    )


@pytest.fixture(scope="module")
def tv_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tv") / "termvectors")
    build_term_vectors(_corpus_ds(), d, analyzer="lucene")
    return d


class TestTermVectors:
    def test_spans_identical_to_reanalysis(self, tv_dir):
        for doc_id, text in enumerate(CORPUS):
            tv = read_term_vector(tv_dir, doc_id)
            stored = [(s.term, s.start, s.end) for s in spans_from_vector(tv)]
            assert stored == token_spans("lucene", text), doc_id

    def test_highlight_path_matches_reanalysis_highlighter(self, tv_dir):
        terms = ["dog", "repeat", "stem"]
        for doc_id, text in enumerate(CORPUS):
            from_tv = [
                (s.start, s.end, s.term)
                for s in highlight_from_vectors(tv_dir, doc_id, terms)
            ]
            from_text = [
                (s.start, s.end, s.term)
                for s in highlight_spans("lucene", text, terms)
            ]
            assert from_tv == from_text, doc_id

    def test_term_filter_pushdown(self, tv_dir):
        tv = read_term_vector(tv_dir, 4, terms=["repeat"])
        assert tv.num_rows == 1
        row = tv.to_pylist()[0]
        assert row["positions"] == [0, 1, 2, 3]  # 'the' removed, gap-free
        # offsets point at the actual occurrences in the original text
        for s, e in zip(row["starts"], row["ends"]):
            assert CORPUS[4][s:e].lower() == "repeat"

    def test_payloads_roundtrip(self, ray_session, tmp_path):
        d = str(tmp_path / "tv_pay")
        build_term_vectors(
            _corpus_ds(),
            d,
            analyzer="lucene",
            payload_fn=lambda term, pos: bytes([len(term) % 256, pos % 256]),
        )
        tv = read_term_vector(d, 1)
        assert "payloads" in tv.schema.names
        for row in tv.to_pylist():
            for pos, pay in zip(row["positions"], row["payloads"]):
                assert pay == bytes([len(row["term"]) % 256, pos % 256])

    def test_build_index_integration(self, ray_session, tmp_path, sf_dir):
        import os

        from fdblucene_ray.index.build import build_index

        ix = str(tmp_path / "ix_tv")
        build_index(
            os.path.join(sf_dir, "documents.parquet"),
            ix,
            fields={"text": {"column": "text", "analyzer": "simple"}},
            num_partitions=4,
            term_vectors=True,
        )
        tvd = os.path.join(ix, "termvectors")
        assert os.path.isdir(tvd)
        tv = read_term_vector(tvd, 0)
        assert tv.num_rows > 0
        import pyarrow.parquet as pq

        text = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["text"]
        )["text"][0].as_py()
        stored = [(s.term, s.start, s.end) for s in spans_from_vector(tv)]
        assert stored == token_spans("simple", text)


class TestPayloadScore:
    def test_payload_score_matches_bruteforce(self, ray_session, tmp_path):
        """PayloadScoreQuery analog: avg/max/sum of decoded per-position
        payloads equals a per-doc brute-force recomputation."""
        import struct

        import numpy as np
        import pyarrow.parquet as pq

        from fdblucene_ray.index.termvectors import (
            build_term_vectors,
            payload_score,
        )

        texts = [
            "data merge data window",
            "merge stream",
            "data",
            "window data data data",
        ]
        t = pa.table(
            {"doc_id": pa.array(range(4), pa.int64()),
             "text": pa.array(texts)}
        )
        src = str(tmp_path / "c.parquet")
        pq.write_table(t, src)
        tv = str(tmp_path / "tv")
        build_term_vectors(
            src, tv, analyzer="simple",
            payload_fn=lambda term, pos: struct.pack(
                "<f", float(len(term) + pos)
            ),
        )
        for agg, fn in [("avg", np.mean), ("max", np.max), ("sum", np.sum)]:
            got = payload_score(tv, "data", agg=agg)
            exp = {}
            for d, txt in enumerate(texts):
                vals = [4.0 + p for p, w in enumerate(txt.split())
                        if w == "data"]
                if vals:
                    exp[d] = float(fn(vals))
            rows = sorted(exp.items(), key=lambda x: (-x[1], x[0]))
            assert got["doc_id"].to_pylist() == [d for d, _ in rows], agg
            assert got["score"].to_pylist() == [s for _, s in rows], agg

    def test_payload_score_candidate_restriction(self, ray_session, tmp_path):
        import struct

        import pyarrow.parquet as pq

        from fdblucene_ray.index.termvectors import (
            build_term_vectors,
            payload_score,
        )

        t = pa.table(
            {"doc_id": pa.array(range(3), pa.int64()),
             "text": pa.array(["data x", "data y", "data z"])}
        )
        src = str(tmp_path / "c.parquet")
        pq.write_table(t, src)
        tv = str(tmp_path / "tv")
        build_term_vectors(
            src, tv, analyzer="simple",
            payload_fn=lambda term, pos: struct.pack("<f", 1.0),
        )
        got = payload_score(tv, "data", doc_ids=[0, 2])
        assert got["doc_id"].to_pylist() == [0, 2]

    def test_payload_score_requires_payloads(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from fdblucene_ray.index.termvectors import (
            build_term_vectors,
            payload_score,
        )

        t = pa.table(
            {"doc_id": pa.array([0], pa.int64()),
             "text": pa.array(["data"])}
        )
        src = str(tmp_path / "c.parquet")
        pq.write_table(t, src)
        tv = str(tmp_path / "tv")
        build_term_vectors(src, tv, analyzer="simple")
        with pytest.raises(ValueError, match="no payloads"):
            payload_score(tv, "data")
