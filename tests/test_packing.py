"""Sequence packing: span-layout invariants + pure-Python oracle.

The SQL twin (`pack_sequences`) runs in the driver gate; here we check
the structural invariants that make the layout usable for training
batch assembly, and that the bucketed distributed prefix sum is
invariant to bucket size.
"""

import numpy as np
import pyarrow as pa
import ray.data

from fdblucene_ray.analysis.analyzer import BatchTokenizer
from fdblucene_ray.ops.packing import pack_sequences


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )


def _spans(texts, ids=None, seq_len=16, bucket_size=4):
    t = (
        pack_sequences(_docs(texts, ids), seq_len,
                       bucket_size=bucket_size)
        .to_pandas()
        .sort_values(["seq_id", "doc_id"])
        .reset_index(drop=True)
    )
    return t


TEXTS = [
    "alpha beta gamma delta epsilon",
    "",  # zero tokens: must emit no span
    "one two three four five six seven eight nine ten eleven twelve",
    "x " * 40,  # long doc crossing several 16-token boundaries
    "tail doc here",
]


class TestPackSequences:
    def test_matches_pure_python_oracle(self):
        got = _spans(TEXTS)
        tok = BatchTokenizer("simple")
        row_idx, _, _ = tok.encoded_tokens(pa.array(TEXTS))
        n_tok = np.bincount(row_idx, minlength=len(TEXTS))
        want = []
        off = 0
        for d, n in enumerate(n_tok):
            if n == 0:
                continue
            for s in range(off // 16, (off + n - 1) // 16 + 1):
                lo, hi = max(off, s * 16), min(off + n, s * 16 + 16)
                want.append((s, d, lo - s * 16, lo - off, hi - lo))
            off += n
        got_rows = list(
            got[["seq_id", "doc_id", "start_in_seq", "start_in_doc",
                 "n_tokens"]].itertuples(index=False, name=None)
        )
        assert got_rows == want

    def test_all_sequences_full_except_last(self):
        got = _spans(TEXTS)
        per_seq = got.groupby("seq_id")["n_tokens"].sum()
        assert (per_seq.iloc[:-1] == 16).all()
        assert 0 < per_seq.iloc[-1] <= 16

    def test_docs_fully_reconstructed(self):
        got = _spans(TEXTS)
        tok = BatchTokenizer("simple")
        row_idx, _, _ = tok.encoded_tokens(pa.array(TEXTS))
        n_tok = np.bincount(row_idx, minlength=len(TEXTS))
        for d, grp in got.groupby("doc_id"):
            grp = grp.sort_values("start_in_doc")
            assert grp["n_tokens"].sum() == n_tok[d]
            # spans tile the doc contiguously from 0
            ends = (grp["start_in_doc"] + grp["n_tokens"]).to_numpy()
            assert grp["start_in_doc"].iloc[0] == 0
            assert (grp["start_in_doc"].to_numpy()[1:] == ends[:-1]).all()

    def test_bucket_size_invariance(self):
        a = _spans(TEXTS, bucket_size=1)
        b = _spans(TEXTS, bucket_size=3)
        c = _spans(TEXTS, bucket_size=1000)
        assert a.equals(b) and b.equals(c)

    def test_non_contiguous_doc_ids(self):
        got = _spans(["a b c", "d e f g"], ids=[10, 3], seq_len=4)
        # order is doc_id order: doc 3 (4 toks) fills seq 0; doc 10
        # (3 toks) is seq 1
        rows = list(
            got[["seq_id", "doc_id", "start_in_seq", "start_in_doc",
                 "n_tokens"]].itertuples(index=False, name=None)
        )
        assert rows == [(0, 3, 0, 0, 4), (1, 10, 0, 0, 3)]


class TestChunkDocuments:
    def test_matches_bruteforce(self, ray_session):
        from fdblucene_ray.ops.packing import chunk_documents

        rng = np.random.default_rng(11)
        texts = [
            " ".join(f"w{int(x)}" for x in rng.integers(0, 9, int(n)))
            for n in rng.integers(1, 40, 25)
        ] + [""]  # empty doc -> zero chunks
        t = pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts)}
        )
        out = (
            chunk_documents(ray.data.from_arrow(t), max_tokens=10, stride=7)
            .to_pandas().sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True)
        )
        rows = []
        for d, txt in enumerate(texts):
            toks = txt.split()
            for ci, start in enumerate(range(0, len(toks), 7)):
                w = toks[start:start + 10]
                rows.append((d, ci, start, len(w), " ".join(w)))
        assert len(out) == len(rows)
        for got, exp in zip(out.itertuples(index=False), rows):
            assert tuple(got) == exp

    def test_stride_validation(self):
        from fdblucene_ray.ops.packing import _ChunkDocs

        import pytest as _pt
        with _pt.raises(ValueError, match="stride"):
            _ChunkDocs(8, 0, "text", "doc_id")
        with _pt.raises(ValueError, match="stride"):
            _ChunkDocs(8, 9, "text", "doc_id")
