"""Property-based tests for the shuffle wire formats (index/wire.py):
roundtrip identity for arbitrary run structures under both formats."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from fdblucene_ray.index.wire import (
    pack_docs,
    pack_vals,
    unpack_docs,
    unpack_vals,
)


@st.composite
def run_structures(draw):
    """Random runs: sizes in [1, 30], ascending int64 docs per run with
    gaps up to 2**40 (exercises multi-byte varints), tf-ish values."""
    n_runs = draw(st.integers(1, 12))
    sizes = [draw(st.integers(1, 30)) for _ in range(n_runs)]
    docs = []
    for s in sizes:
        base = draw(st.integers(0, 2**48))
        gaps = [draw(st.integers(1, 2**40)) for _ in range(s - 1)]
        d = np.concatenate(([0], np.cumsum(gaps, dtype=np.int64))) + base
        docs.append(d)
    vals = [
        np.array([draw(st.integers(1, 2**20)) for _ in range(s)], np.uint64)
        for s in sizes
    ]
    return sizes, docs, vals


class TestWireRoundtrip:
    @settings(max_examples=40, deadline=None)
    @given(run_structures(), st.sampled_from(["raw", "varint"]))
    def test_roundtrip(self, runs, wire):
        sizes, docs, vals = runs
        sz = np.array(sizes, np.int64)
        starts = np.concatenate(([0], np.cumsum(sz[:-1])))
        ends = np.cumsum(sz)
        d = np.concatenate(docs).astype(np.int64)
        v = np.concatenate(vals)
        min_docs = d[starts]
        dc = pack_docs(d, starts, ends, wire)
        vc = pack_vals(v, starts, ends, wire)
        # simulate the shuffle: cells arrive in arbitrary run order
        rng = np.random.default_rng(int(sz.sum()))
        perm = rng.permutation(len(sizes))
        dstream = np.frombuffer(
            b"".join(dc[int(i)].as_py() for i in perm), np.uint8
        )
        vstream = np.frombuffer(
            b"".join(vc[int(i)].as_py() for i in perm), np.uint8
        )
        got_d = unpack_docs(dstream, sz[perm], min_docs[perm], wire)
        got_v = unpack_vals(vstream, int(sz.sum()), wire)
        exp_d = np.concatenate([docs[i] for i in perm]).astype(np.int64)
        exp_v = np.concatenate([vals[i] for i in perm])
        assert np.array_equal(got_d, exp_d)
        assert np.array_equal(got_v.astype(np.uint64), exp_v)

    def test_negative_gap_refused(self):
        import pytest

        d = np.array([5, 3], np.int64)  # descending within one run
        starts = np.array([0], np.int64)
        ends = np.array([2], np.int64)
        with pytest.raises(ValueError, match="ascending"):
            pack_docs(d, starts, ends, "varint")

    def test_run_boundary_may_go_backwards(self):
        # two runs, second starts below the first's docs: legal (the
        # delta chain resets per run)
        d = np.array([100, 200, 5, 6], np.int64)
        starts = np.array([0, 2], np.int64)
        ends = np.array([2, 4], np.int64)
        for wire in ("raw", "varint"):
            cells = pack_docs(d, starts, ends, wire)
            stream = np.frombuffer(b"".join(cells.to_pylist()), np.uint8)
            got = unpack_docs(
                stream, np.array([2, 2]), np.array([100, 5]), wire
            )
            assert np.array_equal(got, d)
