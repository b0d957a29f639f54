"""Hypothesis property tests for the round-2 pure helpers: multi-probe
LSH enumeration, sliding-window chunk arithmetic, and span-coverage
scrub math (no Ray needed)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fdblucene_ray.ops.similarity import (
    _lsh_buckets,
    _lsh_planes,
    _normalize,
    multiprobe_buckets,
)


class TestMultiProbe:
    @settings(max_examples=50, deadline=None)
    @given(
        n_bits=st.integers(2, 12),
        dim=st.integers(2, 24),
        nprobe=st.integers(1, 64),
        seed=st.integers(0, 2**20),
    )
    def test_probe_invariants(self, n_bits, dim, nprobe, seed):
        planes = _lsh_planes(n_bits, dim, seed=7)
        rng = np.random.default_rng(seed)
        q = rng.normal(size=(3, dim))
        probe = multiprobe_buckets(q, planes, nprobe)
        # ids in range, all distinct per query; base bucket comes first
        # in multi-probe mode (full-probe mode returns id order)
        assert probe.min() >= 0 and probe.max() < (1 << n_bits)
        base = _lsh_buckets(_normalize(q.astype(np.float64)), planes)
        for i in range(3):
            if nprobe < (1 << n_bits):
                assert probe[i, 0] == base[i]
            assert len(set(probe[i].tolist())) == probe.shape[1]
        # full probe covers every bucket exactly once
        full = multiprobe_buckets(q, planes, 1 << n_bits)
        assert sorted(full[0].tolist()) == list(range(1 << n_bits))

    @settings(max_examples=30, deadline=None)
    @given(n_bits=st.integers(2, 10), seed=st.integers(0, 2**20))
    def test_probe_costs_nondecreasing(self, n_bits, seed):
        """Buckets are enumerated nearest-first: total flipped margin
        never decreases along the probe sequence."""
        planes = _lsh_planes(n_bits, 8, seed=7)
        rng = np.random.default_rng(seed)
        q = rng.normal(size=(1, 8))
        qn = _normalize(q.astype(np.float64))
        proj = (qn @ planes.T)[0]
        base = int(_lsh_buckets(qn, planes)[0])
        nprobe = min(40, (1 << n_bits) - 1)  # stay in multi-probe mode
        probe = multiprobe_buckets(q, planes, nprobe)[0]
        costs = []
        for b in probe.tolist():
            flipped = b ^ base
            costs.append(
                sum(abs(proj[j]) for j in range(n_bits) if flipped >> j & 1)
            )
        assert all(a <= b + 1e-12 for a, b in zip(costs, costs[1:]))


class TestChunkMath:
    @settings(max_examples=80, deadline=None)
    @given(
        n_tok=st.integers(0, 200),
        max_tokens=st.integers(1, 50),
        data=st.data(),
    )
    def test_windows_cover_and_tile(self, n_tok, max_tokens, data):
        stride = data.draw(st.integers(1, max_tokens))
        starts = list(range(0, n_tok, stride))
        # every token covered; window sizes within bounds; chunk count
        # matches the ceil formula used vectorized in _ChunkDocs
        covered = set()
        for s in starts:
            w = min(max_tokens, n_tok - s)
            assert 1 <= w <= max_tokens
            covered |= set(range(s, s + w))
        assert covered == set(range(n_tok))
        assert len(starts) == -(-n_tok // stride)


class TestSpanCoverage:
    @settings(max_examples=80, deadline=None)
    @given(
        n_tok=st.integers(1, 120),
        n=st.integers(1, 12),
        data=st.data(),
    )
    def test_diff_cumsum_equals_interval_union(self, n_tok, n, data):
        """The scrubber's diff/cumsum coverage == naive interval union."""
        k = data.draw(st.integers(0, 8))
        starts = np.array(
            sorted(
                data.draw(
                    st.lists(
                        st.integers(0, max(0, n_tok - 1)),
                        min_size=k, max_size=k,
                    )
                )
            ),
            np.int64,
        )
        diff = np.zeros(n_tok + 1, np.int64)
        np.add.at(diff, starts, 1)
        np.add.at(diff, np.minimum(starts + n, n_tok), -1)
        covered = np.cumsum(diff[:-1]) > 0
        naive = np.zeros(n_tok, bool)
        for s in starts:
            naive[s : s + n] = True
        assert (covered == naive).all()


# ---- session-3 kernels --------------------------------------------------


@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_ppm_roundtrip_random_images(w, h, seed):
    import numpy as np

    from fdblucene_ray.ops.image import decode_ppm

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    payload = f"P6\n{w} {h}\n255\n".encode() + px.tobytes()
    out = decode_ppm(payload)
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, px)


@given(st.floats(-500, 500))
@settings(max_examples=60, deadline=None)
def test_sigmoid_stable_and_bounded(z):
    import numpy as np

    from fdblucene_ray.ops.classifier import _sigmoid

    v = _sigmoid(np.array([z]))[0]
    assert 0.0 <= v <= 1.0 and np.isfinite(v)
    # complementarity: sigma(z) + sigma(-z) == 1 (no overflow branch bias)
    v2 = _sigmoid(np.array([-z]))[0]
    assert abs(v + v2 - 1.0) < 1e-12


@given(st.lists(st.integers(0, 10**12), min_size=1, max_size=50),
       st.integers(2, 4096))
@settings(max_examples=40, deadline=None)
def test_synth_edges_in_range_and_degree_law(ids, n_docs):
    import numpy as np

    from fdblucene_ray.ops.graph import MAX_DEG, synth_out_edges

    src = np.array(ids, np.int64) % n_docs
    src_rep, dst, deg_rep = synth_out_edges(src, n_docs)
    assert (dst >= 0).all() and (dst < n_docs).all()
    assert len(dst) == (1 + src % MAX_DEG).sum()
    # per-source degree law
    assert (deg_rep == 1 + src_rep % MAX_DEG).all()


@given(
    st.lists(
        st.text(alphabet="ab _-x", min_size=0, max_size=12),
        min_size=1, max_size=8,
    )
)
@settings(max_examples=60, deadline=None)
def test_shingle_batch_equals_rowwise_property(texts):
    """Property: the vectorized shingle2 path equals the row-wise chain
    on arbitrary text (underscores, separators, empties included)."""
    import pyarrow as pa

    from fdblucene_ray.analysis.analyzer import BatchTokenizer, get_analyzer

    az = get_analyzer("shingle2")
    tk = BatchTokenizer("shingle2")
    r, c, vocab, pos = tk.encoded_tokens(pa.array(texts, pa.string()),
                                         with_positions=True)
    for i, t in enumerate(texts):
        m = r == i
        assert [vocab[j] for j in c[m]] == az.tokens(t)
        assert list(pos[m]) == az.tokens_with_positions(t)[1]


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=7),
)
@settings(max_examples=80, deadline=None)
def test_ntile_run_arithmetic_matches_spec(n, k):
    """Property: the vectorized ntile used by ppl_buckets matches the
    SQL spec (first n%k buckets get ceil(n/k) rows, buckets 1..min(n,k)
    non-empty, sizes differ by at most 1)."""
    import numpy as np

    rank = np.arange(n)
    small, nbig = n // k, n % k
    big = small + 1
    cut = nbig * big
    bucket = np.where(
        rank < cut,
        rank // max(big, 1),
        nbig + (rank - cut) // max(small, 1) if small else rank,
    ) + 1
    sizes = np.bincount(bucket)[1:]
    expect = [small + 1] * nbig + [small] * (k - nbig)
    expect = [s for s in expect if s > 0]
    assert sizes.tolist() == expect
    assert bucket.min() == 1 and bucket.max() == len(expect)
