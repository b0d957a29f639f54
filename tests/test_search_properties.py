"""Property-style randomized search tests (the reference's randomized
pattern, FDBIndexInputTest.java:111-129 — many seeded cases, one
invariant): WAND == exhaustive == oracle on random corpora, including
block-boundary and tie-heavy shapes (SURVEY.md §7 hard part (d))."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.search import Searcher
from fdblucene_ray.oracle import OracleIndex


def _random_corpus(seed: int, n_docs: int, vocab: int, max_len: int):
    rng = np.random.default_rng(seed)
    texts = []
    for _ in range(n_docs):
        ln = int(rng.integers(1, max_len))
        # zipf-ish skew so some terms have long posting lists
        words = (rng.zipf(1.3, size=ln) - 1) % vocab
        texts.append(" ".join(f"w{w}" for w in words))
    return texts


@pytest.mark.parametrize("seed,block_size", [(1, 8), (2, 8), (3, 32), (4, 128)])
def test_wand_exhaustive_oracle_identity(seed, block_size, tmp_path, ray_session):
    # small vocab + many docs => posting lists span many blocks and tie
    # scores are common (identical tf/dl combos)
    texts = _random_corpus(seed, 400, 30, 40)
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    import pyarrow.parquet as pq

    src = str(tmp_path / "c.parquet")
    pq.write_table(t, src)
    ix = str(tmp_path / "ix")
    build_index(
        src, ix,
        fields={"text": {"column": "text", "analyzer": "simple"}},
        num_partitions=5, batch_size=64, block_size=block_size,
    )
    oracle = OracleIndex("simple")
    for i, txt in enumerate(texts):
        oracle.add(i, txt)
    s = Searcher(ix)

    rng = np.random.default_rng(seed + 100)
    for _ in range(25):
        nt = int(rng.integers(1, 4))
        terms = [f"w{int(rng.integers(0, 35))}" for _ in range(nt)]
        q = " ".join(terms)
        k = int(rng.choice([1, 3, 10, 50]))
        exact = s.search(q, k, mode="exhaustive")
        wand = s.search(q, k, mode="wand")
        exp = oracle.search(q, k)
        assert wand == exact, (q, k)
        assert [d for d, _ in exact] == [d for d, _ in exp], (q, k)
        for (_, a), (_, b) in zip(exact, exp):
            assert a == pytest.approx(b, rel=1e-12)
        # AND operator
        got_and = s.search(q, k, operator="and")
        exp_and = oracle.search(q, k, operator="and")
        assert [d for d, _ in got_and] == [d for d, _ in exp_and], (q, k, "and")


def test_many_heap_sizes_with_ties(tmp_path, ray_session):
    """All docs identical -> every score ties; ranking must be doc_id asc."""
    texts = ["same words here"] * 57
    t = pa.table(
        {"doc_id": pa.array(range(57), pa.int64()), "text": pa.array(texts)}
    )
    import pyarrow.parquet as pq

    src = str(tmp_path / "t.parquet")
    pq.write_table(t, src)
    ix = str(tmp_path / "ix")
    build_index(src, ix, fields={"text": {"column": "text", "analyzer": "simple"}},
                num_partitions=3, batch_size=16, block_size=8)
    s = Searcher(ix)
    for k in [1, 5, 57, 100]:
        hits = s.search("same", k, mode="wand")
        assert [d for d, _ in hits] == list(range(min(k, 57)))
        assert hits == s.search("same", k, mode="exhaustive")


@pytest.mark.parametrize("seed,block_size", [(11, 8), (12, 32), (13, 128)])
def test_leapfrog_and_identity_and_skips(seed, block_size, tmp_path, ray_session):
    """Conjunction leapfrog == exhaustive == oracle at every block size,
    AND the decode counters prove blocks were skipped on a rare+common
    conjunction (VERDICT next #6 done-criterion)."""
    import pyarrow.parquet as pq

    texts = _random_corpus(seed, 500, 25, 40)
    # plant a rare term co-occurring with the pervasive w0
    for i in (17, 170, 340, 499):
        texts[i] = texts[i] + " w0 rareterm"
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    src = str(tmp_path / "c.parquet")
    pq.write_table(t, src)
    ix = str(tmp_path / "ix")
    build_index(
        src, ix,
        fields={"text": {"column": "text", "analyzer": "simple"}},
        num_partitions=4, batch_size=64, block_size=block_size,
    )
    oracle = OracleIndex("simple")
    for i, txt in enumerate(texts):
        oracle.add(i, txt)
    s = Searcher(ix)

    rng = np.random.default_rng(seed + 7)
    for _ in range(20):
        nt = int(rng.integers(2, 4))
        terms = [f"w{int(rng.integers(0, 30))}" for _ in range(nt)]
        q = " ".join(terms)
        k = int(rng.choice([1, 5, 20]))
        lf = s.search(q, k, operator="and", mode="wand")
        ex = s.search(q, k, operator="and", mode="exhaustive")
        assert [d for d, _ in lf] == [d for d, _ in ex], q
        for (_, a), (_, b) in zip(lf, ex):
            assert a == b  # identical accumulation order -> bit-equal
        orc = oracle.search(q, k, operator="and")
        assert [d for d, _ in lf] == [d for d, _ in orc], q

    # skip proof: rareterm AND w0 — the w0 stream must not decode all
    # its blocks when block_size is small enough to have many
    s.search("rareterm w0", 10, operator="and", mode="wand")
    stats = s.last_stats
    assert stats["total_blocks"] > 0
    if block_size == 8:  # w0 spans many blocks; leapfrog skips most
        assert stats["blocks_decoded"] < stats["total_blocks"]


def test_phrase_lazy_position_decode(tmp_path, ray_session):
    """Phrase matching decodes positions only for blocks holding
    doc-intersection candidates."""
    import pyarrow.parquet as pq

    texts = [f"filler{i} junk{i} noise{i}" for i in range(300)]
    for i in (5, 150, 299):
        texts[i] = "alpha beta " + texts[i]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    src = str(tmp_path / "c.parquet")
    pq.write_table(t, src)
    ix = str(tmp_path / "ix")
    build_index(
        src, ix,
        fields={"text": {"column": "text", "analyzer": "simple",
                         "positions": True}},
        num_partitions=3, batch_size=64, block_size=8,
    )
    s = Searcher(ix)
    assert dict(s.phrase_freqs("alpha beta")) == {5: 1, 150: 1, 299: 1}
    stats = s.last_stats
    # alpha/beta have 3 postings each -> 1 block per (term, segment);
    # all decoded position blocks must be candidate blocks (tiny)
    assert stats["pos_blocks_decoded"] <= stats["blocks_decoded"]
    assert stats["pos_blocks_decoded"] <= 4


def test_bm25f_combined_fields_matches_bruteforce(tmp_path, ray_session):
    """CombinedFieldQuery analog: weighted tf/dl combined BEFORE
    saturation == pure-Python recomputation (incl. the byte4 length
    quantization per field and exact combined avgdl)."""
    import math

    import pyarrow.parquet as pq

    from fdblucene_ray.codec.smallfloat import byte4_to_int, encode_lengths

    rng = np.random.default_rng(31)
    texts = [" ".join(f"w{int(x)}" for x in rng.integers(0, 12, int(n)))
             for n in rng.integers(3, 30, 150)]
    tags = [f"t{int(rng.integers(0, 5))} w{int(rng.integers(0, 12))}"
            for _ in range(150)]
    t = pa.table({"doc_id": pa.array(range(150), pa.int64()),
                  "text": pa.array(texts), "tag": pa.array(tags)})
    src = str(tmp_path / "c.parquet")
    pq.write_table(t, src)
    ix = str(tmp_path / "ix")
    build_index(src, ix,
                fields={"text": {"column": "text", "analyzer": "simple"},
                        "tag": {"column": "tag", "analyzer": "simple"}},
                num_partitions=4, batch_size=32)
    s = Searcher(ix)
    W = {"text": 1.0, "tag": 3.0}
    got = s.search_combined_fields("w1 t2", W, k=10)

    toks = {"text": [x.split() for x in texts], "tag": [x.split() for x in tags]}
    dc = 150
    avgdl_w = sum(
        W[f] * sum(len(r) for r in toks[f]) / dc for f in W
    )
    dlq = {
        f: [int(byte4_to_int(encode_lengths(np.array([len(r)]))[0]))
            for r in toks[f]]
        for f in W
    }
    scores: dict[int, float] = {}
    for term in ["w1", "t2"]:
        tfw = {}
        for f, w in W.items():
            for d, r in enumerate(toks[f]):
                c = r.count(term)
                if c:
                    tfw[d] = tfw.get(d, 0.0) + w * c
        if not tfw:
            continue
        # stats-only pseudo docFreq (Lucene CombinedFieldQuery): sum of
        # per-field dfs capped at maxDoc — known before any decode,
        # which is what lets the WAND mode skip blocks
        df = min(dc, sum(
            sum(1 for r in toks[f] if term in r) for f in W
        ))
        idf = math.log(1.0 + (dc - df + 0.5) / (df + 0.5))
        for d, tf in tfw.items():
            dl_w = sum(W[f] * dlq[f][d] for f in W)
            K = 1.2 * (1 - 0.75 + 0.75 * dl_w / avgdl_w)
            scores[d] = scores.get(d, 0.0) + idf * tf / (tf + K)
    exp = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:10]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, a), (_, b) in zip(got, exp):
        assert a == pytest.approx(b, rel=1e-9)
    # WAND mode: hash-identical hits to the exhaustive mode
    got_w = s.search_combined_fields("w1 t2", W, k=10, mode="wand")
    assert got_w == got


def test_classic_similarity_matches_oracle(tmp_path, ray_session):
    """ClassicSimilarity TF-IDF (pluggable-Similarity surface, U6):
    engine scores == pure-Python recomputation from oracle postings,
    using the same byte4-quantized doc length."""
    import math

    import pyarrow.parquet as pq

    from fdblucene_ray.codec.smallfloat import byte4_to_int
    from fdblucene_ray.oracle import OracleIndex

    texts = _random_corpus(23, 250, 18, 25)
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    src = str(tmp_path / "c.parquet")
    pq.write_table(t, src)
    ix = str(tmp_path / "ix")
    build_index(src, ix,
                fields={"text": {"column": "text", "analyzer": "simple"}},
                num_partitions=4, batch_size=64)
    oracle = OracleIndex("simple")
    for i, txt in enumerate(texts):
        oracle.add(i, txt)
    s = Searcher(ix)
    for q in ["w0 w3", "w1", "w2 w5 w9"]:
        got = s.search(q, 10, similarity="classic")
        terms = oracle.analyzer.tokens(q)
        exp_scores: dict[int, float] = {}
        for term in terms:
            plist = oracle.postings.get(term, [])
            if not plist:
                continue
            idf = 1.0 + math.log(oracle.dc / (len(plist) + 1.0))
            for d, tf in plist:
                dl = byte4_to_int(oracle.norm_byte[d])
                exp_scores[d] = exp_scores.get(d, 0.0) + (
                    idf * idf * math.sqrt(tf) / math.sqrt(dl)
                )
        exp = sorted(exp_scores.items(), key=lambda x: (-x[1], x[0]))[:10]
        assert [d for d, _ in got] == [d for d, _ in exp], q
        for (_, a), (_, b) in zip(got, exp):
            assert a == pytest.approx(b, rel=1e-9)


@pytest.mark.parametrize("seed", [21, 22])
def test_boolean_strategies_identical(seed, tmp_path, ray_session):
    """Cursor-based boolean (ConjunctionDISI shape) == vectorized twin
    == oracle, under random must/should/must_not combinations."""
    import pyarrow.parquet as pq

    from fdblucene_ray.oracle import OracleIndex

    texts = _random_corpus(seed, 300, 20, 30)
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    src = str(tmp_path / "c.parquet")
    pq.write_table(t, src)
    ix = str(tmp_path / "ix")
    build_index(src, ix,
                fields={"text": {"column": "text", "analyzer": "simple"}},
                num_partitions=4, batch_size=64, block_size=16)
    oracle = OracleIndex("simple")
    for i, txt in enumerate(texts):
        oracle.add(i, txt)
    s = Searcher(ix)
    rng = np.random.default_rng(seed)
    for _ in range(15):
        pool = [f"w{int(rng.integers(0, 22))}" for _ in range(5)]
        must, should, must_not = [pool[0]], pool[1:3], pool[3:4]
        filt = pool[4:] if rng.random() < 0.5 else []
        if rng.random() < 0.3:
            must = []
        kwargs = dict(must=must, should=should, must_not=must_not,
                      filter_terms=filt, k=10)
        cur = s.search_boolean(**kwargs, mode="cursors")
        vec = s.search_boolean(**kwargs, mode="vectorized")
        orc = oracle.search_boolean(must=must, should=should,
                                    must_not=must_not, filter_terms=filt,
                                    k=10)
        assert [d for d, _ in cur] == [d for d, _ in vec] == [d for d, _ in orc], kwargs
        for (_, a), (_, b), (_, c) in zip(cur, vec, orc):
            assert a == pytest.approx(c, rel=1e-12)
            assert b == pytest.approx(c, rel=1e-12)


def test_bm25f_wand_skips_blocks(tmp_path, ray_session):
    """BM25F block-max WAND: on a head term spanning many blocks, the
    rare clause drives the threshold above the head-only block bounds
    and most head blocks are NEVER decoded — while the top-k is
    hash-identical to the exhaustive combined-field evaluation."""
    import pyarrow.parquet as pq

    from fdblucene_ray.index.build import build_index
    from fdblucene_ray.index.search import Searcher

    n = 600
    texts = [f"head w{i % 50} w{(i * 7) % 50}" for i in range(n)]
    tags = ["rareterm" if i in (10, 20, 30, 40, 50) else f"t{i % 9}"
            for i in range(n)]
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "tag": pa.array(tags),
        }
    )
    src = str(tmp_path / "c.parquet")
    pq.write_table(t, src)
    ix = str(tmp_path / "ix")
    build_index(
        src, ix,
        fields={"text": {"column": "text", "analyzer": "simple"},
                "tag": {"column": "tag", "analyzer": "simple"}},
        num_partitions=2, batch_size=128, block_size=8,
    )
    s = Searcher(ix)
    W = {"text": 1.0, "tag": 2.0}
    exh = s.search_combined_fields("head rareterm", W, k=3)
    wand = s.search_combined_fields("head rareterm", W, k=3, mode="wand")
    assert wand == exh
    stats = s.last_stats
    assert stats["total_blocks"] >= 75  # 'head' df=600, block_size=8
    assert stats["blocks_decoded"] < stats["total_blocks"] // 2


@pytest.mark.parametrize("sim", ["lmd", "lmjm"])
def test_lm_similarities_match_oracle(sim, tmp_path, ray_session):
    """Language-model similarities (pluggable-Similarity surface, U6):
    engine scores == pure-Python recomputation from oracle postings —
    LM Dirichlet (mu=2000, per-term zero clamp, Lucene 8 semantics) and
    LM Jelinek-Mercer (lambda=0.1), both on the byte4-quantized dl and
    the collection model p(t|C) = ttf / sumTotalTermFreq."""
    import math

    import pyarrow.parquet as pq

    from fdblucene_ray.codec.smallfloat import byte4_to_int

    texts = _random_corpus(31, 250, 18, 25)
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    src = str(tmp_path / "c.parquet")
    pq.write_table(t, src)
    ix = str(tmp_path / "ix")
    build_index(src, ix,
                fields={"text": {"column": "text", "analyzer": "simple"}},
                num_partitions=4, batch_size=64)
    oracle = OracleIndex("simple")
    for i, txt in enumerate(texts):
        oracle.add(i, txt)
    s = Searcher(ix)
    mu, lam = 2000.0, 0.1
    for q in ["w0 w3", "w1", "w2 w5 w9"]:
        got = s.search(q, 10, similarity=sim)
        terms = list(dict.fromkeys(oracle.analyzer.tokens(q)))
        exp_scores: dict[int, float] = {}
        for term in terms:
            plist = oracle.postings.get(term, [])
            if not plist:
                continue
            ttf = sum(tf for _, tf in plist)
            p = ttf / float(oracle.sum_dl)
            for d, tf in plist:
                dl = float(byte4_to_int(oracle.norm_byte[d]))
                if sim == "lmd":
                    sc = math.log(1.0 + tf / (mu * p)) + math.log(
                        mu / (dl + mu))
                    sc = max(sc, 0.0)
                else:
                    sc = math.log(
                        1.0 + ((1.0 - lam) / lam) * (tf / dl) / p)
                exp_scores[d] = exp_scores.get(d, 0.0) + sc
        exp = sorted(exp_scores.items(), key=lambda x: (-x[1], x[0]))[:10]
        assert [d for d, _ in got] == [d for d, _ in exp], (sim, q)
        for (_, a), (_, b) in zip(got, exp):
            assert a == pytest.approx(b, rel=1e-9)


@pytest.mark.parametrize("sim", ["dfr", "boolean"])
def test_dfr_boolean_similarities_match_oracle(sim, tmp_path, ray_session):
    """DFR InL2 (Amati & van Rijsbergen; Lucene DFRSimilarity(In, L, H2))
    and BooleanSimilarity: engine scores == pure-Python recomputation
    from oracle postings — DFR on the byte4-quantized dl with exact
    avgdl; Boolean scores == count of matched query clauses."""
    import math

    import pyarrow.parquet as pq

    from fdblucene_ray.codec.smallfloat import byte4_to_int

    texts = _random_corpus(43, 250, 18, 25)
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    src = str(tmp_path / "c.parquet")
    pq.write_table(t, src)
    ix = str(tmp_path / "ix")
    build_index(src, ix,
                fields={"text": {"column": "text", "analyzer": "simple"}},
                num_partitions=4, batch_size=64)
    oracle = OracleIndex("simple")
    for i, txt in enumerate(texts):
        oracle.add(i, txt)
    s = Searcher(ix)
    ln2 = math.log(2.0)
    for q in ["w0 w3", "w1", "w2 w5 w9"]:
        got = s.search(q, 10, similarity=sim)
        terms = list(dict.fromkeys(oracle.analyzer.tokens(q)))
        exp_scores: dict[int, float] = {}
        for term in terms:
            plist = oracle.postings.get(term, [])
            if not plist:
                continue
            df = len(plist)
            w = math.log((oracle.dc + 1.0) / (df + 0.5)) / ln2
            for d, tf in plist:
                if sim == "boolean":
                    sc = 1.0
                else:
                    dl = float(byte4_to_int(oracle.norm_byte[d]))
                    tfn = tf * (math.log(1.0 + oracle.avgdl / dl) / ln2)
                    sc = w * tfn / (tfn + 1.0)
                exp_scores[d] = exp_scores.get(d, 0.0) + sc
        exp = sorted(exp_scores.items(), key=lambda x: (-x[1], x[0]))[:10]
        assert [d for d, _ in got] == [d for d, _ in exp], (sim, q)
        for (_, a), (_, b) in zip(got, exp):
            assert a == pytest.approx(b, rel=1e-9)


@pytest.mark.parametrize("score_mode", ["max", "total", "avg", "none"])
def test_block_join_matches_bruteforce(score_mode, tmp_path, ray_session):
    """ToParentBlockJoinQuery analog: parent aggregation over ALL child
    BM25 hits equals a brute-force rollup of exhaustive search results
    for every ScoreMode, for both OR and AND child queries."""
    import pyarrow.parquet as pq

    texts = _random_corpus(37, 320, 20, 30)
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    src = str(tmp_path / "c.parquet")
    pq.write_table(t, src)
    ix = str(tmp_path / "ix")
    build_index(src, ix,
                fields={"text": {"column": "text", "analyzer": "simple"}},
                num_partitions=4, batch_size=64)
    s = Searcher(ix)
    stride = 8
    for q, op in [("w0 w3", "or"), ("w1 w2", "and"), ("w5", "or")]:
        got = s.search_block_join(
            q, 10, parent_stride=stride, score_mode=score_mode,
            operator=op,
        )
        # brute force: every child hit from the engine's own full
        # search (k = corpus size), rolled up in plain Python
        child = s.search(q, 10_000, mode="exhaustive", operator=op)
        groups: dict[int, list[float]] = {}
        for d, sc in child:
            groups.setdefault(d // stride, []).append(sc)
        exp = []
        for p, scs in groups.items():
            if score_mode == "max":
                v = max(scs)
            elif score_mode == "total":
                v = sum(scs)
            elif score_mode == "avg":
                v = sum(scs) / len(scs)
            else:
                v = 1.0
            exp.append((p, v, len(scs)))
        exp.sort(key=lambda x: (-x[1], x[0]))
        exp = exp[:10]
        assert [p for p, _, _ in got] == [p for p, _, _ in exp], (q, op)
        assert [c for _, _, c in got] == [c for _, _, c in exp]
        for (_, a, _), (_, b, _) in zip(got, exp):
            assert a == pytest.approx(b, rel=1e-9)


def test_block_join_parent_of_array(tmp_path, ray_session):
    """Explicit parent_of doc-values mapping (non-contiguous blocks)."""
    import pyarrow.parquet as pq

    texts = [f"w{i % 5}" for i in range(40)]
    t = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    src = str(tmp_path / "c.parquet")
    pq.write_table(t, src)
    ix = str(tmp_path / "ix")
    build_index(src, ix,
                fields={"text": {"column": "text", "analyzer": "simple"}},
                num_partitions=2, batch_size=16)
    s = Searcher(ix)
    parent_of = np.arange(40) % 7  # interleaved parents
    got = s.search_block_join(
        "w0", 7, parent_of=parent_of, score_mode="total")
    child = dict(s.search("w0", 100, mode="exhaustive"))
    exp: dict[int, float] = {}
    cnt: dict[int, int] = {}
    for d, sc in child.items():
        p = int(parent_of[d])
        exp[p] = exp.get(p, 0.0) + sc
        cnt[p] = cnt.get(p, 0) + 1
    rows = sorted(
        ((p, v, cnt[p]) for p, v in exp.items()),
        key=lambda x: (-x[1], x[0]),
    )[:7]
    assert got == [(p, pytest.approx(v), c) for p, v, c in rows]
    with pytest.raises(ValueError):
        s.search_block_join("w0", 5)  # neither mapping given
    with pytest.raises(ValueError):
        s.search_block_join("w0", 5, parent_stride=4,
                            parent_of=parent_of)  # both given


def test_join_query_matches_bruteforce(tmp_path, ray_session):
    """JoinUtil.createJoinQuery analog (ScoreMode.None): to-side docs =
    those whose keyword join field equals any value held by a from-side
    match; brute-force recomputation over the raw table."""
    import pyarrow.parquet as pq

    rng = np.random.default_rng(53)
    n = 300
    texts = _random_corpus(53, n, 15, 20)
    srcs = [f"s{int(rng.integers(0, 12))}" for _ in range(n)]
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "src": pa.array(srcs, pa.string())})
    src_path = str(tmp_path / "c.parquet")
    pq.write_table(t, src_path)
    ix = str(tmp_path / "ix")
    build_index(src_path, ix,
                fields={"text": {"column": "text", "analyzer": "simple"},
                        "src": {"column": "src", "analyzer": "keyword"}},
                num_partitions=4, batch_size=64)
    s = Searcher(ix)
    for q in ["w0", "w7 w9"]:
        got = s.join_query(q, "src", 50, source=src_path)
        terms = set(q.split())
        from_docs = [
            i for i, txt in enumerate(texts)
            if terms & set(txt.split())
        ]
        vals = {srcs[i] for i in from_docs}
        exp = [i for i in range(n) if srcs[i] in vals][:50]
        assert [d for d, _ in got] == exp, q
        assert all(sc == 1.0 for _, sc in got)
    # cardinality guard fails loudly instead of silently truncating
    with pytest.raises(ValueError):
        s.join_query("w0", "src", 10, source=src_path, max_values=1)


def test_block_join_children_expansion(tmp_path, ray_session):
    """ToChildBlockJoinQuery analog: children of the top parents come
    back with the parent's aggregated score; tombstoned and
    beyond-maxDoc children are excluded."""
    import pyarrow.parquet as pq

    from fdblucene_ray.index.delete import delete_docs

    texts = _random_corpus(7, 21, 20, 30)  # 21 docs -> last block ragged
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    src = str(tmp_path / "c.parquet")
    pq.write_table(t, src)
    ix = str(tmp_path / "ix")
    build_index(src, ix,
                fields={"text": {"column": "text", "analyzer": "simple"}},
                num_partitions=4, batch_size=64)
    delete_docs(ix, [1])
    s = Searcher(ix)
    parents = s.search_block_join(
        "w0 w3", 3, parent_stride=8, score_mode="max"
    )
    rows = s.search_block_join_children(
        "w0 w3", 3, parent_stride=8, score_mode="max"
    )
    pmap = {p: sc for p, sc, _ in parents}
    assert rows, "expected child expansion"
    seen: dict[int, list[int]] = {}
    for p, d, sc in rows:
        assert sc == pytest.approx(pmap[p])
        assert d // 8 == p
        assert d != 1  # tombstoned child excluded
        assert d < 21  # beyond-maxDoc children excluded
        seen.setdefault(p, []).append(d)
    for p, kids in seen.items():
        expect = [d for d in range(p * 8, min((p + 1) * 8, 21)) if d != 1]
        assert kids == expect


def test_search_relaxed(tmp_path, ray_session):
    """Relaxation drops the lowest-df term until results appear; a
    query that already matches never relaxes; a fully hopeless query
    ends at one term with level = n-1."""
    import pyarrow.parquet as pq

    texts = ["alpha beta gamma", "alpha beta", "alpha delta", "beta"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    src = str(tmp_path / "c.parquet")
    pq.write_table(t, src)
    ix = str(tmp_path / "ix")
    build_index(src, ix,
                fields={"text": {"column": "text", "analyzer": "simple"}},
                num_partitions=2, batch_size=4)
    s = Searcher(ix)
    # matches as-is: no relaxation
    hits, dropped, level = s.search_relaxed("alpha beta", 10)
    assert level == 0 and dropped == [] and {d for d, _ in hits} == {0, 1}
    # one hopeless term (df 0) drops first
    hits, dropped, level = s.search_relaxed("alpha beta zzz", 10)
    assert dropped == ["zzz"] and level == 1
    assert {d for d, _ in hits} == {0, 1}
    # two rare terms drop in (df, term) order: gamma (df 1) before
    # delta? both df 1 -> 'delta' < 'gamma' lexicographically
    hits, dropped, level = s.search_relaxed("gamma delta", 10)
    assert dropped == ["delta"] and level == 1
    assert {d for d, _ in hits} == {0}
    # min_results forces deeper relaxation
    hits, dropped, level = s.search_relaxed(
        "alpha gamma", 10, min_results=3
    )
    assert dropped == ["gamma"] and level == 1
    assert {d for d, _ in hits} == {0, 1, 2}
