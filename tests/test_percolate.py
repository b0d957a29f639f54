"""Percolator (reverse search): match sets must equal the FORWARD
boolean search over an index of the same corpus — the two sides are
duals of the same BooleanQuery semantics."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.search import Searcher
from fdblucene_ray.ops.percolate import compile_queries, percolate


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    rng = np.random.default_rng(17)
    texts = [
        " ".join(f"w{int(x)}" for x in rng.integers(0, 18, 25))
        for _ in range(200)
    ]
    t = pa.table(
        {"doc_id": pa.array(range(200), pa.int64()), "text": pa.array(texts)}
    )
    d = tmp_path_factory.mktemp("perc")
    src = str(d / "c.parquet")
    pq.write_table(t, src)
    ix = str(d / "ix")
    build_index(src, ix,
                fields={"text": {"column": "text", "analyzer": "simple",
                                 "positions": True}},
                num_partitions=4, batch_size=64)
    return t, ix


QUERIES = [
    {"must": ["w0", "w1"]},
    {"must": ["w2"], "must_not": ["w3"]},
    {"should": ["w4", "w5", "w6"]},
    {"should": ["w4", "w5", "w6"], "min_should": 2},
    {"must": ["w7"], "should": ["w8"]},  # SHOULD optional with MUST
]


class TestPercolate:
    def test_matches_forward_search(self, corpus):
        t, ix = corpus
        ds = ray.data.from_arrow(t)
        out = percolate(ds, QUERIES).to_pandas()
        s = Searcher(ix)
        for qid, q in enumerate(QUERIES):
            got = set(out[out.query_id == qid]["doc_id"])
            exp = {
                d for d, _ in s.search_boolean(
                    must=q.get("must"), should=q.get("should"),
                    must_not=q.get("must_not"),
                    min_should_match=q.get("min_should", 0),
                    k=10**6,
                )
            }
            assert got == exp, (qid, q)

    def test_phrase_clauses_match_forward_phrase_search(self, corpus):
        t, ix = corpus
        ds = ray.data.from_arrow(t)
        s = Searcher(ix)
        # pick a phrase that actually occurs: first two tokens of doc 0
        w = t["text"][0].as_py().split()[:2]
        phrase = " ".join(w)
        out = percolate(ds, [
            {"phrases": [phrase]},
            {"phrases": [phrase], "must_not": ["w9"]},
            {"phrases": [phrase], "should": ["w4"]},  # SHOULD optional
        ]).to_pandas()
        fwd = {d for d, _ in s.phrase_freqs(phrase)}
        assert fwd  # non-trivial
        assert set(out[out.query_id == 0]["doc_id"]) == fwd
        w9 = {
            d for d, _ in s.search_boolean(must=["w9"], k=10**6)
        }
        assert set(out[out.query_id == 1]["doc_id"]) == fwd - w9
        assert set(out[out.query_id == 2]["doc_id"]) == fwd

    def test_batch_vocab_gate_skips_absent_queries(self, corpus):
        """Queries whose positive terms never occur in a batch are
        skipped in O(1) (monitor-style pruning), with identical
        results."""
        from fdblucene_ray.ops.percolate import Percolator, compile_queries

        t, _ = corpus
        qs = compile_queries(
            [{"must": ["w0"]}, {"must": ["zzzabsent"]},
             {"should": ["nosuchterm", "alsomissing"]}],
            analyzer="simple",
        )
        p = Percolator(qs)
        out = p(t)
        assert p.evaluated == 1 and p.skipped == 2
        assert set(out["query_id"].to_pylist()) == {0}

    def test_compile_analyzes_clauses(self):
        c = compile_queries([{"must": ["Running DATA"]}], analyzer="lucene")
        # lucene chain: lowercase + stopword + Porter stem; clauses
        # normalize to (field, term) pairs
        assert c[0]["must"] == [("text", "data"), ("text", "run")]

    def test_multifield_clauses(self, corpus, ray_session):
        """field: prefixes route clauses to their own column/analyzer
        (keyword fields match verbatim)."""
        t, _ = corpus
        t2 = t.append_column(
            "src", pa.array([f"s{i % 3}" for i in range(t.num_rows)])
        )
        ds = ray.data.from_arrow(t2)
        out = percolate(
            ds,
            [
                {"must": ["w0", "src:s1"]},
                {"must": ["src:s2"], "must_not": ["w0"]},
            ],
            field_cols={"text": ("text", "simple"),
                        "src": ("src", "keyword")},
        ).to_pandas()
        texts = t["text"].to_pylist()
        w0 = {i for i, x in enumerate(texts) if "w0" in x.split()}
        s = [f"s{i % 3}" for i in range(len(texts))]
        exp0 = {i for i in w0 if s[i] == "s1"}
        exp1 = {i for i in range(len(texts)) if s[i] == "s2"} - w0
        assert set(out[out.query_id == 0]["doc_id"]) == exp0
        assert set(out[out.query_id == 1]["doc_id"]) == exp1

    def test_positive_clause_required(self):
        with pytest.raises(ValueError, match="positive clause"):
            compile_queries([{"must_not": ["x"]}])


def test_must_gate_skips_partial_conjunctions(corpus, ray_session):
    """A conjunction whose MUST terms aren't ALL present in the batch
    is skipped without evaluation."""
    from fdblucene_ray.ops.percolate import Percolator, compile_queries

    t, _ = corpus
    qs = compile_queries(
        [{"must": ["w0", "zzzmissing"]},       # one absent MUST -> skip
         {"must": ["w0"], "should": ["zzz2"]}],  # evaluable
        analyzer="simple",
    )
    p = Percolator(qs)
    out = p(t)
    assert p.skipped == 1 and p.evaluated == 1
    assert set(out["query_id"].to_pylist()) <= {1}


def test_per_doc_candidate_index(corpus):
    """Monitor-scale pruning: with 1k registered queries whose triggers
    are mostly RARE terms, the per-doc candidate index evaluates far
    fewer (query, doc) pairs than the exhaustive Q x n — and results
    stay identical to a brute-force per-doc check."""
    from fdblucene_ray.ops.percolate import Percolator, compile_queries

    t, _ = corpus
    # 1000 conjunctions: a common corpus term + a mostly-absent rare
    # term (only r0..r17 exist in no doc; w0..w17 are the vocabulary) —
    # the rare token is longer so the trigger heuristic picks it
    raw = [
        {"must": [f"w{i % 18}", f"rare_token_{i}"]} for i in range(900)
    ] + [
        {"must": [f"w{i % 18}"]} for i in range(100)
    ]
    qs = compile_queries(raw, analyzer="simple")
    p = Percolator(qs)
    out = p(t)
    n, Q = t.num_rows, len(raw)
    # the 900 rare-trigger queries never reach a single doc
    assert p.doc_evals_possible == n * Q
    assert p.doc_evals <= n * 100  # only the 100 common-term queries
    assert p.doc_evals < 0.2 * p.doc_evals_possible
    # match set identical to brute force
    texts = t["text"].to_pylist()
    got = set(zip(out["query_id"].to_pylist(), out["doc_id"].to_pylist()))
    exp = set()
    for qid, q in enumerate(raw):
        need = set(q["must"])
        for d, txt in enumerate(texts):
            if need <= set(txt.split()):
                exp.add((qid, d))
    assert got == exp


def test_df_based_trigger_selection(tmp_path, ray_session):
    """With corpus df stats the trigger is the TRUE rarest required
    term — here a SHORT rare token the length heuristic would never
    pick over a long common one — shrinking doc_evals; match sets are
    identical either way."""
    from fdblucene_ray.ops.percolate import (
        Percolator, compile_queries, query_term_dfs,
    )

    texts = [
        "verylongcommontoken filler" + (" zq" if i < 3 else "")
        for i in range(100)
    ]
    t = pa.table(
        {"doc_id": pa.array(range(100), pa.int64()),
         "text": pa.array(texts)}
    )
    src = str(tmp_path / "c.parquet")
    pq.write_table(t, src)
    ix = str(tmp_path / "ix")
    build_index(src, ix,
                fields={"text": {"column": "text", "analyzer": "simple"}},
                num_partitions=2)

    raw = [{"must": ["verylongcommontoken", "zq"]}]
    qs = compile_queries(raw, analyzer="simple")
    p0 = Percolator(qs)  # length heuristic -> long common trigger
    out0 = p0(t)
    assert p0.doc_evals == 100

    dfs = query_term_dfs(ix, qs)
    assert dfs[("text", "zq")] == 3
    assert dfs[("text", "verylongcommontoken")] == 100
    p1 = Percolator(qs, df_ref=dfs)  # true-rarest trigger
    out1 = p1(t)
    assert p1.doc_evals == 3
    assert out1.equals(out0)
    assert set(out1["doc_id"].to_pylist()) == {0, 1, 2}

    # e2e: percolate(df=<index dir>) resolves the map itself
    got = percolate(ray.data.from_arrow(t), raw, df=ix).to_pandas()
    assert set(got["doc_id"]) == {0, 1, 2}


def test_per_doc_trigger_restricts_rows(corpus):
    """A query triggered by a rare term is evaluated ONLY on docs
    containing that term (doc_evals counts the restriction)."""
    from fdblucene_ray.ops.percolate import Percolator, compile_queries

    t, _ = corpus
    texts = t["text"].to_pylist()
    # w17 is the rarest-ish vocabulary term; longest token wins triggers
    qs = compile_queries([{"must": ["w1", "w17"]}], analyzer="simple")
    p = Percolator(qs)
    p(t)
    n_w17 = sum(1 for txt in texts if "w17" in txt.split())
    assert p.doc_evals == n_w17 < t.num_rows


def test_save_load_roundtrip(tmp_path, corpus):
    """Monitor durability: a persisted compiled query set reloads
    tuple-identical and percolates identically."""
    from fdblucene_ray.ops.percolate import (
        Percolator, compile_queries, load_queries, save_queries,
    )

    t, _ = corpus
    qs = compile_queries(
        [
            {"must": ["data", "merge"], "min_should": 0},
            {"should": ["window", "batch"], "min_should": 2},
            {"must": ["stream"], "must_not": ["window"],
             "phrases": ["batch stream"]},
        ]
    )
    path = str(tmp_path / "monitor" / "queries.parquet")
    assert save_queries(path, qs) == 3
    back = load_queries(path)
    assert back == qs
    a = Percolator(qs)(t).to_pydict()
    b = Percolator(back)(t).to_pydict()
    assert a == b


class TestPersistedMonitorAtScale:
    """VERDICT r4 #9: a persisted 100k-query monitor round-trips
    through save_queries -> percolate(path), the compiled trigger
    index builds ONCE per worker (cached_state on the file identity —
    a second batch reuses the SAME instance, counters accumulate), and
    per-doc pruning keeps doc_evals far below Q x n."""

    def _monitor(self, tmp_path, n_q=100_000, vocab_n=5_000):
        from fdblucene_ray.ops.percolate import (
            compile_queries,
            save_queries,
        )

        rng = np.random.default_rng(31)
        a = rng.integers(0, vocab_n, n_q)
        b = rng.integers(0, vocab_n, n_q)
        raw = [
            {"must": [f"w{a[i]}", f"w{b[i]}"]} for i in range(n_q)
        ]
        compiled = compile_queries(raw)
        path = str(tmp_path / "monitor.parquet")
        assert save_queries(path, compiled) == n_q
        return raw, compiled, path

    def test_roundtrip_and_once_per_worker_load(
        self, tmp_path, ray_session
    ):
        from fdblucene_ray.ops.broadcast import cached_state
        from fdblucene_ray.ops.percolate import (
            _percolate_batch,
            load_queries,
        )

        raw, compiled, path = self._monitor(tmp_path, n_q=100_000)
        assert load_queries(path) == compiled  # tuple-identical
        rng = np.random.default_rng(5)
        docs = [
            " ".join(f"w{int(x)}" for x in rng.integers(0, 5000, 40))
            for _ in range(400)
        ]
        t = pa.table(
            {"doc_id": pa.array(range(400), pa.int64()),
             "text": pa.array(docs)}
        )
        kwargs = dict(
            queries_ref=path, analyzer="simple", text_col="text",
            id_col="doc_id", field_cols=None, df_ref=None,
        )
        out1 = _percolate_batch(t.slice(0, 200), **kwargs)
        # grab the worker-cached instance the wrapper built
        import os

        stt = os.stat(path)
        key = ("percolator", (path, stt.st_size, stt.st_mtime_ns),
               None, "simple", "text", "doc_id", None)
        p = cached_state(key, lambda: None)
        assert p is not None  # same key -> same cached Percolator
        evals_after_first = p.doc_evals
        assert p.doc_evals_possible > 0
        out2 = _percolate_batch(t.slice(200, 200), **kwargs)
        # SAME instance served batch 2: counters accumulated, no
        # second construction (a fresh build would reset them)
        assert p.doc_evals > evals_after_first
        # pruning: pairs actually evaluated << Q x n
        assert p.doc_evals < 0.02 * p.doc_evals_possible, (
            p.doc_evals, p.doc_evals_possible,
        )
        # and the persisted monitor MATCHES: spot-check some pairs
        # against direct evaluation of the raw queries
        import pandas as pd

        both = pd.concat(
            [out1.to_pandas(), out2.to_pandas()], ignore_index=True
        )
        tok_sets = [set(d.split()) for d in docs]
        hits = rng.choice(len(both), size=min(50, len(both)),
                          replace=False)
        for i in hits:
            qid, did = int(both.iloc[i].query_id), int(both.iloc[i].doc_id)
            assert all(
                w in tok_sets[did] for w in raw[qid]["must"]
            ), (qid, did)

    def test_persisted_serving_equals_inline(self, tmp_path, ray_session):
        """percolate(path) == percolate(raw dicts) on the same docs."""
        from fdblucene_ray.ops.percolate import (
            compile_queries,
            save_queries,
        )

        rng = np.random.default_rng(7)
        raw = [
            {"must": [f"w{rng.integers(0, 30)}"],
             "should": [f"w{rng.integers(0, 30)}"]}
            for _ in range(500)
        ]
        path = str(tmp_path / "m.parquet")
        save_queries(path, compile_queries(raw))
        docs = [
            " ".join(f"w{int(x)}" for x in rng.integers(0, 30, 20))
            for _ in range(150)
        ]
        t = pa.table(
            {"doc_id": pa.array(range(150), pa.int64()),
             "text": pa.array(docs)}
        )
        ds = ray.data.from_arrow(t)
        a = percolate(ds, raw).to_pandas()
        b = percolate(ds, path).to_pandas()
        ka = sorted(zip(a.query_id, a.doc_id))
        kb = sorted(zip(b.query_id, b.doc_id))
        assert ka == kb and len(ka) > 0


class TestMonitorFacade:
    def test_register_match_restart(self, tmp_path, ray_session):
        from fdblucene_ray.api import Monitor

        raw = [
            {"must": ["w1", "w2"]},
            {"should": ["w3", "w4"]},
        ]
        path = str(tmp_path / "mon.parquet")
        mon = Monitor.register(raw, path)
        docs = ["w1 w2 w9", "w3 w8", "w5 w6", "w2 w4"]
        t = pa.table(
            {"doc_id": pa.array(range(4), pa.int64()),
             "text": pa.array(docs)}
        )
        got = mon.match(ray.data.from_arrow(t)).to_pandas()
        pairs = sorted(zip(got.query_id, got.doc_id))
        assert pairs == [(0, 0), (1, 1), (1, 3)]
        # restart from the artifact alone
        mon2 = Monitor(path)
        got2 = mon2.match(ray.data.from_arrow(t)).to_pandas()
        assert sorted(zip(got2.query_id, got2.doc_id)) == pairs
        assert len(mon2.queries()) == 2
