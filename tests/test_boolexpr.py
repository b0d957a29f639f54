"""Nested boolean expressions: parser + vectorized set-algebra
evaluator vs a pure-Python recursive oracle."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from fdblucene_ray.analysis.queryparser import (
    QuerySyntaxError,
    parse_boolean_expr,
)
from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.search import Searcher
from fdblucene_ray.oracle import OracleIndex


@pytest.fixture(scope="module")
def exprdex(tmp_path_factory, ray_session):
    rng = np.random.default_rng(29)
    texts = [
        " ".join(f"w{int(x)}" for x in rng.integers(0, 14, 22))
        for _ in range(250)
    ]
    t = pa.table({"doc_id": pa.array(range(250), pa.int64()),
                  "text": pa.array(texts)})
    d = tmp_path_factory.mktemp("expr")
    src = str(d / "c.parquet")
    pq.write_table(t, src)
    ix = str(d / "ix")
    build_index(src, ix,
                fields={"text": {"column": "text", "analyzer": "simple"}},
                num_partitions=4, batch_size=64)
    oracle = OracleIndex("simple")
    for i, txt in enumerate(texts):
        oracle.add(i, txt)
    return ix, oracle


def _oracle_eval(oracle: OracleIndex, node):
    """Recursive (docs->score) oracle mirroring the documented
    semantics (NOT children = parent's MUST_NOT; positives sum)."""
    from fdblucene_ray.index.search import B, K1, bm25_idf

    from fdblucene_ray.codec.smallfloat import byte4_to_int

    if node[0] == "term":
        plist = oracle.postings.get(node[2], [])
        idf = bm25_idf(oracle.dc, len(plist))
        out = {}
        for d, tf in plist:
            dl = byte4_to_int(oracle.norm_byte[d])
            K = K1 * (1 - B + B * dl / oracle.avgdl)
            out[d] = idf * tf / (tf + K)
        return out
    if node[0] == "not":
        return {}
    pos, neg = [], []
    for c in node[1]:
        while c[0] == "not" and c[1][0] == "not":
            c = c[1][1]
        (neg if c[0] == "not" else pos).append(c)
    if not pos:
        return {}
    maps = [_oracle_eval(oracle, c) for c in pos]
    if node[0] == "and":
        cand = set(maps[0])
        for m in maps[1:]:
            cand &= set(m)
    else:
        cand = set()
        for m in maps:
            cand |= set(m)
    for c in neg:
        cand -= set(_oracle_eval(oracle, c[1]))
    return {d: sum(m.get(d, 0.0) for m in maps) for d in cand}


EXPRS = [
    "(w0 OR w1) AND w2",
    "(w0 OR w1) AND w2 AND NOT w3",
    "w0 OR (w1 AND w2)",
    "w0 AND (w1 OR NOT (w2 AND w3))",  # inner purely-negative OR child
    "(w0 AND w1) OR (w2 AND w3)",
    "NOT w0",  # purely negative -> empty
    "w0 AND NOT (w1 OR w2)",
]


class TestBooleanExpr:
    @pytest.mark.parametrize("q", EXPRS)
    def test_matches_oracle(self, exprdex, q):
        ix, oracle = exprdex
        s = Searcher(ix)
        got = s.search_expr(q, k=20)
        scored = _oracle_eval(oracle, parse_boolean_expr(q))
        exp = sorted(scored.items(), key=lambda x: (-x[1], x[0]))[:20]
        assert [d for d, _ in got] == [d for d, _ in exp], q
        for (_, a), (_, b) in zip(got, exp):
            assert a == pytest.approx(b, rel=1e-12)

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_random_expressions_match_oracle(self, exprdex, seed):
        """Random expression trees (depth <= 3, AND/OR/NOT over w0-w13):
        engine == recursive oracle on ids AND scores."""
        ix, oracle = exprdex
        s = Searcher(ix)
        rng = np.random.default_rng(seed)

        def gen(depth):
            if depth == 0 or rng.random() < 0.4:
                return f"w{int(rng.integers(0, 14))}"
            op = rng.choice(["AND", "OR"])
            kids = [gen(depth - 1) for _ in range(int(rng.integers(2, 4)))]
            parts = []
            for i, kq in enumerate(kids):
                neg = "NOT " if (i > 0 and rng.random() < 0.3) else ""
                parts.append(f"{neg}({kq})")
            return f" {op} ".join(parts)

        for _ in range(12):
            q = gen(3)
            got = s.search_expr(q, k=15)
            scored = _oracle_eval(oracle, parse_boolean_expr(q))
            exp = sorted(scored.items(), key=lambda x: (-x[1], x[0]))[:15]
            assert [d for d, _ in got] == [d for d, _ in exp], q
            for (_, a), (_, b) in zip(got, exp):
                assert a == pytest.approx(b, rel=1e-12), q

    def test_multiterm_atoms_constant_score(self, exprdex):
        """Prefix/wildcard atoms inside expressions expand against the
        dictionary and score 1.0 (CONSTANT_SCORE_REWRITE inside a
        BooleanQuery), composing with scored term clauses."""
        ix, oracle = exprdex
        s = Searcher(ix)
        # w1* matches w1, w10..w13
        got = s.search_expr("w1* AND NOT w0", k=250)
        pref = {t for t in oracle.postings if t.startswith("w1")}
        exp_docs = set()
        for t in pref:
            exp_docs |= {d for d, _ in oracle.postings[t]}
        exp_docs -= {d for d, _ in oracle.postings.get("w0", [])}
        assert {d for d, _ in got} == exp_docs
        assert all(sc == 1.0 for _, sc in got)
        # combined with a scored term: constant 1.0 + bm25(w2)
        got2 = dict(s.search_expr("w1* AND w2", k=250))
        base = dict(s.search_expr("w2", k=250))
        for d, sc in got2.items():
            assert sc == pytest.approx(1.0 + base[d], rel=1e-12)

    def test_syntax_errors(self):
        for bad in ["(a AND b", "a AND", "AND a", "a b)", "()"]:
            with pytest.raises(QuerySyntaxError):
                parse_boolean_expr(bad)


class TestReviewRegressions:
    def test_fuzzy_atom_in_expression(self, exprdex):
        """expand_fuzzy rows are 3-tuples; expr atoms must unpack them."""
        ix, oracle = exprdex
        s = Searcher(ix)
        got = s.search_expr("w1~1 AND NOT w0", k=250)  # w1~1 ~ w0..w9 etc
        assert got  # must not raise, must match something
        assert all(sc >= 1.0 for _, sc in got)

    def test_keyword_default_field_percolate(self, ray_session):
        from fdblucene_ray.ops.percolate import percolate

        t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                      "tag": pa.array(["A b", "c", "A b", "d"])})
        out = percolate(
            ray.data.from_arrow(t),
            [{"must": ["A b"]}],
            analyzer="keyword",
            text_col="tag",
        ).to_pandas()
        assert set(out["doc_id"]) == {0, 2}

    def test_scrub_custom_columns(self, ray_session):
        from fdblucene_ray.ops.webtext import scrub_duplicated_spans

        dup = "a b c d e f g h i j"
        texts = [f"u{i}0 u{i}1 u{i}2 u{i}3 u{i}4 u{i}5 u{i}6 u{i}7 "
                 + (dup if i in (1, 2) else f"solo{i}")
                 for i in range(6)]
        t = pa.table({"page_id": pa.array(range(6), pa.int64()),
                      "body": pa.array(texts)})
        out = (
            scrub_duplicated_spans(
                ray.data.from_arrow(t), n=8, min_df=2,
                id_col="page_id", text_col="body")
            .to_pandas().sort_values("page_id").reset_index(drop=True)
        )
        assert list(out.columns) == ["page_id", "body", "n_removed"]
        assert out.loc[1, "n_removed"] == 10
        assert out.loc[0, "n_removed"] == 0 and out.loc[0, "body"] == texts[0]

    def test_chunk_custom_columns(self, ray_session):
        from fdblucene_ray.ops.packing import chunk_documents

        t = pa.table({"pid": pa.array([7], pa.int64()),
                      "body": pa.array(["x " * 9])})
        out = chunk_documents(
            ray.data.from_arrow(t), max_tokens=4, stride=4,
            id_col="pid", text_col="body",
        ).to_pandas()
        assert list(out.columns) == ["pid", "chunk_idx", "start_tok",
                                     "n_tokens", "body"]
        assert list(out["pid"]) == [7, 7, 7]

    def test_at_version_keeps_similarity(self, exprdex, tmp_path, ray_session):
        import pyarrow.parquet as pq_

        from fdblucene_ray.api import Index

        t = pa.table({"doc_id": pa.array(range(10), pa.int64()),
                      "text": pa.array([f"common w{i}" for i in range(10)])})
        src = str(tmp_path / "c.parquet")
        pq_.write_table(t, src)
        ix = Index.build(src, str(tmp_path / "ix"),
                         fields={"text": {"column": "text",
                                          "analyzer": "simple"}},
                         num_partitions=2)
        custom = Index(ix.index_dir, k1=2.0, b=0.3)
        snap = custom.at_version(custom.commits()[0])
        assert snap.searcher.k1 == 2.0 and snap.searcher.b == 0.3
        assert snap.search("common", 5) == custom.search("common", 5)
