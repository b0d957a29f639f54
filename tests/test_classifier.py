"""Hashed-feature logistic regression (ops/classifier.py) vs a dense
pure-numpy twin of the same full-batch GD."""

import numpy as np
import pyarrow as pa
import ray.data

from fdblucene_ray.analysis.analyzer import get_analyzer
from fdblucene_ray.ops.classifier import (
    score_quality,
    train_quality_classifier,
)
from fdblucene_ray.ops.hashing import hash_strings

D = 256


def _corpus():
    rows = []
    for i in range(150):
        if i % 3 == 0:
            rows.append((i, "good clean prose with facts and citations", "wiki"))
        elif i % 3 == 1:
            rows.append((i, "buy cheap pills now click here spam spam", "web"))
        else:
            rows.append((i, "mixed page facts and click here content", "web"))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "source": pa.array([r[2] for r in rows]),
        }
    )


def _dense_features(t: pa.Table):
    an = get_analyzer("simple")
    X = np.zeros((t.num_rows, D + 1))
    X[:, D] = 1.0  # bias
    for i, txt in enumerate(t["text"].to_pylist()):
        toks = an.tokens(txt)
        if not toks:
            continue
        b = (hash_strings(pa.array(toks)) % np.uint64(D)).astype(np.int64)
        cnt = np.bincount(b, minlength=D)
        X[i, :D] = cnt / len(toks)
    return X


def _dense_gd(X, y, n_iters=8, lr=2.0):
    w = np.zeros(X.shape[1])
    for _ in range(n_iters):
        p = 1.0 / (1.0 + np.exp(-X @ w))
        w = w - lr * (X.T @ (p - y)) / len(y)
    return w


def test_train_matches_dense_gd():
    t = _corpus()
    X = _dense_features(t)
    y = np.array([1.0 if s == "wiki" else 0.0 for s in t["source"].to_pylist()])
    expect = _dense_gd(X, y)
    ds = ray.data.from_arrow(t).repartition(4)
    got = train_quality_classifier(
        ds, target_col="source", target_val="wiki", n_feat=D
    )
    np.testing.assert_allclose(got, expect, atol=1e-12)


def test_scores_separate_classes():
    t = _corpus()
    ds = ray.data.from_arrow(t).repartition(4)
    w = train_quality_classifier(
        ds, target_col="source", target_val="wiki", n_feat=D
    )
    top = score_quality(ds, w, top_n=50, n_feat=D)
    assert top.column_names == ["doc_id", "score"]
    picked = top["doc_id"].to_pylist()
    # all 50 wiki docs exist; the classifier must rank them above spam
    n_wiki = sum(1 for d in picked if d % 3 == 0)
    n_spam = sum(1 for d in picked if d % 3 == 1)
    assert n_wiki == 50 and n_spam == 0


def test_score_matches_dense_probability():
    t = _corpus()
    X = _dense_features(t)
    y = np.array([1.0 if s == "wiki" else 0.0 for s in t["source"].to_pylist()])
    w = _dense_gd(X, y)
    expect = 1.0 / (1.0 + np.exp(-X @ w))
    ds = ray.data.from_arrow(t).repartition(4)
    top = score_quality(ds, w, top_n=150, n_feat=D)
    by_id = dict(zip(top["doc_id"].to_pylist(), top["score"].to_pylist()))
    for i in range(150):
        assert abs(by_id[i] - round(expect[i], 6)) < 1e-9
