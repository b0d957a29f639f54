"""DSIR importance resampling (ops/dsir.py) vs a pure-Python oracle."""

import math
from hashlib import md5

import numpy as np
import pyarrow as pa
import ray.data

from fdblucene_ray.ops.dsir import (
    bucket_log_ratio,
    dsir_select,
    md5_bucket,
)

B = 64


def _corpus():
    # two vocabularies: target-ish docs say "alpha beta", raw says "gamma"
    rows = []
    for i in range(120):
        if i % 3 == 0:
            rows.append((i, "alpha beta alpha", "tgt"))
        elif i % 3 == 1:
            rows.append((i, "gamma delta gamma gamma", "other"))
        else:
            rows.append((i, "alpha gamma beta", "other"))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "source": pa.array([r[2] for r in rows]),
        }
    )
    return t


def _py_logratio(t: pa.Table, alpha=0.5):
    tgt = np.zeros(B)
    raw = np.zeros(B)
    for did, txt, src in zip(
        t["doc_id"].to_pylist(), t["text"].to_pylist(), t["source"].to_pylist()
    ):
        for tok in txt.split():
            b = int.from_bytes(md5(tok.encode()).digest()[:4], "big") % B
            raw[b] += 1
            if src == "tgt":
                tgt[b] += 1
    p_t = (tgt + alpha) / (tgt.sum() + alpha * B)
    p_r = (raw + alpha) / (raw.sum() + alpha * B)
    return np.log(p_t / p_r)


def test_md5_bucket_matches_reference():
    got = md5_bucket(["hello", "x"], 1024)
    assert got[0] == int(md5(b"hello").hexdigest()[:8], 16) % 1024
    assert got[1] == int(md5(b"x").hexdigest()[:8], 16) % 1024


def test_bucket_log_ratio_matches_python():
    t = _corpus()
    ds = ray.data.from_arrow(t).repartition(3)
    got = bucket_log_ratio(
        ds, target_col="source", target_val="tgt", n_buckets=B
    )
    np.testing.assert_allclose(got, _py_logratio(t), rtol=1e-12)


def test_dsir_select_matches_python_gumbel_topk():
    t = _corpus()
    lr = _py_logratio(t)
    ids = t["doc_id"].to_pylist()
    lw = {}
    for did, txt in zip(ids, t["text"].to_pylist()):
        lw[did] = sum(
            lr[int.from_bytes(md5(tok.encode()).digest()[:4], "big") % B]
            for tok in txt.split()
        )
    keys = {}
    for did in ids:
        u = (
            int.from_bytes(md5(f"s42-{did}".encode()).digest()[:4], "big") + 0.5
        ) / 4294967296.0
        keys[did] = lw[did] - math.log(-math.log(u))
    expect = sorted(sorted(ids, key=lambda d: -keys[d])[:30])

    ds = ray.data.from_arrow(t).repartition(3)
    got = dsir_select(
        ds, 30, target_col="source", target_val="tgt", n_buckets=B
    )
    assert got.column_names == ["doc_id", "logw"]
    assert got["doc_id"].to_pylist() == expect
    np.testing.assert_allclose(
        got["logw"].to_numpy(),
        [round(lw[d], 4) for d in expect],
        atol=1e-9,
    )


def test_dsir_biases_toward_target_vocabulary():
    t = _corpus()
    ds = ray.data.from_arrow(t)
    got = dsir_select(ds, 30, target_col="source", target_val="tgt", n_buckets=B)
    picked = set(got["doc_id"].to_pylist())
    # pure-target-vocab docs (i % 3 == 0) dominate the selection over
    # the gamma-heavy docs (i % 3 == 1)
    n_tgtish = sum(1 for d in picked if d % 3 == 0)
    n_gamma = sum(1 for d in picked if d % 3 == 1)
    assert n_tgtish > n_gamma
