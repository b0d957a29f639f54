"""Learned quality classifier: hashed-feature logistic regression.

The third leg of the standard curation triad (heuristic signals →
LM perplexity → learned classifier): train a fastText-style linear
classifier to recognize a target slice of the corpus (e.g. a trusted
source), then score every document — the CCNet / DCLM-style
"quality classifier" filter, with the model trained *inside* the
pipeline instead of imported.

Model: logistic regression over hashed unigram features (feature
hashing à la Weinberger et al. 2009), length-normalized counts in a
FIXED number of buckets + bias. Training is full-batch gradient
descent with a fixed iteration count and step — fully deterministic,
no sampling, no data-order dependence (the gradient is a sum).

Scale shape:

- Feature dimension is constant (default 2048) — model state is a few
  KB regardless of corpus vocabulary; broadcast via ``ray.put`` each
  iteration and cached per worker.
- Each iteration: one ``map_batches`` pass emits per-batch sparse
  gradient partials (bucket, g) — ≤ n_buckets rows per batch — summed
  by a tiny groupby; the driver folds only the (n_buckets+1,) vector
  and takes the step. Docs never leave the workers.
- Scoring is one vectorized pass with a per-batch local top-k; the
  global top-k sorts batches × k candidate rows.

Not SQL-expressible (iterative optimization) — pytest verifies against
a dense pure-numpy twin of the same GD.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from fdblucene_ray.ops.broadcast import cached_state
from fdblucene_ray.ops.hashing import hash_strings, round_half_away

N_FEATURES = 2048


def _doc_features(batch: pa.Table, *, analyzer: str, text_col: str, n_feat: int):
    """Per-doc sparse hashed features: (row_idx, bucket, value) of
    length-normalized unigram counts, fully vectorized (token codes →
    bucket codes via a per-unique-term hash, per-(row,bucket) counts by
    lexsort run arithmetic)."""
    from fdblucene_ray.analysis.analyzer import BatchTokenizer

    tk = cached_state(("clf_tok", analyzer), lambda: BatchTokenizer(analyzer))
    row_idx, codes, vocab = tk.encoded_tokens(batch[text_col])
    n_rows = batch.num_rows
    if len(codes) == 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.float64),
            np.zeros(n_rows, np.int64),
        )
    vocab_list = vocab.to_pylist() if hasattr(vocab, "to_pylist") else list(vocab)
    vb = (hash_strings(pa.array(vocab_list)) % np.uint64(n_feat)).astype(np.int64)
    bkt = vb[codes]
    doc_len = np.bincount(row_idx, minlength=n_rows).astype(np.int64)
    # collapse duplicate (row, bucket) pairs to counts
    key = row_idx.astype(np.int64) * n_feat + bkt
    order = np.argsort(key, kind="stable")
    ks = key[order]
    starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
    cnt = np.diff(np.concatenate((starts, [len(ks)])))
    rows = (ks[starts] // n_feat).astype(np.int64)
    cols = (ks[starts] % n_feat).astype(np.int64)
    vals = cnt / doc_len[rows]
    return rows, cols, vals, doc_len


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    e = np.exp(z[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def _scores_for_batch(batch, w, *, analyzer, text_col, n_feat) -> np.ndarray:
    rows, cols, vals, _ = _doc_features(
        batch, analyzer=analyzer, text_col=text_col, n_feat=n_feat
    )
    z = np.full(batch.num_rows, w[n_feat])  # bias
    if len(rows):
        np.add.at(z, rows, vals * w[cols])
    return z


def _grad_batch(
    batch: pa.Table, *, w_ref, analyzer, text_col, target_col, target_val, n_feat
) -> pa.Table:
    w = cached_state(("clf_w", w_ref.hex()), lambda: ray.get(w_ref))
    rows, cols, vals, _ = _doc_features(
        batch, analyzer=analyzer, text_col=text_col, n_feat=n_feat
    )
    y = (
        pa.compute.equal(batch[target_col], target_val)
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    z = np.full(batch.num_rows, w[n_feat])
    if len(rows):
        np.add.at(z, rows, vals * w[cols])
    err = _sigmoid(z) - y  # d loss / d z
    g = np.zeros(n_feat + 1)
    if len(rows):
        np.add.at(g, cols, vals * err[rows])
    g[n_feat] = err.sum()
    # ONE dense row per batch: the gradient is a fixed (n_feat+1,)
    # vector, so partials need no shuffle — they tree-fold through a
    # narrow map stage (see train_quality_classifier)
    return pa.table(
        {
            "g": pa.array([g], pa.list_(pa.float64())),
            "n": pa.array([batch.num_rows], pa.int64()),
        }
    )


def _fold_grads(batch: pa.Table) -> pa.Table:
    """Sum a batch of dense gradient partials into one row."""
    gs = batch["g"]
    if isinstance(gs, pa.ChunkedArray):
        gs = gs.combine_chunks()
    flat = gs.flatten().to_numpy(zero_copy_only=False)
    d = len(flat) // max(1, batch.num_rows)
    g = flat.reshape(batch.num_rows, d).sum(axis=0)
    n = int(pa.compute.sum(batch["n"]).as_py() or 0)
    return pa.table(
        {"g": pa.array([g], pa.list_(pa.float64())),
         "n": pa.array([n], pa.int64())}
    )


def train_quality_classifier(
    ds: ray.data.Dataset,
    *,
    target_col: str,
    target_val: str,
    analyzer: str = "simple",
    text_col: str = "text",
    n_feat: int = N_FEATURES,
    n_iters: int = 8,
    lr: float = 2.0,
) -> np.ndarray:
    """Full-batch GD logistic regression; returns (n_feat+1,) weights
    (last entry is the bias). One gradient pass per iteration; partials
    are DENSE (n_feat+1,) rows folded through a narrow map stage — no
    shuffle anywhere (the driver receives ~n_batches/128 rows; add a
    second fold level if a corpus ever produces millions of batches)."""
    w = np.zeros(n_feat + 1)
    for _ in range(n_iters):
        w_ref = ray.put(w)
        parts = ds.map_batches(
            _grad_batch,
            fn_kwargs=dict(
                w_ref=w_ref, analyzer=analyzer, text_col=text_col,
                target_col=target_col, target_val=target_val, n_feat=n_feat,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).map_batches(
            _fold_grads, batch_size=128, batch_format="pyarrow",
            zero_copy_batch=True,
        )
        g = np.zeros(n_feat + 1)
        n_docs = 0
        for r in parts.take_all():
            g += np.asarray(r["g"], np.float64)
            n_docs += int(r["n"])
        w = w - lr * g / max(1, n_docs)
    return w


def score_quality(
    ds: ray.data.Dataset,
    w: np.ndarray,
    top_n: int = 100,
    *,
    analyzer: str = "simple",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_feat: int = N_FEATURES,
) -> pa.Table:
    """Top-``top_n`` docs by classifier probability. Local top-k per
    batch, global sort over batches×k. Columns: (doc_id, score@6dp)."""
    w_ref = ray.put(np.asarray(w, np.float64))

    def score_batch(batch: pa.Table) -> pa.Table:
        wv = cached_state(("clf_w", w_ref.hex()), lambda: ray.get(w_ref))
        z = _scores_for_batch(
            batch, wv, analyzer=analyzer, text_col=text_col, n_feat=n_feat
        )
        p = _sigmoid(z)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        top = np.argsort(-p, kind="stable")[:top_n]
        return pa.table(
            {"doc_id": pa.array(ids[top]), "score": pa.array(p[top])}
        )

    cands = ds.map_batches(
        score_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    top = cands.sort("score", descending=True).limit(top_n).to_pandas()
    top = top.sort_values(["doc_id"]).reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(top["doc_id"].to_numpy(np.int64)),
            "score": pa.array(
                round_half_away(top["score"].to_numpy(np.float64), 6)
            ),
        }
    )
