"""DSIR-style data selection: hashed n-gram importance resampling.

Selects the corpus documents whose hashed unigram distribution is most
target-like — the importance-resampling data-selection method of Xie et
al., "Data Selection for Language Models via Importance Resampling"
(NeurIPS 2023): estimate target and raw feature distributions over a
FIXED number of hash buckets, weight each document by the log-likelihood
ratio of its features, and Gumbel-top-k sample by ``log w + Gumbel`` so
the selection is a true (deterministic, seeded) importance resample
rather than a hard threshold.

Scale shape:

- **Bucketed, not vocab-keyed.** Features are md5-derived buckets
  (``n_buckets`` fixed, default 1024), so the distribution estimate is a
  constant-size array regardless of corpus vocabulary — no 10^8-term
  aggregate anywhere. md5 is used (not the repo's splitmix/blake2b
  convention) because the DuckDB oracle can reproduce it exactly
  (``('0x' || substr(md5(tok), 1, 8))::UBIGINT``).
- **One histogram pass** emits per-batch partial (bucket, target_count,
  raw_count) rows — ≤ n_buckets rows per batch — summed by a tiny
  groupby; the folded (n_buckets,) log-ratio vector is broadcast via
  ``ray.put`` and cached per worker.
- **One scoring pass** computes per-doc log-weights fully vectorized
  (token codes → bucket codes → ``np.add.reduceat`` per row) and keeps a
  local top-k per batch; the global top-k sorts only batches × k
  candidate rows.

Gumbel noise is a pure function of (seed, doc_id) through md5, so every
retry/rerun — and the SQL twin — selects byte-identical documents.
"""

from __future__ import annotations

from hashlib import md5

import numpy as np
import pyarrow as pa
import ray
import ray.data

from fdblucene_ray.ops.broadcast import cached_state
from fdblucene_ray.ops.hashing import round_half_away

N_BUCKETS = 1024


def md5_bucket(strings: list[str], n_buckets: int) -> np.ndarray:
    """First-4-bytes-of-md5 bucket per string — matches DuckDB's
    ``('0x' || substr(md5(s), 1, 8))::UBIGINT % n_buckets`` exactly."""
    return np.fromiter(
        (
            int.from_bytes(md5(s.encode()).digest()[:4], "big") % n_buckets
            for s in strings
        ),
        dtype=np.int64,
        count=len(strings),
    )


def md5_uniform(doc_ids: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic per-doc Uniform(0,1) from md5(seed, doc_id) —
    reproducible in DuckDB as
    ``(('0x'||substr(md5('s{seed}-'||id),1,8))::UBIGINT + 0.5)/2^32``."""
    u = np.fromiter(
        (
            int.from_bytes(md5(f"s{seed}-{d}".encode()).digest()[:4], "big")
            for d in doc_ids
        ),
        dtype=np.float64,
        count=len(doc_ids),
    )
    return (u + 0.5) / 4294967296.0


def _gumbel_keys(doc_ids: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic per-doc Gumbel(0,1) noise from md5(seed, doc_id)."""
    return -np.log(-np.log(md5_uniform(doc_ids, seed)))


def _doc_buckets(batch: pa.Table, *, analyzer: str, text_col: str, n_buckets: int):
    """(row_idx, bucket) per token of the batch, vectorized: tokenize to
    (row, code, vocab), md5-bucket the (small) vocab once, remap codes."""
    from fdblucene_ray.analysis.analyzer import BatchTokenizer

    tk = cached_state(("dsir_tok", analyzer), lambda: BatchTokenizer(analyzer))
    row_idx, codes, vocab = tk.encoded_tokens(batch[text_col])
    if len(vocab) == 0:
        return row_idx, np.empty(0, np.int64)
    vb = md5_bucket(
        vocab.to_pylist() if hasattr(vocab, "to_pylist") else list(vocab),
        n_buckets,
    )
    return row_idx, vb[codes]


def _hist_batch(
    batch: pa.Table,
    *,
    analyzer: str,
    text_col: str,
    target_col: str,
    target_val: str,
    n_buckets: int,
) -> pa.Table:
    row_idx, bkt = _doc_buckets(
        batch, analyzer=analyzer, text_col=text_col, n_buckets=n_buckets
    )
    is_tgt = (
        pa.compute.equal(batch[target_col], target_val)
        .to_numpy(zero_copy_only=False)
        .astype(bool)
    )
    raw = np.bincount(bkt, minlength=n_buckets)
    tgt = np.bincount(bkt[is_tgt[row_idx]], minlength=n_buckets)
    nz = np.flatnonzero(raw)
    return pa.table(
        {
            "bkt": pa.array(nz.astype(np.int64)),
            "tgt_c": pa.array(tgt[nz].astype(np.int64)),
            "raw_c": pa.array(raw[nz].astype(np.int64)),
        }
    )


def bucket_log_ratio(
    ds: ray.data.Dataset,
    *,
    target_col: str,
    target_val: str,
    analyzer: str = "simple",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    alpha: float = 0.5,
) -> np.ndarray:
    """(n_buckets,) smoothed log p_target/p_raw from one corpus pass."""
    parts = ds.map_batches(
        _hist_batch,
        fn_kwargs=dict(
            analyzer=analyzer, text_col=text_col, target_col=target_col,
            target_val=target_val, n_buckets=n_buckets,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    agg = parts.groupby("bkt", num_partitions=8).sum(["tgt_c", "raw_c"]).take_all()
    tgt = np.zeros(n_buckets)
    raw = np.zeros(n_buckets)
    for r in agg:
        tgt[r["bkt"]] = r["sum(tgt_c)"]
        raw[r["bkt"]] = r["sum(raw_c)"]
    p_t = (tgt + alpha) / (tgt.sum() + alpha * n_buckets)
    p_r = (raw + alpha) / (raw.sum() + alpha * n_buckets)
    return np.log(p_t / p_r)


def _score_batch(
    batch: pa.Table,
    *,
    ratio_ref,
    analyzer: str,
    text_col: str,
    id_col: str,
    seed: int,
    k: int,
    n_buckets: int,
) -> pa.Table:
    logratio = cached_state(
        ("dsir_ratio", ratio_ref.hex() if hasattr(ratio_ref, "hex") else id(ratio_ref)),
        lambda: ray.get(ratio_ref),
    )
    row_idx, bkt = _doc_buckets(
        batch, analyzer=analyzer, text_col=text_col, n_buckets=n_buckets
    )
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    lw = np.zeros(len(ids))
    if len(bkt):
        # row_idx is sorted (tokenize preserves row order): reduceat over
        # the row-run starts, scattered back to rows that have tokens
        starts = np.flatnonzero(
            np.concatenate(([True], row_idx[1:] != row_idx[:-1]))
        )
        sums = np.add.reduceat(logratio[bkt], starts)
        lw[row_idx[starts]] = sums
    key = lw + _gumbel_keys(ids, seed)
    top = np.argsort(-key, kind="stable")[:k]
    return pa.table(
        {
            "doc_id": pa.array(ids[top]),
            "logw": pa.array(lw[top]),
            "key": pa.array(key[top]),
        }
    )


def dsir_select(
    ds: ray.data.Dataset,
    k: int,
    *,
    target_col: str,
    target_val: str,
    analyzer: str = "simple",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    alpha: float = 0.5,
    seed: int = 42,
) -> pa.Table:
    """Gumbel-top-``k`` importance resample toward the target slice.

    Columns: (doc_id, logw@4dp), ordered doc_id asc. Two corpus passes
    (histogram, score+local-top-k); only n_buckets-sized state and
    batches×k candidate rows ever leave the workers.
    """
    logratio = bucket_log_ratio(
        ds, target_col=target_col, target_val=target_val, analyzer=analyzer,
        text_col=text_col, n_buckets=n_buckets, alpha=alpha,
    )
    ratio_ref = ray.put(logratio)
    cands = ds.map_batches(
        _score_batch,
        fn_kwargs=dict(
            ratio_ref=ratio_ref, analyzer=analyzer, text_col=text_col,
            id_col=id_col, seed=seed, k=k, n_buckets=n_buckets,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    top = cands.sort("key", descending=True).limit(k).to_pandas()
    top = top.sort_values("doc_id").reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(top["doc_id"].to_numpy(np.int64)),
            "logw": pa.array(
                round_half_away(top["logw"].to_numpy(np.float64), 4)
            ),
        }
    )
