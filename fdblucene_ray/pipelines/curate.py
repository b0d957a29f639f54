"""Composed corpus-curation pipeline — the end-to-end "clean a web
corpus" flagship a training-data team runs before indexing/training:

    exact dedup → language filter → length/quality filter →
    benchmark decontamination → deterministic down-sampling

Every doc gets a verdict ``(doc_id, keep, reason)`` where ``reason`` is
the FIRST failing filter in the fixed precedence order (duplicate,
language, too_short, low_quality, contaminated, sampled_out) or
``keep``. The driver query `curate` has a full DuckDB SQL oracle — the
whole composition is replayed relationally and compared row-for-row.

Execution shape (100 TB):

- ONE vectorized ``map_batches`` pass computes every per-doc signal
  (content key, token/stopword counts, language marker counts,
  benchmark n-gram hits, sample hash) — text is read once and never
  leaves its block.
- ONE narrow shuffle (the exact-dedup groupby) moves ~40 bytes/doc of
  flags keyed by content hash; the winner-per-group decision and the
  verdict string are assigned inside ``map_groups``.
- The benchmark n-gram set is broadcast once via ``ray.put`` (same
  pattern as `ops/curation.py::decontaminate`).

Reference tie-in: generalizes the reference's insert-if-absent doc-id
uniqueness (FDBDirectory.java:231-247, DATA.md:17) into the corpus
hygiene layer (SURVEY.md §2.7 D3 + the round brief's training-data ops).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from fdblucene_ray.analysis.analyzer import BatchTokenizer
from fdblucene_ray.analysis.stopwords import ENGLISH_STOPWORDS
from fdblucene_ray.ops.curation import _ngram_hashes, knuth_hash32
from fdblucene_ray.ops.hashing import content_digest, hash_strings, splitmix64
from fdblucene_ray.ops.textstats import LANG_MARKERS, LANG_PRIORITY

_MOD32 = 1 << 32

REASONS = (
    "duplicate", "language", "too_short", "low_quality",
    "contaminated", "sampled_out", "keep",
)


class CurateFlags:
    """Single-pass per-doc signal extraction (stateful actor: tokenizer
    + broadcast benchmark set built once in __init__)."""

    def __init__(self, bench_ref, *, ngram: int, text_col: str, id_col: str):
        self.bench = np.asarray(ray.get(bench_ref)) if bench_ref is not None else None
        self.ngram = ngram
        self.text_col, self.id_col = text_col, id_col
        self.tokenizer = BatchTokenizer("simple")
        self.stop_arr = pa.array(sorted(ENGLISH_STOPWORDS))
        self.lang_sets = {
            lang: pa.array(sorted(ws)) for lang, ws in LANG_MARKERS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        text = batch[self.text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        # exact-dedup key: same (hash ^ mixed-len) construction as
        # ops/dedup.py::PartialDedup so both paths group identically
        h, ln = content_digest(text)
        ckey = (h ^ splitmix64(ln.astype(np.uint64))).astype(np.int64)

        row_idx, flat = self.tokenizer.flat_tokens(text)
        n_tokens = np.bincount(row_idx, minlength=n).astype(np.int64)
        is_stop = pc.is_in(flat, value_set=self.stop_arr).to_numpy(
            zero_copy_only=False
        )
        n_stop = np.bincount(row_idx[is_stop], minlength=n).astype(np.int64)

        marker = {}
        for lang in LANG_PRIORITY:
            isin = pc.is_in(flat, value_set=self.lang_sets[lang]).to_numpy(
                zero_copy_only=False
            )
            marker[lang] = np.bincount(row_idx[isin], minlength=n)
        stacked = np.stack([marker[lang] for lang in LANG_PRIORITY])
        pred = np.array(LANG_PRIORITY, dtype=object)[np.argmax(stacked, axis=0)]

        if self.bench is not None and len(self.bench):
            anchor, grams = _ngram_hashes(row_idx, hash_strings(flat), self.ngram)
            if len(grams):
                pos = np.searchsorted(self.bench, grams)
                pos[pos == len(self.bench)] = 0
                hit = self.bench[pos] == grams
                n_hits = np.bincount(anchor[hit], minlength=n).astype(np.int64)
            else:
                n_hits = np.zeros(n, np.int64)
        else:
            n_hits = np.zeros(n, np.int64)

        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "ckey": pa.array(ckey),
                "n_tokens": pa.array(n_tokens),
                "n_stop": pa.array(n_stop),
                "pred_lang": pa.array(pred.tolist(), pa.string()),
                "n_hits": pa.array(n_hits),
                "sample_h": pa.array(knuth_hash32(ids)),
            }
        )



def _curate_flags_batch(batch, *, bench_ref, ngram, text_col, id_col):
    """Task wrapper: per-worker cached CurateFlags keyed by the
    broadcast benchmark set's ObjectRef — tasks start on the warm
    worker pool instead of paying actor spin-up per query."""
    from fdblucene_ray.ops.broadcast import cached_state

    key = ("curate_flags", bench_ref.hex() if bench_ref is not None else None,
           ngram, text_col, id_col)
    st = cached_state(
        key,
        lambda: CurateFlags(
            bench_ref, ngram=ngram, text_col=text_col, id_col=id_col
        ),
    )
    return st(batch)

def _verdict_factory(lang, min_tokens, min_stop_ratio, sample_threshold):
    def verdict(group: pa.Table) -> pa.Table:
        """EVERY content group hashed into one shuffle partition judged
        in one vectorized call (ckey cardinality ~ distinct documents —
        grouping on it directly would make one Python call per doc):
        one lexsort by (ckey, doc_id) finds the content runs; the first
        row of each run is its keeper, all other filters are
        row-local."""
        ck = group["ckey"].to_numpy(zero_copy_only=False)
        ids0 = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids0, ck))
        ids = ids0[order]
        ck = ck[order]
        n = len(ids)
        n_tok = group["n_tokens"].to_numpy(zero_copy_only=False)[order]
        n_stop = group["n_stop"].to_numpy(zero_copy_only=False)[order]
        pred = np.asarray(group["pred_lang"].to_pylist(), dtype=object)[order]
        n_hits = group["n_hits"].to_numpy(zero_copy_only=False)[order]
        sample_h = group["sample_h"].to_numpy(zero_copy_only=False)[order]

        reason = np.full(n, "keep", dtype=object)
        # reverse precedence: earlier filters overwrite later ones
        reason[sample_h >= sample_threshold] = "sampled_out"
        reason[n_hits > 0] = "contaminated"
        with np.errstate(invalid="ignore"):
            low_q = (n_stop / np.maximum(n_tok, 1)) < min_stop_ratio
        reason[low_q] = "low_quality"
        reason[n_tok < min_tokens] = "too_short"
        reason[pred != lang] = "language"
        if n:
            is_dup = np.ones(n, bool)
            # sorted by (ckey, doc_id): run starts are the min-doc keepers
            is_dup[np.concatenate(([True], ck[1:] != ck[:-1]))] = False
            reason[is_dup] = "duplicate"
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "keep": pa.array((reason == "keep").astype(np.int64)),
                "reason": pa.array(reason.tolist(), pa.string()),
            }
        )

    return verdict


def curate_corpus(
    ds: ray.data.Dataset,
    benchmark_texts=None,
    *,
    lang: str = "en",
    min_tokens: int = 10,
    min_stop_ratio: float = 0.05,
    ngram: int = 3,
    sample_rate: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-doc curation verdict Dataset: (doc_id, keep, reason)."""
    from fdblucene_ray.ops.curation import benchmark_ngram_set

    bench_ref = (
        ray.put(benchmark_ngram_set(benchmark_texts, ngram))
        if benchmark_texts is not None
        else None
    )
    flags = ds.map_batches(
        _curate_flags_batch,
        fn_kwargs=dict(
            bench_ref=bench_ref, ngram=ngram, text_col=text_col, id_col=id_col
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    from fdblucene_ray.ops.hashing import part_of

    num_parts = max(16, int(ray.cluster_resources().get("CPU", 8)))

    def add_part(t: pa.Table) -> pa.Table:
        k = t["ckey"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array(part_of(k, num_parts)))

    return (
        flags.map_batches(add_part, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("part", num_partitions=num_parts)
        .map_groups(
            _verdict_factory(
                lang, min_tokens, min_stop_ratio, int(sample_rate * _MOD32)
            ),
            batch_format="pyarrow",
        )
    )


def curate_and_write(
    ds: ray.data.Dataset,
    out_dir: str,
    benchmark_texts=None,
    **kw,
) -> ray.data.Dataset:
    """Materialization variant: writes the kept docs' verdicts as
    partitioned parquet (one directory per keep flag) so a re-run can
    resume per partition; returns the verdict Dataset."""
    verdicts = curate_corpus(ds, benchmark_texts, **kw)
    verdicts.write_parquet(out_dir, partition_cols=["keep"])
    return verdicts
