"""Retrieval-quality evaluation (the trec_eval analog): per-query
MRR, precision@k, recall@k, AP@k and nDCG@k of a retrieval RUN
against graded relevance judgments (qrels).

A search engine without an evaluation loop can't be tuned; Lucene
ships this as the luceneutil/benchmark quality package (TrecJudge /
QualityBenchmark), and every relevance experiment over the reference's
Layer-C search surface (SimpleFDBDirectoryTest.java:149-158) needs it.

Scale shape: at 100 TB an eval run is millions of (qid, doc, rank)
rows against millions of qrels. Both sides shuffle ONCE on
``hash(qid) % P`` (the hashed-partition idiom — qid cardinality grows
with the eval set, so grouping on raw qid would make one Python call
per query); each partition evaluates every query hashed into it in a
single vectorized pass: an exact (qid, doc) join via per-partition
doc-code composite keys + searchsorted, then run arithmetic (lexsort,
flatnonzero run starts, bincount segment sums, minimum.reduceat) for
the per-query metrics. Nothing is per-row Python; nothing
materializes on the driver.

Metric definitions (binary relevance = rel > 0, gain = 2^rel - 1):

- ``mrr``        1 / rank of the first relevant retrieved doc (0 if none)
- ``precision``  |relevant in top-k| / k
- ``recall``     |relevant in top-k| / |qrels with rel > 0|
- ``ap``         sum over relevant positions i of (cum_rel(i) / rank_i),
                 normalized by min(R, k)  (the trec_eval AP@k form)
- ``ndcg``       DCG@k / IDCG@k with DCG = sum gain / log2(rank + 1)
- ``judged``     fraction of the top-k that has ANY judgment (pooling
                 health — rel = 0 rows in qrels are judged nonrelevant)
- ``bpref``      (1/R) * sum over relevant retrieved r of
                 (1 - min(nonrel_above(r), R) / min(N, R)) with N the
                 per-query judged-NONRELEVANT total (Buckley & Voorhees
                 2004, the incomplete-judgments metric; 1-per-term when
                 N = 0), computed over the top-k (bpref@k)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from fdblucene_ray.ops.hashing import part_of, round_half_away


def _eval_partition(group: pa.Table, k: int) -> pa.Table:
    def col(name):
        c = group[name]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        return c.to_numpy(zero_copy_only=False).astype(np.int64)

    side = col("side")  # 0 = qrel row, 1 = run row
    qid, doc, rank, rel = col("qid"), col("doc_id"), col("rank"), col("rel")

    qm = side == 0
    rm = (side == 1) & (rank >= 1) & (rank <= k)
    q_q, q_d, q_r = qid[qm], doc[qm], rel[qm]
    r_q, r_d, r_k = qid[rm], doc[rm], rank[rm]

    empty_cols = {
        "qid": pa.array([], pa.int64()),
        "n_ret": pa.array([], pa.int64()),
        "n_rel": pa.array([], pa.int64()),
        "mrr": pa.array([], pa.float64()),
        "precision": pa.array([], pa.float64()),
        "recall": pa.array([], pa.float64()),
        "ap": pa.array([], pa.float64()),
        "ndcg": pa.array([], pa.float64()),
        "judged": pa.array([], pa.float64()),
        "bpref": pa.array([], pa.float64()),
    }
    if not len(r_q):
        return pa.table(empty_cols)

    # exact (qid, doc) join: per-partition doc codes keep the composite
    # key inside int64 regardless of the global doc-id range
    ud = np.unique(np.concatenate([q_d, r_d]))
    qkey = q_q * np.int64(len(ud) + 1) + np.searchsorted(ud, q_d)
    rkey = r_q * np.int64(len(ud) + 1) + np.searchsorted(ud, r_d)
    qo = np.argsort(qkey, kind="stable")
    qkey_s, q_rel_s = qkey[qo], q_r[qo]
    pos = np.searchsorted(qkey_s, rkey)
    pos_c = np.minimum(pos, max(len(qkey_s) - 1, 0))
    hit = (qkey_s[pos_c] == rkey) if len(qkey_s) else np.zeros(len(rkey), bool)
    r_rel = np.zeros(len(rkey), np.int64)
    if len(qkey_s):
        r_rel[hit] = q_rel_s[pos_c[hit]]
    r_judged = hit

    # run rows in (qid, rank) order; run starts mark each query
    o = np.lexsort((r_k, r_q))
    r_q, r_k, r_rel = r_q[o], r_k[o], r_rel[o]
    r_judged = r_judged[o]
    starts = np.flatnonzero(np.concatenate(([True], r_q[1:] != r_q[:-1])))
    runlen = np.diff(np.concatenate((starts, [len(r_q)])))
    qidx = np.repeat(np.arange(len(starts)), runlen)
    uq = r_q[starts]

    binary = r_rel > 0
    gain = np.exp2(r_rel.astype(np.float64)) - 1.0
    dcg = np.bincount(
        qidx, weights=gain / np.log2(r_k + 1.0), minlength=len(uq)
    )
    n_hit = np.bincount(qidx, weights=binary, minlength=len(uq))
    precision = n_hit / float(k)
    # first relevant rank per query (BIG when none retrieved)
    big = np.int64(1) << 40
    masked = np.where(binary, r_k, big)
    first = np.minimum.reduceat(masked, starts)
    mrr = np.where(first < big, 1.0 / first, 0.0)
    # within-run cumulative relevant count -> AP numerator
    cum = np.cumsum(binary)
    base = cum[starts] - binary[starts]
    within = cum - np.repeat(base, runlen)
    ap_num = np.bincount(
        qidx,
        weights=np.where(binary, within / r_k.astype(np.float64), 0.0),
        minlength=len(uq),
    )

    judged_n = np.bincount(qidx, weights=r_judged, minlength=len(uq))
    judged_frac = judged_n / np.maximum(runlen, 1)
    # judged-NONrelevant rows ranked above each position (for bpref):
    # inclusive cumsum equals the exclusive count at relevant rows
    # (a relevant row is never judged-nonrelevant itself)
    jn = (r_judged & (r_rel == 0)).astype(np.int64)
    cj = np.cumsum(jn)
    base_j = cj[starts] - jn[starts]
    nonrel_above = cj - np.repeat(base_j, runlen)

    # qrels side: per-query relevant totals and ideal DCG@k
    if len(q_q):
        rel_pos = q_r > 0
        qo2 = np.lexsort((-q_r, q_q))
        g_q, g_r = q_q[qo2], q_r[qo2]
        gs = np.flatnonzero(np.concatenate(([True], g_q[1:] != g_q[:-1])))
        glen = np.diff(np.concatenate((gs, [len(g_q)])))
        gpos = np.arange(len(g_q)) - np.repeat(gs, glen)
        topk_mask = gpos < k
        ideal_gain = np.where(
            topk_mask & (g_r > 0), np.exp2(g_r.astype(np.float64)) - 1.0, 0.0
        )
        idcg_u = np.bincount(
            np.repeat(np.arange(len(gs)), glen),
            weights=ideal_gain / np.log2(gpos + 2.0),
            minlength=len(gs),
        )
        r_tot_u = np.bincount(
            np.repeat(np.arange(len(gs)), glen),
            weights=rel_pos[qo2],
            minlength=len(gs),
        )
        guq = g_q[gs]
        n_tot_u = glen.astype(np.float64)
        p2 = np.searchsorted(guq, uq)
        p2c = np.minimum(p2, len(guq) - 1)
        have = guq[p2c] == uq
        R = np.where(have, r_tot_u[p2c], 0.0)
        idcg = np.where(have, idcg_u[p2c], 0.0)
        N_nonrel = np.where(have, n_tot_u[p2c] - r_tot_u[p2c], 0.0)
    else:
        R = np.zeros(len(uq))
        idcg = np.zeros(len(uq))
        N_nonrel = np.zeros(len(uq))

    denom_ap = np.minimum(R, float(k))
    ap = np.where(denom_ap > 0, ap_num / np.maximum(denom_ap, 1.0), 0.0)
    # bpref@k (Buckley & Voorhees 2004): per relevant retrieved row,
    # 1 - min(nonrel_above, R)/min(N, R); rows of queries with N = 0
    # contribute 1 each
    R_row = R[qidx]
    N_row = N_nonrel[qidx]
    denom_b = np.minimum(np.maximum(N_row, 0.0), np.maximum(R_row, 0.0))
    term = np.where(
        denom_b > 0,
        1.0 - np.minimum(nonrel_above, R_row) / np.maximum(denom_b, 1.0),
        1.0,
    )
    bpref_num = np.bincount(
        qidx, weights=np.where(binary, term, 0.0), minlength=len(uq)
    )
    bpref = np.where(R > 0, bpref_num / np.maximum(R, 1.0), 0.0)
    recall = np.where(R > 0, n_hit / np.maximum(R, 1.0), 0.0)
    ndcg = np.where(idcg > 0, dcg / np.where(idcg > 0, idcg, 1.0), 0.0)

    def r6(a):
        return pa.array(round_half_away(a.astype(np.float64), 6))

    return pa.table(
        {
            "qid": pa.array(uq, pa.int64()),
            "n_ret": pa.array(runlen.astype(np.int64)),
            "n_rel": pa.array(R.astype(np.int64)),
            "mrr": r6(mrr),
            "precision": r6(precision),
            "recall": r6(recall),
            "ap": r6(ap),
            "ndcg": r6(ndcg),
            "judged": r6(judged_frac),
            "bpref": r6(bpref),
        }
    )


def rank_eval(
    run: ray.data.Dataset,
    qrels: ray.data.Dataset,
    *,
    k: int = 10,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Per-query retrieval metrics of ``run`` (qid, doc_id, rank;
    1-based ranks) against ``qrels`` (qid, doc_id, rel; graded ints).
    Returns one row per qid present in the run: (qid, n_ret, n_rel,
    mrr, precision, recall, ap, ndcg, judged, bpref), floats rounded
    half-away to 6 decimals. One hash(qid) shuffle; everything else is vectorized
    run arithmetic inside the partition call."""
    P = num_parts or max(16, int(ray.cluster_resources().get("CPU", 8)))

    def tag_run(t: pa.Table) -> pa.Table:
        q = t["qid"]
        if isinstance(q, pa.ChunkedArray):
            q = q.combine_chunks()
        qn = q.to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(t)
        return pa.table(
            {
                "qid": pa.array(qn),
                "doc_id": t["doc_id"].cast(pa.int64()),
                "rank": t["rank"].cast(pa.int64()),
                "rel": pa.array(np.zeros(n, np.int64)),
                "side": pa.array(np.ones(n, np.int64)),
                "part": pa.array(part_of(qn, P)),
            }
        )

    def tag_qrels(t: pa.Table) -> pa.Table:
        q = t["qid"]
        if isinstance(q, pa.ChunkedArray):
            q = q.combine_chunks()
        qn = q.to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(t)
        return pa.table(
            {
                "qid": pa.array(qn),
                "doc_id": t["doc_id"].cast(pa.int64()),
                "rank": pa.array(np.zeros(n, np.int64)),
                "rel": t["rel"].cast(pa.int64()),
                "side": pa.array(np.zeros(n, np.int64)),
                "part": pa.array(part_of(qn, P)),
            }
        )

    def eval_part(group: pa.Table) -> pa.Table:
        return _eval_partition(group, k)

    eval_part.__name__ = "eval_rank_partition"
    tagged = run.map_batches(
        tag_run, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        qrels.map_batches(tag_qrels, batch_format="pyarrow", zero_copy_batch=True)
    )
    return tagged.groupby("part", num_partitions=P).map_groups(
        eval_part, batch_format="pyarrow"
    )


def rank_eval_mean(per_query: ray.data.Dataset) -> pa.Table:
    """Macro-averaged summary of ``rank_eval`` output — one row:
    (n_queries, mrr, precision, recall, map, ndcg), the headline
    numbers a tuning loop tracks. Tiny aggregate (means over one row
    per query), computed distributed."""
    from ray.data.aggregate import Count, Mean

    row = per_query.aggregate(
        Count(),
        Mean("mrr"),
        Mean("precision"),
        Mean("recall"),
        Mean("ap"),
        Mean("ndcg"),
        Mean("judged"),
        Mean("bpref"),
    )
    vals = {
        "n_queries": int(row["count()"]),
        "mrr": row["mean(mrr)"],
        "precision": row["mean(precision)"],
        "recall": row["mean(recall)"],
        "map": row["mean(ap)"],
        "ndcg": row["mean(ndcg)"],
        "judged": row["mean(judged)"],
        "bpref": row["mean(bpref)"],
    }
    return pa.table(
        {
            "n_queries": pa.array([vals["n_queries"]], pa.int64()),
            **{
                m: pa.array(
                    round_half_away(np.array([vals[m]], np.float64), 6)
                )
                for m in (
                    "mrr", "precision", "recall", "map", "ndcg",
                    "judged", "bpref",
                )
            },
        }
    )
