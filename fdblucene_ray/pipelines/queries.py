"""Query registry: every operator exposed as a ``(sf_dir) -> result``
callable plus (where expressible) an ANSI-SQL DuckDB oracle that the
driver runs side-by-side (CORRECTNESS gate).

Column names match between the Ray result and the SQL exactly; every
float that crosses the comparison is rounded to a fixed number of
decimals ON BOTH SIDES, and the SQL mirrors the engine's floating-point
expression shapes (e.g. ``dl / (sttf/dc)``, not ``dl*dc/sttf``) so the
doubles agree bit-for-bit wherever the math is shared.

Queries whose semantics are not SQL-expressible (Porter-stemmed BM25
with WAND, minhash-LSH, simhash, winnowing, IVF) are registered without
an oracle — the driver records a rows-only check and pytest holds the
strong oracle (fdblucene_ray.oracle / planted-duplicate corpora).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import ray.data

from fdblucene_ray.analysis.stopwords import ENGLISH_STOPWORDS
from fdblucene_ray.codec.smallfloat import DECODE_TABLE
from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.search import Searcher

CACHE_ROOT = "/tmp/fdblucene_ray_cache"

# ---------------------------------------------------------------- helpers


def _docs_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def _docs_ds(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(_docs_path(sf_dir), columns=columns)


def _index_dir(sf_dir: str, flavor: str) -> str:
    # v3: manifests retain commit points (commits/manifest_N.json);
    # keying the cache by format version keeps stale layouts from being
    # reused where new features (purge, point-in-time reads) need them
    key = hashlib.sha1(f"{sf_dir}:{flavor}:v3".encode()).hexdigest()[:12]
    return os.path.join(CACHE_ROOT, f"ix-{flavor}-{key}")


def _ensure_index(sf_dir: str, flavor: str) -> str:
    """Build (or reuse via the signature checkpoint) the documents index."""
    ix = _index_dir(sf_dir, flavor)
    if flavor == "simple":
        fields = {"text": {"column": "text", "analyzer": "simple", "positions": True},
                  "source": {"column": "source", "analyzer": "keyword"}}
    elif flavor == "mf":
        # multi-field flavor: both columns ANALYZED so a query expands
        # across fields (MultiFieldQueryParser analog)
        fields = {"text": {"column": "text", "analyzer": "simple"},
                  "source": {"column": "source", "analyzer": "simple"}}
    elif flavor == "mv":
        # multi-valued flavor: text split into sentence values indexed
        # under ONE field with a positionIncrementGap, so phrase/near
        # queries never match across values (Lucene TextField semantics)
        fields = {"text": {"column": "sentences", "analyzer": "simple",
                           "positions": True, "multi": True}}
        build_index(
            _docs_path(sf_dir), ix, fields=fields, num_partitions=16,
            batch_size=2048, preprocess=_add_sentences,
            read_columns=["text"],
        )
        return ix
    elif flavor == "tri":
        # char-trigram flavor (NGramTokenizer pattern): a derived
        # space-joined unique-trigram signature column indexed as an
        # ordinary simple-analyzer field — substring queries intersect
        # trigram postings then verify (Searcher.search_substring)
        from fdblucene_ray.analysis.trigram import add_trigram_column

        fields = {"tri": {"column": "trigrams", "analyzer": "simple"}}
        build_index(
            _docs_path(sf_dir), ix, fields=fields, num_partitions=16,
            batch_size=2048, preprocess=add_trigram_column,
            read_columns=["text"],
        )
        return ix
    elif flavor == "sh2":
        # word-bigram flavor (ShingleFilter analog): terms are adjacent
        # lowercased word pairs joined by '_'; norms/avgdl count emitted
        # shingles (Lucene counts the emitted token stream)
        fields = {"text": {"column": "text", "analyzer": "shingle2"}}
    elif flavor == "forblock":
        # same logical index as "simple" but at rest under the
        # for-block (PForDelta-family bit-packed) codec — proves the
        # codec SPI end-to-end through the driver gate (U3)
        fields = {"text": {"column": "text", "analyzer": "simple",
                           "positions": True}}
        build_index(
            _docs_path(sf_dir), ix, fields=fields, num_partitions=16,
            batch_size=2048, codec="for-block",
        )
        return ix
    else:
        fields = {"text": {"column": "text", "analyzer": "lucene"}}
    build_index(
        _docs_path(sf_dir), ix, fields=fields, num_partitions=16, batch_size=2048
    )
    return ix


def _add_sentences(batch: pa.Table) -> pa.Table:
    """Derive the multi-valued column: text split on '.' (the SQL twin
    is regexp_split_to_array(text, chr(46)))."""
    import pyarrow.compute as pc

    col = batch["text"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return batch.append_column("sentences", pc.split_pattern(col, "."))


def _round_col(arr: np.ndarray, nd: int) -> pa.Array:
    from fdblucene_ray.ops.hashing import round_half_away

    # half-away ties match DuckDB round(); np.round is half-even
    return pa.array(round_half_away(arr, nd).astype(np.float64))


# shared SQL fragments ---------------------------------------------------

_STOPLIST_SQL = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOPWORDS))

TOKS_CTE = (
    "toks AS (SELECT doc_id, tok FROM ("
    "SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^0-9a-z_]+')) AS tok "
    "FROM documents) WHERE tok <> '')"
)
DL_CTE = "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id)"
STATS_CTE = (
    "stats AS (SELECT count(*)::DOUBLE AS dc, sum(dl)::DOUBLE AS sttf FROM dl)"
)
NORMVALS_CTE = "normvals(v) AS (VALUES " + ", ".join(
    f"({int(v)})" for v in DECODE_TABLE
) + ")"
# lossy norm: largest representable value <= dl (SmallFloat floor semantics)
DLQ_CTE = (
    "dlq AS (SELECT d.doc_id, max(v) AS dlq FROM dl d "
    "JOIN normvals ON v <= d.dl GROUP BY d.doc_id)"
)


def _bm25_sql(
    terms: list[str],
    operator: str = "or",
    k: int = 10,
    *,
    corpus_where: str = "",
    exclude_where: str = "",
) -> str:
    """BM25 top-k SQL twin. ``corpus_where``: restrict the corpus the
    STATS are computed over (purged-index semantics). ``exclude_where``:
    filter matches AFTER scoring with full-corpus stats (tombstone /
    liveDocs semantics — Lucene keeps docCount/df until purge)."""
    term_list = ", ".join(f"'{t}'" for t in terms)
    having = f"HAVING count(*) = {len(terms)}" if operator == "and" else ""
    toks_cte = (
        "toks AS (SELECT doc_id, tok FROM ("
        "SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^0-9a-z_]+')) AS tok "
        f"FROM documents {corpus_where}) WHERE tok <> '')"
    )
    final_where = f"WHERE {exclude_where}" if exclude_where else ""
    return f"""
WITH {toks_cte}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ({term_list}) GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf
  JOIN dfx ON dfx.tok = tf.tok
  JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats
),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id {having})
SELECT doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM scored {final_where} ORDER BY score DESC, doc_id LIMIT {k}
"""


def _mmr_sql(
    terms: list[str], n_cand: int = 50, k: int = 10, lam: float = 0.7
) -> str:
    """SQL twin of BM25 top-``n_cand`` + greedy MMR re-rank
    (ops/hybrid.mmr_rerank). The greedy loop is DETERMINISTIC
    arithmetic with a fixed iteration count, so it unrolls into ``k``
    chained CTE stages: stage j picks argmax of
    lam*rel - (1-lam)*max_sim (ties score desc then doc asc) among
    unpicked candidates, then folds the pick's cosine row into the
    running per-candidate max. Reported score = the max-sim each pick
    saw AT selection time (0.0 for the first pick), like the engine."""
    term_list = ", ".join(f"'{t}'" for t in terms)
    mu = 1.0 - lam
    toks_cte = (
        "toks AS (SELECT doc_id, tok FROM ("
        "SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^0-9a-z_]+')) AS tok "
        "FROM documents) WHERE tok <> '')"
    )
    stages = []
    picks = [
        f"SELECT 0 AS rnk, ce.doc_id, {lam} * ce.rel - {mu} * 0.0 AS score "
        "FROM s1 JOIN ce ON ce.doc_id = s1.doc_id"
    ]
    excl = "SELECT doc_id FROM s1"
    stages.append(
        f"s1 AS MATERIALIZED (SELECT doc_id FROM ce ORDER BY {lam} * rel DESC, doc_id LIMIT 1)"
    )
    stages.append(
        "m1 AS MATERIALIZED (SELECT ce.doc_id, sim.s AS ms FROM ce "
        "JOIN sim ON sim.da = ce.doc_id "
        "AND sim.db = (SELECT doc_id FROM s1))"
    )
    for j in range(2, k + 1):
        prev_m = f"m{j - 1}"
        stages.append(
            f"s{j} AS MATERIALIZED (SELECT m.doc_id FROM {prev_m} m "
            "JOIN ce ON ce.doc_id = m.doc_id "
            f"WHERE m.doc_id NOT IN ({excl}) "
            f"ORDER BY {lam} * ce.rel - {mu} * m.ms DESC, m.doc_id LIMIT 1)"
        )
        picks.append(
            f"SELECT {j - 1} AS rnk, s{j}.doc_id, "
            f"{lam} * ce.rel - {mu} * m.ms AS score "
            f"FROM s{j} JOIN ce ON ce.doc_id = s{j}.doc_id "
            f"JOIN {prev_m} m ON m.doc_id = s{j}.doc_id"
        )
        excl += f" UNION ALL SELECT doc_id FROM s{j}"
        if j < k:
            stages.append(
                f"m{j} AS MATERIALIZED (SELECT p.doc_id, greatest(p.ms, sim.s) AS ms "
                f"FROM {prev_m} p JOIN sim ON sim.da = p.doc_id "
                f"AND sim.db = (SELECT doc_id FROM s{j}))"
            )
    return f"""
WITH {toks_cte}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ({term_list}) GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf
  JOIN dfx ON dfx.tok = tf.tok
  JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats
),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id),
cand AS MATERIALIZED (SELECT doc_id, score AS rel FROM scored
         ORDER BY score DESC, doc_id LIMIT {n_cand}),
ce AS MATERIALIZED (SELECT c.doc_id, c.rel, e.embedding::DOUBLE[] AS v
       FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id),
sim AS MATERIALIZED (SELECT a.doc_id AS da, b.doc_id AS db,
               list_cosine_similarity(a.v, b.v) AS s
        FROM ce a CROSS JOIN ce b),
{", ".join(stages)},
picks AS ({" UNION ALL ".join(picks)})
SELECT rnk::BIGINT AS rank, doc_id,
       CAST(round(CAST(score AS DOUBLE), 6) AS DOUBLE) AS score
FROM picks ORDER BY rank
"""


def _kcenter_sql(k: int = 10) -> str:
    """SQL twin of the Gonzalez greedy k-center sample
    (ops/clustering.kcenter_sample): fixed-depth deterministic greedy,
    unrolled into k chained MATERIALIZED stages (same pattern as
    ``_mmr_sql``). Stage j picks the point with the LARGEST running
    min squared-L2 distance to the selected set (ties smallest id),
    then folds its distance row into the running min. Reported dist =
    the squared distance each pick saw at selection time (0.0 seed).
    DuckDB's list_distance on DOUBLE[] computes in double precision
    (probed), so squaring it reproduces the engine's sum((x-c)^2) to
    well under the 6-dp output rounding."""
    stages = [
        "s1 AS MATERIALIZED (SELECT vec_id, v FROM ce "
        "ORDER BY vec_id LIMIT 1)",
        "m1 AS MATERIALIZED (SELECT ce.vec_id, ce.v, "
        "power(list_distance(ce.v, (SELECT v FROM s1)), 2) AS md "
        "FROM ce)",
    ]
    picks = [
        "SELECT 0 AS rnk, s1.vec_id, 0.0 AS dist FROM s1"
    ]
    excl = "SELECT vec_id FROM s1"
    for j in range(2, k + 1):
        prev = f"m{j - 1}"
        stages.append(
            f"s{j} AS MATERIALIZED (SELECT vec_id, v, md FROM {prev} "
            f"WHERE vec_id NOT IN ({excl}) "
            "ORDER BY md DESC, vec_id LIMIT 1)"
        )
        picks.append(
            f"SELECT {j - 1} AS rnk, vec_id, md AS dist FROM s{j}"
        )
        excl += f" UNION ALL SELECT vec_id FROM s{j}"
        if j < k:
            stages.append(
                f"m{j} AS MATERIALIZED (SELECT p.vec_id, p.v, "
                "least(p.md, power(list_distance(p.v, "
                f"(SELECT v FROM s{j})), 2)) AS md FROM {prev} p)"
            )
    return f"""
WITH ce AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{", ".join(stages)},
picks AS ({" UNION ALL ".join(picks)})
SELECT rnk::BIGINT AS rank, vec_id,
       CAST(round(CAST(dist AS DOUBLE), 6) AS DOUBLE) AS dist
FROM picks ORDER BY rank
"""


# ---------------------------------------------------------------- fulltext


def _hits_table(hits) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in hits], pa.int64()),
            "score": _round_col(np.array([s for _, s in hits] or [], np.float64), 4),
        }
    )


def q_ft_bm25_single(sf_dir: str) -> pa.Table:
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(s.search_terms(["data"], 10, mode="wand"))


def q_ft_bm25_forblock(sf_dir: str) -> pa.Table:
    """Same BM25 WAND top-10 as ft_bm25_single but over an index whose
    postings are at rest under the for-block (PForDelta-family
    bit-packed) codec — the codec SPI proven through the driver gate
    against the identical SQL oracle."""
    s = Searcher(_ensure_index(sf_dir, "forblock"))
    return _hits_table(s.search_terms(["data"], 10, mode="wand"))


def q_ft_bm25_or(sf_dir: str) -> pa.Table:
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(s.search_terms(["data", "merge"], 10, mode="wand"))


def q_ft_bm25_and(sf_dir: str) -> pa.Table:
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(s.search_terms(["window", "batch"], 10, operator="and"))


def q_ft_term_stats(sf_dir: str) -> pa.Table:
    terms = ["data", "merge", "join", "window", "the", "zzzznotaterm"]
    s = Searcher(_ensure_index(sf_dir, "simple"))
    rows = [(t, *s.term_stats("text", t)) for t in terms]
    rows = [(t, df, ttf) for t, df, ttf in rows if df > 0]
    rows.sort()
    return pa.table(
        {
            "term": pa.array([r[0] for r in rows], pa.string()),
            "df": pa.array([r[1] for r in rows], pa.int64()),
            "ttf": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def q_ft_field_stats(sf_dir: str) -> pa.Table:
    s = Searcher(_ensure_index(sf_dir, "simple"))
    dc, sum_dl, avgdl = s.field_stats("text")
    sdf = sum(seg.field_stats.get("text", {}).get("sdf", 0) for seg in s.manifest.segments)
    return pa.table(
        {
            "dc": pa.array([dc], pa.int64()),
            "sttf": pa.array([sum_dl], pa.int64()),
            "sdf": pa.array([sdf], pa.int64()),
            "avgdl": _round_col(np.array([avgdl]), 6),
        }
    )


def _terms_ds(
    ix: str, field: str, columns: list[str] | None = None
) -> ray.data.Dataset:
    """The index's term dictionaries as a Dataset (one parquet per
    segment, column-pruned) — vocabulary analytics stay distributed
    instead of driver-side to_pylist loops (round-1 VERDICT minor #8)."""
    from fdblucene_ray.index.manifest import load_manifest

    m = load_manifest(ix)
    paths = [
        os.path.join(ix, "segments", s.name, "terms.parquet") for s in m.segments
    ]
    ds = ray.data.read_parquet(
        paths, columns=columns or ["field", "term", "df"]
    )
    return ds.filter(expr=f"field == '{field}'")


def q_ft_vocab(sf_dir: str) -> pa.Table:
    """Distinct analyzed vocabulary size: distributed groupby over the
    segment term dictionaries (terms recur across segments — salted
    heads — so distinct-count, not row-count)."""
    ds = _terms_ds(_ensure_index(sf_dir, "simple"), "text")
    n = ds.groupby("term").count().count()
    return pa.table({"n_terms": pa.array([int(n)], pa.int64())})


def q_ft_top_terms(sf_dir: str) -> pa.Table:
    """Top-20 terms by collection df: groupby-sum over segment term
    dictionaries, then a top-k sort on the (small) aggregate."""
    ds = _terms_ds(_ensure_index(sf_dir, "simple"), "text")
    agg = ds.groupby("term").sum("df")
    top = agg.sort(["sum(df)", "term"], descending=[True, False]).limit(20)
    t = pa.Table.from_pandas(top.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "term": t["term"],
            "df": t["sum(df)"].cast(pa.int64()),
        }
    )


def q_ft_keyword_lookup(sf_dir: str) -> pa.Table:
    """Exact keyword-field lookup (StringField semantics, SURVEY M9/q01)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    docs = []
    for r in s.readers:
        h = r.postings_handle("source", "src5")
        if h:
            blob, skips, n = h
            d, _, _ = r.codec.decode_all(blob, skips, n, s.manifest.block_size)
            docs.extend(d.tolist())
    docs.sort()
    return pa.table({"doc_id": pa.array(docs, pa.int64())})


def q_ft_term_set(sf_dir: str) -> pa.Table:
    """TermInSetQuery analog: keyword-field membership filter over a
    value set (index/search.py search_term_set)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    docs = s.search_term_set("source", ["src3", "src5", "src11", "nosuch"])
    return pa.table({"doc_id": pa.array(docs, pa.int64())})


def q_ft_prefix(sf_dir: str) -> pa.Table:
    """PrefixQuery expansion against the term dictionary (bounded
    row-group reads via the sampled term index): terms starting with
    's' -> (term, df)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    terms = s.expand_prefix("text", "s")
    return pa.table(
        {
            "term": pa.array([t for t, _ in terms], pa.string()),
            "df": pa.array([d for _, d in terms], pa.int64()),
        }
    )


def q_ft_wildcard(sf_dir: str) -> pa.Table:
    """WildcardQuery ('s*a*') as a constant-score disjunction: first 20
    matching doc ids (CONSTANT_SCORE_REWRITE; ties = doc id asc)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    hits = s.search_wildcard("s*a*", k=20)
    return pa.table({"doc_id": pa.array([d for d, _ in hits], pa.int64())})


def q_ft_regexp(sf_dir: str) -> pa.Table:
    """RegexpQuery expansion (whole-term anchored, literal-prefix-bounded
    dictionary scan): terms matching s.*a.* -> (term, df)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    pairs = s.expand_regexp("text", "s.*a.*")
    return pa.table(
        {
            "term": pa.array([t for t, _ in pairs], pa.string()),
            "df": pa.array([d for _, d in pairs], pa.int64()),
        }
    )


def q_ft_fuzzy(sf_dir: str) -> pa.Table:
    """FuzzyQuery expansion: terms within edit distance 2 of 'part'
    -> (term, df, dist); Levenshtein via the vectorized numpy DP."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    rows = s.expand_fuzzy("text", "part", max_edits=2)
    return pa.table(
        {
            "term": pa.array([t for t, _, _ in rows], pa.string()),
            "df": pa.array([d for _, d, _ in rows], pa.int64()),
            "dist": pa.array([x for _, _, x in rows], pa.int64()),
        }
    )


def q_ft_term_range(sf_dir: str) -> pa.Table:
    """TermRangeQuery expansion: dictionary terms in ['data', 'merge')
    -> (term, df), bounded row-group range scan."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    rows = s.expand_term_range("text", "data", "merge")
    return pa.table(
        {
            "term": pa.array([t for t, _ in rows], pa.string()),
            "df": pa.array([d for _, d in rows], pa.int64()),
        }
    )


def q_ft_explain(sf_dir: str) -> pa.Table:
    """IndexSearcher.explain analog: per-term BM25 breakdown for the
    top hit of a two-term query (idf/tf/K reconstruct the score)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    hits = s.search_terms(["data", "merge"], 1, mode="wand")
    doc = hits[0][0]
    ex = s.explain("data merge", doc)
    det = [d for d in ex["details"] if d["match"]]
    return pa.table(
        {
            "term": pa.array([d["term"] for d in det], pa.string()),
            "doc_id": pa.array([doc] * len(det), pa.int64()),
            "tf": pa.array([d["tf"] for d in det], pa.int64()),
            "df": pa.array([d["df"] for d in det], pa.int64()),
            "dl_lossy": pa.array([d["dl_lossy"] for d in det], pa.int64()),
            "score": _round_col(
                np.array([d["score"] for d in det], np.float64), 4
            ),
        }
    )


def q_ft_boost(sf_dir: str) -> pa.Table:
    """Query-time boosts (Lucene ``term^boost`` syntax): top-10 for
    ``data^2 merge`` — contribution of 'data' doubled."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(s.query("data^2 merge", k=10))


def q_ft_facets(sf_dir: str) -> pa.Table:
    """Index-native facet counts: docs matching 'data' counted per
    keyword 'source' value (inverted-list intersections, no doc scan)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    fc = s.facet_counts("data", "source")
    return pa.table(
        {
            "value": pa.array([v for v, _ in fc], pa.string()),
            "n": pa.array([c for _, c in fc], pa.int64()),
        }
    )


def q_host_rank(sf_dir: str) -> pa.Table:
    """Host-level PageRank roll-up: rank vector hash-joined back to the
    doc→source mapping (both sides on doc_id), summed per host
    (ops/graph.py host_rank)."""
    from fdblucene_ray.ops.graph import host_rank

    return host_rank(_docs_ds(sf_dir, ["doc_id", "source"]))


def q_funnel(sf_dir: str) -> pa.Table:
    """Ordered event funnel view→click→purchase (strictly increasing
    timestamps, first-match semantics): one user-keyed exchange,
    per-run vectorized minima (ops/windows.py funnel_counts)."""
    from fdblucene_ray.ops.windows import funnel_counts

    ds = _events_ds(sf_dir, ["user_id", "ts", "event_type"])
    return funnel_counts(ds, ["view", "click", "purchase"])


def q_weighted_sample(sf_dir: str) -> pa.Table:
    """Weighted sampling without replacement (Efraimidis-Spirakis,
    seeded md5 uniforms): 100 docs drawn ∝ n_chars
    (ops/curation.weighted_sample)."""
    from fdblucene_ray.ops.curation import weighted_sample

    return weighted_sample(
        _docs_ds(sf_dir, ["doc_id", "n_chars"]), 100, weight_col="n_chars"
    )


def q_retention(sf_dir: str) -> pa.Table:
    """Weekly retention cohorts by offset from each user's first active
    week (ops/windows.py retention_weeks)."""
    from fdblucene_ray.ops.windows import retention_weeks

    return retention_weeks(_events_ds(sf_dir, ["user_id", "ts"]))


def q_tpch_q1(sf_dir: str) -> pa.Table:
    """TPC-H Q1 pricing summary over lineitem: map_batches combiner
    partials (Arrow group_by per batch), one tiny key-combo exchange
    (ops/relational.pricing_summary)."""
    import datetime

    from fdblucene_ray.ops.relational import pricing_summary

    import pyarrow.compute as pc

    cutoff = datetime.datetime(1999, 6, 30)
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
        # row-group predicate pushdown: date-sorted files skip whole
        # row groups via statistics before any bytes decode
        filter=(pc.field("l_shipdate") <= pa.scalar(cutoff)),
    )
    return pricing_summary(li, cutoff)


def q_tpch_q3(sf_dir: str) -> pa.Table:
    """TPC-H Q3 shipping priority: segment-filtered customer ⨝ orders ⨝
    pre-aggregated lineitem revenue, distributed sort().limit(10)
    (ops/relational.shipping_priority)."""
    from fdblucene_ray.ops.relational import shipping_priority

    return shipping_priority(sf_dir)


def q_tpch_q18(sf_dir: str) -> pa.Table:
    """TPC-H Q18 large orders: fact-table combiner partials, HAVING on
    the small aggregate, join back to orders+customer
    (ops/relational.large_orders)."""
    from fdblucene_ray.ops.relational import large_orders

    return large_orders(sf_dir)


def q_gopher_rules(sf_dir: str) -> pa.Table:
    """Gopher quality-filter rules (Rae et al. 2021, arXiv:2112.11446):
    per-doc rule metrics + keep verdict, map-only streaming pass
    (ops/textstats.gopher_rules)."""
    from fdblucene_ray.ops.textstats import gopher_rules

    return _collect(gopher_rules(_docs_ds(sf_dir, ["doc_id", "text"])))


def q_c4_rules(sf_dir: str) -> pa.Table:
    """C4 cleaning heuristics (Raffel et al. 2020): line-level keep
    (terminal punctuation, >=3 words, no javascript/brace) + doc-level
    lorem-ipsum/brace flags, kept lines re-joined
    (ops/textstats.c4_rules)."""
    from fdblucene_ray.ops.textstats import c4_rules

    return _collect(c4_rules(_docs_ds(sf_dir, ["doc_id", "text"])))


def q_c4_sentence_dedup(sf_dir: str) -> pa.Table:
    """C4 three-sentence-span global dedup (Raffel et al. 2020 §2.2):
    real sentence segmentation ([.!?]-run boundaries), any 3-sentence
    span occurring more than once keeps only its first (doc_id, pos)
    occurrence; cleaned text is SQL-oracled byte-for-byte
    (ops/sentences.c4_sentence_dedup)."""
    from fdblucene_ray.ops.sentences import c4_sentence_dedup

    out = c4_sentence_dedup(_docs_ds(sf_dir, ["doc_id", "text"]))
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def q_corpus_export(sf_dir: str) -> pa.Table:
    """Resumable partitioned corpus export (ops/export.py): docs with
    >= 40 whitespace tokens written one atomic ``shard={i}/`` dir per
    contiguous 100-row input slice; already-published shards are
    skipped unread on rerun. Returns the export manifest
    (shard, n_in, n_out) — SQL-oracled by sharding the same word-count
    verdicts over row_number order."""
    import hashlib

    from fdblucene_ray.ops.export import export_corpus
    from fdblucene_ray.ops.webtext import ws_split

    src = _docs_path(sf_dir)
    key = hashlib.blake2s(
        f"{src}:{os.path.getmtime(src)}:{os.path.getsize(src)}".encode(),
        digest_size=8,
    ).hexdigest()
    out_dir = os.path.join("/tmp/fdblucene_ray_cache", f"export-{key}")

    def keep_long(t: pa.Table) -> pa.Table:
        import pyarrow as pa_
        import pyarrow.compute as pc_

        col = t["text"]
        if isinstance(col, pa_.ChunkedArray):
            col = col.combine_chunks()
        toks = ws_split(pc_.fill_null(col, ""))
        # count NON-EMPTY tokens (ws_split keeps boundary empties,
        # matching the oracle's list_filter(x <> ''))
        flat = toks.flatten()
        import numpy as np_

        offs = toks.offsets.to_numpy(zero_copy_only=False)
        ne = pc_.not_equal(flat, "").to_numpy(zero_copy_only=False)
        csum = np_.concatenate(([0], np_.cumsum(ne)))
        nw = csum[offs[1:]] - csum[offs[:-1]]
        return t.filter(pa_.array(nw >= 40))

    man = export_corpus(
        src, out_dir, keep_long, shard_rows=100,
        columns=["doc_id", "text"],
    )
    return man.select(["shard", "n_in", "n_out"])


def q_warc_index(sf_dir: str) -> pa.Table:
    """End-to-end Common-Crawl ingest: WARC container -> resumable
    per-file parquet conversion (extract + lang-ID run exactly once,
    sources/warc.warc_to_parquet) -> flagship webpages index -> BM25
    WAND top-10 with url hydration. Rows-only; tests/test_warc.py
    holds the search-identity oracle against an index built from the
    canonical parquet twin of the same rows."""
    from fdblucene_ray.pipelines.flagship import build_webpages_index
    from fdblucene_ray.sources.warc import synth_warc_files, warc_to_parquet

    root = os.path.join(CACHE_ROOT, "warc-index")
    warcs = synth_warc_files(
        os.path.join(root, "warc"), 500, rows_per_file=125,
        gzip_per_record=True,
    )
    shards = warc_to_parquet(warcs, os.path.join(root, "parquet"))
    ix = os.path.join(root, "ix")
    build_webpages_index(shards, ix, num_partitions=8)
    s = Searcher(ix)
    # term7 is mid-frequency in the Zipf-ish webpages vocabulary
    hits = s.search_terms(["term7"], 10, mode="wand")
    from fdblucene_ray.index.build import hydrate

    t = hydrate(ix, [d for d, _ in hits])
    by_id = dict(zip(t["doc_id"].to_pylist(), t["url"].to_pylist()))
    return pa.table(
        {
            "url": pa.array([by_id[d] for d, _ in hits], pa.string()),
            "score": pa.array(
                [round(sc, 4) for _, sc in hits], pa.float64()
            ),
        }
    )


def q_corpus_report(sf_dir: str) -> pa.Table:
    """Corpus card: docs/tokens/chars/per-lang/avg tokens in one
    streaming pass of summable partials (ops/textstats.corpus_report)."""
    from fdblucene_ray.ops.textstats import corpus_report

    return corpus_report(
        _docs_ds(sf_dir, ["doc_id", "text", "lang", "n_chars"])
    )


def q_ft_phrase_prefix(sf_dir: str) -> pa.Table:
    """PhrasePrefixQuery analog: 'batch str*' — prefix expanded against
    the term dictionary, evaluated as a MultiPhraseQuery
    (index/search.py search_phrase_prefix)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(
        s.search_phrase_prefix("batch str*", k=10, max_expansions=1024)
    )


def q_ft_facet_sum(sf_dir: str) -> pa.Table:
    """Facet associations (TaxonomyFacetSumValueSource analog): per
    'source' value, count + sum(n_chars) over docs matching 'data'
    (index/search.py facet_sums; values hydrate once, row-group
    pruned)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    rows = s.facet_sums(
        "data", "source",
        value_source=_docs_path(sf_dir), value_col="n_chars",
    )
    return pa.table(
        {
            "value": pa.array([v for v, _, _ in rows], pa.string()),
            "n": pa.array([c for _, c, _ in rows], pa.int64()),
            "total": pa.array([t for _, _, t in rows], pa.float64()),
        }
    )


def q_ft_count(sf_dir: str) -> pa.Table:
    """IndexSearcher.count analog: matching-doc count without scoring,
    for an OR and an AND query."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return pa.table(
        {
            "op": pa.array(["and", "or"], pa.string()),
            "n": pa.array(
                [s.count("window batch", operator="and"),
                 s.count("data merge", operator="or")],
                pa.int64(),
            ),
        }
    )


def q_ft_page2(sf_dir: str) -> pa.Table:
    """searchAfter pagination: the second page of 10 for 'data merge'
    (after = last hit of page 1). SQL twin uses OFFSET."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    page1 = s.search("data merge", 10)
    hits = s.search_after("data merge", page1[-1], 10)
    return _hits_table(hits)


def q_ft_mlt(sf_dir: str) -> pa.Table:
    """MoreLikeThis: doc 0's top-5 tf*idf terms -> BM25 disjunction,
    source doc excluded."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    hits = s.more_like_this(
        0, k=10, source=_docs_path(sf_dir), max_query_terms=5
    )
    return _hits_table(hits)


def q_ft_doc_norms(sf_dir: str) -> pa.Table:
    """Per-doc analyzed length + lossy norm decode (M4 norms path)."""
    from fdblucene_ray.analysis.analyzer import BatchTokenizer
    from fdblucene_ray.codec.smallfloat import decode_norms, encode_lengths

    class Norms:
        def __init__(self):
            self.tk = BatchTokenizer("simple")

        def __call__(self, batch: pa.Table) -> pa.Table:
            _, _, _, dls = self.tk.term_frequencies(batch["text"])
            keep = dls > 0
            dl = dls[keep].astype(np.int64)
            return pa.table(
                {
                    "doc_id": pa.array(
                        batch["doc_id"].to_numpy(zero_copy_only=False)[keep]
                    ),
                    "dl": pa.array(dl),
                    "norm_dl": pa.array(decode_norms(encode_lengths(dl))),
                }
            )

    out = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        Norms, batch_format="pyarrow", concurrency=(1, 4)
    )
    return _collect(out)


def _collect(ds: ray.data.Dataset) -> pa.Table:
    return pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)


def q_ft_numeric_range(sf_dir: str) -> pa.Table:
    """Numeric range predicate with parquet row-group pruning (J5)."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        _docs_path(sf_dir),
        columns=["doc_id", "n_chars"],
        filter=(pc.field("n_chars") >= 200) & (pc.field("n_chars") <= 400),
    )
    return _collect(ds)


def q_ft_boolean(sf_dir: str) -> pa.Table:
    """BooleanQuery: +data merge -window (MUST/SHOULD/MUST_NOT, J2)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(
        s.search_boolean(must=["data"], should=["merge"], must_not=["window"], k=10)
    )


def q_ft_bm25f(sf_dir: str) -> pa.Table:
    """BM25F (CombinedFieldQuery analog): weighted term frequencies and
    quantized doc lengths combined across (text, source^2) BEFORE the
    BM25 saturation — not a per-field score sum."""
    s = Searcher(_ensure_index(sf_dir, "mf"))
    return _hits_table(
        s.search_combined_fields(
            "data src5", {"text": 1.0, "source": 2.0}, k=10, mode="wand"
        )
    )


def q_ft_bool_expr(sf_dir: str) -> pa.Table:
    """Nested boolean expression with parentheses (QueryParser
    explicit-operator syntax): (data OR merge) AND stream AND NOT
    window — every positive term scores, NOT only excludes."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(
        s.search_expr("(data OR merge) AND stream AND NOT window", k=10)
    )


def q_ft_parser_mixed(sf_dir: str) -> pa.Table:
    """ONE unified QueryParser string mixing BOTH syntaxes (flat
    +/-/phrase/boost AND parenthesized OR) exactly like Lucene's
    classic parser: ``+data (merge OR stream) -window "batch
    stream"^2`` — data required, window excluded, the OR-group and the
    boosted phrase add score where present."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(
        s.search_query(
            '+data (merge OR stream) -window "batch stream"^2', k=10
        )
    )


def q_ft_tfidf(sf_dir: str) -> pa.Table:
    """Pluggable Similarity (SURVEY U6): ClassicSimilarity TF-IDF
    (idf^2 * sqrt(tf) / sqrt(dl), dl byte4-quantized) instead of BM25,
    over the same index — stats and norms are stored similarity-
    agnostically (DATA.md:33-37), exactly why Lucene can swap scorers."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(s.search("data merge", k=10, similarity="classic"))


def q_ft_lm_dirichlet(sf_dir: str) -> pa.Table:
    """Pluggable Similarity (SURVEY U6): LM with Dirichlet smoothing
    (Zhai & Lafferty; Lucene LMDirichletSimilarity, mu=2000) — per
    matched term max(0, ln(1 + tf/(mu*p)) + ln(mu/(dl+mu))) with
    p = ttf/sumTotalTermFreq, dl byte4-quantized."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(s.search("data merge", k=10, similarity="lmd"))


def q_ft_lm_jm(sf_dir: str) -> pa.Table:
    """Pluggable Similarity (SURVEY U6): LM Jelinek-Mercer (Lucene
    LMJelinekMercerSimilarity, lambda=0.1) — per matched term
    ln(1 + ((1-lambda)/lambda) * (tf/dl) / p)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(s.search("data merge", k=10, similarity="lmjm"))


def q_ft_dfr(sf_dir: str) -> pa.Table:
    """Pluggable Similarity (SURVEY U6): DFR InL2 (Amati & van
    Rijsbergen; Lucene DFRSimilarity(In, L, H2, c=1)) — per matched
    term w * tfn/(tfn+1), tfn = tf*log2(1 + avgdl/dl),
    w = log2((N+1)/(df+0.5))."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(s.search("data merge", k=10, similarity="dfr"))


def q_ft_boolean_sim(sf_dir: str) -> pa.Table:
    """Pluggable Similarity (SURVEY U6): BooleanSimilarity — score =
    number of matching query terms (1.0 per matched clause)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(
        s.search("data merge stream", k=10, similarity="boolean")
    )


def q_ft_block_join(sf_dir: str) -> pa.Table:
    """Nested-document join (ToParentBlockJoinQuery analog): children
    of parent p are the contiguous doc block [8p, 8p+8); child BM25
    hits for "data merge" roll up to parents with ScoreMode.Max."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    hits = s.search_block_join(
        "data merge", 10, parent_stride=8, score_mode="max"
    )
    return pa.table(
        {
            "parent_id": pa.array([p for p, _, _ in hits], pa.int64()),
            "score": _round_col(
                np.array([s_ for _, s_, _ in hits] or [], np.float64), 4
            ),
            "n_children": pa.array([c for _, _, c in hits], pa.int64()),
        }
    )


def q_ft_block_join_child(sf_dir: str) -> pa.Table:
    """Child-direction nested join (ToChildBlockJoinQuery analog):
    the top-3 parents whose block matches "data merge" (ScoreMode.Max)
    expanded to every live child, each child inheriting the parent's
    aggregated score (index/search.py search_block_join_children)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    rows = s.search_block_join_children(
        "data merge", 3, parent_stride=8, score_mode="max"
    )
    return pa.table(
        {
            "parent_id": pa.array([p for p, _, _ in rows], pa.int64()),
            "doc_id": pa.array([d for _, d, _ in rows], pa.int64()),
            "score": _round_col(
                np.array([s_ for _, _, s_ in rows] or [], np.float64), 4
            ),
        }
    )


def q_ft_relaxed(sf_dir: str) -> pa.Table:
    """Query relaxation (zero-results rescue): 'data merge
    zzzunlikelyterm' AND-matches nothing, so the rarest term (df 0)
    drops and the conjunction retries — level reports the drops
    (index/search.py search_relaxed). The oracle pins the rescued
    query's BM25 AND result with level = 1."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    hits, dropped, level = s.search_relaxed(
        "data merge zzzunlikelyterm", k=10
    )
    assert dropped == ["zzzunlikelyterm"], dropped
    t = _hits_table(hits)
    return t.append_column(
        "level", pa.array([level] * t.num_rows, pa.int64())
    )


def q_ft_substring(sf_dir: str) -> pa.Table:
    """Index-accelerated substring (infix) search: 'indo' (inside
    'window') via char-trigram postings intersection + exact verify —
    the NGramTokenizer answer to leading-wildcard queries
    (Searcher.search_substring over the 'tri' flavor)."""
    s = Searcher(_ensure_index(sf_dir, "tri"))
    ids = s.search_substring(
        "indo", 25, source=_docs_path(sf_dir), text_col="text"
    )
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


def q_ft_maxp(sf_dir: str) -> pa.Table:
    """MaxP passage retrieval (Dai & Callan 2019): docs are chunked
    into 64-token windows every 48 tokens, a chunk-level BM25 index
    scores 'data merge', and each document ranks by its BEST passage —
    the chunk→doc rollup is search_block_join(parent_of=...) with
    ScoreMode.Max. Chunk table and index are signature-cached."""
    from fdblucene_ray.ops.packing import chunk_documents

    key = hashlib.sha1(f"{sf_dir}:maxp:v1".encode()).hexdigest()[:12]
    chunk_dir = os.path.join(CACHE_ROOT, f"chunks-{key}")
    cpath = os.path.join(chunk_dir, "chunks.parquet")
    if not os.path.exists(os.path.join(chunk_dir, "_DONE")):
        os.makedirs(chunk_dir, exist_ok=True)
        df = (
            chunk_documents(
                _docs_ds(sf_dir, ["doc_id", "text"]),
                max_tokens=64, stride=48,
            )
            .to_pandas()
            .sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True)
        )
        import pyarrow.parquet as pq

        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), cpath)
        with open(os.path.join(chunk_dir, "_DONE"), "w") as fh:
            fh.write("ok")
    import pyarrow.parquet as pq

    parents = (
        pq.read_table(cpath, columns=["doc_id"])["doc_id"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    ix = _index_dir(sf_dir, "maxp")
    build_index(
        cpath, ix,
        fields={"text": {"column": "text", "analyzer": "simple"}},
        num_partitions=16, batch_size=2048,
    )
    s = Searcher(ix)
    hits = s.search_block_join(
        "data merge", 10, parent_of=parents, score_mode="max"
    )
    return pa.table(
        {
            "parent_id": pa.array([p for p, _, _ in hits], pa.int64()),
            "score": _round_col(
                np.array([s_ for _, s_, _ in hits] or [], np.float64), 4
            ),
            "n_chunks": pa.array([c for _, _, c in hits], pa.int64()),
        }
    )


def q_ft_join(sf_dir: str) -> pa.Table:
    """Query-time join (JoinUtil.createJoinQuery analog, ScoreMode.
    None): docs matching "dup" -> their distinct `source` values ->
    every doc from those sources, constant score, doc-id asc, k=25."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    hits = s.join_query("dup", "source", 25, source=_docs_path(sf_dir))
    return pa.table(
        {"doc_id": pa.array([d for d, _ in hits], pa.int64())}
    )


def q_ft_filter(sf_dir: str) -> pa.Table:
    """BooleanQuery with an Occur.FILTER clause: +data #merge — the
    filter is required for matching but contributes no score (Lucene
    BooleanClause.Occur.FILTER semantics)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(
        s.search_boolean(must=["data"], filter_terms=["merge"], k=10)
    )


def q_ft_phrase(sf_dir: str) -> pa.Table:
    """Exact phrase matching via the positional index (DATA.md:54 "pp"
    positions; PhraseQuery analog)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    rows = s.phrase_freqs("batch stream")
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "phrase_freq": pa.array([f for _, f in rows], pa.int64()),
        }
    )


def q_ft_phrase_slop(sf_dir: str) -> pa.Table:
    """Sloppy phrase (slop=2): windowed-anchor semantics — for the
    two-term case identical to Lucene SloppyPhraseQuery's match set
    (|actual gap - expected gap| <= slop)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    rows = s.phrase_freqs("batch stream", slop=2)
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "sloppy_freq": pa.array([f for _, f in rows], pa.int64()),
        }
    )


def q_ft_rescore(sf_dir: str) -> pa.Table:
    """Two-phase retrieval (QueryRescorer analog): BM25 OR top-30
    window for "data merge", window-only rescore by the phrase
    "batch stream" at weight 2.0, final top-10."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(
        s.rescore("data merge", "batch stream", 10, window=30,
                  rescore_weight=2.0)
    )


def q_percolate(sf_dir: str) -> pa.Table:
    """Percolation (reverse search, Lucene monitor analog): three
    registered boolean queries matched against the document stream."""
    from fdblucene_ray.ops.percolate import percolate

    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    out = percolate(ds, [
        {"must": ["data", "merge"]},
        {"must": ["window"], "must_not": ["batch"]},
        {"should": ["stream", "sort"]},
        {"phrases": ["batch stream"]},  # contiguous-bigram clause
    ])
    df = out.to_pandas().sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    return pa.table(
        {
            "query_id": pa.array(df["query_id"].to_numpy(np.int64)),
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
        }
    )


def q_sig_terms(sf_dir: str) -> pa.Table:
    """Significant terms of the source='src2' slice vs the whole corpus
    (ES significant_terms analog, JLH score over doc frequencies)."""
    from fdblucene_ray.ops.textstats import significant_terms

    ds = _docs_ds(sf_dir, ["doc_id", "text", "source"])
    return significant_terms(ds, "source", "src2", n=20)


def q_ft_index_sort(sf_dir: str) -> pa.Table:
    """Index-time sort + early-terminating sorted top-k (Lucene
    IndexWriterConfig.setIndexSort / TopFieldCollector early
    termination): docs matching 'data' ranked by n_chars desc come
    straight off ascending doc ids — posting blocks past the 10th
    match are never decoded."""
    from fdblucene_ray.index.build import hydrate
    from fdblucene_ray.index.sorted import build_sorted_index

    ix = _index_dir(sf_dir, "ixsort")
    build_sorted_index(
        _docs_path(sf_dir), ix, sort_col="n_chars", descending=True,
        fields={"text": {"column": "text", "analyzer": "simple"}},
        num_partitions=16, batch_size=2048,
    )
    s = Searcher(ix)
    ids = s.search_sorted_topk("data", k=10)
    stored = hydrate(ix, ids, columns=["doc_id", "orig_doc_id", "n_chars"])
    return pa.table(
        {
            "doc_id": stored["orig_doc_id"].cast(pa.int64()),
            "n_chars": stored["n_chars"].cast(pa.int64()),
        }
    )


def q_ft_numeric_sort(sf_dir: str) -> pa.Table:
    """Numeric doc-values sort (README.md:53-57 NumericDocValuesField
    analog): top-10 docs by n_chars desc, doc_id asc tie-break."""
    ds = _docs_ds(sf_dir, ["doc_id", "n_chars"])
    out = ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(10)
    return _collect(out)


def q_search_lucene(sf_dir: str) -> pa.Table:
    """Flagship: full Lucene-chain analyzer + block-max WAND top-10.
    Non-SQL-expressible (Porter stemming); conformance held by pytest
    against the pure-Python oracle."""
    s = Searcher(_ensure_index(sf_dir, "lucene"))
    queries = ["data merge", "running window", "the quick join", "stream", "batch value sort"]
    qids, docs, scores, ranks = [], [], [], []
    for qi, q in enumerate(queries):
        for rank, (d, sc) in enumerate(s.search(q, 10, mode="wand"), 1):
            qids.append(qi)
            ranks.append(rank)
            docs.append(d)
            scores.append(sc)
    return pa.table(
        {
            "qid": pa.array(qids, pa.int64()),
            "rank": pa.array(ranks, pa.int32()),
            "doc_id": pa.array(docs, pa.int64()),
            "score": _round_col(np.array(scores or [], np.float64), 6),
        }
    )


def q_ft_highlight(sf_dir: str) -> pa.Table:
    """Highlight plumbing: top-10 BM25 hits hydrated straight from the
    INPUT parquet (doc_id -> row group is a pure function of footer
    metadata — the zero-copy doc store), then char-offset spans derived
    by re-analyzing just those 10 docs (DATA.md:54 offsets analog)."""
    from fdblucene_ray.index.highlight import highlight_spans
    from fdblucene_ray.sources.corpus import hydrate_from_source

    s = Searcher(_ensure_index(sf_dir, "simple"))
    hits = s.search_terms(["data"], 10, mode="wand")
    tbl = hydrate_from_source(
        _docs_path(sf_dir), [d for d, _ in hits], columns=["text"]
    )
    rows = []
    for doc, text in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        spans = highlight_spans("simple", text, ["data"])
        rows.append((doc, len(spans)))
    rows.sort()
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "n_spans": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def q_ft_near_unordered(sf_dir: str) -> pa.Table:
    """Proximity (SpanNearQuery analog): docs whose terms co-occur in a
    window; reports the minimal span."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    rows = s.search_near("batch stream", 6)
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "min_span": pa.array([sp for _, sp in rows], pa.int64()),
        }
    )


def q_ft_near_ordered(sf_dir: str) -> pa.Table:
    """Ordered proximity (SpanNearQuery inOrder): matched positions must
    increase in query-term order."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    rows = s.search_near("data merge", 8, ordered=True)
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "min_span": pa.array([sp for _, sp in rows], pa.int64()),
        }
    )


def q_ft_multifield(sf_dir: str) -> pa.Table:
    """MultiFieldQueryParser analog: query expanded over (text, source),
    doc score = sum of per-field BM25 contributions."""
    s = Searcher(_ensure_index(sf_dir, "mf"))
    return _hits_table(s.search_fields("data src3", ["text", "source"], k=10))


# ---------------------------------------------------------------- delete


def _ensure_deleted_index(sf_dir: str) -> str:
    """documents index (simple + keyword source) with every source='src3'
    doc tombstoned — the Writer-approach delete capability
    (/root/reference/README.md:34-38)."""
    from fdblucene_ray.index.delete import delete_by_term

    ix = _index_dir(sf_dir, "deltest")
    fields = {
        "text": {"column": "text", "analyzer": "simple"},
        "source": {"column": "source", "analyzer": "keyword"},
    }
    build_index(
        _docs_path(sf_dir), ix, fields=fields, num_partitions=16, batch_size=2048
    )
    delete_by_term(ix, "source", "src3")
    return ix


_DELETED_PRED = "doc_id NOT IN (SELECT doc_id FROM documents WHERE source = 'src3')"


def q_ft_delete_search(sf_dir: str) -> pa.Table:
    """Tombstone-filtered BM25 WAND: deleted docs never match, but
    collection/term stats still include them (Lucene liveDocs
    semantics — df/docCount unchanged until merge purges)."""
    s = Searcher(_ensure_deleted_index(sf_dir))
    return _hits_table(s.search_terms(["data", "merge"], 10, mode="wand"))


def q_ft_commit_travel(sf_dir: str) -> pa.Table:
    """Point-in-time read (DirectoryReader.open(IndexCommit) analog):
    the SAME index ft_delete_search queries, opened at its FIRST commit
    (pre-delete) — results equal the full-corpus oracle even though the
    live manifest tombstones every source='src3' doc."""
    ix = _ensure_deleted_index(sf_dir)
    from fdblucene_ray.index.manifest import list_commits

    s = Searcher(ix, version=list_commits(ix)[0])
    return _hits_table(s.search_terms(["data", "merge"], 10, mode="wand"))


def q_ft_delete_purge_stats(sf_dir: str) -> pa.Table:
    """After a FULL compaction, tombstoned docs' postings AND their
    exact (dc, sum_dl) stat contributions are purged via the doclens
    sidecar; the result equals a fresh build on the live corpus."""
    from fdblucene_ray.index.merge import compact_index

    ix = _ensure_deleted_index(sf_dir)
    out = _index_dir(sf_dir, "deltest-compacted")
    compact_index(ix, out, num_partitions=4)
    s = Searcher(out)
    dc, sttf, avgdl = s.field_stats("text")
    return pa.table(
        {
            "dc": pa.array([dc], pa.int64()),
            "sttf": pa.array([sttf], pa.int64()),
            "avgdl": _round_col(np.array([avgdl]), 6),
            "n_deleted": pa.array([s.num_deleted], pa.int64()),
        }
    )


def q_ft_delete_purge_search(sf_dir: str) -> pa.Table:
    """BM25 over the purged index: stats now reflect the live corpus
    only (df/docCount recomputed by the merge)."""
    from fdblucene_ray.index.merge import compact_index

    ix = _ensure_deleted_index(sf_dir)
    out = _index_dir(sf_dir, "deltest-compacted")
    compact_index(ix, out, num_partitions=4)
    s = Searcher(out)
    return _hits_table(s.search_terms(["data", "merge"], 10, mode="wand"))


# ---------------------------------------------------------------- ops


def q_dedup_exact(sf_dir: str) -> pa.Table:
    from fdblucene_ray.ops.dedup import exact_dedup

    out = exact_dedup(_docs_ds(sf_dir, ["doc_id", "text"]))
    return _collect(out)


def q_dedup_incremental(sf_dir: str) -> pa.Table:
    """Cross-shard incremental dedup: the second half of the corpus
    (the "daily increment") deduped against the first half (the
    history) — history reduced to broadcast digest keys, increment
    streamed through a vectorized membership filter, survivors
    exact-deduped. One row per kept new doc: (doc_id, dup_count)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from fdblucene_ray.ops.dedup import incremental_dedup

    split = (pq.read_metadata(_docs_path(sf_dir)).num_rows - 1) // 2
    old = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["doc_id", "text"],
        filter=pc.field("doc_id") <= split,
    )
    new = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["doc_id", "text"],
        filter=pc.field("doc_id") > split,
    )
    return _collect(incremental_dedup(new, old))


def q_sample_token_budget(sf_dir: str) -> pa.Table:
    """Deterministic token-budget sample: docs in seed-7 shuffle order
    while the running whitespace-token total stays <= 20000."""
    from fdblucene_ray.ops.curation import sample_token_budget

    out = sample_token_budget(
        _docs_ds(sf_dir, ["doc_id", "text"]), budget=20_000, seed=7
    )
    return _collect(out)


def q_train_shuffle(sf_dir: str) -> pa.Table:
    """Deterministic seeded global shuffle (epoch ordering for training
    data): first 50 docs of the seed-42 permutation, with rank."""
    from fdblucene_ray.ops.curation import seeded_shuffle

    ds = seeded_shuffle(_docs_ds(sf_dir, ["doc_id"]), seed=42).limit(50)
    df = ds.to_pandas()
    return pa.table(
        {
            "rank": pa.array(np.arange(len(df), dtype=np.int64)),
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            "shuffle_key": pa.array(df["shuffle_key"].to_numpy(np.int64)),
        }
    )


def q_dedup_minhash(sf_dir: str) -> pa.Table:
    from fdblucene_ray.ops.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs_ds(sf_dir, ["doc_id", "text"]), threshold=0.8)


def q_dedup_near_corpus(sf_dir: str) -> pa.Table:
    """End-to-end near-dedup over documents: minhash-LSH pairs ->
    union-find components -> drop non-representatives; returns the kept
    doc ids (non-SQL-expressible; pytest holds the planted-dup oracle)."""
    from fdblucene_ray.ops.dedup import near_dedup_corpus

    out = near_dedup_corpus(_docs_ds(sf_dir, ["doc_id", "text"]), threshold=0.8)
    kept = out.select_columns(["doc_id"]).to_pandas().sort_values("doc_id")
    return pa.table({"doc_id": pa.array(kept["doc_id"].to_numpy(np.int64))})


def q_dedup_near_best(sf_dir: str) -> pa.Table:
    """Near-dedup with the keep-best policy: each near-dup component
    keeps its longest member (n_chars as the quality signal) instead of
    the min id (ops/dedup.py near_dedup_corpus(quality_col=...));
    rows-only — tests/test_ops.py plants the inverted-quality oracle."""
    from fdblucene_ray.ops.dedup import near_dedup_corpus

    out = near_dedup_corpus(
        _docs_ds(sf_dir, ["doc_id", "text", "n_chars"]),
        threshold=0.8, quality_col="n_chars",
    )
    kept = out.select_columns(["doc_id"]).to_pandas().sort_values("doc_id")
    return pa.table({"doc_id": pa.array(kept["doc_id"].to_numpy(np.int64))})


def q_dedup_simhash(sf_dir: str) -> pa.Table:
    from fdblucene_ray.ops.dedup import simhash_fingerprints

    return _collect(simhash_fingerprints(_docs_ds(sf_dir, ["doc_id", "text"])))


def q_ngram_jaccard(sf_dir: str) -> pa.Table:
    import pyarrow.parquet as pq

    from fdblucene_ray.ops.dedup import ngram_jaccard_vs_anchor

    anchor = pq.read_table(_docs_path(sf_dir), columns=["text"])["text"][0].as_py()
    out = ngram_jaccard_vs_anchor(_docs_ds(sf_dir, ["doc_id", "text"]), anchor)
    return _collect(out)


def q_lang_id(sf_dir: str) -> pa.Table:
    from fdblucene_ray.ops.textstats import lang_id

    return _collect(lang_id(_docs_ds(sf_dir, ["doc_id", "text"])))


def q_text_quality(sf_dir: str) -> pa.Table:
    from fdblucene_ray.ops.textstats import quality_scores

    return _collect(quality_scores(_docs_ds(sf_dir, ["doc_id", "text"])))


def q_token_count(sf_dir: str) -> pa.Table:
    from fdblucene_ray.ops.textstats import token_counts

    return _collect(token_counts(_docs_ds(sf_dir, ["doc_id", "text"])))


def q_fingerprint(sf_dir: str) -> pa.Table:
    from fdblucene_ray.ops.textstats import fingerprints

    out = _collect(
        fingerprints(_docs_ds(sf_dir, ["doc_id", "text"])).select_columns(
            ["doc_id", "n_fingerprints"]
        )
    )
    return out


def _emb_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "embeddings.parquet")


def _query_vectors(sf_dir: str, ids) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    vid = t["vec_id"].to_numpy(zero_copy_only=False)
    lookup = {int(v): i for i, v in enumerate(vid)}
    return np.array(
        [t["embedding"][lookup[q]].as_py() for q in ids], dtype=np.float64
    )


def q_ann_cosine(sf_dir: str) -> pa.Table:
    from fdblucene_ray.ops.similarity import brute_force_topk

    q = _query_vectors(sf_dir, [0])
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    return brute_force_topk(ds, q, [0], k=10)


def q_ft_append_refresh(sf_dir: str) -> pa.Table:
    """Near-real-time ingest (SURVEY §2.9): the index is built from
    shard 1 (first half of the corpus), then REFRESHED by appending
    shard 2 — the completed shard is skipped via its done-record and
    only the new files build (index/build.py build_sharded). The
    refreshed index's term stats + search must equal a full-corpus
    build, which is exactly what the SQL twin computes."""
    import pyarrow.parquet as pq

    from fdblucene_ray.index.build import build_sharded

    key = hashlib.sha1(f"{sf_dir}:append:v1".encode()).hexdigest()[:12]
    root = os.path.join(CACHE_ROOT, f"append-{key}")
    os.makedirs(root, exist_ok=True)
    halves = [os.path.join(root, f"half{i}.parquet") for i in (0, 1)]
    if not all(os.path.exists(p) for p in halves):
        t = pq.read_table(_docs_path(sf_dir))
        per = (t.num_rows + 1) // 2
        for i, p in enumerate(halves):
            pq.write_table(t.slice(i * per, per), p + ".tmp",
                           row_group_size=2048)
            os.replace(p + ".tmp", p)
    ix = os.path.join(root, "ix")
    fields = {"text": {"column": "text", "analyzer": "simple"}}
    # initial build: shard 1 only
    build_sharded([halves[0]], ix, fields=fields,
                  num_partitions_per_shard=4)
    # refresh: append shard 2 (shard 1's done-record skips its input)
    build_sharded(halves, ix, fields=fields, num_partitions_per_shard=4)
    s = Searcher(ix)
    terms = ["data", "merge", "join", "window"]
    rows = sorted((t, *s.term_stats("text", t)) for t in terms)
    hits = s.search_terms(["data", "merge"], 10, mode="wand")
    return pa.table(
        {
            "term": pa.array([r[0] for r in rows], pa.string()),
            "df": pa.array([r[1] for r in rows], pa.int64()),
            "ttf": pa.array([r[2] for r in rows], pa.int64()),
            "top1_doc": pa.array([hits[0][0]] * len(rows), pa.int64()),
        }
    )


def q_ft_sync_ingest(sf_dir: str) -> pa.Table:
    """Directory-sync continuity (index/sync.py): the index bootstraps
    from the inbox's first file, `sync_index` diffs the directory and
    appends only the new files (multi-writer-safe append under the
    hood; a second sync is a no-op), and the synced index's term stats
    + search equal a full-corpus build — the same SQL twin as
    ft_append_refresh."""
    import pyarrow.parquet as pq

    from fdblucene_ray.index.sync import mark_ingested, sync_index

    key = hashlib.sha1(f"{sf_dir}:sync:v1".encode()).hexdigest()[:12]
    root = os.path.join(CACHE_ROOT, f"sync-{key}")
    inbox = os.path.join(root, "inbox")
    os.makedirs(inbox, exist_ok=True)
    parts = [os.path.join(inbox, f"part{i}.parquet") for i in (0, 1, 2)]
    if not all(os.path.exists(p) for p in parts):
        t = pq.read_table(_docs_path(sf_dir))
        per = (t.num_rows + 2) // 3
        for i, p in enumerate(parts):
            pq.write_table(t.slice(i * per, per), p + ".tmp",
                           row_group_size=2048)
            os.replace(p + ".tmp", p)
    ix = os.path.join(root, "ix")
    fields = {"text": {"column": "text", "analyzer": "simple"}}
    boot_done = os.path.join(root, "_BOOT_DONE")
    if not os.path.exists(boot_done):
        # rebuild from scratch on a half-finished bootstrap (crash
        # between build_index and mark_ingested would otherwise make
        # the later sync re-append part0)
        import shutil

        shutil.rmtree(ix, ignore_errors=True)
        build_index(parts[0], ix, fields=fields, num_partitions=4)
        # adopt the bootstrap file into sync bookkeeping (already
        # indexed), then ingest the rest of the inbox incrementally
        mark_ingested(ix, [parts[0]])
        with open(boot_done, "w") as fh:
            fh.write("ok")
    sync_index(ix, inbox, fields=fields)
    m2, new2 = sync_index(ix, inbox, fields=fields)
    assert m2 is None and new2 == []  # idempotent
    s = Searcher(ix)
    terms = ["data", "merge", "join", "window"]
    rows = sorted((t, *s.term_stats("text", t)) for t in terms)
    hits = s.search_terms(["data", "merge"], 10, mode="wand")
    return pa.table(
        {
            "term": pa.array([r[0] for r in rows], pa.string()),
            "df": pa.array([r[1] for r in rows], pa.int64()),
            "ttf": pa.array([r[2] for r in rows], pa.int64()),
            "top1_doc": pa.array([hits[0][0]] * len(rows), pa.int64()),
        }
    )


def q_neardup_probe(sf_dir: str) -> pa.Table:
    """Online near-dup probe: build the at-rest banded minhash index
    over documents (hive part= layout; probes read only colliding
    partitions), then probe with the exact text of docs 3 and 7 — each
    must come back with est_jaccard 1.0 (ops/dedup.py
    build_neardup_index/probe_neardup). Rows-only; planted-near-dup
    pytest holds the stronger oracle."""
    from fdblucene_ray.ops.dedup import build_neardup_index, probe_neardup
    from fdblucene_ray.sources.corpus import hydrate_from_source

    key = hashlib.sha1(f"{sf_dir}:ndix:v1".encode()).hexdigest()[:12]
    d = os.path.join(CACHE_ROOT, f"ndix-{key}")
    if not os.path.exists(os.path.join(d, "meta.json")):
        build_neardup_index(_docs_ds(sf_dir, ["doc_id", "text"]), d)
    q = hydrate_from_source(
        _docs_path(sf_dir), [3, 7], columns=["text"]
    )["text"].to_pylist()
    out = probe_neardup(d, q, min_est_jaccard=0.95)
    df = out.to_pandas().sort_values(["query_idx", "doc_id"]).reset_index(
        drop=True
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def q_label_drift(sf_dir: str) -> pa.Table:
    """Per-label embedding drift: cosine similarity of each label's
    mean vector to the global mean — the cluster-vs-corpus drift
    monitor. Reuses the label_centroids partial sums; global centroid
    folds from the same partials; cosine is computed on the driver
    over |labels| x D doubles."""
    from fdblucene_ray.ops.clustering import label_centroid_sums

    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["embedding", "label"]
    )
    sums = label_centroid_sums(ds).to_pandas()
    piv_s = sums.pivot(index="label", columns="dim", values="s").sort_index()
    piv_n = sums.pivot(index="label", columns="dim", values="n").sort_index()
    S = piv_s.to_numpy(np.float64)
    Ncnt = piv_n.to_numpy(np.float64)
    M = S / Ncnt  # per-label mean, dims columns
    g = S.sum(axis=0) / Ncnt.sum(axis=0)  # global mean per dim
    num = (M * g).sum(axis=1)
    den = np.sqrt((M * M).sum(axis=1)) * np.sqrt((g * g).sum())
    cos = num / den
    return pa.table(
        {
            "label": pa.array(piv_s.index.to_numpy(np.int64)),
            "cos_to_global": _round_col(cos, 6),
        }
    )


def q_catalog(sf_dir: str) -> pa.Table:
    """Named-index catalog (the reference's many-directories-on-one-
    cluster deployment shape, index/catalog.py): create two indexes
    under one root, list them. Rows-only; tests/test_catalog.py holds
    lifecycle + federated oracles."""
    from fdblucene_ray.index.catalog import Catalog

    key = hashlib.sha1(f"{sf_dir}:catalog:v1".encode()).hexdigest()[:12]
    cat = Catalog(os.path.join(CACHE_ROOT, f"cat-{key}"))
    fields = {"text": {"column": "text", "analyzer": "simple"}}
    cat.create("main", _docs_path(sf_dir), fields=fields, num_partitions=4)
    cat.create("kw", _docs_path(sf_dir), fields={
        "source": {"column": "source", "analyzer": "keyword"},
    }, num_partitions=2)
    return cat.list()


def q_compress_ratio(sf_dir: str) -> pa.Table:
    """Per-doc zlib compressibility (repetitive-boilerplate signal;
    ops/textstats.compression_ratio). Rows-only: no SQL deflate; pytest
    replays zlib exactly and orders planted repetitive vs random."""
    from fdblucene_ray.ops.textstats import compression_ratio

    out = compression_ratio(_docs_ds(sf_dir, ["doc_id", "text"]))
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def q_jl_project(sf_dir: str) -> pa.Table:
    """Johnson-Lindenstrauss Rademacher projection to 16 dims
    (ops/clustering.jl_project — deterministic hashed sign matrix, one
    matmul per batch). Rows-only: the projection isn't SQL-expressible;
    pytest bounds pairwise-distance distortion."""
    from fdblucene_ray.ops.clustering import jl_project

    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["vec_id", "embedding"]
    )
    rows = jl_project(ds, 16).take_all()
    rows.sort(key=lambda r: r["vec_id"])
    return pa.table(
        {
            "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
            "p0": _round_col(
                np.array([r["proj"][0] for r in rows], np.float64), 6
            ),
            "p1": _round_col(
                np.array([r["proj"][1] for r in rows], np.float64), 6
            ),
        }
    )


def q_ft_index_stats(sf_dir: str) -> pa.Table:
    """Index diagnostics surface (CheckIndex-lite metadata report):
    totals from Searcher.index_stats — rows-only (segment layout isn't
    SQL-visible), but doc/posting totals cross-check the manifest."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    st = s.index_stats()
    return pa.table(
        {
            "n_segments": pa.array([int(st["n_segments"])], pa.int64()),
            "n_terms": pa.array([int(st["n_terms"])], pa.int64()),
            "n_postings": pa.array([int(st["n_postings"])], pa.int64()),
            "doc_count": pa.array(
                [int(st["fields"]["text"]["doc_count"])], pa.int64()
            ),
            "n_tombstones": pa.array([int(st["n_tombstones"])], pa.int64()),
        }
    )


def q_prep_pipeline(sf_dir: str) -> pa.Table:
    """End-to-end training-data prep COMPOSITION: quality gate (chars +
    whitespace-token minimums) -> quality-keep-best exact dedup on the
    30-codepoint snippet key -> 128-token sequence packing; reports the
    funnel (n_input, n_filtered, n_deduped, n_tokens, n_sequences).
    Every stage is an existing scale-shaped op; the SQL twin replays
    the whole chain relationally."""
    import pyarrow.compute as pc

    from fdblucene_ray.ops.dedup import exact_dedup_keep_best
    from fdblucene_ray.ops.packing import pack_sequences

    docs = _docs_ds(sf_dir, ["doc_id", "text", "n_chars"])
    n_input = docs.count()

    def gate(batch: pa.Table) -> pa.Table:
        t = batch["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        chars = pc.utf8_length(t).to_numpy(zero_copy_only=False)
        from fdblucene_ray.ops.webtext import ws_split
        ws = ws_split(t)
        per_row = np.diff(ws.offsets.to_numpy(zero_copy_only=False))
        flat = ws.flatten()
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        rid = np.repeat(np.arange(len(batch)), per_row)
        n_toks = np.bincount(rid[nonempty], minlength=len(batch))
        keep = (chars >= 200) & (n_toks >= 30)
        return batch.filter(pa.array(keep))

    gated = docs.map_batches(gate, batch_format="pyarrow").materialize()
    n_filtered = gated.count()

    def with_snippet(batch: pa.Table) -> pa.Table:
        t = batch["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        return batch.append_column(
            "snippet", pc.utf8_slice_codeunits(t, 0, 30)
        )

    keep_rows = exact_dedup_keep_best(
        gated.map_batches(with_snippet, batch_format="pyarrow"),
        text_col="snippet", score_col="n_chars",
    ).take_all()
    keep_ids = np.sort(np.array([r["doc_id"] for r in keep_rows], np.int64))
    n_deduped = len(keep_ids)
    ref = ray.put(keep_ids)

    def keep_only(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        m = ray.get(ref)
        pos = np.searchsorted(m, ids)
        pos[pos == len(m)] = 0
        hit = (m[pos] == ids) if len(m) else np.zeros(len(ids), bool)
        return batch.filter(pa.array(hit))

    deduped = gated.map_batches(keep_only, batch_format="pyarrow")
    spans = pack_sequences(
        deduped.select_columns(["doc_id", "text"]), seq_len=128,
        bucket_size=100,
    )
    agg = spans.aggregate(
        ray.data.aggregate.Sum("n_tokens", alias_name="nt"),
        ray.data.aggregate.Max("seq_id", alias_name="max_seq"),
    )
    return pa.table(
        {
            "n_input": pa.array([int(n_input)], pa.int64()),
            "n_filtered": pa.array([int(n_filtered)], pa.int64()),
            "n_deduped": pa.array([int(n_deduped)], pa.int64()),
            "n_tokens": pa.array([int(agg["nt"])], pa.int64()),
            "n_sequences": pa.array([int(agg["max_seq"]) + 1], pa.int64()),
        }
    )


def q_hard_negatives(sf_dir: str) -> pa.Table:
    """Hard-negative mining: top-10 cosine neighbors with a DIFFERENT
    label for each of queries vec_id 0..2
    (ops/similarity.hard_negatives — per-batch vectorized label mask)."""
    from fdblucene_ray.ops.similarity import hard_negatives

    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["vec_id", "embedding", "label"]
    )
    return hard_negatives(ds, [0, 1, 2], k=10)


def q_commit_diff(sf_dir: str) -> pa.Table:
    """Commit-point diff (snapshot inspection before a rollback): the
    ft_delete_* index's first vs latest retained commits — deletes add
    tombstones, segments stay (index/delete.py diff_commits, pure
    metadata)."""
    from fdblucene_ray.index.delete import diff_commits
    from fdblucene_ray.index.manifest import list_commits

    ix = _ensure_deleted_index(sf_dir)
    vs = list_commits(ix)
    d = diff_commits(ix, vs[0], vs[-1])
    return pa.table(
        {
            "n_segments_added": pa.array([len(d["segments_added"])], pa.int64()),
            "n_segments_removed": pa.array(
                [len(d["segments_removed"])], pa.int64()
            ),
            "n_postings_delta": pa.array([d["n_postings_delta"]], pa.int64()),
            "tombstones_added": pa.array([d["tombstones_added"]], pa.int64()),
            "tombstones_removed": pa.array(
                [d["tombstones_removed"]], pa.int64()
            ),
        }
    )


def q_source_kl(sf_dir: str) -> pa.Table:
    """Per-source KL divergence from the corpus unigram distribution
    (mixture distribution-shift diagnostic;
    ops/textstats.source_divergence — vocabulary-sized exchanges only,
    per-term join co-partitioned)."""
    from fdblucene_ray.ops.textstats import source_divergence

    return source_divergence(
        _docs_ds(sf_dir, ["doc_id", "text", "source"])
    )


def q_auto_stopwords(sf_dir: str) -> pa.Table:
    """Corpus-adaptive stopword detection (DynamicStopwordFilter /
    CommonTermsQuery threshold analog): terms whose document frequency
    exceeds 40% of docCount, with df and df/dc ratio — a distributed
    term-dictionary scan + broadcast docCount, no corpus pass."""
    ix = _ensure_index(sf_dir, "simple")
    s = Searcher(ix)
    dc, _, _ = s.field_stats("text")
    ds = _terms_ds(ix, "text")
    agg = ds.groupby("term").sum("df")

    def threshold(t: pa.Table) -> pa.Table:
        df = t["sum(df)"].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = df / dc > 0.4
        return pa.table(
            {
                "term": t["term"].filter(pa.array(keep)),
                "df": pa.array(df[keep].astype(np.int64)),
                "ratio": _round_col(df[keep] / dc, 6),
            }
        )

    out = agg.map_batches(threshold, batch_format="pyarrow")
    df = out.to_pandas().sort_values("term").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def q_event_zscores(sf_dir: str) -> pa.Table:
    """Per-type daily event-rate z-scores (rate-anomaly screening over
    the events table): daily counts per event_type, z = (cnt - mean) /
    population-std across that type's days. Two tiny aggregates — daily
    counts, then per-type moments — all map-side combinable."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type"]
    )

    def day_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts = t["ts"]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        return pa.table(
            {"event_type": t["event_type"], "day": pa.array(day)}
        )

    daily = (
        ev.map_batches(day_rows, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .count()
    )
    rows = daily.take_all()
    import collections

    byt = collections.defaultdict(list)
    for r in rows:
        byt[r["event_type"]].append((int(r["day"]), int(r["count()"])))
    out_t, out_d, out_c, out_z = [], [], [], []
    from fdblucene_ray.ops.hashing import round_half_away

    for t in sorted(byt):
        pairs = sorted(byt[t])
        cnts = np.array([c for _, c in pairs], np.float64)
        mean = cnts.sum() / len(cnts)
        var = (cnts * cnts).sum() / len(cnts) - mean * mean
        std = np.sqrt(var) if var > 0 else 1.0
        z = (cnts - mean) / std
        for (d, c), zz in zip(pairs, z):
            out_t.append(t)
            out_d.append(d)
            out_c.append(c)
            out_z.append(float(round_half_away(np.array([zz]), 6)[0]))
    return pa.table(
        {
            "event_type": pa.array(out_t, pa.string()),
            "day": pa.array(out_d, pa.int64()),
            "n": pa.array(out_c, pa.int64()),
            "z": pa.array(out_z, pa.float64()),
        }
    )


def q_ascii_fold(sf_dir: str) -> pa.Table:
    """ASCIIFoldingFilter analog: accents planted deterministically on
    both sides (a→á, o→ö, c→ç — all strip_accents-decomposable), folded
    back by ops/webtext.fold_to_ascii (single NFKD pass per batch) —
    the folded text must round-trip to DuckDB's strip_accents output."""
    import pyarrow.compute as pc

    from fdblucene_ray.ops.webtext import ascii_fold

    def plant(batch: pa.Table) -> pa.Table:
        t = batch["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        t = pc.replace_substring(t, "a", "á")
        t = pc.replace_substring(t, "o", "ö")
        t = pc.replace_substring(t, "c", "ç")
        return pa.table({"doc_id": batch["doc_id"], "text": t})

    ds = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        plant, batch_format="pyarrow"
    )
    df = ascii_fold(ds).to_pandas().sort_values("doc_id").reset_index(
        drop=True
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def q_jsonl_ingest(sf_dir: str) -> pa.Table:
    """JSONL corpus connector: the documents table exported once to
    line-delimited JSON (the other ubiquitous corpus interchange
    format), re-ingested with ray.data.read_json, and token-counted —
    oracled against the SAME stats computed by DuckDB over the original
    parquet, so the connector's value fidelity is the thing under
    test."""
    from fdblucene_ray.ops.textstats import token_counts

    key = hashlib.sha1(f"{sf_dir}:jsonl:v1".encode()).hexdigest()[:12]
    out_dir = os.path.join(CACHE_ROOT, f"jsonl-{key}")
    if not os.path.exists(os.path.join(out_dir, "_DONE")):
        os.makedirs(out_dir, exist_ok=True)
        _docs_ds(sf_dir, ["doc_id", "text"]).repartition(4).write_json(
            out_dir
        )
        with open(os.path.join(out_dir, "_DONE"), "w") as fh:
            fh.write("ok")
    files = [
        os.path.join(out_dir, f)
        for f in sorted(os.listdir(out_dir))
        if f.endswith(".json")
    ]
    ds = ray.data.read_json(files)
    df = token_counts(ds).to_pandas().sort_values("doc_id").reset_index(
        drop=True
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def q_csv_ingest(sf_dir: str) -> pa.Table:
    """CSV corpus connector: the documents table exported once to
    quoted CSV (Arrow CSV writer handles embedded newlines/quotes),
    re-ingested with ray.data.read_csv, and token-counted — oracled
    against the same stats DuckDB computes over the original parquet,
    so quoting fidelity through the round trip is the thing under
    test."""
    from fdblucene_ray.ops.textstats import token_counts

    key = hashlib.sha1(f"{sf_dir}:csv:v1".encode()).hexdigest()[:12]
    out_dir = os.path.join(CACHE_ROOT, f"csv-{key}")
    if not os.path.exists(os.path.join(out_dir, "_DONE")):
        os.makedirs(out_dir, exist_ok=True)
        _docs_ds(sf_dir, ["doc_id", "text"]).repartition(4).write_csv(
            out_dir
        )
        with open(os.path.join(out_dir, "_DONE"), "w") as fh:
            fh.write("ok")
    files = [
        os.path.join(out_dir, f)
        for f in sorted(os.listdir(out_dir))
        if f.endswith(".csv")
    ]
    ds = ray.data.read_csv(files)
    df = token_counts(ds).to_pandas().sort_values("doc_id").reset_index(
        drop=True
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def q_warc_extract(sf_dir: str) -> pa.Table:
    """WARC ingestion (Common Crawl's at-rest container): synthesize a
    deterministic gzip-per-record WARC fixture, read it through the
    sources/warc.py Ray pipeline, run HTML->text extraction, and report
    (url, text_len) — rows-only; tests/test_warc.py holds the
    round-trip-identity oracle against the canonical webpages table."""
    import pyarrow.compute as pc

    from fdblucene_ray.sources.warc import read_warc, synth_warc_files
    from fdblucene_ray.sources.webpages import extract_text_batch

    paths = synth_warc_files(
        os.path.join(CACHE_ROOT, "warc-fixture"), 500,
        rows_per_file=125, gzip_per_record=True,
    )
    ds = read_warc(paths).map_batches(
        extract_text_batch, batch_format="pyarrow"
    )

    def lens(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "text_len": pc.binary_length(t["text_extracted"]).cast(
                    pa.int64()
                ),
            }
        )

    df = ds.map_batches(lens, batch_format="pyarrow").to_pandas()
    df = df.sort_values("url").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def q_lm_score_bigram(sf_dir: str) -> pa.Table:
    """Bigram-LM quality scoring (CCNet KenLM-filter direction): top-300
    bigram model with exact c(w1 .) denominators, OOV floor 1/T; per-doc
    mean bigram NLL + OOV fraction (ops/lmscore.lm_score_bigram)."""
    from fdblucene_ray.ops.lmscore import lm_score_bigram

    out = lm_score_bigram(
        _docs_ds(sf_dir, ["doc_id", "text"]), model_size=300
    )
    return _collect(out).sort_by("doc_id")


def q_ann_sq8(sf_dir: str) -> pa.Table:
    """Approximate cosine top-k over SQ8-reconstructed vectors
    (asymmetric distance, FAISS SQ8 search shape). The quantize +
    reconstruct arithmetic is deterministic double-precision math, so
    the WHOLE channel is SQL-replayed (floor/clip/reconstruct in the
    oracle); pytest additionally bounds recall vs the exact ranking."""
    from fdblucene_ray.ops.similarity import sq8_topk

    q = _query_vectors(sf_dir, [0, 1, 2])
    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["vec_id", "embedding"]
    )
    return sq8_topk(ds, q, [0, 1, 2], k=10)


def q_ann_sq8_stored(sf_dir: str) -> pa.Table:
    """SQ8 serving from the AT-REST code store: build_sq8_store writes
    (id, codes list<uint8>) once — 4x smaller than the float32
    embeddings — and sq8_topk_stored reconstructs and ranks from the
    codes alone (the float column is never read again). Same
    reconstruct arithmetic as ann_sq8, so the SAME SQL oracle."""
    from fdblucene_ray.ops.similarity import (
        build_sq8_store,
        sq8_topk_stored,
    )

    q = _query_vectors(sf_dir, [0, 1, 2])
    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["vec_id", "embedding"]
    )
    store = _index_dir(sf_dir, "sq8-store")
    build_sq8_store(ds, store)
    return sq8_topk_stored(store, q, [0, 1, 2], k=10)


def q_ft_mmr(sf_dir: str) -> pa.Table:
    """MMR-diversified search: BM25 top-50 for 'data stream' re-ranked
    by Maximal Marginal Relevance over the docs' embedding twins
    (ops/hybrid.mmr_rerank — candidates-only hydration + driver greedy).
    The fixed-depth greedy is deterministic arithmetic, so it unrolls
    into k chained MATERIALIZED CTE stages in the SQL oracle
    (_mmr_sql); pytest additionally holds the brute-force oracle."""
    from fdblucene_ray.ops.hybrid import mmr_rerank

    s = Searcher(_ensure_index(sf_dir, "simple"))
    hits = s.search("data stream", k=50, mode="exhaustive")
    out = mmr_rerank(hits, _emb_path(sf_dir), k=10, lam=0.7)
    return pa.table(
        {
            "rank": pa.array(range(len(out)), pa.int64()),
            "doc_id": pa.array([d for d, _ in out], pa.int64()),
            "score": _round_col(
                np.array([sc for _, sc in out], np.float64), 6
            ),
        }
    )


def q_sq8_codes(sf_dir: str) -> pa.Table:
    """SQ8 scalar quantization (FAISS ScalarQuantizer QT_8bit analog):
    per-dim min/max training pass, then map-only uint8 coding
    (ops/similarity.sq8_quantize). Codes exploded long-form for the SQL
    compare; the op itself returns compact list<uint8> rows."""
    from fdblucene_ray.ops.similarity import sq8_quantize

    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["vec_id", "embedding"]
    )
    rows = sq8_quantize(ds).take_all()
    rows.sort(key=lambda r: r["vec_id"])
    ids, dims, codes = [], [], []
    for r in rows:
        c = np.asarray(r["codes"], np.int64)
        ids.append(np.full(len(c), int(r["vec_id"]), np.int64))
        dims.append(np.arange(1, len(c) + 1, dtype=np.int64))
        codes.append(c)
    return pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids)),
            "dim": pa.array(np.concatenate(dims)),
            "code": pa.array(np.concatenate(codes)),
        }
    )


def q_ppl_buckets(sf_dir: str) -> pa.Table:
    """CCNet head/middle/tail perplexity split: per source, docs ranked
    by unigram-LM mean NLL and ntile(3)-bucketed
    (ops/lmscore.ppl_buckets — one hashed-partition exchange of
    (source, id, nll) triples)."""
    from fdblucene_ray.ops.lmscore import ppl_buckets

    out = ppl_buckets(
        _docs_ds(sf_dir, ["doc_id", "text", "source"]), vocab_size=200, k=3
    )
    df = out.to_pandas().sort_values(["source", "bucket"]).reset_index(
        drop=True
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def q_label_centroids(sf_dir: str) -> pa.Table:
    """Mean-pooled centroid per label (class prototypes): long-form
    (label, dim, avg) rows via per-batch |labels|xD partial sums
    (ops/clustering.label_centroids)."""
    from fdblucene_ray.ops.clustering import label_centroids

    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["embedding", "label"]
    )
    df = label_centroids(ds).to_pandas().sort_values(
        ["label", "dim"]
    ).reset_index(drop=True)
    out = pa.Table.from_pandas(df, preserve_index=False)
    return pa.table(
        {
            "label": out["label"].cast(pa.int64()),
            "dim": out["dim"],
            "avg": out["avg"],
        }
    )


def q_knn_prefilter(sf_dir: str) -> pa.Table:
    """Filtered vector search (KnnFloatVectorQuery + filter analog):
    cosine top-10 to the vec_id-0 query among ONLY the vectors whose
    twin document matches the term 'data' — the match set comes from
    the inverted index, the vectors stream
    (ops/similarity.filtered_topk)."""
    from fdblucene_ray.ops.similarity import filtered_topk

    s = Searcher(_ensure_index(sf_dir, "simple"))
    allowed = np.sort(s.multiterm_docs("text", ["data"]))
    q = _query_vectors(sf_dir, [0])
    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["vec_id", "embedding"]
    )
    return filtered_topk(ds, q, [0], allowed, k=10)


def q_ann_range(sf_dir: str) -> pa.Table:
    """Radius (range) vector search: all vectors with cosine >= 0.3 to
    3 queries — FAISS range_search analog, map-only
    (ops/similarity.range_search)."""
    from fdblucene_ray.ops.similarity import range_search

    q = _query_vectors(sf_dir, [0, 1, 2])
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    return range_search(ds, q, [0, 1, 2], 0.3)


def q_ft_multi_index(sf_dir: str) -> pa.Table:
    """Federated search over TWO half-corpus indexes (MultiReader
    analog): collection stats sum across indexes, so BM25 top-10 for
    'data merge' is identical to one index over the whole corpus — the
    oracle is the ordinary single-corpus SQL twin."""
    import pyarrow.parquet as pq_

    key = hashlib.sha1(f"{sf_dir}:multi2:v1".encode()).hexdigest()[:12]
    root = os.path.join(CACHE_ROOT, f"multi-{key}")
    t = pq_.read_table(_docs_path(sf_dir), columns=["doc_id", "text"])
    half = t.num_rows // 2
    fields = {"text": {"column": "text", "analyzer": "simple"}}
    dirs = []
    for i, (lo, hi) in enumerate(((0, half), (half, t.num_rows))):
        part = os.path.join(root, f"part{i}.parquet")
        ix = os.path.join(root, f"ix{i}")
        if not os.path.exists(part):
            os.makedirs(root, exist_ok=True)
            pq_.write_table(t.slice(lo, hi - lo), part)
        build_index(
            part, ix, fields=fields, num_partitions=8, doc_base=lo
        )
        dirs.append(ix)
    s = Searcher.multi(dirs)
    return _hits_table(s.search_terms(["data", "merge"], 10, mode="wand"))


def q_ft_scatter_gather(sf_dir: str) -> pa.Table:
    """Distributed scatter-gather search: THREE doc-sharded indexes,
    one searcher ACTOR per shard, DFS query-then-fetch (global df/avgdl
    summed in phase 1, shard-local top-k with injected global stats in
    phase 2, driver merge). BM25 top-10 for 'data window' is identical
    to one whole-corpus index, so the oracle is the ordinary BM25 SQL
    twin — the multi-node layout leaves scores bit-unchanged."""
    import pyarrow.parquet as pq_

    from fdblucene_ray.index.distributed import DistributedSearcher

    key = hashlib.sha1(f"{sf_dir}:scatter3:v1".encode()).hexdigest()[:12]
    root = os.path.join(CACHE_ROOT, f"scatter-{key}")
    t = pq_.read_table(_docs_path(sf_dir), columns=["doc_id", "text"])
    n = t.num_rows
    cuts = [0, n // 3, 2 * n // 3, n]
    fields = {"text": {"column": "text", "analyzer": "simple"}}
    dirs = []
    for i, (lo, hi) in enumerate(zip(cuts, cuts[1:])):
        part = os.path.join(root, f"part{i}.parquet")
        ix = os.path.join(root, f"ix{i}")
        if not os.path.exists(part):
            os.makedirs(root, exist_ok=True)
            pq_.write_table(t.slice(lo, hi - lo), part)
        build_index(part, ix, fields=fields, num_partitions=8, doc_base=lo)
        dirs.append(ix)
    # fractional actor CPUs: a small fleet must never deadlock the
    # driver's session by reserving whole cores (the conftest session
    # runs at 4 CPUs; production sizes this to cores-per-shard-node)
    fleet = DistributedSearcher(dirs, num_cpus_per_shard=0.5)
    try:
        return _hits_table(fleet.search_terms(["data", "window"], 10))
    finally:
        fleet.shutdown()


def q_hybrid_rrf(sf_dir: str) -> pa.Table:
    """Hybrid retrieval: BM25 top-20 for 'data merge' fused with
    embedding-cosine top-20 for query vector 0 via Reciprocal Rank
    Fusion (1/(60+rank)); top-10 by fused score. The lexical leg runs
    the inverted index, the dense leg the broadcast-matmul ANN — only
    the two depth-bounded rank lists meet at the fuse."""
    from fdblucene_ray.ops.hybrid import hybrid_search

    s = Searcher(_ensure_index(sf_dir, "simple"))
    q = _query_vectors(sf_dir, [0])
    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["vec_id", "embedding"]
    )
    return hybrid_search(
        s, ["data", "merge"], ds, q, 0, k=10, depth=20, c=60
    )


def q_hybrid_weighted(sf_dir: str) -> pa.Table:
    """Weighted score fusion (CombSUM): BM25 top-20 (scores rounded to
    4 dp — the defined fusion input on both sides) and cosine top-20
    (5 dp), min-max normalized per leg, summed 1.0*text + 0.5*dense,
    top-10 by fused score."""
    from fdblucene_ray.ops.hybrid import score_fuse
    from fdblucene_ray.ops.hashing import round_half_away
    from fdblucene_ray.ops.similarity import brute_force_topk

    s = Searcher(_ensure_index(sf_dir, "simple"))
    bm25 = [
        (d, float(round_half_away(np.float64(sc), 4)))
        for d, sc in s.search_terms(["data", "merge"], 20, mode="wand")
    ]
    q = _query_vectors(sf_dir, [0])
    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["vec_id", "embedding"]
    )
    ann_tbl = brute_force_topk(ds, q, [0], k=20)
    ann = list(
        zip(ann_tbl["vec_id"].to_pylist(), ann_tbl["sim"].to_pylist())
    )
    t = score_fuse([bm25, ann], [1.0, 0.5], k=10)
    return t.rename_columns(
        ["doc_id", "fused", "bm25_norm", "ann_norm"]
    )


def q_rank_eval(sf_dir: str) -> pa.Table:
    """Retrieval-quality evaluation (trec_eval analog,
    ops/evalrank.py): three single-term sort-by-field runs (top-20 by
    n_chars desc) scored against deterministic graded qrels (for qid
    q, docs with doc_id % (3+q) == 0, rel = 1 + (doc_id // (3+q)) % 2)
    — per-query MRR / P@10 / recall@10 / AP@10 / nDCG@10 via ONE
    hash(qid) shuffle and vectorized run arithmetic."""
    from fdblucene_ray.ops.evalrank import rank_eval

    s = Searcher(_ensure_index(sf_dir, "simple"))
    terms = ["data", "merge", "stream"]
    qids, docs, ranks = [], [], []
    for qid, term in enumerate(terms):
        hits = s.search_sort_by(
            term, k=20, value_source=_docs_path(sf_dir), value_col="n_chars"
        )
        for r, (d, _) in enumerate(hits, 1):
            qids.append(qid)
            docs.append(d)
            ranks.append(r)
    run = ray.data.from_arrow(
        pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "doc_id": pa.array(docs, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
            }
        )
    )

    out = _collect(rank_eval(run, _eval_qrels_ds(sf_dir), k=10))
    return out.sort_by("qid")


def _eval_qrels_ds(sf_dir: str) -> ray.data.Dataset:
    """Deterministic graded qrels streamed from the documents table:
    for qid q, docs with doc_id % (3+q) == 0 are relevant with grade
    1 + (doc_id // (3+q)) % 2, and docs with doc_id % (3+q) == 1 are
    JUDGED NONRELEVANT (rel = 0 — feeds judged@k and bpref). Shared by
    the rank_eval / similarity-AB oracles."""

    def mk_qrels(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        parts = []
        for q in range(3):
            mod = 3 + q
            sel = ids[ids % mod == 0]
            parts.append(
                pa.table(
                    {
                        "qid": pa.array(np.full(len(sel), q, np.int64)),
                        "doc_id": pa.array(sel),
                        "rel": pa.array(1 + (sel // mod) % 2),
                    }
                )
            )
            nonrel = ids[ids % mod == 1]
            parts.append(
                pa.table(
                    {
                        "qid": pa.array(np.full(len(nonrel), q, np.int64)),
                        "doc_id": pa.array(nonrel),
                        "rel": pa.array(np.zeros(len(nonrel), np.int64)),
                    }
                )
            )
        return pa.concat_tables(parts)

    return _docs_ds(sf_dir, ["doc_id"]).map_batches(
        mk_qrels, batch_format="pyarrow"
    )


def q_eval_similarity_ab(sf_dir: str) -> pa.Table:
    """The tuning loop a search team actually runs: the SAME queries
    under two Similarity implementations (BM25 vs ClassicSimilarity
    TF-IDF — the U6 SPI swap), both runs scored with rank_eval against
    the same graded qrels; one row per (config, qid). The retrieval
    legs and the metric math are each independently oracled; this
    composes them into the A/B readout."""
    from fdblucene_ray.ops.evalrank import rank_eval

    s = Searcher(_ensure_index(sf_dir, "simple"))
    terms = ["data", "merge", "stream"]
    qrels = _eval_qrels_ds(sf_dir)
    outs = []
    for config in ("bm25", "classic"):
        qids, docs, ranks = [], [], []
        for qid, term in enumerate(terms):
            if config == "bm25":
                hits = s.search_terms([term], 20, mode="wand")
            else:
                hits = s.search(term, 20, similarity="classic")
            for r, (d, _) in enumerate(hits, 1):
                qids.append(qid)
                docs.append(d)
                ranks.append(r)
        run = ray.data.from_arrow(
            pa.table(
                {
                    "qid": pa.array(qids, pa.int64()),
                    "doc_id": pa.array(docs, pa.int64()),
                    "rank": pa.array(ranks, pa.int64()),
                }
            )
        )
        t = _collect(rank_eval(run, qrels, k=10)).sort_by("qid")
        outs.append(
            t.add_column(
                0, "config", pa.array([config] * t.num_rows, pa.string())
            )
        )
    return pa.concat_tables(outs)


def q_ann_batch(sf_dir: str) -> pa.Table:
    from fdblucene_ray.ops.similarity import brute_force_topk

    ids = [0, 1, 2, 3, 4]
    q = _query_vectors(sf_dir, ids)
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    return brute_force_topk(ds, q, ids, k=3)


def q_ann_ivf(sf_dir: str) -> pa.Table:
    """IVF over the centroid-PARTITIONED layout: only probed
    ``centroid=K/`` partitions are read (I/O pruning at the source)."""
    from fdblucene_ray.ops.similarity import build_ivf_index, ivf_topk_indexed

    ids = [0, 1, 2]
    q = _query_vectors(sf_dir, ids)
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    ivf_dir = _index_dir(sf_dir, "ivf")
    build_ivf_index(ds, ivf_dir, n_centroids=16)
    return ivf_topk_indexed(ivf_dir, q, ids, k=10, nprobe=4)


def q_ann_ivf_full(sf_dir: str) -> pa.Table:
    """IVF with EVERY partition probed (nprobe = n_centroids): the
    approximate path degrades to exact — pinned against the brute-force
    SQL oracle. Proves the partitioned layout loses no vectors and the
    per-partition top-k merge is exact."""
    from fdblucene_ray.ops.similarity import build_ivf_index, ivf_topk_indexed

    ids = [0, 1, 2]
    q = _query_vectors(sf_dir, ids)
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    ivf_dir = _index_dir(sf_dir, "ivf")
    build_ivf_index(ds, ivf_dir, n_centroids=16)
    return ivf_topk_indexed(ivf_dir, q, ids, k=10, nprobe=16)


def q_ann_graph(sf_dir: str) -> pa.Table:
    """Graph ANN: per-partition Vamana graphs (DiskANN, Subramanya et
    al. NeurIPS'19) over the IVF centroid layout; queries beam-search
    only the probed partitions' graphs. Approximate and iterative =>
    rows-only; tests/test_graphann.py holds the recall-vs-brute-force,
    determinism and resumability oracles."""
    from fdblucene_ray.ops.graphann import build_graph_index, graph_topk_indexed

    ids = [0, 1, 2]
    q = _query_vectors(sf_dir, ids)
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    g_dir = _index_dir(sf_dir, "graphann")
    build_graph_index(ds, g_dir, n_centroids=8, R=16, L_build=32)
    return graph_topk_indexed(g_dir, q, ids, k=10, nprobe=2, L_search=64)


def q_ann_ivf_append(sf_dir: str) -> pa.Table:
    """Streaming ANN ingest: build IVF over the first half of the
    embeddings, APPEND the second half as an atomic idempotent batch
    (ops/similarity.append_ivf_index), then full-probe search — exact
    over the union, pinned to the same brute-force SQL oracle as
    ann_ivf_full (proves appends lose no vectors and probing reads
    the append batches)."""
    from fdblucene_ray.ops.similarity import (
        append_ivf_index,
        build_ivf_index,
        ivf_topk_indexed,
    )

    ids = [0, 1, 2]
    q = _query_vectors(sf_dir, ids)
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    n = ds.count()
    half = n // 2
    base = ds.filter(expr=f"vec_id < {half}")
    rest = ds.filter(expr=f"vec_id >= {half}")
    ivf_dir = _index_dir(sf_dir, "ivf-append")
    build_ivf_index(base, ivf_dir, n_centroids=16)
    append_ivf_index(rest, ivf_dir, "b1")
    append_ivf_index(rest, ivf_dir, "b1")  # duplicate append: no-op
    return ivf_topk_indexed(ivf_dir, q, ids, k=10, nprobe=16)


def q_ann_tune(sf_dir: str) -> pa.Table:
    """IVF nprobe auto-tune: walk doubling probe widths until sampled
    recall@10 vs the full-probe ground truth meets 0.9; returns the
    auditable recall curve (ops/similarity.tune_nprobe). Rows-only
    (probing isn't SQL-expressible); pytest holds the monotone-recall
    and exact-at-full-probe oracles."""
    from fdblucene_ray.ops.similarity import build_ivf_index, tune_nprobe

    ids = [0, 1, 2, 3, 4, 5]
    q = _query_vectors(sf_dir, ids)
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    ivf_dir = _index_dir(sf_dir, "ivf")
    build_ivf_index(ds, ivf_dir, n_centroids=16)
    return tune_nprobe(ivf_dir, q, k=10, target_recall=0.9)


def q_ann_maxsim(sf_dir: str) -> pa.Table:
    """ColBERT-style late interaction (Khattab & Zaharia SIGIR'20):
    docs are BAGS of token vectors (vec_id // 4 groups the embeddings
    table into multi-vector docs), score = sum over query tokens of
    the max cosine against any doc vector. Combiner-first: per-batch
    partial maxima -> groupby(doc).Max -> distributed sort().limit
    (ops/similarity.maxsim_topk); only |docs| x Q floats shuffle."""
    from fdblucene_ray.ops.similarity import maxsim_topk

    q = _query_vectors(sf_dir, [0, 1, 2, 3])
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])

    def add_doc(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        # integer divide truncates == floor for the non-negative ids
        return t.append_column(
            "doc", pc_.cast(pc_.divide(t["vec_id"], 4), pa.int64())
        )

    return maxsim_topk(ds.map_batches(add_doc, batch_format="pyarrow"), q, k=10)


def q_ann_maxsim_rerank(sf_dir: str) -> pa.Table:
    """Two-stage ColBERT serving: cheap proxy (best single-vector
    cosine vs the MEAN query vector) keeps 50 candidate docs, exact
    MaxSim reranks only those (broadcast id filter — no shuffle in
    stage 2); both stages SQL-replayed end-to-end
    (ops/similarity.maxsim_rerank)."""
    from fdblucene_ray.ops.similarity import maxsim_rerank

    q = _query_vectors(sf_dir, [0, 1, 2, 3])
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])

    def add_doc(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        return t.append_column(
            "doc", pc_.cast(pc_.divide(t["vec_id"], 4), pa.int64())
        )

    return maxsim_rerank(
        ds.map_batches(add_doc, batch_format="pyarrow"), q,
        n_candidates=50, k=10,
    )


def q_ann_maxsim_plaid(sf_dir: str) -> pa.Table:
    """INDEXED two-stage ColBERT serving (PLAID shape, Santhanam et
    al. CIKM'22): stage 1 probes a token-level IVF layout per query
    token (build_ivf_index over the exploded multi-vector table, doc
    column carried through) and unions each token's top-30 docs;
    stage 2 reruns exact MaxSim over only those docs. Full probe here
    so the whole composition is SQL-replayable; partial-probe pruning
    + recall are pinned by pytest (test_graphann.TestMaxSimPlaid)."""
    from fdblucene_ray.ops.similarity import (
        build_ivf_index,
        maxsim_rerank_indexed,
    )

    q = _query_vectors(sf_dir, [0, 1, 2, 3])
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])

    def add_doc(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        return t.append_column(
            "doc", pc_.cast(pc_.divide(t["vec_id"], 4), pa.int64())
        )

    exploded = ds.map_batches(add_doc, batch_format="pyarrow")
    idx = _index_dir(sf_dir, "maxsim-ivf")
    build_ivf_index(exploded, idx, n_centroids=16)

    def hydrate_candidates(doc_ids):
        # stage-2 pushdown: only the candidate docs' token rows leave
        # the parquet scan (row-group pruned on the doc-sorted file)
        import numpy as np_
        import pyarrow.compute as pc_

        vids = (
            np_.asarray(doc_ids, np_.int64)[:, None] * 4
            + np_.arange(4)
        ).ravel()
        return ray.data.read_parquet(
            _emb_path(sf_dir), columns=["vec_id", "embedding"],
            filter=pc_.field("vec_id").isin(vids.tolist()),
        ).map_batches(add_doc, batch_format="pyarrow")

    return maxsim_rerank_indexed(
        exploded, idx, q, nprobe=16, per_token=30, k=10,
        candidate_source=hydrate_candidates,
    )


def q_ann_lsh(sf_dir: str) -> pa.Table:
    """Sign-LSH ANN over the bucket-PARTITIONED layout: multi-probe
    reads only probed ``bucket=K/`` partitions (data-independent hash —
    no training pass). Approximate; recall pinned by pytest
    (test_lsh_indexed_prunes_partitions)."""
    from fdblucene_ray.ops.similarity import build_lsh_index, lsh_topk_indexed

    ids = [0, 1, 2]
    q = _query_vectors(sf_dir, ids)
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    lsh_dir = _index_dir(sf_dir, "lsh")
    build_lsh_index(ds, lsh_dir, n_bits=8)
    return lsh_topk_indexed(lsh_dir, q, ids, k=10, nprobe=32)


def q_ann_lsh_full(sf_dir: str) -> pa.Table:
    """Sign-LSH with EVERY bucket probed (nprobe = 2**n_bits): the
    approximate path degrades to exact — pinned against the brute-force
    SQL oracle. Proves the bucket-partitioned layout loses no vectors
    and the per-bucket top-k merge is exact."""
    from fdblucene_ray.ops.similarity import build_lsh_index, lsh_topk_indexed

    ids = [3, 4, 5]
    q = _query_vectors(sf_dir, ids)
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    lsh_dir = _index_dir(sf_dir, "lsh6")
    build_lsh_index(ds, lsh_dir, n_bits=6)
    return lsh_topk_indexed(lsh_dir, q, ids, k=10, nprobe=64)


def q_dedup_embedding(sf_dir: str) -> pa.Table:
    """Embedding-cosine near-dup pairs (exact mode at oracle scale so
    the DuckDB all-pairs oracle matches bit-for-set)."""
    from fdblucene_ray.ops.similarity import embedding_near_dups

    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    return embedding_near_dups(ds, threshold=0.4, exact=True)


def q_semantic_dedup(sf_dir: str) -> pa.Table:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-bucketed
    cosine dup components over embeddings, keep each component's
    farthest-from-centroid member. Returns the kept vec ids (iterative
    sampled k-means => rows-only; tests/test_ops.py holds the
    planted-group and exact-vs-brute-force-policy oracles)."""
    from fdblucene_ray.ops.similarity import semantic_dedup

    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["vec_id", "embedding"]
    )
    out = semantic_dedup(ds, threshold=0.4, n_centroids=8)
    kept = out.select_columns(["vec_id"]).to_pandas().sort_values("vec_id")
    return pa.table({"vec_id": pa.array(kept["vec_id"].to_numpy(np.int64))})


def q_curate_then_index(sf_dir: str) -> pa.Table:
    """End-to-end composition: curate the corpus (same parameters as
    `curate`), index ONLY the kept docs, and run a BM25 top-10 for
    'data merge' over the curated index — collection stats are those of
    the kept corpus. At 100 TB the keep-list is a doc_id-partitioned
    parquet probed per batch; here the kept ids broadcast via ray.put.
    """
    import pyarrow.compute as pc

    from fdblucene_ray.pipelines.curate import curate_corpus

    def _bench_filter(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((ids % 100) == 7))

    bench = (
        _docs_ds(sf_dir, ["doc_id", "text"])
        .map_batches(_bench_filter, batch_format="pyarrow")
        .to_pandas()["text"]
    )
    verdicts = curate_corpus(
        _docs_ds(sf_dir, ["doc_id", "text"]),
        list(bench),
        lang="en", min_tokens=10, min_stop_ratio=0.05, ngram=3,
        sample_rate=0.9,
    )

    def _kept_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["keep"], 1)).select(["doc_id"])

    kept = np.sort(
        _collect(
            verdicts.map_batches(_kept_only, batch_format="pyarrow")
        )["doc_id"].to_numpy()
    )
    kept_ref = ray.put(kept)

    def _filter_corpus(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        m = ray.get(kept_ref)
        pos = np.searchsorted(m, ids)
        pos[pos == len(m)] = 0
        return batch.filter(pa.array(m[pos] == ids))

    ix = _index_dir(sf_dir, "curated")
    if not os.path.isdir(os.path.join(ix, "segments")):
        ds = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
            _filter_corpus, batch_format="pyarrow"
        )
        build_index(
            ds, ix,
            fields={"text": {"column": "text", "analyzer": "simple"}},
            num_partitions=8, batch_size=2048,
        )
    s = Searcher(ix)
    return _hits_table(s.search("data merge", 10))


def q_group_quantiles(sf_dir: str) -> pa.Table:
    """Per-event-type p50/p95/p99 of value from distributed fixed-width
    histograms (ops/quantiles.py) — binned-exact, bin_width=5."""
    from fdblucene_ray.ops.quantiles import group_quantiles

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value"],
    )
    out = group_quantiles(
        ds, key_col="event_type", value_col="value",
        qs=[0.5, 0.95, 0.99], bin_width=5.0,
    )
    return _collect(out).sort_by(
        [("key", "ascending"), ("q", "ascending")]
    )


def q_dup_components(sf_dir: str) -> pa.Table:
    """Duplicate clusters: connected components (min-label
    propagation, ops/components.py) over the embedding near-dup pair
    graph — the chained-duplicate closure step after pairwise dedup."""
    from fdblucene_ray.ops.components import connected_components
    from fdblucene_ray.ops.similarity import embedding_near_dups

    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    pairs = embedding_near_dups(ds, threshold=0.4, exact=True)
    out = connected_components(
        ray.data.from_arrow(pairs.select(["a", "b"]))
    )
    return _collect(out).sort_by("node")


def q_multimodal_meta(sf_dir: str) -> pa.Table:
    """Binary-payload decode plumbing (stubbed decoder, real actor pool)."""
    import pyarrow.compute as pc

    from fdblucene_ray.ops.multimodal import decode_media

    ds = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: t.append_column(
            "payload", t["text"].combine_chunks().cast(pa.binary())
        ).drop_columns(["text"]),
        batch_format="pyarrow",
    )
    out = decode_media(ds, payload_col="payload", batch_size=256)
    return _collect(out.select_columns(["doc_id", "n_bytes"]))


def _media_ds(sf_dir: str) -> ray.data.Dataset:
    import pyarrow.compute as pc  # noqa: F401 (kept for parity with peers)

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: t.append_column(
            "payload", t["text"].combine_chunks().cast(pa.binary())
        ).drop_columns(["text"]),
        batch_format="pyarrow",
    )


def q_chunk_documents(sf_dir: str) -> pa.Table:
    """Sliding-window doc chunking (fixed-context layout): 64-token
    windows every 48 tokens, tail windows short."""
    from fdblucene_ray.ops.packing import chunk_documents

    out = chunk_documents(
        _docs_ds(sf_dir, ["doc_id", "text"]), max_tokens=64, stride=48
    )
    df = out.to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def q_audio_features(sf_dir: str) -> pa.Table:
    """REAL audio codec path (ops/audio.py): deterministic PCM16 WAVs
    synthesized per doc (pure sine, integer cycles), decoded by the
    RIFF chunk walker, DSP features via one vectorized rfft. The SQL
    twin regenerates the exact quantized signal (round-half-away on
    both sides) and recomputes RMS + zero crossings relationally; the
    FFT peak is checked against the planted analytic frequency."""
    from fdblucene_ray.ops.audio import audio_features, synth_wav_batch

    ds = _docs_ds(sf_dir, ["doc_id"]).map_batches(
        synth_wav_batch, batch_format="pyarrow"
    )
    out = _collect(audio_features(ds)).sort_by("doc_id")
    return out.select(
        ["doc_id", "sr", "n_samples", "rms", "zcr", "peak_freq_hz"]
    )


def q_audio_near_dup(sf_dir: str) -> pa.Table:
    """Audio near-duplicate pairs: scale-invariant spectral
    fingerprints (same signal at different volumes collides) through
    the shared simhash band machinery — only 8-byte fingerprints
    shuffle. Rows-only; tests/test_audio.py plants the ground truth."""
    from fdblucene_ray.ops.audio import audio_near_dup_pairs, synth_wav_batch

    ds = _docs_ds(sf_dir, ["doc_id"]).map_batches(
        synth_wav_batch, batch_format="pyarrow"
    )
    t = audio_near_dup_pairs(ds, max_hamming=0)
    return t


def q_media_dedup(sf_dir: str) -> pa.Table:
    """Exact media dedup over the binary payload column (digest
    groupby, keeper = min doc_id) — the multimodal twin of
    dedup_exact."""
    from fdblucene_ray.ops.multimodal import media_dedup_exact

    out = media_dedup_exact(_media_ds(sf_dir), payload_col="payload")
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            "dup_count": pa.array(df["dup_count"].to_numpy(np.int64)),
            "n_bytes": pa.array(df["n_bytes"].to_numpy(np.int64)),
        }
    )


def q_approx_users(sf_dir: str) -> pa.Table:
    """HyperLogLog approx COUNT(DISTINCT user_id) over events — the
    shuffle-free sketch path (map-only register partials, driver max-
    fold). Deterministic (seeded hash); error bound pinned by pytest
    (~1.04/sqrt(2^14)); no SQL oracle — approximation by design."""
    from fdblucene_ray.ops.sketches import approx_distinct

    est, _ = approx_distinct(_events_ds(sf_dir, ["user_id"]), "user_id")
    return pa.table({"approx_distinct_users": pa.array([est], pa.int64())})


def _events_ds(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=columns
    )


def _window_table(ds) -> pa.Table:
    df = ds.to_pandas().sort_values(["event_type", "window_start"]).reset_index(
        drop=True
    )
    from fdblucene_ray.ops.hashing import round_half_away
    sum_r = round_half_away(df["sum_value"].to_numpy(np.float64), 4)
    n = df["n_events"].to_numpy(np.int64)
    # mean derived from the ROUNDED sum on both sides: distributed and
    # SQL summation orders differ by ~1e-12, which flips round() exactly
    # at .xxxx5 boundaries — anchoring on the compared (rounded) sum
    # makes the comparison deterministic. The division creates EXACT
    # half-boundary values, where numpy rounds half-to-even but DuckDB
    # half-away-from-zero — use half-up explicitly (values positive).
    mean_r = np.floor((sum_r / n) * 1e4 + 0.5) / 1e4
    return pa.table(
        {
            "event_type": pa.array(df["event_type"], pa.string()),
            "window_start": pa.array(df["window_start"].astype("int64")),
            "n_events": pa.array(n),
            "sum_value": pa.array(sum_r),
            "mean_value": pa.array(mean_r.astype(np.float64)),
        }
    )


def q_window_tumbling(sf_dir: str) -> pa.Table:
    """Tumbling 1h windows over events: per (event_type, window) count,
    sum and mean of value (beyond-reference training-telemetry op)."""
    from fdblucene_ray.ops.windows import tumbling_window_agg

    ds = _events_ds(sf_dir, ["ts", "event_type", "value"])
    return _window_table(tumbling_window_agg(ds, window_s=3600))


def q_sessionize(sf_dir: str) -> pa.Table:
    """Gap-based sessionization of the events stream (30-min gap):
    per-user ordered split via groupby(user).map_groups."""
    from fdblucene_ray.ops.windows import sessionize

    ds = _events_ds(sf_dir, ["ts", "user_id"])
    df = (
        sessionize(ds, gap_s=1800)
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "user_id": pa.array(df["user_id"].to_numpy(np.int64)),
            "session_id": pa.array(df["session_id"].to_numpy(np.int64)),
            "session_start": pa.array(df["session_start"].to_numpy(np.int64)),
            "session_end": pa.array(df["session_end"].to_numpy(np.int64)),
            "n_events": pa.array(df["n_events"].to_numpy(np.int64)),
        }
    )


def q_window_sliding(sf_dir: str) -> pa.Table:
    """Sliding 1h windows hopping every 30min (each event in 2 windows)."""
    from fdblucene_ray.ops.windows import sliding_window_agg

    ds = _events_ds(sf_dir, ["ts", "event_type", "value"])
    return _window_table(
        sliding_window_agg(ds, window_s=3600, slide_s=1800)
    )


def q_multimodal_frames(sf_dir: str) -> pa.Table:
    """Frame-sampling plumbing: one binary payload -> 4 frame rows
    (stub sampler: equal byte slices; the row-expansion plumbing is
    real). Compared on per-frame byte counts."""
    import pyarrow.compute as pc

    from fdblucene_ray.ops.multimodal import sample_frames

    ds = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: t.append_column(
            "payload", t["text"].combine_chunks().cast(pa.binary())
        ).drop_columns(["text"]),
        batch_format="pyarrow",
    )
    out = sample_frames(ds, n_frames=4)
    df = out.to_pandas()
    df["n_bytes"] = df["frame"].map(len).astype("int64")
    df = df.sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            "frame_idx": pa.array(df["frame_idx"].to_numpy(np.int64)),
            "n_bytes": pa.array(df["n_bytes"].to_numpy(np.int64)),
        }
    )


def q_ft_payload_score(sf_dir: str) -> pa.Table:
    """PayloadScoreQuery analog: per-position payloads written at index
    time (payload = float32(len(term) + position), the deterministic
    PayloadHelper-float twin) and aggregated per doc at query time —
    avg over 'data' positions, top-10 by score desc, doc asc."""
    import struct

    from fdblucene_ray.index.termvectors import build_term_vectors, payload_score

    key = hashlib.sha1(f"{sf_dir}:tv-payload:v1".encode()).hexdigest()[:12]
    tv_dir = os.path.join(CACHE_ROOT, f"tv-{key}")
    build_term_vectors(
        _docs_path(sf_dir), tv_dir, analyzer="simple",
        payload_fn=lambda term, pos: struct.pack("<f", float(len(term) + pos)),
    )
    t = payload_score(tv_dir, "data", agg="avg", k=10)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "score": _round_col(
                t["score"].to_numpy(zero_copy_only=False), 4
            ),
        }
    )


def q_term_vectors(sf_dir: str) -> pa.Table:
    """Stored term vectors (offsets/payloads sidecar, DATA.md:54 analog):
    per (doc, term) tf and position span read back from the at-rest
    doc-major layout. Offsets are pytest-verified (exact identity with
    the offset-preserving analyzer twin, test_termvectors.py); the SQL
    twin checks term/position semantics."""
    import pyarrow.dataset as pads

    from fdblucene_ray.index.termvectors import build_term_vectors

    key = hashlib.sha1(f"{sf_dir}:tv-simple:v1".encode()).hexdigest()[:12]
    tv_dir = os.path.join(CACHE_ROOT, f"tv-{key}")
    build_term_vectors(_docs_path(sf_dir), tv_dir, analyzer="simple")
    t = pads.dataset(tv_dir, format="parquet").to_table(
        columns=["doc_id", "term", "positions"]
    )
    pos = t["positions"].combine_chunks()
    lens = np.diff(pos.offsets.to_numpy(zero_copy_only=False))
    flat = pos.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(lens[:-1])))
    ends = np.cumsum(lens) - 1
    out = pa.table(
        {
            "doc_id": t["doc_id"],
            "term": t["term"],
            "tf": pa.array(lens.astype(np.int64)),
            "min_pos": pa.array(flat[starts]),
            "max_pos": pa.array(flat[ends]),
        }
    )
    return out.sort_by([("doc_id", "ascending"), ("term", "ascending")])


def q_url_dedup(sf_dir: str) -> pa.Table:
    """Canonical-URL dedup: both sides synthesize the SAME url per doc
    (documents carry no url column), then canonicalize (strip fragment
    + tracking params, tidy separators, lowercase) and keep the
    smallest doc_id per canonical key."""
    import pyarrow.compute as pc

    from fdblucene_ray.ops.webtext import url_dedup

    def with_url(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        src = batch["source"].to_pylist()
        urls = [
            f"HTTPS://Example-{s}.COM/Path/{int(i) % 40}/"
            f"?utm_source=s{int(i)}&ref=keep#frag"
            for i, s in zip(d, src)
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "url": pa.array(urls, pa.string())}
        )

    ds = _docs_ds(sf_dir, ["doc_id", "source"]).map_batches(
        with_url, batch_format="pyarrow"
    )
    out = url_dedup(ds)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def q_scrub_spans(sf_dir: str) -> pa.Table:
    """Duplicated-substring removal (Lee et al. ACL'22 analog): tokens
    covered by any 8-token window occurring in >=2 distinct docs are
    scrubbed; reports per-doc removed-token counts."""
    from fdblucene_ray.ops.webtext import scrub_duplicated_spans

    out = scrub_duplicated_spans(
        _docs_ds(sf_dir, ["doc_id", "text"]), n=8, min_df=2
    )
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            "n_removed": pa.array(df["n_removed"].to_numpy(np.int64)),
        }
    )


def q_exact_dup_spans(sf_dir: str) -> pa.Table:
    """EXACT maximal duplicated-span report (Lee et al. ACL'22 exact
    half): maximal token regions covered by 8-token windows occurring
    in >=2 distinct docs, literal-byte verified (a 64-bit gram-hash
    collision cannot leak a non-duplicated span into the output)."""
    from fdblucene_ray.ops.webtext import exact_dup_spans

    out = exact_dup_spans(
        _docs_ds(sf_dir, ["doc_id", "text"]), n=8, min_df=2
    )
    df = out.to_pandas().sort_values(
        ["doc_id", "span_start"]
    ).reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            "span_start": pa.array(df["span_start"].to_numpy(np.int64)),
            "span_end": pa.array(df["span_end"].to_numpy(np.int64)),
            "n_tokens": pa.array(df["n_tokens"].to_numpy(np.int64)),
            "span_text": pa.array(df["span_text"], pa.string()),
        }
    )


def q_dedup_suffix(sf_dir: str) -> pa.Table:
    """Suffix-array exact-substring dedup (Lee et al. ACL'22 exact
    half at ARBITRARY match length, in bytes): maximal byte regions
    covered by 40-byte windows occurring in >=2 distinct docs,
    byte-exact via per-batch truncated prefix-doubling suffix sorting
    + a hash-partitioned candidate fold + literal window verification
    (ops/suffix.suffix_dup_spans). The token n-gram scrub
    (exact_dup_spans) remains the cheap path."""
    from fdblucene_ray.ops.suffix import suffix_dup_spans

    out = suffix_dup_spans(
        _docs_ds(sf_dir, ["doc_id", "text"]), min_len=40, min_df=2
    )
    df = out.to_pandas().sort_values(
        ["doc_id", "span_start"]
    ).reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            "span_start": pa.array(df["span_start"].to_numpy(np.int64)),
            "span_end": pa.array(df["span_end"].to_numpy(np.int64)),
            "n_bytes": pa.array(df["n_bytes"].to_numpy(np.int64)),
            # the corpus is ASCII/UTF-8-clean at window granularity
            # here; span bytes decode 1:1 for the SQL comparison
            "span_text": pa.array(
                [
                    x.decode() if isinstance(x, bytes) else str(x)
                    for x in df["span_text"]
                ],
                pa.string(),
            ),
        }
    )


def q_dedup_suffix_append(sf_dir: str) -> pa.Table:
    """Incremental suffix dedup: registry built over the first half of
    the corpus, second half APPENDED as an atomic registry batch (its
    bytes are suffix-sorted exactly once; the base is never re-sorted),
    duplicate appends are no-ops, and the folded registry reproduces
    the fresh pipeline bit-for-bit — same SQL oracle as dedup_suffix
    (ops/suffix.build_suffix_registry / append_suffix_registry /
    suffix_dup_spans_registry)."""
    from fdblucene_ray.ops.suffix import (
        append_suffix_registry,
        build_suffix_registry,
        suffix_dup_spans_registry,
    )

    full = _docs_ds(sf_dir, ["doc_id", "text"])
    n = full.count()
    half = n // 2
    reg = _index_dir(sf_dir, "suffix-reg")
    build_suffix_registry(
        full.filter(expr=f"doc_id < {half}"), reg, min_len=40, min_df=2
    )
    rest = full.filter(expr=f"doc_id >= {half}")
    append_suffix_registry(rest, reg, "b1")
    append_suffix_registry(rest, reg, "b1")  # duplicate append: no-op
    out = suffix_dup_spans_registry(full, reg)
    df = out.to_pandas().sort_values(
        ["doc_id", "span_start"]
    ).reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            "span_start": pa.array(df["span_start"].to_numpy(np.int64)),
            "span_end": pa.array(df["span_end"].to_numpy(np.int64)),
            "n_bytes": pa.array(df["n_bytes"].to_numpy(np.int64)),
            "span_text": pa.array(
                [
                    x.decode() if isinstance(x, bytes) else str(x)
                    for x in df["span_text"]
                ],
                pa.string(),
            ),
        }
    )


def q_scrub_suffix(sf_dir: str) -> pa.Table:
    """Lee et al.'s REMOVE half at byte granularity: splice out every
    byte covered by a 40-byte window duplicated across >=2 distinct
    docs (ops/suffix.scrub_suffix_spans — shares the suffix-sort
    candidate/verify machinery with dedup_suffix; docs without
    duplicates pass through byte-identical)."""
    from fdblucene_ray.ops.suffix import scrub_suffix_spans

    out = scrub_suffix_spans(
        _docs_ds(sf_dir, ["doc_id", "text"]), min_len=40, min_df=2
    )
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            "text": pa.array(df["text"], pa.string()),
            "n_removed": pa.array(df["n_removed"].to_numpy(np.int64)),
        }
    )


def q_chunk_dedup(sf_dir: str) -> pa.Table:
    """CCNet-style exact span dedup: non-overlapping 16-token chunks,
    corpus-wide duplicate marking (keeper = first (doc_id, chunk_idx)),
    per-doc dup-token fraction."""
    from fdblucene_ray.ops.webtext import chunk_dedup

    ds = chunk_dedup(_docs_ds(sf_dir, ["doc_id", "text"]), w=16)
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            "n_chunks": pa.array(df["n_chunks"].to_numpy(np.int64)),
            "n_dup_chunks": pa.array(df["n_dup_chunks"].to_numpy(np.int64)),
            "n_tokens": pa.array(df["n_tokens"].to_numpy(np.int64)),
            "n_dup_tokens": pa.array(df["n_dup_tokens"].to_numpy(np.int64)),
            "dup_token_frac": pa.array(df["dup_token_frac"].to_numpy(np.float64)),
        }
    )


def q_repetition(sf_dir: str) -> pa.Table:
    """Gopher-style repetition signals per doc (unique-token fraction,
    top bigram/trigram fractions)."""
    from fdblucene_ray.ops.webtext import repetition_signals

    return _collect(repetition_signals(_docs_ds(sf_dir, ["doc_id", "text"])))


def q_source_stats(sf_dir: str) -> pa.Table:
    """Per-source rollup with map-side combine (the broadcast-free
    partial-aggregation pattern)."""
    from fdblucene_ray.ops.webtext import source_stats

    return source_stats(_docs_ds(sf_dir, ["doc_id", "text", "source", "lang"]))


def q_bpe_pairs(sf_dir: str) -> pa.Table:
    """Corpus-wide top-50 adjacent token pairs (BPE merge candidates):
    combined partials -> groupby sum -> distributed top-k."""
    from fdblucene_ray.ops.webtext import bpe_pair_counts

    return bpe_pair_counts(_docs_ds(sf_dir, ["doc_id", "text"]), top_k=50)


def q_normalize_text(sf_dir: str) -> pa.Table:
    """Whitespace-collapsing lowercase normalization (exact string
    compare against the SQL twin — the byte-identical-text invariant)."""
    from fdblucene_ray.ops.webtext import normalize_text

    return _collect(normalize_text(_docs_ds(sf_dir, ["doc_id", "text"])))


def q_decontam(sf_dir: str) -> pa.Table:
    """Benchmark decontamination: docs with doc_id % 100 == 7 play the
    role of a leaked eval set; every other doc is checked for shared
    trigrams (GPT-3 appendix-C n-gram-overlap shape; the driver query
    uses n=3 so the DuckDB twin is a two-join trigram build)."""
    import pyarrow.compute as pc

    from fdblucene_ray.ops.curation import decontaminate

    def _mod_filter(want: bool):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 100) == 7
            return batch.filter(pa.array(m if want else ~m))

        return f

    bench = (
        _docs_ds(sf_dir, ["doc_id", "text"])
        .map_batches(_mod_filter(True), batch_format="pyarrow")
        .to_pandas()["text"]
    )
    ds = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        _mod_filter(False), batch_format="pyarrow"
    )
    out = _collect(decontaminate(ds, list(bench), n=3))
    return out.sort_by("doc_id")


def q_pii_scrub(sf_dir: str) -> pa.Table:
    """PII masking (email/IPv4/phone) with per-doc match counts; both
    sides run the same RE2 patterns (pyarrow and DuckDB share the RE2
    engine), so the scrubbed text is compared byte-identically."""
    from fdblucene_ray.ops.curation import scrub_pii

    return _collect(
        scrub_pii(_docs_ds(sf_dir, ["doc_id", "text"]))
    ).sort_by("doc_id")


def q_sample_hash(sf_dir: str) -> pa.Table:
    """Deterministic 10% sample on knuth_hash32(doc_id) — reproducible
    across runs/retries/cluster sizes (vs random_sample)."""
    from fdblucene_ray.ops.curation import sample_hash

    out = sample_hash(_docs_ds(sf_dir, ["doc_id", "lang", "source"]), 0.1)
    return _collect(out).sort_by("doc_id")


def q_sample_stratified(sf_dir: str) -> pa.Table:
    """Per-language deterministic top-20 sample (partial top-n combine
    before the groupby exchange)."""
    from fdblucene_ray.ops.curation import sample_stratified

    out = sample_stratified(
        _docs_ds(sf_dir, ["doc_id", "lang"]), "lang", 20
    )
    return _collect(out).sort_by("doc_id")


def q_curate(sf_dir: str) -> pa.Table:
    """Composed curation pipeline (dedup -> lang -> quality ->
    decontaminate -> sample): per-doc (keep, reason) verdict, fully
    replayed relationally by the SQL oracle. One text pass + one
    narrow flag shuffle (pipelines/curate.py)."""
    from fdblucene_ray.pipelines.curate import curate_corpus

    def _bench_filter(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((ids % 100) == 7))

    bench = (
        _docs_ds(sf_dir, ["doc_id", "text"])
        .map_batches(_bench_filter, batch_format="pyarrow")
        .to_pandas()["text"]
    )
    out = curate_corpus(
        _docs_ds(sf_dir, ["doc_id", "text"]),
        list(bench),
        lang="en",
        min_tokens=10,
        min_stop_ratio=0.05,
        ngram=3,
        sample_rate=0.9,
    )
    return _collect(out).sort_by("doc_id")


def q_ft_dismax(sf_dir: str) -> pa.Table:
    """DisjunctionMaxQuery analog over (text, source): score = best
    field subtotal + 0.3 x the rest (index/search.py search_dismax)."""
    s = Searcher(_ensure_index(sf_dir, "mf"))
    return _hits_table(
        s.search_dismax("data src3", ["text", "source"], k=10, tie=0.3)
    )


def q_ft_facet_ranges(sf_dir: str) -> pa.Table:
    """Numeric range facets (LongRangeFacetCounts analog): docs
    matching 'data' counted per n_chars bucket; values stream from the
    input parquet against the broadcast match set."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    fc = s.facet_ranges(
        "data",
        [("lt200", None, 200), ("200_400", 200, 400), ("ge400", 400, None)],
        value_source=_docs_path(sf_dir),
        value_col="n_chars",
    )
    return pa.table(
        {
            "bucket": pa.array([b for b, _ in fc], pa.string()),
            "n": pa.array([c for _, c in fc], pa.int64()),
        }
    )


def q_ft_collapse(sf_dir: str) -> pa.Table:
    """Field collapsing (grouping analog): best 'data merge' hit per
    source value, groups ranked by best score."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    rows = s.search_collapse(
        "data merge", k=10, collapse_col="source", source=_docs_path(sf_dir)
    )
    return pa.table(
        {
            "source": pa.array([g for g, _, _ in rows], pa.string()),
            "doc_id": pa.array([d for _, d, _ in rows], pa.int64()),
            "score": _round_col(
                np.array([s_ for _, _, s_ in rows] or [], np.float64), 4
            ),
        }
    )


def q_ft_suggest(sf_dir: str) -> pa.Table:
    """Did-you-mean (DirectSpellChecker analog): dictionary terms
    within 2 edits of the misspelling 'strean', ranked (dist, df desc,
    term)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    rows = s.suggest("strean", k=5, max_edits=2, prefix_len=1)
    return pa.table(
        {
            "term": pa.array([t for t, _, _ in rows], pa.string()),
            "df": pa.array([d for _, d, _ in rows], pa.int64()),
            "dist": pa.array([x for _, _, x in rows], pa.int64()),
        }
    )


def q_top_terms_per_source(sf_dir: str) -> pa.Table:
    """Per-group heavy hitters: top-3 terms of each source
    (ops/textstats.py top_terms_per_group)."""
    from fdblucene_ray.ops.textstats import top_terms_per_group

    out = top_terms_per_group(
        _docs_ds(sf_dir, ["source", "text"]), group_col="source", n=3
    )
    return _collect(out).sort_by(
        [("grp", "ascending"), ("rank", "ascending")]
    )


def q_asof_join(sf_dir: str) -> pa.Table:
    """As-of join: every purchase event joined to the latest signup at
    or before it for the same user (ops/joins.py)."""
    import pyarrow.compute as pc

    from fdblucene_ray.ops.joins import asof_join

    path = os.path.join(sf_dir, "events.parquet")
    cols = ["event_id", "ts", "user_id", "value"]
    left = ray.data.read_parquet(
        path, columns=cols, filter=(pc.field("event_type") == "purchase")
    )
    right = ray.data.read_parquet(
        path, columns=cols, filter=(pc.field("event_type") == "signup")
    )
    out = asof_join(left, right, key_col="user_id")
    return _collect(out).sort_by("event_id")


def q_cooccurrence(sf_dir: str) -> pa.Table:
    """Top-50 windowed co-occurrence pairs (window=5, unordered,
    count desc) with PMI from unigram marginals (ops/cooc.py)."""
    from fdblucene_ray.ops.cooc import cooccurrence_pmi

    return cooccurrence_pmi(
        _docs_ds(sf_dir, ["doc_id", "text"]), window=5, top_k=50
    )


def q_lm_score(sf_dir: str) -> pa.Table:
    """Unigram-LM quality scoring (CCNet-style perplexity filter):
    train top-200 unigram model over the corpus, score every doc's
    mean NLL + OOV fraction under the broadcast model
    (ops/lmscore.py)."""
    from fdblucene_ray.ops.lmscore import lm_score

    out = lm_score(_docs_ds(sf_dir, ["doc_id", "text"]), vocab_size=200)
    return _collect(out).sort_by("doc_id")


def q_pack_sequences(sf_dir: str) -> pa.Table:
    """Concat-and-chunk sequence packing (128-token sequences, doc_id
    order): (seq_id, doc_id, start_in_seq, start_in_doc, n_tokens) span
    rows. Distributed prefix sum via bucketed two-phase offsets
    (ops/packing.py)."""
    from fdblucene_ray.ops.packing import pack_sequences

    out = pack_sequences(
        _docs_ds(sf_dir, ["doc_id", "text"]), seq_len=128, bucket_size=100
    )
    return _collect(out).sort_by(
        [("seq_id", "ascending"), ("doc_id", "ascending")]
    )


def q_dup_ngrams(sf_dir: str) -> pa.Table:
    """Cross-document duplicated 3-gram stats (RefinedWeb-style
    inter-doc duplication signal; ops/curation.py dup_ngram_stats)."""
    from fdblucene_ray.ops.curation import dup_ngram_stats

    out = dup_ngram_stats(_docs_ds(sf_dir, ["doc_id", "text"]), n=3)
    return _collect(out).sort_by("doc_id")


def q_bpe_train(sf_dir: str) -> pa.Table:
    """Distributed BPE training: one corpus pass to the word histogram
    (map-side combined partials -> groupby sum -> top-V), then the
    greedy merge loop on the tiny histogram (ops/bpe.py). Iterative —
    no SQL oracle; tests/test_bpe.py holds the naive-recount twin."""
    from fdblucene_ray.ops.bpe import train_bpe, word_histogram

    h = word_histogram(_docs_ds(sf_dir, ["doc_id", "text"]), top_v=50_000)
    return train_bpe(h, 30)


def q_bpe_apply(sf_dir: str) -> pa.Table:
    """Tokenize the corpus with the learned merges: merges broadcast
    once, actor-pool apply with a cross-batch distinct-word cache."""
    from fdblucene_ray.ops.bpe import apply_bpe, train_bpe, word_histogram

    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    merges = train_bpe(word_histogram(ds, top_v=50_000), 30)
    return _collect(apply_bpe(ds, merges)).sort_by("doc_id")


_MIX_TARGETS = {"src1": 0.5, "src2": 0.3, "src3": 0.2}


def q_mix_rates(sf_dir: str) -> pa.Table:
    """Per-domain resampling rates toward a target mixture, no
    upsampling (ops/curation.py mix_rates)."""
    from fdblucene_ray.ops.curation import mix_rates

    t = mix_rates(_docs_ds(sf_dir, ["doc_id", "source"]), "source", _MIX_TARGETS)
    return t.set_column(
        2, "rate", _round_col(t["rate"].to_numpy(zero_copy_only=False), 9)
    )


def q_sample_mix(sf_dir: str) -> pa.Table:
    """Deterministic weighted sampling to the target domain mixture
    (ops/curation.py sample_to_mix): rates broadcast in the closure,
    corpus streams through one vectorized hash filter."""
    from fdblucene_ray.ops.curation import sample_to_mix

    out = sample_to_mix(
        _docs_ds(sf_dir, ["doc_id", "source"]), "source", _MIX_TARGETS
    )
    return _collect(out).sort_by("doc_id")


def q_ft_bool_msm(sf_dir: str) -> pa.Table:
    """BooleanQuery with minimumNumberShouldMatch: +data plus >=2 of
    (merge, window, scan); matching SHOULD clauses still score."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(
        s.search_boolean(
            must=["data"], should=["merge", "window", "scan"], k=10,
            min_should_match=2,
        )
    )


def q_ft_synonym(sf_dir: str) -> pa.Table:
    """SynonymQuery analog: ('join' OR 'merge') scored as ONE
    pseudo-term (tf summed per doc, idf from the exact union df) plus a
    plain 'scan' clause (index/search.py search_synonyms)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(s.search_synonyms([["join", "merge"], ["scan"]], k=10))


def q_ft_function_score(sf_dir: str) -> pa.Table:
    """FunctionScoreQuery analog: BM25('filter sort') boosted by
    1 + 0.2*ln(1 + n_chars), the whole match set rescored and values
    hydrated row-group-pruned (index/search.py search_function_score)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(
        s.search_function_score(
            "filter sort", k=10,
            value_source=_docs_path(sf_dir), value_col="n_chars", weight=0.2,
        )
    )


def q_ft_dv_boost(sf_dir: str) -> pa.Table:
    """FunctionScoreQuery over UPDATED doc values: the same
    1 + 0.2*ln(1 + v) boost as ft_function_score, but v reads through
    the in-place doc-values overlay (docs with doc_id % 7 == 0 were
    repointed to 100000 - doc_id by _ensure_dv_index) — scoring follows
    the update with no reindex (index/docvalues.py)."""
    s = Searcher(_ensure_dv_index(sf_dir))
    return _hits_table(
        s.search_function_score(
            "filter sort", k=10,
            value_source=_docs_path(sf_dir), value_col="n_chars",
            weight=0.2, dv_field="n_chars",
        )
    )


def q_ft_feature_field(sf_dir: str) -> pa.Table:
    """FeatureField saturation query analog (Lucene rank features):
    BM25('data stream') + 0.5 * n_chars/(n_chars + 500) — the additive
    SHOULD-clause composition Lucene documents for FeatureQuery
    (index/search.py search_feature_field)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(
        s.search_feature_field(
            "data stream", k=10,
            value_source=_docs_path(sf_dir), value_col="n_chars",
            pivot=500.0, weight=0.5,
        )
    )


def q_ft_distance_feature(sf_dir: str) -> pa.Table:
    """DistanceFeatureQuery analog: BM25('data stream') + 0.6 *
    300/(300 + |n_chars - 700|) — proximity-to-origin boosting
    (index/search.py search_distance_feature)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(
        s.search_distance_feature(
            "data stream", k=10,
            value_source=_docs_path(sf_dir), value_col="n_chars",
            origin=700.0, pivot=300.0, weight=0.6,
        )
    )


def q_ft_sort_multi(sf_dir: str) -> pa.Table:
    """Multi-key Sort(SortField...) analog: docs matching 'data'
    ordered by (lang asc, n_chars desc, doc_id) — value columns stream
    with per-batch local top-k (index/search.py search_sort_multi)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    rows = s.search_sort_multi(
        "data", k=10,
        value_source=_docs_path(sf_dir),
        sort_fields=[("lang", False), ("n_chars", True)],
    )
    return pa.table(
        {
            "doc_id": pa.array([int(r[0]) for r in rows], pa.int64()),
            "lang": pa.array([str(r[1]) for r in rows], pa.string()),
            "n_chars": pa.array([int(r[2]) for r in rows], pa.int64()),
        }
    )


def _ensure_dv_index(sf_dir: str) -> str:
    """documents index with an in-place numeric doc-values update
    applied (``updateNumericDocValue`` analog, index/docvalues.py):
    every doc with doc_id % 7 == 0 gets n_chars := 100000 - doc_id via
    a dv-generation sidecar — postings untouched, no reindex. The
    update is content-idempotent (re-running publishes nothing)."""
    import pyarrow.dataset as pads

    from fdblucene_ray.index.docvalues import update_numeric_docvalues

    ix = _index_dir(sf_dir, "dvu")
    fields = {"text": {"column": "text", "analyzer": "simple"}}
    build_index(
        _docs_path(sf_dir), ix, fields=fields, num_partitions=16,
        batch_size=2048, docstore_cols=["n_chars"],
    )
    ids = (
        pads.dataset(_docs_path(sf_dir))
        .to_table(columns=["doc_id"])["doc_id"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    upd_ids = ids[ids % 7 == 0]
    update_numeric_docvalues(
        ix, "n_chars", {int(d): float(100000 - d) for d in upd_ids}
    )
    return ix


def q_ft_dv_update(sf_dir: str) -> pa.Table:
    """In-place numeric doc-values update read path: 'vector stream'
    AND-matches sorted by the POST-update n_chars (docs with
    doc_id % 7 == 0 were repointed to 100000 - doc_id without any
    reindex); the overlay rides the streaming sort's broadcast
    (index/search.py search_sort_by dv_field=)."""
    s = Searcher(_ensure_dv_index(sf_dir))
    rows = s.search_sort_by(
        "vector stream", k=10, operator="and",
        value_source=_docs_path(sf_dir), value_col="n_chars",
        dv_field="n_chars",
    )
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "value": pa.array([v for _, v in rows], pa.float64()),
        }
    )


def _ensure_string_dv(sf_dir: str) -> str:
    """The 'simple' documents index with Sorted ('lang'), SortedSet
    ('tags' = [lang, source], synthesized deterministically) and
    Binary ('payload' = first 12 utf-8 bytes of text) doc-values
    sidecars (index/stringdv.py; reference DATA.md:38-42 TODO types).
    Idempotent: sidecars already recorded in the manifest are kept."""
    from fdblucene_ray.index.manifest import load_manifest
    from fdblucene_ray.index.stringdv import (
        build_binary_dv,
        build_sorted_dv,
    )

    ix = _ensure_index(sf_dir, "simple")
    extra = load_manifest(ix).extra
    have_s = extra.get("dv_sorted", {})
    have_b = extra.get("dv_binary", {})
    if "lang" not in have_s:
        build_sorted_dv(ix, "lang", _docs_path(sf_dir))
    if "tags" not in have_s:

        def add_tags(b: pa.Table) -> pa.Table:
            tags = pa.array(
                [
                    [lg, sc]
                    for lg, sc in zip(
                        b["lang"].to_pylist(), b["source"].to_pylist()
                    )
                ],
                pa.list_(pa.string()),
            )
            return pa.table({"doc_id": b["doc_id"], "tags": tags})

        build_sorted_dv(
            ix, "tags",
            ray.data.read_parquet(
                _docs_path(sf_dir), columns=["doc_id", "lang", "source"]
            ),
            multi=True, preprocess=add_tags,
        )
    if "payload" not in have_b:

        def add_payload(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            pay = pc.cast(
                pc.utf8_slice_codeunits(b["text"], 0, 12), pa.binary()
            )
            return pa.table({"doc_id": b["doc_id"], "payload": pay})

        build_binary_dv(
            ix, "payload",
            ray.data.read_parquet(
                _docs_path(sf_dir), columns=["doc_id", "text"]
            ),
            preprocess=add_payload,
        )
    return ix


def q_ft_sort_keyword(sf_dir: str) -> pa.Table:
    """SortedDocValues string sort (DATA.md:38-42; Lucene
    SortField.Type.STRING): docs matching 'merge' ordered by lang asc
    via ordinals against the dv_sorted sidecar — only matched ids' ord
    row groups are read (index/search.py search_sort_by_keyword)."""
    s = Searcher(_ensure_string_dv(sf_dir))
    rows = s.search_sort_by_keyword("merge", k=15, dv_field="lang")
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "lang": pa.array([v for _, v in rows], pa.string()),
        }
    )


def q_ft_sort_keyword_desc(sf_dir: str) -> pa.Table:
    """DESCENDING string sort via ordinal negation — the capability a
    raw string column cannot offer (search_sort_multi documents the
    limitation; ordinals solve it, Lucene-style)."""
    s = Searcher(_ensure_string_dv(sf_dir))
    rows = s.search_sort_by_keyword(
        "merge", k=15, dv_field="lang", descending=True
    )
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "lang": pa.array([v for _, v in rows], pa.string()),
        }
    )


def q_ft_facet_sortedset(sf_dir: str) -> pa.Table:
    """SortedSetDocValuesFacetCounts analog: per distinct value of the
    multi-valued 'tags' dv ([lang, source] per doc), the number of
    matching docs — one pruned ords read + a bincount, no per-value
    postings intersections."""
    s = Searcher(_ensure_string_dv(sf_dir))
    rows = s.facet_counts_sortedset("merge", "tags")[:20]
    return pa.table(
        {
            "value": pa.array([v for v, _ in rows], pa.string()),
            "cnt": pa.array([c for _, c in rows], pa.int64()),
        }
    )


def q_ft_binary_dv(sf_dir: str) -> pa.Table:
    """BinaryDocValues read path: per-doc opaque bytes for the first
    10 matching docs (pruned row-group reads, aligned to id order)."""
    s = Searcher(_ensure_string_dv(sf_dir))
    docs = sorted(
        d for d, _ in s.search_terms(["merge"], 1 << 31, mode="exhaustive")
    )[:10]
    vals = s.binary_dv("payload", docs)
    # hex-encode for the oracle compare (bytes vs DuckDB bytearray
    # canonicalize differently); the engine surface stays raw bytes
    return pa.table(
        {
            "doc_id": pa.array(docs, pa.int64()),
            "payload": pa.array([v.hex() for v in vals], pa.string()),
        }
    )


def q_ft_sort_by_field(sf_dir: str) -> pa.Table:
    """Sort-by-field search (SortField analog): docs matching
    'vector AND stream' ordered by n_chars desc; the value column
    streams against the broadcast match set with per-batch local top-k
    (index/search.py search_sort_by)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    rows = s.search_sort_by(
        "vector stream", k=10, operator="and",
        value_source=_docs_path(sf_dir), value_col="n_chars",
    )
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "value": pa.array([v for _, v in rows], pa.float64()),
        }
    )


def q_ft_facet_taxonomy(sf_dir: str) -> pa.Table:
    """Hierarchical (taxonomy) facets: docs matching 'data' counted per
    source and per source/lang drill-down path (Lucene taxonomy
    FacetsCollector; SURVEY §2 A-family). Match set broadcast, paths
    stream from the input parquet, partials are path-cardinality-
    bounded."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    fc = s.facet_taxonomy(
        "data", ["source", "lang"], value_source=_docs_path(sf_dir)
    )
    return pa.table(
        {
            "path": pa.array([p for p, _ in fc], pa.string()),
            "n": pa.array([c for _, c in fc], pa.int64()),
        }
    )


def q_geo_knn(sf_dir: str) -> pa.Table:
    """10 nearest events to (12.34, 56.78) by haversine over the
    deterministic synthetic lat/lon grid (LatLonPoint.nearest analog;
    per-batch local top-k, global sort over num_batches*k candidates)."""
    from fdblucene_ray.ops.geo import geo_knn

    return geo_knn(
        _events_ds(sf_dir, ["event_id", "user_id"]), 12.34, 56.78, 10
    )


def q_geo_bbox(sf_dir: str) -> pa.Table:
    """Events in the box lat [0, 30) x lon [-90, 0), counted per
    event_type (LatLonPoint.newBoxQuery + facet; partial counts only
    cross the exchange)."""
    from fdblucene_ray.ops.geo import geo_bbox_counts

    return geo_bbox_counts(
        _events_ds(sf_dir, ["event_id", "user_id", "event_type"]),
        0.0, 30.0, -90.0, 0.0,
    )


def q_cluster_assign(sf_dir: str) -> pa.Table:
    """Nearest-centroid assignment of every embedding against the four
    fixed centroids vec_id<4 (L2, ties by centroid id). Integer-only
    output keeps the oracle compare exact; centroids broadcast once."""
    import pyarrow.parquet as pq

    from fdblucene_ray.ops.clustering import assign_fixed_centroids

    cents = _query_vectors(sf_dir, [0, 1, 2, 3])
    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["vec_id", "embedding"]
    )
    out = assign_fixed_centroids(ds, cents).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    return pa.table(
        {
            "vec_id": pa.array(out["vec_id"].to_numpy(np.int64)),
            "cluster": pa.array(out["cluster"].to_numpy(np.int32)),
        }
    )


def q_strip_boilerplate(sf_dir: str) -> pa.Table:
    """Host-scoped boilerplate removal (CCNet/RefinedWeb line-dedup
    stage, ops/webtext.strip_boilerplate): a deterministic template is
    injected per source (a universal footer + a 1-in-3 banner), then
    any sentence unit appearing in >= max(2, ceil(0.05 * n_docs(src)))
    distinct docs of its source is stripped. Only hash rows shuffle;
    the template set comes back broadcast-sized."""
    from fdblucene_ray.ops.webtext import strip_boilerplate

    ds = _docs_ds(sf_dir, ["doc_id", "text", "source"])

    def augment(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        ids = batch["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        part1 = pc.binary_join_element_wise(
            t, src, pa.scalar(".footer promo ")
        )
        idn = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        banner = pc.if_else(
            pa.array(idn % 3 == 0),
            pa.scalar(".subscribe newsletter"),
            pa.scalar(""),
        )
        aug = pc.binary_join_element_wise(part1, banner, pa.scalar(""))
        return pa.table(
            {"doc_id": ids, "text": aug, "source": src}
        )

    out = strip_boilerplate(
        ds.map_batches(augment, batch_format="pyarrow"),
        frac=0.05, min_df=2,
    )
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def q_cluster_topics(sf_dir: str) -> pa.Table:
    """Topic labels for embedding clusters: fixed-centroid assignment
    (cluster_assign's layout) joined to the documents' distinct terms
    via Ray's native hash join, per-cluster JLH significant terms vs
    the labeled corpus (ops/clustering.cluster_topics). The 'what is
    in this cluster' corpus-card readout."""
    from fdblucene_ray.ops.clustering import (
        assign_fixed_centroids,
        cluster_topics,
    )

    cents = _query_vectors(sf_dir, [0, 1, 2, 3])
    emb = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["vec_id", "embedding"]
    )
    labels = assign_fixed_centroids(emb, cents)
    docs = _docs_ds(sf_dir, ["doc_id", "text"])
    return cluster_topics(
        docs, labels, n=5, label_id_col="vec_id"
    )


def q_ann_pq(sf_dir: str) -> pa.Table:
    """Product-quantization ANN (Jegou et al.): sample-trained (m=8,
    k=16) codebooks, streaming encode to 8-byte codes, ADC lookup-table
    scoring — no float vector read at query time. Approximate =>
    rows-only; pytest pins recall vs brute force."""
    from fdblucene_ray.ops.similarity import pq_topk

    ids = [0, 1, 2]
    q = _query_vectors(sf_dir, ids)
    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["vec_id", "embedding"]
    )
    return pq_topk(ds, q, ids, pq_k=10)


def q_cluster_kmeans(sf_dir: str) -> pa.Table:
    """Distributed Lloyd's k-means (k=8) over embeddings; returns
    (cluster, n) sizes. Iterative => no SQL twin; pytest holds the
    self-consistency oracle."""
    from fdblucene_ray.ops.clustering import kmeans_cluster_sizes

    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["vec_id", "embedding"]
    )
    sizes, _ = kmeans_cluster_sizes(ds, 8, iters=5)
    return sizes


def q_doc_keywords(sf_dir: str) -> pa.Table:
    """Per-doc tf-idf keyword extraction (top-3 terms per doc): two
    hashed-partition exchanges, df from term-co-located runs
    (ops/textstats.py doc_keywords)."""
    from fdblucene_ray.ops.textstats import doc_keywords

    out = doc_keywords(_docs_ds(sf_dir, ["doc_id", "text"]), top_n=3)
    df = out.to_pandas().sort_values(["doc_id", "term"]).reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            "term": pa.array(df["term"].astype(str)),
            "score": pa.array(df["score"].to_numpy(np.float64)),
        }
    )


def q_pagerank(sf_dir: str) -> pa.Table:
    """PageRank over the derived doc_id link graph (out_deg=8, 3 fixed
    iterations, d=0.85): edges regenerated in-map each iteration, one
    hashed-partition contributions exchange per iteration, rank state
    never leaves the object store (ops/graph.py pagerank). Top-100 by
    scaled score. Columns: (doc_id, score@6dp)."""
    from fdblucene_ray.ops.graph import pagerank_top

    return pagerank_top(_docs_ds(sf_dir, ["doc_id"]), top_n=100, n_iters=3)


def q_link_degree(sf_dir: str) -> pa.Table:
    """In-degree heavy hitters on the derived link graph: map-side edge
    expansion + one hashed-partition run-count exchange (ops/graph.py
    degree_stats). Columns: (doc_id, in_deg)."""
    from fdblucene_ray.ops.graph import degree_stats

    return degree_stats(_docs_ds(sf_dir, ["doc_id"]), top_n=20)


def q_dsir_select(sf_dir: str) -> pa.Table:
    """DSIR importance resampling (Xie et al. 2023): md5-bucketed
    unigram target/raw histograms (fixed 1024 buckets, one pass),
    broadcast log-ratio, per-doc log-weights + seeded Gumbel-top-k
    selection toward source='src7' (ops/dsir.py). Columns:
    (doc_id, logw@4dp)."""
    from fdblucene_ray.ops.dsir import dsir_select

    return dsir_select(
        _docs_ds(sf_dir, ["doc_id", "text", "source"]),
        100,
        target_col="source",
        target_val="src7",
    )


def q_ft_span_not(sf_dir: str) -> pa.Table:
    """SpanNotQuery analog: 'batch stream' phrase occurrences with no
    'data' position within ±5 of the span; per-doc surviving-occurrence
    counts (index/search.py search_span_not)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    rows = s.search_span_not("batch stream", "data", pre=5, post=5)
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "span_freq": pa.array([f for _, f in rows], pa.int64()),
        }
    )


def q_ft_span_or(sf_dir: str) -> pa.Table:
    """SpanOrQuery analog: per-doc total occurrences across the union
    of two phrase spans (index/search.py search_span_or)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    rows = s.search_span_or(["batch stream", "data merge"])
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "span_freq": pa.array([f for _, f in rows], pa.int64()),
        }
    )


def _intervals_table(rows: list[tuple[int, int, int]]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([d for d, _, _ in rows], pa.int64()),
            "n_intervals": pa.array([n for _, n, _ in rows], pa.int64()),
            "first_start": pa.array([s for _, _, s in rows], pa.int64()),
        }
    )


def q_ft_intervals(sf_dir: str) -> pa.Table:
    """Intervals query (Lucene o.a.l.queries.intervals analog):
    maxgaps(3, ordered("data", "merge")) — greedy-minimal-chain anchor
    semantics, per-doc qualifying-anchor counts
    (index/search.py search_intervals)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _intervals_table(s.search_intervals("data merge", max_gaps=3))


def q_ft_intervals_unordered(sf_dir: str) -> pa.Table:
    """Intervals maxgaps(2, unordered("batch", "stream")): anchored
    window semantics — each 'batch' position with a 'stream' occurrence
    within 2 intervening positions either side."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _intervals_table(
        s.search_intervals("batch stream", max_gaps=2, ordered=False)
    )


def q_ft_intervals_not(sf_dir: str) -> pa.Table:
    """Intervals notContaining(maxgaps(5, ordered("data", "merge")),
    "sort"): minimal intervals with no 'sort' position inside
    (endpoints inclusive)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _intervals_table(
        s.search_intervals("data merge", max_gaps=5, not_containing="sort")
    )


def q_ft_rank_boost(sf_dir: str) -> pa.Table:
    """Authority-boosted retrieval: BM25 top-50 candidates rescored by
    the corpus link-graph PageRank — final = bm25 * (1 + ln(1 + pr*N)),
    top-10. The scale shape is a rescore (QueryRescorer pattern): the
    O(V) rank vector stays distributed; only the 50 candidate ids are
    broadcast into a filter pass over the rank dataset."""
    import numpy as np

    from fdblucene_ray.ops.graph import pagerank

    s = Searcher(_ensure_index(sf_dir, "simple"))
    hits = s.search_terms(["data", "merge"], 50, mode="wand")
    if not hits:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    cand = np.array([d for d, _ in hits], np.int64)
    bm25 = np.array([sc for _, sc in hits], np.float64)
    ds = _docs_ds(sf_dir, ["doc_id"])
    n_docs = ds.count()
    pr_ds = pagerank(ds, n_iters=3, n_docs=n_docs)
    cand_sorted = np.sort(cand)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, cand_sorted)))

    pr_rows = pr_ds.map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    pr_map = dict(zip(pr_rows["doc_id"], pr_rows["pr"]))
    final = bm25 * (1.0 + np.log1p(
        np.array([pr_map.get(int(d), 0.0) for d in cand]) * n_docs
    ))
    from fdblucene_ray.ops.hashing import round_half_away

    final = round_half_away(final, 4)
    order = np.lexsort((cand, -final))[:10]
    return pa.table(
        {
            "doc_id": pa.array(cand[order]),
            "score": pa.array(final[order]),
        }
    )


def q_ft_synonym_multiword(sf_dir: str) -> pa.Table:
    """SynonymGraphFilter analog with a MULTI-WORD synonym: group
    {"batch stream" (phrase), "window"} scores as one pseudo-term
    (tf = phrase_freq + term tf, idf from the exact union df) plus a
    'data' clause (index/search.py search_synonyms_multiword)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(
        s.search_synonyms_multiword([["batch stream", "window"], ["data"]], k=10)
    )


def q_anchor_terms(sf_dir: str) -> pa.Table:
    """Anchor-text aggregation over the derived link graph: per target
    doc, the most frequent first-3-token anchor term of its in-links
    (map-side edge+anchor emit, one hashed-partition top-1 exchange;
    ops/graph.py anchor_terms)."""
    from fdblucene_ray.ops.graph import anchor_terms

    return anchor_terms(_docs_ds(sf_dir, ["doc_id", "text"]))


def q_embedding_pca(sf_dir: str) -> pa.Table:
    """Distributed PCA over embeddings (covariance sufficient
    statistics; O(D²) per batch leaves the workers). Rows-only for the
    driver (eigendecomposition has no SQL twin); pytest matches exact
    numpy PCA. Columns: (component, evr@6dp)."""
    from fdblucene_ray.ops.clustering import embedding_pca
    from fdblucene_ray.ops.hashing import round_half_away

    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["embedding"])
    _, evr, _ = embedding_pca(ds, n_components=8)
    return pa.table(
        {
            "component": pa.array(np.arange(len(evr), dtype=np.int64)),
            "evr": pa.array(round_half_away(evr, 6)),
        }
    )


def q_image_decode(sf_dir: str) -> pa.Table:
    """REAL image decode (PPM/P6, pure numpy — no codec lib needed):
    deterministic synthetic images per doc, actor-pool decode → size +
    mean intensity + 64-bit aHash (ops/image.py). Rows-only (binary
    decode has no SQL twin); pytest matches a byte-level reference
    decoder. Columns: (doc_id, w, h, mean_px@4dp, ahash)."""
    from fdblucene_ray.ops.image import decode_images, synth_images_ds

    ds = synth_images_ds(_docs_ds(sf_dir, ["doc_id"]))
    out = decode_images(ds, batch_size=128).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"].to_numpy(np.int64)),
            "w": pa.array(out["w"].to_numpy(np.int32)),
            "h": pa.array(out["h"].to_numpy(np.int32)),
            "mean_px": pa.array(out["mean_px"].to_numpy(np.float64)),
            "ahash": pa.array(out["ahash"].to_numpy(np.int64)),
        }
    )


def q_image_near_dup(sf_dir: str) -> pa.Table:
    """Perceptually-identical image pairs: REAL PPM decode → 64-bit
    aHash → the simhash band-blocking + popcount verify machinery
    (ops/image.py image_near_dups). Rows-only; pytest brute-force
    hamming oracle. Columns: (a, b, hamming=0)."""
    from fdblucene_ray.ops.image import image_near_dups, synth_images_ds

    ds = synth_images_ds(_docs_ds(sf_dir, ["doc_id"]))
    return image_near_dups(ds, max_hamming=0)


def q_ft_multi_phrase(sf_dir: str) -> pa.Table:
    """MultiPhraseQuery analog: slot-level term alternatives
    ('data'|'batch' followed by 'merge'|'stream'), leapfrog + position
    union per slot (index/search.py search_multi_phrase)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    return _hits_table(
        s.search_multi_phrase([["data", "batch"], ["merge", "stream"]], k=10)
    )


def q_hits(sf_dir: str) -> pa.Table:
    """HITS hubs & authorities (Kleinberg 1999), 2 L2-normalized
    iterations: forward contributions exchange for authorities, a
    co-partitioned union join (edges + authority table on hash(dst))
    for the reverse hub update (ops/graph.py hits_top). Columns:
    (kind, doc_id, score@6dp), top-20 per kind."""
    from fdblucene_ray.ops.graph import hits_top

    return hits_top(_docs_ds(sf_dir, ["doc_id"]), top_n=20, n_iters=2)


def q_trustrank(sf_dir: str) -> pa.Table:
    """TrustRank (Gyöngyi et al. 2004): PageRank personalized to the
    source='src7' seed set; teleport mass rides the contributions
    exchange in a tele column — no O(V) broadcast (ops/graph.py
    trustrank_top). Columns: (doc_id, score@6dp), top-100."""
    from fdblucene_ray.ops.graph import trustrank_top

    return trustrank_top(
        _docs_ds(sf_dir, ["doc_id", "source"]),
        100, seed_col="source", seed_val="src7", n_iters=3,
    )


def q_readability(sf_dir: str) -> pa.Table:
    """Per-doc Flesch reading ease (vowel-group syllable approximation),
    one map-only Arrow-kernel pass (ops/textstats.py readability)."""
    from fdblucene_ray.ops.textstats import readability

    out = readability(_docs_ds(sf_dir, ["doc_id", "text"])).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def q_quality_classifier(sf_dir: str) -> pa.Table:
    """Learned quality filter (fastText/DCLM-style): hashed-feature
    logistic regression trained in-pipeline to recognize source='src7'
    (full-batch GD, gradient partials exchanged as (bucket, g) rows),
    then corpus-wide scoring with local top-k (ops/classifier.py).
    Rows-only for the driver (iterative optimization has no SQL twin);
    pytest verifies against a dense numpy GD. Columns:
    (doc_id, score@6dp), top-100."""
    from fdblucene_ray.ops.classifier import (
        score_quality,
        train_quality_classifier,
    )

    ds = _docs_ds(sf_dir, ["doc_id", "text", "source"])
    w = train_quality_classifier(ds, target_col="source", target_val="src7")
    return score_quality(ds, w, top_n=100)


def q_ft_multivalue_phrase(sf_dir: str) -> pa.Table:
    """Phrase over a MULTI-VALUED field (text split into sentence
    values, positionIncrementGap=100): 'data merge' must be adjacent
    WITHIN one value — matches never cross value boundaries. Returns
    (doc_id, phrase_freq)."""
    s = Searcher(_ensure_index(sf_dir, "mv"))
    rows = s.phrase_freqs("data merge")
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "freq": pa.array([f for _, f in rows], pa.int64()),
        }
    )


def q_approx_users_per_type(sf_dir: str) -> pa.Table:
    """Grouped HLL: approximate distinct users PER event_type — one
    map-only pass emits per-(batch, group) register blobs, the driver
    max-folds |groups| sketches (ops/sketches.py). Approximate =>
    rows-only; pytest pins the per-group error bound."""
    from fdblucene_ray.ops.sketches import approx_distinct_by_group

    return approx_distinct_by_group(
        _events_ds(sf_dir, ["user_id", "event_type"]),
        "user_id", "event_type",
    )


def q_ft_suggest_phrase(sf_dir: str) -> pa.Table:
    """Phrase did-you-mean with collation: 'strean merg' -> corrected
    phrases that actually occur adjacently, ranked by collation doc
    count (index/search.py suggest_phrase)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    rows = s.suggest_phrase("strean merg", 5)
    return pa.table(
        {
            "suggestion": pa.array([t for t, _, _ in rows], pa.string()),
            "n_docs": pa.array([n for _, n, _ in rows], pa.int64()),
            "edits": pa.array([e for _, _, e in rows], pa.int64()),
        }
    )


def q_ft_autocomplete(sf_dir: str) -> pa.Table:
    """Weighted prefix suggester (AnalyzingSuggester analog, df as the
    weight): top-10 index terms starting with 's' by (df desc, term
    asc) — a bounded terms-dictionary range scan, no postings decode."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    terms = s.expand_prefix("text", "s")
    top = sorted(terms, key=lambda td: (-td[1], td[0]))[:10]
    return pa.table(
        {
            "term": pa.array([t for t, _ in top], pa.string()),
            "df": pa.array([d for _, d in top], pa.int64()),
        }
    )


def q_ft_top_groups(sf_dir: str) -> pa.Table:
    """TopGroups (GroupingSearch analog): top-5 source groups for
    'data merge' ranked by best BM25 hit, 2 docs per group."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    rows = s.search_grouped(
        "data merge", group_col="source", source=_docs_path(sf_dir),
        n_groups=5, docs_per_group=2,
    )
    return pa.table(
        {
            "grp": pa.array([g for g, _, _, _ in rows], pa.string()),
            "rank": pa.array([r for _, r, _, _ in rows], pa.int64()),
            "doc_id": pa.array([d for _, _, d, _ in rows], pa.int64()),
            "score": _round_col(
                np.array([sc for _, _, _, sc in rows], np.float64), 4
            ),
        }
    )


def q_ft_drill_sideways(sf_dir: str) -> pa.Table:
    """DrillSideways: 'data' drilled to source='cc' — top-10 drill-down
    hits plus the sideways facet counts over source (one row per facet
    value, hit rows carry kind='hit')."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    hits, sideways = s.facet_drill_sideways(
        "data", dim_field="source", drill_value="cc"
    )
    hits = hits[:10]
    kinds = ["hit"] * len(hits) + ["facet"] * len(sideways)
    keys = [str(d) for d, _ in hits] + [v for v, _ in sideways]
    vals = [round(float(sc), 4) for _, sc in hits] + [
        float(c) for _, c in sideways
    ]
    return pa.table(
        {
            "kind": pa.array(kinds, pa.string()),
            "key": pa.array(keys, pa.string()),
            "val": _round_col(np.array(vals, np.float64), 4),
        }
    )


def q_cms_top_terms(sf_dir: str) -> pa.Table:
    """Count-Min-sketch approximate heavy hitters: top-10 terms by
    sketch estimate, one map-only pass (grids + local candidates merge
    driver-side; no token-stream shuffle). Approximate => rows-only;
    pytest pins estimate >= truth and top-set recall vs the exact
    ft_top_terms."""
    from fdblucene_ray.ops.sketches import cms_heavy_hitters

    table, _ = cms_heavy_hitters(
        _docs_ds(sf_dir, ["doc_id", "text"]), col="text", k=10
    )
    return table


def q_ft_span_first(sf_dir: str) -> pa.Table:
    """SpanFirstQuery analog: docs whose first 'data' occurrence lies
    within the first 3 positions (span end <= 3), with that position."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    rows = s.search_span_first("data", 3)
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "first_pos": pa.array([p for _, p in rows], pa.int64()),
        }
    )


def q_ft_shingle(sf_dir: str) -> pa.Table:
    """ShingleFilter chain (word bigrams, outputUnigrams=false): top-15
    bigram terms by collection (df desc, term asc) with df and ttf —
    verifies the shingled analysis chain end-to-end through the index
    build (analysis/analyzer.py shingle2)."""
    ds = _terms_ds(
        _ensure_index(sf_dir, "sh2"), "text",
        columns=["field", "term", "df", "ttf"],
    )
    agg = ds.groupby("term").aggregate(
        ray.data.aggregate.Sum("df", alias_name="df"),
        ray.data.aggregate.Sum("ttf", alias_name="ttf"),
    )
    top = agg.sort(["df", "term"], descending=[True, False]).limit(15)
    t = pa.Table.from_pandas(top.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "term": t["term"],
            "df": t["df"].cast(pa.int64()),
            "ttf": t["ttf"].cast(pa.int64()),
        }
    )


def q_ft_shingle_search(sf_dir: str) -> pa.Table:
    """BM25 top-10 over the shingled field: the query 'data stream'
    analyzes to the single bigram term 'data_stream'; norms/avgdl are
    shingle counts."""
    s = Searcher(_ensure_index(sf_dir, "sh2"))
    return _hits_table(s.search("data stream", k=10, mode="exhaustive"))


def q_check_index(sf_dir: str) -> pa.Table:
    """CheckIndex analog (index/check.py): per-segment CRC + term-dict
    + posting-invariant verification, one Ray task per segment.
    Rows-only: segment layout isn't SQL-expressible;
    tests/test_checkindex.py plants corruptions for the strong oracle."""
    from fdblucene_ray.index.check import check_index

    out = check_index(_ensure_index(sf_dir, "simple"), level="full")
    return pa.table(
        {
            "segment": out["segment"],
            "status": out["status"],
            "issues": out["issues"],
        }
    )


def q_ft_docvalue_stats(sf_dir: str) -> pa.Table:
    """Doc-values stats over the match set (Lucene StatsCollector /
    facet aggregation analog): count/min/max/sum/avg of n_chars across
    docs matching 'data stream' (index/search.py stats_by — match set
    broadcast, 4 scalars per batch reach the reduce)."""
    s = Searcher(_ensure_index(sf_dir, "simple"))
    st = s.stats_by(
        "data stream", value_source=_docs_path(sf_dir), value_col="n_chars"
    )
    from fdblucene_ray.ops.hashing import round_half_away

    return pa.table(
        {
            "n": pa.array([st["n"]], pa.int64()),
            "vmin": pa.array([st["min"]], pa.float64()),
            "vmax": pa.array([st["max"]], pa.float64()),
            "vsum": pa.array([st["sum"]], pa.float64()),
            "vavg": pa.array(
                [float(round_half_away(np.array([st["avg"]]), 6)[0])],
                pa.float64(),
            ),
        }
    )


def q_token_fertility(sf_dir: str) -> pa.Table:
    """Tokenizer fertility per source: docs, whitespace tokens, chars,
    chars-per-token (ops/textstats.py token_fertility — per-batch
    per-group partials, the groupby moves |groups| rows per block)."""
    from fdblucene_ray.ops.textstats import token_fertility

    out = token_fertility(_docs_ds(sf_dir, ["doc_id", "text", "source"]))
    df = out.to_pandas().sort_values("source").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def q_filter_funnel(sf_dir: str) -> pa.Table:
    """Quality-gate funnel report with first-fail attribution
    (ops/textstats.py filter_funnel): docs charged to the first
    C4/Gopher-style gate they fail (length, token count, longest word,
    distinct-token ratio), plus the pass-through count."""
    from fdblucene_ray.ops.textstats import filter_funnel

    out = filter_funnel(_docs_ds(sf_dir, ["doc_id", "text"]))
    df = out.to_pandas().sort_values("stage").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def q_host_cap(sf_dir: str) -> pa.Table:
    """Per-host document cap (domain balancing): keep the 5 longest
    docs per source, ties doc_id asc (ops/curation.py cap_per_group) —
    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, id)
    <= 5 in SQL."""
    from fdblucene_ray.ops.curation import cap_per_group

    out = cap_per_group(
        _docs_ds(sf_dir, ["doc_id", "source", "n_chars"]),
        "source", 5, order_col="n_chars",
    )
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["doc_id", "source", "n_chars"]], preserve_index=False
    )


def q_url_filter(sf_dir: str) -> pa.Table:
    """URL blocklist filter: the synthetic per-doc URLs (same derivation
    as url_dedup) minus one blocked host and one blocked path pattern
    (ops/webtext.py filter_urls: broadcast hashed host set + RE2
    substring scans, map-only)."""
    from fdblucene_ray.ops.webtext import filter_urls

    def with_url(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        src = batch["source"].to_pylist()
        urls = [
            f"HTTPS://Example-{s}.COM/Path/{int(i) % 40}/"
            f"?utm_source=s{int(i)}&ref=keep#frag"
            for i, s in zip(d, src)
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "url": pa.array(urls, pa.string())}
        )

    ds = _docs_ds(sf_dir, ["doc_id", "source"]).map_batches(
        with_url, batch_format="pyarrow"
    )
    out = filter_urls(
        ds,
        blocked_hosts=["example-src1.com", "example-src7.com"],
        blocked_patterns=["/path/13/"],
    )
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def q_dedup_keep_best(sf_dir: str) -> pa.Table:
    """Quality-aware exact dedup: group docs by their first 30
    codepoints (planted collision key — the corpus has no full-text
    dups) and keep the LONGEST representative per group, ties doc_id
    asc (ops/dedup.py exact_dedup_keep_best)."""
    import pyarrow.compute as pc

    from fdblucene_ray.ops.dedup import exact_dedup_keep_best

    def with_snippet(batch: pa.Table) -> pa.Table:
        t = batch["text"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "snippet": pc.utf8_slice_codeunits(t, 0, 30),
                "n_chars": batch["n_chars"],
            }
        )

    ds = _docs_ds(sf_dir, ["doc_id", "text", "n_chars"]).map_batches(
        with_snippet, batch_format="pyarrow"
    )
    out = exact_dedup_keep_best(
        ds, text_col="snippet", score_col="n_chars"
    )
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def q_diverse_sample(sf_dir: str) -> pa.Table:
    """Greedy k-center (farthest-point) diversity sample over the
    embeddings table — deterministic coreset selection
    (ops/clustering.py kcenter_sample). Rows-only: the greedy argmax
    recursion is not SQL-expressible; tests/test_geo_clustering.py
    holds the brute-force oracle."""
    from fdblucene_ray.ops.clustering import kcenter_sample

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    out = kcenter_sample(ds, 10)
    return pa.table(
        {
            "rank": out["rank"],
            "vec_id": out["vec_id"],
            "dist": _round_col(
                out["dist"].to_numpy(zero_copy_only=False), 6
            ),
        }
    )


# ---------------------------------------------------------------- registry


def queries() -> dict:
    return {
        "ft_bm25_single": q_ft_bm25_single,
        "ft_bm25_forblock": q_ft_bm25_forblock,
        "ft_bm25_or": q_ft_bm25_or,
        "ft_bm25_and": q_ft_bm25_and,
        "ft_term_stats": q_ft_term_stats,
        "ft_field_stats": q_ft_field_stats,
        "ft_vocab": q_ft_vocab,
        "ft_top_terms": q_ft_top_terms,
        "ft_keyword_lookup": q_ft_keyword_lookup,
        "ft_prefix": q_ft_prefix,
        "ft_wildcard": q_ft_wildcard,
        "ft_fuzzy": q_ft_fuzzy,
        "ft_regexp": q_ft_regexp,
        "ft_term_range": q_ft_term_range,
        "ft_explain": q_ft_explain,
        "ft_phrase": q_ft_phrase,
        "ft_phrase_slop": q_ft_phrase_slop,
        "ft_rescore": q_ft_rescore,
        "ft_highlight": q_ft_highlight,
        "ft_near_unordered": q_ft_near_unordered,
        "ft_near_ordered": q_ft_near_ordered,
        "ft_multifield": q_ft_multifield,
        "ft_dismax": q_ft_dismax,
        "ft_facet_ranges": q_ft_facet_ranges,
        "ft_collapse": q_ft_collapse,
        "ft_bool_msm": q_ft_bool_msm,
        "ft_synonym": q_ft_synonym,
        "ft_function_score": q_ft_function_score,
        "ft_feature_field": q_ft_feature_field,
        "ft_distance_feature": q_ft_distance_feature,
        "ft_sort_multi": q_ft_sort_multi,
        "ft_sort_by_field": q_ft_sort_by_field,
        "ft_sort_keyword": q_ft_sort_keyword,
        "ft_sort_keyword_desc": q_ft_sort_keyword_desc,
        "ft_facet_sortedset": q_ft_facet_sortedset,
        "ft_binary_dv": q_ft_binary_dv,
        "ft_dv_update": q_ft_dv_update,
        "ft_dv_boost": q_ft_dv_boost,
        "ft_bm25_boolean": q_ft_boolean,
        "ft_bm25_filter": q_ft_filter,
        "ft_bool_expr": q_ft_bool_expr,
        "ft_parser_mixed": q_ft_parser_mixed,
        "ft_payload_score": q_ft_payload_score,
        "ft_multi_index": q_ft_multi_index,
        "ft_scatter_gather": q_ft_scatter_gather,
        "ft_tfidf": q_ft_tfidf,
        "ft_lm_dirichlet": q_ft_lm_dirichlet,
        "ft_lm_jm": q_ft_lm_jm,
        "ft_dfr": q_ft_dfr,
        "ft_boolean_sim": q_ft_boolean_sim,
        "ft_block_join": q_ft_block_join,
        "ft_block_join_child": q_ft_block_join_child,
        "ft_substring": q_ft_substring,
        "ft_maxp": q_ft_maxp,
        "ft_relaxed": q_ft_relaxed,
        "ft_join": q_ft_join,
        "ft_bm25f": q_ft_bm25f,
        "ft_boost": q_ft_boost,
        "ft_facets": q_ft_facets,
        "ft_mlt": q_ft_mlt,
        "ft_page2": q_ft_page2,
        "ft_doc_norms": q_ft_doc_norms,
        "ft_numeric_range": q_ft_numeric_range,
        "ft_numeric_sort": q_ft_numeric_sort,
        "ft_index_sort": q_ft_index_sort,
        "sig_terms": q_sig_terms,
        "percolate": q_percolate,
        "ft_delete_search": q_ft_delete_search,
        "ft_commit_travel": q_ft_commit_travel,
        "ft_delete_purge_stats": q_ft_delete_purge_stats,
        "ft_delete_purge_search": q_ft_delete_purge_search,
        "search_lucene": q_search_lucene,
        "dedup_exact": q_dedup_exact,
        "dedup_incremental": q_dedup_incremental,
        "train_shuffle": q_train_shuffle,
        "sample_token_budget": q_sample_token_budget,
        "dedup_minhash": q_dedup_minhash,
        "dedup_near_corpus": q_dedup_near_corpus,
        "dedup_simhash": q_dedup_simhash,
        "ngram_jaccard": q_ngram_jaccard,
        "lang_id": q_lang_id,
        "text_quality": q_text_quality,
        "token_count": q_token_count,
        "fingerprint": q_fingerprint,
        "window_tumbling": q_window_tumbling,
        "window_sliding": q_window_sliding,
        "sessionize": q_sessionize,
        "ann_cosine": q_ann_cosine,
        "hybrid_rrf": q_hybrid_rrf,
        "hybrid_weighted": q_hybrid_weighted,
        "rank_eval": q_rank_eval,
        "eval_similarity_ab": q_eval_similarity_ab,
        "ann_batch": q_ann_batch,
        "ann_graph": q_ann_graph,
        "ann_ivf": q_ann_ivf,
        "ann_ivf_full": q_ann_ivf_full,
        "ann_ivf_append": q_ann_ivf_append,
        "ann_maxsim": q_ann_maxsim,
        "ann_tune": q_ann_tune,
        "ann_maxsim_rerank": q_ann_maxsim_rerank,
        "ann_maxsim_plaid": q_ann_maxsim_plaid,
        "ann_lsh": q_ann_lsh,
        "ann_lsh_full": q_ann_lsh_full,
        "dedup_embedding": q_dedup_embedding,
        "semantic_dedup": q_semantic_dedup,
        "multimodal_meta": q_multimodal_meta,
        "audio_features": q_audio_features,
        "audio_near_dup": q_audio_near_dup,
        "media_dedup": q_media_dedup,
        "chunk_docs": q_chunk_documents,
        "approx_users": q_approx_users,
        "multimodal_frames": q_multimodal_frames,
        "term_vectors": q_term_vectors,
        "chunk_dedup": q_chunk_dedup,
        "scrub_spans": q_scrub_spans,
        "exact_dup_spans": q_exact_dup_spans,
        "dedup_suffix": q_dedup_suffix,
        "scrub_suffix": q_scrub_suffix,
        "dedup_suffix_append": q_dedup_suffix_append,
        "url_dedup": q_url_dedup,
        "url_filter": q_url_filter,
        "host_cap": q_host_cap,
        "ft_shingle": q_ft_shingle,
        "ft_shingle_search": q_ft_shingle_search,
        "ft_docvalue_stats": q_ft_docvalue_stats,
        "check_index": q_check_index,
        "token_fertility": q_token_fertility,
        "filter_funnel": q_filter_funnel,
        "dedup_keep_best": q_dedup_keep_best,
        "dedup_near_best": q_dedup_near_best,
        "diverse_sample": q_diverse_sample,
        "repetition": q_repetition,
        "source_stats": q_source_stats,
        "normalize_text": q_normalize_text,
        "bpe_pairs": q_bpe_pairs,
        "decontam": q_decontam,
        "pii_scrub": q_pii_scrub,
        "sample_hash": q_sample_hash,
        "sample_stratified": q_sample_stratified,
        "mix_rates": q_mix_rates,
        "sample_mix": q_sample_mix,
        "bpe_train": q_bpe_train,
        "bpe_apply": q_bpe_apply,
        "dup_ngrams": q_dup_ngrams,
        "curate": q_curate,
        "pack_sequences": q_pack_sequences,
        "lm_score": q_lm_score,
        "cooccurrence": q_cooccurrence,
        "asof_join": q_asof_join,
        "ft_suggest": q_ft_suggest,
        "top_terms_per_source": q_top_terms_per_source,
        "dup_components": q_dup_components,
        "group_quantiles": q_group_quantiles,
        "curate_then_index": q_curate_then_index,
        "ft_facet_taxonomy": q_ft_facet_taxonomy,
        "ft_span_first": q_ft_span_first,
        "ft_multivalue_phrase": q_ft_multivalue_phrase,
        "ft_top_groups": q_ft_top_groups,
        "ft_drill_sideways": q_ft_drill_sideways,
        "ft_autocomplete": q_ft_autocomplete,
        "ft_suggest_phrase": q_ft_suggest_phrase,
        "approx_users_per_type": q_approx_users_per_type,
        "doc_keywords": q_doc_keywords,
        "cms_top_terms": q_cms_top_terms,
        "geo_knn": q_geo_knn,
        "geo_bbox": q_geo_bbox,
        "cluster_assign": q_cluster_assign,
        "cluster_topics": q_cluster_topics,
        "boilerplate": q_strip_boilerplate,
        "cluster_kmeans": q_cluster_kmeans,
        "ann_pq": q_ann_pq,
        "pagerank": q_pagerank,
        "link_degree": q_link_degree,
        "dsir_select": q_dsir_select,
        "quality_classifier": q_quality_classifier,
        "ft_span_not": q_ft_span_not,
        "ft_span_or": q_ft_span_or,
        "ft_intervals": q_ft_intervals,
        "ft_intervals_unordered": q_ft_intervals_unordered,
        "ft_intervals_not": q_ft_intervals_not,
        "ft_rank_boost": q_ft_rank_boost,
        "readability": q_readability,
        "ft_synonym_multiword": q_ft_synonym_multiword,
        "anchor_terms": q_anchor_terms,
        "trustrank": q_trustrank,
        "embedding_pca": q_embedding_pca,
        "hits": q_hits,
        "image_decode": q_image_decode,
        "image_near_dup": q_image_near_dup,
        "ft_multi_phrase": q_ft_multi_phrase,
        "ft_term_set": q_ft_term_set,
        "ft_facet_sum": q_ft_facet_sum,
        "ft_count": q_ft_count,
        "ft_phrase_prefix": q_ft_phrase_prefix,
        "corpus_report": q_corpus_report,
        "host_rank": q_host_rank,
        "funnel": q_funnel,
        "retention": q_retention,
        "gopher_rules": q_gopher_rules,
        "c4_rules": q_c4_rules,
        "c4_sentence_dedup": q_c4_sentence_dedup,
        "corpus_export": q_corpus_export,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q18": q_tpch_q18,
        "weighted_sample": q_weighted_sample,
        "ann_range": q_ann_range,
        "knn_prefilter": q_knn_prefilter,
        "label_centroids": q_label_centroids,
        "ppl_buckets": q_ppl_buckets,
        "sq8_codes": q_sq8_codes,
        "lm_score_bigram": q_lm_score_bigram,
        "warc_extract": q_warc_extract,
        "warc_index": q_warc_index,
        "jsonl_ingest": q_jsonl_ingest,
        "csv_ingest": q_csv_ingest,
        "ascii_fold": q_ascii_fold,
        "auto_stopwords": q_auto_stopwords,
        "source_kl": q_source_kl,
        "hard_negatives": q_hard_negatives,
        "commit_diff": q_commit_diff,
        "prep_pipeline": q_prep_pipeline,
        "jl_project": q_jl_project,
        "compress_ratio": q_compress_ratio,
        "catalog": q_catalog,
        "ft_append_refresh": q_ft_append_refresh,
        "ft_sync_ingest": q_ft_sync_ingest,
        "label_drift": q_label_drift,
        "neardup_probe": q_neardup_probe,
        "ft_index_stats": q_ft_index_stats,
        "event_zscores": q_event_zscores,
        "ann_sq8": q_ann_sq8,
        "ann_sq8_stored": q_ann_sq8_stored,
        "ft_mmr": q_ft_mmr,
    }


def oracle_sql() -> dict:
    lang_counts = {
        lang: ", ".join(f"'{w}'" for w in words)
        for lang, words in __import__(
            "fdblucene_ray.ops.textstats", fromlist=["LANG_MARKERS"]
        ).LANG_MARKERS.items()
    }
    sql = {
        "ft_bm25_single": _bm25_sql(["data"]),
        "ft_bm25_forblock": _bm25_sql(["data"]),
        "ft_bm25_boolean": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'merge') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id, tf.tok,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf JOIN dfx ON dfx.tok = tf.tok JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats),
excluded AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'window'),
scored AS (
  SELECT doc_id, sum(s) AS score FROM contrib
  WHERE doc_id IN (SELECT doc_id FROM contrib WHERE tok = 'data')
    AND doc_id NOT IN (SELECT doc_id FROM excluded)
  GROUP BY doc_id)
SELECT doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT 10
""",
        "ft_bm25_filter": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok = 'data' GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf JOIN dfx ON dfx.tok = tf.tok JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats),
filt AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'merge'),
scored AS (
  SELECT doc_id, sum(s) AS score FROM contrib
  WHERE doc_id IN (SELECT doc_id FROM filt)
  GROUP BY doc_id)
SELECT doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT 10
""",
        "ft_bool_expr": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'merge', 'stream') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id, tf.tok,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf JOIN dfx ON dfx.tok = tf.tok JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats),
cand AS (
  SELECT doc_id FROM documents d
  WHERE (EXISTS(SELECT 1 FROM tf WHERE tf.doc_id = d.doc_id AND tok = 'data')
      OR EXISTS(SELECT 1 FROM tf WHERE tf.doc_id = d.doc_id AND tok = 'merge'))
    AND EXISTS(SELECT 1 FROM tf WHERE tf.doc_id = d.doc_id AND tok = 'stream')
    AND NOT EXISTS(SELECT 1 FROM toks WHERE toks.doc_id = d.doc_id AND tok = 'window')),
scored AS (
  SELECT c.doc_id, sum(contrib.s) AS score
  FROM cand c JOIN contrib ON contrib.doc_id = c.doc_id
  GROUP BY c.doc_id)
SELECT doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT 10
""",
        "ft_payload_score": """
WITH lists AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'), x -> x <> '') AS l
  FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM lists),
s AS (SELECT doc_id, avg(4.0 + pos) AS score
      FROM ptoks WHERE tok = 'data' GROUP BY doc_id)
SELECT doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM s ORDER BY score DESC, doc_id LIMIT 10
""",
        "ft_parser_mixed": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'merge', 'stream') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
term_contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf JOIN dfx ON dfx.tok = tf.tok JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats),
plists AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'), x -> x <> '') AS l
  FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM plists),
ptf AS (SELECT t1.doc_id, count(*)::DOUBLE AS pf
        FROM ptoks t1 JOIN ptoks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
        WHERE t1.tok = 'batch' AND t2.tok = 'stream' GROUP BY t1.doc_id),
pdf AS (SELECT tok, count(DISTINCT doc_id)::DOUBLE AS df FROM toks
        WHERE tok IN ('batch', 'stream') GROUP BY tok),
pidf AS (SELECT sum(ln(1 + (stats.dc - pdf.df + 0.5) / (pdf.df + 0.5))) AS idf
         FROM pdf CROSS JOIN stats),
phrase_contrib AS (
  SELECT ptf.doc_id,
         2.0 * pidf.idf * ptf.pf
           / (ptf.pf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM ptf JOIN dlq ON dlq.doc_id = ptf.doc_id
  CROSS JOIN pidf CROSS JOIN stats),
cand AS (
  SELECT doc_id FROM documents d
  WHERE EXISTS(SELECT 1 FROM tf WHERE tf.doc_id = d.doc_id AND tok = 'data')
    AND NOT EXISTS(SELECT 1 FROM toks WHERE toks.doc_id = d.doc_id AND tok = 'window')),
allc AS (
  SELECT doc_id, s FROM term_contrib
  UNION ALL SELECT doc_id, s FROM phrase_contrib),
scored AS (
  SELECT c.doc_id, sum(allc.s) AS score
  FROM cand c JOIN allc ON allc.doc_id = c.doc_id
  GROUP BY c.doc_id)
SELECT doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT 10
""",
        "ft_bm25f": f"""
WITH {TOKS_CTE}, {DL_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tok_s AS (SELECT doc_id, tok FROM (
  SELECT doc_id, unnest(regexp_split_to_array(lower(source), '[^0-9a-z_]+')) AS tok
  FROM documents) WHERE tok <> ''),
tf_t AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
         WHERE tok IN ('data', 'src5') GROUP BY doc_id, tok),
tf_s AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM tok_s
         WHERE tok IN ('data', 'src5') GROUP BY doc_id, tok),
tfw AS (SELECT coalesce(t.doc_id, s.doc_id) AS doc_id,
               coalesce(t.tok, s.tok) AS tok,
               1.0 * coalesce(t.tf, 0) + 2.0 * coalesce(s.tf, 0) AS tfw
        FROM tf_t t FULL OUTER JOIN tf_s s
          ON s.doc_id = t.doc_id AND s.tok = t.tok),
stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS dc,
                 (SELECT sum(dl)::DOUBLE / count(*) FROM dl) AS avgdl_t),
-- stats-only pseudo docFreq (Lucene CombinedFieldQuery): per-field
-- dfs summed, capped at maxDoc — matches the engine, which must know
-- idf from stats alone to drive block-max WAND
df_t2 AS (SELECT tok, count(*)::DOUBLE AS df FROM tf_t GROUP BY tok),
df_s2 AS (SELECT tok, count(*)::DOUBLE AS df FROM tf_s GROUP BY tok),
dfx AS (SELECT coalesce(t.tok, s.tok) AS tok,
               least(stats.dc, coalesce(t.df, 0) + coalesce(s.df, 0)) AS df
        FROM df_t2 t FULL OUTER JOIN df_s2 s ON s.tok = t.tok
        CROSS JOIN stats),
dlw AS (SELECT d.doc_id,
               1.0 * coalesce(dlq.dlq, 0) + 2.0 * 1.0 AS dl_w
        FROM documents d LEFT JOIN dlq ON dlq.doc_id = d.doc_id),
contrib AS (
  SELECT tfw.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tfw.tfw / (tfw.tfw + 1.2 * (1 - 0.75
               + 0.75 * dlw.dl_w / (1.0 * stats.avgdl_t + 2.0 * 1.0))) AS s
  FROM tfw JOIN dfx ON dfx.tok = tfw.tok
  JOIN dlw ON dlw.doc_id = tfw.doc_id
  CROSS JOIN stats),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id)
SELECT doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT 10
""",
        "ft_tfidf": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'merge') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         pow(1 + ln(stats.dc / (dfx.df + 1)), 2)
           * sqrt(tf.tf) / sqrt(dlq.dlq) AS s
  FROM tf JOIN dfx ON dfx.tok = tf.tok JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id)
SELECT doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT 10
""",
        "ft_lm_dirichlet": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'merge') GROUP BY doc_id, tok),
ttf AS (SELECT tok, count(*)::DOUBLE AS ttf FROM toks
        WHERE tok IN ('data', 'merge') GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         greatest(
           ln(1 + tf.tf / (2000.0 * (ttf.ttf / stats.sttf)))
             + ln(2000.0 / (dlq.dlq + 2000.0)),
           0.0) AS s
  FROM tf
  JOIN ttf ON ttf.tok = tf.tok
  JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats
),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id)
SELECT doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT 10
""",
        "ft_lm_jm": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'merge') GROUP BY doc_id, tok),
ttf AS (SELECT tok, count(*)::DOUBLE AS ttf FROM toks
        WHERE tok IN ('data', 'merge') GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + ((1.0 - 0.1) / 0.1) * (tf.tf / dlq.dlq)
                  / (ttf.ttf / stats.sttf)) AS s
  FROM tf
  JOIN ttf ON ttf.tok = tf.tok
  JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats
),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id)
SELECT doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT 10
""",
        "ft_dfr": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'merge') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
-- DFR InL2: tfn = tf * log2(1 + avgdl/dl); s = w * tfn/(tfn+1);
-- w = log2((N+1)/(df+0.5)); dl is the byte4-quantized length (dlq),
-- avgdl the exact sttf/dc, mirroring the engine's expression shapes
contrib AS (
  SELECT tf.doc_id,
         (ln((stats.dc + 1.0) / (dfx.df + 0.5)) / ln(2.0))
           * (tf.tf * (ln(1.0 + (stats.sttf / stats.dc) / dlq.dlq)
                         / ln(2.0)))
           / ((tf.tf * (ln(1.0 + (stats.sttf / stats.dc) / dlq.dlq)
                          / ln(2.0))) + 1.0) AS s
  FROM tf
  JOIN dfx ON dfx.tok = tf.tok
  JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats
),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id)
SELECT doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT 10
""",
        "ft_boolean_sim": f"""
WITH {TOKS_CTE},
-- BooleanSimilarity: score = number of distinct matching query terms
scored AS (SELECT doc_id, count(DISTINCT tok)::DOUBLE AS score
           FROM toks WHERE tok IN ('data', 'merge', 'stream')
           GROUP BY doc_id)
SELECT doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT 10
""",
        "ft_block_join": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'merge') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf
  JOIN dfx ON dfx.tok = tf.tok
  JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats
),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id),
par AS (SELECT doc_id // 8 AS parent_id, max(score) AS score,
               count(*)::BIGINT AS n_children
        FROM scored GROUP BY doc_id // 8)
SELECT parent_id, CAST(round(score, 4) AS DOUBLE) AS score, n_children
FROM par ORDER BY score DESC, parent_id LIMIT 10
""",
        "ft_substring": (
            "SELECT doc_id FROM documents "
            "WHERE contains(lower(text), 'indo') "
            "ORDER BY doc_id LIMIT 25"
        ),
        "audio_features": """
WITH ids AS (SELECT doc_id, 16 + (doc_id % 32) AS k,
                    0.3 + (doc_id % 5) * 0.1 AS amp FROM documents),
sig AS (SELECT i.doc_id,
               round(i.amp * 32767 * sin(2 * pi() * i.k * g.n / 1024)) AS q,
               g.n
        FROM ids i CROSS JOIN
          (SELECT unnest(generate_series(0, 1023)) AS n) g),
x AS (SELECT doc_id, n, q / 32768.0 AS v FROM sig),
r AS (SELECT doc_id, sqrt(avg(v * v)) AS rms FROM x GROUP BY doc_id),
z AS (SELECT doc_id,
             sum(CASE WHEN sgn * prev_sgn < 0 THEN 1 ELSE 0 END)::BIGINT AS zcr
      FROM (SELECT doc_id, sign(v) AS sgn,
                   lag(sign(v)) OVER (PARTITION BY doc_id ORDER BY n) AS prev_sgn
            FROM x)
      WHERE prev_sgn IS NOT NULL GROUP BY doc_id)
SELECT i.doc_id, 8192::BIGINT AS sr, 1024::BIGINT AS n_samples,
       CAST(round(r.rms, 4) AS DOUBLE) AS rms, z.zcr,
       (8 * i.k)::BIGINT AS peak_freq_hz
FROM ids i JOIN r ON r.doc_id = i.doc_id JOIN z ON z.doc_id = i.doc_id
ORDER BY i.doc_id
""",
        "ft_maxp": f"""
WITH t0 AS (
  SELECT doc_id, unnest(arr) AS tok,
         unnest(generate_series(1, len(arr))) AS ord0
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '[^0-9a-z_]+') AS arr
        FROM documents)
),
t AS (SELECT doc_id, tok,
             row_number() OVER (PARTITION BY doc_id ORDER BY ord0) - 1 AS pos
      FROM t0 WHERE tok <> ''),
n AS (SELECT doc_id, count(*) AS n_tok FROM t GROUP BY doc_id),
starts AS (SELECT doc_id,
                  unnest(generate_series(0, (n_tok - 1)::BIGINT, 48)) AS start_tok
           FROM n),
ct AS (SELECT s.doc_id, s.start_tok, t.tok
       FROM starts s JOIN t ON t.doc_id = s.doc_id
         AND t.pos >= s.start_tok AND t.pos < s.start_tok + 64),
dl AS (SELECT doc_id, start_tok, count(*) AS dl FROM ct
       GROUP BY doc_id, start_tok),
stats AS (SELECT count(*)::DOUBLE AS dc, sum(dl)::DOUBLE AS sttf FROM dl),
{NORMVALS_CTE},
dlq AS (SELECT d.doc_id, d.start_tok, max(v) AS dlq FROM dl d
        JOIN normvals ON v <= d.dl GROUP BY d.doc_id, d.start_tok),
tf AS (SELECT doc_id, start_tok, tok, count(*)::DOUBLE AS tf FROM ct
       WHERE tok IN ('data', 'merge') GROUP BY doc_id, start_tok, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id, tf.start_tok,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf JOIN dfx ON dfx.tok = tf.tok
  JOIN dlq ON dlq.doc_id = tf.doc_id AND dlq.start_tok = tf.start_tok
  CROSS JOIN stats),
scored AS (SELECT doc_id, start_tok, sum(s) AS score FROM contrib
           GROUP BY doc_id, start_tok),
par AS (SELECT doc_id AS parent_id, max(score) AS score,
               count(*)::BIGINT AS n_chunks
        FROM scored GROUP BY doc_id)
SELECT parent_id, CAST(round(score, 4) AS DOUBLE) AS score, n_chunks
FROM par ORDER BY score DESC, parent_id LIMIT 10
""",
        "ft_block_join_child": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'merge') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf
  JOIN dfx ON dfx.tok = tf.tok
  JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats
),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id),
par AS (SELECT doc_id // 8 AS parent_id, max(score) AS score
        FROM scored GROUP BY doc_id // 8
        ORDER BY score DESC, parent_id LIMIT 3),
maxd AS (SELECT max(doc_id) AS md FROM documents),
kids AS (SELECT p.parent_id, p.parent_id * 8 + g.o AS doc_id, p.score
         FROM par p CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS o) g)
SELECT k.parent_id, k.doc_id, CAST(round(k.score, 4) AS DOUBLE) AS score
FROM kids k CROSS JOIN maxd WHERE k.doc_id <= maxd.md
ORDER BY k.score DESC, k.parent_id, k.doc_id
""",
        "ft_join": f"""
WITH {TOKS_CTE},
m AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'dup'),
v AS (SELECT DISTINCT d.source FROM documents d JOIN m USING (doc_id))
SELECT doc_id FROM documents WHERE source IN (SELECT source FROM v)
ORDER BY doc_id LIMIT 25
""",
        "ft_bm25_or": _bm25_sql(["data", "merge"]),
        # federated MultiReader search == single-index semantics, so
        # the oracle IS the ordinary whole-corpus BM25 twin
        "ft_multi_index": _bm25_sql(["data", "merge"]),
        # scatter-gather actor fleet == single-index semantics (DFS
        # global stats), same whole-corpus BM25 twin
        "ft_scatter_gather": _bm25_sql(["data", "window"]),
        "ft_page2": _bm25_sql(["data", "merge"]).replace(
            "LIMIT 10", "LIMIT 10 OFFSET 10"
        ),
        "ft_mlt": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
dtf AS (SELECT tok, count(*)::DOUBLE AS f FROM toks WHERE doc_id = 0 GROUP BY tok),
alldf AS (SELECT tok, count(DISTINCT doc_id)::DOUBLE AS df FROM toks GROUP BY tok),
sel AS (SELECT dtf.tok FROM dtf JOIN alldf ON alldf.tok = dtf.tok CROSS JOIN stats
        ORDER BY dtf.f * ln(1 + (stats.dc - alldf.df + 0.5) / (alldf.df + 0.5)) DESC,
                 dtf.tok
        LIMIT 5),
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN (SELECT tok FROM sel) GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf
  JOIN dfx ON dfx.tok = tf.tok
  JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats
),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id)
SELECT doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM scored WHERE doc_id <> 0 ORDER BY score DESC, doc_id LIMIT 10
""",
        "ft_facets": f"""
WITH {TOKS_CTE},
m AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'data')
SELECT d.source AS value, count(*)::BIGINT AS n
FROM documents d JOIN m ON m.doc_id = d.doc_id
GROUP BY d.source ORDER BY n DESC, value
""",
        "ft_boost": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'merge') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         (CASE tf.tok WHEN 'data' THEN 2.0 ELSE 1.0 END)
           * ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf
  JOIN dfx ON dfx.tok = tf.tok
  JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats
),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id)
SELECT doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT 10
""",
        "ft_bm25_and": _bm25_sql(["window", "batch"], operator="and"),
        # relaxation rescue: the planted df-0 term drops, leaving the
        # ordinary data AND merge conjunction at level 1
        "ft_relaxed": (
            "SELECT doc_id, score, 1::BIGINT AS level FROM ("
            + _bm25_sql(["data", "merge"], operator="and")
            + ") rescued"
        ),
        "ft_term_stats": f"""
WITH {TOKS_CTE}
SELECT tok AS term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS ttf
FROM toks WHERE tok IN ('data','merge','join','window','the','zzzznotaterm')
GROUP BY tok ORDER BY term
""",
        "ft_field_stats": f"""
WITH {TOKS_CTE}, {DL_CTE}
SELECT count(*)::BIGINT AS dc, sum(dl)::BIGINT AS sttf,
       (SELECT count(*) FROM (SELECT DISTINCT doc_id, tok FROM toks))::BIGINT AS sdf,
       CAST(round(sum(dl)::DOUBLE / count(*), 6) AS DOUBLE) AS avgdl
FROM dl
""",
        "ft_vocab": f"""
WITH {TOKS_CTE}
SELECT count(DISTINCT tok)::BIGINT AS n_terms FROM toks
""",
        "ft_top_terms": f"""
WITH {TOKS_CTE}
SELECT tok AS term, count(DISTINCT doc_id)::BIGINT AS df
FROM toks GROUP BY tok ORDER BY df DESC, term LIMIT 20
""",
        "ft_keyword_lookup": "SELECT doc_id FROM documents WHERE source = 'src5' ORDER BY doc_id",
        "ft_prefix": f"""
WITH {TOKS_CTE}
SELECT tok AS term, count(DISTINCT doc_id)::BIGINT AS df
FROM toks WHERE tok LIKE 's%' GROUP BY tok ORDER BY term
""",
        "ft_wildcard": f"""
WITH {TOKS_CTE}
SELECT doc_id FROM (SELECT DISTINCT doc_id FROM toks WHERE tok LIKE 's%a%')
ORDER BY doc_id LIMIT 20
""",
        "ft_fuzzy": f"""
WITH {TOKS_CTE}
SELECT tok AS term, count(DISTINCT doc_id)::BIGINT AS df,
       levenshtein(tok, 'part')::BIGINT AS dist
FROM toks GROUP BY tok HAVING levenshtein(tok, 'part') <= 2 ORDER BY term
""",
        "ft_regexp": f"""
WITH {TOKS_CTE}
SELECT tok AS term, count(DISTINCT doc_id)::BIGINT AS df
FROM toks WHERE regexp_full_match(tok, 's.*a.*') GROUP BY tok ORDER BY term
""",
        "ft_term_range": f"""
WITH {TOKS_CTE}
SELECT tok AS term, count(DISTINCT doc_id)::BIGINT AS df
FROM toks WHERE tok >= 'data' AND tok < 'merge' GROUP BY tok ORDER BY term
""",
        "ft_explain": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'merge') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id, tf.tok, tf.tf, dfx.df, dlq.dlq,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf
  JOIN dfx ON dfx.tok = tf.tok
  JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats
),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id),
top1 AS (SELECT doc_id FROM scored ORDER BY score DESC, doc_id LIMIT 1)
SELECT c.tok AS term, c.doc_id, c.tf::BIGINT AS tf, c.df::BIGINT AS df,
       c.dlq::BIGINT AS dl_lossy, CAST(round(c.s, 4) AS DOUBLE) AS score
FROM contrib c JOIN top1 USING (doc_id) ORDER BY term
""",
        "ft_phrase": """
WITH lists AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'), x -> x <> '') AS l
  FROM documents),
toks AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM lists)
SELECT t1.doc_id, count(*)::BIGINT AS phrase_freq
FROM toks t1 JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
WHERE t1.tok = 'batch' AND t2.tok = 'stream'
GROUP BY t1.doc_id
""",
        "ft_rescore": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'merge') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf JOIN dfx ON dfx.tok = tf.tok JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats),
fw AS (SELECT doc_id, sum(s) AS bm25 FROM contrib GROUP BY doc_id
       ORDER BY bm25 DESC, doc_id LIMIT 30),
lists AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'), x -> x <> '') AS l
  FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM lists),
pfreq AS (SELECT t1.doc_id, count(*)::DOUBLE AS pf
          FROM ptoks t1 JOIN ptoks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
          WHERE t1.tok = 'batch' AND t2.tok = 'stream' GROUP BY t1.doc_id),
pdf AS (SELECT
  (SELECT count(DISTINCT doc_id) FROM toks WHERE tok = 'batch')::DOUBLE AS df_b,
  (SELECT count(DISTINCT doc_id) FROM toks WHERE tok = 'stream')::DOUBLE AS df_s),
pidf AS (SELECT ln(1 + (stats.dc - pdf.df_b + 0.5) / (pdf.df_b + 0.5))
              + ln(1 + (stats.dc - pdf.df_s + 0.5) / (pdf.df_s + 0.5)) AS idf
         FROM pdf CROSS JOIN stats),
ps AS (SELECT pfreq.doc_id,
              pidf.idf * pf / (pf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS psc
       FROM pfreq JOIN dlq ON dlq.doc_id = pfreq.doc_id
       CROSS JOIN pidf CROSS JOIN stats),
fin AS (SELECT fw.doc_id, 1.0 * fw.bm25 + 2.0 * coalesce(ps.psc, 0) AS score
        FROM fw LEFT JOIN ps ON ps.doc_id = fw.doc_id)
SELECT doc_id::BIGINT AS doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM fin ORDER BY score DESC, doc_id LIMIT 10
""",
        "ft_phrase_slop": """
WITH lists AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'), x -> x <> '') AS l
  FROM documents),
toks AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM lists)
SELECT t1.doc_id, count(*)::BIGINT AS sloppy_freq
FROM toks t1
WHERE t1.tok = 'batch' AND EXISTS (
  SELECT 1 FROM toks t2
  WHERE t2.doc_id = t1.doc_id AND t2.tok = 'stream'
    AND abs(t2.pos - t1.pos - 1) <= 2)
GROUP BY t1.doc_id
ORDER BY t1.doc_id
""",
        "ft_highlight": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, count(*)::DOUBLE AS tf FROM toks
       WHERE tok = 'data' GROUP BY doc_id),
dfx AS (SELECT count(*)::DOUBLE AS df FROM tf),
scored AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS score,
         tf.tf AS tf
  FROM tf CROSS JOIN dfx JOIN dlq ON dlq.doc_id = tf.doc_id CROSS JOIN stats),
top AS (SELECT doc_id, tf FROM scored ORDER BY score DESC, doc_id LIMIT 10)
SELECT doc_id, tf::BIGINT AS n_spans FROM top ORDER BY doc_id
""",
        "ft_near_unordered": """
WITH lists AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'), x -> x <> '') AS l
  FROM documents),
toks AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM lists)
SELECT t1.doc_id AS doc_id,
       min(greatest(t1.pos, t2.pos) - least(t1.pos, t2.pos) + 1)::BIGINT AS min_span
FROM toks t1 JOIN toks t2 ON t1.doc_id = t2.doc_id
WHERE t1.tok = 'batch' AND t2.tok = 'stream'
GROUP BY t1.doc_id
HAVING min(greatest(t1.pos, t2.pos) - least(t1.pos, t2.pos) + 1) <= 6
ORDER BY t1.doc_id
""",
        "ft_near_ordered": """
WITH lists AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'), x -> x <> '') AS l
  FROM documents),
toks AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM lists)
SELECT t1.doc_id AS doc_id, min(t2.pos - t1.pos + 1)::BIGINT AS min_span
FROM toks t1 JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos > t1.pos
WHERE t1.tok = 'data' AND t2.tok = 'merge'
GROUP BY t1.doc_id
HAVING min(t2.pos - t1.pos + 1) <= 8
ORDER BY t1.doc_id
""",
        "ft_multifield": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'src3') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
text_contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf JOIN dfx ON dfx.tok = tf.tok JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats),
-- source field analyzed with the same chain: every doc -> 1 token,
-- dl = 1, avgdl = 1, so K = k1 = 1.2 exactly
src_stats AS (SELECT count(*)::DOUBLE AS dc FROM documents),
src_df AS (SELECT tok, count(*)::DOUBLE AS df FROM (
  SELECT doc_id, lower(source) AS tok FROM documents) GROUP BY tok),
src_contrib AS (
  SELECT d.doc_id,
         ln(1 + (sc.dc - sd.df + 0.5) / (sd.df + 0.5)) * 1.0 / (1.0 + 1.2) AS s
  FROM documents d
  JOIN src_df sd ON sd.tok = lower(d.source)
  CROSS JOIN src_stats sc
  WHERE lower(d.source) IN ('data', 'src3')),
scored AS (
  SELECT doc_id, sum(s) AS score FROM (
    SELECT * FROM text_contrib UNION ALL SELECT * FROM src_contrib)
  GROUP BY doc_id)
SELECT doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT 10
""",
        # DisMax over (text, source): per-field BM25 subtotals exactly
        # as ft_multifield, combined as max + 0.3 * rest.
        "ft_dismax": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'src3') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
text_sub AS (
  SELECT tf.doc_id, sum(
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc)))) AS s
  FROM tf JOIN dfx ON dfx.tok = tf.tok JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats GROUP BY tf.doc_id),
src_stats AS (SELECT count(*)::DOUBLE AS dc FROM documents),
src_df AS (SELECT tok, count(*)::DOUBLE AS df FROM (
  SELECT doc_id, lower(source) AS tok FROM documents) GROUP BY tok),
src_sub AS (
  SELECT d.doc_id,
         ln(1 + (sc.dc - sd.df + 0.5) / (sd.df + 0.5)) * 1.0 / (1.0 + 1.2) AS s
  FROM documents d
  JOIN src_df sd ON sd.tok = lower(d.source)
  CROSS JOIN src_stats sc
  WHERE lower(d.source) IN ('data', 'src3')),
combined AS (
  SELECT coalesce(t.doc_id, u.doc_id) AS doc_id,
         greatest(coalesce(t.s, 0), coalesce(u.s, 0))
           + 0.3 * (coalesce(t.s, 0) + coalesce(u.s, 0)
                    - greatest(coalesce(t.s, 0), coalesce(u.s, 0))) AS score
  FROM text_sub t FULL OUTER JOIN src_sub u ON u.doc_id = t.doc_id)
SELECT doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM combined ORDER BY score DESC, doc_id LIMIT 10
""",
        # Numeric range facets for the 'data' match set over n_chars
        # ([lo, hi) buckets, open ends), bucket order fixed.
        "ft_facet_ranges": f"""
WITH {TOKS_CTE},
m AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'data'),
v AS (SELECT d.n_chars FROM documents d JOIN m ON m.doc_id = d.doc_id),
buckets(idx, bucket, lo, hi) AS (VALUES
  (0, 'lt200', NULL, 200), (1, '200_400', 200, 400),
  (2, 'ge400', 400, NULL))
SELECT b.bucket,
       (SELECT count(*) FROM v
        WHERE (b.lo IS NULL OR v.n_chars >= b.lo)
          AND (b.hi IS NULL OR v.n_chars < b.hi))::BIGINT AS n
FROM buckets b ORDER BY b.idx
""",
        # Field collapsing: best 'data merge' hit per source, groups
        # ranked by best score (ties: source asc).
        "ft_collapse": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'merge') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf JOIN dfx ON dfx.tok = tf.tok JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id),
ranked AS (
  SELECT d.source, s.doc_id, s.score,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY s.score DESC, s.doc_id) AS rn
  FROM scored s JOIN documents d ON d.doc_id = s.doc_id)
SELECT source, doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM ranked WHERE rn = 1 ORDER BY score DESC, source LIMIT 10
""",
        # BooleanQuery minimumNumberShouldMatch: must 'data' + >=2 of
        # the three SHOULD terms; all matching clauses score.
        "ft_bool_msm": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'merge', 'window', 'scan') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id, tf.tok,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf JOIN dfx ON dfx.tok = tf.tok JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats),
eligible AS (
  SELECT doc_id FROM contrib GROUP BY doc_id
  HAVING count(*) FILTER (WHERE tok = 'data') = 1
     AND count(*) FILTER (WHERE tok IN ('merge', 'window', 'scan')) >= 2),
scored AS (
  SELECT c.doc_id, sum(c.s) AS score FROM contrib c
  JOIN eligible e ON e.doc_id = c.doc_id GROUP BY c.doc_id)
SELECT doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT 10
""",
        # SynonymQuery: ('join','merge') as one pseudo-term (tf summed,
        # idf from the exact union df) + plain 'scan' clause.
        "ft_synonym": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tfg AS (SELECT doc_id,
        CASE WHEN tok IN ('join', 'merge') THEN 0 ELSE 1 END AS g,
        count(*)::DOUBLE AS tf
        FROM toks WHERE tok IN ('join', 'merge', 'scan') GROUP BY doc_id, g),
dfg AS (SELECT g, count(*)::DOUBLE AS df FROM tfg GROUP BY g),
contrib AS (
  SELECT tfg.doc_id,
         ln(1 + (stats.dc - dfg.df + 0.5) / (dfg.df + 0.5))
           * tfg.tf / (tfg.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tfg JOIN dfg ON dfg.g = tfg.g JOIN dlq ON dlq.doc_id = tfg.doc_id
  CROSS JOIN stats),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id)
SELECT doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT 10
""",
        "weighted_sample": """
WITH keyed AS (
  SELECT doc_id, n_chars::DOUBLE AS weight,
         ln((CAST(('0x' || substr(md5('s42-' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS UBIGINT) + 0.5) / 4294967296.0) / n_chars AS k
  FROM documents WHERE n_chars > 0)
SELECT doc_id, weight FROM keyed ORDER BY k DESC, doc_id LIMIT 100
""",
        "retention": """
WITH uw AS (SELECT DISTINCT user_id,
                   CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk
            FROM events),
w0 AS (SELECT user_id, min(wk) AS w0 FROM uw GROUP BY user_id)
SELECT (uw.wk - w0.w0) AS week_offset,
       count(DISTINCT uw.user_id)::BIGINT AS users
FROM uw JOIN w0 USING (user_id)
GROUP BY 1 ORDER BY 1
""",
        "funnel": """
WITH t1 AS (SELECT user_id, min(ts) AS ts FROM events
            WHERE event_type = 'view' GROUP BY user_id),
t2 AS (SELECT e.user_id, min(e.ts) AS ts FROM events e
       JOIN t1 ON t1.user_id = e.user_id AND e.ts > t1.ts
       WHERE e.event_type = 'click' GROUP BY e.user_id),
t3 AS (SELECT e.user_id, min(e.ts) AS ts FROM events e
       JOIN t2 ON t2.user_id = e.user_id AND e.ts > t2.ts
       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT 'view' AS step, count(*)::BIGINT AS users FROM t1
UNION ALL SELECT 'click', count(*)::BIGINT FROM t2
UNION ALL SELECT 'purchase', count(*)::BIGINT FROM t3
""",
        "c4_rules": """
WITH l AS (
  SELECT doc_id,
         list_transform(split(text, chr(10)),
                        x -> regexp_replace(x, '^\\s+|\\s+$', '', 'g'))
           AS lines,
         contains(lower(text), 'lorem ipsum') AS has_lorem,
         contains(text, '{') AS has_brace
  FROM documents),
k AS (
  SELECT doc_id, len(lines)::BIGINT AS n_lines, has_lorem, has_brace,
         list_filter(lines, x ->
             regexp_matches(x, '[.!?"]$')
             AND NOT contains(lower(x), 'javascript')
             AND NOT contains(x, '{')
             AND len(list_filter(regexp_split_to_array(x, '\\s+'),
                                 w -> w <> '')) >= 3) AS kept,
         len(list_filter(lines,
             x -> contains(lower(x), 'javascript'))) > 0 AS has_js
  FROM l)
SELECT doc_id, n_lines, len(kept)::BIGINT AS n_kept_lines,
       has_lorem, has_brace, has_js,
       coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
       (len(kept) >= 3 AND NOT has_lorem AND NOT has_brace) AS keep
FROM k ORDER BY doc_id
""",
        "c4_sentence_dedup": r"""
WITH s AS (
  SELECT doc_id,
         list_filter(list_transform(
           regexp_extract_all(coalesce(text, ''),
                              '[\s\S]*?[.!?]+|[^.!?]+$'),
           x -> regexp_replace(x, '^\s+|\s+$', '', 'g')),
           x -> x <> '') AS sents
  FROM documents),
e AS (
  SELECT doc_id, i - 1 AS pos, sents[i] AS sent
  FROM s, UNNEST(range(1, len(sents) + 1)) AS t(i)),
sp AS (
  SELECT doc_id, i - 1 AS pos,
         sents[i] || chr(31) || sents[i+1] || chr(31) || sents[i+2] AS key
  FROM s, UNNEST(range(1, len(sents) - 1)) AS t(i)),
r AS (
  SELECT doc_id, pos,
         count(*) OVER (PARTITION BY key) AS c,
         row_number() OVER (PARTITION BY key ORDER BY doc_id, pos) AS rn
  FROM sp),
rem AS (
  SELECT DISTINCT doc_id, pos + o AS spos
  FROM r, UNNEST([0, 1, 2]) AS t(o) WHERE c > 1 AND rn > 1),
agg AS (
  SELECT e.doc_id, count(*)::BIGINT AS n_sent,
         count(rem.spos)::BIGINT AS n_removed,
         coalesce(string_agg(CASE WHEN rem.spos IS NULL THEN e.sent END,
                             ' ' ORDER BY e.pos), '') AS clean_text
  FROM e LEFT JOIN rem ON e.doc_id = rem.doc_id AND e.pos = rem.spos
  GROUP BY e.doc_id)
SELECT d.doc_id, coalesce(agg.n_sent, 0)::BIGINT AS n_sentences,
       coalesce(agg.n_removed, 0)::BIGINT AS n_removed,
       coalesce(agg.clean_text, '') AS clean_text
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
ORDER BY d.doc_id
""",
        "gopher_rules": """
WITH base AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> x <> '') AS words,
         split(text, chr(10)) AS lines,
         length(text) - length(replace(text, '#', '')) AS n_hash,
         (length(text) - length(replace(text, '...', ''))) // 3 AS n_ell
  FROM documents),
m AS (
  SELECT doc_id,
         len(words)::BIGINT AS n_words,
         greatest(len(words), 1) AS safe_w,
         CASE WHEN len(words) = 0 THEN 0.0
              ELSE list_sum(list_transform(words, x -> length(x)))::DOUBLE
                   / len(words) END AS mean_word_len,
         (n_hash + n_ell)::DOUBLE / greatest(len(words), 1)
           AS symbol_ratio,
         len(list_filter(lines, x -> starts_with(x, '-')
             OR starts_with(x, '*') OR starts_with(x, '•')))::DOUBLE
           / greatest(len(lines), 1) AS bullet_frac,
         len(list_filter(lines, x -> ends_with(x, '...')))::DOUBLE
           / greatest(len(lines), 1) AS ellipsis_frac,
         len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
           / greatest(len(words), 1) AS alpha_frac,
         len(list_filter(['and','be','have','of','that','the','to','with'],
             s -> list_contains(list_transform(words, x -> lower(x)), s))
            )::BIGINT AS n_req_stops
  FROM base)
SELECT doc_id, n_words,
       round(mean_word_len, 6) AS mean_word_len,
       round(symbol_ratio, 6) AS symbol_ratio,
       round(bullet_frac, 6) AS bullet_frac,
       round(ellipsis_frac, 6) AS ellipsis_frac,
       round(alpha_frac, 6) AS alpha_frac,
       n_req_stops,
       (n_words >= 50 AND n_words <= 100000
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
        AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
        AND n_req_stops >= 2) AS keep
FROM m ORDER BY doc_id
""",
        "tpch_q1": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity)::DOUBLE, 2) AS sum_qty,
       round(sum(l_extendedprice)::DOUBLE, 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount))::DOUBLE, 2)
         AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))::DOUBLE,
             2) AS sum_charge,
       round((sum(l_quantity) / count(*))::DOUBLE, 6) AS avg_qty,
       round((sum(l_extendedprice) / count(*))::DOUBLE, 6) AS avg_price,
       round((sum(l_discount) / count(*))::DOUBLE, 6) AS avg_disc,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-06-30'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
        "tpch_q3": """
SELECT o.o_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount))::DOUBLE, 2)
         AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY sum(l.l_extendedprice * (1 - l.l_discount)) DESC,
         o.o_orderdate, o.o_orderkey
LIMIT 10
""",
        "tpch_q18": """
WITH t AS (SELECT l_orderkey, sum(l_quantity) AS total_qty
           FROM lineitem GROUP BY l_orderkey
           HAVING sum(l_quantity) > 120.0)
SELECT c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o.o_totalprice::DOUBLE, 2) AS o_totalprice,
       round(t.total_qty::DOUBLE, 2) AS total_qty
FROM t
JOIN orders o ON o.o_orderkey = t.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY t.total_qty DESC, o.o_orderkey
LIMIT 20
""",
        "host_rank": """
WITH n AS (SELECT count(*)::BIGINT AS c FROM documents),
e AS (SELECT d.doc_id AS src, 1 + (d.doc_id % 13) AS deg,
             (d.doc_id * (48271 + j.j) + j.j * 1009) % (SELECT c FROM n) AS dst
      FROM documents d, (SELECT unnest(range(1, 14)) AS j) j
      WHERE j.j <= 1 + (d.doc_id % 13)),
p0 AS (SELECT doc_id, 1.0 / (SELECT c FROM n) AS pr FROM documents),
p1 AS (SELECT d.doc_id, 0.15 / (SELECT c FROM n) + 0.85 * coalesce(s.x, 0) AS pr
       FROM documents d LEFT JOIN (
         SELECT e.dst AS doc_id, sum(p.pr / e.deg) AS x
         FROM e JOIN p0 p ON p.doc_id = e.src GROUP BY e.dst) s
       USING (doc_id)),
p2 AS (SELECT d.doc_id, 0.15 / (SELECT c FROM n) + 0.85 * coalesce(s.x, 0) AS pr
       FROM documents d LEFT JOIN (
         SELECT e.dst AS doc_id, sum(p.pr / e.deg) AS x
         FROM e JOIN p1 p ON p.doc_id = e.src GROUP BY e.dst) s
       USING (doc_id)),
p3 AS (SELECT d.doc_id, 0.15 / (SELECT c FROM n) + 0.85 * coalesce(s.x, 0) AS pr
       FROM documents d LEFT JOIN (
         SELECT e.dst AS doc_id, sum(p.pr / e.deg) AS x
         FROM e JOIN p2 p ON p.doc_id = e.src GROUP BY e.dst) s
       USING (doc_id))
SELECT d.source AS host, count(*)::BIGINT AS n_docs,
       CAST(round(sum(p3.pr) * (SELECT c FROM n), 6) AS DOUBLE) AS rank
FROM documents d JOIN p3 USING (doc_id)
GROUP BY d.source ORDER BY rank DESC, host
""",
        "corpus_report": """
WITH toks AS (SELECT doc_id, tok FROM (SELECT doc_id,
    unnest(regexp_split_to_array(lower(text), '[^0-9a-z_]+')) AS tok
    FROM documents) WHERE tok <> ''),
base AS (
  SELECT 'docs' AS metric, count(*)::DOUBLE AS value FROM documents
  UNION ALL
  SELECT 'tokens', count(*)::DOUBLE FROM toks
  UNION ALL
  SELECT 'chars', sum(n_chars)::DOUBLE FROM documents
  UNION ALL
  SELECT 'max_chars', max(n_chars)::DOUBLE FROM documents
  UNION ALL
  SELECT 'avg_doc_tokens',
         (SELECT count(*)::DOUBLE FROM toks)
           / (SELECT count(*)::DOUBLE FROM documents)
  UNION ALL
  SELECT 'lang:' || lang, count(*)::DOUBLE FROM documents GROUP BY lang)
SELECT metric, CAST(round(value, 4) AS DOUBLE) AS value
FROM base ORDER BY metric
""",
        "ft_phrase_prefix": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
lists AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'), x -> x <> '') AS l
  FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM lists),
anch AS (SELECT t1.doc_id, count(*)::DOUBLE AS pf
         FROM ptoks t1 JOIN ptoks t2
           ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
         WHERE t1.tok = 'batch' AND t2.tok LIKE 'str%'
         GROUP BY t1.doc_id),
dfs AS (SELECT tok, count(DISTINCT doc_id)::DOUBLE AS df FROM toks
        WHERE tok = 'batch' OR tok LIKE 'str%' GROUP BY tok),
idf AS (SELECT sum(ln(1 + (stats.dc - dfs.df + 0.5) / (dfs.df + 0.5))) AS v
        FROM dfs, stats)
SELECT anch.doc_id,
       CAST(round((SELECT v FROM idf) * pf
                  / (pf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))), 4)
            AS DOUBLE) AS score
FROM anch JOIN dlq ON dlq.doc_id = anch.doc_id CROSS JOIN stats
ORDER BY score DESC, anch.doc_id LIMIT 10
""",
        "ft_facet_sum": """
WITH toks AS (SELECT doc_id, tok FROM (SELECT doc_id,
    unnest(regexp_split_to_array(lower(text), '[^0-9a-z_]+')) AS tok
    FROM documents) WHERE tok <> ''),
m AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'data')
SELECT d.source AS value, count(*)::BIGINT AS n,
       CAST(sum(d.n_chars) AS DOUBLE) AS total
FROM documents d JOIN m USING (doc_id)
GROUP BY d.source ORDER BY total DESC, value
""",
        "ft_count": """
WITH toks AS (SELECT doc_id, tok FROM (SELECT doc_id,
    unnest(regexp_split_to_array(lower(text), '[^0-9a-z_]+')) AS tok
    FROM documents) WHERE tok <> '')
SELECT 'and' AS op, count(*)::BIGINT AS n FROM (
  SELECT doc_id FROM toks WHERE tok IN ('window', 'batch')
  GROUP BY doc_id HAVING count(DISTINCT tok) = 2)
UNION ALL
SELECT 'or' AS op, count(DISTINCT doc_id)::BIGINT AS n
FROM toks WHERE tok IN ('data', 'merge')
""",
        "ft_term_set": """
SELECT doc_id FROM documents
WHERE source IN ('src3', 'src5', 'src11', 'nosuch') ORDER BY doc_id
""",
        # MultiPhrase: slot alternatives (data|batch)(merge|stream);
        # idf = sum over ALL member terms, tf = anchor count.
        "ft_multi_phrase": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
lists AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'), x -> x <> '') AS l
  FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM lists),
anch AS (SELECT t1.doc_id, count(*)::DOUBLE AS pf
         FROM ptoks t1 JOIN ptoks t2
           ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
         WHERE t1.tok IN ('data', 'batch') AND t2.tok IN ('merge', 'stream')
         GROUP BY t1.doc_id),
dfs AS (SELECT tok, count(DISTINCT doc_id)::DOUBLE AS df FROM toks
        WHERE tok IN ('data', 'batch', 'merge', 'stream') GROUP BY tok),
idf AS (SELECT sum(ln(1 + (stats.dc - dfs.df + 0.5) / (dfs.df + 0.5))) AS v
        FROM dfs, stats)
SELECT anch.doc_id,
       CAST(round((SELECT v FROM idf) * pf
                  / (pf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))), 4)
            AS DOUBLE) AS score
FROM anch JOIN dlq ON dlq.doc_id = anch.doc_id CROSS JOIN stats
ORDER BY score DESC, anch.doc_id LIMIT 10
""",
        # Multi-word synonym: group {"batch stream" phrase, "window"} as
        # one pseudo-term (tf = phrase_freq + term tf), plus 'data'.
        "ft_synonym_multiword": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
lists AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'), x -> x <> '') AS l
  FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM lists),
pf AS (SELECT t1.doc_id, count(*)::DOUBLE AS pf
       FROM ptoks t1 JOIN ptoks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
       WHERE t1.tok = 'batch' AND t2.tok = 'stream' GROUP BY t1.doc_id),
wtf AS (SELECT doc_id, count(*)::DOUBLE AS tf FROM toks
        WHERE tok = 'window' GROUP BY doc_id),
g1 AS (SELECT coalesce(pf.doc_id, wtf.doc_id) AS doc_id,
              coalesce(pf.pf, 0) + coalesce(wtf.tf, 0) AS tf
       FROM pf FULL OUTER JOIN wtf ON wtf.doc_id = pf.doc_id),
g2 AS (SELECT doc_id, count(*)::DOUBLE AS tf FROM toks
       WHERE tok = 'data' GROUP BY doc_id),
df1 AS (SELECT count(*)::DOUBLE AS df FROM g1),
df2 AS (SELECT count(*)::DOUBLE AS df FROM g2),
c1 AS (SELECT g1.doc_id,
              ln(1 + (stats.dc - df1.df + 0.5) / (df1.df + 0.5))
                * g1.tf / (g1.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
       FROM g1 JOIN dlq ON dlq.doc_id = g1.doc_id
       CROSS JOIN df1 CROSS JOIN stats),
c2 AS (SELECT g2.doc_id,
              ln(1 + (stats.dc - df2.df + 0.5) / (df2.df + 0.5))
                * g2.tf / (g2.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
       FROM g2 JOIN dlq ON dlq.doc_id = g2.doc_id
       CROSS JOIN df2 CROSS JOIN stats),
allc AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2),
scored AS (SELECT doc_id, sum(s) AS score FROM allc GROUP BY doc_id)
SELECT doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT 10
""",
        # FunctionScore: bm25('filter sort') * (1 + 0.2*ln(1+n_chars));
        # ORDER BY the unrounded expression (the engine sorts unrounded).
        "ft_function_score": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('filter', 'sort') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf JOIN dfx ON dfx.tok = tf.tok JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id),
boosted AS (
  SELECT s.doc_id,
         s.score * (1 + 0.2 * ln(1 + greatest(d.n_chars, 0))) AS fs
  FROM scored s JOIN documents d ON d.doc_id = s.doc_id)
SELECT doc_id, CAST(round(fs, 4) AS DOUBLE) AS score
FROM boosted ORDER BY fs DESC, doc_id LIMIT 10
""",
        # FunctionScore through the doc-values UPDATE overlay: identical
        # scoring pipeline, but the boost value is the post-update one.
        "ft_dv_boost": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('filter', 'sort') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf JOIN dfx ON dfx.tok = tf.tok JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id),
boosted AS (
  SELECT s.doc_id,
         s.score * (1 + 0.2 * ln(1 + greatest(
           CASE WHEN d.doc_id % 7 = 0 THEN 100000 - d.doc_id
                ELSE d.n_chars END, 0))) AS fs
  FROM scored s JOIN documents d ON d.doc_id = s.doc_id)
SELECT doc_id, CAST(round(fs, 4) AS DOUBLE) AS score
FROM boosted ORDER BY fs DESC, doc_id LIMIT 10
""",
        # FeatureField saturation: additive boost, ordered by the
        # UNROUNDED final score (the engine sorts pre-rounding).
        "ft_feature_field": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'stream') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf JOIN dfx ON dfx.tok = tf.tok JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id),
boosted AS (
  SELECT s.doc_id,
         s.score + 0.5 * greatest(d.n_chars, 0)::DOUBLE
                     / (greatest(d.n_chars, 0)::DOUBLE + 500.0) AS fs
  FROM scored s JOIN documents d ON d.doc_id = s.doc_id)
SELECT doc_id, CAST(round(fs, 4) AS DOUBLE) AS score
FROM boosted ORDER BY fs DESC, doc_id LIMIT 10
""",
        # DistanceFeatureQuery: pivot-decay boost around origin=700.
        "ft_distance_feature": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'stream') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf JOIN dfx ON dfx.tok = tf.tok JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id),
boosted AS (
  SELECT s.doc_id,
         s.score + 0.6 * 300.0
                     / (300.0 + abs(d.n_chars::DOUBLE - 700.0)) AS fs
  FROM scored s JOIN documents d ON d.doc_id = s.doc_id)
SELECT doc_id, CAST(round(fs, 4) AS DOUBLE) AS score
FROM boosted ORDER BY fs DESC, doc_id LIMIT 10
""",
        # Multi-key sort: lang asc, n_chars desc, doc_id asc ties.
        "ft_sort_multi": f"""
WITH {TOKS_CTE},
m AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'data')
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN m ON m.doc_id = d.doc_id
ORDER BY d.lang, d.n_chars DESC, d.doc_id LIMIT 10
""",
        # Sort-by-field: 'vector' AND 'stream' matches ordered by the
        # n_chars doc value desc, doc_id asc ties.
        "ft_sort_by_field": f"""
WITH {TOKS_CTE},
m AS (SELECT doc_id FROM toks WHERE tok IN ('vector', 'stream')
      GROUP BY doc_id HAVING count(DISTINCT tok) = 2)
SELECT d.doc_id, d.n_chars::DOUBLE AS value
FROM documents d JOIN m ON m.doc_id = d.doc_id
ORDER BY value DESC, d.doc_id LIMIT 10
""",
        # Sorted doc values: string sort by ordinals (binary collation
        # == UTF-8 byte order == DuckDB's default). Ties doc_id asc.
        "ft_sort_keyword": f"""
WITH {TOKS_CTE},
m AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'merge')
SELECT d.doc_id, d.lang
FROM documents d JOIN m ON m.doc_id = d.doc_id
ORDER BY d.lang, d.doc_id LIMIT 15
""",
        "ft_sort_keyword_desc": f"""
WITH {TOKS_CTE},
m AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'merge')
SELECT d.doc_id, d.lang
FROM documents d JOIN m ON m.doc_id = d.doc_id
ORDER BY d.lang DESC, d.doc_id LIMIT 15
""",
        # SortedSet facets: per distinct value of [lang, source], the
        # count of matching docs; count desc, value asc, top 20.
        "ft_facet_sortedset": f"""
WITH {TOKS_CTE},
m AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'merge'),
vals AS (
  SELECT m.doc_id, unnest([d.lang, d.source]) AS value
  FROM documents d JOIN m ON m.doc_id = d.doc_id
)
SELECT value, count(*) AS cnt FROM vals
GROUP BY value ORDER BY cnt DESC, value LIMIT 20
""",
        # Binary doc values: first 12 utf-8 code units of text as bytes
        # for the first 10 matching docs.
        "ft_binary_dv": f"""
WITH {TOKS_CTE},
m AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'merge')
SELECT d.doc_id, lower(hex(encode(substr(d.text, 1, 12)))) AS payload
FROM documents d JOIN m ON m.doc_id = d.doc_id
ORDER BY d.doc_id LIMIT 10
""",
        "rank_eval": f"""
WITH {TOKS_CTE},
qterm(qid, term) AS (VALUES (0, 'data'), (1, 'merge'), (2, 'stream')),
m AS (SELECT q.qid, t.doc_id FROM qterm q JOIN toks t ON t.tok = q.term
      GROUP BY q.qid, t.doc_id),
run AS (
  SELECT m.qid, m.doc_id,
         row_number() OVER (PARTITION BY m.qid
                            ORDER BY d.n_chars DESC, m.doc_id) AS rank
  FROM m JOIN documents d ON d.doc_id = m.doc_id
  QUALIFY rank <= 20
),
qrels AS (
  SELECT q.qid, d.doc_id,
         1 + ((d.doc_id // (3 + q.qid)) % 2) AS rel
  FROM documents d CROSS JOIN (SELECT DISTINCT qid FROM qterm) q
  WHERE d.doc_id % (3 + q.qid) = 0
  UNION ALL
  SELECT q.qid, d.doc_id, 0 AS rel
  FROM documents d CROSS JOIN (SELECT DISTINCT qid FROM qterm) q
  WHERE d.doc_id % (3 + q.qid) = 1
),
topk AS (
  SELECT r.qid, r.rank, COALESCE(qr.rel, 0) AS rel,
         (qr.rel IS NOT NULL) AS judged
  FROM run r LEFT JOIN qrels qr
    ON qr.qid = r.qid AND qr.doc_id = r.doc_id
  WHERE r.rank <= 10
),
rstats AS (
  SELECT qid, count(*) FILTER (WHERE rel > 0) AS R,
         count(*) FILTER (WHERE rel = 0) AS Nn
  FROM qrels GROUP BY qid
),
ideal AS (
  SELECT qid, sum((pow(2, rel) - 1) / log2(ipos + 1)) AS idcg FROM (
    SELECT qid, rel,
           row_number() OVER (PARTITION BY qid ORDER BY rel DESC) AS ipos
    FROM qrels WHERE rel > 0
  ) WHERE ipos <= 10 GROUP BY qid
),
cums AS (
  SELECT qid, rank, rel, judged,
         sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY qid ORDER BY rank) AS cum,
         sum(CASE WHEN judged AND rel = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY qid ORDER BY rank) AS nonrel_above
  FROM topk
),
cumsr AS (SELECT c.*, s.R, s.Nn FROM cums c LEFT JOIN rstats s USING (qid)),
perq AS (
  SELECT qid,
         count(*) AS n_ret,
         max(CASE WHEN rel > 0 THEN 1.0 / rank ELSE 0 END) AS mrr,
         sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS n_hit,
         sum((pow(2, rel) - 1) / log2(rank + 1)) AS dcg,
         sum(CASE WHEN rel > 0 THEN cum * 1.0 / rank ELSE 0 END) AS ap_num,
         sum(CASE WHEN judged THEN 1 ELSE 0 END) AS judged_n,
         sum(CASE WHEN rel > 0 THEN
               CASE WHEN least(COALESCE(Nn, 0), COALESCE(R, 0)) > 0
                    THEN 1 - least(nonrel_above, R) * 1.0
                           / greatest(least(Nn, R), 1)
                    ELSE 1 END
             ELSE 0 END) AS bpref_num
  FROM cumsr GROUP BY qid
)
SELECT p.qid, p.n_ret,
  COALESCE(s.R, 0)::BIGINT AS n_rel,
  round(p.mrr, 6) AS mrr,
  round(p.n_hit / 10.0, 6) AS "precision",
  round(CASE WHEN COALESCE(s.R, 0) > 0
             THEN p.n_hit * 1.0 / s.R ELSE 0 END, 6) AS recall,
  round(CASE WHEN COALESCE(s.R, 0) > 0
             THEN p.ap_num / least(s.R, 10) ELSE 0 END, 6) AS ap,
  round(CASE WHEN COALESCE(i.idcg, 0) > 0
             THEN p.dcg / i.idcg ELSE 0 END, 6) AS ndcg,
  round(p.judged_n * 1.0 / p.n_ret, 6) AS judged,
  round(CASE WHEN COALESCE(s.R, 0) > 0
             THEN p.bpref_num / s.R ELSE 0 END, 6) AS bpref
FROM perq p LEFT JOIN rstats s USING (qid) LEFT JOIN ideal i USING (qid)
ORDER BY p.qid
""",
        "eval_similarity_ab": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
qterm(qid, term) AS (VALUES (0, 'data'), (1, 'merge'), (2, 'stream')),
tf AS (SELECT t.doc_id, q.qid, count(*)::DOUBLE AS tf
       FROM toks t JOIN qterm q ON t.tok = q.term
       GROUP BY t.doc_id, q.qid),
dfx AS (SELECT qid, count(*)::DOUBLE AS df FROM tf GROUP BY qid),
scored AS (
  SELECT 'bm25' AS config, tf.qid, tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS score
  FROM tf JOIN dfx USING (qid) JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats
  UNION ALL
  SELECT 'classic', tf.qid, tf.doc_id,
         pow(1 + ln(stats.dc / (dfx.df + 1)), 2)
           * sqrt(tf.tf) / sqrt(dlq.dlq)
  FROM tf JOIN dfx USING (qid) JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats),
run AS (
  SELECT config, qid, doc_id,
         row_number() OVER (PARTITION BY config, qid
                            ORDER BY score DESC, doc_id) AS rank
  FROM scored QUALIFY rank <= 20),
qrels AS (
  SELECT q.qid, d.doc_id,
         1 + ((d.doc_id // (3 + q.qid)) % 2) AS rel
  FROM documents d CROSS JOIN (SELECT DISTINCT qid FROM qterm) q
  WHERE d.doc_id % (3 + q.qid) = 0
  UNION ALL
  SELECT q.qid, d.doc_id, 0 AS rel
  FROM documents d CROSS JOIN (SELECT DISTINCT qid FROM qterm) q
  WHERE d.doc_id % (3 + q.qid) = 1
),
topk AS (
  SELECT r.config, r.qid, r.rank, COALESCE(qr.rel, 0) AS rel,
         (qr.rel IS NOT NULL) AS judged
  FROM run r LEFT JOIN qrels qr
    ON qr.qid = r.qid AND qr.doc_id = r.doc_id
  WHERE r.rank <= 10
),
rstats AS (
  SELECT qid, count(*) FILTER (WHERE rel > 0) AS R,
         count(*) FILTER (WHERE rel = 0) AS Nn
  FROM qrels GROUP BY qid
),
ideal AS (
  SELECT qid, sum((pow(2, rel) - 1) / log2(ipos + 1)) AS idcg FROM (
    SELECT qid, rel,
           row_number() OVER (PARTITION BY qid ORDER BY rel DESC) AS ipos
    FROM qrels WHERE rel > 0
  ) WHERE ipos <= 10 GROUP BY qid
),
cums AS (
  SELECT config, qid, rank, rel, judged,
         sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY config, qid ORDER BY rank) AS cum,
         sum(CASE WHEN judged AND rel = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY config, qid ORDER BY rank) AS nonrel_above
  FROM topk
),
cumsr AS (SELECT c.*, s.R, s.Nn FROM cums c LEFT JOIN rstats s USING (qid)),
perq AS (
  SELECT config, qid,
         count(*) AS n_ret,
         max(CASE WHEN rel > 0 THEN 1.0 / rank ELSE 0 END) AS mrr,
         sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS n_hit,
         sum((pow(2, rel) - 1) / log2(rank + 1)) AS dcg,
         sum(CASE WHEN rel > 0 THEN cum * 1.0 / rank ELSE 0 END) AS ap_num,
         sum(CASE WHEN judged THEN 1 ELSE 0 END) AS judged_n,
         sum(CASE WHEN rel > 0 THEN
               CASE WHEN least(COALESCE(Nn, 0), COALESCE(R, 0)) > 0
                    THEN 1 - least(nonrel_above, R) * 1.0
                           / greatest(least(Nn, R), 1)
                    ELSE 1 END
             ELSE 0 END) AS bpref_num
  FROM cumsr GROUP BY config, qid
)
SELECT p.config, p.qid, p.n_ret,
  COALESCE(s.R, 0)::BIGINT AS n_rel,
  round(p.mrr, 6) AS mrr,
  round(p.n_hit / 10.0, 6) AS "precision",
  round(CASE WHEN COALESCE(s.R, 0) > 0
             THEN p.n_hit * 1.0 / s.R ELSE 0 END, 6) AS recall,
  round(CASE WHEN COALESCE(s.R, 0) > 0
             THEN p.ap_num / least(s.R, 10) ELSE 0 END, 6) AS ap,
  round(CASE WHEN COALESCE(i.idcg, 0) > 0
             THEN p.dcg / i.idcg ELSE 0 END, 6) AS ndcg,
  round(p.judged_n * 1.0 / p.n_ret, 6) AS judged,
  round(CASE WHEN COALESCE(s.R, 0) > 0
             THEN p.bpref_num / s.R ELSE 0 END, 6) AS bpref
FROM perq p LEFT JOIN rstats s USING (qid) LEFT JOIN ideal i USING (qid)
ORDER BY p.config, p.qid
""",
        "ft_dv_update": f"""
WITH {TOKS_CTE},
m AS (SELECT doc_id FROM toks WHERE tok IN ('vector', 'stream')
      GROUP BY doc_id HAVING count(DISTINCT tok) = 2)
SELECT d.doc_id,
       (CASE WHEN d.doc_id % 7 = 0 THEN 100000 - d.doc_id
             ELSE d.n_chars END)::DOUBLE AS value
FROM documents d JOIN m ON m.doc_id = d.doc_id
ORDER BY value DESC, d.doc_id LIMIT 10
""",
        "ft_doc_norms": f"""
WITH {TOKS_CTE}, {DL_CTE}, {NORMVALS_CTE}
SELECT d.doc_id, d.dl::BIGINT AS dl, max(v)::BIGINT AS norm_dl
FROM dl d JOIN normvals ON v <= d.dl GROUP BY d.doc_id, d.dl
""",
        "ft_numeric_range": (
            "SELECT doc_id, n_chars FROM documents "
            "WHERE n_chars >= 200 AND n_chars <= 400"
        ),
        "ft_delete_search": _bm25_sql(
            ["data", "merge"], exclude_where=_DELETED_PRED
        ),
        # the pre-delete commit point sees the FULL corpus
        "ft_commit_travel": _bm25_sql(["data", "merge"]),
        "ft_delete_purge_stats": """
WITH toks AS (SELECT doc_id, tok FROM (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^0-9a-z_]+')) AS tok
  FROM documents WHERE source <> 'src3') WHERE tok <> ''),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id)
SELECT count(*)::BIGINT AS dc, sum(dl)::BIGINT AS sttf,
       CAST(round(sum(dl)::DOUBLE / count(*), 6) AS DOUBLE) AS avgdl,
       0::BIGINT AS n_deleted
FROM dl
""",
        "ft_delete_purge_search": _bm25_sql(
            ["data", "merge"], corpus_where="WHERE source <> 'src3'"
        ),
        "ft_numeric_sort": (
            "SELECT doc_id, n_chars FROM documents "
            "ORDER BY n_chars DESC, doc_id LIMIT 10"
        ),
        "ft_index_sort": f"""
WITH {TOKS_CTE},
m AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'data')
SELECT d.doc_id, d.n_chars FROM documents d JOIN m ON m.doc_id = d.doc_id
ORDER BY d.n_chars DESC, d.doc_id LIMIT 10
""",
        "percolate": f"""
WITH {TOKS_CTE},
p AS (SELECT DISTINCT doc_id, tok FROM toks),
q0 AS (SELECT 0 AS query_id, d.doc_id FROM documents d
       WHERE EXISTS(SELECT 1 FROM p WHERE p.doc_id = d.doc_id AND tok = 'data')
         AND EXISTS(SELECT 1 FROM p WHERE p.doc_id = d.doc_id AND tok = 'merge')),
q1 AS (SELECT 1 AS query_id, d.doc_id FROM documents d
       WHERE EXISTS(SELECT 1 FROM p WHERE p.doc_id = d.doc_id AND tok = 'window')
         AND NOT EXISTS(SELECT 1 FROM p WHERE p.doc_id = d.doc_id AND tok = 'batch')),
q2 AS (SELECT 2 AS query_id, d.doc_id FROM documents d
       WHERE EXISTS(SELECT 1 FROM p WHERE p.doc_id = d.doc_id
                    AND tok IN ('stream', 'sort'))),
ot0 AS (SELECT doc_id, unnest(arr) AS tok,
               unnest(generate_series(1, len(arr))) AS ord0
        FROM (SELECT doc_id,
                     regexp_split_to_array(lower(text), '[^0-9a-z_]+') AS arr
              FROM documents)),
ot AS (SELECT doc_id, tok,
              row_number() OVER (PARTITION BY doc_id ORDER BY ord0) - 1 AS pos
       FROM ot0 WHERE tok <> ''),
q3 AS (SELECT DISTINCT 3 AS query_id, a.doc_id FROM ot a JOIN ot b
       ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       WHERE a.tok = 'batch' AND b.tok = 'stream')
SELECT query_id::BIGINT AS query_id, doc_id FROM (
  SELECT * FROM q0 UNION ALL SELECT * FROM q1 UNION ALL SELECT * FROM q2
  UNION ALL SELECT * FROM q3)
ORDER BY query_id, doc_id
""",
        "sig_terms": f"""
WITH {TOKS_CTE},
dfa AS (SELECT tok, count(DISTINCT doc_id)::DOUBLE AS df_all
        FROM toks GROUP BY tok),
fg AS (SELECT doc_id FROM documents WHERE source = 'src2'),
dff AS (SELECT tok, count(DISTINCT t.doc_id)::DOUBLE AS df_fg
        FROM toks t JOIN fg ON fg.doc_id = t.doc_id GROUP BY tok),
n AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_all,
             (SELECT count(*) FROM fg)::DOUBLE AS n_fg),
s AS (SELECT dfa.tok, dff.df_fg, dfa.df_all,
             (dff.df_fg / n.n_fg - dfa.df_all / n.n_all)
               * (dff.df_fg / n.n_fg) / (dfa.df_all / n.n_all) AS score
      FROM dfa JOIN dff ON dff.tok = dfa.tok CROSS JOIN n)
SELECT tok AS term, df_fg::BIGINT AS df_fg, df_all::BIGINT AS df_all,
       CAST(round(score, 6) AS DOUBLE) AS score
FROM s ORDER BY score DESC, term LIMIT 20
""",
        "dedup_exact": (
            "SELECT min(doc_id)::BIGINT AS doc_id, count(*)::BIGINT AS dup_count "
            "FROM documents GROUP BY text"
        ),
        "dedup_incremental": """
WITH split AS (SELECT max(doc_id) // 2 AS s FROM documents),
old AS (SELECT DISTINCT text FROM documents, split WHERE doc_id <= s),
new AS (SELECT doc_id, text FROM documents, split WHERE doc_id > s),
fresh AS (SELECT doc_id, text FROM new
          WHERE text NOT IN (SELECT text FROM old))
SELECT min(doc_id)::BIGINT AS doc_id, count(*)::BIGINT AS dup_count
FROM fresh GROUP BY text
""",
        "sample_token_budget": r"""
WITH tok AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> ''))::BIGINT AS n_tokens
  FROM documents),
keyed AS (
  SELECT doc_id, n_tokens,
         ((((doc_id * 2654435761) % 4294967296) + 7) % 4294967296)
           * 1597334677 % 4294967296 AS k
  FROM tok),
run AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY k, doc_id) AS cum
  FROM keyed)
SELECT doc_id, n_tokens, cum::BIGINT AS cum_tokens
FROM run WHERE cum <= 20000
""",
        "train_shuffle": """
WITH keyed AS (
  SELECT doc_id,
         ((((doc_id * 2654435761) % 4294967296) + 42) % 4294967296)
           * 1597334677 % 4294967296 AS shuffle_key
  FROM documents)
SELECT CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) - 1
            AS BIGINT) AS rank,
       doc_id, shuffle_key::BIGINT AS shuffle_key
FROM keyed ORDER BY shuffle_key, doc_id LIMIT 50
""",
        "lang_id": f"""
WITH {TOKS_CTE},
c AS (
  SELECT doc_id,
    count(*) FILTER (WHERE tok IN ({lang_counts['en']})) AS n_en,
    count(*) FILTER (WHERE tok IN ({lang_counts['de']})) AS n_de,
    count(*) FILTER (WHERE tok IN ({lang_counts['fr']})) AS n_fr
  FROM toks GROUP BY doc_id)
SELECT d.doc_id,
  CASE WHEN coalesce(c.n_en,0) >= coalesce(c.n_de,0)
            AND coalesce(c.n_en,0) >= coalesce(c.n_fr,0) THEN 'en'
       WHEN coalesce(c.n_de,0) >= coalesce(c.n_fr,0) THEN 'de'
       ELSE 'fr' END AS pred_lang,
  coalesce(c.n_en,0)::BIGINT AS n_en,
  coalesce(c.n_de,0)::BIGINT AS n_de,
  coalesce(c.n_fr,0)::BIGINT AS n_fr
FROM documents d LEFT JOIN c ON c.doc_id = d.doc_id
""",
        "text_quality": f"""
WITH {TOKS_CTE},
t AS (
  SELECT doc_id, count(*) AS n_tokens,
         count(*) FILTER (WHERE tok IN ({_STOPLIST_SQL})) AS n_stop,
         sum(length(tok)) AS sum_len
  FROM toks GROUP BY doc_id)
SELECT d.doc_id,
  coalesce(t.n_tokens, 0)::BIGINT AS n_tokens,
  CAST(round(coalesce(t.n_stop,0) / greatest(coalesce(t.n_tokens,0), 1)::DOUBLE, 6) AS DOUBLE) AS stop_ratio,
  CAST(round(length(regexp_replace(d.text, '[0-9A-Za-z_ ]', '', 'g'))
       / greatest(length(d.text), 1)::DOUBLE, 6) AS DOUBLE) AS punct_ratio,
  CAST(round(coalesce(t.sum_len,0) / greatest(coalesce(t.n_tokens,0), 1)::DOUBLE, 6) AS DOUBLE) AS mean_token_len
FROM documents d LEFT JOIN t ON t.doc_id = d.doc_id
""",
        "token_count": """
SELECT doc_id,
  len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))::BIGINT AS n_ws_tokens,
  length(text)::BIGINT AS n_chars
FROM documents
""",
        "window_tumbling": """
SELECT event_type,
       ((epoch_us(ts) // 1000000) // 3600) * 3600 AS window_start,
       count(*)::BIGINT AS n_events,
       CAST(round(sum(value), 4) AS DOUBLE) AS sum_value,
       CAST(round(round(sum(value), 4) / count(*), 4) AS DOUBLE) AS mean_value
FROM events GROUP BY 1, 2 ORDER BY event_type, window_start
""",
        "sessionize": """
WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS eu FROM events),
o AS (SELECT user_id, eu,
             CASE WHEN lag(eu) OVER (PARTITION BY user_id ORDER BY eu) IS NULL
                    OR eu - lag(eu) OVER (PARTITION BY user_id ORDER BY eu) > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM e),
s AS (SELECT user_id, eu,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY eu
                                 ROWS UNBOUNDED PRECEDING) - 1 AS session_id
      FROM o)
SELECT user_id, session_id,
       min(eu)::BIGINT AS session_start,
       max(eu)::BIGINT AS session_end,
       count(*)::BIGINT AS n_events
FROM s GROUP BY 1, 2 ORDER BY user_id, session_id
""",
        "window_sliding": """
WITH e AS (SELECT event_type, value, epoch_us(ts) // 1000000 AS eu FROM events),
x AS (SELECT event_type, value, eu,
             unnest([(eu // 1800) * 1800, (eu // 1800) * 1800 - 1800]) AS window_start
      FROM e)
SELECT event_type, window_start,
       count(*)::BIGINT AS n_events,
       CAST(round(sum(value), 4) AS DOUBLE) AS sum_value,
       CAST(round(round(sum(value), 4) / count(*), 4) AS DOUBLE) AS mean_value
FROM x WHERE window_start > eu - 3600
GROUP BY 1, 2 ORDER BY event_type, window_start
""",
        "hybrid_rrf": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'merge') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf JOIN dfx ON dfx.tok = tf.tok JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id),
b0 AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 20),
bm25r AS (SELECT doc_id,
                 row_number() OVER (ORDER BY score DESC, doc_id) AS r
          FROM b0),
qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
sims AS (SELECT e.vec_id AS doc_id,
                list_cosine_similarity(e.embedding::DOUBLE[], qv.v::DOUBLE[]) AS sim
         FROM embeddings e CROSS JOIN qv),
a0 AS (SELECT doc_id, sim FROM sims ORDER BY sim DESC, doc_id LIMIT 20),
annr AS (SELECT doc_id,
                row_number() OVER (ORDER BY sim DESC, doc_id) AS r
         FROM a0),
fused AS (
  SELECT coalesce(b.doc_id, a.doc_id) AS doc_id,
         coalesce(1.0 / (60 + b.r), 0) + coalesce(1.0 / (60 + a.r), 0) AS rrf,
         coalesce(b.r, 0) AS bm25_rank,
         coalesce(a.r, 0) AS ann_rank
  FROM bm25r b FULL OUTER JOIN annr a ON a.doc_id = b.doc_id)
SELECT doc_id::BIGINT AS doc_id, CAST(round(rrf, 6) AS DOUBLE) AS rrf,
       bm25_rank::BIGINT AS bm25_rank, ann_rank::BIGINT AS ann_rank
FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
""",
        "hybrid_weighted": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'merge') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf JOIN dfx ON dfx.tok = tf.tok JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id),
b0 AS (SELECT doc_id, round(score, 4) AS score
       FROM scored ORDER BY score DESC, doc_id LIMIT 20),
bnorm AS (SELECT doc_id,
                 CASE WHEN max(score) OVER () = min(score) OVER () THEN 1.0
                      ELSE (score - min(score) OVER ())
                           / (max(score) OVER () - min(score) OVER ())
                 END AS ns
          FROM b0),
qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
sims AS (SELECT e.vec_id AS doc_id,
                list_cosine_similarity(e.embedding::DOUBLE[], qv.v::DOUBLE[]) AS sim_raw
         FROM embeddings e CROSS JOIN qv),
-- cut the top-20 on the RAW similarity (the engine's cut), round to
-- 5 dp only as the fusion input (absorbs DuckDB's float32 kernel)
a0 AS (SELECT doc_id, round(CAST(sim_raw AS DOUBLE), 5) AS sim
       FROM sims ORDER BY sim_raw DESC, doc_id LIMIT 20),
anorm AS (SELECT doc_id,
                 CASE WHEN max(sim) OVER () = min(sim) OVER () THEN 1.0
                      ELSE (sim - min(sim) OVER ())
                           / (max(sim) OVER () - min(sim) OVER ())
                 END AS ns
          FROM a0),
fused AS (
  SELECT coalesce(b.doc_id, a.doc_id) AS doc_id,
         1.0 * coalesce(b.ns, 0) + 0.5 * coalesce(a.ns, 0) AS fused,
         coalesce(b.ns, 0) AS bn, coalesce(a.ns, 0) AS an
  FROM bnorm b FULL OUTER JOIN anorm a ON a.doc_id = b.doc_id)
SELECT doc_id::BIGINT AS doc_id,
       CAST(round(fused, 6) AS DOUBLE) AS fused,
       CAST(round(bn, 6) AS DOUBLE) AS bm25_norm,
       CAST(round(an, 6) AS DOUBLE) AS ann_norm
FROM fused ORDER BY fused DESC, doc_id LIMIT 10
""",
        "ann_cosine": """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT 0::BIGINT AS query_id, e.vec_id,
       CAST(round(CAST(list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS DOUBLE), 5) AS DOUBLE) AS sim
FROM embeddings e CROSS JOIN q
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC, e.vec_id LIMIT 10
""",
        # cosine of each label's mean vector to the global mean; the
        # expression shapes mirror the engine: mean = sum/count per
        # (label, dim), num = sum(m*g), den = sqrt(sum m^2)*sqrt(sum g^2)
        "label_drift": """
WITH u AS (SELECT label, unnest(embedding)::DOUBLE AS v,
                  unnest(generate_series(1, len(embedding))) AS dim
           FROM embeddings),
lm AS (SELECT label, dim, sum(v) AS s, count(*) AS n
       FROM u GROUP BY label, dim),
gm AS (SELECT dim, sum(s) / sum(n) AS g FROM lm GROUP BY dim),
parts AS (SELECT lm.label,
                 sum((lm.s / lm.n) * gm.g) AS num,
                 sum((lm.s / lm.n) * (lm.s / lm.n)) AS nl
          FROM lm JOIN gm ON gm.dim = lm.dim GROUP BY lm.label),
g2 AS (SELECT sum(g * g) AS ng FROM gm)
SELECT label::BIGINT AS label,
       CAST(round(num / (sqrt(nl) * sqrt(g2.ng)), 6) AS DOUBLE)
         AS cos_to_global
FROM parts CROSS JOIN g2 ORDER BY label
""",
        # refreshed (shard-appended) index == full-corpus build
        "ft_append_refresh": f"""
WITH {TOKS_CTE}
SELECT tok AS term, count(DISTINCT doc_id)::BIGINT AS df,
       count(*)::BIGINT AS ttf,
       (SELECT doc_id FROM ({_bm25_sql(["data", "merge"], k=1)}))::BIGINT
         AS top1_doc
FROM toks WHERE tok IN ('data', 'merge', 'join', 'window')
GROUP BY tok ORDER BY term
""",
        "ft_sync_ingest": f"""
WITH {TOKS_CTE}
SELECT tok AS term, count(DISTINCT doc_id)::BIGINT AS df,
       count(*)::BIGINT AS ttf,
       (SELECT doc_id FROM ({_bm25_sql(["data", "merge"], k=1)}))::BIGINT
         AS top1_doc
FROM toks WHERE tok IN ('data', 'merge', 'join', 'window')
GROUP BY tok ORDER BY term
""",
        # full relational replay of the prep chain: gate -> keep-best
        # dedup on the snippet key -> concat-and-chunk sequence count
        "prep_pipeline": r"""
WITH f AS (
  SELECT doc_id, text FROM documents
  WHERE length(text) >= 200
    AND len(list_filter(regexp_split_to_array(text, '\s+'),
                        x -> x <> '')) >= 30),
d AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (PARTITION BY substr(text, 1, 30)
                              ORDER BY length(text) DESC, doc_id) AS rn
    FROM f) WHERE rn = 1),
toks AS (SELECT doc_id, tok FROM (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^0-9a-z_]+')) AS tok
  FROM d) WHERE tok <> ''),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
tot AS (SELECT sum(dl) AS nt FROM dl)
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_input,
       (SELECT count(*) FROM f)::BIGINT AS n_filtered,
       (SELECT count(*) FROM d)::BIGINT AS n_deduped,
       tot.nt::BIGINT AS n_tokens,
       ((tot.nt + 127) // 128)::BIGINT AS n_sequences
FROM tot
""",
        # deletes add tombstones only; segment set and postings stand
        "commit_diff": """
SELECT 0::BIGINT AS n_segments_added, 0::BIGINT AS n_segments_removed,
       0::BIGINT AS n_postings_delta,
       (SELECT count(*) FROM documents WHERE source = 'src3')::BIGINT
         AS tombstones_added,
       0::BIGINT AS tombstones_removed
""",
        "hard_negatives": """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
           FROM embeddings WHERE vec_id < 3),
s AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS sim_raw
      FROM embeddings e JOIN q ON e.label <> q.ql),
r AS (SELECT query_id, vec_id, sim_raw,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim_raw DESC, vec_id) AS rn
      FROM s)
SELECT query_id::BIGINT AS query_id, vec_id,
       CAST(round(CAST(sim_raw AS DOUBLE), 5) AS DOUBLE) AS sim
FROM r WHERE rn <= 10
""",
        "source_kl": f"""
WITH {TOKS_CTE},
st AS (SELECT d.source, t.tok, count(*)::DOUBLE AS c
       FROM toks t JOIN documents d ON d.doc_id = t.doc_id
       GROUP BY d.source, t.tok),
stot AS (SELECT source, sum(c) AS n FROM st GROUP BY source),
ct AS (SELECT tok, sum(c) AS ctot FROM st GROUP BY tok),
alltot AS (SELECT sum(ctot) AS nn FROM ct)
SELECT st.source, stot.n::BIGINT AS n_tokens,
       CAST(round(sum((st.c / stot.n)
                      * ln((st.c / stot.n) / (ct.ctot / alltot.nn))), 6)
            AS DOUBLE) AS kl
FROM st
JOIN stot ON stot.source = st.source
JOIN ct ON ct.tok = st.tok
CROSS JOIN alltot
GROUP BY st.source, stot.n ORDER BY st.source
""",
        "auto_stopwords": f"""
WITH {TOKS_CTE},
dc AS (SELECT count(DISTINCT doc_id)::DOUBLE AS dc FROM toks),
dfx AS (SELECT tok AS term, count(DISTINCT doc_id)::DOUBLE AS df
        FROM toks GROUP BY tok)
SELECT term, df::BIGINT AS df,
       CAST(round(df / dc.dc, 6) AS DOUBLE) AS ratio
FROM dfx CROSS JOIN dc
WHERE df / dc.dc > 0.4 ORDER BY term
""",
        "event_zscores": """
WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  count(*)::DOUBLE AS n
           FROM events GROUP BY event_type, day),
m AS (SELECT event_type, sum(n) / count(*) AS mean,
             sum(n * n) / count(*)
               - (sum(n) / count(*)) * (sum(n) / count(*)) AS var
      FROM d GROUP BY event_type)
SELECT d.event_type, d.day::BIGINT AS day, d.n::BIGINT AS n,
       CAST(round((d.n - m.mean)
                  / CASE WHEN m.var > 0 THEN sqrt(m.var) ELSE 1 END, 6)
            AS DOUBLE) AS z
FROM d JOIN m ON m.event_type = d.event_type
ORDER BY d.event_type, d.day
""",
        "ascii_fold": """
SELECT doc_id,
       strip_accents(replace(replace(replace(text, 'a', 'á'),
                                     'o', 'ö'), 'c', 'ç')) AS folded
FROM documents ORDER BY doc_id
""",
        # JSONL connector fidelity: stats computed AFTER the
        # parquet -> jsonl -> read_json round trip must equal stats
        # DuckDB computes on the original parquet.
        "jsonl_ingest": r"""
SELECT doc_id,
  len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))::BIGINT AS n_ws_tokens,
  length(text)::BIGINT AS n_chars
FROM documents ORDER BY doc_id
""",
        "csv_ingest": r"""
SELECT doc_id,
  len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))::BIGINT AS n_ws_tokens,
  length(text)::BIGINT AS n_chars
FROM documents ORDER BY doc_id
""",
        # Bigram LM: model + exact first-word denominators + OOV floor,
        # replayed over the ordered-token bigram CTE.
        "lm_score_bigram": r"""
WITH t0 AS (
  SELECT doc_id, unnest(arr) AS tok,
         unnest(generate_series(1, len(arr))) AS ord0
  FROM (SELECT doc_id,
               regexp_split_to_array(lower(text), '[^0-9a-z_]+') AS arr
        FROM documents)),
t AS (SELECT doc_id, tok,
             row_number() OVER (PARTITION BY doc_id ORDER BY ord0) AS pos
      FROM t0 WHERE tok <> ''),
big AS (SELECT doc_id, tok AS w1,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM t),
bg AS (SELECT doc_id, w1, w2 FROM big WHERE w2 IS NOT NULL),
cnt2 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
tot AS (SELECT sum(c)::DOUBLE AS t FROM cnt2),
model AS (SELECT w1, w2, c FROM cnt2 ORDER BY c DESC, w1, w2 LIMIT 300),
c1 AS (SELECT w1, sum(c)::DOUBLE AS cd FROM cnt2
       WHERE w1 IN (SELECT w1 FROM model) GROUP BY w1),
sc AS (
  SELECT bg.doc_id, count(*) AS n_bigrams,
         sum(CASE WHEN m.c IS NOT NULL THEN -ln(m.c / c1.cd)
                  ELSE -ln(1 / tot.t) END) AS sum_nll,
         count(*) FILTER (WHERE m.c IS NULL) AS n_oov
  FROM bg CROSS JOIN tot
  LEFT JOIN model m ON m.w1 = bg.w1 AND m.w2 = bg.w2
  LEFT JOIN c1 ON c1.w1 = bg.w1
  GROUP BY bg.doc_id)
SELECT d.doc_id,
  coalesce(sc.n_bigrams, 0)::BIGINT AS n_bigrams,
  CAST(round(coalesce(sc.sum_nll, 0)
             / greatest(coalesce(sc.n_bigrams, 0), 1), 6) AS DOUBLE)
    AS mean_nll,
  CAST(round(coalesce(sc.n_oov, 0)
             / greatest(coalesce(sc.n_bigrams, 0), 1)::DOUBLE, 6) AS DOUBLE)
    AS oov_frac
FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
ORDER BY d.doc_id
""",
        "sq8_codes": """
WITH u AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v,
                  unnest(generate_series(1, len(embedding))) AS dim
           FROM embeddings),
mm AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM u GROUP BY dim)
SELECT u.vec_id, u.dim::BIGINT AS dim,
       CASE WHEN mm.mx = mm.mn THEN 0
            ELSE least(greatest(floor((u.v - mm.mn) / (mm.mx - mm.mn)
                                      * 256), 0), 255)
       END::BIGINT AS code
FROM u JOIN mm ON mm.dim = u.dim
ORDER BY u.vec_id, u.dim
""",
        # CCNet terciles: the lm_score model/scoring CTEs + ntile(3)
        # per source ordered by (rounded mean_nll, doc_id).
        "ppl_buckets": f"""
WITH {TOKS_CTE},
cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT sum(c)::DOUBLE AS t FROM cnt),
model AS (SELECT tok, c FROM cnt ORDER BY c DESC, tok LIMIT 200),
sc AS (
  SELECT k.doc_id,
         count(*) AS n_tokens,
         sum(-ln(coalesce(m.c, 1) / tot.t)) AS sum_nll
  FROM toks k CROSS JOIN tot LEFT JOIN model m ON m.tok = k.tok
  GROUP BY k.doc_id),
j AS (
  SELECT d.source, d.doc_id,
         CAST(round(coalesce(sc.sum_nll, 0)
                    / greatest(coalesce(sc.n_tokens, 0), 1), 6) AS DOUBLE)
           AS mean_nll
  FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id),
b AS (
  SELECT source, mean_nll,
         ntile(3) OVER (PARTITION BY source
                        ORDER BY mean_nll, doc_id) AS bucket
  FROM j)
SELECT source, bucket::BIGINT AS bucket, count(*)::BIGINT AS n_docs,
       min(mean_nll) AS min_nll, max(mean_nll) AS max_nll
FROM b GROUP BY source, bucket ORDER BY source, bucket
""",
        "label_centroids": """
SELECT label::BIGINT AS label, dim::BIGINT AS dim,
       CAST(round(avg(v::DOUBLE), 6) AS DOUBLE) AS avg
FROM (SELECT label, unnest(embedding) AS v,
             unnest(generate_series(1, len(embedding))) AS dim
      FROM embeddings)
GROUP BY label, dim ORDER BY label, dim
""",
        "knn_prefilter": f"""
WITH {TOKS_CTE},
m AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'data'),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT 0::BIGINT AS query_id, e.vec_id,
       CAST(round(CAST(list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS DOUBLE), 5) AS DOUBLE) AS sim
FROM embeddings e JOIN m ON m.doc_id = e.vec_id CROSS JOIN q
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC, e.vec_id LIMIT 10
""",
        "ann_range": """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < 3)
SELECT q.query_id::BIGINT AS query_id, e.vec_id,
       CAST(round(CAST(list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS DOUBLE), 5) AS DOUBLE) AS sim
FROM embeddings e CROSS JOIN q
WHERE list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) >= 0.3
ORDER BY query_id, e.vec_id
""",
        "ann_batch": """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
s AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS sim_raw
      FROM embeddings e CROSS JOIN q),
r AS (SELECT query_id, vec_id, sim_raw,
             row_number() OVER (PARTITION BY query_id ORDER BY sim_raw DESC, vec_id) AS rn
      FROM s)
SELECT query_id::BIGINT AS query_id, vec_id,
       CAST(round(CAST(sim_raw AS DOUBLE), 5) AS DOUBLE) AS sim
FROM r WHERE rn <= 3
""",
        "ann_ivf_full": """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
s AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS sim_raw
      FROM embeddings e CROSS JOIN q),
r AS (SELECT query_id, vec_id, sim_raw,
             row_number() OVER (PARTITION BY query_id ORDER BY sim_raw DESC, vec_id) AS rn
      FROM s)
SELECT query_id::BIGINT AS query_id, vec_id,
       CAST(round(CAST(sim_raw AS DOUBLE), 5) AS DOUBLE) AS sim
FROM r WHERE rn <= 10
""",
        "ann_ivf_append": """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
s AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS sim_raw
      FROM embeddings e CROSS JOIN q),
r AS (SELECT query_id, vec_id, sim_raw,
             row_number() OVER (PARTITION BY query_id ORDER BY sim_raw DESC, vec_id) AS rn
      FROM s)
SELECT query_id::BIGINT AS query_id, vec_id,
       CAST(round(CAST(sim_raw AS DOUBLE), 5) AS DOUBLE) AS sim
FROM r WHERE rn <= 10
""",
        "ann_maxsim": """
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 4),
d AS (SELECT vec_id // 4 AS doc, embedding AS ev FROM embeddings),
m AS (SELECT d.doc, q.qid,
             max(list_cosine_similarity(d.ev::DOUBLE[], q.qv::DOUBLE[])) AS mx
      FROM d CROSS JOIN q GROUP BY d.doc, q.qid),
s AS (SELECT doc, sum(mx) AS sc FROM m GROUP BY doc),
r AS (SELECT doc, sc, row_number() OVER (ORDER BY sc DESC, doc) AS rn FROM s)
SELECT doc, CAST(round(CAST(sc AS DOUBLE), 5) AS DOUBLE) AS score
FROM r WHERE rn <= 10 ORDER BY rn
""",
        "ann_maxsim_rerank": """
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 4),
qx AS (SELECT qid, unnest(qv) AS x, generate_subscripts(qv, 1) AS i FROM q),
qn AS (SELECT qid, i, x / sqrt(sum(x * x) OVER (PARTITION BY qid)) AS xn FROM qx),
mq AS (SELECT list(s ORDER BY i) AS mv
       FROM (SELECT i, sum(xn)::DOUBLE AS s FROM qn GROUP BY i)),
d AS (SELECT vec_id // 4 AS doc, embedding AS ev FROM embeddings),
p AS (SELECT d.doc, max(list_cosine_similarity(d.ev::DOUBLE[], mq.mv)) AS proxy
      FROM d CROSS JOIN mq GROUP BY d.doc),
cand AS (SELECT doc FROM p ORDER BY proxy DESC, doc LIMIT 50),
m AS (SELECT d.doc, q.qid,
             max(list_cosine_similarity(d.ev::DOUBLE[], q.qv::DOUBLE[])) AS mx
      FROM d JOIN cand ON cand.doc = d.doc CROSS JOIN q
      GROUP BY d.doc, q.qid),
s AS (SELECT doc, sum(mx) AS sc FROM m GROUP BY doc),
r AS (SELECT doc, sc, row_number() OVER (ORDER BY sc DESC, doc) AS rn FROM s)
SELECT doc, CAST(round(CAST(sc AS DOUBLE), 5) AS DOUBLE) AS score
FROM r WHERE rn <= 10 ORDER BY rn
""",
        "ft_mmr": _mmr_sql(["data", "stream"], n_cand=50, k=10, lam=0.7),
        "diverse_sample": _kcenter_sql(10),
        "ann_sq8": """
WITH e AS (SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
                  generate_subscripts(embedding, 1) AS dim
           FROM embeddings),
p AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM e GROUP BY dim),
q8 AS (SELECT e.vec_id, e.dim, p.mn, p.mx - p.mn AS span,
              CASE WHEN p.mx - p.mn <= 0 THEN 0.0
                   ELSE least(greatest(
                          floor((e.x - p.mn) / (p.mx - p.mn) * 256.0),
                          0.0), 255.0)
              END AS code
       FROM e JOIN p USING (dim)),
xh AS (SELECT vec_id,
              list(mn + (code + 0.5) * span / 256.0 ORDER BY dim) AS xhat
       FROM q8 GROUP BY vec_id),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id IN (0, 1, 2)),
s AS (SELECT q.query_id, xh.vec_id,
             list_cosine_similarity(xh.xhat, q.qv::DOUBLE[]) AS sim_raw
      FROM xh CROSS JOIN q),
r AS (SELECT query_id, vec_id, sim_raw,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim_raw DESC, vec_id) AS rn
      FROM s)
SELECT query_id::BIGINT AS query_id, vec_id,
       CAST(round(CAST(sim_raw AS DOUBLE), 5) AS DOUBLE) AS sim
FROM r WHERE rn <= 10
""",
        "ann_maxsim_plaid": """
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 4),
d AS (SELECT vec_id // 4 AS doc, embedding AS ev FROM embeddings),
tm AS (SELECT d.doc, q.qid,
              max(list_cosine_similarity(d.ev::DOUBLE[], q.qv::DOUBLE[])) AS mx
       FROM d CROSS JOIN q GROUP BY d.doc, q.qid),
tr AS (SELECT doc, qid, mx,
              row_number() OVER (PARTITION BY qid ORDER BY mx DESC, doc) AS rn
       FROM tm),
cand AS (SELECT DISTINCT doc FROM tr WHERE rn <= 30),
m AS (SELECT d.doc, q.qid,
             max(list_cosine_similarity(d.ev::DOUBLE[], q.qv::DOUBLE[])) AS mx
      FROM d JOIN cand USING (doc) CROSS JOIN q GROUP BY d.doc, q.qid),
s AS (SELECT doc, sum(mx) AS sc FROM m GROUP BY doc),
r AS (SELECT doc, sc, row_number() OVER (ORDER BY sc DESC, doc) AS rn FROM s)
SELECT doc, CAST(round(CAST(sc AS DOUBLE), 5) AS DOUBLE) AS score
FROM r WHERE rn <= 10 ORDER BY rn
""",
        "ann_lsh_full": """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id IN (3, 4, 5)),
s AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS sim_raw
      FROM embeddings e CROSS JOIN q),
r AS (SELECT query_id, vec_id, sim_raw,
             row_number() OVER (PARTITION BY query_id ORDER BY sim_raw DESC, vec_id) AS rn
      FROM s)
SELECT query_id::BIGINT AS query_id, vec_id,
       CAST(round(CAST(sim_raw AS DOUBLE), 5) AS DOUBLE) AS sim
FROM r WHERE rn <= 10
""",
        "dedup_embedding": """
WITH s AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS sim_raw
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
SELECT a, b, CAST(round(CAST(sim_raw AS DOUBLE), 5) AS DOUBLE) AS sim
FROM s WHERE sim_raw >= 0.4 ORDER BY a, b
""",
        "multimodal_meta": "SELECT doc_id, octet_length(text::BLOB)::BIGINT AS n_bytes FROM documents",
        "media_dedup": (
            "SELECT min(doc_id)::BIGINT AS doc_id, count(*)::BIGINT AS dup_count, "
            "octet_length(min(text)::BLOB)::BIGINT AS n_bytes "
            "FROM documents GROUP BY text"
        ),
        "chunk_docs": r"""
WITH t0 AS (
  SELECT doc_id, unnest(arr) AS tok,
         unnest(generate_series(1, len(arr))) AS ord0
  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS arr FROM documents)
),
t AS (SELECT doc_id, tok,
             row_number() OVER (PARTITION BY doc_id ORDER BY ord0) - 1 AS pos
      FROM t0 WHERE tok <> ''),
n AS (SELECT doc_id, count(*) AS n_tok FROM t GROUP BY doc_id),
starts AS (SELECT doc_id,
                  unnest(generate_series(0, (n_tok - 1)::BIGINT, 48)) AS start_tok
           FROM n),
c AS (SELECT s.doc_id, s.start_tok,
             string_agg(t.tok, ' ' ORDER BY t.pos) AS text,
             count(*) AS n_tokens
      FROM starts s JOIN t ON t.doc_id = s.doc_id
        AND t.pos >= s.start_tok AND t.pos < s.start_tok + 64
      GROUP BY s.doc_id, s.start_tok)
SELECT doc_id, (start_tok // 48)::BIGINT AS chunk_idx,
       start_tok::BIGINT AS start_tok, n_tokens::BIGINT AS n_tokens, text
FROM c ORDER BY doc_id, chunk_idx
""",
        "multimodal_frames": """
WITH d AS (SELECT doc_id, octet_length(text::BLOB)::BIGINT AS L FROM documents),
j AS (SELECT unnest([0, 1, 2, 3]) AS frame_idx)
SELECT doc_id, frame_idx::BIGINT AS frame_idx,
       greatest(least((frame_idx + 1) * greatest(L // 4, 1), L)
                - frame_idx * greatest(L // 4, 1), 0)::BIGINT AS n_bytes
FROM d CROSS JOIN j
ORDER BY doc_id, frame_idx
""",
        "ngram_jaccard": """
WITH raw AS (
  SELECT doc_id, unnest(arr) AS tok, generate_subscripts(arr, 1) AS ord0
  FROM (SELECT doc_id,
               regexp_split_to_array(lower(text), '[^0-9a-z_]+') AS arr
        FROM documents)),
t AS (SELECT doc_id, tok,
             row_number() OVER (PARTITION BY doc_id ORDER BY ord0) - 1 AS pos
      FROM raw WHERE tok <> ''),
tri AS (SELECT doc_id,
               tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS g
        FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
sets AS (SELECT DISTINCT doc_id, g FROM tri WHERE g IS NOT NULL),
anchor AS (SELECT g FROM sets WHERE doc_id = 0),
asize AS (SELECT count(*) AS na FROM anchor),
sizes AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id),
inter AS (SELECT s.doc_id, count(*) AS ni FROM sets s
          JOIN anchor a ON s.g = a.g GROUP BY s.doc_id)
SELECT d.doc_id,
       CAST(round(coalesce(i.ni, 0)::DOUBLE
                  / greatest(coalesce(z.n, 0) + x.na - coalesce(i.ni, 0), 1), 6)
            AS DOUBLE) AS jaccard
FROM documents d CROSS JOIN asize x
LEFT JOIN sizes z ON z.doc_id = d.doc_id
LEFT JOIN inter i ON i.doc_id = d.doc_id
ORDER BY d.doc_id
""",
        "term_vectors": """
WITH raw AS (
  SELECT doc_id, unnest(arr) AS tok, generate_subscripts(arr, 1) AS ord0
  FROM (SELECT doc_id,
               regexp_split_to_array(lower(text), '[^0-9a-z_]+') AS arr
        FROM documents)),
t AS (SELECT doc_id, tok,
             row_number() OVER (PARTITION BY doc_id ORDER BY ord0) - 1 AS pos
      FROM raw WHERE tok <> '')
SELECT doc_id, tok AS term, count(*)::BIGINT AS tf,
       min(pos)::BIGINT AS min_pos, max(pos)::BIGINT AS max_pos
FROM t GROUP BY doc_id, tok ORDER BY doc_id, term
""",
        "ft_docvalue_stats": f"""
WITH {TOKS_CTE},
m AS (SELECT DISTINCT doc_id FROM toks WHERE tok IN ('data', 'stream'))
SELECT count(*)::BIGINT AS n,
       min(d.n_chars)::DOUBLE AS vmin,
       max(d.n_chars)::DOUBLE AS vmax,
       sum(d.n_chars)::DOUBLE AS vsum,
       CAST(round(sum(d.n_chars)::DOUBLE / count(*), 6) AS DOUBLE) AS vavg
FROM documents d JOIN m ON m.doc_id = d.doc_id
""",
        "token_fertility": r"""
WITH c AS (
  SELECT source, length(text)::BIGINT AS n_chars,
         len(list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> ''))::BIGINT AS n_toks
  FROM documents)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(n_toks)::BIGINT AS n_tokens,
       sum(n_chars)::BIGINT AS n_chars,
       CAST(round(sum(n_chars)::DOUBLE / sum(n_toks), 6) AS DOUBLE)
         AS chars_per_token
FROM c GROUP BY source ORDER BY source
""",
        "filter_funnel": r"""
WITH c AS (
  SELECT length(text) AS n_chars,
         list_filter(regexp_split_to_array(text, '\s+'),
                     x -> x <> '') AS toks
  FROM documents),
p AS (SELECT n_chars, len(toks) AS n_toks,
             list_max(list_transform(toks, x -> length(x))) AS max_len,
             len(list_distinct(toks)) AS n_distinct
      FROM c),
s AS (SELECT CASE
        WHEN n_chars < 200 THEN 'min_chars'
        WHEN n_toks < 30 THEN 'min_tokens'
        WHEN max_len > 25 THEN 'max_word_len'
        WHEN n_distinct::DOUBLE / n_toks < 0.3 THEN 'distinct_ratio'
        ELSE 'pass' END AS stage
      FROM p)
SELECT v.stage, count(s.stage)::BIGINT AS n_docs
FROM (VALUES ('min_chars'), ('min_tokens'), ('max_word_len'),
             ('distinct_ratio'), ('pass')) v(stage)
LEFT JOIN s ON s.stage = v.stage
GROUP BY v.stage ORDER BY v.stage
""",
        # ShingleFilter bigrams: ordered token stream via the
        # generate_series ordinality trick, pairs via lead() per doc.
        "ft_shingle": r"""
WITH t0 AS (
  SELECT doc_id, unnest(arr) AS tok,
         unnest(generate_series(1, len(arr))) AS ord0
  FROM (SELECT doc_id,
               regexp_split_to_array(lower(text), '[^0-9a-z_]+') AS arr
        FROM documents)),
t AS (SELECT doc_id, tok,
             row_number() OVER (PARTITION BY doc_id ORDER BY ord0) AS pos
      FROM t0 WHERE tok <> ''),
big AS (SELECT doc_id,
               tok || '_' || lead(tok) OVER (PARTITION BY doc_id
                                             ORDER BY pos) AS bg
        FROM t)
SELECT bg AS term, count(DISTINCT doc_id)::BIGINT AS df,
       count(*)::BIGINT AS ttf
FROM big WHERE bg IS NOT NULL
GROUP BY bg ORDER BY df DESC, term LIMIT 15
""",
        # BM25 over the bigram stream: dl/avgdl/norms count SHINGLES.
        "ft_shingle_search": r"""
WITH t0 AS (
  SELECT doc_id, unnest(arr) AS tok,
         unnest(generate_series(1, len(arr))) AS ord0
  FROM (SELECT doc_id,
               regexp_split_to_array(lower(text), '[^0-9a-z_]+') AS arr
        FROM documents)),
tt AS (SELECT doc_id, tok,
              row_number() OVER (PARTITION BY doc_id ORDER BY ord0) AS pos
       FROM t0 WHERE tok <> ''),
toks AS (SELECT doc_id,
                tok || '_' || lead(tok) OVER (PARTITION BY doc_id
                                              ORDER BY pos) AS tok
         FROM tt QUALIFY tok || '_' || lead(tok) OVER (PARTITION BY doc_id
                                                       ORDER BY pos) IS NOT NULL),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS dc, sum(dl)::DOUBLE AS sttf FROM dl),
""" + NORMVALS_CTE + ", " + DLQ_CTE + r""",
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok = 'data_stream' GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf JOIN dfx ON dfx.tok = tf.tok JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id)
SELECT doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT 10
""",
        "host_cap": """
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents) WHERE rn <= 5
ORDER BY doc_id
""",
        "url_filter": """
WITH u AS (
  SELECT doc_id,
         'HTTPS://Example-' || source || '.COM/Path/' || (doc_id % 40)
           || '/?utm_source=s' || doc_id || '&ref=keep#frag' AS url
  FROM documents)
SELECT doc_id, url FROM u
WHERE regexp_extract(lower(url),
        '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1)
      NOT IN ('example-src1.com', 'example-src7.com')
  AND lower(url) NOT LIKE '%/path/13/%'
ORDER BY doc_id
""",
        "dedup_keep_best": """
WITH c AS (
  SELECT doc_id, n_chars::DOUBLE AS score,
         row_number() OVER (PARTITION BY substr(text, 1, 30)
                            ORDER BY n_chars DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY substr(text, 1, 30)) AS dup_count
  FROM documents)
SELECT doc_id, score, dup_count::BIGINT AS dup_count
FROM c WHERE rn = 1 ORDER BY doc_id
""",
        "url_dedup": r"""
WITH u AS (
  SELECT doc_id,
         'HTTPS://Example-' || source || '.COM/Path/' || (doc_id % 40)
           || '/?utm_source=s' || doc_id || '&ref=keep#frag' AS url
  FROM documents),
c AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(lower(url), '#.*$', ''),
                     '([?&])(utm_[a-z]+|gclid|fbclid)=[^&#]*', '\1', 'g'),
                   '&&+', '&', 'g'),
                 '\?&', '?', 'g'),
               '[?&]+$', ''),
             '/\?', '?', 'g'),
           '/$', '') AS canonical_url
  FROM u)
SELECT min(doc_id)::BIGINT AS doc_id, canonical_url,
       count(*)::BIGINT AS dup_count
FROM c GROUP BY canonical_url
""",
        "scrub_spans": r"""
WITH t0 AS (
  SELECT doc_id, unnest(arr) AS tok,
         unnest(generate_series(1, len(arr))) AS ord0
  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS arr FROM documents)
),
t AS (SELECT doc_id, tok,
             row_number() OVER (PARTITION BY doc_id ORDER BY ord0) - 1 AS pos
      FROM t0 WHERE tok <> ''),
g AS (SELECT doc_id, pos,
             string_agg(tok, ' ') OVER w AS gram,
             count(*) OVER w AS wlen
      FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)),
gg AS (SELECT doc_id, pos, gram FROM g WHERE wlen = 8),
dup AS (SELECT gram FROM gg GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
occ AS (SELECT doc_id, pos FROM gg WHERE gram IN (SELECT gram FROM dup)),
cov AS (SELECT DISTINCT t.doc_id, t.pos FROM t
        JOIN occ ON occ.doc_id = t.doc_id
        AND t.pos BETWEEN occ.pos AND occ.pos + 7)
SELECT d.doc_id, coalesce(c.n, 0)::BIGINT AS n_removed
FROM documents d
LEFT JOIN (SELECT doc_id, count(*)::BIGINT AS n FROM cov GROUP BY doc_id) c
  ON c.doc_id = d.doc_id
""",
        "exact_dup_spans": r"""
WITH raw AS (
  SELECT doc_id, unnest(arr) AS tok, generate_subscripts(arr, 1) AS ord0
  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS arr FROM documents)),
t AS (SELECT doc_id, tok,
             row_number() OVER (PARTITION BY doc_id ORDER BY ord0) - 1 AS pos
      FROM raw WHERE tok <> ''),
g AS (SELECT doc_id, pos,
             string_agg(tok, ' ') OVER w AS gram,
             count(*) OVER w AS wlen
      FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)),
gg AS (SELECT doc_id, pos, gram FROM g WHERE wlen = 8),
dup AS (SELECT gram FROM gg GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
occ AS (SELECT doc_id, pos FROM gg WHERE gram IN (SELECT gram FROM dup)),
mark AS (SELECT doc_id, pos,
                CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
                     THEN 0 ELSE 1 END AS new_region
         FROM occ),
reg AS (SELECT doc_id, pos,
               sum(new_region) OVER (PARTITION BY doc_id ORDER BY pos) AS rid
        FROM mark),
spans AS (SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e
          FROM reg GROUP BY doc_id, rid)
SELECT s.doc_id, s.s::BIGINT AS span_start, s.e::BIGINT AS span_end,
       (s.e - s.s)::BIGINT AS n_tokens,
       string_agg(t.tok, ' ' ORDER BY t.pos) AS span_text
FROM spans s JOIN t ON t.doc_id = s.doc_id
 AND t.pos >= s.s AND t.pos < s.e
GROUP BY s.doc_id, s.s, s.e
ORDER BY s.doc_id, s.s
""",
        "dedup_suffix": r"""
WITH idx AS (SELECT i FROM generate_series(0, 65535) AS t(i)),
pos AS (SELECT doc_id, i, substr(text, i + 1, 40) AS gram
        FROM documents JOIN idx ON i <= strlen(text) - 40),
nd AS (SELECT gram FROM pos GROUP BY gram
       HAVING count(DISTINCT doc_id) >= 2),
dup AS (SELECT p.doc_id, p.i FROM pos p JOIN nd USING (gram)),
brk AS (SELECT doc_id, i,
               CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) <= 40
                    THEN 0 ELSE 1 END AS b
        FROM dup),
grp AS (SELECT doc_id, i,
               sum(b) OVER (PARTITION BY doc_id ORDER BY i) AS g
        FROM brk),
sp AS (SELECT doc_id, min(i) AS span_start, max(i) + 40 AS span_end
       FROM grp GROUP BY doc_id, g)
SELECT s.doc_id, s.span_start::BIGINT AS span_start,
       s.span_end::BIGINT AS span_end,
       (s.span_end - s.span_start)::BIGINT AS n_bytes,
       substr(d.text, s.span_start + 1, s.span_end - s.span_start)
         AS span_text
FROM sp s JOIN documents d ON d.doc_id = s.doc_id
ORDER BY s.doc_id, s.span_start
""",
        "scrub_suffix": r"""
WITH idx AS (SELECT i FROM generate_series(0, 65535) AS t(i)),
pos AS (SELECT doc_id, i, substr(text, i + 1, 40) AS gram
        FROM documents JOIN idx ON i <= strlen(text) - 40),
nd AS (SELECT gram FROM pos GROUP BY gram
       HAVING count(DISTINCT doc_id) >= 2),
dup AS (SELECT p.doc_id, p.i FROM pos p JOIN nd USING (gram)),
brk AS (SELECT doc_id, i,
               CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) <= 40
                    THEN 0 ELSE 1 END AS b
        FROM dup),
grp AS (SELECT doc_id, i,
               sum(b) OVER (PARTITION BY doc_id ORDER BY i) AS g
        FROM brk),
sp AS (SELECT doc_id, min(i) AS span_start, max(i) + 40 AS span_end
       FROM grp GROUP BY doc_id, g),
segs AS (
  SELECT doc_id,
         coalesce(lag(span_end) OVER (PARTITION BY doc_id
                                      ORDER BY span_start), 0) AS s,
         span_start AS e
  FROM sp
  UNION ALL
  SELECT sp.doc_id, max(sp.span_end), max(strlen(d.text))
  FROM sp JOIN documents d USING (doc_id) GROUP BY sp.doc_id),
cleaned AS (
  SELECT s.doc_id,
         string_agg(substr(d.text, s.s + 1, s.e - s.s), '' ORDER BY s.s)
           AS text
  FROM segs s JOIN documents d USING (doc_id) GROUP BY s.doc_id),
rem AS (SELECT doc_id, sum(span_end - span_start) AS n_removed
        FROM sp GROUP BY doc_id)
SELECT d.doc_id, coalesce(c.text, d.text) AS text,
       coalesce(rem.n_removed, 0)::BIGINT AS n_removed
FROM documents d
LEFT JOIN cleaned c USING (doc_id)
LEFT JOIN rem USING (doc_id)
ORDER BY d.doc_id
""",
        "chunk_dedup": r"""
WITH raw AS (
  SELECT doc_id, unnest(arr) AS tok, generate_subscripts(arr, 1) AS ord0
  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS arr FROM documents)),
t AS (SELECT doc_id, tok,
             row_number() OVER (PARTITION BY doc_id ORDER BY ord0) - 1 AS ord
      FROM raw WHERE tok <> ''),
chunks AS (
  SELECT doc_id, ord // 16 AS chunk_idx,
         string_agg(tok, ' ' ORDER BY ord) AS chunk, count(*) AS n_toks
  FROM t GROUP BY doc_id, ord // 16),
marked AS (
  SELECT doc_id, n_toks,
         (row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) > 1)::INT AS dup
  FROM chunks)
SELECT doc_id,
       count(*)::BIGINT AS n_chunks,
       sum(dup)::BIGINT AS n_dup_chunks,
       sum(n_toks)::BIGINT AS n_tokens,
       sum(dup * n_toks)::BIGINT AS n_dup_tokens,
       CAST(round(sum(dup * n_toks)::DOUBLE / greatest(sum(n_toks), 1), 6) AS DOUBLE)
         AS dup_token_frac
FROM marked GROUP BY doc_id ORDER BY doc_id
""",
        "repetition": r"""
WITH raw AS (
  SELECT doc_id, unnest(arr) AS tok, generate_subscripts(arr, 1) AS ord0
  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS arr FROM documents)),
t AS (SELECT doc_id, tok,
             row_number() OVER (PARTITION BY doc_id ORDER BY ord0) - 1 AS ord
      FROM raw WHERE tok <> ''),
counts AS (SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_unique
           FROM t GROUP BY doc_id),
grams AS (
  SELECT doc_id, tok,
         tok || ' ' || lead(tok, 1) OVER w AS bg,
         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS tg
  FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY ord)),
topb AS (SELECT doc_id, max(c) AS top_b FROM (
           SELECT doc_id, bg, count(*) AS c FROM grams
           WHERE bg IS NOT NULL GROUP BY doc_id, bg) GROUP BY doc_id),
topt AS (SELECT doc_id, max(c) AS top_t FROM (
           SELECT doc_id, tg, count(*) AS c FROM grams
           WHERE tg IS NOT NULL GROUP BY doc_id, tg) GROUP BY doc_id)
SELECT c.doc_id,
       c.n_tokens::BIGINT AS n_tokens,
       CAST(round(c.n_unique::DOUBLE / greatest(c.n_tokens, 1), 6) AS DOUBLE)
         AS frac_unique,
       CAST(round(coalesce(topb.top_b, 0)::DOUBLE / greatest(c.n_tokens - 1, 1), 6)
            AS DOUBLE) AS top_bigram_frac,
       CAST(round(coalesce(topt.top_t, 0)::DOUBLE / greatest(c.n_tokens - 2, 1), 6)
            AS DOUBLE) AS top_trigram_frac
FROM counts c
LEFT JOIN topb ON topb.doc_id = c.doc_id
LEFT JOIN topt ON topt.doc_id = c.doc_id
ORDER BY c.doc_id
""",
        "source_stats": """
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(length(text))::BIGINT AS sum_chars,
       CAST(round(sum(length(text))::DOUBLE / greatest(count(*), 1), 6) AS DOUBLE)
         AS avg_chars,
       count(DISTINCT lang)::BIGINT AS n_langs
FROM documents GROUP BY source ORDER BY source
""",
        "bpe_pairs": r"""
WITH raw AS (
  SELECT doc_id, unnest(arr) AS tok, generate_subscripts(arr, 1) AS ord0
  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS arr FROM documents)),
t AS (SELECT doc_id, tok,
             row_number() OVER (PARTITION BY doc_id ORDER BY ord0) - 1 AS ord
      FROM raw WHERE tok <> ''),
pairs AS (
  SELECT doc_id, tok AS l, lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS r
  FROM t)
SELECT l AS "left", r AS "right", count(*)::BIGINT AS cnt
FROM pairs WHERE r IS NOT NULL
GROUP BY l, r ORDER BY cnt DESC, l, r LIMIT 50
""",
        "normalize_text": r"""
SELECT doc_id,
       lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm_text,
       length(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))::BIGINT
         AS n_chars_norm
FROM documents ORDER BY doc_id
""",
        "decontam": """
WITH lists AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'), x -> x <> '') AS l
  FROM documents),
toks AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM lists),
tg AS (
  SELECT t1.doc_id, t1.tok || ' ' || t2.tok || ' ' || t3.tok AS g
  FROM toks t1
  JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
  JOIN toks t3 ON t3.doc_id = t1.doc_id AND t3.pos = t1.pos + 2),
bench AS (SELECT DISTINCT g FROM tg WHERE doc_id % 100 = 7),
corpus AS (SELECT doc_id, len(l) AS dl FROM lists WHERE doc_id % 100 <> 7),
hits AS (
  SELECT tg.doc_id, count(*)::BIGINT AS n_hits
  FROM tg WHERE tg.doc_id % 100 <> 7 AND tg.g IN (SELECT g FROM bench)
  GROUP BY tg.doc_id)
SELECT c.doc_id,
       greatest(c.dl - 2, 0)::BIGINT AS n_grams,
       coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       (coalesce(h.n_hits, 0) > 0)::BIGINT AS contaminated
FROM corpus c LEFT JOIN hits h ON h.doc_id = c.doc_id
ORDER BY c.doc_id
""",
        # Cross-doc duplicated 3-grams: distinct (doc, gram) pairs, a
        # gram is dup iff it appears in >=2 docs; per-doc counts.
        "dup_ngrams": """
WITH lists AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'), x -> x <> '') AS l
  FROM documents),
toks AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM lists),
tg AS (
  SELECT DISTINCT t1.doc_id, t1.tok || ' ' || t2.tok || ' ' || t3.tok AS g
  FROM toks t1
  JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
  JOIN toks t3 ON t3.doc_id = t1.doc_id AND t3.pos = t1.pos + 2),
gcnt AS (SELECT g, count(*)::BIGINT AS nd FROM tg GROUP BY g)
SELECT tg.doc_id,
       count(*)::BIGINT AS n_grams,
       (count(*) FILTER (WHERE gcnt.nd >= 2))::BIGINT AS n_dup,
       CAST(round((count(*) FILTER (WHERE gcnt.nd >= 2))::DOUBLE
                  / count(*), 6) AS DOUBLE) AS dup_frac
FROM tg JOIN gcnt ON gcnt.g = tg.g
GROUP BY tg.doc_id ORDER BY tg.doc_id
""",
        "pii_scrub": r"""
WITH s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM documents),
s2 AS (
  SELECT doc_id, n_email,
         len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ip,
         regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2
  FROM s1),
s3 AS (
  SELECT doc_id, n_email, n_ip,
         len(regexp_extract_all(t2, '\+\d[\d\-\. ]{7,}\d'))::BIGINT AS n_phone,
         regexp_replace(t2, '\+\d[\d\-\. ]{7,}\d', '<PHONE>', 'g') AS text
  FROM s2)
SELECT doc_id, text, n_email, n_ip, n_phone FROM s3 ORDER BY doc_id
""",
        # Domain-mixture rates: K = min_g(n_g/t_g); rate_g = t_g*K/n_g
        # (expression shape mirrors the engine's (t*k)/n doubles).
        "mix_rates": """
WITH n AS (SELECT source AS grp, count(*)::DOUBLE AS n
           FROM documents GROUP BY source),
t(grp, t) AS (VALUES ('src1', 0.5), ('src2', 0.3), ('src3', 0.2)),
kmax AS (SELECT min(n.n / t.t) AS k FROM n JOIN t ON t.grp = n.grp)
SELECT n.grp AS "group", n.n::BIGINT AS n,
       CAST(round(coalesce(t.t * kmax.k / n.n, 0.0), 9) AS DOUBLE) AS rate
FROM n LEFT JOIN t ON t.grp = n.grp CROSS JOIN kmax
ORDER BY n.grp
""",
        "sample_mix": """
WITH n AS (SELECT source AS grp, count(*)::DOUBLE AS n
           FROM documents GROUP BY source),
t(grp, t) AS (VALUES ('src1', 0.5), ('src2', 0.3), ('src3', 0.2)),
kmax AS (SELECT min(n.n / t.t) AS k FROM n JOIN t ON t.grp = n.grp),
rates AS (SELECT n.grp, t.t * kmax.k / n.n AS rate
          FROM n JOIN t ON t.grp = n.grp CROSS JOIN kmax)
SELECT d.doc_id, d.source
FROM documents d JOIN rates r ON r.grp = d.source
WHERE (d.doc_id * 2654435761) % 4294967296
      < CAST(floor(r.rate * 4294967296) AS BIGINT)
ORDER BY d.doc_id
""",
        "sample_hash": """
SELECT doc_id, lang, source FROM documents
WHERE (doc_id * 2654435761) % 4294967296 < 429496729
ORDER BY doc_id
""",
        "sample_stratified": """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
  FROM documents)
WHERE rn <= 20 ORDER BY doc_id
""",
        # Relational replay of pipelines/curate.py::curate_corpus with
        # q_curate's parameters (lang=en, min_tokens=10,
        # min_stop_ratio=0.05, ngram=3, sample_rate=0.9 ->
        # threshold int(0.9*2^32)=3865470566; bench = doc_id%100=7).
        # Precedence: duplicate > language > too_short > low_quality >
        # contaminated > sampled_out > keep.
        "curate": f"""
WITH lists AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'), x -> x <> '') AS l
  FROM documents),
toks AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM lists),
tg AS (
  SELECT t1.doc_id, t1.tok || ' ' || t2.tok || ' ' || t3.tok AS g
  FROM toks t1
  JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
  JOIN toks t3 ON t3.doc_id = t1.doc_id AND t3.pos = t1.pos + 2),
bench AS (SELECT DISTINCT g FROM tg WHERE doc_id % 100 = 7),
hits AS (
  SELECT doc_id, count(*) AS n_hits FROM tg
  WHERE g IN (SELECT g FROM bench) GROUP BY doc_id),
tc AS (
  SELECT doc_id, count(*) AS n_tokens,
         count(*) FILTER (WHERE tok IN ({_STOPLIST_SQL})) AS n_stop,
         count(*) FILTER (WHERE tok IN ({lang_counts['en']})) AS n_en,
         count(*) FILTER (WHERE tok IN ({lang_counts['de']})) AS n_de,
         count(*) FILTER (WHERE tok IN ({lang_counts['fr']})) AS n_fr
  FROM toks GROUP BY doc_id),
sig AS (
  SELECT d.doc_id,
         (d.doc_id <> min(d.doc_id) OVER (PARTITION BY d.text)) AS is_dup,
         coalesce(tc.n_tokens, 0) AS n_tokens,
         coalesce(tc.n_stop, 0) AS n_stop,
         CASE WHEN coalesce(tc.n_en,0) >= coalesce(tc.n_de,0)
                   AND coalesce(tc.n_en,0) >= coalesce(tc.n_fr,0) THEN 'en'
              WHEN coalesce(tc.n_de,0) >= coalesce(tc.n_fr,0) THEN 'de'
              ELSE 'fr' END AS pred_lang,
         coalesce(h.n_hits, 0) AS n_hits,
         (d.doc_id * 2654435761) % 4294967296 AS sample_h
  FROM documents d
  LEFT JOIN tc ON tc.doc_id = d.doc_id
  LEFT JOIN hits h ON h.doc_id = d.doc_id),
verdict AS (
  SELECT doc_id,
         CASE WHEN is_dup THEN 'duplicate'
              WHEN pred_lang <> 'en' THEN 'language'
              WHEN n_tokens < 10 THEN 'too_short'
              WHEN n_stop::DOUBLE / greatest(n_tokens, 1) < 0.05 THEN 'low_quality'
              WHEN n_hits > 0 THEN 'contaminated'
              WHEN sample_h >= 3865470566 THEN 'sampled_out'
              ELSE 'keep' END AS reason
  FROM sig)
SELECT doc_id, (reason = 'keep')::BIGINT AS keep, reason
FROM verdict ORDER BY doc_id
""",
        # Relational replay of ops/packing.py::pack_sequences with
        # seq_len=128: global exclusive prefix sum of per-doc token
        # counts in doc_id order, then one span row per
        # (sequence, doc) overlap.
        "pack_sequences": f"""
WITH {TOKS_CTE}, {DL_CTE},
o AS (
  SELECT doc_id, dl,
         coalesce(sum(dl) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM dl WHERE dl > 0),
spans AS (
  SELECT doc_id, dl, off,
         unnest(range((off // 128)::BIGINT, ((off + dl - 1) // 128 + 1)::BIGINT)) AS seq_id
  FROM o)
SELECT seq_id::BIGINT AS seq_id, doc_id,
       (greatest(off, seq_id * 128) - seq_id * 128)::BIGINT AS start_in_seq,
       (greatest(off, seq_id * 128) - off)::BIGINT AS start_in_doc,
       (least(off + dl, seq_id * 128 + 128)
        - greatest(off, seq_id * 128))::BIGINT AS n_tokens
FROM spans ORDER BY seq_id, doc_id
""",
        # Relational replay of ops/lmscore.py::lm_score with
        # vocab_size=200: top-200 unigram model (count desc, term asc
        # tie-break), OOV tokens score as count 1 (prob 1/T).
        "lm_score": f"""
WITH {TOKS_CTE},
cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT sum(c)::DOUBLE AS t FROM cnt),
model AS (SELECT tok, c FROM cnt ORDER BY c DESC, tok LIMIT 200),
sc AS (
  SELECT k.doc_id,
         count(*) AS n_tokens,
         sum(-ln(coalesce(m.c, 1) / tot.t)) AS sum_nll,
         count(*) FILTER (WHERE m.tok IS NULL) AS n_oov
  FROM toks k CROSS JOIN tot LEFT JOIN model m ON m.tok = k.tok
  GROUP BY k.doc_id)
SELECT d.doc_id,
  coalesce(sc.n_tokens, 0)::BIGINT AS n_tokens,
  CAST(round(coalesce(sc.sum_nll, 0) / greatest(coalesce(sc.n_tokens, 0), 1), 6)
       AS DOUBLE) AS mean_nll,
  CAST(round(coalesce(sc.n_oov, 0) / greatest(coalesce(sc.n_tokens, 0), 1)::DOUBLE, 6)
       AS DOUBLE) AS oov_frac
FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
ORDER BY d.doc_id
""",
        # Relational replay of ops/cooc.py::cooccurrence_pmi
        # (window=5, top_k=50): unordered pairs within +-5 positions,
        # PMI from unigram marginals.
        "cooccurrence": """
WITH raw AS (
  SELECT doc_id, unnest(arr) AS tok, generate_subscripts(arr, 1) AS ord0
  FROM (SELECT doc_id,
               regexp_split_to_array(lower(text), '[^0-9a-z_]+') AS arr
        FROM documents)),
t AS (SELECT doc_id, tok,
             row_number() OVER (PARTITION BY doc_id ORDER BY ord0) - 1 AS pos
      FROM raw WHERE tok <> ''),
pairs AS (
  SELECT least(a.tok, b.tok) AS l, greatest(a.tok, b.tok) AS r
  FROM t a JOIN t b
    ON b.doc_id = a.doc_id AND b.pos > a.pos AND b.pos <= a.pos + 5),
pcnt AS (SELECT l, r, count(*) AS cnt FROM pairs GROUP BY l, r),
uni AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
ntok AS (SELECT sum(c)::DOUBLE AS n FROM uni),
npair AS (SELECT sum(cnt)::DOUBLE AS np FROM pcnt),
top AS (SELECT l, r, cnt FROM pcnt ORDER BY cnt DESC, l, r LIMIT 50)
SELECT top.l AS "left", top.r AS "right", top.cnt::BIGINT AS cnt,
  CAST(round(ln((top.cnt / npair.np)
               / ((ua.c / ntok.n) * (ub.c / ntok.n))), 6) AS DOUBLE) AS pmi
FROM top CROSS JOIN npair CROSS JOIN ntok
JOIN uni ua ON ua.tok = top.l
JOIN uni ub ON ub.tok = top.r
ORDER BY top.cnt DESC, top.l, top.r
""",
        # Relational replay of ops/joins.py::asof_join (purchase
        # joined to latest signup at-or-before, per user; equal-ts
        # rights win by larger event_id; unmatched -> -1 sentinels).
        "asof_join": """
WITH u AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value, 0 AS side
  FROM events WHERE event_type = 'signup'
  UNION ALL
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, NULL, 1
  FROM events WHERE event_type = 'purchase'),
x AS (
  SELECT *,
    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
      OVER w AS r_eid,
    last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS)
      OVER w AS r_val,
    last_value(CASE WHEN side = 0 THEN ts_us END IGNORE NULLS)
      OVER w AS r_ts
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, side, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT event_id, user_id AS key, ts_us::BIGINT AS ts_us,
       coalesce(r_eid, -1)::BIGINT AS right_event_id,
       CAST(round(coalesce(r_val, 0), 6) AS DOUBLE) AS right_value,
       coalesce(ts_us - r_ts, -1)::BIGINT AS lag_us
FROM x WHERE side = 1 ORDER BY event_id
""",
        # Did-you-mean for 'strean' (prefix 's', <=2 edits, dist 0
        # excluded): rank dist asc, df desc, term asc.
        "ft_suggest": f"""
WITH {TOKS_CTE},
v AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks
      WHERE tok LIKE 's%' GROUP BY tok),
c AS (SELECT tok, df, levenshtein(tok, 'strean') AS dist FROM v)
SELECT tok AS term, df::BIGINT AS df, dist::BIGINT AS dist
FROM c WHERE dist BETWEEN 1 AND 2
ORDER BY dist, df DESC, tok LIMIT 5
""",
        # Top-3 terms per source (count desc, term asc).
        "top_terms_per_source": """
WITH toks AS (SELECT source, tok FROM (
  SELECT source, unnest(regexp_split_to_array(lower(text), '[^0-9a-z_]+')) AS tok
  FROM documents) WHERE tok <> ''),
cnt AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY source, tok),
r AS (SELECT source, tok, c,
             row_number() OVER (PARTITION BY source
                                ORDER BY c DESC, tok) AS rank
      FROM cnt)
SELECT source AS grp, tok AS term, c::BIGINT AS cnt, rank::BIGINT AS rank
FROM r WHERE rank <= 3 ORDER BY grp, rank
""",
        # Transitive closure of the embedding near-dup pair graph:
        # component label = min node id (recursive CTE replay of the
        # min-label propagation in ops/components.py).
        "dup_components": """
WITH RECURSIVE s AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4),
e AS (SELECT a AS u, b AS v FROM s UNION SELECT b, a FROM s),
n AS (SELECT DISTINCT u AS node FROM e),
reach(node, r) AS (
  SELECT node, node FROM n
  UNION
  SELECT e.v, reach.r FROM reach JOIN e ON e.u = reach.node)
SELECT node::BIGINT AS node, min(r)::BIGINT AS label
FROM reach GROUP BY node ORDER BY node
""",
        # Binned-exact per-group quantiles (bin_width=5, lower-bound
        # convention, rank = max(1, ceil(q*n))).
        "group_quantiles": """
WITH b AS (SELECT event_type AS key, floor(value / 5.0)::BIGINT AS bin,
                  count(*) AS cnt
           FROM events GROUP BY 1, 2),
c AS (SELECT key, bin, cnt,
             sum(cnt) OVER (PARTITION BY key ORDER BY bin) AS cum,
             sum(cnt) OVER (PARTITION BY key) AS n
      FROM b),
q(q) AS (VALUES (0.5), (0.95), (0.99)),
sel AS (
  SELECT c.key, q.q, c.bin, c.n,
         row_number() OVER (PARTITION BY c.key, q.q ORDER BY c.bin) AS rn
  FROM c JOIN q ON c.cum >= greatest(1, ceil(q.q * c.n)))
SELECT key, CAST(round(q, 6) AS DOUBLE) AS q,
       CAST(round(bin * 5.0, 6) AS DOUBLE) AS value, n::BIGINT AS n
FROM sel WHERE rn = 1 ORDER BY key, q
""",
        # curate (same params as the `curate` oracle, CTEs prefixed
        # c_) -> kept corpus -> BM25 top-10 'data merge' with stats of
        # the KEPT corpus only.
        "curate_then_index": f"""
WITH c_lists AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'), x -> x <> '') AS l
  FROM documents),
c_toks AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM c_lists),
c_tg AS (
  SELECT t1.doc_id, t1.tok || ' ' || t2.tok || ' ' || t3.tok AS g
  FROM c_toks t1
  JOIN c_toks t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
  JOIN c_toks t3 ON t3.doc_id = t1.doc_id AND t3.pos = t1.pos + 2),
c_bench AS (SELECT DISTINCT g FROM c_tg WHERE doc_id % 100 = 7),
c_hits AS (
  SELECT doc_id, count(*) AS n_hits FROM c_tg
  WHERE g IN (SELECT g FROM c_bench) GROUP BY doc_id),
c_tc AS (
  SELECT doc_id, count(*) AS n_tokens,
         count(*) FILTER (WHERE tok IN ({_STOPLIST_SQL})) AS n_stop,
         count(*) FILTER (WHERE tok IN ({lang_counts['en']})) AS n_en,
         count(*) FILTER (WHERE tok IN ({lang_counts['de']})) AS n_de,
         count(*) FILTER (WHERE tok IN ({lang_counts['fr']})) AS n_fr
  FROM c_toks GROUP BY doc_id),
c_sig AS (
  SELECT d.doc_id,
         (d.doc_id <> min(d.doc_id) OVER (PARTITION BY d.text)) AS is_dup,
         coalesce(tc.n_tokens, 0) AS n_tokens,
         coalesce(tc.n_stop, 0) AS n_stop,
         CASE WHEN coalesce(tc.n_en,0) >= coalesce(tc.n_de,0)
                   AND coalesce(tc.n_en,0) >= coalesce(tc.n_fr,0) THEN 'en'
              WHEN coalesce(tc.n_de,0) >= coalesce(tc.n_fr,0) THEN 'de'
              ELSE 'fr' END AS pred_lang,
         coalesce(h.n_hits, 0) AS n_hits,
         (d.doc_id * 2654435761) % 4294967296 AS sample_h
  FROM documents d
  LEFT JOIN c_tc tc ON tc.doc_id = d.doc_id
  LEFT JOIN c_hits h ON h.doc_id = d.doc_id),
kept AS (
  SELECT doc_id FROM c_sig
  WHERE NOT is_dup AND pred_lang = 'en' AND n_tokens >= 10
    AND n_stop::DOUBLE / greatest(n_tokens, 1) >= 0.05
    AND n_hits = 0 AND sample_h < 3865470566),
toks AS (SELECT doc_id, tok FROM (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^0-9a-z_]+')) AS tok
  FROM documents WHERE doc_id IN (SELECT doc_id FROM kept)) WHERE tok <> ''),
{DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'merge') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf
  JOIN dfx ON dfx.tok = tf.tok
  JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id)
SELECT doc_id, CAST(round(score, 4) AS DOUBLE) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT 10
""",
        "ft_suggest_phrase": r"""
WITH t0 AS (
  SELECT doc_id, unnest(arr) AS tok,
         unnest(generate_series(1, len(arr))) AS ord0
  FROM (SELECT doc_id,
               regexp_split_to_array(lower(text), '[^0-9a-z_]+') AS arr
        FROM documents)),
t AS (SELECT doc_id, tok,
             row_number() OVER (PARTITION BY doc_id ORDER BY ord0) - 1 AS pos
      FROM t0 WHERE tok <> ''),
v AS (SELECT tok, count(DISTINCT doc_id) AS df FROM t GROUP BY tok),
c1 AS (SELECT tok, levenshtein(tok, 'strean') AS dist,
              row_number() OVER (ORDER BY levenshtein(tok, 'strean'),
                                 df DESC, tok) AS rn
       FROM v WHERE tok LIKE 's%'
         AND levenshtein(tok, 'strean') BETWEEN 1 AND 2),
c2 AS (SELECT tok, levenshtein(tok, 'merg') AS dist,
              row_number() OVER (ORDER BY levenshtein(tok, 'merg'),
                                 df DESC, tok) AS rn
       FROM v WHERE tok LIKE 'm%'
         AND levenshtein(tok, 'merg') BETWEEN 1 AND 2),
combos AS (SELECT a.tok AS w1, b.tok AS w2,
                  (a.dist + b.dist)::BIGINT AS edits
           FROM c1 a CROSS JOIN c2 b
           WHERE a.rn <= 3 AND b.rn <= 3),
pairs AS (SELECT a.doc_id, a.tok AS w1, b.tok AS w2
          FROM t a JOIN t b
            ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
counts AS (SELECT co.w1, co.w2, co.edits,
                  count(DISTINCT p.doc_id)::BIGINT AS n_docs
           FROM combos co JOIN pairs p
             ON p.w1 = co.w1 AND p.w2 = co.w2
           GROUP BY co.w1, co.w2, co.edits)
SELECT w1 || ' ' || w2 AS suggestion, n_docs, edits
FROM counts ORDER BY n_docs DESC, edits, suggestion LIMIT 5
""",
        "ft_autocomplete": """
WITH toks AS (SELECT doc_id, tok FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^0-9a-z_]+')) AS tok FROM documents) WHERE tok <> ''),
df AS (SELECT tok AS term, count(DISTINCT doc_id)::BIGINT AS df
       FROM toks WHERE tok LIKE 's%' GROUP BY tok)
SELECT term, df FROM df ORDER BY df DESC, term LIMIT 10
""",
        "ft_top_groups": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'merge') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf
  JOIN dfx ON dfx.tok = tf.tok
  JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id),
withg AS (SELECT s.doc_id, s.score, d.source AS grp
          FROM scored s JOIN documents d ON d.doc_id = s.doc_id),
gbest AS (SELECT grp, max(score) AS best FROM withg GROUP BY grp),
gtop AS (SELECT grp, row_number() OVER (ORDER BY best DESC, grp) AS grank
         FROM gbest),
perdoc AS (SELECT w.grp, w.doc_id, w.score,
                  row_number() OVER (PARTITION BY w.grp
                                     ORDER BY w.score DESC, w.doc_id) - 1
                    AS rank
           FROM withg w)
SELECT p.grp, p.rank::BIGINT AS rank, p.doc_id,
       CAST(round(p.score, 4) AS DOUBLE) AS score
FROM perdoc p JOIN gtop g ON g.grp = p.grp
WHERE g.grank <= 5 AND p.rank < 2
ORDER BY g.grank, p.rank
""",
        "ft_drill_sideways": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf
  JOIN dfx ON dfx.tok = tf.tok
  JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats),
scored AS (SELECT doc_id, sum(s) AS score FROM contrib GROUP BY doc_id),
hits AS (SELECT s.doc_id, s.score FROM scored s
         JOIN documents d ON d.doc_id = s.doc_id
         WHERE d.source = 'cc'
         ORDER BY s.score DESC, s.doc_id LIMIT 10),
m AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'data'),
fac AS (SELECT d.source AS key, count(*)::DOUBLE AS val
        FROM documents d JOIN m ON m.doc_id = d.doc_id GROUP BY d.source)
SELECT 'hit' AS kind, CAST(doc_id AS VARCHAR) AS key,
       CAST(round(score, 4) AS DOUBLE) AS val FROM hits
UNION ALL
SELECT 'facet' AS kind, key, val FROM fac
""",
        "doc_keywords": """
WITH toks AS (SELECT doc_id, tok FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^0-9a-z_]+')) AS tok FROM documents) WHERE tok <> ''),
tf AS (SELECT doc_id, tok AS term, count(*)::DOUBLE AS tf
       FROM toks GROUP BY doc_id, tok),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
nd AS (SELECT count(*)::DOUBLE AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(round(tf.tf * ln((SELECT n FROM nd) / df.df), 6) AS DOUBLE)
           AS score
  FROM tf JOIN df ON df.term = tf.term),
ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rn
  FROM scored)
SELECT doc_id, term, score FROM ranked WHERE rn <= 3
ORDER BY doc_id, term
""",
        "pagerank": """
WITH n AS (SELECT count(*)::BIGINT AS c FROM documents),
e AS (SELECT d.doc_id AS src, 1 + (d.doc_id % 13) AS deg,
             (d.doc_id * (48271 + j.j) + j.j * 1009) % (SELECT c FROM n) AS dst
      FROM documents d, (SELECT unnest(range(1, 14)) AS j) j
      WHERE j.j <= 1 + (d.doc_id % 13)),
p0 AS (SELECT doc_id, 1.0 / (SELECT c FROM n) AS pr FROM documents),
p1 AS (SELECT d.doc_id, 0.15 / (SELECT c FROM n) + 0.85 * coalesce(s.x, 0) AS pr
       FROM documents d LEFT JOIN (
         SELECT e.dst AS doc_id, sum(p.pr / e.deg) AS x
         FROM e JOIN p0 p ON p.doc_id = e.src GROUP BY e.dst) s
       USING (doc_id)),
p2 AS (SELECT d.doc_id, 0.15 / (SELECT c FROM n) + 0.85 * coalesce(s.x, 0) AS pr
       FROM documents d LEFT JOIN (
         SELECT e.dst AS doc_id, sum(p.pr / e.deg) AS x
         FROM e JOIN p1 p ON p.doc_id = e.src GROUP BY e.dst) s
       USING (doc_id)),
p3 AS (SELECT d.doc_id, 0.15 / (SELECT c FROM n) + 0.85 * coalesce(s.x, 0) AS pr
       FROM documents d LEFT JOIN (
         SELECT e.dst AS doc_id, sum(p.pr / e.deg) AS x
         FROM e JOIN p2 p ON p.doc_id = e.src GROUP BY e.dst) s
       USING (doc_id))
SELECT doc_id, CAST(round((pr * (SELECT c FROM n))::DOUBLE, 6) AS DOUBLE) AS score
FROM p3 ORDER BY score DESC, doc_id LIMIT 100
""",
        "link_degree": """
WITH n AS (SELECT count(*)::BIGINT AS c FROM documents),
e AS (SELECT d.doc_id AS src,
             (d.doc_id * (48271 + j.j) + j.j * 1009) % (SELECT c FROM n) AS dst
      FROM documents d, (SELECT unnest(range(1, 14)) AS j) j
      WHERE j.j <= 1 + (d.doc_id % 13))
SELECT dst AS doc_id, count(*)::BIGINT AS in_deg
FROM e GROUP BY dst ORDER BY in_deg DESC, doc_id LIMIT 20
""",
        "ft_span_not": """
WITH lists AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'), x -> x <> '') AS l
  FROM documents),
toks AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM lists),
m AS (SELECT t1.doc_id, t1.pos AS s
      FROM toks t1 JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
      WHERE t1.tok = 'batch' AND t2.tok = 'stream'),
kept AS (SELECT m.doc_id, m.s FROM m WHERE NOT EXISTS (
  SELECT 1 FROM toks e WHERE e.doc_id = m.doc_id AND e.tok = 'data'
    AND e.pos BETWEEN m.s - 5 AND m.s + 1 + 5))
SELECT doc_id, count(*)::BIGINT AS span_freq FROM kept GROUP BY doc_id
""",
        "ft_intervals": """
WITH lists AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'), x -> x <> '') AS l
  FROM documents),
toks AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM lists),
a AS (SELECT doc_id, pos FROM toks WHERE tok = 'data'),
b AS (SELECT doc_id, pos FROM toks WHERE tok = 'merge'),
chain AS (
  SELECT a.doc_id, a.pos AS s,
         (SELECT min(b.pos) FROM b
          WHERE b.doc_id = a.doc_id AND b.pos > a.pos) AS e
  FROM a),
w AS (SELECT doc_id, s FROM chain WHERE e IS NOT NULL AND e - s - 1 <= 3)
SELECT doc_id, count(*)::BIGINT AS n_intervals, min(s)::BIGINT AS first_start
FROM w GROUP BY doc_id ORDER BY doc_id
""",
        "ft_intervals_unordered": """
WITH lists AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'), x -> x <> '') AS l
  FROM documents),
toks AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM lists),
w AS (
  SELECT t1.doc_id, t1.pos AS s FROM toks t1
  WHERE t1.tok = 'batch' AND EXISTS (
    SELECT 1 FROM toks t2 WHERE t2.doc_id = t1.doc_id AND t2.tok = 'stream'
      AND t2.pos <> t1.pos AND abs(t2.pos - t1.pos) - 1 <= 2))
SELECT doc_id, count(*)::BIGINT AS n_intervals, min(s)::BIGINT AS first_start
FROM w GROUP BY doc_id ORDER BY doc_id
""",
        "ft_intervals_not": """
WITH lists AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'), x -> x <> '') AS l
  FROM documents),
toks AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM lists),
a AS (SELECT doc_id, pos FROM toks WHERE tok = 'data'),
b AS (SELECT doc_id, pos FROM toks WHERE tok = 'merge'),
chain AS (
  SELECT a.doc_id, a.pos AS s,
         (SELECT min(b.pos) FROM b
          WHERE b.doc_id = a.doc_id AND b.pos > a.pos) AS e
  FROM a),
w AS (
  SELECT doc_id, s FROM chain
  WHERE e IS NOT NULL AND e - s - 1 <= 5
    AND NOT EXISTS (
      SELECT 1 FROM toks x
      WHERE x.doc_id = chain.doc_id AND x.tok = 'sort'
        AND x.pos BETWEEN chain.s AND chain.e))
SELECT doc_id, count(*)::BIGINT AS n_intervals, min(s)::BIGINT AS first_start
FROM w GROUP BY doc_id ORDER BY doc_id
""",
        "hits": """
WITH n AS (SELECT count(*)::BIGINT AS c FROM documents),
e AS (SELECT d.doc_id AS src,
             (d.doc_id * (48271 + j.j) + j.j * 1009) % (SELECT c FROM n) AS dst
      FROM documents d, (SELECT unnest(range(1, 14)) AS j) j
      WHERE j.j <= 1 + (d.doc_id % 13)),
h0 AS (SELECT doc_id, 1.0 / (SELECT c FROM n) AS v FROM documents),
a1r AS (SELECT e.dst AS doc_id, sum(h0.v) AS v
        FROM e JOIN h0 ON h0.doc_id = e.src GROUP BY e.dst),
a1 AS (SELECT doc_id, v / (SELECT sqrt(sum(v * v)) FROM a1r) AS v FROM a1r),
h1r AS (SELECT e.src AS doc_id, sum(a1.v) AS v
        FROM e JOIN a1 ON a1.doc_id = e.dst GROUP BY e.src),
h1 AS (SELECT doc_id, v / (SELECT sqrt(sum(v * v)) FROM h1r) AS v FROM h1r),
a2r AS (SELECT e.dst AS doc_id, sum(h1.v) AS v
        FROM e JOIN h1 ON h1.doc_id = e.src GROUP BY e.dst),
a2 AS (SELECT doc_id, v / (SELECT sqrt(sum(v * v)) FROM a2r) AS v FROM a2r),
h2r AS (SELECT e.src AS doc_id, sum(a2.v) AS v
        FROM e JOIN a2 ON a2.doc_id = e.dst GROUP BY e.src),
h2 AS (SELECT doc_id, v / (SELECT sqrt(sum(v * v)) FROM h2r) AS v FROM h2r),
ta AS (SELECT 'auth' AS kind, doc_id,
              CAST(round(v, 6) AS DOUBLE) AS score
       FROM a2 ORDER BY score DESC, doc_id LIMIT 20),
th AS (SELECT 'hub' AS kind, doc_id,
              CAST(round(v, 6) AS DOUBLE) AS score
       FROM h2 ORDER BY score DESC, doc_id LIMIT 20)
SELECT * FROM ta UNION ALL SELECT * FROM th
""",
        "trustrank": """
WITH n AS (SELECT count(*)::BIGINT AS c FROM documents),
e AS (SELECT d.doc_id AS src, 1 + (d.doc_id % 13) AS deg,
             (d.doc_id * (48271 + j.j) + j.j * 1009) % (SELECT c FROM n) AS dst
      FROM documents d, (SELECT unnest(range(1, 14)) AS j) j
      WHERE j.j <= 1 + (d.doc_id % 13)),
seeds AS (SELECT count(*)::DOUBLE AS sc FROM documents WHERE source = 'src7'),
v AS (SELECT doc_id,
             (CASE WHEN source = 'src7' THEN 1.0 ELSE 0.0 END)
               / (SELECT sc FROM seeds) AS v
      FROM documents),
p0 AS (SELECT doc_id, v AS pr FROM v),
p1 AS (SELECT d.doc_id, 0.15 * v.v + 0.85 * coalesce(s.x, 0) AS pr
       FROM documents d JOIN v ON v.doc_id = d.doc_id LEFT JOIN (
         SELECT e.dst AS doc_id, sum(p.pr / e.deg) AS x
         FROM e JOIN p0 p ON p.doc_id = e.src GROUP BY e.dst) s
       ON s.doc_id = d.doc_id),
p2 AS (SELECT d.doc_id, 0.15 * v.v + 0.85 * coalesce(s.x, 0) AS pr
       FROM documents d JOIN v ON v.doc_id = d.doc_id LEFT JOIN (
         SELECT e.dst AS doc_id, sum(p.pr / e.deg) AS x
         FROM e JOIN p1 p ON p.doc_id = e.src GROUP BY e.dst) s
       ON s.doc_id = d.doc_id),
p3 AS (SELECT d.doc_id, 0.15 * v.v + 0.85 * coalesce(s.x, 0) AS pr
       FROM documents d JOIN v ON v.doc_id = d.doc_id LEFT JOIN (
         SELECT e.dst AS doc_id, sum(p.pr / e.deg) AS x
         FROM e JOIN p2 p ON p.doc_id = e.src GROUP BY e.dst) s
       ON s.doc_id = d.doc_id)
SELECT doc_id, CAST(round((pr * (SELECT c FROM n))::DOUBLE, 6) AS DOUBLE) AS score
FROM p3 ORDER BY score DESC, doc_id LIMIT 100
""",
        "anchor_terms": """
WITH n AS (SELECT count(*)::BIGINT AS c FROM documents),
e AS (SELECT d.doc_id AS src,
             (d.doc_id * (48271 + j.j) + j.j * 1009) % (SELECT c FROM n) AS dst
      FROM documents d, (SELECT unnest(range(1, 14)) AS j) j
      WHERE j.j <= 1 + (d.doc_id % 13)),
lists AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'), x -> x <> '') AS l
  FROM documents),
first3 AS (SELECT doc_id, unnest(l[1:3]) AS term FROM lists WHERE len(l) > 0),
anchors AS (SELECT e.dst AS doc_id, f.term
            FROM e JOIN first3 f ON f.doc_id = e.src),
cnts AS (SELECT doc_id, term, count(*)::BIGINT AS cnt
         FROM anchors GROUP BY doc_id, term),
ranked AS (SELECT doc_id, term, cnt,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY cnt DESC, term) AS rn
           FROM cnts)
SELECT doc_id, term, cnt FROM ranked WHERE rn = 1 ORDER BY doc_id
""",
        "readability": """
WITH raw AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '[0-9a-z_]+'))::BIGINT AS words,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT AS sentences,
         len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS syllables
  FROM documents)
SELECT doc_id, words, sentences, syllables,
       CAST(round(206.835
                  - 1.015 * (greatest(words, 1)::DOUBLE / sentences)
                  - 84.6 * (syllables::DOUBLE / greatest(words, 1)), 4)
            AS DOUBLE) AS flesch
FROM raw ORDER BY doc_id
""",
        "ft_rank_boost": f"""
WITH {TOKS_CTE}, {DL_CTE}, {STATS_CTE}, {NORMVALS_CTE}, {DLQ_CTE},
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM toks
       WHERE tok IN ('data', 'merge') GROUP BY doc_id, tok),
dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.dc - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dlq.dlq) / (stats.sttf / stats.dc))) AS s
  FROM tf JOIN dfx ON dfx.tok = tf.tok JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats),
cand AS (SELECT doc_id, sum(s) AS bm25 FROM contrib GROUP BY doc_id
         ORDER BY bm25 DESC, doc_id LIMIT 50),
n AS (SELECT count(*)::BIGINT AS c FROM documents),
e AS (SELECT d.doc_id AS src, 1 + (d.doc_id % 13) AS deg,
             (d.doc_id * (48271 + j.j) + j.j * 1009) % (SELECT c FROM n) AS dst
      FROM documents d, (SELECT unnest(range(1, 14)) AS j) j
      WHERE j.j <= 1 + (d.doc_id % 13)),
p0 AS (SELECT doc_id, 1.0 / (SELECT c FROM n) AS pr FROM documents),
p1 AS (SELECT d.doc_id, 0.15 / (SELECT c FROM n) + 0.85 * coalesce(s.x, 0) AS pr
       FROM documents d LEFT JOIN (
         SELECT e.dst AS doc_id, sum(p.pr / e.deg) AS x
         FROM e JOIN p0 p ON p.doc_id = e.src GROUP BY e.dst) s
       USING (doc_id)),
p2 AS (SELECT d.doc_id, 0.15 / (SELECT c FROM n) + 0.85 * coalesce(s.x, 0) AS pr
       FROM documents d LEFT JOIN (
         SELECT e.dst AS doc_id, sum(p.pr / e.deg) AS x
         FROM e JOIN p1 p ON p.doc_id = e.src GROUP BY e.dst) s
       USING (doc_id)),
p3 AS (SELECT d.doc_id, 0.15 / (SELECT c FROM n) + 0.85 * coalesce(s.x, 0) AS pr
       FROM documents d LEFT JOIN (
         SELECT e.dst AS doc_id, sum(p.pr / e.deg) AS x
         FROM e JOIN p2 p ON p.doc_id = e.src GROUP BY e.dst) s
       USING (doc_id))
SELECT cand.doc_id,
       CAST(round(cand.bm25 * (1 + ln(1 + p3.pr * (SELECT c FROM n))), 4)
            AS DOUBLE) AS score
FROM cand JOIN p3 ON p3.doc_id = cand.doc_id
ORDER BY score DESC, cand.doc_id LIMIT 10
""",
        "ft_span_or": """
WITH lists AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'), x -> x <> '') AS l
  FROM documents),
toks AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM lists),
m AS (
  SELECT t1.doc_id
  FROM toks t1 JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
  WHERE t1.tok = 'batch' AND t2.tok = 'stream'
  UNION ALL
  SELECT t1.doc_id
  FROM toks t1 JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
  WHERE t1.tok = 'data' AND t2.tok = 'merge')
SELECT doc_id, count(*)::BIGINT AS span_freq FROM m GROUP BY doc_id
""",
        "dsir_select": """
WITH toks AS (SELECT doc_id, tok FROM (SELECT doc_id,
    unnest(regexp_split_to_array(lower(text), '[^0-9a-z_]+')) AS tok
    FROM documents) WHERE tok <> ''),
b AS (SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT) % 1024 AS bkt
      FROM toks),
tgt AS (SELECT bkt, count(*)::DOUBLE AS c FROM b
        JOIN documents USING (doc_id) WHERE source = 'src7' GROUP BY bkt),
raw AS (SELECT bkt, count(*)::DOUBLE AS c FROM b GROUP BY bkt),
tots AS (SELECT coalesce((SELECT sum(c) FROM tgt), 0) AS tc,
                (SELECT sum(c) FROM raw) AS rc),
lr AS (SELECT r.bkt,
              ln(((coalesce(t.c, 0) + 0.5) / ((SELECT tc FROM tots) + 0.5 * 1024))
                 / ((r.c + 0.5) / ((SELECT rc FROM tots) + 0.5 * 1024))) AS lr
       FROM raw r LEFT JOIN tgt t USING (bkt)),
lw AS (SELECT d.doc_id, coalesce(s.x, 0) AS lw
       FROM documents d LEFT JOIN (
         SELECT b.doc_id, sum(lr.lr) AS x FROM b JOIN lr USING (bkt)
         GROUP BY b.doc_id) s
       USING (doc_id)),
keyd AS (SELECT doc_id, lw,
                lw + (-ln(-ln((CAST(('0x' || substr(md5('s42-' ||
                      CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) + 0.5)
                      / 4294967296.0))) AS k
         FROM lw)
SELECT doc_id, CAST(round(lw, 4) AS DOUBLE) AS logw
FROM keyd ORDER BY k DESC, doc_id LIMIT 100
""",
        "ft_multivalue_phrase": r"""
WITH v0 AS (
  SELECT doc_id, unnest(arr) AS val,
         unnest(generate_series(1, len(arr))) AS vidx
  FROM (SELECT doc_id, regexp_split_to_array(text, '\.') AS arr
        FROM documents)),
t0 AS (
  SELECT doc_id, vidx, unnest(arr) AS tok,
         unnest(generate_series(1, len(arr))) AS ord0
  FROM (SELECT doc_id, vidx,
               regexp_split_to_array(lower(val), '[^0-9a-z_]+') AS arr
        FROM v0)),
t AS (SELECT doc_id, vidx, tok,
             row_number() OVER (PARTITION BY doc_id, vidx ORDER BY ord0) - 1
               AS pos
      FROM t0 WHERE tok <> ''),
m AS (SELECT a.doc_id, count(*)::BIGINT AS freq
      FROM t a JOIN t b
        ON b.doc_id = a.doc_id AND b.vidx = a.vidx AND b.pos = a.pos + 1
      WHERE a.tok = 'data' AND b.tok = 'merge'
      GROUP BY a.doc_id)
SELECT doc_id, freq FROM m ORDER BY doc_id
""",
        "ft_span_first": r"""
WITH t0 AS (
  SELECT doc_id, unnest(arr) AS tok,
         unnest(generate_series(1, len(arr))) AS ord0
  FROM (SELECT doc_id,
               regexp_split_to_array(lower(text), '[^0-9a-z_]+') AS arr
        FROM documents)
),
t AS (SELECT doc_id, tok,
             row_number() OVER (PARTITION BY doc_id ORDER BY ord0) - 1 AS pos
      FROM t0 WHERE tok <> '')
SELECT doc_id, min(pos)::BIGINT AS first_pos
FROM t WHERE tok = 'data'
GROUP BY doc_id HAVING min(pos) + 1 <= 3 ORDER BY doc_id
""",
        "ft_facet_taxonomy": """
WITH toks AS (SELECT doc_id, tok FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^0-9a-z_]+')) AS tok FROM documents) WHERE tok <> ''),
m AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'data'),
md AS (SELECT d.source, d.lang FROM documents d JOIN m ON m.doc_id = d.doc_id)
SELECT path, n FROM (
  SELECT source AS path, count(*)::BIGINT AS n FROM md GROUP BY source
  UNION ALL
  SELECT source || '/' || lang AS path, count(*)::BIGINT AS n
  FROM md GROUP BY source, lang
) ORDER BY n DESC, path
""",
        "geo_knn": """
WITH pts AS (
  SELECT event_id, user_id,
         (user_id * 7919 % 12000) / 100.0 - 60.0 AS lat,
         (user_id * 104729 % 36000) / 100.0 - 180.0 AS lon
  FROM events),
d AS (
  SELECT event_id, user_id,
         2.0 * 6371.0 * asin(sqrt(
             pow(sin((radians(12.34) - radians(lat)) / 2), 2)
           + cos(radians(lat)) * cos(radians(12.34))
             * pow(sin((radians(56.78) - radians(lon)) / 2), 2)
         )) AS dist
  FROM pts)
SELECT event_id, user_id, CAST(round(dist, 4) AS DOUBLE) AS dist_km
FROM d ORDER BY dist, event_id LIMIT 10
""",
        "geo_bbox": """
WITH pts AS (
  SELECT event_type,
         (user_id * 7919 % 12000) / 100.0 - 60.0 AS lat,
         (user_id * 104729 % 36000) / 100.0 - 180.0 AS lon
  FROM events)
SELECT event_type, count(*)::BIGINT AS n
FROM pts
WHERE lat >= 0 AND lat < 30 AND lon >= -90 AND lon < 0
GROUP BY event_type ORDER BY n DESC, event_type
""",
        "boilerplate": r"""
WITH aug AS (
  SELECT doc_id, source,
         text || '.footer promo ' || source ||
         CASE WHEN doc_id % 3 = 0 THEN '.subscribe newsletter'
              ELSE '' END AS text
  FROM documents),
u AS (
  SELECT doc_id, source,
         unnest(regexp_split_to_array(text, '\.')) AS sent,
         unnest(generate_series(1, len(regexp_split_to_array(text, '\.')))) AS ord
  FROM aug),
ns AS (SELECT source, count(*)::DOUBLE AS n_docs FROM aug GROUP BY source),
df AS (SELECT source, sent, count(DISTINCT doc_id)::DOUBLE AS df
       FROM u GROUP BY source, sent),
freq AS (SELECT d.source, d.sent FROM df d JOIN ns ON ns.source = d.source
         WHERE d.df >= greatest(2, ceil(0.05 * ns.n_docs))),
marked AS (SELECT u.doc_id, u.sent, u.ord,
                  (f.sent IS NOT NULL) AS dropped
           FROM u LEFT JOIN freq f
             ON f.source = u.source AND f.sent = u.sent)
SELECT a.doc_id,
       coalesce(string_agg(CASE WHEN NOT m.dropped THEN m.sent END,
                           '.' ORDER BY m.ord), '') AS clean_text,
       sum(CASE WHEN m.dropped THEN 1 ELSE 0 END)::BIGINT AS n_removed
FROM aug a JOIN marked m ON m.doc_id = a.doc_id
GROUP BY a.doc_id ORDER BY a.doc_id
""",
        "cluster_topics": f"""
WITH {TOKS_CTE},
c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
      FROM embeddings WHERE vec_id < 4),
d AS (SELECT e.vec_id, c.cid,
             list_distance(e.embedding::DOUBLE[], c.ce) AS dist
      FROM embeddings e CROSS JOIN c),
lab AS (SELECT vec_id, cid AS cluster FROM (
          SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY dist, cid) AS rn
          FROM d) WHERE rn = 1),
dtok AS (SELECT DISTINCT doc_id, tok FROM toks),
fg AS (SELECT l.cluster, d.tok, count(*)::DOUBLE AS df_fg
       FROM dtok d JOIN lab l ON l.vec_id = d.doc_id
       GROUP BY l.cluster, d.tok),
alltok AS (SELECT tok, sum(df_fg) AS df_all FROM fg GROUP BY tok),
nn AS (SELECT cluster, count(*)::DOUBLE AS n_fg FROM lab GROUP BY cluster),
tot AS (SELECT sum(n_fg) AS n_all FROM nn),
s AS (SELECT fg.cluster, fg.tok, fg.df_fg, a.df_all,
             (fg.df_fg / nn.n_fg - a.df_all / tot.n_all)
               * (fg.df_fg / nn.n_fg) / (a.df_all / tot.n_all) AS score
      FROM fg JOIN alltok a ON a.tok = fg.tok
      JOIN nn ON nn.cluster = fg.cluster CROSS JOIN tot),
r AS (SELECT *, row_number() OVER (PARTITION BY cluster
                                   ORDER BY score DESC, tok) AS rn
      FROM s)
SELECT cluster::BIGINT AS cluster, tok AS term, df_fg::BIGINT AS df_fg,
       df_all::BIGINT AS df_all, CAST(round(score, 6) AS DOUBLE) AS score
FROM r WHERE rn <= 5 ORDER BY cluster, score DESC, term
""",
        "cluster_assign": """
WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
           FROM embeddings WHERE vec_id < 4),
d AS (SELECT e.vec_id, c.cid,
             list_distance(e.embedding::DOUBLE[], c.ce) AS dist
      FROM embeddings e CROSS JOIN c),
r AS (SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      FROM d)
SELECT vec_id, cid::INTEGER AS cluster FROM r WHERE rn = 1 ORDER BY vec_id
""",
    }
    # corpus_export: shard the word-count keep verdicts into the same
    # contiguous 100-row slices the resumable exporter writes (doc_id
    # is the file row order in the testdata tables)
    sql["corpus_export"] = r"""
WITH o AS (
  SELECT len(list_filter(string_split_regex(coalesce(text, ''), '\s+'),
             x -> x <> '')) >= 40 AS keep,
         (row_number() OVER (ORDER BY doc_id) - 1) // 100 AS shard
  FROM documents)
SELECT shard::BIGINT AS shard, count(*)::BIGINT AS n_in,
       sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_out
FROM o GROUP BY shard ORDER BY shard
"""
    # registry-served suffix dedup is output-identical to the fresh
    # pipeline over the same corpus — same oracle by construction
    sql["dedup_suffix_append"] = sql["dedup_suffix"]
    # at-rest SQ8 serving reconstructs with the same arithmetic
    sql["ann_sq8_stored"] = sql["ann_sq8"]
    return sql
