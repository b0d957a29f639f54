"""Percolation — reverse search (Lucene ``monitor`` module /
Elasticsearch percolator analog): a REGISTERED set of boolean queries
is matched against a stream of documents, emitting (query_id, doc_id)
pairs. The dual of the index: queries are the stored side, documents
are the probe side.

Ray shape: the compiled query set is broadcast once (``ray.put``) and
shared zero-copy by every actor; each batch builds ONE docs x
needed-terms presence matrix from the analyzed token codes and
evaluates every query as vectorized boolean reductions over its
columns — no per-document Python loop, no index build. At 100 TB this
is a single streaming pass. The Lucene-monitor refinement is built in:
queries are indexed by their single rarest required term (or all
SHOULD terms when no requirement exists), so each query is only
evaluated against the DOCS containing its trigger — per-doc candidate
sets stay ≪ Q even when the batch's vocabulary overlaps many queries
(``doc_evals`` / ``doc_evals_possible`` counters prove it).

Reference tie-in: the forward path is SimpleFDBDirectoryTest.java's
TermQuery search (149-158); percolation evaluates the same
BooleanQuery semantics (J2) with roles reversed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from fdblucene_ray.analysis.analyzer import BatchTokenizer


def compile_queries(
    queries: list[dict],
    analyzer: str = "simple",
    *,
    default_field: str = "text",
    field_analyzers: dict[str, str] | None = None,
) -> list[dict]:
    """Normalize registered queries: analyze each clause term with the
    SAME chain the documents get (a stored query matches exactly like
    its forward-search twin). Clause keys: must / should / must_not /
    min_should (Lucene BooleanQuery occurs + minimumNumberShouldMatch).

    Multi-field: a clause string may carry a ``field:`` prefix
    (``"url:example"``, ``'phrases': ["title:a b"]``); bare clauses use
    ``default_field``. ``field_analyzers`` overrides the analyzer per
    field (e.g. keyword fields); clauses normalize to (field, term)
    pairs.
    """
    from fdblucene_ray.analysis.analyzer import get_analyzer

    chains = {
        default_field: (
            get_analyzer(analyzer) if analyzer != "keyword" else "keyword"
        )
    }
    for f, a in (field_analyzers or {}).items():
        chains[f] = get_analyzer(a) if a != "keyword" else "keyword"

    def split_field(s: str) -> tuple[str, str]:
        if ":" in s:
            f, rest = s.split(":", 1)
            if f in chains:
                return f, rest
        return default_field, s

    def toks(field: str, text: str) -> list[str]:
        chain = chains[field]
        if chain == "keyword":
            return [text]
        return chain.tokens(text)

    def norm(terms):
        out = []
        for t in terms or []:
            f, body = split_field(t)
            out.extend((f, tok) for tok in toks(f, body))
        return sorted(set(out))

    compiled = []
    for q in queries:
        must, should = norm(q.get("must")), norm(q.get("should"))
        phrases = []
        for p in q.get("phrases") or []:
            f, body = split_field(p)
            tl = toks(f, body)
            if tl:
                phrases.append((f, tl))
        if not (must or should or phrases):
            raise ValueError(f"query needs >=1 positive clause: {q!r}")
        compiled.append(
            {
                "must": must,
                "should": should,
                "must_not": norm(q.get("must_not")),
                "min_should": int(q.get("min_should", 0)),
                # phrase clauses are MUST: contiguous in the analyzed
                # (post-filter) token stream — identical to Lucene
                # PhraseQuery for analyzers without stopword removal
                "phrases": phrases,
            }
        )
    return compiled


def save_queries(path: str, compiled: list[dict]) -> int:
    """Persist a compiled query set (Lucene monitor durability: the
    registered-query index survives restarts). One JSON document per
    query in a single-column parquet — atomic temp+rename publish, so
    a reader never sees a torn set. Returns the number saved."""
    import json
    import os

    import pyarrow.parquet as pq

    t = pa.table(
        {
            "query_id": pa.array(range(len(compiled)), pa.int64()),
            "query_json": pa.array(
                [json.dumps(q, sort_keys=True) for q in compiled],
                pa.string(),
            ),
        }
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return len(compiled)


def load_queries(path: str) -> list[dict]:
    """Reload a persisted compiled query set (tuple-shape restored:
    clause lists back to (field, term) tuples, phrases to
    (field, [terms]))."""
    import json

    import pyarrow.parquet as pq

    t = pq.read_table(path).sort_by("query_id")
    out = []
    for s in t["query_json"].to_pylist():
        q = json.loads(s)
        for key in ("must", "should", "must_not"):
            q[key] = [tuple(x) for x in q.get(key, [])]
        q["phrases"] = [(f, list(tl)) for f, tl in q.get("phrases", [])]
        out.append(q)
    return out


def query_term_dfs(
    index_dir: str, compiled: list[dict]
) -> dict[tuple[str, str], int]:
    """Document frequency of every REQUIRED term the compiled queries
    mention, looked up in an existing index over the same corpus —
    point lookups in the lazy term dictionary, one per distinct term,
    never a vocabulary scan. Feed the result to ``percolate(df=...)``
    so trigger selection uses true corpus rarity."""
    from fdblucene_ray.index.search import Searcher

    s = Searcher(index_dir)
    needed = sorted(
        {ft for q in compiled for ft in q["must"]}
        | {(f, t) for q in compiled for f, p in q.get("phrases", [])
           for t in p}
    )
    return {(f, t): s.term_stats(f, t)[0] for f, t in needed}


class Percolator:
    """map_batches actor: presence-matrix evaluation of the broadcast
    query set. Emits one (query_id, doc_id) row per match."""

    def __init__(self, queries_ref, analyzer="simple",
                 text_col="text", id_col="doc_id",
                 field_cols: dict[str, tuple[str, str]] | None = None,
                 df_ref=None):
        """``field_cols``: field name -> (batch column, analyzer) for
        multi-field queries; defaults to one field named "text" bound
        to ``text_col`` with ``analyzer`` (the single-field case).

        ``df_ref``: optional {(field, term): document_frequency} map
        (dict or ``ray.put`` ref) from a real index over the same
        corpus — trigger selection then picks each query's TRUE rarest
        required term (Lucene monitor's ``TermFilteredPresearcher``
        with index-backed term weighting) instead of the token-length
        heuristic. Terms absent from the map get df=0 (never seen in
        the corpus → the best possible trigger)."""
        qs = (
            ray.get(queries_ref)
            if not isinstance(queries_ref, list)
            else queries_ref
        )
        df_map = (
            ray.get(df_ref)
            if df_ref is not None and not isinstance(df_ref, dict)
            else df_ref
        )
        self.queries = qs
        self.id_col = id_col
        self.field_cols = field_cols or {"text": (text_col, analyzer)}
        self.tokenizers = {
            f: (None if a == "keyword" else BatchTokenizer(a))
            for f, (_, a) in self.field_cols.items()
        }
        needed = sorted(
            {ft for q in qs for k in ("must", "should", "must_not")
             for ft in q[k]}
            | {(f, t) for q in qs for f, p in q.get("phrases", [])
               for t in p}
        )
        for f, _ in needed:
            if f not in self.field_cols:
                raise ValueError(f"query field {f!r} not in field_cols")
        self.term_col = {ft: i for i, ft in enumerate(needed)}
        # monitor-layer query index (Lucene monitor's term-indexed
        # queries, re-derived): each query registers under its SINGLE
        # rarest required term when it has MUST/phrase clauses (every
        # match must contain it, so one trigger suffices — and a rare
        # trigger keeps the candidate set tiny), or under ALL its
        # SHOULD terms otherwise (a match needs >=1 of them). Rarity:
        # with ``df_ref``, the term with the LOWEST corpus document
        # frequency; without stats, the longest token, ties broken
        # lexicographically-last (Lucene's monitor defaults to the
        # same token-length weighting absent index stats).
        # self._qtrig[qid] = the trigger columns restricting WHICH DOCS
        # the query is evaluated against (per-doc pruning, not just
        # per-batch).
        self._trigger: dict[int, list[int]] = {}
        self._qtrig: list[list[int]] = []
        for qid, q in enumerate(qs):
            req = (
                q["must"]
                + [(f, t) for f, p in q.get("phrases", []) for t in p]
            )
            if req:
                if df_map is not None:
                    # true-rarest: min df; ties fall back to the
                    # length heuristic for determinism
                    trig = [min(
                        set(req),
                        key=lambda ft: (
                            df_map.get(ft, 0), -len(ft[1]), ft[1]
                        ),
                    )]
                else:
                    trig = [max(
                        set(req), key=lambda ft: (len(ft[1]), ft[1])
                    )]
            else:
                trig = sorted(set(q["should"]))
            cols = [self.term_col[ft] for ft in trig]
            self._qtrig.append(cols)
            for c in cols:
                self._trigger.setdefault(c, []).append(qid)
        # per-actor pruning counters (tests/diagnostics): queries
        # skipped/evaluated per batch, and (query, doc) pairs actually
        # evaluated vs the exhaustive Q x n_docs
        self.evaluated = 0
        self.skipped = 0
        self.doc_evals = 0
        self.doc_evals_possible = 0

    def _tokenize(self, batch: pa.Table, field: str):
        col, _ = self.field_cols[field]
        tok = self.tokenizers[field]
        if tok is None:  # keyword field: one verbatim token per row
            c = batch[col]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            dct = c.dictionary_encode()
            codes = dct.indices.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            vocab = dct.dictionary.to_pylist()
            return np.arange(len(codes), dtype=np.int64), codes, vocab
        return tok.encoded_tokens(batch[col])

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        ncol = len(self.term_col)
        pres = np.zeros((n, ncol), bool)
        streams = {}  # field -> (row_idx, codes, vocab_code)
        for f in self.field_cols:
            if not any(ft[0] == f for ft in self.term_col):
                continue
            row_idx, codes, vocab = self._tokenize(batch, f)
            streams[f] = (row_idx, codes, {t: c for c, t in enumerate(vocab)})
            if len(codes):
                code_col = np.full(max(1, len(vocab)), -1, np.int64)
                for vi, term in enumerate(vocab):
                    code_col[vi] = self.term_col.get((f, term), -1)
                cols = code_col[codes]
                hit = cols >= 0
                pres[row_idx[hit], cols[hit]] = True
        # monitor-style pruning: a query can only match if at least one
        # of its POSITIVE terms occurs somewhere in the batch — with
        # millions of registered queries most are skipped in O(1) here
        # (the full Lucene-monitor refinement indexes the queries; this
        # batch-vocabulary gate is its first, cheapest layer)
        present = pres.any(axis=0)

        def phrase_rows(field: str, toks: list[str]) -> np.ndarray:
            """Bool mask of rows containing the phrase contiguously —
            shifted equality over the field's flat code stream."""
            out = np.zeros(n, bool)
            if field not in streams:
                return out
            row_idx, codes, vocab_code = streams[field]
            pc_ = [vocab_code.get(t) for t in toks]
            m_ = len(pc_)
            if any(c is None for c in pc_) or len(codes) < m_:
                return out
            w = len(codes) - m_ + 1
            ok = np.ones(w, bool)
            for j, c in enumerate(pc_):
                ok &= codes[j : j + w] == c
            ok &= row_idx[:w] == row_idx[m_ - 1 :]
            out[np.unique(row_idx[:w][ok])] = True
            return out

        phrase_cache: dict[tuple, np.ndarray] = {}
        out_q, out_d = [], []
        cand_qids = sorted(
            {
                qid
                for c in np.nonzero(present)[0].tolist()
                for qid in self._trigger.get(c, ())
            }
        )
        self.skipped += len(self.queries) - len(cand_qids)
        self.doc_evals_possible += n * len(self.queries)
        for qid in cand_qids:
            q = self.queries[qid]
            # gate for conjunctions: EVERY required term (MUST clauses
            # and phrase tokens) must occur somewhere in the batch,
            # else no doc can match
            required_terms = q["must"] + [
                (f, t) for f, p in q.get("phrases", []) for t in p
            ]
            if any(not present[self.term_col[t]] for t in required_terms):
                self.skipped += 1
                continue
            self.evaluated += 1
            # per-DOC candidates (the monitor refinement): evaluate the
            # query ONLY against rows containing its trigger term(s) —
            # any other row cannot match by construction
            tc = self._qtrig[qid]
            rows = np.nonzero(
                pres[:, tc[0]] if len(tc) == 1 else pres[:, tc].any(axis=1)
            )[0]
            self.doc_evals += len(rows)
            if not len(rows):
                continue
            sub = pres[rows]
            m = np.ones(len(rows), bool)
            for t in q["must"]:
                m &= sub[:, self.term_col[t]]
            if q["should"]:
                n_should = np.zeros(len(rows), np.int64)
                for t in q["should"]:
                    n_should += sub[:, self.term_col[t]]
                required = q["must"] or q.get("phrases")
                bar = q["min_should"] if required else max(1, q["min_should"])
                if bar > 0:
                    m &= n_should >= bar
            for t in q["must_not"]:
                m &= ~sub[:, self.term_col[t]]
            for f, toks in q.get("phrases", []):
                key = (f, tuple(toks))
                if key not in phrase_cache:
                    phrase_cache[key] = phrase_rows(f, toks)
                m &= phrase_cache[key][rows]
            sel = rows[np.nonzero(m)[0]]
            out_q.append(np.full(len(sel), qid, np.int64))
            out_d.append(ids[sel].astype(np.int64))
        return pa.table(
            {
                "query_id": pa.array(
                    np.concatenate(out_q) if out_q else
                    np.empty(0, np.int64)
                ),
                "doc_id": pa.array(
                    np.concatenate(out_d) if out_d else
                    np.empty(0, np.int64)
                ),
            }
        )



def _percolate_batch(batch, *, queries_ref, analyzer, text_col, id_col,
                     field_cols, df_ref):
    """Task wrapper: per-worker cached Percolator keyed by the broadcast
    query set's ObjectRef — or, for a PERSISTED monitor, by the saved
    query file's (path, size, mtime). The trigger-term index builds
    once per worker either way; tasks start on the warm pool (no actor
    spin-up), and a restarted monitor re-serves straight from the
    ``save_queries`` artifact without recompiling on the driver."""
    from fdblucene_ray.ops.broadcast import cached_state

    fc_key = tuple(sorted(field_cols.items())) if field_cols else None
    if isinstance(queries_ref, str):
        import os

        stt = os.stat(queries_ref)
        qkey = (queries_ref, stt.st_size, stt.st_mtime_ns)

        def make():
            return Percolator(
                load_queries(queries_ref), analyzer=analyzer,
                text_col=text_col, id_col=id_col,
                field_cols=field_cols, df_ref=df_ref,
            )
    else:
        qkey = queries_ref.hex()

        def make():
            return Percolator(
                queries_ref, analyzer=analyzer, text_col=text_col,
                id_col=id_col, field_cols=field_cols, df_ref=df_ref,
            )

    st = cached_state(
        ("percolator", qkey,
         df_ref.hex() if df_ref is not None else None,
         analyzer, text_col, id_col, fc_key),
        make,
    )
    return st(batch)


def percolate(
    ds: ray.data.Dataset,
    queries: list[dict] | str,
    *,
    analyzer: str = "simple",
    text_col: str = "text",
    id_col: str = "doc_id",
    field_cols: dict[str, tuple[str, str]] | None = None,
    df: dict[tuple[str, str], int] | str | None = None,
) -> ray.data.Dataset:
    """Match every registered query against every document; returns a
    Dataset of (query_id, doc_id) pairs (query ids = positions in
    ``queries``). ``field_cols`` enables multi-field clauses
    (``"url:..."``): field name -> (batch column, analyzer).

    ``queries`` may be raw query dicts (compiled here) or the PATH of
    a ``save_queries`` artifact — the persisted-monitor serving mode:
    the driver never touches the (possibly 100k+) query set; each
    worker loads and compiles the trigger index ONCE (cached_state
    keyed on the file's identity) and every subsequent batch reuses it.

    ``df``: corpus document frequencies for trigger selection — a
    {(field, term): df} map, or an INDEX DIR over the same corpus (the
    required terms' dfs are point-looked-up there); None keeps the
    stats-free token-length heuristic."""
    if isinstance(queries, str):
        if isinstance(df, str):
            df = query_term_dfs(df, load_queries(queries))
        dref = ray.put(df) if df is not None else None
        return ds.map_batches(
            _percolate_batch,
            fn_kwargs=dict(
                queries_ref=queries, analyzer=analyzer,
                text_col=text_col, id_col=id_col, field_cols=field_cols,
                df_ref=dref,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    default_field = next(iter(field_cols)) if field_cols else "text"
    compiled = compile_queries(
        queries, analyzer, default_field=default_field,
        field_analyzers={f: a for f, (_, a) in (field_cols or {}).items()},
    )
    qref = ray.put(compiled)
    if isinstance(df, str):
        df = query_term_dfs(df, compiled)
    dref = ray.put(df) if df is not None else None
    return ds.map_batches(
        _percolate_batch,
        fn_kwargs=dict(
            queries_ref=qref, analyzer=analyzer,
            text_col=text_col, id_col=id_col, field_cols=field_cols,
            df_ref=dref,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
