"""High-level facade: the ergonomic surface a user of the reference
(`IndexWriter` / `IndexSearcher` over an `FDBDirectory`) would reach for.

    from fdblucene_ray.api import Index

    ix = Index.build("/data/webpages/*.parquet", "/shared/idx",
                     fields={"text": {"column": "text", "analyzer": "lucene"},
                             "url": {"column": "url", "analyzer": "keyword"}},
                     docstore_cols=["url", "lang"])
    hits = ix.search("hello everybody", k=10)           # BM25 WAND top-k
    hits = ix.search("a b", operator="and")             # conjunction
    hits = ix.boolean(must=["a"], must_not=["b"])       # BooleanQuery
    hits = ix.phrase("hello everybody")                 # PhraseQuery
    rows = ix.stored([d for d, _ in hits])              # stored fields
    ix2 = Index.merge([(ix, 0), (other, ix.num_docs)], out)  # addIndexes
"""

from __future__ import annotations

from fdblucene_ray.index.build import build_index, build_sharded, hydrate
from fdblucene_ray.index.manifest import Manifest, gc_index, load_manifest
from fdblucene_ray.index.merge import compact_index, merge_indexes, plan_tiered
from fdblucene_ray.index.search import Searcher


class Index:
    """An opened index snapshot (manifest-pinned, like DirectoryReader)."""

    def __init__(self, index_dir: str, *, k1: float = 1.2, b: float = 0.75,
                 mu: float = 2000.0, lam: float = 0.1,
                 version: int | None = None):
        self.index_dir = index_dir
        self.searcher = Searcher(index_dir, k1=k1, b=b, mu=mu, lam=lam,
                                 version=version)

    # ---- lifecycle ----
    @classmethod
    def build(cls, source, index_dir: str, **kw) -> "Index":
        build_index(source, index_dir, **kw)
        return cls(index_dir)

    @classmethod
    def build_sharded(cls, shards, index_dir: str, **kw) -> "Index":
        build_sharded(shards, index_dir, **kw)
        return cls(index_dir)

    def append(self, shards, **kw) -> "Index":
        """Multi-writer-safe shard append (manifest-CAS reserved doc-id
        ranges): independent driver processes may append concurrently
        to this index_dir and every append lands. See
        index/build.py append_shards."""
        from fdblucene_ray.index.build import append_shards

        append_shards(self.index_dir, shards, **kw)
        return self.refresh()

    def sync(self, input_dir: str, **kw) -> tuple:
        """One-shot incremental directory sync (index/sync.py): append
        every not-yet-ingested parquet file under ``input_dir``.
        Returns (manifest | None, ingested paths — including a
        replayed crash-recovery batch). Re-opens THIS handle at the
        new commit when anything was ingested."""
        from fdblucene_ray.index.sync import sync_index

        out = sync_index(self.index_dir, input_dir, **kw)
        if out[0] is not None:
            s = self.searcher
            self.searcher = Searcher(
                self.index_dir, k1=s.k1, b=s.b, mu=s.mu, lam=s.lam
            )
        return out

    @classmethod
    def merge(cls, sources, out_dir: str, **kw) -> "Index":
        srcs = [
            (s.index_dir if isinstance(s, Index) else s, base) for s, base in sources
        ]
        merge_indexes(srcs, out_dir, **kw)
        return cls(out_dir)

    def compact(self, out_dir: str, num_partitions: int) -> "Index":
        compact_index(self.index_dir, out_dir, num_partitions)
        return Index(out_dir)

    def refresh(self) -> "Index":
        """Re-open at the latest published manifest version."""
        return Index(self.index_dir)

    def at_version(self, version: int) -> "Index":
        """Open a retained commit point (point-in-time snapshot),
        keeping this reader's similarity knobs."""
        return Index(self.index_dir, k1=self.searcher.k1,
                     b=self.searcher.b, mu=self.searcher.mu,
                     lam=self.searcher.lam, version=version)

    def commits(self) -> list[int]:
        from fdblucene_ray.index.manifest import list_commits

        return list_commits(self.index_dir)

    def export(self, out_dir: str, version: int | None = None) -> "Index":
        """Clone this index at a commit point (snapshot export/backup)."""
        from fdblucene_ray.index.manifest import export_commit

        export_commit(self.index_dir, out_dir, version)
        return Index(out_dir)

    def diff(self, v_old: int, v_new: int) -> dict:
        """Metadata diff between two retained commits."""
        from fdblucene_ray.index.delete import diff_commits

        return diff_commits(self.index_dir, v_old, v_new)

    def gc(self) -> list[str]:
        return gc_index(self.index_dir)

    # ---- metadata ----
    @property
    def manifest(self) -> Manifest:
        return self.searcher.manifest

    @property
    def num_docs(self) -> int:
        return self.searcher.num_docs()

    def verify(self) -> None:
        for r in self.searcher.readers:
            r.verify()

    # ---- queries ----
    def search(self, query: str, k: int = 10, **kw):
        return self.searcher.search(query, k, **kw)

    def boolean(self, must=None, should=None, must_not=None, k: int = 10, **kw):
        return self.searcher.search_boolean(must, should, must_not, k, **kw)

    def phrase(self, phrase: str, k: int = 10, **kw):
        return self.searcher.search_phrase(phrase, k, **kw)

    def count(self, query: str, **kw) -> int:
        return self.searcher.count(query, **kw)

    def combined_fields(self, query: str, field_weights: dict, k: int = 10,
                        mode: str = "exhaustive"):
        """BM25F (CombinedFieldQuery analog); ``mode="wand"`` drives it
        with summed per-field block maxima (hash-identical hits)."""
        return self.searcher.search_combined_fields(
            query, field_weights, k, mode=mode
        )

    def query(self, q: str, k: int = 10, **kw):
        """Full parsed-query surface (QueryParser analog)."""
        return self.searcher.query(q, k, **kw)

    def parse_search(self, q: str, k: int = 10, **kw):
        """ONE unified Lucene-classic query string — mixes +/- occurs,
        field:, "phrase"~slop, ^boosts, wildcards/fuzzy/regexp AND
        explicit AND/OR/NOT with parentheses."""
        return self.searcher.search_query(q, k, **kw)

    def expr(self, q: str, k: int = 10, **kw):
        """Nested boolean expression: (a OR b) AND NOT c."""
        return self.searcher.search_expr(q, k, **kw)

    def rescore(self, query: str, rescore_phrase: str, k: int = 10, **kw):
        """Two-phase retrieval (QueryRescorer analog): BM25 window,
        phrase-rescored; see Searcher.rescore."""
        return self.searcher.rescore(query, rescore_phrase, k, **kw)

    def block_join(self, query: str, k: int = 10, **kw):
        """Nested-document parent join (ToParentBlockJoinQuery analog);
        see Searcher.search_block_join."""
        return self.searcher.search_block_join(query, k, **kw)

    def join(self, from_query: str, join_field: str, k: int = 10, **kw):
        """Query-time field join (JoinUtil.createJoinQuery analog);
        see Searcher.join_query."""
        return self.searcher.join_query(from_query, join_field, k, **kw)

    def span_first(self, term: str, end: int, **kw):
        """SpanFirstQuery analog: term within the first ``end``
        positions; see Searcher.search_span_first."""
        return self.searcher.search_span_first(term, end, **kw)

    def grouped(self, query: str, *, group_col: str, source, **kw):
        """TopGroups (GroupingSearch analog); see
        Searcher.search_grouped."""
        return self.searcher.search_grouped(
            query, group_col=group_col, source=source, **kw
        )

    def drill_sideways(self, query: str, *, dim_field: str,
                       drill_value: str, **kw):
        """DrillSideways: (drill-down hits, sideways facet counts);
        see Searcher.facet_drill_sideways."""
        return self.searcher.facet_drill_sideways(
            query, dim_field=dim_field, drill_value=drill_value, **kw
        )

    def facet_taxonomy(self, query: str, levels, *, value_source, **kw):
        """Hierarchical drill-down facet path counts; see
        Searcher.facet_taxonomy."""
        return self.searcher.facet_taxonomy(
            query, levels, value_source=value_source, **kw
        )

    def span_not(self, include: str, exclude: str, **kw):
        """SpanNotQuery analog; see Searcher.search_span_not."""
        return self.searcher.search_span_not(include, exclude, **kw)

    def span_or(self, phrases, **kw):
        """SpanOrQuery analog; see Searcher.search_span_or."""
        return self.searcher.search_span_or(phrases, **kw)

    def intervals(self, query: str, **kw):
        """Intervals query (o.a.l.queries.intervals analog); see
        Searcher.search_intervals."""
        return self.searcher.search_intervals(query, **kw)

    def multi_phrase(self, slots, k: int = 10, **kw):
        """MultiPhraseQuery analog (per-slot term alternatives)."""
        return self.searcher.search_multi_phrase(slots, k, **kw)

    def term_set(self, field: str, values):
        """TermInSetQuery analog (keyword membership filter)."""
        return self.searcher.search_term_set(field, values)

    def synonyms_multiword(self, groups, k: int = 10, **kw):
        """SynonymGraphFilter analog with multi-word members."""
        return self.searcher.search_synonyms_multiword(groups, k, **kw)

    def facet_sums(self, query: str, facet_field: str, **kw):
        """Facet associations (count + numeric sum per facet value)."""
        return self.searcher.facet_sums(query, facet_field, **kw)

    def check(self, level: str = "full"):
        """CheckIndex analog: distributed per-segment integrity report
        (index/check.py)."""
        from fdblucene_ray.index.check import check_index

        return check_index(self.index_dir, level=level)

    def feature_field(self, query: str, k: int = 10, **kw):
        """FeatureField saturation boost (additive rank feature)."""
        return self.searcher.search_feature_field(query, k, **kw)

    def distance_feature(self, query: str, k: int = 10, **kw):
        """DistanceFeatureQuery pivot-decay boost around an origin."""
        return self.searcher.search_distance_feature(query, k, **kw)

    def sort_multi(self, query: str, k: int = 10, **kw):
        """Multi-key Sort(SortField...) over streaming doc values."""
        return self.searcher.search_sort_multi(query, k, **kw)

    def stats(self, query: str, **kw) -> dict:
        """count/min/max/sum/avg of a doc-values column over the match
        set (StatsCollector analog)."""
        return self.searcher.stats_by(query, **kw)

    def term_stats(self, term: str, field: str = "text"):
        return self.searcher.term_stats(field, term)

    def stored(self, doc_ids, columns=None):
        return hydrate(self.index_dir, doc_ids, columns)

    def block_join_children(self, query: str, k_parents: int = 10, **kw):
        """ToChildBlockJoinQuery analog: children of the top matching
        parents, each carrying the parent's aggregated score."""
        return self.searcher.search_block_join_children(
            query, k_parents, **kw
        )

    def substring(self, needle: str, k: int = 25, *, source, **kw):
        """Infix search via char-trigram postings + exact verify
        (requires a trigram-signature field, analysis/trigram.py)."""
        return self.searcher.search_substring(
            needle, k, source=source, **kw
        )

    def update_docvalues(self, field: str, updates: dict) -> "Index":
        """In-place numeric doc-values update (updateNumericDocValue
        analog): publishes a dv generation, no reindex; returns a
        refreshed handle pinned to the new commit."""
        from fdblucene_ray.index.docvalues import update_numeric_docvalues

        update_numeric_docvalues(self.index_dir, field, updates)
        return self.refresh()




class VectorIndex:
    """Facade over the ANN index family (ops/similarity.py +
    ops/graphann.py): one persistent centroid- or bucket-partitioned
    layout, streaming appends, and every query path — IVF probe,
    Vamana graph beam search, exact brute force, nprobe auto-tune.

    >>> vi = VectorIndex.build_ivf(ds, "/idx", n_centroids=64)
    >>> vi.append(new_ds, batch_id="2026-08-20")
    >>> vi.topk(queries, qids, k=10, nprobe=4)
    """

    def __init__(self, index_dir: str, *, vec_col: str = "embedding",
                 id_col: str = "vec_id", kind: str = "ivf"):
        self.index_dir = index_dir
        self.vec_col, self.id_col = vec_col, id_col
        self.kind = kind  # "ivf" (also graph layouts) or "lsh"

    def _kw(self):
        return dict(vec_col=self.vec_col, id_col=self.id_col)

    @classmethod
    def build_ivf(cls, ds, index_dir: str, **kw) -> "VectorIndex":
        from fdblucene_ray.ops.similarity import build_ivf_index

        cols = {k: kw.pop(k) for k in ("vec_col", "id_col") if k in kw}
        build_ivf_index(ds, index_dir, **cols, **kw)
        return cls(index_dir, **cols)

    @classmethod
    def build_lsh(cls, ds, index_dir: str, **kw) -> "VectorIndex":
        from fdblucene_ray.ops.similarity import build_lsh_index

        cols = {k: kw.pop(k) for k in ("vec_col", "id_col") if k in kw}
        build_lsh_index(ds, index_dir, **cols, **kw)
        return cls(index_dir, **cols, kind="lsh")

    @classmethod
    def build_sq8(cls, ds, index_dir: str, **kw) -> "VectorIndex":
        from fdblucene_ray.ops.similarity import build_sq8_store

        cols = {k: kw.pop(k) for k in ("vec_col", "id_col") if k in kw}
        build_sq8_store(ds, index_dir, **cols, **kw)
        return cls(index_dir, **cols, kind="sq8")

    @classmethod
    def build_graph(cls, ds, index_dir: str, **kw) -> "VectorIndex":
        from fdblucene_ray.ops.graphann import build_graph_index

        cols = {k: kw.pop(k) for k in ("vec_col", "id_col") if k in kw}
        build_graph_index(ds, index_dir, **cols, **kw)
        return cls(index_dir, **cols)

    def append(self, ds, batch_id: str) -> bool:
        from fdblucene_ray.ops.similarity import (
            append_ivf_index,
            append_lsh_index,
        )

        if self.kind == "sq8":
            raise NotImplementedError(
                "append is not supported for the SQ8 code store — "
                "rebuild it (build_sq8_store is idempotent and cheap: "
                "one quantize pass) or keep floats in an IVF/LSH "
                "layout for streaming ingest"
            )
        fn = append_lsh_index if self.kind == "lsh" else append_ivf_index
        return fn(ds, self.index_dir, batch_id, **self._kw())

    def refresh_graphs(self, ds, **kw) -> None:
        from fdblucene_ray.ops.graphann import build_graph_index

        build_graph_index(ds, self.index_dir, refresh=True,
                          **self._kw(), **kw)

    def topk(self, queries, query_ids, k: int = 10, *, nprobe: int = 4):
        from fdblucene_ray.ops.similarity import (
            ivf_topk_indexed,
            lsh_topk_indexed,
            sq8_topk_stored,
        )

        if self.kind == "sq8":
            # code-store serving: full scan over 8-bit codes (4x less
            # I/O than floats); nprobe does not apply
            return sq8_topk_stored(
                self.index_dir, queries, query_ids, k=k,
                id_col=self.id_col,
            )
        fn = lsh_topk_indexed if self.kind == "lsh" else ivf_topk_indexed
        return fn(
            self.index_dir, queries, query_ids, k=k, nprobe=nprobe,
            **self._kw(),
        )

    def graph_topk(self, queries, query_ids, k: int = 10, *,
                   nprobe: int = 2, L_search: int = 48):
        from fdblucene_ray.ops.graphann import graph_topk_indexed

        return graph_topk_indexed(
            self.index_dir, queries, query_ids, k=k, nprobe=nprobe,
            L_search=L_search, **self._kw(),
        )

    def tune(self, queries, *, k: int = 10, target_recall: float = 0.95):
        from fdblucene_ray.ops.similarity import tune_nprobe

        return tune_nprobe(
            self.index_dir, queries, k=k, target_recall=target_recall,
            **self._kw(),
        )

    def maxsim_topk(self, ds, queries, *, k: int = 10,
                    nprobe: int = 4, per_token: int = 50,
                    doc_col: str = "doc"):
        """Indexed late-interaction serving (PLAID shape) over an IVF
        layout built from the EXPLODED multi-vector table (doc column
        carried through): per-query-token probes generate candidates,
        exact MaxSim reranks them (ops/similarity.maxsim_rerank_indexed)."""
        from fdblucene_ray.ops.similarity import maxsim_rerank_indexed

        return maxsim_rerank_indexed(
            ds, self.index_dir, queries, k=k, nprobe=nprobe,
            per_token=per_token, doc_col=doc_col, vec_col=self.vec_col,
        )


class Monitor:
    """Facade over the percolator (Lucene Monitor analog): register
    queries once, persist them, and stream documents through the
    trigger-indexed matcher.

    >>> mon = Monitor.register([{"must": ["alert", "urgent"]}],
    ...                        "/shared/monitor.parquet")
    >>> pairs = mon.match(ds)            # Dataset of (query_id, doc_id)
    >>> mon2 = Monitor("/shared/monitor.parquet")   # restart: no
    ...                                  # recompile, workers load once
    """

    def __init__(self, path: str, *, analyzer: str = "simple",
                 field_cols: dict | None = None):
        self.path = path
        self.analyzer = analyzer
        self.field_cols = field_cols

    @classmethod
    def register(cls, queries: list[dict], path: str, *,
                 analyzer: str = "simple",
                 field_cols: dict | None = None) -> "Monitor":
        from fdblucene_ray.ops.percolate import (
            compile_queries,
            save_queries,
        )

        default_field = next(iter(field_cols)) if field_cols else "text"
        compiled = compile_queries(
            queries, analyzer, default_field=default_field,
            field_analyzers={
                f: a for f, (_, a) in (field_cols or {}).items()
            },
        )
        save_queries(path, compiled)
        return cls(path, analyzer=analyzer, field_cols=field_cols)

    def queries(self) -> list[dict]:
        from fdblucene_ray.ops.percolate import load_queries

        return load_queries(self.path)

    def match(self, ds, *, text_col: str = "text",
              id_col: str = "doc_id", df=None):
        from fdblucene_ray.ops.percolate import percolate

        return percolate(
            ds, self.path, analyzer=self.analyzer, text_col=text_col,
            id_col=id_col, field_cols=self.field_cols, df=df,
        )


class DedupRegistry:
    """Facade over the incremental suffix-dedup registry
    (ops/suffix.py): build once, append new document batches (their
    bytes are suffix-seeded exactly once), query maximal duplicated
    spans or scrub them — Lee et al.'s exact-substring dedup as a
    maintained service.

    >>> reg = DedupRegistry.build(ds, "/shared/dedup-reg", min_len=50)
    >>> reg.append(new_docs, "2026-08-20")
    >>> spans = reg.dup_spans(full_corpus)     # Dataset of spans
    """

    def __init__(self, registry_dir: str):
        self.registry_dir = registry_dir

    @classmethod
    def build(cls, ds, registry_dir: str, **kw) -> "DedupRegistry":
        from fdblucene_ray.ops.suffix import build_suffix_registry

        build_suffix_registry(ds, registry_dir, **kw)
        return cls(registry_dir)

    def append(self, ds, batch_id: str, **kw) -> bool:
        from fdblucene_ray.ops.suffix import append_suffix_registry

        return append_suffix_registry(
            ds, self.registry_dir, batch_id, **kw
        )

    def dup_spans(self, corpus_ds, **kw):
        from fdblucene_ray.ops.suffix import suffix_dup_spans_registry

        return suffix_dup_spans_registry(
            corpus_ds, self.registry_dir, **kw
        )


__all__ = [
    "Index",
    "VectorIndex",
    "Monitor",
    "DedupRegistry",
    "Catalog",
    "build_index",
    "build_sharded",
    "merge_indexes",
    "compact_index",
    "plan_tiered",
    "Searcher",
    "load_manifest",
]


def __getattr__(name):  # lazy: Catalog pulls in build/search modules
    if name == "Catalog":
        from fdblucene_ray.index.catalog import Catalog

        return Catalog
    raise AttributeError(name)
