"""Scatter-gather search over DOC-sharded index snapshots.

The single-index engine term-shards its segments, so every query needs
all segments of one index; the cluster-scale layout is the opposite:
the corpus is split into N doc ranges, each range builds its own index
(``build_sharded`` / ``build_index(doc_base=...)``), and a fleet of
searcher actors each holds ONE shard. A query then runs the
distributed-frequency-search (DFS) query-then-fetch protocol every
doc-partitioned search engine uses (Elasticsearch `search_type=dfs_*`,
Solr distributed IDF, Lucene's original `MultiSearcher`):

  phase 0 (fleet init)   each shard reports its per-field totals
                         (docCount, sumDocLength); the driver sums them
                         once — these change only on refresh.
  phase 1 (per query)    each shard reports local (df, ttf) for the
                         query's terms from its term dictionary (a few
                         row-group reads, no postings); the driver sums.
  phase 2 (per query)    the summed GLOBAL stats are injected into each
                         shard's scorer (`Searcher.stats_override`), so
                         idf/avgdl are exactly what one merged index
                         would compute; each shard returns its local
                         top-k and the driver merges by
                         (score desc, doc_id asc).

Because a document lives in exactly one shard and per-doc scores are
sums over clauses in query order on BOTH paths, the merged result is
float-identical to ``Searcher.multi`` over the same dirs — which is
itself float-identical to one merged index (the ``addIndexes`` twin).
Reference tie-in: the reference delegates multi-reader search to
Lucene's MultiReader over FDBDirectory instances
(SimpleFDBDirectoryTest.java:152-155); this module is the same surface
re-expressed as a Ray actor fleet so the per-shard work (postings
decode, WAND) runs where the shard's data is.

Scale notes (100 TB): phase 1 ships |terms| ints per shard; phase 2
ships k (doc, score) pairs per shard — network cost is O(shards ×
(terms + k)), independent of corpus size. Shard actors hold only their
own term dictionaries + LRU-decoded blocks, so fleet memory is the sum
of per-shard working sets, and adding nodes adds shards 1:1.
"""

from __future__ import annotations

import heapq

import ray

from fdblucene_ray.index.manifest import load_manifest


def _merge_topk(per_shard: list, k: int) -> list[tuple[int, float]]:
    """k-way merge of per-shard (doc, score) lists, (score desc, doc
    asc) — each list is already locally sorted by the same key."""
    merged = heapq.merge(
        *(sorted(h, key=lambda x: (-x[1], x[0])) for h in per_shard),
        key=lambda x: (-x[1], x[0]),
    )
    return [hit for _, hit in zip(range(k), merged)]


@ray.remote
class IndexShard:
    """One doc-shard of a distributed search fleet: a pinned
    ``Searcher`` snapshot plus the DFS protocol endpoints. State loads
    once in ``__init__``; queries stream through the phase methods."""

    def __init__(self, index_dir: str, version: int | None = None, **kw):
        from fdblucene_ray.index.search import Searcher

        self.searcher = Searcher(index_dir, version=version, **kw)

    def field_totals(self) -> dict:
        return self.searcher.totals

    def local_term_stats(self, field: str, terms: list[str]) -> dict:
        return self.searcher.local_term_stats(field, terms)

    def search_terms(
        self,
        terms: list[str],
        k: int,
        *,
        field: str,
        operator: str,
        mode: str,
        similarity: str,
        totals: dict,
        term_stats: dict,
    ) -> list[tuple[int, float]]:
        self.searcher.stats_override = {
            "totals": totals,
            "terms": {(field, t): st for t, st in term_stats.items()},
        }
        try:
            return self.searcher.search_terms(
                terms, k, field=field, operator=operator, mode=mode,
                similarity=similarity,
            )
        finally:
            self.searcher.stats_override = None

    def run(self, method: str, args, kwargs, totals: dict,
            term_stats: dict) -> list[tuple[int, float]]:
        """Generic phase-2 endpoint: call any Searcher query method with
        GLOBAL stats injected — every scorer funnels its idf/avgdl reads
        through term_stats/field_stats, so one hook distributes the whole
        term-known query surface (phrase, boolean, msm, filter)."""
        self.searcher.stats_override = {
            "totals": totals,
            "terms": dict(term_stats),
        }
        try:
            return getattr(self.searcher, method)(*args, **kwargs)
        finally:
            self.searcher.stats_override = None

    def hydrate(self, doc_ids: list[int], columns=None):
        from fdblucene_ray.index.build import hydrate

        return hydrate(self.searcher.index_dir, doc_ids, columns)


class DistributedSearcher:
    """Driver-side handle on a fleet of ``IndexShard`` actors — the
    multi-node ``Searcher.multi`` (one actor per doc-shard instead of
    one reader list in one process). Results are float-identical to
    ``Searcher.multi(index_dirs, versions)`` (asserted in
    tests/test_distributed.py).

    Contract mirrors ``Searcher.multi``: disjoint doc-id spaces
    (``doc_base`` offsets), matching analyzers/block_size/codec — all
    checked loudly here against the first manifest.
    """

    def __init__(
        self,
        index_dirs: list[str],
        versions: list[int | None] | None = None,
        *,
        num_cpus_per_shard: float = 1.0,
        k1: float | None = None,
        b: float | None = None,
    ):
        if not index_dirs:
            raise ValueError("DistributedSearcher needs >= 1 index dir")
        if versions is None:
            versions = [None] * len(index_dirs)
        if len(versions) != len(index_dirs):
            raise ValueError("one version entry per index dir")
        manifests = [
            load_manifest(d, v) for d, v in zip(index_dirs, versions)
        ]
        first = manifests[0]
        for d, m in zip(index_dirs[1:], manifests[1:]):
            if m.analyzers != first.analyzers:
                raise ValueError(f"analyzer mismatch in {d}")
            if m.block_size != first.block_size:
                raise ValueError(f"block_size mismatch in {d}")
            if m.codec != first.codec:
                raise ValueError(f"codec mismatch in {d}")
        self.manifest = first  # analyzers for driver-side query parse
        kw = {}
        if k1 is not None:
            kw["k1"] = k1
        if b is not None:
            kw["b"] = b
        self.shards = [
            IndexShard.options(num_cpus=num_cpus_per_shard).remote(
                d, version=v, **kw
            )
            for d, v in zip(index_dirs, versions)
        ]
        # phase 0: global field totals (sum of per-shard docCount/sumDL)
        self.totals: dict[str, dict[str, int]] = {}
        for tot in ray.get([a.field_totals.remote() for a in self.shards]):
            for f, st in tot.items():
                cur = self.totals.setdefault(f, {k_: 0 for k_ in st})
                for k_, v_ in st.items():
                    cur[k_] = cur.get(k_, 0) + v_

    # ---- stats ----
    def num_docs(self, field: str = "text") -> int:
        return int(self.totals.get(field, {"dc": 0})["dc"])

    def term_stats(self, field: str, terms: list[str]) -> dict:
        """Global (df, ttf) per term — phase 1 of the DFS protocol."""
        per_shard = ray.get(
            [a.local_term_stats.remote(field, terms) for a in self.shards]
        )
        out = {t: (0, 0) for t in terms}
        for stats in per_shard:
            for t, (df, ttf) in stats.items():
                d0, t0 = out[t]
                out[t] = (d0 + df, t0 + ttf)
        return out

    # ---- query API ----
    def parse(self, query: str, field: str = "text") -> list[str]:
        from fdblucene_ray.analysis.analyzer import get_analyzer

        az_name = self.manifest.analyzers.get(field, "lucene")
        if az_name == "keyword":
            return [query]
        toks = get_analyzer(az_name).tokens(query)
        return list(dict.fromkeys(toks))

    def search(self, query: str, k: int = 10, *, field: str = "text",
               operator: str = "or", mode: str = "auto",
               similarity: str = "bm25") -> list[tuple[int, float]]:
        return self.search_terms(
            self.parse(query, field), k, field=field, operator=operator,
            mode=mode, similarity=similarity,
        )

    def search_terms(self, terms, k: int = 10, *, field: str = "text",
                     operator: str = "or", mode: str = "auto",
                     similarity: str = "bm25") -> list[tuple[int, float]]:
        if not terms:
            return []
        gstats = self.term_stats(field, terms)  # phase 1
        if operator == "and" and any(df == 0 for df, _ in gstats.values()):
            return []
        # phase 2: scatter with injected global stats, gather local top-k
        futs = [
            a.search_terms.remote(
                terms, k, field=field, operator=operator, mode=mode,
                similarity=similarity, totals=self.totals, term_stats=gstats,
            )
            for a in self.shards
        ]
        return _merge_topk(ray.get(futs), k)

    def search_phrase(self, phrase: str, k: int = 10, *, field: str = "text",
                      slop: int = 0) -> list[tuple[int, float]]:
        """Distributed PhraseQuery: phrase terms are driver-known, so the
        DFS protocol applies unchanged — global per-term df drives the
        summed idf, position matching stays shard-local."""
        terms, _ = self._phrase_terms(phrase, field)
        if not terms:
            return []
        return self._scatter(
            terms, field, k,
            "search_phrase", (phrase, k), {"field": field, "slop": slop},
        )

    def search_boolean(self, must=None, should=None, must_not=None,
                       k: int = 10, *, field: str = "text", mode: str = "auto",
                       min_should_match: int = 0,
                       filter_terms=None) -> list[tuple[int, float]]:
        """Distributed BooleanQuery over plain-term clauses (MUST /
        SHOULD / MUST_NOT / FILTER / minimumShouldMatch)."""
        stat_terms = [
            *(must or []), *(should or []), *(must_not or []),
            *(filter_terms or []),
        ]
        if not stat_terms:
            return []
        return self._scatter(
            stat_terms, field, k,
            "search_boolean", (must, should, must_not, k),
            {"field": field, "mode": mode,
             "min_should_match": min_should_match,
             "filter_terms": filter_terms},
        )

    def _scatter(self, stat_terms, field, k, method, args, kwargs):
        gstats = self.term_stats(field, list(dict.fromkeys(stat_terms)))
        tstats = {(field, t): st for t, st in gstats.items()}
        futs = [
            a.run.remote(method, args, kwargs, self.totals, tstats)
            for a in self.shards
        ]
        return _merge_topk(ray.get(futs), k)

    def search_grouped(
        self,
        query: str,
        *,
        group_col: str,
        source,
        n_groups: int = 10,
        docs_per_group: int = 2,
        field: str = "text",
    ) -> list[tuple[str, int, int, float]]:
        """Distributed TopGroups — Lucene's two-pass grouping protocol
        (TermFirstPassGroupingCollector / TermSecondPassGrouping-
        Collector) over the shard fleet:

        pass 1: every shard returns its local top-``n_groups`` groups
        by best hit (sufficient: a global top group's best hit lives on
        some shard, where it also tops that shard's list); the driver
        merges to the global group set ranked by (best score desc,
        group asc).
        pass 2: every shard returns its top ``docs_per_group`` docs for
        EXACTLY that group set; the driver merges per group. Global
        stats are injected both passes, so scores are float-identical
        to a single merged index (asserted in test_distributed)."""
        terms = self.parse(query, field)
        if not terms:
            return []
        gstats = self.term_stats(field, terms)
        tstats = {(field, t): st for t, st in gstats.items()}
        kwargs = dict(
            group_col=group_col, source=source, field=field,
            n_groups=n_groups, docs_per_group=docs_per_group,
        )
        pass1 = ray.get([
            a.run.remote("search_grouped", (query,), kwargs,
                         self.totals, tstats)
            for a in self.shards
        ])
        best: dict[str, float] = {}
        for rows in pass1:
            for g, r, _d, s in rows:
                if r == 0 and (g not in best or s > best[g]):
                    best[g] = s
        top = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:n_groups]
        if not top:
            return []
        group_set = [g for g, _ in top]
        kwargs2 = dict(kwargs, restrict_groups=group_set)
        pass2 = ray.get([
            a.run.remote("search_grouped", (query,), kwargs2,
                         self.totals, tstats)
            for a in self.shards
        ])
        per_group: dict[str, list[tuple[int, float]]] = {g: [] for g in group_set}
        for rows in pass2:
            for g, _r, d, s in rows:
                if g in per_group:
                    per_group[g].append((d, s))
        out: list[tuple[str, int, int, float]] = []
        for g, _bs in top:
            docs = sorted(per_group[g], key=lambda x: (-x[1], x[0]))
            for r, (d, s) in enumerate(docs[:docs_per_group]):
                out.append((g, r, d, s))
        return out

    def _phrase_terms(self, phrase: str, field: str):
        from fdblucene_ray.analysis.analyzer import get_analyzer

        az_name = self.manifest.analyzers.get(field, "lucene")
        if az_name == "keyword":
            return [phrase], [0]
        terms, qpos = get_analyzer(az_name).tokens_with_positions(phrase)
        if not terms:
            return [], []
        return terms, [p - qpos[0] for p in qpos]

    def hydrate(self, hits, columns=None):
        """Top-k (doc_id, score) -> stored fields, fetched from the one
        shard owning each doc (disjoint doc spaces make ownership a
        range lookup; each shard receives only its own ids)."""
        import pyarrow as pa

        doc_ids = [int(d) for d, _ in hits]
        futs = [a.hydrate.remote(doc_ids, columns) for a in self.shards]
        parts = [t for t in ray.get(futs) if t is not None and t.num_rows]
        if not parts:
            return None
        return pa.concat_tables(parts)

    def shutdown(self) -> None:
        for a in self.shards:
            ray.kill(a)
        self.shards = []
