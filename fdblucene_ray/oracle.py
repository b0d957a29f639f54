"""Single-process reference oracle: same analyzer + BM25 semantics,
exhaustive scoring, zero Ray.

The reference validates its storage layer by running Lucene's own
conformance suites against it (FDBDirectoryTest.java:30 extends
BaseDirectoryTestCase); our analog (SURVEY.md §5.1) is this pure-Python
oracle — the distributed engine must be rank- and score-identical to it
on every corpus/query pair.

Scoring identities with the engine are bit-exact: identical formula
(Lucene-8 BM25, no (k1+1)), identical lossy norms, and identical
floating-point accumulation order (clauses in query order).
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from fdblucene_ray.analysis.analyzer import get_analyzer
from fdblucene_ray.codec.smallfloat import byte4_to_int, int_to_byte4
from fdblucene_ray.index.search import B, K1, bm25_idf


class OracleIndex:
    """In-memory single-field inverted index with exact Lucene-style stats."""

    def __init__(self, analyzer="lucene"):
        self.analyzer = get_analyzer(analyzer) if analyzer != "keyword" else "keyword"
        self.postings: dict[str, list[tuple[int, int]]] = {}
        self.positions: dict[str, dict[int, list[int]]] = {}
        self.norm_byte: dict[int, int] = {}
        self.dc = 0  # docs with >= 1 token
        self.sum_dl = 0  # exact sumTotalTermFreq

    def add(self, doc_id: int, text: str):
        if self.analyzer == "keyword":
            toks, tpos = [text], [0]
        else:
            # Lucene position-increment semantics: removed stopwords
            # leave gaps in the recorded positions
            toks, tpos = self.analyzer.tokens_with_positions(text)
        if not toks:
            return
        self.dc += 1
        self.sum_dl += len(toks)
        self.norm_byte[doc_id] = int_to_byte4(len(toks))
        for term, tf in Counter(toks).items():
            self.postings.setdefault(term, []).append((doc_id, tf))
        for p, term in zip(tpos, toks):
            self.positions.setdefault(term, {}).setdefault(doc_id, []).append(p)

    @classmethod
    def from_table(cls, table: pa.Table, text_col="text", id_col="doc_id", analyzer="lucene"):
        ix = cls(analyzer)
        for d, t in zip(table[id_col].to_pylist(), table[text_col].to_pylist()):
            ix.add(d, t)
        return ix

    # ---- stats ----
    @property
    def avgdl(self) -> float:
        return self.sum_dl / self.dc if self.dc else 1.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    # ---- search ----
    def parse(self, query: str) -> list[str]:
        if self.analyzer == "keyword":
            return [query]
        return list(dict.fromkeys(self.analyzer.tokens(query)))

    def search(self, query: str, k: int = 10, operator: str = "or"):
        terms = self.parse(query)
        if not terms:
            return []
        avgdl = self.avgdl
        kcache = [K1 * (1 - B + B * byte4_to_int(nb) / avgdl) for nb in range(256)]
        per_doc: dict[int, float] = {}
        matched: dict[int, int] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                if operator == "and":
                    return []
                continue
            idf = bm25_idf(self.dc, len(plist))
            for doc, tf in plist:
                s = idf * tf / (tf + kcache[self.norm_byte[doc]])
                per_doc[doc] = per_doc.get(doc, 0.0) + s
                matched[doc] = matched.get(doc, 0) + 1
        if operator == "and":
            need = len(terms)
            per_doc = {d: s for d, s in per_doc.items() if matched[d] == need}
        hits = sorted(per_doc.items(), key=lambda x: (-x[1], x[0]))
        return hits[:k]

    def count(self, query: str, operator: str = "or") -> int:
        terms = self.parse(query)
        if not terms:
            return 0
        sets = [set(d for d, _ in self.postings.get(t, ())) for t in terms]
        if operator == "and":
            out = sets[0]
            for s in sets[1:]:
                out &= s
            return len(out)
        out = set()
        for s in sets:
            out |= s
        return len(out)

    def phrase_matches(
        self, phrase: str, slop: int = 0
    ) -> list[tuple[int, int]]:
        """(doc_id, phrase_freq) for docs containing the exact phrase.
        Query offsets use the analyzed positions (gaps at removed
        stopwords), matching Lucene's QueryParser/PhraseQuery.
        ``slop``: windowed-anchor sloppy semantics (same contract as
        Searcher.search_phrase)."""
        if self.analyzer == "keyword":
            terms, qpos = [phrase], [0]
        else:
            terms, qpos = self.analyzer.tokens_with_positions(phrase)
        if not terms:
            return []
        if len(terms) == 1:
            return sorted(self.postings.get(terms[0], []))
        offs = [p - qpos[0] for p in qpos]
        docsets = [set(self.positions.get(t, {})) for t in terms]
        cand = set.intersection(*docsets) if docsets else set()
        out = []
        for doc in sorted(cand):
            base = set(self.positions[terms[0]][doc])
            for qi in range(1, len(terms)):
                shifted = {p - offs[qi] for p in self.positions[terms[qi]][doc]}
                if slop == 0:
                    base &= shifted
                else:
                    base = {
                        a for a in base
                        if any(abs(q - a) <= slop for q in shifted)
                    }
                if not base:
                    break
            if base:
                out.append((doc, len(base)))
        return out

    def search_phrase(self, phrase: str, k: int = 10, slop: int = 0):
        """BM25 phrase scoring: tf = phrase freq, idf = sum of clause idfs."""
        from fdblucene_ray.index.search import B, K1

        terms = (
            [phrase] if self.analyzer == "keyword" else self.analyzer.tokens(phrase)
        )
        if not terms:
            return []
        for t in terms:
            if t not in self.postings:
                return []
        if len(terms) == 1:
            return self.search(phrase, k)
        avgdl = self.avgdl
        idf_sum = sum(bm25_idf(self.dc, self.df(t)) for t in terms)
        hits = []
        for doc, pf in self.phrase_matches(phrase, slop):
            kk = K1 * (1 - B + B * byte4_to_int(self.norm_byte[doc]) / avgdl)
            hits.append((doc, idf_sum * pf / (pf + kk)))
        hits.sort(key=lambda x: (-x[1], x[0]))
        return hits[:k]

    def search_near(self, phrase: str, window: int, ordered: bool = False):
        """Proximity oracle: brute-force over ALL position combinations
        (deliberately a different algorithm than the engine's sweep) —
        (doc_id, minimal_span) for docs whose distinct terms co-occur
        within ``window`` positions."""
        import itertools

        if self.analyzer == "keyword":
            terms = [phrase]
        else:
            terms = list(dict.fromkeys(self.analyzer.tokens(phrase)))
        if not terms:
            return []
        if len(terms) == 1:
            return [(d, 1) for d, _ in sorted(self.postings.get(terms[0], []))]
        docsets = [set(self.positions.get(t, {})) for t in terms]
        cand = set.intersection(*docsets) if docsets else set()
        out = []
        for doc in sorted(cand):
            best = None
            for combo in itertools.product(
                *(self.positions[t][doc] for t in terms)
            ):
                if ordered and any(
                    combo[i + 1] <= combo[i] for i in range(len(combo) - 1)
                ):
                    continue
                span = max(combo) - min(combo) + 1
                best = span if best is None else min(best, span)
            if best is not None and best <= window:
                out.append((doc, best))
        return out

    def search_boolean(self, must=None, should=None, must_not=None, k: int = 10,
                       filter_terms=None):
        """Lucene-BooleanQuery semantics, mirrored from Searcher."""
        from fdblucene_ray.index.search import B, K1

        must, should, must_not = must or [], should or [], must_not or []
        filt = filter_terms or []
        if not (must or should or filt):
            return []
        avgdl = self.avgdl
        kcache = [K1 * (1 - B + B * byte4_to_int(nb) / avgdl) for nb in range(256)]

        def clause_scores(t):
            plist = self.postings.get(t, [])
            idf = bm25_idf(self.dc, len(plist))
            return {d: idf * tf / (tf + kcache[self.norm_byte[d]]) for d, tf in plist}

        must_maps = [clause_scores(t) for t in must]
        filt_sets = [{d for d, _ in self.postings.get(t, [])} for t in filt]
        if any(not m for m in must_maps) or any(not s for s in filt_sets):
            return []
        should_maps = [clause_scores(t) for t in should]
        if must or filt:
            req = [set(m) for m in must_maps] + filt_sets
            cand = req[0]
            for m in req[1:]:
                cand &= m
        else:
            cand = set()
            for m in should_maps:
                cand |= set(m)
        for t in must_not:
            cand -= {d for d, _ in self.postings.get(t, [])}
        hits = []
        for d in cand:
            s = 0.0
            for m in must_maps:
                s += m[d]
            for m in should_maps:
                if d in m:
                    s += m[d]
            hits.append((d, s))
        hits.sort(key=lambda x: (-x[1], x[0]))
        return hits[:k]
