"""Webtext hygiene ops: chunk dedup (CCNet paragraph-dedup analog),
Gopher repetition signals, source stats, normalization.

Oracles here are pure-Python brute force over small planted corpora;
the DuckDB SQL twins run in the driver gate (pipelines/queries.py).
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fdblucene_ray.ops.webtext import (
    chunk_dedup,
    normalize_text,
    repetition_signals,
    source_stats,
)


def _ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array(rows, pa.string()),
            }
        )
    )


def _py_chunk_dedup(rows, w):
    """Brute-force oracle: global first-(doc, chunk_idx) keeps, rest dup."""
    chunks = []  # (text, doc, idx, ntoks)
    for doc, text in enumerate(rows):
        toks = [t for t in text.split() if t]
        for ci in range(0, (len(toks) + w - 1) // w):
            seg = toks[ci * w : (ci + 1) * w]
            chunks.append((" ".join(seg), doc, ci, len(seg)))
    seen = {}
    for text, doc, ci, nt in sorted(chunks, key=lambda c: (c[1], c[2])):
        seen.setdefault(text, (doc, ci))
    out = {}
    for text, doc, ci, nt in chunks:
        st = out.setdefault(doc, [0, 0, 0, 0])
        dup = seen[text] != (doc, ci)
        st[0] += 1
        st[1] += dup
        st[2] += nt
        st[3] += nt * dup
    return out


class TestChunkDedup:
    def test_planted_duplicate_chunks(self, ray_session):
        base = " ".join(f"tok{i}" for i in range(40))  # 40 toks = 3 chunks(16,16,8)
        rows = [
            base,
            base,  # full dup of doc 0
            " ".join(f"tok{i}" for i in range(16)) + " unique tail here",
            "totally different words only once each",
        ]
        res = {
            int(r["doc_id"]): r
            for r in chunk_dedup(_ds(rows), w=16).take_all()
        }
        oracle = _py_chunk_dedup(rows, 16)
        assert set(res) == set(oracle)
        for doc, (nc, ndc, nt, ndt) in oracle.items():
            r = res[doc]
            assert (r["n_chunks"], r["n_dup_chunks"], r["n_tokens"], r["n_dup_tokens"]) == (
                nc, ndc, nt, ndt
            ), doc
            assert r["dup_token_frac"] == pytest.approx(
                round(ndt / max(nt, 1), 6), abs=1e-9
            )
        # doc 1 is fully duplicated against doc 0
        assert res[1]["n_dup_chunks"] == res[1]["n_chunks"] == 3
        assert res[1]["dup_token_frac"] == 1.0
        # doc 0 is the keeper: zero dups
        assert res[0]["n_dup_chunks"] == 0

    def test_partial_chunk_and_cross_doc_order(self, ray_session):
        # chunk dup where the KEEPER is the earlier doc even if the later
        # doc's copy sits at a smaller chunk_idx
        a = " ".join(f"x{i}" for i in range(16))
        rows = ["pad " * 16 + a, a]  # doc0 has it at chunk 1, doc1 at chunk 0
        res = {
            int(r["doc_id"]): r
            for r in chunk_dedup(_ds(rows), w=16).take_all()
        }
        oracle = _py_chunk_dedup(rows, 16)
        for doc in res:
            assert res[doc]["n_dup_chunks"] == oracle[doc][1], doc

    def test_random_corpus_matches_bruteforce(self, ray_session):
        rng = np.random.default_rng(7)
        rows = [
            " ".join(f"w{rng.integers(0, 9)}" for _ in range(rng.integers(1, 70)))
            for _ in range(60)
        ]
        res = {
            int(r["doc_id"]): r
            for r in chunk_dedup(_ds(rows), w=8).take_all()
        }
        oracle = _py_chunk_dedup(rows, 8)
        assert set(res) == set(oracle)
        for doc, (nc, ndc, nt, ndt) in oracle.items():
            r = res[doc]
            assert (r["n_chunks"], r["n_dup_chunks"], r["n_tokens"], r["n_dup_tokens"]) == (
                nc, ndc, nt, ndt
            ), doc


class TestRepetition:
    def test_signals_match_bruteforce(self, ray_session):
        rows = [
            "a b a b a b",  # bigram 'a b' x3 of 5; 2 unique of 6
            "x y z",  # all unique
            "q",  # single token: no bigrams/trigrams
            "m m m m",  # one unique; bigram 'm m' x3/3; trigram x2/2
        ]
        out = {
            int(r["doc_id"]): r
            for r in repetition_signals(_ds(rows)).take_all()
        }
        for doc, text in enumerate(rows):
            toks = text.split()
            n = len(toks)
            bigs = [tuple(toks[i : i + 2]) for i in range(n - 1)]
            tris = [tuple(toks[i : i + 3]) for i in range(n - 2)]
            top_b = max([bigs.count(b) for b in set(bigs)], default=0)
            top_t = max([tris.count(t) for t in set(tris)], default=0)
            r = out[doc]
            assert r["n_tokens"] == n
            assert r["frac_unique"] == pytest.approx(
                round(len(set(toks)) / n, 6), abs=1e-9
            )
            assert r["top_bigram_frac"] == pytest.approx(
                round(top_b / max(n - 1, 1), 6), abs=1e-9
            ), doc
            assert r["top_trigram_frac"] == pytest.approx(
                round(top_t / max(n - 2, 1), 6), abs=1e-9
            ), doc


class TestSourceStats:
    def test_rollup(self, ray_session):
        t = pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "text": pa.array(["aa", "bbbb", "c", "dd", "e", "ffffff"]),
                "source": pa.array(["s1", "s1", "s2", "s2", "s2", "s3"]),
                "lang": pa.array(["en", "de", "en", "en", "fr", "en"]),
            }
        )
        res = source_stats(ray.data.from_arrow(t))
        rows = {r["source"]: r for r in res.to_pylist()}
        assert rows["s1"]["n_docs"] == 2 and rows["s1"]["sum_chars"] == 6
        assert rows["s1"]["n_langs"] == 2
        assert rows["s2"]["n_docs"] == 3 and rows["s2"]["n_langs"] == 2
        assert rows["s3"]["avg_chars"] == 6.0
        assert rows["s1"]["avg_chars"] == 3.0


class TestNormalize:
    def test_collapse_and_lower(self, ray_session):
        rows = ["  Hello   WORLD  ", "a\t\tb\nc", "", "x"]
        out = {
            int(r["doc_id"]): r for r in normalize_text(_ds(rows)).take_all()
        }
        assert out[0]["norm_text"] == "hello world"
        assert out[1]["norm_text"] == "a b c"
        assert out[2]["norm_text"] == ""
        assert out[3]["norm_text"] == "x"
        assert out[1]["n_chars_norm"] == 5


class TestBpePairs:
    def test_counts_match_bruteforce(self, ray_session):
        from fdblucene_ray.ops.webtext import bpe_pair_counts

        rows = ["a b a b c", "b c b c", "a b", "x"]
        out = bpe_pair_counts(_ds(rows), top_k=100).to_pylist()
        want = {}
        for text in rows:
            toks = text.split()
            for l, r in zip(toks, toks[1:]):
                want[(l, r)] = want.get((l, r), 0) + 1
        got = {(r["left"], r["right"]): r["cnt"] for r in out}
        assert got == want
        # ordering: count desc, then (left, right) asc
        keys = [(-r["cnt"], r["left"], r["right"]) for r in out]
        assert keys == sorted(keys)

    def test_top_k_truncation(self, ray_session):
        from fdblucene_ray.ops.webtext import bpe_pair_counts

        rows = [" ".join(f"t{i} t{i}" for i in range(30))]
        out = bpe_pair_counts(_ds(rows), top_k=5)
        assert out.num_rows == 5


class TestScrubSpans:
    def test_planted_duplicate_removed(self, ray_session):
        from fdblucene_ray.ops.webtext import scrub_duplicated_spans

        dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        texts = []
        for i in range(10):
            filler = " ".join(f"u{i}x{j}" for j in range(12))
            if i in (1, 3, 7):
                texts.append(f"{filler} {dup} tail{i}")
            else:
                texts.append(f"{filler} solo{i}")
        t = pa.table(
            {"doc_id": pa.array(range(10), pa.int64()),
             "text": pa.array(texts)}
        )
        out = (
            scrub_duplicated_spans(ray.data.from_arrow(t), n=8, min_df=2)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        for i in range(10):
            row = out[out.doc_id == i].iloc[0]
            if i in (1, 3, 7):
                # the whole 10-token planted run is covered (windows at
                # offsets 0..2 of the run overlap to cover all 10)
                assert row["n_removed"] == 10
                assert "alpha" not in row["text"] and "kappa" not in row["text"]
                assert f"tail{i}" in row["text"] and f"u{i}x0" in row["text"]
            else:
                # untouched docs keep BYTE-IDENTICAL text
                assert row["n_removed"] == 0
                assert row["text"] == texts[i]

    def test_matches_bruteforce(self, ray_session):
        """Random corpus with induced repeats: engine == pure-Python
        duplicated-window scrub."""
        from fdblucene_ray.ops.webtext import scrub_duplicated_spans

        rng = np.random.default_rng(9)
        n, min_df = 5, 2
        texts = [
            " ".join(f"w{int(x)}" for x in rng.integers(0, 12, 30))
            for _ in range(40)
        ]
        t = pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts)}
        )
        out = (
            scrub_duplicated_spans(
                ray.data.from_arrow(t), n=n, min_df=min_df)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        # brute force
        from collections import defaultdict

        gram_docs = defaultdict(set)
        toks_by_doc = [txt.split() for txt in texts]
        for d, toks in enumerate(toks_by_doc):
            for p in range(len(toks) - n + 1):
                gram_docs[tuple(toks[p:p + n])].add(d)
        dup_grams = {g for g, ds_ in gram_docs.items() if len(ds_) >= min_df}
        for d, toks in enumerate(toks_by_doc):
            covered = [False] * len(toks)
            for p in range(len(toks) - n + 1):
                if tuple(toks[p:p + n]) in dup_grams:
                    for q in range(p, min(p + n, len(toks))):
                        covered[q] = True
            exp_removed = sum(covered)
            exp_text = (
                " ".join(tk for tk, c in zip(toks, covered) if not c)
                if exp_removed else texts[d]
            )
            row = out[out.doc_id == d].iloc[0]
            assert row["n_removed"] == exp_removed, d
            assert row["text"] == exp_text, d

    def test_vectorized_kernel_matches_per_doc_reference(self):
        """Batch-level: the Arrow/diff-array ScrubSpans kernel ==
        the per-doc Python reference on randomized batches covering
        null spans, b'' spans, empty docs, messy whitespace and
        large_string input."""
        from fdblucene_ray.ops.webtext import ScrubSpans

        def ref(texts, spans_col, n):
            out_text, out_removed = [], []
            for txt, spans in zip(texts, spans_col):
                if not spans:
                    out_text.append(txt)
                    out_removed.append(0)
                    continue
                toks = txt.split()
                diff = np.zeros(len(toks) + 1, np.int64)
                starts = np.frombuffer(spans, dtype="<i8").astype(np.int64)
                np.add.at(diff, starts, 1)
                np.add.at(diff, np.minimum(starts + n, len(toks)), -1)
                covered = np.cumsum(diff[:-1]) > 0
                out_text.append(
                    " ".join(t for t, c in zip(toks, covered) if not c)
                )
                out_removed.append(int(covered.sum()))
            return out_text, out_removed

        rng = np.random.default_rng(7)
        n = 5
        for trial in range(60):
            n_rows = int(rng.integers(1, 40))
            texts, spans_col = [], []
            for _ in range(n_rows):
                length = int(rng.integers(0, 30))
                toks = [f"t{rng.integers(0, 9)}" for _ in range(length)]
                sep = str(rng.choice([" ", "  ", "\t", " \n "]))
                txt = sep.join(toks)
                if rng.random() < 0.3:
                    txt = " " + txt + "  "
                texts.append(txt)
                if length >= n and rng.random() < 0.6:
                    k = int(rng.integers(1, 5))
                    starts = np.sort(
                        rng.integers(0, length - n + 1, size=k)
                    ).astype("<i8")
                    spans_col.append(starts.tobytes())
                elif rng.random() < 0.2:
                    spans_col.append(b"")
                else:
                    spans_col.append(None)
            ttype = pa.large_string() if trial % 3 == 0 else pa.string()
            batch = pa.table(
                {
                    "doc_id": pa.array(np.arange(n_rows, dtype=np.int64)),
                    "text": pa.array(texts, ttype),
                    "spans": pa.array(spans_col, pa.binary()),
                }
            )
            got = ScrubSpans(n, "text", "doc_id")(batch)
            want_text, want_rem = ref(texts, spans_col, n)
            assert got["text"].to_pylist() == want_text, trial
            assert got["n_removed"].to_pylist() == want_rem, trial


class TestUrlDedup:
    def test_canonicalization_rules(self):
        from fdblucene_ray.ops.webtext import canonical_urls

        u = pa.array([
            "HTTPS://A.COM/X/?utm_source=1&ref=k#f",
            "https://a.com/x?ref=k",
            "http://b.com/y/?gclid=z",
            "http://b.com/y",
            "http://c.com/z?fbclid=1&utm_medium=m",
            "http://c.com/z",
        ])
        out = canonical_urls(u).to_pylist()
        assert out[0] == out[1] == "https://a.com/x?ref=k"
        assert out[2] == out[3] == "http://b.com/y"
        assert out[4] == out[5] == "http://c.com/z"

    def test_dedup_keeps_min_id(self, ray_session):
        from fdblucene_ray.ops.webtext import url_dedup

        urls = [
            "https://a.com/1", "https://A.com/1/",       # dup of 0
            "https://a.com/2?utm_source=x",              # == /2
            "https://a.com/2", "https://a.com/3",
        ]
        t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                      "url": pa.array(urls)})
        out = url_dedup(ray.data.from_arrow(t)).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        assert list(out["doc_id"]) == [0, 2, 4]
        assert list(out["dup_count"]) == [2, 2, 1]


class TestFilterUrls:
    def _ds(self):
        urls = [
            "https://good.example.com/a",
            "HTTPS://Bad-Host.COM/a",           # blocked host (case-folded)
            "https://good.example.com/ads/x",   # blocked pattern
            "http://other.org/page?q=1",
            "not-a-url",                        # no host -> never host-blocked
            "https://bad-host.com/else",        # blocked host again
        ]
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(urls)), pa.int64()),
                    "url": pa.array(urls, pa.string()),
                }
            )
        )

    def test_host_and_pattern_blocklists(self, ray_session):
        from fdblucene_ray.ops.webtext import filter_urls

        kept = sorted(
            r["doc_id"]
            for r in filter_urls(
                self._ds(),
                blocked_hosts=["bad-host.com"],
                blocked_patterns=["/ads/"],
            ).take_all()
        )
        assert kept == [0, 3, 4]

    def test_empty_blocklists_keep_everything(self, ray_session):
        from fdblucene_ray.ops.webtext import filter_urls

        kept = filter_urls(self._ds()).take_all()
        assert len(kept) == 6

    def test_url_hosts_extraction(self):
        from fdblucene_ray.ops.webtext import url_hosts

        got = url_hosts(
            pa.array(
                [
                    "HTTPS://A.B.C/x?y#z",
                    "ftp://Host:8080/p",
                    "relative/path",
                    "https://noslash",
                ]
            )
        ).to_pylist()
        assert got == ["a.b.c", "host:8080", "", "noslash"]


class TestAsciiFold:
    def test_known_mappings(self):
        from fdblucene_ray.ops.webtext import fold_to_ascii

        got = fold_to_ascii(
            pa.array(
                ["cámión über naïve", "straße Œuvre", "Ærø þing łódź",
                 "plain ascii", ""]
            )
        ).to_pylist()
        assert got == [
            "camion uber naive", "strasse OEuvre", "AEro thing lodz",
            "plain ascii", "",
        ]

    def test_idempotent_and_nul_safe(self):
        from fdblucene_ray.ops.webtext import fold_to_ascii

        once = fold_to_ascii(pa.array(["déjà vu", "x"]))
        twice = fold_to_ascii(once)
        assert once.to_pylist() == twice.to_pylist() == ["deja vu", "x"]

    def test_dataset_op(self, ray_session):
        from fdblucene_ray.ops.webtext import ascii_fold

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["café", "noël"], pa.string()),
                }
            )
        )
        rows = {r["doc_id"]: r["folded"] for r in ascii_fold(ds).take_all()}
        assert rows == {1: "cafe", 2: "noel"}


class TestExactDupSpans:
    def test_planted_maximal_span(self, ray_session):
        from fdblucene_ray.ops.webtext import exact_dup_spans

        dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        texts = []
        for i in range(8):
            filler = " ".join(f"u{i}x{j}" for j in range(12))
            if i in (1, 4):
                texts.append(f"{filler} {dup} tail{i}")
            else:
                texts.append(f"{filler} solo{i}")
        t = pa.table(
            {"doc_id": pa.array(range(8), pa.int64()),
             "text": pa.array(texts)}
        )
        out = (
            exact_dup_spans(ray.data.from_arrow(t), n=8, min_df=2)
            .to_pandas().sort_values(["doc_id", "span_start"])
            .reset_index(drop=True)
        )
        # exactly the two planted docs report exactly the planted
        # 10-token run, maximally merged from its three 8-windows
        assert list(out.doc_id) == [1, 4]
        assert list(out.span_start) == [12, 12]
        assert list(out.span_end) == [22, 22]
        assert list(out.n_tokens) == [10, 10]
        assert set(out.span_text) == {dup}

    def test_matches_bruteforce(self, ray_session):
        """Random corpus with induced repeats: engine == pure-Python
        maximal covered-region merge over literal duplicated windows."""
        from fdblucene_ray.ops.webtext import exact_dup_spans

        rng = np.random.default_rng(17)
        n, min_df = 5, 2
        texts = [
            " ".join(f"w{int(x)}" for x in rng.integers(0, 12, 30))
            for _ in range(40)
        ]
        t = pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts)}
        )
        out = (
            exact_dup_spans(ray.data.from_arrow(t), n=n, min_df=min_df)
            .to_pandas().sort_values(["doc_id", "span_start"])
            .reset_index(drop=True)
        )
        # brute force: duplicated windows -> per-doc maximal regions
        from collections import defaultdict

        gram_docs = defaultdict(set)
        toks_by_doc = [txt.split() for txt in texts]
        for d, toks in enumerate(toks_by_doc):
            for p in range(len(toks) - n + 1):
                gram_docs[tuple(toks[p:p + n])].add(d)
        dup_grams = {g for g, ds_ in gram_docs.items() if len(ds_) >= min_df}
        want = []
        for d, toks in enumerate(toks_by_doc):
            positions = [
                p for p in range(len(toks) - n + 1)
                if tuple(toks[p:p + n]) in dup_grams
            ]
            cur = None
            for p in positions:
                if cur is not None and p <= cur[1]:
                    cur = (cur[0], p + n)
                else:
                    if cur is not None:
                        want.append((d, *cur))
                    cur = (p, p + n)
            if cur is not None:
                want.append((d, *cur))
        got = [
            (int(r.doc_id), int(r.span_start), int(r.span_end))
            for r in out.itertuples()
        ]
        assert got == want
        for r in out.itertuples():
            assert r.span_text == " ".join(
                toks_by_doc[r.doc_id][r.span_start:r.span_end]
            )
            assert r.n_tokens == r.span_end - r.span_start

    def test_literal_verify_kills_hash_collisions(self):
        """The verify stage groups by LITERAL window text: two
        different literals forced into one partition (what a 64-bit
        gram-hash collision produces) are counted separately, so a
        single-doc literal can never ride a collider's df."""
        from fdblucene_ray.ops.webtext import _verify_literal

        group = pa.table(
            {
                "part": pa.array([0, 0, 0, 0], pa.int32()),
                "gram": pa.array(
                    ["a b c", "a b c", "x y z", "q r s"], pa.string()
                ),
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "pos": pa.array([0, 5, 7, 9], pa.int64()),
            }
        )
        out = _verify_literal(2)(group).to_pydict()
        # only the literal seen in two distinct docs survives
        assert sorted(zip(out["doc_id"], out["pos"])) == [(1, 0), (2, 5)]


class TestExactDupSpansEmpty:
    def test_dup_free_corpus_yields_zero_rows(self, ray_session):
        """Regression: the join-based plan raised ArrowInvalid ('No
        match for key field doc_id') when the corpus had NO duplicated
        windows — the _spans_scatter co-partition must return an empty
        typed result instead."""
        from fdblucene_ray.ops.webtext import exact_dup_spans

        rows = [
            f"unique doc {i} " + " ".join(f"tok{i}_{j}" for j in range(20))
            for i in range(40)
        ]
        ds = ray.data.from_arrow(
            pa.table(
                {"doc_id": pa.array(range(40), pa.int64()),
                 "text": pa.array(rows)}
            )
        )
        out = exact_dup_spans(ds, n=8).to_pandas()
        # columns are unavailable on an all-empty dataset (Ray's
        # sort-groupby emits schemaless empty bundles); zero rows
        # without raising is the contract here
        assert len(out) == 0
