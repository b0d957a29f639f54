"""Suffix-array exact-substring dedup (fdblucene_ray/ops/suffix.py):
byte-exact maximal duplicated spans vs a brute-force oracle, planted
fixtures, Bloom-path equivalence, partition independence."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from fdblucene_ray.ops.suffix import suffix_dup_spans


def _brute_spans2(docs: list[str], L: int, min_df: int = 2):
    grams: dict[bytes, set[int]] = {}
    enc = [d.encode() for d in docs]
    for did, b in enumerate(enc):
        for i in range(len(b) - L + 1):
            grams.setdefault(b[i : i + L], set()).add(did)
    out = []
    for did, b in enumerate(enc):
        pos = [
            i
            for i in range(len(b) - L + 1)
            if len(grams[b[i : i + L]]) >= min_df
        ]
        if not pos:
            continue
        regions = []
        start = prev = pos[0]
        for p in pos[1:]:
            if p > prev + L:
                regions.append((start, prev + L))
                start = p
            prev = p
        regions.append((start, prev + L))
        for s, e in regions:
            out.append((did, s, e, e - s, b[s:e]))
    return sorted(out)


def _run(docs: list[str], L: int, min_df: int = 2, **kw):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    np.arange(len(docs), dtype=np.int64)
                ),
                "text": pa.array(docs, pa.string()),
            }
        )
    ).repartition(4)
    t = suffix_dup_spans(ds, min_len=L, min_df=min_df, **kw).to_pandas()
    if not len(t):
        return []
    t = t.sort_values(["doc_id", "span_start"])
    return sorted(
        zip(
            t["doc_id"].astype(int),
            t["span_start"].astype(int),
            t["span_end"].astype(int),
            t["n_bytes"].astype(int),
            [
                bytes(x) if not isinstance(x, str) else x.encode()
                for x in t["span_text"]
            ],
        )
    )


def _rand_docs(rng, n_docs, alpha=4, lo=5, hi=120):
    letters = "abcd"[:alpha]
    return [
        "".join(
            rng.choice(list(letters), size=rng.integers(lo, hi))
        )
        for _ in range(n_docs)
    ]


class TestSuffixDupSpans:
    def test_planted_fixture_matches_brute_force(self, ray_session):
        """Planted shared substrings of several lengths, including one
        shorter than L (must NOT be reported), overlapping plants, and
        a within-doc-only repeat (must NOT be reported at min_df=2
        distinct docs). Output spans are literal-byte equal to the
        brute-force oracle."""
        rng = np.random.default_rng(7)
        base = [
            "".join(
                rng.choice(list("abcdefgh"), size=200)
            )
            for _ in range(8)
        ]
        plant_long = "THE-QUICK-BROWN-FOX-JUMPS-OVER-THE-LAZY-DOG-0123456789"
        plant_mid = "SHARED-CHUNK-OF-EXACTLY-MODERATE-LENGTH!"
        plant_short = "TOO-SHORT"  # < L, never reported
        docs = list(base)
        docs[0] = base[0][:30] + plant_long + base[0][30:]
        docs[3] = base[3][:90] + plant_long + base[3][90:]
        docs[1] = base[1][:10] + plant_mid + base[1][10:]
        docs[4] = plant_mid + base[4]
        docs[5] = base[5] + plant_mid  # three docs share plant_mid
        docs[2] = base[2][:20] + plant_short + base[2][20:]
        docs[6] = base[6][:40] + plant_short + base[6][40:]
        # within-doc repeat only: same long chunk twice in ONE doc
        # (a chunk that appears nowhere else in the corpus)
        solo = "SOLO-REPEAT-NEVER-SHARED-WITH-OTHER-DOCS!"
        docs[7] = solo + base[7] + solo
        L = 20
        got = _run(docs, L)
        want = _brute_spans2(docs, L)
        assert got == want
        # sanity on the fixture itself: plants found, short one absent
        texts = b" ".join(s for *_, s in want)
        assert plant_long.encode() in texts
        assert plant_mid.encode() in texts
        assert plant_short.encode() not in texts
        assert not any(d == 7 for d, *_ in want)

    def test_dup_free_corpus_is_empty(self, ray_session):
        import hashlib

        docs = [
            f"doc {i}:" + hashlib.sha256(bytes([i])).hexdigest()
            + hashlib.sha256(bytes([i, i])).hexdigest()
            for i in range(20)
        ]
        assert _run(docs, 12) == _brute_spans2(docs, 12) == []

    def test_docs_shorter_than_L_and_empty_docs(self, ray_session):
        docs = ["", "tiny", "also tiny", "X" * 50, "X" * 50]
        got = _run(docs, 30)
        want = _brute_spans2(docs, 30)
        assert got == want
        assert {d for d, *_ in got} == {3, 4}

    def test_adjacent_and_overlapping_coverage_merges(self, ray_session):
        """Two distinct duplicated substrings that abut in one doc
        merge into a single maximal region (coverage union)."""
        a = "AAAAAAAAAAAAAAAAAAAA"  # 20
        b = "BBBBBBBBBBBBBBBBBBBB"  # 20
        docs = ["xx" + a + b + "yy", a + "qq", "pp" + b]
        L = 18
        got = _run(docs, L)
        want = _brute_spans2(docs, L)
        assert got == want
        d0 = [r for r in got if r[0] == 0]
        assert len(d0) == 1 and d0[0][4] == (a + b).encode()

    def test_randomized_equivalence(self, ray_session):
        """Random small-alphabet corpora (dense natural duplication)
        match the brute force for several (seed, L) combos."""
        for seed in (1, 2, 3):
            rng = np.random.default_rng(seed)
            docs = _rand_docs(rng, 12)
            for L in (4, 7, 13):
                assert _run(docs, L) == _brute_spans2(docs, L), (
                    seed, L,
                )

    def test_bloom_path_equals_exact_path(self, ray_session):
        """broadcast_limit=0 forces the Bloom-filter candidate path;
        the literal verify stage makes the output identical."""
        rng = np.random.default_rng(11)
        docs = _rand_docs(rng, 10, alpha=3)
        L = 6
        exact = _run(docs, L)
        bloom = _run(docs, L, broadcast_limit=0)
        assert exact == bloom == _brute_spans2(docs, L)

    def test_partition_layout_independence(self, ray_session):
        rng = np.random.default_rng(13)
        docs = _rand_docs(rng, 16, alpha=3)
        a = _run(docs, 8, num_partitions=2)
        b = _run(docs, 8, num_partitions=9)
        assert a == b == _brute_spans2(docs, 8)

    def test_min_df_three(self, ray_session):
        plant = "THIS-EXACT-SENTENCE-APPEARS-IN-MANY-DOCS"
        rng = np.random.default_rng(17)
        filler = _rand_docs(rng, 6, alpha=8, lo=50, hi=80)
        docs = [
            filler[0] + plant,
            plant + filler[1],
            filler[2] + plant + filler[3],
            filler[4],
            filler[5],
        ]
        L = 24
        got = _run(docs, L, min_df=3)
        want = _brute_spans2(docs, L, min_df=3)
        assert got == want
        assert {d for d, *_ in got} == {0, 1, 2}


def _brute_scrub(docs: list[str], L: int, min_df: int = 2):
    """Reference: remove every byte covered by a duplicated window."""
    grams: dict[bytes, set[int]] = {}
    enc = [d.encode() for d in docs]
    for did, b in enumerate(enc):
        for i in range(len(b) - L + 1):
            grams.setdefault(b[i : i + L], set()).add(did)
    out = []
    for did, b in enumerate(enc):
        cov = [False] * len(b)
        for i in range(len(b) - L + 1):
            if len(grams[b[i : i + L]]) >= min_df:
                for j in range(i, i + L):
                    cov[j] = True
        kept = bytes(c for c, m in zip(b, cov) if not m)
        out.append((did, kept.decode(), sum(cov)))
    return out


class TestScrubSuffixSpans:
    def _run_scrub(self, docs, L, min_df=2, **kw):
        from fdblucene_ray.ops.suffix import scrub_suffix_spans

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(
                        np.arange(len(docs), dtype=np.int64)
                    ),
                    "text": pa.array(docs, pa.string()),
                }
            )
        ).repartition(4)
        t = scrub_suffix_spans(
            ds, min_len=L, min_df=min_df, **kw
        ).to_pandas().sort_values("doc_id")
        return list(
            zip(t["doc_id"].astype(int), t["text"],
                t["n_removed"].astype(int))
        )

    def test_matches_brute_force_and_untouched_identical(
        self, ray_session
    ):
        rng = np.random.default_rng(43)
        docs = _rand_docs(rng, 14, alpha=3, lo=30, hi=150)
        plant = "ZZZ-PLANTED-DUPLICATE-CHUNK-ZZZ"
        docs[2] = docs[2] + plant
        docs[9] = plant + docs[9]
        L = 9
        got = self._run_scrub(docs, L)
        want = _brute_scrub(docs, L)
        assert got == want
        # every doc present exactly once, untouched docs byte-identical
        untouched = [d for d, t, r in got if r == 0]
        for d in untouched:
            assert got[d][1] == docs[d]

    def test_dup_free_passthrough(self, ray_session):
        import hashlib

        docs = [
            f"doc {i}:" + hashlib.sha256(bytes([i])).hexdigest()
            for i in range(12)
        ]
        got = self._run_scrub(docs, 10)
        assert got == [(i, docs[i], 0) for i in range(12)]


class TestSuffixRegistry:
    """Incremental registry: appended docs seed only their own bytes;
    the folded registry reproduces the fresh-pipeline output exactly."""

    def test_append_equals_full_rebuild(self, ray_session, tmp_path):
        from fdblucene_ray.ops.suffix import (
            append_suffix_registry,
            build_suffix_registry,
            suffix_dup_spans_registry,
        )

        rng = np.random.default_rng(71)
        base_docs = _rand_docs(rng, 10, alpha=3, lo=40, hi=120)
        plant = "CROSS-BATCH-DUPLICATED-SEGMENT!"
        base_docs[4] = base_docs[4] + plant
        new_docs = _rand_docs(rng, 6, alpha=3, lo=40, hi=120)
        new_docs[1] = plant + new_docs[1]  # dup spans base<->append
        all_docs = base_docs + new_docs

        def table(docs, base_id=0):
            return pa.table(
                {
                    "doc_id": pa.array(
                        np.arange(base_id, base_id + len(docs),
                                  dtype=np.int64)
                    ),
                    "text": pa.array(docs, pa.string()),
                }
            )

        L = 8
        reg = str(tmp_path / "reg")
        base_ds = ray.data.from_arrow(table(base_docs)).repartition(3)
        new_ds = ray.data.from_arrow(
            table(new_docs, len(base_docs))
        ).repartition(2)
        assert build_suffix_registry(
            base_ds, reg, min_len=L, min_df=2
        ) is True
        assert build_suffix_registry(
            base_ds, reg, min_len=L, min_df=2
        ) is False  # idempotent
        assert append_suffix_registry(new_ds, reg, "b1") is True
        assert append_suffix_registry(new_ds, reg, "b1") is False

        full_ds = ray.data.from_arrow(table(all_docs)).repartition(4)
        got = (
            suffix_dup_spans_registry(full_ds, reg)
            .to_pandas()
            .sort_values(["doc_id", "span_start"])
        )
        got_rows = sorted(
            zip(
                got["doc_id"].astype(int),
                got["span_start"].astype(int),
                got["span_end"].astype(int),
                got["n_bytes"].astype(int),
                [
                    bytes(x) if not isinstance(x, str) else x.encode()
                    for x in got["span_text"]
                ],
            )
        )
        want = _brute_spans2(all_docs, L)
        assert got_rows == want
        # the cross-batch plant was found (base doc AND appended doc)
        docs_with = {d for d, *_ in got_rows}
        assert 4 in docs_with and len(base_docs) + 1 in docs_with


class TestKernelProperties:
    """Hypothesis property tests for the byte-level kernels."""

    def test_lgram_classes_exact(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from fdblucene_ray.ops.suffix import _lgram_classes

        @settings(max_examples=60, deadline=None)
        @given(
            st.binary(min_size=0, max_size=120).map(
                lambda b: bytes(97 + (x % 4) for x in b)  # dense dups
            ),
            st.integers(min_value=1, max_value=24),
        )
        def check(b, L):
            cls = _lgram_classes(np.frombuffer(b, np.uint8), L)
            pref = [b[i : i + L] for i in range(len(b))]
            # class equality iff L-prefix byte equality, all pairs
            seen = {}
            for i, p in enumerate(pref):
                if p in seen:
                    assert cls[i] == seen[p], (b, L, i)
                else:
                    for q, c in seen.items():
                        assert cls[i] != c or q == p
                    seen[p] = cls[i]

        check()

    def test_window_hashes_prefix_equality(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from fdblucene_ray.ops.suffix import _window_hashes

        @settings(max_examples=60, deadline=None)
        @given(
            st.binary(min_size=1, max_size=150).map(
                lambda b: bytes(97 + (x % 3) for x in b)
            ),
            st.integers(min_value=1, max_value=20),
        )
        def check(b, L):
            if len(b) < L:
                return
            h = _window_hashes(np.frombuffer(b, np.uint8), L)
            n = len(b) - L + 1
            for i in range(n):
                for j in range(i + 1, n):
                    if b[i : i + L] == b[j : j + L]:
                        assert h[i] == h[j], (b, L, i, j)

        check()

    def test_bloom_no_false_negatives(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from fdblucene_ray.ops.suffix import (
            _bloom_add,
            _bloom_params,
            _bloom_test,
        )

        @settings(max_examples=30, deadline=None)
        @given(st.lists(st.integers(min_value=0, max_value=2**63),
                        min_size=1, max_size=500))
        def check(keys):
            ks = np.asarray(keys, np.uint64)
            words_n, k = _bloom_params(len(ks))
            words = np.zeros(words_n, np.uint64)
            _bloom_add(words, ks, k)
            assert _bloom_test(words, ks, k).all()

        check()


class TestSeedModes:
    def test_suffix_sort_mode_equals_hash_mode(self, ray_session):
        rng = np.random.default_rng(83)
        docs = _rand_docs(rng, 12, alpha=3)
        for L in (5, 11):
            a = _run(docs, L)
            b = _run(docs, L, seed_mode="suffix_sort")
            assert a == b == _brute_spans2(docs, L), L


class TestRegistryCrashRecovery:
    def test_seeds_without_meta_rebuilds(self, ray_session, tmp_path):
        """A crash between the seeds rename and the meta write must
        not brick the registry: the next build clears and rebuilds
        (previously it returned False forever with no registry.json,
        and the query path failed on the missing meta)."""
        import os

        from fdblucene_ray.ops.suffix import (
            build_suffix_registry,
            suffix_dup_spans_registry,
        )

        rng = np.random.default_rng(91)
        docs = _rand_docs(rng, 8, alpha=3)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(
                        np.arange(len(docs), dtype=np.int64)
                    ),
                    "text": pa.array(docs, pa.string()),
                }
            )
        )
        reg = str(tmp_path / "reg")
        assert build_suffix_registry(ds, reg, min_len=6) is True
        # simulate the crash state: seeds present, meta gone
        os.remove(os.path.join(reg, "registry.json"))
        assert build_suffix_registry(ds, reg, min_len=6) is True
        got = (
            suffix_dup_spans_registry(ds, reg)
            .to_pandas()
            .sort_values(["doc_id", "span_start"])
        )
        want = _brute_spans2(docs, 6)
        assert len(got) == len(want)


class TestPipelineProperty:
    def test_random_corpora_random_params(self, ray_session):
        """Hypothesis over the WHOLE pipeline: random small-alphabet
        corpora, random (L, min_df) — spans equal brute force."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        @settings(
            max_examples=8, deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        @given(
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=3, max_value=15),
            st.sampled_from([2, 3]),
        )
        def check(seed, L, min_df):
            rng = np.random.default_rng(seed)
            docs = _rand_docs(rng, 8, alpha=3, lo=10, hi=80)
            assert _run(docs, L, min_df=min_df) == _brute_spans2(
                docs, L, min_df=min_df
            ), (seed, L, min_df)

        check()


class TestDedupRegistryFacade:
    def test_build_append_query(self, ray_session, tmp_path):
        from fdblucene_ray.api import DedupRegistry

        rng = np.random.default_rng(97)
        base = _rand_docs(rng, 8, alpha=3)
        extra = _rand_docs(rng, 4, alpha=3)
        alldocs = base + extra

        def tab(docs, b=0):
            return pa.table(
                {"doc_id": pa.array(
                    np.arange(b, b + len(docs), dtype=np.int64)),
                 "text": pa.array(docs, pa.string())}
            )

        reg = DedupRegistry.build(
            ray.data.from_arrow(tab(base)), str(tmp_path / "r"),
            min_len=6,
        )
        assert reg.append(
            ray.data.from_arrow(tab(extra, len(base))), "b1"
        ) is True
        got = reg.dup_spans(
            ray.data.from_arrow(tab(alldocs))
        ).to_pandas()
        want = _brute_spans2(alldocs, 6)
        assert len(got) == len(want)


class TestScrubUtf8Safety:
    def test_multibyte_boundaries_stay_valid(self, ray_session):
        """Duplicated windows whose byte boundaries split multibyte
        characters: removal snaps OUTWARD to character starts, so
        every output is valid UTF-8 (a partially covered character is
        removed whole); ASCII corpora are byte-identical to the
        unsnapped semantics."""
        import hashlib

        filler = [
            hashlib.sha256(bytes([i])).hexdigest() for i in range(4)
        ]
        plant = "é漢字-DUPLICATED-SEGMENT-日本語é"
        docs = [
            filler[0] + plant + filler[1],
            plant + filler[2],
            filler[3],
        ]
        from fdblucene_ray.ops.suffix import scrub_suffix_spans

        for L in (5, 9, 14):
            ds = ray.data.from_arrow(
                pa.table(
                    {"doc_id": pa.array(
                        np.arange(len(docs), dtype=np.int64)),
                     "text": pa.array(docs, pa.string())}
                )
            ).repartition(2)
            t = pa.Table.from_pandas(
                scrub_suffix_spans(ds, min_len=L).to_pandas()
            ).sort_by("doc_id")
            # validate the RAW kept bytes: cast to binary (no
            # validation) and decode — an unaligned splice would
            # raise UnicodeDecodeError here
            raw = pc.cast(
                t["text"].combine_chunks(), pa.binary()
            ).to_pylist()
            for did, b in enumerate(raw):
                s = (b if isinstance(b, bytes) else b.encode()).decode(
                    "utf-8"
                )  # MUST be valid UTF-8
                orig = docs[did].encode("utf-8")
                n_rem = int(t["n_removed"][did].as_py())
                kept = len(
                    b if isinstance(b, bytes) else b.encode()
                )
                assert kept + n_rem == len(orig), (L, did)
            # the untouched doc is byte-identical with zero removed
            assert t["text"][2].as_py() == docs[2]
            assert t["n_removed"][2].as_py() == 0
            # and the duplicated plant was actually removed somewhere
            assert int(t["n_removed"][0].as_py()) > 0
