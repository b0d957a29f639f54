"""Training-data ops: oracles for dedup / similarity / text analysis.

Where SQL can't express the op (minhash, simhash, winnowing, IVF), the
oracle is either a planted-ground-truth corpus or a brute-force
reference computed here.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fdblucene_ray.ops.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_vs_anchor,
    simhash_fingerprints,
    simhash_near_pairs,
)
from fdblucene_ray.ops.similarity import brute_force_topk, ivf_topk
from fdblucene_ray.ops.textstats import fingerprints, lang_id, quality_scores


def _docs_table(rows):
    return pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array(rows, pa.string()),
        }
    )


@pytest.fixture
def planted(ray_session):
    """Corpus with planted exact and near duplicates."""
    base = [
        " ".join(f"w{(i * 7 + j) % 50}" for j in range(60)) for i in range(40)
    ]
    rows = list(base)
    rows.append(base[3])  # exact dup of 3 -> id 40
    rows.append(base[5])  # exact dup of 5 -> id 41
    near7 = base[7].split()
    near7[10] = "changed"
    rows.append(" ".join(near7))  # near dup of 7 -> id 42
    return ray.data.from_arrow(_docs_table(rows)), rows


class TestExactDedup:
    def test_planted_exact_dups(self, planted):
        ds, rows = planted
        out = exact_dedup(ds).to_pandas()
        assert len(out) == len(rows) - 2  # two exact dups collapse
        kept = set(out["doc_id"])
        assert 3 in kept and 40 not in kept
        assert 5 in kept and 41 not in kept
        assert out.loc[out.doc_id == 3, "dup_count"].iloc[0] == 2
        assert 42 in kept  # near-dup is NOT an exact dup

    def test_all_unique_passthrough(self, ray_session):
        ds = ray.data.from_arrow(_docs_table([f"unique text {i}" for i in range(20)]))
        out = exact_dedup(ds).to_pandas()
        assert sorted(out["doc_id"]) == list(range(20))
        assert (out["dup_count"] == 1).all()


class TestMinHash:
    def test_planted_near_dups_found(self, planted):
        ds, rows = planted
        pairs = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
        got = set(zip(pairs["a"], pairs["b"]))
        assert (3, 40) in got  # exact dups are jaccard-1 pairs
        assert (5, 41) in got
        assert (7, 42) in got  # near dup above threshold
        # jaccard values are exact (verified), not estimates
        j = pairs.set_index(["a", "b"])["jaccard"]
        assert j[(3, 40)] == 1.0
        assert 0.5 <= j[(7, 42)] < 1.0

    def test_no_false_pairs_on_distinct_corpus(self, ray_session):
        rows = [
            " ".join(f"t{i}_{j}" for j in range(30)) for i in range(30)
        ]
        ds = ray.data.from_arrow(_docs_table(rows))
        pairs = minhash_lsh_pairs(ds, threshold=0.8).to_pandas()
        assert len(pairs) == 0


class TestSimHash:
    def test_deterministic(self, planted):
        ds, _ = planted
        a = simhash_fingerprints(ds).to_pandas().sort_values("doc_id")
        b = simhash_fingerprints(ds).to_pandas().sort_values("doc_id")
        assert (a["simhash"].to_numpy() == b["simhash"].to_numpy()).all()

    def test_exact_dups_same_hash_and_near_pairs(self, planted):
        ds, _ = planted
        fp = simhash_fingerprints(ds).to_pandas().set_index("doc_id")["simhash"]
        assert fp[3] == fp[40]
        assert fp[5] == fp[41]
        pairs = simhash_near_pairs(ds, max_hamming=3)
        got = set(zip(pairs["a"].to_pylist(), pairs["b"].to_pylist()))
        assert (3, 40) in got and (5, 41) in got


class TestNgramJaccard:
    def test_anchor_self_is_one(self, planted):
        ds, rows = planted
        out = ngram_jaccard_vs_anchor(ds, rows[0]).to_pandas().set_index("doc_id")
        assert out.loc[0, "jaccard"] == 1.0
        assert (out["jaccard"] <= 1.0).all()
        # brute-force a couple of rows
        import re

        def sh(text):
            toks = re.findall(r"[0-9a-z_]+", text.lower())
            return {tuple(toks[i : i + 3]) for i in range(len(toks) - 2)}

        for d in [1, 7, 42]:
            a, b = sh(rows[0]), sh(rows[d])
            exp = len(a & b) / len(a | b) if a | b else 0.0
            assert out.loc[d, "jaccard"] == pytest.approx(exp, abs=1e-6)


class TestSimilarity:
    @pytest.fixture
    def vectors(self, ray_session):
        rng = np.random.default_rng(7)
        # 8 clusters of 40 vectors
        centers = rng.normal(size=(8, 16))
        vecs = np.concatenate(
            [c + 0.1 * rng.normal(size=(40, 16)) for c in centers]
        ).astype(np.float32)
        t = pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
            }
        )
        return ray.data.from_arrow(t), vecs

    def test_brute_force_matches_numpy(self, vectors):
        ds, vecs = vectors
        q = vecs[:2].astype(np.float64)
        out = brute_force_topk(ds, q, [0, 1], k=5).to_pandas()
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        for qi in range(2):
            qn = q[qi] / np.linalg.norm(q[qi])
            sims = vn @ qn
            exp = np.argsort(-sims, kind="stable")[:5]
            got = out[out.query_id == qi].sort_values(
                ["sim", "vec_id"], ascending=[False, True]
            )["vec_id"].to_numpy()
            assert set(got) == set(exp)

    def test_ivf_recall(self, vectors):
        ds, vecs = vectors
        ids = [0, 50, 100]
        q = vecs[ids].astype(np.float64)
        exact = brute_force_topk(ds, q, ids, k=10).to_pandas()
        approx = ivf_topk(ds, q, ids, k=10, n_centroids=8, nprobe=3).to_pandas()
        for qid in ids:
            e = set(exact[exact.query_id == qid]["vec_id"])
            a = set(approx[approx.query_id == qid]["vec_id"])
            assert len(e & a) / len(e) >= 0.9, qid

    def test_ivf_indexed_prunes_partitions(self, vectors, tmp_path):
        """The partitioned IVF layout reads ONLY probed centroid
        partitions (I/O pruning at the source, not a full-scan filter)
        and still meets the recall bar."""
        import os

        from fdblucene_ray.ops.similarity import (
            build_ivf_index,
            ivf_topk_indexed,
            probed_partition_paths,
        )

        ds, vecs = vectors
        out = str(tmp_path / "ivf")
        cents = build_ivf_index(ds, out, n_centroids=8)
        assert cents.shape[0] == 8
        parts = sorted(os.listdir(os.path.join(out, "data")))
        assert len(parts) >= 3 and all(p.startswith("centroid=") for p in parts)

        ids = [0, 50, 100]
        q = vecs[ids].astype(np.float64)
        probe, paths = probed_partition_paths(out, q, nprobe=2)
        assert probe.shape == (3, 2)
        # strictly fewer partition dirs opened than exist
        assert 0 < len(paths) < len(parts)
        probed_set = {int(p.rsplit("=", 1)[1]) for p in
                      (os.path.basename(x) for x in paths)}
        assert probed_set == set(int(c) for c in probe.flatten())

        exact = brute_force_topk(ds, q, ids, k=10).to_pandas()
        approx = ivf_topk_indexed(out, q, ids, k=10, nprobe=3).to_pandas()
        for qid in ids:
            e = set(exact[exact.query_id == qid]["vec_id"])
            a = set(approx[approx.query_id == qid]["vec_id"])
            assert len(e & a) / len(e) >= 0.9, qid

        # idempotent reuse: second build returns the same centroids
        cents2 = build_ivf_index(ds, out, n_centroids=8)
        assert np.array_equal(cents, cents2)

    def test_lsh_streaming_recall(self, vectors):
        from fdblucene_ray.ops.similarity import lsh_topk

        ds, vecs = vectors
        ids = [0, 50, 100]
        q = vecs[ids].astype(np.float64)
        exact = brute_force_topk(ds, q, ids, k=10).to_pandas()
        approx = lsh_topk(ds, q, ids, k=10, n_bits=8, nprobe=24).to_pandas()
        for qid in ids:
            e = set(exact[exact.query_id == qid]["vec_id"])
            a = set(approx[approx.query_id == qid]["vec_id"])
            assert len(e & a) / len(e) >= 0.9, qid

    def test_lsh_indexed_prunes_partitions(self, vectors, tmp_path):
        """The bucket-partitioned LSH layout reads ONLY probed bucket
        partitions and meets the recall bar; full probe == exact."""
        import os

        from fdblucene_ray.ops.similarity import (
            build_lsh_index,
            lsh_probe_paths,
            lsh_topk_indexed,
        )

        ds, vecs = vectors
        out = str(tmp_path / "lsh")
        planes = build_lsh_index(ds, out, n_bits=8)
        assert planes.shape == (8, 16)
        parts = sorted(os.listdir(os.path.join(out, "data")))
        assert len(parts) >= 3 and all(p.startswith("bucket=") for p in parts)

        ids = [0, 50, 100]
        q = vecs[ids].astype(np.float64)
        probe, paths = lsh_probe_paths(out, q, nprobe=8)
        assert probe.shape == (3, 8)
        # strictly fewer partition dirs opened than exist (occupied
        # buckets only: probe ids without data have no dir)
        assert 0 < len(paths) < len(parts)
        opened = {int(os.path.basename(x).rsplit("=", 1)[1]) for x in paths}
        assert opened <= {int(c) for c in probe.flatten()}

        exact = brute_force_topk(ds, q, ids, k=10).to_pandas()
        approx = lsh_topk_indexed(out, q, ids, k=10, nprobe=24).to_pandas()
        for qid in ids:
            e = set(exact[exact.query_id == qid]["vec_id"])
            a = set(approx[approx.query_id == qid]["vec_id"])
            assert len(e & a) / len(e) >= 0.9, qid

        # nprobe = 2**n_bits probes every bucket -> identical to exact
        full = lsh_topk_indexed(out, q, ids, k=10, nprobe=256).to_pandas()
        for qid in ids:
            e = exact[exact.query_id == qid].sort_values(
                ["sim", "vec_id"], ascending=[False, True])
            f = full[full.query_id == qid].sort_values(
                ["sim", "vec_id"], ascending=[False, True])
            assert list(e["vec_id"]) == list(f["vec_id"])

        # idempotent reuse: second build returns the same planes
        planes2 = build_lsh_index(ds, out, n_bits=8)
        assert np.array_equal(planes, planes2)


class TestTextStats:
    def test_lang_id_priority_and_counts(self, ray_session):
        rows = [
            "the cat and the dog of the house",  # en
            "der hund und die katze ist nicht da",  # de
            "le chat et la maison est une belle",  # fr
            "xyz qrs tuv",  # no markers -> en by priority
        ]
        out = lang_id(ray.data.from_arrow(_docs_table(rows))).to_pandas()
        out = out.sort_values("doc_id")
        assert list(out["pred_lang"]) == ["en", "de", "fr", "en"]

    def test_quality_scores_known_values(self, ray_session):
        rows = ["The cat sat!", ""]
        out = quality_scores(ray.data.from_arrow(_docs_table(rows))).to_pandas()
        r0 = out[out.doc_id == 0].iloc[0]
        assert r0["n_tokens"] == 3
        assert r0["stop_ratio"] == pytest.approx(round(1 / 3, 6))
        assert r0["punct_ratio"] == pytest.approx(round(1 / 12, 6))
        r1 = out[out.doc_id == 1].iloc[0]
        assert r1["n_tokens"] == 0 and r1["stop_ratio"] == 0.0

    def test_fingerprints_deterministic_and_shift_invariant(self, ray_session):
        text = " ".join(f"w{i % 23}" for i in range(100))
        rows = [text, "prefix " * 3 + text]
        out = fingerprints(
            ray.data.from_arrow(_docs_table(rows)), k=4, w=5
        ).to_pandas().set_index("doc_id")
        f0 = set(out.loc[0, "fingerprints"])
        f1 = set(out.loc[1, "fingerprints"])
        # winnowing guarantees high overlap for a shared long substring
        assert len(f0 & f1) / len(f0) > 0.8

    def test_fingerprints_match_per_doc_bruteforce(self, ray_session):
        """Whole-batch vectorized winnow == the textbook per-doc
        definition (sliding-window minima over kgram hashes, unique,
        sorted), across boundary doc lengths 0..2w+k tokens."""
        from fdblucene_ray.analysis.analyzer import BatchTokenizer
        from fdblucene_ray.ops.hashing import combine, hash_strings

        k, w = 4, 5
        rng = np.random.default_rng(11)
        rows = [
            " ".join(f"t{rng.integers(0, 6)}" for _ in range(L))
            for L in list(range(0, 2 * w + k + 2)) + [50, 100]
        ]
        out = (
            fingerprints(ray.data.from_arrow(_docs_table(rows)), k=k, w=w)
            .to_pandas()
            .set_index("doc_id")
        )
        tk = BatchTokenizer("simple")
        for doc, text in enumerate(rows):
            _, flat = tk.flat_tokens(pa.array([text]))
            th = hash_strings(flat)
            if len(th) >= k:
                m = len(th) - k + 1
                kg = th[:m].copy()
                for j in range(1, k):
                    kg = combine(kg, th[j : j + m])
            else:
                kg = np.empty(0, np.uint64)
            if len(kg) == 0:
                want = []
            elif len(kg) < w:
                want = [int(np.int64(kg.min().astype(np.int64)))]
            else:
                sw = np.lib.stride_tricks.sliding_window_view(kg, w)
                want = sorted(
                    int(v) for v in np.unique(sw.min(axis=1)).astype(np.int64)
                )
            got = list(out.loc[doc, "fingerprints"])
            assert got == want, (doc, len(flat))


class TestGopherRules:
    def test_rule_flags_on_crafted_docs(self, ray_session):
        from fdblucene_ray.ops.textstats import gopher_rules

        good = (
            "the quick brown fox jumps over that lazy dog and then "
            "walks away with some other words to have here "
        ) * 3  # ~60 words, clean prose, has the/that/and/to/with/have
        too_short = "the cat and to of"
        symbol_heavy = (
            "the " + "# " * 30 + " and that to of have with " * 8
        )
        bullets = "\n".join(["- item one the and to have"] * 10)
        numbers = ("123 456 789 " * 30) + "the and to have"
        rows = [good, too_short, symbol_heavy, bullets, numbers]
        out = (
            gopher_rules(ray.data.from_arrow(_docs_table(rows)))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert bool(out.loc[0, "keep"])
        assert not bool(out.loc[1, "keep"])  # n_words < 50
        assert out.loc[1, "n_words"] == 5
        assert not bool(out.loc[2, "keep"])  # symbol ratio
        assert out.loc[2, "symbol_ratio"] > 0.1
        assert not bool(out.loc[3, "keep"])  # bullet lines
        assert out.loc[3, "bullet_frac"] == 1.0
        assert not bool(out.loc[4, "keep"])  # alpha fraction
        assert out.loc[4, "alpha_frac"] < 0.8
        # required-stopword counting is DISTINCT membership
        assert out.loc[1, "n_req_stops"] == 4  # the, and, to, of

    def test_empty_and_ellipsis(self, ray_session):
        from fdblucene_ray.ops.textstats import gopher_rules

        rows = ["", "good line\nbad line...\nalso bad...\nfine here"]
        out = (
            gopher_rules(ray.data.from_arrow(_docs_table(rows)))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert out.loc[0, "n_words"] == 0 and not bool(out.loc[0, "keep"])
        assert abs(out.loc[1, "ellipsis_frac"] - 0.5) < 1e-9


class TestC4Rules:
    def test_line_and_doc_rules(self, ray_session):
        from fdblucene_ray.ops.textstats import c4_rules

        rows = [
            "This is a good sentence.\nAnother fine sentence here!\n"
            "And a third one, yes?\nno terminal punct\nok.",  # keeps 3
            # ("ok." fails the 3-word line minimum)
            "Uses javascript for menus.\nGood line stays here.\n"
            "Another keeper sentence.\nThird keeper sentence.",
            "fine sentence one.\nfine sentence two.\nfine sentence "
            "three.\nbut { a brace } kills the doc.",
            "Has Lorem Ipsum dolor sit.\nGood one here.\nGood two "
            "here.\nGood three here.",
            "too.\nshort.\nlines.",  # <3 words per line -> 0 kept
        ]
        out = (
            c4_rules(ray.data.from_arrow(_docs_table(rows)))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert bool(out.loc[0, "keep"]) and out.loc[0, "n_kept_lines"] == 3
        assert "no terminal punct" not in out.loc[0, "clean_text"]
        # javascript drops the LINE, not the doc
        assert bool(out.loc[1, "keep"]) and out.loc[1, "n_kept_lines"] == 3
        assert bool(out.loc[1, "has_js"])
        assert not bool(out.loc[2, "keep"]) and bool(out.loc[2, "has_brace"])
        assert not bool(out.loc[3, "keep"]) and bool(out.loc[3, "has_lorem"])
        assert not bool(out.loc[4, "keep"])
        assert out.loc[4, "n_kept_lines"] == 0
        assert out.loc[4, "clean_text"] == ""


class TestEmbeddingNearDup:
    def test_planted_near_dup_vectors(self, ray_session):
        rng = np.random.default_rng(3)
        base = rng.normal(size=(50, 16)).astype(np.float32)
        vecs = list(base)
        vecs.append(base[7] + 0.01 * rng.normal(size=16).astype(np.float32))  # ~dup of 7 -> 50
        vecs.append(base[12] * 2.0)  # scaled copy of 12 (cos=1) -> 51
        t = pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            }
        )
        from fdblucene_ray.ops.similarity import embedding_near_dups

        ds = ray.data.from_arrow(t)
        exact = embedding_near_dups(ds, threshold=0.98, exact=True).to_pandas()
        got = set(zip(exact["a"], exact["b"]))
        assert (7, 50) in got and (12, 51) in got
        # bucketed scale path finds the same planted pairs
        bucketed = embedding_near_dups(
            ds, threshold=0.98, n_centroids=4, sample_rows=52
        ).to_pandas()
        gb = set(zip(bucketed["a"], bucketed["b"]))
        assert (7, 50) in gb and (12, 51) in gb
        assert gb <= got  # bucketing never invents pairs

    def test_tiled_pairs_identical_to_direct(self):
        """Tiling is an exact memory optimization: pair set and rounded
        sims match the one-shot n x n matmul on a moderate bucket."""
        from fdblucene_ray.ops.similarity import _BucketPairs

        rng = np.random.default_rng(9)
        base = rng.normal(size=(300, 12))
        # plant clusters so many pairs cross tile boundaries
        vecs = np.concatenate(
            [base, base[::3] + 0.001 * rng.normal(size=(100, 12))]
        )
        t = pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float64())
                ),
            }
        )
        direct = _BucketPairs(0.98, "embedding", "vec_id", tile=10**9)(t)
        tiled = _BucketPairs(0.98, "embedding", "vec_id", tile=64)(t)
        d = direct.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        g = tiled.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        assert len(d) >= 100
        assert d.equals(g)

    def test_hot_bucket_stays_bounded(self):
        """One bucket of 100k near-identical vectors (the 100-TB OOM
        scenario): peak similarity-matrix tile stays <= tile rows, the
        bucket is split into id-hash parts, drops are counted, and the
        mega-cluster remains connected for union-find."""
        from fdblucene_ray.ops.similarity import _BucketPairs

        rng = np.random.default_rng(4)
        center = rng.normal(size=32)
        center /= np.linalg.norm(center)
        n = 100_000
        vecs = center[None, :] + 1e-4 * rng.normal(size=(n, 32))
        t = pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs.astype(np.float32)],
                    pa.list_(pa.float32()),
                ),
            }
        )
        # tiny caps so the test exercises the split without 5e9 pairs:
        # threshold above any actual sim -> zero output rows, but every
        # comparison in every part is still executed.
        bp = _BucketPairs(
            1.1, "embedding", "vec_id", tile=512, hard_cap=2048
        )
        out = bp(t)
        assert out.num_rows == 0
        st = bp.last_stats
        assert st["rows"] == n
        assert st["parts"] == -(-n // 2048)
        assert st["max_tile_rows"] <= 512
        assert st["dropped_comparisons"] > 0  # logged, not silent
        # connectivity: with a real threshold on a small planted slice,
        # intra-part pairs keep the cluster connected per part
        bp2 = _BucketPairs(
            0.99, "embedding", "vec_id", tile=512, hard_cap=2048
        )
        small = t.slice(0, 5000)
        pairs = bp2(small).to_pandas()
        ids_seen = set(pairs["a"]).union(pairs["b"])
        assert len(ids_seen) == 5000  # every member linked to its part


class TestSemanticDedup:
    def _table(self):
        rng = np.random.default_rng(5)
        base = rng.normal(size=(60, 16))
        vecs = list(base)
        # plant dup groups: 3 near-copies of base[4], a scaled copy of 9
        vecs.append(base[4] + 0.004 * rng.normal(size=16))  # id 60
        vecs.append(base[4] + 0.004 * rng.normal(size=16))  # id 61
        vecs.append(base[9] * 3.0)                          # id 62
        arr = np.array(vecs)
        t = pa.table(
            {
                "vec_id": pa.array(range(len(arr)), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in arr], pa.list_(pa.float64())
                ),
            }
        )
        return arr, t

    def _brute(self, arr, n_centroids, threshold):
        """Brute-force SemDeDup: all-pairs components, keep the member
        farthest from its (same deterministic k-means) centroid."""
        from fdblucene_ray.ops.similarity import _normalize, train_centroids

        x = _normalize(arr)
        cents = train_centroids(arr, n_centroids)
        cent_sim = (x @ _normalize(cents).T).max(axis=1)
        n = len(arr)
        parent = list(range(n))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        sims = x @ x.T
        pair_list = []
        for i in range(n):
            for j in range(i + 1, n):
                if sims[i, j] >= threshold:
                    pair_list.append((i, j))
                    parent[find(i)] = find(j)
        comps: dict[int, list[int]] = {}
        for i in range(n):
            comps.setdefault(find(i), []).append(i)
        dropped = set()
        for members in comps.values():
            if len(members) > 1:
                keep = min(members, key=lambda m: (cent_sim[m], m))
                dropped |= set(members) - {keep}
        return pair_list, dropped

    def test_exact_matches_bruteforce_policy(self, ray_session):
        from fdblucene_ray.ops.similarity import semantic_dedup

        arr, t = self._table()
        pair_list, dropped = self._brute(arr, 4, 0.98)
        assert len(pair_list) >= 3  # the planted groups produced pairs
        out = semantic_dedup(
            ray.data.from_arrow(t), threshold=0.98,
            n_centroids=4, sample_rows=len(arr), exact=True,
        ).to_pandas()
        assert set(out["vec_id"]) == set(range(len(arr))) - dropped

    def test_scale_path_drops_planted_groups(self, ray_session):
        """Bucketed path: near-identical vectors share a centroid, so
        each planted group keeps exactly its farthest-from-centroid
        member; untouched vectors all survive."""
        from fdblucene_ray.ops.similarity import semantic_dedup

        arr, t = self._table()
        _, dropped = self._brute(arr, 4, 0.98)
        out = semantic_dedup(
            ray.data.from_arrow(t), threshold=0.98,
            n_centroids=4, sample_rows=len(arr),
        ).to_pandas()
        kept = set(out["vec_id"])
        # bucketing can only MISS pairs (never invent them): kept is a
        # superset of the exact kept set and planted groups are caught
        assert kept >= set(range(len(arr))) - dropped
        planted = [{4, 60, 61}, {9, 62}]
        for grp in planted:
            assert len(kept & grp) == 1, grp


class TestDedupKeepList:
    def test_components_union_find(self, ray_session):
        import pyarrow as pa

        from fdblucene_ray.ops.dedup import dedup_components, near_dedup_drop_list

        pairs = pa.table(
            {
                "a": pa.array([1, 2, 10, 11, 30], pa.int64()),
                "b": pa.array([2, 3, 11, 12, 31], pa.int64()),
            }
        )
        comp = dedup_components(pairs).to_pandas().set_index("doc_id")["keep_id"]
        assert comp[1] == comp[2] == comp[3] == 1
        assert comp[10] == comp[11] == comp[12] == 10
        assert comp[30] == comp[31] == 30
        drop = near_dedup_drop_list(pairs)
        assert drop.tolist() == [2, 3, 11, 12, 31]

    def test_end_to_end_planted(self, planted, ray_session):
        """near_dedup_corpus keeps exactly one representative per
        planted near-dup cluster and every unique doc."""
        ds, texts = planted
        from fdblucene_ray.ops.dedup import near_dedup_corpus

        out = near_dedup_corpus(ds, threshold=0.8)
        kept = sorted(out.select_columns(["doc_id"]).to_pandas()["doc_id"])
        n_docs = len(texts)
        assert len(kept) < n_docs           # something was dropped
        assert all(isinstance(k, (int, np.integer)) for k in kept)
        # representatives are component minima: every kept id is the
        # smallest of its cluster, so dropping any kept doc's text dup
        # partner keeps the min
        from fdblucene_ray.ops.dedup import minhash_lsh_pairs, near_dedup_drop_list

        pairs = minhash_lsh_pairs(ds, threshold=0.8)
        drop = set(near_dedup_drop_list(pairs).tolist())
        assert set(range(n_docs)) - drop == set(kept)


class TestKMeansDistributed:
    def test_matches_driver_kmeans_on_same_data(self, ray_session):
        """Distributed full-pass Lloyd's == driver-side train_centroids
        when the 'corpus' fits the init sample (same seeded init, same
        update rule) — up to partial-sum association order (1e-9)."""
        from fdblucene_ray.ops.similarity import (
            train_centroids,
            train_centroids_distributed,
        )

        rng = np.random.default_rng(5)
        vecs = rng.normal(size=(300, 12)).astype(np.float64)
        t = pa.table(
            {
                "vec_id": pa.array(range(300), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float64())
                ),
            }
        )
        got = train_centroids_distributed(
            ray.data.from_arrow(t), 8, iters=6, init_sample=300
        )
        want = train_centroids(vecs, 8, iters=6)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_ivf_layout_with_distributed_training(self, ray_session, tmp_path):
        from fdblucene_ray.ops.similarity import build_ivf_index, ivf_topk_indexed

        rng = np.random.default_rng(9)
        vecs = rng.normal(size=(200, 8)).astype(np.float64)
        t = pa.table(
            {
                "vec_id": pa.array(range(200), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float64())
                ),
            }
        )
        d = str(tmp_path / "ivf_dist")
        cents = build_ivf_index(
            ray.data.from_arrow(t), d, n_centroids=8, train="distributed"
        )
        assert cents.shape == (8, 8)
        # probing everything = exact: compare against brute force
        q = vecs[:2]
        out = ivf_topk_indexed(d, q, [0, 1], k=5, nprobe=8).to_pandas()
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = qn @ vn.T
        for qi in (0, 1):
            order = np.lexsort((np.arange(200), -np.round(sims[qi], 12)))[:5]
            got = out[out.query_id == qi].sort_values(
                ["sim", "vec_id"], ascending=[False, True]
            )["vec_id"].tolist()
            assert got == [int(i) for i in order], qi


class TestSignificantTerms:
    def test_matches_bruteforce(self, ray_session):
        from collections import defaultdict

        from fdblucene_ray.ops.textstats import significant_terms

        rng = np.random.default_rng(13)
        texts, srcs = [], []
        for i in range(60):
            fg = i % 4 == 0
            toks = [f"w{int(x)}" for x in rng.integers(0, 15, 12)]
            if fg:
                toks += ["marker", "marker"]  # overrepresented in fg
            texts.append(" ".join(toks))
            srcs.append("fg" if fg else "bg")
        t = pa.table(
            {"doc_id": pa.array(range(60), pa.int64()),
             "text": pa.array(texts), "source": pa.array(srcs)}
        )
        out = significant_terms(
            ray.data.from_arrow(t), "source", "fg", n=10
        ).to_pandas()
        # brute force (simple analyzer == lowercase whitespace-ish split
        # on these alnum tokens)
        df_all, df_fg = defaultdict(int), defaultdict(int)
        n_all, n_fg = 60, sum(1 for s in srcs if s == "fg")
        for txt, s in zip(texts, srcs):
            for term in set(txt.split()):
                df_all[term] += 1
                if s == "fg":
                    df_fg[term] += 1
        scores = {}
        for term, fgc in df_fg.items():
            pf, pb = fgc / n_fg, df_all[term] / n_all
            scores[term] = (pf - pb) * pf / pb
        exp = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:10]
        assert list(out["term"]) == [t_ for t_, _ in exp]
        assert out["term"].iloc[0] == "marker"
        for got, (_, s) in zip(out["score"], exp):
            assert got == pytest.approx(round(s, 6), abs=1e-9)


class TestFertilityFunnel:
    TEXTS = [
        "short",                                   # tiny doc
        " ".join(f"w{i}" for i in range(40)),      # healthy, 40 distinct
        " ".join(["dup"] * 50),                    # repetitive (ratio 1/50)
        "x" * 300,                                 # one huge word
        " ".join(f"tok{i % 35}" for i in range(64)) + " " + "y" * 250,
    ]

    def _ds(self):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(self.TEXTS)), pa.int64()),
                    "text": pa.array(self.TEXTS),
                    "source": pa.array(
                        ["a", "a", "b", "b", "b"], pa.string()
                    ),
                }
            )
        ).repartition(2)

    def test_token_fertility_matches_bruteforce(self, ray_session):
        from fdblucene_ray.ops.textstats import token_fertility

        rows = {
            r["source"]: r
            for r in token_fertility(self._ds()).take_all()
        }
        import collections

        want = collections.defaultdict(lambda: [0, 0, 0])
        srcs = ["a", "a", "b", "b", "b"]
        for t, s in zip(self.TEXTS, srcs):
            toks = [x for x in t.split() if x]
            want[s][0] += 1
            want[s][1] += len(toks)
            want[s][2] += len(t)
        for s, (nd, nt, nc) in want.items():
            r = rows[s]
            assert (r["n_docs"], r["n_tokens"], r["n_chars"]) == (nd, nt, nc)
            assert r["chars_per_token"] == round(nc / nt, 6)

    def test_filter_funnel_first_fail_attribution(self, ray_session):
        from fdblucene_ray.ops.textstats import filter_funnel

        rows = {
            r["stage"]: r["n_docs"]
            for r in filter_funnel(
                self._ds(), min_chars=100, min_tokens=30,
                max_word_len=25, min_distinct_ratio=0.3,
            ).take_all()
        }
        # doc0: 5 chars -> min_chars; doc1: 40 toks distinct -> but
        # n_chars = len(doc1) >= 100? "w0 ... w39" ~ 150 chars -> pass
        # doc2: 50 toks 199 chars -> chars>=100, toks>=30, max word 3,
        #       ratio 1/50 -> distinct_ratio
        # doc3: 300 chars, 1 tok -> min_tokens
        # doc4: 64+1 toks, one 250-char word -> max_word_len
        assert rows == {
            "min_chars": 1,
            "min_tokens": 1,
            "max_word_len": 1,
            "distinct_ratio": 1,
            "pass": 1,
        }


class TestFilteredKnn:
    def test_prefilter_restricts_candidate_pool(self, ray_session):
        rng = np.random.default_rng(11)
        vecs = rng.normal(size=(200, 8)).astype(np.float32)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(200), pa.int64()),
                    "embedding": pa.array(
                        vecs.tolist(), pa.list_(pa.float32())
                    ),
                }
            )
        ).repartition(4)
        from fdblucene_ray.ops.similarity import brute_force_topk, filtered_topk

        allowed = np.arange(0, 200, 3, dtype=np.int64)  # every 3rd id
        q = vecs[:1].astype(np.float64)
        got = filtered_topk(ds, q, [0], allowed, k=7).to_pandas()
        # every hit is in the allowed set
        assert set(got.vec_id).issubset(set(allowed.tolist()))
        # equals brute force over the allowed subset only
        mask = np.zeros(200, bool)
        mask[allowed] = True
        sub = pa.table(
            {
                "vec_id": pa.array(np.arange(200)[mask], pa.int64()),
                "embedding": pa.array(
                    vecs[mask].tolist(), pa.list_(pa.float32())
                ),
            }
        )
        want = brute_force_topk(
            ray.data.from_arrow(sub), q, [0], k=7
        ).to_pandas()
        assert got.vec_id.tolist() == want.vec_id.tolist()
        assert got.sim.tolist() == want.sim.tolist()

    def test_full_filter_equals_unfiltered(self, ray_session):
        rng = np.random.default_rng(12)
        vecs = rng.normal(size=(60, 6)).astype(np.float32)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(60), pa.int64()),
                    "embedding": pa.array(
                        vecs.tolist(), pa.list_(pa.float32())
                    ),
                }
            )
        )
        from fdblucene_ray.ops.similarity import brute_force_topk, filtered_topk

        q = vecs[:1].astype(np.float64)
        a = filtered_topk(ds, q, [0], np.arange(60), k=5).to_pandas()
        b = brute_force_topk(ds, q, [0], k=5).to_pandas()
        assert a.vec_id.tolist() == b.vec_id.tolist()


class TestNearDedupKeepBest:
    def test_quality_policy_keeps_best_member(self, ray_session):
        # 3 near-dup variants of one base doc + unrelated docs; quality
        # deliberately INVERTS id order so min-id and keep-best differ
        base = " ".join(f"w{(j * 11) % 70}" for j in range(80))
        v1 = base.split(); v1[5] = "alpha"
        v2 = base.split(); v2[9] = "beta"
        rows = [base, " ".join(v1), " ".join(v2)] + [
            " ".join(f"u{i}x{j}" for j in range(60)) for i in range(5)
        ]
        quality = [1.0, 9.0, 5.0, 2, 2, 2, 2, 2]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(rows)), pa.int64()),
                    "text": pa.array(rows, pa.string()),
                    "q": pa.array(
                        [float(x) for x in quality], pa.float64()
                    ),
                }
            )
        ).repartition(2)
        from fdblucene_ray.ops.dedup import near_dedup_corpus

        out = near_dedup_corpus(
            ds, threshold=0.7, quality_col="q"
        ).to_pandas()
        kept = set(out["doc_id"])
        # doc 1 (quality 9) survives its component; 0 and 2 are dropped
        assert 1 in kept and 0 not in kept and 2 not in kept
        assert kept.issuperset({3, 4, 5, 6, 7})

    def test_min_id_policy_unchanged_without_quality(self, ray_session):
        base = " ".join(f"w{(j * 11) % 70}" for j in range(80))
        v1 = base.split(); v1[5] = "alpha"
        rows = [base, " ".join(v1)]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([10, 20], pa.int64()),
                    "text": pa.array(rows, pa.string()),
                }
            )
        )
        from fdblucene_ray.ops.dedup import near_dedup_corpus

        out = near_dedup_corpus(ds, threshold=0.7).to_pandas()
        assert sorted(out["doc_id"]) == [10]

    def test_score_tie_falls_back_to_min_id(self, ray_session):
        from fdblucene_ray.ops.dedup import near_dedup_drop_list

        pairs = pa.table(
            {"a": pa.array([1, 2], pa.int64()),
             "b": pa.array([2, 3], pa.int64())}
        )
        drop = near_dedup_drop_list(
            pairs, scores={1: 4.0, 2: 4.0, 3: 4.0}
        )
        assert sorted(drop.tolist()) == [2, 3]


class TestSQ8:
    def test_codes_match_bruteforce(self, ray_session):
        rng = np.random.default_rng(9)
        X = rng.normal(size=(150, 6)).astype(np.float32)
        X[:, 3] = 2.5  # constant dim -> code 0
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(150), pa.int64()),
                    "embedding": pa.array(X.tolist(), pa.list_(pa.float32())),
                }
            )
        ).repartition(5)
        from fdblucene_ray.ops.similarity import sq8_params, sq8_quantize

        mn, mx = sq8_params(ds)
        Xd = X.astype(np.float64)
        assert np.array_equal(mn, Xd.min(axis=0))
        assert np.array_equal(mx, Xd.max(axis=0))
        rows = {r["vec_id"]: np.asarray(r["codes"]) for r in sq8_quantize(ds).take_all()}
        span = mx - mn
        safe = np.where(span > 0, span, 1.0)
        want = np.clip(np.floor((Xd - mn) / safe * 256.0), 0, 255)
        want[:, span <= 0] = 0
        for i in range(150):
            assert np.array_equal(rows[i], want[i].astype(np.uint8)), i
        # max-value rows code to 255 (clip), min to 0
        for d in [0, 1, 2, 4, 5]:
            i_max = int(np.argmax(Xd[:, d]))
            i_min = int(np.argmin(Xd[:, d]))
            assert rows[i_max][d] == 255
            assert rows[i_min][d] == 0

    def test_supplied_params_reused(self, ray_session):
        X = np.array([[0.0], [1.0], [2.0]], np.float32)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([0, 1, 2], pa.int64()),
                    "embedding": pa.array(X.tolist(), pa.list_(pa.float32())),
                }
            )
        )
        from fdblucene_ray.ops.similarity import sq8_quantize

        rows = {
            r["vec_id"]: list(r["codes"])
            for r in sq8_quantize(
                ds, params=(np.array([0.0]), np.array([4.0]))
            ).take_all()
        }
        assert rows == {0: [0], 1: [64], 2: [128]}


class TestSourceKL:
    def test_matches_bruteforce(self, ray_session):
        texts = ["a a b", "a b c", "c c c c", "a a a b b"]
        srcs = ["x", "x", "y", "y"]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts),
                    "source": pa.array(srcs, pa.string()),
                }
            )
        ).repartition(2)
        from fdblucene_ray.ops.textstats import source_divergence

        out = {r["source"]: r for r in source_divergence(ds).to_pylist()}
        import collections, math

        cnt = collections.defaultdict(collections.Counter)
        for t, s in zip(texts, srcs):
            cnt[s].update(t.split())
        corpus = collections.Counter()
        for c in cnt.values():
            corpus.update(c)
        N = sum(corpus.values())
        for s, c in cnt.items():
            n = sum(c.values())
            kl = sum(
                (v / n) * math.log((v / n) / (corpus[t] / N))
                for t, v in c.items()
            )
            assert out[s]["n_tokens"] == n
            assert out[s]["kl"] == pytest.approx(round(kl, 6), abs=2e-6)

    def test_identical_distribution_is_zero(self, ray_session):
        # both sources have the same distribution -> KL == 0
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(["a b", "a b", "a b", "a b"]),
                    "source": pa.array(["x", "x", "y", "y"]),
                }
            )
        )
        from fdblucene_ray.ops.textstats import source_divergence

        out = source_divergence(ds)
        assert out["kl"].to_pylist() == [0.0, 0.0]


class TestHardNegatives:
    def test_labels_always_differ_and_match_bruteforce(self, ray_session):
        rng = np.random.default_rng(13)
        V = rng.normal(size=(120, 8)).astype(np.float32)
        lab = (np.arange(120) % 4).astype(np.int32)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(120), pa.int64()),
                    "embedding": pa.array(V.tolist(), pa.list_(pa.float32())),
                    "label": pa.array(lab),
                }
            )
        ).repartition(3)
        from fdblucene_ray.ops.similarity import hard_negatives

        out = hard_negatives(ds, [0, 5], k=6).to_pandas()
        Vn = V.astype(np.float64)
        Vn /= np.linalg.norm(Vn, axis=1, keepdims=True)
        for qi in [0, 5]:
            rows = out[out.query_id == qi]
            assert (lab[rows.vec_id.to_numpy()] != lab[qi]).all()
            sims = Vn @ Vn[qi]
            cand = np.flatnonzero(lab != lab[qi])
            order = cand[np.lexsort((cand, -sims[cand]))][:6]
            got = rows.sort_values(
                ["sim", "vec_id"], ascending=[False, True]
            ).vec_id.to_numpy()
            assert set(got) == set(order)


class TestCompressionRatio:
    def test_repetitive_compresses_more_than_random(self, ray_session):
        rng = np.random.default_rng(17)
        rand = " ".join(
            "".join(rng.choice(list("abcdefghijklmnop"), 8)) for _ in range(100)
        )
        rep = "spam ham " * 400
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array([rand, rep]),
                }
            )
        )
        from fdblucene_ray.ops.textstats import compression_ratio

        rows = {r["doc_id"]: r for r in compression_ratio(ds).take_all()}
        assert rows[1]["ratio"] < 0.1 < rows[0]["ratio"]
        # ratio replays exactly (deterministic level)
        import zlib

        assert rows[0]["c_bytes"] == len(zlib.compress(rand.encode(), 6))
        assert rows[0]["n_bytes"] == len(rand.encode())

    def test_empty_text_ratio_one(self, ray_session):
        ds = ray.data.from_arrow(
            pa.table(
                {"doc_id": pa.array([0], pa.int64()),
                 "text": pa.array([""])}
            )
        )
        from fdblucene_ray.ops.textstats import compression_ratio

        r = compression_ratio(ds).take_all()[0]
        assert r["n_bytes"] == 0 and r["ratio"] == 1.0


class TestNearDupProbe:
    def test_probe_finds_planted_near_dup(self, tmp_path, ray_session):
        rng = np.random.default_rng(7)
        base = " ".join(f"w{(i * 13) % 80}" for i in range(100))
        texts = [
            " ".join(rng.choice([f"u{i}{j}" for j in range(50)], 60))
            for i in range(60)
        ]
        texts[17] = base
        ds = ray.data.from_arrow(_docs_table(texts)).repartition(4)
        from fdblucene_ray.ops.dedup import build_neardup_index, probe_neardup

        d = str(tmp_path / "ndix")
        build_neardup_index(ds, d)
        q = base.split()
        q[5] = "changed"
        out = probe_neardup(
            d, [" ".join(q), "completely different text entirely"],
            min_est_jaccard=0.4,
        ).to_pylist()
        assert [(r["query_idx"], r["doc_id"]) for r in out] == [(0, 17)]
        assert out[0]["est_jaccard"] > 0.8

    def test_exact_copy_estimates_one(self, tmp_path, ray_session):
        texts = [f"doc {i} " + " ".join(f"t{i}{j}" for j in range(40))
                 for i in range(20)]
        ds = ray.data.from_arrow(_docs_table(texts))
        from fdblucene_ray.ops.dedup import build_neardup_index, probe_neardup

        d = str(tmp_path / "ndix2")
        build_neardup_index(ds, d)
        out = probe_neardup(d, [texts[7]], min_est_jaccard=0.9).to_pylist()
        assert [(r["doc_id"], r["est_jaccard"]) for r in out] == [(7, 1.0)]

    def test_empty_and_novel_queries(self, tmp_path, ray_session):
        texts = [f"x{i} y{i} z{i} w{i} v{i}" for i in range(10)]
        ds = ray.data.from_arrow(_docs_table(texts))
        from fdblucene_ray.ops.dedup import build_neardup_index, probe_neardup

        d = str(tmp_path / "ndix3")
        build_neardup_index(ds, d)
        assert probe_neardup(d, [""]).num_rows == 0
        assert probe_neardup(d, ["totally novel unseen content here"]).num_rows == 0


class TestSq8Store:
    def test_stored_serving_equals_on_the_fly(
        self, ray_session, tmp_path
    ):
        """The at-rest code store serves identically to quantizing on
        the fly (same params, same reconstruct arithmetic), reuses an
        existing store, and never reads the float column at query
        time (the store holds only id + codes)."""
        import pyarrow as pa

        from fdblucene_ray.ops.similarity import (
            build_sq8_store,
            sq8_topk,
            sq8_topk_stored,
        )

        rng = np.random.default_rng(41)
        vecs = rng.normal(size=(400, 12)).astype(np.float32)
        import ray.data as rd

        ds = rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(
                        np.arange(400, dtype=np.int64)
                    ),
                    "embedding": pa.array(
                        [v for v in vecs], pa.list_(pa.float32())
                    ),
                }
            )
        )
        q = rng.normal(size=(4, 12))
        a = sq8_topk(ds, q, np.arange(4), k=8).to_pandas()
        store = str(tmp_path / "sq8")
        mn, mx = build_sq8_store(ds, store)
        b = sq8_topk_stored(store, q, np.arange(4), k=8).to_pandas()
        assert a[["query_id", "vec_id"]].values.tolist() == \
            b[["query_id", "vec_id"]].values.tolist()
        assert np.allclose(a["sim"], b["sim"])
        # idempotent reuse returns the SAME params
        mn2, mx2 = build_sq8_store(ds, store)
        assert np.array_equal(mn, mn2) and np.array_equal(mx, mx2)
        # the store schema holds codes only — no float payload at rest
        import glob
        import os

        import pyarrow.parquet as pq

        f = glob.glob(os.path.join(store, "codes", "*.parquet"))[0]
        names = pq.ParquetFile(f).schema_arrow.names
        assert set(names) == {"vec_id", "codes"}
