"""In-place numeric doc-values updates (Lucene updateNumericDocValue
analog, index/docvalues.py): sidecar generations, last-write-wins
coalescing, overlay read paths (sort-by-field + function-score),
commit-point pinning, and merge-time folding into the docstore."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.index.build import build_index, hydrate
from fdblucene_ray.index.docvalues import (
    gc_dv_files,
    load_dv_overlay,
    overlay_values,
    update_numeric_docvalues,
)
from fdblucene_ray.index.manifest import load_manifest
from fdblucene_ray.index.merge import merge_segments_inplace
from fdblucene_ray.index.search import Searcher

N = 50
TEXTS = [
    f"data merge {'join ' * (i % 3)}window batch value stream t{i:03d}"
    for i in range(N)
]
NCHARS = [100 + 3 * i for i in range(N)]
FIELDS = {"text": {"column": "text", "analyzer": "simple"}}


def _write_corpus(d):
    t = pa.table(
        {
            "doc_id": pa.array(list(range(N)), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
            "n_chars": pa.array(NCHARS, pa.int64()),
        }
    )
    p = str(d / "c.parquet")
    pq.write_table(t, p)
    return p


@pytest.fixture(scope="module")
def dv_ix(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("dv")
    src = _write_corpus(d)
    ix = str(d / "ix")
    build_index(
        src, ix, fields=FIELDS, num_partitions=4, batch_size=16,
        docstore_cols=["n_chars"],
    )
    return ix, src


def _expected(updates: dict[int, float]) -> list[float]:
    return [float(updates.get(i, NCHARS[i])) for i in range(N)]


class TestOverlayKernel:
    def test_overlay_values_patches_hits_only(self):
        ids = np.array([5, 1, 9, 30], np.int64)
        vals = np.array([0.5, 0.1, 0.9, 3.0])
        ov_ids = np.array([1, 9, 40], np.int64)
        ov_vals = np.array([11.0, 99.0, 7.0])
        out = overlay_values(ids, vals, ov_ids, ov_vals)
        assert out.tolist() == [0.5, 11.0, 99.0, 3.0]
        # original untouched
        assert vals.tolist() == [0.5, 0.1, 0.9, 3.0]

    def test_empty_overlay_is_identity(self):
        ids = np.array([1, 2], np.int64)
        vals = np.array([1.0, 2.0])
        out = overlay_values(
            ids, vals, np.empty(0, np.int64), np.empty(0, np.float64)
        )
        assert out.tolist() == [1.0, 2.0]


class TestUpdatePublish:
    def test_update_publishes_generation_and_overlay_reads(self, dv_ix):
        ix, _ = dv_ix
        v0 = load_manifest(ix).version
        m = update_numeric_docvalues(ix, "n_chars", {3: 1000.0, 10: 2000.0})
        assert m.version == v0 + 1
        ids, vals = load_dv_overlay(ix, "n_chars")
        assert ids.tolist() == [3, 10]
        assert vals.tolist() == [1000.0, 2000.0]

    def test_idempotent_republish_skips(self, dv_ix):
        ix, _ = dv_ix
        m1 = update_numeric_docvalues(ix, "n_chars", {3: 1000.0, 10: 2000.0})
        m2 = update_numeric_docvalues(ix, "n_chars", {3: 1000.0, 10: 2000.0})
        assert m2.version == m1.version

    def test_last_write_wins_coalesce(self, dv_ix):
        ix, _ = dv_ix
        update_numeric_docvalues(ix, "n_chars", {10: 5000.0, 20: 7000.0})
        ids, vals = load_dv_overlay(ix, "n_chars")
        got = dict(zip(ids.tolist(), vals.tolist()))
        # 3 survives from the earlier generation, 10 is overwritten
        assert got == {3: 1000.0, 10: 5000.0, 20: 7000.0}

    def test_commit_point_pins_pre_update_values(self, dv_ix):
        ix, _ = dv_ix
        from fdblucene_ray.index.manifest import list_commits

        first = list_commits(ix)[0]
        old = load_manifest(ix, first)
        ids, _ = load_dv_overlay(ix, "n_chars", old)
        assert len(ids) == 0  # pre-update snapshot sees no overlay

    def test_stats_and_postings_untouched(self, dv_ix):
        ix, _ = dv_ix
        s = Searcher(ix)
        dc, sttf, _ = s.field_stats("text")
        assert dc == N
        assert s.search_terms(["data"], 5)  # postings still serve


class TestReadPaths:
    UPD = {i: float(10_000 + i) for i in range(0, N, 7)}

    @pytest.fixture(scope="class")
    def updated(self, dv_ix):
        ix, src = dv_ix
        update_numeric_docvalues(ix, "n_chars", self.UPD)
        return ix, src

    def test_sort_by_field_sees_updates(self, updated):
        ix, src = updated
        s = Searcher(ix)
        rows = s.search_sort_by(
            "data", k=10, value_source=src, value_col="n_chars",
            dv_field="n_chars",
        )
        ids, vals = load_dv_overlay(ix, "n_chars")
        cur = dict(zip(ids.tolist(), vals.tolist()))
        exp_vals = [(i, cur.get(i, float(NCHARS[i]))) for i in range(N)]
        exp = sorted(exp_vals, key=lambda t: (-t[1], t[0]))[:10]
        assert rows == [(int(d), float(v)) for d, v in exp]

    def test_feature_and_distance_queries_see_updates(self, updated):
        ix, src = updated
        s = Searcher(ix)
        ids, vals = load_dv_overlay(ix, "n_chars")
        cur = dict(zip(ids.tolist(), vals.tolist()))

        ff = s.search_feature_field(
            "data", k=N, value_source=src, value_col="n_chars",
            pivot=100.0, weight=1.0, dv_field="n_chars",
        )
        base = s.search_feature_field(
            "data", k=N, value_source=src, value_col="n_chars",
            pivot=100.0, weight=1.0,
        )
        base_map = dict(base)
        for d, sc in ff:
            v0 = float(NCHARS[d])
            bm25 = base_map[d] - v0 / (v0 + 100.0)
            v = max(cur.get(d, v0), 0.0)
            assert sc == pytest.approx(bm25 + v / (v + 100.0), rel=1e-12)

        df = s.search_distance_feature(
            "data", k=N, value_source=src, value_col="n_chars",
            origin=0.0, pivot=50.0, weight=1.0, dv_field="n_chars",
        )
        base2 = dict(
            s.search_distance_feature(
                "data", k=N, value_source=src, value_col="n_chars",
                origin=0.0, pivot=50.0, weight=1.0,
            )
        )
        for d, sc in df:
            v0 = float(NCHARS[d])
            bm25 = base2[d] - 50.0 / (50.0 + abs(v0))
            v = cur.get(d, v0)
            assert sc == pytest.approx(
                bm25 + 50.0 / (50.0 + abs(v)), rel=1e-12
            )

    def test_function_score_sees_updates(self, updated):
        ix, src = updated
        s = Searcher(ix)
        plain = s.search_function_score(
            "data", k=N, value_source=src, value_col="n_chars",
            weight=1.0,
        )
        dv = s.search_function_score(
            "data", k=N, value_source=src, value_col="n_chars",
            weight=1.0, dv_field="n_chars",
        )
        ids, vals = load_dv_overlay(ix, "n_chars")
        cur = dict(zip(ids.tolist(), vals.tolist()))
        plain_map = dict(plain)
        # recompute: bm25 component is final / (1 + ln(1 + base_value))
        for d, sc in dv:
            base = float(NCHARS[d])
            bm25 = plain_map[d] / (1.0 + np.log(1.0 + base))
            want = bm25 * (1.0 + np.log(1.0 + cur.get(d, base)))
            assert sc == pytest.approx(want, rel=1e-12)


class TestMergeFold:
    def test_full_merge_folds_into_docstore(self, tmp_path, ray_session):
        src = _write_corpus(tmp_path)
        ix = str(tmp_path / "ix")
        build_index(
            src, ix, fields=FIELDS, num_partitions=4, batch_size=16,
            docstore_cols=["n_chars"],
        )
        upd = {0: 9_999.0, 13: 8_888.0, 49: 7_777.0}
        update_numeric_docvalues(ix, "n_chars", upd)
        m = load_manifest(ix)
        names = [s.name for s in m.segments]
        m2 = merge_segments_inplace(ix, names, num_partitions=2)
        # sidecar folded away
        assert "dv_files" not in m2.extra
        assert gc_dv_files(ix, dry_run=True) == []
        dv_dir = os.path.join(ix, "dv_updates")
        assert not os.path.isdir(dv_dir) or os.listdir(dv_dir) == []
        # docstore now carries the post-update values
        t = hydrate(ix, [0, 1, 13, 49], columns=["doc_id", "n_chars"])
        got = dict(
            zip(
                t["doc_id"].to_pylist(),
                [float(v) for v in t["n_chars"].to_pylist()],
            )
        )
        assert got == {
            0: 9_999.0,
            1: float(NCHARS[1]),
            13: 8_888.0,
            49: 7_777.0,
        }
        # reading through the (now empty) overlay equals the docstore
        s = Searcher(ix)
        store = os.path.join(ix, "docstore")
        rows = s.search_sort_by(
            "data", k=5, value_source=store, value_col="n_chars",
            dv_field="n_chars",
        )
        assert rows[0] == (0, 9_999.0)

    def test_full_merge_folds_fractional_updates_on_int_column(
        self, tmp_path, ray_session
    ):
        """update_numeric_docvalues accepts floats; folding 2.5 into an
        int64 docstore column must not crash (ArrowInvalid truncation)
        — the column is promoted to float64 across every shard."""
        src = _write_corpus(tmp_path)
        ix = str(tmp_path / "ix")
        build_index(
            src, ix, fields=FIELDS, num_partitions=4, batch_size=16,
            docstore_cols=["n_chars"],
        )
        update_numeric_docvalues(ix, "n_chars", {3: 2.5, 7: 10.0})
        m = load_manifest(ix)
        names = [s.name for s in m.segments]
        m2 = merge_segments_inplace(ix, names, num_partitions=2)
        assert "dv_files" not in m2.extra
        import pyarrow.dataset as pads

        store = os.path.join(ix, "docstore")
        assert pads.dataset(store).schema.field("n_chars").type == (
            pa.float64()
        )
        t = hydrate(ix, [3, 5, 7], columns=["doc_id", "n_chars"])
        got = dict(
            zip(
                t["doc_id"].to_pylist(),
                [float(v) for v in t["n_chars"].to_pylist()],
            )
        )
        assert got == {3: 2.5, 5: float(NCHARS[5]), 7: 10.0}

    def test_full_merge_integral_float_updates_keep_int_column(
        self, tmp_path, ray_session
    ):
        """Whole-number float updates fold back into the original int64
        column type — no gratuitous schema change."""
        src = _write_corpus(tmp_path)
        ix = str(tmp_path / "ix")
        build_index(
            src, ix, fields=FIELDS, num_partitions=4, batch_size=16,
            docstore_cols=["n_chars"],
        )
        update_numeric_docvalues(ix, "n_chars", {3: 123.0})
        m = load_manifest(ix)
        m2 = merge_segments_inplace(
            ix, [s.name for s in m.segments], num_partitions=2
        )
        assert "dv_files" not in m2.extra
        import pyarrow.dataset as pads

        store = os.path.join(ix, "docstore")
        assert pa.types.is_integer(
            pads.dataset(store).schema.field("n_chars").type
        )
        t = hydrate(ix, [3], columns=["doc_id", "n_chars"])
        assert t["n_chars"].to_pylist() == [123]

    def test_push_pull_replicates_dv_generations(self, tmp_path, ray_session):
        from fdblucene_ray.index.store import (
            LocalFSStore,
            pull_index,
            push_index,
        )

        src = _write_corpus(tmp_path)
        ix = str(tmp_path / "ix")
        build_index(src, ix, fields=FIELDS, num_partitions=3, batch_size=16)
        update_numeric_docvalues(ix, "n_chars", {2: 42.0, 11: 7.0})
        store = LocalFSStore(str(tmp_path / "store"))
        push_index(ix, store)
        cache = str(tmp_path / "cache")
        m = pull_index(store, cache)
        assert m.extra.get("dv_files", {}).get("n_chars")
        ids, vals = load_dv_overlay(cache, "n_chars", m)
        assert ids.tolist() == [2, 11]
        assert vals.tolist() == [42.0, 7.0]
        # the pulled replica serves the post-update sort
        s = Searcher(cache)
        rows = s.search_sort_by(
            "data", k=1, value_source=src, value_col="n_chars",
            dv_field="n_chars",
        )
        top_base = max(range(N), key=lambda i: (NCHARS[i], -i))
        assert rows[0][0] == top_base  # 42/7 don't beat the base max
        asc = s.search_sort_by(
            "data", k=1, value_source=src, value_col="n_chars",
            dv_field="n_chars", descending=False,
        )
        assert asc[0] == (11, 7.0)

    def test_export_commit_carries_dv(self, tmp_path, ray_session):
        from fdblucene_ray.index.manifest import export_commit

        src = _write_corpus(tmp_path)
        ix = str(tmp_path / "ix")
        build_index(src, ix, fields=FIELDS, num_partitions=3, batch_size=16)
        update_numeric_docvalues(ix, "n_chars", {4: 400.0})
        out = str(tmp_path / "clone")
        export_commit(ix, out)
        ids, vals = load_dv_overlay(out, "n_chars")
        assert ids.tolist() == [4] and vals.tolist() == [400.0]

    def test_partial_merge_carries_overlay(self, tmp_path, ray_session):
        src = _write_corpus(tmp_path)
        ix = str(tmp_path / "ix")
        build_index(
            src, ix, fields=FIELDS, num_partitions=4, batch_size=16,
            docstore_cols=["n_chars"],
        )
        update_numeric_docvalues(ix, "n_chars", {5: 1.5})
        m = load_manifest(ix)
        names = [s.name for s in m.segments][:2]
        m2 = merge_segments_inplace(ix, names, num_partitions=1)
        assert m2.extra.get("dv_files", {}).get("n_chars")
        ids, vals = load_dv_overlay(ix, "n_chars", m2)
        assert ids.tolist() == [5] and vals.tolist() == [1.5]


class TestShardAppendCarry:
    """A shard-append refresh must carry tombstones / dv generations /
    positions metadata into the new manifest (deletes must not
    resurrect, updates must not vanish)."""

    def _shard(self, d, name, ids):
        p = str(d / name)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(ids), pa.int64()),
                    "text": pa.array(
                        [f"data merge body t{i:03d}" for i in ids]
                    ),
                    "n_chars": pa.array([100 + i for i in ids], pa.int64()),
                }
            ),
            p,
        )
        return p

    def test_append_preserves_sidecars_and_positions(
        self, tmp_path, ray_session
    ):
        from fdblucene_ray.index.build import build_sharded
        from fdblucene_ray.index.delete import delete_docs

        s1 = self._shard(tmp_path, "s1.parquet", range(0, 10))
        s2 = self._shard(tmp_path, "s2.parquet", range(10, 20))
        s3 = self._shard(tmp_path, "s3.parquet", range(20, 30))
        ix = str(tmp_path / "ix")
        fields = {
            "text": {"column": "text", "analyzer": "simple",
                     "positions": True}
        }
        build_sharded([s1, s2], ix, fields=fields,
                      num_partitions_per_shard=2)
        m0 = load_manifest(ix)
        assert m0.extra.get("positions_fields") == ["text"]
        delete_docs(ix, [3])
        update_numeric_docvalues(ix, "n_chars", {5: 9_999.0})
        # append refresh: old shards re-passed (resumed), one new shard
        m = build_sharded([s1, s2, s3], ix, fields=fields,
                          num_partitions_per_shard=2)
        assert m.extra.get("tombstone_file"), "tombstones must carry"
        assert m.extra.get("dv_files", {}).get("n_chars"), "dv must carry"
        assert m.extra.get("positions_fields") == ["text"]
        s = Searcher(ix)
        assert 3 not in [d for d, _ in s.search_terms(["data"], 100)]
        ids, vals = load_dv_overlay(ix, "n_chars")
        assert ids.tolist() == [5] and vals.tolist() == [9_999.0]
        # new shard's docs are searchable in the same snapshot
        assert any(d >= 20 for d, _ in s.search_terms(["data"], 100))

    def test_rebuild_on_different_corpus_drops_sidecars(
        self, tmp_path, ray_session
    ):
        from fdblucene_ray.index.build import build_sharded
        from fdblucene_ray.index.delete import delete_docs

        s1 = self._shard(tmp_path, "s1.parquet", range(0, 10))
        other = self._shard(tmp_path, "other.parquet", range(0, 12))
        ix = str(tmp_path / "ix")
        fields = {"text": {"column": "text", "analyzer": "simple"}}
        build_sharded([s1], ix, fields=fields, num_partitions_per_shard=2)
        delete_docs(ix, [1])
        m = build_sharded([other], ix, fields=fields,
                          num_partitions_per_shard=2)
        assert "tombstone_file" not in m.extra  # ids reassigned


class TestMergeCarry:
    def test_compact_to_new_dir_carries_remapped_dv(
        self, tmp_path, ray_session
    ):
        from fdblucene_ray.index.merge import compact_index, merge_indexes

        src = _write_corpus(tmp_path)
        ix = str(tmp_path / "ix")
        build_index(src, ix, fields=FIELDS, num_partitions=4, batch_size=16)
        update_numeric_docvalues(ix, "n_chars", {2: 222.0, 7: 777.0})
        out = str(tmp_path / "compacted")
        compact_index(ix, out, num_partitions=2)
        ids, vals = load_dv_overlay(out, "n_chars")
        assert ids.tolist() == [2, 7]
        assert vals.tolist() == [222.0, 777.0]
        # multi-source merge remaps by base and drops purged docs
        from fdblucene_ray.index.delete import delete_docs

        delete_docs(ix, [7])
        out2 = str(tmp_path / "merged2")
        merge_indexes([(ix, 0), (ix, 1000)], out2, num_partitions=2)
        ids2, vals2 = load_dv_overlay(out2, "n_chars")
        assert ids2.tolist() == [2, 1002]  # 7 purged; second copy +1000
        assert vals2.tolist() == [222.0, 222.0]


def test_multi_searcher_merges_member_overlays(tmp_path, ray_session):
    """Federated Searcher.multi must see EVERY member index's pending
    dv updates (disjoint id spaces; each member contributes its own
    overlay slice)."""
    src_a = _write_corpus(tmp_path)
    ix_a = str(tmp_path / "ixa")
    build_index(src_a, ix_a, fields=FIELDS, num_partitions=3, batch_size=16)
    # second index with shifted ids
    tb = pa.table(
        {
            "doc_id": pa.array([1000 + i for i in range(N)], pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
            "n_chars": pa.array(NCHARS, pa.int64()),
        }
    )
    src_b = str(tmp_path / "b.parquet")
    pq.write_table(tb, src_b)
    ix_b = str(tmp_path / "ixb")
    build_index(src_b, ix_b, fields=FIELDS, num_partitions=3,
                batch_size=16, doc_base=1000)
    update_numeric_docvalues(ix_a, "n_chars", {2: 50_000.0})
    update_numeric_docvalues(ix_b, "n_chars", {1005: 60_000.0})
    s = Searcher.multi([ix_a, ix_b])
    ids, vals = s._dv_overlay("n_chars")
    assert ids.tolist() == [2, 1005]
    rows = s.search_sort_by(
        "data", k=2, value_source=[src_a, src_b], value_col="n_chars",
        dv_field="n_chars",
    )
    assert rows == [(1005, 60_000.0), (2, 50_000.0)]


def test_overlay_values_random_vs_dict(ray_session):
    """Property: overlay_values equals dict-based patching for random
    id sets and overlays (including ids above/below the overlay range
    and duplicate query ids)."""
    import random

    rng = random.Random(23)
    for _ in range(50):
        ov = {rng.randrange(1000): float(rng.randrange(10_000))
              for _ in range(rng.randint(0, 40))}
        ov_ids = np.array(sorted(ov), np.int64)
        ov_vals = np.array([ov[i] for i in sorted(ov)], np.float64)
        ids = np.array(
            [rng.randrange(-50, 1100) for _ in range(rng.randint(0, 60))],
            np.int64,
        )
        vals = np.array([float(rng.randrange(100)) for _ in ids])
        got = overlay_values(ids, vals, ov_ids, ov_vals)
        want = np.array(
            [ov.get(int(i), v) for i, v in zip(ids, vals)], np.float64
        )
        assert np.array_equal(got, want)


def test_concurrent_updates_cas_fenced(tmp_path, ray_session):
    """Two racing dv updates: exactly one publishes per version; the
    loser gets ManifestConflictError (never a silent clobber), and a
    retry lands on the coalesced state."""
    import threading

    from fdblucene_ray.index.manifest import ManifestConflictError

    src = _write_corpus(tmp_path)
    ix = str(tmp_path / "ix")
    build_index(src, ix, fields=FIELDS, num_partitions=2, batch_size=16)
    barrier = threading.Barrier(2)
    conflicts: list[Exception] = []
    fatals: list[BaseException] = []  # anything NOT the contracted error

    def write(field_val):
        d, v = field_val
        barrier.wait()
        try:
            update_numeric_docvalues(ix, "n_chars", {d: v})
        except ManifestConflictError as e:
            conflicts.append(e)
        except BaseException as e:  # noqa: BLE001 — race contract check
            fatals.append(e)

    wins = 0
    for trial in range(6):
        conflicts.clear()
        fatals.clear()
        t1 = threading.Thread(target=write, args=((1 + trial, 100.0),))
        t2 = threading.Thread(target=write, args=((30 + trial, 200.0),))
        t1.start(); t2.start(); t1.join(); t2.join()
        # a loser must surface ManifestConflictError, never e.g. a
        # FileNotFoundError from a shared tmp path (the r3 race bug)
        assert not fatals, fatals
        assert len(conflicts) <= 1
        wins += 2 - len(conflicts)
        # lost-update check: the PUBLISHED overlay must contain every
        # update whose writer reported success (winner's own bytes)
        ids, vals = load_dv_overlay(ix, "n_chars")
        got = dict(zip(ids.tolist(), vals.tolist()))
        if len(conflicts) == 0:  # both landed (serialized by chance)
            assert got[1 + trial] == 100.0 and got[30 + trial] == 200.0
        else:  # exactly one won; its update must be visible
            assert got.get(1 + trial) == 100.0 or got.get(30 + trial) == 200.0
        # retry the loser's update; coalesced state must hold both
        update_numeric_docvalues(ix, "n_chars", {1 + trial: 100.0})
        update_numeric_docvalues(ix, "n_chars", {30 + trial: 200.0})
        ids, vals = load_dv_overlay(ix, "n_chars")
        got = dict(zip(ids.tolist(), vals.tolist()))
        assert got[1 + trial] == 100.0 and got[30 + trial] == 200.0
    assert wins >= 6  # every round published at least one side


def test_concurrent_updates_stress_50_rounds(tmp_path, ray_session):
    """50-round two-writer stress: zero non-conflict exceptions, the
    reported winner's bytes are always the published bytes, and dv
    generation filenames never collide across writers."""
    import threading

    from fdblucene_ray.index.manifest import ManifestConflictError

    src = _write_corpus(tmp_path)
    ix = str(tmp_path / "ix")
    build_index(src, ix, fields=FIELDS, num_partitions=2, batch_size=16)

    for trial in range(50):
        barrier = threading.Barrier(2)
        results: dict[str, object] = {}

        def write(tag, d, v):
            barrier.wait()
            try:
                update_numeric_docvalues(ix, "n_chars", {d: v})
                results[tag] = "ok"
            except ManifestConflictError:
                results[tag] = "conflict"
            except BaseException as e:  # noqa: BLE001
                results[tag] = e

        a = threading.Thread(
            target=write, args=("a", trial % 40, 1000.0 + trial)
        )
        b = threading.Thread(
            target=write, args=("b", (trial % 40) + 1, 2000.0 + trial)
        )
        a.start(); b.start(); a.join(); b.join()
        assert results["a"] in ("ok", "conflict"), results["a"]
        assert results["b"] in ("ok", "conflict"), results["b"]
        assert "ok" in results.values()  # at least one side published
        ids, vals = load_dv_overlay(ix, "n_chars")
        got = dict(zip(ids.tolist(), vals.tolist()))
        if results["a"] == "ok":
            assert got[trial % 40] == 1000.0 + trial
        if results["b"] == "ok":
            assert got[(trial % 40) + 1] == 2000.0 + trial
