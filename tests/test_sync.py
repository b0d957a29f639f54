"""Incremental directory sync (index/sync.py): diff-and-append with
never-reopen semantics for already-ingested input shards."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.search import Searcher
from fdblucene_ray.index.sync import sync_index, sync_status

FIELDS = {"text": {"column": "text", "analyzer": "simple"}}


def _write_shard(path, words, n=40):
    rng = np.random.default_rng(hash(path) % 2**31)
    texts = [" ".join(rng.choice(words, size=6)) for _ in range(n)]
    pq.write_table(pa.table({"text": pa.array(texts)}), path)
    return texts


class TestSyncIndex:
    def test_incremental_sync_idempotent_and_immutability(
        self, ray_session, tmp_path
    ):
        words = np.array(["alpha", "beta", "gamma", "delta", "sync"])
        inbox = tmp_path / "inbox"
        inbox.mkdir()
        _write_shard(str(inbox / "a.parquet"), words)
        _write_shard(str(inbox / "b.parquet"), words)
        ix = str(tmp_path / "ix")
        build_index(str(inbox / "a.parquet"), ix, fields=FIELDS,
                    num_partitions=2)
        m, new = sync_index(
            ix, str(inbox), pattern="b.parquet", fields=FIELDS
        )
        assert [os.path.basename(p) for p in new] == ["b.parquet"]
        st = sync_status(ix, str(inbox), pattern="b.parquet")
        assert st["pending"] == [] and st["ingested"] == 1
        # idempotent: nothing new
        m2, new2 = sync_index(
            ix, str(inbox), pattern="b.parquet", fields=FIELDS
        )
        assert m2 is None and new2 == []
        assert Searcher(ix).num_docs() == 80

        # an ingested input shard CHANGING on disk raises loudly
        with open(inbox / "b.parquet", "ab") as fh:
            fh.write(b"x")
        with pytest.raises(ValueError, match="immutable"):
            sync_index(ix, str(inbox), pattern="b.parquet",
                       fields=FIELDS)

    def test_backlog_and_never_reopen(self, ray_session, tmp_path):
        words = np.array(["red", "green", "blue", "query"])
        inbox = tmp_path / "inbox"
        inbox.mkdir()
        for name in ("s1", "s2", "s3"):
            _write_shard(str(inbox / f"{name}.parquet"), words)
        ix = str(tmp_path / "ix")
        build_index(str(inbox / "s1.parquet"), ix, fields=FIELDS,
                    num_partitions=2)
        m, new = sync_index(
            ix, str(inbox), pattern="s[23].parquet",
            fields=FIELDS,
        )
        assert len(new) == 2
        n_before = Searcher(ix).num_docs()
        assert n_before == 120  # 3 x 40 docs

        # ingested files become GARBAGE on disk (size/mtime preserved
        # via os.utime) — the next sync must not open them
        for name in ("s2", "s3"):
            p = inbox / f"{name}.parquet"
            st = os.stat(p)
            data = open(p, "rb").read()
            open(p, "wb").write(b"\x00" * len(data))
            os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))
        s4 = _write_shard(str(inbox / "s4.parquet"), words)
        m2, new2 = sync_index(
            ix, str(inbox), pattern="s[234].parquet",
            fields=FIELDS,
        )
        assert [os.path.basename(p) for p in new2] == ["s4.parquet"]
        s = Searcher(ix)
        assert s.num_docs() == 160
        # s4's content is searchable
        hits = s.search_terms(["query"], 10**6, mode="exhaustive")
        assert any(d >= 120 for d, _ in hits)


class TestSyncCrashRecovery:
    """Exactly-once across the two crash windows: (a) after the append
    commit but before the ledger write, (b) after the intent write but
    before the append."""

    def _setup(self, tmp_path, names=("s1", "s2")):
        words = np.array(["one", "two", "three", "four"])
        inbox = tmp_path / "inbox"
        inbox.mkdir()
        for n in names:
            _write_shard(str(inbox / f"{n}.parquet"), words)
        ix = str(tmp_path / "ix")
        build_index(str(inbox / "s1.parquet"), ix, fields=FIELDS,
                    num_partitions=2)
        return inbox, ix

    def test_crash_after_commit_before_ledger(
        self, ray_session, tmp_path
    ):
        from fdblucene_ray.index.sync import (
            _intent_path,
            _state_path,
        )

        inbox, ix = self._setup(tmp_path)
        m, new = sync_index(ix, str(inbox), pattern="s2.parquet",
                            fields=FIELDS)
        assert Searcher(ix).num_docs() == 80
        # simulate the crash: the append committed (it did), the
        # ledger write and intent removal never happened
        os.remove(_state_path(ix))
        import json
        import shutil

        with open(_intent_path(ix) + ".redo", "w") as fh:
            json.dump({"token": m.extra["append_tokens"][-1],
                       "files": new}, fh)
        shutil.move(_intent_path(ix) + ".redo", _intent_path(ix))
        m2, new2 = sync_index(ix, str(inbox), pattern="s2.parquet",
                              fields=FIELDS)
        # replay was a manifest no-op; nothing double-ingested — and
        # the recovery IS reported (its original caller crashed)
        assert Searcher(ix).num_docs() == 80
        assert m2 is not None and new2 == new
        assert not os.path.exists(_intent_path(ix))

    def test_crash_after_intent_before_append(
        self, ray_session, tmp_path
    ):
        from fdblucene_ray.index.sync import (
            _batch_token,
            _intent_path,
            _write_json_atomic,
        )

        inbox, ix = self._setup(tmp_path)
        # the crashed sync got as far as writing the intent only
        files = [os.path.abspath(str(inbox / "s2.parquet"))]
        _write_json_atomic(
            _intent_path(ix),
            {"token": _batch_token(files), "files": files},
        )
        assert Searcher(ix).num_docs() == 40
        m2, new2 = sync_index(ix, str(inbox), pattern="s2.parquet",
                              fields=FIELDS)
        # the replay performed the real append exactly once, and is
        # reported as this call's work
        assert Searcher(ix).num_docs() == 80
        assert m2 is not None and new2 == files
        # and a further sync is a clean no-op
        m3, new3 = sync_index(ix, str(inbox), pattern="s2.parquet",
                              fields=FIELDS)
        assert m3 is None and new3 == []
        assert Searcher(ix).num_docs() == 80
