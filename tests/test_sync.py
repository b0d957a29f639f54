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
