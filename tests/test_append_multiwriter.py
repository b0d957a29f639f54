"""Multi-writer shard append (reference README.md:34-38 concurrent
Writer ingest): manifest-CAS reserved id ranges + CAS publish retry.

Covers: sequential append == full rebuild (segment-identical), the
two-THREAD CAS race (cheap, many rounds), and the real two-PROCESS
race — two independent driver processes, each with its OWN Ray
runtime, appending different shards to one index_dir at once.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fdblucene_ray.index.build import (
    append_shards,
    build_sharded,
    gc_reservations,
)
from fdblucene_ray.index.manifest import load_manifest
from fdblucene_ray.index.search import Searcher

FIELDS = {"text": {"column": "text", "analyzer": "simple"}}


def _shard(d, name, n, tag):
    p = str(d / name)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "text": pa.array(
                    [f"data {tag} body token{i % 7} t{i:03d}" for i in range(n)]
                ),
            }
        ),
        p,
    )
    return p


class TestSequentialAppend:
    def test_append_equals_full_rebuild(self, tmp_path, ray_session):
        s0 = _shard(tmp_path, "s0.parquet", 40, "alpha")
        s1 = _shard(tmp_path, "s1.parquet", 30, "beta")
        full = str(tmp_path / "full")
        build_sharded([s0, s1], full, fields=FIELDS,
                      num_partitions_per_shard=4)
        inc = str(tmp_path / "inc")
        build_sharded([s0], inc, fields=FIELDS, num_partitions_per_shard=4)
        m = append_shards(inc, [s1], fields=FIELDS,
                          num_partitions_per_shard=4)
        mf = load_manifest(full)
        # identical segment sets (names, stats, id ranges) => identical
        # index; ft_append_refresh's append==rebuild contract
        assert [s.to_json() for s in m.segments] == [
            s.to_json() for s in mf.segments
        ]
        assert "id_reservations" not in m.extra
        a = Searcher(inc).search("beta", 100)
        b = Searcher(full).search("beta", 100)
        assert a == b and len(a) == 30

    def test_append_creates_fresh_index(self, tmp_path, ray_session):
        s0 = _shard(tmp_path, "s0.parquet", 25, "alpha")
        ix = str(tmp_path / "ix")
        m = append_shards(ix, [s0], fields=FIELDS,
                          num_partitions_per_shard=4)
        assert m.version >= 1
        assert len(Searcher(ix).search("alpha", 100)) == 25

    def test_config_mismatch_fails_loudly(self, tmp_path, ray_session):
        s0 = _shard(tmp_path, "s0.parquet", 10, "alpha")
        ix = str(tmp_path / "ix")
        build_sharded([s0], ix, fields=FIELDS, num_partitions_per_shard=4)
        s1 = _shard(tmp_path, "s1.parquet", 10, "beta")
        with pytest.raises(ValueError, match="analyzer mismatch"):
            append_shards(
                ix, [s1],
                fields={"text": {"column": "text", "analyzer": "lucene"}},
                num_partitions_per_shard=4,
            )


class TestThreadRace:
    def test_concurrent_appends_all_land(self, tmp_path, ray_session):
        """Two racing appenders (threads share one Ray but the CAS
        protocol is file-level): both land, ids disjoint, nothing
        clobbered."""
        import threading

        ix = str(tmp_path / "ix")
        s0 = _shard(tmp_path, "s0.parquet", 20, "alpha")
        build_sharded([s0], ix, fields=FIELDS, num_partitions_per_shard=4)

        shards = [
            _shard(tmp_path, f"r{i}.parquet", 10 + i, f"tag{i}")
            for i in range(4)
        ]
        barrier = threading.Barrier(4)
        errors: list[BaseException] = []

        def run(p):
            barrier.wait()
            try:
                append_shards(ix, [p], fields=FIELDS,
                              num_partitions_per_shard=4)
            except BaseException as e:  # noqa: BLE001
                errors.append(e)

        ts = [threading.Thread(target=run, args=(p,)) for p in shards]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errors, errors
        m = load_manifest(ix)
        assert "id_reservations" not in m.extra
        # every shard's docs present exactly once
        s = Searcher(ix)
        total = 20 + sum(10 + i for i in range(4))
        assert len(s.search("data", total + 50)) == total
        # per-append doc-id sets pairwise disjoint (reserved ranges)
        id_sets = []
        for i in range(4):
            hits = s.search(f"tag{i}", 100)
            assert len(hits) == 10 + i
            id_sets.append({d for d, _ in hits})
        for i in range(4):
            for j in range(i + 1, 4):
                assert not (id_sets[i] & id_sets[j])

    def test_gc_reservations_clears_dangling(self, tmp_path, ray_session):
        ix = str(tmp_path / "ix")
        s0 = _shard(tmp_path, "s0.parquet", 15, "alpha")
        build_sharded([s0], ix, fields=FIELDS, num_partitions_per_shard=4)
        # simulate a crashed appender: reservation without a publish
        from fdblucene_ray.index.manifest import Manifest, publish_manifest

        m = load_manifest(ix)
        extra = {**m.extra, "id_reservations": {"dead": [15, 40]}}
        publish_manifest(
            ix,
            Manifest(
                analyzers=m.analyzers, block_size=m.block_size,
                segments=m.segments, version=m.version + 1,
                codec=m.codec, extra=extra,
            ),
            expected_version=m.version,
        )
        # a later append starts ABOVE the dangling reservation
        s1 = _shard(tmp_path, "s1.parquet", 5, "beta")
        m2 = append_shards(ix, [s1], fields=FIELDS,
                           num_partitions_per_shard=4)
        beta_min = min(
            sg.doc_id_min for sg in m2.segments if sg.doc_id_min >= 15
        )
        assert beta_min >= 40  # sparse ids: skipped the dead range
        assert gc_reservations(ix) == ["dead"]
        assert "id_reservations" not in load_manifest(ix).extra


_CHILD = r"""
import sys, time, os
ix, shard, ready_dir, me, peers = sys.argv[1:6]
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
open(os.path.join(ready_dir, me), "w").write("1")
deadline = time.time() + 60
while time.time() < deadline:
    if all(os.path.exists(os.path.join(ready_dir, p))
           for p in peers.split(",")):
        break
    time.sleep(0.05)
from fdblucene_ray.index.build import append_shards
m = append_shards(
    ix, [shard],
    fields={"text": {"column": "text", "analyzer": "simple"}},
    num_partitions_per_shard=4,
)
print("OK", m.version)
ray.shutdown()
"""


def test_two_process_concurrent_append(tmp_path):
    """The VERDICT r3 gate: two INDEPENDENT driver processes (own Ray
    runtimes, no shared state but the index_dir) append different
    shards concurrently; both land."""
    # built by a third short-lived process so this test is independent
    # of the session fixture's Ray (children must own their runtimes)
    s0 = _shard(tmp_path, "s0.parquet", 20, "alpha")
    sA = _shard(tmp_path, "sA.parquet", 12, "procea")
    sB = _shard(tmp_path, "sB.parquet", 14, "proceb")
    ix = str(tmp_path / "ix")

    env = {
        **os.environ,
        "PYTHONPATH": os.path.dirname(os.path.dirname(__file__)),
        "RAY_DISABLE_IMPORT_WARNING": "1",
    }
    env.pop("RAY_ADDRESS", None)

    boot = (
        "import ray,sys;"
        "ray.init(address='local',num_cpus=2,include_dashboard=False,"
        "logging_level='ERROR');"
        "from fdblucene_ray.index.build import build_sharded;"
        f"build_sharded([{s0!r}], {ix!r}, fields="
        "{'text': {'column': 'text', 'analyzer': 'simple'}},"
        "num_partitions_per_shard=4);ray.shutdown()"
    )
    subprocess.run([sys.executable, "-c", boot], check=True, env=env,
                   timeout=300)

    ready = tmp_path / "ready"
    ready.mkdir()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, ix, sh, str(ready), me,
             "a,b"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for sh, me in ((sA, "a"), (sB, "b"))
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, (rc, out[-2000:], err[-2000:])
        assert "OK" in out

    m = load_manifest(ix)
    assert "id_reservations" not in m.extra
    # verify from THIS process (session Ray) that both appends serve
    s = Searcher(ix)
    ha = s.search("procea", 100)
    hb = s.search("proceb", 100)
    assert len(ha) == 12 and len(hb) == 14
    assert not ({d for d, _ in ha} & {d for d, _ in hb})
    assert len(s.search("data", 200)) == 46
