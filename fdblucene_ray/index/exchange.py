"""Direct spill exchange for the index-build all-to-all.

The Dataset path (``groupby("part").map_groups(EncodeGroup)``) routes the
tokenizer output through Ray Data's sort shuffle. Measured on a 600k-doc
build at 32 CPUs, that Sort operator holds the critical path for ~15.7 s
while consuming only ~14 CPU-seconds — it is LATENCY-bound (thousands of
tiny map/merge/reduce tasks serialized through the driver dispatch
loop), so its wall time is roughly constant in cluster size. At 8 CPUs
the latency hides behind slow tokenize; at 32 it IS the build tail —
exactly the shape that caps N->4N scaling efficiency near 0.5.

This module replaces that exchange with the classic external-shuffle
design (the same shape Lucene's flush->merge uses, and what fdblucene
delegates to FoundationDB writes — FDBDirectory.java:351 writes segment
bytes straight to storage, not through a coordinator):

- K ``SpillTokenizer`` actors each own a work queue of parquet fragment
  groups. Each actor reads its fragments DIRECTLY (no object-store hop
  for inputs), tokenizes with the existing vectorized
  ``TokenizeToPostings``, partitions the packed run rows by ``part``,
  and appends them to one Arrow IPC spill file per (actor, partition)
  under the index directory.
- After the last fragment, P independent ``encode_spill_partition``
  tasks each read the ≤K files of one partition (memory-mapped, zero
  copy) and run the existing ``EncodeGroup`` encode + lineage path.

Exchange cost becomes sequential file I/O that overlaps tokenize
compute, with zero coordination on the critical path: every stage's
parallelism (K tokenizers, P encoders) scales with the cluster. On a
multi-node cluster the spill directory lives on the shared filesystem /
object store that already hosts the index (the ``SegmentStore`` SPI),
so the same code is the multi-node story: writers and encoders only
share paths, never processes.

Identity: ``part`` assignment, run packing, encode and segment naming
are byte-identical to the Dataset path (same ``TokenizeToPostings`` /
``EncodeGroup`` code objects), pinned by test
(tests/test_exchange.py::test_spill_build_identical).

Resume: the whole-job signature checkpoint and the per-partition
lineage skip in ``EncodeGroup`` both apply unchanged; a crash during
the spill phase re-tokenizes (spill files are transient and
attempt-scoped), a crash during encode skips finished partitions.
"""

from __future__ import annotations

import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.ipc as pa_ipc
import ray

__all__ = ["run_spill_exchange", "group_fragments"]


def group_fragments(frags: list[dict], rows_per_task: int) -> list[list[dict]]:
    """Coalesce consecutive fragments into work units of ~rows_per_task
    rows (same-file runs stay adjacent, so each unit is mostly one
    reader open)."""
    groups: list[list[dict]] = []
    cur: list[dict] = []
    n = 0
    for f in frags:
        cur.append(f)
        n += f["num_rows"]
        if n >= rows_per_task:
            groups.append(cur)
            cur, n = [], 0
    if cur:
        groups.append(cur)
    return groups


class _SpillTokenizerImpl:
    """One tokenizer worker: reads fragments itself, tokenizes, and
    appends partitioned run rows to per-partition IPC spill files.

    Plain class (wrapped by ``ray.remote`` at use site) so tests can
    drive it in-process.
    """

    def __init__(
        self,
        columns: list[str],
        tokenizer_kwargs: dict,
        batch_size: int = 2048,
        flush_total_bytes: int = 64 << 20,
        preprocess=None,
    ):
        from fdblucene_ray.index.build import TokenizeToPostings

        self.columns = columns
        # optional per-batch table->table stage between read and
        # tokenize (e.g. the flagship's HTML-extract + invariant check);
        # applied per batch_size slice so large source payloads (html)
        # never accumulate beyond one slice per actor
        self.preprocess = preprocess
        self.tok = TokenizeToPostings(**tokenizer_kwargs)
        self.P = self.tok.P
        self.batch_size = batch_size
        self.flush_total_bytes = flush_total_bytes
        # run-scoped state (begin_run): actors OUTLIVE a single build so
        # a session reuses warm processes — spawning N fresh workers per
        # build costs ~1s that bills to the smaller of two back-to-back
        # builds disproportionately
        self.actor_id = -1
        self.spill_dir = ""
        # per-part pending slices + running byte estimate; one IPC
        # writer per part, opened lazily, kept open across process()
        # calls (appending batches to a stream file)
        self.bufs: dict[int, list[pa.Table]] = {}
        self.pending_bytes = 0
        self.writers: dict[int, tuple[pa_ipc.RecordBatchStreamWriter, object]] = {}
        self.n_docs = 0

    def begin_run(self, actor_id: int, spill_dir: str) -> bool:
        self.actor_id = actor_id
        self.spill_dir = spill_dir
        self.bufs = {}
        self.pending_bytes = 0
        self.writers = {}
        self.n_docs = 0
        return True

    # -- helpers ---------------------------------------------------------

    def _writer(self, part: int, schema: pa.Schema):
        w = self.writers.get(part)
        if w is None:
            d = os.path.join(self.spill_dir, f"part={part:05d}")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"tok-{self.actor_id:04d}.arrow")
            sink = pa.OSFile(path, "wb")
            w = (pa_ipc.new_stream(sink, schema), sink)
            self.writers[part] = w
        return w[0]

    def _flush_all(self):
        for part, tables in self.bufs.items():
            if not tables:
                continue
            t = pa.concat_tables(tables).combine_chunks()
            self._writer(part, t.schema).write_table(t)
            tables.clear()
        self.pending_bytes = 0

    # -- API -------------------------------------------------------------

    def process(self, frag_groups: list[list[dict]]) -> int:
        """Read, tokenize and spill a list of fragment groups; returns
        docs processed."""
        from fdblucene_ray.sources.corpus import _load_fragments

        done = 0
        for frags in frag_groups:
            table = _load_fragments(frags, self.columns)
            for off in range(0, table.num_rows, self.batch_size):
                sub = table.slice(off, self.batch_size)
                if self.preprocess is not None:
                    sub = self.preprocess(sub)
                out = self.tok(sub)
                self._spill(out)
                done += sub.num_rows
        self.n_docs += done
        return done

    def _spill(self, out: pa.Table):
        parts = out["part"].to_numpy(zero_copy_only=False)
        order = np.argsort(parts, kind="stable")
        srt = out.take(order)
        ps = parts[order]
        bounds = np.flatnonzero(np.diff(ps)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(ps)]))
        for s, e in zip(starts, ends):
            part = int(ps[s])
            self.bufs.setdefault(part, []).append(srt.slice(s, e - s))
        self.pending_bytes += srt.nbytes
        if self.pending_bytes >= self.flush_total_bytes:
            self._flush_all()

    def finish(self) -> dict:
        """Flush + close everything; returns {part: path} for this
        actor's spill files and the doc count."""
        self._flush_all()
        files = {}
        for part, (writer, sink) in self.writers.items():
            writer.close()
            sink.close()
            files[part] = os.path.join(
                self.spill_dir, f"part={part:05d}", f"tok-{self.actor_id:04d}.arrow"
            )
        self.writers.clear()
        return {"files": files, "n_docs": self.n_docs}


SpillTokenizer = ray.remote(_SpillTokenizerImpl)

# ---------------------------------------------------------------- pool
#
# Tokenizer actors are reused across builds within a session (keyed by
# their full construction config). They are created with num_cpus=0:
# they only consume CPU while the driver feeds them units, and a zero
# reservation means an IDLE pool never blocks other stages' tasks or
# actor pools from getting CPU slots (a pool of 1-CPU actors would pin
# the whole cluster between builds). During a build the driver feeds
# exactly `num_tokenizers` of them, so effective parallelism is still
# explicit and proportional to the cluster.

import threading

_POOL: dict[str, list] = {}
_POOL_LOCK = threading.Lock()


def _pool_key(columns, tokenizer_kwargs, batch_size, preprocess=None) -> str:
    import hashlib
    import json

    if preprocess is None:
        pp = "none"
    else:
        from ray import cloudpickle

        pp = hashlib.sha1(cloudpickle.dumps(preprocess)).hexdigest()
    return json.dumps(
        [sorted(columns), sorted(tokenizer_kwargs.items(), key=str), batch_size, pp],
        default=str,
    )


def _checkout_tokenizers(
    columns, tokenizer_kwargs, batch_size, n, preprocess=None
) -> tuple[str, list]:
    key = _pool_key(columns, tokenizer_kwargs, batch_size, preprocess)
    with _POOL_LOCK:
        avail = _POOL.setdefault(key, [])
        out = [avail.pop() for _ in range(min(n, len(avail)))]
    while len(out) < n:
        out.append(
            SpillTokenizer.options(num_cpus=0).remote(
                columns, tokenizer_kwargs, batch_size, preprocess=preprocess
            )
        )
    return key, out


def _release_tokenizers(key: str, actors: list) -> None:
    with _POOL_LOCK:
        _POOL.setdefault(key, []).extend(actors)


def drain_spill_pool() -> None:
    """Kill every pooled tokenizer (tests / memory pressure)."""
    with _POOL_LOCK:
        for actors in _POOL.values():
            for a in actors:
                ray.kill(a)
        _POOL.clear()


def _read_spill_partition(paths: list[str]) -> pa.Table:
    tables = []
    for p in paths:
        with pa.memory_map(p, "r") as src:
            tables.append(pa_ipc.open_stream(src).read_all())
    return pa.concat_tables(tables) if len(tables) > 1 else tables[0]


@ray.remote
def encode_spill_partition(
    index_dir: str,
    signature: str,
    part: int,
    paths: list[str],
    block_size: int,
    resume: bool,
    codec: str,
    wire: str,
) -> dict:
    from fdblucene_ray.index.build import EncodeGroup

    group = _read_spill_partition(paths)
    enc = EncodeGroup(
        index_dir, signature, block_size, resume, codec=codec, wire=wire
    )
    row = enc(group)
    return {
        "part": int(row["part"][0].as_py()),
        "segment_meta": row["segment_meta"][0].as_py(),
        "wall_s": float(row["wall_s"][0].as_py()),
        "skipped": bool(row["skipped"][0].as_py()),
    }


def run_spill_exchange(
    paths,
    *,
    index_dir: str,
    signature: str,
    columns: list[str],
    tokenizer_kwargs: dict,
    doc_base: int = 0,
    num_tokenizers: int = 4,
    batch_size: int = 2048,
    rows_per_unit: int | None = None,
    block_size: int = 128,
    resume: bool = True,
    codec: str = "varint-block",
    wire: str = "raw",
    encode_concurrency: int | None = None,
    preprocess=None,
) -> list[dict]:
    """Full tokenize->spill->encode exchange; returns lineage records
    (one dict per partition) matching the Dataset path's take_all rows.

    Work distribution is a driver-side queue: each tokenizer actor keeps
    up to 2 fragment groups in flight (pipelining read/tokenize of the
    next unit under the current one), and whichever actor finishes first
    pulls the next unit — no static assignment, so a straggler never
    strands work.
    """
    from fdblucene_ray.sources.corpus import plan_fragments

    frags = plan_fragments(paths, doc_base)
    if not frags:
        return []
    if rows_per_unit is None:
        # PURE function of total rows — never of cluster size: unit
        # boundaries determine batch boundaries, which determine the
        # auto-salt layout, and a resume on a resized cluster must not
        # mix two salt layouts across partitions. ~192 units (6 per
        # actor at 32 tokenizers, more per actor on smaller clusters —
        # finer balance either way); clamp unit to [2.5k, 20k] rows
        total = sum(f["num_rows"] for f in frags)
        rows_per_unit = max(2500, min(20000, total // 192 or 2500))
    units = group_fragments(frags, rows_per_unit)

    spill_dir = os.path.join(index_dir, f".spill-{signature}-{uuid.uuid4().hex[:8]}")
    os.makedirs(spill_dir, exist_ok=True)
    debug = os.environ.get("FDBL_SPILL_DEBUG")
    import time as _time

    t0 = _time.perf_counter()
    pool_key = None
    actors: list = []
    try:
        pool_key, actors = _checkout_tokenizers(
            columns, tokenizer_kwargs, batch_size, num_tokenizers, preprocess
        )
        # begin_run doubles as a liveness probe: a pooled actor that
        # died since its last build is replaced with a fresh one
        ready = []
        for i, a in enumerate(actors):
            try:
                ray.get(a.begin_run.remote(i, spill_dir))
            except ray.exceptions.RayActorError:
                a = SpillTokenizer.options(num_cpus=0).remote(
                    columns, tokenizer_kwargs, batch_size, preprocess=preprocess
                )
                ray.get(a.begin_run.remote(i, spill_dir))
            ready.append(a)
        actors = ready
        queue = list(units)
        inflight: dict[ray.ObjectRef, int] = {}
        # prime: 2 units per actor (pipelines the next unit's read under
        # the current unit's tokenize)
        for i, a in enumerate(actors):
            for _ in range(2):
                if queue:
                    inflight[a.process.remote([queue.pop()])] = i
        while inflight:
            done, _ = ray.wait(list(inflight), num_returns=1)
            i = inflight.pop(done[0])
            ray.get(done[0])  # surface tokenizer errors eagerly
            if queue:
                inflight[actors[i].process.remote([queue.pop()])] = i
        finishes = ray.get([a.finish.remote() for a in actors])

        files_by_part: dict[int, list[str]] = {}
        for fin in finishes:
            for part, path in fin["files"].items():
                files_by_part.setdefault(int(part), []).append(path)

        enc_opts = {}
        if encode_concurrency:
            # bound concurrent encodes (each is a 1-CPU task anyway;
            # Ray's scheduler already enforces the cluster cap)
            enc_opts["num_cpus"] = 1
        t_tok = _time.perf_counter() - t0
        futs = [
            encode_spill_partition.remote(
                index_dir, signature, part, sorted(fps),
                block_size, resume, codec, wire,
            )
            for part, fps in sorted(files_by_part.items())
        ]
        out = ray.get(futs)
        if debug:
            print(
                f"[spill {signature}] tokenize+spill={t_tok:.2f}s "
                f"encode={_time.perf_counter() - t0 - t_tok:.2f}s "
                f"parts={len(futs)} actors={num_tokenizers} "
                f"units={len(units)}",
                flush=True,
            )
        return out
    finally:
        if pool_key is not None and actors:
            _release_tokenizers(pool_key, actors)
        shutil.rmtree(spill_dir, ignore_errors=True)
