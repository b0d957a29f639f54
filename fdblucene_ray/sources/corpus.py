"""Corpus reader with deterministic dense doc-id assignment.

The reference's Writer approach allocates doc ids randomly into a
sparse id space with insert-if-absent (DATA.md:14-17). That makes
re-execution non-deterministic, so this engine replaces it (per
SURVEY.md §1.4) with a dense deterministic scheme:

    doc_id = base(fragment) + row_within_fragment

where fragments are parquet *row groups* and bases come from a cheap
driver-side footer-metadata scan (no data read). Every retry of a read
task therefore produces byte-identical ids — the precondition for
idempotent, resumable builds (SURVEY.md §7 hard part (c)).

Scale note: one Ray task per row group; the footer scan is
metadata-only and can itself be parallelized over files for very large
inputs (it is sequential here — at 100 TB with ~1 GB files that is
~100k footers, still driver-feasible, or a trivial ray.remote fan-out).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def _expand_paths(paths) -> list[str]:
    if isinstance(paths, str):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(sorted(glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True)))
        else:
            out.append(p)
    return out


def plan_fragments(paths, base: int = 0) -> list[dict]:
    """[{path, row_group, base, num_rows}] with cumulative doc-id bases
    starting at ``base`` (shard builds pass their global offset)."""
    frags = []
    for path in _expand_paths(paths):
        md = pq.read_metadata(path)
        for rg in range(md.num_row_groups):
            n = md.row_group(rg).num_rows
            frags.append({"path": path, "row_group": rg, "base": base, "num_rows": n})
            base += n
    return frags


def _load_fragment(frag: dict, columns: list[str] | None) -> pa.Table:
    f = pq.ParquetFile(frag["path"])
    t = f.read_row_group(frag["row_group"], columns=columns)
    doc_ids = pa.array(
        np.arange(frag["base"], frag["base"] + t.num_rows, dtype=np.int64)
    )
    return t.add_column(0, "doc_id", doc_ids)


def _load_fragments(frags: list[dict], columns: list[str] | None) -> pa.Table:
    """Load a coalesced run of row groups as ONE block (doc_ids stay
    per-fragment, so coalescing never changes ids). Same-file runs use a
    single ParquetFile handle and one reader call."""
    out = []
    i = 0
    while i < len(frags):
        path = frags[i]["path"]
        j = i
        while j < len(frags) and frags[j]["path"] == path:
            j += 1
        run = frags[i:j]
        f = pq.ParquetFile(path)
        t = f.read_row_groups([fr["row_group"] for fr in run], columns=columns)
        doc_ids = np.concatenate([
            np.arange(fr["base"], fr["base"] + fr["num_rows"], dtype=np.int64)
            for fr in run
        ])
        out.append(t.add_column(0, "doc_id", pa.array(doc_ids)))
        i = j
    return pa.concat_tables(out) if len(out) > 1 else out[0]


class DocIdParquetDatasource(ray.data.datasource.Datasource):
    """Parquet source emitting one ReadTask per row group with real size
    metadata, each block carrying the deterministic ``doc_id`` column.

    A plain ``from_items(descriptors).map_batches(load)`` pipeline ends
    up as a handful of giant tasks — Ray sizes tasks by input BYTES and
    descriptor rows are ~80 bytes — so the read (and everything fused
    after it) loses all parallelism. A Datasource gives the scheduler
    honest per-task row/byte estimates.
    """

    def __init__(
        self,
        paths,
        columns: list[str] | None = None,
        base: int = 0,
        rows_per_task: int | None = None,
    ):
        self._frags = plan_fragments(paths, base)
        self._columns = columns
        # coalescing row groups into ~rows_per_task blocks cuts the
        # driver-side task/block event count (the single-driver dispatch
        # loop is the non-scaling component of a build — fewer, bigger
        # blocks is also the right shape at 100 TB where blocks should
        # be 10^2 MB, not one small row group each)
        self._rows_per_task = rows_per_task
        sizes = []
        for path in {f["path"] for f in self._frags}:
            md = pq.read_metadata(path)
            for rg in range(md.num_row_groups):
                sizes.append(md.row_group(rg).total_byte_size)
        self._total_bytes = int(sum(sizes))

    def estimate_inmemory_data_size(self):
        return self._total_bytes

    def get_read_tasks(self, parallelism: int):
        from ray.data.block import BlockMetadata
        from ray.data.datasource import ReadTask

        # group consecutive fragments into tasks of ~rows_per_task rows
        groups: list[list[dict]] = []
        if not self._rows_per_task:
            groups = [[f] for f in self._frags]
        else:
            cur: list[dict] = []
            n = 0
            for f in self._frags:
                cur.append(f)
                n += f["num_rows"]
                if n >= self._rows_per_task:
                    groups.append(cur)
                    cur, n = [], 0
            if cur:
                groups.append(cur)

        out = []
        per_frag_bytes = max(1, self._total_bytes // max(1, len(self._frags)))
        cols = self._columns
        for grp in groups:
            meta = BlockMetadata(
                num_rows=sum(f["num_rows"] for f in grp),
                size_bytes=per_frag_bytes * len(grp),
                exec_stats=None,
                input_files=sorted({f["path"] for f in grp}),
            )
            out.append(
                ReadTask(lambda grp=grp: [_load_fragments(grp, cols)], meta)
            )
        return out


def read_corpus_with_doc_ids(
    paths,
    columns: list[str] | None = None,
    *,
    base: int = 0,
    override_num_blocks: int | None = None,
    rows_per_task: int | None = None,
) -> ray.data.Dataset:
    """read_parquet + deterministic ``doc_id`` column (column-pruned)."""
    return ray.data.read_datasource(
        DocIdParquetDatasource(paths, columns, base, rows_per_task),
        override_num_blocks=override_num_blocks,
    )


def hydrate_from_source(
    paths, doc_ids, columns: list[str] | None = None, *, base: int = 0
) -> pa.Table:
    """Stored-field lookup (J3) straight from the INPUT parquet — the
    zero-copy doc store at 100 TB: deterministic ids make
    ``doc_id -> (file, row_group, row)`` a pure function of the footer
    metadata, so only the row groups containing the requested ids are
    read (and only ``columns``). Returns rows sorted by doc_id with a
    ``doc_id`` column attached."""
    ids = sorted(int(d) for d in doc_ids)
    frags = plan_fragments(paths, base)
    out = []
    i = 0
    for frag in frags:
        lo, hi = frag["base"], frag["base"] + frag["num_rows"]
        want = []
        while i < len(ids) and ids[i] < hi:
            if ids[i] >= lo:
                want.append(ids[i] - lo)
            i += 1
        if want:
            t = pq.ParquetFile(frag["path"]).read_row_group(
                frag["row_group"], columns=columns
            )
            sel = t.take(pa.array(want, pa.int64()))
            sel = sel.add_column(
                0,
                "doc_id",
                pa.array(np.asarray(want, np.int64) + lo, pa.int64()),
            )
            out.append(sel)
        if i >= len(ids):
            break
    if not out:
        schema = pa.schema([("doc_id", pa.int64())])
        return pa.table({"doc_id": pa.array([], pa.int64())}).cast(schema)
    return pa.concat_tables(out)


def corpus_signature(paths, extra: str = "") -> str:
    """Stable signature of an input: paths + sizes + mtimes + config.

    mtime_ns is included so an input file edited in place WITHOUT
    changing its byte size still invalidates the whole-job checkpoint
    and every per-partition lineage record derived from it."""
    import hashlib

    h = hashlib.sha1()
    for p in _expand_paths(paths):
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
    h.update(extra.encode())
    return h.hexdigest()[:16]
