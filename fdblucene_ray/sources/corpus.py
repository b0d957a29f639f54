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


def plan_fragments(paths) -> list[dict]:
    """[{path, row_group, base, num_rows}] with cumulative doc-id bases."""
    frags = []
    base = 0
    for path in _expand_paths(paths):
        md = pq.read_metadata(path)
        for rg in range(md.num_row_groups):
            n = md.row_group(rg).num_rows
            frags.append({"path": path, "row_group": rg, "base": base, "num_rows": n})
            base += n
    return frags


class _FragmentLoader:
    """map_batches callable: fragment descriptor rows -> data rows with doc_id."""

    def __init__(self, columns: list[str] | None):
        self.columns = columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        tables = []
        for row in batch.to_pylist():
            f = pq.ParquetFile(row["path"])
            t = f.read_row_group(row["row_group"], columns=self.columns)
            doc_ids = pa.array(
                np.arange(row["base"], row["base"] + t.num_rows, dtype=np.int64)
            )
            tables.append(t.add_column(0, "doc_id", doc_ids))
        return pa.concat_tables(tables) if tables else batch.slice(0, 0)


def read_corpus_with_doc_ids(
    paths,
    columns: list[str] | None = None,
    *,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """read_parquet + deterministic ``doc_id`` column (column-pruned)."""
    frags = plan_fragments(paths)
    ds = ray.data.from_items(frags)
    if override_num_blocks:
        ds = ds.repartition(min(override_num_blocks, max(1, len(frags))))
    return ds.map_batches(
        _FragmentLoader(columns),
        batch_format="pyarrow",
        batch_size=1,  # one row group per task: bounded memory, max parallelism
    )


def corpus_signature(paths, extra: str = "") -> str:
    """Stable signature of an input (paths + sizes + mtimes + config)."""
    import hashlib

    h = hashlib.sha1()
    for p in _expand_paths(paths):
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}".encode())
    h.update(extra.encode())
    return h.hexdigest()[:16]
