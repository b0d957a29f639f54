"""Resumable partitioned corpus export — the curation-side counterpart
of the index build's per-partition checkpointing.

A 100-TB curation job's OUTPUT must be restartable: one directory per
input shard, each written atomically (temp + rename + ``_SUCCESS``
marker), so a failed run re-does only missing shards and never leaves
a torn partition visible. Ray Data's ``write_parquet`` alone can't
skip finished work, so the export fans a WORK-LIST of shards through
``map_batches`` (one task per shard, like the graph-ANN builder): each
task opens only its own row ranges (node-local reads on a real
cluster), applies the transform, and publishes its partition dir.

Layout:

    {out_dir}/shard={i}/data.parquet   transformed rows of shard i
    {out_dir}/shard={i}/_SUCCESS       atomic completion marker

Shards are contiguous ``shard_rows`` row slices of the input files in
file order — deterministic, so resumed runs and the SQL oracle agree
on shard membership (at scale, set ``shard_rows`` to the rows per
input file so a shard IS a file). Reference analog: none (fdblucene
never re-materializes the corpus); this is the Ray-pipeline surface a
training-data user needs between curation and tokenization.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def _plan_shards(paths: list[str], shard_rows: int) -> list[dict]:
    """Contiguous global row slices mapped to (file, row-range) reads.
    Only parquet METADATA is opened here."""
    shards = []
    sizes = [(p, pq.read_metadata(p).num_rows) for p in paths]
    total = sum(n for _, n in sizes)
    n_shards = (total + shard_rows - 1) // shard_rows
    for i in range(n_shards):
        g_lo, g_hi = i * shard_rows, min((i + 1) * shard_rows, total)
        parts = []
        base = 0
        for p, n in sizes:
            lo = max(g_lo - base, 0)
            hi = min(g_hi - base, n)
            if hi > lo:
                parts.append({"path": p, "lo": int(lo), "hi": int(hi)})
            base += n
        shards.append({"shard": i, "parts": parts})
    return shards


class _ExportShard:
    """One shard per call: read its row ranges (row-group pruned),
    apply the transform, publish ``shard={i}/`` atomically. Shards
    whose ``_SUCCESS`` marker exists are skipped without reading."""

    def __init__(self, out_dir: str, transform, columns):
        self.out_dir = out_dir
        self.transform = transform
        self.columns = columns

    def _read_range(self, path: str, lo: int, hi: int) -> pa.Table:
        f = pq.ParquetFile(path)
        # open only row groups overlapping [lo, hi)
        rgs, base = [], 0
        first_base = None
        for i in range(f.metadata.num_row_groups):
            n = f.metadata.row_group(i).num_rows
            if base < hi and base + n > lo:
                rgs.append(i)
                if first_base is None:
                    first_base = base
            base += n
        if not rgs:
            return f.schema_arrow.empty_table()
        t = f.read_row_groups(rgs, columns=self.columns)
        return t.slice(lo - first_base, hi - lo)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_rows = []
        for i in range(batch.num_rows):
            shard = int(batch["shard"][i].as_py())
            parts = json.loads(batch["parts_json"][i].as_py())
            sdir = os.path.join(self.out_dir, f"shard={shard}")
            marker = os.path.join(sdir, "_SUCCESS")
            if os.path.exists(marker):
                meta = json.load(open(marker))
                out_rows.append(
                    (shard, meta["n_in"], meta["n_out"], True)
                )
                continue
            t = pa.concat_tables(
                [self._read_range(p["path"], p["lo"], p["hi"])
                 for p in parts]
            )
            n_in = t.num_rows
            out = self.transform(t)
            tmp = sdir + f".tmp-{os.getpid()}"
            os.makedirs(tmp, exist_ok=True)
            pq.write_table(out, os.path.join(tmp, "data.parquet"))
            with open(os.path.join(tmp, "_SUCCESS"), "w") as fh:
                json.dump({"n_in": n_in, "n_out": out.num_rows}, fh)
            resumed = False
            if os.path.isdir(sdir):  # racing writer finished first
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)
                resumed = True
            else:
                try:
                    os.rename(tmp, sdir)
                except OSError:
                    # TOCTOU: a racing writer renamed between our
                    # isdir check and the rename — they won.
                    import shutil

                    shutil.rmtree(tmp, ignore_errors=True)
                    resumed = True
            out_rows.append((shard, n_in, out.num_rows, resumed))
        return pa.table(
            {
                "shard": pa.array([r[0] for r in out_rows], pa.int64()),
                "n_in": pa.array([r[1] for r in out_rows], pa.int64()),
                "n_out": pa.array([r[2] for r in out_rows], pa.int64()),
                "resumed": pa.array([r[3] for r in out_rows]),
            }
        )


def export_corpus(
    paths: list[str] | str,
    out_dir: str,
    transform,
    *,
    shard_rows: int = 100_000,
    columns: list[str] | None = None,
) -> pa.Table:
    """Transform + export a corpus into resumable ``shard={i}/``
    partition dirs. ``transform``: ``pa.Table -> pa.Table`` (must be
    serializable). Returns the export manifest (shard, n_in, n_out,
    resumed) sorted by shard — shards already published by an earlier
    run are skipped unread."""
    if isinstance(paths, str):
        paths = [paths]
    os.makedirs(out_dir, exist_ok=True)
    shards = _plan_shards(paths, shard_rows)
    items = [
        {"shard": s["shard"], "parts_json": json.dumps(s["parts"])}
        for s in shards
    ]
    if not items:
        return pa.table(
            {"shard": pa.array([], pa.int64()),
             "n_in": pa.array([], pa.int64()),
             "n_out": pa.array([], pa.int64()),
             "resumed": pa.array([], pa.bool_())}
        )
    res = (
        ray.data.from_items(items)
        .map_batches(
            _ExportShard(out_dir, transform, columns),
            batch_size=1,
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(res, preserve_index=False)


def read_exported(out_dir: str) -> ray.data.Dataset:
    """Re-open an export as a Dataset (hive ``shard=`` inferred)."""
    files = sorted(glob.glob(os.path.join(out_dir, "shard=*", "*.parquet")))
    return ray.data.read_parquet(files)
