"""Resumable shard-level corpus transform + write.

The ops-side analog of ``index.build.build_sharded``: every corpus
transform that MATERIALIZES output (curation verdicts, tokenized
counts, scrubbed text, ...) should write one output directory per
input shard with a done-marker, so a failed 100-TB run resumes by
skipping finished shards — never one giant output file, never
re-reading finished input (the brief's resumable-output rule).

The marker records the input signature (path+size+mtime of every file
in the shard), so an edited input invalidates just its own shard.
"""

from __future__ import annotations

import json
import os

import ray.data

from fdblucene_ray.sources.corpus import corpus_signature

_MARKER = "_DONE.json"


def shard_out_dir(out_dir: str, i: int) -> str:
    return os.path.join(out_dir, f"shard-{i:05d}")


def transform_sharded(
    shards: list[list[str] | str],
    out_dir: str,
    transform,
    *,
    resume: bool = True,
) -> dict:
    """Apply ``transform(ray.data.Dataset) -> ray.data.Dataset`` to each
    input shard and write ``out_dir/shard-{i}/*.parquet``. A finished
    shard leaves ``_DONE.json`` (input signature + row count); on
    re-run, shards whose marker matches the CURRENT input signature are
    skipped without reading their input. Output appears atomically per
    shard: parquet is written to a temp dir that is renamed over only
    after success, so a killed run never leaves a half shard that
    looks finished.

    Returns {"written": [...], "skipped": [...], "rows": total}.
    """
    os.makedirs(out_dir, exist_ok=True)
    written, skipped, total_rows = [], [], 0
    for i, shard in enumerate(shards):
        paths = [shard] if isinstance(shard, str) else list(shard)
        sig = corpus_signature(paths, "")
        sdir = shard_out_dir(out_dir, i)
        marker = os.path.join(sdir, _MARKER)
        if resume and os.path.exists(marker):
            with open(marker) as fh:
                rec = json.load(fh)
            if rec.get("signature") == sig:
                skipped.append(i)
                total_rows += int(rec.get("rows", 0))
                continue
        tmp = sdir + ".tmp"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        out = transform(ray.data.read_parquet(paths))
        out.write_parquet(tmp)
        rows = sum(
            _parquet_rows(os.path.join(tmp, f))
            for f in os.listdir(tmp)
            if f.endswith(".parquet")
        )
        if os.path.exists(sdir):
            import shutil

            shutil.rmtree(sdir)
        os.replace(tmp, sdir)
        with open(marker + ".tmp", "w") as fh:
            json.dump({"signature": sig, "rows": rows, "shard": i}, fh)
        os.replace(marker + ".tmp", marker)
        written.append(i)
        total_rows += rows
    return {"written": written, "skipped": skipped, "rows": total_rows}


def _parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def read_sharded(out_dir: str) -> ray.data.Dataset:
    """Dataset over every finished shard's parquet files (markers and
    temp dirs excluded)."""
    dirs = sorted(
        os.path.join(out_dir, d)
        for d in os.listdir(out_dir)
        if d.startswith("shard-") and not d.endswith(".tmp")
        and os.path.exists(os.path.join(out_dir, d, _MARKER))
    )
    files = [
        os.path.join(d, f)
        for d in dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    return ray.data.read_parquet(files)
