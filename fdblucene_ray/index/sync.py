"""One-shot incremental directory sync — the cron-able continuity tool
for the §2.9 story (SURVEY.md: "new input files => one more shard =>
new manifest version"): diff an input directory against the files this
index has already ingested and append ONLY the new ones as one
shard batch through the multi-writer-safe ``index/build.append_shards``
(CAS doc-id reservation; see the concurrency contract below).

State: ``{index_dir}/sync/ingested.json`` maps each ingested file to
its (size, mtime_ns) identity, published atomically AFTER the append
commits. The crash window between append and ledger is closed by a
two-phase intent journal: each batch writes
``sync/intent.json`` (file list + a content-derived batch token)
BEFORE appending and calls ``append_shards(idempotency_token=token)``;
the next sync REPLAYS any leftover intent first — the token makes a
committed batch's replay a manifest no-op, an uncommitted one a real
append — so a crash at any point yields exactly-once ingest (pinned by
tests that kill both sides of the window). Already-ingested files are
NEVER re-opened (tamper-probe test); a previously-ingested file whose
size/mtime changed raises — input shards are immutable by contract.

Reference analog: the reference's near-real-time refresh loop
(IndexWriter kept open, commit per batch, README.md:71-78); here each
sync call is one atomic commit.

Concurrency contract: run ONE sync process per index at a time (the
usual single-instance cron). The underlying ``append_shards`` is
multi-writer-safe, but two syncs that race the same inbox would both
see the same pending files and ingest them twice — the ledger
arbitrates file identity, not process ownership. Concurrent ingest of
DISJOINT inputs belongs on ``append_shards`` directly.
"""

from __future__ import annotations

import glob as _glob
import json
import os

from fdblucene_ray.index.manifest import Manifest, load_manifest


def _state_path(index_dir: str) -> str:
    return os.path.join(index_dir, "sync", "ingested.json")


def _load_state(index_dir: str) -> dict:
    p = _state_path(index_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as fh:
        return json.load(fh)


def _file_identity(path: str) -> dict:
    st = os.stat(path)
    return {"size": st.st_size, "mtime_ns": st.st_mtime_ns}


def _intent_path(index_dir: str) -> str:
    return os.path.join(index_dir, "sync", "intent.json")


def _write_json_atomic(path: str, obj) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp-{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(obj, fh, sort_keys=True)
    os.replace(tmp, path)


def _batch_token(files: list[str]) -> str:
    import hashlib

    h = hashlib.sha1()
    for ap in files:
        ident = _file_identity(ap)
        h.update(
            f"{ap}:{ident['size']}:{ident['mtime_ns']}".encode()
        )
    return "sync-" + h.hexdigest()[:24]


def _ingest_batch(
    index_dir: str,
    files: list[str],
    files_per_shard: int,
    append_kw: dict,
    token: str | None = None,
) -> Manifest:
    """Two-phase exactly-once ingest of one file batch: intent ->
    idempotent append -> ledger -> intent removal. A replay passes the
    intent's STORED token so the batch identity survives any clock or
    identity drift between crash and recovery."""
    from fdblucene_ray.index.build import append_shards

    token = token or _batch_token(files)
    _write_json_atomic(
        _intent_path(index_dir), {"token": token, "files": files}
    )
    shards = [
        files[i : i + files_per_shard]
        for i in range(0, len(files), files_per_shard)
    ]
    m = append_shards(
        index_dir, shards, idempotency_token=token, **append_kw
    )
    state = _load_state(index_dir)
    for ap in files:
        state[ap] = _file_identity(ap)
    _write_json_atomic(_state_path(index_dir), state)
    os.remove(_intent_path(index_dir))
    return m


def sync_index(
    index_dir: str,
    input_dir: str,
    *,
    pattern: str = "*.parquet",
    files_per_shard: int = 16,
    **append_kw,
) -> tuple[Manifest | None, list[str]]:
    """Append every not-yet-ingested ``pattern`` file under
    ``input_dir`` to the index; returns (manifest, newly ingested
    paths) — (None, []) when there is nothing to do. Deterministic
    ingest order (sorted paths); new files group into shards of
    ``files_per_shard`` so one sync of a large backlog still
    parallelizes across shard pipelines. A leftover intent from a
    crashed sync is replayed FIRST (exactly-once via the append
    idempotency token — see the module docstring)."""
    replayed_m: Manifest | None = None
    replayed_files: list[str] = []
    ip = _intent_path(index_dir)
    if os.path.exists(ip):
        with open(ip) as fh:
            intent = json.load(fh)
        replayed_m = _ingest_batch(
            index_dir, intent["files"], files_per_shard, append_kw,
            token=intent["token"],
        )
        replayed_files = list(intent["files"])
    state = _load_state(index_dir)
    found = sorted(_glob.glob(os.path.join(input_dir, pattern)))
    new: list[str] = []
    for p in found:
        ap = os.path.realpath(p)
        if ap in state:
            ident = _file_identity(ap)
            if ident != state[ap]:
                raise ValueError(
                    f"ingested input shard changed on disk: {ap} "
                    f"(was {state[ap]}, now {ident}); input shards "
                    "are immutable — write new files instead"
                )
            continue
        new.append(ap)
    if not new:
        # a replayed crash-recovery batch is THIS call's work: its
        # original caller never saw a report (it crashed), so the
        # replay's manifest and files are returned here rather than
        # pretending nothing happened (reporting is at-least-once;
        # ingestion itself stays exactly-once via the append token)
        return replayed_m, replayed_files
    m = _ingest_batch(index_dir, new, files_per_shard, append_kw)
    return m, replayed_files + new


def mark_ingested(index_dir: str, paths: list[str]) -> None:
    """Adopt files into sync management WITHOUT appending them — for
    an index whose bootstrap build already consumed them (the sync
    state is advisory bookkeeping; the index content is authoritative
    and untouched)."""
    state = _load_state(index_dir)
    for p in paths:
        ap = os.path.realpath(p)
        state[ap] = _file_identity(ap)
    _write_json_atomic(_state_path(index_dir), state)


def sync_status(index_dir: str, input_dir: str, *,
                pattern: str = "*.parquet") -> dict:
    """Report without ingesting: how many files are pending vs done."""
    state = _load_state(index_dir)
    found = sorted(_glob.glob(os.path.join(input_dir, pattern)))
    pending = [
        p for p in found if os.path.realpath(p) not in state
    ]
    m = None
    try:
        m = load_manifest(index_dir)
    except Exception:
        pass
    return {
        "found": len(found),
        "ingested": len(found) - len(pending),
        "pending": pending,
        "manifest_version": None if m is None else m.version,
    }
