"""WARC container source — Common Crawl's at-rest format.

The pipeline's canonical input shape is the ``(url, warc_ts, html,
text, lang)`` Parquet table (BASELINE.json input_hint), but the raw
crawl lives in WARC/1.0 files: a stream of records, each a header block
(``WARC/1.0\\r\\n`` + ``Name: value`` lines + blank line) followed by
``Content-Length`` payload bytes and ``\\r\\n\\r\\n``. Response records
wrap an HTTP envelope around the HTML. Common Crawl stores each record
as its own gzip member so a reader can seek straight to a record from
the CDX index offset.

This module implements both directions:

- ``write_warc`` / ``synth_warc_files``: serialize (url, ts, html) rows
  as spec-shaped response records, optionally one gzip member per
  record (the CC layout); the synthetic fixture derives from the same
  deterministic ``generate_webpages`` rows the Parquet fixture uses, so
  a WARC read and a Parquet read of the same id range are comparable
  row-for-row.
- ``read_warc``: a Ray pipeline — ``read_binary_files`` (one task per
  WARC file) -> a parse ``map_batches`` that walks records by
  Content-Length (never regex over payload bytes, which may contain
  anything), strips the HTTP envelope, and emits (url, warc_ts, html).

Scale note: one task per FILE matches how CC ships data (files are
~1 GB); finer parallelism comes from the per-record gzip members + CDX
offsets (pass explicit (path, offset, length) splits — the parser is
offset-oblivious). Record parsing is necessarily sequential WITHIN a
file (lengths chain), which is exactly the reference's
sequential-pages-within-a-segment read shape (FDBIndexInput).

Reference tie-in: SURVEY.md §2.1 S15 (input connector family) — the
reference ingests documents through Lucene ``addDocument``; here the
connector layer itself is part of the engine.
"""

from __future__ import annotations

import gzip
import io
import os

import numpy as np
import pyarrow as pa
import ray.data

_CRLF = b"\r\n"


def _record_bytes(url: str, ts_us: int, html: bytes, rec_id: str) -> bytes:
    """One WARC/1.0 response record with a minimal HTTP envelope."""
    # WARC-Date: ISO-8601 from the microsecond timestamp (UTC)
    import datetime

    dt = datetime.datetime.fromtimestamp(
        ts_us / 1_000_000, tz=datetime.timezone.utc
    )
    wdate = dt.strftime("%Y-%m-%dT%H:%M:%SZ")
    http = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: text/html" + _CRLF
        + b"Content-Length: " + str(len(html)).encode() + _CRLF
        + _CRLF
        + html
    )
    hdr = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Record-ID: <urn:uuid:" + rec_id.encode() + b">" + _CRLF
        + b"WARC-Date: " + wdate.encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + b"Content-Length: " + str(len(http)).encode() + _CRLF
        + _CRLF
    )
    return hdr + http + _CRLF + _CRLF


def write_warc(
    path: str,
    rows: pa.Table,
    *,
    gzip_per_record: bool = False,
) -> str:
    """Serialize (url, warc_ts, html) rows into one WARC file.
    ``gzip_per_record=True`` writes each record as its own gzip member
    (the Common Crawl layout — a plain ``gzip.open`` read still
    decompresses the concatenation transparently)."""
    urls = rows["url"].to_pylist()
    ts = rows["warc_ts"].cast(pa.int64()).to_pylist()
    htmls = rows["html"].to_pylist()
    buf = io.BytesIO()
    for i, (u, t, h) in enumerate(zip(urls, ts, htmls)):
        rec = _record_bytes(u, int(t), h, f"{i:08d}-0000-0000-0000-000000000000")
        if gzip_per_record:
            # mtime=0 for byte determinism
            buf.write(gzip.compress(rec, mtime=0))
        else:
            buf.write(rec)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(buf.getvalue())
    os.replace(tmp, path)
    return path


def synth_warc_files(
    out_dir: str,
    n_rows: int,
    rows_per_file: int = 1000,
    *,
    gzip_per_record: bool = False,
) -> list[str]:
    """Deterministic WARC fixture: the same generate_webpages rows the
    Parquet fixture uses, serialized as WARC (cached by path)."""
    from fdblucene_ray.sources.webpages import generate_webpages

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_per_record else ".warc"
    paths = []
    for fi, start in enumerate(range(0, n_rows, rows_per_file)):
        count = min(rows_per_file, n_rows - start)
        path = os.path.join(out_dir, f"crawl-{fi:05d}{ext}")
        paths.append(path)
        if os.path.exists(path):
            continue
        write_warc(
            path, generate_webpages(start, count),
            gzip_per_record=gzip_per_record,
        )
    return paths


def parse_warc_bytes(data: bytes) -> pa.Table:
    """Walk one WARC file's bytes record by record (Content-Length
    chaining — the payload is NEVER scanned) and emit (url, warc_ts,
    html) for every response record."""
    if data[:2] == b"\x1f\x8b":  # gzip (possibly multi-member)
        data = gzip.decompress(data)
    urls: list[str] = []
    ts: list[int] = []
    htmls: list[bytes] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        hdr_end = data.index(b"\r\n\r\n", pos)
        head = data[pos:hdr_end].decode("utf-8", "replace")
        fields = {}
        for line in head.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields["content-length"])
        body = data[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if fields.get("warc-type") != "response":
            continue
        # strip the HTTP envelope: payload starts after its blank line
        he = body.index(b"\r\n\r\n")
        html = body[he + 4 :]
        urls.append(fields["warc-target-uri"])
        import datetime

        dt = datetime.datetime.strptime(
            fields["warc-date"], "%Y-%m-%dT%H:%M:%SZ"
        ).replace(tzinfo=datetime.timezone.utc)
        ts.append(int(dt.timestamp() * 1_000_000))
        htmls.append(html)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(np.array(ts, np.int64)).cast(
                pa.timestamp("us")
            ),
            "html": pa.array(htmls, pa.binary()),
        }
    )


def read_warc(paths: list[str] | str) -> ray.data.Dataset:
    """WARC files -> Dataset of (url, warc_ts, html): one read task per
    file, parse inside map_batches. For CC-scale files pass CDX-derived
    byte ranges as separate 'files' (object-store range reads) — the
    parser accepts any record-aligned byte window."""

    def parse(batch: pa.Table) -> pa.Table:
        tables = [parse_warc_bytes(b.as_py()) for b in batch["bytes"]]
        return (
            pa.concat_tables(tables)
            if tables
            else parse_warc_bytes(b"")
        )

    return ray.data.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow"
    )


class _WarcToParquetTask:
    """One WARC file per call: parse records, extract text from html
    (the expensive decode runs exactly once), language-ID the text, and
    publish an input_hint-shaped parquet shard (url, warc_ts, html,
    text, lang) via temp + atomic rename. Existing shards are skipped
    unread — a failed conversion re-does only missing files."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        from fdblucene_ray.ops.textstats import LangId
        from fdblucene_ray.sources.webpages import extract_text_batch

        done, rows = [], []
        for p in batch["path"].to_pylist():
            name = os.path.splitext(os.path.basename(p))[0]
            if name.endswith(".warc"):
                name = name[: -len(".warc")]
            dest = os.path.join(self.out_dir, f"{name}.parquet")
            if os.path.exists(dest):
                done.append(dest)
                rows.append(pq.read_metadata(dest).num_rows)
                continue
            with open(p, "rb") as fh:
                t = parse_warc_bytes(fh.read())
            t = extract_text_batch(t)
            lang = LangId("text_extracted", "url")(t)["pred_lang"]
            out = pa.table(
                {
                    "url": t["url"],
                    "warc_ts": t["warc_ts"],
                    "html": t["html"],
                    "text": t["text_extracted"],
                    "lang": lang,
                }
            )
            tmp = dest + f".tmp-{os.getpid()}"
            pq.write_table(out, tmp)
            os.replace(tmp, dest)
            done.append(dest)
            rows.append(out.num_rows)
        return pa.table(
            {"path": pa.array(done, pa.string()),
             "rows": pa.array(rows, pa.int64())}
        )


def warc_to_parquet(paths: list[str] | str, out_dir: str) -> list[str]:
    """Convert WARC files to the input_hint parquet layout (one shard
    per WARC file, resumable, one task per file — node-local reads on
    a real cluster). Returns the shard paths in input order."""
    if isinstance(paths, str):
        paths = [paths]
    os.makedirs(out_dir, exist_ok=True)
    todo = [{"path": p} for p in paths]
    produced = set(
        ray.data.from_items(todo)
        .map_batches(
            _WarcToParquetTask(out_dir), batch_size=1,
            batch_format="pyarrow",
        )
        .to_pandas()["path"].tolist()
    )
    # Preserve INPUT order: dest names derive deterministically from the
    # input basenames, so map each input to its shard rather than
    # lexicographically sorting (file10 must not precede file2 — doc-id
    # assignment downstream follows this list's order).
    ordered = []
    for p in paths:
        name = os.path.splitext(os.path.basename(p))[0]
        if name.endswith(".warc"):
            name = name[: -len(".warc")]
        dest = os.path.join(out_dir, f"{name}.parquet")
        assert dest in produced, dest
        ordered.append(dest)
    return ordered
