"""Distributed index build: the Ray-Data restatement of the reference's
write path (SURVEY.md §3.1).

    read_parquet (pruned: only id + indexed columns leave storage)
      -> map_batches(TokenizeToPostings)     zero-copy Arrow batches ->
         per-term RUN rows {part, key, min_doc, n, docs, tfs, norms}
         (map-side combine: one packed row per term per batch) +
         per-batch doc-stat sentinel runs
      -> groupby("part")                     the ONE all-to-all shuffle,
                                             keyed by salted term hash;
                                             rows are runs, so the sort
                                             prices ~1/100th the rows
      -> map_groups(EncodeGroup)             order runs, bulk delta+varint
                                             block encode, write immutable
                                             segment, emit lineage row
      -> driver folds lineage rows into a Manifest -> atomic publish
         (the analog of the reference's rename commit,
         FDBDirectory.java:351-365)

Skew: Zipfian head terms are salted — the shuffle key of a head term is
``hash(key) + golden * (doc_id // salt_chunk)`` so its postings spread
over many partitions; multi-segment search semantics (df summed across
segments) make this correctness-free (SURVEY.md §4 "Skew").

Resumability: the build is idempotent (deterministic doc ids) and
checkpointed at two levels — whole-job (manifest records the input
signature; a re-run with the same signature is a no-op) and
per-partition (lineage records let a crashed run's encode work be
reused). ``build_sharded`` additionally checkpoints per input shard.
"""

from __future__ import annotations

import json
import os
import time
import zlib
from contextlib import contextmanager

import numpy as np
import pyarrow as pa
import ray
import ray.data

from fdblucene_ray.analysis.analyzer import BatchTokenizer, get_analyzer
from fdblucene_ray.codec.postings import BLOCK_SIZE
from fdblucene_ray.codec.smallfloat import encode_lengths
from fdblucene_ray.index.manifest import (
    Manifest,
    SegmentMeta,
    load_manifest,
    publish_manifest,
    read_lineage,
    write_lineage,
)
from fdblucene_ray.index.segment import (
    DOC_SENTINEL,
    FIELD_SEP,
    write_segment,
    write_segment_runs,
)
from fdblucene_ray.index.wire import pack_docs, pack_vals
from fdblucene_ray.sources.corpus import corpus_signature, read_corpus_with_doc_ids

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _key_hash(keys: list[str]) -> np.ndarray:
    """Stable per-process-independent hash of term keys (crc32)."""
    return np.fromiter(
        (zlib.crc32(k.encode("utf-8", "surrogatepass")) for k in keys),
        dtype=np.uint64,
        count=len(keys),
    )


def gather_groups(flat: np.ndarray, group_lens: np.ndarray, perm: np.ndarray) -> np.ndarray:
    """Reorder a flat array of variable-length groups by ``perm``
    (vectorized): group i occupies flat[starts[i]:starts[i]+lens[i]]."""
    lens = np.asarray(group_lens, np.int64)
    starts = np.concatenate(([0], np.cumsum(lens[:-1])))
    L = lens[perm]
    total = int(L.sum())
    if total == 0:
        return flat[:0]
    dst_starts = np.concatenate(([0], np.cumsum(L[:-1])))
    idx = np.repeat(starts[perm], L) + (
        np.arange(total, dtype=np.int64) - np.repeat(dst_starts, L)
    )
    return flat[idx]


def _packed_binary(values_u8: np.ndarray, starts: np.ndarray, ends: np.ndarray):
    """Zero-copy pa.binary array whose cell i is values_u8[starts[i]:ends[i]]
    (cells must be back-to-back: ends[i] == starts[i+1])."""
    n = len(starts)
    if n == 0:
        return pa.array([], pa.binary())
    offsets = np.empty(n + 1, dtype=np.int32)
    offsets[:-1] = starts
    offsets[-1] = ends[-1]
    return pa.Array.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(values_u8.tobytes())],
    )


class TokenizeToPostings:
    """Actor-pool map_batches stage (SURVEY.md §2.3): analyzer tables and
    the stem memo cache are built once per actor in ``__init__``, each
    ``__call__`` is fully vectorized over one Arrow batch."""

    def __init__(
        self,
        fields: dict[str, dict],
        num_partitions: int,
        id_col: str = "doc_id",
        head_terms: frozenset[str] | None = None,
        salt_chunk: int = 1 << 16,
        auto_salt_ratio: float = 0.25,
        wire: str = "raw",
    ):
        """``head_terms``: explicit terms to salt. ``auto_salt_ratio``:
        additionally salt any term whose within-batch doc frequency
        exceeds this fraction of the batch (Zipf heads are heavy in
        EVERY batch, so this is a deterministic pure function of batch
        content — no global pre-pass needed). Set to 0/None to disable."""
        self.fields = fields
        self.tokenizers = {
            f: BatchTokenizer(cfg["analyzer"])
            for f, cfg in fields.items()
            if cfg["analyzer"] != "keyword"
        }
        self.P = num_partitions
        self.id_col = id_col
        self.head_terms = head_terms or frozenset()
        self.salt_chunk = salt_chunk
        self.auto_salt_ratio = auto_salt_ratio or 0.0
        self.wire = wire

    def _emit_field(self, field, cfg, batch, doc_ids, out):
        """Emit one RUN row per term present in this batch — a packed
        (doc_ids, tfs, norms) binary triple — instead of one row per
        posting. This map-side combine shrinks the shuffle by ~2 orders
        of magnitude in row count (the sort-based exchange prices rows,
        not bytes) and moves the payload as three zero-copy Arrow binary
        cells built straight from numpy buffers.
        """
        col = batch[cfg["column"]]
        want_pos = bool(cfg.get("positions"))
        positions = None
        if cfg["analyzer"] == "keyword":
            # StringField semantics: verbatim single token, dl == 1
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            denc = col.cast(pa.string()).dictionary_encode()
            vocab = denc.dictionary.to_pylist()
            # enforce the documented reserved-byte rejection (segment.py
            # DOC_SENTINEL/FIELD_SEP): a keyword value carrying \x00 or
            # \x1f could masquerade as a sentinel or desync the
            # field\x1fterm key split — refuse loudly at build time
            for v in vocab:
                if "\x00" in v or "\x1f" in v:
                    raise ValueError(
                        f"keyword field {field!r}: value {v!r} contains a "
                        "reserved byte (\\x00 or \\x1f); keyword values "
                        "must not contain NUL or unit-separator bytes"
                    )
            codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            n = len(codes)
            post_rows = np.arange(n, dtype=np.int64)
            tfs = np.ones(n, dtype=np.int32)
            doc_lens = np.ones(n, dtype=np.int32)
            if want_pos:
                positions = np.zeros(n, np.int32)
        else:
            tk = self.tokenizers[field]
            if cfg.get("multi"):
                # multi-valued field (list<string> column): positions
                # continue across values with a positionIncrementGap so
                # phrase/near queries never match across values
                enc = tk.term_frequencies_encoded_multi(
                    col, gap=int(cfg.get("gap", 100)),
                    with_positions=want_pos,
                )
            else:
                enc = tk.term_frequencies_encoded(
                    col, with_positions=want_pos
                )
            post_rows, codes, vocab, tfs, doc_lens = enc[:5]
            if want_pos:
                positions = enc[5]
        post_docs = doc_ids[post_rows]
        norms = encode_lengths(doc_lens)
        norm_rows = norms[post_rows]

        # group postings by (term, doc): one run per term in the batch
        order = np.lexsort((post_docs, codes))
        c = codes[order]
        d = np.ascontiguousarray(post_docs[order], dtype="<i8")
        t = np.ascontiguousarray(tfs[order], dtype="<i4")
        nr = np.ascontiguousarray(norm_rows[order], dtype=np.uint8)
        if positions is not None:
            positions = np.ascontiguousarray(
                gather_groups(positions, tfs, order), dtype="<i4"
            )
        if len(c):
            bounds = np.flatnonzero(np.diff(c)) + 1
            starts = np.concatenate(([0], bounds)).astype(np.int64)
            ends = np.concatenate((bounds, [len(c)])).astype(np.int64)
        else:
            starts = ends = np.empty(0, np.int64)
        run_codes = c[starts] if len(c) else starts
        n_per_run = (ends - starts).astype(np.int64)
        min_docs = d[starts] if len(c) else starts
        sum_tf = (
            np.add.reduceat(t.astype(np.int64), starts) if len(c) else starts
        )

        prefix = field + FIELD_SEP
        base_hash = _key_hash([prefix + v for v in vocab])
        run_hash = base_hash[run_codes]
        # head-term salting: explicit list OR automatic (df within this
        # batch above the ratio) — spreads a Zipf head's postings over
        # many partitions; multi-segment collection stats keep it exact
        is_head = np.zeros(len(run_codes), dtype=bool)
        if self.head_terms:
            is_head |= np.array(
                [v in self.head_terms for v in vocab], dtype=bool
            )[run_codes]
        if self.auto_salt_ratio and len(batch):
            is_head |= n_per_run >= max(2, int(self.auto_salt_ratio * len(batch)))
        if is_head.any():
            with np.errstate(over="ignore"):
                salt = (
                    min_docs[is_head].astype(np.uint64)
                    // np.uint64(self.salt_chunk)
                ) * _GOLDEN
                run_hash = run_hash.copy()
                run_hash[is_head] += salt
        with np.errstate(over="ignore"):
            part = (run_hash % np.uint64(self.P)).astype(np.int32)

        keys = pa.DictionaryArray.from_arrays(
            pa.array(run_codes.astype(np.int32)),
            pa.array([prefix + v for v in vocab], pa.string()),
        ).cast(pa.string())
        if positions is not None:
            pcum = np.concatenate(([0], np.cumsum(t.astype(np.int64))))
            pos_cells = _packed_binary(
                positions.view(np.uint8), pcum[starts] * 4, pcum[ends] * 4
            )
        else:
            pos_cells = pa.nulls(len(starts), pa.binary())
        out.append(
            pa.table(
                {
                    "part": pa.array(part),
                    "key": keys,
                    "min_doc": pa.array(min_docs, pa.int64()),
                    "n": pa.array(n_per_run, pa.int64()),
                    "sum_tf": pa.array(sum_tf, pa.int64()),
                    "docs": pack_docs(d, starts, ends, self.wire),
                    "tfs": pack_vals(t, starts, ends, self.wire),
                    "norms": _packed_binary(nr, starts, ends),
                    "pos": pos_cells,
                }
            )
        )

        # one doc-stat sentinel run per batch per field, salted across
        # partitions by doc chunk. The run's docs/tfs cells pack the
        # batch's (doc_id, exact dl) pairs — the per-doc norms-file
        # analog (Lucene .nvd) — so segments can persist exact doc
        # lengths (doclens.parquet) and merges can purge tombstoned
        # docs' stats exactly; n/sum_tf stay the (dc, sum_dl) partials.
        has = doc_lens > 0
        n_docs = int(has.sum())
        if n_docs:
            skey = prefix + DOC_SENTINEL
            h = np.uint64(zlib.crc32(skey.encode("utf-8", "surrogatepass")))
            chunk = int(doc_ids[has].min()) // self.salt_chunk
            with np.errstate(over="ignore"):  # modular mixing, wrap intended
                spart = int((h + np.uint64(chunk) * _GOLDEN) % np.uint64(self.P))
            empty = pa.array([b""], pa.binary())
            sd = np.ascontiguousarray(doc_ids[has], np.int64)
            sl = np.ascontiguousarray(doc_lens[has], np.int64)
            one = (np.array([0], np.int64), np.array([n_docs], np.int64))
            out.append(
                pa.table(
                    {
                        "part": pa.array([spart], pa.int32()),
                        "key": pa.array([skey], pa.string()),
                        "min_doc": pa.array([int(sd[0])], pa.int64()),
                        "n": pa.array([n_docs], pa.int64()),
                        "sum_tf": pa.array([int(doc_lens.sum())], pa.int64()),
                        "docs": pack_docs(sd, *one, self.wire),
                        "tfs": pack_vals(sl, *one, self.wire),
                        "norms": empty,
                        "pos": empty,
                    }
                )
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out: list[pa.Table] = []
        for field, cfg in self.fields.items():
            self._emit_field(field, cfg, batch, doc_ids, out)
        return pa.concat_tables(out)


class EncodeGroup:
    """map_groups callable: one shuffle partition -> one immutable segment
    plus a lineage row. Plain tasks (no state to amortize beyond args).

    ``runs=True`` (the build path) expects packed run rows from
    TokenizeToPostings; ``runs=False`` (merge/tests) expects row-level
    postings {key, doc_id, tf, norm}.
    """

    def __init__(
        self, index_dir: str, signature: str, block_size: int, resume: bool,
        runs: bool = True, codec: str = "varint-block", wire: str = "raw",
    ):
        self.__name__ = "EncodeGroup"  # map_groups wraps fn and reads __name__
        self.index_dir = index_dir
        self.signature = signature
        self.block_size = block_size
        self.resume = resume
        self.runs = runs
        self.codec = codec
        self.wire = wire

    def __call__(self, group: pa.Table) -> pa.Table:
        part = int(group["part"][0].as_py())
        name = f"seg-{self.signature}-{part:05d}"
        t0 = time.perf_counter()
        if self.resume:
            rec = read_lineage(self.index_dir, self.signature, part)
            if rec is not None and os.path.isdir(
                os.path.join(self.index_dir, "segments", rec["meta"]["name"])
            ):
                return self._row(part, SegmentMeta.from_json(rec["meta"]), 0.0, True)
        if self.runs:
            meta = write_segment_runs(
                self.index_dir, name, group.drop_columns(["part"]),
                self.block_size, codec=self.codec, wire=self.wire,
            )
        else:
            meta = write_segment(
                self.index_dir, name, group.drop_columns(["part"]),
                self.block_size, codec=self.codec,
            )
        wall = time.perf_counter() - t0
        write_lineage(
            self.index_dir,
            self.signature,
            part,
            {"meta": meta.to_json(), "wall_s": wall, "rows": group.num_rows},
        )
        return self._row(part, meta, wall, False)

    @staticmethod
    def _row(part: int, meta: SegmentMeta, wall: float, skipped: bool) -> pa.Table:
        return pa.table(
            {
                "part": pa.array([part], pa.int32()),
                "segment_meta": pa.array([json.dumps(meta.to_json())], pa.string()),
                "wall_s": pa.array([wall], pa.float64()),
                "skipped": pa.array([skipped], pa.bool_()),
            }
        )


@contextmanager
def _shuffle_strategy(num_partitions: int | None = None, dataset=None):
    """Scoped shuffle-strategy choice for the build/merge exchange (all
    touched contexts are restored on exit).

    CRITICAL Ray Data capture semantics (two traps, both hit in earlier
    rounds): (1) the strategy is read at plan-CONSTRUCTION (`groupby()`),
    not at the consuming call; (2) every Dataset carries a COPY of the
    DataContext taken when the SOURCE dataset was created
    (`DataContext.get_current().copy()` in read_api), and
    `GroupedData.map_groups` consults ``dataset.context`` — so mutating
    the global context after `read_parquet` has already run silently
    does nothing (round 2 shipped exactly this bug; the fix is the
    ``dataset=`` parameter, which patches the captured copy directly).
    Pass the dataset whose ``groupby`` is about to be called.

    Strategy choice (measured this round, 600k-doc build, 32 CPUs, with
    the capture bug FIXED so the setting actually applies): push-based
    sort shuffle 19.4-22.1s at 256 partitions vs hash shuffle 21.9s
    (best, 8 aggregators/64 parts) degrading to 88.7s at 256 parts —
    the aggregator actor pool serializes the exchange on a single node.
    Push-based sort is therefore the default. On a real multi-node
    cluster hash shuffle avoids the global sort barrier and the
    aggregator pool spreads across nodes; it stays selectable via
    FDBL_SHUFFLE=hash (aggregators ~ 1 per 8 CPUs)."""
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctxs = [DataContext.get_current()]
    if dataset is not None and dataset.context not in ctxs:
        ctxs.append(dataset.context)
    prev = [(c.shuffle_strategy, c.max_hash_shuffle_aggregators) for c in ctxs]
    use_hash = os.environ.get("FDBL_SHUFFLE", "sort") == "hash" and (
        num_partitions is None or num_partitions >= 32
    )
    cpus = int(ray.cluster_resources().get("CPU", 8))
    for c in ctxs:
        if use_hash:
            c.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
            c.max_hash_shuffle_aggregators = max(
                2, min(num_partitions or 64, cpus // 8)
            )
        else:
            c.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    try:
        yield
    finally:
        for c, (s, a) in zip(ctxs, prev):
            c.shuffle_strategy = s
            c.max_hash_shuffle_aggregators = a


def default_fields(text_col: str = "text", analyzer: str = "lucene") -> dict[str, dict]:
    return {"text": {"column": text_col, "analyzer": analyzer}}


def _write_docstore(index_dir: str, store_ds) -> None:
    """Stored-fields sink (S16): doc_id-keyed parquet, written to a temp
    dir and atomically renamed (idempotent under retries)."""
    import shutil

    final = os.path.join(index_dir, "docstore")
    if os.path.isdir(final):
        return
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    store_ds.write_parquet(tmp)
    try:
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)


def hydrate(index_dir: str, doc_ids, columns: list[str] | None = None):
    """Stored-field lookup for a (small) top-k id list (J3): broadcast
    the id set into a parquet predicate — row groups that can't contain
    the ids are pruned via min/max stats."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    store = os.path.join(index_dir, "docstore")
    if not os.path.isdir(store):
        raise FileNotFoundError(
            f"no docstore at {store}: build with docstore_cols=..."
        )
    ids = sorted(int(d) for d in doc_ids)
    dataset = pads.dataset(store, format="parquet")
    table = dataset.to_table(
        columns=columns, filter=pc.field("doc_id").isin(ids)
    )
    return table.sort_by("doc_id")


def build_index(
    source,
    index_dir: str,
    *,
    fields: dict[str, dict] | None = None,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    batch_size: int = 2048,
    block_size: int = BLOCK_SIZE,
    head_terms: frozenset[str] | None = None,
    salt_chunk: int = 1 << 16,
    auto_salt_ratio: float = 0.25,
    tokenize_concurrency=None,
    tokenize_num_cpus: float | None = None,
    read_rows_per_task: int | None = None,
    exchange: str = "spill",
    preprocess=None,
    read_columns: list[str] | None = None,
    resume: bool = True,
    signature: str | None = None,
    docstore_cols: list[str] | None = None,
    doc_base: int = 0,
    publish: bool = True,
    codec: str = "varint-block",
    term_vectors: bool = False,
    wire: str = "raw",
    extra_meta: dict | None = None,
) -> Manifest:
    """Build an index from parquet paths or a Dataset that already has
    ``id_col``. Returns the published manifest.

    ``docstore_cols``: stored fields (SURVEY S16) — written as a
    doc_id-keyed parquet doc store under ``{index_dir}/docstore`` for
    query-time hydration (J3). Leave None when the input parquet itself
    can serve as the doc store (deterministic ids make doc_id -> (file,
    row) a pure function — the zero-copy choice at 100 TB).
    """
    from fdblucene_ray.codec.registry import get_codec

    get_codec(codec)  # validate the name up front (U3 codec SPI)
    fields = fields or default_fields()
    for fname, cfg in fields.items():
        get_analyzer(cfg["analyzer"]) if cfg["analyzer"] != "keyword" else None
        if "\x00" in fname or "\x1f" in fname:
            raise ValueError(f"field name {fname!r} contains a reserved byte")

    # resolve every cluster-derived plan parameter BEFORE computing the
    # resume signature: lineage records are namespaced by the signature,
    # and a signature embedding `null` while the actual partition count
    # varies with cluster size would let a resumed build mix segments
    # encoded under different hash%P layouts (silent term loss/dup)
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(4, 2 * cpus)

    if isinstance(source, (str, list, tuple)):
        # ``read_columns`` widens the pruned read when a ``preprocess``
        # stage derives the field columns from source columns (e.g. the
        # flagship's html -> text extraction needs html read even though
        # the indexed field is text)
        cols = read_columns or sorted({cfg["column"] for cfg in fields.values()})
        sig = signature or corpus_signature(
            source, json.dumps([sorted(fields.items()), num_partitions, block_size], default=str)
        )
        ds = read_corpus_with_doc_ids(
            source, columns=cols, base=doc_base,
            rows_per_task=read_rows_per_task,
        )
        store_ds = (
            read_corpus_with_doc_ids(source, columns=docstore_cols, base=doc_base)
            if docstore_cols
            else None
        )
    else:
        ds = source
        sig = signature or f"ds{int(time.time())}"
        store_ds = source.select_columns([id_col] + docstore_cols) if docstore_cols else None

    # whole-job checkpoint: same signature already committed -> no-op
    if resume and os.path.exists(os.path.join(index_dir, "manifest.json")):
        prev = load_manifest(index_dir)
        if prev.extra.get("signature") == sig:
            return prev

    # the spill route only applies to path sources (it reads fragments
    # itself); a Dataset source always goes through the Dataset path
    use_spill = exchange == "spill" and isinstance(source, (str, list, tuple))
    if tokenize_concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        if use_spill:
            # spill tokenizers read their own input and every encode
            # task runs after they are killed, so 1 actor per CPU is
            # safe (no upstream task can starve) and keeps tokenizer
            # density CONSTANT across cluster sizes — the property the
            # N->4N scaling bar depends on
            tokenize_concurrency = cpus
        else:
            # Dataset path: leave ~1/3 of the node for read tasks,
            # shuffle aggregators and encode tasks; a pool reserving
            # every CPU serializes the pipeline
            tokenize_concurrency = (max(1, cpus // 4), max(2, (cpus * 2) // 3))

    tokenizer_kwargs = dict(
        fields=fields,
        num_partitions=num_partitions,
        id_col=id_col,
        head_terms=head_terms,
        salt_chunk=salt_chunk,
        auto_salt_ratio=auto_salt_ratio,
        wire=wire,
    )
    if use_spill:
        # direct spill exchange (index/exchange.py): tokenizer actors
        # write per-partition IPC spill files, P independent encode
        # tasks consume them — replaces the Dataset sort shuffle whose
        # ~constant coordination latency capped N->4N scaling (see the
        # module docstring for measurements); identical segments by
        # construction (same TokenizeToPostings / EncodeGroup objects)
        from fdblucene_ray.index.exchange import run_spill_exchange

        n_tok = (
            tokenize_concurrency[1]
            if isinstance(tokenize_concurrency, tuple)
            else tokenize_concurrency
        )
        records = run_spill_exchange(
            source,
            index_dir=index_dir,
            signature=sig,
            columns=cols,
            tokenizer_kwargs=tokenizer_kwargs,
            doc_base=doc_base,
            num_tokenizers=max(1, int(n_tok)),
            batch_size=batch_size,
            block_size=block_size,
            resume=resume,
            codec=codec,
            wire=wire,
            preprocess=preprocess,
        )
    else:
        if preprocess is not None:
            ds = ds.map_batches(
                preprocess, batch_format="pyarrow", batch_size=batch_size
            )
        postings = ds.map_batches(
            TokenizeToPostings,
            fn_constructor_kwargs=tokenizer_kwargs,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=tokenize_concurrency,
            zero_copy_batch=True,
            # fractional reservation lets tokenizer density (actors per
            # cluster CPU) stay CONSTANT across cluster sizes while
            # leaving scheduler headroom for read/shuffle/encode tasks
            **({"num_cpus": tokenize_num_cpus} if tokenize_num_cpus else {}),
        )
        with _shuffle_strategy(num_partitions, dataset=postings):
            lineage_ds = postings.groupby(
                "part", num_partitions=num_partitions
            ).map_groups(
                EncodeGroup(index_dir, sig, block_size, resume, codec=codec, wire=wire),
                batch_format="pyarrow",
            )
            records = lineage_ds.take_all()

    if store_ds is not None:
        _write_docstore(index_dir, store_ds)

    if term_vectors:
        # offsets/payload sidecar (DATA.md:54 analog): term vectors for
        # the first analyzed field, doc_id-keyed for hit-time pruning
        from fdblucene_ray.index.termvectors import build_term_vectors

        for fname, cfg in fields.items():
            if cfg["analyzer"] != "keyword":
                build_term_vectors(
                    source if isinstance(source, (str, list, tuple)) else ds,
                    os.path.join(index_dir, "termvectors"),
                    analyzer=cfg["analyzer"],
                    text_col=cfg["column"],
                    doc_base=doc_base,
                )
                break

    segs = sorted(
        (SegmentMeta.from_json(json.loads(r["segment_meta"])) for r in records),
        key=lambda m: m.name,
    )
    version = 0
    if os.path.exists(os.path.join(index_dir, "manifest.json")):
        version = load_manifest(index_dir).version + 1
    manifest = Manifest(
        analyzers={f: cfg["analyzer"] for f, cfg in fields.items()},
        block_size=block_size,
        segments=segs,
        version=version,
        codec=codec,
        extra={
            "signature": sig,
            "num_partitions": num_partitions,
            "positions_fields": sorted(
                f for f, cfg in fields.items() if cfg.get("positions")
            ),
            "built_at_unix": int(time.time()),
            **(extra_meta or {}),
        },
    )
    if publish:
        publish_manifest(index_dir, manifest)
    return manifest


def build_sharded(
    shards: list[list[str] | str],
    index_dir: str,
    *,
    fields: dict[str, dict] | None = None,
    num_partitions_per_shard: int | None = None,
    resume: bool = True,
    concurrent_shards: int = 1,
    **kw,
) -> Manifest:
    """Input-shard-level checkpointed build: each shard (a group of
    input files) becomes an independent sub-build with globally-offset
    doc ids; a completed shard leaves a done-record and is SKIPPED
    entirely on re-run — its input is never re-read. One manifest is
    published atomically at the end (the near-real-time refresh analog
    of SURVEY.md §2.9: new input files => one more shard => new
    manifest version).

    ``concurrent_shards > 1`` runs that many shard pipelines from
    driver threads at once (each Ray Dataset executes independently
    and they share the cluster): one shard's all-to-all exchange
    barrier overlaps another shard's tokenize/encode compute, which is
    exactly how a multi-driver cluster would pipeline 100-TB ingest.
    Shards are fully independent (distinct lineage dirs, signatures,
    doc-id bases, segment names), so this is safe with resume."""
    from fdblucene_ray.sources.corpus import plan_fragments

    fields = fields or default_fields()
    # resolve the cluster-derived partition count up front so it can be
    # baked into each shard signature (same lineage-mixing hazard as
    # build_index: a resume on a different-size cluster must not reuse
    # lineage written under a different hash%P layout)
    if num_partitions_per_shard is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions_per_shard = max(4, 2 * cpus)
    # global doc-id bases per shard from footer metadata only
    bases = []
    base = 0
    for shard in shards:
        bases.append(base)
        frags = plan_fragments(shard, base)
        base = frags[-1]["base"] + frags[-1]["num_rows"] if frags else base

    sig_parts = []
    pending: list[tuple[int, list | str, int, str, str]] = []
    shard_segs: dict[int, list[SegmentMeta]] = {}
    for i, (shard, sbase) in enumerate(zip(shards, bases)):
        ssig = corpus_signature(
            shard,
            json.dumps(
                [sorted(fields.items()), sbase, num_partitions_per_shard],
                default=str,
            ),
        ) + f"-s{i:04d}"
        sig_parts.append(ssig)
        done_path = os.path.join(index_dir, "lineage", ssig, "_shard_done.json")
        if resume and os.path.exists(done_path):
            with open(done_path) as f:
                metas = json.load(f)["segments"]
            shard_segs[i] = [SegmentMeta.from_json(m) for m in metas]
            continue
        pending.append((i, shard, sbase, ssig, done_path))

    # concurrent shards must SPLIT the node's actor budget: build_index's
    # default tokenize pool reserves ~cpus/4 actors PER dataset, and N
    # concurrent pools each insisting on that minimum deadlock the
    # cluster (observed: 4 concurrent shards x 8 min actors = all 32
    # CPUs parked in tokenizers, zero left for read/encode). The same
    # reservation math also caps how many pipelines can run at once:
    # each pool pins >= 1 actor, so more than cpus/2 concurrent shards
    # parks every CPU in tokenizers and livelocks the reads (observed
    # at 4 shards on 4 CPUs) — clamp, don't trust the caller
    cpus = int(ray.cluster_resources().get("CPU", 8))
    concurrent_shards = min(concurrent_shards, max(1, cpus // 2))
    shard_kw = dict(kw)
    if concurrent_shards > 1 and "tokenize_concurrency" not in shard_kw:
        share = max(1, cpus // concurrent_shards)
        if shard_kw.get("exchange", "spill") == "spill":
            # constant 1-actor-per-CPU density at every cluster size
            # (see build_index) — the shares of concurrent shards sum
            # to the cluster exactly
            shard_kw["tokenize_concurrency"] = share
        else:
            shard_kw["tokenize_concurrency"] = (
                max(1, share // 4), max(2, (share * 2) // 3)
            )

    def _run_shard(job) -> tuple[int, list[SegmentMeta]]:
        i, shard, sbase, ssig, done_path = job
        sub = build_index(
            shard,
            index_dir,
            fields=fields,
            num_partitions=num_partitions_per_shard,
            doc_base=sbase,
            signature=ssig,
            resume=resume,
            publish=False,
            **shard_kw,
        )
        os.makedirs(os.path.dirname(done_path), exist_ok=True)
        tmp = done_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"segments": [m.to_json() for m in sub.segments]}, f)
        os.replace(tmp, done_path)
        return i, list(sub.segments)

    if concurrent_shards > 1 and len(pending) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=concurrent_shards) as ex:
            for i, segs in ex.map(_run_shard, pending):
                shard_segs[i] = segs
    else:
        for job in pending:
            i, segs = _run_shard(job)
            shard_segs[i] = segs

    all_segs: list[SegmentMeta] = []
    for i in sorted(shard_segs):
        all_segs.extend(shard_segs[i])

    version = 0
    prev_extra: dict = {}
    if os.path.exists(os.path.join(index_dir, "manifest.json")):
        prev = load_manifest(index_dir)
        version = prev.version + 1
        prev_extra = prev.extra or {}
    extra = {
        "signature": "+".join(sig_parts),
        "sharded": True,
        "built_at_unix": int(time.time()),
        "positions_fields": sorted(
            f for f, cfg in fields.items() if cfg.get("positions")
        ),
    }
    # a shard APPEND keeps the existing docs (and their ids): the prior
    # tombstone set, pending doc-values generations and merge-carried
    # base stats must ride into the new manifest or deletes resurrect
    # and updates vanish on refresh. Append is detected by signature
    # prefix (the old shard list re-passed plus new shards); a rebuild
    # over a DIFFERENT corpus reassigns ids, so sidecars must NOT carry.
    prev_sig = prev_extra.get("signature")
    is_append = bool(prev_sig) and (
        extra["signature"] == prev_sig
        or extra["signature"].startswith(prev_sig + "+")
    )
    if is_append:
        for k in ("tombstone_file", "dv_files", "base_field_stats"):
            if k in prev_extra:
                extra[k] = prev_extra[k]
    manifest = Manifest(
        analyzers={f: cfg["analyzer"] for f, cfg in fields.items()},
        block_size=kw.get("block_size", BLOCK_SIZE),
        segments=sorted(all_segs, key=lambda m: m.name),
        version=version,
        codec=kw.get("codec", "varint-block"),
        extra=extra,
    )
    publish_manifest(index_dir, manifest)
    return manifest

def append_shards(
    index_dir: str,
    shards: list[list[str] | str],
    *,
    fields: dict[str, dict] | None = None,
    num_partitions_per_shard: int | None = None,
    resume: bool = True,
    concurrent_shards: int = 1,
    max_publish_retries: int = 16,
    idempotency_token: str | None = None,
    **kw,
) -> Manifest:
    """MULTI-WRITER-safe shard append: independent driver PROCESSES may
    call this concurrently against one index_dir and every append lands
    (the reference's concurrent Writer ingest, README.md:34-38 — FDB
    transactions + sparse insert-if-absent doc ids; here manifest CAS +
    reserved id ranges).

    Protocol (all contention is on tiny manifest publishes, never on
    build work):

    1. RESERVE: CAS-publish a manifest whose
       ``extra["id_reservations"][token] = [base, end)`` claims this
       append's doc-id range, where ``base`` = max(segment doc_id_max+1,
       every live reservation end). A CAS loser just reloads and
       re-reserves above the winner — no build work exists yet to lose.
    2. BUILD: each shard builds exactly as ``build_sharded`` does
       (lineage-checkpointed, publish=False) with globally-offset doc
       ids starting at the reserved base. Ranges are disjoint BY
       RESERVATION, so no rebase/rebuild is ever needed on conflict.
    3. PUBLISH: CAS-append this append's segments to the CURRENT live
       manifest (re-read on every retry so other writers' segments,
       tombstones and dv generations are preserved), dropping the
       reservation token. Retries are metadata-only.

    A writer that crashes after step 1 leaves a dangling reservation:
    later appends simply start above it (sparse doc ids — harmless,
    exactly the reference's sparse-id posture). ``gc_reservations``
    clears tokens older than a cutoff if id compaction matters.

    Creation race: if ``index_dir`` has no manifest yet, the reserve
    step CAS-creates version 0 (expected_version=-1) — two concurrent
    creators serialize on it.

    ``idempotency_token``: a caller-chosen batch id recorded in
    ``extra["append_tokens"]`` at publish. Re-calling with a token the
    live manifest already carries is a NO-OP (returns the live
    manifest) — the crash-replay contract a retrying ingest loop
    (``index/sync.py``) needs. The token list keeps the most recent
    256 entries; a replay arrives promptly after a crash, never 256
    appends later.
    """
    import uuid as _uuid

    from fdblucene_ray.index.manifest import (
        ManifestConflictError,
        publish_manifest,
    )
    from fdblucene_ray.sources.corpus import plan_fragments

    fields = fields or default_fields()
    if idempotency_token is not None:
        try:
            live = load_manifest(index_dir)
        except FileNotFoundError:
            live = None
        if live is not None and idempotency_token in live.extra.get(
            "append_tokens", []
        ):
            return live  # batch already committed: replay is a no-op
    if num_partitions_per_shard is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions_per_shard = max(4, 2 * cpus)

    # per-shard row counts (footer metadata only) relative to base 0
    rel_bases: list[int] = []
    rel = 0
    for shard in shards:
        rel_bases.append(rel)
        frags = plan_fragments(shard, rel)
        rel = frags[-1]["base"] + frags[-1]["num_rows"] if frags else rel
    total_rows = rel

    def _load_or_none():
        try:
            return load_manifest(index_dir)
        except FileNotFoundError:
            return None

    # ---- step 1: reserve the id range (CAS loop, cheap) ----
    token = _uuid.uuid4().hex
    for _ in range(max_publish_retries):
        m = _load_or_none()
        if m is None:
            hwm = 0
            res: dict = {}
            expected = -1
            prev_segments: list[SegmentMeta] = []
            prev_extra: dict = {}
            version = 0
        else:
            _check_config_matches(m, fields, kw)
            res = dict(m.extra.get("id_reservations", {}))
            hwm = max(
                [s.doc_id_max + 1 for s in m.segments]
                + [int(e) for _, e in res.values()]
                + [0]
            )
            expected = m.version
            prev_segments = list(m.segments)
            prev_extra = dict(m.extra)
            version = m.version + 1
        base = hwm
        res[token] = [base, base + total_rows]
        reserve = Manifest(
            analyzers={f: cfg["analyzer"] for f, cfg in fields.items()}
            if m is None
            else m.analyzers,
            block_size=kw.get("block_size", BLOCK_SIZE)
            if m is None
            else m.block_size,
            segments=prev_segments,
            version=version,
            codec=kw.get("codec", "varint-block") if m is None else m.codec,
            extra={**prev_extra, "id_reservations": res},
        )
        try:
            publish_manifest(index_dir, reserve, expected_version=expected)
            break
        except ManifestConflictError:
            continue
    else:
        raise ManifestConflictError(
            f"could not reserve id range after {max_publish_retries} tries"
        )

    # ---- step 2: build the shards (identical to build_sharded) ----
    prev_sig = prev_extra.get("signature", "")
    shard_index0 = prev_sig.count("+") + 1 if prev_sig else 0
    sig_parts: list[str] = []
    jobs = []
    shard_segs: dict[int, list[SegmentMeta]] = {}
    for j, shard in enumerate(shards):
        sbase = base + rel_bases[j]
        i = shard_index0 + j
        ssig = corpus_signature(
            shard,
            json.dumps(
                [sorted(fields.items()), sbase, num_partitions_per_shard],
                default=str,
            ),
        ) + f"-s{i:04d}"
        sig_parts.append(ssig)
        done_path = os.path.join(
            index_dir, "lineage", ssig, "_shard_done.json"
        )
        if resume and os.path.exists(done_path):
            with open(done_path) as f:
                metas = json.load(f)["segments"]
            shard_segs[j] = [SegmentMeta.from_json(m) for m in metas]
            continue
        jobs.append((j, shard, sbase, ssig, done_path))

    cpus = int(ray.cluster_resources().get("CPU", 8))
    concurrent_shards = min(concurrent_shards, max(1, cpus // 2))
    shard_kw = dict(kw)
    if concurrent_shards > 1 and "tokenize_concurrency" not in shard_kw:
        share = max(1, cpus // concurrent_shards)
        if shard_kw.get("exchange", "spill") == "spill":
            shard_kw["tokenize_concurrency"] = share
        else:
            shard_kw["tokenize_concurrency"] = (
                max(1, share // 4), max(2, (share * 2) // 3)
            )

    def _run_shard(job):
        j, shard, sbase, ssig, done_path = job
        sub = build_index(
            shard,
            index_dir,
            fields=fields,
            num_partitions=num_partitions_per_shard,
            doc_base=sbase,
            signature=ssig,
            resume=resume,
            publish=False,
            **shard_kw,
        )
        os.makedirs(os.path.dirname(done_path), exist_ok=True)
        tmp = done_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"segments": [s.to_json() for s in sub.segments]}, f
            )
        os.replace(tmp, done_path)
        return j, list(sub.segments)

    if concurrent_shards > 1 and len(jobs) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=concurrent_shards) as ex:
            for j, segs in ex.map(_run_shard, jobs):
                shard_segs[j] = segs
    else:
        for job in jobs:
            j, segs = _run_shard(job)
            shard_segs[j] = segs

    new_segs: list[SegmentMeta] = []
    for j in sorted(shard_segs):
        new_segs.extend(shard_segs[j])

    # ---- step 3: CAS-append to the live manifest ----
    for _ in range(max_publish_retries):
        live = load_manifest(index_dir)
        extra = dict(live.extra)
        res = dict(extra.get("id_reservations", {}))
        res.pop(token, None)
        if res:
            extra["id_reservations"] = res
        else:
            extra.pop("id_reservations", None)
        sig = extra.get("signature", "")
        extra["signature"] = (
            sig + "+" + "+".join(sig_parts) if sig else "+".join(sig_parts)
        )
        extra["sharded"] = True
        extra["built_at_unix"] = int(time.time())
        if idempotency_token is not None:
            toks = list(extra.get("append_tokens", []))
            toks.append(idempotency_token)
            extra["append_tokens"] = toks[-256:]
        pf = set(extra.get("positions_fields", []))
        pf |= {f for f, cfg in fields.items() if cfg.get("positions")}
        extra["positions_fields"] = sorted(pf)
        manifest = Manifest(
            analyzers=live.analyzers,
            block_size=live.block_size,
            segments=sorted(
                list(live.segments) + new_segs, key=lambda s: s.name
            ),
            version=live.version + 1,
            codec=live.codec,
            extra=extra,
        )
        try:
            publish_manifest(
                index_dir, manifest, expected_version=live.version
            )
            return manifest
        except ManifestConflictError:
            continue
    raise ManifestConflictError(
        f"could not publish append after {max_publish_retries} tries"
    )


def _check_config_matches(
    m: Manifest, fields: dict[str, dict], kw: dict
) -> None:
    """An append must agree with the live index's analyzers /
    block_size / codec — mismatches fail loudly before any build."""
    want_az = {f: cfg["analyzer"] for f, cfg in fields.items()}
    for f, az in want_az.items():
        if f in m.analyzers and m.analyzers[f] != az:
            raise ValueError(
                f"analyzer mismatch for field {f!r}: index has "
                f"{m.analyzers[f]!r}, append wants {az!r}"
            )
    bs = kw.get("block_size", BLOCK_SIZE)
    if bs != m.block_size:
        raise ValueError(
            f"block_size mismatch: index {m.block_size}, append {bs}"
        )
    codec = kw.get("codec", "varint-block")
    if codec != m.codec:
        raise ValueError(
            f"codec mismatch: index {m.codec!r}, append {codec!r}"
        )


def gc_reservations(index_dir: str) -> list[str]:
    """Drop ALL doc-id reservations from the live manifest (operator
    tool for cleaning up after crashed appenders; safe because a live
    appender that loses its reservation token still publishes its
    already-built disjoint ids — only FUTURE reservations could then
    collide, so run this only when no append is in flight)."""
    from fdblucene_ray.index.manifest import (
        ManifestConflictError,
        publish_manifest,
    )

    for _ in range(8):
        m = load_manifest(index_dir)
        res = m.extra.get("id_reservations", {})
        if not res:
            return []
        extra = {k: v for k, v in m.extra.items() if k != "id_reservations"}
        m2 = Manifest(
            analyzers=m.analyzers,
            block_size=m.block_size,
            segments=m.segments,
            version=m.version + 1,
            codec=m.codec,
            extra=extra,
        )
        try:
            publish_manifest(index_dir, m2, expected_version=m.version)
            return sorted(res)
        except ManifestConflictError:
            continue
    raise ManifestConflictError("gc_reservations kept losing the CAS")
