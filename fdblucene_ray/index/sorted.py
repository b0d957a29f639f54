"""Index-time sort (Lucene ``IndexWriterConfig.setIndexSort`` analog).

Doc ids are assigned in sort-key order: the corpus is globally sorted
ONCE at build time (``ds.sort`` — the distributed wide step), written
as an ORDERED parquet layout, and indexed with sequential ids by the
normal build. Postings are doc-id ascending by codec invariant, so
"top-k by the index sort key" == "first k matching doc ids": the
searcher early-terminates after k matches without decoding the
remaining posting blocks (``Searcher.search_sorted_topk`` — Lucene's
TopFieldCollector early termination on a sorted index).

Reference tie-in: the Writer/Reader approach stores numeric doc values
for sorting (/root/reference/README.md:53-57, DATA.md:36); Lucene 8's
index-time sort is the optimized form of that capability, and this
module is its Ray-Data restatement — the sort is one ``ds.sort``,
everything downstream is the unchanged build pipeline.

Scale notes: the sort is the ONE all-to-all exchange and it replaces
(not adds to) a query-time global sort; the ordered write streams
(no driver materialization); file-order correctness is verified from
parquet footer min/max stats (no data re-read); the sorted copy IS the
doc store (no second copy of the text).
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow.parquet as pq
import ray.data
from ray.data.datasource import FilenameProvider

from fdblucene_ray.index.build import build_index
from fdblucene_ray.index.manifest import Manifest, load_manifest
from fdblucene_ray.sources.corpus import corpus_signature

_SORT_MARKER = "_SORTED.json"


class _OrderedFilenames(FilenameProvider):
    """Zero-padded (task, block) filenames: Ray Data's write preserves
    block order after a sort, so lexicographic file order == global
    sort order (the constant write_uuid prefix keeps it collision-safe
    without disturbing the ordering)."""

    def get_filename_for_block(self, block, write_uuid, task_index, block_index):
        return f"{write_uuid}-{task_index:06d}-{block_index:06d}.parquet"


def _verify_file_order(files: list[str], sort_col: str, descending: bool) -> None:
    """Guard the filename-order assumption from parquet FOOTER stats
    (no data read): consecutive files' [min,max] ranges of the sort
    column must be monotone. Ties may straddle a boundary, so the
    check allows equality."""
    prev_edge = None
    for f in files:
        md = pq.read_metadata(f)
        idx = md.schema.to_arrow_schema().get_field_index(sort_col)
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return  # stats unavailable -> cannot verify (rare)
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if prev_edge is not None:
            ok = (prev_edge >= hi) if descending else (prev_edge <= lo)
            if not ok:
                raise RuntimeError(
                    f"sorted layout violated at {f}: file range [{lo},{hi}] "
                    f"vs previous edge {prev_edge} (descending={descending})"
                )
        prev_edge = lo if descending else hi


def sorted_source_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "sorted_source")


def build_sorted_index(
    source,
    index_dir: str,
    *,
    sort_col: str,
    descending: bool = True,
    fields: dict[str, dict] | None = None,
    id_col: str = "doc_id",
    extra_store_cols: list[str] | None = None,
    resume: bool = True,
    **build_kwargs,
) -> Manifest:
    """Build an index whose doc-id order IS ``sort_col`` order.

    1. the input is globally sorted by ``(sort_col, id_col)`` —
       ``id_col`` tie-break makes the total order (and thus every
       assigned doc id) deterministic;
    2. the sorted stream is written to ``{index_dir}/sorted_source/``
       with order-preserving filenames (verified from footer stats);
    3. the normal ``build_index`` runs over the sorted layout — its
       sequential doc ids now follow sort order. The original id
       survives as the ``orig_doc_id`` stored field; the docstore also
       keeps ``sort_col`` for hydration.

    The sorted copy is resumable: a matching ``_SORTED.json`` marker
    (input signature) skips the sort; the index build underneath has
    its own whole-job/lineage checkpoints.
    """
    fields = fields or {"text": {"column": "text", "analyzer": "lucene"}}
    text_cols = sorted({cfg["column"] for cfg in fields.values()})
    store_cols = sorted(
        set([f"orig_{id_col}", sort_col] + (extra_store_cols or []))
    )
    read_cols = sorted(
        {id_col, sort_col, *text_cols}
        | {c[len("orig_"):] if c.startswith("orig_") else c for c in store_cols}
    )
    params = json.dumps(
        [sort_col, descending, sorted(fields.items()), read_cols], default=str
    )
    sig = "sorted:" + corpus_signature(source, params)

    if resume and os.path.exists(os.path.join(index_dir, "manifest.json")):
        prev = load_manifest(index_dir)
        if prev.extra.get("signature") == sig and prev.extra.get("index_sort"):
            return prev

    src_dir = sorted_source_dir(index_dir)
    marker = os.path.join(src_dir, _SORT_MARKER)
    have_sorted = False
    if resume and os.path.exists(marker):
        with open(marker) as fh:
            have_sorted = json.load(fh).get("signature") == sig
    if not have_sorted:
        tmp = src_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(src_dir, ignore_errors=True)
        ds = ray.data.read_parquet(source, columns=read_cols)
        if id_col in read_cols:
            ds = ds.rename_columns({id_col: f"orig_{id_col}"})
        ds = ds.sort(
            [sort_col, f"orig_{id_col}"], descending=[descending, False]
        )
        ds.write_parquet(tmp, filename_provider=_OrderedFilenames())
        with open(os.path.join(tmp, _SORT_MARKER + ".tmp"), "w") as fh:
            json.dump({"signature": sig, "sort_col": sort_col,
                       "descending": descending}, fh)
        os.replace(os.path.join(tmp, _SORT_MARKER + ".tmp"),
                   os.path.join(tmp, _SORT_MARKER))
        os.replace(tmp, src_dir)

    files = sorted(
        os.path.join(src_dir, f)
        for f in os.listdir(src_dir)
        if f.endswith(".parquet")
    )
    _verify_file_order(files, sort_col, descending)

    return build_index(
        files,
        index_dir,
        fields=fields,
        docstore_cols=store_cols,
        signature=sig,
        resume=resume,
        extra_meta={
            "index_sort": {"col": sort_col, "descending": descending}
        },
        **build_kwargs,
    )
