"""Command-line entry points — the ``ray job submit`` surface.

On a real cluster (north_rule: fixed-size multi-node, two cluster
sizes):

    ray job submit --working-dir . -- \\
        python -m fdblucene_ray.cli build \\
        --input /data/webpages --out /shared/index \\
        --field text:text:lucene --field url:url:keyword \\
        --num-partitions 512

In this sandbox Ray runs local-only; the CLI initialises its own Ray
session iff none exists (the driver/test harness owns the session
otherwise).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    from fdblucene_ray.ops.raylog import install_empty_schema_filter

    install_empty_schema_filter()
    DataContext.get_current().enable_progress_bars = False


def _parse_fields(specs: list[str]) -> dict:
    """field specs: NAME:COLUMN:ANALYZER[:positions]"""
    out = {}
    for spec in specs or ["text:text:lucene"]:
        parts = spec.split(":")
        name, column, analyzer = parts[0], parts[1], parts[2]
        out[name] = {"column": column, "analyzer": analyzer,
                     "positions": len(parts) > 3 and parts[3] == "positions"}
    return out


def cmd_build(args) -> int:
    _ensure_ray()
    from fdblucene_ray.index.build import build_index

    t0 = time.perf_counter()
    manifest = build_index(
        args.input,
        args.out,
        fields=_parse_fields(args.field),
        num_partitions=args.num_partitions,
        batch_size=args.batch_size,
        head_terms=frozenset(args.head_term) if args.head_term else None,
        resume=not args.no_resume,
        docstore_cols=args.store.split(",") if args.store else None,
    )
    totals = manifest.field_totals()
    print(json.dumps({
        "index": args.out,
        "version": manifest.version,
        "segments": len(manifest.segments),
        "field_totals": totals,
        "wall_s": round(time.perf_counter() - t0, 2),
    }))
    return 0


def cmd_search(args) -> int:
    _ensure_ray()
    from fdblucene_ray.index.search import Searcher

    s = Searcher(args.index)
    if args.phrase:
        hits = s.search_phrase(args.query, args.k, field=args.field)
    else:
        hits = s.search(
            args.query, args.k, field=args.field, operator=args.operator,
            mode=args.mode,
        )
    for rank, (doc, score) in enumerate(hits, 1):
        print(json.dumps({"rank": rank, "doc_id": doc, "score": round(score, 6)}))
    return 0


def cmd_msearch(args) -> int:
    """Scatter-gather search over a fleet of doc-sharded indexes (one
    searcher actor per shard, DFS global stats) — the multi-node query
    path: `ray job submit -- python -m fdblucene_ray.cli msearch
    --index /shared/ix0 --index /shared/ix1 ... --query "..."`."""
    _ensure_ray()
    from fdblucene_ray.index.distributed import DistributedSearcher

    fleet = DistributedSearcher(args.index, num_cpus_per_shard=args.cpus)
    try:
        if args.phrase:
            hits = fleet.search_phrase(args.query, args.k, field=args.field)
        else:
            hits = fleet.search(
                args.query, args.k, field=args.field, operator=args.operator,
            )
        for rank, (doc, score) in enumerate(hits, 1):
            print(json.dumps(
                {"rank": rank, "doc_id": doc, "score": round(score, 6)}
            ))
    finally:
        fleet.shutdown()
    return 0


def cmd_query(args) -> int:
    """Parsed-query surface (QueryParser analog incl. boosts,
    phrases, multi-term and field: overrides)."""
    _ensure_ray()
    from fdblucene_ray.index.search import Searcher

    s = Searcher(args.index)
    hits = s.query(args.query, args.k, default_field=args.field)
    for rank, (doc, score) in enumerate(hits, 1):
        print(json.dumps({"rank": rank, "doc_id": doc, "score": round(score, 6)}))
    return 0


def cmd_expr(args) -> int:
    """Nested boolean expression: (a OR b) AND NOT c."""
    _ensure_ray()
    from fdblucene_ray.index.search import Searcher

    s = Searcher(args.index)
    hits = s.search_expr(args.query, args.k, default_field=args.field)
    for rank, (doc, score) in enumerate(hits, 1):
        print(json.dumps({"rank": rank, "doc_id": doc, "score": round(score, 6)}))
    return 0


def cmd_parse(args) -> int:
    """ONE unified grammar: +/-, field:, "phrase"~slop, ^boost,
    wildcards/fuzzy/regexp AND explicit AND/OR/NOT with parentheses."""
    _ensure_ray()
    from fdblucene_ray.index.search import Searcher

    s = Searcher(args.index)
    hits = s.search_query(args.query, args.k, default_field=args.field)
    for rank, (doc, score) in enumerate(hits, 1):
        print(json.dumps({"rank": rank, "doc_id": doc, "score": round(score, 6)}))
    return 0


def cmd_percolate(args) -> int:
    """Reverse search: match registered queries (JSON list of clause
    dicts) against a parquet document stream."""
    _ensure_ray()
    import ray.data

    from fdblucene_ray.ops.percolate import (
        compile_queries,
        load_queries,
        percolate,
        save_queries,
    )

    if not args.queries and not args.monitor:
        raise SystemExit("percolate: need --queries and/or --monitor")
    if args.monitor and not args.queries:
        # reload a persisted (compiled) monitor set
        compiled = load_queries(args.monitor)
        queries = None
    else:
        with open(args.queries) as fh:
            queries = json.load(fh)
        compiled = compile_queries(queries, args.analyzer)
        if args.monitor:
            n = save_queries(args.monitor, compiled)
            print(json.dumps({"monitor": args.monitor, "saved": n}))
    ds = ray.data.read_parquet(args.input, columns=[args.id_col, args.text_col])
    if queries is not None:
        out = percolate(ds, queries, analyzer=args.analyzer,
                        text_col=args.text_col, id_col=args.id_col)
    else:
        from fdblucene_ray.ops.percolate import Percolator

        out = ds.map_batches(
            Percolator(compiled, analyzer=args.analyzer,
                       text_col=args.text_col, id_col=args.id_col),
            batch_format="pyarrow", concurrency=2,
        )
    if args.out:
        out.write_parquet(args.out)
        print(json.dumps({"out": args.out}))
    else:
        for row in out.take_all():
            print(json.dumps({"query_id": int(row["query_id"]),
                              "doc_id": int(row["doc_id"])}))
    return 0


def cmd_suggest_phrase(args) -> int:
    _ensure_ray()
    from fdblucene_ray.index.search import Searcher

    s = Searcher(args.index)
    for sug, n, edits in s.suggest_phrase(
        args.phrase, args.k, field=args.field
    ):
        print(json.dumps({"suggestion": sug, "n_docs": n, "edits": edits}))
    return 0


def cmd_autocomplete(args) -> int:
    _ensure_ray()
    from fdblucene_ray.index.search import Searcher

    s = Searcher(args.index)
    terms = s.expand_prefix(args.field, args.prefix)
    for t, df in sorted(terms, key=lambda td: (-td[1], td[0]))[: args.k]:
        print(json.dumps({"term": t, "df": df}))
    return 0


def cmd_facets(args) -> int:
    _ensure_ray()
    from fdblucene_ray.index.search import Searcher

    s = Searcher(args.index)
    for value, count in s.facet_counts(
        args.query, args.facet_field, field=args.field, mode=args.mode,
        min_count=args.min_count,
    ):
        print(json.dumps({"value": value, "count": count}))
    return 0


def cmd_mlt(args) -> int:
    _ensure_ray()
    from fdblucene_ray.index.search import Searcher

    s = Searcher(args.index)
    hits = s.more_like_this(
        args.doc_id, args.k, field=args.field, source=args.source,
        max_query_terms=args.max_terms,
    )
    for rank, (doc, score) in enumerate(hits, 1):
        print(json.dumps({"rank": rank, "doc_id": doc, "score": round(score, 6)}))
    return 0


def cmd_rescore(args) -> int:
    _ensure_ray()
    from fdblucene_ray.index.search import Searcher

    s = Searcher(args.index)
    hits = s.rescore(
        args.query, args.phrase, args.k, window=args.window,
        field=args.field, query_weight=args.query_weight,
        rescore_weight=args.rescore_weight, slop=args.slop,
    )
    for rank, (doc, score) in enumerate(hits, 1):
        print(json.dumps({"rank": rank, "doc_id": doc, "score": round(score, 6)}))
    return 0


def cmd_stats(args) -> int:
    _ensure_ray()
    from fdblucene_ray.index.search import Searcher

    print(json.dumps(Searcher(args.index).index_stats(), indent=2))
    return 0


def cmd_catalog(args) -> int:
    _ensure_ray()
    from fdblucene_ray.index.catalog import Catalog

    cat = Catalog(args.root)
    if args.action == "list":
        for r in cat.list().to_pylist():
            print(f"{r['name']}  v{r['version']}  "
                  f"segments={r['n_segments']} docs={r['n_docs']}")
    elif args.action == "create":
        fields = {args.field: {"column": args.column or args.field,
                               "analyzer": args.analyzer}}
        cat.create(args.name, args.source, fields=fields,
                   num_partitions=args.partitions)
        print(f"created {args.name}")
    elif args.action == "drop":
        cat.drop(args.name)
        print(f"dropped {args.name}")
    elif args.action == "search":
        t = cat.search_each(args.name.split(","), args.query, k=args.k)
        for r in t.to_pylist():
            print(f"{r['name']}\t{r['doc_id']}\t{round(r['score'], 4)}")
    return 0


def cmd_check(args) -> int:
    _ensure_ray()
    from fdblucene_ray.index.check import check_index

    out = check_index(args.index, level=args.level)
    bad = 0
    for r in out.to_pylist():
        line = f"{r['segment']}: {r['status']}  terms={r['n_terms']} postings={r['n_postings']}"
        if r["issues"]:
            line += f"  [{r['issues']}]"
            bad += 1
        print(line)
    print(f"{out.num_rows} segments, {bad} corrupt")
    return 0 if bad == 0 else 1


def cmd_span(args) -> int:
    _ensure_ray()
    from fdblucene_ray.index.search import Searcher

    s = Searcher(args.index)
    if args.exclude is not None:
        rows = s.search_span_not(
            args.phrase, args.exclude, field=args.field,
            pre=args.pre, post=args.post,
        )
    else:
        rows = s.search_span_or(
            [args.phrase] + (args.or_phrase or []), field=args.field
        )
    for d, f in rows[: args.k]:
        print(f"{d}\t{f}")
    return 0


def cmd_intervals(args) -> int:
    _ensure_ray()
    from fdblucene_ray.index.search import Searcher

    s = Searcher(args.index)
    rows = s.search_intervals(
        args.terms, field=args.field, max_gaps=args.max_gaps,
        ordered=not args.unordered, not_containing=args.not_containing,
        containing=args.containing,
    )
    for d, n, st in rows[: args.k]:
        print(f"{d}\t{n}\t{st}")
    return 0


def cmd_pagerank(args) -> int:
    _ensure_ray()
    import ray.data

    from fdblucene_ray.ops.graph import pagerank_top

    ds = ray.data.read_parquet(args.input, columns=[args.id_col])
    t = pagerank_top(ds, top_n=args.k, n_iters=args.iters)
    for d, sc in zip(t["doc_id"].to_pylist(), t["score"].to_pylist()):
        print(f"{d}\t{sc}")
    return 0


def cmd_graph(args) -> int:
    _ensure_ray()
    import ray.data

    ds = ray.data.read_parquet(
        args.input,
        columns=[args.id_col] + ([args.host_col] if args.kind in
                                 ("trustrank", "hostrank") else []),
    )
    if args.kind == "trustrank":
        from fdblucene_ray.ops.graph import trustrank_top

        t = trustrank_top(ds, args.k, seed_col=args.host_col,
                          seed_val=args.seed_val, n_iters=args.iters)
        cols = ("doc_id", "score")
    elif args.kind == "hostrank":
        from fdblucene_ray.ops.graph import host_rank

        t = host_rank(ds, host_col=args.host_col, n_iters=args.iters)
        cols = ("host", "rank")
    elif args.kind == "hits":
        from fdblucene_ray.ops.graph import hits_top

        t = hits_top(ds, args.k, n_iters=args.iters)
        cols = ("kind", "doc_id", "score")
    else:
        from fdblucene_ray.ops.graph import degree_stats

        t = degree_stats(ds, args.k)
        cols = ("doc_id", "in_deg")
    for row in zip(*(t[c].to_pylist() for c in cols)):
        print("\t".join(str(v) for v in row))
    return 0


def cmd_dsir(args) -> int:
    _ensure_ray()
    import ray.data

    from fdblucene_ray.ops.dsir import dsir_select

    ds = ray.data.read_parquet(
        args.input, columns=[args.id_col, args.text_col, args.target_col]
    )
    t = dsir_select(
        ds, args.k, target_col=args.target_col, target_val=args.target_val,
        text_col=args.text_col, id_col=args.id_col, seed=args.seed,
    )
    for d, w in zip(t["doc_id"].to_pylist(), t["logw"].to_pylist()):
        print(f"{d}\t{w}")
    return 0


def cmd_classify(args) -> int:
    _ensure_ray()
    import ray.data

    from fdblucene_ray.ops.classifier import (
        score_quality,
        train_quality_classifier,
    )

    ds = ray.data.read_parquet(
        args.input, columns=[args.id_col, args.text_col, args.target_col]
    )
    w = train_quality_classifier(
        ds, target_col=args.target_col, target_val=args.target_val,
        text_col=args.text_col, n_iters=args.iters,
    )
    t = score_quality(ds, w, top_n=args.k, text_col=args.text_col,
                      id_col=args.id_col)
    for d, sc in zip(t["doc_id"].to_pylist(), t["score"].to_pylist()):
        print(f"{d}\t{sc}")
    return 0


def cmd_merge(args) -> int:
    _ensure_ray()
    from fdblucene_ray.index.merge import merge_indexes

    sources = []
    for spec in args.source:
        d, _, base = spec.partition("@")
        sources.append((d, int(base or 0)))
    manifest = merge_indexes(sources, args.out, num_partitions=args.num_partitions)
    print(json.dumps({"out": args.out, "segments": len(manifest.segments)}))
    return 0


def cmd_delete(args) -> int:
    _ensure_ray()
    from fdblucene_ray.index.delete import delete_by_term, delete_docs

    if args.term:
        field, _, term = args.term.partition(":")
        m = delete_by_term(args.index, field, term)
    else:
        m = delete_docs(args.index, [int(d) for d in args.doc_id])
    print(json.dumps({
        "index": args.index, "version": m.version,
        "tombstone_file": m.extra.get("tombstone_file"),
    }))
    return 0


def cmd_dv(args) -> int:
    """In-place numeric doc-values update / read-back (no reindex)."""
    _ensure_ray()
    from fdblucene_ray.index.docvalues import (
        load_dv_overlay,
        update_numeric_docvalues,
    )

    if args.set:
        updates = {}
        for kv in args.set:
            d, _, v = kv.partition("=")
            updates[int(d)] = float(v)
        m = update_numeric_docvalues(args.index, args.field, updates)
        print(json.dumps({
            "index": args.index, "field": args.field,
            "version": m.version, "n_updates": len(updates),
            "dv_file": m.extra.get("dv_files", {}).get(args.field),
        }))
    else:
        ids, vals = load_dv_overlay(args.index, args.field)
        print(json.dumps({
            "index": args.index, "field": args.field,
            "n_pending": int(len(ids)),
            "overlay": {int(d): float(v) for d, v in zip(ids[:20], vals[:20])},
        }))
    return 0


def cmd_rankeval(args) -> int:
    """trec_eval analog: per-query metrics of a run vs qrels parquet."""
    _ensure_ray()
    import ray.data

    from fdblucene_ray.ops.evalrank import rank_eval, rank_eval_mean

    run = ray.data.read_parquet(args.run)
    qrels = ray.data.read_parquet(args.qrels)
    per_q = rank_eval(run, qrels, k=args.k)
    if args.per_query:
        df = per_q.to_pandas().sort_values("qid")
        print(df.to_string(index=False))
    else:
        t = rank_eval_mean(per_q)
        print(json.dumps({c: t[c][0].as_py() for c in t.column_names}))
    return 0


def cmd_audio(args) -> int:
    """Decode WAV payloads from parquet and print DSP features."""
    _ensure_ray()
    import ray.data

    from fdblucene_ray.ops.audio import audio_features

    ds = ray.data.read_parquet(
        args.input, columns=[args.id_col, args.payload_col]
    )
    out = audio_features(
        ds, payload_col=args.payload_col, id_col=args.id_col
    )
    if args.out:
        out.write_parquet(args.out)
        print(json.dumps({"out": args.out}))
    else:
        for row in out.take_all()[: args.limit]:
            print(json.dumps({k: row[k] for k in row}))
    return 0


def cmd_substring(args) -> int:
    """Infix search over a trigram-signature index."""
    _ensure_ray()
    from fdblucene_ray.index.search import Searcher

    s = Searcher(args.index)
    ids = s.search_substring(
        args.needle, args.k, field=args.field, source=args.source,
        text_col=args.text_col,
    )
    print(json.dumps({"needle": args.needle, "doc_ids": ids}))
    return 0


def cmd_maintain(args) -> int:
    """Merge-policy maintenance: plan_tiered -> in-place merge -> gc."""
    _ensure_ray()
    from fdblucene_ray.index.manifest import load_manifest
    from fdblucene_ray.index.merge import maintain_index

    before = len(load_manifest(args.index).segments)
    m = maintain_index(
        args.index, tier_factor=args.tier_factor, min_merge=args.min_merge,
        out_partitions=args.out_partitions,
    )
    print(json.dumps({
        "index": args.index, "segments_before": before,
        "segments_after": len(m.segments), "version": m.version,
    }))
    return 0


def cmd_compact(args) -> int:
    """Full rewrite (purges tombstones exactly via doclens)."""
    _ensure_ray()
    from fdblucene_ray.index.merge import compact_index

    m = compact_index(args.index, args.out, num_partitions=args.num_partitions)
    print(json.dumps({"out": args.out, "segments": len(m.segments)}))
    return 0


def cmd_gc(args) -> int:
    _ensure_ray()
    from fdblucene_ray.index.delete import gc_tombstones
    from fdblucene_ray.index.manifest import gc_index

    removed = gc_index(args.index, dry_run=args.dry_run)
    tombs = gc_tombstones(args.index, dry_run=args.dry_run)
    print(json.dumps({"segments_removed": removed, "tombstones_removed": tombs,
                      "dry_run": args.dry_run}))
    return 0


def cmd_build_sorted(args) -> int:
    """Index-time sort (setIndexSort analog): one distributed sort,
    doc ids in sort-key order, early-terminating sorted top-k."""
    _ensure_ray()
    from fdblucene_ray.index.sorted import build_sorted_index

    t0 = time.perf_counter()
    m = build_sorted_index(
        args.input,
        args.out,
        sort_col=args.sort_col,
        descending=not args.ascending,
        fields=_parse_fields(args.field),
        num_partitions=args.num_partitions,
        batch_size=args.batch_size,
        resume=not args.no_resume,
    )
    print(json.dumps({
        "index": args.out,
        "index_sort": m.extra["index_sort"],
        "segments": len(m.segments),
        "wall_s": round(time.perf_counter() - t0, 2),
    }))
    return 0


def cmd_sorted_topk(args) -> int:
    _ensure_ray()
    from fdblucene_ray.index.build import hydrate
    from fdblucene_ray.index.search import Searcher

    s = Searcher(args.index)
    ids = s.search_sorted_topk(
        args.query, args.k, field=args.field, operator=args.operator
    )
    info = s.manifest.extra["index_sort"]
    cols = ["doc_id", f"orig_{args.id_col}", info["col"]]
    stored = hydrate(args.index, ids, columns=cols)
    for rank in range(stored.num_rows):
        print(json.dumps({
            "rank": rank + 1,
            "doc_id": int(stored[f"orig_{args.id_col}"][rank].as_py()),
            info["col"]: stored[info["col"]][rank].as_py(),
        }))
    return 0


def cmd_scrub(args) -> int:
    """Duplicated-span scrub (Lee et al. ACL'22): write a cleaned copy."""
    _ensure_ray()
    import ray.data

    from fdblucene_ray.ops.webtext import scrub_duplicated_spans

    ds = ray.data.read_parquet(args.input, columns=[args.id_col, args.text_col])
    out = scrub_duplicated_spans(
        ds, n=args.n, min_df=args.min_df,
        text_col=args.text_col, id_col=args.id_col,
    )
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    return 0


def cmd_gopher(args) -> int:
    """Gopher quality rules (Rae et al. 2021): write per-doc metrics +
    keep verdicts; --keep-only writes just the surviving docs' ids."""
    _ensure_ray()
    import ray.data

    from fdblucene_ray.ops.textstats import gopher_rules

    ds = ray.data.read_parquet(
        args.input, columns=[args.id_col, args.text_col]
    )
    out = gopher_rules(ds, text_col=args.text_col, id_col=args.id_col)
    if args.keep_only:
        out = out.filter(expr="keep == True").select_columns(["doc_id"])
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    return 0


def cmd_semdedup(args) -> int:
    """SemDeDup over an embedding table: write the deduplicated rows."""
    _ensure_ray()
    import ray.data

    from fdblucene_ray.ops.similarity import semantic_dedup

    ds = ray.data.read_parquet(
        args.input, columns=[args.id_col, args.vec_col]
    )
    out = semantic_dedup(
        ds, threshold=args.threshold, n_centroids=args.centroids,
        vec_col=args.vec_col, id_col=args.id_col,
    )
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    return 0


def cmd_suffixdedup(args) -> int:
    """Suffix-array exact-substring dedup: write the maximal
    duplicated byte spans (Lee et al. exact half, arbitrary length)."""
    _ensure_ray()
    import ray.data

    from fdblucene_ray.ops.suffix import suffix_dup_spans

    ds = ray.data.read_parquet(
        args.input, columns=[args.id_col, args.text_col]
    )
    out = suffix_dup_spans(
        ds, min_len=args.min_len, min_df=args.min_df,
        text_col=args.text_col, id_col=args.id_col,
        seed_mode=args.seed_mode,
    )
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    return 0


def cmd_suffixscrub(args) -> int:
    """Byte-level duplicate scrubbing: write the cleaned corpus."""
    _ensure_ray()
    import ray.data

    from fdblucene_ray.ops.suffix import scrub_suffix_spans

    ds = ray.data.read_parquet(
        args.input, columns=[args.id_col, args.text_col]
    )
    out = scrub_suffix_spans(
        ds, min_len=args.min_len, min_df=args.min_df,
        text_col=args.text_col, id_col=args.id_col,
        seed_mode=args.seed_mode,
    )
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    return 0


def cmd_suffixregistry(args) -> int:
    """Build or append the incremental suffix-dedup registry."""
    _ensure_ray()
    import ray.data

    from fdblucene_ray.ops.suffix import (
        append_suffix_registry,
        build_suffix_registry,
    )

    ds = ray.data.read_parquet(
        args.input, columns=[args.id_col, args.text_col]
    )
    if args.append_batch:
        created = append_suffix_registry(
            ds, args.registry, args.append_batch,
            text_col=args.text_col, id_col=args.id_col,
        )
    else:
        created = build_suffix_registry(
            ds, args.registry, min_len=args.min_len,
            min_df=args.min_df, text_col=args.text_col,
            id_col=args.id_col, seed_mode=args.seed_mode,
        )
    print(json.dumps({"registry": args.registry, "created": created}))
    return 0


def cmd_sync(args) -> int:
    """One-shot incremental directory sync: append new input files."""
    _ensure_ray()
    from fdblucene_ray.index.sync import sync_index, sync_status

    if args.status_only:
        print(json.dumps(
            sync_status(args.index, args.input_dir,
                        pattern=args.pattern)
        ))
        return 0
    fields = json.loads(args.fields) if args.fields else None
    m, new = sync_index(
        args.index, args.input_dir, pattern=args.pattern,
        files_per_shard=args.files_per_shard,
        **({"fields": fields} if fields else {}),
    )
    print(json.dumps(
        {"ingested": [str(p) for p in new],
         "manifest_version": None if m is None else m.version}
    ))
    return 0


def cmd_export(args) -> int:
    """Resumable partitioned corpus export (C4-kept docs per shard)."""
    _ensure_ray()
    from fdblucene_ray.ops.export import export_corpus
    from fdblucene_ray.ops.textstats import C4Rules

    rules = C4Rules(args.text_col, args.id_col)

    def keep_clean(t):
        r = rules(t)
        return r.filter(r["keep"])

    man = export_corpus(
        args.input, args.out, keep_clean, shard_rows=args.shard_rows,
        columns=[args.id_col, args.text_col],
    )
    print(json.dumps({
        "out": args.out,
        "shards": man.num_rows,
        "n_in": int(sum(man["n_in"].to_pylist())),
        "n_out": int(sum(man["n_out"].to_pylist())),
        "resumed": int(sum(man["resumed"].to_pylist())),
    }))
    return 0


def cmd_graphann(args) -> int:
    """Build a Vamana graph-ANN layout and run a sample query batch."""
    _ensure_ray()
    import numpy as np
    import ray.data

    from fdblucene_ray.ops.graphann import build_graph_index, graph_topk_indexed

    ds = ray.data.read_parquet(
        args.input, columns=[args.id_col, args.vec_col]
    )
    build_graph_index(
        ds, args.index, n_centroids=args.centroids, R=args.r,
        L_build=args.l_build, vec_col=args.vec_col, id_col=args.id_col,
    )
    rows = ds.limit(args.queries).take_all()
    q = np.array([r[args.vec_col] for r in rows], np.float64)
    ids = [int(r[args.id_col]) for r in rows]
    t = graph_topk_indexed(
        args.index, q, ids, k=args.k, nprobe=args.nprobe,
        L_search=args.l_search, vec_col=args.vec_col, id_col=args.id_col,
    )
    print(json.dumps({"index": args.index, "rows": t.num_rows}))
    return 0


def cmd_commits(args) -> int:
    """List retained commit points; --prune applies the deletion policy."""
    from fdblucene_ray.index.manifest import list_commits, prune_commits

    pruned = []
    if args.prune is not None:
        pruned = prune_commits(args.index, keep_last=args.prune)
    print(json.dumps({"retained": list_commits(args.index), "pruned": pruned}))
    return 0


def cmd_push(args) -> int:
    from fdblucene_ray.index.store import LocalFSStore, push_index

    n = push_index(args.index, LocalFSStore(args.store))
    print(json.dumps({"files_uploaded": n, "store": args.store}))
    return 0


def cmd_pull(args) -> int:
    from fdblucene_ray.index.store import LocalFSStore, pull_index

    m = pull_index(LocalFSStore(args.store), args.index, verify=args.verify)
    print(json.dumps({"version": m.version, "segments": len(m.segments),
                      "cache": args.index}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="fdblucene_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an index from parquet")
    b.add_argument("--input", required=True, nargs="+")
    b.add_argument("--out", required=True)
    b.add_argument("--field", action="append",
                   help="NAME:COLUMN:ANALYZER[:positions] (repeatable)")
    b.add_argument("--num-partitions", type=int, default=None)
    b.add_argument("--batch-size", type=int, default=2048)
    b.add_argument("--head-term", action="append",
                   help="salt this head term's shuffle key (repeatable)")
    b.add_argument("--store", help="comma-separated stored columns (doc store)")
    b.add_argument("--no-resume", action="store_true")
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search", help="query an index")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--field", default="text")
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--operator", default="or", choices=["or", "and"])
    s.add_argument("--mode", default="wand", choices=["wand", "exhaustive"])
    s.add_argument("--phrase", action="store_true")
    s.set_defaults(fn=cmd_search)

    ms = sub.add_parser(
        "msearch", help="scatter-gather search over doc-sharded indexes"
    )
    ms.add_argument("--index", action="append", required=True,
                    help="shard index dir (repeat per shard)")
    ms.add_argument("--query", required=True)
    ms.add_argument("-k", type=int, default=10)
    ms.add_argument("--field", default="text")
    ms.add_argument("--operator", default="or", choices=["or", "and"])
    ms.add_argument("--phrase", action="store_true")
    ms.add_argument("--cpus", type=float, default=1.0,
                    help="CPUs reserved per shard actor")
    ms.set_defaults(fn=cmd_msearch)

    q = sub.add_parser("query", help="parsed query (boosts, phrases, field:)")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("--field", default="text")
    q.add_argument("--k", type=int, default=10)
    q.set_defaults(fn=cmd_query)

    ex = sub.add_parser("expr", help="nested boolean: (a OR b) AND NOT c")
    ex.add_argument("--index", required=True)
    ex.add_argument("--query", required=True)
    ex.add_argument("--field", default="text")
    ex.add_argument("--k", type=int, default=10)
    ex.set_defaults(fn=cmd_expr)

    pu = sub.add_parser(
        "parse",
        help='unified grammar: +a (b OR c) -d "e f"~2^1.5 field:g*',
    )
    pu.add_argument("--index", required=True)
    pu.add_argument("--query", required=True)
    pu.add_argument("--field", default="text")
    pu.add_argument("--k", type=int, default=10)
    pu.set_defaults(fn=cmd_parse)

    pc_ = sub.add_parser("percolate", help="reverse search over a doc stream")
    pc_.add_argument("--input", required=True, nargs="+")
    pc_.add_argument("--queries", default=None,
                     help="JSON file: list of clause dicts")
    pc_.add_argument("--monitor", default=None,
                     help="persisted compiled-query parquet: written "
                          "when --queries is given, reloaded otherwise")
    pc_.add_argument("--out", default=None, help="parquet output dir")
    pc_.add_argument("--analyzer", default="simple")
    pc_.add_argument("--text-col", default="text")
    pc_.add_argument("--id-col", default="doc_id")
    pc_.set_defaults(fn=cmd_percolate)

    fc = sub.add_parser("facets", help="facet counts over a keyword field")
    fc.add_argument("--index", required=True)
    fc.add_argument("--query", required=True)
    fc.add_argument("--facet-field", required=True)
    fc.add_argument("--field", default="text")
    fc.add_argument("--mode", default="or", choices=["or", "and"])
    fc.add_argument("--min-count", type=int, default=1)
    fc.set_defaults(fn=cmd_facets)

    sp = sub.add_parser("suggest-phrase",
                        help="did-you-mean with index collation")
    sp.add_argument("--index", required=True)
    sp.add_argument("--phrase", required=True)
    sp.add_argument("-k", type=int, default=5)
    sp.add_argument("--field", default="text")
    sp.set_defaults(fn=cmd_suggest_phrase)

    ac = sub.add_parser("autocomplete",
                        help="weighted prefix suggester (df-ranked)")
    ac.add_argument("--index", required=True)
    ac.add_argument("--prefix", required=True)
    ac.add_argument("-k", type=int, default=10)
    ac.add_argument("--field", default="text")
    ac.set_defaults(fn=cmd_autocomplete)

    ml = sub.add_parser("mlt", help="MoreLikeThis: similar docs to --doc-id")
    ml.add_argument("--index", required=True)
    ml.add_argument("--doc-id", type=int, required=True, dest="doc_id")
    ml.add_argument("--source", default=None, help="input parquet for doc text")
    ml.add_argument("--field", default="text")
    ml.add_argument("--k", type=int, default=10)
    ml.add_argument("--max-terms", type=int, default=10, dest="max_terms")
    ml.set_defaults(fn=cmd_mlt)

    rs = sub.add_parser("rescore",
                        help="two-phase: BM25 window, phrase-rescored")
    rs.add_argument("index")
    rs.add_argument("query")
    rs.add_argument("phrase")
    rs.add_argument("-k", type=int, default=10)
    rs.add_argument("--window", type=int, default=50)
    rs.add_argument("--field", default="text")
    rs.add_argument("--query-weight", type=float, default=1.0)
    rs.add_argument("--rescore-weight", type=float, default=1.0)
    rs.add_argument("--slop", type=int, default=0)
    rs.set_defaults(fn=cmd_rescore)

    st_ = sub.add_parser("stats", help="index diagnostics (CheckIndex-lite)")
    st_.add_argument("--index", required=True)
    st_.set_defaults(fn=cmd_stats)

    ck = sub.add_parser(
        "check", help="verify index integrity (CheckIndex analog)"
    )
    ck.add_argument("--index", required=True)
    ck.add_argument("--level", choices=["fast", "full"], default="full")
    ck.set_defaults(fn=cmd_check)

    ct = sub.add_parser(
        "catalog", help="named-index catalog (create/list/drop/search)"
    )
    ct.add_argument("action", choices=["list", "create", "drop", "search"])
    ct.add_argument("--root", required=True)
    ct.add_argument("--name", help="index name (comma-list for search)")
    ct.add_argument("--source", help="parquet source (create)")
    ct.add_argument("--field", default="text")
    ct.add_argument("--column")
    ct.add_argument("--analyzer", default="lucene")
    ct.add_argument("--partitions", type=int, default=8)
    ct.add_argument("--query", help="query string (search)")
    ct.add_argument("-k", type=int, default=10)
    ct.set_defaults(fn=cmd_catalog)

    m = sub.add_parser("merge", help="merge indexes (addIndexes analog)")
    m.add_argument("--source", action="append", required=True,
                   help="INDEX_DIR[@DOC_BASE] (repeatable)")
    m.add_argument("--out", required=True)
    m.add_argument("--num-partitions", type=int, default=16)
    m.set_defaults(fn=cmd_merge)

    d = sub.add_parser("delete", help="tombstone docs (liveDocs semantics)")
    d.add_argument("--index", required=True)
    d.add_argument("--doc-id", action="append", default=[],
                   help="doc id to delete (repeatable)")
    d.add_argument("--term", help="FIELD:TERM — deleteDocuments(Term) analog")
    d.set_defaults(fn=cmd_delete)

    dv = sub.add_parser(
        "dv", help="in-place numeric doc-values update (no reindex)"
    )
    dv.add_argument("--index", required=True)
    dv.add_argument("--field", required=True)
    dv.add_argument("--set", action="append", default=[],
                    help="DOC_ID=VALUE (repeatable); omit to show overlay")
    dv.set_defaults(fn=cmd_dv)

    re_ = sub.add_parser(
        "rankeval", help="trec_eval analog: run vs qrels parquet"
    )
    re_.add_argument("--run", required=True,
                     help="parquet with (qid, doc_id, rank)")
    re_.add_argument("--qrels", required=True,
                     help="parquet with (qid, doc_id, rel)")
    re_.add_argument("-k", type=int, default=10)
    re_.add_argument("--per-query", action="store_true")
    re_.set_defaults(fn=cmd_rankeval)

    au = sub.add_parser(
        "audio", help="WAV/PCM16 decode + DSP features over parquet payloads"
    )
    au.add_argument("--input", required=True, nargs="+")
    au.add_argument("--payload-col", default="payload")
    au.add_argument("--id-col", default="doc_id")
    au.add_argument("--out", default=None, help="parquet output dir")
    au.add_argument("--limit", type=int, default=20)
    au.set_defaults(fn=cmd_audio)

    ss = sub.add_parser(
        "substring", help="infix search via a trigram-signature index"
    )
    ss.add_argument("--index", required=True)
    ss.add_argument("--source", required=True,
                    help="parquet with the raw text for exact verify")
    ss.add_argument("needle")
    ss.add_argument("-k", type=int, default=25)
    ss.add_argument("--field", default="tri")
    ss.add_argument("--text-col", default="text")
    ss.set_defaults(fn=cmd_substring)

    mt = sub.add_parser("maintain", help="tiered merge maintenance loop")
    mt.add_argument("--index", required=True)
    mt.add_argument("--tier-factor", type=int, default=4)
    mt.add_argument("--min-merge", type=int, default=4)
    mt.add_argument("--out-partitions", type=int, default=1)
    mt.set_defaults(fn=cmd_maintain)

    c = sub.add_parser("compact", help="full rewrite; purges tombstones")
    c.add_argument("--index", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--num-partitions", type=int, default=16)
    c.set_defaults(fn=cmd_compact)

    cm = sub.add_parser("commits", help="list/prune commit points")
    cm.add_argument("index")
    cm.add_argument("--prune", type=int, default=None,
                    help="keep only the newest N commit points")
    cm.set_defaults(fn=cmd_commits)

    bs = sub.add_parser("build-sorted",
                        help="index-time sort (setIndexSort analog)")
    bs.add_argument("--input", required=True, nargs="+")
    bs.add_argument("--out", required=True)
    bs.add_argument("--sort-col", required=True)
    bs.add_argument("--ascending", action="store_true")
    bs.add_argument("--field", action="append",
                    help="NAME:COLUMN:ANALYZER[:positions] (repeatable)")
    bs.add_argument("--num-partitions", type=int, default=None)
    bs.add_argument("--batch-size", type=int, default=2048)
    bs.add_argument("--no-resume", action="store_true")
    bs.set_defaults(fn=cmd_build_sorted)

    stk = sub.add_parser("sorted-topk",
                         help="early-terminating top-k by the index sort")
    stk.add_argument("index")
    stk.add_argument("query")
    stk.add_argument("-k", type=int, default=10)
    stk.add_argument("--field", default="text")
    stk.add_argument("--operator", default="or", choices=["or", "and"])
    stk.add_argument("--id-col", default="doc_id")
    stk.set_defaults(fn=cmd_sorted_topk)

    sc = sub.add_parser("scrub", help="remove cross-doc duplicated spans")
    sc.add_argument("--input", required=True, nargs="+")
    sc.add_argument("--out", required=True)
    sc.add_argument("-n", type=int, default=8)
    sc.add_argument("--min-df", type=int, default=2)
    sc.add_argument("--text-col", default="text")
    sc.add_argument("--id-col", default="doc_id")
    sc.set_defaults(fn=cmd_scrub)

    gp = sub.add_parser("gopher", help="Gopher quality rules (Rae 2021)")
    gp.add_argument("--input", required=True, nargs="+")
    gp.add_argument("--out", required=True)
    gp.add_argument("--text-col", default="text")
    gp.add_argument("--id-col", default="doc_id")
    gp.add_argument("--keep-only", action="store_true")
    gp.set_defaults(fn=cmd_gopher)

    sd = sub.add_parser("semdedup", help="SemDeDup embedding dedup")
    sd.add_argument("--input", required=True, nargs="+")
    sd.add_argument("--out", required=True)
    sd.add_argument("--threshold", type=float, default=0.95)
    sd.add_argument("--centroids", type=int, default=16)
    sd.add_argument("--vec-col", default="embedding")
    sd.add_argument("--id-col", default="vec_id")
    sd.set_defaults(fn=cmd_semdedup)

    sx = sub.add_parser(
        "suffixdedup", help="suffix-array exact-substring dup spans"
    )
    sx.add_argument("--input", required=True, nargs="+")
    sx.add_argument("--out", required=True)
    sx.add_argument("--min-len", type=int, default=40)
    sx.add_argument("--min-df", type=int, default=2)
    sx.add_argument("--text-col", default="text")
    sx.add_argument("--id-col", default="doc_id")
    sx.add_argument("--seed-mode", default="hash",
                    choices=["hash", "suffix_sort"])
    sx.set_defaults(fn=cmd_suffixdedup)

    ss = sub.add_parser(
        "suffixscrub", help="splice out duplicated byte spans"
    )
    ss.add_argument("--input", required=True, nargs="+")
    ss.add_argument("--out", required=True)
    ss.add_argument("--min-len", type=int, default=40)
    ss.add_argument("--min-df", type=int, default=2)
    ss.add_argument("--text-col", default="text")
    ss.add_argument("--id-col", default="doc_id")
    ss.add_argument("--seed-mode", default="hash",
                    choices=["hash", "suffix_sort"])
    ss.set_defaults(fn=cmd_suffixscrub)

    sr = sub.add_parser(
        "suffixregistry", help="build/append the suffix-dedup registry"
    )
    sr.add_argument("--input", required=True, nargs="+")
    sr.add_argument("--registry", required=True)
    sr.add_argument("--append-batch", default=None,
                    help="publish an append batch with this id "
                         "instead of building the base")
    sr.add_argument("--min-len", type=int, default=40)
    sr.add_argument("--min-df", type=int, default=2)
    sr.add_argument("--text-col", default="text")
    sr.add_argument("--id-col", default="doc_id")
    sr.add_argument("--seed-mode", default="hash",
                    choices=["hash", "suffix_sort"])
    sr.set_defaults(fn=cmd_suffixregistry)

    sy = sub.add_parser(
        "sync", help="append new input files from a directory (cron-able)"
    )
    sy.add_argument("--index", required=True)
    sy.add_argument("--input-dir", required=True)
    sy.add_argument("--pattern", default="*.parquet")
    sy.add_argument("--files-per-shard", type=int, default=16)
    sy.add_argument("--fields", default=None,
                    help="JSON field config (must match the index)")
    sy.add_argument("--status-only", action="store_true")
    sy.set_defaults(fn=cmd_sync)

    ex = sub.add_parser("export", help="resumable partitioned corpus export")
    ex.add_argument("--input", required=True, nargs="+")
    ex.add_argument("--out", required=True)
    ex.add_argument("--shard-rows", type=int, default=100_000)
    ex.add_argument("--text-col", default="text")
    ex.add_argument("--id-col", default="doc_id")
    ex.set_defaults(fn=cmd_export)

    ga = sub.add_parser("graphann", help="Vamana graph ANN build + query")
    ga.add_argument("--input", required=True, nargs="+")
    ga.add_argument("--index", required=True)
    ga.add_argument("--centroids", type=int, default=8)
    ga.add_argument("--r", type=int, default=16)
    ga.add_argument("--l-build", type=int, default=32)
    ga.add_argument("--l-search", type=int, default=64)
    ga.add_argument("--nprobe", type=int, default=2)
    ga.add_argument("--k", type=int, default=10)
    ga.add_argument("--queries", type=int, default=3)
    ga.add_argument("--vec-col", default="embedding")
    ga.add_argument("--id-col", default="vec_id")
    ga.set_defaults(fn=cmd_graphann)

    pu = sub.add_parser("push", help="upload index to a SegmentStore (U1)")
    pu.add_argument("index")
    pu.add_argument("store")
    pu.set_defaults(fn=cmd_push)

    pl = sub.add_parser("pull", help="materialize a SegmentStore index locally")
    pl.add_argument("store")
    pl.add_argument("index")
    pl.add_argument("--verify", action="store_true")
    pl.set_defaults(fn=cmd_pull)

    sn = sub.add_parser("span", help="span queries: NOT (--exclude) / OR")
    sn.add_argument("index")
    sn.add_argument("phrase")
    sn.add_argument("--exclude", default=None)
    sn.add_argument("--pre", type=int, default=0)
    sn.add_argument("--post", type=int, default=0)
    sn.add_argument("--or-phrase", action="append")
    sn.add_argument("--field", default="text")
    sn.add_argument("-k", type=int, default=20)
    sn.set_defaults(fn=cmd_span)

    iv = sub.add_parser(
        "intervals", help="intervals query: ordered/unordered + maxgaps"
    )
    iv.add_argument("index")
    iv.add_argument("terms")
    iv.add_argument("--max-gaps", type=int, default=0)
    iv.add_argument("--unordered", action="store_true")
    iv.add_argument("--not-containing", default=None)
    iv.add_argument("--containing", default=None)
    iv.add_argument("--field", default="text")
    iv.add_argument("-k", type=int, default=20)
    iv.set_defaults(fn=cmd_intervals)

    pr = sub.add_parser("pagerank", help="link-graph PageRank top-k")
    pr.add_argument("--input", required=True, nargs="+")
    pr.add_argument("--id-col", default="doc_id")
    pr.add_argument("--iters", type=int, default=3)
    pr.add_argument("-k", type=int, default=20)
    pr.set_defaults(fn=cmd_pagerank)

    gr = sub.add_parser("graph",
                        help="link-graph ops: trustrank/hostrank/hits/degree")
    gr.add_argument("kind", choices=["trustrank", "hostrank", "hits", "degree"])
    gr.add_argument("--input", required=True, nargs="+")
    gr.add_argument("--id-col", default="doc_id")
    gr.add_argument("--host-col", default="source")
    gr.add_argument("--seed-val", default=None)
    gr.add_argument("--iters", type=int, default=3)
    gr.add_argument("-k", type=int, default=20)
    gr.set_defaults(fn=cmd_graph)

    dsr = sub.add_parser("dsir", help="DSIR importance resample top-k")
    dsr.add_argument("--input", required=True, nargs="+")
    dsr.add_argument("--target-col", required=True)
    dsr.add_argument("--target-val", required=True)
    dsr.add_argument("--text-col", default="text")
    dsr.add_argument("--id-col", default="doc_id")
    dsr.add_argument("--seed", type=int, default=42)
    dsr.add_argument("-k", type=int, default=100)
    dsr.set_defaults(fn=cmd_dsir)

    cl = sub.add_parser("classify",
                        help="train+apply hashed logistic quality filter")
    cl.add_argument("--input", required=True, nargs="+")
    cl.add_argument("--target-col", required=True)
    cl.add_argument("--target-val", required=True)
    cl.add_argument("--text-col", default="text")
    cl.add_argument("--id-col", default="doc_id")
    cl.add_argument("--iters", type=int, default=8)
    cl.add_argument("-k", type=int, default=100)
    cl.set_defaults(fn=cmd_classify)

    g = sub.add_parser("gc", help="sweep unreferenced segments + tombstones")
    g.add_argument("--index", required=True)
    g.add_argument("--dry-run", action="store_true")
    g.set_defaults(fn=cmd_gc)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
