"""CLI entry points — the user-facing surface of the engine.

    python -m monocator_ray crawl  --seeds seeds.txt --pages /web --out /out
    python -m monocator_ray visit  --domain host0.example --pages /web --out /out
    python -m monocator_ray report --out /out
    python -m monocator_ray synth  --dest /web --pages 10000 --hosts 100
    python -m monocator_ray warc-import --warc a.warc.gz --out /pages_pq
    python -m monocator_ray warc-export --pages /pages_pq --out /warc_dir
    python -m monocator_ray query                      # list registered pipelines
    python -m monocator_ray query top_terms --sf-dir /root/testdata/sf0.01

Owns its Ray session (scripts only; the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="monocator_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="full crawl run (entry point 1)")
    c.add_argument("--seeds", required=True, help="seed list file (txt/csv/parquet)")
    c.add_argument("--pages", required=True, help="page-store dir (synthetic web)")
    c.add_argument("--out", required=True)
    c.add_argument("--budget", type=int, default=4096)
    c.add_argument("--max-depth", type=int, default=6)
    c.add_argument("--shards", type=int, default=8)
    c.add_argument("--buckets", type=int, default=16)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--async-rounds", type=int, default=0,
                   help="bounded-staleness frontier mode: rounds in flight "
                        "(0 = exact-order BSP, the default)")

    v = sub.add_parser("visit", help="single-domain visit (entry point 2)")
    v.add_argument("--domain", required=True)
    v.add_argument("--pages", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--max-pages", type=int, default=10)
    v.add_argument("--buckets", type=int, default=16)

    r = sub.add_parser("report", help="report over crawl artifacts (entry point 3)")
    r.add_argument("--out", required=True)

    s = sub.add_parser("synth", help="generate a synthetic web (S6)")
    s.add_argument("--dest", required=True)
    s.add_argument("--pages", type=int, default=10000)
    s.add_argument("--hosts", type=int, default=100)
    s.add_argument("--buckets", type=int, default=16)
    s.add_argument("--page-bytes", type=int, default=0)

    wi = sub.add_parser("warc-import", help="WARC file(s) -> pages parquet (S1)")
    wi.add_argument("--warc", required=True, nargs="+", help="input .warc[.gz] files")
    wi.add_argument("--out", required=True, help="output parquet dir")
    wi.add_argument("--extract", action="store_true",
                    help="also run the text extractor into the text column")

    we = sub.add_parser("warc-export", help="pages parquet -> sharded WARC (S3)")
    we.add_argument("--pages", required=True, help="input pages parquet file/dir")
    we.add_argument("--out", required=True, help="output WARC dir")
    we.add_argument("--plain", action="store_true", help="write uncompressed .warc")

    de = sub.add_parser(
        "duck-export",
        help="crawl artifacts -> per-entity DuckDB tables (the reference's "
             "persistence layer, /root/reference/.gitignore:40)",
    )
    de.add_argument("--out", required=True, help="crawl out dir (artifacts)")
    de.add_argument("--db", required=True, help="output .duckdb file")

    je = sub.add_parser("jsonl-export",
                        help="parquet table -> sharded JSONL corpus (S3)")
    je.add_argument("--table", required=True, help="input parquet file/dir")
    je.add_argument("--out", required=True, help="output JSONL dir")
    je.add_argument("--columns", nargs="*", default=None,
                    help="project to these columns first")
    je.add_argument("--plain", action="store_true", help="write uncompressed .jsonl")

    se = sub.add_parser(
        "shards-export",
        help="(doc_id, ...) parquet -> deterministic shuffled training shards")
    se.add_argument("--table", required=True, help="input parquet (needs doc_id)")
    se.add_argument("--out", required=True)
    se.add_argument("--shard-rows", type=int, default=4096)

    ce = sub.add_parser(
        "corpus",
        help="end-to-end: crawl -> curate (langid/quality/dedup/balance) -> JSONL shards")
    ce.add_argument("--seeds", required=True, help="seed VisitRequest file")
    ce.add_argument("--pages", required=True, help="page-store dir")
    ce.add_argument("--out", required=True, help="crawl artifact dir")
    ce.add_argument("--corpus", required=True, help="JSONL shard output dir")
    ce.add_argument("--shards", type=int, default=4)
    ce.add_argument("--budget", type=int, default=4096)
    ce.add_argument("--max-depth", type=int, default=8)
    ce.add_argument("--buckets", type=int, default=16)
    ce.add_argument("--min-tokens", type=int, default=10)
    ce.add_argument("--plain", action="store_true", help="no gzip")

    si = sub.add_parser(
        "search",
        help="build (once) and query the persistent inverted index over a "
             "(doc_id, text) parquet table",
    )
    si.add_argument("terms", nargs="+", help="query terms")
    si.add_argument("--table", required=True, help="parquet with doc_id, text")
    si.add_argument("--store", required=True, help="index dir (built if absent)")
    si.add_argument("--k", type=int, default=10)
    si.add_argument("--rebuild", action="store_true", help="force a fresh build")

    rh = sub.add_parser(
        "rehearse",
        help="run EVERY registered query vs its DuckDB oracle (the driver's "
             "CORRECTNESS check, reproducible in one command)",
    )
    rh.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    rh.add_argument("--names", default=None,
                    help="comma-separated subset (default: all)")
    rh.add_argument("--json-out", default=None, help="write results JSON here")
    rh.add_argument("--num-cpus", type=int, default=None)

    q = sub.add_parser("query", help="run a registered pipeline over an sf dir")
    q.add_argument("name", nargs="?", default=None,
                   help="registry query name (omit to list all)")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                   help="table dir with the driver parquet tables")
    q.add_argument("--out", default=None,
                   help="write the result as parquet here instead of printing")
    q.add_argument("--limit", type=int, default=20, help="print at most N rows")
    q.add_argument("--stats", action="store_true",
                   help="print ds.stats() (per-stage wall/CPU breakdown)")
    q.add_argument("--explain", action="store_true",
                   help="print the LAZY Ray Data operator plan without "
                        "executing (driver-fold queries execute anyway and "
                        "report their shape)")

    lk = sub.add_parser(
        "lake",
        help="Delta/Iceberg table operations: history | vacuum | checkpoint")
    lk.add_argument("op", choices=["history", "vacuum", "checkpoint"])
    lk.add_argument("--table", required=True, help="table directory")
    lk.add_argument("--keep-versions", type=int, default=None,
                    help="vacuum: retain only the newest N versions "
                         "(Delta only; default keeps all)")

    iw = sub.add_parser(
        "ingest-watch",
        help="exactly-once ingest of new parquet drops into an aggstore view")
    iw.add_argument("--data-dir", required=True,
                    help="landing directory of parquet drops")
    iw.add_argument("--store", required=True, help="aggstore directory")
    iw.add_argument("--keys", required=True, help="comma-separated key cols")
    iw.add_argument("--sum", dest="sums", default="",
                    help="comma-separated columns to SUM (output sum_<col>)")
    iw.add_argument("--count", action="store_true",
                    help="add a row count column n_rows")

    fs = sub.add_parser(
        "serve-flight",
        help="serve registry query results over Arrow Flight (localhost)")
    fs.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                    help="table dir with the driver parquet tables")
    fs.add_argument("--port", type=int, default=8815,
                    help="TCP port on 127.0.0.1 (0 = ephemeral)")
    fs.add_argument("--names", default=None,
                    help="comma-separated subset of queries to expose")

    args = p.parse_args(argv)
    import ray

    if args.cmd == "synth":
        _init_ray(args.num_cpus)
        from monocator_ray.shipping import ensure_shipped
        from monocator_ray.sources.synth import write_synth_pages

        ensure_shipped()
        write_synth_pages(args.dest, args.pages, args.hosts, args.buckets,
                          page_bytes=args.page_bytes)
        print(json.dumps({"dest": args.dest, "pages": args.pages}))
    elif args.cmd == "crawl":
        _init_ray(args.num_cpus)
        from monocator_ray.crawl.driver import CrawlConfig, crawl
        from monocator_ray.sources.seeds import seed_urls_from_file

        seed_urls = seed_urls_from_file(args.seeds)
        cfg = CrawlConfig(num_shards=args.shards, budget_per_epoch=args.budget,
                          max_depth=args.max_depth, num_buckets=args.buckets,
                          async_rounds=args.async_rounds)
        res = crawl(seed_urls, args.pages, args.out, cfg, resume=args.resume)
        print(json.dumps({"fetched": res.fetched, "epochs": res.epochs,
                          "seen": res.seen, "wall_s": round(res.wall_s, 2)}))
    elif args.cmd == "visit":
        _init_ray(args.num_cpus)
        from monocator_ray.crawl.driver import CrawlConfig, visit

        cfg = CrawlConfig(num_shards=2, num_buckets=args.buckets)
        res = visit(args.domain, args.pages, args.out, cfg, max_pages=args.max_pages)
        print(json.dumps({"fetched": res.fetched, "wall_s": round(res.wall_s, 2)}))
    elif args.cmd == "warc-import":
        _init_ray(args.num_cpus)
        from monocator_ray.shipping import ensure_shipped
        from monocator_ray.sources.pages import fill_text
        from monocator_ray.sources.warc import read_warc

        ensure_shipped()
        ds = read_warc(list(args.warc))
        if args.extract:
            ds = fill_text(ds)
        ds.write_parquet(args.out)
        print(json.dumps({"out": args.out, "rows": ds.count()}))
    elif args.cmd == "search":
        _init_ray(args.num_cpus)
        import os

        import ray.data as rd

        from monocator_ray.sources.invstore import (
            build_inverted_store, search_inverted_store,
        )

        if args.rebuild or not os.path.exists(
            os.path.join(args.store, "meta.json")
        ):
            build_inverted_store(
                rd.read_parquet(args.table, columns=["doc_id", "text"]),
                args.store,
            )
        hits = search_inverted_store(args.store, tuple(args.terms), k=args.k)
        print(json.dumps({"store": args.store, "terms": args.terms,
                          "hits": hits.to_pylist()}))
    elif args.cmd == "duck-export":
        from monocator_ray.sources.duck import export_crawl_duckdb

        counts = export_crawl_duckdb(args.out, args.db)
        print(json.dumps({"db": args.db, "tables": counts}))
    elif args.cmd == "warc-export":
        _init_ray(args.num_cpus)
        import ray.data as rd

        from monocator_ray.shipping import ensure_shipped
        from monocator_ray.sources.warc import export_warc

        ensure_shipped()
        manifest = export_warc(rd.read_parquet(args.pages), args.out,
                               compress=not args.plain).to_pandas()
        print(json.dumps({"out": args.out, "files": len(manifest),
                          "rows": int(manifest["n_records"].sum())}))
    elif args.cmd == "jsonl-export":
        _init_ray(args.num_cpus)
        import ray.data as rd

        from monocator_ray.shipping import ensure_shipped
        from monocator_ray.sources.jsonl import export_jsonl

        ensure_shipped()
        ds = rd.read_parquet(args.table, columns=args.columns or None)
        manifest = export_jsonl(ds, args.out, compress=not args.plain).to_pandas()
        print(json.dumps({"out": args.out, "files": len(manifest),
                          "rows": int(manifest["n_records"].sum())}))
    elif args.cmd == "shards-export":
        _init_ray(args.num_cpus)
        import ray.data as rd

        from monocator_ray.shipping import ensure_shipped
        from monocator_ray.sources.jsonl import write_training_shards

        ensure_shipped()
        manifest = write_training_shards(
            rd.read_parquet(args.table), args.out, shard_rows=args.shard_rows
        ).to_pandas()
        print(json.dumps({"out": args.out, "shards": len(manifest),
                          "rows": int(manifest["rows"].sum())}))
    elif args.cmd == "corpus":
        _init_ray(args.num_cpus)
        import numpy as np
        import pyarrow as pa

        from monocator_ray import report
        from monocator_ray.crawl.driver import CrawlConfig, crawl
        from monocator_ray.hashing import hash_str64
        from monocator_ray.pipelines.docs import curate_dataset
        from monocator_ray.shipping import ensure_shipped
        from monocator_ray.sources.jsonl import export_jsonl
        from monocator_ray.sources.seeds import seed_urls_from_file

        ensure_shipped()
        # full-URL files seed exact pages; domain lists seed host roots
        seed_urls = seed_urls_from_file(args.seeds)
        cfg = CrawlConfig(num_shards=args.shards, budget_per_epoch=args.budget,
                          max_depth=args.max_depth, num_buckets=args.buckets)
        res = crawl(seed_urls, args.pages, args.out, cfg)
        from monocator_ray.crawl.driver import artifact_files
        from monocator_ray.sources.tables import sized_read_parquet

        # read ONLY url+text: the html payload dominates the artifact's
        # bytes and to_docs discards it
        pages = sized_read_parquet(artifact_files(args.out),
                                   columns=["url", "text"])

        def to_docs(t: pa.Table) -> pa.Table:
            ids = hash_str64(t["url"].to_pylist()).view(np.int64)
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": t["text"]})

        docs = pages.map_batches(to_docs, batch_format="pyarrow")
        from monocator_ray.report import drop_noindex

        docs = drop_noindex(docs, args.out)
        corpus = curate_dataset(
            docs, min_tokens=args.min_tokens, keep_text=True,
        ).materialize()
        manifest = export_jsonl(corpus, args.corpus,
                                compress=not args.plain).to_pandas()
        print(json.dumps({
            "fetched": res.fetched, "epochs": res.epochs,
            "corpus_docs": int(manifest["n_records"].sum()),
            "shards": len(manifest), "corpus": args.corpus,
        }))
    elif args.cmd == "rehearse":
        _init_ray(args.num_cpus)
        from monocator_ray.pipelines.rehearse import rehearse

        results = rehearse(args.sf_dir,
                           names=args.names.split(",") if args.names else None)
        if args.json_out:
            with open(args.json_out, "w") as fh:
                json.dump(results, fh, indent=1)
        bad = [n for n, r in results.items() if r["status"] in ("FAIL", "ERROR")]
        ray.shutdown()
        return 1 if bad else 0
    elif args.cmd == "lake":
        import os

        is_iceberg = os.path.isdir(os.path.join(args.table, "metadata"))
        if args.op == "history":
            if is_iceberg:
                from monocator_ray.sources.iceberg import iceberg_history

                rows = iceberg_history(args.table)
            else:
                from monocator_ray.sources.delta import delta_history

                rows = delta_history(args.table)
            for r in rows:
                print(json.dumps(r, default=str))
        elif args.op == "vacuum":
            if is_iceberg:
                print("iceberg vacuum not supported (snapshots are kept; "
                      "use a catalog's expire-snapshots)", file=sys.stderr)
                return 2
            from monocator_ray.sources.delta import vacuum_delta_table

            deleted = vacuum_delta_table(args.table,
                                         keep_versions=args.keep_versions)
            print(json.dumps({"deleted": len(deleted)}))
        elif args.op == "checkpoint":
            if is_iceberg:
                print("iceberg tables have no checkpoint file",
                      file=sys.stderr)
                return 2
            from monocator_ray.sources.delta import checkpoint_delta_table

            print(json.dumps({"checkpointed_version":
                              checkpoint_delta_table(args.table)}))
        return 0

    elif args.cmd == "ingest-watch":
        _init_ray(args.num_cpus)
        from monocator_ray.sources.watch import watch_ingest_aggstore

        keys = args.keys.split(",")
        sums = [c for c in args.sums.split(",") if c]
        aggs: list[tuple] = [(c, "sum") for c in sums]
        names = keys + [f"sum_{c}" for c in sums]
        if args.count:
            probe = sums[0] if sums else keys[0]
            aggs.append((probe, "count"))
            names.append("n_rows")
        r = watch_ingest_aggstore(args.data_dir, args.store, keys, aggs, names)
        print(json.dumps(r))
        return 0

    elif args.cmd == "serve-flight":
        _init_ray(getattr(args, "num_cpus", None))
        from monocator_ray.sources.flightserve import serve_flight

        names = args.names.split(",") if args.names else None
        server = serve_flight(args.sf_dir, port=args.port, names=names)
        print(f"serving {len(names) if names else 'all'} registry queries "
              f"at {server.endpoint} (ctrl-c to stop)")
        try:
            server.serve()  # blocks until shutdown
        except KeyboardInterrupt:
            server.shutdown()
        return 0

    elif args.cmd == "query":
        from monocator_ray.pipelines.registry import REGISTRY

        if args.name is None:
            for name, (_fn, sql) in sorted(REGISTRY.items()):
                print(f"{name}\t{'sql-oracle' if sql else 'rows-only'}")
            return 0
        if args.name not in REGISTRY:
            print(f"unknown query {args.name!r}; run with no name to list", file=sys.stderr)
            return 2
        _init_ray(args.num_cpus)
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        fn, _sql = REGISTRY[args.name]
        res = fn(args.sf_dir)
        if args.explain:
            # a Dataset result is LAZY here: its repr is the logical
            # operator chain, printed without triggering execution.
            # Table/DataFrame results come from driver-fold pipelines whose
            # distributed part already ran inside fn.
            if isinstance(res, rd.Dataset):
                print(res)
                kind = "lazy-dataset"
            else:
                kind = "driver-fold (distributed partials already reduced)"
                print(f"<{type(res).__name__}> from a {kind} pipeline")
            print(json.dumps({"query": args.name, "plan": kind}))
            return 0
        if args.out:
            if isinstance(res, rd.Dataset):
                res = res.materialize()  # one execution for write AND count
                res.write_parquet(args.out)
                n = res.count()
            else:
                import pyarrow.parquet as pq

                tbl = res if isinstance(res, pa.Table) else pa.Table.from_pandas(
                    res, preserve_index=False)
                pq.write_table(tbl, args.out)
                n = tbl.num_rows
            print(json.dumps({"query": args.name, "out": args.out, "rows": int(n)}))
        else:
            if args.stats and isinstance(res, rd.Dataset):
                res = res.materialize()
            df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
            with pd.option_context("display.max_columns", None, "display.width", 200):
                print(df.head(args.limit).to_string(index=False))
            if args.stats and isinstance(res, rd.Dataset):
                print(res.stats())
            print(json.dumps({"query": args.name, "rows": int(len(df))}))
    elif args.cmd == "report":
        _init_ray(args.num_cpus)
        from monocator_ray import report

        stats = report.crawl_stats(args.out).to_pandas()
        hot = report.hot_hosts(args.out, 5).to_pandas()
        print(json.dumps({
            "epochs": len(stats),
            "fetched": int(stats["fetched"].sum()),
            "errors": int(stats["errors"].sum()),
            "approx_distinct_urls": round(report.approx_distinct_urls(args.out), 1),
            "hot_hosts": hot.to_dict("records"),
            "seen_except_frontier": report.seen_except_frontier(args.out),
        }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
